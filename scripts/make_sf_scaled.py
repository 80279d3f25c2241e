#!/usr/bin/env python3
"""Scale-probe data generator: writes FACTOR offset copies of an input
SF directory so the registry can be timed at ~10x bench scale
(driver-side tooling only — not part of the library).

Design goals (so measured scaling reflects the ENGINE, not artifacts):
- Keys/FKs offset consistently per copy (orders<->lineitem<->customer,
  part, supplier); nation/region stay fixed inventories.
- documents: copy i>0 suffixes every token with _i — within-copy
  dedup/near-dup structure is preserved exactly, cross-copy shingle
  overlap is zero (otherwise every doc becomes a 10-clique of
  near-dups and the quadratic ground-truth queries explode by
  construction rather than by scale).
- embeddings: copy i>0 cyclically rotates vector components by 7*i —
  norms and all WITHIN-copy dot products are invariant, cross-copy
  cosine of a vector with its own rotation is random-like.
- events: user/event ids offset, timestamps unchanged (10x users in
  the same time window — the realistic sessionization scale shape).

Usage: make_sf_scaled.py [src=/root/testdata/sf0.1] [dst=/tmp/sf1] [factor=10]
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

import os
os.makedirs(dst, exist_ok=True)

def off(table, col, k, i):
    """add i*k to int column col, preserving its type"""
    t = table.schema.field(col).type
    return table.set_column(
        table.schema.get_field_index(col), col,
        pc.cast(pc.add(table.column(col), i * k), t))

def copies(name, fn):
    t = pq.read_table(f"{src}/{name}.parquet")
    out = [t] + [fn(t, i) for i in range(1, factor)]
    merged = pa.concat_tables(out)
    pq.write_table(merged, f"{dst}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {merged.num_rows}")

# key strides: max(base key) + 1
def stride(name, col):
    return pc.max(pq.read_table(f"{src}/{name}.parquet").column(col)).as_py() + 1

CUST = stride("customer", "c_custkey")
ORD = stride("orders", "o_orderkey")
PART = stride("part", "p_partkey")
SUPP = stride("supplier", "s_suppkey")
DOC = stride("documents", "doc_id")
VEC = stride("embeddings", "vec_id")
EV = stride("events", "event_id")
USR = stride("events", "user_id")

copies("customer", lambda t, i: off(t, "c_custkey", CUST, i))
copies("orders", lambda t, i: off(off(t, "o_orderkey", ORD, i), "o_custkey", CUST, i))
copies("lineitem", lambda t, i: off(off(off(
    t, "l_orderkey", ORD, i), "l_partkey", PART, i), "l_suppkey", SUPP, i))
copies("part", lambda t, i: off(t, "p_partkey", PART, i))
copies("supplier", lambda t, i: off(t, "s_suppkey", SUPP, i))
copies("events", lambda t, i: off(off(t, "event_id", EV, i), "user_id", USR, i))

# nation/region: fixed inventories, copied verbatim
for name in ("nation", "region"):
    t = pq.read_table(f"{src}/{name}.parquet")
    pq.write_table(t, f"{dst}/{name}.parquet")
    print(f"{name}: {t.num_rows} (verbatim)")

def doc_copy(t, i):
    t = off(t, "doc_id", DOC, i)
    texts = t.column("text").to_pylist()
    # suffix only NON-empty tokens: consecutive/leading spaces split to
    # "" which the engine's tokenizers filter out — appending _i there
    # would mint tokens that exist in copies i>0 but not copy 0
    suffixed = [None if x is None else
                " ".join(w + f"_{i}" if w else w for w in x.split(" "))
                for x in texts]
    idx = t.schema.get_field_index("text")
    return t.set_column(idx, "text", pa.array(suffixed, pa.string()))

copies("documents", doc_copy)

def emb_copy(t, i):
    t = off(t, "vec_id", VEC, i)
    vecs = t.column("embedding").to_pylist()
    # rotation modulo the ACTUAL vector length — a fixed %64 would be
    # the identity for dims < the rotation amount, silently recreating
    # the cross-copy exact-duplicate cliques this exists to avoid
    rotated = [None if not v else v[(7 * i) % len(v):] + v[:(7 * i) % len(v)]
               for v in vecs]
    idx = t.schema.get_field_index("embedding")
    return t.set_column(idx, "embedding",
                        pa.array(rotated, t.schema.field("embedding").type))

copies("embeddings", emb_copy)
print("done:", dst)
