package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines —
  * exact, n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine
  * near-dup, all over the `documents` / `embeddings` tables.
  *
  * Scale posture (100 TB): every variant avoids the quadratic
  * all-pairs comparison. Exact dedup is one hash-aggregate shuffle on a
  * 128-bit digest (never on the full text). Near-dup variants shuffle
  * on *shingles/bands/buckets* so only colliding candidates are joined;
  * the candidate→verify funnel is the standard MinHash-LSH design
  * (Broder 1997; Leskovec et al., "Mining of Massive Datasets" ch. 3).
  */
object Dedup {

  /** Word 5-gram shingles, distinct per doc. Matches the DuckDB oracle
    * expression `list_transform(generate_series(...), i ->
    * array_to_string(w[i:i+4], ' '))` exactly (1-based, tail-clamped).
    */
  private def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, greatest(size(split(text, ' ')) - 4, 1))," +
            " i -> array_join(slice(split(text, ' '), i, 5), ' '))"))
          .as("sh"))
      .distinct()

  private val shingleOracleCte =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(generate_series(1, greatest(len(w) - 4, 1)),
      |                          i -> array_to_string(w[i:i+4], ' '))) AS sh
      |  FROM toks
      |)""".stripMargin

  /** jaccard = |A∩B| / |A∪B| from integer shingle counts — exact
    * rational arithmetic in double, bit-identical across engines. */
  private def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingles(docs).cache()
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // self-join on the shingle value: both sides are the full shingle
    // table — pin shuffle-hash so the near-threshold size estimate
    // never picks a broadcast of it
    val common = sh.as("a").hint("shuffle_hash")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("common"))
    common
      .join(broadcast(counts.as("ca")), col("da") === col("ca.doc_id"))
      .join(broadcast(counts.as("cb")), col("db") === col("cb.doc_id"))
      .select(col("da"), col("db"),
        (col("common").cast("double") /
          (col("ca.n") + col("cb.n") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- MinHash ----------------------------------------------------------

  /** 64 universal-hash permutations h_i(x) = (a_i·x + b_i) mod p over a
    * 64-bit shingle fingerprint; deterministic coefficients from a
    * splitmix-style generator so signatures are reproducible. */
  val MinhashK = 64
  val MinhashBands = 16 // 16 bands × 4 rows: catches jaccard ≳ 0.5
  private val MersennePrime = (1L << 61) - 1

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private[rel] val hashCoeffs: Array[(Long, Long)] =
    Array.tabulate(MinhashK) { i =>
      val a = (mix64(2L * i) & Long.MaxValue) % (MersennePrime - 1) + 1
      val b = (mix64(2L * i + 1) & Long.MaxValue) % MersennePrime
      (a, b)
    }

  /** FNV-1a 64-bit over UTF-8 bytes — stable shingle fingerprint. */
  private[rel] def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  private[rel] def minhashSignature(shingleHashes: Iterator[Long]): Array[Long] = {
    val sig = Array.fill(MinhashK)(Long.MaxValue)
    shingleHashes.foreach { x0 =>
      val x = x0 & Long.MaxValue
      var i = 0
      while (i < MinhashK) {
        val (a, b) = hashCoeffs(i)
        // (a*x + b) mod p via Math.multiplyHigh-free modmul on 61-bit prime
        val hv = modMul(a, x % MersennePrime) + b
        val h = if (hv >= MersennePrime) hv - MersennePrime else hv
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** (a*b) mod 2^61-1 without overflow, using 128-bit via Math.multiplyHigh. */
  private def modMul(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1: (hi*2^64 + lo) = hi*8*(2^61) + lo
    val part = ((hi << 3) | (lo >>> 61)) + (lo & MersennePrime)
    val r = (part & MersennePrime) + (part >>> 61)
    if (r >= MersennePrime) r - MersennePrime else r
  }

  /** doc_id → minhash signature, computed distributively:
    * shingle-explode → hash → groupBy(doc) with element-wise min over the
    * K lanes (a partial+final aggregate, no all-pairs anything). */
  def minhashSignatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val sigUdf = udf { (shs: Seq[String]) =>
      minhashSignature(shs.iterator.map(fnv1a64))
    }
    // collect_set is fine per-doc (shingle sets are small relative to the
    // text itself); signature computed once per doc.
    shingles(docs)
      .groupBy("doc_id")
      .agg(collect_set(col("sh")).as("shs"))
      .select(col("doc_id"), sigUdf(col("shs")).as("sig"))
  }

  /** LSH banding: candidate pairs share at least one (band, band-hash)
    * bucket; verified with exact Jaccard. Shuffle key = band bucket, so
    * cost scales with collisions, not n². */
  def minhashNearDup(spark: SparkSession, dir: String, threshold: Double): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sigs = minhashSignatures(spark, docs).cache()
    val rowsPerBand = MinhashK / MinhashBands
    val bandHash = udf { (sig: Seq[Long], band: Int) =>
      val sb = new StringBuilder
      var i = band * rowsPerBand
      val end = i + rowsPerBand
      while (i < end) { sb.append(sig(i)).append(','); i += 1 }
      fnv1a64(sb.toString)
    }
    val banded = sigs
      .select(col("doc_id"), explode(expr(s"sequence(0, ${MinhashBands - 1})")).as("band"), col("sig"))
      .select(col("doc_id"), col("band"), bandHash(col("sig"), col("band")).as("bucket"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    // verify candidates with exact jaccard on their shingle sets.
    // Candidates are the small side by construction (only colliding
    // pairs) — broadcast them explicitly so Spark never tries to
    // broadcast the big shingle table (its size estimate sits near the
    // 10MB threshold and flips the build side run to run).
    val sh = shingles(docs)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.as("sa")
      .join(broadcast(candidates), col("da") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("db") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy("da", "db").agg(count(lit(1)).as("common"))
    common
      .join(broadcast(counts.as("ca")), col("da") === col("ca.doc_id"))
      .join(broadcast(counts.as("cb")), col("db") === col("cb.doc_id"))
      .select(col("da"), col("db"),
        (col("common").cast("double") /
          (col("ca.n") + col("cb.n") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("da", "db")
  }

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit SimHash over word hashes (Charikar 2002): sign of the
    * per-bit weighted sum. Near-dups = small Hamming distance. */
  private[rel] def simhash64(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhashNearDup(spark: SparkSession, dir: String, maxHamming: Int): DataFrame = {
    // 4 x 16-bit blocks guarantee a shared block only for hamming <= 3
    // (pigeonhole); a larger radius would silently lose candidates
    require(maxHamming <= 3, s"4-block simhash supports maxHamming <= 3, got $maxHamming")
    val simUdf = udf { (text: String) =>
      simhash64(text.split(' ').toSeq.filter(_.nonEmpty))
    }
    val sigs = Tables.documents(spark, dir)
      .select(col("doc_id"), simUdf(col("text")).as("sim")).cache()
    // block on 4 × 16-bit chunks: hamming ≤ 3 guarantees one equal chunk
    val chunked = sigs.select(col("doc_id"), col("sim"),
      explode(expr("sequence(0, 3)")).as("c"))
      .withColumn("chunk", expr("(sim >> (c * 16)) & 65535"))
    val pairs = chunked.as("a")
      .join(chunked.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.sim").as("sa"), col("b.sim").as("sb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sa ^ sb)"))
      .filter(col("hamming") <= maxHamming)
      .select("da", "db", "hamming")
      .orderBy("da", "db")
    pairs
  }

  // ---- declared queries ---------------------------------------------------

  val all: Seq[Q] = Seq(
    // Exact dedup via content digest: one hash-aggregate, keeps the
    // smallest doc_id per distinct text (deterministic survivor).
    Q("d01_dedup_exact",
      """SELECT md5(text) AS digest, min(doc_id) AS keeper, count(*) AS copies
        |FROM documents GROUP BY md5(text) ORDER BY digest""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(md5(col("text")).as("digest"))
          .agg(min("doc_id").as("keeper"), count(lit(1)).as("copies"))
          .orderBy("digest")
    },

    // Subset-key dedup (dropDuplicates semantics made deterministic).
    Q("d02_dedup_subset",
      """SELECT lang, source, min(doc_id) AS keeper, count(*) AS n
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .groupBy("lang", "source")
          .agg(min("doc_id").as("keeper"), count(lit(1)).as("n"))
          .orderBy("lang", "source")
    },

    // Exact n-gram Jaccard near-dup pairs (the ground truth the LSH
    // variants approximate).
    Q("d03_ngram_jaccard",
      shingleOracleCte +
        """, cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
          |pairs AS (
          |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
          |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT da, db, common::DOUBLE / (ca.n + cb.n - common) AS jaccard
          |FROM pairs
          | JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
          |WHERE common::DOUBLE / (ca.n + cb.n - common) >= 0.8
          |ORDER BY da, db""".stripMargin) { (s, d) =>
      jaccardPairs(Tables.documents(s, d), 0.8).orderBy("da", "db")
    },

    // MinHash + LSH banding (engine-specific hashes — rows-only check;
    // the ScalaTest suite asserts it recovers exactly the d03 pairs).
    Q.noOracle("d04_minhash_lsh") { (s, d) => minhashNearDup(s, d, 0.8) },

    // SimHash near-dup (rows-only; spec-verified against d03).
    Q.noOracle("d05_simhash") { (s, d) => simhashNearDup(s, d, 3) },

    // Embedding-cosine near-dup: exact all-pairs at a threshold — the
    // ground-truth variant (the LSH paths d04/s02 are the scale path).
    // Executed as a broadcast block-compute: norms precomputed once per
    // vector (sequential double accumulation = the oracle's
    // list_sum order, bit-identical), corpus broadcast sorted by id,
    // each partition scans its rows against higher ids in a compiled
    // loop — no per-pair array allocation, no catalyst lambda overhead.
    Q("d06_embedding_neardup",
      """SELECT a.vec_id AS va, b.vec_id AS vb,
        | round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |         x -> x[1]::DOUBLE * x[2]::DOUBLE))
        |   / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
        |      * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))), 6)
        |   AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |         x -> x[1]::DOUBLE * x[2]::DOUBLE))
        |   / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
        |      * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))) >= 0.4
        |ORDER BY va, vb""".stripMargin) { (s, d) =>
      import s.implicits._
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
      // corpus + norms broadcast once (the exact variant is quadratic
      // by definition; at larger n the broadcast side becomes the
      // blocked dimension of a tiled cross join)
      val corpus = e.collect().sortBy(_._1)
      val norms = corpus.map { case (_, v) =>
        var ss = 0.0; var i = 0
        while (i < v.length) { ss += v(i).toDouble * v(i).toDouble; i += 1 }
        math.sqrt(ss)
      }
      val bc = s.sparkContext.broadcast((corpus, norms))
      val threshold = 0.4
      e.mapPartitions { rows =>
        val (corp, ns) = bc.value
        val ids = corp.map(_._1)
        rows.flatMap { case (ida, va) =>
          var na = 0.0
          var i = 0
          while (i < va.length) { na += va(i).toDouble * va(i).toDouble; i += 1 }
          val normA = math.sqrt(na)
          val start = java.util.Arrays.binarySearch(ids, ida + 1) match {
            case neg if neg < 0 => -neg - 1
            case pos => pos
          }
          (start until corp.length).iterator.flatMap { j =>
            val vb = corp(j)._2
            var dot = 0.0
            var k = 0
            while (k < va.length) { dot += va(k).toDouble * vb(k).toDouble; k += 1 }
            val c = dot / (normA * ns(j))
            if (c >= threshold) Iterator.single((ida, corp(j)._1, c))
            else Iterator.empty
          }
        }
      }.toDF("va", "vb", "c")
        .select(col("va"), col("vb"), round(col("c"), 6).as("cos"))
        .orderBy("va", "vb")
    }
  )
}
