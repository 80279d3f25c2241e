package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** p27c — incremental near-dup curation. The registry gate drains the
  * single-file corpus in one batch; these specs force a genuinely
  * multi-batch drain over a CRAFTED corpus that exercises every
  * cross-batch code path the batch DAG gets for free:
  *  - a near-dup arriving BATCHES AFTER its keeper (forward drop),
  *  - a SMALLER-id near-dup arriving after a doc that is already a
  *    keeper (retroactive drop — the reason orientation is doc_id,
  *    not arrival order),
  *  - a keeper REPLACEMENT that invalidates a previously recorded
  *    drop reason (the stale-signature case the snapshot's
  *    membership check exists for),
  * and a measurement pin that per-batch shuffle cost scales with the
  * batch, not the accumulated corpus state (the d16 discipline). */
class IncrementalCurationSpec extends SparkSpec {

  /** curationFinal's train-split bucket, replicated so fixture ids can
    * be drawn from the bucket < 8 shard (conv(substr(md5(id),1,8),16,10)
    * % 10 — first 4 md5 bytes of the decimal id string). */
  private def splitBucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(id.toString.getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % 10
  }

  /** 60 tokens that pass every gopher rule and the nh > ns quality
    * keep: 2 stopwords + "hash" + 57 distinct alpha words, mwl ≈ 5. */
  private def tokensFor(k: Long): Vector[String] =
    Vector("the", "and", "hash") ++ (0 until 57).map(i => s"w${k}x$i")

  /** Deterministic search for a FIRST-8 perturbation of `base` whose
    * simhash lands within Hamming 1..3 (a different head digest — so
    * exact dedup cannot catch it — that the near-dup stage must). The
    * replacement token keeps every gopher stat in range (alpha, not a
    * stopword, not hash/sort, similar length). */
  private def nearVariant(base: Vector[String]): Vector[String] = {
    val s0 = Dedup.simhash64(base)
    (0 until 1000).iterator.map { j =>
      base.updated(3, s"r${j}x0")
    }.find { cand =>
      val d = java.lang.Long.bitCount(s0 ^ Dedup.simhash64(cand))
      d >= 1 && d <= 3
    }.getOrElse(sys.error("no near variant within 1000 tries — " +
      "simhash vote margins degenerate for this fixture"))
  }

  /** The crafted cross-batch corpus: every id named, every Hamming ≤ 3
    * pair intended (loudly re-verified), plus the four-batch
    * partitioning that forces each cross-batch code path. */
  private case class Fixture(a: Long, c: Long, b: Long, d: Long,
      k1: Long, c2: Long, k0: Long, fillers: Vector[Long],
      docs: scala.collection.immutable.ListMap[Long, Vector[String]],
      batches: Seq[Seq[Long]])

  private def buildFixture(): Fixture = {
    // ids all from the train-split shard so every survivorship
    // decision is attributable to dedup stages, never the split
    val pool = (1L to 3000L).filter(splitBucket(_) < 8).toVector
    val a = pool(10); val c = pool(300)       // c > a, arrives 2 batches later
    val b = pool(200); val d = pool(2)        // d < b, arrives 2 batches later
    val k1 = pool(250); val c2 = pool(260)    // c2 near k1...
    val k0 = pool(4)                          // ...k0 replaces k1 last
    val used = Set(a, c, b, d, k1, c2, k0)
    val fillers = pool.slice(500, 530).filterNot(used)
    val docs = scala.collection.mutable.LinkedHashMap[Long, Vector[String]]()
    docs(a) = tokensFor(a)
    docs(c) = nearVariant(docs(a))
    docs(b) = tokensFor(b)
    docs(d) = nearVariant(docs(b))
    docs(k1) = tokensFor(k1)
    docs(c2) = nearVariant(docs(k1))
    // same head digest as k1 (identical first 8 tokens), different
    // tail -> replaces k1 in exact dedup with a DIFFERENT signature
    docs(k0) = docs(k1).take(8) ++ (0 until 52).map(i => s"z${k0}q$i")
    fillers.foreach(f => docs(f) = tokensFor(f))
    // fixture sanity, loud: the ONLY Hamming <= 3 pairs are the three
    // intended ones (random 60-token signatures sit ~32 bits apart;
    // anything else within 3 would make the case asserts unprovable)
    val sims = docs.view.mapValues(Dedup.simhash64).toMap
    val intended = Set((a, c), (b, d), (k1, c2)).flatMap {
      case (x, y) => Set((x, y), (y, x))
    }
    for (x <- docs.keys; y <- docs.keys if x < y)
      if (!intended((x, y)))
        require(java.lang.Long.bitCount(sims(x) ^ sims(y)) > 3,
          s"fixture degenerate: unintended near-pair ($x, $y)")
    val batches = Seq(
      Seq(a, k1) ++ fillers.slice(0, 8),
      Seq(b, c2) ++ fillers.slice(8, 16),
      Seq(c) ++ fillers.slice(16, 24),
      Seq(d, k0) ++ fillers.slice(24, 30))
    Fixture(a, c, b, d, k1, c2, k0, fillers,
      scala.collection.immutable.ListMap.from(docs), batches)
  }

  /** Append the given batches as part files with strictly increasing
    * mtimes (the file source drains oldest-first under
    * maxFilesPerTrigger=1); `firstIdx` keeps mtimes monotone across
    * two-phase writes. */
  private def writeBatches(fx: Fixture, src: String,
      batchIdxs: Seq[Int]): Unit = {
    import spark.implicits._
    val t0 = System.currentTimeMillis() - 3600 * 1000L
    def partFiles(): Set[java.io.File] =
      Option(new java.io.File(src).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).toSet
    batchIdxs.foreach { i =>
      val before = partFiles()
      fx.batches(i).map(id => (id, fx.docs(id).mkString(" ")))
        .toDF("doc_id", "text")
        .repartition(1).write.mode("append").parquet(src)
      (partFiles() -- before).foreach(f =>
        assert(f.setLastModified(t0 + i * 60000L)))
    }
  }

  test("p27c multi-batch: cross-batch drops, retroactive drops, and reason invalidation") {
    val fx = buildFixture()
    import fx._
    val root = java.nio.file.Files.createTempDirectory("p27c").toString
    writeBatches(fx, s"$root/documents.parquet", 0 until 4)
    val (got, dataBatches) = graft.streaming.Streaming
      .curationNearDupDrained(spark, root, maxFilesPerTrigger = Some(1))
    assert(dataBatches == 4,
      s"drained $dataBatches data micro-batches, expected 4")
    // contract: the incremental snapshot equals the batch p26c DAG
    // over the same corpus, for this (adversarial) batch partitioning
    val want = PipelineQueries.curationFinal(
        PipelineQueries.curationNearDupSurvivors(spark, root))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val gotRows = got.collect().map(_.toSeq).toSeq
    assert(gotRows == want, "incremental near-dup diverged from batch p26c")
    // the crafted cases, each named so a regression is attributable
    val ids = gotRows.map(_.head.asInstanceOf[Long]).toSet
    assert(ids(a) && !ids(c), "forward cross-batch near-dup not dropped")
    assert(ids(d) && !ids(b),
      "late-arriving smaller-id near-dup failed to retroactively drop")
    assert(!ids(k1), "replaced keeper survived")
    assert(ids(k0), "replacing keeper missing")
    assert(ids(c2),
      "reason invalidation failed: c2's only near keeper was replaced " +
        "by a far signature, so c2 must survive")
    assert(fillers.forall(ids), "a filler singleton was lost")
  }

  test("p27c restart: keeper/band/reason state survives a kill between drains, on both providers") {
    // the NearDupState deltas are marker-committed to the store per
    // batch, so a driver restart restores the fold exactly. Phase 1
    // drains the first two crafted batches and the query DIES (the hot
    // state is a local var of the drain call — gone); phase 2 appends
    // the two batches that retroactively drop phase-1 keepers and
    // re-drains from the SAME checkpoint + state root, so every
    // cross-batch decision (forward drop, retroactive drop, keeper
    // replacement + reason invalidation) is made against RESTORED
    // state. Final snapshot must equal the batch p26c DAG — the same
    // bar the single-run spec holds. Run on both state-store providers
    // (the house restart convention; p27c's own state rides the store,
    // not the provider, so this also pins provider-independence).
    val fx = buildFixture()
    import fx._
    val key = "spark.sql.streaming.stateStore.providerClass"
    for (provider <- Seq(None, Some("org.apache.spark.sql.execution." +
        "streaming.state.RocksDBStateStoreProvider"))) {
      val prev = spark.conf.getOption(key)
      provider.foreach(spark.conf.set(key, _))
      try {
        val root = java.nio.file.Files
          .createTempDirectory("p27c-restart").toString
        val src = s"$root/documents.parquet"
        val ckpt = Some(s"$root/ckpt")
        val stRoot = Some(s"$root/state")
        writeBatches(fx, src, Seq(0, 1))
        val (snap1, n1) = graft.streaming.Streaming.curationNearDupDrained(
          spark, root, maxFilesPerTrigger = Some(1), ckpt, stRoot)
        assert(n1 == 2, s"phase 1 drained $n1 data micro-batches, expected 2")
        val ids1 = snap1.collect().map(_.getLong(0)).toSet
        // phase-1 truth: b and k1 are still keepers (their dooms — d
        // and k0 — arrive after the restart)
        assert(ids1(b) && ids1(k1) && ids1(a) && !ids1(c2),
          s"phase-1 snapshot wrong: $ids1")
        writeBatches(fx, src, Seq(2, 3))
        val (snap2, n2) = graft.streaming.Streaming.curationNearDupDrained(
          spark, root, maxFilesPerTrigger = Some(1), ckpt, stRoot)
        assert(n2 == 2, s"phase 2 drained $n2 data micro-batches, expected 2")
        val got = snap2.collect().map(_.toSeq).toSeq
        val want = PipelineQueries.curationFinal(
            PipelineQueries.curationNearDupSurvivors(spark, root))
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("n_tokens")
              .cast("long").as("n_tokens"))
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
        val tag = provider.map(_ => "rocksdb").getOrElse("default")
        assert(got == want,
          s"restarted p27c ($tag) diverged from the batch p26c DAG")
        val ids = got.map(_.head.asInstanceOf[Long]).toSet
        assert(ids(a) && !ids(c), s"forward drop lost across restart ($tag)")
        assert(ids(d) && !ids(b),
          s"retroactive drop failed against restored state ($tag)")
        assert(!ids(k1) && ids(k0) && ids(c2),
          s"keeper replacement / reason invalidation broke across restart ($tag)")
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("p27c re-delivery of a committed batch no-ops on the marker") {
    import spark.implicits._
    val store = PipelineQueries.NearDupStore(java.nio.file.Files
      .createTempDirectory("p27c-redeliver").toString)
    val batch0 = (1L to 10L).map(i => (i, tokensFor(i).mkString(" ")))
      .toDF("doc_id", "text")
    val st0 = PipelineQueries.nearDupStep(store, None, 0L, batch0)
    val k0 = st0.keepers.collect().map(_.toSeq).toSet
    // the at-least-once retry: same batch id again — state unchanged,
    // and the step must not double-commit (still exactly one marker)
    val st1 = PipelineQueries.nearDupStep(store, Some(st0), 0L, batch0)
    assert(st1.keepers.collect().map(_.toSeq).toSet == k0)
    assert(store.committedIds(spark) == Seq(0L),
      "re-delivery created a second commit")
    // and a RESTARTED re-delivery (no hot state) restores, then no-ops
    val st2 = PipelineQueries.nearDupStep(store, None, 0L, batch0)
    assert(st2.keepers.collect().map(_.toSeq).toSet == k0)
  }

  test("p27c band probe prunes the stored index to the batch's band groups") {
    import spark.implicits._
    // two committed batches, then a probe for a strict subset of the
    // band groups: the scan must carry a static PartitionFilters
    // predicate on bgrp and list ONLY the probed groups' files — the
    // s15 discipline applied to the near-dup index (at 100 TB of
    // accumulated signatures the unpruned scan is the bill)
    val store = PipelineQueries.NearDupStore(java.nio.file.Files
      .createTempDirectory("p27c-prune").toString)
    val b0 = (1L to 40L).map(i => (i, tokensFor(i).mkString(" ")))
      .toDF("doc_id", "text")
    val b1 = (101L to 140L).map(i => (i, tokensFor(i).mkString(" ")))
      .toDF("doc_id", "text")
    val st0 = PipelineQueries.nearDupStep(store, None, 0L, b0)
    PipelineQueries.nearDupStep(store, Some(st0), 1L, b1)
    val allGrps = store.readBands(spark, (0 until 256).toSeq)
      .select("bucket").as[Long].collect()
      .map(b => (b >> 10).toInt).distinct.sorted
    assert(allGrps.length >= 2, "fixture spans too few band groups to prune")
    val probe = allGrps.take(allGrps.length / 2).toSeq
    val df = store.readBands(spark, probe)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bgrp"),
      s"probe scan carries no bgrp partition predicate:\n$plan")
    // file-listing proof, stronger than the plan string: every file
    // the pruned scan will ACTUALLY read (post-prune selection —
    // df.inputFiles lists the whole index and can't prove this) lives
    // under a probed bgrp= directory
    val files = org.apache.spark.sql.GraftBridge.prunedInputFiles(df)
    assert(files.nonEmpty)
    val probed = probe.map(g => s"bgrp=$g/").toSet
    assert(files.forall(f => probed.exists(f.contains)),
      s"pruned probe read an unprobed partition:\n${files.mkString("\n")}")
    // and the pruned result equals the full read filtered after the fact
    val want = store.readBands(spark, (0 until 256).toSeq)
      .filter((org.apache.spark.sql.functions.shiftright(
        org.apache.spark.sql.functions.col("bucket"), 10))
        .isin(probe.map(_.toLong): _*))
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == want)
  }

  test("p27c compaction folds the store without changing any answer") {
    // the s23 discipline applied to the near-dup state: readBands'
    // union fan-in and restore's dir count grow with batch count until
    // compact() folds base+deltas into one base_<maxId>/ tree. Fold
    // after the second crafted batch, continue the stream over the
    // folded store, and hold the exact bars of the uncompacted runs:
    // final snapshot = batch p26c DAG, all three crafted cross-batch
    // cases, restart-restore equality, folded-batch re-delivery no-op.
    val fx = buildFixture()
    import fx._
    val root = java.nio.file.Files.createTempDirectory("p27c-compact").toString
    val src = s"$root/documents.parquet"
    val store = PipelineQueries.NearDupStore(s"$root/state")
    import org.apache.spark.sql.functions.{col => fcol}
    def batchDf(i: Int) = {
      import spark.implicits._
      fx.batches(i).map(id => (id, fx.docs(id).mkString(" ")))
        .toDF("doc_id", "text")
    }
    var st = Option(PipelineQueries.nearDupStep(store, None, 0L, batchDf(0)))
    st = Some(PipelineQueries.nearDupStep(store, st, 1L, batchDf(1)))
    store.compact(spark)
    assert(store.baseId(spark) == 1L && store.committedIds(spark).isEmpty,
      "fold did not supersede the batch dirs")
    // folded-batch re-delivery: still a no-op (id <= baseId)
    val afterRedeliver = PipelineQueries.nearDupStep(store, st, 0L, batchDf(0))
    assert(afterRedeliver.keepers.count() == st.get.keepers.count(),
      "re-delivery of a folded batch mutated state")
    // the probe through the base still prunes (PartitionFilters on the
    // base tree's bgrp dirs)
    val probed = store.readBands(spark, Seq(0, 1, 2, 3))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bgrp"), plan)
    // continue the stream over the folded store
    st = Some(PipelineQueries.nearDupStep(store, st, 2L, batchDf(2)))
    // a second fold mid-stream (base + one delta) — the repeated-fold
    // path cleans the OLD base too
    store.compact(spark)
    assert(store.baseId(spark) == 2L)
    st = Some(PipelineQueries.nearDupStep(store, st, 3L, batchDf(3)))
    writeBatches(fx, src, 0 until 4) // batch oracle corpus
    val want = PipelineQueries.curationFinal(
        PipelineQueries.curationNearDupSurvivors(spark, root))
      .select(fcol("doc_id"), fcol("n_tokens").cast("long").as("n_tokens"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    def snap(state: PipelineQueries.NearDupState) =
      PipelineQueries.nearDupSnapshot(state)
        .select(fcol("doc_id"), fcol("n_tokens").cast("long").as("n_tokens"))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(snap(st.get) == want,
      "compacted-store snapshot diverged from the batch p26c DAG")
    // restart-restore from the compacted store (hot state dropped)
    val restored = store.restore(spark).getOrElse(
      fail("restore found nothing in the compacted store"))
    assert(snap(restored) == want,
      "restore from a compacted store diverged")
    val ids = snap(restored).map(_.head.asInstanceOf[Long]).toSet
    assert(ids(a) && !ids(c) && ids(d) && !ids(b) &&
      !ids(k1) && ids(k0) && ids(c2),
      "a crafted cross-batch case broke across compaction")
  }

  test("p27c live-stream compaction: folding mid-drain changes nothing") {
    // the step-level fold is pinned above; this drives compact()
    // through the REAL streaming loop (compactEvery=2 folds after
    // batches 2 and 4 while the query is live) and holds the same
    // bars as the uncompacted multi-batch drain — the production
    // shape, where maintenance runs on a cadence inside the pipeline
    val fx = buildFixture()
    import fx._
    val root = java.nio.file.Files.createTempDirectory("p27c-live").toString
    writeBatches(fx, s"$root/documents.parquet", 0 until 4)
    val stRoot = s"$root/state"
    val (got, dataBatches) = graft.streaming.Streaming.curationNearDupDrained(
      spark, root, maxFilesPerTrigger = Some(1),
      stateRoot = Some(stRoot), compactEvery = Some(2))
    assert(dataBatches == 4)
    val store = PipelineQueries.NearDupStore(stRoot)
    assert(store.baseId(spark) == 3L,
      s"expected the last fold at batch id 3, got base ${store.baseId(spark)}")
    assert(store.committedIds(spark).isEmpty,
      "folded delta dirs still listed as unfolded")
    val want = PipelineQueries.curationFinal(
        PipelineQueries.curationNearDupSurvivors(spark, root))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got.collect().map(_.toSeq).toSeq == want,
      "live-compacted drain diverged from the batch p26c DAG")
    // and a restart-restore from the twice-folded store agrees too
    val restored = store.restore(spark).getOrElse(
      fail("nothing restorable from the live-compacted store"))
    val snap = PipelineQueries.nearDupSnapshot(restored)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(snap == want)
  }

  test("p27c compaction crash-safety: a crash at either publish boundary leaves a readable store") {
    import spark.implicits._
    // the scaladoc argues a crash ANYWHERE in compact leaves a
    // readable store; this injects the two interesting crashes and
    // holds it. Fixture: two committed batches with a cross-batch
    // near-dup (y arrives a batch after its keeper x).
    val pool = (1L to 300L).filter(splitBucket(_) < 8)
    val (x, y, z) = (pool(0), pool(5), pool(9))
    val base = tokensFor(x)
    def df(rows: Seq[(Long, Vector[String])]) =
      rows.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
    val store = PipelineQueries.NearDupStore(java.nio.file.Files
      .createTempDirectory("p27c-crash").toString)
    val st0 = PipelineQueries.nearDupStep(store, None, 0L,
      df(Seq((x, base), (z, tokensFor(z)))))
    val st1 = PipelineQueries.nearDupStep(store, Some(st0), 1L,
      df(Seq((y, nearVariant(base)))))
    def snapIds(st: PipelineQueries.NearDupState): Set[Long] =
      PipelineQueries.nearDupSnapshot(st)
        .select("doc_id").as[Long].collect().toSet
    val want = snapIds(st1)
    assert(want.contains(x) && !want.contains(y) && want.contains(z),
      s"fixture broken before any crash: $want")
    // CRASH 1: base trees written, marker NOT — the fold must be
    // invisible: readers still see the uncompacted layout, restore
    // still equals the hot state, and a re-run compact converges
    intercept[RuntimeException] { store.compact(spark, failpoint = 1) }
    assert(store.baseId(spark) == -1L,
      "a marker-less fold became visible")
    assert(store.committedIds(spark) == Seq(0L, 1L),
      "batch deltas disappeared before the fold published")
    assert(snapIds(store.restore(spark).get) == want,
      "restore diverged after the pre-marker crash")
    store.compact(spark)
    assert(store.baseId(spark) == 1L && store.committedIds(spark).isEmpty,
      "the re-run fold did not converge")
    assert(snapIds(store.restore(spark).get) == want)
    // CRASH 2: marker landed, cleanup skipped — the fold is LIVE
    // (readers use the new base, folded ids re-deliver as no-ops) and
    // the stranded dirs are reclaimed by the next compact's sweep,
    // even when that compact has nothing to fold
    val st2 = PipelineQueries.nearDupStep(store,
      Some(store.restore(spark).get), 2L,
      df(Seq((pool(12), tokensFor(pool(12))))))
    intercept[RuntimeException] { store.compact(spark, failpoint = 2) }
    assert(store.baseId(spark) == 2L,
      "the post-marker crash lost the published fold")
    assert(store.committedIds(spark).isEmpty)
    assert(snapIds(store.restore(spark).get) == snapIds(st2),
      "restore diverged after the post-marker crash")
    val strands = new java.io.File(store.root).list().toSet
    assert(strands.exists(_.startsWith("batch_")) &&
      strands.contains("base_1"),
      s"fixture never stranded anything: $strands")
    store.compact(spark) // nothing unfolded — but the sweep still runs
    val after = new java.io.File(store.root).list().toSet
    assert(!after.exists(_.startsWith("batch_")) && !after.contains("base_1"),
      s"stranded dirs survived the sweep: $after")
    assert(snapIds(store.restore(spark).get) == snapIds(st2),
      "the sweep changed an answer")
  }

  test("p27c hot state survives an immediate fold (compactEvery=1)") {
    import spark.implicits._
    // the r11 hazard: batch-0 hot state backed by batch_0/ file scans
    // would dangle when compact() deletes the dir right after the
    // first batch. Hot state is now in-memory cuts by construction —
    // fold immediately, then drive every consumer of the OLD hot
    // state (next step's probes, the snapshot) against the folded
    // store.
    val pool = (1L to 300L).filter(splitBucket(_) < 8)
    val (x, y, z) = (pool(0), pool(5), pool(9))
    val base = tokensFor(x)
    val store = PipelineQueries.NearDupStore(java.nio.file.Files
      .createTempDirectory("p27c-every1").toString)
    val st0 = PipelineQueries.nearDupStep(store, None, 0L,
      Seq((x, base.mkString(" ")), (z, tokensFor(z).mkString(" ")))
        .toDF("doc_id", "text"))
    store.compact(spark) // deletes batch_0/ — the r11 dangling point
    val st1 = PipelineQueries.nearDupStep(store, Some(st0), 1L,
      Seq((y, nearVariant(base).mkString(" "))).toDF("doc_id", "text"))
    val ids = PipelineQueries.nearDupSnapshot(st1)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.contains(x) && !ids.contains(y) && ids.contains(z),
      s"hot state dangled (or the fold lost rows) under compactEvery=1: $ids")
  }

  test("p27c run-scoped drains leave no state root behind") {
    // the registry gate (stateRoot = None) creates a temp store per
    // call; the bench runs the gate up to 5 times per invocation, so
    // a leaked root is unbounded growth in /tmp across invocations
    val fx = buildFixture()
    val root = java.nio.file.Files.createTempDirectory("p27c-noleak").toString
    writeBatches(fx, s"$root/documents.parquet", 0 until 4)
    def stateRoots(): Set[String] = {
      val tmp = new java.io.File(
        System.getProperty("java.io.tmpdir", "/tmp"))
      Option(tmp.list()).getOrElse(Array.empty)
        .filter(_.startsWith("p27c-state")).toSet
    }
    val before = stateRoots()
    val (got, _) = graft.streaming.Streaming.curationNearDupDrained(
      spark, root, maxFilesPerTrigger = None)
    assert(got.count() > 0)
    assert(stateRoots() == before,
      s"drain leaked state roots: ${stateRoots() -- before}")
  }

  test("p27c tolerates a leading batch with zero keepers") {
    import spark.implicits._
    // every doc in batch 0 fails the gopher length rule (< 50 words),
    // so no added/band delta is written; batch 1's probe must see an
    // EMPTY index, not a missing-dir error, and the near-dup logic
    // must still fire within batch 1 itself
    val store = PipelineQueries.NearDupStore(java.nio.file.Files
      .createTempDirectory("p27c-empty").toString)
    val junk = (900L to 905L).map(i => (i, "too short"))
      .toDF("doc_id", "text")
    val st0 = PipelineQueries.nearDupStep(store, None, 0L, junk)
    assert(st0.keepers.count() == 0)
    // ids from the train-split shard so survivorship is dedup-decided
    val pool = (1L to 200L).filter(splitBucket(_) < 8)
    val (x, y, z) = (pool(0), pool(5), pool(9))
    val base = tokensFor(x)
    val good = Seq((x, base), (y, nearVariant(base)), (z, tokensFor(z)))
      .map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val st1 = PipelineQueries.nearDupStep(store, Some(st0), 1L, good)
    val snap = PipelineQueries.nearDupSnapshot(st1)
      .select("doc_id").as[Long].collect().toSet
    // y is a Hamming<=3 near-dup of keeper x (same-batch pair through
    // the empty-index path); z survives; the junk never appears
    assert(snap.contains(x) && !snap.contains(y) && snap.contains(z),
      s"snapshot wrong after empty leading batch: $snap")
  }

  test("p27c per-batch shuffle scales with the batch, not the accumulated state") {
    import spark.implicits._
    // same batch stepped into a 1x and a 10x state: the d16 discipline
    // says state is only ever SCANNED into broadcast probes, so the
    // step's shuffled bytes must track the batch (the dg aggregate +
    // the band-bucket groups), not the corpus. 10x state / same batch
    // -> shuffle within 2x (slack for the slivered bucket overlap),
    // while a state-shuffling regression would show ~10x.
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffled.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
    def corpus(n: Int) =
      (0 until n).map(i => (1000L + i, tokensFor(1000L + i).mkString(" ")))
        .toDF("doc_id", "text")
    val batch = (1L to 20L).map(i => (i, tokensFor(i).mkString(" ")))
      .toDF("doc_id", "text")
    def stepShuffle(stateDocs: Int): Long = {
      val store = PipelineQueries.NearDupStore(java.nio.file.Files
        .createTempDirectory("p27c-shuffle").toString)
      val st0 = PipelineQueries.nearDupStep(store, None, 0L, corpus(stateDocs))
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      spark.sparkContext.addSparkListener(l)
      shuffled.set(0L)
      try {
        PipelineQueries.nearDupStep(store, Some(st0), 1L, batch)
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        shuffled.get
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val small = stepShuffle(200)
    val big = stepShuffle(2000)
    assert(big > 0 && small > 0, s"no shuffle measured ($small, $big)")
    assert(big.toDouble / small < 2.0,
      s"per-batch shuffle grew with state size: $small -> $big bytes " +
        "for 10x state and an identical batch")
  }

  test("p28: inventory audit survives stray staging dirs, _temporary " +
    "trees, and mtime perturbation between the writes") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("p28-audit").toString
    val out = new org.apache.hadoop.fs.Path(root, "table")
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(("a", 1), ("a", 2), ("b", 3))
      .toDF("day", "v").write.partitionBy("day").parquet(out.toString)
    val before = PipelineQueries.partitionInventory(fs, out)
    assert(before.keySet == Set("day=a", "day=b"))

    // exactly the driver-flake mechanism: a not-yet-reaped staging
    // dir, a _temporary tree, a stray hidden file inside a partition,
    // and an mtime bump on the untouched partition's part files —
    // none of which is a data change
    fs.mkdirs(new org.apache.hadoop.fs.Path(out, ".spark-staging-x"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(out, "_temporary/0/task"))
    fs.create(new org.apache.hadoop.fs.Path(out, "day=b/.part-x.crc"))
      .close()
    fs.listStatus(new org.apache.hadoop.fs.Path(out, "day=b"))
      .filter(_.getPath.getName.startsWith("part-"))
      .foreach(f => fs.setTimes(f.getPath, f.getModificationTime + 5000, -1))

    // dynamic overwrite of day=a only (the backfill shape)
    Seq(("a", 9)).toDF("day", "v").write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(out.toString)
    val after = PipelineQueries.partitionInventory(fs, out)

    assert(after.keySet == Set("day=a", "day=b"),
      s"staging/_temporary dirs leaked into the inventory: ${after.keySet}")
    assert(before("day=b") == after("day=b"),
      "untouched partition's inventory changed under mtime/crc noise")
    assert(before("day=a") != after("day=a"),
      "rewritten partition's inventory did not register the rewrite")
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }

  // -- the round-13 hardening: the audit itself retries and diagnoses --

  private val inv0: Map[String, Set[(String, Long)]] = Map(
    "day=a" -> Set(("part-0-uuid1.parquet", 100L)),
    "day=b" -> Set(("part-0-uuid2.parquet", 200L)))
  // a genuine backfill of day=a: new write-unique part name
  private val invRewritten: Map[String, Set[(String, Long)]] =
    inv0 + ("day=a" -> Set(("part-0-uuid9.parquet", 104L)))

  test("p28: a listing that lies once then heals keeps the flags at (1,1)") {
    // first post-rewrite listing shows day=b perturbed (transient
    // noise — the driver-flake shape); the re-list after the quiesce
    // shows the true state. The audit must NOT let the lie stand.
    val lying = Iterator(
      invRewritten + ("day=b" -> Set(("part-0-TRANSIENT.parquet", 7L))),
      invRewritten)
    var quiesced = 0
    val diags = scala.collection.mutable.ListBuffer.empty[String]
    val flags = PipelineQueries.auditBackfill(
      inv0, () => lying.next(), "day=a",
      quiesce = () => { quiesced += 1; () }, diag = diags += _)
    assert(flags == ((true, true)),
      s"transient listing noise flipped the audit flags: $flags")
    assert(quiesced == 1, "the retry must quiesce exactly once")
    assert(diags.exists(_.contains("healed")),
      s"the healed retry must be diagnosed on stderr: $diags")
  }

  test("p28: a persistent foreign rewrite reads 0 and prints its diff") {
    // day=b was REALLY rewritten by someone else: both listings agree,
    // the flag must read 0, and the exact differing entries must be
    // printed so the driver log carries the mechanism
    val foreign =
      invRewritten + ("day=b" -> Set(("part-0-FOREIGN.parquet", 201L)))
    val diags = scala.collection.mutable.ListBuffer.empty[String]
    val flags = PipelineQueries.auditBackfill(
      inv0, () => foreign, "day=a",
      quiesce = () => (), diag = diags += _)
    assert(flags == ((false, true)), s"foreign rewrite not detected: $flags")
    assert(diags.exists(_.contains("PERSISTENT")),
      s"persistent diff header missing: $diags")
    assert(diags.exists(d => d.contains("day=b") &&
        d.contains("part-0-uuid2.parquet") && d.contains("-(")),
      s"removed entry not printed: $diags")
    assert(diags.exists(d => d.contains("day=b") &&
        d.contains("part-0-FOREIGN.parquet") && d.contains("+(")),
      s"added entry not printed: $diags")
  }

  test("p28: an un-replaced target partition diagnoses itself") {
    val diags = scala.collection.mutable.ListBuffer.empty[String]
    val flags = PipelineQueries.auditBackfill(
      inv0, () => inv0, "day=a", quiesce = () => (), diag = diags += _)
    assert(flags == ((true, false)), flags)
    assert(diags.exists(d => d.contains("day=a") && d.contains("NOT replaced")),
      s"un-replaced target not diagnosed: $diags")
  }

  test("p28: stableInventory re-lists until two consecutive reads agree") {
    val seq = Iterator(
      inv0 + ("day=b" -> Set.empty[(String, Long)]), // racy first read
      inv0, inv0)
    val stable = PipelineQueries.stableInventory(
      () => seq.next(), quiesce = () => ())
    assert(stable == inv0, s"stabilized read wrong: $stable")
  }
}
