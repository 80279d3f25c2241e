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

  test("p27c multi-batch: cross-batch drops, retroactive drops, and reason invalidation") {
    import spark.implicits._
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
    // four batches as four part files with strictly increasing mtimes
    // (the file source drains oldest-first under maxFilesPerTrigger=1)
    val root = java.nio.file.Files.createTempDirectory("p27c").toString
    val src = s"$root/documents.parquet"
    val batches = Seq(
      Seq(a, k1) ++ fillers.slice(0, 8),
      Seq(b, c2) ++ fillers.slice(8, 16),
      Seq(c) ++ fillers.slice(16, 24),
      Seq(d, k0) ++ fillers.slice(24, 30))
    val t0 = System.currentTimeMillis() - 3600 * 1000L
    def partFiles(): Set[java.io.File] =
      Option(new java.io.File(src).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).toSet
    batches.zipWithIndex.foreach { case (ids, i) =>
      val before = partFiles()
      ids.map(id => (id, docs(id).mkString(" ")))
        .toDF("doc_id", "text")
        .repartition(1).write.mode("append").parquet(src)
      (partFiles() -- before).foreach(f =>
        assert(f.setLastModified(t0 + i * 60000L)))
    }
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
      val st0 = PipelineQueries.nearDupStep(None, corpus(stateDocs))
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      spark.sparkContext.addSparkListener(l)
      shuffled.set(0L)
      try {
        PipelineQueries.nearDupStep(Some(st0), batch)
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
}
