package graft.streaming

import graft.SparkSpec
import graft.rel.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  import Streaming._

  test("windowed agg on a stream equals the batch plan on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val batch = Tables.events(spark, sfDir).limit(500).cache()
    val rows = batch.select("event_id", "user_id", "ts", "event_type", "value")
      .as[EventRow].collect()

    val stream = MemoryStream[EventRow]
    stream.addData(rows.toSeq)
    val q = windowedTypeCounts(stream.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("win_counts")
      .select("window_start", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet
    val batched = windowedTypeCounts(batch).collect().map(_.toSeq).toSet
    assert(streamed == batched)
    assert(streamed.nonEmpty)
  }

  test("p12: file-stream AvailableNow execution equals the batch plan") {
    val streamed = windowedTypeCountsStreamed(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val batch = Tables.events(spark, sfDir)
    val batched = windowedTypeCounts(batch)
      .withColumn("window_start",
        date_format(col("window_start"), "yyyy-MM-dd HH:00"))
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batched, "incremental result diverged from batch")
    assert(streamed.nonEmpty)
    // the sink's temp view must not leak into the catalog
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("p12_sink_")))
  }

  test("p16: incremental stream-stream join equals the batch attribution join") {
    val streamed = attributionJoinStreamed(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val ev = Tables.events(spark, sfDir)
    val batched = attributionJoin(
        ev.filter(col("event_type") === "click" && col("user_id").isNotNull),
        ev.filter(col("event_type") === "purchase" && col("user_id").isNotNull))
      .select(col("purchase_id"), col("user_id"),
        unix_micros(col("purchase_ts")).as("purchase_ts_us"),
        col("click_id"), unix_micros(col("click_ts")).as("click_ts_us"))
      .orderBy("purchase_id", "click_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batched, "incremental join diverged from batch")
    assert(streamed.nonEmpty)
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("p16_sink_")))
  }

  test("streamed queries accept the DIRECTORY events.parquet layout (part-files inside)") {
    // the layout the ADVICE fix added a branch for: a Spark-written
    // events.parquet DIRECTORY, where the single-file pathGlobFilter
    // would match nothing and silently drain zero rows. All three
    // streamed registry queries must produce the same answers they
    // give on the driver's single-file layout.
    val dir = java.nio.file.Files.createTempDirectory("events-dirlayout")
      .toString
    Tables.events(spark, sfDir).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    def rows(f: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame, d: String) =
      f(spark, d).collect().map(_.toSeq).toSeq
    assert(rows(windowedTypeCountsStreamed, dir) ==
      rows(windowedTypeCountsStreamed, sfDir), "p12 diverged on dir layout")
    assert(rows(attributionJoinStreamed, dir) ==
      rows(attributionJoinStreamed, sfDir), "p16 diverged on dir layout")
    assert(rows(streamedKeyDedup, dir) ==
      rows(streamedKeyDedup, sfDir), "p17 diverged on dir layout")
  }

  test("p17: incremental streamed dedup equals exact DISTINCT on the key set") {
    val streamed = streamedKeyDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val batched = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(streamed == batched, "streamed dedup diverged from DISTINCT")
    assert(streamed.nonEmpty)
    // duplicates existed: the stream really deduplicated
    val total = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull).count()
    assert(total > streamed.size, "no duplicates in the corpus — dedup untested")
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("p17_sink_")))
  }

  test("p16/p17: streaming state is watermark-bounded (post-eviction rows << input)") {
    // the 100 TB claim of the streaming tier, pinned on the engine's
    // own progress metrics instead of asserted structurally: after the
    // AvailableNow drain (whose final batch advances the watermark and
    // runs eviction), the stateful operators must hold strictly fewer
    // rows than the source ingested — state tracks the watermark
    // horizon, never history.
    val (_, joinStats) = attributionJoinDrained(spark, sfDir)
    assert(joinStats.inputRows > 0, "p16 drained no input")
    assert(joinStats.stateRows < joinStats.inputRows,
      s"p16 join state (${joinStats.stateRows}) did not evict below " +
        s"input (${joinStats.inputRows}) — watermark eviction broken")
    val (_, dedupStats) = keyDedupDrained(spark, sfDir)
    assert(dedupStats.inputRows > 0, "p17 drained no input")
    assert(dedupStats.stateRows < dedupStats.inputRows,
      s"p17 dedup state (${dedupStats.stateRows}) did not evict below " +
        s"input (${dedupStats.inputRows}) — watermark eviction broken")
  }

  test("p23: marker protocol survives re-delivery AND crash-before-commit") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("p23-spec").toString
    val batch = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull)
      .select("event_id", "event_type").limit(100).cache()
    val n = batch.count()
    // first delivery commits
    assert(commitBatchIdempotent(batch.toDF(), 7L, out), "first delivery must commit")
    // re-delivery (the at-least-once retry) must no-op, not duplicate
    assert(!commitBatchIdempotent(batch.toDF(), 7L, out), "re-delivery must no-op")
    assert(readCommitted(spark, out).count() == n)
    // crash BEFORE the marker: partial garbage in the batch dir, no
    // marker — invisible to readers, and the retry overwrites it fully
    batch.limit(10).write.mode("overwrite").parquet(s"$out/batch_9")
    assert(readCommitted(spark, out).count() == n,
      "uncommitted batch directory leaked into the read")
    assert(commitBatchIdempotent(batch.toDF(), 9L, out),
      "retry after crash-before-commit must commit")
    assert(readCommitted(spark, out).count() == 2 * n,
      "retry did not overwrite the partial crash output")
  }

  test("p23/p25: a batch killed MID-WRITE is invisible at every snapshot version") {
    // failure injection for the marker protocol: batches 0 and 2
    // commit; batch 1 "crashes" between them mid-write — its directory
    // holds a partial row subset plus a stray in-flight temp file, and
    // NO marker ever appears. Readers at EVERY version (latest and
    // each as-of) must see nothing from it; the retry then overwrites
    // the garbage wholesale and publishes atomically.
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("p23-crash").toString
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull && col("event_id").isNotNull)
      .select("event_id", "event_type").limit(300).cache()
    def slice(b: Long) = ev.filter(col("event_id") % 3 === b)
    val Seq(n0, n1, n2) = (0L to 2L).map(slice(_).count())
    assert(n1 > 10, "fixture too small for a meaningful partial write")
    assert(commitBatchIdempotent(slice(0).toDF(), 0L, out))
    // the mid-write kill: a partial prefix of batch 1 + an in-flight
    // temp artifact, no marker
    slice(1).limit(10).write.mode("overwrite").parquet(s"$out/batch_1")
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(out, "batch_1", "part-00007.snappy.parquet.tmp"))
    assert(commitBatchIdempotent(slice(2).toDF(), 2L, out))
    // every version: the orphan contributes NOTHING
    assert(readCommittedAsOf(spark, out, 0L).count() == n0,
      "version 0 leaked rows from the uncommitted batch")
    assert(readCommittedAsOf(spark, out, 1L).count() == n0,
      "version 1 must equal version 0 while batch 1 is uncommitted")
    assert(readCommittedAsOf(spark, out, 2L).count() == n0 + n2,
      "version 2 leaked rows from the uncommitted batch")
    assert(readCommitted(spark, out).count() == n0 + n2,
      "the latest reader leaked rows from the uncommitted batch")
    // retry: overwrites the partial directory COMPLETELY and commits
    assert(commitBatchIdempotent(slice(1).toDF(), 1L, out),
      "retry after the mid-write kill must commit")
    assert(readCommittedAsOf(spark, out, 1L).count() == n0 + n1,
      "retried batch must replace the partial write, not append to it")
    assert(readCommitted(spark, out).count() == n0 + n1 + n2)
    // and version 0 is still immutable history
    assert(readCommittedAsOf(spark, out, 0L).count() == n0)
  }

  test("p21: incremental custom-state sessionization equals batch gaps-and-islands") {
    import org.apache.spark.sql.expressions.Window
    val (streamed, st) = sessionizeDrained(spark, sfDir)
    val got = streamed.collect().map(_.toSeq).toSeq
    // batch gaps-and-islands with the same eventRows null exclusion
    val gap = graft.rel.PipelineQueries.SessionGapMs
    val e = eventRows(Tables.events(spark, sfDir)).toDF()
      .select(col("user_id"), unix_millis(col("ts")).as("t"))
    val w = Window.partitionBy("user_id").orderBy("t")
    val want = e.withColumn("prev", lag("t", 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("t") - col("prev") > gap, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(w))
      .groupBy("user_id", "sid")
      .agg(min("t").as("session_start"), max("t").as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start")
      .collect().map(_.toSeq).toSeq
    assert(got == want, "incremental sessionization diverged from batch")
    assert(got.nonEmpty)
    // custom state is watermark-bounded: at most one open session per
    // user survives the drain (timeout eviction covers the rest)
    val users = e.select("user_id").distinct().count()
    assert(st.stateRows <= users,
      s"p21 state (${st.stateRows}) exceeds active users ($users)")
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("p21_sink_")))
  }

  // ---- restart-from-checkpoint (a REAL stop between AvailableNow
  // drains, phase 2 resumes from the SAME checkpoint) ------------------

  /** Two-phase harness: write the time-earlier half of events, drain
    * it (phase 1), STOP, append the later half to the source dir,
    * restart the same pipeline from the SAME checkpoint (phase 2).
    * Returns (phase1 rows, phase2 rows, full batch frame, part2 count,
    * phase2 drained-input count, cut micros). Splitting by TIME (not
    * id) keeps part 2 ahead of the restored watermark, so engine/batch
    * parity is exact — no late-drop asymmetry.  */
  private def restartDrain(tag: String,
      cutOverride: Option[Long] = None)(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: org.apache.spark.sql.streaming.OutputMode)
      : (Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row],
         org.apache.spark.sql.DataFrame, Long, Long, Long) = {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files
      .createTempDirectory(s"restart_$tag").toString
    val base = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "event_type", "value")
      .cache()
    val cut = cutOverride.getOrElse {
      val times = base.select(unix_micros(col("ts")).as("t"))
        .orderBy("t").collect().map(_.getLong(0))
      times(times.length / 2)
    }
    val part1 = base.filter(unix_micros(col("ts")) <= cut)
    val part2 = base.filter(unix_micros(col("ts")) > cut)
    val n2 = part2.count()
    assert(part1.count() > 0 && n2 > 0, "degenerate time split")
    val src = s"$root/events"
    part1.write.mode("overwrite").parquet(src)
    val sch = spark.read.parquet(src).schema
    val ckpt = s"$root/ckpt"
    val outDir = s"$root/out"
    // sink choice follows recoverability: an append-mode MEMORY sink
    // refuses checkpoint recovery, so the append classes write a real
    // parquet sink (the production restart shape — the _spark_metadata
    // commit log is what makes the restart exactly-once); complete
    // mode keeps the memory sink (its restart re-emits the full
    // restored snapshot, which is the thing under test)
    val isComplete = mode == org.apache.spark.sql.streaming.OutputMode.Complete()
    def sinkRows(): Seq[org.apache.spark.sql.Row] =
      spark.read.parquet(outDir).collect().toSeq
    def drain(phase: Int): (Seq[org.apache.spark.sql.Row], Long) = {
      val name = s"restart_${tag}_$phase"
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val writer0 = build(spark.readStream.schema(sch).parquet(src))
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
      val writer =
        if (isComplete) writer0.format("memory").queryName(name)
        else writer0.format("parquet").option("path", outDir)
      val q =
        try writer.start()
        catch { case e: Throwable =>
          spark.conf.set("spark.sql.shuffle.partitions", prevParts); throw e
        }
      try {
        try q.awaitTermination()
        finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        val rows =
          if (isComplete) spark.table(name).collect().toSeq else sinkRows()
        (rows, drainStats(q).inputRows)
      } finally {
        if (q.isActive) q.stop()
        if (isComplete) spark.catalog.dropTempView(name)
      }
    }
    val (all1, in1) = drain(1)
    assert(in1 > 0, "phase 1 drained no input")
    // the stop is REAL: phase 1's query object is gone; only the
    // checkpoint carries its offsets, watermark, and operator state
    part2.write.mode("append").parquet(src)
    val (all2, in2) = drain(2)
    // append classes: the file sink accumulates, so phase-2-emitted
    // rows = multiset difference; complete mode: each phase IS a
    // snapshot already
    val r2 = if (isComplete) all2 else all2.diff(all1)
    (all1, r2, base, n2, in2, cut)
  }

  test("p12 restart: complete-mode agg resumes from checkpointed state, equals batch") {
    val (r1, r2, base, n2, in2, _) = restartDrain("p12")(
      windowedTypeCounts(_), org.apache.spark.sql.streaming.OutputMode.Complete())
    // offsets restored: phase 2 read ONLY the appended files
    assert(in2 == n2, s"phase 2 drained $in2 rows, expected part2=$n2 — " +
      "restart reprocessed already-committed input")
    // complete mode: phase 2's snapshot alone is the full aggregate —
    // counts over part 1 survive only via the RESTORED state store
    val got = r2.map(_.toSeq).toSet
    val want = windowedTypeCounts(base).collect().map(_.toSeq).toSet
    assert(got == want, "post-restart complete snapshot diverged from batch")
    assert(r1.nonEmpty && got.nonEmpty)
    assert(got != r1.map(_.toSeq).toSet,
      "part 2 changed no aggregate — restart untested")
  }

  test("p16 restart: stream-stream join buffers survive the restart, union equals batch") {
    // place the cut exactly AT a joined pair's click: the click lands
    // in part 1 (ts <= cut), its purchase in part 2 — so the pair can
    // only be produced from the click buffered in phase 1's restored
    // state. A median cut can miss (no pair straddles it by luck).
    def clickOf(r: org.apache.spark.sql.Row): Long = {
      val t = r.getAs[java.sql.Timestamp]("click_ts")
      t.getTime * 1000 + (t.getNanos % 1000000) / 1000
    }
    def purchOf(r: org.apache.spark.sql.Row): Long = {
      val t = r.getAs[java.sql.Timestamp]("purchase_ts")
      t.getTime * 1000 + (t.getNanos % 1000000) / 1000
    }
    val batchBase = Tables.events(spark, sfDir)
    val batchPairs = attributionJoin(
        batchBase.filter(col("event_type") === "click" && col("user_id").isNotNull),
        batchBase.filter(col("event_type") === "purchase" && col("user_id").isNotNull))
      .collect().filter(r => purchOf(r) > clickOf(r))
    assert(batchPairs.nonEmpty,
      "corpus has no strictly-ordered (click, purchase) pair — cannot place the cut")
    val boundaryCut = clickOf(batchPairs.maxBy(r => purchOf(r) - clickOf(r)))
    val (r1, r2, base, n2, in2, cut) = restartDrain("p16",
      cutOverride = Some(boundaryCut))({ ev =>
      attributionJoin(
        ev.filter(col("event_type") === "click" && col("user_id").isNotNull),
        ev.filter(col("event_type") === "purchase" && col("user_id").isNotNull))
    }, org.apache.spark.sql.streaming.OutputMode.Append())
    // a stream-stream self-join plans TWO file-source instances over
    // the same directory, so the drain ingests part 2 once per leg
    assert(in2 == 2 * n2, s"phase 2 drained $in2 rows, expected 2x part2=$n2")
    val got = (r1 ++ r2).map(_.toSeq).toSet
    val want = attributionJoin(
        base.filter(col("event_type") === "click" && col("user_id").isNotNull),
        base.filter(col("event_type") === "purchase" && col("user_id").isNotNull))
      .collect().map(_.toSeq).toSet
    assert(got == want, "restarted join union diverged from batch")
    // non-vacuous: at least one pair CROSSES the stop — its click was
    // buffered in phase 1's state store and matched only after restart
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos % 1000000) / 1000
    val crossing = r2.count { r =>
      us(r.getAs[java.sql.Timestamp]("click_ts")) <= cut &&
        us(r.getAs[java.sql.Timestamp]("purchase_ts")) > cut
    }
    assert(crossing > 0,
      "no pair crossed the restart boundary — join-state recovery untested")
  }

  test("p17 restart: dedup keys seen before the stop stay deduped after it") {
    // watermark wider than the corpus's whole time span (30 days): the
    // registry query's horizon-bounded eviction is pinned elsewhere
    // (the p16/p17 watermark-bounded-state test); HERE the point is
    // state RESTORATION, so every part-1 key must still be in the
    // store when part 2 re-delivers it after the restart
    val (r1, r2, base, n2, in2, cut) = restartDrain("p17")({ ev =>
      ev.filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_type"), col("ts"))
        .withWatermark("ts", "60 days")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select("user_id", "event_type")
    }, org.apache.spark.sql.streaming.OutputMode.Append())
    assert(in2 == n2, s"phase 2 drained $in2 rows, expected part2=$n2")
    val got = (r1 ++ r2).map(_.toSeq).toSet
    val want = base.filter(col("user_id").isNotNull)
      .select("user_id", "event_type").distinct()
      .collect().map(_.toSeq).toSet
    assert(got == want, "restarted dedup union diverged from DISTINCT")
    // non-vacuous: phase 2 re-sees keys from phase 1 within the
    // watermark horizon and must NOT re-emit them (restored state) —
    // so phase 2 emits strictly fewer keys than a from-scratch run
    // over part 2 alone would
    val part2Fresh = base.filter(col("user_id").isNotNull)
      .filter(unix_micros(col("ts")) > cut)
      .select("user_id", "event_type").distinct().count()
    assert(r1.nonEmpty && r2.size < part2Fresh,
      s"phase 2 emitted ${r2.size} of $part2Fresh part-2 keys — " +
        "dedup state was not restored")
  }

  test("p21 restart: an open session spans the stop and merges across it") {
    val gap = graft.rel.PipelineQueries.SessionGapMs
    val (r1, r2, base, n2, in2, cut) = restartDrain("p21")({ ev =>
      sessionize(eventRows(ev), gapMs = gap, watermark = "10 seconds").toDF()
    }, org.apache.spark.sql.streaming.OutputMode.Append())
    assert(in2 == n2, s"phase 2 drained $in2 rows, expected part2=$n2")
    // fold snapshots exactly like sessionizeDrained; time-split input
    // guarantees a session's start never moves across phases, so the
    // (user, start) fold is exact here too
    import spark.implicits._
    val got = (r1 ++ r2)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2))
      .map { case ((u, s), ts) =>
        (u, s, ts.map(_._3).max, ts.map(_._4).max) }
      .toSet
    import org.apache.spark.sql.expressions.Window
    val e = eventRows(base).toDF()
      .select(col("user_id"), unix_millis(col("ts")).as("t"))
    val w = Window.partitionBy("user_id").orderBy("t")
    val want = e.withColumn("prev", lag("t", 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("t") - col("prev") > gap, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(w))
      .groupBy("user_id", "sid")
      .agg(min("t").as("s"), max("t").as("e2"), count(lit(1)).as("n"))
      .select("user_id", "s", "e2", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want, "restarted sessionization diverged from batch")
    // non-vacuous: at least one session spans the stop — its open
    // state crossed the checkpoint and part-2 events extended it
    val cutMs = cut / 1000
    assert(got.exists { case (_, s, e2, _) => s <= cutMs && e2 > cutMs },
      "no session spans the restart boundary — state recovery untested")
  }

  test("p27: incremental curation over MULTIPLE micro-batches equals the batch DAG") {
    // the registry gate drains the single-file corpus in one batch —
    // HERE the corpus is split into four files and maxFilesPerTrigger
    // forces four micro-batches, so the keeper state genuinely updates
    // across batch boundaries; min(struct) commutes, so the final
    // snapshot must equal the batch DAG regardless of the partitioning
    val root = java.nio.file.Files.createTempDirectory("p27multi").toString
    graft.rel.Tables.documents(spark, sfDir)
      .repartition(4)
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    val (got, dataBatches) = Streaming.curationDrained(
      spark, root, maxFilesPerTrigger = Some(1))
    assert(dataBatches >= 2,
      s"drained $dataBatches data micro-batches — multi-batch path untested")
    val want = graft.rel.PipelineQueries.curationFinal(
        graft.rel.PipelineQueries.curationKeepers(
          graft.rel.PipelineQueries.curationGopher(
            graft.rel.Tables.documents(spark, sfDir))))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(got.collect().map(_.toSeq).toSeq == want,
      "incremental curation diverged from the batch DAG")
    assert(want.nonEmpty)
  }

  test("p27 restart: keeper state survives a kill between drains, on both providers") {
    // the corpus-sized keeper state is what makes p27 the most
    // state-heavy stateful class — a restart that loses or mis-merges
    // it silently corrupts survivorship. Phase 1 drains everything
    // EXCEPT the latest duplicate of every multi-doc digest group
    // (plus one held-out singleton); the query is then gone — only the
    // checkpoint carries offsets + keeper state. Phase 2 appends the
    // held-out docs and restarts from the same checkpoint, so every
    // one of those keeper decisions is made against RESTORED state:
    // the late duplicates must lose to their restored keepers
    // (min(struct) merged across the restart), the held-out singleton
    // must appear as a NEW keeper, and the final snapshot must equal
    // the batch DAG over the full corpus. Run on the default provider
    // and on RocksDB — the backend p27's own scaladoc prescribes for
    // corpus-sized state at 100 TB.
    import org.apache.spark.sql.functions.{col, count, lit, max}
    val docs = Tables.documents(spark, sfDir)
    val gop = graft.rel.PipelineQueries.curationGopher(docs)
    val groups = gop.groupBy("dg")
      .agg(max("doc_id").as("m"), count(lit(1)).as("c")).cache()
    val dupLate = groups.filter(col("c") >= 2)
      .select("m").collect().map(_.getLong(0)).toSet
    assert(dupLate.nonEmpty,
      "fixture has no duplicate digest groups — restart survivorship untested")
    val want = graft.rel.PipelineQueries.curationFinal(
        graft.rel.PipelineQueries.curationKeepers(gop))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    // the held-out singleton must be a FINAL survivor (curationFinal
    // filters keepers by quality and train-split bucket), or holding
    // it out wouldn't change the phase-1 snapshot at all
    val wantIds = want.map(_.head.asInstanceOf[Long]).toSet
    val singles = groups.filter(col("c") === 1)
      .select("m").collect().map(_.getLong(0)).filter(wantIds.contains)
    assert(singles.nonEmpty,
      "no singleton-digest doc survives curation — held-out path untested")
    val singletonLate = singles.max
    val lateIds = dupLate + singletonLate
    val key = "spark.sql.streaming.stateStore.providerClass"
    for (provider <- Seq(None, Some("org.apache.spark.sql.execution." +
        "streaming.state.RocksDBStateStoreProvider"))) {
      val prev = spark.conf.getOption(key)
      provider.foreach(spark.conf.set(key, _))
      try {
        val root = java.nio.file.Files
          .createTempDirectory("p27restart").toString
        val src = s"$root/documents.parquet"
        docs.filter(!col("doc_id").isin(lateIds.toSeq: _*))
          .repartition(2).write.mode("overwrite").parquet(src)
        val ckpt = s"$root/ckpt"
        val (snap1df, _) =
          Streaming.curationDrained(spark, root, Some(1), Some(ckpt))
        val snap1 = snap1df.collect().map(_.toSeq).toSeq
        assert(snap1.size == want.size - 1,
          "phase 1 should hold every keeper except the held-out singleton")
        docs.filter(col("doc_id").isin(lateIds.toSeq: _*))
          .repartition(1).write.mode("append").parquet(src)
        val (snap2df, _) =
          Streaming.curationDrained(spark, root, Some(1), Some(ckpt))
        val got = snap2df.collect().map(_.toSeq).toSeq
        val tag = provider.map(_ => "rocksdb").getOrElse("default")
        assert(got == want,
          s"restarted p27 ($tag) diverged from the batch DAG")
        assert(!dupLate.exists(id => got.exists(_.head == id)),
          s"a late duplicate displaced its restored keeper ($tag)")
        assert(got.exists(_.head == singletonLate),
          s"the held-out singleton never became a keeper ($tag)")
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    groups.unpersist()
  }

  test("p16/p17: an empty stream RESULT is legitimate — only zero-input drains error") {
    // ADVICE fix: a corpus where no click precedes any purchase in the
    // horizon produces an EMPTY join output; the engine must hand that
    // through to the gate (the oracle returns 0 rows too), erroring
    // only when the SOURCE listing matched nothing.
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("empty-join").toString
    // purchases only — join output is structurally empty, dedup isn't
    Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull &&
        col("event_type") === lit("purchase"))
      .limit(50)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (joined, st) = attributionJoinDrained(spark, dir)
    assert(st.inputRows > 0, "source should have drained the purchases")
    assert(joined.count() == 0, "no clicks => empty attribution result")
    // and a zero-input drain still errors loudly (single-FILE layout
    // with no rows — the state a listing mismatch also lands in)
    val bad = java.nio.file.Files.createTempDirectory("no-events").toString
    val stage = java.nio.file.Files.createTempDirectory("no-events-stage").toString
    Tables.events(spark, sfDir).limit(0)
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail("no part file written"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(bad, "events.parquet"))
    val err = intercept[IllegalArgumentException] {
      attributionJoinStreamed(spark, bad)
    }
    assert(err.getMessage.contains("ZERO input rows"), err.getMessage)
  }

  test("p16/p17 run unchanged on the RocksDB state store (the 100 TB provider)") {
    // the default HDFS-backed store holds state on the JVM heap; at
    // production state sizes the deployment conf swaps in RocksDB
    // (off-heap, incremental checkpoints). The engine code must be
    // provider-agnostic: same drains, same results, state still
    // watermark-bounded. providerClass is read at QUERY start, so
    // setting it around the calls scopes it to these queries.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val (join, js) = attributionJoinDrained(spark, sfDir)
      val (dedup, ds) = keyDedupDrained(spark, sfDir)
      val joinRows = join.collect().map(_.toSeq).toSeq
      val dedupRows = dedup.collect().map(_.toSeq).toSeq
      assert(js.stateRows < js.inputRows, "rocksdb join state did not evict")
      assert(ds.stateRows < ds.inputRows, "rocksdb dedup state did not evict")
      // result parity with the default provider
      spark.conf.unset(key)
      assert(joinRows == attributionJoinStreamed(spark, sfDir)
        .collect().map(_.toSeq).toSeq, "p16 diverged across providers")
      assert(dedupRows == streamedKeyDedup(spark, sfDir)
        .collect().map(_.toSeq).toSeq, "p17 diverged across providers")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("p08 batch sessionization equals streaming sessionize on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val batch = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .limit(800).cache()
    val rows = batch.select("event_id", "user_id", "ts", "event_type", "value")
      .as[EventRow].collect()

    val stream = MemoryStream[EventRow]
    stream.addData(rows.toSeq)
    val q = sessionize(stream.toDS(),
        gapMs = graft.rel.PipelineQueries.SessionGapMs)
      .writeStream.format("memory").queryName("p08_sessions")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // one batch → every session emitted exactly once (init closed,
    // final one open per user)
    val streamed = spark.table("p08_sessions")
      .select("user_id", "start", "end", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // the registry batch query on the SAME rows: re-express via a temp
    // parquet dir so the query's events reader sees identical input
    val dir = java.nio.file.Files.createTempDirectory("p08-parity").toString
    batch.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batched = graft.SparkEntry.queries("p08_user_sessions")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(streamed == batched)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup keeps the first occurrence of each digest") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    case class Doc(doc_id: Long, text: String, ts: Timestamp)
    val t0 = 1700000000000L
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = dedupStream(
        stream.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        (1L, "alpha beta", new Timestamp(t0)),
        (2L, "gamma", new Timestamp(t0 + 1000)),
        (3L, "alpha beta", new Timestamp(t0 + 2000)))) // dup of 1 in-batch
      q.processAllAvailable()
      stream.addData(Seq(
        (4L, "alpha beta", new Timestamp(t0 + 3000)), // dup of 1 across batches
        (5L, "delta", new Timestamp(t0 + 4000))))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("dedup_stream").select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 5L), s"got $out")
  }

  test("running user stats accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, user: Long, t: Long, v: Double) =
      EventRow(id, user, new Timestamp(t), "click", v)

    val stream = MemoryStream[EventRow]
    val q = runningUserStats(stream.toDS())
      .writeStream.format("memory").queryName("user_stats")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, 10, 1000, 2.0), ev(2, 10, 2000, 3.0), ev(3, 20, 1000, 7.0))
      q.processAllAvailable()
      stream.addData(ev(4, 10, 3000, 5.0))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("user_stats").as[UserUpdate].collect()
    // batch 1: user 10 -> n=2 sum=5; user 20 -> n=1 sum=7
    // batch 2: user 10 -> n=3 sum=10 (state carried over)
    val u10 = out.filter(_.user_id == 10).sortBy(_.n)
    assert(u10.map(u => (u.n, u.sum)).toSeq == Seq((2L, 5.0), (3L, 10.0)))
    assert(out.filter(_.user_id == 20).map(u => (u.n, u.sum)).toSeq == Seq((1L, 7.0)))
    assert(u10.last.max == 5.0)
  }

  test("running user stats: a late-but-valid older event cannot shrink the idle deadline") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, user: Long, t: Long, v: Double) =
      EventRow(id, user, new Timestamp(t), "click", v)
    val h = 3600000L
    val t0 = 1700000000000L
    val stream = MemoryStream[EventRow]
    val q = runningUserStats(stream.toDS()) // 24h idle horizon
      .writeStream.format("memory").queryName("user_stats_late")
      .outputMode("append").start()
    try {
      // user 10's true latest event is t0 (deadline t0+24h) ...
      stream.addData(ev(1, 10, t0, 1.0)); q.processAllAvailable()
      // ... then a LATE event at t0-1h arrives: setting the deadline
      // from the batch max alone would shrink it to t0+23h
      stream.addData(ev(2, 10, t0 - h, 1.0)); q.processAllAvailable()
      // user 20 pushes the watermark to t0+23h40m — past the shrunk
      // deadline, before the true one; the next batch runs the
      // timeout check for user 10 (no data for 10 in it)
      stream.addData(ev(3, 20, t0 + 47 * h + 40 * 60000L, 1.0)); q.processAllAvailable()
      stream.addData(ev(4, 20, t0 + 47 * h + 41 * 60000L, 1.0)); q.processAllAvailable()
      // user 10 returns before the TRUE deadline: state must have
      // survived, so the running count continues at 3, not restart at 1
      stream.addData(ev(5, 10, t0 + 23 * h + 50 * 60000L, 1.0)); q.processAllAvailable()
    } finally q.stop()
    val n10 = spark.table("user_stats_late").as[UserUpdate]
      .collect().filter(_.user_id == 10).map(_.n).max
    assert(n10 == 3L, s"state was prematurely evicted (max n=$n10)")
  }

  test("sessionize: sessions extend within the gap and close when the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, user: Long, t: Long) =
      EventRow(id, user, new Timestamp(t), "click", 1.0)

    val stream = MemoryStream[EventRow]
    val q = sessionize(stream.toDS(), gapMs = 60000, watermark = "10 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, 1, 1000), ev(2, 1, 5000))
      q.processAllAvailable()
      stream.addData(ev(3, 1, 9000)) // within the gap: same session
      q.processAllAvailable()
      // advance event time far past end+gap+watermark -> user 1 closes
      stream.addData(ev(4, 2, 200000))
      q.processAllAvailable()
      stream.addData(ev(5, 2, 210000)) // one more batch to fire the timeout
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("sessions").as[SessionOut].collect()
    val u1 = out.filter(_.user_id == 1).sortBy(_.n)
    assert(u1.map(s => (s.n, s.start, s.end, s.closed)).toSeq ==
      Seq((2L, 1000L, 5000L, false), (3L, 1000L, 9000L, false),
        (3L, 1000L, 9000L, true))) // closed by event-time timeout
    assert(out.filter(_.user_id == 2).forall(!_.closed))
  }

  test("sessionize splits by gap INSIDE a batch, not only via timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, user: Long, tsMs: Long) =
      EventRow(id, user, new Timestamp(tsMs), "click", 1.0)
    val stream = MemoryStream[EventRow]
    // two bursts separated by far more than the 3s gap, SAME batch
    stream.addData(Seq(ev(1, 1, 1000), ev(2, 1, 2000),
      ev(3, 1, 5000000), ev(4, 1, 5001000)))
    val q = sessionize(stream.toDS().toDF().as[EventRow], gapMs = 3000)
      .writeStream.format("memory").queryName("gap_sessions")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("gap_sessions").as[SessionOut].collect()
    // first burst must close as its own session within the data path
    assert(out.exists(s => s.start == 1000 && s.end == 2000 && s.n == 2 && s.closed))
    assert(out.exists(s => s.start == 5000000 && s.end == 5001000 && s.n == 2 && !s.closed))
  }

  test("dedupStream runs on static frames too and keeps the caller schema") {
    import spark.implicits._
    val batch = Seq((1L, "a", new Timestamp(1000)), (2L, "a", new Timestamp(2000)),
      (3L, "b", new Timestamp(3000)))
      .toDF("doc_id", "text", "ts")
    val out = dedupStream(batch.repartition(7)) // partitioning must not pick the survivor
    assert(out.columns.toSeq == Seq("doc_id", "text", "ts")) // no digest leak
    assert(out.count() == 2)
    assert(out.select("text").as[String].collect().sorted.toSeq == Seq("a", "b"))
    // stream parity: the batch survivor is the FIRST occurrence
    // (earliest ts), not an arbitrary hash-aggregate pick
    assert(out.filter(col("text") === "a").select("doc_id").as[Long].head() == 1L)
  }

  test("eventRows drops null-keyed rows instead of NPEing") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val rows = java.util.Arrays.asList(
      Row(1L, 7L, new Timestamp(1000), "click", 1.0),
      Row(2L, null, new Timestamp(2000), "click", 2.0),
      Row(3L, 8L, new Timestamp(3000), "click", null),
      Row(null, 9L, new Timestamp(4000), "click", 4.0)) // primitive too
    val df = spark.createDataFrame(rows, schema)
    assert(eventRows(df).collect().map(_.event_id).toSeq == Seq(1L))
  }

  test("sessionize: a late-but-valid event beyond gap reach forms its own session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, user: Long, t: Long) =
      EventRow(id, user, new Timestamp(t), "click", 1.0)
    val stream = MemoryStream[EventRow]
    // gap 5s, watermark 10 minutes: late events stay valid
    val q = sessionize(stream.toDS(), gapMs = 5000, watermark = "10 minutes")
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, 1, 100000)) // open session [100s]
      q.processAllAvailable()
      // 70s is >5s BEFORE the open session: batch semantics = two
      // sessions; a naive "extend the open session" would merge them
      // across a 30s silence
      stream.addData(ev(2, 1, 70000))
      q.processAllAvailable()
      // and an in-reach late event still extends backwards correctly
      stream.addData(ev(3, 1, 97000))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("late_sessions").as[SessionOut].collect()
      .filter(_.user_id == 1)
    // the 70s event closed as its own singleton...
    assert(out.exists(s => s.start == 70000 && s.end == 70000 && s.n == 1 && s.closed),
      out.mkString(";"))
    // ...and the open session absorbed 97s (within 5s of 100s)
    assert(out.exists(s => s.start == 97000 && s.end == 100000 && s.n == 2 && !s.closed),
      out.mkString(";"))
  }

  test("stream-stream attribution join matches the batch join on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, user: Long, tsMs: Long, tpe: String) =
      EventRow(id, user, new Timestamp(tsMs), tpe, 1.0)
    val rows = Seq(
      ev(1, 1, 1000, "click"), ev(2, 1, 5000, "purchase"), // in horizon
      ev(3, 1, 4000, "click"), // second in-horizon click, also emitted
      ev(4, 2, 1000, "click"), ev(5, 2, 4000000, "purchase"), // outside
      ev(6, 3, 7000, "purchase"), // no click at all
      ev(7, 4, 8000, "click"), ev(8, 4, 8000, "purchase")) // equal ts
    val clicks = MemoryStream[EventRow]
    val purchases = MemoryStream[EventRow]
    clicks.addData(rows.filter(_.event_type == "click"))
    purchases.addData(rows.filter(_.event_type == "purchase"))
    val q = attributionJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("attrib")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(streamed == Set((2L, 1L), (2L, 3L), (8L, 7L)))

    // and the identical plan runs on static frames with the same result
    val batchRows = rows.toDS().toDF()
    val batch = attributionJoin(
      batchRows.filter($"event_type" === "click"),
      batchRows.filter($"event_type" === "purchase"))
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(batch == streamed)
  }

  test("p29b restart: CDC state survives a real stop; tombstones block late pre-delete versions") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("restart_p29b").toString
    try {
      val src = s"$root/orders.parquet" // directory layout
      def write(rows: Seq[(Long, Long, String, Double)]): Unit =
        rows.toDF("o_custkey", "o_orderkey", "o_orderstatus",
            "o_totalprice")
          .coalesce(1).write.mode("append").parquet(src)
      def tuples(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val ckpt = Some(s"$root/ckpt")
      val out = Some(s"$root/out")
      // phase 1: two live keys; k3 deleted at seq 30 with an OLDER
      // version in the same batch (the in-batch fold must pick the
      // tombstone, not the last-arriving row)
      write(Seq((1L, 10L, "O", 1.0), (2L, 20L, "O", 2.0),
        (3L, 30L, "F", 3.0), (3L, 25L, "O", 9.0)))
      val (snap1, st1) = Streaming.cdcDrained(spark, root, ckpt, out)
      assert(st1.inputRows == 4, "phase 1 drained unexpected input")
      assert(tuples(snap1) == Seq((1L, 10L, 1.0), (2L, 20L, 2.0)))
      // REAL stop: only the checkpoint + committed updates survive.
      // phase 2: a LATE version of k3 older than its tombstone (must
      // not resurrect — requires the restored per-key state), k2's
      // delete, and a fresh k4
      write(Seq((3L, 28L, "O", 7.0), (2L, 21L, "F", 0.0),
        (4L, 40L, "O", 4.0)))
      val (snap2, st2) = Streaming.cdcDrained(spark, root, ckpt, out)
      assert(st2.inputRows == 3,
        "restart re-read already-committed input — offsets not restored")
      assert(tuples(snap2) == Seq((1L, 10L, 1.0), (4L, 40L, 4.0)),
        s"post-restart snapshot wrong: ${tuples(snap2)}")
      // stream == batch: the incremental fold over two drains equals
      // the one-aggregate batch apply over the full changelog
      val log = spark.read.parquet(src).select(
        col("o_custkey").as("k"), col("o_orderkey").as("seq"),
        when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"),
        col("o_totalprice").as("qty"))
      val batchSnap = graft.rel.PipelineQueries.cdcApply(log)
        .orderBy("cust_key")
      assert(tuples(batchSnap) == tuples(snap2),
        "streamed snapshot diverged from the batch CDC apply")
      // crash-recovery rerun with NOTHING new: zero input drained, and
      // the snapshot is served entirely from the committed updates
      // (must not trip the layout-mismatch guard)
      val (snap3, st3) = Streaming.cdcDrained(spark, root, ckpt, out)
      assert(st3.inputRows == 0, "recovery rerun re-read committed input")
      assert(tuples(snap3) == tuples(snap2),
        "recovery-rerun snapshot diverged")
      // the checkpoint/outRoot pairing guard (a caller checkpoint with
      // a temp out would recover offsets against an output with no
      // commit markers and die with a misleading layout error)
      val mismatch = intercept[IllegalArgumentException] {
        Streaming.cdcDrained(spark, root, ckpt, None)
      }
      assert(mismatch.getMessage.contains("together"), mismatch.getMessage)
    } finally {
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }

  test("p29b horizon rule: within-horizon disorder keeps exactness; past the " +
    "horizon the tombstone is truly evicted and late versions cannot resurrect") {
    import spark.implicits._
    def write(src: String, rows: Seq[(Long, Long, String, Double)]): Unit =
      rows.toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice")
        .coalesce(1).write.mode("append").parquet(src)
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    // ---- disorder ≤ horizon: exactness holds (no-resurrection +
    // batch-parity). The horizon (in SEQ units — event time, so the
    // rule is a data property, not a wall-clock one) dwarfs every seq
    // gap in the fixture: nothing evicts, nothing late-filters.
    val rootA = java.nio.file.Files.createTempDirectory("p29b_hA").toString
    try {
      val (ck, out) = (Some(s"$rootA/ckpt"), Some(s"$rootA/out"))
      val horizon = Some(1000L)
      write(s"$rootA/orders.parquet",
        Seq((1L, 10L, "O", 1.0), (3L, 30L, "F", 3.0)))
      Streaming.cdcDrained(spark, rootA, ck, out, horizon)
      // the late pre-delete version arrives a DRAIN later — within
      // the horizon, so the retained tombstone must block it
      write(s"$rootA/orders.parquet",
        Seq((3L, 25L, "O", 9.0), (4L, 40L, "O", 4.0)))
      val (snap, _) = Streaming.cdcDrained(spark, rootA, ck, out, horizon)
      assert(tuples(snap) == Seq((1L, 10L, 1.0), (4L, 40L, 4.0)),
        s"within-horizon late version resurrected the key: ${tuples(snap)}")
      val batchSnap = graft.rel.PipelineQueries.cdcApply(
        spark.read.parquet(s"$rootA/orders.parquet").select(
          col("o_custkey").as("k"), col("o_orderkey").as("seq"),
          when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"),
          col("o_totalprice").as("qty"))).orderBy("cust_key")
      assert(tuples(batchSnap) == tuples(snap),
        "horizon-evicting stream diverged from batch apply within the horizon")
    } finally {
      val p = new org.apache.hadoop.fs.Path(rootA)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }

    // ---- disorder > horizon: the tombstone is really REMOVED (the
    // bounded-state half), and the beyond-horizon version is DROPPED
    // by the watermark's late filter, so eviction cannot resurrect.
    // horizon = 5 seq-units; all movement is on the seq axis — no
    // sleeps, no wall clock.
    val rootB = java.nio.file.Files.createTempDirectory("p29b_hB").toString
    try {
      val (ck, out) = (Some(s"$rootB/ckpt"), Some(s"$rootB/out"))
      val horizon = Some(5L)
      write(s"$rootB/orders.parquet",
        Seq((1L, 10L, "O", 1.0), (3L, 30L, "F", 3.0)))
      val (_, st1) = Streaming.cdcDrained(spark, rootB, ck, out, horizon)
      // watermark = 30-5 = 25 < the tombstone's 30: still retained
      assert(st1.stateRows == 2L && st1.stateRowsRemoved == 0L,
        s"expected live k1 + k3 tombstone retained, got $st1")
      // k5 at seq 50 pushes the watermark to 45 > 30: the tombstone's
      // event-time timeout fires in this drain and REMOVES it from the
      // store (stateRowsRemoved counts actual removals — numRowsTotal
      // over-reports right after a checkpoint restart)
      write(s"$rootB/orders.parquet", Seq((5L, 50L, "O", 5.0)))
      val (_, st2) = Streaming.cdcDrained(spark, rootB, ck, out, horizon)
      assert(st2.stateRowsRemoved == 1L,
        s"tombstone not evicted past the horizon: $st2")
      // the beyond-horizon late version (seq 25 < watermark 45) is
      // late-filtered before the fold — no emission, no resurrection,
      // nothing removed or re-created: eviction is resurrection-safe
      // by construction
      write(s"$rootB/orders.parquet", Seq((3L, 25L, "O", 9.0)))
      val (snapB, st3) = Streaming.cdcDrained(spark, rootB, ck, out, horizon)
      assert(st3.stateRowsRemoved == 0L,
        s"unexpected state churn on the beyond-horizon version: $st3")
      assert(Streaming.readCommitted(spark, out.get)
          .filter(col("k") === 3L && col("last_seq") === 25L).isEmpty,
        "beyond-horizon late version was not dropped by the late filter")
      assert(tuples(snapB) == Seq((1L, 10L, 1.0), (5L, 50L, 5.0)),
        s"post-eviction snapshot wrong: ${tuples(snapB)}")
    } finally {
      val p = new org.apache.hadoop.fs.Path(rootB)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("p29c: the gate body derives H from the data, evicts under the gate, " +
    "and refuses a corpus that cannot demonstrate eviction") {
    import spark.implicits._
    def write(src: String, rows: Seq[(Long, Long, String, Double)]): Unit =
      rows.toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice")
        .coalesce(1).write.mode("append").parquet(src)

    // a changelog WITH final tombstones well behind the frontier:
    // the drain must land on the batch-apply snapshot AND have
    // actually removed tombstone state (the in-body require)
    val rootA = java.nio.file.Files.createTempDirectory("p29c_ok").toString
    try {
      write(s"$rootA/orders.parquet", Seq(
        (1L, 10L, "F", 1.0), // deleted early — must evict
        (2L, 20L, "O", 2.0),
        (2L, 900L, "O", 2.5),
        (3L, 950L, "O", 3.0)))
      val snap = Streaming.cdcStreamedEvicting(spark, rootA)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(snap.toSeq == Seq((2L, 900L, 2.5), (3L, 950L, 3.0)),
        s"evicting gate snapshot wrong: ${snap.toSeq}")
    } finally {
      val p = new org.apache.hadoop.fs.Path(rootA)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }

    // no final tombstone anywhere: the gate must refuse LOUDLY rather
    // than report a vacuous green (eviction would never run)
    val rootB = java.nio.file.Files.createTempDirectory("p29c_notomb").toString
    try {
      write(s"$rootB/orders.parquet",
        Seq((1L, 10L, "O", 1.0), (2L, 20L, "O", 2.0)))
      val e = intercept[IllegalArgumentException] {
        Streaming.cdcStreamedEvicting(spark, rootB)
      }
      assert(e.getMessage.contains("no final tombstone"), e.getMessage)
    } finally {
      val p = new org.apache.hadoop.fs.Path(rootB)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
