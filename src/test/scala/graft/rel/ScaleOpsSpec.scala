package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ScaleOps plan guarantees: bucketed joins must be Exchange-free
  * (co-located), salted aggregation must equal the direct groupBy.
  */
class ScaleOpsSpec extends SparkSpec {

  test("bucketed tables join with zero Exchange operators") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    ScaleOps.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    ScaleOps.writeBucketed(ord, "ord_bucketed", "l_orderkey", 8)
    try {
      val joined = ScaleOps.bucketedJoin(spark, "li_bucketed", "ord_bucketed",
        "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      // and it computes the right thing
      val expect = li.join(ord, "l_orderkey").count()
      assert(joined.count() == expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("bucketed aggregation on the bucket key needs no exchange") {
    ScaleOps.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"),
      "li_agg_bucketed", "l_orderkey", 8)
    try {
      val agg = spark.table("li_agg_bucketed")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed agg shuffled:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS li_agg_bucketed")
  }

  test("prefixSum is a correct global exclusive prefix, empty partitions included") {
    import spark.implicits._
    // 990 rows pile on one key: range partitioning crams them into few
    // partitions and leaves others empty/sparse — the offset vector
    // must stay aligned by partition id regardless
    val rows = (0 until 1000).map(i =>
      (if (i < 990) 5L else 1000L + i, (i % 7 + 1).toLong))
    val got = ScaleOps.prefixSum(rows.toDF("k", "v"), "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == rows.length)
    // emitted prefixes, in prefix order, must be the exact running sum
    var run = 0L
    got.sortBy(_._3).foreach { case (_, v, p) =>
      assert(p == run, s"prefix $p != running $run"); run += v
    }
    assert(run == rows.map(_._2).sum)
    // key-order contract: for k1 < k2, every k1 row precedes every k2 row
    val span = got.groupBy(_._1).map { case (k, g) =>
      k -> (g.map(_._3).min, g.map(t => t._3 + t._2).max)
    }.toSeq.sortBy(_._1)
    span.sliding(2).foreach {
      case Seq((_, (_, endA)), (_, (startB, _))) => assert(endA <= startB)
      case _ =>
    }
  }

  test("groupedPrefixSum equals the window formulation, groups split across partitions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    // two dominant groups (the skew shape the operator exists for) +
    // a tail of singletons; low partition sizes force both dominant
    // groups to straddle range-partition boundaries
    val rows = (0 until 2000).map { i =>
      val g = if (i < 900) "en" else if (i < 1800) "zh" else s"g$i"
      (i.toLong, g, (i % 11 + 1).toLong, (i % 13).toDouble / 13.0)
    }
    val df = rows.toDF("id", "g", "v", "q").repartition(32)
    val got = ScaleOps.groupedPrefixSum(df, "g",
      Seq(col("q").desc, col("id")), "v")
      .select("id", "cum_before").as[(Long, Long)].collect().toMap
    val want = df.withColumn("cum_before",
      sum("v").over(W.partitionBy("g").orderBy(col("q").desc, col("id"))
        .rowsBetween(W.unboundedPreceding, -1)))
      .na.fill(0L, Seq("cum_before"))
      .select("id", "cum_before").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("groupedPrefixSum guards: column collision, types, driver-subtotal cap") {
    import spark.implicits._
    val df = Seq((1L, "en", 3L), (2L, "zh", 5L)).toDF("id", "g", "v")
    // pre-existing cum_before column collides with the output
    val clash = intercept[IllegalArgumentException] {
      ScaleOps.groupedPrefixSum(df.withColumn("cum_before", col("v")),
        "g", Seq(col("id")), "v")
    }
    assert(clash.getMessage.contains("cum_before"))
    // group column must be StringType
    val badG = intercept[IllegalArgumentException] {
      ScaleOps.groupedPrefixSum(df, "id", Seq(col("id")), "v")
    }
    assert(badG.getMessage.contains("StringType"))
    // value column must be LongType
    val badV = intercept[IllegalArgumentException] {
      ScaleOps.groupedPrefixSum(df.withColumn("v", col("v").cast("int")),
        "g", Seq(col("id")), "v")
    }
    assert(badV.getMessage.contains("LongType"))
    // an unbounded group key trips the driver-subtotal cap loudly
    val wide = (0 until 64).map(i => (i.toLong, s"url$i", 1L))
      .toDF("id", "g", "v")
    val cap = intercept[IllegalArgumentException] {
      ScaleOps.groupedPrefixSum(wide, "g", Seq(col("id")), "v",
        maxDriverSubtotals = 16)
    }
    assert(cap.getMessage.contains("maxDriverSubtotals"))
    // and the default cap leaves legitimate callers untouched
    assert(ScaleOps.groupedPrefixSum(wide, "g", Seq(col("id")), "v")
      .count() == 64)
  }

  test("salted aggregation equals the direct groupBy") {
    val li = Tables.lineitem(spark, sfDir)
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_l_quantity"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = ScaleOps.saltedSumCount(li, "l_returnflag", "l_quantity", 7)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    // l_quantity is integer-valued double -> exact sums, set-comparable
    assert(salted == direct)
    // plan shape: two aggregation layers (4 HashAggregate nodes:
    // partial+final per layer)
    val p = ScaleOps.saltedSumCount(li, "l_returnflag", "l_quantity", 7)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("z-order layout bounds BOTH dimensions per file; linear sort only one") {
    import java.io.File
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    val zDir = "/tmp/graft-sink-fixtures/events_zorder"
    val linDir = "/tmp/graft-sink-fixtures/events_linear"
    ScaleOps.zOrderWrite(ev, "user_id", "ts_us", zDir, 8)
    ev.repartitionByRange(8, col("ts_us")).sortWithinPartitions("ts_us")
      .write.mode("overwrite").parquet(linDir)
    // lossless round trips
    assert(spark.read.parquet(zDir).count() == ev.count())
    assert(spark.read.parquet(linDir).count() == ev.count())
    def files(dir: String): Seq[String] =
      Option(new File(dir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
    def userRanges(dir: String): Seq[(Long, Long)] =
      files(dir).map { f =>
        val r = spark.read.parquet(f)
          .agg(min("user_id"), max("user_id")).head()
        (r.getLong(0), r.getLong(1))
      }
    val Row4 = ev.agg(min("user_id"), max("user_id")).head()
    val (uLo, uHi) = (Row4.getLong(0), Row4.getLong(1))
    // a filter on the NON-sort dimension: users in the first quarter
    val qHi = uLo + (uHi - uLo) / 4
    def touched(dir: String): Int =
      userRanges(dir).count { case (lo, hi) => lo <= qHi && hi >= uLo }
    val zTouched = touched(zDir)
    val linTouched = touched(linDir)
    // linear-by-time files all span the full user range -> all touched;
    // z-order files are rectangles, so most fall outside the user band
    assert(linTouched == files(linDir).size, s"lin=$linTouched")
    assert(zTouched * 2 <= linTouched,
      s"z-order touched $zTouched of ${files(zDir).size} vs linear $linTouched")
  }

  test("zOrderWrite on an empty input still produces a readable (empty) sink") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      .filter(col("event_id") < 0) // matches nothing; bounds agg is all-null
    val dir = "/tmp/graft-sink-fixtures/events_zorder_empty"
    ScaleOps.zOrderWrite(ev, "user_id", "ts_us", dir, 4)
    assert(spark.read.parquet(dir).count() == 0)
  }

  test("p10 partitioned layout prunes: a lang filter reads only that partition") {
    // run the registry query to (re)write the partitioned layout
    val rows = graft.SparkEntry.queries("p10_partitioned_write")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("layout_ok") == 1L), rows.mkString(","))
    // read back the SAME per-JVM dir the query just wrote — a
    // hardcoded path would audit a stale layout from an earlier run
    val out = PipelineQueries.p10OutPath(sfDir)
    val pruned = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (directory prune), not
    // as a post-scan data filter over all partitions
    assert(plan.contains("PartitionFilters"), plan)
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse("")
    assert(pf.contains("lang"), pf)
    // and the pruned read returns exactly the en rows
    val expect = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en").count()
    assert(pruned.count() == expect)
  }

  test("p19 z-order rectangle query equals the source-table filter; skip audit green") {
    val got = graft.SparkEntry.queries("p19_zorder_prune")(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir).filter(col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    val b = ev.agg(min("user_id"), max("user_id"),
      min("ts_us"), max("ts_us")).head()
    val uCut = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 4
    val tCut = b.getLong(2) + (b.getLong(3) - b.getLong(2)) / 2
    val expected = ev.filter(col("user_id") <= uCut && col("ts_us") <= tCut)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == expected, "z-order layout changed RESULTS")
    assert(got.nonEmpty)
    // the file-skip audit flag: >= 1/3 of files wholly outside the band
    got.foreach(r => assert(r.getLong(3) == 1L, "skip audit failed"))
  }

  test("AQE splits a skewed join partition (skew=true in the executed plan)") {
    // the runtime skew remedy the engine leans on at 100 TB (SCALE.md's
    // "salting or AQE skew-join"): pin that OptimizeSkewedJoin actually
    // FIRES inside this engine's config envelope, not just that the
    // flag is on. One hot key holds ~95% of the left side; broadcast is
    // disabled so the join must sort-merge, and the thresholds are
    // scoped down so the hot partition qualifies. The assertions hold
    // both halves: results exact AND the final adaptive plan marks the
    // skew split.
    import org.apache.spark.sql.functions._
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      val left = spark.range(200000).select(
        when(col("id") < 190000L, 0L).otherwise(col("id") % 64).as("k"),
        concat(lit("payload-"), col("id")).as("pay"))
      val right = spark.range(64).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("v"))
      val joined = left.join(right, Seq("k"))
      // collect() drives joined's OWN QueryExecution, so the adaptive
      // plan below is the final one (count() would plan separately and
      // leave this queryExecution unexecuted, isFinalPlan=false)
      assert(joined.collect().length == 200000, "skewed join lost/duplicated rows")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedJoin equals the plain join; plan is shuffled-hash over the replicated dim") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars")
    val dim = docs.groupBy("lang").agg(count(lit(1)).as("lang_n"))
    val salted = ScaleOps.saltedJoin(docs, dim, "lang", 8)
      .select("doc_id", "lang", "n_chars", "lang_n")
    val plain = docs.join(broadcast(dim), Seq("lang"))
      .select("doc_id", "lang", "n_chars", "lang_n")
    // doc_id is unique, so the ordered row arrays compare exactly
    val a = salted.orderBy("doc_id").collect()
    val b = plain.orderBy("doc_id").collect()
    assert(a.length == b.length && a.sameElements(b),
      "salted join diverged from the plain join")
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate"), s"dim side not replicated via explode:\n$p")
    // guard trips loudly
    intercept[IllegalArgumentException] {
      ScaleOps.saltedJoin(docs, dim, "lang", 1)
    }
  }

  test("bloomBuild/bloomMightContain: no false negatives, empty build filters everything") {
    import spark.implicits._
    val keys = spark.range(500).select((col("id") * 3).as("k"))
    val bits = ScaleOps.bloomBuild(keys, col("k"), 1024L)
    val probe = spark.range(1500).select(col("id").as("k"))
      .filter(ScaleOps.bloomMightContain(bits, col("k")))
      .as[Long].collect().toSet
    // the Bloom contract: every true member passes (no false negatives)
    assert((0L until 1500L by 3L).forall(probe.contains),
      "bloom probe dropped a true member")
    // and a filter built over an EMPTY input yields null bits → the
    // probe is null → everything filters out (the d15 empty-batch case)
    val emptyBits = ScaleOps.bloomBuild(keys.filter(col("k") < 0), col("k"), 1024L)
    assert(spark.range(10).select(col("id").as("k"))
        .filter(ScaleOps.bloomMightContain(emptyBits, col("k"))).isEmpty,
      "empty bloom build must filter everything")
  }

  test("saltedJoin measurably shrinks the widest reduce task on a hot key") {
    // the 100 TB claim behind saltedJoin ("widest task shrinks by
    // ~saltBuckets") as a MEASUREMENT, not an argument: every fact row
    // carries ONE key, so the unsalted shuffle_hash join funnels the
    // whole fact side through a single reduce task (widest task ≈ n),
    // while the salted plan routes rows over 8 (key, salt) sub-keys.
    // Widths are per-task shuffle-read record counts from the task
    // metrics. AQE partition coalescing is off for the measurement —
    // it would merge the salted buckets back into one TINY task at
    // this fixture size and hide the routing being measured (at real
    // scale each bucket exceeds the advisory size and stays its own
    // task).
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    val maxRead = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          maxRead.getAndAccumulate(m.shuffleReadMetrics.recordsRead, Math.max _)
        }
        ()
      }
    }
    def widest(df: org.apache.spark.sql.DataFrame, expected: Long): Long = {
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      spark.sparkContext.addSparkListener(l)
      maxRead.set(0L)
      try {
        assert(df.count() == expected, "join lost/duplicated rows")
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        maxRead.get
      } finally spark.sparkContext.removeSparkListener(l)
    }
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      val n = 40000L
      // ~99.5% of rows on ONE hot key (a literal key would constant-
      // fold the equi-join away), the rest spread over 4 cold keys
      val fact = spark.range(n)
        .select(when(col("id") < n - 200L, 0L).otherwise(col("id") % 4)
          .as("k"), col("id").as("uid"))
      val dim = spark.range(4).select(col("id").as("k"), lit("d").as("v"))
      val unsalted =
        widest(fact.join(dim.hint("shuffle_hash"), Seq("k")), n)
      val salted = widest(ScaleOps.saltedJoin(fact, dim, "k", 8), n)
      assert(unsalted >= n - 200L,
        s"unsalted hot-key join did not funnel (widest=$unsalted, n=$n)")
      // 8 salts over 16 partitions: typically n/8 per task; 3x covers
      // an unlucky 2-bucket hash collision without weakening the claim
      assert(salted * 3 <= unsalted,
        s"salting did not shrink the widest task: $unsalted -> $salted")
      info(s"widest reduce task: unsalted=$unsalted salted=$salted " +
        s"(n=$n, saltBuckets=8)")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("cdcApply: latest version wins, deletes don't resurrect; equals the window plan") {
    import spark.implicits._
    val crafted = Seq(
      (1L, 1L, "U", 10.0), (1L, 2L, "U", 20.0), // update chain -> latest
      (2L, 1L, "U", 5.0), (2L, 2L, "D", 0.0),   // delete last -> absent
      (3L, 1L, "D", 0.0), (3L, 2L, "U", 7.0),   // re-insert after delete -> present
      (4L, 3L, "U", 1.0)                        // single version
    ).toDF("k", "seq", "op", "qty")
    val got = PipelineQueries.cdcApply(crafted).orderBy("cust_key")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 20.0), (3L, 2L, 7.0), (4L, 3L, 1.0)), got)
    // on the real changelog the one-aggregate fold must equal the
    // window row_number formulation it replaces (seq = o_orderkey is
    // globally unique, so both formulations are deterministic)
    val real = Tables.orders(spark, sfDir).select(
      col("o_custkey").as("k"), col("o_orderkey").as("seq"),
      when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"),
      col("o_totalprice").as("qty"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("seq").desc)
    val viaWindow = real.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("k").as("cust_key"), col("seq").as("last_seq"),
        col("qty"))
    val viaAgg = PipelineQueries.cdcApply(real)
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty,
      "cdcApply diverged from the window formulation")
  }
}
