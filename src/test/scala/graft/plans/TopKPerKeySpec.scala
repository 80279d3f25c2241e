package graft.plans

import graft.SparkSpec
import graft.rel.{ScaleOps, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The whole-operator extension (TopKPerKeyPlan → Strategy →
  * partial/final execs): result parity with the window idiom it
  * replaces, and the plan shape that makes it the scale path
  * (bounded heaps + one exchange of survivors, no sort, no window).
  */
class TopKPerKeySpec extends SparkSpec {

  private def li = Tables.lineitem(spark, sfDir)
    .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, String)] =
    df.select("l_orderkey", "l_linenumber", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  test("topKPerKey equals the window row_number idiom on a total order") {
    val k = 7
    val native = ScaleOps.topKPerKey(li, Seq("l_returnflag"),
      Seq(("l_extendedprice", false), ("l_orderkey", true),
        ("l_linenumber", true)), k)
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
    val windowed = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
    assert(asSet(native) == asSet(windowed))
  }

  test("partial-phase state guard: tiny maxStateKeys still yields exact results") {
    // l_orderkey is high-cardinality per partition — with the flush
    // threshold at 4 keys the partial phase flushes thousands of
    // times, and the final merge must still produce exactly the
    // window-idiom set (flushing only ever duplicates per-key
    // k-batches across the exchange, never loses rows)
    val k = 3
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    val windowed = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
    val expected = asSet(windowed)
    spark.conf.set("spark.graft.topk.maxStateKeys", "4")
    try {
      val native = ScaleOps.topKPerKey(li, Seq("l_orderkey"),
        Seq(("l_extendedprice", false), ("l_linenumber", true)), k)
      assert(asSet(native) == expected)
    } finally spark.conf.unset("spark.graft.topk.maxStateKeys")
  }

  test("randomized parity with the window idiom (keys, k, partitions, flush threshold)") {
    import spark.implicits._
    // deterministic pseudo-random datasets: vary key cardinality, k,
    // input partitioning, and the flush threshold; (value desc, id)
    // is always a total order so the expected set is unique
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(40)
      val nRows = 200 + rnd.nextInt(1500)
      val k = 1 + rnd.nextInt(9)
      val nParts = 1 + rnd.nextInt(7)
      val maxState = if (seed % 2 == 0) 1 + rnd.nextInt(5) else 131072
      val rows = (0 until nRows).map { id =>
        (rnd.nextInt(nKeys), rnd.nextInt(50).toDouble, id.toLong)
      }
      val df = rows.toDF("key", "value", "id").repartition(nParts)
      val expected = rows.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(t => (-t._2, t._3)).take(k)
      }.toSet
      spark.conf.set("spark.graft.topk.maxStateKeys", maxState.toString)
      try {
        val collected = ScaleOps.topKPerKey(df, Seq("key"),
            Seq(("value", false), ("id", true)), k)
          .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
        // exact cardinality BEFORE the set compare: a flush-path bug
        // that re-emits survivors would still satisfy set equality
        assert(collected.length == expected.size,
          s"seed=$seed: ${collected.length} rows, expected ${expected.size}")
        assert(collected.toSet == expected,
          s"seed=$seed nKeys=$nKeys k=$k parts=$nParts maxState=$maxState")
      } finally spark.conf.unset("spark.graft.topk.maxStateKeys")
    }
  }

  test("plan: partial + exchange + final, no sort, no window") {
    val df = ScaleOps.topKPerKey(li, Seq("l_returnflag"),
      Seq(("l_extendedprice", false), ("l_orderkey", true),
        ("l_linenumber", true)), 5)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial"), p)
    assert(p.contains("TopKPerKeyFinal"), p)
    assert(p.contains("Exchange"), p)
    assert(!p.contains("WindowExec"), p)
    assert(!p.toLowerCase.contains("sortexec"), p)
    // the exchange sits between partial and final (survivors only)
    val iPartial = p.indexOf("TopKPerKeyPartial")
    val iFinal = p.indexOf("TopKPerKeyFinal")
    val iExchange = p.indexOf("Exchange")
    assert(iFinal < iExchange && iExchange < iPartial,
      s"final=$iFinal exchange=$iExchange partial=$iPartial\n$p")
  }

  test("k beyond the group size returns whole groups") {
    val small = li.limit(40)
    val native = ScaleOps.topKPerKey(small, Seq("l_returnflag"),
      Seq(("l_extendedprice", false), ("l_orderkey", true),
        ("l_linenumber", true)), 100000)
    assert(native.count() == small.count())
  }

  test("deterministic across runs under a total order") {
    def run() = asSet(ScaleOps.topKPerKey(li, Seq("l_returnflag"),
      Seq(("l_extendedprice", false), ("l_orderkey", true),
        ("l_linenumber", true)), 11))
    assert(run() == run())
  }

  test("unknown column fails loudly with the available names") {
    val e = intercept[IllegalArgumentException] {
      ScaleOps.topKPerKey(li, Seq("nope"), Seq(("l_orderkey", true)), 3)
    }
    assert(e.getMessage.contains("nope") &&
      e.getMessage.contains("l_returnflag"))
  }

  test("null keys and null order values follow window null semantics") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, Int)](
      (1L, 5.0, 1), (1L, null, 2), (1L, 3.0, 3), (1L, 9.0, 4),
      (null, 2.0, 5), (null, 1.0, 6), (2L, 7.0, 7)
    ).toDF("k", "v", "id")
    val native = ScaleOps.topKPerKey(df, Seq("k"),
      Seq(("v", false), ("id", true)), 2)
      .select("id").collect().map(_.getInt(0)).toSet
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("id").collect().map(_.getInt(0)).toSet
    // null key is a group of its own; null v sorts per SortOrder's
    // default null ordering — identical to the window idiom
    assert(native == windowed, s"native=$native windowed=$windowed")
  }

  test("single upstream partition still yields the partial/final pair") {
    val one = li.coalesce(1)
    val df = ScaleOps.topKPerKey(one, Seq("l_returnflag"),
      Seq(("l_extendedprice", false), ("l_orderkey", true),
        ("l_linenumber", true)), 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"), p)
    assert(df.groupBy("l_returnflag").count().collect()
      .forall(_.getLong(1) <= 3))
  }
}
