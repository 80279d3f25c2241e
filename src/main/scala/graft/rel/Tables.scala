package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access helpers for the driver-generated star schema
  * (TESTDATA.md). Every query receives the scale-factor directory and
  * reads the single-parquet tables from it — filters/projections above
  * these scans are pushed into the parquet reader by Catalyst (verified
  * via .explain: PushedFilters / ReadSchema).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader cannot represent natively; read nanos as long and convert to
    * a microsecond timestamp (truncation — matches DuckDB's cast down).
    *
    * DELIBERATE session-level side effect: the nanosAsLong flag is
    * consulted again at EXECUTION time (conf propagates to tasks per
    * action), so save-and-restore scoping here would break any events
    * DataFrame executed after the restore. The flag stays set for the
    * session; its only observable effect is that other TIMESTAMP(NANOS)
    * parquet columns — which Spark would otherwise reject with an
    * "Illegal Parquet type" error — also surface as LongType nanos.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // The TIMESTAMP_NTZ→TIMESTAMP cast below is session-timezone-
    // dependent; it reproduces the DuckDB oracle bit-for-bit ONLY
    // under UTC. Enforce the invariant where it is relied upon (every
    // entry point pins it today, but a future SparkSession built
    // without the pin must fail loudly here, not skew ts silently).
    require(s.conf.get("spark.sql.session.timeZone", "") == "UTC",
      "Tables.events requires spark.sql.session.timeZone=UTC (the " +
        "TIMESTAMP_NTZ cast is timezone-dependent and the oracles " +
        "assume UTC) — set it on the SparkSession builder")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: double division of ~1.7e18 ns loses ulps
        // (> 2^53) and can land 1 µs off DuckDB's truncating cast
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): DuckDB
        // reads it as its (naive) TIMESTAMP, so with the session
        // pinned to UTC this cast reproduces the oracle's micros
        // bit-for-bit while restoring the TIMESTAMP type the
        // downstream unix_micros/window functions expect
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}

/** One declared engine operator/query: the Spark implementation plus —
  * when SQL-expressible — the equivalent ANSI SQL the driver runs in
  * DuckDB over the same parquet tables (names `lineitem`, `orders`, …).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

/** Lineage cuts that stay out of the plan audit's way. */
object Lineage {
  /** False only in the plan-audit context. Callers that release a
    * cache because a [[cut]] downstream of it has materialized must
    * gate the release on this — in nocut mode nothing materialized, so
    * an eager unpersist would drop the cache before any use. */
  def cutsEnabled: Boolean =
    !sys.props.get("graft.lineage.nocut").contains("true")

  /** `localCheckpoint` unless the plan-audit context disabled cuts
    * (`-Dgraft.lineage.nocut=true`, set by [[graft.Explain]]): an
    * eager checkpoint at DataFrame-BUILD time runs real jobs during
    * `Explain` and replaces the checkpointed subtree with `Scan
    * ExistingRDD` in the audited plan, hiding its joins/aggregates
    * from the shape summary. Only for cuts that are pure
    * optimizations — driver-side fixpoint loops (d07) and
    * collect-based offsets (t13) need genuine materialization and
    * keep calling localCheckpoint directly. */
  def cut(df: DataFrame): DataFrame =
    if (!cutsEnabled) df
    else df.localCheckpoint()
}
