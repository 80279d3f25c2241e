package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Measurement tool for the p27c compaction-stall bound (SCALE.md):
  * steps the documents corpus through the near-dup store in K
  * micro-batches, timing every step and every fold, so the "keep the
  * in-loop stall under the trigger interval" cadence rule carries a
  * measured number instead of an estimate. The fold rewrites the
  * whole accumulated store (keeper re-min, band-index rewrite,
  * reason union), so its cost tracks STORE size while step cost
  * tracks BATCH size — the two curves this prints are exactly the
  * inputs to the cadence decision. One JSON line on stdout. */
object P27cCompactScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_P27C_BATCHES", "8").toInt
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.rel.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    // deterministic K-way split on doc_id (the drain order is
    // irrelevant to the final snapshot — arrival-order independence
    // is spec-pinned — so a hash split is as good as file order)
    val store = graft.rel.PipelineQueries.NearDupStore(
      java.nio.file.Files.createTempDirectory("p27c-compact-scale").toString)
    var state: Option[graft.rel.PipelineQueries.NearDupState] = None
    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val stepSecs = (0 until nBatches).map { i =>
      val batch = docs.filter(col("doc_id") % nBatches === i)
      val (st, dt) = secs(graft.rel.PipelineQueries.nearDupStep(
        store, state, i.toLong, batch))
      state = Some(st)
      dt
    }
    val keepers = state.get.keepers.count()
    // the fold at full accumulation — the WORST single stall a
    // compactEvery cadence can schedule at this corpus size
    val (_, foldSec) = secs(store.compact(spark))
    val bandRows = store.readBands(spark, (0 until 256).toSeq).count()
    // a second fold with nothing unfolded = the sweep + early return
    // (the no-op floor a per-batch cadence pays between real folds)
    val (_, noopSec) = secs(store.compact(spark))
    def r2(v: Double) = math.rint(v * 100) / 100
    println(s"""{"metric":"p27c_compact_scale","sf":"$sfDir",""" +
      s""""n_batches":$nBatches,"keepers":$keepers,"band_rows":$bandRows,""" +
      s""""step_secs":[${stepSecs.map(r2).mkString(",")}],""" +
      s""""fold_sec":${r2(foldSec)},"noop_fold_sec":${r2(noopSec)}}""")
    val p = new org.apache.hadoop.fs.Path(store.root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
