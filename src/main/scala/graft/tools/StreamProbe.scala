package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Measurement harness for the streamed registry cells (guide §1):
  * runs the named queries exactly as the bench does and dumps every
  * micro-batch's `durationMs` breakdown (triggerExecution, addBatch,
  * queryPlanning, walCommit, commitOffsets, stateStoreCommit,
  * latestOffset, getBatch) plus per-cell wall time — the evidence for
  * attributing a drain's fixed cost to engine phases before touching
  * anything. Diagnostic only; never on a timed path.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=… SPARK_GRAFT_CPUS=… \
  *   sbt "runMain graft.tools.StreamProbe p16_stream_attribution …"`
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[probe] started ${e.id} at ${System.currentTimeMillis()}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=$dur")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[probe] terminated ${e.id} at ${System.currentTimeMillis()}")
    })
    // untimed warmup of the parquet footers, like the bench
    Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        try { spark.read.parquet(f.getPath).count(); () }
        catch { case _: Throwable => }
      }
    args.foreach { name =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name run$i: $dt%.3f s ($n rows)")
        spark.catalog.clearCache(); System.gc()
      }
    }
    spark.stop()
  }
}
