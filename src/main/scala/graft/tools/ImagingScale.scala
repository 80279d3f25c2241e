package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Pipeline, PipelineConfig, MaskBranchConfig}
import graft.ops.Masking

/** Scale record for the IMAGING tier (the p01/p03 class), which the
  * per-round bench only ever measures at gate-fixture size (10-24
  * events). Runs the same two pipeline shapes at a 10x event count and
  * at 2x image dims, measuring wall plus the max per-task
  * peakExecutionMemory — the observable for the A2 mean-image
  * ObjectHashAggregate buffers, whose state envelope is
  * groups_per_task x (C x H x W + 1) doubles (grows with GROUPS and
  * DIMS, never with event count; the 10x-events run pins that).
  * Prints one JSON line per cell for SCALE.md's measured section.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ImagingScale"
  */
object ImagingScale {
  private val peak = new java.util.concurrent.atomic.AtomicLong

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) peak.getAndAccumulate(m.peakExecutionMemory, math.max)
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)

    def p03(n: Int, h: Int, w: Int): org.apache.spark.sql.DataFrame = {
      val cfg = PipelineConfig(
        channelNames = Seq("ch0", "ch1"),
        illuminationCorrection = true,
        branches = Seq(MaskBranchConfig("otsu", Masking.Otsu)),
        populationFilter = true,
        normalize = true,
        featureTypes = Seq("regions", "bbox", "intensity"))
      Pipeline.run(spark, graft.core.Synthetic.cells(spark, n, channels = 2,
        h = h, w = w), cfg)
    }
    def cell(tag: String, warm: Boolean = false)(
        df: => org.apache.spark.sql.DataFrame): Unit = {
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      peak.set(0L)
      val t0 = System.nanoTime()
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      if (!warm)
        println(f"""{"metric":"imaging_scale","cell":"$tag","rows":$rows,""" +
          f""""sec":$sec%.1f,"peak_task_mem_mb":${peak.get / 1e6}%.1f}""")
      spark.catalog.clearCache()
      System.gc()
    }
    // untimed warmup: kernel JIT + codegen (the Bench discipline —
    // otherwise the first cell pays ~5s of classload)
    cell("warmup", warm = true)(p03(24, 48, 48))
    cell("warmup", warm = true)(
      Pipeline.referenceShape(spark, nEvents = 10))
    // p03 full stack (illumination A2 + otsu + popfilter + normalize):
    // 1x events, 10x events (same dims/groups -> A2 state UNCHANGED),
    // and 2x dims at 1x events (A2 buffers 4x). Sized so per-event
    // work dominates the ~3s fixed plan overhead the gate fixture
    // measures (a 24-event p03 is all overhead).
    cell("p03_n2k_48")(p03(2000, 48, 48))
    cell("p03_n20k_48")(p03(20000, 48, 48))
    cell("p03_n2k_96")(p03(2000, 96, 96))
    // p01 reference shape (4 mask branches, full features): 1x / 10x
    cell("p01_n1k")(Pipeline.referenceShape(spark, nEvents = 1000))
    cell("p01_n10k")(Pipeline.referenceShape(spark, nEvents = 10000))
    spark.stop()
  }
}
