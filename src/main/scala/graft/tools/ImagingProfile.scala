package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement tool (guide §1, VERDICT r15 item 6): splits a registry
  * imaging cell's wall time into BUILD (DataFrame construction — for
  * p03 this includes the blocking popfilter/normalize aggregate jobs),
  * PLAN (analysis + physical planning of the final frame) and EXECUTE
  * (the count), so "planning/codegen vs execution" is a measured
  * attribution, not a guess. Diagnostic only. */
object ImagingProfile {
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
    val dumpRules = sys.env.get("SPARK_GRAFT_RULE_DUMP").contains("1")
    args.foreach { name =>
      if (dumpRules)
        org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        val n = df.count()
        val t3 = System.nanoTime()
        println(f"[img-prof] $name run$i: build ${(t1 - t0) / 1e9}%.3f s, " +
          f"plan ${(t2 - t1) / 1e9}%.3f s, exec ${(t3 - t2) / 1e9}%.3f s " +
          f"($n rows)")
        spark.catalog.clearCache(); System.gc()
      }
      if (dumpRules) {
        val t = org.apache.spark.sql.catalyst.rules.RuleExecutor
          .dumpTimeSpent()
        println(s"[img-prof] rule time for $name (3 runs):")
        t.linesIterator.take(25).foreach(l => println(s"[img-prof]   $l"))
      }
    }
    spark.stop()
  }
}
