package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}

/** Measurement tool (guide §1) for the p27c single-batch gate path:
  * replays the phases of `nearDupStep`'s fresh-store branch with
  * per-phase wall timing, so the store machinery's ~3 s premium over
  * the batch p26c DAG (r16 baseline: 4.27 vs 1.21 s) is attributed to
  * a phase before anything is changed. Diagnostic only. */
object P27cStepProfile {
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
    import graft.rel.{Lineage, PipelineQueries => PQ}
    def secs[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p27c-prof] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = graft.rel.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    (1 to 2).foreach { run =>
      println(s"[p27c-prof] ---- run $run")
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val store = PQ.NearDupStore(
        java.nio.file.Files.createTempDirectory("p27c-prof").toString)
      val bm = secs("curation DAG + cut") {
        Lineage.cut(PQ.curationKeepers(PQ.curationGopher(docs,
          withSim = true)))
      }
      val bands = secs("bandRows+writeBands") {
        store.writeBands(0L, PQ.profBandRows(bm), nonEmpty = !bm.isEmpty)
      }
      val reasons = secs("pairsWithin + cut") {
        Lineage.cut(PQ.profPairsWithin(bands.withColumn("is_new", lit(true))))
      }
      secs("writeState + seal") {
        store.writeState(0L, bm, reasons); store.seal(0L, spark)
      }
      val st = PQ.NearDupState(bm, reasons)
      secs("snapshot+sort+cut") {
        PQ.nearDupSnapshot(st)
          .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
          .orderBy("doc_id").localCheckpoint(true).count()
      }
      // width sweep for the bgrp-partitioned delta write: one writer
      // task per group (256, the r11 choice) vs narrower widths where
      // each task writes several sorted groups sequentially
      val bandFrame = graft.rel.Lineage.cut(PQ.profBandRows(bm))
      val nBands = bandFrame.count()
      println(s"[p27c-prof] band rows: $nBands")
      Seq(256, 64, 32, 8, 1).foreach { parts =>
        val path = store.root + s"/sweep_$parts"
        secs(f"band write parts=$parts%-4d") {
          bandFrame.repartition(parts, col("bgrp"))
            .sortWithinPartitions("bgrp", "bucket")
            .write.mode("overwrite").partitionBy("bgrp").parquet(path)
        }
      }
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      val p = new org.apache.hadoop.fs.Path(store.root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    spark.stop()
  }
}
