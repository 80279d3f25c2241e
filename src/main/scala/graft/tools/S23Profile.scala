package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{broadcast, col, udf}

/** Measurement tool (guide §1) for the s23 index-compaction cell:
  * replays `knnIvfCompacted`'s lifecycle phase by phase with wall
  * timing, so the 3.6 s cell is attributed (build / append / tombstone
  * / serve / fold / audits) before anything changes. Diagnostic only. */
object S23Profile {
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
    import graft.rel.{Similarity => S, Tables}
    def secs[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s23-prof] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val nQueries = 50; val k = 1; val nList = 16; val nProbe = 14
    (1 to 2).foreach { run =>
      println(s"[s23-prof] ---- run $run")
      val e = Tables.embeddings(spark, sfDir)
      val idxPath = java.nio.file.Files
        .createTempDirectory("s23prof").toString + "/idx"
      val v1 = e.filter(col("vec_id") % 5 =!= 0)
      val batch = e.filter(col("vec_id") % 5 === 0)
      secs("build v1 (train+write)") {
        S.buildIvfIndex(spark, v1, idxPath, nList)
      }
      val cents = secs("read centroids") {
        S.readStoredCentroids(spark, idxPath, nList)
      }
      val bcC = spark.sparkContext.broadcast(cents)
      val assignStored = udf { (v: Array[Float]) =>
        S.nearestCell(S.unit(v), bcC.value) }
      secs("append batch write") {
        batch.select(col("vec_id").as("nid"), col("embedding").as("ne"),
            assignStored(col("embedding")).as("cell"))
          .write.mode("append").partitionBy("cell").parquet(s"$idxPath/index")
      }
      secs("tombstone write") {
        e.filter(S.deletePredOn(col("vec_id")))
          .select(col("vec_id").as("nid"),
            assignStored(col("embedding")).as("cell"))
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"$idxPath/tombstones")
      }
      val viaTombstones = secs("serve via tombstones") {
        S.serveIvfIndex(spark, e, idxPath, cents, nQueries, k, nProbe,
          tombstones = Some(s"$idxPath/tombstones")).localCheckpoint()
      }
      secs("compact fold write") {
        spark.read.parquet(s"$idxPath/index")
          .join(broadcast(spark.read.parquet(s"$idxPath/tombstones")),
            Seq("cell", "nid"), "left_anti")
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"$idxPath/v2/index")
      }
      secs("centroid fs copy") {
        val cfs = new org.apache.hadoop.fs.Path(idxPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        org.apache.hadoop.fs.FileUtil.copy(
          cfs, new org.apache.hadoop.fs.Path(s"$idxPath/centroids"),
          cfs, new org.apache.hadoop.fs.Path(s"$idxPath/v2/centroids"),
          false, spark.sparkContext.hadoopConfiguration)
      }
      val annV2 = secs("serve v2") {
        S.serveIvfIndex(spark, e, s"$idxPath/v2", cents, nQueries, k,
          nProbe).localCheckpoint()
      }
      secs("equivalence exceptAll") {
        val eq = annV2.exceptAll(viaTombstones).isEmpty &&
          viaTombstones.exceptAll(annV2).isEmpty
        require(eq)
      }
      secs("completeness counts") {
        val c = spark.read.parquet(s"$idxPath/v2/index").count() ==
          e.filter(!S.deletePredOn(col("vec_id"))).count()
        require(c)
      }
      val p = new org.apache.hadoop.fs.Path(idxPath).getParent
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    spark.stop()
  }
}
