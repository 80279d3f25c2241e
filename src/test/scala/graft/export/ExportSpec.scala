package graft.export

import graft.SparkSpec
import java.nio.file.Files

class ExportSpec extends SparkSpec {

  test("re-export removes stale higher-index part files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("export-stale").toString
    // first run: 3 part files
    Export.parquetPartFiles((0 until 30).toDF("v").repartition(3), dir, "features")
    def listed() = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.matches("features\\.\\d+\\.parquet")).sorted.toSeq
    assert(listed() == Seq("features.0.parquet", "features.1.parquet", "features.2.parquet"))
    // second, smaller run into the same dir: stale .2 must be gone and
    // the surviving files must hold ONLY the new data
    Export.parquetPartFiles((100 until 110).toDF("v").repartition(2), dir, "features")
    assert(listed() == Seq("features.0.parquet", "features.1.parquet"))
    val vals = spark.read.parquet(s"$dir/features.0.parquet", s"$dir/features.1.parquet")
      .as[Int].collect().sorted.toSeq
    assert(vals == (100 until 110).toSeq)
  }

  test("files for a different filename stem are untouched") {
    import spark.implicits._
    val dir = Files.createTempDirectory("export-other").toString
    Export.parquetPartFiles((0 until 4).toDF("v").coalesce(1), dir, "other")
    Export.parquetPartFiles((0 until 4).toDF("v").coalesce(1), dir, "features")
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(names.contains("other.0.parquet") && names.contains("features.0.parquet"))
  }
}
