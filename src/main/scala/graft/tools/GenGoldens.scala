package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Regenerates the committed p-query goldens
  * (src/main/resources/graft/goldens/<name>.sql): runs each digest
  * query's raw plan, folds it through [[graft.rel.Digest.rows]], and
  * renders the DuckDB `VALUES` oracle. Run after any intentional
  * change to pipeline/kernel semantics, then re-run the suite —
  * PipelineGoldenSpec asserts the committed goldens still match live
  * output under a different parallelism (catching any nondeterminism
  * the 6-significant-digit rounding fails to absorb).
  *
  *   sbt "runMain graft.tools.GenGoldens"
  */
object GenGoldens {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("src/main/resources/graft/goldens")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    graft.rel.PipelineQueries.digestables.foreach { case (name, fn) =>
      val keys = graft.rel.PipelineQueries.DigestKeys
      val out = fn(spark, "/root/testdata/sf0.01")
      // p01/p07 fold the digest into their fused map (r16) — the same
      // pass-through rule the registry wrapper applies
      val digested =
        if (graft.rel.Digest.isDigested(out, keys)) out
        else graft.rel.Digest.rows(out, keys)
      val sql = graft.rel.Digest.goldenSql(digested, graft.rel.PipelineQueries.DigestKeys)
      Files.writeString(Paths.get(s"$outDir/$name.sql"), sql)
      println(s"[gen-goldens] $name: ${sql.linesIterator.size - 3} rows")
    }
    spark.stop()
  }
}
