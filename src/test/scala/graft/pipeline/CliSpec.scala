package graft.pipeline

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** the CLI batch entry end-to-end: JSON config → pipeline → exports */
class CliSpec extends SparkSpec {

  test("synthetic source + quantiles_csv + parquet export") {
    val out = Files.createTempDirectory("cli-parquet").toString
    val config = Files.createTempFile("cli", ".json")
    Files.writeString(config,
      """{ "load": {"format": "synthetic", "n": 6},
        |  "mask": [{"name": "circle", "method": "circle"}],
        |  "feature_extraction": {"types": ["regions", "intensity"]},
        |  "export": {"coalesce": 1, "quantiles_csv": true} }""".stripMargin)
    Cli.run(spark, out, config.toString)
    val features = spark.read.parquet(s"$out/features.0.parquet") // reference {filename}.{i}.parquet layout
    assert(features.count() == 6)
    assert(features.columns.exists(_.startsWith("feat_")))
    val q = Files.readString(Paths.get(out, "quantiles.csv"))
    assert(q.linesIterator.size > 1, q)
  }

  test("czi source + cellpose segmentation + anndata export") {
    val dir = Files.createTempDirectory("cli-czi")
    val czi = dir.resolve("plate.czi").toString
    graft.sources.Czi.writeMinimal(czi, Seq("s0"), tiles = 1, channels = 2,
      depth = 1, h = 48, w = 48,
      // two bright blobs on a dark field so the stub model finds cells
      (s, t, c, z, r, col) => {
        val d1 = (r - 14) * (r - 14) + (col - 14) * (col - 14)
        val d2 = (r - 34) * (r - 34) + (col - 34) * (col - 34)
        if (d1 < 49 || d2 < 49) 200f + (r + col) % 7 else 10f + (r * col) % 3
      })
    val out = Files.createTempDirectory("cli-anndata").toString
    val config = Files.createTempFile("cli-czi", ".json")
    Files.writeString(config,
      s"""{ "load": {"format": "czi", "paths": ["$czi"], "channels": [0, 1]},
         |  "segment": {"method": "cellpose", "parent_channel": 0,
         |              "dapi_channel": 0, "cell_diameter": 8},
         |  "mask": [{"name": "cells", "method": "circle"}],
         |  "feature_extraction": {"types": ["regions", "intensity"]},
         |  "export": {"format": "anndata", "coalesce": 1} }""".stripMargin)
    Cli.run(spark, out, config.toString)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".h5ad"))
    assert(files.nonEmpty)
    val root = graft.export.H5Read.read(files.head.getPath)
    assert(root.children.contains("X") && root.children.contains("obs"))
    assert(root.children("X").dims.head > 0, "per-cell rows expected")
  }
}
