package graft.rel

import graft.core.Synthetic
import graft.ops._
import graft.pipeline._
import org.apache.spark.sql.functions._

/** The imaging pipeline surfaced as declared engine queries. These run
  * on deterministic synthetic sources (not the star schema), so they
  * carry no DuckDB oracle — the driver records rows-only checks; the
  * quantitative goldens live in OpsSpec/PipelineSpec.
  */
object PipelineQueries {

  /** deterministic on-disk fixtures for the source readers (written
    * once per JVM under java.io.tmpdir; content is a pure function of
    * the constants below, so the query output is stable) */
  private lazy val sourceFixtures: (String, String, String) = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(sys.props("java.io.tmpdir"), "graft-src-fixtures")
    val tiffDir = root.resolve("tiff")
    val zarrDir = root.resolve("events.zarr")
    if (!Files.exists(tiffDir)) {
      Files.createDirectories(tiffDir)
      for (id <- Seq("a", "b", "c"); ch <- 0 until 2) {
        val img = new java.awt.image.BufferedImage(12, 12,
          java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
        for (r <- 0 until 12; c <- 0 until 12)
          img.getRaster.setSample(c, r, 0, (id.hashCode.abs % 97) + ch * 100 + r * 12 + c)
        javax.imageio.ImageIO.write(img, "TIFF",
          tiffDir.resolve(s"img_${id}_ch$ch.tif").toFile)
      }
    }
    if (!Files.exists(zarrDir)) {
      Files.createDirectories(zarrDir)
      val n = 4; val len = 2 * 6 * 6
      Files.writeString(zarrDir.resolve(".zarray"),
        s"""{"chunks":[2,$len],"compressor":null,"dtype":"<f4","fill_value":0,
           |"filters":null,"order":"C","shape":[$n,$len],"zarr_format":2}""".stripMargin)
      Files.writeString(zarrDir.resolve(".zattrs"),
        s"""{"object_number":[${(0 until n).map(_ + 1000).mkString(",")}],
           |"shape":[${Seq.fill(n)("[2,6,6]").mkString(",")}]}""".stripMargin)
      for (chunk <- 0 until 2) {
        val bb = java.nio.ByteBuffer.allocate(2 * len * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        for (r <- 0 until 2; j <- 0 until len)
          bb.putFloat(((chunk * 2 + r) * 1000 + j).toFloat)
        Files.write(zarrDir.resolve(s"$chunk.0"), bb.array())
      }
    }
    val cziPath = root.resolve("plate.czi")
    if (!Files.exists(cziPath))
      graft.sources.Czi.writeMinimal(cziPath.toString, Seq("well-A1", "well-B2"),
        tiles = 1, channels = 2, depth = 1, h = 10, w = 10,
        (s, t, c, z, r, col) => (s * 640 + t * 320 + c * 160 + r * 10 + col).toFloat)
    (tiffDir.toString, zarrDir.toString, cziPath.toString)
  }

  val all: Seq[Q] = Seq(
    // Source readers end-to-end: TIFF scan+decode and zarr scan+load
    // through the masking pipeline (deterministic on-disk fixtures).
    Q.noOracle("p05_sources_roundtrip") { (s, _) =>
      val (tiffDir, zarrDir, cziPath) = sourceFixtures
      val tiffMeta = graft.sources.Tiff.metaFromDirectory(s, tiffDir,
        ".*img_(?<id>[a-z]+)_ch(?<channel>[0-9])\\.tif")
      val tiffEvents = graft.sources.Tiff.loadPixels(tiffMeta, Seq("0", "1"))
      val zarrMeta = graft.sources.Zarr.metaFromDirectory(s, zarrDir)
      val zarrEvents = graft.sources.Zarr.loadPixels(zarrMeta)
      val cziEvents = graft.sources.Czi.loadPixels(
        graft.sources.Czi.metaFromDirectory(s, cziPath,
          regex = "well-(?<row>[A-Z])(?<col>[0-9]+)"), channels = Seq(0, 1))
      val all = tiffEvents.toDF().unionByName(zarrEvents.toDF())
        .unionByName(cziEvents.toDF())
        .as(graft.core.Codecs.imageEventEncoder)
      Features.extract(
        Masking.branch(all, Masking.Circle, 0), Seq("ch0", "ch1"),
        Seq("regions", "bbox", "intensity"))
        .orderBy("meta_path")
    },
    // The reference's own e2e shape: 4 mask branches over synthetic
    // events -> wide feature table (one row per input event).
    Q.noOracle("p01_pipeline_e2e") { (s, _) =>
      Pipeline.referenceShape(s, nEvents = 10)
    },

    // Segmentation: FOVs -> per-cell events -> per-cell feature rows.
    Q.noOracle("p02_segment_cells") { (s, _) =>
      val src = Synthetic.cells(s, 32, channels = 2)
      val seg = Segmentation.segment(src, Segmentation.WatershedDapi(cellDiameter = 8), 0)
      val cells = Segmentation.toEvents(seg, 0)
      Features.extract(cells, Seq("dapi", "marker"),
          Seq("regions", "bbox", "shape", "intensity"))
        .orderBy("meta_idx", "meta_id")
    },

    // The streaming module's windowed aggregate, run in its batch form
    // over the static events table — the identical plan Structured
    // Streaming executes incrementally (graft.streaming.Streaming;
    // stream==batch equality is asserted in StreamingSpec).
    Q("p04_windowed_counts",
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:00') AS window_start,
        | event_type, count(*) AS n,
        | sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions.date_format
      graft.streaming.Streaming.windowedTypeCounts(Tables.events(s, d))
        .withColumn("window_start",
          date_format(org.apache.spark.sql.functions.col("window_start"),
            "yyyy-MM-dd HH:00"))
        .orderBy("window_start", "event_type")
    },

    // Cellpose-path segmentation (C9): batched two-channel model eval
    // (deterministic stub standing in for torch), >10%-overlap
    // child→parent assignment, FOVs -> per-cell feature rows.
    Q.noOracle("p06_segment_cellpose") { (s, _) =>
      val src = Synthetic.cells(s, 16, channels = 2)
      val seg = Segmentation.segmentCellpose(src,
        Segmentation.CellposeShaped(parentChannelIndex = 0, dapiChannelIndex = 0,
          cellDiameter = 8))
      Features.extract(Segmentation.toEvents(seg, 0), Seq("dapi", "marker"),
          Seq("regions", "bbox", "intensity"))
        .orderBy("meta_idx", "meta_id")
    },

    // The reference's canonical e2e (test/test_main.py + scip_zarr.yml)
    // on the reference's OWN bundled data: blosc-lz4 vlen zarr ->
    // channels [0,1] -> normaltest/std mask filters -> four branches
    // (circle-1, circle-2, spot, li) with per-branch feature selection.
    // Falls back to the synthetic reference shape if the fixture is
    // absent in the runtime environment.
    Q.noOracle("p07_reference_e2e") { (s, _) =>
      val fixture = "/root/reference/test/data/test.zarr"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(fixture)))
        Pipeline.referenceShape(s, nEvents = 10)
      else {
        val meta = graft.sources.Zarr.metaFromDirectory(s, fixture,
          "^.+/(?<group>.+)\\.zarr$")
        val events = graft.sources.Zarr.loadPixels(meta, Seq(0, 1))
        val full = Seq("regions", "bbox", "shape", "intensity")
        val cfg = PipelineConfig(
          channelNames = Seq("BF1", "PI"),
          mainChannelIndex = 0,
          combinedIndices = Seq(0, 1),
          maskFilters = Seq(
            Masking.NormalTest(Seq(0)), Masking.StdFilter(Seq(1), 2.0)),
          branches = Seq(
            MaskBranchConfig("circle-1", Masking.Circle, featureTypes = Some(full)),
            MaskBranchConfig("circle-2", Masking.Circle, featureTypes = Some(full)),
            MaskBranchConfig("spot", Masking.Spot(5), featureTypes = Some(full)),
            MaskBranchConfig("li", Masking.Li(Seq(1, 1)),
              featureTypes = Some(Seq("regions", "shape", "intensity")))),
          featureTypes = full)
        Pipeline.run(s, events, cfg).orderBy("meta_idx")
      }
    },

    // Full stage stack: illumination correction + masking + population
    // filter + normalization over the scalable synthetic source.
    Q.noOracle("p03_full_stack") { (s, _) =>
      val cfg = PipelineConfig(
        channelNames = Seq("ch0", "ch1"),
        illuminationCorrection = true,
        branches = Seq(MaskBranchConfig("otsu", Masking.Otsu)),
        populationFilter = true,
        normalize = true,
        featureTypes = Seq("regions", "bbox", "intensity"))
      Pipeline.run(s, Synthetic.cells(s, 24, channels = 2), cfg)
        .orderBy("meta_idx")
    }
  )
}
