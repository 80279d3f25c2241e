package graft.pipeline

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The reference's scip_tiff_seg.yml shape (tiff scan → jones-2006
  * illumination correction keyed on the plate directory → cellpose
  * segmentation → per-cell shape+intensity features) run end-to-end on
  * the reference's own bundled tiffs, with the stub model standing in
  * for torch. */
class ReferenceTiffSegSpec extends SparkSpec {

  private val tiffDir = "/root/reference/test/data/tiffs"

  test("tiff + illumination + cellpose segmentation to per-cell features") {
    assume(Files.exists(Paths.get(tiffDir)))
    val meta = graft.sources.Tiff.metaFromDirectory(spark, tiffDir,
      ".*/(?<group>[^/]+)/test(?<id>[0-9]+)_(?<channel>[0-9]+)\\.tiff")
    val events = graft.sources.Tiff.loadPixels(meta, Seq("1", "2"))
    val cfg = PipelineConfig(
      channelNames = Seq("DAPI", "actin"),
      illuminationCorrection = true,
      illuminationMedianSize = 11, // reference tiff_seg.yml median_filter_size: 11
      segment = Some(graft.ops.Segmentation.CellposeShaped(
        parentChannelIndex = 1, dapiChannelIndex = 0, cellDiameter = 20)),
      segmentParentChannel = 1,
      branches = Seq(MaskBranchConfig("cells", graft.ops.Masking.Circle)),
      featureTypes = Seq("regions", "shape", "intensity"))
    val df = Pipeline.run(spark, events, cfg)
    val rows = df.collect()
    // cells were detected and exploded to per-cell rows
    assert(rows.length >= 2, s"expected detected cells, got ${rows.length} rows")
    val featCols = df.columns.filter(_.startsWith("feat_"))
    assert(featCols.exists(_.contains("DAPI")) && featCols.exists(_.contains("actin")))
    // per-cell rows carry real finite features
    val live = rows.filter(r => featCols.exists(c => r.getAs[Any](c) != null))
    assert(live.nonEmpty)
    live.foreach { r =>
      featCols.foreach { c =>
        val v = r.getAs[Any](c)
        if (v != null) assert(!v.asInstanceOf[Double].isInfinite, s"$c infinite")
      }
    }
  }
}
