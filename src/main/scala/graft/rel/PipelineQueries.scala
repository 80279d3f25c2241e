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

  val all: Seq[Q] = Seq(
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
