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
