package graft.ops

import graft.core.ImageEvent
import graft.core.Codecs._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Group-wise quantile (min-max) normalization — reference A1 + P3
  * (normalization/quantile_normalization.py:25-89).
  *
  * Scale design (SURVEY.md §2.1-A1): instead of folding whole images
  * into an aggregation buffer, each record first reduces itself to a
  * (channels × 2) extent — masked pixels only when a mask is present,
  * exactly like `combine_extent_partition` — and the group extents
  * come from builtin min/max over the exploded per-channel rows:
  * partial aggregation map-side, one light shuffle of ngroups×C rows,
  * codegen throughout. The tiny result is collected and broadcast
  * back through the executors (the reference's J2 dict broadcast).
  */
object Normalization {

  /** per-group per-channel (min, max) over masked (or all) pixels */
  def groupMinMax(spark: SparkSession, ds: Dataset[ImageEvent]): Map[(String, Int), (Double, Double)] = {
    import spark.implicits._
    val extents = ds.flatMap { e =>
      if (!e.hasPixels) Iterator.empty
      else {
        val ps = e.planeSize
        (0 until e.channels).iterator.flatMap { c =>
          var mn = Double.MaxValue; var mx = Double.MinValue
          var any = false
          var i = 0
          while (i < ps) {
            val inMask = !e.hasMask || e.mask(c * ps + i) > 0
            if (inMask) {
              val v = e.pixels(c * ps + i)
              if (v < mn) mn = v
              if (v > mx) mx = v
              any = true
            }
            i += 1
          }
          if (any) Iterator((e.group, c, mn, mx)) else Iterator.empty
        }
      }
    }.toDF("group", "channel", "mn", "mx")
    extents
      .groupBy("group", "channel")
      .agg(min("mn").as("lo"), max("mx").as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
  }

  /** (pixels − min) / (max − min) per channel with the group's extents
    * (sample_normalization, quantile_normalization.py:67-89) */
  def normalize(spark: SparkSession, ds: Dataset[ImageEvent]): Dataset[ImageEvent] = {
    val cached = ds.cache() // shared subplan: extents + normalize pass
    val minmax = groupMinMax(spark, cached)
    val bc = spark.sparkContext.broadcast(minmax)
    cached.map(ImageEvent.whenPixels { e =>
      val ps = e.planeSize
      val out = new Array[Float](e.pixels.length)
      var c = 0
      while (c < e.channels) {
        val (lo, hi) = bc.value.getOrElse((e.group, c), (0.0, 1.0))
        val span = if (hi - lo == 0) 1.0 else hi - lo
        var i = 0
        while (i < ps) {
          out(c * ps + i) = ((e.pixels(c * ps + i) - lo) / span).toFloat
          i += 1
        }
        c += 1
      }
      e.copy(pixels = out)
    })
  }
}
