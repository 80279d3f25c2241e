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
          var hasNaN = false
          var i = 0
          while (i < ps) {
            val inMask = !e.hasMask || e.mask(c * ps + i) > 0
            if (inMask) {
              val v = e.pixels(c * ps + i)
              if (java.lang.Float.isNaN(v)) hasNaN = true
              else {
                if (v < mn) mn = v
                if (v > mx) mx = v
                any = true
              }
            }
            i += 1
          }
          // reference parity quirk: combine_extent_partition folds
          // min(acc, np.min(record)) with PYTHON's min, and
          // min(x, NaN) returns x — so a record with ANY NaN pixel in
          // a channel contributes NOTHING to that channel's extents
          // (np.min of the whole slice is NaN, which python-min then
          // discards). Empty masked slices are skipped the same way.
          if (any && !hasNaN) Iterator((e.group, c, mn, mx))
          else Iterator.empty
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
    * (sample_normalization, quantile_normalization.py:67-89).
    *
    * Caches `ds` for its two passes (extents + normalize) and cannot
    * release it itself — the second pass is lazy. Cache scope is the
    * CALLER's run boundary: the CLI clears caches after export, and
    * Verify/Bench clear between queries; a long-lived session calling
    * this repeatedly should do the same. */
  def normalize(spark: SparkSession, ds: Dataset[ImageEvent]): Dataset[ImageEvent] = {
    val cached = ds.cache() // shared subplan: extents + normalize pass
    val minmax = groupMinMax(spark, cached)
    val bc = spark.sparkContext.broadcast(minmax)
    cached.map(ImageEvent.whenPixels { e =>
      val ps = e.planeSize
      val out = new Array[Float](e.pixels.length)
      var c = 0
      while (c < e.channels) {
        // missing extents (channel masked empty / all-NaN across the
        // group) fall back to the reference's untouched ±inf foldby
        // init, and the formula applies WITHOUT a zero-span guard —
        // numpy divides by zero: a constant channel normalizes to
        // NaN (v==lo ⟹ 0/0), an empty-extent channel to NaN via
        // -inf/-inf. Guarding either would diverge from
        // sample_normalization (quantile_normalization.py:83-84).
        val (lo, hi) = bc.value.getOrElse((e.group, c),
          (Double.PositiveInfinity, Double.NegativeInfinity))
        val span = hi - lo
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
