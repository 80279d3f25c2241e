package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic image source.
  *
  * `conftest` replicates the reference test fixture
  * (test/conftest.py:39-52,69-71): N events whose every channel is
  * arange(h·w) reshaped to (h, w), first half group "one", second
  * half "two" (`["one"] * (n // 2) + ["two"] * (n - n // 2)`) —
  * the basis of the [0,99]/[22,77] quantile goldens
  * (test/normalization/test_quantile_normalization.py:23-41).
  *
  * `cells` generates a scalable corpus of cell-like images (gaussian
  * blobs on a dark background, deterministic per idx) for bench and
  * e2e runs. Generation happens inside mapPartitions on the executors
  * — the driver only ships the index range, so the source scales to
  * any event count without driver memory involvement (the 100 TB
  * posture of SURVEY.md §7).
  */
object Synthetic {

  def conftest(spark: SparkSession, n: Int = 10, channels: Int = 3,
      h: Int = 10, w: Int = 10): Dataset[ImageEvent] = {
    import spark.implicits._
    val plane = Array.tabulate(h * w)(_.toFloat)
    val px = Array.tabulate(channels * h * w)(i => plane(i % (h * w)))
    spark.range(n).map { i =>
      ImageEvent.fromPixels(
        path = s"synthetic://conftest/$i", idx = i,
        group = if (i < n / 2) "one" else "two",
        meta = Map("fov" -> i.toString),
        channels = channels, height = h, width = w, pixels = px.clone())
    }
  }

  /** deterministic pseudo-random cell images: `nBlobs` gaussian spots
    * at splitmix-derived positions, intensity scaled per group */
  def cells(spark: SparkSession, n: Int, channels: Int = 2,
      h: Int = 48, w: Int = 48, nGroups: Int = 4): Dataset[ImageEvent] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      ImageEvent.fromPixels(
        path = s"synthetic://cells/$i", idx = i,
        group = s"g${i % nGroups}",
        meta = Map("fov" -> i.toString),
        channels = channels, height = h, width = w,
        pixels = cellPixels(i, channels, h, w, nGroups))
    })
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def unif(seed: Long): Double =
    (mix(seed) >>> 11).toDouble / (1L << 53).toDouble

  private[core] def cellPixels(idx: Long, channels: Int, h: Int, w: Int,
      nGroups: Int): Array[Float] = {
    val px = new Array[Float](channels * h * w)
    val nBlobs = 2 + (mix(idx) & 1L).toInt
    val gain = 1.0 + (idx % nGroups) * 0.5 // group-dependent illumination
    var b = 0
    while (b < nBlobs) {
      val cy = 8 + unif(idx * 31 + b * 7 + 1) * (h - 16)
      val cx = 8 + unif(idx * 31 + b * 7 + 2) * (w - 16)
      val sig = 2.5 + unif(idx * 31 + b * 7 + 3) * 2.0
      val amp = 120.0 + unif(idx * 31 + b * 7 + 4) * 100.0
      var c = 0
      while (c < channels) {
        val chGain = gain * (1.0 - 0.2 * c)
        var r = 0
        while (r < h) {
          var col = 0
          while (col < w) {
            val d2 = (r - cy) * (r - cy) + (col - cx) * (col - cx)
            px(c * h * w + r * w + col) =
              (px(c * h * w + r * w + col) +
                chGain * amp * math.exp(-d2 / (2 * sig * sig))).toFloat
            col += 1
          }
          r += 1
        }
        c += 1
      }
      b += 1
    }
    // low deterministic background so thresholds see two classes.
    // Seed streams are disjoint PER EVENT (mix(idx) spreads events
    // ~2^64 apart): a plain idx*131 + i overlapped 97% of consecutive
    // events' seeds, making their "random" backgrounds shifted copies
    val eventSeed = mix(idx)
    var i = 0
    while (i < px.length) {
      px(i) = (px(i) + 5.0 + 2.0 * unif(eventSeed + i)).toFloat
      i += 1
    }
    px
  }
}
