package graft.kernels

/** Descriptive statistics over pixel vectors — the numeric core of the
  * intensity features (reference: features/intensity.py:25-37 props
  * list) and the mask filters (masking/filters/ modules).
  *
  * All results in Double; inputs are Float pixel values. Percentiles
  * use linear interpolation (numpy default), skew/kurtosis are the
  * biased moment estimators (scipy defaults with bias=True), and
  * `normaltestP` is D'Agostino-Pearson K² with the exact chi²(2df)
  * survival function exp(-K²/2) (reference filter:
  * masking/filters/normaltest.py).
  */
object Stats {

  def mean(xs: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < xs.length) { s += xs(i); i += 1 }
    if (xs.length == 0) Double.NaN else s / xs.length
  }

  def sum(xs: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < xs.length) { s += xs(i); i += 1 }
    s
  }

  def minMax(xs: Array[Float]): (Double, Double) = {
    if (xs.length == 0) return (Double.NaN, Double.NaN)
    var mn = xs(0).toDouble; var mx = xs(0).toDouble; var i = 1
    while (i < xs.length) {
      val v = xs(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    (mn, mx)
  }

  /** population std (ddof=0 — numpy default, used by the std mask
    * filter masking/filters/std.py) */
  def std(xs: Array[Float]): Double = {
    if (xs.length == 0) return Double.NaN
    val m = mean(xs)
    var s = 0.0; var i = 0
    while (i < xs.length) { val d = xs(i) - m; s += d * d; i += 1 }
    math.sqrt(s / xs.length)
  }

  /** central moment of order k */
  private def centralMoment(xs: Array[Float], m: Double, k: Int): Double = {
    var s = 0.0; var i = 0
    while (i < xs.length) { s += math.pow(xs(i) - m, k); i += 1 }
    s / xs.length
  }

  /** linear-interpolation percentile (numpy.percentile default) on a
    * pre-sorted copy */
  def percentile(sorted: Array[Float], q: Double): Double = {
    val n = sorted.length
    if (n == 0) return Double.NaN
    if (n == 1) return sorted(0)
    val pos = q / 100.0 * (n - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  def median(xs: Array[Float]): Double = {
    val s = xs.clone(); java.util.Arrays.sort(s); percentile(s, 50)
  }

  /** median absolute deviation (scipy.stats.median_abs_deviation) */
  def mad(xs: Array[Float]): Double = {
    if (xs.length == 0) return Double.NaN
    val med = median(xs)
    val dev = new Array[Float](xs.length)
    var i = 0
    while (i < xs.length) { dev(i) = math.abs(xs(i) - med).toFloat; i += 1 }
    median(dev)
  }

  /** biased sample skewness g1 = m3 / m2^1.5 (scipy bias=True) */
  def skewness(xs: Array[Float]): Double = {
    if (xs.length == 0) return Double.NaN
    val m = mean(xs)
    val m2 = centralMoment(xs, m, 2)
    val m3 = centralMoment(xs, m, 3)
    if (m2 == 0.0) 0.0 else m3 / math.pow(m2, 1.5)
  }

  /** biased excess kurtosis g2 = m4/m2² − 3 (scipy fisher=True, bias=True) */
  def kurtosis(xs: Array[Float]): Double = {
    if (xs.length == 0) return Double.NaN
    val m = mean(xs)
    val m2 = centralMoment(xs, m, 2)
    val m4 = centralMoment(xs, m, 4)
    if (m2 == 0.0) -3.0 else m4 / (m2 * m2) - 3.0
  }

  /** The 11-stat row of features/intensity.py:25-37, in its order:
    * mean, median, max, min, std, mad, q25, q75, sum, skew, kurtosis. */
  def intensityRow(xs: Array[Float]): Array[Double] = {
    if (xs.length == 0) return Array.fill(11)(0.0) // empty-view default (missing_masks contract)
    val s = xs.clone(); java.util.Arrays.sort(s)
    val m = mean(xs)
    Array(
      m,
      percentile(s, 50),
      s(s.length - 1).toDouble,
      s(0).toDouble,
      std(xs),
      mad(xs),
      percentile(s, 25),
      percentile(s, 75),
      sum(xs),
      skewness(xs),
      kurtosis(xs))
  }

  // ---- D'Agostino-Pearson normality test --------------------------------

  /** scipy.stats.skewtest Z statistic (D'Agostino 1970) */
  def skewtestZ(xs: Array[Float]): Double = {
    val n = xs.length.toDouble
    require(n >= 8, "skewtest needs n >= 8")
    val b2 = skewness(xs)
    val y = b2 * math.sqrt(((n + 1) * (n + 3)) / (6.0 * (n - 2)))
    val beta2 = 3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3) /
      ((n - 2.0) * (n + 5) * (n + 7) * (n + 9))
    val w2 = -1.0 + math.sqrt(2.0 * (beta2 - 1))
    val delta = 1.0 / math.sqrt(0.5 * math.log(w2))
    val alpha = math.sqrt(2.0 / (w2 - 1))
    val yy = if (y == 0) 1e-300 else y / alpha
    delta * math.log(yy + math.sqrt(yy * yy + 1))
  }

  /** scipy.stats.kurtosistest Z statistic (Anscombe & Glynn 1983) */
  def kurtosistestZ(xs: Array[Float]): Double = {
    val n = xs.length.toDouble
    require(n >= 5, "kurtosistest needs n >= 5")
    val b2 = kurtosis(xs) + 3.0 // Pearson (non-excess) kurtosis
    val e = 3.0 * (n - 1) / (n + 1)
    val varb2 = 24.0 * n * (n - 2) * (n - 3) / ((n + 1) * (n + 1) * (n + 3) * (n + 5))
    val x = (b2 - e) / math.sqrt(varb2)
    val sqrtbeta1 = 6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9)) *
      math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    val a = 6.0 + 8.0 / sqrtbeta1 *
      (2.0 / sqrtbeta1 + math.sqrt(1 + 4.0 / (sqrtbeta1 * sqrtbeta1)))
    val term1 = 1.0 - 2.0 / (9 * a)
    val denom = 1.0 + x * math.sqrt(2.0 / (a - 4))
    val term2 =
      if (denom == 0) 0.0
      else math.signum(denom) * math.cbrt((1.0 - 2.0 / a) / math.abs(denom))
    (term1 - term2) / math.sqrt(2.0 / (9 * a))
  }

  /** p-value of D'Agostino-Pearson K² (chi² sf with 2 dof = exp(-x/2)).
    * The normaltest mask filter keeps a channel when p < 0.05
    * (masking/filters/normaltest.py:1-10). */
  def normaltestP(xs: Array[Float]): Double = {
    val zs = skewtestZ(xs)
    val zk = kurtosistestZ(xs)
    val k2 = zs * zs + zk * zk
    math.exp(-k2 / 2.0)
  }
}
