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

  /** scipy's zero-variance guard: skew/kurtosis are NaN when m2 is at
    * or below the squared rounding floor of the data — scipy compares
    * m2 <= (finfo(dtype).resolution * mean)^2, and the engine's pixel
    * inputs are float32 (resolution 1e-6). Returning 0.0 / -3.0 here
    * (the old behavior) flipped normaltest mask-filter decisions on
    * constant planes and emitted garbage skew/kurtosis on near-flat
    * float32 backgrounds where m2 is pure rounding noise. */
  private def zeroVariance(m2: Double, m: Double): Boolean =
    m2 <= (1e-6 * m) * (1e-6 * m)

  /** biased sample skewness g1 = m3 / m2^1.5 (scipy bias=True);
    * NaN on (near-)zero variance, as scipy */
  def skewness(xs: Array[Float]): Double = {
    if (xs.length == 0) return Double.NaN
    val m = mean(xs)
    val m2 = centralMoment(xs, m, 2)
    val m3 = centralMoment(xs, m, 3)
    if (zeroVariance(m2, m)) Double.NaN else m3 / math.pow(m2, 1.5)
  }

  /** biased excess kurtosis g2 = m4/m2² − 3 (scipy fisher=True,
    * bias=True); NaN on (near-)zero variance, as scipy */
  def kurtosis(xs: Array[Float]): Double = {
    if (xs.length == 0) return Double.NaN
    val m = mean(xs)
    val m2 = centralMoment(xs, m, 2)
    val m4 = centralMoment(xs, m, 4)
    if (zeroVariance(m2, m)) Double.NaN else m4 / (m2 * m2) - 3.0
  }

  /** The 11-stat row of features/intensity.py:25-37, in its order:
    * mean, median, max, min, std, mad, q25, q75, sum, skew, kurtosis. */
  def intensityRow(xs: Array[Float]): Array[Double] = {
    if (xs.length == 0) return Array.fill(11)(0.0) // empty-view default (missing_masks contract)
    val s = xs.clone(); java.util.Arrays.sort(s)
    val m = mean(xs)
    // one fused pass for m2/m3/m4 (std, skew, kurtosis all derive from
    // them — three separate math.pow passes before), and mad reuses
    // the already-computed median instead of re-sorting for it
    var m2 = 0.0; var m3 = 0.0; var m4 = 0.0
    var i = 0
    while (i < xs.length) {
      val d = xs(i) - m
      val d2 = d * d
      m2 += d2; m3 += d2 * d; m4 += d2 * d2
      i += 1
    }
    m2 /= xs.length; m3 /= xs.length; m4 /= xs.length
    val med = percentile(s, 50)
    val dev = new Array[Float](xs.length)
    i = 0
    while (i < xs.length) { dev(i) = math.abs(xs(i) - med).toFloat; i += 1 }
    java.util.Arrays.sort(dev)
    Array(
      m,
      med,
      s(s.length - 1).toDouble,
      s(0).toDouble,
      math.sqrt(m2),
      percentile(dev, 50),
      percentile(s, 25),
      percentile(s, 75),
      sum(xs),
      if (zeroVariance(m2, m)) Double.NaN else m3 / math.pow(m2, 1.5),
      if (zeroVariance(m2, m)) Double.NaN else m4 / (m2 * m2) - 3.0)
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
    // scipy substitutes y = 1 (not an epsilon) when y == 0: zero-skew
    // data still gets the nonzero Z = delta*asinh(1/alpha); an epsilon
    // here understated K2 and overstated the normality p-value
    val yy = (if (y == 0) 1.0 else y) / alpha
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
    // scipy: "Test statistic not defined in some cases" — denom == 0
    // yields NaN (sign(0)*nan), so the normaltest p is NaN and the
    // filter fails, rather than a fabricated finite Z
    val term2 =
      if (denom == 0) Double.NaN
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
