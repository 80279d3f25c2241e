package graft.kernels

/** Histogram thresholds: Otsu (maximize between-class variance) and Li
  * (iterative minimum cross entropy) — the decision step of masking
  * kernels C1 (masking/otsu.py:8-52) and C2 (masking/li.py:25-53).
  */
object Thresholds {

  /** Otsu's threshold over a 256-bin histogram of [min,max]
    * (skimage.filters.threshold_otsu default nbins=256). Returns the
    * bin-center threshold; pixels > t are foreground. */
  def otsu(img: Array[Float], nbins: Int = 256): Double = {
    val (mn, mx) = Stats.minMax(img)
    if (mx == mn) return mn
    val hist = new Array[Long](nbins)
    val scale = nbins / (mx - mn)
    var i = 0
    while (i < img.length) {
      var b = ((img(i) - mn) * scale).toInt
      if (b >= nbins) b = nbins - 1
      hist(b) += 1
      i += 1
    }
    val binWidth = (mx - mn) / nbins
    // bin centers
    val centers = Array.tabulate(nbins)(b => mn + (b + 0.5) * binWidth)
    val total = img.length.toDouble
    var sumAll = 0.0
    i = 0
    while (i < nbins) { sumAll += hist(i) * centers(i); i += 1 }
    var wB = 0.0; var sumB = 0.0
    var bestVar = -1.0; var bestT = centers(0)
    i = 0
    while (i < nbins - 1) {
      wB += hist(i)
      sumB += hist(i) * centers(i)
      val wF = total - wB
      if (wB > 0 && wF > 0) {
        val mB = sumB / wB
        val mF = (sumAll - sumB) / wF
        val between = wB * wF * (mB - mF) * (mB - mF)
        if (between > bestVar) { bestVar = between; bestT = centers(i) }
      }
      i += 1
    }
    bestT
  }

  /** Li's iterative minimum-cross-entropy threshold (Li & Tam 1998,
    * skimage.filters.threshold_li). Operates on values shifted to be
    * positive; iterates t ← (μ₁−μ₀)/(ln μ₁ − ln μ₀) to convergence. */
  def li(img: Array[Float], tol: Double = 1e-5, maxIter: Int = 100): Double = {
    val (mn, mx) = Stats.minMax(img)
    if (mx == mn) return mn
    // shift so all values > 0 (li needs logs)
    val shift = if (mn <= 0) -mn + 1e-6 else 0.0
    var t = (mn + mx) / 2.0 + shift
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      var s0 = 0.0; var n0 = 0L; var s1 = 0.0; var n1 = 0L
      var i = 0
      while (i < img.length) {
        val v = img(i) + shift
        if (v <= t) { s0 += v; n0 += 1 } else { s1 += v; n1 += 1 }
        i += 1
      }
      if (n0 == 0 || n1 == 0) done = true
      else {
        val m0 = s0 / n0; val m1 = s1 / n1
        val tNew =
          if (m0 <= 0 || math.abs(math.log(m1) - math.log(m0)) < 1e-12) (m0 + m1) / 2
          else (m1 - m0) / (math.log(m1) - math.log(m0))
        if (math.abs(tNew - t) < tol) done = true
        t = tNew
      }
      iter += 1
    }
    t - shift
  }
}
