package graft.kernels

/** Gray-level co-occurrence matrix and Haralick-style properties —
  * texture feature kernel C14 (features/texture.py:25-132: 15-bin
  * quantize, distances 3 and 5, angles 45/135/225/315°, symmetric,
  * normed; props contrast, dissimilarity, homogeneity, energy,
  * correlation, ASM).
  */
object Glcm {

  val Props: Seq[String] =
    Seq("contrast", "dissimilarity", "homogeneity", "energy", "correlation", "asm")

  /** co-occurrence counts for one (distance, angle): offset convention
    * matches skimage.feature.graycomatrix — row offset = round(d·sin θ),
    * col offset = round(d·cos θ). `levels` quantized values in
    * [0, levels); entries < 0 mark invalid (out-of-mask) pixels and
    * pairs touching them are dropped — the reference's NaN-bin +
    * [:-1,:-1] crop (features/texture.py:60-69). Returns the
    * symmetric matrix normalized over VALID pairs only: although
    * graycomatrix(normed=True) divides by ALL pairs before the crop,
    * skimage.feature.graycoprops re-normalizes each (cropped) GLCM to
    * sum 1 before computing any property, so dividing by the valid
    * total here is exactly equivalent — including the all-invalid
    * case, where graycoprops' zero-sum guard yields correlation 1 and
    * 0 for the rest, as [[properties]] does. */
  def matrix(q: Array[Int], h: Int, w: Int, levels: Int,
      distance: Int, angleRad: Double): Array[Double] = {
    val dr = math.round(distance * math.sin(angleRad)).toInt
    val dc = math.round(distance * math.cos(angleRad)).toInt
    val m = new Array[Double](levels * levels)
    var r = 0
    var total = 0.0
    while (r < h) {
      var c = 0
      while (c < w) {
        val rr = r + dr; val cc = c + dc
        if (rr >= 0 && rr < h && cc >= 0 && cc < w) {
          val a = q(r * w + c); val b = q(rr * w + cc)
          if (a >= 0 && b >= 0) {
            m(a * levels + b) += 1.0
            m(b * levels + a) += 1.0 // symmetric
            total += 2.0
          }
        }
        c += 1
      }
      r += 1
    }
    if (total > 0) {
      var i = 0
      while (i < m.length) { m(i) /= total; i += 1 }
    }
    m
  }

  /** the six graycoprops over a normalized GLCM, in Props order */
  def properties(p: Array[Double], levels: Int): Array[Double] = {
    var contrast = 0.0; var dissim = 0.0; var homog = 0.0; var asm = 0.0
    var mi = 0.0; var mj = 0.0
    var i = 0
    while (i < levels) {
      var j = 0
      while (j < levels) {
        val v = p(i * levels + j)
        val d = i - j
        contrast += v * d * d
        dissim += v * math.abs(d)
        homog += v / (1.0 + d * d)
        asm += v * v
        mi += i * v
        mj += j * v
        j += 1
      }
      i += 1
    }
    var si = 0.0; var sj = 0.0; var cov = 0.0
    i = 0
    while (i < levels) {
      var j = 0
      while (j < levels) {
        val v = p(i * levels + j)
        si += v * (i - mi) * (i - mi)
        sj += v * (j - mj) * (j - mj)
        cov += v * (i - mi) * (j - mj)
        j += 1
      }
      i += 1
    }
    val corr =
      if (si < 1e-15 || sj < 1e-15) 1.0 // constant image: skimage returns 1
      else cov / math.sqrt(si * sj)
    Array(contrast, dissim, homog, math.sqrt(asm), corr, asm)
  }

  val Angles: Array[Double] =
    Array(math.Pi / 4, 3 * math.Pi / 4, 5 * math.Pi / 4, 7 * math.Pi / 4)

  /** mean and std (population) over the four angles for each prop, for
    * one distance: Array(propIdx) = (mean, std) — the
    * glcm_mean_/glcm_std_ columns of features/texture.py:77-94 */
  def meanStdOverAngles(q: Array[Int], h: Int, w: Int, levels: Int,
      distance: Int): Array[(Double, Double)] = {
    val perAngle = Angles.map(a => properties(matrix(q, h, w, levels, distance, a), levels))
    Array.tabulate(Props.length) { p =>
      val vals = perAngle.map(_(p))
      val m = vals.sum / vals.length
      val v = vals.map(x => (x - m) * (x - m)).sum / vals.length
      (m, math.sqrt(v))
    }
  }
}
