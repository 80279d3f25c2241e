package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

/** Proves the rebuttal to round-1 ADVICE #2: normalizing the GLCM over
  * valid pairs only (Glcm.matrix) is numerically identical to the
  * reference pipeline graycomatrix(normed=True) over ALL pairs
  * including the NaN bin, cropped [:-1,:-1], then re-normalized by
  * graycoprops before property computation (skimage does that
  * re-normalization unconditionally). */
class GlcmEquivalenceSpec extends AnyFunSuite {

  /** the literal skimage pipeline: (levels+1)-bin matrix with invalid
    * pixels in the last bin, normalize over everything, crop, then the
    * graycoprops re-normalization */
  private def skimagePipeline(q: Array[Int], h: Int, w: Int, levels: Int,
      distance: Int, angleRad: Double): Array[Double] = {
    val full = levels + 1
    val dr = math.round(distance * math.sin(angleRad)).toInt
    val dc = math.round(distance * math.cos(angleRad)).toInt
    val m = new Array[Double](full * full)
    var total = 0.0
    for (r <- 0 until h; c <- 0 until w) {
      val rr = r + dr; val cc = c + dc
      if (rr >= 0 && rr < h && cc >= 0 && cc < w) {
        val a = if (q(r * w + c) < 0) levels else q(r * w + c)
        val b = if (q(rr * w + cc) < 0) levels else q(rr * w + cc)
        m(a * full + b) += 1.0; m(b * full + a) += 1.0 // symmetric
        total += 2.0
      }
    }
    if (total > 0) for (i <- m.indices) m(i) /= total // normed=True
    // crop [:-1,:-1]
    val cropped = Array.tabulate(levels * levels) { i =>
      m((i / levels) * full + (i % levels))
    }
    // graycoprops re-normalization
    val s = cropped.sum
    if (s > 0) cropped.map(_ / s) else cropped
  }

  test("valid-pair normalization == normed+crop+renormalize, all props") {
    val rng = new scala.util.Random(11)
    val levels = 16
    for (trial <- 0 until 6) {
      val h = 8 + rng.nextInt(8); val w = 8 + rng.nextInt(8)
      val q = Array.fill(h * w)(
        if (rng.nextDouble() < 0.3) -1 else rng.nextInt(levels)) // 30% masked
      for (d <- Seq(3, 5); a <- Glcm.Angles) {
        val mine = Glcm.properties(Glcm.matrix(q, h, w, levels, d, a), levels)
        val ref = Glcm.properties(skimagePipeline(q, h, w, levels, d, a), levels)
        mine.zip(ref).zipWithIndex.foreach { case ((x, y), p) =>
          assert(math.abs(x - y) < 1e-12,
            s"trial $trial d=$d a=$a prop=${Glcm.Props(p)}: $x vs $y")
        }
      }
    }
  }

  test("all-masked window: correlation 1, others 0 (both pipelines)") {
    val q = Array.fill(36)(-1)
    val mine = Glcm.properties(Glcm.matrix(q, 6, 6, 16, 3, Glcm.Angles.head), 16)
    assert(mine.toSeq == Seq(0.0, 0.0, 0.0, 0.0, 1.0, 0.0))
  }
}
