package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  val arange: Array[Float] = Array.tabulate(100)(_.toFloat)

  test("arange(100) closed-form stats (numpy goldens)") {
    assert(Stats.mean(arange) == 49.5)
    assert(math.abs(Stats.std(arange) - 28.86607004772212) < 1e-9)
    assert(Stats.median(arange) == 49.5)
    assert(Stats.mad(arange) == 25.0)
    val s = arange.clone(); java.util.Arrays.sort(s)
    assert(Stats.percentile(s, 25) == 24.75)
    assert(Stats.percentile(s, 75) == 74.25)
    assert(Stats.skewness(arange) == 0.0)
    assert(math.abs(Stats.kurtosis(arange) - (-1.2002400240024003)) < 1e-12)
    assert(Stats.sum(arange) == 4950.0)
  }

  test("intensityRow order matches features/intensity.py props list") {
    val row = Stats.intensityRow(arange)
    assert(row.length == 11)
    assert(row(0) == 49.5)   // mean
    assert(row(1) == 49.5)   // median
    assert(row(2) == 99.0)   // max
    assert(row(3) == 0.0)    // min
    assert(row(8) == 4950.0) // sum
    assert(Stats.intensityRow(Array.empty[Float]).forall(_ == 0.0))
  }

  test("normaltest: uniform data rejects normality, gaussian-ish does not") {
    // discrete uniform has strong negative kurtosis -> tiny p
    assert(Stats.normaltestP(arange) < 0.05)
    // symmetric unimodal (binomial-like) sample: counts of a quincunx
    val rng = new scala.util.Random(7)
    val gauss = Array.fill(200)(((0 until 12).map(_ => rng.nextDouble()).sum - 6).toFloat)
    assert(Stats.normaltestP(gauss) > 0.05)
  }

  test("skewtest Z is antisymmetric") {
    val right = Array.tabulate(50)(i => (i * i).toFloat)    // right-skewed
    val left = right.map(v => -v)
    assert(Stats.skewtestZ(right) > 1.5)
    assert(math.abs(Stats.skewtestZ(right) + Stats.skewtestZ(left)) < 1e-9)
  }
}
