package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

/** skimage regionprops computes raw moments on the region's CROPPED
  * image (bbox-local frame) — translating a region must not change ANY
  * of the 59 properties, raw moments included. */
class MomentFrameSpec extends AnyFunSuite {

  private def mask(h: Int, w: Int)(f: (Int, Int) => Boolean): Array[Boolean] =
    Array.tabulate(h * w)(i => f(i / w, i % w))

  test("all 59 props are identical under translation (bbox-local frame)") {
    val a = mask(12, 12)((r, c) => r >= 1 && r <= 4 && c >= 1 && c <= 6 && !(r == 2 && c == 3))
    val b = mask(15, 20)((r, c) => r >= 8 && r <= 11 && c >= 12 && c <= 17 && !(r == 9 && c == 14))
    val pa = RegionProps.compute(a, 12, 12)
    val pb = RegionProps.compute(b, 15, 20)
    RegionProps.Names.zipWithIndex.foreach { case (n, i) =>
      assert(math.abs(pa(i) - pb(i)) < 1e-9, s"$n: ${pa(i)} vs ${pb(i)}")
    }
    // raw m10 in the local frame: rows 0..3 of the cropped region
    val names = RegionProps.Names.zipWithIndex.toMap
    assert(pa(names("moments-0-0")) == 23.0)
    // m10 = sum of local r over pixels: rows 0,1,2,3 x 6 cols = (0+1+2+3)*6 = 36, minus hole at local r=1 -> 35
    assert(pa(names("moments-1-0")) == 35.0)
  }
}
