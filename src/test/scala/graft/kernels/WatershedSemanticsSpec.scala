package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

/** hand-derived goldens for the skimage-mirroring watershed semantics
  * (4-connectivity, plain mode labels at push, compact mode labels at
  * pop with euclidean distance-to-seed priority). */
class WatershedSemanticsSpec extends AnyFunSuite {

  test("plain mode: 1-D valley floods from both ends, ridge goes to the earlier arrival") {
    // elev: 0 1 2 3 2 1 0, markers at the ends. Both fronts climb at
    // equal priorities; the left front was enqueued first at every
    // level, so the ridge pixel (col 3) is claimed by label 1.
    val elev = Array[Double](0, 1, 2, 3, 2, 1, 0)
    val markers = new Array[Int](7)
    markers(0) = 1; markers(6) = 2
    val ws = Watershed.watershed(elev, 1, 7, markers)
    assert(ws.toSeq == Seq(1, 1, 1, 1, 2, 2, 2))
  }

  test("compact mode on flat elevation splits at the euclidean midpoint") {
    // flat elevation, seeds at cols 0 and 7: priority = distance to
    // seed, so cols 0-3 go left (d <= 3 < 4) and cols 4-7 go right
    val elev = new Array[Double](8)
    val markers = new Array[Int](8)
    markers(0) = 1; markers(7) = 2
    val ws = Watershed.watershed(elev, 1, 8, markers, null, compactness = 1.0)
    assert(ws.toSeq == Seq(1, 1, 1, 1, 2, 2, 2, 2))
  }

  test("compact mode uses euclidean (not squared) seed distance") {
    // 2-D flat field; seed A at (0,0), seed B at (0,6). Pixel (3,3):
    // euclidean d(A) = sqrt(18) ~ 4.24 < d(B) = sqrt(9+9) equal...
    // use (2,1): d(A)=sqrt(5)~2.24, d(B)=sqrt(4+25)=sqrt(29)~5.39 -> A;
    // and (2,5): d(A)=sqrt(29), d(B)=sqrt(5) -> B. With SQUARED
    // distances the assignments agree here, so also pin a case where
    // they differ in ARRIVAL ORDER: (0,3) d(A)=3 vs d(B)=3 — tie goes
    // to the earlier-enqueued front (A, enqueued first).
    val h = 4; val w = 7
    val elev = new Array[Double](h * w)
    val markers = new Array[Int](h * w)
    markers(0) = 1; markers(6) = 2
    val ws = Watershed.watershed(elev, h, w, markers, null, compactness = 1.0)
    assert(ws(2 * w + 1) == 1)
    assert(ws(2 * w + 5) == 2)
    assert(ws(3) == 1) // equidistant tie -> first-enqueued front
  }

  test("4-connectivity: diagonal-only bridges do not leak labels") {
    // mask forms two regions touching only diagonally; a single marker
    // in one region must not flood the other
    val h = 3; val w = 3
    val mask = Array(
      true, true, false,
      true, false, false,
      false, false, true) // (2,2) touches (1,1)=false only diagonally
    val elev = new Array[Double](h * w)
    val markers = new Array[Int](h * w)
    markers(0) = 1
    val ws = Watershed.watershed(elev, h, w, markers, mask)
    assert(ws(0) == 1 && ws(1) == 1 && ws(3) == 1)
    assert(ws(8) == 0, "diagonal neighbor must stay unlabeled under 4-connectivity")
  }
}
