package graft.ops

import graft.core.ImageEvent
import graft.kernels.{Morphology, RegionProps}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck property tests for the invariants the reference's suite
  * relies on implicitly (SURVEY.md §5): tombstone monotonicity,
  * mask ⊆ bbox, normalization range, union-bbox ⊇ channel bboxes.
  * These run on local kernels (no Spark session — the invariants are
  * per-record).
  */
class PropertySpec extends AnyFunSuite {

  /** deterministic sampler: scalacheck Gen without the scalatestplus
    * bridge (not in the offline cache) */
  def forAll[A](gen: Gen[A], n: Int = 60)(check: A => Any): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check(_))
    }

  val dimGen: Gen[(Int, Int)] = for {
    h <- Gen.choose(6, 24)
    w <- Gen.choose(6, 24)
  } yield (h, w)

  def maskGen(h: Int, w: Int): Gen[Array[Boolean]] =
    Gen.containerOfN[Array, Boolean](h * w, Gen.prob(0.35))

  test("bbox of a mask contains every set pixel; union bbox contains channel bboxes") {
    forAll(dimGen.flatMap { case (h, w) =>
      maskGen(h, w).flatMap(m1 => maskGen(h, w).map(m2 => (h, w, m1, m2)))
    }) { case (h, w, m1, m2) =>
      def bbox(m: Array[Boolean]): Option[(Int, Int, Int, Int)] = {
        val set = m.zipWithIndex.filter(_._1).map(_._2)
        if (set.isEmpty) None
        else Some((set.map(_ / w).min, set.map(_ % w).min,
          set.map(_ / w).max + 1, set.map(_ % w).max + 1))
      }
      val union = m1.zip(m2).map { case (a, b) => a || b }
      (bbox(m1), bbox(union)) match {
        case (Some((r0, c0, r1, c1)), Some((ur0, uc0, ur1, uc1))) =>
          assert(ur0 <= r0 && uc0 <= c0 && ur1 >= r1 && uc1 >= c1)
        case (Some(_), None) => fail("union lost pixels")
        case _ => succeed
      }
    }
  }

  test("regionprops area equals pixel count; extent within (0,1]") {
    forAll(dimGen.flatMap { case (h, w) => maskGen(h, w).map((h, w, _)) }) {
      case (h, w, m) =>
        val n = m.count(identity)
        if (n > 0) {
          val p = RegionProps.compute(m, h, w)
          val names = RegionProps.Names.zipWithIndex.toMap
          assert(p(names("area")) == n.toDouble)
          assert(p(names("extent")) > 0 && p(names("extent")) <= 1.0)
          assert(p(names("filled_area")) >= p(names("area")))
          assert(p(names("convex_area")) >= p(names("area")))
          assert(p(names("solidity")) > 0 && p(names("solidity")) <= 1.0 + 1e-9)
        }
    }
  }

  test("label count is monotone under pixel removal of whole components") {
    forAll(dimGen.flatMap { case (h, w) => maskGen(h, w).map((h, w, _)) }) {
      case (h, w, m) =>
        val labels = Morphology.label(m, h, w)
        val n = Morphology.labelCount(labels)
        // removing all pixels of label 1 reduces count by exactly 1
        if (n >= 1) {
          val without = m.zipWithIndex.map { case (v, i) => v && labels(i) != 1 }
          assert(Morphology.labelCount(Morphology.label(without, h, w)) == n - 1)
        }
    }
  }

  test("tombstone monotonicity: ops on tombstones preserve the husk") {
    val e = ImageEvent.fromPixels("p", 1, "g", Map("k" -> "v"), 2, 4, 4,
      Array.fill(32)(1f)).tombstone
    // whenPixels must be identity on tombstones for ANY f
    forAll(Gen.choose(-100, 100)) { salt =>
      val f = ImageEvent.whenPixels(ev => ev.copy(id = salt))(_)
      assert(f(e) eq e)
    }
    assert(e.meta == Map("k" -> "v"))
  }

  test("erosion shrinks, dilation grows, open/close bounded by both") {
    forAll(dimGen.flatMap { case (h, w) => maskGen(h, w).map((h, w, _)) }) {
      case (h, w, m) =>
        val er = Morphology.erodeBinary(m, h, w, 1)
        val di = Morphology.dilateBinary(m, h, w, 1)
        (0 until h * w).foreach { i =>
          assert(!er(i) || m(i))  // erosion ⊆ mask
          assert(!m(i) || di(i))  // mask ⊆ dilation
        }
        val op = Morphology.openBinary(m, h, w, 1)
        (0 until h * w).foreach(i => assert(!op(i) || m(i))) // opening ⊆ mask
    }
  }
}
