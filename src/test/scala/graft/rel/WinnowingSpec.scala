package graft.rel

import graft.SparkSpec

/** Winnowing (t08) semantics: the published guarantees of Schleimer,
  * Wilkerson, Aiken 2003 hold for our leftmost-min variant — every
  * window contributes a fingerprint (coverage), selection density is
  * ~2/(w+1), and any shared substring of length ≥ k+w−1 produces at
  * least one shared fingerprint hash (the detection guarantee).
  */
class WinnowingSpec extends SparkSpec {

  private val k = TextOps.WinnowK
  private val w = TextOps.WinnowW

  /** naive reference: materialize all k-gram hashes, take per-window
    * minima by scanning (independent of the production loop's shape) */
  private def naive(text: String): Set[(Long, Long)] = {
    val Mod = 1000000007L
    val cps = text.codePoints().toArray
    val hs = (0 to cps.length - k).map { i =>
      cps.slice(i, i + k).foldLeft(0L)((h, c) => (h * 31 + c) % Mod)
    }
    (0 to hs.length - w).flatMap { s =>
      val win = hs.slice(s, s + w)
      val m = win.min
      Some(((s + win.indexOf(m) + 1).toLong, m))
    }.toSet
  }

  test("production winnow equals the naive reference on varied texts") {
    val rng = new scala.util.Random(3)
    val texts = Seq(
      "abcdefghijklmnopqrstuvwxyz",
      "aaaaaaaaaaaaaaaaaaaa", // all-equal hashes: leftmost-tie rule
      "the quick brown fox jumps over the lazy dog",
      "ab" * 30) ++
      Seq.fill(10)(rng.alphanumeric.take(15 + rng.nextInt(60)).mkString)
    texts.foreach { t =>
      assert(TextOps.winnow(t).toSet == naive(t), s"text: $t")
    }
  }

  test("too-short texts produce no fingerprints") {
    assert(TextOps.winnow("").isEmpty)
    assert(TextOps.winnow("a" * (k + w - 2)).isEmpty)
    assert(TextOps.winnow("a" * (k + w - 1)).nonEmpty)
  }

  test("detection guarantee: shared substring >= k+w-1 shares a fingerprint") {
    val rng = new scala.util.Random(11)
    for (_ <- 0 until 20) {
      val shared = rng.alphanumeric.take(k + w - 1 + rng.nextInt(20)).mkString
      val a = rng.alphanumeric.take(rng.nextInt(30)).mkString + shared +
        rng.alphanumeric.take(rng.nextInt(30)).mkString
      val b = rng.alphanumeric.take(rng.nextInt(30)).mkString + shared +
        rng.alphanumeric.take(rng.nextInt(30)).mkString
      val fa = TextOps.winnow(a).map(_._2).toSet
      val fb = TextOps.winnow(b).map(_._2).toSet
      assert(fa.intersect(fb).nonEmpty, s"shared=$shared a=$a b=$b")
    }
  }

  test("density is near the published 2/(w+1)") {
    val rng = new scala.util.Random(5)
    val t = rng.alphanumeric.take(5000).mkString
    val nWindows = t.length - k + 1 - w + 1
    val density = TextOps.winnow(t).size.toDouble / nWindows
    assert(density > 1.0 / (w + 1) && density < 3.0 / (w + 1), s"density $density")
  }
}
