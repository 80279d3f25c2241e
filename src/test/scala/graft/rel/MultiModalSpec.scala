package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultiModalSpec extends SparkSpec {

  test("decodeStub is deterministic in the payload") {
    val p = "hello multimodal".getBytes("UTF-8")
    val a = MultiModal.decodeStub(p)
    val b = MultiModal.decodeStub(p)
    assert(a == b)
    assert(a.n_bytes == p.length)
    assert(a.byte_sum == p.map(_ & 0xff).sum)
  }

  test("extractMediaFeatures preserves rows, schema, and null payloads") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val n = docs.count()
    val out = MultiModal.extractMediaFeatures(docs)
    assert(out.count() == n)
    assert(out.columns.toSeq ==
      Seq("doc_id", "payload", "n_bytes", "width", "height", "channels", "byte_sum"))
    // tombstone contract: null payload keeps its row with null meta
    // (SQL null propagation — not a fake zero-sized decode)
    val withNull = docs.withColumn("payload",
      when(col("doc_id") === 0, lit(null)).otherwise(col("payload")))
    val outNull = MultiModal.extractMediaFeatures(withNull)
    assert(outNull.count() == n)
    val z = outNull.filter(col("doc_id") === 0)
      .select("n_bytes", "width", "height", "channels", "byte_sum").head()
    assert((0 until 5).forall(z.isNullAt), z.toString)
  }

  test("m05: fingerprints match a driver replay; partner counts agree with brute force") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = docs.flatMap { case (id, t) =>
      if (t == null) None
      else MultiModal.pHash60(t.getBytes("UTF-8")).map(id -> _)
    }.sortBy(_._1)
    val got = MultiModal.perceptualNearDup(spark, sfDir, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => (t._1, t._2)).toSeq == exp.toSeq)
    // brute-force partner counts over the full pair space
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (i <- exp.indices; j <- (i + 1) until exp.length)
      if (java.lang.Long.bitCount(exp(i)._2 ^ exp(j)._2) <= 3) {
        counts(exp(i)._1) += 1; counts(exp(j)._1) += 1
      }
    assert(got.map(t => (t._1, t._3)).toSeq == exp.map(t => (t._1, counts(t._1))).toSeq)
  }

  test("m05: planted near-dup payloads are discovered through band blocking") {
    import spark.implicits._
    // n=122 puts sample point i at byte 2i; mutating one sample-point
    // byte touches at most its two adjacent comparisons (bits i-1, i).
    // Zeroing bytes 4 and 10 flips exactly the [p2<p4] and [p8<p10]
    // comparisons (both true in base, both false at 0) while leaving
    // [p4<p6]/[p10<p12] true -> hamming exactly 2, <= 3 by construction
    val base = Array.tabulate[Byte](122)(i => ((i * 37 + 11) % 251).toByte)
    val near = base.clone()
    near(4) = 0
    near(10) = 0
    val far = Array.tabulate[Byte](122)(i => ((i * 101 + 7) % 249).toByte)
    val ph = Seq(base, near, far).map(p => MultiModal.pHash60(p).get)
    val hamNear = java.lang.Long.bitCount(ph(0) ^ ph(1))
    assert(hamNear >= 1 && hamNear <= 3, s"planted pair at hamming $hamNear")
    assert(java.lang.Long.bitCount(ph(0) ^ ph(2)) > 3, "far payload too close")
    val hashes = Seq((1L, ph(0)), (2L, ph(1)), (3L, ph(2))).toDS()
    val pairs = MultiModal.pHashPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, hamNear.toLong)),
      s"expected exactly the planted pair, got $pairs")
  }

  test("frame sampling: registry query matches a driver-side recompute incl. partial tails") {
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(20).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = texts.flatMap { case (id, t) =>
      val p = t.getBytes("UTF-8")
      val nFrames = (p.length + 63) / 64
      (0 until nFrames by 2).map { f =>
        (id, f, p.slice(f * 64, math.min((f + 1) * 64, p.length))
          .map(b => (b & 0xff).toLong).sum)
      }
    }.toSet
    // the corpus has non-multiple-of-64 docs, so partial tail frames
    // are genuinely exercised
    assert(texts.values.exists(_.getBytes("UTF-8").length % 64 != 0))
    val got = MultiModal.all.find(_.name == "m03_frame_sample").get
      .fn(spark, sfDir)
      .filter(col("doc_id") < 20).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("media features match a driver-side recompute (distributed == local)") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .limit(20).collect()
    val local = docs.map { r =>
      r.getLong(0) -> MultiModal.decodeStub(r.getString(1).getBytes("UTF-8"))
    }.toMap
    val dist = MultiModal.all.find(_.name == "m02_media_features").get
      .fn(spark, sfDir)
      .filter(col("doc_id") < 20)
      .collect()
      .map(r => r.getLong(0) ->
        MultiModal.MediaMeta(r.getLong(1), r.getInt(2), r.getInt(3),
          r.getInt(4), r.getLong(5)))
      .toMap
    assert(dist == local)
  }
}
