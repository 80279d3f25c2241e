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
