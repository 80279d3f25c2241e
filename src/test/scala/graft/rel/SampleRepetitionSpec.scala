package graft.rel

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q24 (bounded top-k stratified sample) and t07 (repetition quality)
  * cross-checked against independent Spark formulations — the window
  * row_number sort for q24, an explode/groupBy plan for t07 — so the
  * hand-rolled aggregator/loop implementations are validated by a
  * second code path inside Spark, in addition to the DuckDB oracle.
  */
class SampleRepetitionSpec extends SparkSpec {

  test("q24 bounded top-k agg == window row_number top-k") {
    val got = SparkEntry.queries("q24_stratified_sample")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val want = Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    assert(got == want)
  }

  test("q24 takes every doc of an under-k group") {
    val perLang = Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = SparkEntry.queries("q24_stratified_sample")(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(sampled(lang) == math.min(n, 20L), s"lang=$lang")
    }
  }

  test("t07 single-pass stats == explode/groupBy recompute") {
    val got = SparkEntry.queries("t07_repetition")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
    val words = docs
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").count()
      .groupBy("doc_id")
      .agg(sum("count").as("n"), count(lit(1)).as("nd"), max("count").as("mx"))
    val bigram = docs
      .select(col("doc_id"), size(col("ws")).as("n"),
        size(array_distinct(expr(
          "transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i+1]))")))
          .as("nbd"))
      .filter(col("n") >= 2)
    val want = words.join(bigram.select(col("doc_id"), col("n").as("nw"),
        col("nbd")), Seq("doc_id"), "left")
      .collect().map { r =>
        val n = r.getLong(1).toDouble
        val dup =
          if (r.isNullAt(4)) 0.0
          else 1.0 - r.getInt(5).toDouble / (r.getInt(4) - 1)
        r.getLong(0) -> ((r.getLong(1), r.getLong(2) / n, r.getLong(3) / n, dup))
      }.toMap

    assert(got.keySet == want.keySet)
    got.foreach { case (id, (n, df, tf, bf)) =>
      val (n2, df2, tf2, bf2) = want(id)
      assert(n == n2, s"doc $id n_words")
      assert(math.abs(df - df2) < 1e-12, s"doc $id distinct_word_frac")
      assert(math.abs(tf - tf2) < 1e-12, s"doc $id top_word_frac")
      assert(math.abs(bf - bf2) < 1e-12, s"doc $id dup_bigram_frac")
    }
  }
}
