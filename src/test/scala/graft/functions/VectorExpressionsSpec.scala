package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  test("float_dot / float_norm match the lambda-form computation bit for bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, -0.6f))).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.floatDot(col("a"), col("b")).as("d"),
      VectorFunctions.floatNorm(col("a")).as("n"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), _ + _).as("dRef"),
      sqrt(aggregate(transform(col("a"), x => x.cast("double") * x.cast("double")),
        lit(0.0), _ + _)).as("nRef")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(2)) // bit-identical
      assert(r.getDouble(1) == r.getDouble(3))
    }
    assert(rows(0).getDouble(0) == 32.0)
  }

  test("null and length-mismatch handling") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f))),
      (None: Option[Array[Float]], Some(Array(1.0f)))).toDF("a", "b")
    val out = df.select(VectorFunctions.floatDot(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0)) // length mismatch -> NULL (zip_with parity)
    assert(out(1).isNullAt(0)) // null input propagates
  }

  test("fused float_cosine is bit-identical to the dot/(norm*norm) composition") {
    import spark.implicits._
    // includes near-orthogonal, anti-parallel and denormal-ish values —
    // the fused one-pass accumulators must reproduce the unfused
    // composition EXACTLY (same per-accumulator element order, same
    // final combine), not just approximately
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, -0.6f)),
      (Array(1e-20f, 2e-20f, -3e-20f), Array(7e19f, -1e19f, 2e19f)),
      (Array(-1.5f, 2.5f, -3.5f), Array(1.5f, -2.5f, 3.5f))).toDF("a", "b")
    df.select(
      VectorFunctions.cosine(col("a"), col("b")).as("fused"),
      (VectorFunctions.floatDot(col("a"), col("b")) /
        (VectorFunctions.floatNorm(col("a")) *
          VectorFunctions.floatNorm(col("b")))).as("unfused"))
      .collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
          s"${r.getDouble(0)} != ${r.getDouble(1)}")
      }
    // zero-norm side -> IEEE NaN (never NULL), like the composition
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b"))).head()
    assert(!z.isNullAt(0) && z.getDouble(0).isNaN)
    // NULL contract: length mismatch and null element -> NULL
    val nulls = Seq(1).toDF("x").select(
      expr("float_dot(array(cast(1.0 as float)), array(cast(1.0 as float), " +
        "cast(2.0 as float)))").as("probe"),
      VectorFunctions.cosine(
        array(lit(1.0f), lit(2.0f)), array(lit(3.0f))).as("mismatch"),
      VectorFunctions.cosine(
        array(lit(1.0f), lit(null).cast("float")),
        array(lit(3.0f), lit(4.0f))).as("nullElem")).head()
    assert(nulls.isNullAt(1) && nulls.isNullAt(2))
  }

  test("SQL registration via GraftExtensions, codegen plan") {
    // the shared SparkSpec session is built withExtensions(GraftExtensions)
    import spark.implicits._
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val df = spark.sql("SELECT float_dot(a, b) AS d, float_norm(a) AS n FROM vecs")
    val r = df.head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(5.0)) < 1e-12)
    // on a file-backed plan (not constant-folded to LocalTableScan) the
    // expression stays inside a whole-stage-codegen span
    spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("emb")
    val filePlan = spark.sql("SELECT float_norm(embedding) FROM emb")
      .queryExecution.executedPlan.toString
    assert(filePlan.contains("*(1)"), filePlan)
  }

  test("null elements and length mismatches yield NULL, like the SQL lambdas") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    val r = df.select(
      expr("float_dot(array(cast(1.0 as float), cast(null as float)), " +
        "array(cast(1.0 as float), cast(2.0 as float)))").as("nullElem"),
      expr("float_dot(array(cast(1.0 as float)), " +
        "array(cast(1.0 as float), cast(2.0 as float)))").as("lenMismatch"),
      expr("float_norm(array(cast(null as float)))").as("nullNorm"),
      expr("float_dot(array(cast(1.0 as float)), array(cast(3.0 as float)))").as("ok"))
      .collect().head
    assert(r.isNullAt(0), "null element must propagate to NULL")
    assert(r.isNullAt(1), "length mismatch must be NULL, not truncated")
    assert(r.isNullAt(2))
    assert(r.getDouble(3) == 3.0)
  }

  test("wrong arity raises an AnalysisException, not an internal error") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT float_dot(array(cast(1.0 as float)))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("float_dot"))
  }
}
