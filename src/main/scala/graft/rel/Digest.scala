package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Value-check support for the imaging p-queries (whose sources are
  * deterministic fixtures, not the star schema, so no DuckDB re-derived
  * oracle is possible): the query output is reduced to one stable
  * digest row per record — every column of the wide feature table is
  * folded as `name=value` (doubles at 6 significant digits, absorbing
  * partial-aggregation ULP noise) into an md5 — and the committed
  * golden is a DuckDB `VALUES` literal of those digests. This is the
  * committed-golden equivalent of the reference's own e2e value
  * assertions (/root/reference/test/test_main.py:42-52): any change to
  * a feature value, column set, or row set flips the hash the driver
  * compares.
  */
object Digest {

  /** md5 hex of a string (driver-side, for the schema fingerprint) */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Reduce a wide deterministic table to `(keys..., row_digest,
    * schema_digest)` — all strings, ordered by the keys. The schema
    * digest pins the exact column name/type set; the row digest pins
    * every value (column names included, so a silently-reordered or
    * renamed column cannot alias another).
    */
  def rows(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val fields = df.schema.fields.sortBy(_.name)
    val schemaDigest = md5hex(
      fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(","))
    val cells: Seq[Column] = fields.toSeq.map { f =>
      val v: Column = f.dataType match {
        case DoubleType | FloatType =>
          // +0.0 canonicalizes -0.0; 6 significant digits absorb
          // reduce-order ULP differences in upstream double sums
          when(col(f.name).isNull, lit("null"))
            .when(isnan(col(f.name)), lit("NaN"))
            .otherwise(format_string("%.6g", col(f.name).cast("double") + lit(0d)))
        case _ => coalesce(col(f.name).cast("string"), lit("null"))
      }
      concat(lit(f.name + "="), v)
    }
    df.select(
      keyCols.map(k => col(k).cast("string").as(k)) ++ Seq(
        md5(concat_ws("|", cells: _*)).as("row_digest"),
        lit(schemaDigest).as("schema_digest")): _*)
      .orderBy(keyCols.map(col): _*)
  }

  /** Marker for a digestables fn that folded the digest into its own
    * object map (the fused imaging path, [[graft.pipeline.Pipeline
    * .runDigested]]) and already returns the final digest table —
    * identified by the exact output column set the registry wrapper
    * would otherwise produce. */
  private[graft] def isDigested(df: DataFrame, keyCols: Seq[String]): Boolean =
    df.columns.toSeq == keyCols ++ Seq("row_digest", "schema_digest")

  /** Fused-digest builder (r16, guide §1.2 step 2 after measuring
    * §7.3-style planning dominance): [[rows]] plans ~5 expression
    * nodes per wide column on top of a several-hundred-field object
    * serializer — for the fused imaging cells (p01: ~370 double
    * columns, 10 rows) Catalyst planning was measured at 2.3 s of a
    * 2.9 s cell (ObjectSerializerPruning + ResolveReferences/
    * Functions dominating; RuleExecutor dump in OPTIMIZATION_r16.md).
    * This factory precompiles the SAME reduction into one driver-built
    * closure over the wide schema, so the fused map can emit the
    * digest STRING directly and the planned schema shrinks to
    * keys+2 strings. Semantics replicate [[rows]] bit for bit:
    * fields sorted by name, `name=value` joined with "|", doubles as
    * %.6g via a Locale.US Formatter (what Spark's format_string
    * uses) after +0.0 canonicalization and null/NaN literals,
    * non-doubles via cast-to-string, md5 lowercase hex over UTF-8.
    * Returns (schema_digest, row-in-SCHEMA-FIELD-ORDER => row_digest).
    * Any divergence fails the committed-golden gate, which compares
    * these digests value-for-value. */
  private[graft] def fusedDigester(schema: StructType)
      : (String, Array[Any] => String) = {
    val fields = schema.fields.sortBy(_.name)
    val schemaDigest = md5hex(
      fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(","))
    val byName = schema.fieldNames.zipWithIndex.toMap
    val srcIdx = fields.map(f => byName(f.name))
    val floating = fields.map(f =>
      f.dataType == DoubleType || f.dataType == FloatType)
    val prefixes = fields.map(_.name + "=")
    val n = fields.length
    val fn = (row: Array[Any]) => {
      val sb = new java.lang.StringBuilder(n * 24)
      val fmt = new java.util.Formatter(sb, java.util.Locale.US)
      var i = 0
      while (i < n) {
        if (i > 0) sb.append('|')
        sb.append(prefixes(i))
        val v = row(srcIdx(i))
        if (v == null) sb.append("null")
        else if (floating(i)) {
          val d = v match {
            case dd: java.lang.Double => dd.doubleValue()
            // cast("double") widening, identical to Spark's float cast
            case ff: java.lang.Float => ff.doubleValue()
            case other => throw new IllegalStateException(
              s"fusedDigester: non-numeric $other in floating field")
          }
          if (java.lang.Double.isNaN(d)) sb.append("NaN")
          else { fmt.format("%.6g", java.lang.Double.valueOf(d + 0d)); () }
        } else sb.append(v.toString)
        i += 1
      }
      md5hex(sb.toString)
    }
    (schemaDigest, fn)
  }

  /** committed golden for a digest query, if generated (resources
    * written by [[graft.tools.GenGoldens]]) */
  def golden(name: String): Option[String] = {
    val in = getClass.getResourceAsStream(s"/graft/goldens/$name.sql")
    if (in == null) None
    else try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
  }

  /** render a collected digest table as the DuckDB oracle `VALUES`
    * literal (all columns VARCHAR on both sides) */
  def goldenSql(digested: DataFrame, keyCols: Seq[String]): String = {
    val cols = digested.columns
    val rows = digested.collect().map { r =>
      cols.indices.map { i =>
        "'" + String.valueOf(r.get(i)).replace("'", "''") + "'"
      }.mkString("(", ", ", ")")
    }
    require(rows.nonEmpty, "empty digest table — refusing to commit an empty golden")
    s"""SELECT * FROM (VALUES
       |${rows.mkString(",\n")}
       |) AS t(${cols.mkString(", ")})
       |ORDER BY ${keyCols.mkString(", ")}""".stripMargin
  }
}
