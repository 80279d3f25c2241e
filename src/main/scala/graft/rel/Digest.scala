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
