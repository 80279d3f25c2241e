package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.rel._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared operator surface is assembled from the per-module query
  * registries (each a Seq[Q] of Spark plan + optional DuckDB oracle):
  *  - [[graft.rel.RelQueries]]  — SURVEY §2.2 relational operators
  *  - [[graft.rel.Dedup]]       — exact/minhash/simhash/jaccard/embedding dedup
  *  - [[graft.rel.Similarity]]  — brute-force + LSH ANN over embeddings
  *  - [[graft.rel.TextOps]]     — token/quality/lang-id/fingerprint
  *  - [[graft.rel.MultiModal]]  — binary-column plumbing (stubbed codecs)
  *  - [[graft.rel.PipelineQueries]] — the imaging pipeline (graft.ops /
  *    graft.pipeline) run end-to-end on synthetic sources
  */
object SparkEntry {
  def registry: Seq[Q] =
    RelQueries.all ++ Dedup.all ++ Cluster.all ++ Similarity.all ++
      TextOps.all ++ MultiModal.all ++ PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelQueries.all.find(_.name == "q07_agg_pricing_summary").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
