package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each tier contributes a `queries` map (name → (session, sfDir) → DataFrame)
  * and an `oracle` map (name → DuckDB-runnable ANSI SQL over the same parquet
  * tables). Queries without an oracle entry get the driver's weaker
  * rows-only check (non-SQL-expressible ops only).
  */
object SparkEntry {

  private val tiers: Seq[(Map[String, (SparkSession, String) => DataFrame],
                          Map[String, String])] = Seq(
    (q.WordCount.queries, q.WordCount.oracle),
    (q.Relational.queries, q.Relational.oracle),
    (q.TextAnalysis.queries, q.TextAnalysis.oracle),
    (q.Dedup.queries, q.Dedup.oracle),
    (q.Similarity.queries, q.Similarity.oracle),
    (q.StreamWindows.queries, q.StreamWindows.oracle),
    (q.Multimodal.queries, q.Multimodal.oracle),
    (q.AsOf.queries, q.AsOf.oracle),
    (q.Extras.queries, q.Extras.oracle),
    (q.Corpus.queries, q.Corpus.oracle),
    (q.Graph.queries, q.Graph.oracle),
    (q.Analytics.queries, q.Analytics.oracle),
    (q.SqlSurface.queries, q.SqlSurface.oracle),
    (q.Ingest.queries, q.Ingest.oracle),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.WordCount.wordcount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    tiers.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = tiers.map(_._2).reduce(_ ++ _)
}
