package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.TextPipeline
import graft.io.Tables

/** Additional operator coverage past SURVEY §7's core plan: pivot,
  * deterministic sampling, a bucketized range join, exact percentiles,
  * and a two-phase (salted) aggregation — each either a named relational
  * operator class or a canonical scale technique, each oracle-verified.
  */
object Extras {

  /** PIVOT: order counts by priority × status as columns. */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("priority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("priority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("priority")

  /** Deterministic ~5% sample via content hash (mod 20) — the reproducible
    * sampling pattern for 100 TB pipelines (same rows on every run and
    * every engine, unlike TABLESAMPLE). */
  def qSampleHash(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(pmod(conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(20)) === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderkey")

  /** Range (interval) join, bucketized: for each purchase event, count the
    * same user's click events within ±1 hour. The scale plan: equi-join on
    * (user, hour-bucket) with the probe side exploded to its 3 candidate
    * buckets, then refine on the exact interval — no O(n²) time-range
    * cross product, shuffle keys stay equi. */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600000000L
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("t_us"),
        explode(array((col("t_us") / HourUs).cast("long") - 1,
          (col("t_us") / HourUs).cast("long"),
          (col("t_us") / HourUs).cast("long") + 1)).as("bucket"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("t_us").as("c_us"),
        (col("t_us") / HourUs).cast("long").as("bucket"))
    purchases.join(clicks, Seq("user_id", "bucket"), "left_outer")
      .withColumn("hit",
        when(abs(col("c_us") - col("t_us")) <= HourUs, 1L).otherwise(0L))
      .groupBy(col("event_id"))
      .agg(sum(col("hit")).as("n_nearby_clicks"))
      .orderBy("event_id")
  }

  /** Exact percentiles per group (interpolating, matching quantile_cont). */
  def qMedianPrice(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy("status")

  /** Two-phase (salted) aggregation: partial sums on (word, salt) then a
    * final merge on word — the standard hot-key skew mitigation, shown to
    * be result-identical to the direct aggregation (same oracle as
    * `wordcount`). Salt = partition id: no extra column shuffled, and the
    * result provably can't depend on it. */
  def qWordcountSalted(s: SparkSession, dir: String): DataFrame =
    TextPipeline.words(Tables.documents(s, dir), "text")
      .withColumn("salt", spark_partition_id() % 8)
      .groupBy(col("word"), col("salt")).agg(count(lit(1)).as("c"))
      .groupBy(col("word")).agg(sum(col("c")).as("cnt"))
      .orderBy("word")

  /** Sketch aggregation: HyperLogLog++ distinct-word estimate per language
    * beside the exact count. At 100 TB the sketch is the point (fixed-size
    * partial state, one narrow shuffle vs the exact distinct's two-stage
    * expansion); the exact column here exists to expose the error.
    * Approximate ⇒ no DuckDB oracle (driver rows-only); the ±5% tolerance
    * contract is pinned in ExtrasSpec. */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    TextPipeline.words(Tables.documents(s, dir), "text", keep = Seq("lang"))
      .groupBy("lang")
      .agg(approx_count_distinct(col("word"), 0.02).as("approx_words"),
        countDistinct(col("word")).as("exact_words"))
      .orderBy("lang")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_pivot" -> (qPivot _),
    "q_sample_hash" -> (qSampleHash _),
    "q_range_join" -> (qRangeJoin _),
    "q_median_price" -> (qMedianPrice _),
    "q_wordcount_salted" -> (qWordcountSalted _),
  )

  val oracle: Map[String, String] = Map(
    "q_pivot" ->
      """SELECT o_orderpriority AS priority,
        | sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
        | sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_o,
        | sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_p
        |FROM orders GROUP BY priority ORDER BY priority""".stripMargin,
    "q_sample_hash" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),1,8)) AS BIGINT) % 20 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "q_range_join" ->
      """SELECT p.event_id,
        | CAST(count(c.c_us) AS BIGINT) AS n_nearby_clicks
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events
        |      WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id, epoch_us(ts) AS c_us FROM events
        |           WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        |  AND abs(c.c_us - p.t_us) <= 3600000000
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    "q_median_price" ->
      """SELECT o_orderstatus AS status,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
        | count(*) AS n
        |FROM orders GROUP BY status ORDER BY status""".stripMargin,
    "q_wordcount_salted" -> WordCount.oracle("wordcount"),
  )
}
