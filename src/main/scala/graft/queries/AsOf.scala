package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables

/** As-of (temporal) join — an operator the reference lacks entirely and
  * Spark has no built-in for (SURVEY.md §2.2: joins absent; task brief
  * lists as-of join as a composition target).
  *
  * Semantics: for every event, attach the customer's most recent order at
  * or before the event time (NULL if none). Composed from existing
  * operators per the preference ladder — (a) compose before custom plans:
  * both sides are UNIONed into one keyed stream, sorted by time within
  * the key, and the order side is carried forward with
  * `last(..., ignoreNulls)` over an unbounded-preceding window. ONE
  * shuffle on the join key, no per-row probe, no range explosion — the
  * standard scale-out as-of plan (at 100 TB the window sort spills
  * per-key; key = customer, so partitions are balanced unless one
  * customer dominates, in which case coarse time-bucketing the key
  * de-skews).
  *
  * Tie rule: an order AT the event timestamp wins ("at or before"). The
  * union tags order rows 0 and event rows 1 so the secondary sort puts
  * orders first at equal timestamps; DuckDB's native ASOF JOIN
  * (`t <= ts`) has the same inclusive semantics — which is the oracle.
  */
object AsOf {

  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir).select(
      col("o_custkey").as("user_id"),
      // o_orderdate is TIMESTAMP_NTZ in the parquet; session TZ is pinned
      // UTC so the cast is wall-clock-identity (same epoch as DuckDB's)
      unix_micros(col("o_orderdate").cast("timestamp")).as("t_us"),
      lit(0).as("side"),
      col("o_orderkey"),
      col("o_totalprice"),
      lit(null).cast("long").as("event_id"),
      lit(null).cast("string").as("event_type"))
    val events = Tables.events(s, dir).select(
      col("user_id"),
      unix_micros(col("ts")).as("t_us"),
      lit(1).as("side"),
      lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("double").as("o_totalprice"),
      col("event_id"),
      col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("side").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionByName(events)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("t_us").as("event_t_us"),
        col("event_type"), col("asof_orderkey"), col("asof_totalprice"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
  )

  /** Oracle spelled as LEFT JOIN + window-rank (equivalent to DuckDB's
    * native ASOF JOIN with inclusive <=, but with the tie-break explicit):
    * the most recent order wins; among equal timestamps the highest
    * o_orderkey wins — exactly what the Spark plan's last-over-window
    * ordering produces. */
  val oracle: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH ranked AS (
        |  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS event_t_us,
        |    e.event_type, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id, event_t_us, event_type,
        |  o_orderkey AS asof_orderkey, o_totalprice AS asof_totalprice
        |FROM ranked WHERE rn = 1 ORDER BY event_id""".stripMargin,
  )
}
