package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.streaming.Windows

/** M5 — batch-verifiable faces of the streaming window operators (the same
  * plan fragments run under `readStream` in graft.streaming.Windows; the
  * streaming-vs-batch equivalence is covered by StreamingSpec, the
  * batch-vs-DuckDB equivalence by these oracle entries).
  *
  * Window bounds are exported as epoch MICROSECOND integers, so the oracle
  * compare is exact integer math — no timestamp formatting, timezone, or
  * sub-second truncation ambiguity. Event `ts` is micros in both engines
  * (Tables.events truncates the nanos fixture identically to DuckDB's
  * nanos→micros read).
  */
object StreamWindows {

  def qTumbling(s: SparkSession, dir: String): DataFrame =
    Windows.tumbling(Tables.events(s, dir))
      .orderBy("win_start_us", "event_type")

  def qSliding(s: SparkSession, dir: String): DataFrame =
    Windows.sliding(Tables.events(s, dir))
      .orderBy("win_start_us", "event_type")

  def qSessions(s: SparkSession, dir: String): DataFrame =
    Windows.sessions(Tables.events(s, dir))
      .orderBy("user_id", "session_start_us")

  /** Batch face of the stream-stream interval join (purchase ⋈ click per
    * user within ±30 min — the operator StreamingSpec runs under
    * MemoryStream watermarks). Event-id columns make the sort total even
    * when one user clicks twice in the same microsecond. */
  def qStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    Windows.intervalJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"))
      .orderBy("user_id", "p_us", "c_us", "p_event", "c_event")
  }

  /** Left-outer face: clickless purchases survive with null-padded click
    * columns. Nulls are sentinel-coalesced to -1 (BIGINT) because the
    * driver's hash compare round-trips integers through float NaN for
    * NULL — a compare artifact, not an engine semantic. */
  def qStreamJoinOuter(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    Windows.intervalJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"), "left_outer")
      .select(col("user_id"), col("p_us"),
        coalesce(col("c_us"), lit(-1L)).as("c_us"),
        col("p_event"), coalesce(col("c_event"), lit(-1L)).as("c_event"))
      .orderBy("user_id", "p_us", "c_us", "p_event", "c_event")
  }

  /** Batch face of the stream-static enrichment join (events ⋈ broadcast
    * customer dimension, spend per segment × type — the per-micro-batch
    * re-evaluated join StreamingSpec runs under MemoryStream). */
  def qStreamEnrich(s: SparkSession, dir: String): DataFrame =
    Windows.enrich(Tables.events(s, dir), Tables.customer(s, dir))
      .orderBy("c_mktsegment", "event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> (qTumbling _),
    "q_stream_sliding" -> (qSliding _),
    "q_stream_sessions" -> (qSessions _),
    "q_stream_join" -> (qStreamJoin _),
    "q_stream_join_outer" -> (qStreamJoinOuter _),
    "q_stream_enrich" -> (qStreamEnrich _),
  )

  private val HourUs = 3600000000L
  private val HalfHourUs = 1800000000L
  private val GapUs = 6L * HourUs

  val oracle: Map[String, String] = Map(
    "q_stream_tumbling" ->
      s"""SELECT (epoch_us(ts) // $HourUs) * $HourUs AS win_start_us,
         |  (epoch_us(ts) // $HourUs) * $HourUs + $HourUs AS win_end_us,
         |  event_type, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2, 3 ORDER BY win_start_us, event_type""".stripMargin,
    "q_stream_sliding" ->
      s"""WITH assigned AS (
         |  SELECT ((epoch_us(ts) - off) // $HourUs) * $HourUs + off AS win_start_us,
         |    event_type, value
         |  FROM events, (SELECT unnest([0, $HalfHourUs]) AS off))
         |SELECT win_start_us, win_start_us + $HourUs AS win_end_us, event_type,
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM assigned GROUP BY 1, 2, 3 ORDER BY win_start_us, event_type""".stripMargin,
    "q_stream_sessions" ->
      s"""WITH marked AS (
         |  SELECT user_id, epoch_us(ts) AS us, value,
         |    -- Spark session semantics (verified in StreamingSpec): an event
         |    -- at EXACTLY prev+gap still MERGES into the session; only a
         |    -- strictly larger gap opens a new one.
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
         |      OVER (PARTITION BY user_id ORDER BY ts) > $GapUs
         |      OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         |    THEN 1 ELSE 0 END AS new_session
         |  FROM events),
         |islands AS (
         |  SELECT user_id, us, value,
         |    sum(new_session) OVER (PARTITION BY user_id ORDER BY us
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM marked)
         |SELECT user_id, min(us) AS session_start_us,
         |  max(us) + $GapUs AS session_end_us,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM islands GROUP BY user_id, session_id
         |ORDER BY user_id, session_start_us""".stripMargin,
    "q_stream_join" ->
      """SELECT p.user_id, epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us,
        |  p.event_id AS p_event, c.event_id AS c_event
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        |  AND c.ts >= p.ts - INTERVAL 30 MINUTE
        |  AND c.ts <= p.ts + INTERVAL 30 MINUTE
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin,
    "q_stream_join_outer" ->
      """SELECT p.user_id, epoch_us(p.ts) AS p_us,
        |  coalesce(epoch_us(c.ts), -1) AS c_us,
        |  p.event_id AS p_event, coalesce(c.event_id, -1) AS c_event
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        |  AND c.ts >= p.ts - INTERVAL 30 MINUTE
        |  AND c.ts <= p.ts + INTERVAL 30 MINUTE
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin,
    "q_stream_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
