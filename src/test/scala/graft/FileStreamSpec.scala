package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Windows

/** M5 — the full readStream → transform → writeStream path over a real
  * file source: parquet dropped into a watched directory in two batches,
  * windowed aggregation with watermark, parquet sink with checkpoint —
  * result must equal the batch plan over the union of all files. This is
  * the deployment shape (file-arrival streaming), complementing
  * StreamingSpec's MemoryStream harness. */
class FileStreamSpec extends SparkSpec {

  test("file-source streaming tumbling agg == batch over all arrived files") {
    val srcDir = Files.createTempDirectory("graft_stream_src").toString
    val outDir = Files.createTempDirectory("graft_stream_out").toString
    val ckDir = Files.createTempDirectory("graft_stream_ck").toString

    val events = graft.io.Tables.events(spark, sf)
      .select("ts", "event_type", "value")
    // split by TIME, not randomly: file-arrival streaming assumes files
    // land in rough event-time order; random interleaving would put half
    // of batch 2 behind the watermark (correctly dropped as late data)
    val mid = events.agg(expr("percentile(unix_micros(ts), 0.5)")).collect()(0).getDouble(0).toLong
    val part1 = events.filter(unix_micros(col("ts")) <= mid)
    val part2 = events.filter(unix_micros(col("ts")) > mid)

    // batch 1 arrives before the query starts
    part1.write.mode("overwrite").parquet(s"$srcDir/batch1")
    val schema = events.schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(s"$srcDir/*")
    val q = Windows.tumblingStream(stream)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // batch 2 arrives while the query runs
    part2.write.mode("overwrite").parquet(s"$srcDir/batch2")
    q.processAllAvailable()
    q.stop()

    // append mode only emits watermark-closed windows; compare on the
    // windows the sink actually finalized (all but the tail)
    val got = spark.read.parquet(outDir)
      .select("win_start_us", "event_type", "n", "sum_value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val want = Windows.tumbling(events)
      .select("win_start_us", "event_type", "n", "sum_value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got.nonEmpty, "watermark must have closed at least some windows")
    assert(got.subsetOf(want),
      "every finalized streaming window must match the batch result exactly")
    // everything older than the last emitted window must have been emitted
    val lastEmitted = got.map(_._1).max
    val missing = want.filter(_._1 < lastEmitted) -- got
    assert(missing.isEmpty, s"gaps in emitted windows: ${missing.take(3)}")
  }

  test("foreachBatch upsert sink: duplicate redelivery converges to distinct keys") {
    import org.apache.spark.sql.{DataFrame, SaveMode}
    val tableDir = Files.createTempDirectory("graft_fb_tbl").toString
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "payload").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // idempotent merge: existing ∪ batch, keep one row per id
        val existing = try spark.read.parquet(tableDir)
          catch { case _: Throwable => spark.emptyDataFrame.select(lit(0L).as("id"), lit("").as("payload")).limit(0) }
        val merged = existing.unionByName(batch).dropDuplicates("id")
          .persist() // materialize BEFORE overwriting the path we read from
        merged.count()
        merged.write.mode(SaveMode.Overwrite).parquet(tableDir)
        merged.unpersist()
        ()
      }.start()
    mem.addData(Seq((1L, "a"), (2L, "b"))); q.processAllAvailable()
    mem.addData(Seq((2L, "b"), (3L, "c"))); q.processAllAvailable() // redelivery of id=2
    mem.addData(Seq((1L, "a"), (3L, "c"), (4L, "d"))); q.processAllAvailable()
    q.stop()
    val table = spark.read.parquet(tableDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(table == Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"),
      "at-least-once redelivery must converge to one row per key")
  }

  test("checkpoint recovery: restart resumes exactly-once (no double-counted windows)") {
    val srcDir = Files.createTempDirectory("graft_ck_src").toString
    val outDir = Files.createTempDirectory("graft_ck_out").toString
    val ckDir = Files.createTempDirectory("graft_ck_ck").toString
    val events = graft.io.Tables.events(spark, sf).select("ts", "event_type", "value")
    val mid = events.agg(expr("percentile(unix_micros(ts), 0.5)")).collect()(0).getDouble(0).toLong
    val schema = events.schema
    def start() = Windows.tumblingStream(
      spark.readStream.schema(schema).parquet(s"$srcDir/*"))
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode(OutputMode.Append()).start()

    events.filter(unix_micros(col("ts")) <= mid).write.parquet(s"$srcDir/b1")
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // restart from the SAME checkpoint; more files arrive
    events.filter(unix_micros(col("ts")) > mid).write.parquet(s"$srcDir/b2")
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(outDir)
      .groupBy("win_start_us", "event_type")
      .agg(sum("n").as("n")) // would exceed batch counts if double-emitted
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = Windows.tumbling(events).collect()
      .map(r => (r.getLong(0), r.getString(2)) -> r.getLong(3)).toMap
    got.foreach { case (k, n) =>
      assert(want.getOrElse(k, -1L) == n,
        s"window $k: streamed $n vs batch ${want.get(k)} — duplication or loss")
    }
    assert(got.nonEmpty)
  }
}
