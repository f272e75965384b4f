package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * One accessor per table; every query takes `sfDir` (the per-scale-factor
  * directory) so the same plan runs at sf0.001 (smoke), sf0.01 (oracle) and
  * sf0.1 (bench) — and, unchanged, against a 100 TB warehouse path.
  *
  * Scans stay fully declarative (`spark.read.parquet`) so Catalyst performs
  * column pruning and predicate pushdown into the parquet reader; we never
  * cache here (caller decides) and never collect.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Session config `events` requires: its ts column is TIMESTAMP(NANOS)
    * parquet, which Spark's reader rejects ([PARQUET_TYPE_ILLEGAL]) unless
    * this legacy flag maps it to raw nano longs. Hosts set it ONCE at
    * session build (Verify/Bench/SparkSpec all do) — a loader must not
    * mutate a shared session's conf on read. */
  val EventsNanosConf: (String, String) = ("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** events.ts arrives as raw nanos (see [[EventsNanosConf]]); convert to
    * a microsecond TimestampType with integer `div` — (ns / 1000 via
    * double would lose precision above 2^53). Day/window-level semantics are
    * unaffected by the micro truncation.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption(EventsNanosConf._1).contains(EventsNanosConf._2),
      s"events requires the session conf ${EventsNanosConf._1}=true (set at session build)")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** All table names, for catalog-style registration (`registerAll`). */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every fixture as a temp view so `spark.sql(...)` works. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
