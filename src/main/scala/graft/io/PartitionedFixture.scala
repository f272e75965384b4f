package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr

/** Multi-file / hive-partitioned mirror of a driver fixture directory.
  *
  * The driver fixtures are one single-row-group parquet file per table —
  * fine for correctness, but they exercise neither split planning (one
  * mapper per table, however large) nor partition pruning. This writes,
  * ONCE per sf dir (marker-file idempotent):
  *  - every table as a `files`-file parquet directory (same
  *    `<table>.parquet` naming, so `Tables.load` reads both layouts);
  *  - `documents` additionally hive-partitioned by `lang`, the pruning
  *    surface for the lang-filtered text queries;
  *  - `events` with `ts` converted back to raw nano longs, so
  *    `Tables.events` applies the identical NANOS read path on both
  *    layouts.
  *
  * Used by Bench (the partitioned variant pass) and
  * PartitionedFixtureSpec (pruning + equality pins).
  */
object PartitionedFixture {

  val AllTables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def prepare(spark: SparkSession, sfDir: String, files: Int = 16): String = {
    val out = s"/tmp/graft_partitioned_${new java.io.File(sfDir).getName}"
    val marker = new java.io.File(s"$out/_PREPARED")
    if (!marker.exists) {
      val plain = AllTables.filterNot(t => t == "events" || t == "documents")
      plain.foreach { t =>
        Tables.load(spark, sfDir, t).repartition(files)
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
      Tables.events(spark, sfDir)
        .withColumn("ts", expr("unix_micros(ts) * 1000"))
        .repartition(files)
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      Tables.documents(spark, sfDir).repartition(files)
        .write.mode("overwrite").partitionBy("lang").parquet(s"$out/documents.parquet")
      marker.createNewFile()
    }
    out
  }
}
