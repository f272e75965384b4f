package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.io.{PartitionedFixture, Tables}

/** The multi-file / hive-partitioned fixture mirror: split planning and
  * partition pruning must hold, and every query must be LAYOUT-BLIND —
  * identical answers whether a table is one file, 16 files, or a
  * lang-partitioned tree. */
class PartitionedFixtureSpec extends SparkSpec {

  private lazy val pdir = PartitionedFixture.prepare(spark, sf)

  test("mirror is actually multi-file and lang-partitioned") {
    val orders = new java.io.File(s"$pdir/orders.parquet")
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(orders > 1, s"expected a multi-file orders dir, got $orders file(s)")
    val langDirs = new java.io.File(s"$pdir/documents.parquet")
      .listFiles.count(_.getName.startsWith("lang="))
    assert(langDirs > 1, s"expected lang=... partition dirs, got $langDirs")
  }

  test("lang filter reaches the scan as a PartitionFilter (pruned, not read)") {
    val df = Tables.documents(spark, pdir)
      .filter(col("lang") === "en")
      .agg(count(lit(1)).as("n"))
    df.collect()
    val plan = Bridge.finalPlanString(df)
    assert(plan.contains("PartitionFilters: [") && plan.contains("(lang"),
      s"expected the lang predicate in PartitionFilters, plan:\n$plan")
  }

  test("queries are layout-blind: same answers on the mirror (docs/events/lineitem)") {
    // one query per re-laid-out table family: documents (partitioned),
    // events (nanos round-trip), lineitem (plain multi-file)
    for (name <- Seq("q_token_stats", "q_stream_tumbling", "q1_pricing_summary")) {
      val single = SparkEntry.queries(name)(spark, sf)
        .collect().map(_.toString).toSeq
      val mirror = SparkEntry.queries(name)(spark, pdir)
        .collect().map(_.toString).toSeq
      assert(single == mirror, s"$name differs between layouts")
    }
  }
}
