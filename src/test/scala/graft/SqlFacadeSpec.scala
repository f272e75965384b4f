package graft

import org.apache.spark.sql.graftbridge.Bridge
import graft.io.Tables

/** The `spark.sql` facade: a reference user must be able to run plain SQL
  * text over the registered catalog and get exactly what the DataFrame
  * API computes — and cache a hot table without changing any answer. */
class SqlFacadeSpec extends SparkSpec {

  test("ANSI SQL text over registered views matches the DataFrame plan (q1)") {
    Tables.registerAll(spark, sf)
    // the flagship pricing summary's oracle SQL is dialect-neutral ANSI —
    // the very text DuckDB verifies is also runnable by the engine itself
    val viaSql = spark.sql(SparkEntry.oracleSql("q1_pricing_summary"))
      .collect().map(_.toString).toSeq
    val viaDf = SparkEntry.queries("q1_pricing_summary")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(viaSql == viaDf)
    assert(viaDf.nonEmpty)
  }

  test("cached table answers from memory (InMemoryTableScan), same results") {
    Tables.registerAll(spark, sf)
    val q = "SELECT o_orderpriority, count(*) AS n FROM orders " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    val before = spark.sql(q).collect().map(_.toString).toSeq
    spark.catalog.cacheTable("orders")
    try {
      val df = spark.sql(q)
      val after = df.collect().map(_.toString).toSeq
      assert(after == before, "caching must never change an answer")
      val plan = Bridge.executedPlanString(df)
      assert(plan.contains("InMemoryTableScan") ||
             plan.contains("TableCacheQueryStage"),
        s"expected the scan to come from the cache, plan:\n$plan")
    } finally spark.catalog.uncacheTable("orders")
  }
}
