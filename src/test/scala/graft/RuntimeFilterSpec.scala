package graft

import org.apache.spark.sql.functions._
import graft.io.Tables

/** Evidence for the 100 TB scan-reduction story: Catalyst's
  * `InjectRuntimeFilter` turns a selective dim-side predicate into a
  * BLOOM FILTER pushed onto the fact-side join key — the runtime analogue
  * of static predicate pushdown, and the mechanism that keeps a
  * 100 TB fact scan from shuffling rows a selective dimension filter is
  * about to discard anyway. Pinned on the optimized plan (the rule runs at
  * optimization time, before AQE), plus a result-equality check against
  * the uninstrumented join.
  *
  * Threshold notes: the rule fires only when the application side's scan
  * exceeds `applicationSideScanSizeThreshold` (10 GB default — lowered to
  * 1 byte so the sf0.1 fixture plays the fact-table role) and the creation
  * side stays under `creationSideThreshold`; broadcast is disabled because
  * a broadcast join already prunes on the build side and the rule
  * deliberately skips it.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("InjectRuntimeFilter blooms a selective dim filter onto the fact scan") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1b")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      def q = {
        val fact = Tables.lineitem(spark, "/root/testdata/sf0.1")
          .select(col("l_orderkey"), col("l_quantity"))
        val dim = Tables.orders(spark, "/root/testdata/sf0.1")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        fact.join(dim, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("qty"))
      }

      val bloomed = q
      val plan = bloomed.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected a bloom-filter runtime filter on the fact side; optimized plan:\n$plan")
      val withFilter = bloomed.collect().map(r => (r.getLong(0), r.get(1))).toMap

      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val unplan = q.queryExecution.optimizedPlan.toString
      assert(!unplan.contains("might_contain"), "control plan unexpectedly bloomed")
      val without = q.collect().map(r => (r.getLong(0), r.get(1))).toMap
      assert(withFilter == without,
        s"bloom runtime filter changed the answer: ${withFilter.size} vs ${without.size} groups")
      assert(withFilter.nonEmpty)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
