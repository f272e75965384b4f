package graft

import org.apache.spark.sql.functions._

/** Bucketing evidence: co-partitioned storage eliminates the join
  * shuffle — THE technique for repeated large-large joins at 100 TB
  * (pay one shuffle at write time, join shuffle-free forever after). */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables runs with zero Exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the shuffle (or its absence) is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.io.Tables.orders(spark, sf)
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      graft.io.Tables.lineitem(spark, sf)
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinExchanges = plan.linesIterator
        .takeWhile(!_.contains("HashAggregate")) // pre-agg section irrelevant
        .count(_.contains("Exchange"))
      // the JOIN itself must not shuffle either side
      val beforeAgg = plan.split("SortMergeJoin|ShuffledHashJoin").last
      assert(!beforeAgg.contains("Exchange hashpartitioning(l_orderkey") &&
             !beforeAgg.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not re-shuffle its inputs:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "scan must recognize the bucketed layout")
      // and of course it is still correct
      val expect = graft.io.Tables.lineitem(spark, sf)
        .join(graft.io.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
