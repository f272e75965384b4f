package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.io.Tables

/** Evidence for the 100 TB skew story: AQE's `OptimizeSkewedJoin` actually
  * SPLITS a deliberately hot-keyed sort-merge join at runtime — pinned on
  * the executed (final) plan, not asserted from configuration. This is the
  * skew claim `queries/Relational.scala` makes, made testable: salting
  * (`q_wordcount_salted`) covers aggregation skew; this covers join skew.
  *
  * Setup notes, because the rule is picky:
  *  - both join children must be bare shuffle stages (scan → exchange →
  *    sort), so the right side is the raw `customer` table — an aggregate
  *    between exchange and join would defeat the pattern match;
  *  - broadcast must be disabled or the small side never shuffles;
  *  - thresholds are lowered so a ~15 MB hot partition plays the role a
  *    hot multi-GB key would play at real scale (the rule compares
  *    partition bytes against `max(factor × median, threshold)` and splits
  *    into `advisorySize` chunks);
  *  - the hot partition is split on MAPPER boundaries, so the shuffle
  *    needs multiple map tasks. The sf0.1 fixture is one single-row-group
  *    parquet file = ONE mapper (unsplittable however low
  *    `files.maxPartitionBytes` goes), hence the explicit
  *    `repartition(8)` below — standing in for the thousands of mappers
  *    any real 100 TB stage has.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE OptimizeSkewedJoin splits a deliberately hot-keyed join (final plan)") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")

      // sf0.1 orders (150k rows): 90% of rows salted onto ONE hot custkey,
      // with incompressible-ish padding so the hot shuffle partition is
      // ~10 MB — far over the lowered threshold, exactly how one hot key
      // dwarfs the median partition at 100 TB.
      val hotKey = 1L // a real c_custkey, so the hot rows survive the join
      val left = Tables.orders(spark, "/root/testdata/sf0.1")
        .select(
          when(col("o_orderkey") % 10 =!= 0, lit(hotKey))
            .otherwise(col("o_custkey")).as("k"),
          col("o_totalprice"),
          concat(md5(col("o_orderkey").cast("string")),
                 md5((col("o_orderkey") + lit(1)).cast("string")),
                 md5((col("o_orderkey") + lit(2)).cast("string"))).as("pad"))
        .repartition(8) // ≥2 mappers feeding the join shuffle (see scaladoc)
      val right = Tables.customer(spark, "/root/testdata/sf0.1")
        .select(col("c_custkey").as("k"), col("c_name"))
      val joined = left.join(right, "k")

      // every order's custkey (salted or not) exists once in customer —
      // the split join must still produce exactly one row per order
      val n = joined.collect().length
      assert(n == 150000, s"skew-split join changed the answer: $n rows")

      // AQE finalizes THIS QueryExecution on the collect above; the skew
      // marker must be in the final-plan section (not the Initial Plan)
      val plan = Bridge.finalPlanString(joined)
      assert(plan.contains("SortMergeJoin(skew=true)"),
        s"expected the join node marked skew=true; final plan:\n$plan")
      assert(plan.contains("AQEShuffleRead coalesced and skewed") ||
             plan.contains("AQEShuffleRead skewed"),
        s"expected the hot side's shuffle read marked skewed; final plan:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("AQE coalesces over-partitioned shuffle reads (final plan)") {
    // the other half of AQE's runtime re-planning story: a shuffle
    // planned at a deliberately absurd partition count collapses to a
    // handful of reads once runtime sizes are known — the config-free
    // safety net that lets one global shuffle.partitions serve queries
    // whose actual data volumes differ by orders of magnitude
    val conf = spark.conf
    // only confs this test SETS are saved; initialPartitionNum is left
    // alone (its default is null, which save/restore can't round-trip)
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      conf.set("spark.sql.shuffle.partitions", "200")
      val agg = Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(agg.collect().length == 5)
      val plan = Bridge.finalPlanString(agg)
      assert(plan.contains("AQEShuffleRead coalesced"),
        s"expected the 200-partition shuffle coalesced at runtime:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("answers are independent of join strategy (forced sort-merge == default)") {
    // At 100 TB, "small" dimensions outgrow broadcast thresholds and the
    // planner silently flips BroadcastHashJoin → SortMergeJoin. Answers
    // must not depend on that flip. Disable auto-broadcast entirely
    // (AQE's adaptive threshold falls back to the same conf) and re-run
    // a join-heavy slice: hint-free plans really flip (pinned on the
    // executed plan), explicitly-hinted dims still broadcast (hints are
    // instructions, not estimates), and every answer is identical.
    val conf = spark.conf
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = scala.util.Try(conf.get(key)).toOption
    val names = Seq("q13_customer_distribution", "q5_local_supplier",
      "q_semi_join", "q_outer_join", "q_lateral_topn", "q_winsorize")
    val base = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().toSeq).toMap
    try {
      conf.set(key, "-1")
      val q13 = SparkEntry.queries("q13_customer_distribution")(spark, sf)
      q13.collect()
      val plan = Bridge.finalPlanString(q13)
      assert(plan.contains("SortMergeJoin"),
        s"hint-free join must flip to SMJ with broadcast disabled:\n$plan")
      names.foreach { n =>
        val got = SparkEntry.queries(n)(spark, sf).collect().toSeq
        assert(got == base(n), s"$n: answers differ under forced sort-merge")
      }
    } finally saved.fold(conf.unset(key))(conf.set(key, _))
  }
}
