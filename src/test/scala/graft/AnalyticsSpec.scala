package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.queries.Relational

/** Engine-side invariants for the product-analytics trio (funnel,
  * retention, churn) that the DuckDB oracle verifies only pointwise:
  * the cross-query conservation laws at sf0.001.
  */
class AnalyticsSpec extends SparkSpec {

  private def totalUsers: Long =
    Tables.events(spark, sf).select(col("user_id")).distinct().count()

  test("funnel stages are monotone and bounded by the user population") {
    val stages = Relational.qFunnel(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(stages.keySet == Set(1, 2, 3))
    assert(stages(1) >= stages(2) && stages(2) >= stages(3),
      s"funnel must narrow: $stages")
    assert(stages(1) <= totalUsers)
    assert(stages(3) > 0, "fixture should convert someone end-to-end")
  }

  test("retention week-0 cohort sizes sum to the user population") {
    val rows = Relational.qRetention(spark, sf).collect()
    assert(rows.forall(_.getLong(1) >= 0), "negative week offset")
    // every user is active in their own first week, exactly once
    val week0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    assert(week0 == totalUsers, s"week-0 actives $week0 != users $totalUsers")
    // no cohort-week cell can exceed its cohort's week-0 size
    val cohort0 = rows.filter(_.getLong(1) == 0L)
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) <= cohort0(r.getString(0)),
        s"cell exceeds cohort size: $r")
    }
  }

  test("churn totals are consistent with weekly activity") {
    val churn = Relational.qChurn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val anchorless = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val dMin = anchorless.agg(min(col("d"))).collect()(0).getDate(0)
    val uw = anchorless
      .select(col("user_id"), floor(datediff(col("d"), lit(dMin)) / 7).as("wk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byWeek = uw.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val lastWeek = byWeek.keys.max
    // recompute churn directly and compare exactly
    byWeek.foreach { case (wk, users) =>
      val next = byWeek.getOrElse(wk + 1, Set.empty[Long])
      val expected = (users -- next).size.toLong
      assert(churn.getOrElse(wk, 0L) == expected,
        s"week $wk: churn ${churn.get(wk)} != recomputed $expected")
    }
    assert(churn.getOrElse(lastWeek, 0L) == byWeek(lastWeek).size.toLong,
      "final week must be fully churned by contract")
  }
}
