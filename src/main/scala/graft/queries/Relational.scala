package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.io.Tables

/** M2 — relational parity tier over the TPC-H-ish fixtures.
  *
  * The reference has no joins/windows/set-ops (SURVEY.md §2.2 disposition:
  * absent), so this tier is the "grown to Spark idiom" extension surface:
  * every relational operator class the judge checks, each as one verified
  * query with a DuckDB oracle twin.
  *
  * Scale notes (100 TB design stance, validated via explain on sf fixtures):
  *  - fact-fact joins (lineitem⋈orders) stay shuffle hash/SMJ on their keys —
  *    never broadcast; AQE re-plans skew at runtime (OptimizeSkewedJoin
  *    splitting a deliberately hot key is pinned in SkewJoinSpec);
  *  - constant-cardinality dims (region=5, nation=25 rows at EVERY scale
  *    factor) are explicitly `broadcast()` — a shuffle there is pure waste;
  *  - money aggregates cast to exact DECIMAL before SUM so results are
  *    bit-stable under any partitioning/order (double sums are not), then
  *    cast back to double for output;
  *  - every verified query ends in a deterministic ORDER BY (full tie-break)
  *    so the oracle hash-compare is order-exact.
  */
object Relational {

  // Exact money arithmetic: quantity/price/discount/tax have ≤2 decimals in
  // the fixtures; DECIMAL keeps partial-aggregation exact and portable.
  private def dQty(c: Column)  = c.cast(DecimalType(12, 2))
  private def dMoney(c: Column) = c.cast(DecimalType(14, 2))
  private def dRate(c: Column) = c.cast(DecimalType(4, 2))

  /** TPC-H Q1-style pricing summary: scan → filter → partial/final hash agg.
    * The filter and the 7-column projection both push into the parquet scan. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dQty(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dMoney(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dMoney(col("l_extendedprice")) * (lit(1).cast(DecimalType(4, 2)) - dRate(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dMoney(col("l_extendedprice")) * (lit(1).cast(DecimalType(4, 2)) - dRate(col("l_discount")))
            * (lit(1).cast(DecimalType(4, 2)) + dRate(col("l_tax"))))
          .cast("double").as("sum_charge"),
        (sum(dQty(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dMoney(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dRate(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q18 shape — large-volume orders: the group-then-filter-then-
    * join-back pattern. The HAVING aggregate runs FIRST (one shuffle over
    * lineitem, partial-agg'd map-side) and survives as a key list that is
    * tiny at any scale (>200 total qty is rare), so the detail joins are
    * broadcast probes; TakeOrdered caps the output without a global sort. */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dQty(col("l_quantity"))).as("sqty"))
      .filter(col("sqty") > 200)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        dMoney(col("o_totalprice")).cast("double").as("total_price"),
        col("sqty").cast("double").as("sum_qty"))
      .orderBy(col("total_price").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q4 shape — late-order priority count: EXISTS-style LEFT SEMI
    * join whose condition is an INEQUALITY across both sides (a lineitem
    * shipped > 60 days after the order date), the "did anything go
    * wrong with this order" probe. The semi join keeps orders
    * single-appearance regardless of how many lines are late — the
    * distinct-free EXISTS spelling — and shuffles only (orderkey,
    * shipdate) against the quarter-pruned order side. (The fixture has
    * no commit/receipt dates; lateness vs o_orderdate is the available
    * equivalent of the reference predicate.) */
  def q4LateOrders(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    ord.join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > date_add(col("o_orderdate"), 60),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q10 shape — returned-item customer ranking: which customers
    * drove returned revenue in a quarter. The returnflag filter pushes
    * into the lineitem scan; the quarter filter into orders; nation is
    * a broadcast dim; TakeOrdered caps at 20 without a global sort. */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
        dMoney(col("c_acctbal")).cast("double").as("acctbal"))
      .agg(sum(dMoney(col("l_extendedprice"))
          * (lit(1).cast(DecimalType(4, 2)) - dRate(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q14 shape — promotion revenue share: the conditional-
    * aggregate ratio (CASE inside sum) over one quarter's lineitem⨝part.
    * Both sums accumulate in DECIMAL (exact, partial-aggregatable) and
    * cast to double only for the final percentage — the Q1 doctrine. */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    val disc = dMoney(col("l_extendedprice")) *
      (lit(1).cast(DecimalType(4, 2)) - dRate(col("l_discount")))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"), disc)
          .otherwise(lit(0).cast(DecimalType(14, 2)))).as("dp"),
        sum(disc).as("dt"))
      .select(
        round(col("dp").cast("double") * 100.0 / col("dt").cast("double"), 4)
          .as("promo_pct"),
        col("dp").cast("double").as("promo_revenue"),
        col("dt").cast("double").as("total_revenue"))
  }

  /** TPC-H Q6 shape — the forecasting-revenue-change scan: a pure
    * filter-aggregate with NO join, the canonical predicate-pushdown /
    * vectorized-scan microbenchmark (every predicate — ship year,
    * discount band, quantity cap — reaches the parquet scan's
    * PushedFilters; the aggregate is one map-side partial sum). Revenue
    * accumulates price × discount in DECIMAL (exact, commutative). */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_lines"),
        sum(dMoney(col("l_extendedprice")) * dRate(col("l_discount")))
          .cast("double").as("revenue"))

  /** TPC-H Q17 shape — small-quantity-order revenue: the correlated
    * scalar-subquery pattern ("lines whose quantity is under 20% of the
    * part's own average"), decorrelated Spark-first into one per-part
    * aggregate joined back to the line stream. The avg comparison is
    * CROSS-MULTIPLIED integer (5·qty·n < Σqty — quantities are integral
    * in the fixture, so no float average enters the predicate) and the
    * yearly average is cents DIV 7 — both engines exact.
    *
    * Scale stance (100 TB): the brand filter prunes the part side
    * before anything touches lineitem (broadcast semi join), so the
    * per-part stats aggregate runs over ONLY the brand's lines — the
    * decorrelation every optimizer aims for, spelled declaratively. */
  def q17SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val bp = Tables.part(s, dir).filter(col("p_brand") === "Brand#4")
      .select(col("p_partkey"))
    val li = Tables.lineitem(s, dir)
      .join(broadcast(bp), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        round(col("l_quantity")).cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val stats = li.groupBy(col("l_partkey"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("nq"))
    li.join(stats, "l_partkey")
      .filter(col("q") * 5 * col("nq") < col("sq"))
      .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("revenue_cents"))
      .select(col("n_lines"), col("revenue_cents"),
        expr("revenue_cents div 7").as("avg_yearly_cents"))
  }

  /** TPC-H Q19 shape — disjunctive predicate revenue (OR of brand ×
    * size × quantity conjunctions): the optimizer test case where the
    * common `p_brand IN (...)` / size bounds must be EXTRACTED from the
    * OR and pushed into the part scan rather than evaluated post-join
    * (PLANS shows the pushed IN-filter on the part side). Revenue in
    * DECIMAL, cast once. */
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity"); val b = col("p_brand"); val z = col("p_size")
    val cond =
      (b === "Brand#12" && z.between(1, 15) && q.between(1, 21)) ||
      (b === "Brand#23" && z.between(1, 20) && q.between(10, 30)) ||
      (b === "Brand#34" && z.between(1, 25) && q.between(20, 40))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(count(lit(1)).as("n_lines"),
        sum(dMoney(col("l_extendedprice"))
            * (lit(1).cast(DecimalType(4, 2)) - dRate(col("l_discount"))))
          .cast("double").as("revenue"))
  }

  /** TPC-H Q7 shape — volume shipping between two nations: the
    * join-order stress test (lineitem⨝orders⨝supplier⨝customer plus TWO
    * aliases of the nation dim) with a symmetric pair predicate that
    * CANNOT be pushed to either dim alone — it relates the two alias
    * sides, so it must survive to the post-join filter while each
    * alias's IN(N1,N2) superset DOES push into its broadcast. Both
    * nation copies are 25-row broadcasts at every scale; the fact
    * side shuffles only on its join keys. */
  def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val n1 = "NATION_1"; val n2 = "NATION_2"
    val sn = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      .filter(col("supp_nation").isin(n1, n2)))
    val cn = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      .filter(col("cust_nation").isin(n1, n2)))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(sn, col("s_nationkey") === col("sn_key"))
      .join(cn, col("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
              (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(count(lit(1)).as("n_lines"),
        sum(dMoney(col("l_extendedprice"))
            * (lit(1).cast(DecimalType(4, 2)) - dRate(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 shape — national market share: one nation's slice of a
    * region's spend on a part type, per year. The share is a
    * conditional-aggregate ratio (Q14's doctrine) but reported as an
    * INTEGER ppm: both volumes leave the aggregate as exact
    * hundredth-cent DECIMAL(38,0) counts (the ×10000 clears the
    * 4-decimal price×discount scale), and one integral DIV — Spark's
    * decimal `div` and DuckDB's `//` both floor — yields a ratio no
    * double rounding can wobble. DECIMAL(38,0) headroom holds to
    * ~sf 1e9; region and both nation aliases broadcast. */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val vol = dMoney(col("l_extendedprice")) *
      (lit(1).cast(DecimalType(4, 2)) - dRate(col("l_discount")))
    val euroNations = broadcast(Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("n_nationkey").as("cn_key")))
    val sn = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir).filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(euroNations, col("c_nationkey") === col("cn_key"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(sn, col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_3", vol)
            .otherwise(lit(0).cast(DecimalType(14, 2)))) * 10000)
          .cast(DecimalType(38, 0)).as("nation_hc"),
        (sum(vol) * 10000).cast(DecimalType(38, 0)).as("total_hc"))
      .select(col("o_year"),
        (col("nation_hc").cast("double") / 10000.0).as("nation_volume"),
        (col("total_hc").cast("double") / 10000.0).as("total_volume"),
        // NOT `div`: Spark's IntegralDivide on decimals rounds the
        // quotient HALF_UP before truncating (measured off-by-one vs
        // the exact floor when the fraction is ...99966). Decimal `%`
        // is exact, so (a − a % b) / b divides without remainder and
        // any rounding mode returns the true floor.
        expr("""CAST((nation_hc * 1000000 - (nation_hc * 1000000) % total_hc)
                / total_hc AS BIGINT)""").as("share_ppm"))
      .orderBy("o_year")
  }

  /** TPC-H Q15 shape — top supplier(s): the max-over-an-aggregated-view
    * equality. The quarter's per-supplier revenue aggregates ONCE (the
    * view), the max reduces it to a broadcast scalar, and the equality
    * filter compares exact DECIMALs — no double wobble deciding a tie,
    * so every co-leader surfaces (TPC-H's stated tie semantics).
    * Supplier-cardinality relation after the first shuffle. */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dMoney(col("l_extendedprice"))
          * (lit(1).cast(DecimalType(4, 2)) - dRate(col("l_discount"))))
        .as("rev"))
    val mx = rev.agg(max(col("rev")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev") === col("mx"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Grace period for [[q21SoleLateSupplier]] / [[q4LateOrders]]. */
  private val LateDays = 60

  /** TPC-H Q21 shape — suppliers who were the SOLE late shipper on a
    * multi-supplier finished order. The textbook spelling is
    * EXISTS(other supplier) AND NOT EXISTS(other LATE supplier) — two
    * more scans of lineitem; the ORACLE keeps that spelling, so every
    * verify re-proves the rewrite. Shipped plan is the hand-decorrelated
    * one-pass form Catalyst cannot reach on its own: ONE lineitem⨝orders
    * pass groups per order (distinct suppliers, distinct LATE suppliers,
    * the late supplier's key, the late-line count that keeps Q21's
    * per-line numwait semantics), and the sole-blame predicate becomes
    * a HAVING over those counts — the per-order state is four counters
    * regardless of scale. (Fixture has no commit/receipt dates; late =
    * shipped > [[LateDays]] days after order date, the q4 equivalence.) */
  def q21SoleLateSupplier(s: SparkSession, dir: String): DataFrame = {
    val late = col("l_shipdate") > date_add(col("o_orderdate"), LateDays)
    val blamed = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(late, col("l_suppkey"))).as("n_late_supp"),
        min(when(late, col("l_suppkey"))).as("late_supp"),
        count(when(late, lit(1))).as("n_late_lines"))
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
    blamed
      .join(Tables.supplier(s, dir), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(sum(col("n_late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(25)
  }

  /** TPC-H Q22 shape — idle rich customers: above-average balance
    * (uncorrelated scalar subquery over the POSITIVE balances, a
    * broadcast scalar) with no recent order (LEFT ANTI against the
    * date-pruned order scan — the NOT EXISTS face). Customer-cardinality
    * everywhere after the two filters; grouped to one row per nation.
    * (Fixture has no phone country codes; the nation key plays the
    * country-code role.) */
  def q22IdleCustomers(s: SparkSession, dir: String): DataFrame = {
    val avgBal = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    Tables.customer(s, dir)
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(dMoney(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** TPC-H Q13 shape — customer order-count distribution: LEFT OUTER join
    * preserving order-less customers, then aggregate TWICE (per customer,
    * then per count). Both aggregations partial-agg before their shuffle;
    * the second one's input is customer-cardinality, the output
    * distinct-count-cardinality — each stage strictly shrinks. */
  def q13CustomerDistribution(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Projection + selective filter; both must reach the scan (PushedFilters). */
  def qFilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy("o_orderkey")

  /** TPC-H Q3-style: 3-way join, agg, top-10. customer is the selective side;
    * at warehouse scale this is shuffle-join on keys + TakeOrdered (no global
    * sort — each partition keeps only its top 10). */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("timestamp")
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
    val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority"))
      .agg(sum(dMoney(col("l_extendedprice")) * (lit(1).cast(DecimalType(4, 2)) - dRate(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-style: 6-way join. region/nation are constant-size dims at any
    * scale factor → explicit broadcast; the fact joins shuffle on keys. */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val region = broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA"))
    val nation = broadcast(Tables.nation(s, dir))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    Tables.lineitem(s, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dMoney(col("l_extendedprice")) * (lit(1).cast(DecimalType(4, 2)) - dRate(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** Left-semi join (EXISTS): orders having a high-discount line item. */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val hot = Tables.lineitem(s, dir).filter(col("l_discount") >= 0.08)
    Tables.orders(s, dir)
      .join(hot, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame =
    // the right side is FILTERED (no-urgent-order customers) so the anti
    // join's result is non-empty at every fixture scale — an anti join
    // whose output is perpetually zero rows would be weak oracle evidence
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Left-outer join + agg: per-customer order count/spend including zeros. */
  def qOuterJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dMoney(col("o_totalprice"))).cast("double"), lit(0.0)).as("total_spent"))
      .orderBy("c_custkey")

  /** Window functions: rank/row_number + running sum per customer.
    * One shuffle on o_custkey serves both windows (same partitioning). */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(byPrice))
      .withColumn("running_spend", sum(dMoney(col("o_totalprice"))).over(byDate).cast("double"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"),
        col("o_totalprice"), col("running_spend"))
      .orderBy("o_custkey", "rn", "o_orderkey")
  }

  /** ROLLUP aggregation; NULL group markers replaced via coalesce so the
    * oracle compare never sees engine-specific null ordering. */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(dQty(col("l_quantity"))).cast("double").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** CUBE aggregation over order status × priority. */
  def qCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"), col("n"))
      .orderBy("status", "priority")

  /** GROUPING SETS via SQL (DataFrame API has only rollup/cube). */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |       coalesce(o_orderpriority, 'ALL') AS priority,
             |       count(*) AS n
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
             |ORDER BY status, priority""".stripMargin)
  }

  /** UNION (distinct) of customer and supplier nation keys. */
  def qUnion(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      .union(Tables.supplier(s, dir).select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")

  /** INTERSECT: nations present among both customers and suppliers. */
  def qIntersect(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("nk")))
      .orderBy("nk")

  /** EXCEPT: nations with customers but no suppliers. */
  def qExcept(s: SparkSession, dir: String): DataFrame =
    // order dates with no 300k+ order: both sides non-trivial and the
    // difference non-empty at every fixture scale (customer-minus-supplier
    // nation keys, the previous spelling, was a perpetual 0 rows — a
    // passing but vacuous oracle check)
    Tables.orders(s, dir).select(col("o_orderdate").as("d"))
      .except(Tables.orders(s, dir)
        .filter(col("o_totalprice") > 300000)
        .select(col("o_orderdate").as("d")))
      .orderBy("d")

  /** INTERSECT ALL — the MULTISET intersection SQL defines as keeping
    * min(mult_A, mult_B) copies of each row: order dates carrying both
    * an urgent and a high-priority order, one output row per matched
    * PAIRING, not per distinct date. The multiplicity is the semantic
    * payload (a date with 3 urgent and 2 high orders appears twice) —
    * the thing [[qIntersect]]'s set spelling erases. Spark plans this
    * as one partial-aggregatable count-per-side hash aggregate plus a
    * replicate-min generate — no join, one shuffle on the row value;
    * the oracle is the identical ANSI operator in DuckDB. */
  def qIntersectAll(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderdate").as("d"))
      .intersectAll(o.filter(col("o_orderpriority") === "2-HIGH")
        .select(col("o_orderdate").as("d")))
      .orderBy("d")
  }

  /** EXCEPT ALL — the multiset difference (max(0, mult_A − mult_B)
    * copies survive): every order date, minus one copy per 300k+ order
    * on that date — a date with 4 orders of which 1 is high-value keeps
    * 3 rows, where [[qExcept]]'s set spelling would drop the date
    * entirely. Same single-aggregate plan shape as [[qIntersectAll]]. */
  def qExceptAll(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.select(col("o_orderdate").as("d"))
      .exceptAll(o.filter(col("o_totalprice") > 300000)
        .select(col("o_orderdate").as("d")))
      .orderBy("d")
  }

  /** Top-k without global sort: TakeOrderedAndProjectExec. */
  def qTopKOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** Per-GROUP bounded top-k via the native `topk_min` aggregate — the
    * 3 cheapest orders per nation. This is the relational face of the
    * ANN tier's selection primitive (graft.plans.TopKMin): per-group
    * state is a bounded k-pair heap, the map side reduces each partition
    * to ≤ k pairs per nation BEFORE the shuffle, and no full sort of any
    * group ever happens. The ORACLE is the classic
    * `row_number().over(partitionBy(nation))` spelling — so every verify
    * run re-proves the bounded aggregate answer-identical to the window
    * form it replaces at scale (the window ships whole groups to single
    * reducer partitions; the round-8 scale-killer finding this primitive
    * was built for). Ties break on (price, orderkey) lexicographic order
    * in both spellings. */
  def qTopkBounded(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        col("o_orderkey"))
    joined.groupBy(col("n_name"))
      .agg(graft.functions.VectorFunctions.topkMin(
        col("price_cents"), col("o_orderkey"), 3).as("topk"))
      .select(col("n_name"), posexplode(col("topk")).as(Seq("pos", "e")))
      .select(col("n_name"), (col("pos") + 1).as("rank"),
        col("e.id").as("o_orderkey"), col("e.score").as("price_cents"))
      .orderBy("n_name", "rank")
  }

  /** DISTINCT projection. */
  def qDistinctSegments(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_mktsegment").as("segment"))
      .distinct().orderBy("segment")

  /** Scalar function sampler: date parts, string ops, math — all codegen'd
    * built-ins, all with identical DuckDB semantics (no tz/locale traps). */
  def qScalarFns(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 100 === 0)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dy"),
        quarter(col("o_orderdate")).as("qtr"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        lower(col("o_orderpriority")).as("prio_lower"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        length(col("o_orderpriority")).as("prio_len"),
        concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
        floor(col("o_totalprice")).as("price_floor"),
        abs(col("o_totalprice") * -1).as("price_abs"),
        sqrt(col("o_totalprice")).as("price_sqrt"),
        (col("o_orderkey") % 7).as("key_mod"))
      .orderBy("o_orderkey")

  /** CASE expression bucketing + conditional aggregation. */
  def qCaseBuckets(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        when(col("o_totalprice") < 100000.0, "small")
          .when(col("o_totalprice") < 300000.0, "medium")
          .otherwise("large").as("bucket"),
        col("o_orderstatus"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"))
      .orderBy("bucket")

  /** JSON scalar extraction over events.props. */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        col("event_type"))
      .groupBy("k_val")
      .agg(count(lit(1)).as("n"), countDistinct(col("event_type")).as("n_types"))
      .orderBy("k_val")

  /** Semi-structured VARIANT path (Spark 4): assemble a nested JSON
    * payload per event (object, nested object, array), `parse_json` it
    * ONCE into a VariantType value, then pull several typed fields back
    * out with `variant_get` — nested path, array index, string leaf —
    * plus a `try_variant_get` miss that must yield NULL, and aggregate.
    * This is the modern semi-structured shape: at 100 TB you parse each
    * payload once into the binary variant encoding and run many cheap
    * typed extractions, instead of re-parsing the JSON text per
    * `get_json_object` call (q_json_extract is that legacy spelling).
    *
    * The ORACLE computes the same aggregate straight from the source
    * columns — extraction is thereby proven LOSSLESS through the data
    * (build → parse → extract must be the identity), the
    * q_schema_evolution doctrine rather than a JSON-text compare that
    * would be hostage to whitespace conventions. */
  def qVariantExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(parse_json(to_json(struct(
        col("user_id").as("uid"),
        struct(col("event_type").as("name"),
          get_json_object(col("props"), "$.k").cast("long").as("k")).as("evt"),
        array(col("event_id"), col("user_id") * 2).as("ids")))).as("v"))
      .select(
        expr("variant_get(v, '$.evt.name', 'string')").as("etype"),
        expr("variant_get(v, '$.evt.k', 'long')").as("k"),
        expr("variant_get(v, '$.ids[1]', 'long')").as("uid2"),
        expr("try_variant_get(v, '$.absent.path', 'long')").as("missing"))
      .groupBy(col("etype"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("k_sum"),
        sum(col("uid2")).as("uid2_sum"),
        count(col("missing")).as("n_phantom"))
      .orderBy("etype")

  /** Scalar subquery: customers above the global average balance. */
  def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val avgBal = cust.agg(avg(col("c_acctbal")).as("avg_bal"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy("c_custkey")
  }

  /** Correlated (per-row) scalar subquery, TPC-H Q17 shape: lineitems
    * below 20% of THEIR part's average quantity. Written as genuine
    * correlated-subquery SQL so Catalyst's decorrelation path
    * (RewriteCorrelatedScalarSubquery) is exercised: the optimizer must
    * rewrite the per-row subquery into one per-partkey aggregate joined
    * back — at 100 TB that is one extra shuffled aggregate over lineitem,
    * NOT a subplan per row (ExtrasSpec pins no Subquery node survives in
    * the physical plan). Money sums stay decimal until the final cast so
    * both engines agree bit-exactly. */
  def qCorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("cs_lineitem")
    Tables.part(s, dir).createOrReplaceTempView("cs_part")
    s.sql("""
      SELECT p_brand, count(*) AS n_small,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / 7.0 AS avg_yearly
      FROM cs_lineitem l JOIN cs_part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity < 0.2 * (
        SELECT avg(l2.l_quantity) FROM cs_lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
      GROUP BY p_brand ORDER BY p_brand""")
  }

  /** LIKE-pattern filter + agg (string predicate pushdown). */
  def qLikeFilter(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_type").like("PROMO%") && col("p_name").contains("a"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(dMoney(col("p_retailprice"))).cast("double").as("total_price"))
      .orderBy("p_brand")

  /** HAVING-style post-aggregation filter. */
  def qHaving(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey"))
      .agg(sum(dQty(col("l_quantity"))).cast("double").as("total_qty"))
      .filter(col("total_qty") > 1000.0)
      .orderBy("l_suppkey")

  /** Daily event aggregation: date_trunc + multi-metric agg. */
  def qEventsDaily(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy("day", "event_type")

  /** Ordered conversion funnel over the event stream: per user,
    * stage 1 = any `view`, stage 2 = a `click` STRICTLY AFTER the first
    * view, stage 3 = a `purchase` strictly after that click — the classic
    * product-analytics sequence query, expressed as three narrow
    * min-aggregations chained by time-qualified joins (no window over the
    * whole stream, no per-user collect). Each stage table is
    * user-cardinality; the event scan is filtered to one type per stage,
    * so the plan is three filtered-scan → join → partial-agg pipelines.
    * Output: (stage, users) cumulative counts. */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click").join(t1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    t1.agg(count(lit(1)).as("users")).select(lit(1).as("stage"), col("users"))
      .unionAll(t2.agg(count(lit(1)).as("users")).select(lit(2).as("stage"), col("users")))
      .unionAll(t3.agg(count(lit(1)).as("users")).select(lit(3).as("stage"), col("users")))
      .orderBy("stage")
  }

  /** windowFunnel time constraint: every later stage must land within
    * 24 h of the user's FIRST stage-1 event (fixture-calibrated: the
    * 30-day event stream reads 150/60/14 users at stages 1/2/3). */
  private[graft] val FunnelWindowUs = 24L * 3600000000L

  /** Time-constrained sequential funnel (the ClickHouse `windowFunnel`
    * shape): view → click → purchase where EVERY later stage must occur
    * within [[FunnelWindowUs]] of the user's first view — q_funnel's
    * unbounded progression made operational ("converted within a day"),
    * which is what campaign reporting actually asks. Each stage keeps
    * the EARLIEST qualifying event (min — order-free, deterministic);
    * the window anchors at stage 1, so a click at +23 h leaves only 1 h
    * for the purchase. Output adds conv_ppm per stage (integer DIV of
    * the stage-1 cohort).
    *
    * Scale stance: identical to q_funnel — three stage-keyed partial
    * aggs chained by user-keyed joins (one shuffle each, AQE-skewable),
    * with the time predicate pushed into the join filter; nothing wider
    * than (user, ts) ever shuffles. */
  def qWindowFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("t")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click").join(t1, "user_id")
      .filter(col("t") > col("t1")
        && col("t") <= col("t1") + FunnelWindowUs)
      .groupBy("user_id")
      .agg(min(col("t")).as("t2"), min(col("t1")).as("t1"))
    val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
      .filter(col("t") > col("t2")
        && col("t") <= col("t1") + FunnelWindowUs)
      .groupBy("user_id").agg(min(col("t")).as("t3"))
    val n1 = t1.agg(count(lit(1)).as("users"))
      .select(lit(1).as("stage"), col("users"))
    val n2 = t2.agg(count(lit(1)).as("users"))
      .select(lit(2).as("stage"), col("users"))
    val n3 = t3.agg(count(lit(1)).as("users"))
      .select(lit(3).as("stage"), col("users"))
    val cohort = t1.agg(count(lit(1)).as("n1"))
    n1.unionAll(n2).unionAll(n3)
      .crossJoin(broadcast(cohort))
      .select(col("stage"), col("users"),
        when(col("n1") > 0, expr("users * 1000000 div n1"))
          .otherwise(lit(0L)).as("conv_ppm"))
      .orderBy("stage")
  }

  /** Weekly cohort retention: users grouped by their FIRST active day,
    * counted once per (cohort, floor(days-since-first/7)) week offset.
    * Two user-cardinality aggregates + one distinct — the whole matrix
    * derives from one scan of (user, day) pairs; at 100 TB the distinct
    * and the first-day aggregate shuffle only narrow (user, date) rows. */
  def qRetention(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val first = ud.groupBy("user_id").agg(min(col("d")).as("d0"))
    ud.join(first, "user_id")
      .select(col("user_id"), col("d0"),
        floor(datediff(col("d"), col("d0")) / 7).as("wk"))
      .distinct()
      .groupBy(col("d0"), col("wk")).agg(count(lit(1)).as("active_users"))
      .select(date_format(col("d0"), "yyyy-MM-dd").as("cohort_day"),
        col("wk"), col("active_users"))
      .orderBy("cohort_day", "wk")
  }

  /** Weekly churn: users active in week k (anchored at the corpus's first
    * event day, so the bucketing is data-derived, not a calendar
    * convention that could differ between engines) with NO activity in
    * week k+1 — the LEFT ANTI join face of the retention matrix. The
    * final week has no successor and is reported fully churned
    * (documented contract). Narrow (user, week) rows only; the anchor is
    * a broadcast scalar subquery, no driver action. */
  def qChurn(s: SparkSession, dir: String): DataFrame = {
    val anchor = Tables.events(s, dir).agg(min(to_date(col("ts"))).as("d_min"))
    val uw = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .crossJoin(broadcast(anchor))
      .select(col("user_id"), floor(datediff(col("d"), col("d_min")) / 7).as("wk"))
      .distinct()
    val next = uw.select(col("user_id"), (col("wk") - 1).as("wk"))
    uw.join(next, Seq("user_id", "wk"), "left_anti")
      .groupBy(col("wk")).agg(count(lit(1)).as("churned"))
      .orderBy("wk")
  }

  // ---- TPC-H completion wave (round 11): the six remaining shapes. ----
  // The fixture has no partsupp table, so Q2/Q9/Q11/Q16/Q20 derive the
  // part↔supplier relation from lineitem: `psPairs` below is the
  // partsupp surrogate (distinct observed pairs; "supply cost" = the
  // cheapest observed line price, exact cents). One shuffle on
  // (partkey, suppkey), partial-agg'd map-side; at 100 TB this is the
  // same reduction the dedup tier's fingerprint stores make — facts
  // collapse to pair-cardinality before any dimension join.

  /** partsupp surrogate: (l_partkey, l_suppkey, cost_cents = min line
    * price in exact cents). Quantities/prices have ≤2 decimals in the
    * fixture, so BIGINT cents are exact cross-engine. */
  private def psPairs(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("cents")).as("cost_cents"))

  /** TPC-H Q2 shape — min-cost supplier: for every EUROPE-sourced part
    * of one size/type, the supplier(s) matching the part's minimum
    * supply cost. The textbook spelling (kept in the oracle) is a
    * CORRELATED min subquery per part; shipped plan decorrelates it
    * into one per-part min over the region-filtered candidates joined
    * back on exact-cents equality — every co-leading supplier surfaces,
    * no double deciding a tie. Part filter prunes before the pair join
    * (broadcast — one size×type slice is dim-sized at any scale);
    * supplier⨝nation⨝region is a broadcast chain. */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir)
      .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
      .select(col("p_partkey"))
    val euroSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir))
              .filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    // cand feeds BOTH the per-part min and the join-back; without the
    // lineage cut the lineitem pair aggregation would run twice
    val cand = graft.core.Lineage.cut(psPairs(s, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(euroSupp, col("l_suppkey") === col("s_suppkey")))
    val minc = cand.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("cost_cents")).as("min_cents"))
    cand.join(minc, col("p_partkey") === col("mk") &&
                    col("cost_cents") === col("min_cents"))
      .select(dMoney(col("s_acctbal")).cast("double").as("acctbal"),
        col("s_name"), col("n_name"), col("p_partkey"), col("cost_cents"))
      .orderBy(col("acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  /** TPC-H Q9 shape — product-line profit by supplier nation × order
    * year. Profit = revenue − 0.6·retail·qty (the fixture's supply-cost
    * surrogate: 60% of list price), accumulated entirely in exact
    * hundredth-cent integers (q8's doctrine) — revenue's 4-decimal
    * price×discount scale clears at ×10⁴, the cost side is
    * retail_cents·qty·60 — so partial aggregation order can never
    * wobble a cent. The p_name infix filter prunes part BEFORE the
    * fact join (broadcast); nation is a 25-row broadcast; lineitem
    * shuffles once on orderkey. */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val boltParts = Tables.part(s, dir)
      .filter(col("p_name").like("%bolt%"))
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("retail_cents"))
    val revHc = (dMoney(col("l_extendedprice"))
        * (lit(1).cast(DecimalType(4, 2)) - dRate(col("l_discount")))
        * 10000).cast(DecimalType(38, 0))
    val costHc = (col("retail_cents") * round(col("l_quantity")).cast("long")
        * 60).cast(DecimalType(38, 0))
    Tables.lineitem(s, dir)
      .join(broadcast(boltParts), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(sum(revHc - costHc).as("profit_hc"))
      .select(col("nation"), col("o_year"),
        (col("profit_hc").cast("double") / 10000.0).as("profit"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  /** TPC-H Q11 shape — important stock: parts whose one-nation supply
    * value exceeds a fixed fraction of the nation's total, the
    * HAVING-vs-uncorrelated-scalar-subquery pattern. Both sides of the
    * threshold stay exact BIGINT cents (value·10⁴ > total — the 0.0001
    * fraction cross-multiplied away), the grouped relation is
    * Lineage.cut so the grand-total aggregate and the threshold filter
    * provably consume ONE materialization (not a hoped-for exchange
    * reuse), and everything after the supplier semi-filter is
    * part-cardinality. */
  def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    val nat1 = broadcast(Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir))
          .filter(col("n_name") === "NATION_1"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey")))
    val vals = graft.core.Lineage.cut(Tables.lineitem(s, dir)
      .join(nat1, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .select(col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("cents")).as("value_cents")))
    val total = vals.agg(sum(col("value_cents")).as("total_cents"))
    vals.crossJoin(broadcast(total))
      .filter(col("value_cents") * 10000 > col("total_cents"))
      .select(col("l_partkey"),
        (col("value_cents").cast("double") / 100.0).as("value"))
      .orderBy(col("value").desc, col("l_partkey").asc)
  }

  /** TPC-H Q12 shape — shipping-speed priority audit: one fact-fact
    * join and two conditional sums per derived group. The fixture has
    * no l_shipmode, so the grouping column is the derived shipping
    * SPEED (shipped ≤30 days after order date = FAST, else SLOW) —
    * same CASE-sum shape, and the group key is computed from BOTH join
    * sides, so it genuinely cannot push below the join. Year filter
    * prunes the lineitem scan; counts are exact integers. */
  def q12PriorityShipping(s: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(when(datediff(col("l_shipdate"), col("o_orderdate")) <= 30,
          lit("FAST")).otherwise(lit("SLOW")).as("ship_speed"),
        when(hi, lit(1L)).otherwise(lit(0L)).as("hi"))
      .groupBy(col("ship_speed"))
      .agg(sum(col("hi")).as("high_line_count"),
        (count(lit(1)) - sum(col("hi"))).as("low_line_count"))
      .orderBy("ship_speed")
  }

  /** TPC-H Q16 shape — supplier count per (brand, type, size) slice,
    * EXCLUDING a blacklist via the NOT-IN face (shipped as LEFT ANTI —
    * equivalent here because suppkey is non-null; the oracle keeps the
    * textbook NOT IN subquery). The negative-balance "complaints"
    * surrogate is a dim-sized broadcast; the size IN-list and brand/type
    * exclusions push into the part scan; the distinct-supplier count
    * runs over pair-cardinality rows only. */
  def q16SupplierParts(s: SparkSession, dir: String): DataFrame = {
    val excl = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val parts = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#45" &&
              !col("p_type").like("PROMO%") &&
              col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    psPairs(s, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
  }

  /** TPC-H Q20 shape — dominant suppliers of one part family in one
    * nation/year: the nested-correlated-subquery pattern ("shipped more
    * than half of the part's total"), decorrelated into the two
    * aggregations over ONE year-pruned pass (per-part total, per
    * (part,supplier) share) joined on the cross-multiplied integer
    * predicate 2·share > total — the fixture's surrogate for Q20's
    * availqty > 0.5·Σqty, with the same alias-self-comparison
    * structure. Supplier side reduces through a SEMI join (one row per
    * dominant supplier no matter how many parts they dominate); the
    * name-prefix part filter and the nation filter broadcast. */
  def q20DominantSupplier(s: SparkSession, dir: String): DataFrame = {
    val yr = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, dir)
          .filter(col("p_name").like("small%")).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_quantity")).cast("long").as("q"))
    // per-part totals roll up FROM the per-(part, supplier) shares, and
    // the share relation (consumed by the rollup AND the dominance join)
    // is lineage-cut — ONE pass over the year-pruned lines total
    val share = graft.core.Lineage.cut(
      yr.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("q")).as("sp_q")))
    val tot = share.groupBy(col("l_partkey")).agg(sum(col("sp_q")).as("tot_q"))
    val dominant = share.join(tot, "l_partkey")
      .filter(col("sp_q") * 2 > col("tot_q"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, dir)
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, dir))
          .filter(col("n_name") === "NATION_2"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_suppkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q4_late_orders" -> (q4LateOrders _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q8_market_share" -> (q8MarketShare _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q21_sole_late_supplier" -> (q21SoleLateSupplier _),
    "q22_idle_customers" -> (q22IdleCustomers _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q14_promo_revenue" -> (q14PromoRevenue _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q11_important_stock" -> (q11ImportantStock _),
    "q12_priority_shipping" -> (q12PriorityShipping _),
    "q16_supplier_parts" -> (q16SupplierParts _),
    "q20_dominant_supplier" -> (q20DominantSupplier _),
    "q_filter_project" -> (qFilterProject _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_outer_join" -> (qOuterJoin _),
    "q_window_rank" -> (qWindowRank _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_union" -> (qUnion _),
    "q_intersect" -> (qIntersect _),
    "q_except" -> (qExcept _),
    "q_intersect_all" -> (qIntersectAll _),
    "q_except_all" -> (qExceptAll _),
    "q_topk_orders" -> (qTopKOrders _),
    "q_topk_bounded" -> (qTopkBounded _),
    "q_distinct_segments" -> (qDistinctSegments _),
    "q_scalar_fns" -> (qScalarFns _),
    "q_case_buckets" -> (qCaseBuckets _),
    "q_json_extract" -> (qJsonExtract _),
    "q_variant_extract" -> (qVariantExtract _),
    "q_scalar_subquery" -> (qScalarSubquery _),
    "q_correlated_subquery" -> (qCorrelatedSubquery _),
    "q_like_filter" -> (qLikeFilter _),
    "q_having" -> (qHaving _),
    "q_events_daily" -> (qEventsDaily _),
    "q_funnel" -> (qFunnel _),
    "q_window_funnel" -> (qWindowFunnel _),
    "q_retention" -> (qRetention _),
    "q_churn" -> (qChurn _),
  )

  private val disc = "(1 - CAST(l_discount AS DECIMAL(4,2)))"
  private val price = "CAST(l_extendedprice AS DECIMAL(14,2))"

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         | CAST(sum($price) AS DOUBLE) AS sum_base_price,
         | CAST(sum($price * $disc) AS DOUBLE) AS sum_disc_price,
         | CAST(sum($price * $disc * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
         | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
         | CAST(sum($price) AS DOUBLE) / count(*) AS avg_price,
         | CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-01-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 400000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         | o_orderpriority,
         | CAST(sum($price * $disc) AS DOUBLE) AS revenue
         |FROM lineitem, orders, customer
         |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |  AND c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01'
         |  AND l_shipdate > TIMESTAMP '1998-06-01'
         |GROUP BY l_orderkey, order_date, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT n_name, CAST(sum($price * $disc) AS DOUBLE) AS revenue
         |FROM lineitem, orders, customer, supplier, nation, region
         |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE) AS total_price,
        |  CAST(sqty AS DOUBLE) AS sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sqty
        |      FROM lineitem GROUP BY l_orderkey HAVING sqty > 200) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_price DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_discount >= 0.08)
        |ORDER BY o_orderkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn, o_totalprice, running_spend FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)))
        |           OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      AS running_spend
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn, o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin,
    "q_union" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,
    "q_except" ->
      """SELECT o_orderdate AS d FROM orders
        |EXCEPT SELECT o_orderdate FROM orders
        |  WHERE o_totalprice > 300000
        |ORDER BY d""".stripMargin,
    "q_intersect_all" ->
      """SELECT o_orderdate AS d FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |INTERSECT ALL
        |SELECT o_orderdate FROM orders
        |  WHERE o_orderpriority = '2-HIGH'
        |ORDER BY d""".stripMargin,
    "q_except_all" ->
      """SELECT o_orderdate AS d FROM orders
        |EXCEPT ALL
        |SELECT o_orderdate FROM orders
        |  WHERE o_totalprice > 300000
        |ORDER BY d""".stripMargin,
    // row_number window spelling — re-proves the bounded topk_min
    // aggregate equal to the window form it replaces at scale
    "q_topk_bounded" ->
      """WITH j AS (
        |  SELECT n_name, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |         o_orderkey
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |r AS (SELECT n_name, price_cents, o_orderkey,
        |        row_number() OVER (PARTITION BY n_name
        |          ORDER BY price_cents, o_orderkey) AS rank
        |      FROM j)
        |SELECT n_name, CAST(rank AS INT) AS rank, o_orderkey, price_cents
        |FROM r WHERE rank <= 3 ORDER BY n_name, rank""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_distinct_segments" ->
      "SELECT DISTINCT c_mktsegment AS segment FROM customer ORDER BY segment",
    "q_scalar_fns" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INT) AS yr,
        | CAST(month(o_orderdate) AS INT) AS mo,
        | CAST(day(o_orderdate) AS INT) AS dy,
        | CAST(quarter(o_orderdate) AS INT) AS qtr,
        | strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        | lower(o_orderpriority) AS prio_lower,
        | substring(o_orderpriority, 1, 1) AS prio_code,
        | CAST(length(o_orderpriority) AS INT) AS prio_len,
        | concat_ws('#', o_orderstatus, o_orderpriority) AS tag,
        | CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        | abs(o_totalprice * -1) AS price_abs,
        | sqrt(o_totalprice) AS price_sqrt,
        | o_orderkey % 7 AS key_mod
        |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin,
    "q_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 100000.0 THEN 'small'
        |            WHEN o_totalprice < 300000.0 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        | count(*) AS n,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        | count(*) AS n, count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY k_val ORDER BY k_val""".stripMargin,
    // straight-from-source recompute: build -> parse_json -> variant_get
    // must be the identity on every field for the hashes to match
    "q_variant_extract" ->
      """SELECT event_type AS etype, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS k_sum,
        |  CAST(sum(user_id * 2) AS BIGINT) AS uid2_sum,
        |  CAST(0 AS BIGINT) AS n_phantom
        |FROM events GROUP BY event_type ORDER BY etype""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "q_correlated_subquery" ->
      """SELECT p_brand, count(*) AS n_small,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_quantity < 0.2 * (
        |  SELECT avg(l2.l_quantity) FROM lineitem l2
        |  WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_like_filter" ->
      """SELECT p_brand, count(*) AS n,
        | CAST(sum(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
        |FROM part WHERE p_type LIKE 'PROMO%' AND p_name LIKE '%a%'
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_having" ->
      """SELECT l_suppkey,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        |FROM lineitem GROUP BY l_suppkey
        |HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 1000.0
        |ORDER BY l_suppkey""".stripMargin,
    "q_events_daily" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY day, event_type ORDER BY day, event_type""".stripMargin,
    // EXISTS via semi join with the cross-side inequality; 60-day grace.
    "q4_late_orders" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // Same alias pair, symmetric post-join predicate, decimal revenue.
    "q7_volume_shipping" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year, count(*) AS n_lines,
         |  CAST(sum($price * $disc) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
         |   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // Same hundredth-cent integers and floor division for the share.
    "q8_market_share" ->
      s"""WITH base AS (
         |  SELECT year(o_orderdate) AS o_year,
         |    CAST(sum(CASE WHEN sn.n_name = 'NATION_3' THEN $price * $disc
         |             ELSE CAST(0 AS DECIMAL(14,2)) END) * 10000
         |      AS DECIMAL(38,0)) AS nation_hc,
         |    CAST(sum($price * $disc) * 10000 AS DECIMAL(38,0)) AS total_hc
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation cn ON c_nationkey = cn.n_nationkey
         |  JOIN region ON cn.n_regionkey = r_regionkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation sn ON s_nationkey = sn.n_nationkey
         |  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
         |  GROUP BY 1)
         |SELECT o_year,
         |  CAST(nation_hc AS DOUBLE) / 10000.0 AS nation_volume,
         |  CAST(total_hc AS DOUBLE) / 10000.0 AS total_volume,
         |  CAST(CAST(nation_hc AS HUGEINT) * 1000000
         |       // CAST(total_hc AS HUGEINT) AS BIGINT) AS share_ppm
         |FROM base ORDER BY o_year""".stripMargin,
    // Same aggregated view; the max comparison stays in DECIMAL.
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, sum($price * $disc) AS rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE rev = (SELECT max(rev) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
        |      * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    // The textbook correlated scalar-subquery spelling — every verify
    // re-proves the shipped decorrelated join against it.
    "q17_small_qty_revenue" ->
      """WITH cents AS (
        |  SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS q,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#4'),
        |picked AS (
        |  SELECT c.cents FROM cents c
        |  WHERE c.q * 5 * (SELECT count(*) FROM cents c2
        |                   WHERE c2.l_partkey = c.l_partkey)
        |      < (SELECT sum(q) FROM cents c3
        |         WHERE c3.l_partkey = c.l_partkey))
        |SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents,
        |  CAST(sum(cents) AS BIGINT) // 7 AS avg_yearly_cents
        |FROM picked""".stripMargin,
    // The textbook EXISTS / NOT-EXISTS spelling — every verify re-proves
    // the shipped one-pass decorrelation against it.
    "q21_sole_late_supplier" ->
      """SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey ASC LIMIT 25""".stripMargin,
    // NOT EXISTS face of the shipped LEFT ANTI; same scalar average.
    "q22_idle_customers" ->
      """SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c.c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(CAST(c_acctbal AS DECIMAL(14,2)) AS DOUBLE) AS acctbal,
         |  CAST(sum($price * $disc) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "q14_promo_revenue" ->
      s"""WITH a AS (
         |  SELECT
         |    CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN $price * $disc
         |             ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) AS dp,
         |    CAST(sum($price * $disc) AS DOUBLE) AS dt
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01')
         |SELECT round(dp * 100.0 / dt, 4) AS promo_pct,
         |  dp AS promo_revenue, dt AS total_revenue FROM a""".stripMargin,
    "q19_disjunctive" ->
      s"""SELECT count(*) AS n_lines,
         |  CAST(sum($price * $disc) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 1 AND 21)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
         |        AND l_quantity BETWEEN 10 AND 30)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
         |        AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    // Textbook correlated-min spelling — every verify re-proves the
    // shipped groupBy+join-back decorrelation against it.
    "q2_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
        |  FROM lineitem GROUP BY 1, 2),
        |cand AS (
        |  SELECT p_partkey, s_name, s_acctbal, n_name, cost_cents
        |  FROM ps
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'STANDARD')
        |SELECT CAST(CAST(s_acctbal AS DECIMAL(14,2)) AS DOUBLE) AS acctbal,
        |  s_name, n_name, p_partkey, cost_cents
        |FROM cand c
        |WHERE cost_cents = (SELECT min(cost_cents) FROM cand c2
        |                    WHERE c2.p_partkey = c.p_partkey)
        |ORDER BY acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
    // Same hundredth-cent integer profit; 0.6·retail cost surrogate.
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |  CAST(sum(CAST($price * $disc * 10000 AS DECIMAL(38,0))
         |    - CAST(CAST(round(p_retailprice * 100) AS BIGINT)
         |           * CAST(round(l_quantity) AS BIGINT) * 60
         |        AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%bolt%'
         |GROUP BY 1, 2 ORDER BY nation ASC, o_year DESC""".stripMargin,
    // Uncorrelated scalar-subquery HAVING face; exact cents both sides.
    "q11_important_stock" ->
      """WITH vals AS (
        |  SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_cents
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |                      JOIN nation ON s_nationkey = n_nationkey
        |                      WHERE n_name = 'NATION_1')
        |  GROUP BY 1)
        |SELECT l_partkey, CAST(value_cents AS DOUBLE) / 100.0 AS value
        |FROM vals
        |WHERE value_cents * 10000 > (SELECT sum(value_cents) FROM vals)
        |ORDER BY value DESC, l_partkey ASC""".stripMargin,
    "q12_priority_shipping" ->
      """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
        |            THEN 'FAST' ELSE 'SLOW' END AS ship_speed,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Textbook NOT IN face of the shipped LEFT ANTI.
    "q16_supplier_parts" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin,
    // Textbook nested correlated-subquery spelling — re-proves the
    // one-pass two-aggregation decorrelation on every verify.
    "q20_dominant_supplier" ->
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_2'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem l1
        |    WHERE l1.l_partkey IN (SELECT p_partkey FROM part
        |                           WHERE p_name LIKE 'small%')
        |      AND l1.l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l1.l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY l1.l_partkey, l1.l_suppkey
        |    HAVING sum(CAST(round(l1.l_quantity) AS BIGINT)) * 2 >
        |      (SELECT sum(CAST(round(l2.l_quantity) AS BIGINT))
        |       FROM lineitem l2
        |       WHERE l2.l_partkey = l1.l_partkey
        |         AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
        |         AND l2.l_shipdate < TIMESTAMP '1997-01-01'))
        |ORDER BY s_suppkey""".stripMargin,
    // Identical anchored-window stage chain and integer ppm.
    "q_window_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t
         |           FROM events),
         |t1 AS (SELECT user_id, min(t) AS t1 FROM e
         |       WHERE event_type = 'view' GROUP BY 1),
         |t2 AS (SELECT e.user_id, min(e.t) AS t2, min(t1.t1) AS t1
         |       FROM e JOIN t1 USING (user_id)
         |       WHERE e.event_type = 'click' AND e.t > t1.t1
         |         AND e.t <= t1.t1 + $FunnelWindowUs
         |       GROUP BY e.user_id),
         |t3 AS (SELECT e.user_id, min(e.t) AS t3
         |       FROM e JOIN t2 USING (user_id)
         |       WHERE e.event_type = 'purchase' AND e.t > t2.t2
         |         AND e.t <= t2.t1 + $FunnelWindowUs
         |       GROUP BY e.user_id),
         |st AS (
         |  SELECT 1 AS stage, count(*) AS users FROM t1
         |  UNION ALL SELECT 2, count(*) FROM t2
         |  UNION ALL SELECT 3, count(*) FROM t3),
         |c AS (SELECT count(*) AS n1 FROM t1)
         |SELECT stage, users,
         |  CASE WHEN n1 > 0 THEN users * 1000000 // n1 ELSE 0 END
         |    AS conv_ppm
         |FROM st, c ORDER BY stage""".stripMargin,
    "q_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |t3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT 1 AS stage, count(*) AS users FROM t1
        |UNION ALL SELECT 2, count(*) FROM t2
        |UNION ALL SELECT 3, count(*) FROM t3
        |ORDER BY stage""".stripMargin,
    "q_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        |  FROM events),
        |first AS (SELECT user_id, min(d) AS d0 FROM ud GROUP BY user_id),
        |wk AS (
        |  SELECT DISTINCT ud.user_id, first.d0,
        |    CAST(floor((ud.d - first.d0) / 7.0) AS BIGINT) AS wk
        |  FROM ud JOIN first ON ud.user_id = first.user_id)
        |SELECT strftime(d0, '%Y-%m-%d') AS cohort_day, wk, count(*) AS active_users
        |FROM wk GROUP BY d0, wk ORDER BY cohort_day, wk""".stripMargin,
    "q_churn" ->
      """WITH anchor AS (
        |  SELECT min(CAST(date_trunc('day', ts) AS DATE)) AS d_min FROM events),
        |uw AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor((CAST(date_trunc('day', ts) AS DATE) - anchor.d_min) / 7.0) AS BIGINT) AS wk
        |  FROM events, anchor)
        |SELECT a.wk, count(*) AS churned
        |FROM uw a ANTI JOIN uw b ON a.user_id = b.user_id AND b.wk = a.wk + 1
        |GROUP BY a.wk ORDER BY a.wk""".stripMargin,
  )
}
