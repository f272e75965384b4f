package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.queries.SqlSurface

/** Engine-side invariants for the SqlSurface tier — cross-checks the
  * oracle can't express (built-in equivalence, recursion == window
  * algebra, pivot/unpivot round-trip).
  */
class SqlSurfaceSpec extends SparkSpec {

  test("regression from exact moments matches built-in regr_*") {
    val ours = SqlSurface.qRegression(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(5)))
      .toMap
    val ref = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("slope"),
        expr("regr_intercept(l_extendedprice, l_quantity)").as("intercept"),
        expr("corr(l_extendedprice, l_quantity)").as("corr_xy"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(ours.keySet == ref.keySet)
    for ((flag, (s1, i1, c1)) <- ours; (s2, i2, c2) = ref(flag)) {
      assert(math.abs(s1 - s2) < 1e-6, s"$flag slope $s1 vs builtin $s2")
      assert(math.abs(i1 - i2) < 1e-3, s"$flag intercept $i1 vs builtin $i2")
      // our outputs are rounded to 6dp, so the bound is rounding + fp noise
      assert(math.abs(c1 - c2) < 1e-6, s"$flag corr $c1 vs builtin $c2")
    }
  }

  test("recursive chain == window algebra (depth = row_number, spend = running sum)") {
    val rec = SqlSurface.qRecursiveChain(spark, sf)
      .select("o_orderkey", "depth", "cum_spend")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val win = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        row_number().over(w).cast("long").as("depth"),
        round(sum(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("cum_spend"))
    // recursion adds o_totalprice in strictly increasing rn order, which is
    // exactly the running-sum frame order → identical doubles, so the
    // equality below is exact, not approximate
    assert(rec.count() == Tables.orders(spark, sf).count(),
      "every order must appear in exactly one chain position")
    assert(rec.join(win, Seq("o_orderkey", "depth", "cum_spend"), "left_anti")
      .count() == 0, "recursive result must equal the window formulation")
  }

  test("qRecursiveChain leaves no session state behind and survives its own cleanup") {
    val key = "spark.sql.cteRecursionLevelLimit"
    val rowKey = "spark.sql.cteRecursionRowLimit"
    val prior = spark.conf.getOption(key)
    val priorRows = spark.conf.getOption(rowKey)
    val df = SqlSurface.qRecursiveChain(spark, sf)
    // the function saves/restores BOTH recursion-limit confs and drops its
    // staging view before returning — the analyzed plan must not need them
    assert(spark.conf.getOption(key) == prior, "recursion-limit conf leaked")
    assert(spark.conf.getOption(rowKey) == priorRows, "recursion-row-limit conf leaked")
    assert(!spark.catalog.tableExists("graft_rc_ord"), "staging temp view leaked")
    assert(df.limit(5).collect().nonEmpty,
      "plan must execute after view drop + conf restore (analysis-time binding)")
  }

  test("recursion deeper than cteRecursionLevelLimit fails with the documented error") {
    val key = "spark.sql.cteRecursionLevelLimit"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "5")
    try {
      import spark.implicits._
      (1 to 20).toDF("n").createOrReplaceTempView("rc_limit_t")
      val err = intercept[Exception] {
        spark.sql(
          """WITH RECURSIVE walk(n) AS (
            |  SELECT 1
            |  UNION ALL
            |  SELECT w.n + 1 FROM walk w JOIN rc_limit_t t ON t.n = w.n + 1
            |)
            |SELECT max(n) AS maxn FROM walk""".stripMargin).collect()
      }
      val msgs = Iterator.iterate[Throwable](err)(_.getCause).takeWhile(_ != null)
        .map(String.valueOf(_: Throwable)).mkString(" ").toUpperCase
      assert(msgs.contains("RECURSION") && msgs.contains("LIMIT"),
        s"expected the recursion-limit error class, got: ${msgs.take(400)}")
    } finally {
      spark.catalog.dropTempView("rc_limit_t")
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("lateral top-n decorrelates and equals the window-rank formulation") {
    val lat = SqlSurface.qLateralTopn(spark, sf)
    // Catalyst must rewrite the per-segment dependent subquery into a
    // set-based plan: no lateral join may survive optimization
    val opt = lat.queryExecution.optimizedPlan.toString
    assert(!opt.contains("LateralJoin"), s"lateral join not decorrelated:\n$opt")
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val win = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
        col("o_totalprice"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .select(col("segment"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
    assert(lat.count() == win.count())
    assert(lat.join(win, Seq("segment", "o_orderkey", "totalprice"), "left_anti")
      .count() == 0, "lateral result must equal the window-rank top-3")
  }

  test("multi-distinct aggregates via one Expand and equals per-column distincts") {
    val got = SqlSurface.qMultiDistinct(spark, sf)
    assert(got.queryExecution.executedPlan.toString.contains("Expand"),
      "multi-distinct must lower to the Expand-based single-scan plan")
    val li = Tables.lineitem(spark, sf)
    got.collect().foreach { r =>
      val st = r.getString(0)
      val base = li.filter(col("l_linestatus") === st)
      assert(r.getLong(1) == base.select("l_partkey").distinct().count(), s"$st nd_part")
      assert(r.getLong(2) == base.select("l_suppkey").distinct().count(), s"$st nd_supp")
      assert(r.getLong(3) == base.select("l_returnflag").distinct().count(), s"$st nd_flag")
      assert(r.getLong(4) == base.count(), s"$st n_rows")
    }
  }

  test("window distribution trio is internally consistent per partition") {
    val rows = SqlSurface.qWindowDist(spark, sf).collect()
    val byPriority = rows.groupBy(_.getString(1))
    for ((p, rs) <- byPriority) {
      val n = rs.length
      // cume_dist of the maximal row is exactly 1; pct_rank spans [0, 1]
      assert(math.abs(rs.map(_.getDouble(4)).max - 1.0) < 1e-9, s"$p cume max")
      assert(rs.map(_.getDouble(3)).min == 0.0, s"$p pct_rank min")
      // ntile(4) buckets differ in size by at most 1 and cover all rows
      val sizes = rs.groupBy(_.getInt(2)).view.mapValues(_.length).toMap
      assert(sizes.keySet == (1 to math.min(4, n)).toSet, s"$p ntile buckets")
      assert(sizes.values.max - sizes.values.min <= 1, s"$p ntile balance")
    }
  }

  test("unpivot then pivot round-trips part metrics") {
    val back = SqlSurface.qUnpivot(spark, sf)
      .groupBy("p_partkey")
      .pivot("metric", Seq("retailprice", "size"))
      .agg(first(col("value")))
    val orig = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice").cast("double").as("retailprice"),
        col("p_size").cast("double").as("size"))
    assert(back.join(orig, Seq("p_partkey", "retailprice", "size"), "left_anti")
      .count() == 0, "pivot(unpivot(x)) must equal x")
    assert(back.count() == orig.count())
  }

  test("filtered aggregates agree with independently filtered scans") {
    val out = SqlSurface.qAggFiltered(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val orders = Tables.orders(spark, sf)
    for ((status, r) <- out) {
      val sub = orders.filter(col("o_orderstatus") === status)
      assert(r.getLong(1) == sub.count(), s"$status n_orders")
      assert(r.getLong(2) ==
        sub.filter(col("o_orderpriority") === "1-URGENT").count(),
        s"$status n_urgent")
      assert(r.getBoolean(5), s"$status all_pos must hold on fixture prices")
    }
  }

  test("variant: typed extraction round-trips, misses are NULL not errors") {
    import spark.implicits._
    val v = Seq("""{"a": {"b": [10, 20]}, "s": "x", "neg": -5}""").toDF("j")
      .selectExpr("parse_json(j) AS v")
    assert(v.schema("v").dataType.typeName == "variant", "parse_json must yield VariantType")
    val r = v.selectExpr(
      "variant_get(v, '$.a.b[1]', 'long') AS i",
      "variant_get(v, '$.s', 'string') AS s",
      "variant_get(v, '$.neg', 'long') AS n",
      "try_variant_get(v, '$.a.zzz', 'long') AS miss").collect()(0)
    assert(r.getLong(0) == 20L && r.getString(1) == "x" && r.getLong(2) == -5L)
    assert(r.isNullAt(3), "try_variant_get on a missing path must be NULL")
    // the query-level contract: phantom-path extraction contributes zero
    val q = graft.queries.Relational.qVariantExtract(spark, sf).collect()
    assert(q.nonEmpty && q.forall(_.getLong(4) == 0L), "n_phantom must be 0 everywhere")
    assert(q.map(_.getLong(1)).sum == graft.io.Tables.events(spark, sf).count(),
      "every event must survive the build->parse->extract round trip")
  }

  test("topk_bounded: no Window node, topk_min partial-aggregates, window-equal") {
    val df = graft.queries.Relational.qTopkBounded(spark, sf)
    val rows = df.collect()
    // plan shape: the bounded aggregate replaces the window — no WindowExec
    // anywhere, and topk_min appears in BOTH partial and final modes (the
    // map side reduces each partition to <= k pairs per group pre-shuffle)
    val plan = org.apache.spark.sql.graftbridge.Bridge.finalPlanString(df)
    assert(!plan.contains("Window"), s"bounded top-k must not plan a window:\n$plan")
    assert("partial_topk_min|partial topk_min|topk_min".r
      .findAllIn(plan.toLowerCase).size >= 2,
      s"topk_min must appear in partial AND final aggregate modes:\n$plan")
    // answer equality vs the window spelling, computed independently here
    import org.apache.spark.sql.expressions.Window
    val j = graft.io.Tables.orders(spark, sf)
      .join(graft.io.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(graft.io.Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        col("o_orderkey"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("price_cents"), col("o_orderkey"))
    val windowed = j.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("n_name"), col("rank"), col("o_orderkey"), col("price_cents"))
      .orderBy("n_name", "rank").collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq ==
      windowed.map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq,
      "bounded aggregate must equal the window spelling row for row")
  }

  test("INTERSECT ALL / EXCEPT ALL carry multiset multiplicities the " +
      "set spellings erase") {
    val o = Tables.orders(spark, sf)
    def byDate(df: org.apache.spark.sql.DataFrame): Map[Any, Long] =
      df.groupBy("d").count().collect()
        .map(r => r.get(0) -> r.getLong(1)).toMap
    val urgent = byDate(o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderdate").as("d")))
    val high = byDate(o.filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_orderdate").as("d")))
    val ia = byDate(graft.queries.Relational.qIntersectAll(spark, sf))
    // per-date multiplicity contract: min of the two sides
    val want = urgent.keySet.intersect(high.keySet)
      .map(d => d -> math.min(urgent(d), high(d))).toMap
    assert(ia == want, "INTERSECT ALL multiplicity != min(multA, multB)")
    // the >=2 multiplicity case the sf0.001 fixture lacks (sf0.01 shows
    // it in the gated output), pinned on an engineered multiset:
    // {1,1,1,2} ∩ALL {1,1,3} = {1,1}; {1,1,1,2} −ALL {1,1,3} = {1,2}
    import spark.implicits._
    val mA = Seq(1L, 1L, 1L, 2L).toDF("d")
    val mB = Seq(1L, 1L, 3L).toDF("d")
    assert(mA.intersectAll(mB).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 1L), "engineered INTERSECT ALL multiplicity wrong")
    assert(mA.exceptAll(mB).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L), "engineered EXCEPT ALL multiplicity wrong")
    val all = byDate(o.select(col("o_orderdate").as("d")))
    val big = byDate(o.filter(col("o_totalprice") > 300000)
      .select(col("o_orderdate").as("d")))
    val ea = byDate(graft.queries.Relational.qExceptAll(spark, sf))
    val wantEa = all.map { case (d, n) =>
      d -> (n - big.getOrElse(d, 0L)) }.filter(_._2 > 0L)
    assert(ea == wantEa, "EXCEPT ALL multiplicity != max(0, multA - multB)")
    // and the set spelling really is coarser: EXCEPT drops whole dates
    val exceptSet = graft.queries.Relational.qExcept(spark, sf).count()
    assert(ea.values.sum > exceptSet,
      "EXCEPT ALL must keep surviving copies EXCEPT erases")
  }
}
