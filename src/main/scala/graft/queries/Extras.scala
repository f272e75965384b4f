package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.TextPipeline
import graft.io.Tables

/** Additional operator coverage past SURVEY §7's core plan: pivot,
  * deterministic sampling, a bucketized range join, exact percentiles,
  * and a two-phase (salted) aggregation — each either a named relational
  * operator class or a canonical scale technique, each oracle-verified.
  */
object Extras {

  /** PIVOT: order counts by priority × status as columns. */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("priority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("priority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("priority")

  /** Deterministic ~5% sample via content hash (mod 20) — the reproducible
    * sampling pattern for 100 TB pipelines (same rows on every run and
    * every engine, unlike TABLESAMPLE). */
  def qSampleHash(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(pmod(TextPipeline.h32(col("o_orderkey").cast("string")), lit(20)) === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderkey")

  /** Range (interval) join, bucketized: for each purchase event, count the
    * same user's click events within ±1 hour. The scale plan: equi-join on
    * (user, hour-bucket) with the probe side exploded to its 3 candidate
    * buckets, then refine on the exact interval — no O(n²) time-range
    * cross product, shuffle keys stay equi. */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600000000L
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("t_us"),
        explode(array((col("t_us") / HourUs).cast("long") - 1,
          (col("t_us") / HourUs).cast("long"),
          (col("t_us") / HourUs).cast("long") + 1)).as("bucket"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("t_us").as("c_us"),
        (col("t_us") / HourUs).cast("long").as("bucket"))
    purchases.join(clicks, Seq("user_id", "bucket"), "left_outer")
      .withColumn("hit",
        when(abs(col("c_us") - col("t_us")) <= HourUs, 1L).otherwise(0L))
      .groupBy(col("event_id"))
      .agg(sum(col("hit")).as("n_nearby_clicks"))
      .orderBy("event_id")
  }

  /** Exact percentiles per group (interpolating, matching quantile_cont). */
  def qMedianPrice(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy("status")

  /** Winsorization (outlier clamping): per-priority [p05, p95] bounds
    * from the exact interpolating percentile (quantile_cont parity is
    * proven by q_median_price), broadcast back over the fact scan, every
    * value clamped into the band. The winsorized mean accumulates as
    * round-to-cents BIGINT — order-free and exact — with the single
    * double division at the end, spelled identically in the oracle.
    * This is the standard robust-statistics cleaning step before any
    * mean-based reporting; at 100 TB it is one group-bounds pass (tiny
    * result, broadcast) + one narrow clamped pass, no per-row sort. */
  def qWinsorize(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("priority"), col("o_totalprice").as("x"))
    val bounds = o.groupBy("priority")
      .agg(expr("percentile(x, 0.05)").as("lo"),
        expr("percentile(x, 0.95)").as("hi"))
    o.join(broadcast(bounds), "priority")
      .select(col("priority"),
        least(greatest(col("x"), col("lo")), col("hi")).as("wx"),
        (col("x") < col("lo")).as("lo_clip"),
        (col("x") > col("hi")).as("hi_clip"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n"),
        sum(when(col("lo_clip"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("hi_clip"), 1L).otherwise(0L)).as("n_hi"),
        sum(round(col("wx") * 100).cast("long")).as("wsum_cents"))
      .select(col("priority"), col("n"), col("n_lo"), col("n_hi"),
        round(col("wsum_cents").cast("double") / 100.0 / col("n"), 4).as("wmean"))
      .orderBy("priority")
  }

  /** Robust (median/MAD) outlier detection per order priority — the
    * heavy-tail-safe twin of q_outliers' mean/σ z-score: a single whale
    * order inflates σ and masks every other outlier, while the median
    * and the median absolute deviation ignore it. Flag: |x − med| >
    * 3·1.4826·MAD (1.4826 ≈ 1/Φ⁻¹(3/4) makes MAD a consistent σ
    * estimator under normality; the product 4.4478 is the rational
    * constant both engines compare against — no libm anywhere).
    *
    * Cross-engine exactness: med and MAD come from the exact
    * interpolating percentile (quantile_cont parity proven by
    * q_median_price); |x − med| and the 4.4478·MAD threshold are plain
    * IEEE double ops on identical inputs, so the flag boundary is
    * bit-identical in both engines.
    *
    * Scale stance (100 TB): two narrow passes (per-group median, then
    * per-group MAD of the residuals) + one counting pass, each a
    * partial agg with the tiny per-group statistics broadcast back —
    * the q_winsorize shape one rung more robust. The exact percentile
    * needs the per-group sort; at extreme group cardinality the same
    * plan runs on q_quantile_sketch's mergeable histogram instead. */
  def qRobustOutliers(s: SparkSession, dir: String): DataFrame =
    robustOutliers(Tables.orders(s, dir)
      .select(col("o_orderpriority").as("priority"),
        col("o_totalprice").as("x")))

  /** Core of [[qRobustOutliers]] over any (priority, x) relation —
    * exposed for ExtrasSpec's whale-masking closed form (a point the
    * 3σ z-score misses but median/MAD flags). */
  private[graft] def robustOutliers(oIn: DataFrame): DataFrame = {
    val o = oIn.localCheckpoint() // 3 consumers: median, residuals, flags
    val med = o.groupBy("priority")
      .agg(expr("percentile(x, 0.5)").as("med"))
    val mad = o.join(broadcast(med), "priority")
      .groupBy("priority")
      .agg(expr("percentile(abs(x - med), 0.5)").as("mad"))
    o.join(broadcast(med), "priority").join(broadcast(mad), "priority")
      .groupBy("priority")
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 4).as("median"),
        round(max(col("mad")), 4).as("mad"),
        sum(when(abs(col("x") - col("med")) > col("mad") * 4.4478, 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy("priority")
  }

  /** Benford first-digit audit of order amounts — the classic
    * fraud/data-fabrication screen: naturally-occurring multi-scale
    * amounts follow P(d) = log10(1 + 1/d), and a fabricated or
    * truncated column visibly deviates. Output per digit 1–9: count,
    * observed ppm, expected Benford ppm, and the signed deviation.
    *
    * Cross-engine exactness: the leading digit is string arithmetic on
    * integer cents; the Benford expectation needs log10(1+1/d) — a
    * transcendental — spelled ENTIRELY on the verified integer-count
    * log2 grid: log10(1+1/d) = (log2(d+1) − log2(d)) / log2(10), i.e.
    * (qlog(d+1) − qlog(d)) · 10⁶ DIV qlog(10) with every qlog an
    * integer-argument 1e-6 grid point — no libm on non-integer input
    * anywhere, and the one division is integer.
    *
    * Scale stance: one scan partial-aggs to 9 rows; the expectation is
    * per-digit constant arithmetic. */
  def qBenford(s: SparkSession, dir: String): DataFrame = {
    val qlog = (c: Column) => round(log2(c.cast("double")) * 1e6).cast("long")
    Tables.orders(s, dir)
      .select(substring(round(col("o_totalprice") * 100).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .filter(col("digit") >= 1)
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("qd", qlog(col("digit") + 1) - qlog(col("digit")))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div total").as("obs_ppm"),
        expr("qd * 1000000 div 3321928").as("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .orderBy("digit")
  }

  /** Skew diagnosis over the orders fact's join key (o_custkey) — the
    * operational pre-flight every 100 TB join deserves: per-key
    * cardinality rollup, the hot key, the max/mean skew ratio, and the
    * salting factor (ceil(max/mean)) a skew-mitigation pass would
    * apply. This is the MEASUREMENT side of the machinery the suite
    * already exercises (q_wordcount_salted applies salting; the
    * SkewJoinSpec pins AQE's skew split) — a planner consumes this
    * readout to decide between AQE, salting, or broadcast.
    *
    * All-integer output (counts, DIV ratios ×100, ceil as
    * (a+b−1) DIV b); the hot key resolves ties toward the smallest key,
    * spelled as min-over-argmax in both engines.
    *
    * Scale stance: one partial-agg shuffle to per-key counts, a 1-row
    * statistics agg, and a broadcast-filtered argmax pass over the
    * per-key relation — nothing downstream of the first aggregate
    * scales with row count. */
  def qSkewAdvisor(s: SparkSession, dir: String): DataFrame = {
    val cnts = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // 2 consumers: stats + hot-key argmax
    val stats = cnts.agg(count(lit(1)).as("n_keys"),
      sum(col("n")).as("n_rows"), max(col("n")).as("max_rows"))
    val hot = cnts.crossJoin(broadcast(stats))
      .filter(col("n") === col("max_rows"))
      .agg(min(col("key")).as("hot_key"))
    stats.crossJoin(broadcast(hot))
      .select(col("n_rows"), col("n_keys"),
        expr("n_rows div n_keys").as("mean_rows"),
        col("max_rows"), col("hot_key"),
        expr("max_rows * 100 * n_keys div n_rows").as("skew_x100"),
        expr("(max_rows * n_keys + n_rows - 1) div n_rows").as("salt"))
  }

  /** Histogram-quantile buckets. */
  private[graft] val QsBuckets = 128

  /** Bucket index of `x` under a FIXED equi-width grid over [lo, hi],
    * with out-of-range values clamped into the edge buckets. The clamp
    * is the store contract: a persisted histogram pins its geometry at
    * creation, and later delta batches may drift outside it — drifted
    * mass accumulates visibly in buckets 0 / B−1 (the signal a
    * production store watches to decide when to re-grid) instead of
    * silently corrupting the bucket meaning. ONE spelling for the
    * single-pass rung and both store verbs, so the grid semantics
    * cannot diverge between them. */
  private[graft] def qsBucket(x: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0L))
      .otherwise(greatest(lit(0L),
        least(floor((x - lo) / (hi - lo) * QsBuckets), lit(QsBuckets - 1L))))

  /** (bucket, c) histogram of a 1-column `x` relation under a broadcast
    * 1-row (lo, hi) geometry — O(buckets) state, partial-aggregatable,
    * merge-order-free. */
  private[graft] def qsHist(values: DataFrame, geom: DataFrame): DataFrame =
    values.crossJoin(broadcast(geom))
      .select(qsBucket(col("x"), col("lo"), col("hi")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))

  /** Interpolated p50/p90 estimates from a (bucket, c) histogram + its
    * (lo, hi) geometry: first bucket whose cumulative count reaches q·n
    * wins the min — its in-bucket fraction is in (0,1]; later qualifying
    * buckets clamp to their bucket START (fraction floored at 0), which
    * is strictly larger. n is recomputed as Σc so the estimator works
    * identically over single-pass, merged, and subtracted histograms. */
  private[graft] def qsEstimates(hist: DataFrame, geom: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
      .withColumn("cum_before", col("cum") - col("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
      .crossJoin(broadcast(geom))
    def estimate(q: Double): Column = {
      val target = lit(q) * col("n")
      min(when(col("cum") >= target,
        col("lo") + (col("hi") - col("lo")) / QsBuckets
          * (col("bucket") + greatest(lit(0.0),
              (target - col("cum_before")) / col("c")))))
    }
    cum.agg(round(estimate(0.5), 4).as("p50_est"),
        round(estimate(0.9), 4).as("p90_est"),
        min(col("n")).as("n"))
  }

  /** Approximate quantiles from a fixed equi-width histogram — the
    * MERGEABLE quantile structure for 100 TB (O(buckets) state, partial-
    * aggregatable, no global sort), next to `q_median_price`'s exact
    * percentile (which needs the full per-group sort). Unlike GK/KLL
    * sketches the histogram state is a deterministic function of the
    * data — merge order can't change a bucket count — so the ESTIMATE
    * itself is oracle-verified, like KMV/count-min and unlike HLL.
    * Estimate: linear interpolation inside the first bucket whose
    * cumulative count reaches q·n; spec-checked against the exact
    * percentile within a bucket width. */
  def qQuantileSketch(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_totalprice").as("x"))
    val geom = o.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    qsEstimates(qsHist(o, geom), geom)
  }

  /** Persisted quantile-histogram store roots — written once per fixture
    * dir (the cmsStoreDir pattern): the HISTORICAL generation
    * (o_orderkey mod 4 ≠ 3, the lifecycle arrival-wave convention) with
    * its geometry for the incremental rung, and the FULL-corpus
    * generation with its geometry for the erase rung. The geometry rides
    * BESIDE the counters because bucket i is meaningless without the
    * (lo, hi) it was cut from — the store contract [[qsBucket]]
    * documents. */
  private val qsStoreRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def qsStoreDir(s: SparkSession, dir: String): String =
    qsStoreRoots.computeIfAbsent(dir, { d =>
      val root = Ingest.scratchDir("qsstore", d)
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice").as("x"))
      val hist = o.filter(pmod(col("o_orderkey"), lit(4)) =!= 3).select(col("x"))
      val histGeom = hist.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      histGeom.write.mode("overwrite").parquet(s"$root/geom_hist.parquet")
      qsHist(hist, histGeom)
        .write.mode("overwrite").parquet(s"$root/hist_hist.parquet")
      val full = o.select(col("x"))
      val fullGeom = full.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      fullGeom.write.mode("overwrite").parquet(s"$root/geom_full.parquet")
      qsHist(full, fullGeom)
        .write.mode("overwrite").parquet(s"$root/hist_full.parquet")
      root
    })

  /** Incremental quantile-histogram maintenance — the persisted-store
    * doctrine (qCmsIncremental) on the quantile family: historical
    * bucket counts AND their pinned (lo, hi) geometry come from the
    * parquet store, only the delta batch (o_orderkey mod 4 ≡ 3) is
    * scanned, bucketized UNDER THE STORED GRID (out-of-range delta
    * values clamp to the edge buckets — the documented drift signal),
    * and the generations merge by elementwise SUM. Histogram counters
    * are a commutative group like CMS counters — but ONLY under a shared
    * grid: re-deriving bounds per batch would silently change what
    * bucket i MEANS, which is why the geometry is part of the persisted
    * state, not recomputed. The oracle recomputes the single-pass
    * histogram of the WHOLE corpus under the historical geometry, so
    * store + delta ≡ full-under-stored-grid is re-proven every verify.
    *
    * Scale stance (100 TB): the delta scan partial-aggregates to ≤128
    * rows map-side; the merge is a 128-row aggregate; serving cost is
    * independent of history size. */
  def qQsketchIncremental(s: SparkSession, dir: String): DataFrame = {
    val root = qsStoreDir(s, dir)
    val geom = s.read.parquet(s"$root/geom_hist.parquet")
    val stored = s.read.parquet(s"$root/hist_hist.parquet")
    val delta = qsHist(Tables.orders(s, dir)
      .filter(pmod(col("o_orderkey"), lit(4)) === 3)
      .select(col("o_totalprice").as("x")), geom)
    val merged = stored.unionByName(delta)
      .groupBy("bucket").agg(sum(col("c")).as("c"))
    qsEstimates(merged, geom)
  }

  /** The quantile-store erase verb: SUBTRACTION, like qCmsErase and
    * unlike the HLL store's rebuild — bucket counts are sums, and
    * sketch(full) − sketch(subjects) ≡ sketch(survivors) bucket-by-
    * bucket, EXACTLY, provided both sides share the store's pinned
    * geometry. That proviso is the lesson this rung adds to the CMS
    * one: a from-scratch survivor rebuild would re-derive (lo, hi) from
    * the survivors and land on a DIFFERENT grid — linearity holds only
    * under the grid the store froze at creation, so erase keeps serving
    * estimates in the original geometry (the correct production
    * semantic: deletions must not silently re-bucket history). The
    * erase scans ONLY the subjects' rows (the shared q_erasure_audit
    * scope, o_orderkey ≡ 0 mod 17); zero-count buckets drop so the
    * subtracted generation is row-equal to a survivor recount under the
    * same grid (ExtrasSpec pins that equality, plus no-negative-cells).
    * The oracle recomputes the survivor histogram directly under the
    * full-corpus geometry, so subtraction ≡ recount is re-proven every
    * verify.
    *
    * Scale stance: subject scan partition-prunable to the subjects'
    * shards; the negated delta collapses map-side to ≤128 rows; the
    * fold is a 128-row aggregate — erase cost proportional to the
    * ERASED data. */
  def qQsketchErase(s: SparkSession, dir: String): DataFrame = {
    val root = qsStoreDir(s, dir)
    val geom = s.read.parquet(s"$root/geom_full.parquet")
    val full = s.read.parquet(s"$root/hist_full.parquet")
    val negated = qsHist(Tables.orders(s, dir)
      .filter(Ingest.erasureSubject(col("o_orderkey")))
      .select(col("o_totalprice").as("x")), geom)
      .select(col("bucket"), (-col("c")).as("c"))
    val erased = full.unionByName(negated)
      .groupBy("bucket").agg(sum(col("c")).as("c"))
      .filter(col("c") =!= 0)
    qsEstimates(erased, geom)
  }

  /** Window navigation-function sampler: lag/lead/ntile/cume_dist per
    * customer over a TOTAL order (orderdate then unique orderkey — ties
    * would make every navigation function nondeterministic). Boundary
    * nulls coalesce to -1.0 sentinels (the compare harness round-trips
    * NULL doubles through NaN). One shuffle on the partition key. */
  def qWindowNav(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        coalesce(lag(col("o_totalprice"), 1).over(w), lit(-1.0)).as("prev_price"),
        coalesce(lead(col("o_totalprice"), 1).over(w), lit(-1.0)).as("next_price"),
        ntile(4).over(w).as("quartile"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("o_orderkey")
  }

  /** Time-series resampling with gap fill (dimension densification): the
    * hourly event count per type over a COMPLETE hourly grid — missing
    * hours appear as explicit zeros, the shape every downstream
    * time-series consumer (charting, anomaly detection, forecasting)
    * needs. The grid is generated from a broadcast 1-row span × the tiny
    * type dimension, so the only corpus-sized work is the group-by;
    * the left join against the grid is broadcast-sized. */
  def qResample(s: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600000000L
    val counts = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr(s"unix_micros(ts) div $HourUs").as("h"))
      .agg(count(lit(1)).as("n"))
    val span = counts.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val grid = counts.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("h"))
    grid.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), (col("h") * HourUs).as("win_start_us"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("event_type", "win_start_us")
  }

  /** Two-phase (salted) aggregation: partial sums on (word, salt) then a
    * final merge on word — the standard hot-key skew mitigation, shown to
    * be result-identical to the direct aggregation (same oracle as
    * `wordcount`). Salt = partition id: no extra column shuffled, and the
    * result provably can't depend on it. */
  def qWordcountSalted(s: SparkSession, dir: String): DataFrame =
    TextPipeline.words(Tables.documents(s, dir), "text")
      .withColumn("salt", spark_partition_id() % 8)
      .groupBy(col("word"), col("salt")).agg(count(lit(1)).as("c"))
      .groupBy(col("word")).agg(sum(col("c")).as("cnt"))
      .orderBy("word")

  /** Sketch aggregation: deterministic-HLL distinct-word estimate per
    * language beside the exact count. At 100 TB the sketch is the point
    * (fixed 256-byte partial state, one narrow shuffle vs the exact
    * distinct's two-stage expansion); the exact column here exists to
    * expose the error. Since round 13 the sketch is the engine's
    * `hll_det` (graft.plans.HllDet) over the md5-derived h32 hashes —
    * registers and estimate are pure functions of the data, so the
    * DuckDB oracle recomputes BOTH in SQL and the row is hash-exact
    * (the q_kmv_distinct doctrine applied to HLL). Spark's internal
    * `approx_count_distinct` (HLL++, engine-opaque) stays as the
    * measured baseline in ExtrasSpec, which also pins register-state
    * determinism and the accuracy contract vs the exact column. */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    TextPipeline.words(Tables.documents(s, dir), "text", keep = Seq("lang"))
      .groupBy("lang")
      .agg(graft.functions.VectorFunctions.hllDet(
          TextPipeline.h32(col("word"))).as("regs"),
        countDistinct(col("word")).as("exact_words"))
      .select(col("lang"),
        graft.plans.HllDet.estimate(col("regs")).as("approx_words"),
        col("exact_words"))
      .orderBy("lang")

  /** Date-arithmetic sampler (dayofweek numbering differs between
    * engines — oracle compensates; month-end clamping of add_months
    * matches DuckDB's +INTERVAL). */
  def qDateFns(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 100 === 0)
      .select(
        col("o_orderkey"),
        dayofweek(col("o_orderdate")).as("dow"),
        dayofyear(col("o_orderdate")).as("doy"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since_95"),
        date_format(add_months(col("o_orderdate"), 1), "yyyy-MM-dd").as("next_month"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
      .orderBy("o_orderkey")

  /** Array higher-order-function sampler over the embedding vectors
    * (scalar outputs only — cross-engine array-cell comparison is
    * representation-sensitive; scalars are not). */
  def qArrayFns(s: SparkSession, dir: String): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    Tables.embeddings(s, dir)
      .filter(col("vec_id") % 10 === 0)
      .select(
        col("vec_id"),
        size(col("embedding")).as("n_dims"),
        round(array_max(v), 6).as("max_val"),
        round(element_at(v, 1), 6).as("first_val"),
        size(filter(v, x => x > 0)).as("n_pos"),
        exists(v, x => x > lit(2.0)).as("has_gt2"),
        concat_ws(",", slice(reverse(array_sort(transform(v, x => round(x, 4)))), 1, 3))
          .as("top3_csv"))
      .orderBy("vec_id")
  }

  /** RANGE-frame window (value-based frame, vs q_window_rank's ROWS
    * frames): per customer, orders placed within the trailing 30 days of
    * each order. Frame bounds computed on epoch-seconds — integer range
    * arithmetic, identical in both engines. */
  def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val DaySec = 86400L
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("t_sec"))
      .rangeBetween(-30 * DaySec, 0)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        (unix_micros(col("o_orderdate").cast("timestamp")) / 1000000L).cast("long").as("t_sec"))
      .withColumn("n_last_30d", count(lit(1)).over(w))
      .select(col("o_orderkey"), col("o_custkey"), col("n_last_30d"))
      .orderBy("o_orderkey")
  }

  /** Statistical aggregates (variance/stddev/correlation) from EXACT
    * decimal moments: built-in stddev/corr merge running states in
    * task-completion order (order-dependent floats — nondeterministic
    * across runs and engines); sums of DECIMAL are exact and commutative,
    * and the closed-form moments derived from them are bit-reproducible.
    * The rounding keeps the final single float op cross-engine safe. */
  def qStats(s: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity").cast(DecimalType(20, 4))
    val p = col("l_extendedprice").cast(DecimalType(24, 4))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(q).as("sq"), sum(q * q).as("sqq"),
        sum(p).as("sp"), sum(p * p).as("spp"),
        sum(q * p).as("sqp"))
      .select(col("l_returnflag"), col("n"),
        round(col("sq").cast("double") / col("n"), 6).as("mean_qty"),
        round((col("sqq").cast("double") - col("sq").cast("double") * col("sq").cast("double") / col("n"))
          / (col("n") - 1), 6).as("var_qty"),
        round((col("sqp").cast("double") - col("sq").cast("double") * col("sp").cast("double") / col("n")) /
          (sqrt(col("sqq").cast("double") - col("sq").cast("double") * col("sq").cast("double") / col("n")) *
           sqrt(col("spp").cast("double") - col("sp").cast("double") * col("sp").cast("double") / col("n"))), 6)
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** KMV (k-minimum-values) distinct sketch, k=16: estimate = (k-1)·2³²
    * / kth-smallest-hash, exact count when fewer than k values. Unlike
    * HLL the sketch state is a deterministic function of the data (the k
    * smallest md5-derived hashes), so the ESTIMATE ITSELF is
    * oracle-verifiable — both engines compute identical sketches. At
    * scale: per-group state is k longs, mergeable by keep-smallest-k. */
  def qKmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val K = 16
    val hashes = TextPipeline.words(Tables.documents(s, dir), "text", keep = Seq("lang"))
      .select(col("lang"), TextPipeline.h32(col("word")).as("h"))
      .distinct()
    val w = Window.partitionBy(col("lang")).orderBy(col("h"))
    hashes.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_k"), max(col("h")).as("kth"))
      .select(col("lang"),
        round(when(col("n_k") < K, col("n_k").cast("double"))
          .otherwise(lit((K - 1).toDouble) * 4294967296.0 / col("kth")), 4)
          .as("kmv_estimate"))
      .orderBy("lang")
  }

  /** Argmin/argmax aggregates: each customer's cheapest and priciest
    * order keys (ties broken deterministically by taking the extreme
    * (price, orderkey) PAIR, since bare min_by/arg_min tie-breaks are
    * engine-undefined). */
  def qMinMaxBy(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(
        min(struct(col("o_totalprice"), col("o_orderkey"))).as("lo"),
        max(struct(col("o_totalprice"), col("o_orderkey"))).as("hi"),
        count(lit(1)).as("n"))
      .select(col("o_custkey"),
        col("lo.o_orderkey").as("cheapest_order"),
        col("lo.o_totalprice").as("cheapest_price"),
        col("hi.o_orderkey").as("priciest_order"),
        col("hi.o_totalprice").as("priciest_price"), col("n"))
      .orderBy("o_custkey")

  /** Ordered string aggregation (LISTAGG / string_agg): per nation, the
    * alphabetical comma-joined supplier roster + its size. Spelled
    * sort_array(collect_list(...)) → concat_ws so the concatenation order
    * is TOTAL (bare collect_list order is partition-dependent; string_agg
    * without ORDER BY is engine-undefined). Scale note: the aggregate
    * state is the group's value list — fine for bounded rosters (the
    * LISTAGG contract); unbounded groups want the array kept as an array
    * with a size cap, not a string. */
  def qStringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        concat_ws(",", sort_array(collect_list(col("s_name")))).as("roster"))
      .orderBy("n_name")

  /** LOCF — last observation carried forward via `last(..., ignoreNulls)`
    * over a running ROWS frame: every event carries the value of the
    * user's most recent PURCHASE at that point (the sparse-signal
    * forward-fill every feature pipeline needs; grid-based gap-fill is
    * q_resample's job). Nulls before the first observation sentinel to
    * -1 (the driver's hash compare NaN-round-trips NULL doubles — a
    * compare artifact, q_stream_join_outer precedent). One shuffle on
    * user_id; the frame is computed in one ordered pass per partition. */
  def qLocf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("pv", when(col("event_type") === "purchase", col("value")))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        coalesce(last(col("pv"), ignoreNulls = true).over(w), lit(-1.0))
          .as("last_purchase_value"))
      .orderBy("user_id", "us", "event_id")
  }

  /** UNION ALL (bag semantics — q_union covers the distinct form). */
  def qUnionAll(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      .unionAll(Tables.supplier(s, dir).select(col("s_nationkey").as("nk")))
      .groupBy("nk").agg(count(lit(1)).as("n"))
      .orderBy("nk")

  /** Columns profiled by [[qProfile]]: (name, isNumeric). */
  private val ProfileCols = Seq(
    ("o_custkey", true), ("o_orderkey", true), ("o_orderpriority", false),
    ("o_orderstatus", false), ("o_totalprice", true))

  /** Data profiling (ANALYZE-style): per-column row/null/distinct counts
    * and numeric min/max over `orders`, in ONE scan — all 5×4 aggregates
    * partial-aggregate together, then the single result row unpivots to
    * a row per column with `stack`. At 100 TB this is one pass + a 1-row
    * shuffle; the per-column-scan alternative (5 passes) is exactly what
    * this shape avoids. Distinct counts are exact; min/max stay typed
    * DOUBLE — value range for numeric columns, LENGTH range for string
    * columns — so no NULLs and no engine-specific number formatting
    * enter the compare. */
  def qProfile(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val aggs = count(lit(1)).as("n") +: ProfileCols.flatMap { case (c, num) =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        (if (num) min(col(c)).cast("double")
         else min(length(col(c))).cast("double")).as(s"mn_$c"),
        (if (num) max(col(c)).cast("double")
         else max(length(col(c))).cast("double")).as(s"mx_$c"))
    }
    val stackArgs = ProfileCols.map { case (c, _) =>
      s"'$c', nn_$c, nd_$c, mn_$c, mx_$c" }.mkString(", ")
    o.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n",
        s"stack(${ProfileCols.size}, $stackArgs) AS (column, n_null, n_distinct, min_d, max_d)")
      .select(col("column"), col("n"), col("n_null"), col("n_distinct"),
        col("min_d"), col("max_d"))
      .orderBy("column")
  }

  /** grouping()/grouping_id() over a ROLLUP: the subtotal-level indicator
    * functions that disambiguate "NULL because subtotal row" from "NULL in
    * the data" — the piece of the rollup surface q_rollup's coalesce
    * labels don't exercise. gid is also recomputed portably as
    * 2·g(status)+g(priority) in the oracle, which is exactly Spark's
    * grouping_id bit layout (left column = high bit). */
  def qGroupingId(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      // grouping()/grouping_id() are only resolvable inside the grouping-
      // sets Aggregate itself, so they are computed here and projected after
      .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"),
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("g_status"), col("g_priority"), col("gid"), col("n"))
      .orderBy("gid", "status", "priority")

  /** Linear interpolation of a masked time series: treat click events'
    * values as missing and reconstruct them from the user's neighboring
    * non-click readings — prev/next non-null via IGNORE NULLS window
    * frames (one (user, time) sort serves all four), then a pure per-row
    * lerp with exact edge fallbacks (leading gap → next, trailing gap →
    * prev). No accumulation crosses rows, so doubles are bit-identical
    * under any partitioning; the lerp expression tree is spelled
    * identically in the oracle. Complements q_locf (step fill) with the
    * two-sided fill. */
  def qInterpolate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wNext = w.rowsBetween(1, Window.unboundedFollowing)
    val masked = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"),
        when(col("event_type") === "click", lit(null).cast("double"))
          .otherwise(col("value")).as("v"),
        when(col("event_type") === "click", lit(null).cast("long"))
          .otherwise(unix_micros(col("ts"))).as("vt"))
    val lerp = col("pv") + ((col("nv") - col("pv"))
      * ((col("t_us") - col("pt")).cast("double")
        / (col("nt") - col("pt")).cast("double")))
    masked
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pt", last(col("vt"), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nt", first(col("vt"), ignoreNulls = true).over(wNext))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("t_us"),
        round(when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(lerp), 6).as("interp_value"))
      .orderBy("event_id")
  }

  /** 2-D skyline (Pareto frontier): parts minimizing (retailprice, size)
    * — no other part is ≤ on both dimensions and < on one. The naive
    * spelling is the O(n²) self-anti-join the ORACLE runs (NOT EXISTS —
    * deliberately a DIFFERENT formulation, so agreement is a real
    * cross-check); the engine plan is the O(n log n) sweep Catalyst
    * cannot derive itself: collapse to per-price levels (min size per
    * price), one price-ordered running-min window over the LEVELS (a
    * price-cardinality relation, not the data), keep levels whose min
    * size strictly undercuts every cheaper level, then a semi-join back
    * tags the surviving rows. At 100 TB the window runs over ~|distinct
    * prices| rows and everything else is hash joins — nothing quadratic
    * anywhere. */
  def qSkyline(s: SparkSession, dir: String): DataFrame =
    skylineOf(Tables.part(s, dir)
      .select(col("p_partkey"), col("p_retailprice").as("price"),
        col("p_size").cast("long").as("size")))
      .orderBy("p_partkey")

  /** Sweep core of [[qSkyline]] over any (p_partkey, price, size) set —
    * exposed so PropertiesSpec can brute-force random point sets. */
  private[graft] def skylineOf(p: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val levels = p.groupBy("price").agg(min(col("size")).as("msize"))
    val w = Window.orderBy(col("price").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = levels
      .withColumn("prevmin", min(col("msize")).over(w))
      .filter(col("prevmin").isNull || col("msize") < col("prevmin"))
      .select(col("price"), col("msize"))
    p.join(frontier,
      p("price") === frontier("price") && p("size") === frontier("msize"),
      "left_semi")
  }

  /** Z-score outlier detection per order priority: flag orders more than
    * 1.7 sample standard deviations from their group mean (the fixture's
    * per-group price distribution is uniform, so |z| is bounded by
    * √3 ≈ 1.73 and a textbook 3σ gate can never fire; the SAME plan with
    * the threshold as a literal serves any cutoff). Moments
    * accumulate as EXACT decimals (the q_stats pattern — order-free,
    * mergeable), the tiny per-group stats broadcast back, and the z
    * formula is a per-row expression spelled identically in the oracle,
    * so the flagged SET is bit-stable: no accumulation noise can move a
    * point across the 3σ boundary differently on the two engines. */
  def qOutliers(s: SparkSession, dir: String): DataFrame = {
    val x = col("o_totalprice").cast(DecimalType(18, 2))
    val stats = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("s1"), sum(x * x).as("s2"))
      .select(col("priority"),
        (col("s1").cast("double") / col("n").cast("double")).as("mu"),
        sqrt((col("s2").cast("double")
          - col("s1").cast("double") * col("s1").cast("double")
            / col("n").cast("double"))
          / (col("n").cast("double") - lit(1.0))).as("sigma"))
    Tables.orders(s, dir)
      .join(broadcast(stats),
        col("o_orderpriority") === col("priority"))
      .withColumn("z", (col("o_totalprice") - col("mu")) / col("sigma"))
      .filter(abs(col("z")) > 1.7)
      .select(col("o_orderkey"), col("priority"), col("o_totalprice"),
        round(col("z"), 4).as("z"))
      .orderBy("o_orderkey")
  }

  /** MERGE / upsert (the Delta-style `MERGE INTO`, in pure Spark): apply
    * a deterministic changeset (updates %7, deletes %13 — delete wins on
    * overlap — inserts as key+1000000 for %11) to the customer snapshot
    * via ONE full-outer join + per-row case logic. The scale shape: both
    * sides shuffle once on the merge key, no driver-side diffing; at
    * 100 TB the changeset side is typically small enough that AQE turns
    * the full-outer into a broadcast-able right-outer + union. */
  def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val changes = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("op",
        when(col("c_custkey") % 13 === 0, "D")
          .when(col("c_custkey") % 7 === 0, "U")
          .when(col("c_custkey") % 11 === 0, "I"))
      .filter(col("op").isNotNull)
      .select(
        when(col("op") === "I", col("c_custkey") + 1000000)
          .otherwise(col("c_custkey")).as("k"),
        col("op"),
        when(col("op") === "U", round(col("c_acctbal") + 100.0, 2))
          .when(col("op") === "I", lit(0.0)).as("new_bal"),
        when(col("op") === "I",
          concat(lit("Customer#new"), col("c_custkey"))).as("new_name"))
    base.join(changes, base("c_custkey") === changes("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("c_custkey"), col("k")).as("custkey"),
        coalesce(col("new_name"), col("c_name")).as("name"),
        when(col("op") === "U", col("new_bal"))
          .when(col("op") === "I", col("new_bal"))
          .otherwise(col("c_acctbal")).as("acctbal"),
        coalesce(col("op"), lit("K")).as("applied"))
      .orderBy("custkey")
  }

  /** Bits per dimension interleaved into the z-value, and the right-shift
    * that turns a z-value into its spatial cell ([[qZorder]]). */
  private val ZBits = 16
  private val ZShift = 16

  /** Z-order (Morton) clustering key over (o_custkey, o_orderdate) — the
    * multi-dimensional data-layout rung (Delta/Iceberg `OPTIMIZE ZORDER`,
    * Morton 1966): interleave the low [[ZBits]] bits of the two dimensions
    * so that sorting by the single `zval` column co-locates rows that are
    * close in BOTH dimensions. Files written in z-order carry min/max zone
    * maps that prune rectangle predicates on EITHER column — a
    * single-column sort prunes only its own dimension (measured in
    * ExtrasSpec: a date-range predicate touches ~23% of z-cells vs 100%
    * of custkey-sorted buckets on the same fixture). `zbucket` =
    * zval >> [[ZShift]] is the fixed spatial cell (a pure per-row map);
    * at scale the layout step is `repartitionByRange(zval)` + sortWithin
    * — one range exchange, after which every written file spans a tight
    * z-interval and the scan-time pruning is free forever after.
    * All-integer bit arithmetic → oracle hash-exact. */
  def qZorder(s: SparkSession, dir: String): DataFrame = {
    val d1 = col("o_custkey").bitwiseAND(lit((1L << ZBits) - 1))
    val d2 = datediff(col("o_orderdate"), lit("1970-01-01"))
      .cast("long").bitwiseAND(lit((1L << ZBits) - 1))
    val zval = (0 until ZBits).map { j =>
      shiftright(d1, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1)) +
        shiftright(d2, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j))
    }.reduce(_ + _)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), zval.as("zval"))
      .select(col("o_orderkey"), col("zval"),
        shiftright(col("zval"), ZShift).as("zbucket"))
      .orderBy("o_orderkey")
  }

  /** KMV sketch size for [[qAudienceOverlap]]. */
  private val OverlapK = 64

  /** Audience-overlap estimation between event types via KMV sketch
    * INTERSECTION — the "how many users do campaigns A and B share"
    * readout a warehouse answers with theta/KMV sketches instead of an
    * exact self-join over every pair. Per type, the K smallest distinct
    * user-hashes form the sketch — built with the bounded `topk_min`
    * aggregate (O(K) state, map-side partial — the scale-safe spelling;
    * a per-type `row_number()` window would sort each full audience in
    * one task). Per type pair: merge-sketch = K smallest of the union;
    * ĵ = |merge ∩ A ∩ B| / K; |A∪B|̂ = (K−1)·2³²/kth; estimate =
    * round(ĵ·|A∪B|̂). The sketch is a DETERMINISTIC function of the
    * data (h32 + mins), so unlike HLL the whole estimator is
    * oracle-exact; the EXACT overlap and the signed ppm error ship in
    * the same row — the estimator's accuracy is part of the verified
    * result, not a hope.
    *
    * Scale stance: the only full-data pass is the distinct (type, user)
    * projection; sketches are |types|·K rows; the pair stage is
    * sketch-×-sketch array math over ≤ 10 pairs of 64-long arrays. The
    * exact-overlap join exists ONLY to verify the estimator on fixture
    * scale — a production run ships the sketch columns alone.
    *
    * Small-union regime (round-9 ADVICE): when the merged sketch holds
    * fewer than K hashes, BOTH audiences have < K members (a saturated
    * side alone contributes K), so the sketches are the complete
    * audiences and the intersection count IS the exact overlap — the
    * estimator returns it directly instead of dividing by a constant K
    * that would bias it low; in the saturated branch the jaccard term
    * divides by size(u) (= K there) rather than the constant. */
  def qAudienceOverlap(s: SparkSession, dir: String): DataFrame =
    audienceOverlap(Tables.events(s, dir))

  /** Core of [[qAudienceOverlap]] over any (event_type, user_id)
    * relation — exposed so ExtrasSpec can pin estimator accuracy on
    * hand-built partial-overlap audiences (the fixture's audiences
    * overlap almost totally, which is the easy case). */
  private[graft] def audienceOverlap(events: DataFrame): DataFrame = {
    val users = events
      .select(col("event_type"), TextPipeline.h32(col("user_id").cast("string")).as("h"))
      .distinct().localCheckpoint() // 2 consumers: sketches + exact join
    val sk = users.groupBy(col("event_type"))
      .agg(graft.functions.VectorFunctions.topkMin(col("h"), col("h"), OverlapK).as("tk"))
      .select(col("event_type"), expr("transform(tk, x -> x.score)").as("sketch"))
    val pairs = sk.select(col("event_type").as("ta"), col("sketch").as("sa"))
      .join(sk.select(col("event_type").as("tb"), col("sketch").as("sb")),
        col("ta") < col("tb"))
      .withColumn("u", expr(s"slice(array_sort(array_union(sa, sb)), 1, $OverlapK)"))
      .withColumn("kth", expr("element_at(u, size(u))"))
      .withColumn("n_both",
        expr("size(array_intersect(array_intersect(u, sa), sb))"))
      .select(col("ta"), col("tb"),
        when(size(col("u")) < OverlapK, col("n_both").cast("double"))
          .otherwise(when(col("kth").isNotNull,
            round((lit((OverlapK - 1).toDouble) * 4294967296.0
                / col("kth").cast("double"))
              * (col("n_both").cast("double")
                 / size(col("u")).cast("double"))))
            .otherwise(lit(0.0))).cast("long").as("est_overlap"))
    val exact = users.select(col("event_type").as("ta"), col("h"))
      .join(users.select(col("event_type").as("tb"), col("h")), Seq("h"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("exact_overlap"))
    pairs.join(exact, Seq("ta", "tb"), "left")
      .select(col("ta"), col("tb"), col("est_overlap"),
        coalesce(col("exact_overlap"), lit(0L)).as("exact_overlap"),
        when(coalesce(col("exact_overlap"), lit(0L)) > 0,
          expr("(est_overlap - exact_overlap) * 1000000 div exact_overlap"))
          .otherwise(lit(0L)).as("err_ppm"))
      .orderBy("ta", "tb")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_audience_overlap" -> (qAudienceOverlap _),
    "q_zorder" -> (qZorder _),
    "q_outliers" -> (qOutliers _),
    "q_robust_outliers" -> (qRobustOutliers _),
    "q_skew_advisor" -> (qSkewAdvisor _),
    "q_benford" -> (qBenford _),
    "q_merge_upsert" -> (qMergeUpsert _),
    "q_skyline" -> (qSkyline _),
    "q_grouping_id" -> (qGroupingId _),
    "q_interpolate" -> (qInterpolate _),
    "q_profile" -> (qProfile _),
    "q_quantile_sketch" -> (qQuantileSketch _),
    "q_qsketch_incremental" -> (qQsketchIncremental _),
    "q_qsketch_erase" -> (qQsketchErase _),
    "q_window_nav" -> (qWindowNav _),
    "q_resample" -> (qResample _),
    "q_min_max_by" -> (qMinMaxBy _),
    "q_union_all" -> (qUnionAll _),
    "q_string_agg" -> (qStringAgg _),
    "q_locf" -> (qLocf _),
    "q_kmv_distinct" -> (qKmvDistinct _),
    "q_stats" -> (qStats _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_date_fns" -> (qDateFns _),
    "q_array_fns" -> (qArrayFns _),
    "q_window_range" -> (qWindowRange _),
    "q_pivot" -> (qPivot _),
    "q_sample_hash" -> (qSampleHash _),
    "q_range_join" -> (qRangeJoin _),
    "q_median_price" -> (qMedianPrice _),
    "q_winsorize" -> (qWinsorize _),
    "q_wordcount_salted" -> (qWordcountSalted _),
  )

  private val duckToksE = TextPipeline.duckToks

  /** ONE quantile-histogram oracle spelling for all three rungs: grid
    * bounds from `geomWhere`'s rows, clamped single-pass bucket counts
    * over `histWhere`'s rows UNDER that grid, interpolated estimates —
    * the [[qsBucket]]/[[qsEstimates]] spelling in SQL. The store rungs
    * answer from persisted generations (merge / subtraction), so gating
    * them against this direct recompute re-proves the store algebra
    * every verify. */
  private def qsOracleSql(geomWhere: String, histWhere: String): String = {
    def est(q: String) =
      s"""round(min(CASE WHEN CAST(cum AS DOUBLE) >= $q * n THEN
         |  lo + (hi - lo) / $QsBuckets
         |    * (bucket + greatest(0.0,
         |        ($q * n - CAST(cum_before AS DOUBLE)) / c)) END), 4)""".stripMargin
    s"""WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
       |  FROM orders $geomWhere),
       |h AS (
       |  SELECT CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
       |    ELSE greatest(CAST(0 AS BIGINT),
       |      least(CAST(floor((o_totalprice - lo) / (hi - lo) * $QsBuckets)
       |        AS BIGINT), ${QsBuckets - 1})) END AS bucket,
       |    count(*) AS c
       |  FROM orders, b $histWhere GROUP BY 1),
       |cum AS (
       |  SELECT bucket, c,
       |    CAST(sum(c) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(sum(c) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS BIGINT)
       |      AS cum_before,
       |    CAST(sum(c) OVER () AS BIGINT) AS n
       |  FROM h)
       |SELECT ${est("0.5")} AS p50_est, ${est("0.9")} AS p90_est,
       |  min(n) AS n FROM cum, b""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // Same h32 mins, same merge/intersect estimator, same ppm arithmetic.
    "q_audience_overlap" -> {
      val k = OverlapK
      s"""WITH users AS MATERIALIZED (
         |  SELECT DISTINCT event_type,
         |    ${TextPipeline.duckH32("CAST(user_id AS VARCHAR)")} AS h
         |  FROM events),
         |sk AS MATERIALIZED (
         |  SELECT event_type, list_sort(list(h))[1:$k] AS sketch
         |  FROM users GROUP BY 1),
         |pairs AS (
         |  SELECT a.event_type AS ta, b.event_type AS tb, a.sketch AS sa,
         |         b.sketch AS sb,
         |         list_sort(list_distinct(a.sketch || b.sketch))[1:$k] AS u
         |  FROM sk a JOIN sk b ON a.event_type < b.event_type),
         |est AS (
         |  SELECT ta, tb,
         |    CASE WHEN len(u) < $k
         |      THEN CAST(len(list_intersect(list_intersect(u, sa), sb))
         |                AS BIGINT)
         |      ELSE CAST(round((${k - 1}.0 * 4294967296.0
         |          / CAST(u[len(u)] AS DOUBLE))
         |        * (CAST(len(list_intersect(list_intersect(u, sa), sb))
         |             AS DOUBLE)
         |           / CAST(len(u) AS DOUBLE))) AS BIGINT)
         |    END AS est_overlap
         |  FROM pairs),
         |exact AS (
         |  SELECT x.event_type AS ta, y.event_type AS tb,
         |         CAST(count(*) AS BIGINT) AS exact_overlap
         |  FROM users x JOIN users y
         |    ON x.h = y.h AND x.event_type < y.event_type GROUP BY 1, 2)
         |SELECT e.ta, e.tb, e.est_overlap,
         |  coalesce(x.exact_overlap, 0) AS exact_overlap,
         |  CASE WHEN coalesce(x.exact_overlap, 0) > 0
         |       THEN (e.est_overlap - x.exact_overlap) * 1000000 // x.exact_overlap
         |       ELSE 0 END AS err_ppm
         |FROM est e LEFT JOIN exact x USING (ta, tb)
         |ORDER BY ta, tb""".stripMargin
    },
    "q_zorder" -> {
      val terms = (0 until ZBits).map { j =>
        s"(((d1 >> $j) & 1) << ${2 * j + 1}) + (((d2 >> $j) & 1) << ${2 * j})"
      }.mkString(" + ")
      s"""WITH d AS (SELECT o_orderkey,
         |    (o_custkey & ${(1L << ZBits) - 1}) AS d1,
         |    ((CAST(o_orderdate AS DATE) - DATE '1970-01-01')
         |       & ${(1L << ZBits) - 1}) AS d2
         |  FROM orders),
         |z AS (SELECT o_orderkey, CAST($terms AS BIGINT) AS zval FROM d)
         |SELECT o_orderkey, zval, zval >> $ZShift AS zbucket
         |FROM z ORDER BY o_orderkey""".stripMargin
    },
    "q_outliers" ->
      """WITH st AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS ds1,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))
        |           * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS ds2,
        |    CAST(count(*) AS DOUBLE) AS dn
        |  FROM orders GROUP BY 1),
        |m AS (SELECT priority, ds1 / dn AS mu,
        |        sqrt((ds2 - ds1 * ds1 / dn) / (dn - 1.0)) AS sigma
        |      FROM st)
        |SELECT o.o_orderkey, m.priority, o.o_totalprice,
        |  round((o.o_totalprice - m.mu) / m.sigma, 4) AS z
        |FROM orders o JOIN m ON o.o_orderpriority = m.priority
        |WHERE abs((o.o_totalprice - m.mu) / m.sigma) > 1.7
        |ORDER BY o.o_orderkey""".stripMargin,
    "q_merge_upsert" ->
      """WITH changes AS (
        |  SELECT CASE WHEN op = 'I' THEN c_custkey + 1000000
        |              ELSE c_custkey END AS k, op,
        |    CASE WHEN op = 'U' THEN round(c_acctbal + 100.0, 2)
        |         WHEN op = 'I' THEN 0.0 END AS new_bal,
        |    CASE WHEN op = 'I' THEN 'Customer#new' ||
        |      CAST(c_custkey AS VARCHAR) END AS new_name
        |  FROM (SELECT c_custkey, c_acctbal,
        |          CASE WHEN c_custkey % 13 = 0 THEN 'D'
        |               WHEN c_custkey % 7 = 0 THEN 'U'
        |               WHEN c_custkey % 11 = 0 THEN 'I' END AS op
        |        FROM customer)
        |  WHERE op IS NOT NULL),
        |b AS (SELECT c_custkey, c_name, c_acctbal FROM customer)
        |SELECT coalesce(b.c_custkey, c.k) AS custkey,
        |  coalesce(c.new_name, b.c_name) AS name,
        |  CASE WHEN c.op IN ('U', 'I') THEN c.new_bal
        |       ELSE b.c_acctbal END AS acctbal,
        |  coalesce(c.op, 'K') AS applied
        |FROM b FULL OUTER JOIN changes c ON b.c_custkey = c.k
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY custkey""".stripMargin,
    "q_skyline" ->
      """SELECT p_partkey, p_retailprice AS price,
        |  CAST(p_size AS BIGINT) AS size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size <= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice
        |         OR q.p_size < p.p_size))
        |ORDER BY p_partkey""".stripMargin,
    "q_grouping_id" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |  CAST(2 * GROUPING(o_orderstatus)
        |     + GROUPING(o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,
    "q_interpolate" ->
      """WITH m AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us,
        |    CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v,
        |    CASE WHEN event_type = 'click' THEN NULL
        |         ELSE epoch_us(ts) END AS vt
        |  FROM events),
        |f AS (
        |  SELECT *,
        |    last_value(v IGNORE NULLS) OVER wp AS pv,
        |    last_value(vt IGNORE NULLS) OVER wp AS pt,
        |    first_value(v IGNORE NULLS) OVER wn AS nv,
        |    first_value(vt IGNORE NULLS) OVER wn AS nt
        |  FROM m
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY t_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |  wn AS (PARTITION BY user_id ORDER BY t_us, event_id
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, t_us,
        |  round(CASE WHEN pv IS NULL THEN nv
        |             WHEN nv IS NULL THEN pv
        |             ELSE pv + (nv - pv) * (CAST(t_us - pt AS DOUBLE)
        |               / CAST(nt - pt AS DOUBLE)) END, 6) AS interp_value
        |FROM f WHERE event_type = 'click' ORDER BY event_id""".stripMargin,
    "q_profile" -> {
      val aggSel = ProfileCols.map { case (c, num) =>
        val mn = if (num) s"CAST(min($c) AS DOUBLE)"
                 else s"CAST(min(length($c)) AS DOUBLE)"
        val mx = if (num) s"CAST(max($c) AS DOUBLE)"
                 else s"CAST(max(length($c)) AS DOUBLE)"
        s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$c, " +
          s"count(DISTINCT $c) AS nd_$c, $mn AS mn_$c, $mx AS mx_$c"
      }.mkString(",\n  ")
      val branches = ProfileCols.map { case (c, _) =>
        s"""SELECT '$c' AS "column", n, nn_$c AS n_null, nd_$c AS n_distinct,
           |  mn_$c AS min_d, mx_$c AS max_d FROM a""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH a AS (SELECT count(*) AS n,\n  $aggSel\nFROM orders)\n$branches\nORDER BY \"column\""
    },
    "q_quantile_sketch" -> qsOracleSql(geomWhere = "", histWhere = ""),
    // Bounds from the HISTORICAL generation (the store's pinned grid),
    // single-pass histogram of the WHOLE corpus under that grid — the
    // store+delta merge must reproduce it bucket-by-bucket.
    "q_qsketch_incremental" -> qsOracleSql(
      geomWhere = "WHERE o_orderkey % 4 <> 3", histWhere = ""),
    // Bounds from the FULL corpus (the grid the store froze at
    // creation), survivor-only recount under it — the subtraction must
    // reproduce it bucket-by-bucket.
    "q_qsketch_erase" -> qsOracleSql(
      geomWhere = "",
      histWhere = s"WHERE o_orderkey % ${Ingest.ErasureMod} <> 0"),
    "q_resample" ->
      """WITH c AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT min(h) AS h0, max(h) AS h1 FROM c),
        |types AS (SELECT DISTINCT event_type FROM c),
        |grid AS (SELECT event_type, unnest(range(h0, h1 + 1)) AS h
        |         FROM types, span)
        |SELECT g.event_type, g.h * 3600000000 AS win_start_us,
        |  coalesce(c.n, 0) AS n
        |FROM grid g LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h
        |ORDER BY 1, 2""".stripMargin,
    "q_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |  coalesce(lag(o_totalprice, 1) OVER w, -1.0) AS prev_price,
        |  coalesce(lead(o_totalprice, 1) OVER w, -1.0) AS next_price,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_min_max_by" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_lo,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_hi
        |  FROM orders)
        |SELECT o_custkey,
        | max(CASE WHEN rn_lo = 1 THEN o_orderkey END) AS cheapest_order,
        | max(CASE WHEN rn_lo = 1 THEN o_totalprice END) AS cheapest_price,
        | max(CASE WHEN rn_hi = 1 THEN o_orderkey END) AS priciest_order,
        | max(CASE WHEN rn_hi = 1 THEN o_totalprice END) AS priciest_price,
        | count(*) AS n
        |FROM r GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_union_all" ->
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin,
    "q_string_agg" ->
      """SELECT n_name, count(*) AS n_suppliers,
        |  string_agg(s_name, ',' ORDER BY s_name) AS roster
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_locf" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us,
        |  coalesce(last_value(
        |      CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0)
        |    AS last_purchase_value
        |FROM events ORDER BY user_id, us, event_id""".stripMargin,
    // Deterministic HLL: the oracle recomputes the registers (j = top 8
    // h32 bits, rho = 25 - bitlength of the 24-bit tail) and the
    // bias-corrected estimate from graft.plans.HllDet's shared constants.
    "q_approx_distinct" -> {
      import graft.plans.HllDet
      s"""WITH words AS (
         |  SELECT DISTINCT lang, ${TextPipeline.duckH32("word")} AS h
         |  FROM (SELECT lang, unnest($duckToksE) AS word FROM documents)
         |  WHERE word <> ''),
         |regs AS (
         |  SELECT lang, ${HllDet.duckJ("h")} AS j,
         |    max(${HllDet.duckRho("h")}) AS r
         |  FROM words GROUP BY 1, 2),
         |st AS (
         |  SELECT lang, ${HllDet.duckZV}
         |  FROM regs GROUP BY lang),
         |ex AS (
         |  SELECT lang, count(DISTINCT word) AS exact_words
         |  FROM (SELECT lang, unnest($duckToksE) AS word FROM documents)
         |  WHERE word <> '' GROUP BY lang)
         |SELECT lang, ${HllDet.duckEstimateFromZV("approx_words")},
         |  exact_words
         |FROM st JOIN ex USING (lang) ORDER BY lang""".stripMargin
    },
    "q_kmv_distinct" ->
      s"""WITH hashes AS (
         |  SELECT DISTINCT lang,
         |    ${TextPipeline.duckH32("word")} AS h
         |  FROM (SELECT lang, unnest($duckToksE) AS word FROM documents)
         |  WHERE word <> ''),
         |ranked AS (SELECT lang, h,
         |  row_number() OVER (PARTITION BY lang ORDER BY h) AS rnk FROM hashes)
         |SELECT lang,
         |  round(CASE WHEN count(*) < 16 THEN CAST(count(*) AS DOUBLE)
         |             ELSE 15.0 * 4294967296.0 / max(h) END, 4) AS kmv_estimate
         |FROM ranked WHERE rnk <= 16 GROUP BY lang ORDER BY lang""".stripMargin,
    "q_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(20,4))) AS sq,
        |    sum(CAST(l_quantity AS DECIMAL(20,4)) * CAST(l_quantity AS DECIMAL(20,4))) AS sqq,
        |    sum(CAST(l_extendedprice AS DECIMAL(24,4))) AS sp,
        |    sum(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(24,4))) AS spp,
        |    sum(CAST(l_quantity AS DECIMAL(20,4)) * CAST(l_extendedprice AS DECIMAL(24,4))) AS sqp
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | round(CAST(sq AS DOUBLE) / n, 6) AS mean_qty,
        | round((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n) / (n - 1), 6) AS var_qty,
        | round((CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE) / n) /
        |   (sqrt(CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n) *
        |    sqrt(CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / n)), 6) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_window_range" ->
      """SELECT o_orderkey, o_custkey, n_last_30d FROM (
        |  SELECT o_orderkey, o_custkey,
        |    count(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |      RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_last_30d
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_date_fns" ->
      """SELECT o_orderkey,
        | CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        | CAST(dayofyear(o_orderdate) AS INT) AS doy,
        | CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        | CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_95,
        | strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month,
        | strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin,
    "q_array_fns" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, embedding
        |  FROM embeddings WHERE vec_id % 10 = 0)
        |SELECT vec_id,
        | CAST(len(embedding) AS INT) AS n_dims,
        | round(list_max(v), 6) AS max_val,
        | round(v[1], 6) AS first_val,
        | CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_pos,
        | len(list_filter(v, x -> x > 2.0)) > 0 AS has_gt2,
        | array_to_string(list_sort(list_transform(v, x -> round(x, 4)), 'DESC')[1:3], ',') AS top3_csv
        |FROM e ORDER BY vec_id""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority AS priority,
        | sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
        | sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_o,
        | sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_p
        |FROM orders GROUP BY priority ORDER BY priority""".stripMargin,
    "q_sample_hash" ->
      s"""SELECT o_orderkey, o_totalprice FROM orders
        |WHERE ${TextPipeline.duckH32("CAST(o_orderkey AS VARCHAR)")} % 20 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "q_range_join" ->
      """SELECT p.event_id,
        | CAST(count(c.c_us) AS BIGINT) AS n_nearby_clicks
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events
        |      WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id, epoch_us(ts) AS c_us FROM events
        |           WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        |  AND abs(c.c_us - p.t_us) <= 3600000000
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    // Same string-derived leading digit and grid-integer Benford
    // expectation (qlog(d+1) − qlog(d)) · 1e6 // qlog(10).
    "q_benford" ->
      """WITH d AS (
        |  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |g AS (SELECT digit, count(*) AS n FROM d WHERE digit >= 1
        |      GROUP BY digit),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
        |SELECT digit, n,
        |  n * 1000000 // total AS obs_ppm,
        |  (CAST(round(log2(CAST(digit + 1 AS DOUBLE)) * 1000000.0) AS BIGINT)
        |   - CAST(round(log2(CAST(digit AS DOUBLE)) * 1000000.0) AS BIGINT))
        |    * 1000000 // 3321928 AS exp_ppm,
        |  n * 1000000 // total
        |    - (CAST(round(log2(CAST(digit + 1 AS DOUBLE)) * 1000000.0)
        |         AS BIGINT)
        |       - CAST(round(log2(CAST(digit AS DOUBLE)) * 1000000.0)
        |           AS BIGINT)) * 1000000 // 3321928 AS dev_ppm
        |FROM g, t ORDER BY digit""".stripMargin,
    // Same integer rollup, min-over-argmax hot key, DIV ratios.
    "q_skew_advisor" ->
      """WITH c AS (SELECT o_custkey AS key, count(*) AS n
        |           FROM orders GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |         CAST(sum(n) AS BIGINT) AS n_rows,
        |         CAST(max(n) AS BIGINT) AS max_rows FROM c),
        |hot AS (SELECT min(key) AS hot_key FROM c, st WHERE n = max_rows)
        |SELECT n_rows, n_keys, n_rows // n_keys AS mean_rows,
        |  max_rows, hot_key,
        |  max_rows * 100 * n_keys // n_rows AS skew_x100,
        |  (max_rows * n_keys + n_rows - 1) // n_rows AS salt
        |FROM st, hot""".stripMargin,
    // Same exact interpolating percentile chain and rational 4.4478
    // threshold; plain double ops → identical flag boundary.
    "q_robust_outliers" ->
      """WITH o AS (SELECT o_orderpriority AS priority, o_totalprice AS x
        |           FROM orders),
        |med AS (SELECT priority, quantile_cont(x, 0.5) AS med
        |        FROM o GROUP BY 1),
        |madt AS (SELECT o.priority,
        |          quantile_cont(abs(o.x - med.med), 0.5) AS mad
        |        FROM o JOIN med USING (priority) GROUP BY o.priority)
        |SELECT o.priority, count(*) AS n,
        |  round(max(med.med), 4) AS median,
        |  round(max(madt.mad), 4) AS mad,
        |  CAST(sum(CASE WHEN abs(o.x - med.med) > madt.mad * 4.4478
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM o JOIN med USING (priority) JOIN madt USING (priority)
        |GROUP BY o.priority ORDER BY o.priority""".stripMargin,
    "q_median_price" ->
      """SELECT o_orderstatus AS status,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
        | count(*) AS n
        |FROM orders GROUP BY status ORDER BY status""".stripMargin,
    "q_winsorize" ->
      """WITH b AS (
        |  SELECT o_orderpriority AS priority,
        |    quantile_cont(o_totalprice, 0.05) AS lo,
        |    quantile_cont(o_totalprice, 0.95) AS hi
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT o.o_orderpriority AS priority,
        |    least(greatest(o.o_totalprice, b.lo), b.hi) AS wx,
        |    o.o_totalprice < b.lo AS lo_clip,
        |    o.o_totalprice > b.hi AS hi_clip
        |  FROM orders o JOIN b ON o.o_orderpriority = b.priority)
        |SELECT priority, count(*) AS n,
        |  CAST(count(*) FILTER (WHERE lo_clip) AS BIGINT) AS n_lo,
        |  CAST(count(*) FILTER (WHERE hi_clip) AS BIGINT) AS n_hi,
        |  round(CAST(CAST(sum(CAST(round(wx * 100) AS BIGINT)) AS BIGINT)
        |      AS DOUBLE) / 100.0 / count(*), 4) AS wmean
        |FROM j GROUP BY priority ORDER BY priority""".stripMargin,
    "q_wordcount_salted" -> WordCount.oracle("wordcount"),
  )
}
