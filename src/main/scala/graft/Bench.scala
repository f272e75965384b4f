package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR.
  *
  * Output contract: the LAST stdout line is one compact JSON summary
  * (<1.5 KB — the invoking harness keeps only a 2000-char stdout tail, so
  * the summary must fit inside it together with sbt's trailing status
  * line): total/failed/iters, the slowest ~18 query medians under
  * `"queries"`, and `"detail"` pointing at BENCH_DETAIL.json, which holds
  * the complete per-query medians, mins, raw runs, errors, and the
  * partitioned-variant pass (also echoed to stdout one line earlier for
  * full-log consumers).
  *
  * Each query executes through the `noop` sink — unlike `count()`, this
  * runs the COMPLETE physical plan (Catalyst legally elides final sorts
  * and projects under a count, which would under-report), with zero sink
  * I/O cost. An untimed warm-up pass over one query per broad plan class
  * absorbs session/JIT setup, and queries execute in a deterministic
  * murmur3(name) order (not alphabetical) so residual warm-up cost can't
  * correlate with query names round over round — see SURVEY §8.11 for
  * the three-run adjudication that motivated both.
  *
  * Methodology: 3 timed iterations per query, MEDIAN reported (JIT and
  * scheduler noise would otherwise land directly in round-over-round
  * regression tracking); while the raw spread exceeds 2× (same-process GC /
  * adjacent-heavy-query pollution) the query gets a GC settle plus 2 extra
  * iterations, repeated up to a 9-iteration cap, so one polluted run can't
  * dominate the median. Per-query `"min"` ships beside the median — a
  * stable min with a high median is bench noise, not a plan regression.
  * All raw iteration times ship in `"runs"` so the variance is
  * inspectable. A query whose PRIMARY iterations throw reports -1, lands
  * in `"errors"`, and bumps `"failed"` — `total` covers succeeded queries
  * only, so regression comparison must gate on `failed == 0` first (a
  * broken query must never look fast). A failure during a spread-triggered
  * EXTRA iteration does not bump `failed` (the primary runs were clean);
  * it is reported separately in `"retry_errors"`.
  *
  * A second one-iteration pass runs the suite against the multi-file +
  * lang-partitioned fixture mirror (graft.io.PartitionedFixture) and ships
  * as `"partitioned"` — evidence that split planning and partition pruning
  * hold under bench conditions, not just in specs. Entries re-timed by the
  * >3x-median GC-settle retry report the min of two runs; their both
  * readings ship under `"retried"` so consumers can tell best-of-two from
  * single-shot numbers.
  *
  * Both summary lines carry a `"load"` contention stamp (loadavg
  * before/after, process cpu-vs-wall ratio): round 7 shipped a bench
  * captured on a busy machine and the artifact had no way to show it.
  * A run with elevated loadavg and a depressed cpu/wall ratio is
  * self-identifying as contaminated — rerun it; don't diff it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // f-interpolators format through the default locale; a comma-decimal
    // locale would make the JSON summary unparseable
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt, "graft-bench")
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    // Warm-up: session/codegen/scan/shuffle setup paid once, not by the
    // first queries. One query per broad plan class (scan+agg+sort,
    // window+join, HOF-array/hash, stateful exchange-heavy) — the
    // round-10 three-run adjudication showed the suite's FIRST queries
    // absorbing JVM/JIT warm-up regardless of which they were, so the
    // warm-up must touch each execution framework, not just one plan.
    Seq("wordcount", "q_topk_orders", "q_dedup_minhash", "q_sessionize")
      .foreach { w => SparkEntry.queries.get(w)
        .foreach(fn => try run(fn, sfDir) catch { case _: Throwable => () }) }
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    def jstr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                 dir: String = sfDir) = {
      val t0 = System.nanoTime()
      try { run(fn, dir); Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
    }
    val maxIters = 9
    // Contention stamp: BENCH_r07 was captured on a busy machine and its
    // numbers were garbage (6 phantom "regressions", all vanishing when
    // re-measured standalone). Record system load before/after plus this
    // process's cpu-vs-wall ratio so a polluted run is self-identifying
    // from the artifact alone: high loadavg with a LOW cpu/wall ratio
    // means someone else had the cores.
    def loadAvg: Double =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.split(" ")(0).toDouble finally src.close()
      } catch { case _: Throwable => -1.0 }
    def procCpuSec: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          os.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    val loadStart = loadAvg
    val cpuStart = procCpuSec
    val wallStart = System.nanoTime()
    // optional comma-separated query filter for local iteration (unset for
    // the driver's full run)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // Execution order: deterministic but NOT alphabetical. Alphabetical
    // order made residual warm-up cost land on the same early-alphabet
    // queries every run, so min-rule flags correlated with suite position
    // (SURVEY §8.11). Ordering by murmur3(name) keeps runs byte-identical
    // across invocations (flag sets stay comparable run-to-run) while
    // decorrelating position from name; (hash, name) breaks hash ties.
    val benchOrder: ((String, Any)) => (Int, String) = { case (name, _) =>
      (scala.util.hashing.MurmurHash3.stringHash(name, 0x5bd1e995), name) }
    val results = SparkEntry.queries.toSeq.sortBy(benchOrder)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val primary = (1 to iters).map(_ => timeOnce(fn))
      var extras = Vector.empty[Either[String, Double]]
      def ts = (primary ++ extras).collect { case Right(t) => t }
      def spreadOver2x = { val t = ts; t.size > 1 && t.max > 2 * t.min }
      // high-spread tail: settle the heap, then add 2 iterations; repeat
      // until the spread is ≤2× or the iteration cap is hit, so one
      // GC-polluted run can't dominate the median
      while (iters > 1 && spreadOver2x && primary.forall(_.isRight) &&
             primary.size + extras.size < maxIters) {
        System.gc(); Thread.sleep(200)
        val room = maxIters - primary.size - extras.size
        extras ++= (1 to math.min(2, room)).map(_ => timeOnce(fn))
      }
      val times = ts.sorted
      val median =
        if (times.isEmpty) -1.0
        else if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2
      val minT = if (times.isEmpty) -1.0 else times.head
      val err = primary.collectFirst { case Left(m) => m }
      val retryErr = extras.collectFirst { case Left(m) => m }
      (name, median, minT, times, err, retryErr)
    }
    val qs = results.map { case (k, m, _, _, _, _) => jstr(k) + ":" + m }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, _, mn, _, _, _) => jstr(k) + ":" + mn }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, _, _, ts, _, _) =>
      jstr(k) + ":" + ts.mkString("[", ",", "]") }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, _, Some(m), _) =>
      jstr(k) + ":" + jstr(m) }.mkString("{", ",", "}")
    val retryErrs = results.collect { case (k, _, _, _, None, Some(m)) =>
      jstr(k) + ":" + jstr(m) }.mkString("{", ",", "}")
    val failed = results.count { case (_, _, _, _, e, _) => e.isDefined }
    val total = results.map { case (_, m, _, _, _, _) => math.max(m, 0.0) }.sum
    // Variant pass: the whole suite once against the multi-file /
    // lang-partitioned mirror of the same sf dir (split planning +
    // partition pruning under bench conditions). One timed iteration per
    // query — this tracks layout sensitivity, not medians; its failures
    // are reported inside "partitioned" and do NOT bump the primary
    // "failed" gate. Disable with SPARK_GRAFT_BENCH_PARTITIONED=0.
    // (fragment, total, failed) for the partitioned-variant pass
    val (partitioned, pSummary) =
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_PARTITIONED", "1") == "0")
        ("", "")
      else try {
        val pdir = graft.io.PartitionedFixture.prepare(spark, sfDir)
        try run(SparkEntry.queries("wordcount"), pdir) catch { case _: Throwable => () }
        val medians = results.map { case (k, m, _, _, _, _) => k -> m }.toMap
        val pres = SparkEntry.queries.toSeq.sortBy(benchOrder)
          .filter { case (name, _) => only.isEmpty || only(name) }
          .map { case (name, fn) =>
            val first = timeOnce(fn, pdir)
            // single-iteration pass, so one heap polluted by the previous
            // query lands straight in the number (round-6 evidence: the
            // 4 queries alphabetically after a 14 s mirror query read
            // 4-16x their primary median; all re-measured normal in
            // isolation). If the reading exceeds 3x the query's primary
            // median, settle the heap and re-time once, reporting the
            // min -- a REAL layout regression reproduces on the retry.
            // (name, best, Some((first, retry)) when the retry fired) —
            // best-of-two and single-shot entries are different
            // methodologies, so the fragment must say which is which
            val (best, retryRuns) = first match {
              case Right(t) if medians.get(name).exists(m => m > 0 && t > 3 * m) =>
                System.gc(); Thread.sleep(200)
                timeOnce(fn, pdir) match {
                  case Right(t2) => (Right(math.min(t, t2)), Some((t, t2)))
                  case Left(_)   => (first, None)
                }
              case other => (other, None)
            }
            (name, best, retryRuns)
          }
        val pqs = pres.map { case (k, r, _) =>
          jstr(k) + ":" + r.fold(_ => -1.0, identity) }.mkString("{", ",", "}")
        val pErrs = pres.collect { case (k, Left(m), _) => jstr(k) + ":" + jstr(m) }
          .mkString("{", ",", "}")
        // both readings for every >3x-median entry that was re-timed, so
        // bench_diff consumers can separate best-of-two from single-shot
        val pRetried = pres.collect { case (k, _, Some((t1, t2))) =>
          jstr(k) + ":" + s"[$t1,$t2]" }.mkString("{", ",", "}")
        val pFailed = pres.count(_._2.isLeft)
        val pTotal = pres.collect { case (_, Right(t), _) => t }.sum
        (s""","partitioned":{"dir":${jstr(pdir)},"total":$pTotal,"failed":$pFailed,"queries":$pqs,"errors":$pErrs,"retried":$pRetried}""",
         f""","p_total":$pTotal%.2f,"p_failed":$pFailed""")
      } catch { case e: Throwable =>
        (s""","partitioned":{"prep_error":${jstr(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")}}""",
         ""","p_failed":-1""")
      }
    val wallSec = (System.nanoTime() - wallStart) / 1e9
    val cpuSec = procCpuSec - cpuStart
    // cpu/wall on an otherwise-idle local[32] heavy suite runs well above
    // 1; a contended run shows elevated loadavg AND a depressed ratio
    val loadStamp =
      f""""load":{"loadavg_start":$loadStart%.2f,"loadavg_end":$loadAvg%.2f,"proc_cpu_sec":$cpuSec%.1f,"wall_sec":$wallSec%.1f,"cpu_wall_ratio":${if (wallSec > 0) cpuSec / wallSec else -1.0}%.2f}"""
    val full = s"""{"metric":"total","value":$total,"unit":"sec","iters":$iters,"failed":$failed,"queries":$qs,"min":$mins,"runs":$raw,"errors":$errs,"retry_errors":$retryErrs$partitioned,$loadStamp,"sf":"$sfDir"}"""
    // Full per-query detail is large (tens of KB): persist it to a file and
    // echo it early. The harness that invokes Bench keeps only a short tail
    // of stdout, so the LAST line printed is a compact summary (<1.5 KB):
    // suite total, failure gate, and the slowest-query medians. Everything
    // else lives in the detail file.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      "/root/repo/BENCH_DETAIL.json")
    // advertise the path only if the write succeeded — a stale previous
    // round's file must not masquerade as this run's detail
    val detailJson =
      try {
        val w = new java.io.PrintWriter(detailPath, "UTF-8")
        try w.println(full) finally w.close()
        jstr(detailPath)
      } catch { case _: Throwable => "null" }
    println(full)
    val ok = results.filter { case (_, _, _, _, e, _) => e.isEmpty }
    val headline = (ok.sortBy { case (_, m, _, _, _, _) => -m }.take(18)
      .map(_._1).toSet + "wordcount")
    val cqs = results
      .filter { case (name, _, _, _, e, _) => headline(name) || e.isDefined }
      .map { case (k, m, _, _, _, _) => jstr(k) + ":" + f"$m%.3f" }
      .mkString("{", ",", "}")
    val errNames = results.collect { case (k, _, _, _, Some(_), _) => jstr(k) }
      .mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.2f,"unit":"sec","iters":$iters,"failed":$failed,"n_queries":${results.size},"detail":$detailJson,"queries":$cqs,"error_queries":$errNames$pSummary,$loadStamp,"sf":"$sfDir"}""")
    spark.stop()
  }
}
