package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, one JSON line out.
  *
  * Each query executes through the `noop` sink — unlike `count()`, this
  * runs the COMPLETE physical plan (Catalyst legally elides final sorts
  * and projects under a count, which would under-report), with zero sink
  * I/O cost. One warm-up pass of the flagship query absorbs first-job
  * session setup so per-query numbers measure the plans, not the JVM.
  *
  * Methodology: 3 timed iterations per query, MEDIAN reported (JIT and
  * scheduler noise would otherwise land directly in round-over-round
  * regression tracking); when the raw spread exceeds 2× (same-process GC /
  * adjacent-heavy-query pollution) the query gets 2 extra iterations and a
  * GC settle, so the median stops overstating the slow tail. All raw
  * iteration times ship in `"runs"` so the variance is inspectable. A query
  * that throws reports -1, lands in `"errors"`, and bumps `"failed"` —
  * `total` covers succeeded queries only, so regression comparison must
  * gate on `failed == 0` first (a broken query must never look fast).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config(graft.io.Tables.EventsNanosConf._1, graft.io.Tables.EventsNanosConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark) // SQL names for the native kernels
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // warm-up: session/codegen/scan setup paid once, not by the first query
    try run(SparkEntry.queries("wordcount")) catch { case _: Throwable => () }
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    def jstr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame) = {
      val t0 = System.nanoTime()
      try { run(fn); Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var runs = (1 to iters).map(_ => timeOnce(fn))
      def spreadOver2x = {
        val ts = runs.collect { case Right(t) => t }
        ts.size > 1 && ts.max > 2 * ts.min
      }
      // high-spread tail: settle the heap, then add 2 iterations so one
      // GC-polluted run can't dominate the median
      if (iters > 1 && spreadOver2x && runs.forall(_.isRight)) {
        System.gc(); Thread.sleep(200)
        runs ++= (1 to 2).map(_ => timeOnce(fn))
      }
      val times = runs.collect { case Right(t) => t }.sorted
      val median = if (times.isEmpty) -1.0 else times(times.size / 2)
      val err = runs.collectFirst { case Left(m) => m }
      (name, median, times, err)
    }
    val qs = results.map { case (k, m, _, _) => jstr(k) + ":" + m }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, _, ts, _) =>
      jstr(k) + ":" + ts.mkString("[", ",", "]") }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(m)) => jstr(k) + ":" + jstr(m) }
      .mkString("{", ",", "}")
    val failed = results.count { case (_, _, _, e) => e.isDefined }
    val total = results.map { case (_, m, _, _) => math.max(m, 0.0) }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","iters":$iters,"failed":$failed,"queries":$qs,"runs":$raw,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
