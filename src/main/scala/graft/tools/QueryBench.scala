package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone per-query timing under the house decade/drift protocol
  * (SURVEY §8.8/§8.15): ONE JVM, the Bench warm-up classes, then for
  * each named query 3 timed iterations through the noop sink; prints
  * one line per query `name sfDir median min runs...` plus a loadavg
  * stamp. Usage:
  *
  *   tools/run.sh graft.tools.QueryBench <sfDir> <query> [query...]
  *
  * This mechanizes the "standalone one-JVM-per-query, 3-iter, quiet
  * epoch" readings the round reports quote for decade scaling
  * (sf0.01 → sf0.1) and for bench-drift adjudication, so those numbers
  * come from a committed tool instead of ad-hoc scratch mains. */
object QueryBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt, "graft-querybench")
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    def loadAvg: Double =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.split(" ")(0).toDouble finally src.close()
      } catch { case _: Throwable => -1.0 }
    // the Bench warm-up quartet: one query per broad plan class
    Seq("wordcount", "q_topk_orders", "q_dedup_minhash", "q_sessionize")
      .foreach { w => graft.SparkEntry.queries.get(w)
        .foreach(fn => try run(fn) catch { case _: Throwable => () }) }
    println(f"[querybench] load_before=$loadAvg%.2f")
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"$name MISSING")
        case Some(fn) =>
          val runs = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            run(fn)
            (System.nanoTime() - t0) / 1e9
          }
          val med = runs.sorted.apply(1)
          println(f"$name $sfDir median=$med%.3f min=${runs.min}%.3f " +
            runs.map(r => f"$r%.3f").mkString("runs=[", ",", "]"))
      }
    }
    println(f"[querybench] load_after=$loadAvg%.2f")
    spark.stop()
  }
}
