package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Writes `df.explain("formatted")` for the named queries to
  * `<outDir>/<query><suffix>.txt` — the before/after plan evidence the
  * optimization rounds commit under `plans/rNN/`.
  *
  * Run: `tools/run.sh graft.tools.PlanDump <outDir> <suffix> [sfDir] <query...>`
  *
  * Uses the bench session geometry (GraftSession.local with
  * SPARK_GRAFT_CPUS, AQE on) so the dumped static plan is the one the
  * bench actually starts from; AQE re-planning evidence stays with
  * `tools.AqePlan`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt, "graft-plandump")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"$outDir/$name$suffix.txt", "UTF-8")
      try w.println(txt) finally w.close()
      println(s"[plandump] wrote $outDir/$name$suffix.txt")
    }
    spark.stop()
  }
}
