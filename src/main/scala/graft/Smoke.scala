package graft
import org.apache.spark.sql.SparkSession

/** Mirrors the driver's smoke check: SparkEntry.entry(spark) must return >0
  * rows on sf0.001. Run: tools/run.sh graft.Smoke
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "graft-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=$n")
    assert(n > 0, "driver smoke would FAIL: entry returned 0 rows")
    spark.stop()
  }
}
