package graft.tools

import org.apache.spark.sql.functions._

/** Measures both branches of the [[graft.queries.Graph.triangleCounts]]
  * broadcast gate on the SAME above-gate edge list (the sf1 co-order
  * graph, ~12M edges ≈ 190 MB — over the original 8M-row gate but far
  * inside executor memory), so the gate's cost cliff is a number instead
  * of an extrapolation: the bare-join branch shuffle-writes the d²-sized
  * wedge stream; the hinted branch never materializes it.
  *
  * Run: `tools/run.sh graft.tools.TriangleGateBench` (env GRAFT_SCALE_OUT
  * for the fixture dir — generate with [[GenScale]] first).
  */
object TriangleGateBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = sys.env.getOrElse("GRAFT_SCALE_OUT", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt, "graft-trianglegate")

    def run(broadcastRows: Long): Double = {
      val li = graft.io.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = li.join(li.withColumnRenamed("p", "q"), "o")
        .filter(col("p") < col("q"))
        .select(col("p").as("a"), col("q").as("b"))
        .distinct()
      val t0 = System.nanoTime()
      graft.queries.Graph.triangleCounts(edges, broadcastRows)
        .orderBy(col("n_triangles").desc, col("part").asc).limit(20)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val bare = run(8000000L)     // original gate: 12M edges exceed it
    val hinted = run(100000000L) // gate lifted: static broadcast fires
    println(f"""{"dir":"$dir","bare_join_sec":$bare%.1f,"broadcast_sec":$hinted%.1f}""")
    spark.stop()
  }
}
