package graft.tools

import org.apache.spark.sql.SparkSession

/** Recall@10 of the approximate ANN rungs vs the exact brute-force
  * baseline at an arbitrary scale factor — the round-9 follow-through on
  * "record the q_ann_pq recall at sf1" (the 0.94 in DedupSimilaritySpec
  * was measured at sf0.001). Runs `q_ann_bruteforce` once as ground
  * truth, then each approximate rung, and prints ONE JSON line with mean
  * recall@10 and the per-query minimum.
  *
  * Run: `tools/run.sh graft.tools.AnnRecall [sfDir]` (default the
  * GenScale sf1 output at /tmp/graft-sf1).
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt, "graft-annrecall")

    def top10(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).to(Map)

    val bf = top10(graft.queries.Similarity.qAnnBruteforce(spark, sfDir))
    val rungs = Seq(
      "pq" -> graft.queries.Similarity.qAnnPq _,
      "ivfpq" -> graft.queries.Similarity.qAnnIvfPq _,
      "ivf" -> graft.queries.Similarity.qAnnIvf _,
      "lsh" -> graft.queries.Similarity.qAnnLsh _)
    val stats = rungs.map { case (name, fn) =>
      val got = top10(fn(spark, sfDir))
      val recalls = bf.keys.toSeq.sorted
        .map(q => (bf(q) & got.getOrElse(q, Set.empty)).size / 10.0)
      (name, recalls.sum / recalls.size, recalls.min)
    }
    val body = stats.map { case (n, mean, mn) =>
      f""""$n":{"mean_recall10":$mean%.3f,"min_recall10":$mn%.2f}"""
    }.mkString(",")
    println(s"""{"sf_dir":"$sfDir","n_queries":${bf.size},$body}""")
    spark.stop()
  }
}
