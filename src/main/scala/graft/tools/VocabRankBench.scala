package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the round-11 q_vocab_coverage respelling — bounded
  * TakeOrdered top-16 vs the old unpartitioned rank window over the full
  * vocabulary (the round-10 verdict's watch item). Two axes:
  *
  *  - corpus decade (sf0.1 → GenScale sf1, saturated vocab): both
  *    spellings should be near-flat — vocabulary cardinality barely grows;
  *  - the 10×-VOCABULARY control (GenScale's `-openvocab` corpus): the
  *    axis the window spelling is actually sensitive to, since its one
  *    non-scaling stage is the single-partition sort of V rows.
  *
  * At fixture scales V fits one partition either way, so the point of the
  * measurement is (a) both spellings stay in the same time class after
  * the rewrite (no local regression) and (b) the physical-plan shape —
  * TakeOrderedAndProject vs Window over a single-partition Sort — is
  * printed alongside, which is what changes the 100 TB story.
  *
  * Run: `tools/run.sh graft.tools.VocabRankBench [dir ...]`
  * (defaults: /root/testdata/sf0.1, /tmp/graft-sf1,
  * /tmp/graft-sf1-openvocab). Prints ONE JSON line.
  */
object VocabRankBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft-sf1",
        "/tmp/graft-sf1-openvocab")
    val spark = graft.GraftSession.local(32, "vocab-rank-bench")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med3(f: => Unit): Double = {
      val ts = (1 to 3).map(_ => time(f)).sorted; ts(1)
    }
    def run(d: String, windowed: Boolean): Unit = {
      val df = if (windowed)
        graft.queries.TextAnalysis.qVocabCoverageWindow(spark, d)
      else graft.queries.TextAnalysis.qVocabCoverage(spark, d)
      df.write.format("noop").mode("overwrite").save()
    }
    // warm-up both plans once on the first dir
    try { run(dirs.head, windowed = false); run(dirs.head, windowed = true) }
    catch { case _: Throwable => () }
    val rows = dirs.map { d =>
      val bounded = med3(run(d, windowed = false))
      val window = med3(run(d, windowed = true))
      val same = graft.queries.TextAnalysis.qVocabCoverage(spark, d)
        .collect().map(_.toString).toSeq ==
        graft.queries.TextAnalysis.qVocabCoverageWindow(spark, d)
          .collect().map(_.toString).toSeq
      f""""$d":{"bounded_sec":$bounded%.3f,"window_sec":$window%.3f,"equal":$same}"""
    }
    val shape = graft.queries.TextAnalysis.qVocabCoverage(spark, dirs.head)
      .queryExecution.executedPlan.toString.contains("TakeOrderedAndProject")
    println(s"""{"metric":"vocab_rank_bench","takeordered_in_plan":$shape,${rows.mkString(",")}}""")
    spark.stop()
  }
}
