package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the bounded-TakeOrdered respellings of the two vocabulary-rank
  * consumers against their unpartitioned-rank-window baselines:
  *
  *  - `q_vocab_coverage` (round 11): top-16 types by frequency;
  *  - `q_tail_index` (round 12): Hill estimator over the top-(k+1)
  *    frequencies + an n_vocab count — the LAST V-cardinality
  *    single-partition sort in the repo before the respelling.
  *
  * Two axes per query:
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
    val pairs = Seq(
      ("vocab", (d: String) => graft.queries.TextAnalysis.qVocabCoverage(spark, d),
        (d: String) => graft.queries.TextAnalysis.qVocabCoverageWindow(spark, d)),
      ("tail", (d: String) => graft.queries.TextAnalysis.qTailIndex(spark, d),
        (d: String) => graft.queries.TextAnalysis.qTailIndexWindow(spark, d)))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm-up both plans of both pairs once on the first dir
    pairs.foreach { case (_, b, w) =>
      try { noop(b(dirs.head)); noop(w(dirs.head)) }
      catch { case _: Throwable => () }
    }
    val rows = for (d <- dirs; (name, b, w) <- pairs) yield {
      val bounded = med3(noop(b(d)))
      val window = med3(noop(w(d)))
      val same = b(d).collect().map(_.toString).toSeq ==
        w(d).collect().map(_.toString).toSeq
      f""""$name:$d":{"bounded_sec":$bounded%.3f,"window_sec":$window%.3f,"equal":$same}"""
    }
    val shapes = pairs.map { case (name, b, _) =>
      val s = b(dirs.head).queryExecution.executedPlan.toString
        .contains("TakeOrderedAndProject")
      s""""$name":$s"""
    }
    println(s"""{"metric":"vocab_rank_bench","takeordered_in_plan":{${shapes.mkString(",")}},${rows.mkString(",")}}""")
    spark.stop()
  }
}
