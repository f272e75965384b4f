package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.io.Tables.EventsNanosConf._1, graft.io.Tables.EventsNanosConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm-up
    queries.WordCount.wordcount(spark, sfDir).write.format("noop").mode("overwrite").save()
    time("q_ngram_jaccard") {
      queries.Dedup.queries("q_ngram_jaccard")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    // stage pieces
    import org.apache.spark.sql.functions._
    import graft.core.TextPipeline
    val toks = {
      val raw = TextPipeline.tokens(col("text"))
      filter(transform(raw, t => TextPipeline.normalize(t)), x => x =!= "")
    }
    def shinglesOf(w: org.apache.spark.sql.Column) = {
      val tri = zip_with(
        zip_with(w, slice(w, lit(2), greatest(size(w) - 1, lit(0))),
          (x, y) => concat(x, lit(" "), y)),
        slice(w, lit(3), greatest(size(w) - 2, lit(0))),
        (xy, z) => concat(xy, lit(" "), z))
      array_distinct(filter(tri, t => t.isNotNull))
    }
    val docs = graft.io.Tables.documents(spark, sfDir)
    time("tokens only") {
      docs.select(col("doc_id"), col("lang"), toks.as("w"))
        .write.format("noop").mode("overwrite").save()
    }
    time("tokens+filter+shingles") {
      docs.select(col("doc_id"), col("lang"), toks.as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), col("lang"), shinglesOf(col("w")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    time("postings explode") {
      docs.select(col("doc_id"), col("lang"), toks.as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), col("lang"), shinglesOf(col("w")).as("s"))
        .select(col("lang"), col("doc_id"), explode(col("s")).as("shingle"))
        .write.format("noop").mode("overwrite").save()
    }
    val sh0 = docs.select(col("doc_id"), col("lang"), toks.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), col("lang"), shinglesOf(col("w")).as("s"))
    val post0 = sh0.select(col("lang"), col("doc_id"), explode(col("s")).as("shingle"))
    time("postings self-join + agg") {
      val a = post0.select(col("lang"), col("shingle"), col("doc_id").as("a_id"))
      val b = post0.select(col("lang"), col("shingle"), col("doc_id").as("b_id"))
      a.join(b, Seq("lang", "shingle")).filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
        .write.format("noop").mode("overwrite").save()
    }

    // ---- V2a: counting plan with ONE reused exchange, n carried ----
    def v2a() = {
      val post = sh0
        .select(col("lang"), col("doc_id"), size(col("s")).as("n"), explode(col("s")).as("shingle"))
        .repartition(col("lang"), col("shingle"))
      val a = post.select(col("lang"), col("shingle"), col("doc_id").as("a_id"), col("n").as("a_n"))
      val b = post.select(col("lang"), col("shingle"), col("doc_id").as("b_id"), col("n").as("b_n"))
      a.join(b, Seq("lang", "shingle")).filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
        .agg(count(lit(1)).as("inter"))
        .select(col("a_id"), col("b_id"),
          (col("inter").cast("double") / (col("a_n") + col("b_n") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.2)
        .orderBy("a_id", "b_id")
    }
    time("V2a count+reused-exchange") { v2a().write.format("noop").mode("overwrite").save() }
    time("V2a again") { v2a().write.format("noop").mode("overwrite").save() }

    // ---- V2b: prefix filter candidates + sorted-array merge verify ----
    def v2b() = {
      import org.apache.spark.sql.expressions.Window
      val post = sh0
        .select(col("lang"), col("doc_id"), size(col("s")).as("n"), explode(col("s")).as("shingle"))
        .repartition(col("lang"), col("shingle"))
      val freq = post.groupBy(col("lang"), col("shingle")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
      val pref = post.join(freq, Seq("lang", "shingle"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("n") - ceil(col("n") * 0.2) + 1)
      val ca = pref.select(col("lang"), col("shingle"), col("doc_id").as("a_id"), col("n").as("a_n"))
      val cb = pref.select(col("lang"), col("shingle"), col("doc_id").as("b_id"), col("n").as("b_n"))
      val cand = ca.join(cb, Seq("lang", "shingle"))
        .filter(col("a_id") < col("b_id") &&
          least(col("a_n"), col("b_n")) >= ceil(greatest(col("a_n"), col("b_n")) * 0.2))
        .select(col("a_id"), col("b_id"), col("a_n"), col("b_n")).distinct()
      val ss = sh0.select(col("doc_id"), array_sort(col("s")).as("ss"))
      cand
        .join(ss.select(col("doc_id").as("a_id"), col("ss").as("a_ss")), "a_id")
        .join(ss.select(col("doc_id").as("b_id"), col("ss").as("b_ss")), "b_id")
        .select(col("a_id"), col("b_id"),
          graft.functions.VectorFunctions.sortedIntersectCount(col("a_ss"), col("b_ss"))
            .cast("long").as("inter"), col("a_n"), col("b_n"))
        .select(col("a_id"), col("b_id"),
          (col("inter").cast("double") / (col("a_n") + col("b_n") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.2)
        .orderBy("a_id", "b_id")
    }
    time("V2b prefix+merge-verify") { v2b().write.format("noop").mode("overwrite").save() }
    time("V2b again") { v2b().write.format("noop").mode("overwrite").save() }
    // sanity: identical results
    val x = v2a().collect().map(_.toString).toSet
    val y = v2b().collect().map(_.toString).toSet
    println(s"MATCH ${x == y} sizes ${x.size} ${y.size}")
    spark.stop()
  }
}
