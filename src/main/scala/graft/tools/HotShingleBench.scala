package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Measured counterexample for the [[graft.queries.Dedup]] jaccard pair:
  * a corpus where the PREFIX-FILTER plan (`q_ngram_jaccard_prefix`) beats
  * the postings-count plan (`q_ngram_jaccard`), instead of the driver
  * fixture where df ≤ 14 keeps the postings plan ahead.
  *
  * The corpus is the hot-shingle shape the prefix plan exists for (C4-style
  * boilerplate): every document opens with the same 7-word header — 5
  * trigrams with df = nDocs — followed by a letters-only tail unique to the
  * document (df ≤ 2; every 10th document is a near-clone of its
  * predecessor, so the qualifying pairs are non-trivial). Postings-count
  * work is Σ_shingle df² ≈ 5·nDocs² rows through the self-join; the prefix
  * plan ranks shingles rarest-first, the 5 hot trigrams land at ranks
  * 26–30 of n = 30 and fall outside every ⌈n − 0.2n⌉ + 1 = 25-element
  * prefix, so candidates come only from the df ≤ 2 tail trigrams.
  *
  * Run: `tools/run.sh graft.tools.HotShingleBench` (env
  * GRAFT_HOTSHINGLE_DOCS, default 4000). Prints one JSON line with both
  * medians and an answer-equality verdict; DedupSimilaritySpec pins the
  * equality (and the hot-trigram prefix drop-out) on a smaller corpus.
  */
object HotShingleBench {

  /** Letters-only base-26 encoding (digits vanish in the §2.3 normalizer). */
  private def b26(i: Int): String = {
    var n = i; val sb = new StringBuilder
    do { sb.append(('a' + n % 26).toChar); n /= 26 } while (n > 0)
    sb.result()
  }

  private val Boilerplate = "the quick brown fox jumps over lazy"

  /** Deterministic hot-shingle corpus: (doc_id, text, lang, source,
    * n_chars) rows matching the documents table schema. Every 10th doc
    * clones the previous doc's tail with the last 2 words replaced
    * (jaccard ≈ 0.8 — a qualifying near-dup at threshold 0.2); all other
    * pairs share only the 5 boilerplate trigrams (jaccard 5/55 ≈ 0.09 —
    * below threshold). */
  def corpus(spark: SparkSession, nDocs: Int): DataFrame = {
    import spark.implicits._
    def tail(doc: Int): IndexedSeq[String] =
      (0 until 25).map(k => s"q${b26(doc)}z${b26(k)}")
    val rows = (0 until nDocs).map { i =>
      val t =
        if (i % 10 == 9) tail(i - 1).dropRight(2) ++ Seq(s"r${b26(i)}za", s"r${b26(i)}zb")
        else tail(i)
      val text = Boilerplate + " " + t.mkString(" ")
      (i.toLong, text, "en", "hotshingle", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Write the corpus as `<dir>/documents.parquet` (the Tables layout). */
  def write(spark: SparkSession, nDocs: Int, dir: String): String = {
    corpus(spark, nDocs).repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nDocs = sys.env.getOrElse("GRAFT_HOTSHINGLE_DOCS", "4000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt, "graft-hotshingle")
    val dir = write(spark, nDocs,
      s"/tmp/graft-hotshingle-$nDocs")
    def time(fn: (SparkSession, String) => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val ts = (1 to 3).map(_ => once()).sorted
      ts(1)
    }
    val postingsSec = time(graft.queries.Dedup.qNgramJaccard)
    val prefixSec = time(graft.queries.Dedup.qNgramJaccardPrefix)
    val a = graft.queries.Dedup.qNgramJaccard(spark, dir).collect()
    val b = graft.queries.Dedup.qNgramJaccardPrefix(spark, dir).collect()
    val equal = a.length == b.length &&
      a.zip(b).forall { case (x, y) => x == y }
    println(f"""{"n_docs":$nDocs,"postings_sec":$postingsSec%.2f,"prefix_sec":$prefixSec%.2f,"pairs":${a.length},"equal":$equal}""")
    spark.stop()
  }
}
