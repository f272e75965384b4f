package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.hashing.MurmurHash3

/** Separates PER-DOC-LENGTH scaling from corpus scaling for the winnowing
  * pipeline (round-8 verdict follow-through): `q_dedup_winnow`'s 5.7×
  * sf0.1 → sf1 was root-caused to saturated-vocab fingerprint DENSITY,
  * but the winnowing selection itself (per-doc ROWS-frame window min over
  * posexploded k-gram hashes) has an O(len·log len) per-doc sort
  * character that a corpus-size decade (10× docs, same lengths) cannot
  * expose. This bench holds DOC COUNT fixed and grows each document 10×
  * (10–100 → 100–1,000 words, uniform), with vocab ∝ √(total words) (the
  * GenScale open-vocab control) so fingerprint collision density — and
  * with it the pair-join side of `q_dedup_winnow` — stays near its
  * baseline level; what remains is per-doc window cost.
  *
  * Expected if the selection is loglinear in doc length: wall-time ratio
  * ≈ 10–12× for ~11× the k-gram volume (i.e. ~linear in work). A
  * quadratic per-doc term — the interpreted-HOF spelling the
  * TextAnalysis.winnowFps scaladoc measures and rejects — would read
  * ≈ 100×. Every 64th doc near-clones its predecessor (last 2 words
  * replaced) so the dedup pair join is non-vacuous in both corpora.
  *
  * Run: `tools/run.sh graft.tools.WinnowLenBench`
  * (env GRAFT_WINNOWLEN_DOCS, default 5000 — the sf0.1 corpus size).
  * Prints ONE JSON line with per-corpus medians and the ratios.
  */
object WinnowLenBench {

  private def h(parts: String*): Int =
    MurmurHash3.stringHash(parts.mkString(":"), 0x5f3759df)

  /** Letters-only base-26 word stem (digits vanish in the normalizer). */
  private def b26(i: Int): String = {
    var n = i; val sb = new StringBuilder
    do { sb.append(('a' + n % 26).toChar); n /= 26 } while (n > 0)
    sb.result()
  }

  /** Deterministic corpus: nDocs docs, length uniform in [lenLo, lenHi]
    * words, vocab ∝ √(total words) so per-trigram df stays flat across
    * the two length regimes. Returns (rows, total k-grams). */
  def corpus(spark: SparkSession, nDocs: Int, lenLo: Int, lenHi: Int)
      : (DataFrame, Long) = {
    import spark.implicits._
    val avg = (lenLo + lenHi) / 2
    val vocabN = math.max(31, math.sqrt(nDocs.toDouble * avg).toInt)
    val vocab = (0 until vocabN).map(i => "w" + b26(i))
    def words(doc: Int): IndexedSeq[String] = {
      val len = lenLo + math.floorMod(h("len", doc.toString), lenHi - lenLo + 1)
      (0 until len).map(p =>
        vocab(math.floorMod(h("w", doc.toString, p.toString), vocabN)))
    }
    var kgrams = 0L
    val rows = (0 until nDocs).map { i =>
      val ws =
        if (i > 0 && i % 64 == 63) {
          val base = words(i - 1)
          base.dropRight(2) ++ Seq("c" + b26(i) + "x", "c" + b26(i) + "y")
        } else words(i)
      kgrams += math.max(ws.length - 2, 0).toLong
      val text = ws.mkString(" ")
      (i.toLong, text, "en", "winnowlen", text.length.toLong)
    }
    (rows.toDF("doc_id", "text", "lang", "source", "n_chars"), kgrams)
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nDocs = sys.env.getOrElse("GRAFT_WINNOWLEN_DOCS", "5000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt, "graft-winnowlen")

    def time(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val ts = (1 to 3).map(_ => once()).sorted
      ts(1)
    }

    val out = Seq(("base", 10, 100), ("long10x", 100, 1000)).map {
      case (label, lo, hi) =>
        val (df, kgrams) = corpus(spark, nDocs, lo, hi)
        val dir = s"/tmp/graft-winnowlen-$label"
        df.repartition(8).write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val fpSec = time(graft.queries.TextAnalysis.qFingerprintWinnow, dir)
        val ddSec = time(graft.queries.Dedup.qDedupWinnow, dir)
        val pairs = graft.queries.Dedup.qDedupWinnow(spark, dir).count()
        (label, kgrams, fpSec, ddSec, pairs)
    }
    val Seq((_, kg0, fp0, dd0, p0), (_, kg1, fp1, dd1, p1)) = out
    println(
      f"""{"n_docs":$nDocs,"base":{"kgrams":$kg0,"fp_sec":$fp0%.2f,"dedup_sec":$dd0%.2f,"pairs":$p0},""" +
      f""""long10x":{"kgrams":$kg1,"fp_sec":$fp1%.2f,"dedup_sec":$dd1%.2f,"pairs":$p1},""" +
      f""""kgram_ratio":${kg1.toDouble / kg0}%.2f,"fp_ratio":${fp1 / fp0}%.2f,"dedup_ratio":${dd1 / dd0}%.2f}""")
    spark.stop()
  }
}
