package graft

import org.apache.spark.sql.functions._
import graft.core.TextPipeline
import graft.queries.WordCount

/** Golden semantics tests for SURVEY.md §2.3 — the tokenizer fine points a
  * naive `split("\\s+")` word count would get wrong, plus invariants and the
  * reference's own 25-line sample input as a hand-checkable golden vector.
  */
class WordCountSpec extends SparkSpec {
  import spark.implicits._

  private def countOf(lines: Seq[String]): Map[String, Long] =
    TextPipeline.words(lines.toDF("text"), "text")
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("split is on the single space char: tab stays inside a token") {
    // maprdeuce.cpp:224 — getline(iss, buffer, ' ')
    assert(countOf(Seq("foo\tbar baz")) === Map("foobar" -> 1L, "baz" -> 1L))
  }

  test("normalization keeps [a-zA-Z] only and lowercases") {
    // maprdeuce.cpp:204-215: "don't"->dont, "covid-19"->covid, digits vanish
    assert(countOf(Seq("Don't COVID-19 2023 Mix3d")) ===
      Map("dont" -> 1L, "covid" -> 1L, "mixd" -> 1L))
  }

  test("empty tokens from consecutive spaces / digit-only are dropped") {
    // maprdeuce.cpp:242
    assert(countOf(Seq("a  b   42 ...  c")) ===
      Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("output is globally sorted ascending by word and distinct") {
    val words = WordCount.wordcount(spark, sf).select("word").as[String].collect()
    assert(words.toSeq === words.toSeq.sorted)
    assert(words.distinct.length === words.length)
  }

  test("sum of counts equals number of non-empty normalized tokens") {
    val df = graft.io.Tables.documents(spark, sf)
    val total = WordCount.wordcount(spark, sf)
      .agg(sum("cnt")).as[Long].head()
    val tokens = TextPipeline.words(df, "text").count()
    assert(total === tokens)
  }

  test("counts are invariant under repartitioning") {
    val base = countOf(Seq("x y", "y z", "z z"))
    val shuffled = TextPipeline.words(
        Seq("x y", "y z", "z z").toDF("text").repartition(7), "text")
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(base === shuffled)
    assert(base === Map("x" -> 1L, "y" -> 2L, "z" -> 3L))
  }

  test("golden: reference sample input matches independent scala recount") {
    // /root/reference/input_file/input.txt — 25 lines of prose; recount with
    // plain Scala string ops implementing maprdeuce.cpp:204-229 directly.
    val path = "/root/reference/input_file/input.txt"
    val src = scala.io.Source.fromFile(path)
    val lines = try src.getLines().toList finally src.close()
    val expected = lines
      .flatMap(_.split(" ", -1))
      .map(_.filter(c => c.isLetter && c <= 'z').toLowerCase)
      .map(_.filter(c => c >= 'a' && c <= 'z'))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val got = countOf(lines)
    assert(got === expected)
    // distinct-word scalar = number of result rows (maprdeuce.cpp:1420-1424)
    assert(got.size === expected.size)
  }

  test("wordcount_distinct equals number of wordcount rows") {
    val n = WordCount.wordcountDistinct(spark, sf).as[Long].head()
    assert(n === WordCount.wordcount(spark, sf).count())
  }

  test("topk is count-desc, word-asc, capped at 100") {
    val rows = WordCount.wordcountTopK(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length <= 100)
    val resorted = rows.sortBy { case (w, c) => (-c, w) }
    assert(rows.toSeq === resorted.toSeq)
  }
}
