package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference engine's tokenizer/normalizer semantics, in ONE place.
  *
  * Faithful to `/root/reference/maprdeuce.cpp` (cited per SURVEY.md §2.3):
  *  - tokens are produced by splitting on the SINGLE space character
  *    (`maprdeuce.cpp:224` uses `getline(iss, buffer, ' ')`), NOT general
  *    whitespace — a tab stays inside its token;
  *  - normalization keeps `[a-zA-Z]` only and ASCII-lowercases
  *    (`maprdeuce.cpp:204-215`): digits/punctuation/non-ASCII vanish;
  *  - empty tokens (consecutive spaces, digit-only, punctuation-only) are
  *    dropped (`maprdeuce.cpp:242`).
  *
  * All three steps are stock Catalyst expressions (`Split`, `RegExpReplace`,
  * `Lower`, `Filter`) — they stay inside whole-stage codegen, the filter and
  * projection push toward the scan, and nothing here is a UDF.
  */
object TextPipeline {

  /** Normalize one token column: strip non-letters, lowercase. */
  def normalize(tok: Column): Column =
    lower(regexp_replace(tok, "[^a-zA-Z]", ""))

  /** Split a text column on the literal single space (regex-safe as-is). */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** One row per normalized non-empty word of `textCol`.
    * Output: single column `word`. Other input columns are dropped unless
    * listed in `keep`.
    */
  def words(df: DataFrame, textCol: String, keep: Seq[String] = Nil): DataFrame = {
    val kept = keep.map(col)
    df.select(kept :+ explode(tokens(col(textCol))).as("tok"): _*)
      .select(kept :+ normalize(col("tok")).as("word"): _*)
      .where(col("word") =!= "")
  }

  /** Normalized non-empty token ARRAY of a text column — the array-form
    * twin of [[words]]; the per-document projection Dedup / TextAnalysis /
    * Corpus share. */
  def normalizedTokens(text: Column): Column =
    filter(transform(tokens(text), t => normalize(t)), x => x =!= "")

  /** DuckDB spelling of the same per-token normalization, for oracle SQL. */
  val duckNormalize: String => String =
    t => s"lower(regexp_replace($t, '[^a-zA-Z]', '', 'g'))"

  /** DuckDB spelling of [[normalizedTokens]] over the `text` column (the
    * oracle-side tokenizer, defined ONCE so the §2.3 tokenizer contract
    * can't drift between query files). */
  val duckToks: String =
    "list_filter(list_transform(string_split(text, ' '), " +
      "t -> lower(regexp_replace(t, '[^a-zA-Z]', '', 'g'))), x -> x <> '')"

  /** Non-distinct word-BIGRAM array over a token array `w` — the 2-gram
    * twin of [[trigrams]] (same zip_with-over-shifted-slice mechanics:
    * O(tokens), null-padded tail filtered, <2-token arrays yield empty).
    * ONE spelling for every bigram consumer (top-bigram ranking, the
    * bigram LM, the CMS key stream) so the pairing contract can't
    * drift between tiers. */
  def bigrams(w: Column): Column =
    filter(
      zip_with(w, slice(w, lit(2), greatest(size(w) - 1, lit(0))),
        (x, y) => concat(x, lit(" "), y)),
      t => t.isNotNull)

  /** DuckDB spelling of [[bigrams]] over a token-list expression `w` —
    * the oracle-side twin, defined once like [[duckToks]]. */
  def duckBigrams(w: String): String =
    s"list_transform(($w)[1:len($w)-1], (x, i) -> x || ' ' || ($w)[i+1])"

  /** Non-distinct word-trigram array over a token array `w` (the 3-shingle
    * stream before dedup — repetition scoring needs the multiplicity).
    * zip_with formulation, NOT element_at-over-sequence: inlining the
    * token pipeline into an element_at body re-derives the array PER
    * ELEMENT — O(tokens²) interpreted regex work (measured 70× at sf0.1).
    * zip_with references `w` O(1) times. zip_with pads the shorter side
    * with null and concat(null) propagates, so trailing pads drop in the
    * filter. */
  def trigrams(w: Column): Column = {
    val tri = zip_with(
      zip_with(w, slice(w, lit(2), greatest(size(w) - 1, lit(0))),
        (x, y) => concat(x, lit(" "), y)),
      slice(w, lit(3), greatest(size(w) - 2, lit(0))),
      (xy, z) => concat(xy, lit(" "), z))
    filter(tri, t => t.isNotNull)
  }

  /** Distinct 3-shingle SET of a token array — the dedup-side projection
    * (MinHash, Jaccard, fingerprint families). */
  def shinglesOf(w: Column): Column = array_distinct(trigrams(w))

  /** DuckDB spelling of [[trigrams]] over a token-list expression `w`. */
  def duckTrigrams(w: String): String =
    s"""CASE WHEN len($w) >= 3
       | THEN list_transform(range(1, len($w) - 1),
       |        i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2])
       | ELSE CAST([] AS VARCHAR[]) END""".stripMargin

  /** DuckDB spelling of [[shinglesOf]]. */
  def duckShingles(w: String): String = s"list_distinct(${duckTrigrams(w)})"

  /** Portable 32-bit hash of a string column — first 8 hex chars of md5,
    * bit-identical in Spark and DuckDB ([[duckH32]]); the base hash under
    * MinHash, sampling, and fingerprinting. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB spelling of [[h32]]. */
  def duckH32(e: String): String =
    s"CAST(('0x' || substring(md5($e),1,8)) AS BIGINT)"
}
