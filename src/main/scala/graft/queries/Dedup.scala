package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.TextPipeline
import graft.io.Tables
import org.apache.spark.sql.graftbridge.Bridge

/** M4a — deduplication tier over `documents`: the dedup ladder of a
  * web-scale training-data pipeline (exact → MinHash/LSH → SimHash →
  * verified n-gram Jaccard → embedding cosine).
  *
  * The reference engine has no dedup (SURVEY.md §2.2 — its only "distinct"
  * is the distinct-word count, `maprdeuce.cpp:1403-1427`); this tier is the
  * scale-out extension surface the north star calls for.
  *
  * Cross-engine determinism: every hash is derived from md5 (identical in
  * Spark and DuckDB) reduced to a 32-bit int, then mixed with universal-hash
  * constants that are INLINED AS LITERALS into both the Spark plan and the
  * oracle SQL — both engines compute bit-identical integers, so MinHash
  * signatures, LSH buckets, and SimHash fingerprints match exactly.
  * Jaccard values are ratios of integers (exact in IEEE double); only
  * cosine goes through floating point, and is rounded in the output.
  *
  * Scale stance (100 TB):
  *  - fingerprints/signatures are one narrow projection pass — no shuffle;
  *  - exact dedup shuffles once on the 16-byte fingerprint (not the text);
  *  - LSH candidate generation shuffles (band_id, band_key) pairs — tokens
  *    never move; the per-bucket self-join is the standard
  *    shingle→minhash→band→bucket-join plan, and bucket sizes are bounded
  *    by the band width (tune bands/rows, or salt a hot bucket);
  *  - the exact-Jaccard verifier runs ONLY on LSH candidates at scale; the
  *    within-language all-pairs variant here is the oracle-checkable
  *    small-scale form (see q_ngram_jaccard scaladoc).
  */
object Dedup {

  // ---- portable hashing ----------------------------------------------------

  /** Large prime for universal hashing; all mixed products stay < 2^63. */
  private val P = 1000000007L

  /** Number of MinHash permutations and the LSH banding layout. */
  private val NumHashes = 32
  private val Bands = 8
  private val RowsPerBand = 4 // Bands * RowsPerBand == NumHashes

  /** Universal-hash constants a_i, b_i — reproduced literally in oracle SQL. */
  private val hashA: IndexedSeq[Long] =
    (1 to NumHashes).map(i => (2654435761L * i) % P)
  private val hashB: IndexedSeq[Long] =
    (1 to NumHashes).map(i => (40503L * i * 2654435761L) % P)

  /** 32-bit base hash (TextPipeline.h32) and its oracle spelling. */
  private def h32(c: Column): Column = TextPipeline.h32(c)
  private def duckH32(e: String): String = TextPipeline.duckH32(e)

  // ---- shared token/shingle projections ------------------------------------

  /** Normalized token array (reference tokenizer semantics, TextPipeline). */
  private val toks: Column = TextPipeline.normalizedTokens(col("text"))

  private val duckToks = TextPipeline.duckToks

  /** Distinct 3-word shingles of the token array (empty if < 3 tokens);
    * zip_with-over-slices formulation and the inlining rationale live in
    * TextPipeline (shared with the repetition scorer). */
  private def shinglesOf(w: Column): Column = TextPipeline.shinglesOf(w)

  /** DuckDB spelling of the same shingle set over a token-list column `w`. */
  private def duckShingles(w: String): String = TextPipeline.duckShingles(w)

  /** MinHash signature array (NumHashes entries) over a PRE-HASHED shingle
    * array (`hashShingles`): each slot is an affine mix + min over the
    * cached integer hashes — md5 runs once per shingle, not NumHashes
    * times. Empty shingle set → sentinel P for every slot (matches oracle). */
  private def hashShingles(sh: Column): Column =
    transform(sh, s => h32(s) % P)

  private def signatureOf(hs: Column): Column =
    graft.functions.VectorFunctions.minhashSignature(hs, hashA, hashB, P)

  private def duckSignature(hs: String): String =
    (0 until NumHashes).map { i =>
      s"coalesce(list_min(list_transform($hs, h -> (${hashA(i)} * h + ${hashB(i)}) % $P)), $P)"
    }.mkString("[", ",\n ", "]")

  // ---- queries -------------------------------------------------------------

  /** Exact dedup: canonical-form fingerprint → group → keep lowest doc_id.
    * One narrow pass to fingerprint, one shuffle on the 16-byte md5 (window
    * over fingerprint), never on the document text. Output is the full
    * dedup decision per document. */
  def qDedupExact(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fp = Tables.documents(s, dir)
      .select(col("doc_id"), md5(concat_ws(" ", toks)).as("fingerprint"))
    val w = Window.partitionBy(col("fingerprint"))
    fp.withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .select(col("doc_id"), col("fingerprint"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"), col("n_copies"))
      .orderBy("doc_id")
  }

  /** MinHash signatures, one row per document with all NumHashes slots as
    * columns (m00..m31) so the oracle verifies every component bit-exactly.
    * Linear scan, no shuffle (the final ORDER BY is presentation-only). */
  /** Materialize tokens → shingles → signature as NAMED columns stage by
    * stage: inlining `shinglesOf(toks)` would duplicate the tokenizer
    * expression tree into every element_at of the shingle lambda and
    * re-run the regex per element (measured ~20× slowdown). */
  private def sigsOf(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), toks.as("w"))
      .select(col("doc_id"), col("lang"), shinglesOf(col("w")).as("sh"))
      .select(col("doc_id"), col("lang"), hashShingles(col("sh")).as("hs"))
      .select(col("doc_id"), col("lang"), signatureOf(col("hs")).as("sig"))

  def qMinhashSignature(s: SparkSession, dir: String): DataFrame = {
    val base = sigsOf(s, dir)
    val cols = col("doc_id") +:
      (0 until NumHashes).map(i => element_at(col("sig"), i + 1).as(f"m$i%02d"))
    base.select(cols: _*).orderBy("doc_id")
  }

  /** MinHash + LSH near-dup pairs: shingle → signature → band → bucket-join.
    * Bands of RowsPerBand slots hash to a bucket key; documents sharing any
    * bucket become candidates; candidates are scored by signature agreement
    * (estimated Jaccard, an exact rational m/32) and kept at est ≥ 0.5.
    * At 100 TB only (band_id, key) pairs shuffle — never text or shingles —
    * and the candidate self-join is per-bucket local. */
  def qDedupMinhash(s: SparkSession, dir: String): DataFrame =
    minhashCandsM(s, dir)
      .select(col("a_id"), col("b_id"),
        (col("m").cast("double") / NumHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
      .orderBy("a_id", "b_id")

  /** The banded candidate relation with the exact signature-agreement
    * count m ∈ 0..[[NumHashes]] (est_jaccard = m/32 is a bijection of
    * it): one definition behind [[qDedupMinhash]] (m ≥ 16 operating
    * point), and [[qTrainingPairs]]'s positive/hard-negative mining —
    * the ORACLE twin is [[minhashCandCte]], so the edge set cannot
    * drift between the production pair query and the miners. */
  private def minhashCandsM(s: SparkSession, dir: String): DataFrame = {
    val sigs = sigsOf(s, dir).select("doc_id", "sig")
    val bands = sigs.select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(Bands - 1))).as("band_id"))
      .select(col("doc_id"), col("sig"), col("band_id"),
        md5(concat_ws(",", transform(
          slice(col("sig"), col("band_id") * RowsPerBand + 1, lit(RowsPerBand)),
          x => x.cast("string")))).as("band_key"))
    val a = bands.select(col("band_id"), col("band_key"),
      col("doc_id").as("a_id"), col("sig").as("a_sig"))
    val b = bands.select(col("band_id"), col("band_key"),
      col("doc_id").as("b_id"), col("sig").as("b_sig"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        // NOTE (r14): an unrolled 32-term element_at equality sum was
        // A/B-measured SLOWER than this HOF chain (1.93 → 2.95 s at
        // sf0.1 — the 64-access codegen blob loses to one streaming
        // array pass); keep the zip_with spelling.
        size(filter(zip_with(col("a_sig"), col("b_sig"), (x, y) => x === y),
          v => v)).as("m"))
      .distinct()
  }

  /** Contrastive training-pair mining (the DPR recipe, Karpukhin et al.
    * EMNLP'20 §3.2; hard negatives are what make dense retrievers
    * train): per anchor document, its hardest POSITIVE — the
    * highest-agreement partner at or above the m ≥ 16 (est ≥ 0.5)
    * operating point, i.e. its verified near-duplicate — and its
    * hardest HARD NEGATIVE — the highest-agreement partner BELOW it
    * (0 < m < 16): a document the candidate generator found lexically
    * confusable that the verifier rejected, exactly the "BM25-hard"
    * negative the paper mines. Emitted as labeled PAIRS, not inner-
    * joined triples: positives and banded hard negatives rarely share
    * an anchor (band collisions concentrate where clones are, verified
    * empty at sf0.01), and the training batch composes triples anyway —
    * random in-batch negatives need no materialization. Estimates ship
    * as exact ppm (m·31250 — est is the rational m/32, float-free).
    *
    * Scale stance (100 TB): rides the dedup tier's existing banded
    * candidate generation unchanged ([[minhashCandsM]] — the mining is
    * a by-product of the dedup you already run); the per-anchor picks
    * are max_by aggregates (O(1) state), never a window over the
    * anchor's candidate list; the oracle keeps the window spelling. */
  def qTrainingPairs(s: SparkSession, dir: String): DataFrame = {
    // the symmetric closure reads the candidate relation twice —
    // lineage-cut so signatures/bands/bucket-join run once
    val c = graft.core.Lineage.cut(minhashCandsM(s, dir))
    val sym = c.select(col("a_id").as("anchor"), col("b_id").as("partner"),
        col("m"))
      .unionAll(c.select(col("b_id").as("anchor"), col("a_id").as("partner"),
        col("m")))
    def hardest(in: DataFrame, kind: String): DataFrame = in
      .groupBy(col("anchor"))
      .agg(max_by(struct(col("partner"), col("m")),
        struct(col("m"), -col("partner"))).as("p"))
      .select(col("anchor").as("anchor_id"), lit(kind).as("kind"),
        col("p.partner").as("partner_id"), (col("p.m") * 31250L).as("est_ppm"))
    hardest(sym.filter(col("m") >= 16), "positive")
      .unionAll(hardest(sym.filter(col("m") < 16 && col("m") > 0),
        "hard_negative"))
      .orderBy("anchor_id", "kind")
  }

  /** Exact-Jaccard threshold for [[qDedupEval]]'s ground truth — matches
    * the est ≥ 0.5 operating point q_dedup_minhash ships. */
  private val EvalT = 0.5

  /** Doc-space sampling modulus for the eval tier ([[qDedupEval]] /
    * [[qDedupOperatingCurve]]): both the exact-truth postings join AND
    * the banded candidate generator restrict to documents with
    * pmod(h32(doc_id), M) == 0 BEFORE any pair is formed — the in-plan
    * spelling of the "run the exact truth on a sampled slice at 100 TB"
    * contract (evaluation is legitimately quadratic in shared-shingle
    * postings — Σ df² — and the doc-space sample bounds it by ~1/M²;
    * precision/recall are ratio statistics, so a uniform pair subsample
    * estimates them unbiasedly). The hash is the h32 both engines already
    * share, so Spark and DuckDB measure the SAME sampled sub-corpus.
    * Default 1 = non-binding (every document passes; CORRECTNESS stays
    * hash-exact on the full fixture); GRAFT_EVAL_SAMPLE_MOD overrides for
    * scale measurements, and DedupSimilaritySpec pins sampled ≈ full at
    * fixture scale via the injectable impls. */
  private[graft] val EvalSampleMod: Long =
    sys.env.get("GRAFT_EVAL_SAMPLE_MOD").map(_.toLong).getOrElse(1L)

  /** The eval-tier doc-space sample predicate (Spark side). */
  private def evalSampled(mod: Long): Column =
    pmod(h32(col("doc_id").cast("string")), lit(mod)) === 0L

  /** DuckDB spelling of [[evalSampled]] over an id expression. */
  private def duckEvalSampled(mod: Long, idExpr: String): String =
    s"${duckH32(s"CAST($idExpr AS VARCHAR)")} % $mod = 0"

  /** Dedup-quality dashboard: precision/recall of the MinHash-LSH
    * candidate generator against EXACT shingle-Jaccard ground truth at
    * the same 0.5 threshold — the quantified answer to "what does the
    * sketch miss, and what does it waste verification on", one query
    * instead of a spec assertion so the operating point is monitored
    * per corpus (DedupSimilaritySpec pins recall once; a distribution
    * shift shows up HERE).
    *
    * Truth = pairs with exact J ≥ [[EvalT]] over distinct h32-hashed
    * shingles (unblocked — LSH itself is unblocked); candidates = ANY
    * band collision (the raw generator, before estimate filtering).
    * TP/FP/FN via one full-outer pair merge; precision/recall as
    * integer ppm DIV.
    *
    * Scale stance: truth reuses the postings-join shape (8-byte hashes
    * shuffle, Σ df² bounded as in q_ngram_jaccard); candidates reuse
    * the banded bucket join; the confusion merge is pair-cardinality.
    * The quadratic truth side is the price of EVALUATION, and the
    * sampled-slice contract is IN THE PLAN: both the truth postings and
    * the candidate bands build only on the [[EvalSampleMod]]-sampled
    * document slice (the predicate sits directly on the scan, before any
    * join), so at 100 TB the evaluation runs on 1/M of the corpus and
    * ~1/M² of the pair work while the production q_dedup_minhash path
    * stays full. */
  def qDedupEval(s: SparkSession, dir: String): DataFrame =
    qDedupEvalImpl(s, dir, EvalSampleMod)

  /** [[qDedupEval]] core with the sample modulus injectable so
    * DedupSimilaritySpec can pin sampled (M>1) ≈ full (M=1) metrics. */
  private[graft] def qDedupEvalImpl(s: SparkSession, dir: String,
      mod: Long): DataFrame = {
    val shd = Tables.documents(s, dir)
      .filter(evalSampled(mod))
      .select(col("doc_id"), toks.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        graft.functions.VectorFunctions.shinglePosting(col("w"), 3))
      .select(col("doc_id"), TextPipeline.h32(col("shingle")).as("h"))
      .distinct()
      // 3 consumers: sizes + both join sides (Lineage.cut = localCheckpoint
      // unless the plan audit disables it to see the sample predicate)
      .transform(graft.core.Lineage.cut)
    val sizes = shd.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = shd.join(sizes, "doc_id")
      .select(col("h"), col("doc_id").as("a_id"), col("n").as("a_n"))
    val b = shd.join(sizes, "doc_id")
      .select(col("h"), col("doc_id").as("b_id"), col("n").as("b_n"))
    val truth = a.join(b, "h").filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "a_n", "b_n").agg(count(lit(1)).as("inter"))
      .filter(col("inter").cast("double")
        / (col("a_n") + col("b_n") - col("inter")) >= EvalT)
      .select(col("a_id"), col("b_id"))
    val bands = sigsOf(s, dir).filter(evalSampled(mod))
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(Bands - 1))).as("band_id"), col("sig"))
      .select(col("doc_id"), col("band_id"),
        md5(concat_ws(",", transform(
          slice(col("sig"), col("band_id") * RowsPerBand + 1,
            lit(RowsPerBand)),
          x => x.cast("string")))).as("band_key"))
      .transform(graft.core.Lineage.cut) // 2 consumers: both bucket-join sides
    val cand = bands.select(col("band_id"), col("band_key"),
        col("doc_id").as("a_id"))
      .join(bands.select(col("band_id"), col("band_key"),
        col("doc_id").as("b_id")), Seq("band_id", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    // NOTE (r14): the q_ref_integrity union-marker respelling was
    // A/B-measured HERE and REVERTED (2.92 → 3.19 s at sf0.1): unlike
    // the FK audit, cand's .distinct() already partitions by the join
    // key, so the full-outer reuses it and only truth pays an exchange —
    // while the union + groupBy spelling re-shuffles BOTH streams.
    truth.withColumn("t", lit(1L))
      .join(cand.withColumn("c", lit(1L)), Seq("a_id", "b_id"), "full_outer")
      .agg(
        // coalesce: an EMPTY confusion input (no truth pairs, no band
        // collisions) must read 0/0/0 like the oracle's count(*) CTEs,
        // not the NULLs a sum-over-zero-rows would produce
        coalesce(sum(when(col("t").isNotNull && col("c").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("tp"),
        coalesce(sum(when(col("t").isNull && col("c").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("fp"),
        coalesce(sum(when(col("t").isNotNull && col("c").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("fn"))
      .select(lit(500000L).as("t_ppm"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          expr("tp * 1000000 div (tp + fp)"))
          .otherwise(lit(null).cast("long")).as("precision_ppm"),
        when(col("tp") + col("fn") > 0,
          expr("tp * 1000000 div (tp + fn)"))
          .otherwise(lit(null).cast("long")).as("recall_ppm"))
  }

  /** LSH operating curve — [[qDedupEval]] generalized from one threshold
    * to the whole jaccard spectrum: per exact-jaccard decile band, how
    * many true shingle-sharing pairs exist and how many the banded
    * MinHash candidate generator catches. This is the measured S-curve
    * that the 1−(1−j^r)^b collision formula predicts, i.e. the table you
    * consult to MOVE the operating point (bands/rows) instead of
    * re-guessing it; the `-1` row counts candidates with zero shared
    * shingles (pure band-collision noise).
    *
    * Scale stance (100 TB): truth = the postings self-join (Σ df²
    * bounded — the declared evaluation cost), and the sampled-slice
    * contract is IN THE PLAN: both truth and candidates build only on
    * the [[EvalSampleMod]]-sampled document slice, so the curve is
    * measured on 1/M of the corpus (~1/M² of the pair work) while the
    * production generator stays full; the full-outer merge shuffles
    * pair keys once and collapses to ≤11 rows map-side. */
  def qDedupOperatingCurve(s: SparkSession, dir: String): DataFrame =
    qDedupOperatingCurveImpl(s, dir, EvalSampleMod)

  /** [[qDedupOperatingCurve]] core with the sample modulus injectable
    * (spec pins sampled ≈ full, mirroring [[qDedupEvalImpl]]). */
  private[graft] def qDedupOperatingCurveImpl(s: SparkSession, dir: String,
      mod: Long): DataFrame = {
    val shd = Tables.documents(s, dir)
      .filter(evalSampled(mod))
      .select(col("doc_id"), toks.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        graft.functions.VectorFunctions.shinglePosting(col("w"), 3))
      .select(col("doc_id"), TextPipeline.h32(col("shingle")).as("h"))
      .distinct()
      // 3 consumers: sizes + both join sides (Lineage.cut = localCheckpoint
      // unless the plan audit disables it to see the sample predicate)
      .transform(graft.core.Lineage.cut)
    val sizes = shd.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = shd.join(sizes, "doc_id")
      .select(col("h"), col("doc_id").as("a_id"), col("n").as("a_n"))
    val b = shd.join(sizes, "doc_id")
      .select(col("h"), col("doc_id").as("b_id"), col("n").as("b_n"))
    val truth = a.join(b, "h").filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "a_n", "b_n").agg(count(lit(1)).as("inter"))
      .select(col("a_id"), col("b_id"),
        least(floor(col("inter").cast("double")
          / (col("a_n") + col("b_n") - col("inter")) * 10), lit(9.0))
          .cast("long").as("j_band"))
    val bands = sigsOf(s, dir).filter(evalSampled(mod))
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(Bands - 1))).as("band_id"), col("sig"))
      .select(col("doc_id"), col("band_id"),
        md5(concat_ws(",", transform(
          slice(col("sig"), col("band_id") * RowsPerBand + 1,
            lit(RowsPerBand)),
          x => x.cast("string")))).as("band_key"))
      .transform(graft.core.Lineage.cut) // 2 consumers: both bucket-join sides
    val cand = bands.select(col("band_id"), col("band_key"),
        col("doc_id").as("a_id"))
      .join(bands.select(col("band_id"), col("band_key"),
        col("doc_id").as("b_id")), Seq("band_id", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    // NOTE (r14): the union-marker respelling was A/B-measured SLOWER
    // here too (3.34 → 3.52 s at sf0.1) — see qDedupEvalImpl's note;
    // cand's distinct partitioning makes the full-outer the cheaper
    // merge. Keep the join spelling.
    truth.withColumn("t", lit(1L))
      .join(cand.withColumn("c", lit(1L)), Seq("a_id", "b_id"), "full_outer")
      .select(when(col("t").isNotNull, col("j_band")).otherwise(lit(-1L))
        .as("j_band"), col("t"), col("c"))
      .groupBy("j_band")
      .agg(coalesce(sum(col("t")), lit(0L)).as("n_true"),
        coalesce(sum(when(col("t").isNotNull && col("c").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_caught"),
        coalesce(sum(when(col("t").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_false_cand"))
      .withColumn("recall_ppm",
        when(col("n_true") > 0, expr("n_caught * 1000000 div n_true"))
          .otherwise(lit(-1L)))
      .orderBy("j_band")
  }

  /** Iteration cap for [[components]] — a safety net only: alternating
    * star contraction converges in O(log² n) rounds on ANY graph shape
    * (near-dup pair graphs settle in 2-3), and each iteration ends with
    * an EXACT fixpoint check, so the cap can't silently truncate a live
    * contraction within any realistic component size. */
  private val MaxRounds = 25

  /** Connected components over an undirected edge list `(src, dst)` by
    * alternating star contraction (the Kiveris et al. MapReduce CC
    * algorithm — large-star then small-star per iteration, until the
    * edge set is a fixpoint of both):
    *  - large-star(u): every neighbor v > u re-attaches to
    *    m(u) = min(N(u) ∪ {u});
    *  - small-star(u): every neighbor v ≤ u, and u itself, attach to m(u).
    * At the fixpoint the edges form stars centered at each component's
    * minimum id; labels read straight off the star edges (centers label
    * themselves). Unlike min-label PROPAGATION (whose worst case is one
    * round per unit of diameter — its label-of-label shortcut is idle at
    * local id minima, a bug a randomized union-find test caught), star
    * contraction halves long chains every iteration regardless of where
    * the minima sit. Scale shape per phase: one groupBy-min over the
    * symmetric edge list + one join — only (long, long) pairs shuffle —
    * with a `localCheckpoint` lineage break per phase; the fixpoint test
    * is an exact anti-join on the canonical edge set. Deterministic:
    * min is order-free, the edge set is kept canonical (lo, hi) and
    * distinct. */
  private[graft] def components(edgesIn: DataFrame): DataFrame = {
    def canonical(df: DataFrame): DataFrame =
      df.select(least(col("v"), col("m")).as("lo"),
          greatest(col("v"), col("m")).as("hi"))
        .filter(col("lo") =!= col("hi")).distinct()
    var canon = edgesIn
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct().localCheckpoint(true)
    val canon0 = canon // checkpointed: node set derived from it at the end

    // NOTE (r14): a measured-gate broadcast of the min-label map m was
    // A/B-tested here and REVERTED — per-phase BroadcastExchange jobs
    // plus the lost sym-exchange reuse made q_dedup_clusters 3.2 → 14.3 s
    // at sf0.1. The SMJ spelling shuffles sym ONCE per phase and both
    // consumers (the min aggregate and the re-attach join) reuse it.
    def phase(large: Boolean): Unit = {
      val sym = canon.select(col("lo").as("u"), col("hi").as("v"))
        .union(canon.select(col("hi").as("u"), col("lo").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val withM = sym.join(m, "u")
      val emitted =
        if (large) withM.filter(col("v") > col("u")).select(col("v"), col("m"))
        else withM.filter(col("v") <= col("u")).select(col("v"), col("m"))
          .union(m.select(col("u").as("v"), col("m")))
      canon = canonical(emitted).localCheckpoint(true)
    }

    // (count, Σlo, Σhi) signature: one aggregate on the tiny checkpointed
    // state. A changed signature proves NOT converged without any join;
    // only a matching signature pays for the EXACT set-equality anti-join.
    def signature(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(col("lo")), lit(0L)), coalesce(sum(col("hi")), lit(0L))).first
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var converged = canon.isEmpty
    var prevSig = signature(canon)
    var iters = 0
    while (!converged && iters < MaxRounds) {
      val before = canon
      phase(large = true)
      val mid = canon
      phase(large = false)
      iters += 1
      val sig = signature(canon)
      converged = sig == prevSig && before.except(canon).isEmpty
      prevSig = sig
      // free superseded checkpoint blocks: each eager localCheckpoint IS
      // its persisted blocks, so without this the loop accumulates two
      // block sets per round — an executor-memory leak on long
      // convergences (surfaced by the sf1 decade runs: repeated
      // q_dedup_clusters executions in one JVM degraded 4.4 s → 40.9 s).
      // `mid` is dead once the small phase materialized; `before` once
      // the convergence test consumed it. canon0 (the node set source)
      // and the live canon stay persisted — bounded at ~3 block sets.
      Bridge.freeLocalCheckpoint(mid)
      if (before ne canon0) Bridge.freeLocalCheckpoint(before)
    }
    // stars: each child edge is (center=lo, child=hi); centers (and any
    // node never appearing as a child) label themselves
    val nodes = canon0.select(col("lo").as("id"))
      .union(canon0.select(col("hi").as("id"))).distinct()
    val childLabels = canon.select(col("hi").as("id"), col("lo").as("lbl"))
    val centerLabels = nodes
      .join(childLabels.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("lbl"))
    childLabels.union(centerLabels)
  }

  /** Transitive dedup clusters: connected components over the MinHash/LSH
    * near-dup pair graph — the step that turns pairwise candidates into
    * keep-one-per-cluster dedup (canonical = the cluster's min doc_id).
    * Only documents appearing in ≥1 near-dup pair carry a row; isolated
    * documents are trivially their own cluster. */
  def qDedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = qDedupMinhash(s, dir)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    components(pairs)
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
        (col("id") === col("lbl")).as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Levenshtein verification of the LSH candidate pairs: character-level
    * edit distance over an 80-char prefix — the third verification family
    * next to set-based Jaccard and bitwise SimHash. O(80²) per pair and
    * computed ONLY on the candidate pairs the banding emitted (never
    * all-pairs), so at 100 TB the cost scales with true duplicate
    * density, not corpus size; only the capped prefixes join, never full
    * documents. */
  def qEditDistance(s: SparkSession, dir: String): DataFrame = {
    val pairs = qDedupMinhash(s, dir).select("a_id", "b_id")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), substring(col("text"), 1, 80).as("t"))
    pairs
      .join(docs.select(col("doc_id").as("a_id"), col("t").as("a_t")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("t").as("b_t")), "b_id")
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_t"), col("b_t")).as("edit_dist"))
      .orderBy("a_id", "b_id")
  }

  /** SimHash fingerprint (32-bit): per token-occurrence hash, per-bit
    * +1/-1 vote weighted by term frequency, sign → bit. Pure per-row array
    * math — no shuffle, codegen-friendly, and bit-identical to the oracle
    * because the base hash is md5-derived. */
  def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    simhashes(s, dir).orderBy("doc_id")

  /** (doc_id, simhash): the shared head of the fingerprint dump and the
    * hamming-ball pair join. */
  private def simhashes(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("w"))
      .select(col("doc_id"), transform(col("w"), t => h32(t)).as("hs"))
      // native one-pass kernel (graft.plans.SimHash32) — same vote math
      // as the oracle's per-bit spelling, 32× fewer array walks
      .select(col("doc_id"),
        graft.functions.VectorFunctions.simhash32(col("hs")).as("simhash"))

  // Hamming-ball geometry: 32 bits in SimhashBands=4 bands of 8; any pair
  // with hamming ≤ HammingT=3 leaves at least one band untouched
  // (pigeonhole: 3 flipped bits can dirty at most 3 of 4 bands), so the
  // equal-band bucket join misses NOTHING at the threshold.
  private val SimhashBands = 4
  private val HammingT = 3

  /** SimHash near-dup PAIRS within hamming distance ≤ [[HammingT]], via
    * the multi-index (pigeonhole) band join — the fingerprint-side twin
    * of the MinHash/LSH pair query.
    *
    * Scale stance: candidates come from equal-(band, band_key) buckets —
    * Σ bucket² work, never N² — and only (doc_id, simhash) longs shuffle;
    * the explicit `repartition` canonicalizes both self-join sides to ONE
    * reused exchange (the [[postings]] pattern). Verification is a bare
    * `bit_count(xor)` per candidate. The ORACLE is the all-pairs exact
    * hamming join, so the band plan's completeness is re-proven against
    * brute force on every verify run, not assumed from the pigeonhole
    * argument. */
  def qSimhashPairs(s: SparkSession, dir: String): DataFrame = {
    val withBand = simhashes(s, dir)
      .select(col("doc_id"), col("simhash"),
        posexplode(array((0 until SimhashBands).map(b =>
          shiftright(col("simhash"), 8 * b).bitwiseAND(lit(255L))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .repartition(col("band"), col("band_key"))
    val a = withBand.select(col("band"), col("band_key"),
      col("doc_id").as("a_id"), col("simhash").as("a_sim"))
    val b = withBand.select(col("band"), col("band_key"),
      col("doc_id").as("b_id"), col("simhash").as("b_sim"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_sim"), col("b_sim"))
      .distinct()
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= HammingT)
      .orderBy("a_id", "b_id")
  }

  /** Latest-version-wins dedup over the event changelog (the CDC upsert
    * view: one surviving row per user_id, ordered by (ts, event_id)).
    * Spelled as a max_by over a lexicographic struct — ONE shuffle with
    * partial aggregation on the map side, no per-key window sort; the
    * (us, event_id) key is unique, so the winner is total-order
    * deterministic. */
  def qDedupLatest(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("us"), col("event_type"), col("value")),
        struct(col("us"), col("event_id"))).as("r"))
      .select(col("user_id"), col("r.event_id").as("event_id"),
        col("r.us").as("us"), col("r.event_type").as("event_type"),
        col("r.value").as("value"))
      .orderBy("user_id")

  /** Jaccard similarity threshold shared by the exact verifiers (and,
    * private[graft], by the streaming probe twin in Windows). */
  private[graft] val JaccardT = 0.2

  /** Shingled docs (doc_id, lang, s): the shared head of both exact
    * verifiers. Early filter on the TOKEN count (equivalent to
    * size(s) > 0 since ≥3 tokens ⟺ ≥1 trigram): a post-shingle filter
    * would be pushed down with the shingle expression substituted in —
    * paying it twice. */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), toks.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), col("lang"), shinglesOf(col("w")).as("s"))

  /** Postings (lang, shingle, doc_id, n) hash-partitioned on the join
    * key. The explicit `repartition` is load-bearing twice over:
    *  - the self-join's two sides canonicalize to the SAME exchange, so
    *    tokenize→shingle→explode runs ONCE and is shuffle-reused
    *    (without it, round 1 re-evaluated the pipeline per branch —
    *    5 evaluations, 21 s at sf0.1; with it, 2.6 s);
    *  - downstream joins/aggs on (lang, shingle) are then co-partitioned
    *    and add no further exchange.
    * Carrying n (the doc's shingle-set size) in the postings replaces
    * round 1's two joins back to a per-doc size table — each of which
    * re-derived the whole shingle pipeline. */
  private def postings(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), toks.as("w"))
      .filter(size(col("w")) >= 3)
      // native Generator (graft.plans.ShinglePosting): emits the distinct
      // trigrams AND the carried set size in one pass off the token array —
      // the composed form materialized window + distinct arrays first
      .select(col("lang"), col("doc_id"),
        graft.functions.VectorFunctions.shinglePosting(col("w"), 3))
      .select(col("lang"), col("doc_id"), col("n_shingles").as("n"), col("shingle"))
      .repartition(col("lang"), col("shingle"))

  /** Exact n-gram (3-shingle) Jaccard near-dup pairs, within-language.
    * Jaccard = |A∩B| / |A∪B| over distinct shingle sets, threshold 0.2
    * (fixture probe: ~6 such pairs at sf0.01, max j ≈ 0.989 — a real
    * near-dup). Values are integer ratios — exact across engines.
    *
    * Plan: INVERTED-INDEX COUNT — self-join the postings, count common
    * shingles per (a,b) = |A∩B|, |A∪B| = a_n + b_n − |A∩B|. Only narrow
    * integer rows ever shuffle (never shingle arrays); pairs sharing no
    * shingle never exist anywhere; a hot shingle is AQE skew-splittable.
    * Work is Σ_shingle df² — optimal while document frequencies are
    * bounded (true of content-bearing shingles). When a corpus has
    * stop-shingles with huge df, switch to [[qNgramJaccardPrefix]] —
    * same exact answer, work bounded by the prefix-filtered candidate
    * set instead of Σ df². */
  def qNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val post = postings(s, dir)
    val a = post.select(col("lang"), col("shingle"), col("doc_id").as("a_id"), col("n").as("a_n"))
    val b = post.select(col("lang"), col("shingle"), col("doc_id").as("b_id"), col("n").as("b_n"))
    a.join(b, Seq("lang", "shingle"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
      .agg(count(lit(1)).as("inter"))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") / (col("a_n") + col("b_n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardT)
      .orderBy("a_id", "b_id")
  }

  /** The same exact verifier with PREFIX FILTERING — the standard
    * set-similarity-join pruning (AllPairs/PPJoin family) for corpora
    * where hot shingles make Σ df² explode:
    *
    *  1. rank each doc's shingles by (document frequency, shingle) — a
    *     global total order putting the RAREST first;
    *  2. index only each doc's first n − ⌈t·n⌉ + 1 shingles: if
    *     j(A,B) ≥ t then |A∩B| ≥ ⌈t·n⌉ on both sides, so the globally
    *     smallest element of A∩B provably sits inside BOTH prefixes —
    *     no qualifying pair is lost;
    *  3. candidates additionally pass the length filter
    *     min(n_a,n_b) ≥ ⌈t·max(n_a,n_b)⌉ (j ≤ min/max);
    *  4. candidates are verified EXACTLY by a merge scan over the two
    *     sorted shingle sets (native SortedIntersectCount kernel) —
    *     arrays move only for surviving candidates.
    *
    * Same answer as [[qNgramJaccard]] (same oracle SQL; equality also
    * pinned in DedupSimilaritySpec). On the driver fixture (df ≤ 14 — no
    * hot shingles) the count plan is faster (1.1 s vs 4.0 s at sf0.1);
    * the crossover is MEASURED on the boilerplate-header corpus of
    * `graft.tools.HotShingleBench` (5 trigrams with df = nDocs, the
    * C4-style shape): at 4,000 docs the postings plan pays Σ df² ≈ 5·N²
    * join rows and takes 14.0 s, this plan 1.7 s — an 8× win that grows
    * quadratically with corpus size. Hot shingles stop hurting candidate
    * generation entirely: a shingle shared by all docs has maximal df,
    * ranks at the END of the rarest-first order, and provably drops out
    * of every prefix (the drop-out is re-proven mechanically in
    * DedupSimilaritySpec alongside answer equality). */
  def qNgramJaccardPrefix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val post = postings(s, dir)
    // df per (lang, shingle): co-partitioned with `post` — no exchange
    val freq = post.groupBy(col("lang"), col("shingle")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val pref = post.join(freq, Seq("lang", "shingle"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n") - ceil(col("n") * JaccardT) + 1)
    val ca = pref.select(col("lang"), col("shingle"), col("doc_id").as("a_id"), col("n").as("a_n"))
    val cb = pref.select(col("lang"), col("shingle"), col("doc_id").as("b_id"), col("n").as("b_n"))
    val cand = ca.join(cb, Seq("lang", "shingle"))
      .filter(col("a_id") < col("b_id") &&
        least(col("a_n"), col("b_n")) >= ceil(greatest(col("a_n"), col("b_n")) * JaccardT))
      .select(col("a_id"), col("b_id"), col("a_n"), col("b_n")).distinct()
    // sorted ONCE per doc, amortized over all its candidate pairs
    val ss = shingled(s, dir).select(col("doc_id"), array_sort(col("s")).as("ss"))
    cand
      .join(ss.select(col("doc_id").as("a_id"), col("ss").as("a_ss")), "a_id")
      .join(ss.select(col("doc_id").as("b_id"), col("ss").as("b_ss")), "b_id")
      .select(col("a_id"), col("b_id"),
        graft.functions.VectorFunctions.sortedIntersectCount(col("a_ss"), col("b_ss"))
          .cast("long").as("inter"), col("a_n"), col("b_n"))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") / (col("a_n") + col("b_n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardT)
      .orderBy("a_id", "b_id")
  }

  /** Winnow-fingerprint near-dup pairs — the MOSS-style sketch rung of
    * the dedup family: candidates = doc pairs sharing ≥ 1 winnowed
    * k-gram fingerprint (TextAnalysis.winnowFps — ~2/(W+1) of the
    * trigram hashes per doc), verified EXACTLY like the other rungs
    * (sorted-merge intersect kernel, jaccard ≥ [[JaccardT]]). The
    * winnowing guarantee (SIGMOD 2003) makes candidate recall structural,
    * not probabilistic: any pair sharing a run of ≥ W+2 consecutive
    * words shares a fingerprint — clones, boilerplate, and quoted blocks
    * can't slip through the sketch, unlike MinHash banding where recall
    * is a probability curve.
    *
    * Scale stance (100 TB): same bucketed shape as the LSH/SimHash band
    * joins — one shuffle of (lang, fingerprint, doc_id) postings (~29%
    * of the shingle postings the full [[qNgramJaccard]] join moves),
    * candidate work Σ_fp df² bounded by fingerprint selectivity, sorted
    * shingle arrays move only for surviving candidates. A hot-fingerprint
    * corpus degrades exactly like hot shingles — and the same
    * prefix-filter fallback ([[qNgramJaccardPrefix]]) applies. */
  def qDedupWinnow(s: SparkSession, dir: String): DataFrame =
    winnowScored(s, dir)
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") / (col("a_n") + col("b_n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardT)
      .orderBy("a_id", "b_id")

  /** Shared winnow-candidate verification stage behind [[qDedupWinnow]] and
    * [[qDedupContainment]]: doc pairs sharing ≥ 1 winnowed fingerprint,
    * with the exact sorted-merge shingle intersection and both set sizes —
    * the two queries differ only in the similarity RATIO they gate on
    * (union-normalized jaccard vs min-normalized containment), so the
    * candidate generation and the exact verify kernel are defined once. */
  private def winnowScored(s: SparkSession, dir: String): DataFrame = {
    val fps = TextAnalysis.winnowFps(s, dir)
    val fa = fps.select(col("lang"), col("fingerprint"), col("doc_id").as("a_id"))
    val fb = fps.select(col("lang"), col("fingerprint"), col("doc_id").as("b_id"))
    val cand = fa.join(fb, Seq("lang", "fingerprint"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val ss = shingled(s, dir).select(col("doc_id"),
      size(col("s")).as("n"), array_sort(col("s")).as("ss"))
    cand
      .join(ss.select(col("doc_id").as("a_id"), col("n").as("a_n"), col("ss").as("a_ss")), "a_id")
      .join(ss.select(col("doc_id").as("b_id"), col("n").as("b_n"), col("ss").as("b_ss")), "b_id")
      .select(col("a_id"), col("b_id"),
        graft.functions.VectorFunctions.sortedIntersectCount(col("a_ss"), col("b_ss"))
          .cast("long").as("inter"), col("a_n"), col("b_n"))
  }

  /** Containment threshold for [[qDedupContainment]] — deliberately BELOW
    * [[JaccardT]]-equivalent symmetric similarity: the query exists to
    * surface pairs where the SMALLER document is largely contained in the
    * larger one even though the symmetric jaccard is tiny (sf0.01: doc 52
    * has 3/11 of its shingles inside doc 190 — containment 0.27, jaccard
    * 0.036, invisible to every jaccard-gated rung). */
  private val ContainT = 0.25

  /** Asymmetric containment near-dups: |A∩B| / min(|A|,|B|) ≥ [[ContainT]]
    * over the same winnow-fingerprint candidates as [[qDedupWinnow]] — the
    * subset-duplicate detector (quoted blocks, boilerplate wrappers, doc-
    * inside-doc) that union-normalized jaccard structurally under-weights:
    * a 10-shingle doc fully pasted into a 1000-shingle doc scores jaccard
    * 0.01 but containment 1.0. The winnowing guarantee is if anything
    * stronger here — a contained run of ≥ W+2 consecutive words is exactly
    * what forces a shared fingerprint (SIGMOD 2003 §2), so candidate
    * recall for contiguous containment is structural, not probabilistic.
    *
    * Scale stance (100 TB): identical shape to [[qDedupWinnow]] — one
    * shuffle of winnow postings (~2/(W+1) of the shingle stream), per-
    * fingerprint bucketed candidate join, sorted arrays move only for
    * surviving candidates. Only the final ratio differs. */
  def qDedupContainment(s: SparkSession, dir: String): DataFrame =
    winnowScored(s, dir)
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") / least(col("a_n"), col("b_n"))).as("containment"),
        (col("inter").cast("double") / (col("a_n") + col("b_n") - col("inter"))).as("jaccard"))
      .filter(col("containment") >= ContainT)
      .orderBy("a_id", "b_id")

  /** Incremental-ingestion dedup — the shape a 100 TB pipeline actually
    * runs: an already-deduplicated historical INDEX (here: even doc_ids,
    * standing in for yesterday's corpus) and an incoming BATCH (odd
    * doc_ids). Report each verified duplicate in the incoming batch,
    * classified by what it collides with: `index` (new doc duplicates a
    * historical doc — drop it, the index wins) or `batch` (two new docs
    * duplicate each other — keep the earlier id). Index-internal pairs
    * are deliberately NOT emitted: the historical corpus is already
    * deduped, re-checking it is exactly the work incremental ingestion
    * exists to avoid.
    *
    * Built as a classification layer over the same [[winnowScored]]
    * candidates and exact-jaccard verify as the batch rungs, so the
    * match rule cannot drift from [[qDedupWinnow]]. At scale the index
    * side's winnow fingerprints are PERSISTED (they are deterministic
    * per document — a parquet table keyed by fingerprint), so each
    * ingestion shuffles only the new batch's postings against the
    * stored index postings; this query recomputes them only because the
    * fixture has no cross-run store. */
  def qDedupIncremental(s: SparkSession, dir: String): DataFrame =
    winnowScored(s, dir)
      .filter(col("a_id") % 2 === 1 || col("b_id") % 2 === 1) // drop index-internal
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") / (col("a_n") + col("b_n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardT)
      .select(
        when(col("a_id") % 2 === 1, col("a_id")).otherwise(col("b_id")).as("new_id"),
        when(col("a_id") % 2 === 1 && col("b_id") % 2 === 1, lit("batch"))
          .otherwise(lit("index")).as("kind"),
        when(col("a_id") % 2 === 1, col("b_id")).otherwise(col("a_id")).as("dup_of"),
        col("jaccard"))
      // batch-internal pairs arrive as (a<b, both odd): keep-earlier means
      // the LARGER id is the duplicate being reported
      .select(
        when(col("kind") === "batch", greatest(col("new_id"), col("dup_of")))
          .otherwise(col("new_id")).as("new_id"),
        when(col("kind") === "batch", least(col("new_id"), col("dup_of")))
          .otherwise(col("dup_of")).as("dup_of"),
        col("kind"), col("jaccard"))
      .orderBy("new_id", "dup_of")

  /** Persisted-index roots for [[qDedupPersisted]] — one build per
    * (JVM, fixture dir), the q_ann_persisted discipline applied to the
    * dedup tier: the historical corpus's winnow-fingerprint POSTINGS and
    * its shingle verification store are parquet artifacts written once. */
  private val dedupIndexRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** 60-bit portable shingle hash for the persisted verification store
    * (15 hex chars of md5 → BIGINT): the store keeps 8-byte hashes, not
    * shingle strings — measured at the sf1 decade, a STRING store read
    * twice per probe costs 2× the in-plan recompute (sorted shingle
    * arrays are ~8× the text), while the hashed store is the production
    * shape. 60 bits make a cross-shingle collision inside any one
    * compared pair (~10² shingles each) a ~1e-14 event, so hash-space
    * intersection counts equal string-space counts in practice; the
    * string-space oracle re-checks that on every verify run. */
  private def sh60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Sorted distinct 60-bit hashes of a shingle array — the ONE store
    * spelling shared by the batch index build ([[hashedStore]]) and the
    * streaming probe's per-row store (Windows.dedupIndexProbeStream), so
    * batch and online verification cannot drift. */
  private[graft] def storeHash(sh: Column): Column =
    array_sort(array_distinct(transform(sh, x => sh60(x))))

  /** Hashed verification store rows (doc_id, n, hs) from a [[shingled]]
    * relation — shared by the index build and the batch side of
    * [[qDedupPersisted]] so the two cannot drift. */
  private def hashedStore(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"), storeHash(col("s")).as("hs"))
      .select(col("doc_id"), size(col("hs")).cast("long").as("n"), col("hs"))

  /** Writes both dedup-index artifacts for the corpus docs matching
    * `keep` — the ONE builder behind [[dedupIndexDir]] (keep = the even
    * historical half) and the spec's from-scratch-rebuild-minus-deleted
    * control, so build and rebuild cannot drift. */
  private[graft] def writeDedupIndex(s: SparkSession, d: String,
      keep: Column, root: String): Unit = {
    TextAnalysis.winnowFps(s, d).filter(keep)
      .write.mode("overwrite").parquet(s"$root/postings.parquet")
    hashedStore(shingled(s, d).filter(keep))
      .write.mode("overwrite").parquet(s"$root/shingles.parquet")
  }

  private[graft] def dedupIndexDir(s: SparkSession, dir: String): String =
    dedupIndexRoots.computeIfAbsent(dir, { d =>
      val root = Ingest.scratchDir("dedupindex", d)
      writeDedupIndex(s, d, col("doc_id") % 2 === 0, root)
      root
    })

  /** [[qDedupIncremental]] against a PERSISTED index — the probe-many
    * production shape: the historical half's fingerprint postings and
    * shingle store come from parquet ([[dedupIndexDir]], built once);
    * the query fingerprints ONLY the incoming batch (the odd half —
    * today's data must be fingerprinted regardless), joins batch
    * postings against the persisted postings (index collisions) and
    * against themselves (batch-internal), and verifies candidates with
    * the same sorted-intersect kernel over the union verification store.
    * Output contract and oracle are IDENTICAL to q_dedup_incremental, so
    * every verify run re-proves the persisted artifacts equal what the
    * in-plan spelling computes; the spec additionally pins row equality
    * and that the probe never fingerprints the index half (inputFiles
    * anchored to the persisted postings).
    *
    * Scale stance (100 TB): the index half is NEVER re-shingled or
    * re-fingerprinted per batch — the probe's text work is O(batch);
    * postings join on (lang, fingerprint) buckets; sorted shingle arrays
    * move only for surviving candidates, the index side's from the
    * columnar store by doc_id. */
  def qDedupPersisted(s: SparkSession, dir: String): DataFrame =
    probeDedupIndex(s, dir, dedupIndexDir(s, dir))

  /** The probe plan of [[qDedupPersisted]] with the index GENERATION
    * and a batch-side liveness predicate injectable — shared with
    * [[qDedupIndexErase]] (and the spec's from-scratch-rebuild control)
    * so every generation of the persisted artifacts is probed by ONE
    * plan and classifications cannot drift between lifecycle verbs.
    * `live` filters the INCOMING batch (the erase verb excludes the
    * deletion subjects there too — a forgotten subject's text may not
    * be fingerprinted or probed, the same both-sides contract as
    * Similarity.qAnnIndexErase); `batch` DEFINES the incoming batch
    * (default: the odd half — the lifecycle chain probes other batch
    * shapes, including re-added even ids); the artifacts need no
    * predicate — a pruned generation simply has fewer rows. */
  private[graft] def probeDedupIndex(s: SparkSession, dir: String,
      root: String, live: Column = lit(true),
      batch: Column = col("doc_id") % 2 === 1): DataFrame = {
    val idxFps = s.read.parquet(s"$root/postings.parquet")
    val idxSs = s.read.parquet(s"$root/shingles.parquet")
    val batchFps = TextAnalysis.winnowFps(s, dir)
      .filter(batch && live)
      // 3 consumers: vs-index join + both batch-internal sides
      .transform(graft.core.Lineage.cut)
    val batchSs = hashedStore(shingled(s, dir)
        .filter(batch && live))
      // 2 consumers (both verification-join sides via the union store)
      .transform(graft.core.Lineage.cut)
    val candIdx = batchFps
      .select(col("lang"), col("fingerprint"), col("doc_id").as("new_id"))
      .join(idxFps.select(col("lang"), col("fingerprint"),
        col("doc_id").as("dup_of")), Seq("lang", "fingerprint"))
      .select(col("new_id"), col("dup_of")).distinct()
      .withColumn("kind", lit("index"))
    val candBatch = batchFps
      .select(col("lang"), col("fingerprint"), col("doc_id").as("a_id"))
      .join(batchFps.select(col("lang"), col("fingerprint"),
        col("doc_id").as("b_id")), Seq("lang", "fingerprint"))
      .filter(col("a_id") < col("b_id"))
      // keep-earlier: the larger batch id is the duplicate being reported
      .select(col("b_id").as("new_id"), col("a_id").as("dup_of")).distinct()
      .withColumn("kind", lit("batch"))
    val store = idxSs.unionByName(batchSs)
    candIdx.unionByName(candBatch)
      .join(store.select(col("doc_id").as("new_id"), col("n").as("n_new"),
        col("hs").as("hs_new")), "new_id")
      .join(store.select(col("doc_id").as("dup_of"), col("n").as("n_dup"),
        col("hs").as("hs_dup")), "dup_of")
      .select(col("new_id"), col("dup_of"), col("kind"),
        graft.functions.VectorFunctions
          .sortedIntersectCount(col("hs_new"), col("hs_dup"))
          .cast("long").as("inter"), col("n_new"), col("n_dup"))
      .select(col("new_id"), col("dup_of"), col("kind"),
        (col("inter").cast("double")
          / (col("n_new") + col("n_dup") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardT)
      .orderBy("new_id", "dup_of")
  }

  /** Erased-generation roots for [[qDedupIndexErase]], one rewrite per
    * (JVM, fixture dir) over the [[dedupIndexDir]] artifacts. */
  private val dedupErasedRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Deletion set for the write-side index erasure: index documents
    * whose doc_id ≡ 0 (mod [[Ingest.ErasureMod]]) — the SAME subject
    * rule the read-side blast-radius audit (q_erasure_audit) scopes, so
    * audit and rewrite answer to one GDPR deletion list. */
  private def erasedDoc(c: Column): Column = Ingest.erasureSubject(c)

  /** Writes the erased GENERATION of the persisted dedup index: both
    * artifacts re-written without the deletion set's rows. Because
    * winnow fingerprints and the hashed shingle store are PER-DOCUMENT
    * deterministic (no corpus statistics anywhere in the artifacts),
    * pruning rows by doc_id is exactly a from-scratch rebuild over the
    * surviving corpus — the property the spec re-proves by building that
    * rebuild and diffing probes. */
  private[graft] def dedupErasedIndexDir(s: SparkSession, dir: String): String =
    dedupErasedRoots.computeIfAbsent(dir, { d =>
      val src = dedupIndexDir(s, d)
      val root = Ingest.scratchDir("dedupindexerase", d)
      s.read.parquet(s"$src/postings.parquet")
        .filter(!erasedDoc(col("doc_id")))
        .write.mode("overwrite").parquet(s"$root/postings.parquet")
      s.read.parquet(s"$src/shingles.parquet")
        .filter(!erasedDoc(col("doc_id")))
        .write.mode("overwrite").parquet(s"$root/shingles.parquet")
      root
    })

  /** Write-side index ERASURE — the delete verb of the persisted-index
    * lifecycle (build: [[dedupIndexDir]]; probe: [[qDedupPersisted]];
    * delete: here), the half of right-to-be-forgotten that
    * q_erasure_audit's read-side blast radius leaves open: rewrite the
    * postings and shingle-store artifacts WITHOUT the subjects' rows
    * (doc_id ≡ 0 mod [[Ingest.ErasureMod]] — the audit's own scope),
    * then run the standard probe over the erased generation with the
    * deletion subjects ALSO excluded from the incoming batch (erased
    * subjects are neither indexed nor probed — the same both-sides
    * contract as qAnnIndexErase, one subject scope across both
    * tiers). Output contract matches q_dedup_persisted minus every
    * pair involving an erased doc on either side; the oracle is the
    * shared incremental CTE chain with the deletion predicate on both
    * pair sides, so the gate re-proves per verify that erasure removed
    * EXACTLY the subjects' pairs and nothing else. The spec
    * additionally pins (a) no erased doc_id survives in either
    * artifact, (b) the pruned generation's probe ≡ a from-scratch
    * rebuild over the surviving corpus (the delete-side twin of
    * q_ann_index_delta's add-side bit-equality), and (c) on an
    * engineered corpus, a batch doc whose ONLY duplicate was erased
    * stops being reported, and an erased batch doc stops being
    * fingerprinted at all.
    *
    * Scale stance (100 TB): the rewrite scans only the index artifacts
    * (a pushdown-friendly predicate per table — at real scale a
    * partition-pruned anti-join against the deletion list), never the
    * corpus text; the probe is unchanged O(batch). */
  def qDedupIndexErase(s: SparkSession, dir: String): DataFrame =
    probeDedupIndex(s, dir, dedupErasedIndexDir(s, dir),
      !erasedDoc(col("doc_id")))

  /** Added-generation roots for [[qDedupIndexAdd]]. */
  private val dedupAddRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A probe's duplicate-id set, Lineage.cut because every builder
    * consumes it from two write jobs (postings + store anti-joins) —
    * without the cut the whole probe's candidate/verify stage would
    * re-execute per artifact write. */
  private def dupIdsOf(probe: DataFrame): DataFrame =
    graft.core.Lineage.cut(probe
      .select(col("new_id").as("doc_id")).distinct())

  private def dedupDupIds(s: SparkSession, d: String): DataFrame =
    dupIdsOf(qDedupPersisted(s, d))

  /** The ADD verb's admission rule — accepted batch postings/store rows
    * (odd ids minus the probe's duplicates) — ONE spelling shared by
    * [[dedupAddedIndexDir]] and the compaction delta files
    * ([[dedupCompactedIndexDir]]) so the two verbs cannot drift. */
  private def acceptedBatchPostings(s: SparkSession, d: String,
      dups: DataFrame,
      batch: Column = col("doc_id") % 2 === 1): DataFrame =
    TextAnalysis.winnowFps(s, d).filter(batch)
      .join(dups, Seq("doc_id"), "left_anti")

  private def acceptedBatchStore(s: SparkSession, d: String,
      dups: DataFrame,
      batch: Column = col("doc_id") % 2 === 1): DataFrame =
    hashedStore(shingled(s, d).filter(batch))
      .join(dups, Seq("doc_id"), "left_anti")

  /** Per-doc artifact summary of an index generation (doc_id, n_fps,
    * n_shingles for docs matching `keep`) — the shared read-back plan
    * of [[qDedupIndexAdd]] and [[qDedupIndexCompact]], anchored to the
    * generation's parquet so the gates check the physical tables. */
  private def artifactSummary(s: SparkSession, root: String,
      keep: Column): DataFrame = {
    val fps = s.read.parquet(s"$root/postings.parquet").filter(keep)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fps"))
    val ss = s.read.parquet(s"$root/shingles.parquet").filter(keep)
      .select(col("doc_id"), col("n").as("n_shingles"))
    fps.join(ss, "doc_id")
      .select(col("doc_id"), col("n_fps"), col("n_shingles"))
      .orderBy("doc_id")
  }

  /** Writes the ADD generation of the persisted dedup index: the
    * ACCEPTED batch docs' postings and store rows (every odd doc NOT
    * classified a duplicate by the probe — keep-earlier admits the
    * earlier side of batch pairs and rejects collisions with the
    * index) are unioned into the existing artifacts. Like the delta
    * encode on the ANN side, nothing historical is recomputed: the
    * batch postings/store rows the probe already needed ARE the rows
    * appended. */
  private[graft] def dedupAddedIndexDir(s: SparkSession, dir: String): String =
    dedupAddRoots.computeIfAbsent(dir, { d =>
      val src = dedupIndexDir(s, d)
      val root = Ingest.scratchDir("dedupindexadd", d)
      val dups = dedupDupIds(s, d)
      s.read.parquet(s"$src/postings.parquet")
        .unionByName(acceptedBatchPostings(s, d, dups))
        .write.mode("overwrite").parquet(s"$root/postings.parquet")
      s.read.parquet(s"$src/shingles.parquet")
        .unionByName(acceptedBatchStore(s, d, dups))
        .write.mode("overwrite").parquet(s"$root/shingles.parquet")
      root
    })

  /** Write-side index ADD — the verb that closes the incremental-ingest
    * loop [[qDedupPersisted]] opens: after probing, the batch's
    * ACCEPTED documents (odd ids not classified duplicates — the
    * keep-earlier admission rule) join the persisted index as a new
    * generation ([[dedupAddedIndexDir]]), so tomorrow's batch probes
    * against today's survivors. The dedup twin of the ANN tier's
    * q_ann_index_delta.
    *
    * Output contract: the admission report read back FROM the new
    * generation's artifacts — one row per ADDED doc with its posting
    * and store-row counts — so the correctness gate checks the physical
    * tables, not an in-plan intermediate. The oracle re-derives the
    * admitted set from the shared incremental chain (duplicates out,
    * survivors in) and counts fingerprints/shingles from the same CTEs;
    * hash-space store counts equal string-space counts under the
    * documented 60-bit collision contract. The spec additionally pins
    * the generation ⊇ the old index, row-exact equality to a
    * from-scratch rebuild over (index ∪ accepted), and the engineered-
    * corpus admission (the batch-pair loser and the index collision are
    * rejected; the pair's earlier side is admitted).
    *
    * Scale stance (100 TB): admission reuses the probe's classification
    * (one anti-join on the duplicate id set, ≪ batch); the appended
    * rows are exactly the batch postings/store the probe already
    * computed — no historical re-fingerprinting, no corpus scan; the
    * summary is a per-doc count over the added ids only. */
  def qDedupIndexAdd(s: SparkSession, dir: String): DataFrame =
    artifactSummary(s, dedupAddedIndexDir(s, dir), col("doc_id") % 2 === 1)

  /** Compacted-generation roots for [[qDedupIndexCompact]]. */
  private val dedupCompactRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Builds the generational layout of the dedup index and compacts
    * it — the dedup twin of Similarity's ANN compaction: a base
    * postings/store generation (the even half, from [[dedupIndexDir]]),
    * ONE delta file per artifact carrying the ADD verb's accepted batch
    * rows (the [[dedupAddedIndexDir]] admission rule, materialized as
    * the separate files an ingest job physically appends), and a
    * tombstone file with the erasure subjects. COMPACTION folds
    * base ∪ delta minus tombstones into `gen1` with one union + one
    * anti-join per artifact — no re-fingerprinting, no text scan. */
  private[graft] def dedupCompactedIndexDir(s: SparkSession, dir: String): String =
    dedupCompactRoots.computeIfAbsent(dir, { d =>
      val root = Ingest.scratchDir("dedupindexcompact", d)
      val gen0 = dedupIndexDir(s, d)
      val dups = dedupDupIds(s, d)
      acceptedBatchPostings(s, d, dups)
        .write.mode("overwrite").parquet(s"$root/delta_postings.parquet")
      acceptedBatchStore(s, d, dups)
        .write.mode("overwrite").parquet(s"$root/delta_shingles.parquet")
      Tables.documents(s, d).select(col("doc_id"))
        .filter(erasedDoc(col("doc_id")))
        .write.mode("overwrite").parquet(s"$root/tombstones.parquet")
      val tomb = s.read.parquet(s"$root/tombstones.parquet")
      s.read.parquet(s"$gen0/postings.parquet")
        .unionByName(s.read.parquet(s"$root/delta_postings.parquet"))
        .join(tomb, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$root/gen1/postings.parquet")
      s.read.parquet(s"$gen0/shingles.parquet")
        .unionByName(s.read.parquet(s"$root/delta_shingles.parquet"))
        .join(tomb, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$root/gen1/shingles.parquet")
      s"$root/gen1"
    })

  /** Dedup index COMPACTION — the generational fold over the full
    * lifecycle: base (build) + delta (the ADD verb's accepted batch) −
    * tombstones (the erasure subjects) compact into one new
    * generation. Output contract is the per-doc artifact summary of
    * the compacted generation (doc_id, n_fps, n_shingles — every
    * member, both historical and admitted), read back FROM the gen1
    * parquet so the gate checks the physical fold. The oracle derives
    * membership from the shared incremental chain (even ∪ odd-minus-
    * duplicates, minus the deletion set) and counts from the same
    * CTEs; the spec additionally pins gen1 ≡ a from-scratch
    * [[writeDedupIndex]] rebuild over exactly that member set and zero
    * tombstoned ids in either artifact.
    *
    * Scale stance (100 TB): compaction is one union + one broadcast
    * anti-join per artifact, all narrow posting/store rows — text is
    * never rescanned; the summary aggregates the compacted postings
    * once, keyed by doc_id. */
  def qDedupIndexCompact(s: SparkSession, dir: String): DataFrame =
    artifactSummary(s, dedupCompactedIndexDir(s, dir), lit(true))

  /** Lifecycle-composition roots for [[qDedupIndexLifecycle]]. */
  private val dedupLifecycleRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Re-consent predicate (the ANN tier's reAddedVec applied to docs):
    * the even-multiple half of the deletion set re-uploads AFTER its
    * erasure, so the day-2 tombstone must not block the day-4 add. */
  private def reAddedDoc(c: Column): Column = Ingest.reconsentedSubject(c)

  /** Builds the multi-day generation CHAIN of the persisted dedup index
    * — the composed sequence the pairwise verbs ([[qDedupIndexAdd]] /
    * [[qDedupIndexErase]] / [[qDedupIndexCompact]]) each proved alone:
    *
    *   day 0  gen0   = the historical build (the even half)
    *   day 1  ADD    batch1 = doc_id ≡ 1 (mod 4), probed against gen0,
    *                  survivors' postings/store rows become delta files
    *   day 2  ERASE  tombstones = the deletion subjects (≡ 0 mod 17)
    *   day 3  COMPACT gen1 = (gen0 ∪ delta1) − tombstones
    *   day 4  ADD    batch2 = the ≡ 3 (mod 4) arrivals (minus forgotten
    *                  subjects) PLUS the re-consented deletion half
    *                  ([[reAddedDoc]]), probed against gen1 → gen2
    *
    * Each verb is the SAME machinery as its pairwise twin (the shared
    * [[probeDedupIndex]] plan, the shared admission helpers) — this
    * builder only chains them, so the lifecycle query proves the verbs
    * compose: day-4 admission answers to day-3's membership, re-added
    * ids are fingerprinted fresh and survive the earlier tombstone, and
    * every generation is pure parquet-row algebra (no re-shingling of
    * history anywhere in the chain). */
  private[graft] def dedupLifecycleIndexDir(s: SparkSession, dir: String): String =
    dedupLifecycleRoots.computeIfAbsent(dir, { d =>
      val root = Ingest.scratchDir("dedupindexlifecycle", d)
      val gen0 = dedupIndexDir(s, d)
      val batch1 = col("doc_id") % 4 === 1
      val dups1 = dupIdsOf(probeDedupIndex(s, d, gen0, batch = batch1))
      acceptedBatchPostings(s, d, dups1, batch1)
        .write.mode("overwrite").parquet(s"$root/delta1_postings.parquet")
      acceptedBatchStore(s, d, dups1, batch1)
        .write.mode("overwrite").parquet(s"$root/delta1_shingles.parquet")
      Tables.documents(s, d).select(col("doc_id"))
        .filter(erasedDoc(col("doc_id")))
        .write.mode("overwrite").parquet(s"$root/tombstones.parquet")
      val tomb = s.read.parquet(s"$root/tombstones.parquet")
      s.read.parquet(s"$gen0/postings.parquet")
        .unionByName(s.read.parquet(s"$root/delta1_postings.parquet"))
        .join(tomb, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$root/gen1/postings.parquet")
      s.read.parquet(s"$gen0/shingles.parquet")
        .unionByName(s.read.parquet(s"$root/delta1_shingles.parquet"))
        .join(tomb, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$root/gen1/shingles.parquet")
      val batch2 = (col("doc_id") % 4 === 3 && !erasedDoc(col("doc_id"))) ||
        reAddedDoc(col("doc_id"))
      val dups2 = dupIdsOf(probeDedupIndex(s, d, s"$root/gen1", batch = batch2))
      s.read.parquet(s"$root/gen1/postings.parquet")
        .unionByName(acceptedBatchPostings(s, d, dups2, batch2))
        .write.mode("overwrite").parquet(s"$root/gen2/postings.parquet")
      s.read.parquet(s"$root/gen1/shingles.parquet")
        .unionByName(acceptedBatchStore(s, d, dups2, batch2))
        .write.mode("overwrite").parquet(s"$root/gen2/shingles.parquet")
      s"$root/gen2"
    })

  /** END-TO-END dedup-index lifecycle — add → erase → compact → add
    * composed on one generation chain ([[dedupLifecycleIndexDir]]),
    * reported as the per-doc artifact summary of the FINAL generation
    * (read back from the gen2 parquet, so the gate checks the physical
    * fold). The oracle derives the surviving logical membership from
    * the shared candidate/verify CTE chain staged twice — day-1
    * admission against the historical half, day-4 admission against
    * the compacted membership — so every verify run re-proves the
    * verbs' ASSOCIATIVITY: the chained generations hold exactly the
    * rows a from-scratch build over the surviving membership would
    * (the spec pins that rebuild row-equal, plus re-added subjects
    * present and forgotten subjects absent).
    *
    * Scale stance (100 TB): each day's work is O(that day's batch) —
    * probes fingerprint only the arrivals, folds are unions plus one
    * broadcast anti-join on narrow posting/store rows, and the corpus
    * text is never re-scanned for any historical doc. */
  def qDedupIndexLifecycle(s: SparkSession, dir: String): DataFrame =
    artifactSummary(s, dedupLifecycleIndexDir(s, dir), lit(true))

  /** Quality-aware dedup survivor selection — the step that turns the
    * cluster labeling ([[qDedupClusters]]) into the RETAINED corpus: per
    * near-dup cluster keep the member with the MOST tokens (tie → lowest
    * doc_id), drop the rest, pass every unclustered document through.
    * This is the "keep the best copy" policy production dedup pipelines
    * apply (the min-id canonical in q_dedup_clusters is the labeling
    * convention; the survivor policy is a quality argmax over members).
    *
    * Scale stance (100 TB): cluster membership rows exist only for docs
    * in ≥ 1 near-dup pair (≪ corpus); the per-cluster argmax is a tiny
    * grouped max_by over those rows; the final anti-join shuffles narrow
    * (doc_id, n_tokens) pairs once. Nothing here touches text after the
    * token count, and no stage is proportional to corpus × clusters. */
  def qDedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    // cut (r14): consumed by the members join AND the final anti-join —
    // without it each consumer re-scanned and re-tokenized the corpus
    val counted = graft.core.Lineage.cut(Tables.documents(s, dir)
      .select(col("doc_id"), size(toks).as("n_tokens")))
    val pairs = qDedupMinhash(s, dir)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val clusters = components(pairs)
    val members = clusters.join(counted, clusters("id") === counted("doc_id"))
    val reps = members
      .groupBy(col("lbl"))
      .agg(max_by(col("doc_id"), struct(col("n_tokens"), -col("doc_id"))).as("rep_id"))
    val losers = members.join(broadcast(reps), "lbl")
      .filter(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id"))
    counted.join(losers, Seq("doc_id"), "left_anti")
      .join(broadcast(reps.select(col("rep_id").as("doc_id"),
        lit(true).as("in_cluster"))), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        when(col("in_cluster"), lit("rep")).otherwise(lit("unique")).as("status"))
      .orderBy("doc_id")
  }

  /** Embedding-cosine near-dup pairs, blocked by `label` (the coarse
    * partition): cosine ≥ 0.4 (fixture max ≈ 0.475 within-label). Dot and
    * norms are sequential double folds — same order in both engines —
    * and the output value is rounded to 6 dp. At 100 TB the label (or an
    * LSH bucket, see Similarity) is the blocking key: the join is
    * per-block local after one shuffle on the block key. */
  def qDedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val a = e.select(col("label"), col("vec_id").as("a_id"), col("v").as("a_v"))
    val b = e.select(col("label"), col("vec_id").as("b_id"), col("v").as("b_v"))
    a.join(b, "label").filter(col("a_id") < col("b_id"))
      .select(col("label"), col("a_id"), col("b_id"),
        // fused single-pass kernel (graft.plans.CosineSimilarity): same
        // left-to-right accumulation as the oracle's sequential list_sum
        graft.functions.VectorFunctions.cosineSim(col("a_v"), col("b_v")).as("cos_raw"))
      .filter(col("cos_raw") >= 0.4)
      .select(col("label"), col("a_id"), col("b_id"),
        round(col("cos_raw"), 6).as("cosine"))
      .orderBy("a_id", "b_id")
  }

  /** [[qDedupSpans]] constants: gram width K (spans are runs of K-word
    * grams, so the minimum reportable span is MinRun + K − 1 = 8 words),
    * the minimum run of consecutive shared grams, and the
    * document-frequency cap excluding boilerplate stopgrams from seeding
    * (fixture max df = 2 — the cap is non-binding here, so the fixture
    * answer IS the unrestricted exact answer; it exists for the hot-gram
    * corpus where a header shared by every doc would otherwise pay
    * Σ df² in the pair join, the q_ngram_jaccard postings caveat). */
  private val SpanK = 5
  private val SpanMinRun = 4
  private val SpanDfCap = 128

  /** Exact duplicated-SUBSTRING spans across documents — for each
    * within-language doc pair, every maximal run of ≥ [[SpanMinRun]]
    * consecutive shared [[SpanK]]-word grams, reported as (start_a,
    * start_b, span length in words). This is the span-level rung of the
    * dedup ladder (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", ACL'22): exact/minhash/winnow decide
    * WHETHER two docs overlap; this query says WHERE, which is what you
    * need to cut the duplicated passage out instead of dropping a whole
    * document.
    *
    * Plan: positional k-gram postings (lang, gram-h32, doc, pos) — the
    * grams come from the trigrams-style zip_with chain (the element_at-
    * over-sequence spelling re-derives the token array per element,
    * the measured O(n²) cliff) and hash to h32 so only narrow integer
    * rows shuffle, never text. Pair join on (lang, gram) aligns every
    * co-occurrence; a run of consecutive shared grams has CONSTANT
    * offset pa − pb, so maximal runs are gaps-and-islands per
    * (a, b, offset): island = pa − row_number(), one window over the
    * matched pairs only. |span| = run + K − 1.
    *
    * Scale stance (100 TB): work is Σ_gram df² like the postings
    * jaccard — optimal for content-bearing grams (5-word grams are far
    * rarer than 3-shingles; fixture max df = 2) — with the df cap as
    * the documented boilerplate guard; the islands window partitions by
    * (a, b, offset), so state is one run counter per live pair-offset,
    * and only matched-pair rows (damage-proportional, not corpus-
    * proportional) ever reach it. */
  def qDedupSpans(s: SparkSession, dir: String): DataFrame =
    dedupSpans(Tables.documents(s, dir))

  /** Core of [[qDedupSpans]] over any (doc_id, lang, text) relation —
    * exposed so DedupSimilaritySpec can pin exact span boundaries on
    * hand-built passages. */
  private[graft] def dedupSpans(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // K-word grams as a zip_with fold: g_i = w_i ⊕ w_{i+1} ⊕ … ⊕ w_{i+K-1}
    val grams = (2 to SpanK).foldLeft(col("w")) { (acc, j) =>
      zip_with(acc, slice(col("w"), lit(j), greatest(size(col("w")) - (j - 1), lit(0))),
        (x, y) => concat(x, lit(" "), y))
    }
    val g = docs
      .select(col("doc_id"), col("lang"), toks.as("w"))
      .filter(size(col("w")) >= SpanK)
      .select(col("lang"), col("doc_id"),
        posexplode(transform(filter(grams, _.isNotNull), x => TextPipeline.h32(x)))
          .as(Seq("pos", "gram")))
      .repartition(col("lang"), col("gram"))
    // df per (lang, gram): co-partitioned with g — no extra exchange for
    // the cap join; the cap keeps boilerplate grams out of the pair join
    val dfT = g.groupBy(col("lang"), col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") <= SpanDfCap)
      .select("lang", "gram")
    val post = g.join(dfT, Seq("lang", "gram"), "left_semi")
    val pairs = post.select(col("lang"), col("gram"), col("doc_id").as("a_id"), col("pos").as("pa"))
      .join(post.select(col("lang"), col("gram"), col("doc_id").as("b_id"), col("pos").as("pb")),
        Seq("lang", "gram"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("pa"), (col("pa") - col("pb")).as("off"))
    val w = Window.partitionBy(col("a_id"), col("b_id"), col("off"))
      .orderBy(col("pa"))
    pairs
      .withColumn("island", col("pa") - row_number().over(w))
      .groupBy(col("a_id"), col("b_id"), col("off"), col("island"))
      .agg(min(col("pa")).as("a_start"), count(lit(1)).as("run"))
      .filter(col("run") >= SpanMinRun)
      .select(col("a_id"), col("b_id"), col("a_start"),
        (col("a_start") - col("off")).as("b_start"),
        (col("run") + (SpanK - 1)).as("span_words"))
      .orderBy("a_id", "b_id", "a_start", "b_start")
  }

  /** Minimum duplicated-substring length (in tokens) for
    * [[qDedupSubstrings]] — deliberately NOT a power of two so the
    * overlapping-window combine (the general-L construction) is
    * exercised, not just the doubling rounds. */
  private[graft] val SubstrL = 12

  /** The PRODUCTION threshold (Lee et al. ACL'22 cut duplicated
    * substrings of ≥ 50 tokens) — [[qDedupSubstrings50]] runs the same
    * doubling chain at this width: 5 doubling rounds (widths
    * 2, 4, 8, 16, 32) + one overlapping combine at offset 18, i.e. the
    * ⌈log₂ L⌉-shuffle claim measured where a 100 TB pipeline actually
    * sets the knob, not asserted from L = 12. */
  private[graft] val SubstrL50 = 50

  /** 60-bit position key (15 hex chars of md5 → BIGINT) — the [[sh60]]
    * collision contract applied to the doubling chain: within any one
    * corpus-level gram population (~10⁵ here, ~10¹¹ even at 100 TB) a
    * 60-bit collision between DIFFERENT substrings is ≪ 1 per corpus,
    * and the string-space oracle re-checks on every verify run. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Corpus-wide duplicated-SUBSTRING spans — the suffix-array rung of
    * the dedup ladder (Lee et al. ACL'22 find all ≥50-token duplicated
    * substrings via a suffix array; [[qDedupSpans]] is its pair-wise
    * little sibling): every maximal per-document run of positions whose
    * [[SubstrL]]-token substring occurs ≥ 2 times ANYWHERE in the corpus
    * (other documents or elsewhere in the same one), reported as
    * (doc_id, start_pos, span_tokens). A position is covered by some
    * duplicated substring of length ≥ L iff its L-gram is duplicated, so
    * maximal runs of duplicated L-gram starts are exactly the maximal
    * duplicated regions the suffix-array recipe cuts.
    *
    * Construction is bounded PREFIX DOUBLING (Manber–Myers, SIAM
    * J. Comput. 1993, truncated at depth L — the suffix-array step that
    * matters for a fixed minimum length): position keys start as 60-bit
    * token hashes and each round combines key(i) with key(i + 2ᵏ) into a
    * width-2ᵏ⁺¹ key; L = 12 is reached by combining the two OVERLAPPING
    * width-8 keys at i and i+4 (equal 12-grams ⇔ equal key pairs — the
    * sparse-table trick, so ANY L needs only ⌈log₂ L⌉ rounds + 1
    * combine). Nothing ever materializes an L-token string: each round
    * shuffles narrow (doc_id, pos, key BIGINT) rows once, which is the
    * whole 100 TB point — at L = 50 the direct spelling builds 50-token
    * strings per position (~50× the corpus over the wire), the doubling
    * chain moves 6 rounds × 16 bytes.
    *
    * The ORACLE is the direct string-space L-gram spelling over the same
    * token CTEs (group the literal 12-gram, count ≥ 2, gaps-and-islands)
    * — so every verify run re-proves the doubling chain AND the 60-bit
    * collision contract against ground truth.
    *
    * Scale stance (100 TB): ⌈log₂ L⌉ self-joins co-keyed on
    * (doc_id, pos) — narrow rows, no data-dependent skew (positions are
    * per-doc sequential); the occurrence count is one hash aggregate on
    * the 8-byte final key (hot boilerplate keys cost a count, never a
    * pair join — there is NO Σdf² term anywhere, unlike posting-join
    * rungs); islands are per-doc windows over dup positions only. */
  def qDedupSubstrings(s: SparkSession, dir: String): DataFrame =
    dedupSubstrings(Tables.documents(s, dir))

  /** [[qDedupSubstrings]] at the production threshold [[SubstrL50]] —
    * the round-13 verdict's gap #1 closed: the rung's scale claim
    * ("ANY L costs ⌈log₂ L⌉ narrow shuffles, no L-token string ever
    * materialized") measured AT L = 50, the Lee et al. ACL'22 recipe's
    * own cut. The chain is the identical construction, one parameter
    * apart: widths 1→2→4→8→16→32 by doubling, then the overlapping
    * sparse-table combine of the width-32 keys at i and i + 18 (equal
    * 50-grams ⇔ equal key pairs since 18 ≤ 32). 6 shuffles of 16-byte
    * (doc_id, pos, key) rows versus the direct spelling's ~50× corpus
    * width — the gap that decides whether the rung survives 100 TB.
    * Oracle = the direct string-space 50-gram spelling over the same
    * token CTEs, so the L = 50 chain AND its collision contract are
    * re-proven against ground truth on every verify run. */
  def qDedupSubstrings50(s: SparkSession, dir: String): DataFrame =
    dedupSubstrings(Tables.documents(s, dir), SubstrL50)

  /** The CUT action the substring rung exists to feed (Lee et al.
    * ACL'22's exact-substring tool doesn't just report duplicated spans
    * — it removes every occurrence but one): for each duplicated
    * [[SubstrL50]]-gram key, the corpus-wide canonical occurrence is the
    * lexicographically first (doc_id, pos); every OTHER occurrence marks
    * its L covered positions cut; per affected document, report total /
    * cut / kept token counts — the before/after a training-data run
    * records when it applies the dedup.
    *
    * Keep-first is per KEY, so overlapping duplicated regions union
    * their cut positions (distinct), and a document repeating a passage
    * internally keeps exactly its first copy — matching the span rung's
    * ≥2-total-occurrences rule.
    *
    * Oracle = the direct string-space spelling: literal 50-grams,
    * count(*) OVER (PARTITION BY gram) with row_number for the
    * canonical, position explosion, distinct, per-doc counts — so the
    * hash-chain cut set is re-proven against ground truth per verify.
    *
    * Scale stance (100 TB): the only step beyond the shared
    * [[substringKeys]] chain is a join of dup occurrences against a
    * (key, canonical) aggregate — both sized by DUPLICATE density, not
    * the corpus — and an L× position explosion of the non-canonical
    * occurrences only (bounded by dup volume; the corpus never
    * explodes). Per-doc counts are one hash aggregate. */
  def qDedupCut(s: SparkSession, dir: String): DataFrame =
    dedupCut(Tables.documents(s, dir))

  /** Core of [[qDedupCut]] over any (doc_id, text) relation — exposed so
    * the spec pins exact cut counts (cross-doc canonical, same-doc
    * keep-first, near-miss exclusion) on the engineered L=50 corpus. */
  private[graft] def dedupCut(docs: DataFrame): DataFrame = {
    val kL = substringKeys(docs, SubstrL50)
    val canon = kL.groupBy(col("k"))
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col("doc_id"), col("pos"))).as("c"))
      .filter(col("n_occ") >= 2)
      .select(col("k"), col("c.doc_id").as("c_doc"), col("c.pos").as("c_pos"))
    val cutPos = kL.join(canon, Seq("k"))
      .filter(!(col("doc_id") === col("c_doc") && col("pos") === col("c_pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (SubstrL50 - 1))).as("cp"))
      .distinct()
    val counts = docs.select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
    cutPos.groupBy(col("doc_id")).agg(count(lit(1)).as("n_cut"))
      .join(counts, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("n_cut"),
        (col("n_tokens") - col("n_cut")).as("n_kept"))
      .orderBy("doc_id")
  }

  /** The width-L position-key relation (doc_id, pos, k) behind the
    * substring family — the bounded Manber–Myers doubling chain shared
    * by the span report ([[dedupSubstrings]]) and the cut action
    * ([[qDedupCut]]): width-1 keys are 60-bit token hashes; doubling
    * rounds reach width p = 2^⌊log₂L⌋ (offsets 1, 2, …, p/2); unless
    * L is a power of two, one overlapping sparse-table combine at
    * offset L − p (valid because L − p < p) lands width-L keys at every
    * valid L-gram start. The whole chain costs ONE narrow 16-byte
    * shuffle (hash by doc_id) + one per-doc sort: every round is a
    * lead(off) window over the same (doc_id, pos) order, so Spark
    * stacks all ⌈log₂L⌉ rounds behind a single Exchange (r14
    * optimization; the former per-round self-join spelling paid
    * ⌈log₂L⌉ shuffles). No L-token string ever materializes. The
    * result ships lineage-cut:
    * most consumers (span report, cut action, probes) read it twice
    * (occurrence count + semi-join); the one single-read consumer
    * ([[substrIndexDir]]'s store write) pays one redundant checkpoint
    * at build time, accepted over a parameter that would let the two
    * paths drift. */
  private def substringKeys(docs: DataFrame, L: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // width-1 keys: one narrow (doc_id, pos, key) row per token
    val base = docs
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), h60(col("w")).as("k"))
    // One doubling/combine step: key'(i) = h60(key(i) || ':' || key(i+off)).
    // Spelled as lead(off) over the per-doc position order, NOT a self-join
    // on (doc_id, pos − off): positions are provably DENSE per document at
    // every round (posexplode emits 0..n−1; each round keeps the prefix
    // 0..n−width, still consecutive), so the row `off` places later IS the
    // row at pos + off, and the join's "partner exists" semantics is
    // exactly lead ≠ null. Every round shares ONE window spec — Spark
    // plans the whole chain as a single Exchange(doc_id) + a single sort
    // with stacked Window operators (guide §2.4: operations keyed the same
    // way share one exchange), where the join spelling paid per round one
    // shuffle + two sorts + an eager lineage-cut job. Same rows out, so
    // the string-space oracle and every downstream gate are unchanged.
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    def widen(df: DataFrame, off: Int): DataFrame =
      df.select(col("doc_id"), col("pos"), col("k").as("ka"),
          lead(col("k"), off).over(w).as("kb"))
        .filter(col("kb").isNotNull)
        .select(col("doc_id"), col("pos"),
          h60(concat_ws(":", col("ka"), col("kb"))).as("k"))
    val p = Integer.highestOneBit(L)
    val offsets = Iterator.iterate(1)(_ * 2).takeWhile(_ < p).toSeq
    val kp = offsets.foldLeft(base)(widen)
    graft.core.Lineage.cut(if (p == L) kp else widen(kp, L - p))
  }

  /** Persisted substring-key index roots for [[qSubstrIncremental]]. */
  private val substrIndexRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Writes the historical substring-key INDEX: per width-[[SubstrL50]]
    * key of the even-doc_id corpus half (standing in for yesterday's
    * already-processed corpus), its per-DOCUMENT occurrence count —
    * postings keyed by (k, doc_id) so the erase verb can prune rows by
    * subject, exactly the dedup-index doctrine (the store rows are
    * per-document deterministic: no corpus statistic lives in them, so
    * prune ≡ rebuild-over-survivors). The probe derives the serving
    * aggregate sum(cnt) per key on read; a production store compacts
    * that aggregate alongside, folding it on each generation flip. */
  private[graft] def substrIndexDir(s: SparkSession, dir: String): String =
    substrIndexRoots.computeIfAbsent(dir, { d =>
      val root = Ingest.scratchDir("substrix", d)
      substringKeys(Tables.documents(s, d).filter(col("doc_id") % 2 === 0),
          SubstrL50)
        .groupBy(col("k"), col("doc_id")).agg(count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(s"$root/keys.parquet")
      root
    })

  /** Erased-generation roots for [[qSubstrIndexErase]]. */
  private val substrErasedRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Writes the erased GENERATION of the substring-key store: gen0's
    * postings minus the erasure subjects' rows — a PRUNE, sound here
    * because each (k, doc_id, cnt) row is a pure function of its own
    * document (contrast [[graft.queries.Analytics.qHllStoreErase]],
    * where max-fold registers force a rebuild). */
  private[graft] def substrErasedIndexDir(s: SparkSession, dir: String): String =
    substrErasedRoots.computeIfAbsent(dir, { d =>
      val root = Ingest.scratchDir("substrixerase", d)
      s.read.parquet(s"${substrIndexDir(s, d)}/keys.parquet")
        .filter(!erasedDoc(col("doc_id")))
        .write.mode("overwrite").parquet(s"$root/keys.parquet")
      root
    })

  /** Incremental substring dedup — the persisted-index doctrine applied
    * to the SUFFIX tier, closing the family's lifecycle the way the
    * winnow/ANN/HLL tiers already close theirs: the historical corpus's
    * width-50 key COUNTS live in a parquet store ([[substrIndexDir]] —
    * written once; at scale, yesterday's doubling chain never re-runs),
    * and each ingestion runs the ⌈log₂50⌉-shuffle chain over the NEW
    * BATCH ONLY (odd doc_ids), probing the store with one join on the
    * 8-byte key. A batch position is duplicated iff its key's total
    * occurrences — batch count + stored count — reach 2, which makes the
    * output EXACTLY the full-corpus span report restricted to batch
    * documents: the oracle is [[substringsOracleSql]]'s chain with the
    * batch predicate on the final rows, so every verify re-proves
    * store-probe ≡ full recompute (the associativity that makes the
    * index sound).
    *
    * Scale stance (100 TB): the expensive object — the corpus-wide
    * doubling chain — is amortized into the store; per arrival the
    * chain costs O(batch · log L) narrow shuffles and the probe is a
    * key join against a (key, count) table bounded by DISTINCT key
    * count (hot boilerplate keys stay one row). Erasure composes like
    * the dedup index: prune the erased docs' postings and re-aggregate
    * counts (counts are summable — no rebuild needed, unlike the HLL
    * max-fold store). */
  def qSubstrIncremental(s: SparkSession, dir: String): DataFrame =
    substrProbe(s, dir, substrIndexDir(s, dir), lit(true))

  /** Right-to-be-forgotten for the substring-key store: the probe served
    * from the ERASED generation ([[substrErasedIndexDir]] — gen0 minus
    * the subjects' postings), with the deletion predicate applied to the
    * incoming batch too (an erased subject must neither be matched
    * against nor reported — the q_dedup_index_erase contract). Oracle =
    * the direct string-space chain over the SURVIVING corpus, so every
    * verify re-proves prune ≡ from-scratch rebuild over survivors — the
    * per-document-determinism property that makes prune sound for
    * posting stores (and that the HLL store's max-folds lack). */
  def qSubstrIndexErase(s: SparkSession, dir: String): DataFrame =
    substrProbe(s, dir, substrErasedIndexDir(s, dir),
      !erasedDoc(col("doc_id")))

  /** Shared probe of a substring-key store generation: batch = the odd
    * half under `keep`, chain over the batch only, duplicated iff batch
    * count + stored count ≥ 2, gaps-and-islands spans. ONE spelling for
    * the incremental and erased-generation verbs so the match rule
    * cannot drift. */
  private def substrProbe(s: SparkSession, dir: String, idxRoot: String,
      keep: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idx = s.read.parquet(s"$idxRoot/keys.parquet")
      .groupBy(col("k")).agg(sum(col("cnt")).as("idx_occ"))
    // substringKeys already lineage-cuts its result — no second cut
    val batch = substringKeys(
      Tables.documents(s, dir).filter(col("doc_id") % 2 === 1 && keep),
      SubstrL50)
    val dupKeys = batch.groupBy(col("k")).agg(count(lit(1)).as("b_occ"))
      .join(idx, Seq("k"), "left")
      .filter(col("b_occ") + coalesce(col("idx_occ"), lit(0L)) >= 2)
      .select("k")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    batch.join(dupKeys, Seq("k"), "left_semi")
      .withColumn("grp", col("pos") - row_number().over(wDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("start_pos"), count(lit(1)).as("run"))
      .select(col("doc_id"), col("start_pos"),
        (col("run") + (SubstrL50 - 1)).as("span_tokens"))
      .orderBy("doc_id", "start_pos")
  }

  /** Core of [[qDedupSubstrings]] over any (doc_id, text) relation —
    * exposed so the spec can pin exact span boundaries on engineered
    * corpora with known repeated passages, and parameterized by the
    * minimum span length L (general construction: see
    * [[substringKeys]]). */
  private[graft] def dedupSubstrings(docs: DataFrame, L: Int = SubstrL): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kL = substringKeys(docs, L)
    val dupKeys = kL.groupBy(col("k"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select("k")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    kL.join(dupKeys, Seq("k"), "left_semi")
      .withColumn("grp", col("pos") - row_number().over(wDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("start_pos"), count(lit(1)).as("run"))
      .select(col("doc_id"), col("start_pos"),
        (col("run") + (L - 1)).as("span_tokens"))
      .orderBy("doc_id", "start_pos")
  }

  // ---- train/eval hygiene (round-11 wave 3) --------------------------------

  /** Deterministic doc-space split shared with `Corpus.qDecontaminate`:
    * the SAME pmod(h32(doc_id), 100) bucketing, with buckets ≥ 90 as
    * the held-out slice — so the leakage audit and the contamination
    * scorer measure one split, not two conventions. Zero stored state;
    * both engines compute it identically. */
  private def isEvalDoc(id: Column): Column =
    pmod(h32(id.cast("string")), lit(100L)) >= 90L
  private def duckIsEval(idExpr: String): String =
    s"${duckH32(s"CAST($idExpr AS VARCHAR)")} % 100 >= 90"

  /** Train/eval split-leakage audit: the verified MinHash near-dup pairs
    * ([[qDedupMinhash]] — SAME operator, so the edge definition cannot
    * drift) classified by which side of the [[isEvalDoc]] split each
    * endpoint landed on (the split `Corpus.qDecontaminate` scores n-gram
    * overlap against — this is its NEAR-DUP complement: exact-overlap
    * contamination there, fuzzy-duplicate leakage here). A `leak` pair
    * is a near-duplicate straddling the boundary — the eval doc is
    * effectively in the training set (the failure mode benchmark
    * decontamination exists to prevent; Lee et al. ACL'22 §6.2 measured
    * the perplexity distortion). Output per class: pair count + distinct
    * documents involved.
    *
    * Scale: adds one map-side classification and a class-cardinality
    * (≤3 rows) aggregate on top of the production pair pipeline —
    * leakage auditing costs nothing beyond the dedup you already run. */
  def qSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    def bucket(id: Column): Column =
      when(isEvalDoc(id), lit("eval")).otherwise(lit("train"))
    // the SAME candidate relation + operating point as q_dedup_minhash
    // (shared minhashCandsM), minus its presentation sort — the
    // classifier aggregates anyway. Lineage-cut (r14, guide §2.4): BOTH
    // aggregates below consume this relation, and exchange reuse only
    // deduplicated the band-join broadcast — the probe-side signature
    // pipeline (tokenize, 32-hash sigs, band explode, agreement filter)
    // executed once per consumer. The cut materializes the tiny verified
    // pair set once (pair-cardinality ≪ corpus), so the doc-side scan +
    // signature work runs exactly once.
    val cls = graft.core.Lineage.cut(minhashCandsM(s, dir)
      .filter(col("m") >= 16)
      .select(col("a_id"), col("b_id"),
        bucket(col("a_id")).as("ab"), bucket(col("b_id")).as("bb"))
      .select(col("a_id"), col("b_id"),
        when(col("ab") === col("bb"),
          when(col("ab") === "eval", lit("eval_eval"))
            .otherwise(lit("train_train")))
          .otherwise(lit("leak")).as("pair_class")))
    val pairsPer = cls.groupBy(col("pair_class"))
      .agg(count(lit(1)).as("n_pairs"))
    val docsPer = cls
      .select(col("pair_class"),
        explode(array(col("a_id"), col("b_id"))).as("doc_id"))
      .groupBy(col("pair_class"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    pairsPer.join(docsPer, "pair_class").orderBy("pair_class")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_split_leakage" -> (qSplitLeakage _),
    "q_training_pairs" -> (qTrainingPairs _),
    "q_dedup_spans" -> (qDedupSpans _),
    "q_dedup_substrings" -> (qDedupSubstrings _),
    "q_dedup_substrings50" -> (qDedupSubstrings50 _),
    "q_dedup_cut" -> (qDedupCut _),
    "q_substr_incremental" -> (qSubstrIncremental _),
    "q_substr_index_erase" -> (qSubstrIndexErase _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_minhash_signature" -> (qMinhashSignature _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_dedup_eval" -> (qDedupEval _),
    "q_dedup_operating_curve" -> (qDedupOperatingCurve _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_edit_distance" -> (qEditDistance _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_simhash_pairs" -> (qSimhashPairs _),
    "q_dedup_latest" -> (qDedupLatest _),
    "q_ngram_jaccard" -> (qNgramJaccard _),
    "q_ngram_jaccard_prefix" -> (qNgramJaccardPrefix _),
    "q_dedup_winnow" -> (qDedupWinnow _),
    "q_dedup_incremental" -> (qDedupIncremental _),
    "q_dedup_persisted" -> (qDedupPersisted _),
    "q_dedup_index_erase" -> (qDedupIndexErase _),
    "q_dedup_index_add" -> (qDedupIndexAdd _),
    "q_dedup_index_compact" -> (qDedupIndexCompact _),
    "q_dedup_index_lifecycle" -> (qDedupIndexLifecycle _),
    "q_dedup_containment" -> (qDedupContainment _),
    "q_dedup_survivors" -> (qDedupSurvivors _),
    "q_dedup_embedding" -> (qDedupEmbedding _),
  )

  // ---- oracle SQL ----------------------------------------------------------

  /** The zip_with K-gram chain's SQL twin (index arithmetic is fine in
    * DuckDB — lists are materialized values, no per-element re-derivation)
    * plus the identical df cap, pair join, and gaps-and-islands window. */
  private lazy val spansOracle: String = {
    val gramExpr = (0 until SpanK).map {
      case 0 => "w[i]"
      case j => s"w[i+$j]"
    }.mkString(" || ' ' || ")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, lang, ${TextPipeline.duckToks} AS w FROM documents),
       |g AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    list_transform(range(1, len(w) - ${SpanK - 1} + 1),
       |      i -> ${duckH32(gramExpr)}) AS gs
       |  FROM toks WHERE len(w) >= $SpanK),
       |p AS MATERIALIZED (
       |  SELECT doc_id, lang, unnest(gs) AS gram,
       |         unnest(range(0, len(gs))) AS pos FROM g),
       |keep AS MATERIALIZED (
       |  SELECT lang, gram FROM (
       |    SELECT lang, gram, count(DISTINCT doc_id) AS df FROM p GROUP BY 1, 2)
       |  WHERE df <= $SpanDfCap),
       |pk AS MATERIALIZED (
       |  SELECT p.* FROM p SEMI JOIN keep ON p.lang = keep.lang AND p.gram = keep.gram),
       |pairs AS MATERIALIZED (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS pa,
       |         a.pos - b.pos AS off
       |  FROM pk a JOIN pk b
       |    ON a.lang = b.lang AND a.gram = b.gram AND a.doc_id < b.doc_id),
       |isl AS (
       |  SELECT a_id, b_id, off, pa,
       |         pa - row_number() OVER (PARTITION BY a_id, b_id, off ORDER BY pa)
       |           AS island
       |  FROM pairs),
       |runs AS (
       |  SELECT a_id, b_id, off, island, min(pa) AS a_start,
       |         count(*) AS run
       |  FROM isl GROUP BY 1, 2, 3, 4)
       |SELECT a_id, b_id, a_start, a_start - off AS b_start,
       |       CAST(run + ${SpanK - 1} AS BIGINT) AS span_words
       |FROM runs WHERE run >= $SpanMinRun
       |ORDER BY a_id, b_id, a_start, b_start""".stripMargin
  }

  private val duckSh = duckShingles("w")

  /** Shared CTE chain ending in `cand(a_id, b_id, est_jaccard)` — the
    * MinHash/LSH candidate pairs; used by both the pair query and the
    * cluster closure so the edge definition cannot drift. */
  private lazy val minhashCandCte =
    s"""$sigCte,
       |bands AS (
       |  SELECT doc_id, sig, band_id,
       |    md5(array_to_string(list_transform(sig[band_id*$RowsPerBand+1 : band_id*$RowsPerBand+$RowsPerBand], x -> CAST(x AS VARCHAR)), ',')) AS band_key
       |  FROM sigs, (SELECT unnest(range(0, $Bands)) AS band_id)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(len(list_filter(range(1, ${NumHashes + 1}), i -> a.sig[i] = b.sig[i])) AS DOUBLE) / $NumHashes AS est_jaccard
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id)""".stripMargin

  /** Shared CTE ending in `simhashed(doc_id, simhash)` — the oracle twin
    * of [[simhashes]]. */
  private lazy val simhashCte =
    s"""hs AS (SELECT doc_id,
       |  list_transform($duckToks, t -> ${duckH32("t")}) AS hs FROM documents),
       |simhashed AS (SELECT doc_id,
       |  list_sum(list_transform(range(0, 32), j ->
       |    CASE WHEN 2 * len(list_filter(hs, h -> (h // (1::BIGINT << j)) % 2 = 1)) - len(hs) > 0
       |         THEN (1::BIGINT << j) ELSE 0 END))::BIGINT AS simhash
       |  FROM hs)""".stripMargin

  /** Shared CTE chain ending in `cand(a_id, b_id)` (winnow-fingerprint
    * candidate pairs) and `sh(doc_id, s)` (distinct shingle sets) — the
    * oracle twin of [[winnowScored]]'s candidate generation, used by both
    * q_dedup_winnow and q_dedup_containment so the fingerprint selection
    * rule cannot drift between the two verifiers. */
  private lazy val winnowCandCte = {
    val wm1 = TextAnalysis.WinnowW - 1
    s"""toks AS (SELECT doc_id, lang, $duckToks AS w FROM documents),
       |g AS (SELECT doc_id, lang,
       |        list_transform(${TextPipeline.duckTrigrams("w")},
       |          t -> ${TextPipeline.duckH32("t")}) AS hs
       |      FROM toks),
       |f AS (SELECT doc_id, lang, unnest(list_distinct(
       |        list_transform(range(1, greatest(len(hs) - $wm1, 1) + 1),
       |          i -> list_min(list_slice(hs, i, i + $wm1))))) AS fp
       |      FROM g WHERE len(hs) >= 1),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM f a JOIN f b ON a.lang = b.lang AND a.fp = b.fp
       |           AND a.doc_id < b.doc_id),
       |sh AS (SELECT doc_id, $duckSh AS s FROM toks WHERE len(w) >= 3)""".stripMargin
  }

  /** Direct string-space L-gram ground truth for the substring rungs —
    * one spelling parameterized by the threshold, so the L = 12 and
    * L = 50 oracles cannot drift from each other. */
  private def substringsOracleSql(l: Int, finalWhere: String = "",
      docWhere: String = ""): String = {
    val lm1 = l - 1
    s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents $docWhere),
       |g AS (SELECT doc_id,
       |        list_transform(range(1, len(w) - $lm1 + 1),
       |          i -> list_aggr(w[CAST(i AS INT) : CAST(i + $lm1 AS INT)],
       |                 'string_agg', ' ')) AS gs
       |      FROM toks WHERE len(w) >= $l),
       |p AS (SELECT doc_id, unnest(gs) AS gram,
       |        unnest(range(0, len(gs))) AS pos FROM g),
       |dup AS (SELECT gram FROM p GROUP BY gram HAVING count(*) >= 2),
       |dp AS (SELECT p.doc_id, p.pos FROM p
       |       SEMI JOIN dup ON p.gram = dup.gram),
       |isl AS (SELECT doc_id, pos,
       |          pos - row_number() OVER (PARTITION BY doc_id
       |            ORDER BY pos) AS grp
       |        FROM dp)
       |SELECT doc_id, CAST(min(pos) AS INT) AS start_pos,
       |  CAST(count(*) + $lm1 AS BIGINT) AS span_tokens
       |FROM isl $finalWhere GROUP BY doc_id, grp
       |ORDER BY doc_id, start_pos""".stripMargin
  }

  /** One spelling of the incremental-dedup semantics for the in-plan
    * query, the persisted-index probe, and (with the deletion predicate
    * injected) the erased-generation probe — `extraWhere` ANDs into the
    * candidate filter so every lifecycle verb shares one match rule. */
  private def incrementalOracleSqlWhere(extraWhere: String): String =
    s"""WITH $winnowCandCte,
       |scored AS (SELECT c.a_id, c.b_id,
       |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
       |  FROM cand c JOIN sh a ON a.doc_id = c.a_id
       |              JOIN sh b ON b.doc_id = c.b_id
       |  WHERE (c.a_id % 2 = 1 OR c.b_id % 2 = 1)
       |    $extraWhere
       |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.s, b.s))) >= $JaccardT)
       |SELECT
       |  CASE WHEN a_id % 2 = 1 AND b_id % 2 = 1 THEN greatest(a_id, b_id)
       |       WHEN a_id % 2 = 1 THEN a_id ELSE b_id END AS new_id,
       |  CASE WHEN a_id % 2 = 1 AND b_id % 2 = 1 THEN least(a_id, b_id)
       |       WHEN a_id % 2 = 1 THEN b_id ELSE a_id END AS dup_of,
       |  CASE WHEN a_id % 2 = 1 AND b_id % 2 = 1 THEN 'batch'
       |       ELSE 'index' END AS kind,
       |  jaccard
       |FROM scored ORDER BY new_id, dup_of""".stripMargin

  private lazy val incrementalOracleSql: String = incrementalOracleSqlWhere("")

  /** The ADD verb's oracle: the admitted batch (odd ids minus the
    * duplicates the shared incremental chain reports) with per-doc
    * fingerprint/store counts from the same CTEs the pair machinery
    * uses — one spelling of the selection rule across probe and add. */
  private lazy val indexAddOracleSql: String =
    s"""WITH $winnowCandCte,
       |scored AS (SELECT c.a_id, c.b_id
       |  FROM cand c JOIN sh a ON a.doc_id = c.a_id
       |              JOIN sh b ON b.doc_id = c.b_id
       |  WHERE (c.a_id % 2 = 1 OR c.b_id % 2 = 1)
       |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.s, b.s))) >= $JaccardT),
       |dups AS (SELECT DISTINCT
       |    CASE WHEN a_id % 2 = 1 AND b_id % 2 = 1 THEN greatest(a_id, b_id)
       |         WHEN a_id % 2 = 1 THEN a_id ELSE b_id END AS doc_id
       |  FROM scored),
       |fpc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps
       |        FROM f WHERE doc_id % 2 = 1 GROUP BY 1),
       |shc AS (SELECT doc_id, CAST(len(list_distinct(s)) AS BIGINT)
       |          AS n_shingles
       |        FROM sh WHERE doc_id % 2 = 1)
       |SELECT doc_id, n_fps, n_shingles
       |FROM fpc JOIN shc USING (doc_id)
       |ANTI JOIN dups USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** The COMPACT verb's oracle: per-doc artifact summary over the
    * compacted member set — even (the base) ∪ odd-minus-duplicates
    * (the delta) minus the deletion set (tombstones) — from the same
    * shared CTEs. */
  private lazy val indexCompactOracleSql: String =
    s"""WITH $winnowCandCte,
       |scored AS (SELECT c.a_id, c.b_id
       |  FROM cand c JOIN sh a ON a.doc_id = c.a_id
       |              JOIN sh b ON b.doc_id = c.b_id
       |  WHERE (c.a_id % 2 = 1 OR c.b_id % 2 = 1)
       |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.s, b.s))) >= $JaccardT),
       |dups AS (SELECT DISTINCT
       |    CASE WHEN a_id % 2 = 1 AND b_id % 2 = 1 THEN greatest(a_id, b_id)
       |         WHEN a_id % 2 = 1 THEN a_id ELSE b_id END AS doc_id
       |  FROM scored),
       |fpc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps
       |        FROM f GROUP BY 1),
       |shc AS (SELECT doc_id, CAST(len(list_distinct(s)) AS BIGINT)
       |          AS n_shingles
       |        FROM sh)
       |SELECT doc_id, n_fps, n_shingles
       |FROM fpc JOIN shc USING (doc_id)
       |ANTI JOIN dups USING (doc_id)
       |WHERE doc_id % ${Ingest.ErasureMod} <> 0
       |ORDER BY doc_id""".stripMargin

  /** The erased-generation probe's oracle: the SAME chain minus every
    * pair with a deletion subject on EITHER side (index docs are gone
    * from the artifacts; batch docs are excluded from probing — the
    * one-subject-scope contract shared with q_ann_index_erase). */
  private lazy val indexEraseOracleSql: String = incrementalOracleSqlWhere(
    s"""AND c.a_id % ${Ingest.ErasureMod} <> 0
       |    AND c.b_id % ${Ingest.ErasureMod} <> 0""".stripMargin)

  /** The LIFECYCLE chain's oracle: derive the surviving membership by
    * staging the shared verified-pair relation through the same two
    * admissions the generation chain runs — day-1 (batch ≡ 1 mod 4 vs
    * the historical evens, keep-earlier batch-internally), the day-2/3
    * erase-and-compact (membership minus subjects), then day-4
    * (batch ≡ 3 mod 4 plus re-consented subjects vs the compacted
    * membership) — and summarize the members' per-doc artifact counts
    * from the SAME f/sh CTEs the pair machinery uses. */
  private lazy val indexLifecycleOracleSql: String = {
    val em = Ingest.ErasureMod
    s"""WITH $winnowCandCte,
       |scored AS (SELECT c.a_id, c.b_id
       |  FROM cand c JOIN sh a ON a.doc_id = c.a_id
       |              JOIN sh b ON b.doc_id = c.b_id
       |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.s, b.s))) >= $JaccardT),
       |sym AS (SELECT a_id AS x, b_id AS y FROM scored
       |        UNION ALL SELECT b_id, a_id FROM scored),
       |dups1 AS (SELECT DISTINCT x AS doc_id FROM sym
       |  WHERE x % 4 = 1 AND (y % 2 = 0 OR (y % 4 = 1 AND y < x))),
       |m2 AS (SELECT doc_id FROM documents
       |  WHERE doc_id % $em <> 0
       |    AND (doc_id % 2 = 0 OR (doc_id % 4 = 1
       |         AND doc_id NOT IN (SELECT doc_id FROM dups1)))),
       |b2 AS (SELECT doc_id FROM documents
       |  WHERE (doc_id % 4 = 3 AND doc_id % $em <> 0)
       |     OR doc_id % ${2 * em} = 0),
       |dups2 AS (SELECT DISTINCT s.x AS doc_id
       |  FROM sym s JOIN b2 ON s.x = b2.doc_id
       |  WHERE s.y IN (SELECT doc_id FROM m2)
       |     OR (s.y IN (SELECT doc_id FROM b2) AND s.y < s.x)),
       |m3 AS (SELECT doc_id FROM m2
       |  UNION SELECT doc_id FROM b2
       |  WHERE doc_id NOT IN (SELECT doc_id FROM dups2)),
       |fpc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps
       |        FROM f GROUP BY 1),
       |shc AS (SELECT doc_id, CAST(len(list_distinct(s)) AS BIGINT)
       |          AS n_shingles
       |        FROM sh)
       |SELECT doc_id, n_fps, n_shingles
       |FROM m3 JOIN fpc USING (doc_id) JOIN shc USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  private def sigCte =
    s"""toks AS (SELECT doc_id, $duckToks AS w FROM documents),
       |shing AS (SELECT doc_id, $duckSh AS sh FROM toks),
       |hashed AS (SELECT doc_id, list_transform(sh, s -> ${duckH32("s")} % $P) AS hs FROM shing),
       |sigs AS (SELECT doc_id, ${duckSignature("hs")} AS sig FROM hashed)""".stripMargin

  val oracle: Map[String, String] = Map(
    // Same candidate relation (shared CTE chain); per-anchor picks as
    // the DIRECT window spelling the max_by aggregates must agree with.
    "q_training_pairs" ->
      s"""WITH $minhashCandCte,
         |cm AS (SELECT a_id, b_id,
         |    CAST(round(est_jaccard * $NumHashes) AS BIGINT) AS m FROM cand),
         |sym AS (SELECT a_id AS anchor, b_id AS partner, m FROM cm
         |        UNION ALL SELECT b_id, a_id, m FROM cm),
         |labeled AS (
         |  SELECT anchor, 'positive' AS kind, partner, m FROM sym
         |  WHERE m >= 16
         |  UNION ALL
         |  SELECT anchor, 'hard_negative', partner, m FROM sym
         |  WHERE m < 16 AND m > 0),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY anchor, kind
         |    ORDER BY m DESC, partner ASC) AS rn FROM labeled)
         |SELECT anchor AS anchor_id, kind, partner AS partner_id,
         |  m * 31250 AS est_ppm
         |FROM ranked WHERE rn = 1 ORDER BY anchor_id, kind""".stripMargin,
    // Same verified-pair relation (shared CTE chain) + split classifier.
    "q_split_leakage" ->
      s"""WITH $minhashCandCte,
         |p AS (SELECT a_id, b_id FROM cand WHERE est_jaccard >= 0.5),
         |cls AS (SELECT a_id, b_id,
         |  CASE WHEN (${duckIsEval("a_id")}) AND (${duckIsEval("b_id")})
         |         THEN 'eval_eval'
         |       WHEN NOT (${duckIsEval("a_id")})
         |         AND NOT (${duckIsEval("b_id")}) THEN 'train_train'
         |       ELSE 'leak' END AS pair_class FROM p),
         |ex AS (SELECT pair_class, unnest([a_id, b_id]) AS doc_id FROM cls)
         |SELECT pair_class, n_pairs, n_docs
         |FROM (SELECT pair_class, count(*) AS n_pairs FROM cls GROUP BY 1)
         |JOIN (SELECT pair_class, count(DISTINCT doc_id) AS n_docs
         |      FROM ex GROUP BY 1) USING (pair_class)
         |ORDER BY pair_class""".stripMargin,
    "q_dedup_exact" ->
      s"""WITH fp AS (SELECT doc_id,
         |  md5(coalesce(list_aggr($duckToks, 'string_agg', ' '), '')) AS fingerprint
         |  FROM documents)
         |SELECT doc_id, fingerprint,
         |  min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
         |  doc_id <> min(doc_id) OVER (PARTITION BY fingerprint) AS is_dup,
         |  count(*) OVER (PARTITION BY fingerprint) AS n_copies
         |FROM fp ORDER BY doc_id""".stripMargin,
    "q_minhash_signature" ->
      s"""WITH $sigCte
         |SELECT doc_id,
         |${(0 until NumHashes).map(i => f" sig[${i + 1}] AS m$i%02d").mkString(",\n")}
         |FROM sigs ORDER BY doc_id""".stripMargin,
    "q_dedup_minhash" ->
      s"""WITH $minhashCandCte
         |SELECT a_id, b_id, est_jaccard FROM cand
         |WHERE est_jaccard >= 0.5 ORDER BY a_id, b_id""".stripMargin,
    // Same banded candidates (raw, pre-estimate) vs the exact hashed-
    // shingle truth; confusion counts via SEMI/ANTI joins.
    "q_dedup_eval" ->
      s"""WITH $minhashCandCte,
         |cp AS (SELECT a_id, b_id FROM cand
         |       WHERE ${duckEvalSampled(EvalSampleMod, "a_id")}
         |         AND ${duckEvalSampled(EvalSampleMod, "b_id")}),
         |hh AS (SELECT doc_id,
         |    list_distinct(list_transform(sh, s -> ${duckH32("s")})) AS h
         |  FROM shing WHERE len(sh) > 0
         |    AND ${duckEvalSampled(EvalSampleMod, "doc_id")}),
         |truth AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM hh a JOIN hh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.h, b.h)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.h, b.h))) >= $EvalT),
         |tp AS (SELECT CAST(count(*) AS BIGINT) AS tp FROM truth t
         |       SEMI JOIN cp ON t.a_id = cp.a_id AND t.b_id = cp.b_id),
         |fp AS (SELECT CAST(count(*) AS BIGINT) AS fp FROM cp
         |       ANTI JOIN truth t ON t.a_id = cp.a_id AND t.b_id = cp.b_id),
         |fn AS (SELECT CAST(count(*) AS BIGINT) AS fn FROM truth t
         |       ANTI JOIN cp ON t.a_id = cp.a_id AND t.b_id = cp.b_id)
         |SELECT CAST(500000 AS BIGINT) AS t_ppm, tp, fp, fn,
         |  CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp)
         |       ELSE NULL END AS precision_ppm,
         |  CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn)
         |       ELSE NULL END AS recall_ppm
         |FROM tp, fp, fn""".stripMargin,
    // Same banded candidates vs the UNTHRESHOLDED hashed-shingle truth,
    // binned by exact-jaccard decile; -1 collects zero-overlap collisions.
    "q_dedup_operating_curve" ->
      s"""WITH $minhashCandCte,
         |cp AS (SELECT a_id, b_id FROM cand
         |       WHERE ${duckEvalSampled(EvalSampleMod, "a_id")}
         |         AND ${duckEvalSampled(EvalSampleMod, "b_id")}),
         |hh AS (SELECT doc_id,
         |    list_distinct(list_transform(sh, s -> ${duckH32("s")})) AS h
         |  FROM shing WHERE len(sh) > 0
         |    AND ${duckEvalSampled(EvalSampleMod, "doc_id")}),
         |truth AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    least(CAST(floor(CAST(len(list_intersect(a.h, b.h)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.h, b.h))) * 10) AS BIGINT),
         |      9) AS j_band
         |  FROM hh a JOIN hh b ON a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.h, b.h)) > 0),
         |m AS (SELECT coalesce(t.j_band, -1) AS j_band,
         |    CASE WHEN t.a_id IS NOT NULL THEN 1 ELSE 0 END AS t,
         |    CASE WHEN c.a_id IS NOT NULL THEN 1 ELSE 0 END AS c
         |  FROM truth t FULL OUTER JOIN cp c
         |    ON t.a_id = c.a_id AND t.b_id = c.b_id)
         |SELECT j_band, CAST(sum(t) AS BIGINT) AS n_true,
         |  CAST(sum(CASE WHEN t = 1 AND c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_caught,
         |  CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_false_cand,
         |  CASE WHEN sum(t) > 0
         |       THEN CAST(sum(CASE WHEN t = 1 AND c = 1 THEN 1 ELSE 0 END)
         |              AS BIGINT) * 1000000 // CAST(sum(t) AS BIGINT)
         |       ELSE -1 END AS recall_ppm
         |FROM m GROUP BY j_band ORDER BY j_band""".stripMargin,
    "q_edit_distance" ->
      s"""WITH $minhashCandCte,
         |pairs AS (SELECT a_id, b_id FROM cand WHERE est_jaccard >= 0.5),
         |t AS (SELECT doc_id, substring(text, 1, 80) AS t FROM documents)
         |SELECT p.a_id, p.b_id,
         |  CAST(levenshtein(a.t, b.t) AS INT) AS edit_dist
         |FROM pairs p JOIN t a ON p.a_id = a.doc_id
         |             JOIN t b ON p.b_id = b.doc_id
         |ORDER BY 1, 2""".stripMargin,
    // True transitive closure via recursive CTE — the contract the
    // fixed-round doubling propagation must (and does) reach.
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashCandCte,
         |pairs AS (SELECT a_id, b_id FROM cand WHERE est_jaccard >= 0.5),
         |edges AS (SELECT a_id AS s, b_id AS t FROM pairs
         |          UNION ALL SELECT b_id, a_id FROM pairs),
         |nodes AS (SELECT DISTINCT s AS id FROM edges),
         |reach AS (
         |  SELECT id, id AS lbl FROM nodes
         |  UNION
         |  SELECT e.t AS id, r.lbl FROM reach r JOIN edges e ON e.s = r.id)
         |SELECT id AS doc_id, min(lbl) AS cluster_id,
         |  (id = min(lbl)) AS is_canonical
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "q_dedup_simhash" ->
      s"""WITH $simhashCte
         |SELECT doc_id, simhash FROM simhashed ORDER BY doc_id""".stripMargin,
    // Oracle = ALL-PAIRS exact hamming join: the band plan's pigeonhole
    // completeness is re-proven against brute force, not assumed.
    "q_simhash_pairs" ->
      s"""WITH $simhashCte
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM simhashed a JOIN simhashed b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingT
         |ORDER BY 1, 2""".stripMargin,
    "q_dedup_latest" ->
      """SELECT user_id, event_id, us, event_type, value FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // The prefix-filtered plan computes the SAME exact answer, so it
    // verifies against the same all-pairs oracle — the pruning changes
    // the plan, never the result.
    "q_ngram_jaccard_prefix" -> ngramJaccardOracle,
    "q_dedup_spans" -> spansOracle,
    "q_ngram_jaccard" -> ngramJaccardOracle,
    "q_dedup_winnow" ->
      s"""WITH $winnowCandCte
         |SELECT c.a_id, c.b_id,
         |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         |FROM cand c JOIN sh a ON a.doc_id = c.a_id
         |            JOIN sh b ON b.doc_id = c.b_id
         |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.s, b.s))) >= $JaccardT
         |ORDER BY a_id, b_id""".stripMargin,
    "q_dedup_incremental" -> incrementalOracleSql,
    // The persisted-index probe must return EXACTLY the in-plan
    // incremental dedup — one oracle spelling for both, the
    // q_ann_persisted convention.
    "q_dedup_persisted" -> incrementalOracleSql,
    // Erasure must remove EXACTLY the deleted subjects' pairs: same
    // chain, deletion predicate on both pair sides.
    "q_dedup_index_erase" -> indexEraseOracleSql,
    "q_dedup_index_add" -> indexAddOracleSql,
    "q_dedup_index_compact" -> indexCompactOracleSql,
    "q_dedup_index_lifecycle" -> indexLifecycleOracleSql,
    // Direct string-space L-gram ground truth: literal L-gram strings
    // grouped corpus-wide, count >= 2, gaps-and-islands — re-proving the
    // prefix-doubling hash chain AND its 60-bit collision contract; one
    // spelling, two thresholds (the fixture L=12 rung and the
    // production L=50 rung).
    "q_dedup_substrings" -> substringsOracleSql(SubstrL),
    "q_dedup_substrings50" -> substringsOracleSql(SubstrL50),
    // Store-probe == full recompute: the same 50-gram chain, batch
    // (odd-doc) rows only — the index-soundness re-proof.
    "q_substr_incremental" ->
      substringsOracleSql(SubstrL50, "WHERE doc_id % 2 = 1"),
    // Erased generation: the same chain over the SURVIVING corpus only
    // (subjects out of both the store and the batch), batch rows.
    "q_substr_index_erase" ->
      substringsOracleSql(SubstrL50, "WHERE doc_id % 2 = 1",
        s"WHERE doc_id % ${Ingest.ErasureMod} <> 0"),
    // Same literal 50-gram stream; canonical = first (doc_id, pos) per
    // gram; non-canonical occurrences explode their covered positions.
    "q_dedup_cut" -> {
      val l = SubstrL50; val lm1 = l - 1
      s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents),
         |g AS (SELECT doc_id,
         |        list_transform(range(1, len(w) - $lm1 + 1),
         |          i -> list_aggr(w[CAST(i AS INT) : CAST(i + $lm1 AS INT)],
         |                 'string_agg', ' ')) AS gs
         |      FROM toks WHERE len(w) >= $l),
         |p AS (SELECT doc_id, unnest(gs) AS gram,
         |        unnest(range(0, len(gs))) AS pos FROM g),
         |occ AS (SELECT doc_id, pos,
         |        count(*) OVER (PARTITION BY gram) AS n_occ,
         |        row_number() OVER (PARTITION BY gram
         |          ORDER BY doc_id, pos) AS rn
         |      FROM p),
         |cut AS (SELECT DISTINCT doc_id, cp FROM (
         |        SELECT doc_id, unnest(range(pos, pos + $l)) AS cp
         |        FROM occ WHERE n_occ >= 2 AND rn > 1)),
         |cnt AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens
         |        FROM toks)
         |SELECT c.doc_id, n.n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_cut,
         |  n.n_tokens - count(*) AS n_kept
         |FROM cut c JOIN cnt n ON c.doc_id = n.doc_id
         |GROUP BY c.doc_id, n.n_tokens
         |ORDER BY c.doc_id""".stripMargin
    },
    "q_dedup_containment" ->
      s"""WITH $winnowCandCte,
         |scored AS (SELECT c.a_id, c.b_id,
         |    len(list_intersect(a.s, b.s)) AS i, len(a.s) AS an, len(b.s) AS bn
         |  FROM cand c JOIN sh a ON a.doc_id = c.a_id
         |              JOIN sh b ON b.doc_id = c.b_id)
         |SELECT a_id, b_id,
         |  CAST(i AS DOUBLE) / least(an, bn) AS containment,
         |  CAST(i AS DOUBLE) / (an + bn - i) AS jaccard
         |FROM scored WHERE CAST(i AS DOUBLE) / least(an, bn) >= $ContainT
         |ORDER BY a_id, b_id""".stripMargin,
    "q_dedup_survivors" ->
      s"""WITH RECURSIVE $minhashCandCte,
         |pairs AS (SELECT a_id, b_id FROM cand WHERE est_jaccard >= 0.5),
         |edges AS (SELECT a_id AS s, b_id AS t FROM pairs
         |          UNION ALL SELECT b_id, a_id FROM pairs),
         |nodes AS (SELECT DISTINCT s AS id FROM edges),
         |reach AS (
         |  SELECT id, id AS lbl FROM nodes
         |  UNION
         |  SELECT e.t AS id, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
         |clusters AS (SELECT id AS doc_id, min(lbl) AS cluster_id
         |             FROM reach GROUP BY id),
         |counted AS (SELECT doc_id, len($duckToks) AS n_tokens FROM documents),
         |members AS (SELECT c.cluster_id, c.doc_id, t.n_tokens
         |            FROM clusters c JOIN counted t USING (doc_id)),
         |reps AS (SELECT cluster_id, doc_id AS rep_id FROM (
         |    SELECT cluster_id, doc_id, row_number() OVER (
         |      PARTITION BY cluster_id ORDER BY n_tokens DESC, doc_id ASC) AS rn
         |    FROM members) WHERE rn = 1),
         |losers AS (SELECT m.doc_id FROM members m
         |           JOIN reps r USING (cluster_id) WHERE m.doc_id <> r.rep_id)
         |SELECT t.doc_id, t.n_tokens,
         |  CASE WHEN r.rep_id IS NOT NULL THEN 'rep' ELSE 'unique' END AS status
         |FROM counted t LEFT JOIN reps r ON t.doc_id = r.rep_id
         |WHERE t.doc_id NOT IN (SELECT doc_id FROM losers)
         |ORDER BY doc_id""".stripMargin,
    "q_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
        |SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_sum(list_transform(a.v, (x,i) -> x * b.v[i])) /
        |    (sqrt(list_sum(list_transform(a.v, x -> x*x)))
        |     * sqrt(list_sum(list_transform(b.v, x -> x*x)))), 6) AS cosine
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(a.v, (x,i) -> x * b.v[i])) /
        |    (sqrt(list_sum(list_transform(a.v, x -> x*x)))
        |     * sqrt(list_sum(list_transform(b.v, x -> x*x)))) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin,
  )

  private lazy val ngramJaccardOracle: String =
    s"""WITH toks AS (SELECT doc_id, lang, $duckToks AS w FROM documents),
       |sh AS (SELECT doc_id, lang, $duckSh AS s FROM toks),
       |nz AS (SELECT * FROM sh WHERE len(s) > 0)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
       |FROM nz a JOIN nz b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.s, b.s))) >= 0.2
       |ORDER BY a_id, b_id""".stripMargin
}
