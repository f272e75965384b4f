package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.TextPipeline
import graft.io.Tables

/** Corpus-preparation tier: the whole-corpus operations a training-data
  * pipeline runs after per-document scoring — redaction, distribution-
  * based quality gates, and language rebalancing. All deterministic, all
  * oracle-verified.
  *
  * Scale stance: redaction is a narrow map; the gate and the rebalance
  * need corpus statistics (percentiles, per-language counts) which are
  * TINY aggregates — computed once, broadcast back against the corpus;
  * the corpus itself shuffles at most once (the per-language rank).
  */
object Corpus {

  private val toks: Column = TextPipeline.normalizedTokens(col("text"))
  private val duckToks = TextPipeline.duckToks

  /** Redaction: scrub email-shaped, long-digit, and url-shaped spans
    * (the standard PII pre-filters). Pure regexp projection — one narrow
    * pass, trivially parallel at any scale. */
  def qRedact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), length(col("text")).as("orig_len"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"),
              "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
            "[0-9]{6,}", "<NUM>"),
          "https?://[^ ]+", "<URL>").as("clean_text"))
      .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
        length(col("clean_text")).as("clean_len"),
        (length(col("clean_text")) =!= col("orig_len")).as("was_redacted"))
      .orderBy("doc_id")

  /** Distribution-based quality gate: keep documents whose token count
    * lies within the corpus [p10, p90]. The percentile pair is a 1-row
    * aggregate broadcast against the corpus — no self-join, no second
    * scan of text. */
  def qQualityGate(s: SparkSession, dir: String): DataFrame = {
    val counted = Tables.documents(s, dir)
      .select(col("doc_id"), size(toks).as("n_tokens"))
    val bounds = counted.agg(
      expr("percentile(n_tokens, 0.1)").as("p10"),
      expr("percentile(n_tokens, 0.9)").as("p90"))
    counted.crossJoin(broadcast(bounds))
      .filter(col("n_tokens") >= col("p10") && col("n_tokens") <= col("p90"))
      .select(col("doc_id"), col("n_tokens"))
      .orderBy("doc_id")
  }

  /** Language-balanced resampling: rank documents inside each language by
    * a deterministic content hash and keep the smallest language's count
    * from every language — reproducible down-sampling to a balanced mix
    * (what a data-mixing recipe does before tokenization). One shuffle
    * (the per-language rank); the per-language floor is a tiny broadcast. */
  def qLangBalance(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      TextPipeline.h32(col("doc_id").cast("string")).as("h"))
    val floorN = broadcast(
      docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("k")))
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    docs.withColumn("rnk", row_number().over(w))
      .crossJoin(floorN)
      .filter(col("rnk") <= col("k"))
      .select(col("doc_id"), col("lang"), col("rnk"))
      .orderBy("lang", "rnk")
  }

  /** Deterministic stratified train/val/test split: assignment is a pure
    * function of the content hash (80/10/10 on h32(doc_id) mod 100), so
    * the split is identical on every run, every engine, and every subset
    * of the corpus — the property that keeps eval sets stable as a 100 TB
    * corpus is re-crawled. Narrow projection, zero shuffles. */
  def qTrainSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        pmod(TextPipeline.h32(col("doc_id").cast("string")), lit(100)).as("b"))
      .select(col("doc_id"), col("lang"),
        when(col("b") < 80, "train").when(col("b") < 90, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")

  /** Tokens per shard for [[qTokenShards]]. */
  private val ShardBudget = 4096L

  /** Token-budget shard packing: per language, documents in doc_id order
    * are packed greedily into shards of ~ShardBudget tokens (shard id =
    * exclusive-prefix token count / budget) — the sequence-packing step
    * that turns a scored corpus into fixed-size pretraining shards.
    *
    * Expressed as a per-language running sum (ROWS UNBOUNDED PRECEDING).
    * Scale note: a per-stratum ordered prefix sum is sequential BY
    * DEFINITION; the declarative window puts each language in one task,
    * which holds while strata are numerous-and-medium. For one giant
    * stratum the same math runs as the classic two-pass prefix sum
    * (per-range-partition subtotals, broadcast, add offset) — identical
    * output, so the oracle contract here stays valid for that plan too. */
  def qTokenShards(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), size(toks).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / ShardBudget).as("shard_id"))
      .orderBy("doc_id")
  }

  /** Sliding-window chunk size / stride (tokens). */
  private[graft] val ChunkSize = 32
  private[graft] val ChunkStride = 24

  /** Sliding-window document chunking: each document becomes overlapping
    * ChunkSize-token windows at ChunkStride intervals — the step between
    * a scored corpus and a context-length-bounded training set (HF
    * `return_overflowing_tokens` semantics). Minimal-cover contract: a
    * tail window fully contained in its predecessor (start+W ≥ n already
    * reached by the previous chunk, i.e. start + (W−S) ≥ n) is dropped,
    * so every chunk contributes at least one new token and every token is
    * covered. Chunk identity ships as the portable h32 of the space-joined
    * window, so downstream chunk-level dedup joins on a 8-byte key, never
    * the text.
    *
    * Scale stance: pure per-row array HOFs (sequence → explode → slice)
    * inside whole-stage codegen — zero shuffles before the final
    * presentation sort; ~n/S output rows per document is the inherent
    * output size, not an intermediate blow-up. */
  /** Shared chunk pipeline (unsorted): doc_id, chunk_id, chunk_len,
    * chunk_hash — consumed by [[qChunkDocs]] and [[qChunkBoilerplate]]. */
  private def chunked(s: SparkSession, dir: String): DataFrame = {
    val W = ChunkSize; val S = ChunkStride
    Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), col("w"), size(col("w")).as("n"),
        explode(sequence(lit(0), size(col("w")) - 1, lit(S))).as("start"))
      .filter(col("start") === 0 || col("start") + (W - S) < col("n"))
      .select(col("doc_id"),
        (col("start") / S).cast("long").as("chunk_id"),
        slice(col("w"), col("start") + 1, lit(W)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("chunk_len"),
        TextPipeline.h32(concat_ws(" ", col("chunk"))).as("chunk_hash"))
  }

  def qChunkDocs(s: SparkSession, dir: String): DataFrame =
    chunked(s, dir).orderBy("doc_id", "chunk_id")

  /** Content-defined boundary divisor: a trigram hash ≡ 0 (mod this)
    * closes a chunk → expected chunk length ≈ this many tokens. */
  private[graft] val CdcDivisor = 16L

  /** Content-defined chunking (the LBFS/rsync rolling-boundary trick —
    * Muthitacharoen, Chen & Mazières, SOSP'01): a chunk boundary falls
    * wherever the local trigram hash ≡ 0 (mod [[CdcDivisor]]), so
    * boundaries are decided by CONTENT, not position. That is the
    * property fixed-stride chunking ([[qChunkDocs]]) lacks: insert one
    * token early in a document and every fixed window after it shifts —
    * zero shared fingerprints — while content-defined boundaries
    * re-synchronize at the next hash-selected trigram, so all chunks
    * outside the edit's neighborhood keep their hashes (the spec pins
    * exactly this, engineered edit vs both chunkers). What dedup
    * STORAGE systems (LBFS, restic, data lakes with chunk-level dedup)
    * and incremental corpus re-ingestion build on.
    *
    * Output: one row per chunk (doc_id, chunk_id, n_tokens, chunk_hash)
    * — same consumer contract as q_chunk_docs, so the boilerplate /
    * dedup-store joins downstream are interchangeable.
    *
    * Scale stance: boundary detection and chunk hashing are pure
    * per-row array HOFs over named staged columns (one tokenizer pass,
    * no per-element re-derivation) — zero shuffles before the
    * presentation sort; ~n/[[CdcDivisor]] rows per document is the
    * inherent output size. */
  def qChunkContentDefined(s: SparkSession, dir: String): DataFrame = {
    val d = CdcDivisor
    Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), col("w"),
        transform(TextPipeline.trigrams(col("w")), t => TextPipeline.h32(t))
          .as("g"))
      // gram i ends at token i+2 (1-based); a selected gram closes its
      // chunk there. Cut points = 0 ++ selected ends ++ n (if open).
      .select(col("doc_id"), col("w"),
        transform(filter(sequence(lit(1), greatest(size(col("g")), lit(1))),
            i => i <= size(col("g")) && pmod(element_at(col("g"), i), lit(d)) === 0),
          i => i + 2).as("ends"))
      .select(col("doc_id"), col("w"),
        when(size(col("ends")) > 0 &&
            element_at(col("ends"), -1) === size(col("w")), col("ends"))
          .otherwise(concat(col("ends"), array(size(col("w"))))).as("ends"))
      .select(col("doc_id"), col("w"),
        concat(array(lit(0)), col("ends")).as("cuts"))
      .select(col("doc_id"), col("w"),
        posexplode(zip_with(
          slice(col("cuts"), lit(1), greatest(size(col("cuts")) - 1, lit(0))),
          slice(col("cuts"), lit(2), greatest(size(col("cuts")) - 1, lit(0))),
          (a, b) => struct(a.as("s"), b.as("e")))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("chunk_id"),
        (col("col.e") - col("col.s")).cast("long").as("n_tokens"),
        TextPipeline.h32(concat_ws(" ",
          slice(col("w"), col("col.s") + 1, col("col.e") - col("col.s"))))
          .as("chunk_hash"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Cross-document repeated-chunk (boilerplate) scoring — the C4-style
    * use of the chunk fingerprints: a chunk whose hash occurs in ≥2
    * DISTINCT documents is corpus-repeated (navigation chrome, license
    * headers, templated passages), and each document reports what
    * fraction of its chunks are repeats — the signal a cleaning pass
    * thresholds on before training.
    *
    * Scale stance: the repeated-hash set is one partial-agg shuffle of
    * 8-byte hashes (never text); the membership join is hash-equi on the
    * same key, then a per-doc partial agg — three narrow shuffles total,
    * each on a compact key. At 100 TB the hash→doc-count aggregate is
    * exactly the shape AQE skew-splits if one boilerplate chunk is
    * corpus-universal. */
  def qChunkBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val c = chunked(s, dir)
    val repeated = c.groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("chunk_hash"), lit(1).as("rep"))
    c.join(repeated, Seq("chunk_hash"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rep").isNotNull, 1L).otherwise(0L)).as("n_repeated"))
      .filter(col("n_repeated") > 0)
      .select(col("doc_id"), col("n_chunks"), col("n_repeated"),
        round(col("n_repeated").cast("double") / col("n_chunks").cast("double"), 6)
          .as("boilerplate_ratio"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: which TRAIN-split documents share any
    * word-trigram with the held-out TEST split (the n-gram-overlap
    * contamination check every pretraining pipeline runs before
    * training). Splits are the [[qTrainSplit]] content-hash buckets, so
    * the check is reproducible on any engine and corpus subset.
    *
    * Both engines join on the portable h32 of the shingle, never the
    * string — identical values on both sides, so hash collisions (if
    * any) are shared and parity is exact; `array_distinct` AFTER
    * hashing makes per-doc multiplicity collision-identical too.
    *
    * Scale stance: shingle hashes shuffle as bare longs; the test side
    * (a benchmark suite — tiny vs the corpus) collapses to distinct
    * hashes and BROADCASTS, so the probe is a map-side semi join over
    * the train corpus: no train-side shuffle at all. Output is
    * contaminated-doc cardinality. If the test side ever outgrew
    * broadcast, the same plan degrades to a shuffle join on the long
    * key. */
  def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val f = Tables.documents(s, dir)
      .select(col("doc_id"),
        pmod(TextPipeline.h32(col("doc_id").cast("string")), lit(100)).as("b"),
        toks.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), col("b"),
        array_distinct(transform(TextPipeline.shinglesOf(col("w")),
          t => TextPipeline.h32(t))).as("hs"))
      // train and test branches partition the SAME scan by split bucket —
      // materialize the hashed-shingle table once so tokenize + shingle +
      // hash runs one pass, not one per branch (a real pipeline persists
      // this table anyway; it is the dedup/contamination index)
      .localCheckpoint()
    val testSh = f.filter(col("b") >= 90)
      .select(explode(col("hs")).as("h")).distinct()
    f.filter(col("b") < 80)
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"),
        explode(col("hs")).as("h"))
      .join(broadcast(testSh), "h")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        round(col("n_overlap").cast("double")
          / col("n_shingles").cast("double"), 6).as("contamination"))
      .orderBy("doc_id")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis): top-20
    * documents per language by the key ln(u)/w, where u is a
    * deterministic content hash mapped into (0, 1] and w = n_chars — so
    * longer documents are proportionally likelier, and the SAME sample
    * comes out on every engine and every run (the data-mixing twin of
    * q_sample_hash's unweighted gate). One shuffle (the per-language
    * rank); the key is per-row arithmetic, never accumulated, and
    * adjacent order-statistic gaps are ~1/n — astronomically wider than
    * any cross-engine 1-ulp `ln` wobble, so the selected set is stable.
    * The ranking key deliberately stays OUT of the output columns: the
    * contract is the sample membership + rank, not the float. */
  def qWeightedSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (TextPipeline.h32(col("doc_id").cast("string")) + lit(1).cast("long"))
      .cast("double") / lit(4294967296.0)
    val keyed = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        (log(u) / col("n_chars").cast("double")).as("k"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("k").desc, col("doc_id").asc)
    keyed.select(col("lang"), col("doc_id"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 20)
      .orderBy("lang", "rn")
  }

  /** Temperature-based domain mixing weights (the "data mixing recipe"
    * step of multilingual / multi-source LLM training, cf. the T=...
    * sampling in XLM-R and mT5: raw size-proportional sampling starves
    * small domains, so sample ∝ size^(1/T)). Here 1/T = 0.5: per source,
    * weight ∝ √(token count), reported as an exact parts-per-million
    * allocation.
    *
    * Cross-engine exactness: √n is the ONE float op — IEEE-754 sqrt is
    * correctly rounded, so both engines produce the identical double —
    * immediately quantized to round(√n · 1e6) BIGINT; the ppm share is
    * then BIGINT multiply + BIGINT floor-division (commutative integer
    * sums only). Scale stance: one wordcount-shaped token-count
    * aggregate (the only corpus scan), then a ~|sources|-row table and a
    * 1-row broadcast total — the recipe itself costs nothing at 100 TB. */
  def qDomainMix(s: SparkSession, dir: String): DataFrame = {
    // localCheckpoint the ~|sources|-row aggregate: it feeds BOTH the
    // total and the final projection, and the two agg subtrees otherwise
    // don't exchange-reuse — the plan audit showed the corpus scanned
    // TWICE for a 20-row recipe without this
    val counted = Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks)).cast("long").as("n_tokens"))
      .withColumn("wq", round(sqrt(col("n_tokens").cast("double")) * 1e6)
        .cast("long"))
      .localCheckpoint(true)
    val tot = counted.agg(sum(col("wq")).as("sum_wq"))
    counted.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        // DIV: exact BIGINT floor-division (the plain `/` would promote
        // to IEEE double and risk a boundary ulp vs the oracle's `//`)
        expr("wq * 1000000 DIV sum_wq").cast("long").as("weight_ppm"))
      .orderBy("source")
  }

  /** Number of BPE merge rounds [[qBpeMerges]] learns. */
  private val BpeRounds = 6

  /** BPE tokenizer-training merge table (Sennrich, Haddow & Birch, "Neural
    * Machine Translation of Rare Words with Subword Units", ACL 2016 §3.2):
    * from the character-split word-frequency table, repeatedly (a) count
    * adjacent symbol pairs weighted by word frequency, (b) pick the most
    * frequent pair (ties → lexicographically smallest), (c) merge every
    * occurrence greedily left-to-right. Output: the learned merge table
    * (round, lhs, rhs, pair_count) — the artifact a tokenizer trainer
    * ships. The reference engine has no tokenizer training (SURVEY §2.2);
    * this is the extension tier's LLM-pipeline rung.
    *
    * Merge application is a left FOLD over the symbol list (init = first
    * symbol; step: merge iff last-emitted == lhs ∧ next == rhs, else
    * append). The fold yields greedy non-overlapping semantics for free —
    * "aaa" + (a,a) → [aa, a] — because a just-merged symbol no longer
    * equals lhs. State is a space-delimited symbol string; DuckDB's
    * list_reduce runs the IDENTICAL fold (overlap case spec-pinned), so
    * the merge tables match exactly.
    *
    * Scale stance (100 TB): the corpus is touched ONCE — the word-frequency
    * aggregate (the wordcount shape: map-side partial agg, shuffle bounded
    * by distinct words per partition, NOT by tokens). Every merge round
    * then runs on the VOCABULARY: a pair aggregate, a TakeOrdered(1), a
    * 1-row broadcast, a narrow per-word map — all independent of corpus
    * size, exactly how production trainers (SentencePiece, HF tokenizers)
    * structure BPE training. Per-round state is localCheckpoint'ed with
    * superseded blocks freed (the q_dedup_clusters lifecycle), so executor
    * memory stays O(vocab) however many rounds run. */
  def qBpeMerges(s: SparkSession, dir: String): DataFrame = {
    val (bests, fin) = bpeTrain(s, dir)
    org.apache.spark.sql.graftbridge.Bridge.freeLocalCheckpoint(fin)
    bests.reduce(_ union _).orderBy("round")
  }

  /** BPE application / subword vocabulary (the inference half of
    * [[qBpeMerges]]): run the same [[BpeRounds]] training rounds, then
    * report the SUBWORD frequency table of the final segmentation —
    * Σ word_freq per surviving symbol. This is the train→apply
    * composition a tokenizer pipeline ships: the merge table drives
    * segmentation, and the resulting subword counts are the unigram
    * stats downstream sampling/packing reads. Final state is one
    * explode + one wordcount-shaped aggregate over the VOCABULARY —
    * still corpus-size-independent after the single corpus scan. */
  def qBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val (_, fin) = bpeTrain(s, dir)
    fin.select(col("n"), explode(split(col("st"), " ")).as("subword"))
      .groupBy("subword").agg(sum(col("n")).as("cnt"))
      .orderBy("subword")
  }

  /** Shared BPE training loop: returns (per-round best-pair 1-row frames
    * tagged with `round`, final checkpointed state (n, st)). The final
    * state's blocks are the caller's to manage: qBpeEncode consumes it,
    * qBpeMerges frees it immediately. */
  private def bpeTrain(s: SparkSession, dir: String): (Seq[DataFrame], DataFrame) = {
    import org.apache.spark.sql.graftbridge.Bridge
    val base = TextPipeline.words(Tables.documents(s, dir), "text")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(col("n"), trim(regexp_replace(col("word"), "(.)", "$1 ")).as("st"))
    var state = base.localCheckpoint(true)
    val bests = Seq.newBuilder[DataFrame]
    for (r <- 1 to BpeRounds) {
      val syms = split(col("st"), " ")
      val pairs = state
        .select(col("n"), explode(zip_with(syms,
          slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
          (x, y) => struct(x.as("lhs"), y.as("rhs")))).as("p"))
        .filter(col("p.rhs").isNotNull) // zip_with pads the sliced side
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("n")).as("pair_count"))
      val best = pairs
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1).localCheckpoint(true)
      val applied = state.crossJoin(broadcast(best))
        .select(col("n"),
          aggregate(
            slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
            element_at(syms, 1),
            (acc, x) => {
              val last = element_at(split(acc, " "), -1)
              when(last === col("lhs") && x === col("rhs"),
                concat(acc.substr(lit(1), length(acc) - length(last)),
                  col("lhs"), col("rhs")))
                .otherwise(concat(acc, lit(" "), x))
            }).as("st"))
      val next = applied.localCheckpoint(true)
      Bridge.freeLocalCheckpoint(state)
      state = next
      bests += best.select(lit(r).as("round"),
        col("lhs"), col("rhs"), col("pair_count"))
    }
    (bests.result(), state)
  }

  /** Context-window length for [[qPackSequences]]. 256 keeps a few
    * hundred bins at fixture scale; a production pretraining run sets
    * 2048–8192 — the plan is length-agnostic. */
  private val PackLen = 256L

  /** Doc-id block size for the distributed prefix sum in
    * [[qPackSequences]]: the carry chain is |docs|/1024 rows — at 100 TB
    * (~10¹⁰ docs) that is ~10⁷ rows of (group, carry) longs, itself
    * prefix-summable by one more level of the same decomposition. */
  private val PackGroup = 1024L

  /** GPT-style sequence packing: concatenate the corpus token stream in
    * doc_id order and split it every [[PackLen]] tokens — the "sample
    * packing" step every LLM pretraining pipeline runs so short
    * documents don't waste context-window slots. Output is the per-bin
    * manifest a packing job ships to the trainer: how many documents
    * touch the bin, how many START in it (attention-mask reset points),
    * and its token fill ([[PackLen]] everywhere except the final bin —
    * concat-and-split packs with zero padding waste by construction).
    *
    * The SCALE-SAFE spelling of the global token offset is the
    * q_peak_concurrency two-phase distributed prefix sum keyed on
    * doc_id blocks of [[PackGroup]]: (1) per-block token sums
    * prefix-scan over the tiny block relation, (2) the within-block
    * exclusive running sum adds the block's carry-in — so the
    * sequential scan is confined to 1024-doc partitions and the carry
    * chain is |docs|/1024 rows. The ORACLE is the naive single-window
    * prefix sum, so the decomposition is re-proven equal to the
    * textbook form on every verify run. Zero-token documents (text
    * that normalizes away) are excluded — they occupy no stream
    * positions. All arithmetic is BIGINT; bin membership explodes as
    * sequence(first_bin, last_bin) — ≤ len/L + 1 rows per doc, so the
    * explode is output-proportional, never quadratic. */
  def qPackSequences(s: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(s, dir)
      .select(col("doc_id"), size(toks).cast("long").as("len"))
      .filter(col("len") > 0))

  /** Core of [[qPackSequences]] over any (doc_id, len) relation —
    * exposed so CorpusSpec can pin exact bin boundaries on hand-built
    * lengths (straddlers, exact-fit, long-doc multi-bin spans). */
  private[graft] def packSequences(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grouped = d.withColumn("g", expr(s"doc_id div $PackGroup"))
      .localCheckpoint() // 2 consumers: block sums + within-block scan
    val carry = grouped.groupBy(col("g")).agg(sum(col("len")).as("gl"))
      .withColumn("carry_in",
        coalesce(sum(col("gl")).over(Window.orderBy(col("g"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("g"), col("carry_in"))
    val off = grouped.join(broadcast(carry), "g")
      .withColumn("off", col("carry_in") +
        coalesce(sum(col("len")).over(Window.partitionBy(col("g"))
          .orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    off
      .select(col("doc_id"), col("len"), col("off"),
        explode(sequence(expr(s"off div $PackLen"),
          expr(s"(off + len - 1) div $PackLen"))).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(expr(s"off div $PackLen") === col("bin"), 1L)
          .otherwise(0L)).as("n_starts"),
        sum(least(lit(PackLen) * (col("bin") + 1), col("off") + col("len"))
          - greatest(lit(PackLen) * col("bin"), col("off"))).as("n_tokens"))
      .orderBy("bin")
  }

  /** Slot budget for [[qQuotaAlloc]]. */
  private val QuotaSlots = 10000L

  /** Exact proportional quota allocation (largest-remainder method):
    * split a fixed budget of [[QuotaSlots]] training-doc slots across
    * languages proportional to token mass, with the leftover slots from
    * floor rounding handed out by LARGEST REMAINDER (tie → lang asc) so
    * the allocations sum to the budget EXACTLY — the integer-exact
    * version of what q_domain_mix's ppm weights approximate, and the
    * actual contract a sampling job needs (ppm weights × N drift by
    * rounding; quotas must not).
    *
    * All-integer: base = S·mₗ DIV M, remainder = S·mₗ − base·M compared
    * exactly (no fractions), one rank window over the LANGUAGE-
    * cardinality relation. Spec pins Σ alloc == S and the hand-computed
    * Hamilton example. */
  def qQuotaAlloc(s: SparkSession, dir: String): DataFrame =
    quotaAlloc(Tables.documents(s, dir)
      .select(col("lang"), size(toks).cast("long").as("ntok"))
      .groupBy("lang").agg(sum(col("ntok")).as("n_tokens")))

  /** Core of [[qQuotaAlloc]] over any (lang, n_tokens) relation. */
  private[graft] def quotaAlloc(m0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = m0.localCheckpoint() // 2 consumers: totals + the allocation
    val tot = m.agg(sum(col("n_tokens")).as("mm"))
    val based = m.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"$QuotaSlots * n_tokens div mm"))
      .withColumn("rem", expr(s"$QuotaSlots * n_tokens - base * mm"))
    val leftover = based.agg((lit(QuotaSlots) - sum(col("base"))).as("lo"))
    based.crossJoin(broadcast(leftover))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("rem").desc, col("lang").asc)))
      .select(col("lang"), col("n_tokens"), col("base"),
        (col("base") + when(col("rk") <= col("lo"), 1L).otherwise(0L))
          .as("alloc_slots"))
      .orderBy("lang")
  }

  /** Cross-source contamination matrix: 3-shingle Jaccard between every
    * SOURCE pair — the provenance diagnostic run before mixing corpora
    * ("is src7 just a re-crawl of src3?"), one level up from the
    * document-pair dedup family (q_ngram_jaccard compares documents;
    * this compares the collections themselves).
    *
    * Plan: one pass projects the corpus to DISTINCT (source, shingle-
    * hash) rows — 8-byte hashes shuffle, never shingle text; per-source
    * set sizes are a |sources|-row aggregate; the intersection counts
    * come from the shingle-keyed postings (collect_set of sources per
    * shingle, pairs exploded inside each posting — bounded by
    * |sources|², not corpus size), partial-agg'd down to the
    * |sources|²/2-row pair relation before any join. Jaccard is one
    * BIGINT DIV via |A∪B| = |A|+|B|−|A∩B|.
    *
    * Scale stance (100 TB): every shuffle after the first is bounded by
    * source-pair cardinality; the hot-shingle explode is |sources|² per
    * shingle worst-case — at 20 sources, 190 pairs; a 10⁴-source lake
    * runs the same plan with the pair explode capped by frequent-
    * shingle filtering (the q_ngram_jaccard_prefix doctrine). */
  def qSourceOverlap(s: SparkSession, dir: String): DataFrame =
    sourceOverlap(Tables.documents(s, dir)
      .select(col("source"),
        explode(TextPipeline.shinglesOf(toks)).as("g"))
      .select(col("source"), TextPipeline.h32(col("g")).as("h")))

  /** Core of [[qSourceOverlap]] over any (source, h) element relation —
    * exposed for ExtrasSpec's closed forms (known set intersections;
    * disjoint sources absent from the pair list). */
  private[graft] def sourceOverlap(el: DataFrame): DataFrame = {
    val sh = el.distinct()
      .localCheckpoint() // 2 consumers: sizes + postings
    val sz = sh.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = sh.groupBy(col("h"))
      .agg(collect_set(col("source")).as("srcs"))
      .filter(size(col("srcs")) > 1)
      .select(explode(col("srcs")).as("src_a"), col("srcs"))
      .select(col("src_a"), explode(col("srcs")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
      .join(sz.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("inter"),
        expr("inter * 1000000 div (n_a + n_b - inter)").as("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("src_a").asc, col("src_b").asc)
  }

  /** Tokenizer fertility by language: average BPE pieces per word after
    * the [[qBpeMerges]] training run — THE comparative-tokenizer metric
    * an LLM data team reads before fixing a vocabulary (high-fertility
    * languages pay more context-window per word; the number drives
    * per-language token budgets and sampling weights). Fertility is
    * occurrence-weighted (Σ n·pieces / Σ n over the corpus word
    * stream), reported in exact integer milli-units.
    *
    * Scale stance (100 TB): the trained segmentation state is
    * VOCABULARY-sized — the word is recovered from the segmented form
    * (remove separators) and the pieces table broadcasts; the corpus
    * contributes one (lang, word) wordcount-shaped partial agg (the
    * only data-bound stage, shuffle bounded by per-partition distinct
    * words), then a per-language rollup of a vocabulary-sized join. */
  def qTokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val (_, fin) = bpeTrain(s, dir)
    val vocab = fin.select(
      regexp_replace(col("st"), " ", "").as("word"),
      size(split(col("st"), " ")).cast("long").as("pieces"))
    val lw = Tables.documents(s, dir)
      .select(col("lang"), explode(toks).as("word"))
      .filter(col("word") =!= "")
      .groupBy("lang", "word").agg(count(lit(1)).as("n"))
    lw.join(broadcast(vocab), "word")
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("pieces")).as("n_pieces"))
      .select(col("lang"), col("n_words"), col("n_pieces"),
        expr("n_pieces * 1000 div n_words").as("fertility_milli"))
      .orderBy("lang")
  }

  /** The corpus datasheet in one query — the (metric, value) card a
    * data team publishes with a training corpus (Gebru et al.,
    * "Datasheets for Datasets"): volume (docs/tokens/chars), diversity
    * (vocabulary, languages, sources), contamination (exact-dup count
    * via the q_dedup_exact md5 convention), and shape (token-length
    * p50/p90/mean). Every number integer-exact.
    *
    * Scale stance (100 TB): ONE corpus scan feeds a single multi-
    * distinct aggregate (Spark plans count(DISTINCT x) columns via
    * expand — the q_multi_distinct shape) plus a doc-length histogram;
    * the percentiles run the q_ks_test VALUE-RESOLUTION cumsum — the
    * window sorts the distinct-length relation (bounded by max doc
    * length, NOT corpus cardinality); the vocabulary count is the
    * wordcount partial-agg shape. No full-relation sort anywhere. */
  def qDatasetCard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = Tables.documents(s, dir)
      .select(col("lang"), col("source"), col("n_chars"),
        size(toks).cast("long").as("nt"),
        // the q_dedup_exact fingerprint (normalized tokens, not raw
        // text) so the contamination number matches what the dedup
        // tier would actually remove
        md5(concat_ws(" ", toks)).as("sig"))
      .localCheckpoint() // 2 consumers: the stats agg + the histogram
    val stats = per.agg(count(lit(1)).as("n"), sum(col("nt")).as("toks"),
        sum(col("n_chars")).as("chars"),
        countDistinct(col("lang")).as("nl"),
        countDistinct(col("source")).as("ns"),
        countDistinct(col("sig")).as("nd"))
      .localCheckpoint() // 1 row; consumed by 6 metric rows + percentiles
    val vocab = TextPipeline.words(Tables.documents(s, dir), "text")
      .agg(countDistinct(col("word")).as("v"))
    val cum = per.groupBy(col("nt")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("nt")).rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .localCheckpoint() // distinct-length cardinality; 2 percentile cuts
    def pct(num: Int, den: Int, name: String): DataFrame =
      cum.crossJoin(broadcast(stats))
        .filter(col("cum") * den >= col("n") * num)
        .agg(min(col("nt")).as("value"))
        .select(lit(name).as("metric"), col("value"))
    def stat(c: Column, name: String): DataFrame =
      stats.select(lit(name).as("metric"), c.cast("long").as("value"))
    stat(col("n"), "docs_total")
      .unionAll(stat(col("n") - col("nd"), "docs_exact_dup"))
      .unionAll(stat(col("toks"), "tokens_total"))
      .unionAll(stat(col("chars"), "chars_total"))
      .unionAll(vocab.select(lit("vocab_size").as("metric"),
        col("v").cast("long").as("value")))
      .unionAll(stat(col("nl"), "langs_distinct"))
      .unionAll(stat(col("ns"), "sources_distinct"))
      .unionAll(pct(1, 2, "tokens_per_doc_p50"))
      .unionAll(pct(9, 10, "tokens_per_doc_p90"))
      .unionAll(stats.select(lit("tokens_per_doc_mean_milli").as("metric"),
        when(col("n") > 0, expr("toks * 1000 div n"))
          .otherwise(lit(null).cast("long")).as("value")))
      .orderBy("metric")
  }

  /** Heaps-law vocabulary-growth curve: cumulative vocabulary size vs
    * cumulative token count across ten hash-random corpus slices — the
    * measurement behind "how much NEW vocabulary does the next 10 TB
    * buy", which sizes tokenizer vocab and dedup value. Slice order is
    * h32(doc_id) mod 10 (a reproducible random permutation — the standard
    * presentation order for growth curves), so NO global sort or
    * row_number over the corpus exists anywhere in the plan.
    *
    * Scale stance (100 TB): tokens-per-slice is one wordcount-shaped
    * partial agg; vocabulary-first-slice is `groupBy(word).agg(min(b))` —
    * vocabulary-cardinality shuffle; both collapse to a 10-row relation
    * joined on a literal spine, and the cumulative window orders 10 rows
    * (single tiny partition by construction, not by accident). */
  def qHeapsLaw(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = Tables.documents(s, dir).select(
      (TextPipeline.h32(col("doc_id").cast("string")) % 10).as("b"),
      explode(toks).as("word"))
    val tokPerB = words.groupBy("b").agg(count(lit(1)).as("toks"))
    val vocabPerB = words.groupBy("word").agg(min(col("b")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("nv"))
    val spine = s.range(10).select(col("id").as("b"))
    val w = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(tokPerB, Seq("b"), "left").join(vocabPerB, Seq("b"), "left")
      .select(col("b"), coalesce(col("toks"), lit(0L)).as("toks"),
        coalesce(col("nv"), lit(0L)).as("nv"))
      .select(col("b").as("slice"),
        sum(col("toks")).over(w).as("cum_tokens"),
        sum(col("nv")).over(w).as("cum_vocab"))
      .withColumn("vocab_per_mtoken",
        when(col("cum_tokens") > 0,
          expr("cum_vocab * 1000000 div cum_tokens")))
      .orderBy("slice")
  }

  /** Context-window truncation budget: for the candidate context lengths
    * {64, 128, 256, 512}, how many documents overflow and what fraction
    * of corpus tokens a truncate-at-budget policy discards (integer
    * ppm) — the table a pretraining run consults before picking sequence
    * length vs paying for [[qPackSequences]]-style packing.
    *
    * Scale stance (100 TB): one narrow scan computes each doc's token
    * count; the 4-budget explode multiplies ROWS (of one bigint), not
    * text bytes, and the partial aggregate collapses everything to 4
    * groups map-side — shuffle traffic is constant. */
  def qContextTruncation(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(size(toks).cast("long").as("nt"))
      .select(col("nt"),
        explode(lit(Array(64L, 128L, 256L, 512L))).as("budget"))
      .groupBy("budget")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("nt") > col("budget"), 1L).otherwise(0L))
          .as("docs_truncated"),
        sum(col("nt")).as("tokens_total"),
        sum(least(col("nt"), col("budget"))).as("tokens_kept"))
      .withColumn("tokens_lost_ppm",
        when(col("tokens_total") > 0,
          expr("(tokens_total - tokens_kept) * 1000000 div tokens_total")))
      .orderBy("budget")

  /** The corpus-prep pipeline END TO END as ONE declarative DAG —
    * redaction (qRedact's scrubbers) → distribution quality gate
    * (qQualityGate's [p10, p90] token bounds, measured on the REDACTED
    * text) → exact dedup (qDedupExact's min-id-per-fingerprint rule) →
    * deterministic split (qTrainSplit's h32 mod 100) → per (split, lang)
    * doc/token counts. This is the composition a user actually ships:
    * one plan, one lineage, stage rules identical to the individually
    * verified queries so the capstone can't drift from its parts.
    *
    * Scale stance (100 TB): the text is scanned ONCE (scrub + tokenize
    * fused in the scan projection); the gate is a broadcast 1-row
    * percentile pair; dedup shuffles a 16-byte fingerprint per survivor
    * (never text); the split is a pure hash projection; the final
    * partial agg collapses to |splits|·|langs| groups map-side. */
  /** The capstone's redaction pass over a text column — shared verbatim
    * with the STREAMING twin (`Windows.corpusPipelineStream`) so the two
    * spellings cannot drift. */
  private[graft] def pipelineRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
        "[0-9]{6,}", "<NUM>"),
      "https?://[^ ]+", "<URL>")

  /** The redaction regexes as (name, pattern) — one source of truth for
    * [[pipelineRedact]], [[qRedact]]-adjacent queries and the
    * [[qPiiReport]] detection view (portable: no Java-only regex
    * features, so DuckDB's RE2 matches identically). */
  private[graft] val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+",
    "num" -> "[0-9]{6,}",
    "url" -> "https?://[^ ]+")

  /** PII detection report — the audit view the redaction pass
    * ([[pipelineRedact]] / q_redact) is flying blind without: per source,
    * how many documents carry each PII class and how many total
    * occurrences, PLUS the redaction-closure check — the same detectors
    * re-run on the REDACTED text must find zero residual matches (the
    * replacement tokens contain no '@', no digit runs, no scheme, and
    * the email→num→url application order cannot manufacture new
    * matches). A nonzero `n_residual` is a silent-leak alarm, surfaced
    * as a column so the verify gate — not a human — watches it.
    *
    * Scale stance (100 TB): one text scan, all counts from per-row
    * regexp_extract_all sizes partial-aggregated to |sources| groups;
    * no shuffle carries text. */
  def qPiiReport(s: SparkSession, dir: String): DataFrame = {
    def hits(c: Column, p: String): Column =
      size(regexp_extract_all(c, lit(p), lit(0))).cast("long")
    val base = Tables.documents(s, dir).select(
      col("source") +: col("doc_id") +:
        (PiiPatterns.map { case (n, p) =>
          hits(col("text"), p).as(s"h_$n") } :+
          PiiPatterns.map { case (_, p) =>
            hits(pipelineRedact(col("text")), p) }
            .reduce(_ + _).as("resid")): _*)
    base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        PiiPatterns.map { case (n, _) =>
          sum(when(col(s"h_$n") > 0, 1L).otherwise(0L)).as(s"docs_$n") } ++
        PiiPatterns.map { case (n, _) =>
          sum(col(s"h_$n")).as(s"n_$n") } :+
        sum(col("resid")).as("n_residual"): _*)
      .orderBy("source")
  }

  /** The capstone's deterministic hash split of a doc id — shared with
    * the streaming twin. */
  private[graft] def pipelineSplit(docId: Column): Column =
    pipelineSplitOf(pmod(TextPipeline.h32(docId.cast("string")), lit(100)))

  /** Split label from an already-computed bucket — the ONE place the
    * 80/90 thresholds live, so a stage that needs the raw bucket too
    * (qCorpusPipelineFull's decontamination scope) derives both the
    * predicate and the label from the same b and cannot drift from
    * [[pipelineSplit]]. */
  private[graft] def pipelineSplitOf(b: Column): Column =
    when(b < 80, "train").when(b < 90, "val").otherwise("test")

  /** Cleaned capstone input (doc_id, lang, w, nt) — exposed so the
    * streaming twin's spec derives the SAME quality-gate bounds the
    * batch plan computes (the profiling side input of an online run). */
  private[graft] def pipelineCleaned(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        pipelineRedact(col("text")).as("clean_text"))
      .select(col("doc_id"), col("lang"),
        TextPipeline.normalizedTokens(col("clean_text")).as("w"))
      .select(col("doc_id"), col("lang"), col("w"),
        size(col("w")).cast("long").as("nt"))

  def qCorpusPipeline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cleaned = pipelineCleaned(s, dir)
    val bounds = cleaned.agg(expr("percentile(nt, 0.1)").as("p10"),
      expr("percentile(nt, 0.9)").as("p90"))
    cleaned.crossJoin(broadcast(bounds))
      .filter(col("nt") >= col("p10") && col("nt") <= col("p90"))
      .withColumn("fp", md5(concat_ws(" ", col("w"))))
      .withColumn("canon", min(col("doc_id")).over(Window.partitionBy("fp")))
      .filter(col("doc_id") === col("canon"))
      .select(col("lang"), col("nt"), pipelineSplit(col("doc_id")).as("split"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      .orderBy("split", "lang")
  }

  /** Contamination-ratio cut for [[qCorpusPipelineFull]]'s
    * decontamination stage: a TRAIN document whose cleaned trigram set
    * overlaps the held-out TEST slice by ≥ this fraction is dropped
    * (sf0.01: cuts the 4 near-verbatim test clones, ratio ≥ 0.95, while
    * the ~0.12-mean incidental overlap of a 31-word vocab passes). */
  private[graft] val DecontT = 0.5

  /** The FULL production pipeline capstone (round-13 VERDICT Next #4):
    * [[qCorpusPipeline]] stops at exact-fingerprint dedup; this rung
    * composes the complete ordering a pretraining corpus actually runs —
    * clean/redact → quality gate → exact dedup → WINNOW NEAR-DUP
    * survivor selection → DECONTAMINATION → train/val/test split →
    * token-budget SHARD PACKING — as one gated DAG, because stage
    * CONTRACTS (which token stream feeds the fingerprints, how dedup-
    * induced row loss shifts shard boundaries, whether the split is
    * stable under upstream drops) only break in composition.
    *
    * Stage semantics, each inherited from its individually-green rung:
    *  - gate: nt ∈ [p10, p90] over the cleaned corpus (qCorpusPipeline);
    *  - exact: md5 fingerprint of the cleaned token stream, min-doc_id
    *    canon (qCorpusPipeline / q_dedup_exact);
    *  - fuzzy: winnow fingerprints computed over the CLEANED tokens of
    *    the exact survivors (NOT raw text — the contract composition
    *    exists to pin), candidates per (lang, fingerprint), exact
    *    trigram-jaccard ≥ Dedup.JaccardT verify, transitive clusters
    *    (Dedup.components star contraction), survivor = most tokens,
    *    tie → smaller doc_id (q_dedup_survivors' rep rule);
    *  - decon: surviving train-bucket docs (h32 split, b < 80) whose
    *    cleaned-trigram overlap with the surviving TEST slice (b ≥ 90)
    *    is ≥ [[DecontT]] are dropped; val/test pass through
    *    (q_decontaminate's measurement, turned into the cut it exists
    *    to inform);
    *  - split: the shared [[pipelineSplit]] content-hash buckets —
    *    stable under every upstream drop because assignment is a pure
    *    per-doc function, never a position;
    *  - pack: per (split, lang), docs in doc_id order, shard_id =
    *    exclusive-prefix token count / ShardBudget (q_token_shards).
    *
    * Output is PER-DOCUMENT — (doc_id, lang, split, n_tokens, shard_id)
    * for every survivor — so the hash gate pins each stage's effect on
    * each row, not a summary a stage bug could hide inside.
    *
    * Scale stance (100 TB): every stage keeps its own rung's shape —
    * the gate is one broadcast percentile pair; exact dedup shuffles
    * 16-byte fingerprints; the fuzzy stage shuffles winnowed postings
    * (~2/(W+1) of the shingle stream) and verifies only candidates;
    * components runs on the verified-pair graph (duplicate-density
    * sized, not corpus-sized); decon broadcasts the distinct test-slice
    * shingle hashes (the benchmark side is tiny by construction); the
    * pack window partitions by (split, lang) — the one per-stratum
    * sequential step, with the documented two-pass prefix-sum fallback
    * for a giant stratum. */
  def qCorpusPipelineFull(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cleaned = pipelineCleaned(s, dir)
    val bounds = cleaned.agg(expr("percentile(nt, 0.1)").as("p10"),
      expr("percentile(nt, 0.9)").as("p90"))
    // exact-fingerprint survivors of the quality-gated corpus; cut: the
    // relation feeds the winnow postings, the shingle fetch, AND the
    // final anti-join chain
    val exact = graft.core.Lineage.cut(
      cleaned.crossJoin(broadcast(bounds))
        .filter(col("nt") >= col("p10") && col("nt") <= col("p90"))
        .withColumn("fp", md5(concat_ws(" ", col("w"))))
        .withColumn("canon", min(col("doc_id")).over(Window.partitionBy("fp")))
        .filter(col("doc_id") === col("canon"))
        .select(col("doc_id"), col("lang"), col("w"), col("nt")))
    // fuzzy near-dup over the CLEANED token stream of exact survivors
    val fps = TextAnalysis.winnowFpsOf(exact.select("doc_id", "lang", "w"))
    val cand = fps.select(col("lang"), col("fingerprint"), col("doc_id").as("a_id"))
      .join(fps.select(col("lang"), col("fingerprint"), col("doc_id").as("b_id")),
        Seq("lang", "fingerprint"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val ss = exact.select(col("doc_id"),
      size(graft.core.TextPipeline.shinglesOf(col("w"))).as("n"),
      array_sort(graft.core.TextPipeline.shinglesOf(col("w"))).as("ss"))
    val pairs = cand
      .join(ss.select(col("doc_id").as("a_id"), col("n").as("a_n"),
        col("ss").as("a_ss")), "a_id")
      .join(ss.select(col("doc_id").as("b_id"), col("n").as("b_n"),
        col("ss").as("b_ss")), "b_id")
      .select(col("a_id"), col("b_id"),
        graft.functions.VectorFunctions.sortedIntersectCount(
          col("a_ss"), col("b_ss")).cast("long").as("inter"),
        col("a_n"), col("b_n"))
      .filter(col("inter").cast("double")
        / (col("a_n") + col("b_n") - col("inter")) >= Dedup.JaccardT)
    val clusters = Dedup.components(
      pairs.select(col("a_id").as("src"), col("b_id").as("dst")))
    val members = clusters.join(exact.select(col("doc_id"), col("nt")),
      clusters("id") === col("doc_id"))
    val reps = members.groupBy(col("lbl"))
      .agg(max_by(col("doc_id"), struct(col("nt"), -col("doc_id"))).as("rep_id"))
    val losers = members.join(broadcast(reps), "lbl")
      .filter(col("doc_id") =!= col("rep_id")).select(col("doc_id"))
    // decontamination over the fuzzy survivors; cut: test slice + train
    // probe + final pass-through all read it
    val fuzzy = graft.core.Lineage.cut(
      exact.join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("nt"),
          pipelineSplit(col("doc_id")).as("split"),
          array_distinct(transform(
            graft.core.TextPipeline.shinglesOf(col("w")),
            t => graft.core.TextPipeline.h32(t))).as("hs")))
    val testSh = fuzzy.filter(col("split") === "test")
      .select(explode(col("hs")).as("h")).distinct()
    val contaminated = fuzzy.filter(col("split") === "train")
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_sh"),
        explode(col("hs")).as("h"))
      .join(broadcast(testSh), "h")
      .groupBy(col("doc_id"), col("n_sh"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap").cast("double") / col("n_sh").cast("double")
        >= DecontT)
      .select(col("doc_id"))
    // split + shard packing over the final survivors
    val wPack = Window.partitionBy(col("split"), col("lang"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fuzzy.join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("nt"), col("split"))
      .withColumn("cum", sum(col("nt")).over(wPack))
      .select(col("doc_id"), col("lang"), col("split"),
        col("nt").as("n_tokens"),
        floor((col("cum") - col("nt")) / ShardBudget).as("shard_id"))
      .orderBy("doc_id")
  }

  /** Per-group sample size for [[qGroupSample]]. */
  private val GroupSampleK = 5

  /** Deterministic k-per-group sample — the eval-set construction step
    * ("give me 5 inspection documents per language, reproducibly"):
    * selection key is h32(doc_id), so the sample is stable across runs,
    * engines and partitionings, and SELECTION is the bounded `topk_min`
    * aggregate — O(k) state per group with map-side partials, never a
    * per-group `row_number()` window (which ships every group's full
    * membership to one reducer partition; fine at |lang| groups × docs,
    * fatal when the group key is high-cardinality). The chosen ids then
    * fetch their metadata by broadcast semi-join — the same
    * shortlist-then-fetch shape as the ANN re-rank.
    *
    * Oracle is the DIRECT window spelling, so the bounded aggregate is
    * re-proven equal to the straightforward semantics on every verify. */
  def qGroupSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val picked = docs
      .select(col("lang"),
        TextPipeline.h32(col("doc_id").cast("string")).as("h"), col("doc_id"))
      .groupBy("lang")
      .agg(graft.functions.VectorFunctions.topkMin(
        col("h"), col("doc_id"), GroupSampleK).as("top"))
      .select(col("lang"), posexplode(col("top.id")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("pick"),
        col("col").as("doc_id"))
    docs.select(col("doc_id"), col("n_chars"))
      .join(broadcast(picked), Seq("doc_id"))
      .select(col("lang"), col("pick"), col("doc_id"), col("n_chars"))
      .orderBy("lang", "pick")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pii_report" -> (qPiiReport _),
    "q_group_sample" -> (qGroupSample _),
    "q_corpus_pipeline" -> (qCorpusPipeline _),
    "q_corpus_pipeline_full" -> (qCorpusPipelineFull _),
    "q_heaps_law" -> (qHeapsLaw _),
    "q_context_truncation" -> (qContextTruncation _),
    "q_dataset_card" -> (qDatasetCard _),
    "q_tokenizer_fertility" -> (qTokenizerFertility _),
    "q_source_overlap" -> (qSourceOverlap _),
    "q_quota_alloc" -> (qQuotaAlloc _),
    "q_pack_sequences" -> (qPackSequences _),
    "q_domain_mix" -> (qDomainMix _),
    "q_bpe_merges" -> (qBpeMerges _),
    "q_bpe_encode" -> (qBpeEncode _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_redact" -> (qRedact _),
    "q_quality_gate" -> (qQualityGate _),
    "q_lang_balance" -> (qLangBalance _),
    "q_train_split" -> (qTrainSplit _),
    "q_token_shards" -> (qTokenShards _),
    "q_chunk_docs" -> (qChunkDocs _),
    "q_chunk_content_defined" -> (qChunkContentDefined _),
    "q_chunk_boilerplate" -> (qChunkBoilerplate _),
    "q_decontaminate" -> (qDecontaminate _),
  )

  /** Oracle twin of [[qBpeMerges]]: the same [[BpeRounds]] rounds unrolled
    * as chained CTEs, the same fold via DuckDB's list_reduce (init = first
    * element, left-to-right — identical greedy semantics). */
  private lazy val bpeOracle: String =
    s"WITH $bpeCtes\nSELECT * FROM ($bpeMergesUnion) ORDER BY round"

  /** Oracle twin of [[qBpeEncode]]: the same chain, then the subword
    * frequency table of the final segmentation. */
  private lazy val bpeEncodeOracle: String =
    s"""WITH $bpeCtes
       |SELECT subword, CAST(sum(n) AS BIGINT) AS cnt FROM (
       |  SELECT unnest(string_split(st, ' ')) AS subword, n FROM s$BpeRounds) e
       |GROUP BY subword ORDER BY subword""".stripMargin

  private lazy val bpeMergesUnion: String = (1 to BpeRounds)
    .map(i => s"SELECT $i AS round, lhs, rhs, pair_count FROM b$i")
    .mkString(" UNION ALL ")

  /** The unrolled [[BpeRounds]]-round CTE chain shared by both BPE
    * oracles, ending in b1..bN (per-round best pairs) and sN (final
    * segmentation state). */
  private lazy val bpeCtes: String = {
    val norm = TextPipeline.duckNormalize
    def lastSym(acc: String) =
      s"list_extract(string_split($acc,' '), len(string_split($acc,' ')))"
    val head = Seq(
      s"""w AS (SELECT word, count(*) AS n FROM
         |  (SELECT ${norm("t")} AS word
         |   FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents) q
         |   WHERE ${norm("t")} <> '') q2 GROUP BY word)""".stripMargin,
      """s0 AS (SELECT n, trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS st FROM w)""")
    val rounds = (1 to BpeRounds).flatMap { i =>
      Seq(
        s"""p$i AS (SELECT pr[1] AS lhs, pr[2] AS rhs,
           |    CAST(sum(n) AS BIGINT) AS pair_count FROM (
           |  SELECT unnest(list_transform(range(1, len(ss)), j -> [ss[j], ss[j+1]])) AS pr, n
           |  FROM (SELECT string_split(st, ' ') AS ss, n FROM s${i - 1}) t$i) u$i
           |  GROUP BY 1, 2)""".stripMargin,
        s"""b$i AS (SELECT lhs, rhs, pair_count FROM p$i
           |        ORDER BY pair_count DESC, lhs, rhs LIMIT 1)""".stripMargin,
        s"""s$i AS (SELECT n, list_reduce(string_split(st, ' '), (acc, x) ->
           |  CASE WHEN ${lastSym("acc")} = b.lhs AND x = b.rhs
           |       THEN left(acc, len(acc) - len(${lastSym("acc")})) || b.lhs || b.rhs
           |       ELSE acc || ' ' || x END) AS st FROM s${i - 1}, b$i b)""".stripMargin)
    }
    (head ++ rounds).mkString(",\n")
  }

  val oracle: Map[String, String] = Map(
    // Same portable regexes, same scrub chain for the residual check.
    "q_pii_report" -> {
      val hits = PiiPatterns.map { case (n, p) =>
        s"len(regexp_extract_all(text, '$p')) AS h_$n" }.mkString(",\n  ")
      val resid = PiiPatterns.map { case (_, p) =>
        s"len(regexp_extract_all(rt, '$p'))" }.mkString(" + ")
      val aggs = (PiiPatterns.map { case (n, _) =>
        s"CAST(sum(CASE WHEN h_$n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_$n" } ++
        PiiPatterns.map { case (n, _) =>
          s"CAST(sum(h_$n) AS BIGINT) AS n_$n" }).mkString(",\n  ")
      s"""WITH r AS (SELECT source, text,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '${PiiPatterns(0)._2}', '<EMAIL>', 'g'),
         |      '${PiiPatterns(1)._2}', '<NUM>', 'g'),
         |      '${PiiPatterns(2)._2}', '<URL>', 'g') AS rt
         |  FROM documents),
         |d AS (SELECT source,
         |  $hits,
         |  $resid AS resid
         |  FROM r)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  $aggs,
         |  CAST(sum(resid) AS BIGINT) AS n_residual
         |FROM d GROUP BY source ORDER BY source""".stripMargin
    },
    // The DIRECT per-group window spelling — the bounded topk_min
    // aggregate must agree with it on every verify run.
    "q_group_sample" ->
      s"""WITH r AS (SELECT lang, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${TextPipeline.duckH32("CAST(doc_id AS VARCHAR)")},
         |        doc_id) AS pick
         |  FROM documents)
         |SELECT lang, CAST(pick AS INT) AS pick, doc_id,
         |  CAST(n_chars AS BIGINT) AS n_chars
         |FROM r WHERE pick <= $GroupSampleK ORDER BY lang, pick""".stripMargin,
    // The same four stage rules as the component oracles, chained:
    // scrub regexes, quantile_cont gate, min-id fingerprint dedup,
    // h32 mod 100 split.
    "q_corpus_pipeline" ->
      s"""WITH scrubbed AS (SELECT doc_id, lang,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
         |      '[0-9]{6,}', '<NUM>', 'g'),
         |      'https?://[^ ]+', '<URL>', 'g') AS text
         |  FROM documents),
         |counted AS (SELECT doc_id, lang, $duckToks AS w,
         |    CAST(len($duckToks) AS BIGINT) AS nt FROM scrubbed),
         |bounds AS (SELECT quantile_cont(nt, 0.1) AS p10,
         |                  quantile_cont(nt, 0.9) AS p90 FROM counted),
         |gated AS (SELECT * FROM counted, bounds
         |          WHERE nt >= p10 AND nt <= p90),
         |fps AS (SELECT doc_id, lang, nt,
         |    md5(coalesce(list_aggr(w, 'string_agg', ' '), '')) AS fp
         |  FROM gated),
         |deduped AS (SELECT doc_id, lang, nt FROM (
         |    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS canon FROM fps)
         |  WHERE doc_id = canon),
         |labeled AS (SELECT lang, nt,
         |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT lang, nt,
         |          ${TextPipeline.duckH32("CAST(doc_id AS VARCHAR)")} % 100
         |            AS b FROM deduped))
         |SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens
         |FROM labeled GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    // The composed production DAG: every stage re-spelled as one CTE
    // chain over the SAME cleaned token stream — scrub, percentile gate,
    // exact-fp canon, winnow postings + jaccard verify + recursive
    // min-label closure + rep rule, trigram decontamination cut,
    // content-hash split, running-sum shard packing.
    "q_corpus_pipeline_full" -> {
      val wm1 = TextAnalysis.WinnowW - 1
      val h32d = TextPipeline.duckH32("CAST(doc_id AS VARCHAR)")
      val tri = TextPipeline.duckTrigrams("w")
      s"""WITH RECURSIVE scrubbed AS (SELECT doc_id, lang,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
         |      '[0-9]{6,}', '<NUM>', 'g'),
         |      'https?://[^ ]+', '<URL>', 'g') AS text
         |  FROM documents),
         |counted AS (SELECT doc_id, lang, $duckToks AS w,
         |    CAST(len($duckToks) AS BIGINT) AS nt FROM scrubbed),
         |bounds AS (SELECT quantile_cont(nt, 0.1) AS p10,
         |                  quantile_cont(nt, 0.9) AS p90 FROM counted),
         |gated AS (SELECT doc_id, lang, w, nt FROM counted, bounds
         |          WHERE nt >= p10 AND nt <= p90),
         |efps AS (SELECT doc_id, lang, w, nt,
         |    md5(coalesce(list_aggr(w, 'string_agg', ' '), '')) AS fp
         |  FROM gated),
         |ex AS (SELECT doc_id, lang, w, nt FROM (
         |    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS canon FROM efps)
         |  WHERE doc_id = canon),
         |g2 AS (SELECT doc_id, lang,
         |    list_transform($tri, t -> ${TextPipeline.duckH32("t")}) AS hs
         |  FROM ex),
         |f AS (SELECT doc_id, lang, unnest(list_distinct(
         |        list_transform(range(1, greatest(len(hs) - $wm1, 1) + 1),
         |          i -> list_min(list_slice(hs, i, i + $wm1))))) AS wfp
         |      FROM g2 WHERE len(hs) >= 1),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |         FROM f a JOIN f b ON a.lang = b.lang AND a.wfp = b.wfp
         |           AND a.doc_id < b.doc_id),
         |sh AS (SELECT doc_id, list_distinct($tri) AS s
         |       FROM ex WHERE len(w) >= 3),
         |pairs AS (SELECT c.a_id, c.b_id
         |  FROM cand c JOIN sh a ON a.doc_id = c.a_id
         |              JOIN sh b ON b.doc_id = c.b_id
         |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.s, b.s))) >= ${Dedup.JaccardT}),
         |edges AS (SELECT a_id AS s, b_id AS t FROM pairs
         |          UNION ALL SELECT b_id, a_id FROM pairs),
         |nodes AS (SELECT DISTINCT s AS id FROM edges),
         |reach AS (
         |  SELECT id, id AS lbl FROM nodes
         |  UNION
         |  SELECT e.t AS id, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
         |clusters AS (SELECT id AS doc_id, min(lbl) AS cluster_id
         |             FROM reach GROUP BY id),
         |members AS (SELECT c.cluster_id, c.doc_id, e.nt
         |            FROM clusters c JOIN ex e USING (doc_id)),
         |reps AS (SELECT cluster_id, doc_id AS rep_id FROM (
         |    SELECT cluster_id, doc_id, row_number() OVER (
         |      PARTITION BY cluster_id ORDER BY nt DESC, doc_id ASC) AS rn
         |    FROM members) WHERE rn = 1),
         |losers AS (SELECT m.doc_id FROM members m
         |           JOIN reps r USING (cluster_id) WHERE m.doc_id <> r.rep_id),
         |fz AS (SELECT e.doc_id, e.lang, e.nt, $h32d % 100 AS b,
         |    list_distinct(list_transform($tri,
         |      t -> ${TextPipeline.duckH32("t")})) AS hs
         |  FROM ex e ANTI JOIN losers l ON e.doc_id = l.doc_id),
         |testh AS (SELECT DISTINCT unnest(hs) AS h FROM fz WHERE b >= 90),
         |probe AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_sh,
         |    unnest(hs) AS h FROM fz WHERE b < 80),
         |cont AS (SELECT doc_id FROM (
         |    SELECT p.doc_id, p.n_sh, count(*) AS n_overlap
         |    FROM probe p SEMI JOIN testh t ON p.h = t.h
         |    GROUP BY p.doc_id, p.n_sh)
         |  WHERE CAST(n_overlap AS DOUBLE) / n_sh >= $DecontT),
         |labeled AS (SELECT doc_id, lang, nt,
         |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM fz ANTI JOIN cont USING (doc_id))
         |SELECT doc_id, lang, split, CAST(nt AS BIGINT) AS n_tokens,
         |  (CAST(sum(nt) OVER (PARTITION BY split, lang ORDER BY doc_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |   - nt) // $ShardBudget AS shard_id
         |FROM labeled ORDER BY doc_id""".stripMargin
    },
    // Same hash-random slices, same min-slice vocabulary attribution,
    // cumulative window over the 10-row spine.
    "q_heaps_law" ->
      s"""WITH w AS (SELECT
         |    ${TextPipeline.duckH32("CAST(doc_id AS VARCHAR)")} % 10 AS b,
         |    unnest($duckToks) AS word
         |  FROM documents),
         |tb AS (SELECT b, CAST(count(*) AS BIGINT) AS toks FROM w GROUP BY b),
         |fb AS (SELECT b, CAST(count(*) AS BIGINT) AS nv FROM
         |    (SELECT word, min(b) AS b FROM w GROUP BY word) GROUP BY b),
         |sp AS (SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS b),
         |j AS (SELECT sp.b, coalesce(toks, 0) AS toks, coalesce(nv, 0) AS nv
         |      FROM sp LEFT JOIN tb USING (b) LEFT JOIN fb USING (b)),
         |c AS (SELECT b AS slice,
         |    CAST(sum(toks) OVER (ORDER BY b) AS BIGINT) AS cum_tokens,
         |    CAST(sum(nv) OVER (ORDER BY b) AS BIGINT) AS cum_vocab
         |  FROM j)
         |SELECT slice, cum_tokens, cum_vocab,
         |  CASE WHEN cum_tokens > 0
         |       THEN cum_vocab * 1000000 // cum_tokens END AS vocab_per_mtoken
         |FROM c ORDER BY slice""".stripMargin,
    // Same per-doc token count crossed with the 4-budget spine.
    "q_context_truncation" ->
      s"""WITH per AS (SELECT CAST(len($duckToks) AS BIGINT) AS nt
         |             FROM documents),
         |b AS (SELECT CAST(unnest([64, 128, 256, 512]) AS BIGINT) AS budget)
         |SELECT budget, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN nt > budget THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_truncated,
         |  CAST(sum(nt) AS BIGINT) AS tokens_total,
         |  CAST(sum(least(nt, budget)) AS BIGINT) AS tokens_kept,
         |  CASE WHEN CAST(sum(nt) AS BIGINT) > 0
         |       THEN CAST(sum(nt) - sum(least(nt, budget)) AS BIGINT)
         |              * 1000000 // CAST(sum(nt) AS BIGINT)
         |  END AS tokens_lost_ppm
         |FROM per, b GROUP BY budget ORDER BY budget""".stripMargin,
    // One scan + multi-distinct + value-resolution cumsum percentiles,
    // spelled naively.
    "q_dataset_card" ->
      s"""WITH per AS (SELECT lang, source, n_chars,
         |    CAST(len($duckToks) AS BIGINT) AS nt,
         |    md5(coalesce(list_aggr($duckToks, 'string_agg', ' '), ''))
         |      AS sig
         |  FROM documents),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(nt) AS BIGINT) AS toks,
         |    CAST(sum(n_chars) AS BIGINT) AS chars,
         |    CAST(count(DISTINCT lang) AS BIGINT) AS nl,
         |    CAST(count(DISTINCT source) AS BIGINT) AS ns,
         |    CAST(count(DISTINCT sig) AS BIGINT) AS nd FROM per),
         |vocab AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v
         |  FROM (SELECT unnest($duckToks) AS word FROM documents) w),
         |hist AS (SELECT nt, count(*) AS c FROM per GROUP BY nt),
         |cum AS (SELECT nt, sum(c) OVER (ORDER BY nt) AS cum FROM hist)
         |SELECT metric, value FROM (
         |  SELECT 'docs_total' AS metric, n AS value FROM stats
         |  UNION ALL SELECT 'docs_exact_dup', n - nd FROM stats
         |  UNION ALL SELECT 'tokens_total', toks FROM stats
         |  UNION ALL SELECT 'chars_total', chars FROM stats
         |  UNION ALL SELECT 'vocab_size', v FROM vocab
         |  UNION ALL SELECT 'langs_distinct', nl FROM stats
         |  UNION ALL SELECT 'sources_distinct', ns FROM stats
         |  UNION ALL SELECT 'tokens_per_doc_p50',
         |    (SELECT CAST(min(nt) AS BIGINT) FROM cum, stats
         |     WHERE cum * 2 >= n)
         |  UNION ALL SELECT 'tokens_per_doc_p90',
         |    (SELECT CAST(min(nt) AS BIGINT) FROM cum, stats
         |     WHERE cum * 10 >= 9 * n)
         |  UNION ALL SELECT 'tokens_per_doc_mean_milli',
         |    CASE WHEN n > 0 THEN toks * 1000 // n ELSE NULL END
         |  FROM stats) card
         |ORDER BY metric""".stripMargin,
    // The same BPE chain, final segmentation joined back to the
    // per-language word stream by the de-segmented word.
    "q_tokenizer_fertility" ->
      s"""WITH $bpeCtes,
         |vocab AS (SELECT replace(st, ' ', '') AS word,
         |    CAST(len(string_split(st, ' ')) AS BIGINT) AS pieces
         |  FROM s$BpeRounds),
         |lw AS (SELECT lang, word, count(*) AS n FROM (
         |    SELECT lang, unnest($duckToks) AS word FROM documents) q
         |  GROUP BY 1, 2)
         |SELECT lang, CAST(sum(n) AS BIGINT) AS n_words,
         |  CAST(sum(n * pieces) AS BIGINT) AS n_pieces,
         |  CAST(sum(n * pieces) * 1000 AS BIGINT)
         |    // CAST(sum(n) AS BIGINT) AS fertility_milli
         |FROM lw JOIN vocab USING (word)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    // Quadratic self-join spelling of the postings pair count — proves
    // the explode-within-posting plan equals the textbook intersection.
    "q_source_overlap" -> {
      import TextPipeline.{duckH32, duckShingles}
      s"""WITH toks AS MATERIALIZED (
         |  SELECT source, $duckToks AS w FROM documents),
         |sh AS MATERIALIZED (
         |  SELECT DISTINCT source, ${duckH32("g")} AS h
         |  FROM (SELECT source, unnest(${duckShingles("w")}) AS g
         |        FROM toks)),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n
         |       FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(count(*) AS BIGINT) AS inter
         |  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, inter,
         |  inter * 1000000 // (sa.n + sb.n - inter) AS jaccard_ppm
         |FROM inter
         |JOIN sz sa ON sa.source = src_a
         |JOIN sz sb ON sb.source = src_b
         |ORDER BY jaccard_ppm DESC, src_a ASC, src_b ASC""".stripMargin
    },
    // Same floor base, exact integer remainders, largest-remainder rank.
    "q_quota_alloc" ->
      s"""WITH m AS (
         |  SELECT lang, CAST(sum(len($duckToks)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS mm FROM m),
         |b AS (SELECT lang, n_tokens,
         |        10000 * n_tokens // mm AS base,
         |        10000 * n_tokens - (10000 * n_tokens // mm) * mm AS rem
         |      FROM m, t),
         |lo AS (SELECT 10000 - CAST(sum(base) AS BIGINT) AS lo FROM b),
         |r AS (SELECT lang, n_tokens, base, rem,
         |        row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk
         |      FROM b)
         |SELECT lang, n_tokens, base,
         |  base + CASE WHEN rk <= lo THEN 1 ELSE 0 END AS alloc_slots
         |FROM r, lo ORDER BY lang""".stripMargin,
    // Naive single-window prefix sum — proves the two-phase block
    // decomposition equals the textbook offset stream.
    "q_pack_sequences" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($duckToks) AS BIGINT) AS len
         |  FROM documents),
         |nz AS (SELECT * FROM d WHERE len > 0),
         |o AS (
         |  SELECT doc_id, len,
         |    CAST(coalesce(sum(len) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS off
         |  FROM nz),
         |b AS (
         |  SELECT doc_id, len, off,
         |    unnest(range(off // $PackLen, (off + len - 1) // $PackLen + 1))
         |      AS bin
         |  FROM o)
         |SELECT bin, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN off // $PackLen = bin THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_starts,
         |  CAST(sum(least(($PackLen) * (bin + 1), off + len)
         |         - greatest(($PackLen) * bin, off)) AS BIGINT) AS n_tokens
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q_domain_mix" ->
      s"""WITH counted AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(len($duckToks)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |w AS (SELECT *, CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6)
         |                AS BIGINT) AS wq FROM counted),
         |t AS (SELECT CAST(sum(wq) AS BIGINT) AS sum_wq FROM w)
         |SELECT source, n_docs, n_tokens,
         |  (wq * 1000000) // sum_wq AS weight_ppm
         |FROM w, t ORDER BY source""".stripMargin,
    "q_bpe_merges" -> bpeOracle,
    "q_bpe_encode" -> bpeEncodeOracle,
    "q_weighted_sample" -> {
      val h = TextPipeline.duckH32("CAST(doc_id AS VARCHAR)")
      s"""WITH keyed AS (
         |  SELECT doc_id, lang,
         |    ln(CAST($h + 1 AS DOUBLE) / 4294967296.0)
         |      / CAST(n_chars AS DOUBLE) AS k
         |  FROM documents),
         |ranked AS (
         |  SELECT lang, doc_id,
         |    CAST(row_number() OVER (PARTITION BY lang
         |      ORDER BY k DESC, doc_id ASC) AS INT) AS rn
         |  FROM keyed)
         |SELECT lang, doc_id, rn FROM ranked
         |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin
    },
    "q_redact" ->
      """WITH c AS (SELECT doc_id, text,
        | regexp_replace(regexp_replace(regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |   '[0-9]{6,}', '<NUM>', 'g'),
        |   'https?://[^ ]+', '<URL>', 'g') AS clean_text
        | FROM documents)
        |SELECT doc_id, md5(clean_text) AS clean_md5,
        | CAST(length(clean_text) AS INT) AS clean_len,
        | length(clean_text) <> length(text) AS was_redacted
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_quality_gate" ->
      s"""WITH counted AS (
         |  SELECT doc_id, CAST(len($duckToks) AS INT) AS n_tokens FROM documents),
         |bounds AS (SELECT quantile_cont(n_tokens, 0.1) AS p10,
         |                  quantile_cont(n_tokens, 0.9) AS p90 FROM counted)
         |SELECT doc_id, n_tokens FROM counted, bounds
         |WHERE n_tokens >= p10 AND n_tokens <= p90 ORDER BY doc_id""".stripMargin,
    "q_lang_balance" ->
      s"""WITH docs AS (SELECT doc_id, lang,
        |  ${TextPipeline.duckH32("CAST(doc_id AS VARCHAR)")} AS h
        |  FROM documents),
        |k AS (SELECT min(n) AS k FROM (SELECT count(*) AS n FROM docs GROUP BY lang)),
        |ranked AS (SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS INT) AS rnk
        |  FROM docs)
        |SELECT doc_id, lang, rnk FROM ranked, k
        |WHERE rnk <= k ORDER BY lang, rnk""".stripMargin,
    "q_train_split" ->
      s"""SELECT doc_id, lang,
         |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, lang,
         |        ${TextPipeline.duckH32("CAST(doc_id AS VARCHAR)")} % 100 AS b
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "q_token_shards" ->
      s"""WITH counted AS (
         |  SELECT doc_id, lang, CAST(len($duckToks) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT doc_id, lang, n_tokens,
         |  (CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |   - n_tokens) // 4096 AS shard_id
         |FROM counted ORDER BY doc_id""".stripMargin,
    // Same trigram hash stream, same modulo boundary rule, same cut-point
    // construction; chunk hashes over identical token slices.
    "q_chunk_content_defined" -> {
      val hc = TextPipeline.duckH32(
        "list_aggr(list_slice(w, cuts[j] + 1, cuts[j+1]), 'string_agg', ' ')")
      s"""WITH t AS (SELECT doc_id, $duckToks AS w FROM documents),
         |g AS (SELECT doc_id, w,
         |    list_transform(${TextPipeline.duckTrigrams("w")},
         |      x -> ${TextPipeline.duckH32("x")}) AS g
         |  FROM t WHERE len(w) > 0),
         |e0 AS (SELECT doc_id, w,
         |    list_transform(list_filter(range(1, len(g) + 1),
         |      i -> g[i] % $CdcDivisor = 0), i -> i + 2) AS ends FROM g),
         |e1 AS (SELECT doc_id, w,
         |    CASE WHEN len(ends) > 0 AND ends[-1] = len(w) THEN ends
         |         ELSE list_append(ends, len(w)) END AS ends FROM e0),
         |c AS (SELECT doc_id, w, list_prepend(0, ends) AS cuts FROM e1)
         |SELECT doc_id, CAST(j AS BIGINT) AS chunk_id,
         |  CAST(cuts[j+1] - cuts[j] AS BIGINT) AS n_tokens,
         |  $hc AS chunk_hash
         |FROM c, unnest(range(1, len(cuts))) AS u(j)
         |ORDER BY doc_id, chunk_id""".stripMargin
    },
    "q_chunk_docs" -> {
      val hc = TextPipeline.duckH32("array_to_string(chunk, ' ')")
      s"""WITH t AS (SELECT doc_id, $duckToks AS w FROM documents),
         |nz AS (SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) > 0),
         |starts AS (
         |  SELECT doc_id, w, n, unnest(range(0, n, $ChunkStride)) AS start FROM nz),
         |kept AS (SELECT * FROM starts
         |         WHERE start = 0 OR start + ${ChunkSize - ChunkStride} < n),
         |chunks AS (
         |  SELECT doc_id, CAST(start // $ChunkStride AS BIGINT) AS chunk_id,
         |         w[start+1 : start+$ChunkSize] AS chunk
         |  FROM kept)
         |SELECT doc_id, chunk_id, CAST(len(chunk) AS BIGINT) AS chunk_len,
         |       $hc AS chunk_hash
         |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin
    },
    "q_chunk_boilerplate" -> {
      val hc = TextPipeline.duckH32("array_to_string(chunk, ' ')")
      s"""WITH t AS (SELECT doc_id, $duckToks AS w FROM documents),
         |nz AS (SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) > 0),
         |starts AS (
         |  SELECT doc_id, w, n, unnest(range(0, n, $ChunkStride)) AS start FROM nz),
         |kept AS (SELECT * FROM starts
         |         WHERE start = 0 OR start + ${ChunkSize - ChunkStride} < n),
         |c AS (SELECT doc_id, w[start+1 : start+$ChunkSize] AS chunk FROM kept),
         |h AS (SELECT doc_id, $hc AS chunk_hash FROM c),
         |rep AS (SELECT chunk_hash FROM h GROUP BY chunk_hash
         |        HAVING count(DISTINCT doc_id) >= 2),
         |scored AS (
         |  SELECT h.doc_id, count(*) AS n_chunks,
         |    CAST(sum(CASE WHEN r.chunk_hash IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_repeated
         |  FROM h LEFT JOIN rep r USING (chunk_hash)
         |  GROUP BY h.doc_id)
         |SELECT doc_id, n_chunks, n_repeated,
         |  round(CAST(n_repeated AS DOUBLE) / CAST(n_chunks AS DOUBLE), 6)
         |    AS boilerplate_ratio
         |FROM scored WHERE n_repeated > 0 ORDER BY doc_id""".stripMargin
    },
    "q_decontaminate" -> {
      val h32id = TextPipeline.duckH32("CAST(doc_id AS VARCHAR)")
      val sh = TextPipeline.duckShingles("w")
      s"""WITH d AS (SELECT doc_id, $h32id % 100 AS b, $duckToks AS w
         |           FROM documents),
         |f AS (SELECT doc_id, b,
         |        list_distinct(list_transform($sh, t -> ${TextPipeline.duckH32("t")})) AS hs
         |      FROM d WHERE len(w) >= 3),
         |test AS (SELECT DISTINCT unnest(hs) AS h FROM f WHERE b >= 90),
         |train AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_shingles,
         |            unnest(hs) AS h FROM f WHERE b < 80)
         |SELECT t.doc_id, t.n_shingles, count(*) AS n_overlap,
         |  round(count(*) / CAST(t.n_shingles AS DOUBLE), 6) AS contamination
         |FROM train t JOIN test USING (h)
         |GROUP BY 1, 2 ORDER BY t.doc_id""".stripMargin
    },
  )
}
