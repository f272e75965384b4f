package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.Tables

/** M14 — schema-first CSV/JSON ingestion with corrupt-record handling,
  * the weekly reality of any corpus pipeline: upstream drops you a file,
  * some rows are broken, and the job must quantify the damage instead of
  * dying (or worse, silently dropping rows).
  *
  * The reference ingests only whitespace-delimited text
  * (`maprdeuce.cpp:142-160`); structured formats are extension tier
  * (SURVEY §2.2 sources). SourcesSpec pins the three ingestion modes
  * (PERMISSIVE/DROPMALFORMED/FAILFAST) on synthetic files; these queries
  * put the PERMISSIVE path — the 100 TB default, where a bad record
  * lands in `columnNameOfCorruptRecord` instead of killing the job — on
  * the oracle-checked `queries` surface.
  *
  * Both queries read small fixtures checked into the repo
  * (`fixtures/ingest/`), NOT the sf tables: corrupt-record semantics need
  * deliberately-broken input, and the driver fixtures are all well-formed
  * parquet. The fixture contract the oracles rely on: every well-formed
  * record has all fields present (so "required field IS NULL" identifies
  * a malformed line in DuckDB, whose read_json ignore_errors=true yields
  * all-NULL rows rather than dropping them), and malformed CSV cells are
  * type-malformed only (DuckDB has no raw-record column, so the oracle
  * re-detects them via try_cast).
  *
  * Scale stance: both plans are a single scan → partial agg → 3-row
  * final agg; the corrupt-record column prunes away unless referenced.
  * On a cluster the same code reads a glob of thousands of files — the
  * PERMISSIVE/corrupt-column semantics are per-record, not per-file.
  */
object Ingest {

  /** Fixture dir, resolved relative to the checkout: env override first,
    * then `user.dir` (sbt and tools/run.sh both launch from the repo
    * root), then the driver-machine absolute path as a last resort.
    * Queries intentionally ignore the sfDir argument — corrupt-record
    * semantics need the deliberately-damaged repo fixtures. */
  private[graft] val FixtureDir: String =
    sys.env.get("GRAFT_FIXTURE_DIR").getOrElse {
      val cwdRel = new java.io.File(sys.props.getOrElse("user.dir", "."),
        "fixtures/ingest")
      if (cwdRel.isDirectory) cwdRel.getAbsolutePath
      else "/root/repo/fixtures/ingest"
    }

  /** Per-JVM scratch roots for the write-then-read queries, keyed by
    * (query prefix, FULL fixture path): the full sanitized path — not
    * its hashCode — makes distinct fixture dirs collision-free, and
    * `Files.createTempDirectory`'s random suffix makes concurrent
    * sessions in different JVMs land in different roots, so two runs
    * over the same fixture can never race each other's
    * mode(overwrite) writes. Cached so bench iterations rewrite one
    * stable root instead of leaking a directory per call. */
  private val scratchRoots =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()
  private[graft] def scratchDir(prefix: String, dir: String): String =
    scratchRoots.computeIfAbsent((prefix, dir), { key =>
      val safe = key._2.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(80)
      java.nio.file.Files
        .createTempDirectory(s"graft_${key._1}_${safe}_").toString
    })

  /** CSV with an explicit schema: 24 rows, 3 of them with a
    * type-malformed `amount` cell ("N/A"). PERMISSIVE parses the good
    * cells of a bad row (category survives), nulls the bad cell, and
    * captures the raw line in `_bad` — so the per-category report counts
    * total rows, damaged rows, and the sum over parseable amounts. */
  def qCsvIngest(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("ts", StringType),
      StructField("amount", IntegerType),
      StructField("category", StringType),
      StructField("_bad", StringType)))
    s.read.schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(s"$FixtureDir/transactions.csv")
      .groupBy(col("category"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("_bad").isNotNull, 1L).otherwise(0L)).as("n_bad"),
        coalesce(sum(col("amount")), lit(0)).cast("long").as("amount_sum"))
      .orderBy(col("category"))
  }

  /** Newline-delimited JSON with a nested struct column: 20 good lines,
    * 2 syntactically-malformed ones. Good lines aggregate per event type
    * (count, distinct nested user ids, total ms); the malformed-line
    * count ships as a `_corrupt` summary row so the damage is part of
    * the result, not a log line somebody greps later. */
  def qJsonIngest(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("evt", StringType),
      StructField("ms", IntegerType),
      StructField("usr", StructType(Seq(
        StructField("uid", IntegerType),
        StructField("tier", StringType)))),
      StructField("_bad", StringType)))
    val raw = s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(s"$FixtureDir/applog.jsonl")
    val good = raw.filter(col("_bad").isNull)
      .groupBy(col("evt"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("usr.uid")).as("n_users"),
        sum(col("ms")).cast("long").as("total_ms"))
    // malformed count = all lines minus well-formed lines (same arithmetic
    // as the DuckDB oracle): Spark forbids a scan whose only referenced
    // file column is the corrupt-record column
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the bad
    // count cannot be an aggregate over `_bad` alone
    val nAll = raw.agg(count(lit(1)).as("n_all"))
    val nGood = good.agg(coalesce(sum(col("n")), lit(0L)).as("n_good"))
    val bad = nAll.crossJoin(broadcast(nGood))
      .select(lit("_corrupt").as("evt"), (col("n_all") - col("n_good")).as("n"),
        lit(0L).as("n_users"), lit(0L).as("total_ms"))
    good.unionByName(bad).orderBy(col("evt"))
  }

  /** Glob ingestion — the actual 100 TB shape: one logical dataset
    * arriving as many physical files (here the `multi/` csv glob: a file with 2
    * damaged cells, a fully-clean file, and a file with 3), each parsed
    * independently but aggregated as one relation. The per-FILE damage
    * report (via `input_file_name()`) is what an ingestion run actually
    * pages someone with: WHICH upstream shard is broken, not just that
    * something is. PERMISSIVE/corrupt-record semantics are per-record,
    * so the accounting composes across files with no extra machinery —
    * the same single scan → partial agg plan as the one-file query,
    * and on a cluster the glob plans one task per split regardless of
    * file count. */
  def qCsvIngestGlob(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("ts", StringType),
      StructField("amount", IntegerType),
      StructField("category", StringType),
      StructField("_bad", StringType)))
    s.read.schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(s"$FixtureDir/multi/*.csv")
      .withColumn("src_file", element_at(split(input_file_name(), "/"), -1))
      .groupBy(col("src_file"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("_bad").isNotNull, 1L).otherwise(0L)).as("n_bad"),
        coalesce(sum(col("amount")), lit(0)).cast("long").as("amount_sum"))
      .orderBy(col("src_file"))
  }

  /** ORC sink → source round trip: write the documents projection as ORC
    * (Spark's second built-in columnar format — the Hive-ecosystem interop
    * sink), read it back with a pushable range predicate, and aggregate.
    * The ORACLE computes the SAME aggregate over the original parquet, so
    * a hash match proves the ORC round trip preserved every surviving
    * row and value — format-fidelity verified through the data itself,
    * not a schema diff. The read-back filter (`doc_id >= 100`) reaches
    * the ORC reader as a pushed predicate (stripe-stat pruning at scale;
    * the PLANS audit shows PushedFilters on the ORC scan).
    *
    * Scale stance: write is one narrow pass (ORC stripes + zlib are the
    * writer's concern); read-back prunes stripes by the pushed range.
    * The eager write is the operator under test — a sink IS a side
    * effect; Overwrite keeps the query re-runnable. */
  def qOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = scratchDir("orc", dir)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .write.mode("overwrite").orc(out)
    s.read.orc(out)
      .filter(col("doc_id") >= 100)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("text_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy("lang")
  }

  /** Schema evolution across parquet generations — the other weekly
    * reality of a long-lived 100 TB corpus: a column is ADDED mid-life,
    * and every job from then on reads a mix of old files (without it)
    * and new files (with it). Generation 1 (even doc_ids) writes
    * (doc_id, lang, text); generation 2 (odd doc_ids) adds a
    * `quality` token-count column. The read unions both directories
    * under `mergeSchema` — Spark's parquet schema reconciliation fills
    * the missing column with NULL for legacy files — and the report
    * quantifies the mix per language: how much of the corpus is
    * legacy-unscored vs scored, and the score mass of the scored slice.
    *
    * The oracle recomputes the same report from the fixture directly
    * (the parity split and the token count are both deterministic), so
    * the round trip through two heterogeneous parquet generations is
    * hash-proven lossless — the q_orc_roundtrip doctrine extended to a
    * heterogeneous-schema read.
    *
    * Scale stance: mergeSchema's footer reconciliation is a
    * driver-side metadata pass over file footers (at 100 TB you cache
    * it in a metastore; semantics identical); the data plan is one
    * scan → partial agg → |langs| rows, and `quality IS NULL` needs no
    * extra column when pruned. (The two-generation write is fixture
    * synthesis and runs eagerly at construction — it IS part of the
    * operator's measured cost, like q_orc_roundtrip's write half.) */
  def qSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val base = scratchDir("schevo", dir)
    val docs = Tables.documents(s, dir)
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"), col("text"))
      .write.mode("overwrite").parquet(s"$base/gen1")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("text"),
        size(graft.core.TextPipeline.normalizedTokens(col("text")))
          .cast("long").as("quality"))
      .write.mode("overwrite").parquet(s"$base/gen2")
    s.read.option("mergeSchema", "true").parquet(s"$base/gen1", s"$base/gen2")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("quality").isNull, 1)).as("n_legacy"),
        count(col("quality")).as("n_scored"),
        coalesce(sum(col("quality")), lit(0L)).as("quality_sum"))
      .orderBy("lang")
  }

  /** Bucket count for [[qTableDiff]]'s Merkle-style checksum pass. 256
    * keeps the summary table trivially broadcastable; at 100 TB the same
    * plan runs with 2^16–2^20 buckets so each drill-down bucket stays a
    * small fraction of the table (the constant is the only thing that
    * changes). */
  private val DiffBuckets = 256

  /** Replica reconciliation (anti-entropy table diff): find the rows on
    * which two copies of `orders` disagree WITHOUT ever shuffling or
    * comparing full rows — the Merkle-tree / Cassandra-repair shape, and
    * the "did the nightly copy land intact" audit every warehouse runs.
    *
    * The "replica" is derived deterministically from the fixture so both
    * engines see the identical pair: rows whose key-hash ≡ 13 (mod 1000)
    * are missing from the replica (a lost batch), rows ≡ 7 got
    * +1 cent (a corrupted decimal). Phase 1 collapses each side
    * map-side to [[DiffBuckets]] (bucket, xor-of-row-sig, count)
    * checksums — xor, not sum, so the fold can never overflow and stays
    * commutative at any scale. Phase 2 joins the two 256-row summaries,
    * keeps only disagreeing buckets, and re-scans JUST those buckets'
    * rows (a broadcast semi join prunes everything else) for a per-key
    * full-outer sig compare: key on one side only → missing; both sides,
    * different sig → changed.
    *
    * Cross-engine exactness: the row signature is the portable h32 over
    * a '|'-joined rendering of integer/string columns only (cents as
    * BIGINT — no float formatting anywhere), so sigs, xors, and the
    * bucket assignment are bit-identical in DuckDB.
    *
    * Scale stance (100 TB): phase 1 is a full scan that partial-aggs to
    * 256 rows — network cost is the checksum table, not the data; the
    * drill-down scan reads both sides once more but shuffles only
    * (bucket-pruned key, sig) pairs, proportional to the DAMAGE times
    * the bucket width, not the table; nothing ever collects. With the
    * replica partitioned by the same bucket key, the second scan prunes
    * at the storage layer too. */
  def qTableDiff(s: SparkSession, dir: String): DataFrame = {
    import graft.core.TextPipeline.h32
    def rows(side: DataFrame): DataFrame = side
      .select(col("o_orderkey"),
        pmod(h32(col("o_orderkey").cast("string")), lit(DiffBuckets)).as("bucket"),
        h32(concat_ws("|", col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long"))).as("sig"))
    val damage = pmod(h32(col("o_orderkey").cast("string")), lit(1000))
    val src = rows(Tables.orders(s, dir))
    val dst = rows(Tables.orders(s, dir)
        .filter(damage =!= 13)
        .withColumn("o_totalprice",
          when(damage === 7, col("o_totalprice") + 0.01)
            .otherwise(col("o_totalprice"))))
    def sums(r: DataFrame, tag: String): DataFrame = r.groupBy("bucket")
      .agg(expr("bit_xor(sig)").as(s"x_$tag"), count(lit(1)).as(s"n_$tag"))
    val dirty = sums(src, "s").join(sums(dst, "d"), Seq("bucket"), "full_outer")
      .filter(coalesce(col("x_s"), lit(-1L)) =!= coalesce(col("x_d"), lit(-1L))
        || coalesce(col("n_s"), lit(0L)) =!= coalesce(col("n_d"), lit(0L)))
      .select("bucket")
    def drill(r: DataFrame): DataFrame =
      r.join(broadcast(dirty), Seq("bucket"), "left_semi")
    // r14 (guide §2.4, the q_ref_integrity respelling): the per-key sig
    // compare is a union + per-key max instead of a full-outer SMJ —
    // both drill sides are fresh bucket-pruned scans with no reusable
    // partitioning (the condition under which the respelling wins; see
    // the measured counter-case at Dedup.qDedupEvalImpl), so one
    // combined key exchange replaces two sorted ones. o_orderkey is
    // unique per side, so max() recovers exactly the side's sig (or
    // NULL when the side lacks the key — the old full-outer row).
    drill(src).select(col("o_orderkey"), col("sig").as("sig_s"),
        lit(null).cast("long").as("sig_d"))
      .unionAll(drill(dst).select(col("o_orderkey"),
        lit(null).cast("long").as("sig_s"), col("sig").as("sig_d")))
      .groupBy("o_orderkey")
      .agg(max(col("sig_s")).as("sig_s"), max(col("sig_d")).as("sig_d"))
      .filter(col("sig_s").isNull || col("sig_d").isNull
        || col("sig_s") =!= col("sig_d"))
      .select(col("o_orderkey"),
        when(col("sig_d").isNull, "src_only")
          .when(col("sig_s").isNull, "dst_only")
          .otherwise("changed").as("diff"))
      .orderBy("o_orderkey")
  }

  /** Sequence-gap audit (islands and gaps): find every missing run in
    * the event_id sequence — the "did we drop a batch" data-quality
    * check that q_table_diff answers for VALUE damage, asked here for
    * ARRIVAL damage. The damaged stream is derived deterministically
    * (event_id ≡ 13 mod 997 withheld — the q_table_diff lost-batch
    * convention), so both engines audit the identical stream and the
    * result is the exact planted gap list.
    *
    * The SCALE-SAFE spelling avoids the textbook lag() window over the
    * full sequence (one partition sorting N rows): gap STARTS are
    * `id+1 absent` (a self anti-join on the shifted key — one narrow
    * shuffle), gap ENDS are `id−1 absent`, and since gaps are disjoint
    * and ordered, the i-th start pairs with the i-th end — a
    * row_number window over the GAP-cardinality relation (damage-
    * proportional, not data-proportional). The ORACLE is the naive
    * lead() spelling, so the decomposition is re-proven equal on every
    * verify. */
  def qSequenceGaps(s: SparkSession, dir: String): DataFrame =
    sequenceGaps(Tables.events(s, dir)
      .select(col("event_id").as("id"))
      .filter(pmod(col("id"), lit(997)) =!= 13))

  /** Core of [[qSequenceGaps]] over any single-column (id) relation —
    * exposed for IngestSpec's hand-built gap patterns (adjacent gaps,
    * width-1 gaps, missing head/tail are NOT gaps). */
  private[graft] def sequenceGaps(idsIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = idsIn.localCheckpoint() // 4 consumers: starts ×2, ends ×2, bounds
    val bounds = ids.agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
    val starts = ids.select((col("id") + 1).as("gs"))
      .join(ids.select(col("id").as("gs")), Seq("gs"), "left_anti")
      .crossJoin(broadcast(bounds)).filter(col("gs") <= col("hi"))
      .withColumn("rn", row_number().over(Window.orderBy(col("gs"))))
      .select(col("rn"), col("gs"))
    val ends = ids.select((col("id") - 1).as("ge"))
      .join(ids.select(col("id").as("ge")), Seq("ge"), "left_anti")
      .crossJoin(broadcast(bounds)).filter(col("ge") >= col("lo"))
      .withColumn("rn", row_number().over(Window.orderBy(col("ge"))))
      .select(col("rn"), col("ge"))
    starts.join(ends, "rn")
      .select(col("gs").as("gap_start"), col("ge").as("gap_end"),
        (col("ge") - col("gs") + 1).as("n_missing"))
      .orderBy("gap_start")
  }

  /** Buckets per side for [[qBucketedJoin]] — 8 keeps the sf fixtures'
    * files non-trivial; at 100 TB the same layout runs with
    * 2^10–2^12 buckets sized so one bucket's rows fit an executor. */
  private val JoinBuckets = 8

  /** One-time-per-JVM bucketed-table registration, keyed by fixture:
    * (orders table name, lineitem table name). The write is LAYOUT
    * PREPARATION — the entire point of bucketing is that you pay the
    * cluster-by-key shuffle once at ingest and then every downstream
    * join of the co-bucketed tables skips its exchanges forever — so it
    * memoizes per fixture rather than re-running per call (unlike
    * q_schema_evolution, whose write IS the measured operator). */
  private val bucketPairs =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def bucketedPair(s: SparkSession, dir: String): (String, String) =
    bucketPairs.computeIfAbsent(dir, { _ =>
      val base = scratchDir("bktjoin", dir)
      val tag = base.replaceAll("[^A-Za-z0-9_]", "_").takeRight(48)
      val ot = s"bkt_orders_$tag"; val lt = s"bkt_lineitem_$tag"
      Tables.orders(s, dir).write.mode("overwrite")
        .bucketBy(JoinBuckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders").format("parquet").saveAsTable(ot)
      Tables.lineitem(s, dir).write.mode("overwrite")
        .bucketBy(JoinBuckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/lineitem").format("parquet").saveAsTable(lt)
      (ot, lt)
    })

  /** Co-bucketed fact-fact join: lineitem⨝orders where BOTH sides were
    * written `bucketBy(8, orderkey).sortBy(orderkey)` — Spark reads the
    * bucket layout from the catalog and plans the SortMergeJoin with NO
    * shuffle and NO sort on either side (IngestSpec pins zero
    * ShuffleExchange below the join while the identical raw-parquet
    * join carries two). This is THE highest-leverage layout decision at
    * 100 TB: the fact-fact shuffle that dominates every
    * lineitem-by-order query disappears for the price of one
    * cluster-by at ingest.
    *
    * The oracle computes the identical aggregate from the RAW tables —
    * a hash match proves the bucketed write+catalog round trip lost
    * nothing (q_orc_roundtrip doctrine) AND that the exchange-free
    * join is exact. */
  def qBucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = bucketedPair(s, dir)
    s.table(lt)
      .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast(DecimalType(14, 2))
            * (lit(1).cast(DecimalType(4, 2))
              - col("l_discount").cast(DecimalType(4, 2))))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** One-time-per-JVM partitioned-layout write for [[qDppPrune]]:
    * customer clustered into one directory per c_nationkey. Layout
    * preparation, memoized like [[bucketedPair]]. */
  private val dppRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def partitionedCustomer(s: SparkSession, dir: String): String =
    dppRoots.computeIfAbsent(dir, { _ =>
      val path = s"${scratchDir("dpp", dir)}/customer"
      Tables.customer(s, dir).write.mode("overwrite")
        .partitionBy("c_nationkey").parquet(path)
      path
    })

  /** Dynamic partition pruning over a star join: customer laid out
    * one-directory-per-nation, joined to the nation⨝region dim filtered
    * to EUROPE — a filter the optimizer CANNOT push statically because
    * it lives on the other side of the join. Spark's DPP turns the
    * broadcast dim into a runtime IN-subquery on the fact's partition
    * column, so only the 5 European nations' directories are read
    * (IngestSpec pins `dynamicpruning` inside the scan's
    * PartitionFilters and that pruned ≠ static-full). At 100 TB this is
    * the difference between scanning a 25th of the fact and all of it —
    * the second-highest-leverage layout decision after bucketing
    * ([[qBucketedJoin]]), and the two compose.
    *
    * The oracle computes the identical aggregate from the RAW tables:
    * the hash match proves the partitioned rewrite + runtime pruning
    * dropped and invented nothing. */
  def qDppPrune(s: SparkSession, dir: String): DataFrame = {
    // explicit schema: an EMPTY corpus writes a file-less partitioned
    // dir, and schema inference on it throws (EmptyInputSpec totality)
    val cust = s.read.schema(Tables.customer(s, dir).schema)
      .parquet(partitionedCustomer(s, dir))
    val dim = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
    cust.join(broadcast(dim), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast(DecimalType(14, 2)))
          .cast("double").as("total_bal"))
      .orderBy("n_name")
  }

  /** The schema's FK edges, child (table, key) → parent (table, key) —
    * one entry per arrow of the TPC-H-ish star plus the events stream's
    * user link. Shared by [[qRefIntegrity]] and its oracle so the edge
    * list can't drift between engines. */
  private val FkEdges: Seq[(String, String, String, String, String)] = Seq(
    ("customer.c_nationkey->nation.n_nationkey",
      "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events.user_id->customer.c_custkey",
      "events", "user_id", "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders.o_orderkey",
      "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey",
      "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey",
      "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.n_regionkey->region.r_regionkey",
      "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.o_custkey->customer.c_custkey",
      "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.s_nationkey->nation.n_nationkey",
      "supplier", "s_nationkey", "nation", "n_nationkey"))

  private def tableOf(s: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "customer" => Tables.customer(s, dir)
      case "orders"   => Tables.orders(s, dir)
      case "lineitem" => Tables.lineitem(s, dir)
      case "part"     => Tables.part(s, dir)
      case "supplier" => Tables.supplier(s, dir)
      case "nation"   => Tables.nation(s, dir)
      case "region"   => Tables.region(s, dir)
      case "events"   => Tables.events(s, dir)
    }

  /** Whole-schema referential-integrity audit: for every FK edge, the
    * distinct child keys vs distinct parent keys in BOTH directions —
    * orphan child keys (FK violations: would break every join that
    * assumes the arrow) and unreferenced parent keys (dead dimension
    * rows: the retention/idle-entity signal q22 asks for one table).
    * One row per edge with a referenced-share ppm. The "is the nightly
    * load internally consistent" gate that runs before anything joins.
    *
    * Scale stance (100 TB): each edge partial-aggs its child side to
    * DISTINCT KEYS map-side (the shuffle carries key cardinality, not
    * table rows), full-outer merges with the parent key set on the key,
    * and collapses to one row — per-edge network is O(|keys|); the
    * 8 edges are independent branches of one union (schedulable
    * concurrently; each fact table is scanned once per edge it heads,
    * column-pruned to the key). NULL FKs are counted as neither orphan
    * nor match (SQL join semantics), mirrored in both engines. */
  def qRefIntegrity(s: SparkSession, dir: String): DataFrame = {
    val audits = FkEdges.map { case (edge, ct, ck, pt, pk) =>
      // r14 (guide §2.4 "remove shuffles outright"): the former spelling
      // paid per edge TWO distinct shuffles (child, parent) feeding a
      // full-outer sort-merge join on k (full-outer cannot broadcast).
      // Presence-per-side over one key space is a union + marker max —
      // ONE exchange per edge, duplicates collapsed map-side by the
      // partial aggregate, no join at all. Per distinct key: cm=1 iff it
      // appears on the child side (nulls pre-filtered, as before), pm=1
      // iff on the parent side — exactly the full-outer row the old plan
      // built, so every downstream count is unchanged (parent-side NULL
      // keys keep their own group: one parent_key, unreferenced, never
      // matched — identical to the null-never-joins semantics before).
      val c = tableOf(s, dir, ct).select(col(ck).cast("long").as("k"))
        .filter(col("k").isNotNull)
        .select(col("k"), lit(1).as("cm"), lit(0).as("pm"))
      val p = tableOf(s, dir, pt).select(col(pk).cast("long").as("k"),
        lit(0).as("cm"), lit(1).as("pm"))
      c.unionAll(p)
        .groupBy(col("k"))
        .agg(max(col("cm")).as("cm"), max(col("pm")).as("pm"))
        .agg(
          sum(col("cm")).cast("long").as("child_keys"),
          sum(col("pm")).cast("long").as("parent_keys"),
          sum(when(col("cm") === 1 && col("pm") === 0, 1L)
            .otherwise(0L)).as("orphan_keys"),
          sum(when(col("pm") === 1 && col("cm") === 0, 1L)
            .otherwise(0L)).as("unreferenced_keys"))
        .select(lit(edge).as("edge"), col("child_keys"), col("parent_keys"),
          col("orphan_keys"), col("unreferenced_keys"),
          when(col("parent_keys") > 0,
            expr("(parent_keys - unreferenced_keys) * 1000000 div parent_keys"))
            .otherwise(lit(null).cast("long")).as("referenced_ppm"))
    }
    audits.reduce(_.unionAll(_)).orderBy("edge")
  }

  /** Candidate functional dependencies to audit: (label, table, lhs,
    * rhs) — a mix the fixture genuinely decides both ways (keys hold;
    * the non-key candidates are violated), shared with the oracle. */
  private val FdCandidates: Seq[(String, String, String, String)] = Seq(
    ("customer: c_nationkey -> c_mktsegment",
      "customer", "c_nationkey", "c_mktsegment"),
    ("lineitem: l_orderkey -> l_shipdate",
      "lineitem", "l_orderkey", "l_shipdate"),
    ("orders: o_custkey -> o_orderpriority",
      "orders", "o_custkey", "o_orderpriority"),
    ("part: p_brand -> p_type", "part", "p_brand", "p_type"),
    ("part: p_partkey -> p_name", "part", "p_partkey", "p_name"))

  /** Functional-dependency audit: for each candidate FD A → B, how many
    * A-groups exist, how many are VIOLATED (more than one distinct B),
    * the worst group's distinct-B count, and a violation ppm — the
    * schema-discovery / data-contract check ("is brand really a
    * function of the key?") that decides whether a column is safe to
    * denormalize or use as a dedup survivor-pick key.
    *
    * Scale stance (100 TB): each FD is one partial-agg
    * `groupBy(lhs).agg(countDistinct(rhs))` — the distinct collapses
    * map-side, the shuffle carries (lhs, rhs)-pair cardinality — then a
    * 1-row summary; FDs are independent union branches, column-pruned
    * scans. No candidate enumeration (TANE-style lattice search) — the
    * audit VERIFIES declared contracts, it doesn't mine them. */
  def qFdAudit(s: SparkSession, dir: String): DataFrame = {
    val audits = FdCandidates.map { case (fd, t, lhs, rhs) =>
      tableOf(s, dir, t).groupBy(col(lhs))
        .agg(countDistinct(col(rhs)).as("nd"))
        .agg(count(lit(1)).as("lhs_groups"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("violating_groups"),
          max(col("nd")).as("max_rhs_per_lhs"))
        .select(lit(fd).as("fd"), col("lhs_groups"), col("violating_groups"),
          coalesce(col("max_rhs_per_lhs"), lit(0L)).as("max_rhs_per_lhs"),
          when(col("violating_groups") === 0, 1L).otherwise(0L).as("holds"),
          when(col("lhs_groups") > 0,
            expr("violating_groups * 1000000 div lhs_groups"))
            .otherwise(lit(null).cast("long")).as("violation_ppm"))
    }
    audits.reduce(_.unionAll(_)).orderBy("fd")
  }

  /** Erasure-request subject rule: user/customer keys ≡ 0 (mod 17) —
    * a deterministic stand-in for a GDPR deletion list. Shared
    * (private[graft]) with the write-side index-erasure queries
    * (Dedup.qDedupIndexErase, Similarity.qAnnIndexErase) so the
    * read-side blast-radius audit and the artifact rewrites answer to
    * ONE subject scope. */
  private[graft] val ErasureMod = 17L

  /** THE erasure-subject predicate (key ≡ 0 mod [[ErasureMod]]) — one
    * spelling for every tier's erase verb (dedup postings, ANN codes,
    * HLL registers, the read-side audit below), so the deletion scope
    * cannot drift between them. */
  private[graft] def erasureSubject(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c % ErasureMod === 0

  /** The re-consented HALF of the deletion set (even multiples of
    * [[ErasureMod]]) — the subjects that re-upload after their erasure
    * in the lifecycle-composition rungs. */
  private[graft] def reconsentedSubject(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c % (2 * ErasureMod) === 0

  /** Right-to-be-forgotten SCOPE audit: before (or after) executing an
    * erasure batch, report how many rows in each table still reference
    * the requested subjects — including the 2-hop cascade
    * (subject → orders → lineitem) that a naive per-table key scan
    * misses. Per table: referencing rows, distinct subjects touched,
    * table size, and the share in ppm — the blast-radius report a
    * governance pipeline attaches to every deletion batch.
    *
    * Scale stance (100 TB): the subject rule is a pure PREDICATE, so the
    * 1-hop audits are pushdown-friendly single scans with 1-row partial
    * aggs (no join, no subject list materialized anywhere); the 2-hop
    * lineitem audit joins against the flagged orders' (orderkey,
    * custkey) projection — a key-width shuffle proportional to the
    * subjects' order count, never the fact table. */
  def qErasureAudit(s: SparkSession, dir: String): DataFrame = {
    def hop1(table: String, df: DataFrame, key: String): DataFrame = {
      val flagged = col(key) % ErasureMod === 0
      df.agg(
        sum(when(flagged, 1L).otherwise(0L)).as("rows_referencing"),
        countDistinct(when(flagged, col(key))).as("distinct_subjects"),
        count(lit(1)).as("total_rows"))
        .select(lit(table).as("table"),
          coalesce(col("rows_referencing"), lit(0L)).as("rows_referencing"),
          col("distinct_subjects"), col("total_rows"),
          when(col("total_rows") > 0,
            expr("rows_referencing * 1000000 div total_rows"))
            .as("share_ppm"))
    }
    val events = hop1("events", Tables.events(s, dir), "user_id")
    val customer = hop1("customer", Tables.customer(s, dir), "c_custkey")
    val orders = hop1("orders", Tables.orders(s, dir), "o_custkey")
    val flaggedOrders = Tables.orders(s, dir)
      .filter(col("o_custkey") % ErasureMod === 0)
      .select(col("o_orderkey"), col("o_custkey"))
    val liRef = Tables.lineitem(s, dir)
      .join(flaggedOrders, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("rows_referencing"),
        countDistinct(col("o_custkey")).as("distinct_subjects"))
    val lineitem = liRef
      .crossJoin(Tables.lineitem(s, dir).agg(count(lit(1)).as("total_rows")))
      .select(lit("lineitem").as("table"), col("rows_referencing"),
        col("distinct_subjects"), col("total_rows"),
        when(col("total_rows") > 0,
          expr("rows_referencing * 1000000 div total_rows")).as("share_ppm"))
    events.unionAll(customer).unionAll(orders).unionAll(lineitem)
      .orderBy("table")
  }

  /** Per-key latest-wins reduction of a flat CDC relation — max_by over
    * the lexicographic (us, event_id) version key, the same one-shuffle
    * spelling as `Dedup.qDedupLatest`. */
  private def latestOf(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("us"), col("event_type"), col("value")),
        struct(col("us"), col("event_id"))).as("r"))
      .select(col("user_id"), col("r.event_id").as("event_id"),
        col("r.us").as("us"), col("r.event_type").as("event_type"),
        col("r.value").as("value"))

  /** The WRITE-side CDC merge — the compaction a CDC lake actually
    * executes, closing the loop the read-side reconstructions
    * (q_incremental_*, q_time_travel, q_cdc_net_changes, q_dedup_latest)
    * leave open: not "what would the current state be" but "produce the
    * next snapshot FILE".
    *
    *  1. base: latest-wins state of the first half of the event log,
    *     written to scratch as `snap_v0.parquet` (the existing lake
    *     table);
    *  2. MERGE: the second half's per-key latest upserts into the read-
    *     back v0 snapshot — WHEN MATCHED take the greater (us, event_id)
    *     version (the general merge rule, NOT "delta always wins": it
    *     stays correct if the feed ever delivers out-of-order deltas),
    *     WHEN NOT MATCHED insert — written as `snap_v1.parquet`;
    *  3. result: the v1 snapshot READ BACK from parquet, so the round
    *     trip through the sink is part of what the oracle checks.
    *
    * The oracle is the plain full-log latest-wins view (q_dedup_latest's
    * SQL): base ∪ delta per-key maxima compose to the global maximum, so
    * the merged snapshot must hash-match the read-side view exactly.
    *
    * Scale stance (100 TB): each phase is one user-keyed partial-agg
    * shuffle; the merge join is key-cardinality (two compacted snapshots,
    * never raw log rows); the cut boundary is a 1-row broadcast, and the
    * log is scanned once per half plus once for the boundary — never
    * materialized. A lakehouse MERGE additionally prunes untouched FILES
    * via delta-key min/max stats; the per-key rule is this one. */
  def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val root = scratchDir("mergeupsert", dir)
    val e = graft.io.Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
    val cutDf = e.agg(
      expr("min(us) + (max(us) - min(us)) div 2").as("cut_us"))
    val withCut = e.crossJoin(broadcast(cutDf))
    latestOf(withCut.filter(col("us") <= col("cut_us")))
      .write.mode("overwrite").parquet(s"$root/snap_v0.parquet")
    val cur = s.read.parquet(s"$root/snap_v0.parquet")
      .select(col("user_id"), struct(col("event_id"), col("us"),
        col("event_type"), col("value")).as("rb"))
    val delta = latestOf(withCut.filter(col("us") > col("cut_us")))
      .select(col("user_id"), struct(col("event_id"), col("us"),
        col("event_type"), col("value")).as("rd"))
    cur.join(delta, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("rd").isNull, col("rb"))
          .when(col("rb").isNull, col("rd"))
          .when(struct(col("rd.us"), col("rd.event_id"))
            >= struct(col("rb.us"), col("rb.event_id")), col("rd"))
          .otherwise(col("rb")).as("r"))
      .select(col("user_id"), col("r.event_id").as("event_id"),
        col("r.us").as("us"), col("r.event_type").as("event_type"),
        col("r.value").as("value"))
      .write.mode("overwrite").parquet(s"$root/snap_v1.parquet")
    s.read.parquet(s"$root/snap_v1.parquet")
      .select(col("user_id"), col("event_id"), col("us"),
        col("event_type"), col("value"))
      .orderBy("user_id")
  }

  /** Keyed pseudonymization with referential consistency — the GDPR
    * Art. 4(5) transform (replace the natural key with a keyed token,
    * keep the secret elsewhere) every shared/training corpus derived
    * from user data goes through. Token = md5(pepper ‖ key) as the
    * deterministic two-engine stand-in for production HMAC-SHA256; the
    * property under test is NOT the digest but the pipeline law:
    * tokenization must preserve JOINABILITY and nothing else.
    *
    * The verification is structural: Spark aggregates orders per TOKEN
    * and joins customers per TOKEN, while the ORACLE computes the same
    * per-segment report from the RAW keys — so a hash match proves the
    * pseudonymized join reproduces the natural-key join exactly (any
    * token collision would fan out the join and fail the gate), and the
    * `token_sum` checksum pins the token VALUES cross-engine, so the
    * tokenization itself (not just its cardinality) is verified.
    *
    * Scale stance: tokenization is a stateless map (no shuffle, no
    * lookup table to secure); the fact side pre-aggregates to
    * key-cardinality BEFORE the dimension join, so the audit costs one
    * token-keyed shuffle — the same distribution the raw-key join has.
    * Contract note: orders whose custkey has no customer row are
    * excluded on BOTH sides (customer-anchored left join) — orphan
    * detection is q_ref_integrity's job, not this audit's. */
  def qPseudonymize(s: SparkSession, dir: String): DataFrame = {
    val pepper = "pepper-42"
    def tok(c: org.apache.spark.sql.Column) =
      md5(concat_ws(":", lit(pepper), c))
    val ordPer = Tables.orders(s, dir)
      .select(tok(col("o_custkey")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_o"))
    Tables.customer(s, dir)
      .select(tok(col("c_custkey")).as("token"), col("c_mktsegment"))
      .join(ordPer, Seq("token"), "left")
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(coalesce(col("n_o"), lit(0L))).as("n_orders"),
        sum(graft.core.TextPipeline.h32(col("token"))).as("token_sum"))
      .orderBy("mktsegment")
  }

  /** Differentially-private count release (Dwork et al. TCC'06): the
    * per-language document counts with Laplace noise at sensitivity 1 —
    * the governance tier's release mechanism, completing k-anonymity
    * (who is hidden), erasure (who is gone), pseudonymization (who is
    * unlinkable) with WHAT may be published.
    *
    * The noise is the textbook inverse-CDF Laplace draw,
    * F⁻¹(u) = −b·sign(u−½)·ln(1−2|u−½|), with two verifiability
    * substitutions, both documented: (1) u comes from the keyed hash
    * h32('dp-42:'‖lang) — a DETERMINISTIC stand-in for the CSPRNG a
    * real release must use (the mechanism, not the entropy source, is
    * what a query engine owns; seeded noise lets both engines and the
    * spec verify the draw exactly); (2) the log runs on the verified
    * 1e-6 log2 grid, so the scale is b = 1/(ε·ln 2) with ε = ln 2 —
    * every noise value is an exact BIGINT in micro-counts. With
    * u = (2k+1)/2·10⁶ the log argument is the exact odd integer
    * 10⁶ − |2k+1 − 10⁶| ≥ 1: never log(0), no float subtraction.
    *
    * A real release publishes ONLY n_dp; n and noise_micros are in the
    * output because the verification contract needs them (and the spec
    * pins |noise| against the Laplace tail bound). Group-cardinality
    * work throughout — the count aggregate is the only shuffle. */
  def qDpRelease(s: SparkSession, dir: String): DataFrame = {
    val qlog = (c: org.apache.spark.sql.Column) =>
      round(log2(c.cast("double")) * 1e6).cast("long")
    Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .select(col("lang"), col("n"),
        (graft.core.TextPipeline.h32(concat(lit("dp-42:"), col("lang")))
          % 1000000L * 2L + 1L).as("cc"))
      .select(col("lang"), col("n"),
        when(col("cc") > 1000000L, lit(1L)).otherwise(lit(-1L)).as("sgn"),
        (lit(1000000L) - abs(col("cc") - 1000000L)).as("m"))
      .select(col("lang"), col("n"),
        (col("sgn") * (qlog(lit(1000000L)) - qlog(col("m"))))
          .as("noise_micros"))
      .select(col("lang"), col("n"), col("noise_micros"),
        (col("n") * 1000000L + col("noise_micros")).as("n_dp_micros"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dp_release" -> (qDpRelease _),
    "q_pseudonymize" -> (qPseudonymize _),
    "q_merge_compact" -> (qMergeUpsert _),
    "q_erasure_audit" -> (qErasureAudit _),
    "q_ref_integrity" -> (qRefIntegrity _),
    "q_fd_audit" -> (qFdAudit _),
    "q_dpp_prune" -> (qDppPrune _),
    "q_bucketed_join" -> (qBucketedJoin _),
    "q_csv_ingest" -> (qCsvIngest _),
    "q_csv_ingest_glob" -> (qCsvIngestGlob _),
    "q_json_ingest" -> (qJsonIngest _),
    "q_orc_roundtrip" -> (qOrcRoundtrip _),
    "q_table_diff" -> (qTableDiff _),
    "q_schema_evolution" -> (qSchemaEvolution _),
    "q_sequence_gaps" -> (qSequenceGaps _),
  )

  // ---- oracle SQL ----------------------------------------------------------
  //
  // DuckDB has no corrupt-record column, so each oracle re-detects the
  // malformed records from first principles: CSV via all_varchar +
  // try_cast (a bad cell is exactly a cell that fails the cast), JSON via
  // line arithmetic (read_text non-empty-line count minus
  // successfully-parsed rows; ignore_errors=true materializes failed
  // lines as all-NULL rows, filtered by the required-field contract
  // evt IS NOT NULL). Lines are counted by splitting on \n and dropping
  // empty elements — robust to presence/absence of a trailing newline;
  // IngestSpec pins the companion fixture contract (no blank lines).

  /** DuckDB spelling of [[qTableDiff]]'s per-row (key, bucket, sig)
    * projection over a relation with the orders columns. */
  private def duckDiffRows(rel: String): String = {
    import graft.core.TextPipeline.duckH32
    s"""SELECT o_orderkey,
       |  ${duckH32(s"CAST(o_orderkey AS VARCHAR)")} % $DiffBuckets AS bucket,
       |  ${duckH32(s"concat_ws('|', o_orderkey, o_custkey, o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT))")} AS sig
       |FROM $rel""".stripMargin
  }

  /** DuckDB spelling of one [[qRefIntegrity]] edge audit (same FULL
    * OUTER distinct-key merge; sums CAST from HUGEINT to BIGINT). */
  private def duckEdgeAudit(edge: String, ct: String, ck: String,
      pt: String, pk: String): String =
    s"""SELECT '$edge' AS edge, child_keys, parent_keys, orphan_keys,
       |  unreferenced_keys,
       |  CASE WHEN parent_keys > 0
       |       THEN (parent_keys - unreferenced_keys) * 1000000 // parent_keys
       |       ELSE NULL END AS referenced_ppm
       |FROM (
       |  SELECT CAST(count(c.cm) AS BIGINT) AS child_keys,
       |    CAST(count(p.pm) AS BIGINT) AS parent_keys,
       |    CAST(sum(CASE WHEN c.cm IS NOT NULL AND p.pm IS NULL
       |             THEN 1 ELSE 0 END) AS BIGINT) AS orphan_keys,
       |    CAST(sum(CASE WHEN p.pm IS NOT NULL AND c.cm IS NULL
       |             THEN 1 ELSE 0 END) AS BIGINT) AS unreferenced_keys
       |  FROM (SELECT DISTINCT $ck AS k, 1 AS cm FROM $ct
       |        WHERE $ck IS NOT NULL) c
       |  FULL OUTER JOIN (SELECT DISTINCT $pk AS k, 1 AS pm FROM $pt) p
       |    ON c.k = p.k)""".stripMargin

  /** DuckDB spelling of one [[qFdAudit]] candidate. */
  private def duckFdAudit(fd: String, t: String, lhs: String,
      rhs: String): String =
    s"""SELECT '$fd' AS fd,
       |  CAST(count(*) AS BIGINT) AS lhs_groups,
       |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS violating_groups,
       |  CAST(coalesce(max(nd), 0) AS BIGINT) AS max_rhs_per_lhs,
       |  CAST(CASE WHEN sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
       |       THEN 1 ELSE 0 END AS BIGINT) AS holds,
       |  CASE WHEN count(*) > 0
       |       THEN CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1000000
       |                 AS BIGINT) // count(*)
       |       ELSE NULL END AS violation_ppm
       |FROM (SELECT $lhs, count(DISTINCT $rhs) AS nd FROM $t
       |      GROUP BY 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    // Same keyed-hash uniform, same odd-integer log argument, same
    // 1e-6 log2 grid — the Laplace draw is exact in both engines.
    "q_dp_release" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
         |           FROM documents GROUP BY 1),
         |k AS (SELECT lang, n,
         |    ${graft.core.TextPipeline.duckH32("'dp-42:' || lang")}
         |      % 1000000 * 2 + 1 AS cc FROM c),
         |m AS (SELECT lang, n,
         |    CASE WHEN cc > 1000000 THEN 1 ELSE -1 END AS sgn,
         |    1000000 - abs(cc - 1000000) AS m FROM k),
         |z AS (SELECT lang, n,
         |    CAST(sgn * (CAST(round(log2(1000000) * 1e6) AS BIGINT)
         |         - CAST(round(log2(m) * 1e6) AS BIGINT)) AS BIGINT)
         |      AS noise_micros FROM m)
         |SELECT lang, n, noise_micros,
         |  n * 1000000 + noise_micros AS n_dp_micros
         |FROM z ORDER BY lang""".stripMargin,
    // RAW-KEY join (the thing pseudonymization must preserve) + the
    // md5-token checksum recomputed independently — a hash match proves
    // the token join reproduced the natural-key join exactly.
    "q_pseudonymize" ->
      s"""WITH op AS (SELECT o_custkey, count(*) AS n_o
         |            FROM orders GROUP BY 1)
         |SELECT c_mktsegment AS mktsegment,
         |  count(*) AS n_customers,
         |  CAST(sum(coalesce(n_o, 0)) AS BIGINT) AS n_orders,
         |  CAST(sum(${graft.core.TextPipeline.duckH32(
                "md5('pepper-42:' || CAST(c_custkey AS VARCHAR))")})
         |    AS BIGINT) AS token_sum
         |FROM customer LEFT JOIN op ON c_custkey = o_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // The write path must land exactly on the read-side latest-wins view
    // (q_dedup_latest's spelling): the merged snapshot IS the current
    // state, however it was produced.
    "q_merge_compact" ->
      """SELECT user_id, event_id, us, event_type, value FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // Same mod-17 subject predicate per table, same 2-hop cascade join.
    "q_erasure_audit" ->
      s"""WITH ev AS (SELECT 'events' AS "table",
         |    CAST(sum(CASE WHEN user_id % 17 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS rows_referencing,
         |    CAST(count(DISTINCT CASE WHEN user_id % 17 = 0
         |      THEN user_id END) AS BIGINT) AS distinct_subjects,
         |    CAST(count(*) AS BIGINT) AS total_rows FROM events),
         |cu AS (SELECT 'customer',
         |    CAST(sum(CASE WHEN c_custkey % 17 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT),
         |    CAST(count(DISTINCT CASE WHEN c_custkey % 17 = 0
         |      THEN c_custkey END) AS BIGINT),
         |    CAST(count(*) AS BIGINT) FROM customer),
         |od AS (SELECT 'orders',
         |    CAST(sum(CASE WHEN o_custkey % 17 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT),
         |    CAST(count(DISTINCT CASE WHEN o_custkey % 17 = 0
         |      THEN o_custkey END) AS BIGINT),
         |    CAST(count(*) AS BIGINT) FROM orders),
         |li AS (SELECT 'lineitem',
         |    CAST((SELECT count(*) FROM lineitem l
         |          JOIN orders o ON l.l_orderkey = o.o_orderkey
         |          WHERE o.o_custkey % 17 = 0) AS BIGINT),
         |    CAST((SELECT count(DISTINCT o.o_custkey) FROM lineitem l
         |          JOIN orders o ON l.l_orderkey = o.o_orderkey
         |          WHERE o.o_custkey % 17 = 0) AS BIGINT),
         |    CAST((SELECT count(*) FROM lineitem) AS BIGINT)),
         |u AS (SELECT * FROM ev UNION ALL SELECT * FROM cu
         |      UNION ALL SELECT * FROM od UNION ALL SELECT * FROM li)
         |SELECT "table", rows_referencing, distinct_subjects, total_rows,
         |  CASE WHEN total_rows > 0
         |       THEN rows_referencing * 1000000 // total_rows END
         |    AS share_ppm
         |FROM u ORDER BY "table"""".stripMargin,
    // Same FULL OUTER distinct-key merge per FK edge, built from the
    // SAME FkEdges list the Spark side unions over.
    "q_ref_integrity" ->
      (FkEdges.map { case (e, ct, ck, pt, pk) =>
        duckEdgeAudit(e, ct, ck, pt, pk) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY edge")),
    // Same per-FD countDistinct summary, built from FdCandidates.
    "q_fd_audit" ->
      (FdCandidates.map { case (fd, t, l, r) => duckFdAudit(fd, t, l, r) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY fd")),
    // Identical aggregate from the RAW tables: the partitioned layout +
    // runtime pruning must lose and invent nothing.
    "q_dpp_prune" ->
      """SELECT n_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
        |    AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Identical aggregate from the RAW tables: a hash match proves the
    // bucketed write + exchange-free join changed no value.
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
        |      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Naive lead()-window islands-and-gaps — proves the anti-join
    // start/end pairing equals the textbook spelling.
    "q_sequence_gaps" ->
      """WITH ids AS (
        |  SELECT event_id AS id FROM events WHERE event_id % 997 <> 13),
        |w AS (SELECT id, lead(id) OVER (ORDER BY id) AS nxt FROM ids)
        |SELECT id + 1 AS gap_start, nxt - 1 AS gap_end,
        |  nxt - id - 1 AS n_missing
        |FROM w WHERE nxt > id + 1 ORDER BY gap_start""".stripMargin,
    // The parity split and token count recomputed straight from the
    // fixture: a hash match proves the two-generation mergeSchema read
    // lost and invented nothing.
    "q_schema_evolution" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN doc_id % 2 = 1
         |         THEN CAST(len(${graft.core.TextPipeline.duckToks}) AS BIGINT)
         |         ELSE NULL END AS quality
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN quality IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_legacy,
         |  CAST(count(quality) AS BIGINT) AS n_scored,
         |  CAST(coalesce(sum(quality), 0) AS BIGINT) AS quality_sum
         |FROM toks GROUP BY lang ORDER BY lang""".stripMargin,
    "q_table_diff" -> {
      import graft.core.TextPipeline.duckH32
      val dmg = s"${duckH32("CAST(o_orderkey AS VARCHAR)")} % 1000"
      s"""WITH replica AS MATERIALIZED (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |    CASE WHEN $dmg = 7 THEN o_totalprice + 0.01
         |         ELSE o_totalprice END AS o_totalprice
         |  FROM orders WHERE $dmg <> 13),
         |src AS MATERIALIZED (${duckDiffRows("orders")}),
         |dst AS MATERIALIZED (${duckDiffRows("replica")}),
         |ss AS (SELECT bucket, bit_xor(sig) AS x_s, count(*) AS n_s
         |       FROM src GROUP BY bucket),
         |sd AS (SELECT bucket, bit_xor(sig) AS x_d, count(*) AS n_d
         |       FROM dst GROUP BY bucket),
         |dirty AS MATERIALIZED (
         |  SELECT coalesce(ss.bucket, sd.bucket) AS bucket
         |  FROM ss FULL OUTER JOIN sd ON ss.bucket = sd.bucket
         |  WHERE coalesce(x_s, -1) <> coalesce(x_d, -1)
         |     OR coalesce(n_s, 0) <> coalesce(n_d, 0)),
         |a AS (SELECT o_orderkey, sig FROM src
         |      WHERE bucket IN (SELECT bucket FROM dirty)),
         |b AS (SELECT o_orderkey, sig FROM dst
         |      WHERE bucket IN (SELECT bucket FROM dirty))
         |SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         |  CASE WHEN b.sig IS NULL THEN 'src_only'
         |       WHEN a.sig IS NULL THEN 'dst_only'
         |       ELSE 'changed' END AS diff
         |FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
         |WHERE a.sig IS NULL OR b.sig IS NULL OR a.sig <> b.sig
         |ORDER BY 1""".stripMargin
    },
    // Same aggregate over the ORIGINAL parquet — a hash match proves the
    // ORC write→read round trip preserved every surviving row and value.
    "q_orc_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS text_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE doc_id >= 100
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_csv_ingest" ->
      s"""SELECT category,
         |       count(*) AS n_rows,
         |       CAST(sum(CASE WHEN try_cast(amount AS INTEGER) IS NULL
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
         |       CAST(coalesce(sum(try_cast(amount AS INTEGER)), 0) AS BIGINT) AS amount_sum
         |FROM read_csv('$FixtureDir/transactions.csv', header=true, all_varchar=true)
         |GROUP BY category ORDER BY category""".stripMargin,
    "q_csv_ingest_glob" ->
      s"""SELECT regexp_extract(filename, '[^/]+$$', 0) AS src_file,
         |       count(*) AS n_rows,
         |       CAST(sum(CASE WHEN try_cast(amount AS INTEGER) IS NULL
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
         |       CAST(coalesce(sum(try_cast(amount AS INTEGER)), 0) AS BIGINT) AS amount_sum
         |FROM read_csv('$FixtureDir/multi/*.csv', header=true,
         |              all_varchar=true, filename=true)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_json_ingest" ->
      s"""WITH parsed AS (
         |  SELECT * FROM read_json('$FixtureDir/applog.jsonl',
         |      format='newline_delimited', ignore_errors=true,
         |      columns={evt: 'VARCHAR', ms: 'INTEGER',
         |               usr: 'STRUCT(uid INTEGER, tier VARCHAR)'})),
         |good AS (SELECT * FROM parsed WHERE evt IS NOT NULL),
         |txt AS (SELECT content FROM read_text('$FixtureDir/applog.jsonl')),
         |counts AS (
         |  SELECT CAST(len(list_filter(string_split(content, chr(10)),
         |                              x -> x <> '')) AS BIGINT) AS n_lines
         |  FROM txt),
         |agg AS (
         |  SELECT evt, count(*) AS n,
         |         CAST(count(DISTINCT usr.uid) AS BIGINT) AS n_users,
         |         CAST(sum(ms) AS BIGINT) AS total_ms
         |  FROM good GROUP BY evt),
         |bad AS (
         |  SELECT '_corrupt' AS evt,
         |         (SELECT n_lines FROM counts) - (SELECT count(*) FROM good) AS n,
         |         CAST(0 AS BIGINT) AS n_users, CAST(0 AS BIGINT) AS total_ms)
         |SELECT * FROM agg UNION ALL SELECT * FROM bad ORDER BY evt""".stripMargin,
  )
}
