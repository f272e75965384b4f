package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** sf1 fixture generator for the scaling decade past the driver's data
  * (TESTDATA.md ships sf0.001/0.01/0.1; the 100 TB design claims want one
  * more measured decade). Writes a 10× corpus to /tmp — NEVER under
  * /root/testdata, which is read-only driver property.
  *
  * Two generation modes, both deterministic (MurmurHash3 on stable keys —
  * no RNG state, so any subset regenerates bit-identically):
  *
  *  - **Relational tables** (`lineitem`, `orders`, dims): key-shifted
  *    replication of sf0.1 — replica i adds `i · (max_key + 1)` to every
  *    key column. This preserves every per-key distribution EXACTLY
  *    (lines per order, orders per customer, parts per order — the
  *    degree distributions the graph queries stress), which is also how
  *    TPC-H itself scales: more keys, constant per-key shape.
  *
  *  - **documents**: generated fresh following the observed driver
  *    protocol (31-word fixed vocab, uniform 10–100 words/doc, lang
  *    weights ≈ [en .4, de/es/fr/zh .15], source = src{doc%20}, ~1.6% of
  *    docs near-clones of their predecessor with the last 2 words
  *    replaced, ~0.2% exact clones). The FIXED vocab means trigram
  *    document frequency grows ~linearly with corpus size (the trigram
  *    space saturates at 31³), so exact all-pairs jaccard work (Σ df²)
  *    grows QUADRATICALLY per decade — a property of the fixture data,
  *    not of any plan. To separate the two, `--open-vocab` generates the
  *    same corpus over a vocab grown ∝ √n (Heaps-style, 31 → 74 words),
  *    which holds avg df at its sf0.1 level (~9.6): an engine scaling
  *    linearly on THIS corpus is doing 10× work for 10× docs.
  *
  * Run: `tools/run.sh graft.tools.GenScale` (env: GRAFT_SCALE_BASE,
  * GRAFT_SCALE_OUT, GRAFT_SCALE_FACTOR). Produces `<out>` (faithful) and
  * `<out>-openvocab` (documents only).
  */
object GenScale {

  private def h(parts: String*): Int =
    MurmurHash3.stringHash(parts.mkString(":"), 0x9747b28c)

  private def pick[T](xs: IndexedSeq[T], key: Int): T =
    xs(math.floorMod(key, xs.length))

  private val Langs = IndexedSeq("de", "es", "fr", "zh")

  /** Deterministic word sequence of one document. */
  private def docWords(vocab: IndexedSeq[String], doc: Long): IndexedSeq[String] = {
    val len = 10 + math.floorMod(h("len", doc.toString), 91)
    (0 until len).map(p => pick(vocab, h("w", doc.toString, p.toString)))
  }

  /** One document row: (doc_id, text, lang, source, n_chars). Clone rules
    * mirror the observed driver corpus: doc % 512 == 511 is an exact copy
    * of its predecessor; doc % 64 == 63 a near-clone (last 2 words
    * replaced — jaccard ≈ 0.9 at the observed doc lengths). */
  private def docRow(vocab: IndexedSeq[String], doc: Long): (Long, String, String, String, Long) = {
    val words =
      if (doc > 0 && doc % 512 == 511) docWords(vocab, doc - 1)
      else if (doc > 0 && doc % 64 == 63) {
        val base = docWords(vocab, doc - 1)
        base.dropRight(2) ++ (0 until 2).map(p =>
          pick(vocab, h("clone", doc.toString, p.toString)))
      } else docWords(vocab, doc)
    val text = words.mkString(" ")
    val lr = math.floorMod(h("lang", doc.toString), 100)
    val lang = if (lr < 40) "en" else Langs((lr - 40) / 15)
    (doc, text, lang, s"src${doc % 20}", text.length.toLong)
  }

  /** Fresh documents table over `vocab`, driver-protocol shaped. */
  def documents(spark: SparkSession, nDocs: Int, vocab: IndexedSeq[String]): DataFrame = {
    import spark.implicits._
    spark.sparkContext.parallelize(0 until nDocs, 32)
      .map(i => docRow(vocab, i.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** The base corpus vocabulary (space-separated words of every doc). */
  def baseVocab(spark: SparkSession, baseDir: String): IndexedSeq[String] = {
    val v = spark.read.parquet(s"$baseDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).sorted
    v.toIndexedSeq
  }

  /** Heaps-style grown vocab: the base words plus letter-only compounds
    * of base word pairs, up to `target` entries. */
  def grownVocab(base: IndexedSeq[String], target: Int): IndexedSeq[String] = {
    val extra = for (a <- base.iterator; b <- base.iterator) yield a + b
    (base ++ extra.take(target - base.length)).toIndexedSeq
  }

  /** Key-shifted replication: replica i shifts each key column by
    * i * (max(key)+1), preserving per-key shape and FK integrity. */
  def replicate(df: DataFrame, k: Int, keyCols: Seq[String]): DataFrame = {
    val maxes = keyCols.map(c => c ->
      (df.agg(max(col(c))).collect()(0).getLong(0) + 1L)).toMap
    val rep = df.withColumn("_r", explode(sequence(lit(0), lit(k - 1))))
    keyCols.foldLeft(rep) { (d, c) =>
      d.withColumn(c, col(c) + col("_r") * lit(maxes(c)))
    }.drop("_r")
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val base = sys.env.getOrElse("GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("GRAFT_SCALE_OUT", "/tmp/graft-sf1")
    val k = sys.env.getOrElse("GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt, "graft-genscale")

    def write(df: DataFrame, dir: String, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")

    // the explode-based replication is narrow, so without an explicit
    // repartition a 1-partition base table writes ONE file with ONE row
    // group — a single unsplittable mapper that serializes every scan
    // (first sf1 suite run: q1's scan+partial-agg pipeline ran on one
    // task for 110 s; 32-way layout reads it in ~2 s)
    def writeSplit(df: DataFrame, dir: String, name: String): Unit =
      write(df.repartition(32), dir, name)

    def table(name: String): DataFrame = spark.read.parquet(s"$base/$name.parquet")

    // fixed-cardinality dims: copy through (TPC-H keeps nation/region flat)
    Seq("region", "nation").foreach(t => write(table(t), out, t))
    // scaled tables: replicate with key shifts
    writeSplit(replicate(table("supplier"), k, Seq("s_suppkey")), out, "supplier")
    writeSplit(replicate(table("customer"), k, Seq("c_custkey")), out, "customer")
    writeSplit(replicate(table("part"), k, Seq("p_partkey")), out, "part")
    writeSplit(replicate(table("orders"), k, Seq("o_orderkey", "o_custkey")), out, "orders")
    writeSplit(replicate(table("lineitem"), k,
      Seq("l_orderkey", "l_partkey", "l_suppkey")), out, "lineitem")

    // events: the raw read copies ts through type-agnostically (long nanos
    // under nanosAsLong for pre-r8 fixtures, TIMESTAMP_NTZ micros for r8+;
    // Tables.events normalizes either on load). Same time range, 10× the
    // traffic — how event volume actually grows.
    writeSplit(replicate(table("events"), k, Seq("event_id", "user_id")),
      out, "events")
    // embeddings: replica i applies a deterministic PERMUTATION of the 64
    // dims instead of copying vectors verbatim — norms and within-replica
    // geometry are preserved exactly, while cross-replica cosine drops to
    // ~random, so near-dup pair structure scales like a real corpus
    // (verbatim copies would plant 10 exact duplicates of every vector:
    // a 45×-per-group pair blowup by construction, not by data).
    val dim = 64
    val perms: IndexedSeq[IndexedSeq[Int]] = (0 until k).map { r =>
      if (r == 0) IndexedSeq.range(0, dim)
      else {
        val a = Array.range(0, dim)
        for (j <- dim - 1 to 1 by -1) {
          val x = math.floorMod(h("perm", r.toString, j.toString), j + 1)
          val t = a(j); a(j) = a(x); a(x) = t
        }
        a.toIndexedSeq
      }
    }
    val permLit = array(perms.map(p => array(p.map(lit): _*)): _*)
    val emb = replicate(table("embeddings"), k, Seq("vec_id"))
    // recover the replica index from the shifted vec_id to pick the perm
    val baseMaxVec = table("embeddings").agg(max(col("vec_id")))
      .collect()(0).getLong(0) + 1L
    val permuted = emb
      .withColumn("_rep", (col("vec_id") / lit(baseMaxVec)).cast("int"))
      .withColumn("_perm", element_at(permLit, col("_rep") + 1))
      .withColumn("embedding", transform(col("_perm"),
        i => element_at(col("embedding"), i + 1)))
      .drop("_rep", "_perm")
    writeSplit(permuted, out, "embeddings")

    val baseDocs = table("documents").count().toInt
    val vocab = baseVocab(spark, base)
    write(documents(spark, baseDocs * k, vocab), out, "documents")
    // open-vocab control: same corpus shape, avg trigram df held at the
    // sf0.1 level by growing the vocab ∝ √k (31 → 74 ≈ 31·√(10)·0.75…
    // chosen so observed distinct trigrams ≈ 10× and Σ df² ≈ 10×)
    val openDir = s"$out-openvocab"
    write(documents(spark, baseDocs * k, grownVocab(vocab, 74)),
      openDir, "documents")

    val counts = Seq("lineitem", "orders", "documents").map(t =>
      s""""$t":${spark.read.parquet(s"$out/$t.parquet").count()}""").mkString(",")
    println(s"""{"out":"$out","factor":$k,$counts,"open_vocab_dir":"$openDir"}""")
    spark.stop()
  }
}
