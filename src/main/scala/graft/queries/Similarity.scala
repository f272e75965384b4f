package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** M4b — approximate-nearest-neighbor similarity search over `embeddings`
  * (64-dim float vectors): brute-force cosine top-k as the exactness
  * baseline, a random-hyperplane LSH bucketed variant, and an IVF-style
  * coarse-quantizer variant — the three-rung ANN ladder of an embedding
  * dedup / retrieval pipeline.
  *
  * The reference has nothing vector-shaped (SURVEY.md §2.2); this tier is
  * pure extension surface. All vector math is higher-order-function array
  * arithmetic (`zip_with` + sequential `aggregate` folds) — codegen'd, no
  * UDFs — and every stochastic input (hyperplane signs) is a compile-time
  * literal injected into BOTH the Spark plan and the DuckDB oracle, so the
  * two engines run bit-identical float programs.
  *
  * Scale stance (100 TB):
  *  - the query set is small and explicitly `broadcast()` — the corpus never
  *    shuffles for brute force; per-partition candidates then one top-k;
  *  - LSH reduces work by bucketing: corpus shuffles ONCE on the 8-bit
  *    bucket key, queries broadcast; candidate count/query ≈ N/256;
  *  - IVF does the same with learned-ish coarse cells (per-label centroids
  *    here; k-means cells in production) and nprobe=2;
  *  - ranking ties broken by neighbor id so top-k is total-order stable.
  */
object Similarity {

  private val Dim = 64
  private val LshBits = 8
  private val TopK = 10
  private val NProbe = 2

  /** Deterministic ±1.0 hyperplane matrix (LshBits × Dim), from a tiny
    * splitmix-style integer mix — literal-inlined into the oracle SQL too. */
  private[queries] val planes: IndexedSeq[IndexedSeq[Double]] =
    (0 until LshBits).map { k =>
      (0 until Dim).map { d =>
        var z = (k.toLong * 1000003L + d.toLong * 65537L + 0x9E3779B9L) & 0xFFFFFFFFL
        z = (z ^ (z >>> 16)) * 0x45D9F3BL & 0xFFFFFFFFL
        z = (z ^ (z >>> 13)) * 0x45D9F3BL & 0xFFFFFFFFL
        if (((z ^ (z >>> 16)) & 1L) == 1L) 1.0 else -1.0
      }
    }

  /** Vectors as double arrays; queries = the first 10 ids (broadcast side). */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  /** Fused single-pass native kernel (graft.plans.CosineSimilarity);
    * accumulation order matches the oracle's sequential list_sum folds. */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineSim(a, b)

  /** ±1 plane k as an array literal column. */
  private def planeCol(k: Int): Column = array(planes(k).map(lit): _*)

  /** LSH bucket id of a vector column: sign bit per hyperplane, packed. */
  private def bucketOf(v: Column): Column =
    (0 until LshBits).map(k =>
      when(dot(v, planeCol(k)) > 0, lit(1L << k)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Brute-force exact cosine top-k: the ANN ground truth. The query set is
    * broadcast; ranking is per-query (one shuffle on q_id), ties broken by
    * neighbor id. */
  def qAnnBruteforce(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = vecs(s, dir)
    val q = broadcast(e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("q_v")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id").asc)
    e.crossJoin(q).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine(col("v"), col("q_v")).as("cos_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cosine"))
      .orderBy("q_id", "rank")
  }

  /** LSH-bucketed ANN: corpus bucketed by 8 hyperplane sign bits (one
    * narrow pass), candidates = same-bucket vectors, exact cosine re-rank
    * inside the bucket. ~N/256 of the corpus is touched per query. */
  def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = vecs(s, dir).withColumn("bucket", bucketOf(col("v")))
    val q = broadcast(e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("bucket")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id").asc)
    e.join(q, "bucket").filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine(col("v"), col("q_v")).as("cos_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cosine"))
      .orderBy("q_id", "rank")
  }

  /** IVF-style ANN: coarse cells = labels, centroid = per-dimension mean
    * (summed as an ORDERED fold over vec_id so the double sum is
    * deterministic and engine-portable), nprobe=2 cells per query, exact
    * re-rank within probed cells. At scale the centroid table is tiny and
    * broadcast; the corpus shuffles once on its cell id. */
  def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = vecs(s, dir)
    // per-(label, dim) mean via ordered fold; regroup into centroid arrays
    val comps = e.select(col("label"), col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg((aggregate(sort_array(collect_list(struct(col("vec_id"), col("x")))),
        lit(0.0), (acc, s) => acc + s.getField("x")) / count(lit(1))).as("c"))
    val centroids = comps.groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cv"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("ccos").desc, col("label").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("q_id"), col("q_v"), col("label"),
        cosine(col("q_v"), col("cv")).as("ccos"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= NProbe)
      .select(col("q_id"), col("q_v"), col("label"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id").asc)
    broadcast(probes).join(e, "label").filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine(col("v"), col("q_v")).as("cos_raw"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cosine"))
      .orderBy("q_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_bruteforce" -> (qAnnBruteforce _),
    "q_ann_lsh" -> (qAnnLsh _),
    "q_ann_ivf" -> (qAnnIvf _),
  )

  // ---- oracle SQL ----------------------------------------------------------

  private val duckCos =
    """list_sum(list_transform(a.v, (x,i) -> x * q.q_v[i])) /
      |    (sqrt(list_sum(list_transform(a.v, x -> x*x)))
      |     * sqrt(list_sum(list_transform(q.q_v, x -> x*x))))""".stripMargin

  private def duckPlane(k: Int): String =
    planes(k).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  private val duckBucket = (0 until LshBits).map { k =>
    s"CASE WHEN list_sum(list_transform(v, (x,i) -> x * (${duckPlane(k)})[i])) > 0 THEN ${1L << k} ELSE 0 END"
  }.mkString("(", " + ", ")")

  private val duckVecs =
    "e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"

  val oracle: Map[String, String] = Map(
    "q_ann_bruteforce" ->
      s"""WITH $duckVecs,
         |q AS (SELECT vec_id AS q_id, v AS q_v FROM e WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, a.vec_id AS neighbor_id, $duckCos AS cos_raw
         |  FROM e a, q WHERE a.vec_id <> q.q_id),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos_raw DESC, neighbor_id ASC) AS rank FROM scored)
         |SELECT q_id, CAST(rank AS INT) AS rank, neighbor_id,
         |  round(cos_raw, 6) AS cosine
         |FROM ranked WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH $duckVecs,
         |b AS (SELECT vec_id, v, $duckBucket AS bucket FROM e),
         |q AS (SELECT vec_id AS q_id, v AS q_v, bucket FROM b WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, a.vec_id AS neighbor_id, $duckCos AS cos_raw
         |  FROM b a JOIN q ON a.bucket = q.bucket AND a.vec_id <> q.q_id),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos_raw DESC, neighbor_id ASC) AS rank FROM scored)
         |SELECT q_id, CAST(rank AS INT) AS rank, neighbor_id,
         |  round(cos_raw, 6) AS cosine
         |FROM ranked WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    "q_ann_ivf" ->
      s"""WITH $duckVecs,
         |comps AS (
         |  SELECT label, pos, list_sum(list(x ORDER BY vec_id)) / count(*) AS c
         |  FROM (SELECT label, vec_id, pos, v[pos] AS x
         |        FROM e, (SELECT unnest(range(1, ${Dim + 1})) AS pos))
         |  GROUP BY label, pos),
         |centroids AS (SELECT label, list(c ORDER BY pos) AS cv FROM comps GROUP BY label),
         |q AS (SELECT vec_id AS q_id, v AS q_v FROM e WHERE vec_id < 10),
         |probes AS (
         |  SELECT q_id, q_v, label FROM (
         |    SELECT q.q_id, q.q_v, c.label,
         |      row_number() OVER (PARTITION BY q.q_id ORDER BY
         |        list_sum(list_transform(c.cv, (x,i) -> x * q.q_v[i])) /
         |          (sqrt(list_sum(list_transform(c.cv, x -> x*x)))
         |           * sqrt(list_sum(list_transform(q.q_v, x -> x*x)))) DESC,
         |        c.label ASC) AS pr
         |    FROM q, centroids c) WHERE pr <= $NProbe),
         |scored AS (
         |  SELECT q.q_id, a.vec_id AS neighbor_id, $duckCos AS cos_raw
         |  FROM e a JOIN probes q ON a.label = q.label AND a.vec_id <> q.q_id),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos_raw DESC, neighbor_id ASC) AS rank FROM scored)
         |SELECT q_id, CAST(rank AS INT) AS rank, neighbor_id,
         |  round(cos_raw, 6) AS cosine
         |FROM ranked WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
  )
}
