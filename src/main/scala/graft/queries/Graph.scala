package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** M8 — iterative graph analytics: PageRank over the supplier↔customer
  * co-transaction graph (edges from lineitem⨝orders, materialized in BOTH
  * directions so the bipartite graph has no dangling nodes and the classic
  * power iteration needs no dangling-mass redistribution term).
  *
  * The reference has nothing graph-shaped (SURVEY.md §2.2); this tier is
  * pure extension surface, the batch-iterative complement of the
  * connected-components star contraction in Dedup (`q_dedup_clusters`).
  *
  * Cross-engine exactness: per-target contribution sums are FLOAT SUMS —
  * order-dependent in IEEE — so each edge contribution quantizes to
  * round(rank/deg · 1e12) BIGINT first; the long sum is commutative and
  * partition-order-free (the q_stats / k-means centroid trick), and the
  * damping update is then a fixed sequence of exact double ops. Both
  * engines run the identical 3-iteration unrolled program.
  *
  * Scale stance (100 TB): edges shuffle ONCE per iteration on dst (narrow
  * (dst, long) rows — never adjacency lists); degree and rank tables are
  * node-cardinality and join on the node key; the rank⨝edges join is a
  * plain shuffled hash join AQE can skew-split on a hub node. Iterations
  * unroll declaratively — in production each iteration's rank table would
  * checkpoint/persist to cut lineage, like the star-contraction phases.
  */
object Graph {

  private val Damping = 0.85
  private val Iters = 3
  /** Contribution quantization denominator (exact commutative sums). */
  private val QP = 1e12

  /** Directed edge list, both orientations of each distinct
    * (supplier, customer) trading pair; node ids prefixed to keep the two
    * key spaces disjoint. */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("s:"), col("l_suppkey")).as("s_node"),
        concat(lit("c:"), col("o_custkey")).as("c_node"))
      .distinct()
    pairs.select(col("s_node").as("src"), col("c_node").as("dst"))
      .union(pairs.select(col("c_node").as("src"), col("s_node").as("dst")))
  }

  /** PageRank, 3 unrolled power iterations, damping 0.85, uniform init
    * 1/N over the nodes incident to ≥1 edge. Output: top 20 nodes by
    * N-normalized rank (average = 1), ties broken by node id. */
  def qPagerank(s: SparkSession, dir: String): DataFrame = {
    // materialize the edge list ONCE, hash-partitioned on the join key —
    // without this every unrolled iteration re-derives the whole
    // lineitem⨝orders⨝distinct pipeline (the dominant cost: 6.3 s → this
    // is the star-contraction localCheckpoint discipline, Dedup.scala).
    // At cluster scale this is the persisted/checkpointed edge table every
    // Pregel-style system keeps between supersteps.
    val e = edges(s, dir).repartition(col("src")).localCheckpoint()
    // deg is referenced by every unrolled iteration (plus n and r0) —
    // without materialization each reference re-shuffles the whole edge
    // list for the same node-cardinality aggregate
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val n = deg.agg(count(lit(1)).as("n_nodes"))
    val r0 = deg.crossJoin(broadcast(n))
      .select(col("src").as("node"), col("deg"), col("n_nodes"),
        (lit(1.0) / col("n_nodes").cast("double")).as("rank"))

    def step(r: DataFrame): DataFrame =
      r.join(e, r("node") === e("src"))
        .select(col("dst"),
          round(col("rank") / col("deg").cast("double") * QP).cast("long").as("q"))
        .groupBy(col("dst")).agg(sum(col("q")).as("sq"))
        .join(deg, col("dst") === deg("src"))
        .crossJoin(broadcast(n))
        .select(col("dst").as("node"), col("deg"), col("n_nodes"),
          ((lit(1.0) - Damping) / col("n_nodes").cast("double") +
            lit(Damping) * (col("sq").cast("double") / QP)).as("rank"))

    val r3 = (1 to Iters).foldLeft(r0)((r, _) => step(r))
    r3.select(col("node"),
        round(col("rank") * col("n_nodes").cast("double"), 6).as("nrank"))
      .orderBy(col("nrank").desc, col("node"))
      .limit(20)
  }

  /** Triangle participation counts over the "parts ordered together"
    * graph (distinct part pairs sharing an order), top 20 parts — the
    * clustering-coefficient / community primitive.
    *
    * Algorithm: the degree-ordered orientation count. Every undirected
    * edge is oriented from its lower-(degree, id) endpoint to the higher;
    * each triangle then has EXACTLY one vertex with out-edges to the
    * other two, so counting (wedge from u) ⋉ (closing edge) sees each
    * triangle once — no /6 correction, and per-node out-degree is
    * O(√m), which bounds the wedge explosion a hub would cause in the
    * naive spelling (the classic MPC triangle bound). The ORACLE is the
    * plain undirected 3-way self-join, so the oriented plan is re-proven
    * equal to brute force on every verify run.
    *
    * Scale stance: the edge list materializes once (narrow int pairs,
    * 3 consumers); wedges and closures are equi-joins on (u) and
    * (a, b) — never a cross product; the final count is a partial-agg
    * shuffle on node id. */
  def qTriangles(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edges = li.join(li.withColumnRenamed("p", "q"), "o")
      .filter(col("p") < col("q"))
      .select(col("p").as("a"), col("q").as("b"))
      .distinct()
    triangleCounts(edges)
      .orderBy(col("n_triangles").desc, col("part").asc)
      .limit(20)
  }

  /** Closing-edge build side broadcasts only while the MEASURED edge
    * count stays under this (64M long-pair rows ≈ 1 GB — comfortable in
    * any 100 TB-posture executor, and an order of magnitude under
    * Spark's 8 GB broadcast hard cap). The threshold was originally 8M
    * rows (128 MB); the sf1 decade measurement moved it: the 12M-edge
    * sf1 co-order graph reads 216 s through the bare-join branch (AQE
    * shuffle-writes the d²-sized wedge stream before it can re-plan)
    * vs 111 s with the static broadcast — and 111 s is ~13× the sf0.1
    * time for 10× data (≈ linear), while 216 s is ~26× (the cliff is
    * the wedge materialization, not the join itself). Beyond THIS gate
    * the wedge shuffle is genuinely unavoidable — the build side no
    * longer fits memory and shuffling the wedge stream IS the
    * data-bound cost. */
  private val BroadcastEdgeRows = 64000000L

  /** Core of [[qTriangles]] over any canonical (a < b, distinct) edge
    * list: per-node triangle participation counts. Exposed for the
    * randomized brute-force property test in PropertiesSpec;
    * `broadcastRows` is injectable so GraphTextSpec can pin BOTH gate
    * branches (hinted broadcast under it, bare join above it). */
  private[graft] def triangleCounts(edgesIn: DataFrame,
      broadcastRows: Long = BroadcastEdgeRows): DataFrame = {
    val e = edgesIn.localCheckpoint()
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val dirE = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db")
          || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      // consumed by BOTH wedge-join sides; without materialization each
      // side re-runs the degree joins (pruning blocks exchange reuse)
      .localCheckpoint()
    // wedge generation stays a flat self-join on u: both sides prune to
    // the same (u, v) subtree so the exchange is built once and reused,
    // and the d²-sized pair stream flows through whole-stage codegen. (A
    // collect_list + array-HOF "node iterator" spelling was measured 30%
    // SLOWER here — interpreted slice/transform allocation beats the
    // codegen join only on paper.)
    val wedges = dirE
      .join(dirE.select(col("u"), col("v").as("w")), "u")
      .filter(col("v") < col("w"))
    // the closing-edge check probes |wedges| ≫ |edges| rows against the
    // narrow int-pair edge list. The build side is data-dependent
    // (1.2M rows ≈ 19 MB at sf0.1 → 100M+ rows at 100×), so an
    // UNCONDITIONAL broadcast hint is a scale-killer: a hint is an
    // instruction Spark must obey even when the build side no longer
    // fits an executor. But dropping the hint entirely costs real money
    // at THIS scale: AQE's runtime SMJ→BHJ conversion still
    // shuffle-WRITES the d²-sized wedge stream before it re-plans
    // (measured: 8.2 s hinted vs 15–20 s converted under suite I/O
    // pressure at sf0.1) — only a static broadcast avoids materializing
    // wedges at all. So the hint is CONDITIONAL on a measured count:
    // the edge list is already localCheckpoint-materialized, making
    // count() a metadata-cheap cached-partition sweep, and the
    // threshold (64M rows ≈ 1 GB of long pairs) keeps the broadcast
    // far inside executor memory. Above it, the bare join stands and
    // AQE picks shuffled-hash or broadcast from runtime stats — the
    // per-run, per-data re-plan the 100 TB path needs.
    val eSide = if (e.count() <= broadcastRows) broadcast(e) else e
    val closed = wedges
      .join(eSide, least(col("v"), col("w")) === col("a")
        && greatest(col("v"), col("w")) === col("b"), "left_semi")
    closed.select(explode(array(col("u"), col("v"), col("w"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficient per node, cc(v) = 2·T(v) / (d(v)·(d(v)−1))
    * over the same co-order part graph as [[qTriangles]] — the per-node
    * community/cohesion feature (Watts & Strogatz 1998) that graph-based
    * spam and community detection read: how close a node's neighborhood is
    * to a clique. Nodes of degree < 2 are excluded (the coefficient is
    * undefined on fewer than one potential wedge); triangle-free nodes
    * report cc = 0 via the left join.
    *
    * Exactness: T and d are exact integers from the oriented triangle
    * count and the degree aggregate; cc = one IEEE division of integers —
    * identical in both engines, no rounding needed. The ORACLE recomputes
    * T from the brute-force undirected 3-way join, so the oriented plan
    * is again re-proven equal to brute force, now over ALL nodes rather
    * than the top-20 projection.
    *
    * Scale stance: [[triangleCounts]]'s wedge bound carries over
    * unchanged (that's the whole cost); degree is one partial-agg shuffle
    * of int pairs; the final join is node-cardinality ⋈ node-cardinality.
    */
  def qClusteringCoeff(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edges = li.join(li.withColumnRenamed("p", "q"), "o")
      .filter(col("p") < col("q"))
      .select(col("p").as("a"), col("q").as("b"))
      .distinct().localCheckpoint()
    val deg = edges.select(explode(array(col("a"), col("b"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("degree"))
    val tri = triangleCounts(edges)
    deg.filter(col("degree") >= 2)
      .join(tri, Seq("part"), "left")
      .select(col("part"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("cc", lit(2.0) * col("n_triangles") /
        (col("degree") * (col("degree") - 1)).cast("double"))
      .orderBy("part")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (qPagerank _),
    "q_triangles" -> (qTriangles _),
    "q_clustering_coeff" -> (qClusteringCoeff _),
  )

  // ---- oracle SQL ----------------------------------------------------------

  /** One power-iteration CTE body over ranks `r` — the SQL twin of `step`. */
  private def duckStep(r: String): String =
    s"""SELECT d.src AS node, d.deg, c.sq, n.n_nodes,
       |    (1.0 - $Damping) / CAST(n.n_nodes AS DOUBLE)
       |      + $Damping * (CAST(c.sq AS DOUBLE) / $QP) AS rank
       |  FROM (
       |    SELECT e.dst, sum(CAST(round(r.rank / CAST(r.deg AS DOUBLE) * $QP) AS BIGINT)) AS sq
       |    FROM $r r JOIN edges e ON r.node = e.src GROUP BY e.dst) c
       |  JOIN deg d ON c.dst = d.src, n""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_pagerank" ->
      s"""WITH pairs AS (
         |  SELECT DISTINCT 's:' || l_suppkey AS s_node, 'c:' || o_custkey AS c_node
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (
         |  SELECT s_node AS src, c_node AS dst FROM pairs
         |  UNION ALL SELECT c_node, s_node FROM pairs),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |n AS (SELECT count(*) AS n_nodes FROM deg),
         |r0 AS (SELECT src AS node, deg, n.n_nodes,
         |         1.0 / CAST(n.n_nodes AS DOUBLE) AS rank FROM deg, n),
         |r1 AS (${duckStep("r0")}),
         |r2 AS (${duckStep("r1")}),
         |r3 AS (${duckStep("r2")})
         |SELECT node, round(rank * CAST(n_nodes AS DOUBLE), 6) AS nrank
         |FROM r3 ORDER BY nrank DESC, node LIMIT 20""".stripMargin,
    // Plain undirected 3-way self-join: brute-force triangle listing —
    // re-proves the degree-oriented plan's correctness each verify run.
    "q_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |e AS (SELECT DISTINCT x.p AS a, y.p AS b
        |      FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
        |t AS (SELECT e1.a, e1.b, e2.b AS c
        |      FROM e e1 JOIN e e2 ON e1.b = e2.a
        |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n AS (SELECT unnest([a, b, c]) AS part FROM t)
        |SELECT part, count(*) AS n_triangles FROM n GROUP BY part
        |ORDER BY n_triangles DESC, part LIMIT 20""".stripMargin,
    "q_clustering_coeff" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |e AS (SELECT DISTINCT x.p AS a, y.p AS b
        |      FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
        |deg AS (SELECT part, count(*) AS degree FROM (
        |          SELECT a AS part FROM e UNION ALL SELECT b FROM e) u
        |        GROUP BY part),
        |t AS (SELECT e1.a, e1.b, e2.b AS c
        |      FROM e e1 JOIN e e2 ON e1.b = e2.a
        |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tri AS (SELECT part, count(*) AS n_triangles FROM (
        |          SELECT unnest([a, b, c]) AS part FROM t) n GROUP BY part)
        |SELECT d.part, d.degree,
        |  coalesce(tri.n_triangles, 0) AS n_triangles,
        |  2.0 * coalesce(tri.n_triangles, 0)
        |    / CAST(d.degree * (d.degree - 1) AS DOUBLE) AS cc
        |FROM deg d LEFT JOIN tri ON d.part = tri.part
        |WHERE d.degree >= 2 ORDER BY d.part""".stripMargin,
  )
}
