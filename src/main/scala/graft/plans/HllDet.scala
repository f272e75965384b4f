package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic HyperLogLog register aggregate:
  * `hll_det(h BIGINT) -> ARRAY<INT>` — the 256 max-rank registers of
  * classic HLL (Flajolet, Fusy, Gandouet & Meunier, AofA 2007) over a
  * stream of 32-bit hash values (the engine's md5-derived
  * `TextPipeline.h32` discipline; values outside [0, 2³²) throw).
  *
  * Register j (top 8 hash bits) keeps max(ρ) where ρ = 1 + the number of
  * leading zeros of the remaining 24 bits (ρ = 25 for an all-zero tail).
  * Unlike Spark's built-in `approx_count_distinct` (HLL++ with xxhash64
  * seeds and empirical bias tables — engine-internal, unverifiable from
  * outside), every register here is a deterministic pure function of the
  * DATA: max() per register commutes, so the state — and the estimate
  * computed from it — is identical under any partitioning, task order,
  * or engine. A DuckDB oracle recomputes registers AND estimate in SQL
  * (the `q_kmv_distinct` doctrine applied to HLL); the estimator lives
  * in [[HllDet.estimate]] so Spark-side spellings can't drift from the
  * documented math.
  *
  * Scale stance (100 TB): the aggregation state is a fixed 256-byte
  * array per group regardless of input cardinality; it merges by
  * elementwise max, so map-side partial aggregation collapses each
  * input partition to one 256-byte row per group before the shuffle —
  * the entire reason to sketch instead of countDistinct (whose two-stage
  * expansion shuffles every distinct value).
  *
  * CARDINALITY CEILING (round-13 ADVICE): the hash domain is 32-bit and
  * the estimator implements classic HLL's raw + linear-counting
  * branches but NOT the large-range correction, so above ~2³²/30
  * ≈ 1.4×10⁸ distinct values hash collisions bias the estimate low and
  * it saturates near 2³². The 100 TB stance therefore applies to the
  * PER-GROUP cardinalities this engine points the sketch at (per-day /
  * per-segment distinct users — ≤ 10⁸ for any real product surface),
  * not to corpus-wide distinct counts; a population expected to exceed
  * ~10⁸ per group needs a 64-bit-hash variant (swap h32 for a 64-bit
  * hash and widen the rank domain), at which point the same register
  * algebra and oracle discipline apply unchanged. Both engines share
  * this spelling, so the correctness gate is unaffected either way —
  * the ceiling is an accuracy scope, not a parity risk.
  *
  * NULL hashes are ignored (countDistinct semantics). The reference has
  * no sketches at all (its distinct count is an exact sort-based pass,
  * maprdeuce.cpp:1403-1427); this is extension surface.
  */
case class HllDet(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_det"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT 32-bit hash, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](HllDet.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (h < 0L || h > 0xFFFFFFFFL) throw new IllegalStateException(
        s"$prettyName: hash $h outside [0, 2^32) — feed TextPipeline.h32-" +
          "style 32-bit hashes so the register math matches the oracle")
      val j = (h >>> 24).toInt           // top 8 bits -> register index
      val w = h & 0xFFFFFFL              // low 24 bits -> rank domain
      // rho = leading zeros of the 24-bit tail + 1 = 25 - bitlength(w)
      val rho = if (w == 0L) 25 else 25 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < HllDet.M) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllDet =
    copy(child = newChildren(0))
}

object HllDet {
  /** Register count m = 2⁸ (precision b = 8: ±1.04/√m ≈ 6.5% standard
    * error — the fixed engine precision; the oracle bakes the same m). */
  val M = 256

  /** α·m²·2²⁵ — the raw-estimate numerator over the integer-scaled
    * harmonic sum (see [[zScaled]]: each register contributes 2²⁵⁻ʳ, so
    * the true harmonic sum is zScaled/2²⁵), precomputed once so Spark
    * and the SQL oracle share ONE double literal (`RawC.toString`
    * round-trips exactly) instead of re-deriving it through possibly
    * differently associated arithmetic. α_m = 0.7213/(1 + 1.079/m), the
    * standard m ≥ 128 constant. (Round-13 review fix: this was 2²⁴,
    * halving every raw-branch estimate — latent because the fixture
    * cardinalities all sit in the linear-counting branch, which the
    * raw-branch spec in ExpressionsSpec now prevents regressing.) */
  val RawC: Double = 0.7213 / (1.0 + 1.079 / M) * M * M * 33554432.0

  /** Linear-counting threshold 2.5·m — below this raw estimate (with
    * empty registers present) classic HLL switches to m·ln(m/V). */
  val LcThreshold: Double = 2.5 * M

  /** Integer-scaled harmonic sum Σ 2²⁵⁻ʳ over a `regs` array column —
    * every term is an exact power of two and the total fits well inside
    * a BIGINT, so the sum is EXACT (no float-order sensitivity) and
    * bit-identical across engines. */
  def zScaled(regs: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    aggregate(regs, lit(0L),
      (acc, r) => acc + call_function("shiftleft", lit(1L), lit(25) - r))
  }

  /** The classic-HLL estimate from an integer-scaled harmonic sum and
    * empty-register count — THE one Spark-side estimator spelling (the
    * register-array form and the rolling queries' windowed form both
    * call it, so the LC switch / rounding can never drift between
    * spellings). Rounded to 4 dp (the KMV contract — absorbs the ≤1-ulp
    * ln() difference between libm implementations). */
  def estimateFromZV(z: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val raw = lit(RawC) / z.cast("double")
    round(when(raw <= LcThreshold && v > 0,
      lit(M.toDouble) * log(lit(M.toDouble) / v.cast("double")))
      .otherwise(raw), 4)
  }

  /** The estimate from a register array column. */
  def estimate(regs: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    estimateFromZV(zScaled(regs), size(filter(regs, r => r === 0)))
  }

  /** The (z, v) AGGREGATES over an exploded per-register rank column —
    * the one Spark-side spelling of the estimator's grouped inputs
    * (sum 2²⁵⁻ʳ + zero-register count), shared by the rolling chain and
    * the multi-window overlap so a rank-domain change (e.g. the
    * documented 64-bit variant) lands in one place. */
  def zvAggs(r: org.apache.spark.sql.Column, zAlias: String,
      vAlias: String): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions._
    Seq(sum(call_function("shiftleft", lit(1L), lit(25) - r)).as(zAlias),
      sum(when(r === 0, 1L).otherwise(0L)).as(vAlias))
  }

  /** DuckDB spelling of the register derivation for a 32-bit hash
    * expression `h`: (j, rho). */
  def duckJ(h: String): String = s"($h) // 16777216"
  def duckRho(h: String): String =
    s"CASE WHEN ($h) % 16777216 = 0 THEN 25 " +
      s"ELSE 25 - length(bin(($h) % 16777216)) END"

  /** DuckDB spelling of the estimate over a relation with one row per
    * PRESENT register (j, r) — absent registers are counted as zeros via
    * `m - count(*)`. Emits `round(est, 4) AS <alias>` from grouped
    * z/v aggregates; embed inside `SELECT <grp>, ${duckEstimate(...)}`
    * with a GROUP BY. */
  def duckZV: String =
    s"sum(1::BIGINT << CAST(25 - r AS INT)) + ($M - count(*)) * 33554432 AS z, " +
      s"$M - count(*) AS v"

  def duckEstimateFromZV(alias: String): String = duckEstimate("z", "v", alias)

  /** The same estimator over arbitrarily named z/v columns — the
    * multi-window queries (q_hll_overlap) compute several (z, v) pairs
    * per row and must share ONE spelling with the single-window chain. */
  def duckEstimate(z: String, v: String, alias: String): String =
    s"round(CASE WHEN $RawC / CAST($z AS DOUBLE) <= $LcThreshold AND $v > 0 " +
      s"THEN $M.0 * ln($M.0 / $v) " +
      s"ELSE $RawC / CAST($z AS DOUBLE) END, 4) AS $alias"

  /** DuckDB z/v aggregates over a DENSE per-register relation (one row
    * per (group, j) with r = 0 for absent registers — the windowed-grid
    * chains): `sum(2^(25−r))` and the zero-register count, aliased. */
  def duckZVDense(r: String, zAlias: String, vAlias: String): String =
    s"sum(1::BIGINT << CAST(25 - $r AS INT)) AS $zAlias, " +
      s"sum(CASE WHEN $r = 0 THEN 1 ELSE 0 END) AS $vAlias"

  val info: ExpressionInfo = new ExpressionInfo(classOf[HllDet].getName, "hll_det")
}
