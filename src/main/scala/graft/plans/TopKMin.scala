package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate: `topk_min(score BIGINT, id BIGINT, k)`
  * -> `ARRAY<STRUCT<score BIGINT, id BIGINT>>`, the k lexicographically
  * smallest (score, id) pairs in ascending order.
  *
  * This is the scale-safe selection primitive for ANN shortlists: the
  * per-group aggregation state is a BOUNDED max-heap of at most k pairs
  * (two primitive long arrays, no boxing), and because it is a real
  * Catalyst aggregate it participates in partial aggregation — the
  * map side reduces each input partition to ≤ k pairs per group before
  * the shuffle, and the final merge combines ≤ #partitions · k pairs.
  * Contrast `row_number().over(Window.partitionBy(q))`: that spelling
  * ships EVERY row of the group to one reducer partition and sorts all
  * of them to keep k — a single-partition O(N log N) sort per group at
  * 100 TB. Here the shuffle carries O(partitions · k) rows per group
  * and no full sort ever happens (heap replace is O(log k) per row).
  *
  * Null semantics: a NULL score or id THROWS (IllegalStateException)
  * instead of ranking or being silently skipped — in the ANN pipelines
  * the score is an `adc_sum` whose NULL is the documented fail-loud
  * signal for a distance-table construction bug, and Spark's default
  * nulls-first ascending sort would otherwise rank such a row as the
  * nearest neighbor (round-8 ADVICE finding). Filter upstream if NULLs
  * are expected.
  *
  * The reference has no top-k at all (its one query is a full sort,
  * maprdeuce.cpp:334-426); this is extension surface for the ANN tier.
  */
case class TopKMin(
    score: Expression,
    id: Expression,
    k: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKMin.Buffer] {

  override def children: Seq[Expression] = Seq(score, id, k)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKMin.resultType
  override def prettyName: String = "topk_min"

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType, k.dataType) match {
      case (LongType, LongType, ByteType | ShortType | IntegerType | LongType) =>
        if (!k.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a constant")
        else if (kVal <= 0)
          TypeCheckResult.TypeCheckFailure(s"$prettyName k must be positive, got $kVal")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT, BIGINT, INT), got " +
          s"(${score.dataType.simpleString}, ${id.dataType.simpleString}, " +
          s"${k.dataType.simpleString})")
    }

  private lazy val kVal: Int = k.eval(null).asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): TopKMin.Buffer = new TopKMin.Buffer(kVal)

  override def update(buf: TopKMin.Buffer, input: InternalRow): TopKMin.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s == null || i == null) throw new IllegalStateException(
      s"$prettyName: NULL ${if (s == null) "score" else "id"} input — in the " +
        "ANN pipelines a NULL adc_sum signals a distance-table construction " +
        "bug; filter or fix upstream instead of ranking NULLs")
    buf.add(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKMin.Buffer, other: TopKMin.Buffer): TopKMin.Buffer = {
    var i = 0
    while (i < other.n) { buf.add(other.s(i), other.d(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKMin.Buffer): Any = {
    val pairs = (0 until buf.n).map(i => (buf.s(i), buf.d(i))).sorted
    new GenericArrayData(pairs.map { case (sc, id0) =>
      new GenericInternalRow(Array[Any](sc, id0))
    }.toArray[Any])
  }

  override def serialize(buf: TopKMin.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.s(i)); bb.putLong(buf.d(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKMin.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKMin.Buffer(kVal)
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKMin =
    copy(score = newChildren(0), id = newChildren(1), k = newChildren(2))
}

object TopKMin {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** Bounded max-heap over (score, id) pairs, keeping the `cap`
    * lexicographically smallest seen. Primitive long arrays — the whole
    * aggregation state is 16·cap bytes + two ints, independent of how
    * many rows stream through. */
  final class Buffer(val cap: Int) {
    val s = new Array[Long](cap)
    val d = new Array[Long](cap)
    var n = 0

    // lexicographic (score, id) compare: is pair a > pair b?
    @inline private def gt(sa: Long, da: Long, sb: Long, db: Long): Boolean =
      sa > sb || (sa == sb && da > db)

    @inline private def swap(i: Int, j: Int): Unit = {
      val ts = s(i); val td = d(i)
      s(i) = s(j); d(i) = d(j); s(j) = ts; d(j) = td
    }

    def add(sc: Long, id0: Long): Unit =
      if (n < cap) { // grow phase: insert + sift up (max-heap: parent >= child)
        var i = n
        s(i) = sc; d(i) = id0; n += 1
        while (i > 0 && gt(s(i), d(i), s((i - 1) / 2), d((i - 1) / 2))) {
          swap(i, (i - 1) / 2)
          i = (i - 1) / 2
        }
      } else if (gt(s(0), d(0), sc, id0)) { // smaller than the kept max: replace root
        s(0) = sc; d(0) = id0
        var i = 0
        var done = false
        while (!done) { // sift down: swap with the larger child while it beats us
          val l = 2 * i + 1; val r = 2 * i + 2
          var m = i
          if (l < n && gt(s(l), d(l), s(m), d(m))) m = l
          if (r < n && gt(s(r), d(r), s(m), d(m))) m = r
          if (m == i) done = true
          else { swap(i, m); i = m }
        }
      }
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[TopKMin].getName, "topk_min")
}
