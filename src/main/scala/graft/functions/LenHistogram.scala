package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF — the `Aggregator[IN, BUF, OUT]` extension point
  * (SURVEY.md §2.2: the reference's reduce is a hard-coded sum; this is
  * the pluggable Spark-native equivalent, registered via
  * `functions.udaf`).
  *
  * Aggregates token-length arrays into an 8-bucket histogram
  * (bucket = clamp(len, 1, 8) - 1 — non-positive lengths land in bucket 0
  * instead of throwing, so the public extension point is safe on inputs
  * that skipped upstream empty-token filtering). All-integer math:
  * partial buffers merge by elementwise
  * add, which commutes — the result is identical under any partitioning
  * and task order, so a DuckDB oracle can hash-compare it exactly.
  *
  * Scale: the buffer is a fixed 8-long record per group — partial
  * aggregation (map-side combine) applies, shuffle volume is
  * O(groups × 8), never O(tokens).
  */
/** Product buffer: encodable with the stock product encoder (stays on
  * the Tungsten path — no kryo blob). */
case class Hist(counts: Seq[Long])

object LenHistogram extends Aggregator[Seq[Int], Hist, Seq[Long]] {
  val NumBuckets = 8

  def zero: Hist = Hist(Vector.fill(NumBuckets)(0L))

  def reduce(buf: Hist, lens: Seq[Int]): Hist = {
    if (lens == null) buf
    else {
      val c = buf.counts.toArray
      lens.foreach(l => c(math.min(math.max(l, 1), NumBuckets) - 1) += 1L)
      Hist(c.toVector)
    }
  }

  def merge(a: Hist, b: Hist): Hist =
    Hist(a.counts.zip(b.counts).map { case (x, y) => x + y })

  def finish(buf: Hist): Seq[Long] = buf.counts

  def bufferEncoder: Encoder[Hist] = Encoders.product[Hist]
  def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
