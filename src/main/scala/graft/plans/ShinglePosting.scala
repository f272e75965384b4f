package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, IntegerType, LongType, ShortType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst `Generator` (UDTF): `shingle_posting(tokens, width)`
  * emits one row `(shingle STRING, n_shingles INT)` per DISTINCT
  * width-word shingle of a token array, with the distinct count carried
  * on every row.
  *
  * This is the engine's worked table-function extension point — the
  * Spark shape of the reference's map/emit stage (`maprdeuce.cpp:232-255`
  * walks each tokenized line and emits one `"word 1"` record per token;
  * a `Generator` is exactly that one-input-row → N-output-rows contract,
  * SURVEY.md §2.2). Registered by name in [[GraftExtensions]] so
  * `SELECT shingle_posting(w, 3) FROM ...` works; `Dedup.postings` uses
  * it through the Column façade.
  *
  * Semantics are IDENTICAL to the composed form it replaces
  * (`explode(array_distinct(zip_with-trigrams))` + `size(...)`):
  * first-occurrence order, windows containing a null token dropped
  * (concat-null propagation in the composed form), `< width` tokens →
  * zero rows. The win is one fused pass: the composed plan materializes
  * the window array, a distinct array, and a size column before
  * exploding; this emits postings straight off the token array with one
  * hash set, and never builds the intermediate arrays at all.
  *
  * Interpreted `eval` only (custom generators sit outside whole-stage
  * codegen — `GenerateExec` codegens solely the built-in collection
  * generators); the per-row work is a tight loop over `UTF8String`s, and
  * the surrounding stages still codegen on both sides of the Generate.
  */
case class ShinglePosting(tokens: Expression, width: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, width)
  override def prettyName: String = "shingle_posting"

  override def elementSchema: StructType = new StructType()
    .add("shingle", StringType, nullable = false)
    .add("n_shingles", IntegerType, nullable = false)

  // SQL-registered (GraftExtensions): misuse fails at analysis time. Any
  // integral width literal is accepted (so `CAST(3 AS BIGINT)` analyzes);
  // the token array stays strictly ARRAY<STRING> — a silent element cast
  // would hide a caller bug, not fix one.
  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, width.dataType) match {
      case (ArrayType(StringType, _), ByteType | ShortType | IntegerType | LongType) =>
        if (!width.foldable) TypeCheckResult.TypeCheckFailure(
          s"$prettyName width must be a constant")
        else {
          val v = width.eval()
          if (v == null || v.asInstanceOf[Number].longValue < 1L ||
              v.asInstanceOf[Number].longValue > Int.MaxValue.toLong)
            TypeCheckResult.TypeCheckFailure(s"$prettyName width must be >= 1")
          else TypeCheckResult.TypeCheckSuccess
        }
      case (t, w) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<STRING>, INT), got (${t.simpleString}, ${w.simpleString})")
    }

  private lazy val w: Int = width.eval().asInstanceOf[Number].intValue
  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val m = arr.numElements()
    if (m < w) return Iterator.empty
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= m - w) {
      val parts = new Array[UTF8String](2 * w - 1)
      var ok = true
      var j = 0
      while (ok && j < w) {
        val t = arr.getUTF8String(i + j)
        if (t == null) ok = false
        else {
          if (j > 0) parts(2 * j - 1) = space
          parts(2 * j) = t
        }
        j += 1
      }
      if (ok) seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    val n = seen.size()
    val out = new Array[InternalRow](n)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = InternalRow(it.next(), n); k += 1 }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShinglePosting =
    copy(tokens = newChildren(0), width = newChildren(1))
}

object ShinglePosting {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[ShinglePosting].getName, "shingle_posting")
}
