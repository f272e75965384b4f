package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: full MinHash signature in ONE pass.
  *
  * Input: ARRAY<BIGINT> of pre-reduced shingle hashes (h ∈ [0, p)).
  * Output: ARRAY<BIGINT> of `a.length` slots, slot i =
  * min over h of (a(i)·h + b(i)) mod p, or p (sentinel) when the input
  * is empty — exactly the composed
  * `array(coalesce(array_min(transform(hs, ...)), p), ...)` it replaces,
  * which traversed the hash array once per slot and allocated a
  * transformed copy each time (32 interpreted walks per row).
  *
  * The universal-hash constants are case-class fields, so they
  * participate in plan equality and are baked into the generated code's
  * referenced state.
  */
case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
  extends UnaryExpression {

  require(a.length == b.length, "a/b constant vectors must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT>, got ${other.simpleString}")
    }

  private val k = a.length

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(k)(p)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("minhashA", a.toArray, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", b.toArray, "long[]")
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${p}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($aRef[$j] * $h + $bRef[$j]) % ${p}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSignature].getName, "minhash_sig")
}
