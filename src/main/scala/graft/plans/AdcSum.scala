package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, ShortType}

/** Native Catalyst expression: product-quantization asymmetric-distance
  * lookup-sum — the per-row hot loop of the PQ ADC scan.
  *
  * `adc_sum(codes: ARRAY<BIGINT>, tab: ARRAY<BIGINT>, stride) -> BIGINT`
  * = Σ_m tab[m·stride + codes[m]] (0-based), i.e. each subspace's code
  * indexes its slice of one flattened per-query distance table.
  *
  * Replaces the composed HOF form
  * `aggregate(zip_with(codes, sequence(0, M-1), (c, m) ->
  * element_at(mp, m·K + c)), 0L, +)` — which runs INTERPRETED per
  * (corpus row × query), allocating a zipped array and probing an
  * ArrayBasedMapData per subspace — with one allocation-free loop in
  * whole-stage codegen over a dense array. The fold is exact integer
  * arithmetic either way (the table entries are BIGINT-quantized
  * distances), so swapping the evaluation engine cannot change results
  * — pinned by the unchanged q_ann_pq oracle hash and the
  * kernel-vs-composed equality case in ExpressionsSpec.
  *
  * Null/OOB semantics: a null code, an index outside the table, or a
  * null table entry yields NULL (codes are assigned from the same
  * surviving-cell codebook the table is built from, so a NULL surfaces
  * a construction bug instead of silently scoring with a hole).
  */
case class AdcSum(codes: Expression, tab: Expression, stride: Expression)
  extends TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = tab
  override def third: Expression = stride

  override def dataType: DataType = LongType
  // NULL on non-null input (OOB index / null slot) — must not inherit
  // children's nullability (see ArgMinCell)
  override def nullable: Boolean = true
  override def prettyName: String = "adc_sum"

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, tab.dataType, stride.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _),
            ByteType | ShortType | IntegerType | LongType) =>
        if (!stride.foldable) TypeCheckResult.TypeCheckFailure(
          s"$prettyName stride must be a constant")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, ARRAY<BIGINT>, INT), got " +
          s"(${codes.dataType.simpleString}, ${tab.dataType.simpleString}, " +
          s"${stride.dataType.simpleString})")
    }

  private lazy val strideVal: Long =
    stride.eval(null).asInstanceOf[Number].longValue()

  override def nullSafeEval(l: Any, r: Any, s: Any): Any = {
    val cs = l.asInstanceOf[ArrayData]
    val t = r.asInstanceOf[ArrayData]
    val m = cs.numElements()
    val tn = t.numElements()
    var sum = 0L
    var i = 0
    while (i < m) {
      if (cs.isNullAt(i)) return null
      val k = i.toLong * strideVal + cs.getLong(i)
      if (k < 0L || k >= tn || t.isNullAt(k.toInt)) return null
      sum += t.getLong(k.toInt)
      i += 1
    }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cs, t, _) => {
      val m = ctx.freshName("m"); val tn = ctx.freshName("tn")
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val sum = ctx.freshName("sum"); val bad = ctx.freshName("bad")
      s"""
         |int $m = $cs.numElements();
         |int $tn = $t.numElements();
         |long $sum = 0L; boolean $bad = false;
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($cs.isNullAt($i)) { $bad = true; break; }
         |  long $k = (long)$i * ${strideVal}L + $cs.getLong($i);
         |  if ($k < 0L || $k >= $tn || $t.isNullAt((int)$k)) { $bad = true; break; }
         |  $sum += $t.getLong((int)$k);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): AdcSum =
    copy(codes = newFirst, tab = newSecond, stride = newThird)
}

object AdcSum {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[AdcSum].getName, "adc_sum")
}
