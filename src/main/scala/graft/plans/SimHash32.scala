package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: 32-bit SimHash fingerprint from an
  * ARRAY<BIGINT> of per-token hashes.
  *
  * Semantics (identical to the composed form it replaces and to the
  * DuckDB oracle): for each bit j∈[0,32), vote = 2·|{h: bit j of h set}|
  * − n; fingerprint bit j is set iff vote > 0 (ties → 0).
  *
  * The composed spelling (`aggregate(transform(sequence(0,31), j ->
  * ...filter(hs, ...)...))`) walks the hash array 32 times through
  * interpreted higher-order lambdas; this kernel is ONE pass with 32
  * counters, codegen'd.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  // SQL-registered (GraftExtensions): misuse fails at analysis time.
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 32) { counts(j) += ((h >>> j) & 1L).toInt; j += 1 }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) { if (2 * counts(j) - n > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val fp = ctx.freshName("fp")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[32];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 32; $j++) { $counts[$j] += (int)(($h >>> $j) & 1L); }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 32; $j++) {
         |  if (2 * $counts[$j] - $n > 0) $fp |= (1L << $j);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  val info: ExpressionInfo = new ExpressionInfo(classOf[SimHash32].getName, "simhash32")
}
