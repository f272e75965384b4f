package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** The engine's `SparkSessionExtensions` hook — the sanctioned public
  * extension point for custom expressions/rules/strategies. Install via
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  *
  * Currently injects:
  *  - `cosine_sim(ARRAY<DOUBLE>, ARRAY<DOUBLE>) -> DOUBLE` (fused
  *    codegen kernel, see CosineSimilarity);
  *  - `sorted_intersect_count(ARRAY<STRING>, ARRAY<STRING>) -> INT`
  *    (merge-scan kernel, see SortedIntersectCount).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"), CosineSimilarity.info,
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (FunctionIdentifier("sorted_intersect_count"), SortedIntersectCount.info,
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1))),
    (FunctionIdentifier("simhash32"), SimHash32.info,
      (children: Seq[Expression]) => SimHash32(children(0))),
  )

  /** Install the same functions on an already-built session (for hosts
    * that didn't pass `spark.sql.extensions` at build time). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, info, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, info, builder)
    }
}
