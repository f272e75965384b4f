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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      CosineSimilarity.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      SortedIntersectCount.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectCount(children(0), children(1))))
  }
}
