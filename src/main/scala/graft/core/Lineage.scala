package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage-cut helper for multi-consumer relations: `cut` is
  * `localCheckpoint()` (eager materialization, so a relation consumed
  * by several join branches is computed once rather than relying on
  * exchange reuse firing) — unless `GRAFT_NO_LINEAGE_CUT=1`, which
  * makes it the identity.
  *
  * The switch exists for ONE consumer: `tools.ExplainAudit`. An eager
  * localCheckpoint truncates every downstream plan to `Scan
  * ExistingRDD`, so PLANS.md could not show the part of the plan that
  * matters most for the sampled-truth contract — the
  * `pmod(h32(doc_id), M) = 0` predicate sitting on the scan before any
  * pair forms. With the cut disabled the audit sees the full
  * declarative plan (scans, pushed filters, the sample predicates) and
  * nothing executes at all. Iterative graph loops keep unconditional
  * checkpoints — their fixpoint count() gates would re-execute whole
  * lineages without them. */
object Lineage {
  private val disabled: Boolean =
    sys.env.get("GRAFT_NO_LINEAGE_CUT").contains("1")
  def cut(df: DataFrame): DataFrame =
    if (disabled) df else df.localCheckpoint()
}
