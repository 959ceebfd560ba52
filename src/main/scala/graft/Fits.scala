package graft

/** One hook over every session-memoized fit/index in the engine.
  *
  * The operator memos (seed centroids, IVF fits, contamination gram
  * sets, bucketed dedup indexes, global-order bounds, CMS fits, domain
  * totals, auto-indexes) each expose their own targeted clear — this
  * aggregates them for callers that need a KNOWN-COLD engine: the
  * shuffle-byte budget spec ([[ShuffleBudgetSpec]] in test scope)
  * meters each flagship query's full plan volume including its
  * one-time fit builds, which is only deterministic if no earlier
  * query left a fit warm.
  *
  * Any NEW SessionMemo-backed fit must be added here; the budget
  * calibrator's fresh-vs-cleared cross-check
  * ([[BudgetCalibrate]]) catches an omission for the locked flagships
  * (a missed memo shows as a fresh-JVM volume that a cleared re-run
  * can't reproduce).
  */
object Fits {
  def clearAll(): Unit = {
    curate.Sampling.clearFits()
    curate.Contamination.clearFits()
    curate.Dsir.clearFits()
    operators.GlobalOrdered.clearFits()
    operators.Joins.clearFits()
    operators.Reshape.clearFits()
    operators.IndexCommit.evictReadPlans()
    operators.Scale.clearIndexes()
    dedup.Components.clearCheckpoints()
    dedup.Dedup.clearBases()
    sim.Similarity.clearFits()
    functions.Sketches.clearFits()
    QueriesTextSim.clearQueryFits()
  }
}
