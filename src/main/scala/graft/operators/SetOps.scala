package graft.operators

import org.apache.spark.sql.DataFrame

/** Set operations (R/setops.R, SURVEY.md §2.7). The reference builds
  * these on join/duplicated kernels; Spark has them as first-class plan
  * nodes (Union/Intersect/Except with all= variants), which Catalyst
  * plans as partial-aggregated shuffles.
  */
object SetOps {

  /** funion(all=FALSE) = set union; all=TRUE = bag concat (R/setops.R:91).
    * Matches by position like the reference; use unionByName upstream for
    * name matching.
    */
  def funion(x: DataFrame, y: DataFrame, all: Boolean = false): DataFrame =
    if (all) x.union(y) else x.union(y).distinct()

  /** fintersect (R/setops.R:60); all=TRUE keeps multiset multiplicity. */
  def fintersect(x: DataFrame, y: DataFrame, all: Boolean = false): DataFrame =
    if (all) x.intersectAll(y) else x.intersect(y)

  /** fsetdiff (R/setops.R:76). */
  def fsetdiff(x: DataFrame, y: DataFrame, all: Boolean = false): DataFrame =
    if (all) x.exceptAll(y) else x.except(y)

  /** fsetequal (R/setops.R:98): same row set (ignoring duplicates). */
  def fsetequal(x: DataFrame, y: DataFrame): Boolean =
    x.except(y).isEmpty && y.except(x).isEmpty
}
