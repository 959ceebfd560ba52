package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** setindex(): secondary-index registry + filter routing (round-2 item
  * "real setindex" — VERDICT missing #7).
  */
class SetIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("setIndex routes covered filters to the cached sorted copy") {
    graft.operators.Scale.clearIndexes()
    val base = Tables.load(spark, SparkTestSession.sfDir, "customer")
    val dt = DT(base).setIndex("c_nationkey")

    assert(graft.operators.Scale.indexFor(base, Set("c_nationkey")).nonEmpty,
      "direct registry lookup failed — planKey mismatch")
    assert(org.apache.spark.sql.GraftSqlBridge
      .resolvedFilterRefs(base, col("c_nationkey") === 3).contains("c_nationkey"),
      "resolvedFilterRefs failed to extract the attribute")
    val routed = dt(col("c_nationkey") === 3)
    val plan = routed.df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"expected the filter to scan the cached index copy, plan:\n$plan")

    // same answer as the unindexed path
    val expected = base.filter(col("c_nationkey") === 3).count()
    assert(routed.df.count() == expected)

    // uncovered filter (different leading column) does NOT route
    val unrouted = dt(col("c_acctbal") > 0)
    assert(!unrouted.df.queryExecution.executedPlan.toString.contains("InMemoryTableScan") ||
      graft.operators.Scale.indexFor(base, Set("c_acctbal")).isEmpty)

    graft.operators.Scale.clearIndexes()
  }

  test("setIndex leaves the original table order and plan untouched") {
    graft.operators.Scale.clearIndexes()
    val base = Tables.load(spark, SparkTestSession.sfDir, "nation")
    val before = base.queryExecution.analyzed.semanticHash()
    val dt = DT(base).setIndex("n_regionkey")
    assert(dt.df.queryExecution.analyzed.semanticHash() == before)
    graft.operators.Scale.clearIndexes()
  }
}
