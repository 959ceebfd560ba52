package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in auto-indexing (man/datatable-optimize.Rd:97-105): the Nth
  * equality filter on the same unindexed column registers a secondary
  * index that the same and later filters route through (round-3 item 2).
  */
class AutoIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def routed(dt: DT): Boolean = {
    val plan = dt.df.queryExecution.executedPlan.toString
    plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage")
  }

  test("2nd equality filter on the same column auto-registers and routes") {
    graft.operators.Scale.clearIndexes()
    graft.operators.Scale.disableAutoIndex()
    val base = Tables.load(spark, SparkTestSession.sfDir, "customer")
    val dt = DT(base)
    graft.operators.Scale.enableAutoIndex(threshold = 2)
    try {
      val first = dt(col("c_nationkey") === 3)
      assert(!routed(first), "1st filter must not route (threshold=2)")
      assert(graft.operators.Scale.indexFor(base, Set("c_nationkey")).isEmpty,
        "index must not exist after 1 filter")

      val second = dt(col("c_nationkey") === 7)
      assert(graft.operators.Scale.indexFor(base, Set("c_nationkey")).nonEmpty,
        "2nd equality filter should have auto-registered the index")
      assert(routed(second),
        "the triggering filter itself should route through the new index")

      // same answer through the index as through the base scan
      assert(second.df.count() == base.filter(col("c_nationkey") === 7).count())

      // a later filter on the column keeps routing
      assert(routed(dt(col("c_nationkey") === 1)))
    } finally {
      graft.operators.Scale.disableAutoIndex()
      graft.operators.Scale.clearIndexes()
    }
  }

  test("non-equality filters never trigger auto-indexing") {
    graft.operators.Scale.clearIndexes()
    val base = Tables.load(spark, SparkTestSession.sfDir, "customer")
    val dt = DT(base)
    graft.operators.Scale.enableAutoIndex(threshold = 1)
    try {
      dt(col("c_acctbal") > 0)
      dt(col("c_acctbal") > 100)
      assert(graft.operators.Scale.indexFor(base, Set("c_acctbal")).isEmpty,
        "range predicates must not auto-index")
    } finally {
      graft.operators.Scale.disableAutoIndex()
      graft.operators.Scale.clearIndexes()
    }
  }

  test("off-switch: disabled means no counting, no registration") {
    graft.operators.Scale.clearIndexes()
    graft.operators.Scale.disableAutoIndex()
    val base = Tables.load(spark, SparkTestSession.sfDir, "nation")
    val dt = DT(base)
    dt(col("n_regionkey") === 1)
    dt(col("n_regionkey") === 2)
    dt(col("n_regionkey") === 3)
    assert(graft.operators.Scale.indexFor(base, Set("n_regionkey")).isEmpty)

    // re-enabling after the fact starts counting fresh
    graft.operators.Scale.enableAutoIndex(threshold = 1)
    try {
      dt(col("n_regionkey") === 1)
      assert(graft.operators.Scale.indexFor(base, Set("n_regionkey")).nonEmpty,
        "threshold=1 mirrors reference index-on-first-use")
    } finally {
      graft.operators.Scale.disableAutoIndex()
      graft.operators.Scale.clearIndexes()
    }
  }

  test("IN-literal filters count as equality triggers") {
    graft.operators.Scale.clearIndexes()
    val base = Tables.load(spark, SparkTestSession.sfDir, "nation")
    graft.operators.Scale.enableAutoIndex(threshold = 1)
    try {
      DT(base)(col("n_nationkey").isin(1, 2, 3))
      assert(graft.operators.Scale.indexFor(base, Set("n_nationkey")).nonEmpty,
        "%in% with literals should trigger (reference auto-indexes %in%)")
    } finally {
      graft.operators.Scale.disableAutoIndex()
      graft.operators.Scale.clearIndexes()
    }
  }
}
