package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The operator-inventory queries (SURVEY.md §2) and their DuckDB oracles.
  *
  * Conventions:
  *  - every double-typed aggregate is `round(_, 3)`-ed on BOTH sides so
  *    summation-order differences between engines cannot flip the hash;
  *  - window/ordered queries always order by a unique key (l_orderkey,
  *    l_linenumber) / event_id so ties cannot make results nondeterministic;
  *  - column names are identical between Spark plan and oracle SQL.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")

  /** TPC-H Q1 shape — the SURVEY.md §7.2 minimum end-to-end slice. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 3).as("sum_qty"),
        round(sum("l_extendedprice"), 3).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 3).as("sum_disc_price"),
        round(avg("l_quantity"), 3).as("avg_qty"),
        round(avg("l_discount"), 3).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val all: Map[String, Q] = Map(
    "q1_agg" -> (q1Agg _)
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 3) AS sum_qty,
        |  round(sum(l_extendedprice), 3) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 3) AS sum_disc_price,
        |  round(avg(l_quantity), 3) AS avg_qty,
        |  round(avg(l_discount), 3) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
