package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregated operator-inventory query registry (SURVEY.md §2).
  *
  * Every implemented operator registers (name, query, Option(oracleSql)).
  * Conventions shared by all entries:
  *  - double aggregates are `round(_, 3)`-ed identically on both sides so
  *    engine summation order can't flip the driver's hash compare;
  *  - ordered ops always use a unique tiebreaker (event_id /
  *    (l_orderkey, l_linenumber) / o_orderkey) — ties would otherwise be
  *    nondeterministic across engines;
  *  - oracle column names match the Spark plan's output names exactly.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame
  type Entry = (String, Q, Option[String])

  /** TPC-H Q1 shape — the SURVEY.md §7.2 minimum end-to-end slice. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 3).as("sum_qty"),
        round(sum("l_extendedprice"), 3).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 3).as("sum_disc_price"),
        round(avg("l_quantity"), 3).as("avg_qty"),
        round(avg("l_discount"), 3).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val q1Oracle =
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

  def entries: Seq[Entry] =
    Seq[Entry](("q1_agg", q1Agg _, Some(q1Oracle))) ++
      QueriesCore.entries ++
      QueriesJoins.entries ++
      QueriesWindows.entries ++
      QueriesReshapeSet.entries ++
      QueriesTextSim.entries

  lazy val all: Map[String, Q] =
    entries.map(e => e._1 -> e._2).toMap

  lazy val oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
