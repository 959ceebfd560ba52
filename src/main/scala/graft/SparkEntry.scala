package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one query here,
  * plus (when SQL-expressible) a DuckDB oracle in [[oracleSql]]. Column
  * names are aligned between the Spark plan and the oracle SQL because the
  * driver's comparator sorts columns by name before hashing.
  *
  * Floating-point aggregates are rounded identically on both sides
  * (`round(x, 3)`) so engine-specific summation order cannot flip the hash.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: filter -> groupBy -> GForce-style aggregates
    * (SURVEY.md §7.2 minimum slice).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}
