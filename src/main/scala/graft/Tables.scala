package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated TPC-H-ish parquet tables from an sf dir.
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings (see TESTDATA.md). Reads are lazy Catalyst scans;
  * column pruning and predicate pushdown reach the parquet reader, so a
  * single shared load per (session, dir) is all the caching we need.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** All tables as a name -> DataFrame map (plans only, nothing is read). */
  def all(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, sfDir, n)).toMap
}
