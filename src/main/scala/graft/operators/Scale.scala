package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities for the 100 TB case: skew salting, co-located
  * persistence, and explosion guards. These are the knobs the reference
  * never needed (single shared-memory node) but that decide whether a
  * plan survives a 1000-executor shuffle.
  */
object Scale {

  /** Salted join for skewed keys: the skewed (large) side gets a random
    * salt in [0, salts); the small side is replicated `salts` times via
    * explode. Restores a uniform shuffle at the cost of `salts`× the
    * small side — use for power-law keys where AQE skew-split isn't
    * enough. Salt comes from a hash of all columns (deterministic), not
    * rand(), so retries/speculative tasks agree.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, on: Seq[String],
                 salts: Int, how: String = "inner"): DataFrame = {
    // right/full would emit `salts` copies of unmatched small-side rows
    require(how == "inner" || how == "left",
      s"saltedJoin supports inner/left, got $how")
    val saltCol = "_graft_salt"
    val l = large.withColumn(saltCol,
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val s = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(s, on :+ saltCol, how).drop(saltCol)
  }

  /** Persist a table partitioned+sorted by key — the at-rest form of
    * setkey(): later scans of `path` joined/grouped on `keys` avoid a
    * full shuffle via partition pruning on the key prefix.
    */
  def writeKeyed(df: DataFrame, path: String, keys: Seq[String],
                 numPartitions: Int = 0): Unit = {
    val repart =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, keys.map(col): _*)
      else df.repartitionByRange(keys.map(col): _*)
    repart.sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Hive-style partitioned sink for low-cardinality keys (partition
    * pruning on read = the reference's keyed binary-search subset).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** datatable.join.many / allow.cartesian analog — see
    * [[Joins.cartesianGuard]]; re-exported here as the scale-guard
    * surface.
    */
  def joinManyGuard(x: DataFrame, i: DataFrame, on: Seq[String], maxRows: Long): Unit =
    Joins.cartesianGuard(x, i, on, maxRows)
}
