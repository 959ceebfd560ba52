package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines (extension): assign
  * documents to fixed-token-budget training sequences.
  *
  * The scalable formulation is cumulative-quotient packing: within a
  * shard, documents in a deterministic order accumulate token counts,
  * and `seq_id = floor(tokens_before / budget)`. Sequences average
  * exactly `budget` tokens; a document may straddle a boundary (chunk
  * first via TextFunctions.chunksFixed when strict caps matter). One
  * window per shard — no global ordering, no driver state, shards
  * pack independently across the cluster.
  */
object Packing {

  def packByBudget(df: DataFrame, tokenCount: Column, budget: Long,
                   shard: Seq[String], order: Seq[Column],
                   seqCol: String = "seq_id"): DataFrame = {
    require(budget > 0, s"packByBudget: budget must be positive, got $budget")
    require(shard.nonEmpty,
      "packByBudget needs shard columns: a single global packing order " +
        "would serialize the whole corpus through one partition")
    val w = Window.partitionBy(shard.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // LONG seq ids via exact decimal floor-division: a shard past
    // budget·2^31 tokens would wrap an int cast, and double division
    // loses exactness past 2^53 cumulative tokens — both silent
    // mis-assignments at the corpus scale this targets.
    df.withColumn(seqCol,
      floor(coalesce(sum(tokenCount).over(w), lit(0L)).cast("decimal(38,0)")
        / lit(budget)).cast("long"))
  }
}
