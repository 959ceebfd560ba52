package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for minhash stage costs (kept for future rounds). */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.dedup.Dedup
    val base = docs.select(col("doc_id").as("id"), col("text"))
      .withColumn("sh", graft.plans.ShingleHashes(
        graft.text.TextFunctions.wsTokens(graft.text.TextFunctions.normalize(col("text"))), 3))
      .withColumn("sig", graft.plans.MinHashSignature(col("sh"), 32))
      .drop("text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("base (shingle+sig)") { base.count() }
    val banded = base.select(col("id"),
        explode(Dedup.lshBands(col("sig"), 8, 4)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val buckets = banded.groupBy(col("band"), col("bh"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, 1000))
    time("buckets") { println("  n_buckets=" + buckets.count()) }
    val pairs = buckets
      .select(explode(col("ids")).as("idA"), col("ids"))
      .select(col("idA"), explode(col("ids")).as("idB"))
      .filter(col("idA") < col("idB"))
      .dropDuplicates("idA", "idB")
    time("candidate pairs") { println("  n_pairs=" + pairs.count()) }
    val shA = base.select(col("id").as("idA"), col("sh").as("shA"))
    val shB = base.select(col("id").as("idB"), col("sh").as("shB"))
    val out = pairs.join(shA, "idA").join(shB, "idB")
      .withColumn("jaccard", Dedup.jaccard(col("shA"), col("shB")))
      .filter(col("jaccard") >= 0.5)
    time("jaccard verify") { println("  n_out=" + out.count()) }
    spark.stop()
  }
}
