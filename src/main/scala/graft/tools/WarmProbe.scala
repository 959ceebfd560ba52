package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures cold-vs-warm cost of a headline query: how much of the
  * per-query bench time is one-time codegen/JIT vs real execution.
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("q1_agg", "q_gforce", "q_join_inner")) {
      for (run <- 1 to 3) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(f"$name run$run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
