package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object KeyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.01"
    def build() = graft.SparkEntry.queries("q_shift_global")(spark, sfDir)
    graft.Fits.clearAll()
    val n0 = graft.operators.GlobalOrdered.fitScans.get()
    build().count()
    val n1 = graft.operators.GlobalOrdered.fitScans.get()
    build().count()
    val n2 = graft.operators.GlobalOrdered.fitScans.get()
    build().count()
    val n3 = graft.operators.GlobalOrdered.fitScans.get()
    println(s"[keyprobe] fit scans: cold=${n1 - n0} warm1=${n2 - n1} warm2=${n3 - n2}")
    // semanticHash stability of the table and of one shift output
    val t1 = graft.Tables.load(spark, sfDir, "orders")
    val t2 = graft.Tables.load(spark, sfDir, "orders")
    println(s"[keyprobe] table plans same object: ${t1 eq t2}")
    val s1 = graft.operators.GlobalOrdered.shift(t1, col("o_totalprice"), 1,
      col("o_orderkey"), "p", lit(0.0))
    val s2 = graft.operators.GlobalOrdered.shift(t1, col("o_totalprice"), 1,
      col("o_orderkey"), "p", lit(0.0))
    println(s"[keyprobe] shift out hash1=${s1.queryExecution.analyzed.semanticHash()} hash2=${s2.queryExecution.analyzed.semanticHash()}")
    spark.stop()
  }
}
