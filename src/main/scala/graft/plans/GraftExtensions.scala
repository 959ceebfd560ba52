package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SparkSessionExtensions wiring: registers graft's custom expressions
  * as SQL functions so `spark.sql("SELECT graft_minhash(...)")` works —
  * the extension-point surface (SURVEY.md §4.2) custom strategies/rules
  * would also plug into.
  *
  * Use either at build time:
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or post-hoc on an existing session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.shingleHashesDesc)
    e.injectFunction(GraftExtensions.minhashDesc)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  val shingleHashesDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
    (args: Seq[Expression]) => ShingleHashes(args.head, intArg(args(1), "k")))

  val minhashDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
    (args: Seq[Expression]) => MinHashSignature(args.head, intArg(args(1), "numHashes")))

  /** Register on an already-built session (e.g. the driver's). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingle_hashes",
      args => ShingleHashes(args.head, intArg(args(1), "k")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      args => MinHashSignature(args.head, intArg(args(1), "numHashes")), "built-in")
  }
}
