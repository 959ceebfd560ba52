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
    e.injectFunction(GraftExtensions.dotDesc)
    e.injectFunction(GraftExtensions.simhashDesc)
    e.injectFunction(GraftExtensions.tokenSetCountDesc)
    e.injectFunction(GraftExtensions.roundMantissaDesc)
    e.injectFunction(GraftExtensions.unicodeNormalizeDesc)
    e.injectFunction(GraftExtensions.dtoaDesc)
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

  private def stringsArg(e: Expression, name: String): Seq[String] = e match {
    case Literal(s, org.apache.spark.sql.types.StringType) if s != null =>
      s.toString.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    case other => throw new IllegalArgumentException(
      s"$name must be a comma-separated string literal, got $other")
  }

  val dotDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (args: Seq[Expression]) => DotProduct(args.head, args(1)))

  val simhashDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[PortableSimHash].getName, "graft_simhash"),
    (args: Seq[Expression]) => PortableSimHash(args.head))

  val tokenSetCountDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_token_set_count"),
    new ExpressionInfo(classOf[TokenSetCount].getName, "graft_token_set_count"),
    (args: Seq[Expression]) =>
      TokenSetCount(args.head, stringsArg(args(1), "words")))

  val roundMantissaDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_round_mantissa"),
    new ExpressionInfo(classOf[RoundMantissa].getName, "graft_round_mantissa"),
    (args: Seq[Expression]) => RoundMantissa(args.head, intArg(args(1), "bytes")))

  private def stringArg(e: Expression, name: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$name must be a string literal, got $other")
  }

  val unicodeNormalizeDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_normalize"),
    new ExpressionInfo(classOf[UnicodeNormalize].getName, "graft_normalize"),
    (args: Seq[Expression]) =>
      UnicodeNormalize(args.head, stringArg(args(1), "form")))

  val dtoaDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dtoa"),
    new ExpressionInfo(classOf[graft.sources.DtoaExpr].getName, "graft_dtoa"),
    (args: Seq[Expression]) =>
      graft.sources.DtoaExpr(castDouble(args.head),
        if (args.length > 1) intArg(args(1), "scipen") else 0))

  // SQL callers pass any numeric type; the formatter evals doubles
  private def castDouble(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.DoubleType)

  private val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_shingle_hashes" ->
      ((args: Seq[Expression]) => ShingleHashes(args.head, intArg(args(1), "k"))),
    "graft_minhash" ->
      ((args: Seq[Expression]) => MinHashSignature(args.head, intArg(args(1), "numHashes"))),
    "graft_dot" -> ((args: Seq[Expression]) => DotProduct(args.head, args(1))),
    "graft_simhash" -> ((args: Seq[Expression]) => PortableSimHash(args.head)),
    "graft_token_set_count" ->
      ((args: Seq[Expression]) => TokenSetCount(args.head, stringsArg(args(1), "words"))),
    "graft_round_mantissa" ->
      ((args: Seq[Expression]) => RoundMantissa(args.head, intArg(args(1), "bytes"))),
    "graft_normalize" ->
      ((args: Seq[Expression]) => UnicodeNormalize(args.head, stringArg(args(1), "form"))),
    // fwrite's 15-s.f. float text form (sources/Dtoa) for spark.sql
    // users; optional second arg = scipen
    "graft_dtoa" ->
      ((args: Seq[Expression]) => graft.sources.DtoaExpr(castDouble(args.head),
        if (args.length > 1) intArg(args(1), "scipen") else 0)))

  /** Register on an already-built session (e.g. the driver's). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
