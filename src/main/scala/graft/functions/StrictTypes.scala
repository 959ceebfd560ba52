package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Opt-in strict type discipline (round-3 item 5).
  *
  * Catalyst silently coerces mixed types (int branch + string branch,
  * string key joined to int key); the reference ERRORS instead —
  * R/bmerge.R:93-160's coercion matrix for joins, src/fifelse.c:52,267
  * for conditional branches. A migrating user relies on those errors to
  * catch real bugs, so `strict` surfaces reproduce them: same class ok,
  * integer↔double ok (the reference coerces), anything crossing
  * character/logical/temporal boundaries throws with the reference's
  * message shape.
  */
object StrictTypes {

  /** bmerge's mergeType classes (R/bmerge.R:1-8), mapped to Spark. */
  private def cls(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType   => "integer"
    case FloatType | DoubleType                          => "double"
    case _: DecimalType                                  => "double"
    case StringType                                      => "character"
    case BooleanType                                     => "logical"
    case DateType | TimestampType | TimestampNTZType     => "temporal"
    case other                                           => other.simpleString
  }

  private def compatible(a: DataType, b: DataType): Boolean = {
    val (ca, cb) = (cls(a), cls(b))
    // integer↔double is the ONE silent coercion the reference performs
    // (R/bmerge.R:120-160); everything else cross-class errors
    ca == cb || Set(ca, cb) == Set("integer", "double")
  }

  /** merge/bmerge join-key check (R/bmerge.R:109): equal-named keys. */
  def checkJoinTypes(x: DataFrame, i: DataFrame, on: Seq[String]): Unit =
    checkJoinTypePairs(x, i, on.map(c => (c, c)))

  /** As [[checkJoinTypes]] with differently-named key pairs (x, i). */
  def checkJoinTypePairs(x: DataFrame, i: DataFrame,
                         on: Seq[(String, String)]): Unit =
    on.foreach { case (xc, ic) =>
      val xt = x.schema(xc).dataType
      val it = i.schema(ic).dataType
      if (!compatible(xt, it))
        throw new IllegalArgumentException(
          s"Incompatible join types: $xc (${xt.simpleString}) and " +
            s"$ic (${it.simpleString})")
    }

  private[graft] def typeOf(df: DataFrame, c: Column): DataType = {
    // fast path: a RESOLVED expression (a literal, or a column plucked
    // from an analyzed frame) already knows its type — df.select(c)
    // re-runs the full analyzer over df's tree only to read one field
    // (the visible per-rep driver cost of shiftDF's Date/POSIXct guard).
    // A resolved expression whose ATTRIBUTES are not all in df's output
    // is a caller bug the old df.select(c) failed FAST on (column
    // plucked from a different frame) — fall through to the analyzer so
    // it still errors instead of silently answering a type from the
    // wrong frame (ADVICE r21 low).
    val e = org.apache.spark.sql.GraftSqlBridge.eagerExpression(c)
    lazy val outIds = df.queryExecution.analyzed.outputSet
    if (e.resolved && e.references.forall(outIds.contains)) e.dataType
    else if (e.resolved) df.select(c).schema.head.dataType
    else {
      // simple named column: resolve against the analyzed plan's output
      // by name (exactly what the analyzer would bind it to)
      val byName = e match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if u.nameParts.length == 1 =>
          val res = df.queryExecution.analyzed.output
            .filter(a => df.sparkSession.sessionState.conf.resolver(
              a.name, u.nameParts.head))
          if (res.length == 1) Some(res.head.dataType) else None
        case _ => None
      }
      byName.getOrElse(df.select(c).schema.head.dataType)
    }
  }

  /** fifelse with the reference's type discipline (src/fifelse.c:11,52):
    * test must be boolean; yes/no/na must share ONE exact type (even
    * int vs double errors — the reference does not promote here). A null
    * literal `na` is the untyped NA and always allowed.
    */
  /** The reference's int↔real PROMOTION exception (src/fifelse.c:40-58;
    * tests.Rraw 2188.01/.02): fifelse — unlike fcase — coerces integer
    * arguments up to double when any of yes/no/na is double, and errors
    * only on mixes outside {integer, double} (2188.13). Spark integrals
    * (byte..long) play INTSXP, float/double play REALSXP.
    */
  private def intLike(t: org.apache.spark.sql.types.DataType): Boolean =
    t == ByteType || t == ShortType || t == IntegerType || t == LongType
  private def realLike(t: org.apache.spark.sql.types.DataType): Boolean =
    t == FloatType || t == DoubleType

  def fifelseStrict(df: DataFrame, test: Column, yes: Column, no: Column,
                    na: Column = lit(null)): Column = {
    if (typeOf(df, test) != BooleanType)
      throw new IllegalArgumentException("Argument 'test' must be logical.")
    val (ty, tn, tna) = (typeOf(df, yes), typeOf(df, no), typeOf(df, na))
    def promotes(a: org.apache.spark.sql.types.DataType,
                 b: org.apache.spark.sql.types.DataType): Boolean =
      a == b || (intLike(a) || realLike(a)) && (intLike(b) || realLike(b))
    if (!promotes(ty, tn))
      throw new IllegalArgumentException(
        s"'no' is of type ${tn.simpleString} but 'yes' is ${ty.simpleString}. " +
          "Please make all arguments have the same type.")
    if (tna != NullType && !promotes(tna, ty))
      throw new IllegalArgumentException(
        s"'na' is of type ${tna.simpleString} but 'no' is ${tn.simpleString}. " +
          "Please make all arguments have the same type.")
    // promote like the reference: any real side lifts everything to
    // double; int-width mixes lift to the widest integral
    val all = Seq(ty, tn) ++ (if (tna == NullType) Nil else Seq(tna))
    val target: Option[org.apache.spark.sql.types.DataType] =
      if (all.distinct.size <= 1) None
      else if (all.exists(realLike)) Some(DoubleType)
      else Some(all.maxBy {
        case ByteType => 1
        case ShortType => 2
        case IntegerType => 3
        case _ => 4 // LongType
      })
    target match {
      case Some(t) =>
        Funcs.fifelse(test, yes.cast(t), no.cast(t),
          if (tna == NullType) na else na.cast(t))
      case None => Funcs.fifelse(test, yes, no, na)
    }
  }

  /** fcase with the reference's type discipline (src/fifelse.c:238,267):
    * every condition boolean, every branch value (and non-null default)
    * the same exact type as the first.
    */
  def fcaseStrict(df: DataFrame, branches: Seq[(Column, Column)],
                  default: Column = lit(null)): Column = {
    require(branches.nonEmpty, "fcase needs at least one (condition, value)")
    branches.zipWithIndex.foreach { case ((c, _), i) =>
      val t = typeOf(df, c)
      if (t != BooleanType)
        throw new IllegalArgumentException(
          s"Argument #${2 * i + 1} must be logical but was of type ${t.simpleString}.")
    }
    // fcase is STRICT — unlike fifelse it does NOT promote int↔double
    // (tests.Rraw 2127.21 errors on exactly that mix); messages mirror
    // src/fifelse.c:269 (numbered argument) and :277 ('default').
    val t0 = typeOf(df, branches.head._2)
    branches.zipWithIndex.foreach { case ((_, v), i) =>
      val t = typeOf(df, v)
      if (t != t0)
        throw new IllegalArgumentException(
          s"Argument #${2 * i + 2} is of type ${t.simpleString}, however " +
            s"argument #2 is of type ${t0.simpleString}. Please make sure " +
            "all output values have the same type.")
    }
    val td = typeOf(df, default)
    if (td != NullType && td != t0)
      throw new IllegalArgumentException(
        s"Resulting value is of type ${t0.simpleString} but 'default' is of " +
          s"type ${td.simpleString}. Please make sure that both arguments " +
          "have the same type.")
    Funcs.fcase(branches, default)
  }
}
