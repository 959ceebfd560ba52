package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dense-vector kernels (custom-Expression tier, SURVEY.md §4.2).
  *
  * The HOF formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is
  * interpreted per ELEMENT (lambda dispatch per multiply); this kernel
  * is one JVM call per ROW with a tight primitive loop — the same
  * left-to-right summation order, so results are bit-identical to the
  * HOF form (and to DuckDB's sequential list_dot_product, which the
  * ANN oracles rely on).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  // Real codegen (not CodegenFallback): one fallback expression demotes
  // its ENTIRE stage out of whole-stage codegen, and the dot product
  // sits inside every cosine of the ANN/semdedup hot paths.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(b)))
}

/** Count of tokens (lowercased) present in a static word set — replaces
  * the interpreted `size(filter(toks, t => lower(t).isin(words)))`
  * formulation (per-element lambda dispatch × |words| isin scan) with
  * one hash-set probe per token. Used by the stopword-ratio and
  * language-ID paths over every document at 100 TB.
  */
case class TokenSetCount(child: org.apache.spark.sql.catalyst.expressions.Expression,
                         words: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(w => s.add(w))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null && wordSet.contains(s.toString.toLowerCase(java.util.Locale.ROOT))) count += 1
      i += 1
    }
    count
  }

  // Real codegen — the set probe runs per token per document in the
  // quality/langid paths; a fallback here would demote whole stages.
  // The prebuilt HashSet ships into generated code as a reference obj.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // raw type: the generated code compiles under Janino, which has no
    // generics support
    val setRef = ctx.addReferenceObj("graftWordSet", wordSet,
      "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val tok = ctx.freshName("tok")
      s"""
         |int $n = $arr.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $tok = $arr.getUTF8String($i);
         |    if ($tok != null && $setRef.contains(
         |        $tok.toString().toLowerCase(java.util.Locale.ROOT))) $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): TokenSetCount =
    copy(child = newChild)
}

object TokenSetCount {
  def apply(tokens: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(TokenSetCount(GraftSqlBridge.expression(tokens), words))
}

/** Nearest-centroid argmax by cosine: the assignment kernel of the
  * IVF / kmeans / PQ / SemDeDup paths. Reproduces EXACTLY the HOF
  * formulation it replaces (`aggregate` over a centroid struct array
  * with `when(s > acc.sim, ...)`): cosine = dot/(|x||c|) with the
  * zero-norm → 0.0 rule, dot over the shorter prefix, norms over each
  * full vector, STRICT > so ties keep the earliest centroid, and an
  * empty centroid list is refused upstream. One JVM call per row with
  * precomputed centroid norms, instead of per-centroid Catalyst struct
  * churn under the interpreted HOF — same values, so the Lloyd-
  * assignment SQL oracles stay bit-identical.
  */
case class NearestCentroid(child: Expression, cents: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val centNorm: Array[Double] =
    centArr.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val nx = x.numElements()
    var xs = 0.0
    var i = 0
    while (i < nx) { val v = x.getDouble(i); xs += v * v; i += 1 }
    val na = math.sqrt(xs)
    var bestId = -1
    var bestSim = -2.0
    var c = 0
    while (c < centArr.length) {
      val cent = centArr(c)
      val n = math.min(nx, cent.length)
      var dot = 0.0
      i = 0
      while (i < n) { dot += x.getDouble(i) * cent(i); i += 1 }
      val nb = centNorm(c)
      val sim = if (na > 0 && nb > 0) dot / (na * nb) else 0.0
      if (sim > bestSim) { bestSim = sim; bestId = c }
      c += 1
    }
    bestId
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val centsRef = ctx.addReferenceObj("graftCents", centArr, "double[][]")
    val normsRef = ctx.addReferenceObj("graftCentNorms", centNorm, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val nx = ctx.freshName("nx"); val xs = ctx.freshName("xs")
      val na = ctx.freshName("na"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val dot = ctx.freshName("dot")
      val n = ctx.freshName("n"); val sim = ctx.freshName("sim")
      val bestId = ctx.freshName("bestId"); val bestSim = ctx.freshName("bestSim")
      val cent = ctx.freshName("cent"); val v = ctx.freshName("v")
      s"""
         |int $nx = $x.numElements();
         |double $xs = 0.0;
         |for (int $i = 0; $i < $nx; $i++) {
         |  double $v = $x.getDouble($i); $xs += $v * $v;
         |}
         |double $na = java.lang.Math.sqrt($xs);
         |int $bestId = -1;
         |double $bestSim = -2.0;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cent = $centsRef[$c];
         |  int $n = java.lang.Math.min($nx, $cent.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $dot += $x.getDouble($i) * $cent[$i]; }
         |  double $sim = ($na > 0 && $normsRef[$c] > 0) ? $dot / ($na * $normsRef[$c]) : 0.0;
         |  if ($sim > $bestSim) { $bestSim = $sim; $bestId = $c; }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(vec: Column, cents: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(NearestCentroid(GraftSqlBridge.expression(vec), cents))
}
