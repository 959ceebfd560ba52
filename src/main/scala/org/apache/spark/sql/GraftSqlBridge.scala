package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql package for the Column ↔ Expression conversion
  * (Spark 4 removed public Column.expr; the classic ExpressionUtils is
  * private[sql]). Needed by graft's custom Catalyst expressions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column → Expression conversion. [[expression]] may hand back
    * a lazy ColumnNodeExpression wrapper whose resolved/dataType answers
    * are meaningless until analysis touches it; this converts the node
    * outright so callers can pattern-match real catalyst classes
    * (Literal, UnresolvedAttribute, ...) driver-side without an
    * analyzer run.
    */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Re-root `df` on a copy of its analyzed plan whose NamedLambdaVariable
    * instances are FRESH (same exprId, new value slot). Catalyst lambda
    * variables carry their per-row value in a mutable field on the
    * expression INSTANCE, so two concurrent driver-side interpreted
    * evaluations of plans sharing a higher-order-function subtree (e.g.
    * parallel fits derived from one frame, each folded locally by
    * ConvertToLocalRelation) race on that slot and corrupt results.
    * The identity-memoized rewrite keeps each lambda's occurrences in
    * `arguments` and the function body pointing at ONE shared copy, so
    * resolution is preserved while instances are no longer shared
    * ACROSS the derived plans.
    */
  def isolateLambdas(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.NamedLambdaVariable
    val memo = new java.util.IdentityHashMap[NamedLambdaVariable, NamedLambdaVariable]()
    val plan = df.queryExecution.analyzed.transformAllExpressions {
      case l: NamedLambdaVariable =>
        var fresh = memo.get(l)
        if (fresh == null) {
          fresh = l.copy(value = new java.util.concurrent.atomic.AtomicReference[Any]())
          memo.put(l, fresh)
        }
        fresh
    }
    classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[classic.SparkSession], plan)
  }

  /** Drain the SparkListener event bus (private[spark]): listener
    * callbacks are ASYNC, so a metric accumulated by a listener (e.g.
    * graft.Bench's per-query shuffle-byte meter) is only consistent
    * after the bus empties. Returns false on timeout.
    */
  def flushListenerBus(sc: org.apache.spark.SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: Throwable => false }

  /** Column names referenced by a predicate, resolved against `df`
    * (an unresolved Spark-4 Column wraps ColumnNodes, not catalyst
    * expressions, so the names only exist after analysis). Used by the
    * secondary-index router to decide whether an index covers a filter.
    */
  def resolvedFilterRefs(df: DataFrame, cond: Column): Set[String] =
    df.filter(cond).queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.references.map(_.name).toSeq
    }.flatten.toSet


  /** Columns compared for EQUALITY with a literal in a predicate —
    * the trigger shape for auto-indexing (the reference auto-creates an
    * index only for `col == value` / `%in%` filters,
    * man/datatable-optimize.Rd:97-105).
    */
  def equalityFilterCols(df: DataFrame, cond: Column): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, In, InSet, Literal}
    df.filter(cond).queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case EqualTo(a: AttributeReference, _: Literal) => a.name
          case EqualTo(_: Literal, a: AttributeReference) => a.name
          case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) => a.name
          case InSet(a: AttributeReference, _) => a.name
        }
    }.flatten.distinct
  }

  /** (child, ascending, nullsFirst) of a sort Column — a plain column
    * (no SortOrder node) reads as ascending nulls-first, Spark's
    * `orderBy(col)` default. Used by the window DSL to extract the
    * range-bucketable key when auto-routing `by = Nil` ordered ops
    * through the GlobalOrdered tier.
    */
  def unwrapSortOrder(c: Column): (Column, Boolean, Boolean) = {
    import org.apache.spark.sql.internal.{SortOrder => NodeSortOrder}
    c.node match {
      case NodeSortOrder(child, dir, nulls, _) =>
        (new Column(child),
          dir == NodeSortOrder.Ascending,
          nulls == NodeSortOrder.NullsFirst)
      case _ => (c, true, true)
    }
  }

  /** REVERSE a sort column — direction AND nulls placement both flip
    * (the reverse of desc_nulls_first is asc_nulls_last; flipping only
    * the direction would teleport the null block from one end of the
    * reversed sequence to the same end it came from). Unwraps an
    * existing SortOrder node (Spark 4 Columns wrap internal
    * ColumnNodes; nesting .desc on a SortOrder breaks analysis). Lives
    * here because the node types are private[sql].
    */
  def flipSortOrder(c: Column): Column = {
    import org.apache.spark.sql.internal.{SortOrder => NodeSortOrder}
    c.node match {
      case NodeSortOrder(child, NodeSortOrder.Ascending, nulls, _) =>
        if (nulls == NodeSortOrder.NullsFirst) new Column(child).desc_nulls_last
        else new Column(child).desc_nulls_first
      case NodeSortOrder(child, NodeSortOrder.Descending, nulls, _) =>
        if (nulls == NodeSortOrder.NullsFirst) new Column(child).asc_nulls_last
        else new Column(child).asc_nulls_first
      // a plain column sorts asc_nulls_first; its reverse is
      // desc_nulls_last — .desc's own default
      case _ => c.desc
    }
  }
}
