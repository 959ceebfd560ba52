package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Ordered / window operators (SURVEY.md §2.5).
  *
  * The reference's row order is physical (src/shift.c, src/froll.c);
  * Spark DataFrames are unordered, so every operator here REQUIRES an
  * explicit ordering (and optional partitioning) — the DSL-level
  * enforcement of SURVEY.md §7.4 "row order as a first-class concept".
  * All lower to Catalyst Window nodes: one shuffle on the partition keys,
  * then streaming frame evaluation — the distributed analog of the
  * reference's single sorted pass.
  */
object Windows {

  /** Flip a sort column's direction safely: unwraps an existing
    * SortOrder node (Spark 4 Columns wrap internal ColumnNodes, not
    * catalyst expressions) instead of nesting .desc on top of it.
    */
  def flipOrder(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.flipSortOrder(c)

  private def spec(by: Seq[String], order: Seq[Column]): WindowSpec =
    if (by.isEmpty) Window.orderBy(order: _*)
    else Window.partitionBy(by.map(col): _*).orderBy(order: _*)

  // ---- shift (src/shift.c) --------------------------------------------

  /** shift(x, n, fill, type): n>0 lag, n<0 lead. The fill applies to
    * shifted-in edge positions (reference semantics); when the input has
    * genuine nulls pass fill=lit(null) to keep them distinguishable.
    */
  def shift(c: Column, n: Int, by: Seq[String], order: Seq[Column],
            fill: Column = lit(null)): Column = {
    val w = spec(by, order)
    if (n >= 0) coalesce(lag(c, n).over(w), fill)
    else coalesce(lead(c, -n).over(w), fill)
  }

  /** shift(type="cyclic") (src/shift.c:25-28): wrap around within the
    * partition via modular row-number arithmetic + an equi self-join on
    * (group, target row) — no partition-sized arrays.
    */
  def shiftCyclic(df: DataFrame, colName: String, n: Int, by: Seq[String],
                  order: Seq[Column], out: String): DataFrame = {
    val w = spec(by, order)
    val part = if (by.isEmpty) Window.partitionBy() else Window.partitionBy(by.map(col): _*)
    val withRn = df.withColumn("_graft_rn", row_number().over(w))
      .withColumn("_graft_cnt", count(lit(1)).over(part))
    val tgt = withRn.withColumn("_graft_target",
      ((col("_graft_rn") - 1 - n) % col("_graft_cnt") + col("_graft_cnt")) % col("_graft_cnt") + 1)
      .alias("t")
    val src = withRn
      .select((by.map(col) :+ col("_graft_rn").as("_graft_src_rn") :+ col(colName).as(out)): _*)
      .alias("s")
    val cond = by.map(b => col(s"t.$b") <=> col(s"s.$b"))
      .foldRight(col("t._graft_target") === col("s._graft_src_rn"))(_ && _)
    tgt.join(src, cond, "left")
      .select((df.columns.toSeq.map(c => col(s"t.$c")) :+ col(s"s.$out")): _*)
  }

  // ---- nafill (src/nafill.c) ------------------------------------------

  def nafillConst(c: Column, fill: Column): Column = coalesce(c, fill)

  /** nafill(type="locf"): last non-null carried forward. */
  def nafillLocf(c: Column, by: Seq[String], order: Seq[Column]): Column =
    last(c, ignoreNulls = true)
      .over(spec(by, order).rowsBetween(Window.unboundedPreceding, 0))

  /** nafill(type="nocb"): next non-null carried backward. */
  def nafillNocb(c: Column, by: Seq[String], order: Seq[Column]): Column =
    first(c, ignoreNulls = true)
      .over(spec(by, order).rowsBetween(0, Window.unboundedFollowing))

  // ---- frank (src/frank.c ties enum) ----------------------------------

  /** frank(ties.method=) — average, first, min, max, dense
    * (src/frank.c:112-123). `order` is the ranking order (may carry
    * asc/desc); `tieCols` are the bare ranked value columns, used to
    * partition tied blocks for average/max.
    * `average` = rank + (tieCount-1)/2, the mean row number of the block.
    */
  def frank(df: DataFrame, order: Seq[Column], tieCols: Seq[Column], ties: String,
            by: Seq[String], out: String): DataFrame = {
    val w = spec(by, order)
    ties match {
      case "first" => df.withColumn(out, row_number().over(w))
      case "min"   => df.withColumn(out, rank().over(w))
      case "dense" => df.withColumn(out, dense_rank().over(w))
      case "max"   =>
        val tiePart = Window.partitionBy((by.map(col) ++ tieCols): _*)
        df.withColumn(out, rank().over(w) + count(lit(1)).over(tiePart) - 1)
      case "average" =>
        val tiePart = Window.partitionBy((by.map(col) ++ tieCols): _*)
        df.withColumn(out,
          rank().over(w) + (count(lit(1)).over(tiePart) - 1) / 2.0)
      case "random" =>
        // reference: ties broken uniformly at random. Distributed +
        // reproducible: break ties by a hash of the whole row (stable
        // across retries/nodes, unlike rand()).
        val rowHash = xxhash64(df.columns.map(col).toSeq: _*)
        val wr = if (by.isEmpty) Window.orderBy((order :+ rowHash.asc): _*)
                 else Window.partitionBy(by.map(col): _*).orderBy((order :+ rowHash.asc): _*)
        df.withColumn(out, row_number().over(wr))
      case other => throw new IllegalArgumentException(s"ties.method=$other")
    }
  }

  // ---- rleid / rowid (src/uniqlist.c:170, R/data.table.R:3267) --------

  /** rleid(): run-length id — increments whenever any of `cols` changes
    * along `order` (gaps-and-islands).
    */
  def rleid(df: DataFrame, cols: Seq[String], order: Seq[Column],
            by: Seq[String], out: String): DataFrame = {
    val w = spec(by, order)
    val changed = cols.map(c =>
      when(lag(col(c), 1).over(w).isNull && col(c).isNull, 0)
        .when(lag(col(c), 1).over(w) === col(c), 0)
        .otherwise(1)).reduce(greatest(_, _))
    val wCum = spec(by, order).rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(out, sum(changed).over(wCum))
  }

  /** rowid(): 1..n within duplicate group of `cols`, ordered by `order`. */
  def rowid(df: DataFrame, cols: Seq[String], order: Seq[Column],
            out: String): DataFrame =
    df.withColumn(out,
      row_number().over(Window.partitionBy(cols.map(col): _*).orderBy(order: _*)))

  // ---- froll* (src/froll.c) -------------------------------------------

  /** Frame bounds for align=right|center|left over an n-row window. */
  private def bounds(n: Int, align: String): (Int, Int) = align match {
    case "right"  => (-(n - 1), 0)
    case "left"   => (0, n - 1)
    case "center" => val before = (n - 1) / 2; (-before, n - 1 - before)
    case other    => throw new IllegalArgumentException(s"align=$other")
  }

  /** Rolling aggregate over a fixed n-row window. `partial=false`
    * (reference default) yields null until the window is full —
    * implemented as a frame-count check, not a separate pass.
    *
    * fn: one of sum, mean, min, max, sd, var, median, prod.
    * All but median/prod stay builtin Catalyst window aggregates
    * (codegen'd, streaming frame); median/prod materialize the bounded
    * frame as an array (fine: n is small and fixed).
    */
  def froll(fn: String, c: Column, n: Int, by: Seq[String], order: Seq[Column],
            align: String = "right", partial: Boolean = false): Column = {
    val (lo, hi) = bounds(n, align)
    val w = spec(by, order).rowsBetween(lo, hi)
    val core = fn match {
      case "sum"    => sum(c).over(w)
      case "mean"   => avg(c).over(w)
      case "min"    => min(c).over(w)
      case "max"    => max(c).over(w)
      case "sd"     => stddev_samp(c).over(w)
      case "var"    => var_samp(c).over(w)
      case "median" =>
        val arr = array_sort(collect_list(c).over(w))
        val sz = size(arr)
        // collect_list drops nulls: an all-null frame is EMPTY and the
        // even branch would index element 0 (SQL arrays are 1-based)
        when(sz === 0, lit(null).cast("double"))
          .when(sz % 2 === 1, element_at(arr, ((sz + 1) / 2).cast("int")).cast("double"))
          .otherwise((element_at(arr, (sz / 2).cast("int")) +
            element_at(arr, (sz / 2).cast("int") + 1)) / 2.0)
      case "prod" =>
        aggregate(collect_list(c).over(w), lit(1.0),
          (acc, x) => acc * x.cast("double"))
      case other => throw new IllegalArgumentException(s"froll fn=$other")
    }
    if (partial) core
    else when(count(c).over(w) === n, core)
  }

  /** frollapply analog: expose the raw n-row frame as an array column the
    * caller transforms with higher-order functions (the codegen-friendly
    * stand-in for an arbitrary window closure).
    */
  def frollWindowArray(c: Column, n: Int, by: Seq[String], order: Seq[Column],
                       align: String = "right"): Column = {
    val (lo, hi) = bounds(n, align)
    collect_list(c).over(spec(by, order).rowsBetween(lo, hi))
  }

  /** Adaptive rolling aggregate (src/frolladaptive.c): per-row window
    * length from column `an`, bounded by maxN. The frame is the bounded
    * last-maxN rows; rows beyond the per-row length are masked out of an
    * array aggregate. Scale-sane when maxN is modest (frame is bounded);
    * unbounded adaptive windows would need a custom SparkPlan.
    */
  def frollAdaptive(fn: String, c: Column, an: Column, maxN: Int,
                    by: Seq[String], order: Seq[Column]): Column = {
    val w = spec(by, order).rowsBetween(-(maxN - 1), 0)
    val arr = collect_list(c).over(w)   // oldest..newest within frame
    val take = least(an, size(arr))
    val sliced = slice(arr, size(arr) - take + 1, take)
    val res = fn match {
      case "sum"  => aggregate(sliced, lit(0.0), (a, x) => a + x.cast("double"))
      case "mean" => aggregate(sliced, lit(0.0), (a, x) => a + x.cast("double")) / take
      case "max"  => array_max(sliced)
      case "min"  => array_min(sliced)
      case "prod" => aggregate(sliced, lit(1.0), (a, x) => a * x.cast("double"))
      case "median" =>
        val sorted = array_sort(sliced)
        val sz = size(sorted)
        when(sz === 0, lit(null).cast("double"))
          .when(sz % 2 === 1, element_at(sorted, ((sz + 1) / 2).cast("int")).cast("double"))
          .otherwise((element_at(sorted, (sz / 2).cast("int")) +
            element_at(sorted, (sz / 2).cast("int") + 1)) / 2.0)
      case "var" | "sd" =>
        val n = size(sliced).cast("double")
        val mean = aggregate(sliced, lit(0.0), (a, x) => a + x.cast("double")) / n
        val ss = aggregate(sliced, lit(0.0),
          (a, x) => a + (x.cast("double") - mean) * (x.cast("double") - mean))
        val v = when(n > 1, ss / (n - 1))
        if (fn == "var") v else sqrt(v)
      case other  => throw new IllegalArgumentException(s"frolladaptive fn=$other")
    }
    when(an > size(arr), lit(null)).otherwise(res)
  }

  // ---- top-k per group (ghead idiom, src/gsumm.c:1004) ----------------

  def topK(df: DataFrame, by: Seq[String], order: Seq[Column], k: Int): DataFrame =
    df.withColumn("_graft_rn",
        row_number().over(Window.partitionBy(by.map(col): _*).orderBy(order: _*)))
      .filter(col("_graft_rn") <= k)
      .drop("_graft_rn")

  // ---- cumulative (free in Spark, SURVEY.md §2.5 last row) ------------

  /** NOTE cum("prod") materializes the growing prefix as an array
    * (O(n²) per partition) — fine for short series; for long ones use
    * sign-tracked exp(sum(log(abs))) composition instead.
    */
  def cum(fn: String, c: Column, by: Seq[String], order: Seq[Column]): Column = {
    val w = spec(by, order).rowsBetween(Window.unboundedPreceding, 0)
    fn match {
      case "sum" => sum(c).over(w)
      case "min" => min(c).over(w)
      case "max" => max(c).over(w)
      case "prod" => aggregate(collect_list(c).over(w), lit(1.0), (a, x) => a * x.cast("double"))
      case other => throw new IllegalArgumentException(s"cum fn=$other")
    }
  }
}
