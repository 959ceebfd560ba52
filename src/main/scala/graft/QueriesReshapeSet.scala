package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Reshape, SetOps}

/** Reshape + set-operation queries (SURVEY.md §2.7, §2.8). */
object QueriesReshapeSet {
  import Queries.{Entry, Q}

  private def dt(s: SparkSession, dir: String, t: String) = DT(s, dir, t)

  def entries: Seq[Entry] = Seq(

    // ---- melt wide→long (R/fmelt.R) ------------------------------------
    ("q_melt", ((s, dir) =>
      Reshape.melt(
        dt(s, dir, "lineitem").df.select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        idVars = Seq("l_orderkey", "l_linenumber"),
        measureVars = Seq("l_quantity", "l_extendedprice", "l_discount"))
        .withColumn("value", round(col("value"), 3))): Q,
      Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable,
             |       round(l_quantity, 3) AS value FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_extendedprice', round(l_extendedprice, 3)
             |FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_discount', round(l_discount, 3)
             |FROM lineitem""".stripMargin)),

    // ---- dcast long→wide pivot (R/fcast.R) -----------------------------
    ("q_dcast", ((s, dir) =>
      Reshape.dcast(dt(s, dir, "lineitem").df,
        lhs = Seq("l_returnflag"), rhs = "l_linestatus", valueVar = "l_quantity",
        aggFn = c => round(avg(c), 3), values = Seq("F", "O"))): Q,
      Some("""SELECT l_returnflag,
             |  round(avg(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 3) AS F,
             |  round(avg(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 3) AS O
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- dcast keeps NA as its own pivot level (R/fcast.R: NA is a
    // dcast column; SQL pivot silently drops null pivot keys) ------------
    ("q_dcast_na", ((s, dir) =>
      Reshape.dcast(dt(s, dir, "lineitem").df
          .withColumn("ls", when(col("l_orderkey") % 7 === 0, lit(null))
            .otherwise(col("l_linestatus"))),
        lhs = Seq("l_returnflag"), rhs = "ls", valueVar = "l_quantity",
        aggFn = c => round(sum(c), 3), values = Seq("F", "O", "NA"),
        naLevel = true)): Q,
      Some("""SELECT l_returnflag,
             |  round(sum(CASE WHEN ls = 'F' THEN l_quantity END), 3) AS F,
             |  round(sum(CASE WHEN ls = 'O' THEN l_quantity END), 3) AS O,
             |  round(sum(CASE WHEN ls IS NULL THEN l_quantity END), 3) AS "NA"
             |FROM (SELECT l_returnflag, l_quantity,
             |        CASE WHEN l_orderkey % 7 = 0 THEN NULL
             |             ELSE l_linestatus END AS ls
             |      FROM lineitem) GROUP BY l_returnflag""".stripMargin)),

    // ---- dcast(subset=) (R/fcast.R:171-175) ----------------------------
    ("q_dcast_subset", ((s, dir) =>
      Reshape.dcastSubset(dt(s, dir, "lineitem").df,
        subset = col("l_quantity") > 25,
        lhs = Seq("l_returnflag"), rhs = "l_linestatus", valueVar = "l_quantity",
        aggFn = c => round(sum(c), 3), values = Seq("F", "O"))): Q,
      Some("""SELECT l_returnflag,
             |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 3) AS F,
             |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 3) AS O
             |FROM lineitem WHERE l_quantity > 25
             |GROUP BY l_returnflag""".stripMargin)),

    // ---- dcast(margins=TRUE): "(all)" column + total row ---------------
    ("q_dcast_margins", ((s, dir) =>
      Reshape.dcastMargins(dt(s, dir, "lineitem").df,
        lhs = "l_returnflag", rhs = "l_linestatus", valueVar = "l_quantity",
        aggFn = c => round(sum(c), 3), values = Seq("F", "O"))): Q,
      Some("""SELECT l_returnflag,
             |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 3) AS F,
             |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 3) AS O,
             |  round(sum(l_quantity), 3) AS "(all)"
             |FROM lineitem GROUP BY l_returnflag
             |UNION ALL
             |SELECT '(all)',
             |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 3),
             |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 3),
             |  round(sum(l_quantity), 3)
             |FROM lineitem""".stripMargin)),

    // ---- dcast margins x subset=: "(all)" totals the SUBSET -----------
    ("q_dcast_margins_subset", ((s, dir) =>
      Reshape.dcastMarginsSubset(dt(s, dir, "lineitem").df,
        subset = col("l_quantity") > 25,
        lhs = "l_returnflag", rhs = "l_linestatus", valueVar = "l_quantity",
        aggFn = c => round(sum(c), 3), values = Seq("F", "O"))): Q,
      Some("""SELECT l_returnflag,
             |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 3) AS F,
             |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 3) AS O,
             |  round(sum(l_quantity), 3) AS "(all)"
             |FROM lineitem WHERE l_quantity > 25
             |GROUP BY l_returnflag
             |UNION ALL
             |SELECT '(all)',
             |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 3),
             |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 3),
             |  round(sum(l_quantity), 3)
             |FROM lineitem WHERE l_quantity > 25""".stripMargin)),

    // ---- dcast margins over a MULTI-column lhs (rollup interpretation) -
    ("q_dcast_margins2", ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .withColumn("len_bucket",
          when(col("n_chars") < 300, "short").otherwise("long"))
      Reshape.dcastMarginsN(d, lhs = Seq("lang", "source"),
        rhs = "len_bucket", valueVar = "n_chars",
        aggFn = c => sum(c).cast("bigint"), values = Seq("long", "short"))
    }): Q,
      Some("""WITH d AS (SELECT lang, source,
             |  CASE WHEN n_chars < 300 THEN 'short' ELSE 'long' END AS b,
             |  n_chars FROM documents)
             |SELECT lang, source,
             |  CAST(sum(CASE WHEN b = 'long' THEN n_chars END) AS BIGINT) AS long,
             |  CAST(sum(CASE WHEN b = 'short' THEN n_chars END) AS BIGINT) AS short,
             |  CAST(sum(n_chars) AS BIGINT) AS "(all)"
             |FROM d GROUP BY lang, source
             |UNION ALL
             |SELECT lang, '(all)',
             |  CAST(sum(CASE WHEN b = 'long' THEN n_chars END) AS BIGINT),
             |  CAST(sum(CASE WHEN b = 'short' THEN n_chars END) AS BIGINT),
             |  CAST(sum(n_chars) AS BIGINT)
             |FROM d GROUP BY lang
             |UNION ALL
             |SELECT '(all)', '(all)',
             |  CAST(sum(CASE WHEN b = 'long' THEN n_chars END) AS BIGINT),
             |  CAST(sum(CASE WHEN b = 'short' THEN n_chars END) AS BIGINT),
             |  CAST(sum(n_chars) AS BIGINT)
             |FROM d""".stripMargin)),

    // ---- dcast margins, CUBE form (all 2^k lhs subsets) ----------------
    // Adds the (source)-only block that the rollup form can't express:
    // 4 blocks for lhs=(lang, source) — (lang,source), (lang), (source),
    // () — each with the row-wise "(all)" margin column.
    ("q_dcast_margins_cube", ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .withColumn("len_bucket",
          when(col("n_chars") < 300, "short").otherwise("long"))
      Reshape.dcastMarginsCube(d, lhs = Seq("lang", "source"),
        rhs = "len_bucket", valueVar = "n_chars",
        aggFn = c => sum(c).cast("bigint"), values = Seq("long", "short"))
    }): Q,
      Some("""WITH d AS (SELECT lang, source,
             |  CASE WHEN n_chars < 300 THEN 'short' ELSE 'long' END AS b,
             |  n_chars FROM documents)
             |SELECT lang, source,
             |  CAST(sum(CASE WHEN b = 'long' THEN n_chars END) AS BIGINT) AS long,
             |  CAST(sum(CASE WHEN b = 'short' THEN n_chars END) AS BIGINT) AS short,
             |  CAST(sum(n_chars) AS BIGINT) AS "(all)"
             |FROM d GROUP BY lang, source
             |UNION ALL
             |SELECT lang, '(all)',
             |  CAST(sum(CASE WHEN b = 'long' THEN n_chars END) AS BIGINT),
             |  CAST(sum(CASE WHEN b = 'short' THEN n_chars END) AS BIGINT),
             |  CAST(sum(n_chars) AS BIGINT)
             |FROM d GROUP BY lang
             |UNION ALL
             |SELECT '(all)', source,
             |  CAST(sum(CASE WHEN b = 'long' THEN n_chars END) AS BIGINT),
             |  CAST(sum(CASE WHEN b = 'short' THEN n_chars END) AS BIGINT),
             |  CAST(sum(n_chars) AS BIGINT)
             |FROM d GROUP BY source
             |UNION ALL
             |SELECT '(all)', '(all)',
             |  CAST(sum(CASE WHEN b = 'long' THEN n_chars END) AS BIGINT),
             |  CAST(sum(CASE WHEN b = 'short' THEN n_chars END) AS BIGINT),
             |  CAST(sum(n_chars) AS BIGINT)
             |FROM d""".stripMargin)),

    // ---- dcast with multiple value aggregates --------------------------
    ("q_dcast_multi", ((s, dir) =>
      dt(s, dir, "lineitem").df
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_quantity"), 3).as("qty"), count(lit(1)).as("n"))): Q,
      Some("""SELECT l_returnflag,
             |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 3) AS F_qty,
             |  count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F_n,
             |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 3) AS O_qty,
             |  count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O_n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- dcast general fun.aggregate LIST: 2 value.vars × 2 fns --------
    // (R/fcast.R:115-126 list form; columns follow the reference's
    // <value.var>_<fun>_<pivotValue> convention via dcastMulti's rename)
    ("q_dcast_multifns", ((s, dir) =>
      Reshape.dcastMulti(dt(s, dir, "lineitem").df,
        lhs = Seq("l_returnflag"), rhs = "l_linestatus",
        values = Seq("F", "O"),
        aggs = Seq(
          "qty_sum" -> round(sum(col("l_quantity")), 3),
          "qty_avg" -> round(avg(col("l_quantity")), 3),
          "price_sum" -> round(sum(col("l_extendedprice")), 3)))): Q,
      Some("""SELECT l_returnflag,
             |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 3) AS qty_sum_F,
             |  round(avg(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 3) AS qty_avg_F,
             |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END), 3) AS price_sum_F,
             |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 3) AS qty_sum_O,
             |  round(avg(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 3) AS qty_avg_O,
             |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END), 3) AS price_sum_O
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- rbindlist(fill=TRUE, idcol) (src/rbindlist.c) -----------------
    ("q_rbindlist", ((s, dir) => {
      val c = dt(s, dir, "customer").df.select(col("c_custkey").as("id"),
        col("c_name").as("name"), col("c_mktsegment").as("segment"))
      val p = dt(s, dir, "supplier").df.select(col("s_suppkey").as("id"),
        col("s_name").as("name"))
      Reshape.rbindlist(Seq(c, p), fill = true, idcol = Some("src"))
    }): Q,
      Some("""SELECT 1 AS src, c_custkey AS id, c_name AS name, c_mktsegment AS segment
             |FROM customer
             |UNION ALL
             |SELECT 2, s_suppkey, s_name, NULL FROM supplier""".stripMargin)),

    // ---- tstrsplit (R/transpose.R:26) ----------------------------------
    ("q_tstrsplit", ((s, dir) =>
      Reshape.tstrsplit(dt(s, dir, "part").df, "p_type", " ", 3)
        .select(col("p_partkey"), col("V1"), col("V2"), col("V3"))): Q,
      Some("""SELECT p_partkey, nullif(split_part(p_type, ' ', 1), '') AS V1,
             |  nullif(split_part(p_type, ' ', 2), '') AS V2,
             |  nullif(split_part(p_type, ' ', 3), '') AS V3
             |FROM part""".stripMargin)),

    // ---- transpose (src/transpose.c) — small table only ----------------
    ("q_transpose", ((s, dir) => {
      val counts = dt(s, dir, "nation")
        .joinExpr(dt(s, dir, "region"), col("n_regionkey") === col("r_regionkey"), "inner")
        .groupAgg(Seq(col("r_name")), Seq(count(lit(1)).cast("double").as("n_nations"))).df
      Reshape.transpose(counts, "r_name")
    }): Q,
      Some("""SELECT 'n_nations' AS column,
             |  sum(CASE WHEN r_name = 'AFRICA' THEN 1 END)::DOUBLE AS AFRICA,
             |  sum(CASE WHEN r_name = 'AMERICA' THEN 1 END)::DOUBLE AS AMERICA,
             |  sum(CASE WHEN r_name = 'ASIA' THEN 1 END)::DOUBLE AS ASIA,
             |  sum(CASE WHEN r_name = 'EUROPE' THEN 1 END)::DOUBLE AS EUROPE,
             |  sum(CASE WHEN r_name = 'MIDDLE EAST' THEN 1 END)::DOUBLE AS "MIDDLE EAST"
             |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin)),

    // ---- funion set/bag union (R/setops.R:91) --------------------------
    ("q_funion", ((s, dir) => {
      val a = dt(s, dir, "customer").df.select(col("c_nationkey").as("nk"))
      val b = dt(s, dir, "supplier").df.select(col("s_nationkey").as("nk"))
      SetOps.funion(a, b, all = false)
    }): Q,
      Some("""SELECT c_nationkey AS nk FROM customer
             |UNION SELECT s_nationkey FROM supplier""".stripMargin)),

    // ---- funion all=TRUE bag union (R/setops.R:91) ---------------------
    ("q_funion_all", ((s, dir) => {
      val a = dt(s, dir, "customer").df.select(col("c_nationkey").as("nk"))
      val b = dt(s, dir, "supplier").df.select(col("s_nationkey").as("nk"))
      DT(SetOps.funion(a, b, all = true))
        .groupAgg(Seq(col("nk")), Seq(count(lit(1)).as("n"))).df
    }): Q,
      Some("""SELECT nk, count(*) AS n FROM (
             |  SELECT c_nationkey AS nk FROM customer
             |  UNION ALL SELECT s_nationkey FROM supplier)
             |GROUP BY nk""".stripMargin)),

    // ---- fintersect (R/setops.R:60) ------------------------------------
    ("q_fintersect", ((s, dir) => {
      val a = dt(s, dir, "customer").df.filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("k"))
      val b = dt(s, dir, "orders").df.select(col("o_custkey").as("k"))
      SetOps.fintersect(a, b)
    }): Q,
      Some("""SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
             |INTERSECT SELECT o_custkey FROM orders""".stripMargin)),

    // ---- fsetdiff (R/setops.R:76) --------------------------------------
    // b restricted to 'F' orders so the difference is NON-EMPTY at
    // every SF (round-10 verdict: the unrestricted form hash-matched
    // vacuously on zero rows).
    ("q_fsetdiff", ((s, dir) => {
      val a = dt(s, dir, "customer").df.select(col("c_custkey").as("k"))
      val b = dt(s, dir, "orders").df.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      SetOps.fsetdiff(a, b)
    }): Q,
      Some("""SELECT c_custkey AS k FROM customer
             |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin)),

    // ---- fintersect all=TRUE (multiset) --------------------------------
    ("q_fintersect_all", ((s, dir) => {
      val a = dt(s, dir, "orders").df.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      val b = dt(s, dir, "orders").df.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("k"))
      SetOps.fintersect(a, b, all = true)
    }): Q,
      Some("""SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
             |INTERSECT ALL
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin)),

    // ---- cbindlist zip-by-id (R/mergelist.R:1) -------------------------
    ("q_cbindlist", ((s, dir) => {
      val names = dt(s, dir, "nation").df.select(col("n_nationkey"), col("n_name"))
      val counts = dt(s, dir, "customer").df
        .groupBy(col("c_nationkey").as("n_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      Reshape.cbindlist(Seq(names, counts), "n_nationkey")
    }): Q,
      Some("""SELECT n.n_nationkey, n.n_name, c.n_cust
             |FROM nation n
             |JOIN (SELECT c_nationkey AS n_nationkey, count(*) AS n_cust
             |      FROM customer GROUP BY 1) c USING (n_nationkey)""".stripMargin)),

    // ---- dcast drop=FALSE (CJ completion of empty key combos) ----------
    ("q_dcast_complete", ((s, dir) => {
      val f = dt(s, dir, "lineitem").df.filter(col("l_quantity") > 49)
        .withColumn("yr", year(col("l_shipdate")).cast("string"))
      Reshape.dcastComplete(f, Seq("l_returnflag", "l_linestatus"), "yr",
        "l_quantity", c => round(avg(c), 3), values = Seq("1996", "1997"))
    }): Q,
      Some("""WITH f AS (SELECT l_returnflag, l_linestatus,
             |             year(l_shipdate) AS yr, l_quantity
             |           FROM lineitem WHERE l_quantity > 49),
             |d AS (SELECT rf.l_returnflag, ls.l_linestatus
             |      FROM (SELECT DISTINCT l_returnflag FROM f) rf
             |      CROSS JOIN (SELECT DISTINCT l_linestatus FROM f) ls)
             |SELECT d.l_returnflag, d.l_linestatus,
             |  round(avg(CASE WHEN f.yr = 1996 THEN f.l_quantity END), 3) AS "1996",
             |  round(avg(CASE WHEN f.yr = 1997 THEN f.l_quantity END), 3) AS "1997"
             |FROM d LEFT JOIN f
             |  ON d.l_returnflag = f.l_returnflag AND d.l_linestatus = f.l_linestatus
             |GROUP BY d.l_returnflag, d.l_linestatus""".stripMargin)),

    // ---- dcast drop=FALSE x MULTIPLE value.var (R/fcast.R:217-226) -----
    ("q_dcast_drop_multi", ((s, dir) => {
      val f = dt(s, dir, "lineitem").df.filter(col("l_quantity") > 49)
        .withColumn("yr", year(col("l_shipdate")).cast("string"))
      Reshape.dcastCompleteMulti(f, Seq("l_returnflag", "l_linestatus"), "yr",
        Seq("qty" -> round(sum(col("l_quantity")), 3),
          "price" -> round(sum(col("l_extendedprice")), 3)),
        values = Seq("1996", "1997"))
    }): Q,
      Some("""WITH f AS (SELECT l_returnflag, l_linestatus,
             |             year(l_shipdate) AS yr, l_quantity, l_extendedprice
             |           FROM lineitem WHERE l_quantity > 49),
             |d AS (SELECT rf.l_returnflag, ls.l_linestatus
             |      FROM (SELECT DISTINCT l_returnflag FROM f) rf
             |      CROSS JOIN (SELECT DISTINCT l_linestatus FROM f) ls)
             |SELECT d.l_returnflag, d.l_linestatus,
             |  round(sum(CASE WHEN f.yr = 1996 THEN f.l_quantity END), 3) AS qty_1996,
             |  round(sum(CASE WHEN f.yr = 1996 THEN f.l_extendedprice END), 3) AS price_1996,
             |  round(sum(CASE WHEN f.yr = 1997 THEN f.l_quantity END), 3) AS qty_1997,
             |  round(sum(CASE WHEN f.yr = 1997 THEN f.l_extendedprice END), 3) AS price_1997
             |FROM d LEFT JOIN f
             |  ON d.l_returnflag = f.l_returnflag AND d.l_linestatus = f.l_linestatus
             |GROUP BY d.l_returnflag, d.l_linestatus""".stripMargin)),

    // ---- typed Aggregator UDAF (SURVEY.md §2.11) -----------------------
    ("q_wmean_udaf", ((s, dir) =>
      dt(s, dir, "lineitem").df
        .groupBy(col("l_returnflag"))
        .agg(round(graft.functions.Aggregators.weightedMean(
          col("l_extendedprice"), col("l_quantity")), 3).as("wm"))): Q,
      Some("""SELECT l_returnflag,
             |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 3) AS wm
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- melt multiple measure groups (R/fmelt.R measure lists) --------
    ("q_melt_multi", ((s, dir) =>
      Reshape.meltMulti(
        dt(s, dir, "lineitem").df.select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        idVars = Seq("l_orderkey", "l_linenumber"),
        measureGroups = scala.collection.immutable.ListMap(
          "amount" -> Seq("l_quantity", "l_extendedprice"),
          "rate" -> Seq("l_discount", "l_tax")))
        .withColumn("amount", round(col("amount"), 3))
        .withColumn("rate", round(col("rate"), 3))): Q,
      Some("""SELECT l_orderkey, l_linenumber, 1 AS variable,
             |  round(l_quantity, 3) AS amount, round(l_discount, 3) AS rate FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 2,
             |  round(l_extendedprice, 3), round(l_tax, 3) FROM lineitem""".stripMargin)),

    // ---- melt measure(pattern=) (R/fmelt.R:32-64) ----------------------
    // Regex capture groups split measure names into (value-name, dim):
    // amount_y1/amount_y2/rate_y1/rate_y2 → value columns (amount, rate)
    // keyed by a string dim of 1/2.
    ("q_melt_measure", ((s, dir) =>
      Reshape.meltMeasurePattern(
        dt(s, dir, "lineitem").df.select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("amount_y1"), col("l_extendedprice").as("amount_y2"),
          col("l_discount").as("rate_y1"), col("l_tax").as("rate_y2")),
        idVars = Seq("l_orderkey", "l_linenumber"),
        pattern = "^(amount|rate)_y(\\d+)$")
        .withColumn("amount", round(col("amount"), 3))
        .withColumn("rate", round(col("rate"), 3))): Q,
      Some("""SELECT l_orderkey, l_linenumber, '1' AS dim,
             |  round(l_quantity, 3) AS amount, round(l_discount, 3) AS rate FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, '2',
             |  round(l_extendedprice, 3), round(l_tax, 3) FROM lineitem""".stripMargin)),

    // ---- melt measure() GENERAL form: N dims, single value column ------
    // No "value.name" group: both captures (metric, yr) become dim
    // columns and all four measures melt into one promoted value column.
    ("q_melt_measure_n", ((s, dir) =>
      Reshape.meltMeasureN(
        dt(s, dir, "lineitem").df.select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("q_y1"), col("l_tax").as("q_y2"),
          col("l_extendedprice").as("p_y1"), col("l_discount").as("p_y2")),
        idVars = Seq("l_orderkey", "l_linenumber"),
        pattern = "^([qp])_y([12])$", groupNames = Seq("metric", "yr"))
        .withColumn("value", round(col("value"), 3))): Q,
      Some("""SELECT l_orderkey, l_linenumber, 'q' AS metric, '1' AS yr,
             |  round(l_quantity, 3) AS value FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'q', '2', round(l_tax, 3) FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'p', '1', round(l_extendedprice, 3) FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'p', '2', round(l_discount, 3) FROM lineitem""".stripMargin)),

    // ---- melt measure(fun=) type dispatch (R/fmelt.R:133-153) ----------
    // The per-group conversion function turns the captured yr label
    // into a typed INT dim column ("1" -> 1), the measurev fun.list
    // form; value columns split by the value.name group as usual.
    ("q_melt_measure_fun", ((s, dir) =>
      Reshape.meltMeasureN(
        dt(s, dir, "lineitem").df.select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("amount_y1"), col("l_extendedprice").as("amount_y2"),
          col("l_discount").as("rate_y1"), col("l_tax").as("rate_y2")),
        idVars = Seq("l_orderkey", "l_linenumber"),
        pattern = "^(amount|rate)_y(\\d+)$",
        groupNames = Seq("value.name", "yr"),
        convert = Map("yr" -> ((sfx: String) => sfx.toInt)))
        .withColumn("amount", round(col("amount"), 3))
        .withColumn("rate", round(col("rate"), 3))): Q,
      Some("""SELECT l_orderkey, l_linenumber, 1 AS yr,
             |  round(l_quantity, 3) AS amount, round(l_discount, 3) AS rate FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 2,
             |  round(l_extendedprice, 3), round(l_tax, 3) FROM lineitem""".stripMargin)),

    // ---- melt measure(fun=) x na.rm (R/fmelt.R:133-153 x na.rm) --------
    // Planted NAs in one value column per dim combo: na.rm drops a
    // molten row when ANY of its value columns is NA (multi-value
    // semantics, same contract as the list-measure na.rm), composed
    // with the fun= typed-dim conversion.
    ("q_melt_measure_fun_narm", ((s, dir) =>
      Reshape.meltMeasureN(
        dt(s, dir, "lineitem").df.select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_orderkey") % 3 === 0, lit(null))
            .otherwise(col("l_quantity")).as("amount_y1"),
          col("l_extendedprice").as("amount_y2"),
          col("l_discount").as("rate_y1"),
          when(col("l_orderkey") % 5 === 0, lit(null))
            .otherwise(col("l_tax")).as("rate_y2")),
        idVars = Seq("l_orderkey", "l_linenumber"),
        pattern = "^(amount|rate)_y(\\d+)$",
        groupNames = Seq("value.name", "yr"),
        convert = Map("yr" -> ((sfx: String) => sfx.toInt)),
        naRm = true)
        .withColumn("amount", round(col("amount"), 3))
        .withColumn("rate", round(col("rate"), 3))): Q,
      Some("""SELECT l_orderkey, l_linenumber, 1 AS yr,
             |  round(l_quantity, 3) AS amount, round(l_discount, 3) AS rate
             |FROM lineitem WHERE l_orderkey % 3 <> 0
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 2,
             |  round(l_extendedprice, 3), round(l_tax, 3)
             |FROM lineitem WHERE l_orderkey % 5 <> 0""".stripMargin))
  )
}
