package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Funcs
import graft.operators.Windows

/** Filters, projections, scalar functions, aggregations
  * (SURVEY.md §2.2, §2.4, §2.9, §2.10).
  */
object QueriesCore {
  import Queries.{Entry, Q}

  private def dt(s: SparkSession, dir: String, t: String) = DT(s, dir, t)

  // Unique, order-preserving row key for lineitem: (l_orderkey,
  // l_linenumber) is NOT unique in the synthetic data, so first/last
  // need the full quadruple, zero-padded so string order == numeric.
  private def rowKey =
    concat(lpad(col("l_orderkey").cast("string"), 10, "0"),
      lpad(col("l_linenumber").cast("string"), 2, "0"),
      lpad(col("l_partkey").cast("string"), 10, "0"),
      lpad(col("l_suppkey").cast("string"), 10, "0"))

  def entries: Seq[Entry] = Seq(

    // ---- §2.2 i-subset: DT[quantity > 45 & returnflag == "R"] ----------
    ("q_filter", ((s, dir) =>
      dt(s, dir, "lineitem")(col("l_quantity") > 45 && col("l_returnflag") === "R",
        Seq(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))).df): Q,
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin)),

    // ---- %between% (R/between.R) ---------------------------------------
    ("q_between", ((s, dir) =>
      dt(s, dir, "events")(Funcs.between(col("value"), lit(10.0), lit(20.0)),
        Seq(col("event_id"), col("value"))).df): Q,
      Some("SELECT event_id, value FROM events WHERE value BETWEEN 10.0 AND 20.0")),

    // ---- between on Date bounds + NAbounds=TRUE (#7281; R/between.R):
    // a null bound is unbounded on that side instead of null-poisoning.
    // Output columns are booleans (never bare DATE — pandas dtype trap).
    ("q_between_date", ((s, dir) =>
      dt(s, dir, "orders").df
        .withColumn("in_window", Funcs.between(col("o_orderdate"),
          lit("1995-06-01").cast("date"), lit("1996-06-01").cast("date")))
        .withColumn("after_cut", Funcs.betweenNA(col("o_orderdate"),
          lit("1995-06-01").cast("date"), lit(null).cast("date")))
        .select(col("o_orderkey"), col("in_window"), col("after_cut"))): Q,
      Some("""SELECT o_orderkey,
             |  o_orderdate BETWEEN DATE '1995-06-01' AND DATE '1996-06-01' AS in_window,
             |  o_orderdate >= DATE '1995-06-01' AS after_cut
             |FROM orders""".stripMargin)),

    // ---- %like% / %ilike% (R/like.R) -----------------------------------
    ("q_like", ((s, dir) =>
      dt(s, dir, "part")(Funcs.like(col("p_name"), "blue") ||
          Funcs.flike(col("p_name"), "widget"),
        Seq(col("p_partkey"), col("p_name"), col("p_type"))).df): Q,
      Some("""SELECT p_partkey, p_name, p_type FROM part
             |WHERE regexp_matches(p_name, 'blue') OR contains(p_name, 'widget')""".stripMargin)),

    // ---- startsWithAny (src/utils.c) ------------------------------------
    ("q_starts_with", ((s, dir) =>
      dt(s, dir, "part")(Funcs.startsWithAny(col("p_name"), Seq("blue", "red")),
        Seq(col("p_partkey"), col("p_name"))).df): Q,
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE starts_with(p_name, 'blue') OR starts_with(p_name, 'red')""".stripMargin)),

    // ---- %chin% / %notin% (src/chmatch.c, R/notin.R) -------------------
    ("q_chin", ((s, dir) =>
      dt(s, dir, "lineitem")(Funcs.chin(col("l_returnflag"), Seq("A", "R")),
        Seq(col("l_returnflag"), col("l_linestatus")))
        .groupAgg(Seq(col("l_returnflag"), col("l_linestatus")), Seq(count(lit(1)).as("n"))).df): Q,
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
             |WHERE l_returnflag IN ('A','R') GROUP BY 1, 2""".stripMargin)),

    ("q_notin", ((s, dir) =>
      dt(s, dir, "orders")(Funcs.notin(col("o_orderstatus"), Seq("F")),
        Seq(col("o_orderkey"), col("o_orderstatus"))).df): Q,
      Some("SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus NOT IN ('F')")),

    // ---- GForce na.rm=FALSE (src/gsumm.c): any NA in the group makes
    // the aggregate NA — sum(c(1, NA)) is NA in R, 1 in SQL. Synthesized
    // nulls ensure some groups trip the rule and some don't. ------------
    ("q_gforce_na", ((s, dir) =>
      dt(s, dir, "lineitem").df
        .withColumn("q", when(col("l_orderkey") === 53, lit(null))
          .otherwise(col("l_quantity")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(Funcs.sumNa(col("q")), 3).as("s"),
          round(Funcs.meanNa(col("q")), 3).as("m"),
          round(Funcs.minNa(col("q")), 3).as("mn"),
          round(Funcs.sumNa(col("q"), naRm = true), 3).as("s_rm"),
          count(lit(1)).as("n"))): Q,
      Some("""SELECT l_returnflag, l_linestatus,
             |  CASE WHEN count(*) > count(q) THEN NULL
             |       ELSE round(sum(q), 3) END AS s,
             |  CASE WHEN count(*) > count(q) THEN NULL
             |       ELSE round(avg(q), 3) END AS m,
             |  CASE WHEN count(*) > count(q) THEN NULL
             |       ELSE round(min(q), 3) END AS mn,
             |  round(sum(q), 3) AS s_rm,
             |  count(*) AS n
             |FROM (SELECT l_returnflag, l_linestatus,
             |        CASE WHEN l_orderkey = 53 THEN NULL
             |             ELSE l_quantity END AS q
             |      FROM lineitem) GROUP BY 1, 2""".stripMargin)),

    // ---- %chin%/%notin% NA semantics (src/chmatch.c: match-based, so
    // the result is NEVER NA — an NA probe matches an NA in the set and
    // misses otherwise; the output columns land in the hash so the SQL
    // IN's null-propagation would fail the oracle) ----------------------
    ("q_chin_na", ((s, dir) =>
      dt(s, dir, "orders").df
        .withColumn("st", when(col("o_orderkey") % 13 === 0, lit(null))
          .otherwise(col("o_orderstatus")))
        .select(col("o_orderkey"),
          Funcs.chin(col("st"), Seq("F", null)).as("in_f_na"),
          Funcs.notin(col("st"), Seq("F")).as("not_f"))): Q,
      Some("""SELECT o_orderkey,
             |  CASE WHEN st IS NULL THEN TRUE ELSE st IN ('F') END AS in_f_na,
             |  CASE WHEN st IS NULL THEN TRUE ELSE st NOT IN ('F') END AS not_f
             |FROM (SELECT o_orderkey,
             |        CASE WHEN o_orderkey % 13 = 0 THEN NULL
             |             ELSE o_orderstatus END AS st
             |      FROM orders)""".stripMargin)),

    // ---- %inrange% (R/between.R:76) ------------------------------------
    ("q_inrange", ((s, dir) =>
      dt(s, dir, "events")(Funcs.inrange(col("value"),
          Seq((0.0, 10.0), (50.0, 60.0), (90.0, 100.0))),
        Seq(col("event_type")))
        .groupAgg(Seq(col("event_type")), Seq(count(lit(1)).as("n"))).df): Q,
      Some("""SELECT event_type, count(*) AS n FROM events
             |WHERE value BETWEEN 0 AND 10 OR value BETWEEN 50 AND 60
             |   OR value BETWEEN 90 AND 100 GROUP BY 1""".stripMargin)),

    // ---- fifelse (src/fifelse.c) ---------------------------------------
    ("q_fifelse", ((s, dir) =>
      dt(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        Funcs.fifelse(col("l_quantity") > 25, lit("high"), lit("low")).as("qty_class")).df): Q,
      Some("""SELECT l_orderkey, l_linenumber,
             |  CASE WHEN l_quantity > 25 THEN 'high' ELSE 'low' END AS qty_class
             |FROM lineitem""".stripMargin)),

    // ---- fcase (src/fifelse.c:210) -------------------------------------
    ("q_fcase", ((s, dir) =>
      dt(s, dir, "orders").select(col("o_orderkey"),
        Funcs.fcase(Seq(
          (col("o_totalprice") < 100000, lit("small")),
          (col("o_totalprice") < 300000, lit("medium")),
          (col("o_totalprice") < 450000, lit("large"))),
          lit("jumbo")).as("bucket"))
        .groupAgg(Seq(col("bucket")), Seq(count(lit(1)).as("n"))).df): Q,
      Some("""SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
             |            WHEN o_totalprice < 300000 THEN 'medium'
             |            WHEN o_totalprice < 450000 THEN 'large'
             |            ELSE 'jumbo' END AS bucket, count(*) AS n
             |FROM orders GROUP BY 1""".stripMargin)),

    // ---- fcoalesce (src/coalesce.c) ------------------------------------
    ("q_fcoalesce", ((s, dir) =>
      dt(s, dir, "events").select(col("event_id"),
        Funcs.fcoalesce(nullif(col("event_type"), lit("view")), lit("none")).as("et")).df): Q,
      Some("SELECT event_id, coalesce(nullif(event_type, 'view'), 'none') AS et FROM events")),

    // ---- na.omit (R/data.table.R:2630) ---------------------------------
    ("q_na_omit", ((s, dir) =>
      dt(s, dir, "events")
        .set("v", nullif(col("event_type"), lit("error")))
        .naOmit("v")
        .groupAgg(Seq(col("v")), Seq(count(lit(1)).as("n"))).df): Q,
      Some("""SELECT nullif(event_type, 'error') AS v, count(*) AS n FROM events
             |WHERE nullif(event_type, 'error') IS NOT NULL GROUP BY 1""".stripMargin)),

    // ---- date/time extractors (R/IDateTime.R:374-434) ------------------
    ("q_datetime", ((s, dir) =>
      dt(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        year(col("l_shipdate")).as("yr"),
        quarter(col("l_shipdate")).as("qtr"),
        month(col("l_shipdate")).as("mon"),
        Funcs.mday(col("l_shipdate")).as("dom"),
        Funcs.yday(col("l_shipdate")).as("doy"),
        Funcs.isoweek(col("l_shipdate")).as("wk"),
        Funcs.wday(col("l_shipdate")).as("dow")).df): Q,
      Some("""SELECT l_orderkey, l_linenumber,
             |  year(l_shipdate) AS yr, quarter(l_shipdate) AS qtr,
             |  month(l_shipdate) AS mon, day(l_shipdate) AS dom,
             |  dayofyear(l_shipdate) AS doy, weekofyear(l_shipdate) AS wk,
             |  (date_part('dow', l_shipdate) + 1) AS dow
             |FROM lineitem""".stripMargin)),

    // ---- IDateTime split + week/isoyear (R/IDateTime.R:186,382,390) ----
    // week() is 7-day blocks from Jan 1 (yday %/% 7 + 1), NOT the ISO
    // week; isoyear() is the year owning the ISO week (the week's
    // Thursday's year) — DuckDB's isoyear builtin adjudicates the
    // Thursday formula exactly, incl. the year-boundary days.
    ("q_idatetime", ((s, dir) =>
      dt(s, dir, "lineitem").df.select(col("l_orderkey"), col("l_linenumber"),
        // IDate IS integer days since epoch in the reference
        // (R/IDateTime.R storage) — adjudicate the integer form
        datediff(Funcs.iDateTime(col("l_shipdate")).getField("idate"),
          lit("1970-01-01")).as("idate"),
        Funcs.iDateTime(col("l_shipdate")).getField("itime").as("itime"),
        // both week() modes of the reference's in-flight migration
        // (src/idatetime.c:148-173): legacy = current default,
        // sequential = the announced future default — oracling both
        // pins the formulas so the flip cannot strand us on one
        Funcs.week(col("l_shipdate")).as("wk7"),
        Funcs.week(col("l_shipdate"), "sequential").as("wk7_seq"),
        Funcs.isoyear(col("l_shipdate")).as("iso_yr"))): Q,
      Some("""SELECT l_orderkey, l_linenumber,
             |  (l_shipdate::DATE - DATE '1970-01-01') AS idate,
             |  (hour(l_shipdate) * 3600 + minute(l_shipdate) * 60
             |    + CAST(floor(second(l_shipdate)) AS INT)) AS itime,
             |  (CAST(floor(dayofyear(l_shipdate) / 7.0) AS INT) + 1) AS wk7,
             |  (CAST(floor((dayofyear(l_shipdate) - 1) / 7.0) AS INT) + 1) AS wk7_seq,
             |  CAST(isoyear(l_shipdate) AS INT) AS iso_yr
             |FROM lineitem""".stripMargin)),

    // ---- grouped quantiles (base quantile() in j via dogroups; the
    // gmedian kernel src/gsumm.c:869 is the 0.5 special case). Exact
    // linear-interpolated percentile == DuckDB quantile_cont; dyadic
    // probabilities over integral quantities interpolate exactly. ----
    ("q_quantiles", ((s, dir) =>
      dt(s, dir, "lineitem").df.groupBy(col("l_returnflag"))
        .agg((round(expr("percentile(l_quantity, 0.25)"), 3) + lit(0.0)).as("q25"),
          (round(expr("percentile(l_quantity, 0.5)"), 3) + lit(0.0)).as("q50"),
          (round(expr("percentile(l_quantity, 0.75)"), 3) + lit(0.0)).as("q75"))): Q,
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.25), 3) + 0.0 AS q25,
             |  round(quantile_cont(l_quantity, 0.5), 3) + 0.0 AS q50,
             |  round(quantile_cont(l_quantity, 0.75), 3) + 0.0 AS q75
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- approx-quantile tier (exact=false knob on Funcs.quantileAgg) --
    // The 100 TB path: Greenwald-Khanna sketch, O(1/ε) memory per group
    // vs exact percentile's per-group value map. DuckDB has no GK
    // mirror, so the sketch VALUES can't be hash-compared — instead the
    // query adjudicates the rank-error GUARANTEE through the hash gate:
    // Spark co-computes the exact interpolated quantiles at p ± 0.001
    // (GK accuracy 10000 → ε = 1e-4, 10× headroom) and emits whether
    // each sketch value lands inside its bracket; the oracle asserts
    // every group must read true. A sketch drifting out of tolerance
    // flips the boolean and fails the hash. (The exact co-computation
    // exists only for adjudication — the production knob returns the
    // sketch alone.)
    ("q_quantiles_approx", ((s, dir) => {
      def inBracket(p: Double): org.apache.spark.sql.Column = {
        val a = Funcs.quantileAgg(col("l_quantity"), p, exact = false)
          .cast("double")
        a.between(expr(s"percentile(l_quantity, ${p - 0.001})"),
          expr(s"percentile(l_quantity, ${p + 0.001})"))
      }
      dt(s, dir, "lineitem").df.groupBy(col("l_returnflag"))
        .agg(inBracket(0.25).as("ok25"), inBracket(0.5).as("ok50"),
          inBracket(0.75).as("ok75"))
    }): Q,
      Some("""SELECT l_returnflag, true AS ok25, true AS ok50, true AS ok75
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- round.IDate to week/month/quarter/year (R/IDateTime.R:99) -----
    // Outputs stay TIMESTAMP-typed (l_shipdate is a timestamp; both
    // engines' date_trunc preserve the input's type kind, proven by
    // q_window_tumbling). The DATE-typed roundIDate is spec-covered.
    ("q_idate_round", ((s, dir) =>
      dt(s, dir, "lineitem").df.select(col("l_orderkey"), col("l_linenumber"),
        Funcs.roundDate(col("l_shipdate"), "week").as("wk_start"),
        Funcs.roundDate(col("l_shipdate"), "month").as("mon_start"),
        Funcs.roundDate(col("l_shipdate"), "quarter").as("qtr_start"),
        Funcs.roundDate(col("l_shipdate"), "year").as("yr_start"))): Q,
      Some("""SELECT l_orderkey, l_linenumber,
             |  date_trunc('week', l_shipdate) AS wk_start,
             |  date_trunc('month', l_shipdate) AS mon_start,
             |  date_trunc('quarter', l_shipdate) AS qtr_start,
             |  date_trunc('year', l_shipdate) AS yr_start
             |FROM lineitem""".stripMargin)),

    // ---- := sub-assign (src/assign.c; update on i-subset) --------------
    ("q_update_sub", ((s, dir) =>
      dt(s, dir, "lineitem")
        .set("net_price", col("l_extendedprice"))
        .update(col("l_discount") > 0.05, "net_price",
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .select(col("l_orderkey"), col("l_linenumber"), col("net_price")).df): Q,
      Some("""SELECT l_orderkey, l_linenumber,
             |  CASE WHEN l_discount > 0.05
             |       THEN l_extendedprice * (1.0 - l_discount)
             |       ELSE l_extendedprice END AS net_price
             |FROM lineitem""".stripMargin)),

    // ---- := grouped update (R/data.table.R:2147: window broadcast) -----
    ("q_update_by", ((s, dir) =>
      dt(s, dir, "lineitem")
        .setBy("grp_avg_qty", avg(col("l_quantity")), Seq("l_returnflag"))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("grp_avg_qty"), 3).as("grp_avg_qty")).df): Q,
      Some("""SELECT l_orderkey, l_linenumber,
             |  round(avg(l_quantity) OVER (PARTITION BY l_returnflag), 3) AS grp_avg_qty
             |FROM lineitem""".stripMargin)),

    // ---- update join X[Y, x := i.y] (join-update, src/assign.c) --------
    ("q_update_join", ((s, dir) =>
      dt(s, dir, "orders")
        .set("segment", lit("UNKNOWN"))
        .updateJoin(
          dt(s, dir, "customer").selectNames("c_custkey", "c_mktsegment")
            .setNames("c_custkey" -> "o_custkey"),
          Seq("o_custkey"),
          "segment" -> col("c_mktsegment"))
        .select(col("o_orderkey"), col("segment")).df): Q,
      Some("""SELECT o_orderkey,
             |  CASE WHEN c_custkey IS NULL THEN 'UNKNOWN'
             |       ELSE c_mktsegment END AS segment
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin)),

    // ---- §2.4 GForce aggregate battery (src/gsumm.c) -------------------
    ("q_gforce", ((s, dir) =>
      dt(s, dir, "lineitem").groupAgg(Seq(col("l_returnflag")), Seq(
        round(sum("l_quantity"), 3).as("s"),
        round(avg("l_quantity"), 3).as("m"),
        round(min("l_quantity"), 3).as("mn"),
        round(max("l_quantity"), 3).as("mx"),
        round(expr("median(l_quantity)"), 3).as("med"),
        round(stddev_samp(col("l_quantity")), 3).as("sd"),
        round(var_samp(col("l_quantity")), 3).as("v"),
        min_by(col("l_extendedprice"), rowKey).as("fst"),
        max_by(col("l_extendedprice"), rowKey).as("lst"),
        count(lit(1)).as("n")).map(c => c)).df): Q,
      Some("""SELECT l_returnflag,
             |  round(sum(l_quantity), 3) AS s, round(avg(l_quantity), 3) AS m,
             |  round(min(l_quantity), 3) AS mn, round(max(l_quantity), 3) AS mx,
             |  round(median(l_quantity), 3) AS med,
             |  round(stddev_samp(l_quantity), 3) AS sd,
             |  round(var_samp(l_quantity), 3) AS v,
             |  min_by(l_extendedprice, lpad(l_orderkey::VARCHAR, 10, '0') ||
             |    lpad(l_linenumber::VARCHAR, 2, '0') || lpad(l_partkey::VARCHAR, 10, '0') ||
             |    lpad(l_suppkey::VARCHAR, 10, '0')) AS fst,
             |  max_by(l_extendedprice, lpad(l_orderkey::VARCHAR, 10, '0') ||
             |    lpad(l_linenumber::VARCHAR, 2, '0') || lpad(l_partkey::VARCHAR, 10, '0') ||
             |    lpad(l_suppkey::VARCHAR, 10, '0')) AS lst,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- gprod on small groups (src/gsumm.c:1116) ----------------------
    // Product over (1+discount): bounded magnitude (≤ ~2) so rounding is
    // meaningful at every scale factor — a raw quantity product reaches
    // 1e14+ where 3-decimal rounding is below one ulp and partial-agg
    // multiplication order flips the hash.
    ("q_prod", ((s, dir) =>
      dt(s, dir, "lineitem")(col("l_orderkey") % 100 === 0,
        Seq(col("l_orderkey"), col("l_discount")))
        .groupAgg(Seq(col("l_orderkey")),
          Seq(round(product(lit(1.0) + col("l_discount")), 6).as("p"),
            count(lit(1)).as("n"))).df): Q,
      Some("""SELECT l_orderkey, round(product(1.0 + l_discount), 6) AS p, count(*) AS n
             |FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY l_orderkey""".stripMargin)),

    // ---- weighted.mean rewrite (R/data.table.R:3353) -------------------
    ("q_weighted_mean", ((s, dir) =>
      dt(s, dir, "lineitem").groupAgg(Seq(col("l_returnflag")),
        Seq(round(sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")), 3)
          .as("wm"))).df): Q,
      Some("""SELECT l_returnflag,
             |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 3) AS wm
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- uniqueN / count distinct (R/duplicated.R:102) -----------------
    ("q_uniqueN", ((s, dir) =>
      dt(s, dir, "lineitem").groupAgg(Seq(col("l_returnflag")),
        Seq(countDistinct(col("l_partkey")).as("u"), count(lit(1)).as("n"))).df): Q,
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS u, count(*) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- uniqueN counts NA as a value (R/duplicated.R:102 na.rm=FALSE;
    // SQL COUNT(DISTINCT) drops nulls — the oracle adds the has-null
    // indicator the same way uniqueNAgg does) -------------------------
    ("q_uniqueN_na", ((s, dir) =>
      dt(s, dir, "orders").df
        .withColumn("k", when(col("o_orderkey") % 11 === 0, lit(null))
          .otherwise(col("o_orderkey") % 100))
        .groupBy(col("o_orderstatus"))
        .agg(Funcs.uniqueNAgg(col("k")).as("u"), count(lit(1)).as("n"))): Q,
      Some("""SELECT o_orderstatus,
             |  count(DISTINCT k) +
             |    CASE WHEN count(*) > count(k) THEN 1 ELSE 0 END AS u,
             |  count(*) AS n
             |FROM (SELECT o_orderstatus,
             |        CASE WHEN o_orderkey % 11 = 0 THEN NULL
             |             ELSE o_orderkey % 100 END AS k
             |      FROM orders) GROUP BY o_orderstatus""".stripMargin)),

    // ---- uniqueN approximate tier (exact=false knob, HLL++ sketch) ----
    // The 100 TB cardinality path: count_distinct's expanded first-phase
    // shuffle carries one row per distinct (group, value) pair;
    // approx_count_distinct keeps a fixed-size register set per group.
    // DuckDB's HLL is a different implementation, so the sketch VALUE
    // can't be hash-compared — the query adjudicates the rsd GUARANTEE
    // instead: Spark co-computes the exact cardinality (adjudication
    // only; the production knob returns the sketch alone) and emits
    // whether the estimate sits within 3·rsd = 15% of it; the oracle
    // asserts exact cardinality AND all-true. An HLL regression flips
    // the boolean and fails the hash.
    ("q_uniqueN_approx", ((s, dir) =>
      dt(s, dir, "lineitem").groupAgg(Seq(col("l_returnflag")),
        Seq(countDistinct(col("l_partkey")).as("u_exact"),
          (abs(Funcs.uniqueNAgg(col("l_partkey"), exact = false)
              .cast("double") / countDistinct(col("l_partkey")) - 1.0)
            <= 0.15).as("ok"))).df): Q,
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS u_exact,
             |  true AS ok
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- unique() (R/duplicated.R:1) -----------------------------------
    ("q_distinct", ((s, dir) =>
      dt(s, dir, "lineitem").selectNames("l_returnflag", "l_linestatus").distinct().df): Q,
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // ---- keyby= (group + sort result, R/data.table.R:551) --------------
    ("q_keyby", ((s, dir) =>
      dt(s, dir, "orders").keyByAgg(Seq("o_orderstatus", "o_orderpriority"),
        Seq(round(sum(col("o_totalprice")), 3).as("rev"), count(lit(1)).as("n"))).df): Q,
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  round(sum(o_totalprice), 3) AS rev, count(*) AS n
             |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- setkey + keyed pipeline (R/setkey.R; key reuse §4.1) ----------
    // keyBy range-partitions + sorts; the follow-on groupBy reuses that
    // clustering (no second exchange — proven in KeyReuseSpec).
    ("q_keyed_pipeline", ((s, dir) =>
      dt(s, dir, "orders").keyBy("o_custkey")
        .groupAgg(Seq(col("o_custkey")),
          Seq(round(sum(col("o_totalprice")), 3).as("spend"), count(lit(1)).as("n"))).df): Q,
      Some("""SELECT o_custkey, round(sum(o_totalprice), 3) AS spend, count(*) AS n
             |FROM orders GROUP BY o_custkey""".stripMargin)),

    // ---- rollup + grouping_id (R/groupingsets.R) -----------------------
    ("q_rollup", ((s, dir) =>
      dt(s, dir, "orders").df
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 3).as("rev"),
          grouping_id().as("gid"))): Q,
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  round(sum(o_totalprice), 3) AS rev,
             |  GROUPING_ID(o_orderstatus, o_orderpriority) AS gid
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin)),

    // ---- rollup over COMPUTED grouping expressions ---------------------
    ("q_rollup_expr", ((s, dir) =>
      dt(s, dir, "orders").df
        .rollup(year(col("o_orderdate")).as("yr"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 3).as("rev"))): Q,
      Some("""SELECT year(o_orderdate) AS yr, o_orderpriority, count(*) AS n,
             |  round(sum(o_totalprice), 3) AS rev
             |FROM orders GROUP BY ROLLUP (yr, o_orderpriority)""".stripMargin)),

    // ---- rollup over an EMPTY (filtered-to-zero) input ------------------
    // The () grouping set must still emit its global row (count 0, sums
    // NULL) — ANSI GROUPING SETS, DuckDB, and the reference's global
    // `x[, j]` on an empty table all agree; Spark's native Expand plan
    // drops it. Found by the round-19 differential fuzzer (fz_21_136),
    // fixed in DT.groupingSetsAgg, driver-gated here.
    ("q_rollup_empty", ((s, dir) =>
      dt(s, dir, "orders")(col("o_totalprice") < -1)
        .rollupAgg(
          Seq("o_orderstatus" -> col("o_orderstatus"),
            "o_orderpriority" -> col("o_orderpriority")),
          Seq(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("rev"))).df): Q,
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
             |FROM orders WHERE o_totalprice < -1
             |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin)),

    // ---- cube (R/groupingsets.R cube) ----------------------------------
    ("q_cube", ((s, dir) =>
      dt(s, dir, "lineitem").df
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))): Q,
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  GROUPING_ID(l_returnflag, l_linestatus) AS gid
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)),

    // ---- rollup(id=TRUE) spelling (R/groupingsets.R:1-17) ---------------
    // The reference's rollup() generates prefix sets and redirects into
    // groupingsets with id= passed through; rollupAgg mirrors that.
    ("q_rollup_id", ((s, dir) =>
      dt(s, dir, "orders")
        .rollupAgg(
          Seq("st" -> col("o_orderstatus"), "pr" -> col("o_orderpriority")),
          Seq(count(lit(1)).as("n"), round(sum("o_totalprice"), 3).as("rev")),
          id = true).df): Q,
      Some("""SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS grouping,
             |  o_orderstatus AS st, o_orderpriority AS pr, count(*) AS n,
             |  round(sum(o_totalprice), 3) AS rev
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin)),

    // ---- cube(id=TRUE) spelling (R/groupingsets.R:19-39) ----------------
    ("q_cube_id", ((s, dir) =>
      dt(s, dir, "lineitem")
        .cubeAgg(
          Seq("rf" -> col("l_returnflag"), "ls" -> col("l_linestatus")),
          Seq(count(lit(1)).as("n")),
          id = true).df): Q,
      Some("""SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS grouping,
             |  l_returnflag AS rf, l_linestatus AS ls, count(*) AS n
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)),

    // ---- groupingsets explicit (R/groupingsets.R:19) -------------------
    ("q_groupingsets", ((s, dir) =>
      dt(s, dir, "orders").df
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty[org.apache.spark.sql.Column]),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))): Q,
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)),

    // ---- groupingsets over COMPUTED expressions + label= ----------------
    // Expression keys (yr = year(o_orderdate)) and totals-row labels
    // (R/groupingsets.R:41-44,91-111): rolled-up slots show the label,
    // not NULL. One GROUPING SETS pass; labels are a gid-bit projection.
    // ---- groupingsets id=TRUE (R/groupingsets.R:124-161): leading
    // integer `grouping` bit-mask column, PostgreSQL convention — a set
    // bit per rolled-up key, leftmost key = MSB -------------------------
    ("q_groupingsets_id", ((s, dir) =>
      dt(s, dir, "orders")
        .groupingSetsAgg(
          Seq("st" -> col("o_orderstatus"), "pr" -> col("o_orderpriority")),
          Seq(Seq("st", "pr"), Seq("st"), Seq.empty),
          Seq(count(lit(1)).as("n")),
          id = true).df): Q,
      Some("""SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS grouping,
             |  o_orderstatus AS st, o_orderpriority AS pr, count(*) AS n
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
             |                        (o_orderstatus), ())""".stripMargin)),

    ("q_groupingsets_expr", ((s, dir) =>
      dt(s, dir, "orders")
        .groupingSetsAgg(
          Seq("yr" -> year(col("o_orderdate")), "pr" -> col("o_orderpriority")),
          Seq(Seq("yr", "pr"), Seq("yr"), Seq.empty),
          Seq(count(lit(1)).as("n"), round(sum("o_totalprice"), 3).as("rev")),
          labels = Map("yr" -> lit(9999), "pr" -> lit("TOTAL"))).df): Q,
      Some("""SELECT
             |  CASE WHEN GROUPING(year(o_orderdate)) = 1 THEN 9999
             |       ELSE year(o_orderdate) END AS yr,
             |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'TOTAL'
             |       ELSE o_orderpriority END AS pr,
             |  count(*) AS n, round(sum(o_totalprice), 3) AS rev
             |FROM orders
             |GROUP BY GROUPING SETS ((year(o_orderdate), o_orderpriority),
             |                        (year(o_orderdate)), ())""".stripMargin)),

    // ---- lapply(.SD, f) unrolling (R/data.table.R:163-189) -------------
    // The reference unrolls the column-map closure; here the DSL maps the
    // aggregate over the .SDcols set at plan-build time — same rewrite.
    ("q_lapply_sd", ((s, dir) => {
      val sdcols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      dt(s, dir, "lineitem").df
        .groupBy(col("l_returnflag"))
        .agg(round(sum(sdcols.head), 3).as(s"sum_${sdcols.head}"),
          sdcols.tail.map(c => round(sum(c), 3).as(s"sum_$c")): _*)
    }): Q,
      Some("""SELECT l_returnflag,
             |  round(sum(l_quantity), 3) AS sum_l_quantity,
             |  round(sum(l_extendedprice), 3) AS sum_l_extendedprice,
             |  round(sum(l_discount), 3) AS sum_l_discount,
             |  round(sum(l_tax), 3) AS sum_l_tax
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- shift vector-n with give.names (R/shift.R) --------------------
    // shiftN generates the columns AND the reference's give.names names:
    // lag with ns=(1, 2, -1) emits <col>_lag_1, <col>_lag_2, <col>_lead_1
    // (negative n flips, #3223) — aliased here to the oracle's names
    ("q_shift_vector", ((s, dir) => {
      val w = Seq("o_custkey")
      val o = Seq(col("o_orderdate").asc, col("o_orderkey").asc)
      Windows.shiftN(dt(s, dir, "orders").df, Seq("o_totalprice"),
          Seq(1, 2, -1), w, o)
        .select(col("o_orderkey"),
          col("o_totalprice_lag_1").as("price_lag_1"),
          col("o_totalprice_lag_2").as("price_lag_2"),
          col("o_totalprice_lead_1").as("price_lead_1"))
    }): Q,
      Some("""SELECT o_orderkey,
             |  lag(o_totalprice, 1) OVER w AS price_lag_1,
             |  lag(o_totalprice, 2) OVER w AS price_lag_2,
             |  lead(o_totalprice, 1) OVER w AS price_lead_1
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)),

    // ---- nafill const (src/nafill.c) -----------------------------------
    ("q_nafill_const", ((s, dir) =>
      dt(s, dir, "events").df
        .withColumn("v", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
        .select(col("event_id"), Funcs.nafill(col("v"), lit(-999.0)).as("filled"))): Q,
      Some("""SELECT event_id,
             |  coalesce(CASE WHEN event_type = 'error' THEN NULL ELSE value END,
             |           -999.0) AS filled
             |FROM events""".stripMargin)),

    // ---- head(.SD, k) per group ascending (ghead, src/gsumm.c:1004) ----
    ("q_head_sd", ((s, dir) =>
      dt(s, dir, "orders")
        .topK(Seq("o_orderstatus"),
          Seq(col("o_orderdate").asc, col("o_orderkey").asc), 2)
        .select(col("o_orderstatus"), col("o_orderkey")).df): Q,
      Some("""SELECT o_orderstatus, o_orderkey
             |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
             |        ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
             |WHERE rn <= 2""".stripMargin)),

    // ---- composite pipeline: filter → update-join → agg → top-k --------
    // The "realistic workload" demonstration: four DSL stages chained,
    // still ONE Catalyst plan (filter pushdown through the join, partial
    // aggs, a single window for the top-k).
    ("q_pipeline", ((s, dir) =>
      dt(s, dir, "orders")(col("o_totalprice") > 50000)
        .set("segment", lit("UNKNOWN"))
        .updateJoin(
          dt(s, dir, "customer").selectNames("c_custkey", "c_mktsegment")
            .setNames("c_custkey" -> "o_custkey"),
          Seq("o_custkey"),
          "segment" -> col("c_mktsegment"))
        .groupAgg(Seq(col("segment")),
          Seq(round(sum(col("o_totalprice")), 3).as("rev"), count(lit(1)).as("n")))
        .topK(Seq.empty, Seq(col("rev").desc, col("segment").asc), 3, allowGlobal = true).df): Q,
      Some("""SELECT segment, rev, n FROM (
             |  SELECT CASE WHEN c_custkey IS NULL THEN 'UNKNOWN'
             |              ELSE c_mktsegment END AS segment,
             |         round(sum(o_totalprice), 3) AS rev, count(*) AS n
             |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
             |  WHERE o_totalprice > 50000
             |  GROUP BY 1)
             |ORDER BY rev DESC, segment ASC LIMIT 3""".stripMargin)),

    // ---- sort + limit (§2.6 forder/head) -------------------------------
    ("q_sort_limit", ((s, dir) =>
      dt(s, dir, "orders")
        .setorder(col("o_totalprice").desc, col("o_orderkey").asc)
        .head(100)
        .select(col("o_orderkey"), round(col("o_totalprice"), 3).as("o_totalprice")).df): Q,
      Some("""SELECT o_orderkey, round(o_totalprice, 3) AS o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin)),

    // ---- forder NA placement (src/forder.c:53 nalast=0: NA FIRST in
    // BOTH directions — Spark's bare desc would put nulls last). The
    // driver hash ignores row order, so the semantics are adjudicated
    // through the limit: with NA-first the null-keyed rows occupy the
    // top slots and survive the cut. ------------------------------------
    ("q_sort_na", ((s, dir) =>
      DT(dt(s, dir, "orders").df
          .withColumn("k", when(col("o_orderkey") % 97 === 0, lit(null))
            .otherwise(round(col("o_totalprice"), 3))))
        .setorderNa(Seq("k" -> false, "o_orderkey" -> true))
        .head(120)
        .select(col("o_orderkey"), col("k")).df): Q,
      Some("""SELECT o_orderkey, k FROM (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 97 = 0 THEN NULL
             |         ELSE round(o_totalprice, 3) END AS k
             |  FROM orders)
             |ORDER BY k DESC NULLS FIRST, o_orderkey ASC LIMIT 120""".stripMargin)),

    // ---- top-k per group (ghead idiom, src/gsumm.c:1004) ---------------
    ("q_topk", ((s, dir) =>
      dt(s, dir, "orders")
        .topK(Seq("o_orderpriority"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .select(col("o_orderpriority"), col("o_orderkey"),
          round(col("o_totalprice"), 3).as("o_totalprice")).df): Q,
      Some("""SELECT o_orderpriority, o_orderkey, round(o_totalprice, 3) AS o_totalprice
             |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
             |        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
             |WHERE rn <= 3""".stripMargin))
  )
}
