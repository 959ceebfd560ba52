package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Join operator queries (SURVEY.md §2.3). */
object QueriesJoins {
  import Queries.{Entry, Q}

  private def dt(s: SparkSession, dir: String, t: String) = DT(s, dir, t)

  def entries: Seq[Entry] = Seq(

    // ---- keyed equi join x[i] (src/bmerge.c) — customer ⋈ nation -------
    ("q_join_inner", ((s, dir) =>
      dt(s, dir, "customer")
        .joinExpr(dt(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"), "inner")
        .select(col("c_custkey"), col("c_name"), col("n_name")).df): Q,
      Some("""SELECT c_custkey, c_name, n_name FROM customer
             |JOIN nation ON c_nationkey = n_nationkey""".stripMargin)),

    // ---- merge(all.x=TRUE) — left join ---------------------------------
    ("q_join_left", ((s, dir) =>
      dt(s, dir, "orders")
        .joinExpr(dt(s, dir, "customer")(col("c_acctbal") > 5000),
          col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"), col("c_custkey"), col("c_name")).df): Q,
      Some("""SELECT o_orderkey, c_custkey, c_name FROM orders
             |LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
             |ON o_custkey = c_custkey""".stripMargin)),

    // ---- x[i] right-join semantics (i rows drive result) ---------------
    ("q_join_right", ((s, dir) =>
      dt(s, dir, "orders")
        .joinExpr(dt(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          round(col("o_totalprice"), 3).as("o_totalprice")).df): Q,
      Some("""SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 3) AS o_totalprice
             |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey""".stripMargin)),

    // ---- merge(all=TRUE) — full outer ----------------------------------
    ("q_join_full", ((s, dir) =>
      dt(s, dir, "orders")(col("o_totalprice") > 400000)
        .joinExpr(dt(s, dir, "customer")(col("c_acctbal") < 0),
          col("o_custkey") === col("c_custkey"), "full")
        .select(col("o_orderkey"), col("o_custkey"), col("c_custkey"), col("c_name")).df): Q,
      Some("""SELECT o_orderkey, o_custkey, c_custkey, c_name
             |FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
             |FULL JOIN (SELECT * FROM customer WHERE c_acctbal < 0) c
             |ON o_custkey = c_custkey""".stripMargin)),

    // ---- NA-joins-NA full outer (tests.Rraw 918/919, src/bmerge.c: NA
    // and NaN are ordinary joinable key values; SQL's null-never-matches
    // is the opt-OUT). Null keys are synthesized from custkey/nationkey
    // so both sides carry them; the oracle's IS NOT DISTINCT FROM is
    // DuckDB's spelling of <=>. The output key coalesces across sides —
    // null only for key values that were genuinely NA on both.
    ("q_join_na", ((s, dir) => {
      val x = dt(s, dir, "customer").df.select(col("c_custkey").as("id"),
        when(col("c_custkey") % 7 === 0, lit(null))
          .otherwise(col("c_custkey") % 5).as("dep"))
      val y = dt(s, dir, "nation").df.select(col("n_nationkey").as("nk"),
        when(col("n_nationkey") % 6 === 0, lit(null))
          .otherwise(col("n_nationkey") % 5).as("dep"))
      DT(x).join(DT(y), Seq("dep"), "full", nullSafe = true).df
    }): Q,
      Some("""WITH x AS (SELECT c_custkey AS id,
             |  CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey % 5 END AS dep
             |  FROM customer),
             |y AS (SELECT n_nationkey AS nk,
             |  CASE WHEN n_nationkey % 6 = 0 THEN NULL ELSE n_nationkey % 5 END AS dep
             |  FROM nation)
             |SELECT coalesce(x.dep, y.dep) AS dep, x.id, y.nk
             |FROM x FULL JOIN y ON x.dep IS NOT DISTINCT FROM y.dep""".stripMargin)),

    // ---- NA-joins-NA is the DEFAULT (round-9 decision) -----------------
    // Same synthesized null keys as q_join_na but through DT.join's
    // DEFAULT path (no nullSafe argument): since round 9 the default is
    // the reference's bmerge semantics, so the two NA rows must MATCH.
    // Left join so the kept key is x's (null only for x's genuine NAs).
    ("q_join_na_default", ((s, dir) => {
      val x = dt(s, dir, "customer").df.select(col("c_custkey").as("id"),
        when(col("c_custkey") % 7 === 0, lit(null))
          .otherwise(col("c_custkey") % 5).as("dep"))
      val y = dt(s, dir, "nation").df.select(col("n_nationkey").as("nk"),
        when(col("n_nationkey") % 6 === 0, lit(null))
          .otherwise(col("n_nationkey") % 5).as("dep"))
      DT(x).join(DT(y), Seq("dep"), "left").df
    }): Q,
      Some("""WITH x AS (SELECT c_custkey AS id,
             |  CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey % 5 END AS dep
             |  FROM customer),
             |y AS (SELECT n_nationkey AS nk,
             |  CASE WHEN n_nationkey % 6 = 0 THEN NULL ELSE n_nationkey % 5 END AS dep
             |  FROM nation)
             |SELECT x.dep AS dep, x.id, y.nk
             |FROM x LEFT JOIN y ON x.dep IS NOT DISTINCT FROM y.dep""".stripMargin)),

    // ---- not-join DT[!i] (R/data.table.R:764) --------------------------
    // Probe side restricted to 'F' orders so the anti set is NON-EMPTY
    // at every SF (every customer has some order, so the unrestricted
    // form hash-matched vacuously — round-10 verdict "zero-row oracle").
    ("q_join_anti", ((s, dir) =>
      dt(s, dir, "customer")
        .notJoin(dt(s, dir, "orders")(col("o_orderstatus") === "F")
          .setNames("o_custkey" -> "c_custkey"),
          Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name")).df): Q,
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderstatus = 'F')""".stripMargin)),

    // ---- semi join (mergelist how="semi") ------------------------------
    ("q_join_semi", ((s, dir) =>
      dt(s, dir, "customer")
        .semiJoin(dt(s, dir, "orders").setNames("o_custkey" -> "c_custkey"),
          Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name")).df): Q,
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)),

    // ---- non-equi join on=.(pk==pk, qty<size) (src/bmerge.c:20-24) -----
    ("q_join_nonequi", ((s, dir) =>
      dt(s, dir, "lineitem")
        .joinExpr(dt(s, dir, "part")(col("p_size") < 10),
          col("l_partkey") === col("p_partkey") && col("l_quantity") < col("p_size"),
          "inner")
        .groupAgg(Seq(col("p_brand")), Seq(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 3).as("qty"))).df): Q,
      Some("""SELECT p_brand, count(*) AS n, round(sum(l_quantity), 3) AS qty
             |FROM lineitem JOIN (SELECT * FROM part WHERE p_size < 10) p
             |ON l_partkey = p_partkey AND l_quantity < p_size
             |GROUP BY p_brand""".stripMargin)),

    // ---- mult="first" (src/bmerge.c:32) --------------------------------
    ("q_mult_first", ((s, dir) =>
      dt(s, dir, "lineitem")
        .joinMultAgg(dt(s, dir, "orders").selectNames("o_orderkey", "o_orderpriority")
            .setNames("o_orderkey" -> "l_orderkey"),
          Seq("l_orderkey"), "first", Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("o_orderpriority")).df): Q,
      Some("""SELECT o_orderkey AS l_orderkey, l_linenumber, l_partkey, o_orderpriority
             |FROM (SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber, l.l_partkey,
             |        row_number() OVER
             |        (PARTITION BY o.o_orderkey ORDER BY l.l_linenumber, l.l_partkey, l.l_suppkey) AS rn
             |      FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
             |WHERE rn = 1""".stripMargin)),

    // ---- mult="last" ----------------------------------------------------
    ("q_mult_last", ((s, dir) =>
      dt(s, dir, "lineitem")
        .joinMultAgg(dt(s, dir, "orders").selectNames("o_orderkey")
            .setNames("o_orderkey" -> "l_orderkey"),
          Seq("l_orderkey"), "last", Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey")).df): Q,
      Some("""SELECT o_orderkey AS l_orderkey, l_linenumber, l_partkey
             |FROM (SELECT o.o_orderkey, l.l_linenumber, l.l_partkey, row_number() OVER
             |        (PARTITION BY o.o_orderkey ORDER BY l.l_linenumber DESC, l.l_partkey DESC, l.l_suppkey DESC) AS rn
             |      FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
             |WHERE rn = 1""".stripMargin)),

    // ---- setNumericRounding join knob (man/setNumericRounding.Rd) ------
    // Two copies of the same prices, one perturbed by a relative 1e-14
    // (well below the 2-byte significand granule ≈ 1.5e-11): a plain
    // double-equality join finds nothing; rounding=2 joins them. The
    // oracle reproduces the mantissa rounding with exact power-of-two
    // arithmetic (scale to an integer significand, round-half-up on the
    // low 16 bits, scale back), so the rounded doubles hash-match
    // bit-for-bit.
    ("q_join_rounded", ((s, dir) => {
      val base = dt(s, dir, "lineitem")
        .selectNames("l_orderkey", "l_linenumber", "l_extendedprice")
        .setNames("l_extendedprice" -> "price")(col("l_orderkey") < 400)
      val perturbed = DT(base.df.withColumn("price",
        col("price") * (lit(1.0) + lit(1e-14))))
      base.join(perturbed, Seq("l_orderkey", "l_linenumber", "price"),
          rounding = 2)
        .select(col("l_orderkey"), col("l_linenumber"), col("price")).df
    }): Q,
      Some {
        val g = 1L << 16
        def rounded(v: String) =
          s"""(WITH t AS (SELECT $v AS v),
             |ex AS (SELECT v, CAST(floor(log2(abs(v))) AS BIGINT) AS e0 FROM t),
             |ec AS (SELECT v, CASE WHEN pow(2, e0 + 1) <= abs(v) THEN e0 + 1
             |                      WHEN pow(2, e0) > abs(v) THEN e0 - 1
             |                      ELSE e0 END AS e FROM ex),
             |mt AS (SELECT v, e, CAST(abs(v) * pow(2, 52 - e) AS BIGINT) AS m FROM ec),
             |rr AS (SELECT v, e, m, ((m + ${g / 2}) // $g) * $g AS r FROM mt),
             |fin AS (SELECT CASE WHEN NOT isfinite(sign(v) * r * pow(2, e - 52))
             |                    THEN sign(v) * ((m // $g) * $g) * pow(2, e - 52)
             |                    ELSE sign(v) * r * pow(2, e - 52) END AS res
             |        FROM rr)
             |SELECT CASE WHEN $v = 0 OR NOT isfinite($v) THEN $v ELSE res END
             |FROM fin)""".stripMargin
        s"""WITH base AS (
           |  SELECT l_orderkey, l_linenumber, l_extendedprice AS price
           |  FROM lineitem WHERE l_orderkey < 400),
           |pert AS (SELECT l_orderkey, l_linenumber,
           |           price * (1.0 + 1e-14) AS price FROM base),
           |ra AS (SELECT l_orderkey, l_linenumber, ${rounded("price")} AS price
           |       FROM base),
           |rb AS (SELECT l_orderkey, l_linenumber, ${rounded("price")} AS price
           |       FROM pert)
           |SELECT l_orderkey, l_linenumber, price
           |FROM ra JOIN rb USING (l_orderkey, l_linenumber, price)""".stripMargin
      }),

    // ---- by=.EACHI grouped join-aggregate (R/data.table.R:573) ---------
    ("q_eachi", ((s, dir) =>
      dt(s, dir, "customer")
        .joinExpr(dt(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"), "inner")
        .groupAgg(Seq(col("n_name")),
          Seq(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 3).as("bal"))).df): Q,
      Some("""SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 3) AS bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)),

    // ---- rolling/as-of join roll=TRUE (src/bmerge.c:13-17) -------------
    // For each click event: value of the user's latest purchase at-or-before.
    ("q_asof", ((s, dir) => {
      val ev = dt(s, dir, "events")
      val purchases = DT(ev(col("event_type") === "purchase").df
        .select(col("user_id"), col("ts"), col("value").as("purchase_value")))
      val clicks = DT(ev(col("event_type") === "click").df
        .select(col("event_id"), col("user_id"), col("ts")))
      purchases.asofJoin(clicks, Seq("user_id"), "ts", Joins.Locf, Seq("purchase_value"))
        .select(col("event_id"), col("purchase_value")).df
    }): Q,
      Some("""SELECT i.event_id,
             |  (SELECT x.value FROM events x
             |   WHERE x.event_type = 'purchase' AND x.user_id = i.user_id
             |     AND x.ts <= i.ts
             |   ORDER BY x.ts DESC LIMIT 1) AS purchase_value
             |FROM events i WHERE i.event_type = 'click'""".stripMargin)),

    // ---- skew-safe as-of tier (time-bucketed LOCF window) --------------
    // Same semantics and SAME ORACLE as q_asof, via asofSalted: the
    // (by, week-bucket) window + boundary-carry pass must reproduce the
    // single-window LOCF bit-for-bit — oracle-adjudicated, not just
    // spec-asserted.
    ("q_asof_salted", ((s, dir) => {
      val ev = dt(s, dir, "events")
      val purchases = DT(ev(col("event_type") === "purchase").df
        .select(col("user_id"), col("ts"), col("value").as("purchase_value")))
      val clicks = DT(ev(col("event_type") === "click").df
        .select(col("event_id"), col("user_id"), col("ts")))
      purchases.asofJoinSalted(clicks, Seq("user_id"), "ts",
          bucketWidth = 7 * 86400.0, valueCols = Seq("purchase_value"))
        .select(col("event_id"), col("purchase_value")).df
    }): Q,
      Some("""SELECT i.event_id,
             |  (SELECT x.value FROM events x
             |   WHERE x.event_type = 'purchase' AND x.user_id = i.user_id
             |     AND x.ts <= i.ts
             |   ORDER BY x.ts DESC LIMIT 1) AS purchase_value
             |FROM events i WHERE i.event_type = 'click'""".stripMargin)),

    // ---- roll=-Inf NOCB -------------------------------------------------
    ("q_asof_nocb", ((s, dir) => {
      val ev = dt(s, dir, "events")
      val purchases = DT(ev(col("event_type") === "purchase").df
        .select(col("user_id"), col("ts"), col("value").as("next_value")))
      val clicks = DT(ev(col("event_type") === "click").df
        .select(col("event_id"), col("user_id"), col("ts")))
      purchases.asofJoin(clicks, Seq("user_id"), "ts", Joins.Nocb, Seq("next_value"))
        .select(col("event_id"), col("next_value")).df
    }): Q,
      Some("""SELECT i.event_id,
             |  (SELECT x.value FROM events x
             |   WHERE x.event_type = 'purchase' AND x.user_id = i.user_id
             |     AND x.ts >= i.ts
             |   ORDER BY x.ts ASC LIMIT 1) AS next_value
             |FROM events i WHERE i.event_type = 'click'""".stripMargin)),

    // ---- roll="nearest" -------------------------------------------------
    ("q_asof_nearest", ((s, dir) => {
      val ev = dt(s, dir, "events")
      val purchases = DT(ev(col("event_type") === "purchase").df
        .select(col("user_id"), col("ts"), col("value").as("near_value")))
      val clicks = DT(ev(col("event_type") === "click").df
        .select(col("event_id"), col("user_id"), col("ts")))
      purchases.asofJoin(clicks, Seq("user_id"), "ts", Joins.Nearest, Seq("near_value"))
        .select(col("event_id"), col("near_value")).df
    }): Q,
      Some("""SELECT i.event_id,
             |  (SELECT x.value FROM events x
             |   WHERE x.event_type = 'purchase' AND x.user_id = i.user_id
             |   ORDER BY abs(epoch_us(x.ts) - epoch_us(i.ts)) ASC, x.ts ASC LIMIT 1) AS near_value
             |FROM events i WHERE i.event_type = 'click'""".stripMargin)),

    // ---- foverlaps (R/foverlaps.R) -------------------------------------
    // part price window [p-10, p+10] × customer balance window [b, b+5].
    ("q_overlap", ((s, dir) => {
      val x = DT(dt(s, dir, "part").df.select(col("p_partkey"), col("p_brand"),
        (col("p_retailprice") - 10).as("xs"), (col("p_retailprice") + 10).as("xe")))
      val y = DT(dt(s, dir, "customer").df.select(col("c_custkey"),
        col("c_acctbal").as("ys"), (col("c_acctbal") + 5).as("ye")))
      x.overlapJoin(y, Nil, "xs", "xe", "ys", "ye", "any")
        .groupAgg(Seq(col("p_brand")), Seq(count(lit(1)).as("n"))).df
    }): Q,
      Some("""SELECT p_brand, count(*) AS n
             |FROM part, customer
             |WHERE p_retailprice - 10 <= c_acctbal + 5
             |  AND c_acctbal <= p_retailprice + 10
             |GROUP BY p_brand""".stripMargin)),

    // ---- foverlaps binned scale path (SURVEY.md §4.2 item 3) -----------
    ("q_overlap_binned", ((s, dir) => {
      val x = dt(s, dir, "part").df.select(col("p_partkey"), col("p_brand"),
        (col("p_retailprice") - 10).as("xs"), (col("p_retailprice") + 10).as("xe"))
      val y = dt(s, dir, "customer").df.select(col("c_custkey"),
        col("c_acctbal").as("ys"), (col("c_acctbal") + 5).as("ye"))
      DT(Joins.overlapBinned(x, y, Nil, "xs", "xe", "ys", "ye", binWidth = 32))
        .groupAgg(Seq(col("p_brand")), Seq(count(lit(1)).as("n"))).df
    }): Q,
      Some("""SELECT p_brand, count(*) AS n
             |FROM part, customer
             |WHERE p_retailprice - 10 <= c_acctbal + 5
             |  AND c_acctbal <= p_retailprice + 10
             |GROUP BY p_brand""".stripMargin)),

    // ---- foverlaps mult=first (earliest-starting match per x row) ------
    ("q_overlap_mult", ((s, dir) => {
      val x = DT(dt(s, dir, "part").df.select(col("p_partkey"), col("p_brand"),
        (col("p_retailprice") - 10).as("xs"), (col("p_retailprice") + 10).as("xe")))
      val y = DT(dt(s, dir, "customer").df.select(col("c_custkey"),
        col("c_acctbal").as("ys"), (col("c_acctbal") + 5).as("ye")))
      // output only tie-insensitive columns: equal (ys,ye) matches are
      // interchangeable, so the matched start value is deterministic
      x.overlapJoinMult(y, Nil, "xs", "xe", "ys", "ye", "any", mult = "first")
        .df.select(col("p_partkey"), col("p_brand"), col("ys"))
    }): Q,
      Some("""SELECT p_partkey, p_brand, min(c_acctbal) AS ys
             |FROM part, customer
             |WHERE p_retailprice - 10 <= c_acctbal + 5
             |  AND c_acctbal <= p_retailprice + 10
             |GROUP BY p_partkey, p_brand""".stripMargin)),

    // ---- foverlaps type="within" x mult="last" (R/foverlaps.R) ---------
    ("q_overlap_within_mult", ((s, dir) => {
      val x = DT(dt(s, dir, "part").df.select(col("p_partkey"), col("p_brand"),
        (col("p_retailprice") - 1).as("xs"), (col("p_retailprice") + 1).as("xe")))
      val y = DT(dt(s, dir, "customer").df.select(col("c_custkey"),
        (col("c_acctbal") - 50).as("ys"), (col("c_acctbal") + 50).as("ye")))
      // within: [xs, xe] inside [ys, ye]; mult=last keeps the
      // greatest-(ys, ye) match; (ys, ye) move together here so the
      // matched start is the max — tie-insensitive output columns only
      x.overlapJoinMult(y, Nil, "xs", "xe", "ys", "ye", "within", mult = "last")
        .df.select(col("p_partkey"), col("p_brand"), col("ys"))
    }): Q,
      Some("""SELECT p_partkey, p_brand, max(c_acctbal - 50) AS ys
             |FROM part, customer
             |WHERE p_retailprice - 1 >= c_acctbal - 50
             |  AND p_retailprice + 1 <= c_acctbal + 50
             |GROUP BY p_partkey, p_brand""".stripMargin)),

    // ---- foverlaps which=TRUE (id pairs only) --------------------------
    ("q_overlap_which", ((s, dir) => {
      val x = DT(dt(s, dir, "part").df.select(col("p_partkey"),
        (col("p_retailprice") - 10).as("xs"), (col("p_retailprice") + 10).as("xe")))
      val y = DT(dt(s, dir, "customer").df.select(col("c_custkey"),
        col("c_acctbal").as("ys"), (col("c_acctbal") + 5).as("ye")))
      x.overlapJoinWhich(y, Nil, "xs", "xe", "ys", "ye",
        "p_partkey", "c_custkey").df
    }): Q,
      Some("""SELECT p_partkey, c_custkey
             |FROM part, customer
             |WHERE p_retailprice - 10 <= c_acctbal + 5
             |  AND c_acctbal <= p_retailprice + 10""".stripMargin)),

    // ---- CJ cross join (src/cj.c) --------------------------------------
    ("q_cross", ((s, dir) =>
      dt(s, dir, "region").selectNames("r_name")
        .crossJoin(dt(s, dir, "nation").selectNames("n_name")).df): Q,
      Some("SELECT r_name, n_name FROM region CROSS JOIN nation")),

    // ---- mergelist with per-step on=/how=/mult= (R/mergelist.R:284) ----
    // Step 1 joins lineitem on orderkey with mult="first" (one
    // lexicographic-representative line per order); step 2 joins
    // customer on a DIFFERENT key (custkey) with how="left". The oracle
    // mirrors mult="first" as a row_number window over the same payload
    // order.
    ("q_mergelist_steps", ((s, dir) => {
      val t1 = dt(s, dir, "orders").selectNames("o_orderkey", "o_custkey")
        .setNames("o_orderkey" -> "orderkey", "o_custkey" -> "custkey")(
          col("orderkey") < 1000)
      val t2 = dt(s, dir, "lineitem")
        .selectNames("l_orderkey", "l_linenumber", "l_extendedprice")
        .setNames("l_orderkey" -> "orderkey", "l_linenumber" -> "linenumber",
          "l_extendedprice" -> "price")
      val t3 = dt(s, dir, "customer").selectNames("c_custkey", "c_name")
        .setNames("c_custkey" -> "custkey", "c_name" -> "name")
      Joins.mergelistSteps(Seq(t1.df, t2.df, t3.df), Seq(
          Joins.MergeStep(Seq("orderkey"), "inner", "first"),
          Joins.MergeStep(Seq("custkey"), "left")))
        .select(col("orderkey"), col("custkey"), col("linenumber"),
          round(col("price"), 3).as("price"), col("name"))
    }): Q,
      Some("""WITH t1 AS (SELECT o_orderkey AS orderkey, o_custkey AS custkey
             |            FROM orders WHERE o_orderkey < 1000),
             |t2 AS (SELECT orderkey, linenumber, price FROM (
             |  SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
             |    l_extendedprice AS price,
             |    row_number() OVER (PARTITION BY l_orderkey
             |      ORDER BY l_linenumber, l_extendedprice) AS rn
             |  FROM lineitem) WHERE rn = 1),
             |t3 AS (SELECT c_custkey AS custkey, c_name AS name FROM customer)
             |SELECT orderkey, custkey, linenumber, round(price, 3) AS price, name
             |FROM t1 JOIN t2 USING (orderkey) LEFT JOIN t3 USING (custkey)""".stripMargin)),

    // ---- merge.data.table surface (R/merge.R): by.x/by.y keys with
    // x's names kept, clashing payload suffixed .x/.y, sorted output --
    ("q_merge_suffixes", ((s, dir) => {
      val x = dt(s, dir, "orders")
        .selectNames("o_orderkey", "o_custkey", "o_totalprice")
        .setNames("o_totalprice" -> "amount").df
      val y = dt(s, dir, "customer")
        .selectNames("c_custkey", "c_acctbal")
        .setNames("c_acctbal" -> "amount").df
      DT(x).merge(DT(y), byX = Seq("o_custkey"), byY = Seq("c_custkey"),
          allX = true)
        .df.select(col("o_orderkey"), col("o_custkey"),
          round(col("`amount.x`"), 3).as("amount_x"),
          round(col("`amount.y`"), 3).as("amount_y"))
    }): Q,
      Some("""SELECT o_orderkey, o_custkey,
             |  round(o_totalprice, 3) AS amount_x,
             |  round(c_acctbal, 3) AS amount_y
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin)),

    // ---- mergelist how="right": mult applies to the LHS lookup side ----
    // (R/mergelist.R:160-172 join_from/join_to swap; other.Rraw SQLite
    // tester). lineitem is the multi-match LHS — mult="first" reduces
    // it to one lexicographic representative per orderkey, and every
    // RHS (orders) row survives.
    ("q_mergelist_right", ((s, dir) => {
      val li = dt(s, dir, "lineitem")
        .selectNames("l_orderkey", "l_linenumber", "l_extendedprice")
        .setNames("l_orderkey" -> "orderkey", "l_linenumber" -> "linenumber",
          "l_extendedprice" -> "price")
      val ords = dt(s, dir, "orders").selectNames("o_orderkey", "o_orderstatus")
        .setNames("o_orderkey" -> "orderkey", "o_orderstatus" -> "status")(
          col("orderkey") < 2000)
      Joins.mergelistSteps(Seq(li.df, ords.df), Seq(
          Joins.MergeStep(Seq("orderkey"), "right", "first")))
        .select(col("orderkey"), col("linenumber"),
          round(col("price"), 3).as("price"), col("status"))
    }): Q,
      Some("""WITH li AS (SELECT orderkey, linenumber, price FROM (
             |  SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
             |    l_extendedprice AS price,
             |    row_number() OVER (PARTITION BY l_orderkey
             |      ORDER BY l_linenumber, l_extendedprice) AS rn
             |  FROM lineitem) WHERE rn = 1),
             |o AS (SELECT o_orderkey AS orderkey, o_orderstatus AS status
             |      FROM orders WHERE o_orderkey < 2000)
             |SELECT orderkey, linenumber, round(price, 3) AS price, status
             |FROM li RIGHT JOIN o USING (orderkey)""".stripMargin)),

    // ---- mergelist fold (R/mergelist.R:260) ----------------------------
    ("q_mergelist", ((s, dir) =>
      dt(s, dir, "supplier")
        .joinExpr(dt(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"), "inner")
        .joinExpr(dt(s, dir, "region"), col("n_regionkey") === col("r_regionkey"), "inner")
        .groupAgg(Seq(col("r_name")),
          Seq(count(lit(1)).as("n_supp"), round(sum(col("s_acctbal")), 3).as("bal"))).df): Q,
      Some("""SELECT r_name, count(*) AS n_supp, round(sum(s_acctbal), 3) AS bal
             |FROM supplier
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name""".stripMargin))
  )
}
