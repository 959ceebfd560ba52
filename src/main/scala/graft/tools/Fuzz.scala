package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.Random

import graft.DT
import graft.operators.{Joins, Windows}

/** Differential query fuzzer against the DuckDB oracle (VERDICT r18
  * "Next round" #1): generate random-but-deterministic DT[i, j, by] /
  * join / mult / window / as-of queries TOGETHER with the equivalent
  * ANSI SQL, dump them in the exact `graft.Verify` layout, and let
  * `tools/compare_oracle.py` adjudicate with the driver's own strict
  * comparator. The reference validates these interaction corners with
  * a 21,976-line hand-built corpus (inst/tests/tests.Rraw); this
  * automates the same sweep over the engine's own operator layer.
  *
  * Determinism contract: case `fz_<seed>_<i>` is a pure function of
  * (seed, i) — `scala.util.Random`'s algorithm is fixed by the
  * java.util.Random spec, so a divergence found at any (seed, i) is
  * reproducible forever and becomes a numbered regression test.
  *
  * Exactness policy (the comparator is stringified-value STRICT):
  *  - every SUM flows through DECIMAL(18,2) on BOTH sides — exact and
  *    order-independent, immune to fp summation-order ulps;
  *  - means are exact-decimal-sum ÷ non-null-count with one final
  *    double division (IEEE-deterministic given identical operands);
  *  - min/max/count/count-distinct compare raw (no summation);
  *  - NULL salting is arithmetic (`pk % m = r`), never hash-based, so
  *    both engines salt the identical rows.
  *
  * Oracle dialect: the common ANSI subset of DuckDB and Spark SQL —
  * `sparkSqlOk = true` cases also run under `spark.sql` for the
  * in-suite smoke tier (FuzzSpec); as-of cases use the ORDER BY/LIMIT 1
  * correlated-subquery shape (q_asof's oracle) that only DuckDB
  * supports and are external-sweep-only.
  *
  * Usage: `runMain graft.tools.Fuzz <sfDir> <outDir> [count] [seed]`,
  * then `python3 tools/compare_oracle.py <sfDir> <outDir>`.
  */
object Fuzz {

  type Build = (SparkSession, String) => DataFrame

  final case class FuzzCase(name: String, shape: String, sql: String,
                            sparkSqlOk: Boolean, build: Build)

  // ---- table metadata (domains/ranges per TESTDATA.md synthetics) -----

  final case class TMeta(name: String, pk: String, cols: Seq[String],
                         decCols: Seq[String],
                         strCols: Seq[(String, Seq[String])],
                         keyCols: Seq[String], tsCols: Seq[String],
                         tsYears: (Int, Int))

  private val lineitem = TMeta("lineitem", "l_orderkey",
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"),
    decCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    strCols = Seq("l_linestatus" -> Seq("O", "F"),
      "l_returnflag" -> Seq("A", "N", "R")),
    keyCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
    tsCols = Seq("l_shipdate"), tsYears = (1995, 2001))

  private val orders = TMeta("orders", "o_orderkey",
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    decCols = Seq("o_totalprice"),
    strCols = Seq("o_orderstatus" -> Seq("F", "O", "P"),
      "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")),
    keyCols = Seq("o_orderkey", "o_custkey"),
    tsCols = Seq("o_orderdate"), tsYears = (1995, 2001))

  private val customer = TMeta("customer", "c_custkey",
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    decCols = Seq("c_acctbal"),
    strCols = Seq("c_mktsegment" -> Seq("AUTOMOBILE", "BUILDING",
      "FURNITURE", "HOUSEHOLD", "MACHINERY")),
    keyCols = Seq("c_custkey", "c_nationkey"),
    tsCols = Nil, tsYears = (0, 0))

  private val events = TMeta("events", "event_id",
    Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    decCols = Seq("value"),
    strCols = Seq("event_type" -> Seq("signup", "click", "error", "view",
      "purchase")),
    keyCols = Seq("event_id", "user_id"),
    tsCols = Seq("ts"), tsYears = (0, 0)) // ts range not pinned: no ts atoms

  private val decRange: Map[String, (Double, Double)] = Map(
    "l_quantity" -> (1.0, 50.0), "l_extendedprice" -> (1000.0, 90000.0),
    "l_discount" -> (0.0, 0.1), "l_tax" -> (0.0, 0.08),
    "o_totalprice" -> (2000.0, 450000.0), "value" -> (1.0, 300.0),
    "c_acctbal" -> (-800.0, 9900.0))

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  // ---- NULL salting ----------------------------------------------------

  /** NULL out `colName` wherever `pk % m == rem` — arithmetic, so both
    * engines salt the identical rows (a hash-based rule would diverge).
    */
  final case class Salt(colName: String, m: Int, rem: Int)

  private def pickSalt(r: Random, cands: Seq[String]): Option[Salt] =
    if (cands.isEmpty || r.nextInt(3) == 0) None
    else Some(Salt(pick(r, cands), pick(r, Seq(5, 7, 11)),
      r.nextInt(3)))

  private def saltDf(df: DataFrame, t: TMeta, s: Option[Salt]): DataFrame =
    s.fold(df)(x => df.withColumn(x.colName,
      when(col(t.pk) % x.m === x.rem, lit(null)).otherwise(col(x.colName))))

  /** Table expression with the salt applied — a plain name when
    * unsalted, else a derived table re-projecting every column. */
  private def saltSql(t: TMeta, s: Option[Salt]): String =
    s.fold(t.name)(x =>
      "(SELECT " + t.cols.map { c =>
        if (c == x.colName)
          s"CASE WHEN ${t.pk} % ${x.m} = ${x.rem} THEN NULL ELSE $c END AS $c"
        else c
      }.mkString(", ") + s" FROM ${t.name})")

  // ---- predicate atoms -------------------------------------------------

  private def atom(r: Random, t: TMeta, salt: Option[Salt]): (Column, String) =
    r.nextInt(10) match {
      case 0 | 1 | 2 =>
        val c = pick(r, t.decCols)
        val (lo, hi) = decRange(c)
        val k = math.rint((lo + r.nextDouble() * (hi - lo)) * 100) / 100
        pick(r, Seq(">", ">=", "<", "<=")) match {
          case ">"  => (col(c) > k, s"$c > $k")
          case ">=" => (col(c) >= k, s"$c >= $k")
          case "<"  => (col(c) < k, s"$c < $k")
          case _    => (col(c) <= k, s"$c <= $k")
        }
      case 3 | 4 =>
        val (c, dom) = pick(r, t.strCols)
        if (r.nextBoolean() || dom.size < 3) {
          val v = pick(r, dom)
          (col(c) === v, s"$c = '$v'")
        } else {
          val sub = r.shuffle(dom).take(1 + r.nextInt(dom.size - 1)).sorted
          (col(c).isin(sub: _*),
            s"$c IN (${sub.map(v => s"'$v'").mkString(", ")})")
        }
      case 5 | 6 =>
        // key-mod bucket: scale-free selectivity at any sf
        val c = pick(r, t.keyCols)
        val m = pick(r, Seq(3, 5, 7, 10))
        val v = r.nextInt(m)
        pick(r, Seq("=", "<", "<>")) match {
          case "="  => (col(c) % m === v, s"$c % $m = $v")
          case "<"  => (col(c) % m < v, s"$c % $m < $v")
          case _    => (col(c) % m =!= v, s"$c % $m <> $v")
        }
      case 7 if t.tsYears != ((0, 0)) =>
        val c = pick(r, t.tsCols)
        val y = t.tsYears._1 + r.nextInt(t.tsYears._2 - t.tsYears._1 + 1)
        val mo = 1 + r.nextInt(12)
        val litS = f"$y%04d-$mo%02d-01 00:00:00"
        if (r.nextBoolean())
          (col(c) >= lit(litS).cast("timestamp"), s"$c >= TIMESTAMP '$litS'")
        else (col(c) < lit(litS).cast("timestamp"), s"$c < TIMESTAMP '$litS'")
      case 8 if salt.isDefined =>
        val c = salt.get.colName
        if (r.nextBoolean()) (col(c).isNotNull, s"$c IS NOT NULL")
        else (col(c).isNull, s"$c IS NULL")
      case _ =>
        val c = pick(r, t.decCols)
        val (lo, hi) = decRange(c)
        val k = math.rint((lo + r.nextDouble() * (hi - lo)) * 100) / 100
        (col(c) >= k, s"$c >= $k")
    }

  private def genPred(r: Random, t: TMeta,
                      salt: Option[Salt]): (Column, String) = {
    val n = 1 + r.nextInt(3)
    val as = Seq.fill(n)(atom(r, t, salt))
    n match {
      case 1 => as.head
      case 2 =>
        if (r.nextBoolean())
          (as(0)._1 && as(1)._1, s"(${as(0)._2}) AND (${as(1)._2})")
        else (as(0)._1 || as(1)._1, s"(${as(0)._2}) OR (${as(1)._2})")
      case _ =>
        if (r.nextBoolean())
          (as(0)._1 && as(1)._1 || as(2)._1,
            s"((${as(0)._2}) AND (${as(1)._2})) OR (${as(2)._2})")
        else ((as(0)._1 || as(1)._1) && as(2)._1,
          s"((${as(0)._2}) OR (${as(1)._2})) AND (${as(2)._2})")
    }
  }

  // ---- aggregate library ------------------------------------------------

  private def decSum(c: String): Column =
    sum(col(c).cast("decimal(18,2)"))
  private def decSumSql(c: String): String =
    s"SUM(CAST($c AS DECIMAL(18,2)))"

  private def genAggExpr(r: Random, t: TMeta, alias: String): (Column, String) =
    r.nextInt(9) match {
      case 0 =>
        (count(lit(1)).as(alias), s"COUNT(*) AS $alias")
      case 1 =>
        val c = pick(r, t.cols.filterNot(_ == "props"))
        (count(col(c)).as(alias), s"COUNT($c) AS $alias")
      case 2 =>
        val c = pick(r, t.strCols.map(_._1) ++ t.keyCols)
        (countDistinct(col(c)).as(alias), s"COUNT(DISTINCT $c) AS $alias")
      case 3 | 4 =>
        val c = pick(r, t.decCols)
        (decSum(c).cast("double").as(alias),
          s"CAST(${decSumSql(c)} AS DOUBLE) AS $alias")
      case 5 =>
        val c = pick(r, t.decCols)
        if (r.nextBoolean()) (min(col(c)).as(alias), s"MIN($c) AS $alias")
        else (max(col(c)).as(alias), s"MAX($c) AS $alias")
      case 6 =>
        val c = pick(r, t.strCols.map(_._1))
        if (r.nextBoolean()) (min(col(c)).as(alias), s"MIN($c) AS $alias")
        else (max(col(c)).as(alias), s"MAX($c) AS $alias")
      case 7 =>
        // mean = exact decimal sum ÷ non-null count, ONE double division.
        // An all-null group is NULL/0.0 = NULL in both engines.
        val c = pick(r, t.decCols)
        ((decSum(c).cast("double") / count(col(c)).cast("double")).as(alias),
          s"CAST(${decSumSql(c)} AS DOUBLE) / CAST(COUNT($c) AS DOUBLE) AS $alias")
      case _ =>
        // arith over two exact sums
        val c1 = pick(r, t.decCols)
        val c2 = pick(r, t.decCols)
        if (r.nextBoolean())
          ((decSum(c1) + decSum(c2)).cast("double").as(alias),
            s"CAST(${decSumSql(c1)} + ${decSumSql(c2)} AS DOUBLE) AS $alias")
        else ((decSum(c1) - decSum(c2)).cast("double").as(alias),
          s"CAST(${decSumSql(c1)} - ${decSumSql(c2)} AS DOUBLE) AS $alias")
    }

  private def genBy(r: Random, t: TMeta): Seq[(Column, String)] = {
    val nBy = r.nextInt(3) // 0..2 grouping expressions
    val strs = r.shuffle(t.strCols.map(_._1)).map(c => (col(c), c))
    val mods = r.shuffle(t.keyCols).take(1).map { c =>
      val m = 2 + r.nextInt(9)
      ((col(c) % m).as(s"g_$c"), s"$c % $m AS g_$c")
    }
    r.shuffle(strs ++ mods).take(nBy)
  }

  // ---- shape A: DT[i, j, by] — filter + grouped aggregate ---------------

  private def genAggCase(r: Random, name: String): FuzzCase = {
    val t = pick(r, Seq(lineitem, orders, events))
    val salt = pickSalt(r, t.decCols)
    val (pc, ps) = genPred(r, t, salt)
    val by = genBy(r, t)
    val aggs = (0 until 1 + r.nextInt(3)).map(k => genAggExpr(r, t, s"a$k"))
    val build: Build = (s, dir) => {
      val base = saltDf(DT(s, dir, t.name).df, t, salt)
      val d = DT(base)
      if (by.isEmpty) d(pc).groupAgg(Nil, aggs.map(_._1)).df
      else d(pc, aggs.map(_._1), by.map(_._1)).df
    }
    val sel = (by.map(_._2) ++ aggs.map(_._2)).mkString(", ")
    val grp =
      if (by.isEmpty) "" else "\nGROUP BY " + (1 to by.size).mkString(", ")
    FuzzCase(name, "agg",
      s"SELECT $sel\nFROM ${saltSql(t, salt)} t\nWHERE $ps$grp",
      sparkSqlOk = true, build)
  }

  // ---- shape B: x[i] joins (inner/left/full/semi/anti) + post-agg -------

  private def genJoinCase(r: Random, name: String): FuzzCase = {
    val how = pick(r, Seq("inner", "left", "full", "semi", "anti"))
    val xSalt = pickSalt(r, lineitem.decCols)
    val (xpC, xpS) =
      if (r.nextBoolean()) genPred(r, lineitem, xSalt) else (lit(true), "1=1")
    val (ipC, ipS) =
      if (r.nextBoolean()) genPred(r, orders, None) else (lit(true), "1=1")
    val byX = pick(r, Seq("l_returnflag", "l_linestatus"))
    val keepsI = how == "inner" || how == "left" || how == "full"
    val withICol = keepsI && r.nextBoolean()
    val aggs: Seq[(Column, String)] = Seq(
      (count(lit(1)).as("n"), "COUNT(*) AS n"),
      (decSum("l_quantity").cast("double").as("sq"),
        s"CAST(${decSumSql("l_quantity")} AS DOUBLE) AS sq")) ++
      (if (withICol)
        Seq((decSum("o_totalprice").cast("double").as("st"),
          s"CAST(${decSumSql("o_totalprice")} AS DOUBLE) AS st"))
      else Nil)
    val build: Build = (s, dir) => {
      val x = saltDf(DT(s, dir, "lineitem").df, lineitem, xSalt).filter(xpC)
      val i = DT(s, dir, "orders").df.filter(ipC)
        .withColumnRenamed("o_orderkey", "l_orderkey")
      DT(x).join(DT(i), Seq("l_orderkey"), how).df
        .groupBy(col(byX)).agg(aggs.head._1, aggs.tail.map(_._1): _*)
    }
    val xSql = s"(SELECT * FROM ${saltSql(lineitem, xSalt)} tx WHERE $xpS)"
    val iSql = "(SELECT o_orderkey AS l_orderkey, o_custkey, o_orderstatus," +
      s" o_totalprice, o_orderdate, o_orderpriority FROM orders WHERE $ipS)"
    val fromSql = how match {
      case "inner" => s"FROM $xSql x JOIN $iSql i USING (l_orderkey)"
      case "left"  => s"FROM $xSql x LEFT JOIN $iSql i USING (l_orderkey)"
      case "full"  => s"FROM $xSql x FULL JOIN $iSql i USING (l_orderkey)"
      case "semi"  =>
        s"FROM $xSql x WHERE x.l_orderkey IN (SELECT l_orderkey FROM $iSql i)"
      case _ =>
        s"FROM $xSql x WHERE x.l_orderkey NOT IN (SELECT l_orderkey FROM $iSql i)"
    }
    val sel = (byX +: aggs.map(_._2)).mkString(", ")
    FuzzCase(name, s"join_$how", s"SELECT $sel\n$fromSql\nGROUP BY 1",
      sparkSqlOk = true, build)
  }

  // ---- shape C: mult=first/last (one x row per probe row) ---------------

  private def genMultCase(r: Random, name: String): FuzzCase = {
    val mult = pick(r, Seq("first", "last"))
    val (xpC, xpS) =
      if (r.nextBoolean()) genPred(r, lineitem, None) else (lit(true), "1=1")
    val (ipC, ipS) =
      if (r.nextBoolean()) genPred(r, orders, None) else (lit(true), "1=1")
    val useAgg = r.nextBoolean() // min_by/max_by tier vs window tier
    val build: Build = (s, dir) => {
      val x = DT(DT(s, dir, "lineitem").df.filter(xpC))
      val i = DT(DT(s, dir, "orders").df.filter(ipC)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")))
      val ord = Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      val res =
        if (useAgg) x.joinMultAgg(i, Seq("l_orderkey"), mult, ord)
        else x.joinMult(i, Seq("l_orderkey"), mult, ord, probeUnique = true)
      res.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("o_orderpriority")).df
    }
    val d = if (mult == "first") "" else " DESC"
    val sql =
      s"""SELECT o_orderkey AS l_orderkey, l_linenumber, l_partkey, o_orderpriority
         |FROM (SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber, l.l_partkey,
         |        row_number() OVER (PARTITION BY o.o_orderkey
         |          ORDER BY l.l_linenumber$d, l.l_partkey$d, l.l_suppkey$d) AS rn
         |      FROM (SELECT * FROM orders WHERE $ipS) o
         |      LEFT JOIN (SELECT * FROM lineitem WHERE $xpS) l
         |        ON l.l_orderkey = o.o_orderkey) j
         |WHERE rn = 1""".stripMargin
    FuzzCase(name, s"mult_$mult", sql, sparkSqlOk = true, build)
  }

  // ---- shape D: windows (shift / cum / froll) on events ------------------

  private def genWindowCase(r: Random, name: String): FuzzCase = {
    val t = events
    val salt = pickSalt(r, Seq("value"))
    val (pc, ps) =
      if (r.nextBoolean()) genPred(r, t, salt) else (lit(true), "1=1")
    val by = pick(r, Seq("user_id", "event_type"))
    val from = s"(SELECT * FROM ${saltSql(t, salt)} te WHERE $ps) t"
    r.nextInt(3) match {
      case 0 =>
        val n = 1 + r.nextInt(3)
        val lead0 = r.nextBoolean()
        val build: Build = (s, dir) =>
          Windows.shiftDF(saltDf(DT(s, dir, "events").df, t, salt).filter(pc),
              "out", col("value"), if (lead0) -n else n, Seq(by),
              Seq(col("event_id").asc))
            .select(col("event_id"), col("out"))
        val fn = if (lead0) "LEAD" else "LAG"
        FuzzCase(name, "shift",
          s"SELECT event_id, $fn(value, $n) OVER " +
            s"(PARTITION BY $by ORDER BY event_id) AS out\nFROM $from",
          sparkSqlOk = true, build)
      case 1 =>
        val fn = pick(r, Seq("sum", "min", "max"))
        val naRm = r.nextBoolean()
        val build: Build = (s, dir) =>
          Windows.cumDF(saltDf(DT(s, dir, "events").df, t, salt).filter(pc),
              "out", fn, col("value").cast("decimal(18,2)"), Seq(by),
              Seq(col("event_id").asc), naRm = naRm)
            .select(col("event_id"), col("out").cast("double").as("out"))
        val w = s"(PARTITION BY $by ORDER BY event_id ROWS UNBOUNDED PRECEDING)"
        val agg = s"${fn.toUpperCase}(CAST(value AS DECIMAL(18,2))) OVER $w"
        // naRm=false restores the reference's NA-poisoning (an NA poisons
        // every position from itself on); SQL window aggs skip NULLs, so
        // the oracle masks with the same prefix null-count guard.
        val body =
          if (naRm) s"CAST($agg AS DOUBLE)"
          else s"CASE WHEN COUNT(value) OVER $w < COUNT(*) OVER $w " +
            s"THEN NULL ELSE CAST($agg AS DOUBLE) END"
        FuzzCase(name, s"cum_$fn",
          s"SELECT event_id, $body AS out\nFROM $from",
          sparkSqlOk = true, build)
      case _ =>
        val fn = pick(r, Seq("sum", "min", "max"))
        val n = 2 + r.nextInt(5)
        val build: Build = (s, dir) =>
          Windows.frollDF(saltDf(DT(s, dir, "events").df, t, salt).filter(pc),
              "out", fn, col("value").cast("decimal(18,2)"), n, Seq(by),
              Seq(col("event_id").asc))
            .select(col("event_id"), col("out").cast("double").as("out"))
        val w = s"(PARTITION BY $by ORDER BY event_id " +
          s"ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)"
        // partial=false: incomplete leading windows are NULL; naRm=false:
        // any NULL inside the window is NULL — both folded into one
        // COUNT(value) OVER w = n guard (count(value) skips NULLs).
        val agg = s"${fn.toUpperCase}(CAST(value AS DECIMAL(18,2))) OVER $w"
        FuzzCase(name, s"froll_$fn",
          s"SELECT event_id, CASE WHEN COUNT(value) OVER $w = $n " +
            s"THEN CAST($agg AS DOUBLE) END AS out\nFROM $from",
          sparkSqlOk = true, build)
    }
  }

  // ---- shape F: set operations (funion/fintersect/fsetdiff × all=) ------

  private def genSetOpCase(r: Random, name: String): FuzzCase = {
    // low-cardinality projection so both sides carry real multiset
    // duplicates — the all= variants are only interesting with dups
    val cols = r.shuffle(Seq("l_returnflag", "l_linestatus",
      "l_linenumber", "l_quantity")).take(2 + r.nextInt(2)).sorted
    val (pa, sa) = genPred(r, lineitem, None)
    val (pb, sb) = genPred(r, lineitem, None)
    val all = r.nextBoolean()
    val op = pick(r, Seq("union", "intersect", "setdiff"))
    val build: Build = (s, dir) => {
      val base = DT(s, dir, "lineitem").df
      val x = base.filter(pa).select(cols.map(col): _*)
      val y = base.filter(pb).select(cols.map(col): _*)
      op match {
        case "union"     => graft.operators.SetOps.funion(x, y, all)
        case "intersect" => graft.operators.SetOps.fintersect(x, y, all)
        case _           => graft.operators.SetOps.fsetdiff(x, y, all)
      }
    }
    val sqlOp = (op, all) match {
      case ("union", true)      => "UNION ALL"
      case ("union", false)     => "UNION"
      case ("intersect", true)  => "INTERSECT ALL"
      case ("intersect", false) => "INTERSECT"
      case ("setdiff", true)    => "EXCEPT ALL"
      case _                    => "EXCEPT"
    }
    val sel = cols.mkString(", ")
    FuzzCase(name, s"setop_$op${if (all) "_all" else ""}",
      s"SELECT $sel FROM lineitem WHERE $sa\n$sqlOp\n" +
        s"SELECT $sel FROM lineitem WHERE $sb",
      sparkSqlOk = true, build)
  }

  // ---- shape G: rollup / cube (one-pass GROUPING SETS) -------------------

  private def genRollupCase(r: Random, name: String): FuzzCase = {
    val t = pick(r, Seq(lineitem, orders))
    val (pc, ps) = genPred(r, t, None)
    val keys = r.shuffle(t.strCols.map(_._1)).take(2)
    val aggs = Seq(
      (count(lit(1)).as("n"), "COUNT(*) AS n")) ++
      (0 until 1 + r.nextInt(2)).map { k =>
        val c = pick(r, t.decCols)
        (decSum(c).cast("double").as(s"s$k"),
          s"CAST(${decSumSql(c)} AS DOUBLE) AS s$k")
      }
    val cube = r.nextBoolean()
    val build: Build = (s, dir) => {
      val d = DT(s, dir, t.name)(pc)
      val ks = keys.map(k => k -> col(k))
      (if (cube) d.cubeAgg(ks, aggs.map(_._1))
       else d.rollupAgg(ks, aggs.map(_._1))).df
    }
    val sqlKeys = keys.mkString(", ")
    // Engine-agnostic standard semantics for the () set: Spark's plain
    // GROUP BY ROLLUP emits ZERO rows over empty input while DuckDB
    // (per ANSI) emits the grand-total row — so the oracle spells the
    // rollup as its non-() GROUPING SETS plus an UNGUARDED global
    // aggregate (one row in every engine, empty input or not). The
    // engine matches the standard (the fz_21_136 fix in
    // DT.groupingSetsAgg).
    val nonEmptySets =
      if (cube) Seq(keys, Seq(keys.head), Seq(keys(1)))
      else Seq(keys, Seq(keys.head))
    val gs = nonEmptySets.map(_.mkString("(", ", ", ")")).mkString(", ")
    val nullKeys = keys.map(k => s"CAST(NULL AS STRING) AS $k").mkString(", ")
    FuzzCase(name, if (cube) "cube" else "rollup",
      s"SELECT $sqlKeys, ${aggs.map(_._2).mkString(", ")}\n" +
        s"FROM ${t.name} t\nWHERE $ps\nGROUP BY GROUPING SETS ($gs)\n" +
        s"UNION ALL\nSELECT $nullKeys, ${aggs.map(_._2).mkString(", ")}\n" +
        s"FROM ${t.name} t\nWHERE $ps",
      sparkSqlOk = true, build)
  }

  // ---- shape H: frank rank family over a deterministic order ------------

  private def genRankCase(r: Random, name: String): FuzzCase = {
    val by = pick(r, Seq("user_id", "event_type"))
    val desc0 = r.nextBoolean()
    val (pc, ps) =
      if (r.nextBoolean()) genPred(r, events, None) else (lit(true), "1=1")
    val ord = if (desc0) col("value").desc else col("value").asc
    val sqlOrd = if (desc0) "value DESC" else "value"
    val ties = pick(r, Seq("min", "dense", "first", "max", "average"))
    val build: Build = (s, dir) => {
      val base = DT(s, dir, "events").df.filter(pc)
      Windows.frank(base, Seq(ord), Seq(col("value")), ties, Seq(by),
          "rk", appearance = Seq(col("event_id").asc))
        .select(col("event_id"),
          (if (ties == "average") col("rk").cast("double")
           else col("rk").cast("long")).as("rk"))
    }
    val w = s"(PARTITION BY $by ORDER BY $sqlOrd"
    val tiePart = s"(PARTITION BY $by, value)"
    val rkSql = ties match {
      case "min"   => s"RANK() OVER $w)"
      case "dense" => s"DENSE_RANK() OVER $w)"
      case "first" => s"ROW_NUMBER() OVER $w, event_id)"
      case "max"   => s"RANK() OVER $w) + COUNT(*) OVER $tiePart - 1"
      case _ =>
        s"RANK() OVER $w) + (COUNT(*) OVER $tiePart - 1) / 2.0"
    }
    val cast = if (ties == "average") "DOUBLE" else "BIGINT"
    FuzzCase(name, s"rank_$ties",
      s"SELECT event_id, CAST($rkSql AS $cast) AS rk\n" +
        s"FROM events t\nWHERE $ps",
      sparkSqlOk = true, build)
  }

  // ---- shape I: update-join (X[Y, x := i.y]) + conditional := ------------

  private def genUpdateCase(r: Random, name: String): FuzzCase = {
    val (ipC, ipS) =
      if (r.nextBoolean()) genPred(r, customer, None) else (lit(true), "1=1")
    val post = r.nextBoolean()
    val (ppC, ppS) = genPred(r, orders, None)
    val seedVal = pick(r, Seq("NONE", "UNKNOWN"))
    val postVal = pick(r, Seq("FLAGGED", "CAPPED"))
    val build: Build = (s, dir) => {
      val probe = DT(DT(s, dir, "customer").df.filter(ipC)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")))
      val base = DT(s, dir, "orders")
        .set("tag", lit(seedVal))
        .updateJoin(probe, Seq("o_custkey"), "tag" -> col("c_mktsegment"))
      val upd = if (post) base.update(ppC, "tag", lit(postVal)) else base
      upd.select(col("o_orderkey"), col("tag")).df
    }
    val inner =
      s"SELECT o.*, CASE WHEN c.c_custkey IS NULL THEN '$seedVal' " +
        s"ELSE c.c_mktsegment END AS tag\nFROM orders o LEFT JOIN " +
        s"(SELECT * FROM customer WHERE $ipS) c ON o.o_custkey = c.c_custkey"
    val sql =
      if (post)
        s"SELECT o_orderkey, CASE WHEN $ppS THEN '$postVal' ELSE tag END " +
          s"AS tag\nFROM ($inner) t"
      else s"SELECT o_orderkey, tag FROM ($inner) t"
    FuzzCase(name, if (post) "update_join_then_set" else "update_join", sql,
      sparkSqlOk = true, build)
  }

  // ---- shape E: as-of roll join (DuckDB-only oracle) ---------------------

  private def genAsofCase(r: Random, name: String): FuzzCase = {
    val xType = pick(r, Seq("purchase", "view", "signup"))
    val iType = pick(r, Seq("click", "error"))
    val locf = r.nextBoolean()
    val vPred = if (r.nextBoolean()) {
      val k = math.rint(r.nextDouble() * 250 * 100) / 100
      Some(k)
    } else None
    val build: Build = (s, dir) => {
      val ev = DT(s, dir, "events").df
      val xv = vPred.fold(ev.filter(col("event_type") === xType))(k =>
        ev.filter(col("event_type") === xType && col("value") > k))
      val x = DT(xv.select(col("user_id"), col("ts"),
        col("event_id").as("x_id"), col("value").as("xv")))
      val i = DT(ev.filter(col("event_type") === iType)
        .select(col("event_id"), col("user_id"), col("ts")))
      x.asofJoin(i, Seq("user_id"), "ts",
          if (locf) Joins.Locf else Joins.Nocb, Seq("xv"),
          tieBreak = Seq("x_id"))
        .select(col("event_id"), col("xv")).df
    }
    val vSql = vPred.fold("")(k => s" AND x.value > $k")
    val (cmp, ord) = if (locf) ("<=", "DESC") else (">=", "ASC")
    // LOCF ties carry the LAST duplicate, NOCB the FIRST (src/bmerge.c
    // lands on the run's bound) — the x_id tiebreak makes that exact.
    val sql =
      s"""SELECT i.event_id,
         |  (SELECT x.value FROM events x
         |   WHERE x.event_type = '$xType'$vSql AND x.user_id = i.user_id
         |     AND x.ts $cmp i.ts
         |   ORDER BY x.ts $ord, x.event_id $ord LIMIT 1) AS xv
         |FROM events i WHERE i.event_type = '$iType'""".stripMargin
    FuzzCase(name, if (locf) "asof_locf" else "asof_nocb", sql,
      sparkSqlOk = false, build)
  }

  // ---- shape Q: nafill locf/nocb/const + rleid (src/nafill.c, rleid) ----

  private def genNafillCase(r: Random, name: String): FuzzCase = {
    val by = pick(r, Seq("user_id", "event_type"))
    // force a salt so the fill actually has holes to fill
    val salt = Salt("value", pick(r, Seq(3, 5, 7)), r.nextInt(3))
    val (predC, predS) =
      if (r.nextBoolean()) genPred(r, events, Some(salt)) else (lit(true), "1=1")
    val from = s"(SELECT * FROM ${saltSql(events, Some(salt))} te " +
      s"WHERE $predS) t"
    val w = s"(PARTITION BY $by ORDER BY event_id"
    r.nextInt(4) match {
      case 0 =>
        val build: Build = (s, dir) =>
          Windows.nafillDF(
            saltDf(DT(s, dir, "events").df, events, Some(salt)).filter(predC),
            "out", "locf", col("value"), Seq(by), Seq(col("event_id").asc))
            .select(col("event_id"), col("out"))
        FuzzCase(name, "nafill_locf",
          s"SELECT event_id, last_value(value IGNORE NULLS) OVER " +
            s"$w ROWS UNBOUNDED PRECEDING) AS out\nFROM $from",
          sparkSqlOk = false, build) // DuckDB IGNORE NULLS placement
      case 1 =>
        val build: Build = (s, dir) =>
          Windows.nafillDF(
            saltDf(DT(s, dir, "events").df, events, Some(salt)).filter(predC),
            "out", "nocb", col("value"), Seq(by), Seq(col("event_id").asc))
            .select(col("event_id"), col("out"))
        FuzzCase(name, "nafill_nocb",
          s"SELECT event_id, first_value(value IGNORE NULLS) OVER " +
            s"$w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS out\n" +
            s"FROM $from",
          sparkSqlOk = false, build)
      case 2 =>
        val k = math.rint(r.nextDouble() * 500 * 100) / 100
        val build: Build = (s, dir) =>
          saltDf(DT(s, dir, "events").df, events, Some(salt)).filter(predC)
            .select(col("event_id"),
              Windows.nafillConst(col("value"), lit(k)).as("out"))
        FuzzCase(name, "nafill_const",
          s"SELECT event_id, COALESCE(value, $k) AS out\nFROM $from",
          sparkSqlOk = true, build)
      case _ =>
        // rleid over a low-cardinality run column: gaps-and-islands sum
        val build: Build = (s, dir) =>
          Windows.rleid(
            saltDf(DT(s, dir, "events").df, events, Some(salt)).filter(predC),
            Seq("event_type"), Seq(col("event_id").asc), Seq(by), "rid")
            .select(col("event_id"), col("rid").cast("long").as("rid"))
        // NULL == NULL counts as "no change" (reference rleid treats
        // consecutive NAs as one run) — IS DISTINCT FROM spells that in
        // both engines; the first row of each partition opens run 1
        // DuckDB window SUM(int) widens to HUGEINT (pandas float64) —
        // CAST to BIGINT for the driver's dtype-kind check
        val innerCols =
          if (by == "event_type") "event_id, event_type"
          else s"event_id, $by, event_type"
        FuzzCase(name, "rleid",
          s"""SELECT event_id,
             |  CAST(SUM(CASE WHEN rn = 1 THEN 1
             |           WHEN event_type IS DISTINCT FROM prev THEN 1
             |           ELSE 0 END)
             |    OVER (PARTITION BY $by ORDER BY event_id
             |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rid
             |FROM (SELECT $innerCols,
             |        LAG(event_type) OVER wrun AS prev,
             |        ROW_NUMBER() OVER wrun AS rn
             |      FROM $from
             |      WINDOW wrun AS (PARTITION BY $by ORDER BY event_id)) g""".stripMargin,
          sparkSqlOk = true, build)
    }
  }

  // ---- shape J: between / inrange predicate atoms (R/between.R:2,76) ----

  private def genBetweenCase(r: Random, name: String): FuzzCase = {
    val t = pick(r, Seq(lineitem, orders, events))
    val salt = pickSalt(r, t.decCols)
    val c = pick(r, t.decCols)
    val (lo0, hi0) = decRange(c)
    val a = math.rint((lo0 + r.nextDouble() * (hi0 - lo0)) * 100) / 100
    val b = math.rint((lo0 + r.nextDouble() * (hi0 - lo0)) * 100) / 100
    val (lo, hi) = if (a <= b) (a, b) else (b, a)
    val inc = r.nextBoolean()
    val useInrange = r.nextInt(3) == 0
    // inrange: 2-3 disjoint-ish intervals (union-of-betweens semantics
    // holds either way); between: one interval × incbounds
    val ivs: Seq[(Double, Double)] =
      if (!useInrange) Seq((lo, hi))
      else {
        val w = (hi0 - lo0) / 10
        (0 until 2 + r.nextInt(2)).map { _ =>
          val s0 = math.rint((lo0 + r.nextDouble() * (hi0 - lo0)) * 100) / 100
          (s0, math.rint((s0 + w) * 100) / 100)
        }
      }
    val predC =
      if (useInrange) graft.functions.Funcs.inrange(col(c), ivs, inc)
      else graft.functions.Funcs.between(col(c), lit(lo), lit(hi), inc)
    val predS = ivs.map { case (s0, e0) =>
      if (inc) s"($c >= $s0 AND $c <= $e0)" else s"($c > $s0 AND $c < $e0)"
    }.mkString(" OR ")
    val aggs = (0 until 1 + r.nextInt(2)).map(k => genAggExpr(r, t, s"a$k"))
    val by = genBy(r, t)
    val build: Build = (s, dir) => {
      val base = saltDf(DT(s, dir, t.name).df, t, salt)
      val d = DT(base)
      if (by.isEmpty) d(predC).groupAgg(Nil, aggs.map(_._1)).df
      else d(predC, aggs.map(_._1), by.map(_._1)).df
    }
    val sel = (by.map(_._2) ++ aggs.map(_._2)).mkString(", ")
    val grp =
      if (by.isEmpty) "" else "\nGROUP BY " + (1 to by.size).mkString(", ")
    FuzzCase(name, if (useInrange) "inrange" else "between",
      s"SELECT $sel\nFROM ${saltSql(t, salt)} t\nWHERE $predS$grp",
      sparkSqlOk = true, build)
  }

  // ---- shape K: frollapply (window frame → arbitrary fn) -----------------

  private def genFrollapplyCase(r: Random, name: String): FuzzCase = {
    // rolling range (max−min) over a trailing n-window: subtraction of
    // IDENTICAL doubles is IEEE-deterministic cross-engine, no rounding
    val t = pick(r, Seq(orders, events))
    val (vc, pc1, ord1, ord2) =
      if (t.name == "orders")
        ("o_totalprice", "o_custkey", "o_orderdate", "o_orderkey")
      else ("value", "user_id", "ts", "event_id")
    val n = 2 + r.nextInt(4)
    val (predC, predS) =
      if (r.nextBoolean()) genPred(r, t, None) else (lit(true), "1=1")
    val closure = r.nextBoolean() // JVM-closure tier vs window-array tier
    val build: Build = (s, dir) => {
      val base = DT(s, dir, t.name).df.filter(predC)
      val ordCols = Seq(col(ord1).asc, col(ord2).asc)
      if (closure) {
        val f = (rows: Seq[org.apache.spark.sql.Row]) => {
          val vs = rows.map(_.getDouble(0))
          vs.max - vs.min
        }
        Windows.frollApplyF(base, "rng", Seq("p" -> col(vc)), n,
            Seq(pc1), ordCols, f, org.apache.spark.sql.types.DoubleType)
          .select(col(ord2), col("rng"))
      } else {
        val arr = Windows.frollWindowArray(col(vc), n, Seq(pc1), ordCols)
        base.withColumn("rng",
            when(size(arr) === n, array_max(arr) - array_min(arr)))
          .select(col(ord2), col("rng"))
      }
    }
    val w = s"(PARTITION BY $pc1 ORDER BY $ord1, $ord2 " +
      s"ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)"
    FuzzCase(name, if (closure) "frollapply_udf" else "frollapply",
      s"SELECT $ord2, CASE WHEN count(*) OVER $w = $n " +
        s"THEN max($vc) OVER $w - min($vc) OVER $w END AS rng\n" +
        s"FROM (SELECT * FROM ${t.name} WHERE $predS) t",
      sparkSqlOk = true, build)
  }

  // ---- shape L: melt (wide → long, × na.rm) -------------------------------

  private def genMeltCase(r: Random, name: String): FuzzCase = {
    val t = pick(r, Seq(lineitem, orders, events))
    val salt = pickSalt(r, t.decCols)
    // pk stays an id var — a measure equal to the id would make the
    // select-projection ambiguous
    val measures = r.shuffle(t.decCols ++ t.keyCols.filterNot(_ == t.pk)
      .take(2)).take(2 + r.nextInt(2)).sorted
    val naRm = salt.isDefined && r.nextBoolean()
    val (predC, predS) =
      if (r.nextBoolean()) genPred(r, t, salt) else (lit(true), "1=1")
    val build: Build = (s, dir) => {
      val base = saltDf(DT(s, dir, t.name).df, t, salt).filter(predC)
        .select((t.pk +: measures).map(col): _*)
      graft.operators.Reshape.melt(base, Seq(t.pk), measures, naRm = naRm)
        .select(col(t.pk), col("variable"),
          col("value").cast("double").as("value"))
    }
    // oracle: stack() = UNION ALL of per-measure projections, promoted
    // to DOUBLE exactly like melt's numeric-promotion rule
    val arms = measures.map(m =>
      s"SELECT ${t.pk}, '$m' AS variable, CAST($m AS DOUBLE) AS value\n" +
        s"FROM ${saltSql(t, salt)} t WHERE $predS")
    val sql0 = arms.mkString("\nUNION ALL\n")
    val sql = if (naRm)
      s"SELECT * FROM (\n$sql0\n) m WHERE value IS NOT NULL"
    else sql0
    FuzzCase(name, if (naRm) "melt_narm" else "melt", sql,
      sparkSqlOk = true, build)
  }

  // ---- shape M: dcast (long → wide pivot, × fill) -------------------------

  private def genDcastCase(r: Random, name: String): FuzzCase = {
    // rhs domains whose values are valid bare SQL identifiers
    val (t, rhs, domain) = pick(r, Seq(
      (events, "event_type", Seq("click", "error", "purchase", "signup", "view")),
      (lineitem, "l_returnflag", Seq("A", "N", "R")),
      (lineitem, "l_linestatus", Seq("F", "O"))))
    val vc = pick(r, t.decCols)
    val lhs = if (t.name == "events") "user_id" else "l_orderkey"
    val (predC, predS) = genPred(r, t, None)
    val agg = pick(r, Seq("sum", "count", "min", "max"))
    // count ALWAYS fills 0: SQL's conditional COUNT is 0 for an absent
    // (lhs, value) cell while pivot leaves it NULL — and 0 is also the
    // reference's default fill (length of a 0-length vector)
    val fill = agg match {
      case "sum" if r.nextBoolean() => Some(lit(0).cast("decimal(18,2)"))
      case "count"                  => Some(lit(0L))
      case _                        => None
    }
    val aggFn: Column => Column = agg match {
      case "sum"   => c => sum(c.cast("decimal(18,2)"))
      case "count" => c => count(c)
      case "min"   => c => min(c)
      case "max"   => c => max(c)
    }
    val build: Build = (s, dir) => {
      val base = DT(s, dir, t.name).df.filter(predC)
      val wide = graft.operators.Reshape.dcast(base, Seq(lhs), rhs, vc,
        aggFn, values = domain, fill = fill)
      // post-cast sum columns to double for cross-engine string equality
      if (agg == "sum")
        wide.select(col(lhs) +: domain.map(v =>
          col(v).cast("double").as(v)): _*)
      else wide
    }
    def cell(v: String): String = {
      val in = s"CASE WHEN $rhs = '$v' THEN $vc END"
      val core = agg match {
        case "sum"   => s"SUM(CAST(($in) AS DECIMAL(18,2)))"
        case "count" => s"COUNT($in)"
        case "min"   => s"MIN($in)"
        case "max"   => s"MAX($in)"
      }
      val filled = fill match {
        case Some(_) if agg == "sum" =>
          s"COALESCE($core, CAST(0 AS DECIMAL(18,2)))"
        case Some(_) => s"COALESCE($core, 0)"
        case None    => core
      }
      val cast = if (agg == "sum") s"CAST($filled AS DOUBLE)" else filled
      s"$cast AS $v"
    }
    FuzzCase(name, if (fill.isDefined) "dcast_fill" else "dcast",
      s"SELECT $lhs, ${domain.map(cell).mkString(", ")}\n" +
        s"FROM ${t.name} t\nWHERE $predS\nGROUP BY 1",
      sparkSqlOk = true, build)
  }

  // ---- shape N: melt → dcast round-trip (inverse property) ----------------

  private def genRoundtripCase(r: Random, name: String): FuzzCase = {
    // unique-pk tables only: the round-trip must land one value per cell
    val t = pick(r, Seq(orders, events))
    val salt = pickSalt(r, t.decCols)
    val naRm = r.nextBoolean()
    // a never-null key-col measure guarantees every pk survives a
    // naRm melt (an all-null row would otherwise vanish from the wide
    // side but not from the oracle)
    val measures = (t.decCols ++
      r.shuffle(t.keyCols.filterNot(_ == t.pk)).take(1)).sorted
    val (predC, predS) =
      if (r.nextBoolean()) genPred(r, t, salt) else (lit(true), "1=1")
    val build: Build = (s, dir) => {
      val base = saltDf(DT(s, dir, t.name).df, t, salt).filter(predC)
        .select((t.pk +: measures).map(col): _*)
      val molten = graft.operators.Reshape.melt(base, Seq(t.pk), measures,
        naRm = naRm)
      // melt then dcast must reproduce the input modulo column order
      // (R/fmelt.R:183-227 + R/fcast.R:126; tests.Rraw 1035/1102) —
      // sum over the single cell value is exact
      graft.operators.Reshape.dcast(molten, Seq(t.pk), "variable", "value",
        c => sum(c), values = measures)
        .select(col(t.pk) +: measures.map(m =>
          col(m).cast("double").as(m)): _*)
    }
    val sel = measures.map(m => s"CAST($m AS DOUBLE) AS $m").mkString(", ")
    FuzzCase(name, "melt_dcast_roundtrip",
      s"SELECT ${t.pk}, $sel\nFROM ${saltSql(t, salt)} t\nWHERE $predS",
      sparkSqlOk = true, build)
  }

  // ---- shape O: groupingsets id=TRUE vs GROUPING_ID() ---------------------

  private def genGsIdCase(r: Random, name: String): FuzzCase = {
    val t = pick(r, Seq(lineitem, orders))
    val (predC, predS) = genPred(r, t, None)
    val keys = r.shuffle(t.strCols.map(_._1)).take(2)
    val aggs = Seq((count(lit(1)).as("n"), "COUNT(*) AS n")) ++
      (0 until 1 + r.nextInt(2)).map { k =>
        val c = pick(r, t.decCols)
        (decSum(c).cast("double").as(s"s$k"),
          s"CAST(${decSumSql(c)} AS DOUBLE) AS s$k")
      }
    val cube = r.nextBoolean()
    val build: Build = (s, dir) => {
      val d = DT(s, dir, t.name)(predC)
      val ks = keys.map(k => k -> col(k))
      // id=TRUE: leading `grouping` bitmask column (R/groupingsets.R:
      // 124-161); aliased gid for a dialect-shared unquoted identifier
      (if (cube) d.cubeAgg(ks, aggs.map(_._1), id = true)
       else d.rollupAgg(ks, aggs.map(_._1), id = true)).df
        .withColumnRenamed("grouping", "gid")
        .withColumn("gid", col("gid").cast("int"))
    }
    val sqlKeys = keys.mkString(", ")
    val gidExpr = s"CAST(GROUPING_ID($sqlKeys) AS INT)"
    val nonEmptySets =
      if (cube) Seq(keys, Seq(keys.head), Seq(keys(1)))
      else Seq(keys, Seq(keys.head))
    val gs = nonEmptySets.map(_.mkString("(", ", ", ")")).mkString(", ")
    val nullKeys = keys.map(k => s"CAST(NULL AS STRING) AS $k").mkString(", ")
    val allUp = (1 << keys.size) - 1
    FuzzCase(name, if (cube) "cube_id" else "rollup_id",
      s"SELECT $gidExpr AS gid, $sqlKeys, ${aggs.map(_._2).mkString(", ")}\n" +
        s"FROM ${t.name} t\nWHERE $predS\nGROUP BY GROUPING SETS ($gs)\n" +
        s"UNION ALL\nSELECT $allUp AS gid, $nullKeys, " +
        s"${aggs.map(_._2).mkString(", ")}\nFROM ${t.name} t\nWHERE $predS",
      sparkSqlOk = true, build)
  }

  // ---- shape P: foverlaps vs a range-join oracle (R/foverlaps.R:1-22) ----

  private def genFoverlapsCase(r: Random, name: String): FuzzCase = {
    // one-in-three: the mult=first/last reduction tier. Intervals are
    // NUMERIC, anchored at the globally-unique o_orderkey (x = status F
    // orders, y = status O orders — disjoint key sets), so every y
    // (ys, ye) is unique and min_by/max_by over (ys, ye) is fully
    // deterministic cross-engine — no physical-row-order tie ambiguity.
    if (r.nextInt(3) == 0) return genFoverlapsMultCase(r, name)
    val typ = pick(r, Seq("any", "within", "start", "end"))
    val xType = pick(r, Seq("purchase", "signup"))
    val yType = pick(r, Seq("click", "error"))
    val xMin = 1 + r.nextInt(5)
    val yMin = 1 + r.nextInt(5)
    val k = math.rint(r.nextDouble() * 200 * 100) / 100
    val build: Build = (s, dir) => {
      val ev = DT(s, dir, "events").df
      val x = ev.filter(col("event_type") === xType && col("value") > k)
        .select(col("user_id"), col("event_id").as("x_id"),
          col("ts").as("xs"),
          (col("ts") + expr(s"INTERVAL $xMin MINUTE")).as("xe"))
      val y = ev.filter(col("event_type") === yType)
        .select(col("user_id"), col("event_id").as("y_id"),
          col("ts").as("ys"),
          (col("ts") + expr(s"INTERVAL $yMin MINUTE")).as("ye"))
      Joins.overlap(x, y, Seq("user_id"), "xs", "xe", "ys", "ye", typ)
        .select(col("x_id"), col("y_id"))
    }
    val cond = typ match {
      case "any"    => "x.xs <= y.ye AND y.ys <= x.xe"
      case "within" => "x.xs >= y.ys AND x.xe <= y.ye"
      case "start"  => "x.xs = y.ys"
      case _        => "x.xe = y.ye"
    }
    val sql =
      s"""SELECT x.x_id, y.y_id
         |FROM (SELECT user_id, event_id AS x_id, ts AS xs,
         |        ts + INTERVAL $xMin MINUTE AS xe
         |      FROM events WHERE event_type = '$xType' AND value > $k) x
         |JOIN (SELECT user_id, event_id AS y_id, ts AS ys,
         |        ts + INTERVAL $yMin MINUTE AS ye
         |      FROM events WHERE event_type = '$yType') y
         |  ON x.user_id = y.user_id AND $cond""".stripMargin
    FuzzCase(name, s"foverlaps_$typ", sql, sparkSqlOk = true, build)
  }

  private def genFoverlapsMultCase(r: Random, name: String): FuzzCase = {
    val mult = if (r.nextBoolean()) "first" else "last"
    val xw = (1 + r.nextInt(50)) * 1000L
    val yw = (1 + r.nextInt(50)) * 1000L
    val k = 2000.0 + math.rint(r.nextDouble() * 40000000) / 100
    val build: Build = (s, dir) => {
      val o = DT(s, dir, "orders").df
      val x = o.filter(col("o_orderstatus") === "F" && col("o_totalprice") > k)
        .select(col("o_custkey"), col("o_orderkey").as("x_id"),
          col("o_orderkey").cast("double").as("xs"),
          (col("o_orderkey") + xw).cast("double").as("xe"))
      val y = o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey"), col("o_orderkey").as("y_id"),
          col("o_orderkey").cast("double").as("ys"),
          (col("o_orderkey") + yw).cast("double").as("ye"))
      Joins.overlapMult(x, y, Seq("o_custkey"), "xs", "xe", "ys", "ye",
          "any", mult)
        .select(col("x_id"), col("y_id"))
    }
    val d = if (mult == "first") "" else " DESC"
    val sql =
      s"""SELECT x_id, y_id FROM (
         |  SELECT x.x_id, y.y_id,
         |    ROW_NUMBER() OVER (PARTITION BY x.x_id
         |      ORDER BY y.ys$d, y.ye$d) AS rn
         |  FROM (SELECT o_custkey, o_orderkey AS x_id,
         |          CAST(o_orderkey AS DOUBLE) AS xs,
         |          CAST(o_orderkey + $xw AS DOUBLE) AS xe
         |        FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > $k) x
         |  JOIN (SELECT o_custkey, o_orderkey AS y_id,
         |          CAST(o_orderkey AS DOUBLE) AS ys,
         |          CAST(o_orderkey + $yw AS DOUBLE) AS ye
         |        FROM orders WHERE o_orderstatus = 'O') y
         |    ON x.o_custkey = y.o_custkey AND x.xs <= y.ye AND y.ys <= x.xe
         |) m WHERE rn = 1""".stripMargin
    FuzzCase(name, s"foverlaps_mult_$mult", sql, sparkSqlOk = true, build)
  }

  // ---- case mix ----------------------------------------------------------

  def cases(seed: Long, n: Int): Seq[FuzzCase] =
    (0 until n).map { i =>
      val r = new Random(seed * 1000003L + i)
      val nm = s"fz_${seed}_$i"
      // NOTE: range boundaries are part of the (seed, i) determinism
      // contract for PINNED cases — fz_21_136/369/417 drew in [78,88)
      // and must stay rollup/cube forever; new shapes may only carve
      // ranges that hold pinned draws' generators fixed. (The round-20
      // re-carve touched every OTHER boundary; [78,88) → genRollupCase
      // is byte-identical, FuzzSpec re-asserts the three pins.)
      r.nextInt(100) match {
        case x if x < 21 => genAggCase(r, nm)
        case x if x < 24 => genNafillCase(r, nm)
        case x if x < 27 => genBetweenCase(r, nm)
        case x if x < 38 => genJoinCase(r, nm)
        case x if x < 44 => genMultCase(r, nm)
        case x if x < 56 => genWindowCase(r, nm)
        case x if x < 59 => genFrollapplyCase(r, nm)
        case x if x < 63 => genSetOpCase(r, nm)
        case x if x < 67 => genUpdateCase(r, nm)
        case x if x < 71 => genMeltCase(r, nm)
        case x if x < 74 => genDcastCase(r, nm)
        case x if x < 78 => genRoundtripCase(r, nm)
        case x if x < 88 => genRollupCase(r, nm) // PINNED RANGE — never move
        case x if x < 91 => genGsIdCase(r, nm)
        case x if x < 95 => genRankCase(r, nm)
        case x if x < 97 => genFoverlapsCase(r, nm)
        case _           => genAsofCase(r, nm)
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val n = if (args.length > 2) args(2).toInt else 500
    val seed = if (args.length > 3) args(3).toLong else 19L
    // optional 5th arg: comma-separated shape PREFIXES — generate the
    // full deterministic (seed, i) sequence but BUILD only matching
    // shapes (generation is free; building is the cost). Lets a sweep
    // concentrate on new families without perturbing case identity.
    val shapeFilter: Option[Seq[String]] =
      if (args.length > 4) Some(args(4).split(',').toSeq.map(_.trim))
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.PlanLint.silenceBoundedWindowWarning()
    new java.io.File(outDir).mkdirs()
    val cs = cases(seed, n).filter(c =>
      shapeFilter.forall(_.exists(p => c.shape.startsWith(p))))
    val sqls = scala.collection.mutable.LinkedHashMap[String, String]()
    var built = 0
    var failedBuild = 0
    cs.foreach { c =>
      try {
        c.build(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/${c.name}")
        sqls(c.name) = c.sql
        built += 1
        if (built % 100 == 0)
          System.err.println(s"[fuzz] $built/${cs.size} dumped")
      } catch {
        case e: Throwable =>
          failedBuild += 1
          // an engine throw on a generated-valid query is itself a
          // finding — keep the case name and seed in the log
          System.err.println(
            s"[fuzz] BUILD FAIL ${c.name} (${c.shape}): ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      sqls.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    val byShape = cs.groupBy(_.shape).toSeq.sortBy(_._1)
      .map { case (s, xs) => s""""$s":${xs.size}""" }.mkString(",")
    println(s"""{"fuzz":"done","seed":$seed,"n":$n,"dumped":$built,""" +
      s""""build_failures":$failedBuild,"shapes":{$byShape},"out":"$outDir"}""")
    spark.stop()
  }
}
