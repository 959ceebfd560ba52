package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar / vector functions (SURVEY.md §2.9). All are thin lowerings to
  * codegen'd Catalyst expressions — never UDFs — so they inline into
  * whole-stage codegen.
  */
object Funcs {

  // ---- conditional (src/fifelse.c) ------------------------------------

  /** fifelse(test, yes, no, na): strict two-branch conditional; `na`
    * (default null) is the result where test itself is null — the
    * reference's explicit NA-branch semantics.
    */
  def fifelse(test: Column, yes: Column, no: Column,
              na: Column = lit(null)): Column =
    when(test.isNull, na).when(test, yes).otherwise(no)

  /** fcase(cond1, val1, cond2, val2, ..., default): first true branch
    * wins, lazily evaluated (src/fifelse.c:210) — exactly Catalyst's
    * CaseWhen.
    */
  def fcase(branches: Seq[(Column, Column)],
            default: Column = lit(null)): Column =
    branches.foldRight(default) { case ((c, v), acc) => when(c, v).otherwise(acc) }

  // ---- NA handling (src/coalesce.c, src/nafill.c) ---------------------

  /** fcoalesce(...): first non-missing across columns. Like nafill,
    * the reference's default is `nan=NA` (NEWS #4567: "full
    * compatibility with nafill() behavior") — NaN counts as missing
    * and falls through to the next candidate. [[fcoalesceKeepNan]] is
    * the `nan=NaN` opt-out.
    */
  def fcoalesce(cols: Column*): Column = coalesce(cols.map(nanAsNa): _*)

  /** fcoalesce(nan=NaN): NaN is an ordinary value that wins its slot. */
  def fcoalesceKeepNan(cols: Column*): Column = coalesce(cols: _*)

  /** nafill(type="const", nan=NA). locf/nocb are ordered ops — see
    * graft.operators.Windows.nafillLocf/nafillNocb. The DEFAULT treats
    * NaN as missing, matching the reference's `nan=NA` default
    * (R/shift.R:29, src/nafill.c nan_is_na; locked by nafill.Rraw
    * 1.19/1.21 analogs in Round10bSpec); `nanIsNa = false` is the
    * reference's `nan=NaN` opt-out that keeps NaN as a value.
    */
  def nafill(c: Column, fill: Column, nanIsNa: Boolean = true): Column =
    coalesce(if (nanIsNa) nanAsNa(c) else c, fill)

  /** nafill(nan=NA) building block (src/nafill.c nan_is_na): map NaN to
    * null so null-aware aggregates treat it as missing. Type-aware
    * native expression — identity on non-floating columns (ints,
    * dates), so the nafill family stays usable on every reference type.
    * R's NaN ≠ NA distinction survives otherwise (SQL comparisons and
    * window aggregates treat NaN as an ordinary — maximal — double).
    */
  def nanAsNa(c: Column): Column = graft.plans.NanToNull(c)

  // ---- predicates (R/between.R, R/like.R, R/notin.R) ------------------

  /** between(x, lower, upper, incbounds=TRUE) — vectorized bounds.
    * `check=true` mirrors between(check=) (src/between.c:83): a row
    * whose lower exceeds its upper raises instead of quietly yielding
    * FALSE. Fused into the projection (same best-effort contract as
    * foverlaps' NA guard — rows pruned before evaluation don't check).
    */
  def between(x: Column, lower: Column, upper: Column,
              incbounds: Boolean = true, check: Boolean = false): Column = {
    val core = if (incbounds) x >= lower && x <= upper else x > lower && x < upper
    if (!check) core
    else when(lower > upper, raise_error(concat(
        lit("between: lower ("), lower.cast("string"),
        lit(") is greater than upper ("), upper.cast("string"), lit(")")))
          .cast("boolean"))
      .otherwise(core)
  }

  /** between(NAbounds=TRUE) (R/between.R): a null bound means
    * unbounded on that side (-Inf / +Inf) instead of null-propagating.
    */
  def betweenNA(x: Column, lower: Column, upper: Column,
                incbounds: Boolean = true): Column = {
    val lo = if (incbounds) x >= lower else x > lower
    val hi = if (incbounds) x <= upper else x < upper
    // null x stays NA (reference semantics) even with open bounds
    when(x.isNull, lit(null).cast("boolean"))
      .otherwise((lower.isNull || lo) && (upper.isNull || hi))
  }

  // ---- GForce na.rm=FALSE defaults (src/gsumm.c gsum/gmean/gmin/...) --

  /** R aggregates default na.rm=FALSE: ANY NA in the group makes the
    * aggregate NA (`sum(c(1, NA))` is NA), where SQL aggregates always
    * skip nulls. `aggNa(fn)(c)` wraps a SQL aggregate with the
    * reference rule; pass naRm=true for the SQL/na.rm=TRUE behavior.
    * One extra null-count per group — partial-aggregated map-side like
    * the aggregate itself, no plan-shape change.
    */
  private def withNaRule(c: Column, agg: Column, naRm: Boolean): Column =
    if (naRm) agg
    else when(count(when(c.isNull, lit(1))) > 0, lit(null)).otherwise(agg)

  def sumNa(c: Column, naRm: Boolean = false): Column = withNaRule(c, sum(c), naRm)
  def meanNa(c: Column, naRm: Boolean = false): Column = withNaRule(c, avg(c), naRm)
  def minNa(c: Column, naRm: Boolean = false): Column = withNaRule(c, min(c), naRm)
  def maxNa(c: Column, naRm: Boolean = false): Column = withNaRule(c, max(c), naRm)
  def prodNa(c: Column, naRm: Boolean = false): Column =
    withNaRule(c, product(c), naRm)
  def sdNa(c: Column, naRm: Boolean = false): Column =
    withNaRule(c, stddev_samp(c), naRm)
  def varNa(c: Column, naRm: Boolean = false): Column =
    withNaRule(c, var_samp(c), naRm)

  // ---- quantiles (gmedian/gquantile, src/gsumm.c:869) -----------------

  /** Grouped-quantile aggregate with an explicit exactness knob.
    *
    * `exact=true` (the oracle path) is Spark's exact `percentile`: a
    * sort-based aggregate buffering a per-group value→count map —
    * correct everywhere, but on a high-cardinality double column at
    * 100 TB that map is an executor-memory hazard (millions of distinct
    * values per group stay resident until the group closes).
    *
    * `exact=false` is `approx_percentile` (Greenwald-Khanna): O(1/ε)
    * memory per group regardless of cardinality, rank error ≤ 1/accuracy
    * — the tier a real 100 TB run should use. Returns a VALUE FROM THE
    * DATA (no interpolation), so results are approximate in rank, exact
    * in domain.
    */
  def quantileAgg(c: Column, p: Double, exact: Boolean = true,
                  accuracy: Int = 10000): Column =
    if (exact) percentile(c, lit(p))
    else percentile_approx(c, lit(p), lit(accuracy))

  /** Grouped distinct-count with an explicit exactness knob — the
    * uniqueN twin of [[quantileAgg]]'s tiering.
    *
    * `exact=true` (the oracle path) is `count_distinct`: Spark expands
    * it into a two-phase aggregate whose first phase keys on (group,
    * value) — correct everywhere, but the expanded shuffle carries one
    * row per DISTINCT (group, value) pair, and a high-cardinality
    * column at 100 TB makes that first exchange the bottleneck.
    *
    * `exact=false` is `approx_count_distinct` (HyperLogLog++): a fixed
    * ~`1.04/rsd²`-register sketch per group, one ordinary hash
    * aggregate, relative error ≤ `rsd` — the tier a real 100 TB run
    * should use for cardinality estimates.
    */
  def uniqueNAgg(c: Column, exact: Boolean = true, rsd: Double = 0.05,
                 naRm: Boolean = false): Column = {
    val base = if (exact) count_distinct(c) else approx_count_distinct(c, rsd)
    // uniqueN(na.rm=FALSE) counts NA as a distinct value
    // (R/duplicated.R:102; tests.Rraw uniqueN batteries) — SQL's
    // COUNT(DISTINCT) drops nulls, so add the has-null indicator back.
    if (naRm) base
    else base + coalesce(max(when(c.isNull, lit(1L)).otherwise(lit(0L))), lit(0L))
  }

  /** %like% — regex match (R/like.R:4). */
  def like(x: Column, pattern: String): Column = x.rlike(pattern)
  /** %ilike% — case-insensitive via the (?i) flag; lowercasing the
    * pattern would invert uppercase regex classes (\\W, \\S, \\B).
    */
  def ilike(x: Column, pattern: String): Column = x.rlike("(?i)" + pattern)
  /** %flike% — fixed (literal substring). */
  def flike(x: Column, pattern: String): Column = x.contains(pattern)
  /** %plike% — Perl-compatible regex (R/like.R:24 grepl(perl=TRUE)).
    * Java's regex engine IS PCRE-flavored (lookaround, \d/\w classes,
    * lazy quantifiers, named groups), so this lowers to the same rlike;
    * the alias exists so reference code ports 1:1. NOTE unlike %like%,
    * patterns here may exceed the RE2 subset — keep %plike% out of
    * oracle-adjudicated queries (DuckDB's RE2 cannot mirror it).
    */
  def plike(x: Column, pattern: String): Column = x.rlike(pattern)

  /** %chin% — fast string membership (src/chmatch.c; interning is an
    * execution detail — Catalyst compiles IN-lists to hash sets).
    */
  def chin(x: Column, values: Seq[String]): Column =
    matchIn(x, values.asInstanceOf[Seq[Any]])
  /** %notin% (R/notin.R). */
  def notin(x: Column, values: Seq[Any]): Column = !matchIn(x, values)

  /** match()-based membership: %in%/%chin% NEVER return NA (R's match
    * maps no-match to nomatch=FALSE and matches NA to NA), unlike SQL
    * IN which null-propagates — `NA %chin% set` is TRUE iff the set
    * holds NA, and a null probe never poisons %notin% to null.
    */
  private def matchIn(x: Column, values: Seq[Any]): Column = {
    val nonNull = values.filterNot(_ == null)
    val naInSet = values.exists(_ == null)
    when(x.isNull, lit(naInSet))
      .otherwise(if (nonNull.isEmpty) lit(false) else x.isin(nonNull: _*))
  }

  /** %inrange% (R/between.R:76): x falls in ANY [lo,hi] interval of a
    * small literal interval set. For a table-valued interval side use a
    * range join (graft.operators.Joins.overlap) instead.
    */
  def inrange(x: Column, intervals: Seq[(Double, Double)],
              incbounds: Boolean = true): Column =
    intervals.map { case (lo, hi) => between(x, lit(lo), lit(hi), incbounds) }
      .reduce(_ || _)

  // ---- date/time (R/IDateTime.R) --------------------------------------
  // Extractor set from R/IDateTime.R:374-434; all builtin Catalyst.

  def isoweek(c: Column): Column = weekofyear(c)
  def yday(c: Column): Column = dayofyear(c)
  /** wday: 1=Sunday (reference convention == Spark's dayofweek). */
  def wday(c: Column): Column = dayofweek(c)
  def mday(c: Column): Column = dayofmonth(c)
  /** yearmon/yearqtr: fractional year encodings; format="character"
    * gives the reference's "2024M03" / "2024Q1" labels
    * (R/IDateTime.R:413-435 sprintf "%dM%02d" / "%dQ%d").
    */
  def yearmon(c: Column, format: String = "numeric"): Column = format match {
    case "numeric"   => year(c) + (month(c) - 1) / lit(12.0)
    case "character" => format_string("%dM%02d", year(c), month(c))
    case other => throw new IllegalArgumentException(
      s"yearmon: format must be numeric/character, got '$other'")
  }
  def yearqtr(c: Column, format: String = "numeric"): Column = format match {
    case "numeric"   => year(c) + (quarter(c) - 1) / lit(4.0)
    case "character" => format_string("%dQ%d", year(c), quarter(c))
    case other => throw new IllegalArgumentException(
      s"yearqtr: format must be numeric/character, got '$other'")
  }
  /** round.IDate-style truncation to week/month/quarter/year starts. */
  def roundDate(c: Column, unit: String): Column = date_trunc(unit, c)
  /** round.IDate proper (R/IDateTime.R:99): DATE-typed truncation. */
  def roundIDate(c: Column, unit: String): Column = {
    require(Set("week", "month", "quarter", "year")(unit),
      s"roundIDate: unit must be week/month/quarter/year, got '$unit'")
    to_date(date_trunc(unit, c))
  }
  /** startsWithAny (src/utils.c, init src/init.c:151): true iff the
    * string starts with ANY of the literal prefixes.
    */
  def startsWithAny(c: Column, prefixes: Seq[String]): Column = {
    require(prefixes.nonEmpty, "startsWithAny needs at least one prefix")
    prefixes.map(p => c.startsWith(p)).reduce(_ || _)
  }
  /** ITime analog (R/IDateTime.R:175): seconds since midnight. */
  def itime(c: Column): Column =
    hour(c) * 3600 + minute(c) * 60 + second(c)
  /** as.IDate on a timestamp. */
  def idate(c: Column): Column = to_date(c)
  /** IDateTime(x) (R/IDateTime.R:186): BOTH halves of a timestamp as a
    * struct — `.idate` (the date) and `.itime` (seconds since
    * midnight); select the fields to get the reference's two-column
    * result.
    */
  def iDateTime(c: Column): Column =
    struct(idate(c).as("idate"), itime(c).as("itime"))
  /** week() (R/IDateTime.R:382, src/idatetime.c:148-173): 7-day blocks
    * counted from Jan 1 — NOT the ISO week ([[isoweek]] is). The
    * reference is mid-migration and computes BOTH forms:
    *  - "legacy" (its CURRENT default, which it warns about):
    *    `yday %/% 7 + 1` — week numbers advance every 7th day-of-year,
    *    so week 1 has only 6 days (ydays 1-6);
    *  - "sequential" (the ANNOUNCED future default,
    *    `options(datatable.week = 'sequential')`):
    *    `(yday - 1) %/% 7 + 1` — the first week always has 7 days
    *    (Jan 7 is week 2 in legacy, week 1 in sequential).
    * `mode` mirrors `options(datatable.week)`; the default here tracks
    * the reference's shipping default and flips when theirs does. Both
    * modes are oracled (q_idatetime) so the flip cannot drift silently.
    */
  def week(c: Column, mode: String = "legacy"): Column = mode match {
    case "legacy" =>
      floor(dayofyear(c).cast("double") / 7.0).cast("int") + 1
    case "sequential" =>
      floor((dayofyear(c) - 1).cast("double") / 7.0).cast("int") + 1
    case other => throw new IllegalArgumentException(
      s"week mode=$other (legacy|sequential, mirroring options(datatable.week))")
  }
  /** isoyear() (R/IDateTime.R:390): the year that OWNS the ISO week —
    * the year of that week's Thursday (Jan 1-3 can belong to the
    * previous ISO year, Dec 29-31 to the next). `weekday` is
    * 0=Monday..6, so Thursday = date + (3 - weekday).
    */
  def isoyear(c: Column): Column =
    year(date_add(to_date(c), lit(3) - weekday(c)))

  // ---- misc vector ops (src/vecseq.c, src/init.c) ---------------------

  /** vecseq analog — expand (start, len) pairs into row sequences.
    * len <= 0 yields an EMPTY array (Spark's bare sequence() would
    * auto-reverse into a 2-element descending array).
    */
  def vecseq(start: Column, len: Column): Column =
    when(len > 0, sequence(start, start + len - 1))
      .otherwise(slice(sequence(start, start), 1, 0))

  /** frev — reverse an array column. */
  def frev(c: Column): Column = reverse(c)

  /** setNumericRounding analog (src/bmerge.c:12): opt-in tolerance
    * equality for doubles — an explicit expression rather than a global
    * knob.
    */
  def approxEqual(a: Column, b: Column, eps: Double = 1e-9): Column =
    abs(a - b) < lit(eps)
  /** setNumericRounding TRUE semantics (man/setNumericRounding.Rd):
    * round the last `bytes` (0/1/2) off the double's significand —
    * apply to both sides of a join/group/order key for the reference's
    * rounded comparison behavior.
    */
  def roundMantissa(c: Column, bytes: Int): Column =
    graft.plans.RoundMantissa(c, bytes)
  /** Rounded equality, the join-predicate form of setNumericRounding. */
  def roundedEqual(a: Column, b: Column, bytes: Int): Column =
    roundMantissa(a, bytes) === roundMantissa(b, bytes)
}
