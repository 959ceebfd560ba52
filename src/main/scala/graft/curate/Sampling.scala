package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-addressed sampling for training-data
  * curation (pipeline extension — not in the reference, which samples
  * with R's RNG; at corpus scale sampling must be a pure function of
  * the row so it is reproducible across runs, partitionings, and
  * incremental corpus growth).
  *
  * The sampling decision is `md5(key) mod denom < rate·denom`: one
  * codegen'd expression, no RNG state, no shuffle — a narrow filter
  * that pushes into the scan stage. The md5-prefix identity is the
  * same 60-bit portable hash used by the dedup kernels
  * (plans/PortableHashExprs.scala), so a SQL oracle reproduces every
  * decision bit-for-bit: ('0x'||substr(md5(k),1,15))::BIGINT.
  */
object Sampling {

  /** 60-bit content identity of a string column (md5-prefix; always
    * non-negative, so `% denom` is safe on both engines). A null key
    * hashes as the empty string — without the coalesce, null rows would
    * evaluate the sampling predicate to null and be silently dropped
    * even at rate 1.0.
    */
  def contentId(c: Column): Column =
    conv(substring(md5(coalesce(c, lit("")).cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Keep each row iff hash(key) falls under `rate`: deterministic
    * Bernoulli sampling keyed on content. Same key ⇒ same decision on
    * every run and at every scale — re-running on a grown corpus keeps
    * every previously-kept row.
    */
  def hashSample(df: DataFrame, key: Column, rate: Double,
                 denom: Long = 10000L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(contentId(key) % denom < math.round(rate * denom))
  }

  /** Per-stratum rates (e.g. downsample dominant languages): the rates
    * table broadcasts (strata counts are small by definition) and the
    * filter stays a narrow map-side operation — no shuffle of the
    * corpus. Strata absent from `rates` keep `default`.
    */
  def stratifiedHashSample(df: DataFrame, key: Column, strataCol: String,
                           rates: Map[String, Double], default: Double,
                           denom: Long = 10000L): DataFrame = {
    require((default +: rates.values.toSeq).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0,1]")
    val spark = df.sparkSession
    import spark.implicits._
    val ratesDf = rates.toSeq.map { case (k, r) => (k, math.round(r * denom)) }
      .toDF(strataCol, "_graft_thr")
    df.join(broadcast(ratesDf), Seq(strataCol), "left")
      .withColumn("_graft_thr",
        coalesce(col("_graft_thr"), lit(math.round(default * denom))))
      .filter(contentId(key) % denom < col("_graft_thr"))
      .drop("_graft_thr")
  }

  /** Keep at most `n` rows per key (C4-style domain caps: no single
    * host dominates the corpus). Survivors are chosen by content hash
    * — deterministic across runs/partitionings, and unbiased w.r.t.
    * row order — with `tiebreak` disambiguating equal hashes.
    *
    * One hash shuffle on the key. Key cardinality is high (domains) so
    * the exchange is balanced; a single pathological mega-key costs
    * one task sorting that key's rows, which the partial top-n
    * window-group optimization in Spark ≥3.5 bounds when `n` is small.
    */
  def capPerKey(df: DataFrame, key: Column, sortKey: Column, n: Int,
                tiebreak: Column): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(contentId(sortKey).asc, tiebreak.asc)
    df.withColumn("_graft_rk", row_number().over(w))
      .filter(col("_graft_rk") <= n)
      .drop("_graft_rk")
  }
}
