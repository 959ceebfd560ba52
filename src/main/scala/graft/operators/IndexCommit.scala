package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crash-safe, retry-idempotent commit protocol for the persisted
  * ANN/dedup index appends (`appendToLshIndex` / `appendToBandIndex` /
  * `appendToCellIndex`).
  *
  * The round-18 appends were job-atomic per WRITE but not per APPEND:
  * `appendToLshIndex` parquet-Appended sigs and then Overwrote counts,
  * so a crash between the two left counts inconsistent with sigs
  * (searches silently dropped every query hashing to the orphaned
  * signatures), and a caller retrying the whole call after a partial
  * failure double-appended the batch (VERDICT r18 "What's missing" #2;
  * ADVICE r18 #2). At 100 TB these appends run nightly — they need a
  * protocol, not luck.
  *
  * The protocol (a minimal Delta-log-shaped manifest):
  *
  *   - Batch data is STAGED, never appended in place:
  *     `<root>/batches/<key>/<component>` — a crashed attempt's partial
  *     dir is unreferenced garbage, and the retry's `Overwrite` of the
  *     same dir replaces it.
  *   - Versioned aggregates (the LSH bucket counts) are written to a
  *     FRESH dir per attempt — `counts_v<N+1>_<key>` — never
  *     overwritten in place, so a concurrent or crashed attempt can
  *     never clobber the dir a committed manifest points at.
  *   - A manifest file `_commit_v<N>` lists the aggregate dir and every
  *     committed batch key. It is published by writing a tmp file and
  *     RENAMING it to a destination that never pre-exists (versions
  *     only grow) — an atomic CREATE on both the local fs and HDFS; a
  *     reader lists the root and takes the highest version, so it sees
  *     either the old complete manifest or the new complete one, never
  *     a torn state. (Object stores without atomic rename-create need a
  *     coordination layer — the same caveat as every rename-based
  *     committer.)
  *   - Idempotence: the batch key is a content hash ([[batchKey]]); an
  *     append whose key is already in the manifest is a no-op, so a
  *     caller-level retry after ANY failure point is safe — it either
  *     finds its key committed (done) or re-runs the staging writes
  *     (Overwrite) and publishes.
  *
  * Version 0 is the LEGACY state: a root with no `_commit_v*` file
  * reads exactly as the round-18 layout wrote it (base component dirs
  * only, counts at the unversioned path), so indexes saved before this
  * protocol keep working and the first append migrates them.
  *
  * Concurrency: two appenders of DIFFERENT batches stage disjoint dirs
  * and race only on the manifest create — the loser's rename fails, it
  * re-reads the new state and retries ([[publish]] returns false).
  * Two live JVMs appending the SAME batch key race on the staged dir's
  * Overwrite and are outside the contract (the harness keeps index
  * roots per-JVM via [[graft.RuntimeTmp]] for exactly this reason);
  * same-key re-append within one caller's retry loop is the supported,
  * idempotent case.
  */
object IndexCommit {

  /** A committed index state: manifest `version` (0 = legacy, nothing
    * committed through the protocol), the aggregate dir name under the
    * root (None = the component has no versioned aggregate, or legacy),
    * and the committed batch keys in commit order.
    */
  final case class State(version: Int, aggDir: Option[String],
                         batches: Seq[String])

  private val CommitName = "^_commit_v([0-9]+)$".r

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Latest committed state at `root`, or the version-0 legacy state. */
  def read(spark: SparkSession, root: String): State = {
    val (fs, p) = fsOf(spark, root)
    if (!fs.exists(p)) return State(0, None, Nil)
    val commits = fs.listStatus(p).toSeq.flatMap { st =>
      st.getPath.getName match {
        case CommitName(v) => Some(v.toInt -> st.getPath)
        case _             => None
      }
    }
    if (commits.isEmpty) State(0, None, Nil)
    else {
      val (v, path) = commits.maxBy(_._1)
      val in = fs.open(path)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val lines = txt.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
      val agg = lines.headOption match {
        case Some(l) if l.startsWith("agg=") =>
          Some(l.stripPrefix("agg=")).filter(_ != "-")
        case _ => None
      }
      State(v, agg, lines.drop(1))
    }
  }

  /** Atomically publish manifest `version`. Returns false when that
    * version already exists (a concurrent appender won — re-read and
    * retry). First line `agg=<dir|- >`, then one batch key per line.
    */
  def publish(spark: SparkSession, root: String, version: Int,
              aggDir: Option[String], batches: Seq[String]): Boolean = {
    val (fs, rootP) = fsOf(spark, root)
    val dst = new org.apache.hadoop.fs.Path(rootP, s"_commit_v$version")
    if (fs.exists(dst)) return false
    val tmp = new org.apache.hadoop.fs.Path(rootP,
      s"._commit_v$version.tmp.${ProcessHandle.current().pid()}")
    val out = fs.create(tmp, true)
    try out.write(
      (s"agg=${aggDir.getOrElse("-")}\n" + batches.mkString("", "\n", "\n"))
        .getBytes("UTF-8"))
    finally out.close()
    val ok = fs.rename(tmp, dst)
    if (!ok) { fs.delete(tmp, false); () }
    ok
  }

  /** Content-derived idempotence key for an append batch: the row
    * count plus an order-independent sum of xxhash64 over the named
    * columns — a retry of the same batch content reproduces the key
    * exactly regardless of partitioning or row order. One bounded
    * driver collect (a single aggregate row; DriverCollectSpec row).
    */
  def batchKey(df: DataFrame, cols: Seq[String]): String = {
    // sum as decimal(38,0): exact and order-independent like a long
    // sum, but cannot hit the ANSI long-overflow error at any batch
    // size (2^63-magnitude terms × up to ~1e19 rows fit in 38 digits)
    val r = df
      .agg(count(lit(1)).as("n"),
        sum(xxhash64(cols.map(col): _*).cast("decimal(38,0)")).as("h"))
      .collect()(0)
    val n = r.getLong(0)
    val h =
      if (r.isNullAt(1)) java.math.BigInteger.ZERO
      else r.getDecimal(1).toBigInteger
    s"b${n}x${h.toString(16).replace("-", "m")}"
  }

  /** Parquet paths of component `sub` under a committed state: the base
    * dir plus every committed batch's staged dir, in commit order.
    */
  def componentPaths(root: String, sub: String, state: State): Seq[String] =
    s"$root/$sub" +: state.batches.map(k => s"$root/batches/$k/$sub")

  /** Read component `sub` across base + committed batches. */
  def readComponent(spark: SparkSession, root: String, sub: String,
                    state: State): DataFrame =
    spark.read.parquet(componentPaths(root, sub, state): _*)

  /** Read component `sub` at the CURRENT committed state. */
  def readComponent(spark: SparkSession, root: String,
                    sub: String): DataFrame =
    readComponent(spark, root, sub, read(spark, root))

  /** Staged dir for a batch's component. */
  def stagePath(root: String, key: String, sub: String): String =
    s"$root/batches/$key/$sub"

  /** Drop every protocol artifact under `root` (manifests, staged
    * batches, versioned aggregate dirs) — a full index REBUILD's reset,
    * run BEFORE overwriting the base dirs so a crash mid-reset leaves
    * readers on the legacy view of the still-intact old base rather
    * than a new-base/old-manifest mix. Not crash-atomic overall: a
    * rebuild that must stay readable throughout should build into a
    * fresh root and swap at the orchestration layer.
    */
  def reset(spark: SparkSession, root: String): Unit = {
    val (fs, p) = fsOf(spark, root)
    if (!fs.exists(p)) return
    // manifests first: once they are gone readers are on the legacy view
    fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (CommitName.findFirstIn(n).isDefined || n.startsWith("._commit_v"))
        fs.delete(st.getPath, false)
    }
    fs.delete(new org.apache.hadoop.fs.Path(p, "batches"), true)
    fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("counts_v")) fs.delete(st.getPath, true)
    }
    ()
  }

  /** Append driver: stage-(via `stage`)-then-publish with the
    * idempotence check and the lost-publish-race retry loop. `stage`
    * writes the batch's component dirs (and the fresh aggregate dir,
    * returning its name) for the given (state, key). Returns true when
    * this call committed the batch, false when the key was already
    * committed (no-op retry).
    */
  def commitBatch(spark: SparkSession, root: String, key: String)
                 (stage: State => Option[String]): Boolean = {
    var attempts = 0
    while (true) {
      val st = read(spark, root)
      if (st.batches.contains(key)) return false
      val agg = stage(st)
      if (publish(spark, root, st.version + 1, agg, st.batches :+ key))
        return true
      attempts += 1
      if (attempts >= 5) throw new IllegalStateException(
        s"IndexCommit: lost the publish race $attempts times at $root " +
          s"(key=$key) — concurrent appender storm?")
    }
    false // unreachable
  }
}
