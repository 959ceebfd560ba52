package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextFunctions

/** Training-data pipeline queries: dedup, text analysis, similarity
  * search, streaming-equivalent batch windows (builder-prompt extension
  * set; documents/embeddings/events tables).
  */
object QueriesTextSim {
  import Queries.{Entry, Q}

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def emb(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")
  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  def entries: Seq[Entry] = Seq(

    // ---- token counting -------------------------------------------------
    ("q_token_count", ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))): Q,
      Some("""SELECT doc_id,
             |  len(string_split_regex(trim(text), '\s+')) AS n_tokens
             |FROM documents""".stripMargin)),

    // ---- BPE-ish subword token counting ---------------------------------
    ("q_bpe_tokens", ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.bpeishTokens(col("text")).as("n_subtokens"))): Q,
      None),

    // ---- rolling-hash document signature (order-sensitive) --------------
    ("q_rolling_hash", ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.rollingHash(col("text")).as("rh"))): Q,
      None),

    // ---- quality scoring ------------------------------------------------
    ("q_quality", ((s, dir) =>
      docs(s, dir)
        .withColumn("f", TextFunctions.qualityFeatures(col("text")))
        .select(col("doc_id"),
          col("f.n_chars").as("n_chars"),
          col("f.n_tokens").as("n_tokens"),
          round(col("f.mean_token_len"), 4).as("mean_token_len"),
          round(col("f.punct_ratio"), 4).as("punct_ratio"),
          round(col("f.stopword_ratio"), 4).as("stopword_ratio"))): Q,
      Some(s"""SELECT doc_id,
              |  length(text)::DOUBLE AS n_chars,
              |  len(string_split_regex(trim(text), '\\s+'))::DOUBLE AS n_tokens,
              |  round(length(text)::DOUBLE /
              |        len(string_split_regex(trim(text), '\\s+')), 4) AS mean_token_len,
              |  round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
              |        / length(text), 4) AS punct_ratio,
              |  round(len(list_filter(string_split_regex(trim(text), '\\s+'),
              |        t -> list_contains(${sqlStops}, lower(t))))::DOUBLE
              |        / len(string_split_regex(trim(text), '\\s+')), 4) AS stopword_ratio
              |FROM documents""".stripMargin)),

    // ---- language ID heuristic (no SQL equivalent — rows-only check) ---
    ("q_langid", ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.langIdHeuristic(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))): Q,
      None),

    // ---- document fingerprint (rolling hash + md5 forms) ---------------
    ("q_fingerprint", ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))): Q,
      Some("""SELECT doc_id,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
             |FROM documents""".stripMargin)),

    // ---- exact dedup (hash-groupBy on fingerprint) ----------------------
    ("q_dedup_exact", ((s, dir) =>
      Dedup.exact(docs(s, dir), "text", "doc_id")
        .orderBy(col("doc_id"))): Q,
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS dup_count
             |FROM documents
             |GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))""".stripMargin)),

    // ---- MinHash LSH near-dup pairs (rows-only: not SQL-expressible) ---
    ("q_dedup_minhash", ((s, dir) =>
      Dedup.minhashPairs(docs(s, dir), "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, threshold = 0.5)): Q,
      None),

    // ---- SimHash signatures + near-dup by Hamming distance -------------
    ("q_simhash", ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Dedup.simhash(col("text")).as("sig"))): Q,
      None),

    // ---- n-gram Jaccard on adjacent doc pairs (deterministic pairing) --
    ("q_ngram_jaccard", ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val a = d.withColumnRenamed("doc_id", "idA").withColumnRenamed("text", "tA")
      val b = d.withColumnRenamed("doc_id", "idB").withColumnRenamed("text", "tB")
      a.join(b, col("idB") === col("idA") + 1)
        .select(col("idA"), col("idB"),
          round(Dedup.ngramJaccard(col("tA"), col("tB"), 3), 4).as("jac"))
    }): Q,
      None),

    // ---- embedding cosine top-k (brute force baseline) ------------------
    ("q_embed_topk", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val queries = e.filter(col("vec_id").isin(0L, 1L, 2L))
      Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), round(col("sim"), 3).as("sim"),
          col("rk"))
    }): Q,
      Some("""SELECT query_id, neighbor_id, round(sim, 3) AS sim, rk FROM (
             |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |    list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
             |               c.vec_id ASC) AS rk
             |  FROM embeddings c, embeddings q
             |  WHERE q.vec_id IN (0, 1, 2) AND c.vec_id <> q.vec_id)
             |WHERE rk <= 5""".stripMargin)),

    // ---- LSH-bucketed ANN (scale path; rows-only) -----------------------
    ("q_ann_lsh", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val queries = e.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L))
      Similarity.lshTopK(e, queries, "vec_id", "embedding",
        dim = 64, nBits = 4, k = 5)
    }): Q,
      None),

    // ---- IVF coarse quantization (ANN scale path #2; rows-only) --------
    ("q_ann_ivf", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      // Deterministic centroids: the 4 lowest vec_ids (tiny driver-side
      // collect; a real pipeline would sample+kmeans upstream).
      val centroids = e.filter(col("vec_id") < 4).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Double](0).toSeq).toSeq
      Similarity.ivfAssign(e, "embedding", centroids)
        .groupBy(col("ivf_cell")).agg(count(lit(1)).as("n"))
    }): Q,
      None),

    // ---- multimodal-ish: opaque binary metadata -------------------------
    ("q_binary_meta", ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        substring(md5(col("text")), 1, 8).as("sig"))): Q,
      Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             |  substr(md5(text), 1, 8) AS sig
             |FROM documents""".stripMargin)),

    // ---- tumbling window aggregation (batch twin of streaming mode) ----
    ("q_window_tumbling", ((s, dir) =>
      ev(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("v"))): Q,
      Some("""SELECT date_trunc('hour', ts) AS h, event_type,
             |  count(*) AS n, round(sum(value), 3) AS v
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // ---- composite training-data pipeline: quality → dedup → stats -----
    // Filter documents by quality features, dedup by fingerprint, report
    // per-language token statistics — the end-to-end LLM-pipeline shape.
    ("q_doc_pipeline", ((s, dir) => {
      val q = docs(s, dir)
        .withColumn("f", TextFunctions.qualityFeatures(col("text")))
        .filter(col("f.n_tokens") >= 10 && col("f.stopword_ratio") < 0.9)
        .withColumn("fp", TextFunctions.fingerprint(col("text")))
      val deduped = q.withColumn("occ",
          org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
              .orderBy(col("doc_id").asc)))
        .filter(col("occ") === 1)
      deduped.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("f.n_tokens")), 3).as("avg_tokens"),
          sum(col("f.n_tokens")).cast("long").as("total_tokens"))
    }): Q,
      Some("""WITH q AS (
             |  SELECT doc_id, lang,
             |    len(string_split_regex(trim(text), '\s+'))::DOUBLE AS n_tokens,
             |    len(list_filter(string_split_regex(trim(text), '\s+'),
             |        t -> list_contains(['the', 'a', 'an', 'and', 'or', 'of', 'to', 'in',
             |          'is', 'it', 'that', 'for', 'on', 'with', 'as', 'at', 'by', 'be',
             |          'this', 'are', 'was', 'from', 'but', 'not', 'they', 'his', 'her',
             |          'she', 'he', 'you', 'we'], lower(t))))::DOUBLE
             |      / len(string_split_regex(trim(text), '\s+')) AS stopword_ratio,
             |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
             |  FROM documents),
             |d AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS occ
             |      FROM q WHERE n_tokens >= 10 AND stopword_ratio < 0.9)
             |SELECT lang, count(*) AS n_docs,
             |  round(avg(n_tokens), 3) AS avg_tokens,
             |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
             |FROM d WHERE occ = 1 GROUP BY lang""".stripMargin)),

    // ---- JSON column extraction (SURVEY.md §2.9 json family) ------------
    ("q_json_props", ((s, dir) =>
      ev(s, dir).select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))): Q,
      Some("""SELECT CAST(props->>'k' AS BIGINT) AS k, count(*) AS n
             |FROM events GROUP BY 1""".stripMargin)),

    // ---- grouped list aggregation (dogroups list-column result) ---------
    // The reference's `list(unique(x))` per group (benchmark.Rraw:18-23
    // fixture shape) — sorted for cross-engine determinism.
    ("q_collect_agg", ((s, dir) =>
      ev(s, dir).groupBy(col("user_id"))
        .agg(array_join(sort_array(collect_set(col("event_type"))), ",").as("types"),
          count(lit(1)).as("n"))): Q,
      Some("""SELECT user_id,
             |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
             |  count(*) AS n
             |FROM events GROUP BY user_id""".stripMargin)),

    // ---- fread/fwrite CSV roundtrip (SURVEY.md §2.1) --------------------
    ("q_fread_roundtrip", ((s, dir) => {
      val out = s"/tmp/graft_fread_rt"
      graft.sources.Fread.fwrite(Tables.load(s, dir, "nation"), out,
        graft.sources.Fread.FwriteOptions(sep = "\t"))
      graft.sources.Fread.fread(s, out)   // sep auto-sniffed
        .select(col("n_nationkey").cast("int").as("n_nationkey"),
          col("n_name"), col("n_regionkey").cast("int").as("n_regionkey"))
    }): Q,
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation")),

    // ---- multimodal decode plumbing (stubbed codec; rows-only) ----------
    ("q_media_features", ((s, dir) => {
      val blobs = graft.mm.Multimodal.blobsFromDocuments(
        Tables.load(s, dir, "documents"))
      graft.mm.Multimodal.extractFeatures(blobs).toDF()
        .select(col("media_id"), col("n_bytes"), round(element_at(col("features"), 1), 4).as("f0"))
    }): Q,
      None),

    // ---- sliding window aggregation (streaming twin, batch form) -------
    // 1-hour windows sliding every 30 min: each event lands in exactly 2
    // windows (len = 2×slide), epoch-aligned like Spark's window().
    ("q_window_sliding", ((s, dir) =>
      ev(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("v"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("v"))): Q,
      Some("""SELECT ws, event_type, count(*) AS n, round(sum(value), 3) AS v
             |FROM (
             |  SELECT make_timestamp(epoch_us(ts) - (epoch_us(ts) % 1800000000)) AS ws,
             |         event_type, value FROM events
             |  UNION ALL
             |  SELECT make_timestamp(epoch_us(ts) - (epoch_us(ts) % 1800000000)
             |                        - 1800000000) AS ws,
             |         event_type, value FROM events)
             |GROUP BY ws, event_type""".stripMargin)),

    // ---- sessionization (30-min inactivity gap, gaps-and-islands) ------
    ("q_session", ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
      val newSession = when(gap.isNull || gap > 1800L * 1000000L, 1).otherwise(0)
      ev(s, dir)
        .withColumn("sid", sum(newSession).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"))
        .agg(max(col("sid")).as("n_sessions"), count(lit(1)).as("n_events"))
    }): Q,
      Some("""SELECT user_id, max(sid) AS n_sessions, count(*) AS n_events FROM (
             |  SELECT user_id,
             |    sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM (SELECT user_id, ts, event_id,
             |          epoch_us(ts) - lag(epoch_us(ts))
             |            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
             |        FROM events))
             |GROUP BY user_id""".stripMargin))
  )

  private def sqlStops: String =
    TextFunctions.stopwordsEn.map(s => s"'$s'").mkString("[", ", ", "]")
}
