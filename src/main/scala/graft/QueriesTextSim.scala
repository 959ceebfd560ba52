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

  // one bucketed-index build per (session, sf dir) — the nightly-fit
  // analog; reruns of q_dedup_incr_bucketed time only the batch search.
  // SessionMemo (round 11, was a bare TrieMap): same per-key-lock
  // insert + keys/size observability as every other fit memo.
  private val bucketedIdxBuilt = new SessionMemo[Boolean]()
  // Seed centroids (4 lowest vec_ids) are an EAGER driver collect: left
  // in the builder they re-scan the embeddings table at EVERY bench rep
  // of every ANN/SemDeDup query (the Dsir-count lesson). One fit per
  // (session, sf dir) — the corpus is immutable within a run.
  private val seedCentroidMemo = new SessionMemo[Seq[Seq[Double]]]()
  private def seedCentroids(s: SparkSession, dir: String,
                            e: DataFrame): Seq[Seq[Double]] =
    seedCentroidMemo.getOrElsePut(s"${System.identityHashCode(s)}:$dir")(
      e.filter(col("vec_id") < 4).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Double](0).toSeq).toSeq)

  /** Forget the query-harness fits (index builds, seed centroids) —
    * the same clear contract as the operator memos; tests use it to
    * force a rebuild.
    */
  private[graft] def clearQueryFits(): Unit = {
    bucketedIdxBuilt.clear()
    seedCentroidMemo.clear()
  }
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
    // split-on-alnum-boundary count ≡ #alnum-runs + #non-alnum chars
    // (RE2 has no lookarounds, so the oracle states the identity directly)
    ("q_bpe_tokens", ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.bpeishTokens(col("text")).as("n_subtokens"))): Q,
      Some("""SELECT doc_id,
             |  (len(regexp_extract_all(text, '[A-Za-z0-9]+')) +
             |   len(regexp_extract_all(text, '[^A-Za-z0-9]'))) AS n_subtokens
             |FROM documents""".stripMargin)),

    // ---- rolling-hash document signature (order-sensitive) --------------
    // Portable variant: md5-derived token hashes + 59-bit rotate-xor,
    // bit-identical in DuckDB (rollingHash/xxhash64 is the JVM-only twin).
    ("q_rolling_hash", ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.rollingHashPortable(col("text")).as("rh"))): Q,
      Some("""SELECT doc_id,
             |  list_reduce(list_prepend(0::BIGINT,
             |    list_transform(string_split_regex(trim(text), '\s+'),
             |      t -> ('0x'||substr(md5(t),1,15))::BIGINT)),
             |    (acc, x) -> xor((((acc & 18014398509481983) << 5) | (acc >> 54)), x)
             |                & 576460752303423487) AS rh
             |FROM documents""".stripMargin)),

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

    // ---- language ID heuristic (stopword-ratio argmax) ------------------
    ("q_langid", ((s, dir) =>
      TextFunctions.withLangId(docs(s, dir), "text")
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))): Q,
      Some(langidOracle)),

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

    // ---- fixed-width chunking (context-window packing) ------------------
    ("q_doc_chunks", ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        posexplode(TextFunctions.chunksFixed(col("text"), 100))
          .as(Seq("chunk_id", "chunk")))): Q,
      Some("""WITH d AS (SELECT doc_id, text,
             |  greatest((length(text) + 99) // 100, 1) AS n FROM documents)
             |SELECT doc_id,
             |  unnest(range(0, n))::INT AS chunk_id,
             |  unnest(list_transform(range(0, n),
             |    i -> substr(text, (i*100+1)::INT, 100))) AS chunk
             |FROM d""".stripMargin)),

    // ---- dedup pruning: drop the higher-id side of every near-dup pair -
    // (the keep-one composition a pipeline runs after pair generation;
    // anti join = no pair-loser ever shuffles its document body)
    ("q_dedup_prune", ((s, dir) => {
      val pairs = Dedup.minhashPairsPortable(docs(s, dir), "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, threshold = 0.5)
      docs(s, dir).join(
        pairs.select(col("idB").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"))
    }): Q,
      Some(s"""SELECT d.doc_id, d.lang FROM documents d
              |WHERE d.doc_id NOT IN (SELECT idB FROM ($minhashOracle) t)""".stripMargin)),

    // ---- near-dup clustering: pairs → connected components -------------
    // Transitive closure of the candidate-pair graph via alternating
    // large-star/small-star (O(log n) shuffle rounds). The oracle walks
    // the same pair list with a recursive CTE: component = min reachable
    // id — exact equality, whole pipeline adjudicated.
    ("q_dedup_cluster", ((s, dir) => {
      val pairs = Dedup.minhashPairsPortable(docs(s, dir), "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, threshold = 0.5)
      graft.dedup.Components.connectedComponents(pairs, "idA", "idB")
        .select(col("id").as("doc_id"), col("component"))
    }): Q,
      Some(s"""WITH RECURSIVE pairs AS (SELECT idA, idB FROM ($minhashOracle) t),
              |edges AS (SELECT idA AS s, idB AS d FROM pairs
              |          UNION SELECT idB AS s, idA AS d FROM pairs),
              |r(id, reach) AS (
              |  SELECT s, s FROM edges
              |  UNION
              |  SELECT r.id, e.d FROM r JOIN edges e ON e.s = r.reach)
              |SELECT id AS doc_id, min(reach) AS component
              |FROM r GROUP BY id""".stripMargin)),

    // ---- cluster-aware dedup: keep ONE representative per component ----
    // (pair-based pruning is not transitive: on a chain A-B-C it drops
    // both B and C; component pruning keeps exactly min(component))
    ("q_dedup_reps", ((s, dir) => {
      val pairs = Dedup.minhashPairsPortable(docs(s, dir), "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, threshold = 0.5)
      graft.dedup.Components.keepRepresentatives(docs(s, dir), "doc_id", pairs)
        .select(col("doc_id"), col("lang"))
    }): Q,
      Some(s"""WITH RECURSIVE pairs AS (SELECT idA, idB FROM ($minhashOracle) t),
              |edges AS (SELECT idA AS s, idB AS d FROM pairs
              |          UNION SELECT idB AS s, idA AS d FROM pairs),
              |r(id, reach) AS (
              |  SELECT s, s FROM edges
              |  UNION
              |  SELECT r.id, e.d FROM r JOIN edges e ON e.s = r.reach)
              |SELECT d.doc_id, d.lang FROM documents d
              |WHERE d.doc_id NOT IN (
              |  SELECT id FROM (SELECT id, min(reach) AS component FROM r GROUP BY id)
              |  WHERE component <> id)""".stripMargin)),

    // ---- sequence packing by token budget (per-lang shards) ------------
    ("q_token_pack", ((s, dir) => {
      val n = TextFunctions.bpeishTokens(col("text"))
      graft.curate.Packing.packByBudget(
        docs(s, dir).select(col("doc_id"), col("lang"), n.as("_n")),
        col("_n"), budget = 2000L,
        shard = Seq("lang"), order = Seq(col("doc_id")))
        .select(col("doc_id"), col("lang"), col("seq_id"))
    }): Q,
      Some("""WITH t AS (SELECT doc_id, lang,
             |  (len(regexp_extract_all(text, '[A-Za-z0-9]+')) +
             |   len(regexp_extract_all(text, '[^A-Za-z0-9]'))) AS n
             |  FROM documents)
             |SELECT doc_id, lang,
             |  CAST(floor(coalesce(sum(n) OVER (PARTITION BY lang ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT)
             |    AS seq_id
             |FROM t""".stripMargin)),

    // ---- canonical-form dedup (case/punct/space-insensitive tier) ------
    ("q_dedup_canonical", ((s, dir) =>
      Dedup.exactCanonical(docs(s, dir), "text", "doc_id")
        .orderBy(col("doc_id"))): Q,
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS dup_count
             |FROM documents
             |GROUP BY md5(trim(regexp_replace(regexp_replace(lower(text),
             |  '[^a-z0-9]', ' ', 'g'), ' +', ' ', 'g')))""".stripMargin)),

    // ---- C4-style global unit dedup (keep first occurrence) ------------
    // Registered at token granularity (the synthetic docs are single-
    // line, so sep="\n" would be a no-op here); the multi-line and
    // sentence-span cases ride the same operator and are spec-proven.
    ("q_line_dedup", ((s, dir) =>
      Dedup.unitDedup(docs(s, dir), "doc_id", "text", sep = "\\s+")): Q,
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ls
             |          FROM documents),
             |l AS (SELECT doc_id, unnest(range(0, len(ls)))::INT AS line_no,
             |             unnest(ls) AS line FROM t),
             |l2 AS (SELECT * FROM l WHERE length(trim(line)) > 0),
             |f AS (SELECT line, min(doc_id) AS doc_id FROM l2 GROUP BY line)
             |SELECT f.doc_id, min(l2.line_no)::INT AS line_no, f.line
             |FROM f JOIN l2 ON l2.line = f.line AND l2.doc_id = f.doc_id
             |GROUP BY f.doc_id, f.line""".stripMargin)),

    // ---- per-doc survival after global unit dedup ----------------------
    // The curation threshold signal: "drop docs that are mostly
    // boilerplate" = n_kept/n_units below a cutoff.
    ("q_line_dedup_stats", ((s, dir) =>
      Dedup.unitDedupStats(docs(s, dir), "doc_id", "text", sep = "\\s+")): Q,
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ls
             |          FROM documents),
             |l AS (SELECT doc_id, unnest(range(0, len(ls)))::INT AS line_no,
             |             unnest(ls) AS line FROM t),
             |l2 AS (SELECT * FROM l WHERE length(trim(line)) > 0),
             |f AS (SELECT line, min(doc_id) AS doc_id FROM l2 GROUP BY line),
             |k AS (SELECT f.doc_id, min(l2.line_no)::INT AS line_no
             |      FROM f JOIN l2 ON l2.line = f.line AND l2.doc_id = f.doc_id
             |      GROUP BY f.doc_id, f.line)
             |SELECT l2.doc_id, count(*) AS n_units,
             |  CAST(sum(CASE WHEN k.line_no IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_kept
             |FROM l2 LEFT JOIN k ON k.doc_id = l2.doc_id AND k.line_no = l2.line_no
             |GROUP BY l2.doc_id""".stripMargin)),

    // ---- repetition-ratio curation signals (Gopher §A2 family) ---------
    ("q_repetition", ((s, dir) =>
      TextFunctions.withRepetitionFeatures(docs(s, dir), "text", 2)
        .select(col("doc_id"),
          round(col("r.dup_token_frac"), 4).as("dup_token_frac"),
          round(col("r.dup_token_char_frac"), 4).as("dup_token_char_frac"),
          round(col("r.dup_ngram_frac"), 4).as("dup_ngram_frac"))): Q,
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    string_split_regex(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
             |                       '\s+') AS tk
             |  FROM documents),
             |g AS (SELECT doc_id, tk,
             |    CASE WHEN len(tk) >= 2
             |         THEN list_transform(range(0, len(tk) - 1),
             |                i -> array_to_string(list_slice(tk, i + 1, i + 2), ' '))
             |         ELSE [] END AS gr
             |  FROM t)
             |SELECT doc_id,
             |  round(CASE WHEN len(tk) > 0
             |    THEN (len(tk) - len(list_distinct(tk)))::DOUBLE / len(tk)
             |    ELSE 0.0 END, 4) AS dup_token_frac,
             |  round(CASE WHEN coalesce(list_sum(list_transform(tk, x -> length(x))), 0) > 0
             |    THEN (list_sum(list_transform(tk, x -> length(x)))
             |          - list_sum(list_transform(list_distinct(tk), x -> length(x))))::DOUBLE
             |         / list_sum(list_transform(tk, x -> length(x)))
             |    ELSE 0.0 END, 4) AS dup_token_char_frac,
             |  round(CASE WHEN len(gr) > 0
             |    THEN (len(gr) - len(list_distinct(gr)))::DOUBLE / len(gr)
             |    ELSE 0.0 END, 4) AS dup_ngram_frac
             |FROM g""".stripMargin)),

    // ---- URL/email scrubbing + removal audit counts --------------------
    // The synthetic docs carry no URLs/emails, so both are injected
    // deterministically (same concat on both engines) — the oracle then
    // adjudicates the actual regex replacement on real matches, not a
    // no-op passthrough.
    ("q_scrub", ((s, dir) => {
      val t2 = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com via https://ex.org/p/"),
        col("doc_id").cast("string"), lit(" end"))
      docs(s, dir).withColumn("t2", t2)
        .select(col("doc_id"),
          TextFunctions.scrubUrls(TextFunctions.scrubEmails(col("t2"))).as("cleaned"),
          TextFunctions.patternCount(col("t2"), TextFunctions.urlPattern).as("n_urls"),
          TextFunctions.patternCount(col("t2"), TextFunctions.emailPattern).as("n_emails"))
    }): Q,
      Some("""WITH t AS (SELECT doc_id,
             |  text || ' contact user' || doc_id::VARCHAR ||
             |  '@example.com via https://ex.org/p/' || doc_id::VARCHAR || ' end' AS t2
             |  FROM documents)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(t2,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    'https?://[^\s]+', '<URL>', 'g') AS cleaned,
             |  len(regexp_extract_all(t2, 'https?://[^\s]+')) AS n_urls,
             |  len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             |    AS n_emails
             |FROM t""".stripMargin)),

    // ---- PII scrubbing: phone numbers + IPv4 literals ------------------
    // Same deterministic-injection scheme as q_scrub: the synthetic
    // corpus has no PII, so matches are appended from doc_id and the
    // oracle adjudicates real replacements.
    ("q_scrub_pii", ((s, dir) => {
      val t2 = concat(col("text"), lit(" call +1 415 555 "),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".0.7 end"))
      docs(s, dir).withColumn("t2", t2)
        .select(col("doc_id"),
          TextFunctions.scrubIps(TextFunctions.scrubPhones(col("t2"))).as("cleaned"),
          TextFunctions.patternCount(col("t2"), TextFunctions.phonePattern).as("n_phones"),
          TextFunctions.patternCount(col("t2"), TextFunctions.ipv4Pattern).as("n_ips"))
    }): Q,
      Some("""WITH t AS (SELECT doc_id,
             |  text || ' call +1 415 555 ' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
             |  ' from 10.' || (doc_id % 256)::VARCHAR || '.0.7 end' AS t2
             |  FROM documents)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(t2,
             |    '\+\d{1,3}(?:[ -]?\d){6,13}\d', '<PHONE>', 'g'),
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS cleaned,
             |  len(regexp_extract_all(t2, '\+\d{1,3}(?:[ -]?\d){6,13}\d')) AS n_phones,
             |  len(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
             |    AS n_ips
             |FROM t""".stripMargin)),

    // ---- per-domain corpus stats ---------------------------------------
    // Host extraction + per-domain volume: the grouping key for domain
    // caps and per-source quality tracking. URL injected like q_scrub.
    ("q_domain_stats", ((s, dir) => {
      val t2 = concat(col("text"), lit(" see https://d"),
        pmod(col("doc_id"), lit(20)).cast("string"), lit(".example.com/p/"),
        col("doc_id").cast("string"))
      docs(s, dir).withColumn("t2", t2)
        .groupBy(TextFunctions.urlHost(col("t2")).as("host"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    }): Q,
      Some("""WITH t AS (SELECT doc_id, n_chars,
             |  text || ' see https://d' || (doc_id % 20)::VARCHAR ||
             |  '.example.com/p/' || doc_id::VARCHAR AS t2
             |  FROM documents)
             |SELECT regexp_extract(t2, 'https?://([^/\s]+)', 1) AS host,
             |  count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
             |FROM t GROUP BY 1""".stripMargin)),

    // ---- domain caps: at most N docs per host --------------------------
    // C4-style anti-domination: survivors chosen by content hash
    // (deterministic, order-independent), doc_id tiebreak.
    ("q_domain_cap", ((s, dir) => {
      val host = concat(lit("d"), pmod(col("doc_id"), lit(20)).cast("string"),
        lit(".example.com"))
      graft.curate.Sampling.capPerKey(
        docs(s, dir).withColumn("host", host),
        col("host"), col("text"), 10, col("doc_id"))
        .select(col("doc_id"), col("host"))
    }): Q,
      Some("""WITH t AS (SELECT doc_id, text,
             |  'd' || (doc_id % 20)::VARCHAR || '.example.com' AS host
             |  FROM documents)
             |SELECT doc_id, host FROM (
             |  SELECT doc_id, host,
             |    row_number() OVER (PARTITION BY host
             |      ORDER BY ('0x'||substr(md5(coalesce(text,'')),1,15))::BIGINT ASC,
             |               doc_id ASC) AS rk
             |  FROM t) WHERE rk <= 10""".stripMargin)),

    // ---- composed Gopher-style quality filter --------------------------
    // keep + comma-joined failure reasons; '#' runs injected from
    // doc_id so the symbol rule fires on a deterministic subset.
    // Thresholds tuned to the synthetic corpus so every branch of the
    // rule set is exercised (167 keeps, 6 distinct reason combos).
    ("q_quality_filter", ((s, dir) => {
      val t2 = concat(col("text"), lit(" "),
        expr("repeat('#', CAST(doc_id % 9 AS INT))"))
      TextFunctions.withGopherFilter(docs(s, dir).withColumn("t2", t2), "t2",
          minTokens = 30, maxTokens = 100000, minMeanLen = 3.0,
          maxMeanLen = 4.5, maxSymbolRatio = 0.1, minAlphaRatio = 0.8,
          minStopwords = 1)
        .select(col("doc_id"), col("f.keep").as("keep"),
          col("f.reasons").as("reasons"))
    }): Q,
      Some("""WITH d2 AS (SELECT doc_id,
             |    text || ' ' || repeat('#', (doc_id % 9)::INT) AS text
             |  FROM documents),
             |t AS (
             |  SELECT doc_id, text,
             |    coalesce(string_split_regex(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
             |                                '\s+'), []) AS tk
             |  FROM d2),
             |f AS (
             |  SELECT doc_id,
             |    len(tk)::DOUBLE AS n_tok,
             |    CASE WHEN len(tk) > 0
             |      THEN list_sum(list_transform(tk, x -> length(x)))::DOUBLE / len(tk)
             |      ELSE 0.0 END AS mean_len,
             |    CASE WHEN len(tk) > 0 THEN
             |      ((length(text) - length(replace(text, '#', ''))) +
             |       len(regexp_extract_all(text, '\.\.\.')))::DOUBLE / len(tk)
             |      ELSE 0.0 END AS symbol_ratio,
             |    CASE WHEN len(tk) > 0
             |      THEN len(list_filter(tk, x -> regexp_matches(x, '[a-z]')))::DOUBLE / len(tk)
             |      ELSE 0.0 END AS alpha_ratio,
             |    len(list_intersect(list_distinct(tk),
             |        ['the','be','to','of','and','that','have','with'])) AS n_stop
             |  FROM t)
             |SELECT doc_id,
             |  (len(list_filter([
             |     CASE WHEN n_tok < 30 OR n_tok > 100000 THEN 'tokens' ELSE NULL END,
             |     CASE WHEN mean_len < 3.0 OR mean_len > 4.5 THEN 'wordlen' ELSE NULL END,
             |     CASE WHEN symbol_ratio > 0.1 THEN 'symbol' ELSE NULL END,
             |     CASE WHEN alpha_ratio < 0.8 THEN 'alpha' ELSE NULL END,
             |     CASE WHEN n_stop < 1 THEN 'stopword' ELSE NULL END],
             |     x -> x IS NOT NULL)) = 0) AS keep,
             |  coalesce(array_to_string(list_filter([
             |     CASE WHEN n_tok < 30 OR n_tok > 100000 THEN 'tokens' ELSE NULL END,
             |     CASE WHEN mean_len < 3.0 OR mean_len > 4.5 THEN 'wordlen' ELSE NULL END,
             |     CASE WHEN symbol_ratio > 0.1 THEN 'symbol' ELSE NULL END,
             |     CASE WHEN alpha_ratio < 0.8 THEN 'alpha' ELSE NULL END,
             |     CASE WHEN n_stop < 1 THEN 'stopword' ELSE NULL END],
             |     x -> x IS NOT NULL), ','), '') AS reasons
             |FROM f""".stripMargin)),

    // ---- benchmark decontamination (n-gram overlap) --------------------
    // Corpus docs sharing any word 3-gram with the "benchmark" slice
    // (doc_id % 37 = 0 stands in for an eval suite). Benchmark grams
    // broadcast; corpus text never shuffles — only slim (doc_id, gram)
    // hits reach the one aggregation exchange.
    ("q_contamination", ((s, dir) => {
      val d = docs(s, dir)
      graft.curate.Contamination.ngramOverlap(
        d.filter(pmod(col("doc_id"), lit(37)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(37)) === 0),
        "doc_id", "text", n = 3)
    }): Q,
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    string_split_regex(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
             |                       '\s+') AS tk
             |  FROM documents),
             |g AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) >= 3
             |         THEN list_distinct(list_transform(range(0, len(tk) - 2),
             |                i -> array_to_string(list_slice(tk, i + 1, i + 3), ' ')))
             |         ELSE [] END AS gr
             |  FROM t),
             |bench AS (SELECT DISTINCT unnest(gr) AS gram FROM g WHERE doc_id % 37 = 0),
             |corpus AS (SELECT doc_id, unnest(gr) AS gram FROM g WHERE doc_id % 37 <> 0)
             |SELECT c.doc_id, count(*) AS n_hits
             |FROM corpus c JOIN bench b ON c.gram = b.gram
             |GROUP BY 1""".stripMargin)),

    // ---- decontamination, bloom-prefiltered tier -----------------------
    // Same EXACT semantics as q_contamination (bloom false positives
    // die in the verify join; false negatives are impossible), so the
    // oracle is shared verbatim — what changes is the 100 TB shape:
    // a ~1 byte/gram broadcast and a map-side gate in place of a
    // full-gram-set hash probe per corpus gram.
    ("q_contamination_bloom", ((s, dir) => {
      val d = docs(s, dir)
      graft.curate.Contamination.ngramOverlapBloom(
        d.filter(pmod(col("doc_id"), lit(37)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(37)) === 0),
        "doc_id", "text", n = 3)
    }): Q,
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    string_split_regex(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
             |                       '\s+') AS tk
             |  FROM documents),
             |g AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) >= 3
             |         THEN list_distinct(list_transform(range(0, len(tk) - 2),
             |                i -> array_to_string(list_slice(tk, i + 1, i + 3), ' ')))
             |         ELSE [] END AS gr
             |  FROM t),
             |bench AS (SELECT DISTINCT unnest(gr) AS gram FROM g WHERE doc_id % 37 = 0),
             |corpus AS (SELECT doc_id, unnest(gr) AS gram FROM g WHERE doc_id % 37 <> 0)
             |SELECT c.doc_id, count(*) AS n_hits
             |FROM corpus c JOIN bench b ON c.gram = b.gram
             |GROUP BY 1""".stripMargin)),

    // ---- decontamination, DISTRIBUTED bloom build (round 10) ------------
    // the giant-bench tier: the filter is built by BloomFilterAggregate
    // (per-partition merge, only filter bytes reach the driver) — still
    // EXACT, so it shares the same oracle as the exact/driver-bloom tiers
    ("q_contamination_bloom_dist", ((s, dir) => {
      val d = docs(s, dir)
      graft.curate.Contamination.ngramOverlapBloomDistributed(
        d.filter(pmod(col("doc_id"), lit(37)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(37)) === 0),
        "doc_id", "text", n = 3)
    }): Q,
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    string_split_regex(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
             |                       '\s+') AS tk
             |  FROM documents),
             |g AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) >= 3
             |         THEN list_distinct(list_transform(range(0, len(tk) - 2),
             |                i -> array_to_string(list_slice(tk, i + 1, i + 3), ' ')))
             |         ELSE [] END AS gr
             |  FROM t),
             |bench AS (SELECT DISTINCT unnest(gr) AS gram FROM g WHERE doc_id % 37 = 0),
             |corpus AS (SELECT doc_id, unnest(gr) AS gram FROM g WHERE doc_id % 37 <> 0)
             |SELECT c.doc_id, count(*) AS n_hits
             |FROM corpus c JOIN bench b ON c.gram = b.gram
             |GROUP BY 1""".stripMargin)),

    // ---- flagship: end-to-end curation pipeline ------------------------
    // quality gate → URL scrub → canonical dedup → decontamination →
    // domain cap → per-lang corpus stats. Every stage is the
    // oracle-proven operator; the oracle chains the same mirrors.
    ("q_curation_pipeline", ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val bench = d.filter(pmod(col("doc_id"), lit(37)) === 0)
      val base = d.filter(pmod(col("doc_id"), lit(37)) =!= 0)
        .withColumn("t2", concat(col("text"), lit(" see https://d"),
          pmod(col("doc_id"), lit(20)).cast("string"), lit(".example.com/p/"),
          col("doc_id").cast("string")))
      val quality = TextFunctions.withGopherFilter(base, "t2", minTokens = 30,
          maxTokens = 100000, minMeanLen = 3.0, maxMeanLen = 5.2,
          maxSymbolRatio = 0.1, minAlphaRatio = 0.8, minStopwords = 1)
        .filter(col("f.keep"))
        .withColumn("clean", TextFunctions.scrubUrls(col("t2")))
        .withColumn("host", TextFunctions.urlHost(col("t2")))
      val deduped = quality
        .withColumn("cfp", md5(TextFunctions.canonicalize(col("clean"))))
        .withColumn("occ", row_number().over(
          Window.partitionBy("cfp").orderBy(col("doc_id").asc)))
        .filter(col("occ") === 1)
      // drop-list grams come from the cheap base projection, not the
      // quality+dedup subtree: contamination is per-doc text-pure, so
      // the verdicts agree exactly on deduped's ids and the anti join
      // result is identical — but the expensive kept-side plan is no
      // longer evaluated twice (decontaminateVia scaladoc)
      val decon = graft.curate.Contamination.decontaminateVia(deduped,
        base.select(col("doc_id"),
          TextFunctions.scrubUrls(col("t2")).as("clean")),
        bench.select(col("doc_id"), col("text").as("clean")),
        "doc_id", "clean", n = 3)
      val capped = graft.curate.Sampling.capPerKey(decon, col("host"),
        col("clean"), 3, col("doc_id"))
      capped.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("clean"))).cast("long").as("total_tokens"))
    }): Q,
      Some("""WITH base AS (
             |  SELECT doc_id, lang,
             |    text || ' see https://d' || (doc_id % 20)::VARCHAR ||
             |      '.example.com/p/' || doc_id::VARCHAR AS t2
             |  FROM documents WHERE doc_id % 37 <> 0),
             |tkd AS (
             |  SELECT doc_id, lang, t2,
             |    string_split_regex(trim(regexp_replace(lower(trim(t2)), '\s+', ' ', 'g')),
             |                       '\s+') AS tk
             |  FROM base),
             |f AS (
             |  SELECT doc_id, lang, t2,
             |    len(tk)::DOUBLE AS n_tok,
             |    CASE WHEN len(tk) > 0
             |      THEN list_sum(list_transform(tk, x -> length(x)))::DOUBLE / len(tk)
             |      ELSE 0.0 END AS mean_len,
             |    CASE WHEN len(tk) > 0 THEN
             |      ((length(t2) - length(replace(t2, '#', ''))) +
             |       len(regexp_extract_all(t2, '\.\.\.')))::DOUBLE / len(tk)
             |      ELSE 0.0 END AS symbol_ratio,
             |    CASE WHEN len(tk) > 0
             |      THEN len(list_filter(tk, x -> regexp_matches(x, '[a-z]')))::DOUBLE / len(tk)
             |      ELSE 0.0 END AS alpha_ratio,
             |    len(list_intersect(tk, ['the','be','to','of','and','that','have','with'])) AS n_stop
             |  FROM tkd),
             |q AS (
             |  SELECT doc_id, lang,
             |    regexp_replace(t2, 'https?://[^\s]+', '<URL>', 'g') AS clean,
             |    regexp_extract(t2, 'https?://([^/\s]+)', 1) AS host
             |  FROM f
             |  WHERE n_tok >= 30 AND n_tok <= 100000
             |    AND mean_len >= 3.0 AND mean_len <= 5.2 AND symbol_ratio <= 0.1
             |    AND alpha_ratio >= 0.8 AND n_stop >= 1),
             |dd AS (
             |  SELECT * FROM (
             |    SELECT *, row_number() OVER (
             |      PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(clean),
             |        '[^a-z0-9]', ' ', 'g'), ' +', ' ', 'g')))
             |      ORDER BY doc_id) AS occ
             |    FROM q) WHERE occ = 1),
             |bg AS (
             |  SELECT DISTINCT unnest(
             |    CASE WHEN len(tk) >= 3
             |         THEN list_distinct(list_transform(range(0, len(tk) - 2),
             |                i -> array_to_string(list_slice(tk, i + 1, i + 3), ' ')))
             |         ELSE [] END) AS gram
             |  FROM (SELECT string_split_regex(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
             |                                  '\s+') AS tk
             |        FROM documents WHERE doc_id % 37 = 0)),
             |hits AS (
             |  SELECT DISTINCT doc_id FROM (
             |    SELECT doc_id, unnest(
             |      CASE WHEN len(tk) >= 3
             |           THEN list_distinct(list_transform(range(0, len(tk) - 2),
             |                  i -> array_to_string(list_slice(tk, i + 1, i + 3), ' ')))
             |           ELSE [] END) AS gram
             |    FROM (SELECT doc_id,
             |            string_split_regex(trim(regexp_replace(lower(trim(clean)), '\s+', ' ', 'g')),
             |                               '\s+') AS tk
             |          FROM dd)) c
             |  JOIN bg USING (gram)),
             |decon AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM hits)),
             |capped AS (
             |  SELECT * FROM (
             |    SELECT *, row_number() OVER (PARTITION BY host
             |      ORDER BY ('0x'||substr(md5(coalesce(clean,'')),1,15))::BIGINT ASC,
             |               doc_id ASC) AS rk
             |    FROM decon) WHERE rk <= 3)
             |SELECT lang, count(*) AS n_docs,
             |  CAST(sum(len(string_split_regex(trim(clean), '\s+'))) AS BIGINT) AS total_tokens
             |FROM capped GROUP BY lang""".stripMargin)),

    // ---- FUZZY contamination (near-dup tier) ---------------------------
    // Corpus docs that are MinHash near-dups of a benchmark doc —
    // catches paraphrased eval items the exact n-gram tier misses.
    // Whole pipeline oracle-adjudicated via the portable-LSH mirror.
    ("q_contamination_fuzzy", ((s, dir) => {
      val d = docs(s, dir)
      graft.curate.Contamination.fuzzyOverlap(
          d.filter(pmod(col("doc_id"), lit(37)) =!= 0),
          d.filter(pmod(col("doc_id"), lit(37)) === 0),
          "doc_id", "text", k = 3, numHashes = 32, bands = 8, threshold = 0.5)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_matches"),
          round(max(col("jaccard")), 4).as("max_jac"))
    }): Q,
      Some(s"""SELECT dup_of AS doc_id, count(*) AS n_matches,
              |  round(max(jaccard), 4) AS max_jac
              |FROM (${incrementalOracleMod(37)}) t
              |GROUP BY 1""".stripMargin)),

    // ---- token-entropy curation signal ---------------------------------
    // Unigram Shannon entropy per doc: low = degenerate/repeated, high
    // = noise. Two map-side-combinable aggs, no window, no O(n²) HOF.
    ("q_entropy", ((s, dir) =>
      TextFunctions.tokenEntropy(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("entropy"), 4).as("entropy"))): Q,
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(string_split_regex(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
             |                              '\s+')) AS tk
             |  FROM documents),
             |c AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |  round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy
             |FROM c GROUP BY 1""".stripMargin)),

    // ---- vocabulary stats: top-k tokens per language -------------------
    // Tokenizer-prep shape: map-side explode → partial-agg'd (lang,
    // token) counts → one per-lang top-k window. Deterministic tiebreak
    // on the token itself.
    ("q_vocab_topk", ((s, dir) => {
      val toks = docs(s, dir).select(col("lang"),
        explode(TextFunctions.wsTokens(TextFunctions.normalize(col("text")))).as("token"))
      val counts = toks.groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("n").desc, col("token").asc)
      counts.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
    }): Q,
      Some("""WITH tok AS (SELECT lang,
             |    unnest(string_split_regex(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
             |                              '\s+')) AS token
             |  FROM documents),
             |c AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2)
             |SELECT lang, token, n, rk FROM (
             |  SELECT lang, token, n,
             |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS rk
             |  FROM c)
             |WHERE rk <= 5""".stripMargin)),

    // ---- count-min-sketch heavy hitters --------------------------------
    // One-pass mergeable frequency sketch (d×w counters, cardinality-
    // independent) bracket-checked against the exact top-20: CMS can
    // only OVERestimate, and by at most eps·N with the configured
    // confidence — the q_uniqueN_approx adjudication pattern. Seeded,
    // so the booleans are deterministic.
    ("q_cms_tokens", ((s, dir) => {
      val toks = docs(s, dir).select(
        explode(TextFunctions.wsTokens(TextFunctions.normalize(col("text"))))
          .as("token"))
      val cms = graft.functions.Sketches.cmsFit(toks, col("token"),
        eps = 0.001, confidence = 0.99, seed = 42)
      val slack = math.ceil(cms.totalCount * 0.001).toLong
      // 20 driver-side probes of the collected sketch — the query-set
      // side of a sketch is tiny by definition
      val est = udf((t: String) => cms.estimateCount(t))
      docs(s, dir).select(
          explode(TextFunctions.wsTokens(TextFunctions.normalize(col("text"))))
            .as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("token").asc).limit(20)
        .withColumn("_est", est(col("token")))
        .withColumn("ok", col("_est") >= col("n_exact") &&
          col("_est") <= col("n_exact") + lit(slack))
        .select(col("token"), col("n_exact"), col("ok"))
    }): Q,
      Some("""WITH tok AS (SELECT
             |    unnest(string_split_regex(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
             |                              '\s+')) AS token
             |  FROM documents),
             |c AS (SELECT token, count(*) AS n_exact FROM tok GROUP BY 1)
             |SELECT token, n_exact, true AS ok
             |FROM c ORDER BY n_exact DESC, token ASC LIMIT 20""".stripMargin)),

    // ---- deterministic train/valid/test split --------------------------
    // Content-hash ranges: a doc's split never changes across runs,
    // partitionings, or corpus growth (eval-set stability).
    ("q_split", ((s, dir) =>
      graft.curate.Sampling.assignSplit(docs(s, dir), col("text"),
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"), col("lang")).agg(count(lit(1)).as("n"))): Q,
      Some("""SELECT CASE WHEN h < 8000 THEN 'train'
             |            WHEN h < 9000 THEN 'valid' ELSE 'test' END AS split,
             |  lang, count(*) AS n
             |FROM (SELECT lang,
             |        ('0x'||substr(md5(coalesce(text,'')),1,15))::BIGINT % 10000 AS h
             |      FROM documents)
             |GROUP BY 1, 2""".stripMargin)),

    // ---- deterministic shuffle-and-shard export ------------------------
    // Training-data "shuffle the corpus, write N shards": shard and
    // in-shard position are pure functions of (seed, doc_id) — the
    // identical permutation at any partitioning or scale.
    ("q_shard", ((s, dir) =>
      graft.curate.Sampling.shuffleShard(
          docs(s, dir).select(col("doc_id")), col("doc_id"),
          numShards = 8, seed = 42L)
        .select(col("doc_id"), col("shard"), col("pos"))): Q,
      Some("""WITH h AS (SELECT doc_id,
             |    ('0x'||substr(md5('42|'||doc_id::VARCHAR),1,15))::BIGINT AS hh
             |  FROM documents)
             |SELECT doc_id, CAST(hh % 8 AS INT) AS shard,
             |  row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) AS pos
             |FROM h""".stripMargin)),

    // ---- flagship: training-data EXPORT pipeline -----------------------
    // The output half of the curation story: quality gate → stable
    // train split → deterministic global shuffle into shards →
    // fixed-token-budget sequence packing per shard. Every stage is a
    // pure content-hash function, so the END-TO-END shard/pack layout
    // is reproducible at any partitioning and adjudicated exactly.
    ("q_export_pipeline", ((s, dir) => {
      import graft.curate.{Packing, Sampling}
      val nTok = TextFunctions.tokenCount(col("text"))
      val quality = docs(s, dir).filter(nTok >= 10)
      val train = Sampling.assignSplit(quality, col("text"),
          Seq("train" -> 0.9, "valid" -> 0.1))
        .filter(col("split") === "train")
      val sharded = Sampling.shuffleShard(
        train.select(col("doc_id"), col("text")), col("doc_id"),
        numShards = 4, seed = 7L)
      val packed = Packing.packByBudget(
        sharded.withColumn("_n", TextFunctions.tokenCount(col("text"))),
        col("_n"), budget = 4000L,
        shard = Seq("shard"), order = Seq(col("pos")))
      packed.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          (max(col("seq_id")) + 1).as("n_seqs"),
          sum(col("_n").cast("long")).as("total_tokens"))
    }): Q,
      Some("""WITH q AS (
             |  SELECT doc_id, text,
             |    len(string_split_regex(trim(text), '\s+'))::BIGINT AS nt,
             |    ('0x'||substr(md5(coalesce(text,'')),1,15))::BIGINT % 10000 AS hs
             |  FROM documents
             |  WHERE len(string_split_regex(trim(text), '\s+')) >= 10),
             |tr AS (
             |  SELECT doc_id, nt,
             |    ('0x'||substr(md5('7|'||doc_id::VARCHAR),1,15))::BIGINT AS hh
             |  FROM q WHERE hs < 9000),
             |sh AS (
             |  SELECT doc_id, nt, CAST(hh % 4 AS INT) AS shard,
             |    row_number() OVER (PARTITION BY hh % 4 ORDER BY hh, doc_id) AS pos
             |  FROM tr),
             |pk AS (
             |  SELECT shard, nt,
             |    CAST(floor(coalesce(sum(nt) OVER (PARTITION BY shard ORDER BY pos
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 4000.0)
             |      AS BIGINT) AS seq_id
             |  FROM sh)
             |SELECT shard, count(*) AS n_docs, max(seq_id) + 1 AS n_seqs,
             |  sum(nt)::BIGINT AS total_tokens
             |FROM pk GROUP BY shard""".stripMargin)),

    // ---- token-budget corpus mixing ------------------------------------
    // Target token shares per source + a budget → deterministic
    // per-source sampling rates; under-resourced sources cap at 1.
    ("q_mix", ((s, dir) =>
      graft.curate.Sampling.mixToTokenTargets(docs(s, dir), col("text"),
          "source", TextFunctions.tokenCount(col("text")),
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2),
          budgetTokens = 2000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long")).as("kept_tokens"))): Q,
      Some("""WITH tok AS (SELECT source, text,
             |    len(string_split_regex(trim(text), '\s+'))::BIGINT AS nt,
             |    ('0x'||substr(md5(coalesce(text,'')),1,15))::BIGINT % 10000 AS h
             |  FROM documents),
             |tot AS (SELECT source, sum(nt) AS avail FROM tok GROUP BY 1),
             |thr AS (SELECT t.source,
             |    CAST(round(least(1.0::DOUBLE,
             |      (v.share::DOUBLE * 2000::DOUBLE) / t.avail::DOUBLE) * 10000) AS BIGINT) AS thr
             |  FROM tot t
             |  JOIN (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)) v(source, share)
             |    ON v.source = t.source)
             |SELECT tok.source, count(*) AS n_docs,
             |  sum(tok.nt)::BIGINT AS kept_tokens
             |FROM tok JOIN thr ON thr.source = tok.source
             |WHERE tok.h < thr.thr
             |GROUP BY 1""".stripMargin)),

    // ---- deterministic content-hash sampling (curation) -----------------
    // The keep/drop decision is a pure function of md5(text): stable
    // across runs, partitionings, and corpus growth — and therefore
    // fully oracle-adjudicable, unlike RNG sampling.
    ("q_sample_hash", ((s, dir) =>
      graft.curate.Sampling.hashSample(docs(s, dir), col("text"), rate = 0.3)
        .select(col("doc_id"), col("lang"))): Q,
      Some("""SELECT doc_id, lang FROM documents
             |WHERE ('0x'||substr(md5(coalesce(text,'')),1,15))::BIGINT % 10000 < 3000""".stripMargin)),

    // ---- stratified sampling: downsample the dominant language ---------
    ("q_sample_stratified", ((s, dir) =>
      graft.curate.Sampling.stratifiedHashSample(docs(s, dir), col("text"),
        "lang", rates = Map("en" -> 0.1, "zh" -> 0.5), default = 0.8)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))): Q,
      Some("""SELECT lang, count(*) AS n FROM documents
             |WHERE ('0x'||substr(md5(coalesce(text,'')),1,15))::BIGINT % 10000 <
             |  CASE lang WHEN 'en' THEN 1000 WHEN 'zh' THEN 5000 ELSE 8000 END
             |GROUP BY lang""".stripMargin)),

    // ---- MinHash LSH near-dup pairs -------------------------------------
    // Portable md5-derived hash family end-to-end, so the oracle mirrors
    // the ENTIRE LSH pipeline (shingle→sig→band→capped bucket→exact
    // jaccard) in SQL — exact equality, no recall gap to paper over.
    // (Dedup.minhashPairs keeps the faster xxhash64 kernels; spec-tested.)
    ("q_dedup_minhash", ((s, dir) =>
      Dedup.minhashPairsPortable(docs(s, dir), "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, threshold = 0.5)): Q,
      Some(minhashOracle)),

    // ---- Unicode NFC canonicalization (dedup pre-pass) -----------------
    // Decomposed combining marks are injected deterministically (e +
    // U+0301 after every 'x') so the normalizer has real work on BOTH
    // engines; the oracle's nfc_normalize must compose them identically.
    ("q_unicode_nfc", ((s, dir) => {
      val decomposed = regexp_replace(col("text"), "x", "e\u0301")
      docs(s, dir).select(col("doc_id"),
        graft.plans.UnicodeNormalize.nfc(decomposed).as("norm"),
        length(graft.plans.UnicodeNormalize.nfc(decomposed)).as("n_chars"))
    }): Q,
      Some("""SELECT doc_id,
             |  nfc_normalize(regexp_replace(text, 'x', 'e' || chr(769), 'g')) AS norm,
             |  length(nfc_normalize(regexp_replace(text, 'x', 'e' || chr(769), 'g'))) AS n_chars
             |FROM documents""".stripMargin)),

    // ---- incremental dedup: ingest batch vs existing corpus ------------
    // Daily-ingest LSH shape: docs with doc_id % 7 == 0 arrive as the new
    // batch, the rest are the standing corpus; a batch doc is reported
    // with every base near-dup it collides with. The oracle reuses the
    // full-corpus banding CTEs and splits sides by the same predicate —
    // banding is per-doc, so union-then-split ≡ band-each-side.
    ("q_dedup_incremental", ((s, dir) => {
      val d = docs(s, dir)
      Dedup.minhashIncrementalPortable(
        d.filter(pmod(col("doc_id"), lit(7)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(7)) === 0),
        "doc_id", "text", k = 3, numHashes = 32, bands = 8, threshold = 0.5)
    }): Q,
      Some(incrementalOracle)),

    // ---- incremental dedup through the BUCKETED catalog index ----------
    // Same contract as q_dedup_incremental (one oracle adjudicates both)
    // but the corpus side scans a (band, bh)-bucketed catalog table —
    // the zero-corpus-shuffle tier. The index is built once per
    // (session, sf dir) like a production nightly fit; the timed part is
    // the per-batch search.
    ("q_dedup_incr_bucketed", ((s, dir) => {
      val d = docs(s, dir)
      val tbl = "graft_incr_idx_" + math.abs(dir.hashCode).toString
      bucketedIdxBuilt.getOrElsePut(s"${System.identityHashCode(s)}:$dir") {
        Dedup.saveBandIndexBucketed(
          d.filter(pmod(col("doc_id"), lit(7)) =!= 0), "doc_id", "text", tbl)
        true
      }
      Dedup.minhashIncrementalBucketed(s, tbl,
        d.filter(pmod(col("doc_id"), lit(7)) === 0), "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, threshold = 0.5)
    }): Q,
      Some(incrementalOracle)),

    // ---- LSH bucket-cap audit ------------------------------------------
    // The buckets a maxBucket cap would DROP (band, bh, n_ids) — the
    // "no silent caps" contract: a pipeline runs this alongside
    // minhashPairsPortable to see which boilerplate clusters the cap
    // silenced. maxBucket=1 here so the oracle adjudicates non-trivial
    // output on the synthetic corpus (production uses the default 1000).
    ("q_dedup_oversized", ((s, dir) =>
      Dedup.minhashOversizedPortable(docs(s, dir), "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, maxBucket = 1)): Q,
      Some(oversizedOracle(1))),

    // ---- SimHash signatures (portable md5 token hashes) ----------------
    ("q_simhash", ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        graft.plans.PortableSimHash(TextFunctions.wsTokens(
          TextFunctions.normalize(col("text")))).as("sig"))): Q,
      Some(simhashOracle)),

    // ---- n-gram Jaccard on adjacent doc pairs (deterministic pairing) --
    ("q_ngram_jaccard", ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val a = d.withColumnRenamed("doc_id", "idA").withColumnRenamed("text", "tA")
      val b = d.withColumnRenamed("doc_id", "idB").withColumnRenamed("text", "tB")
      a.join(b, col("idB") === col("idA") + 1)
        .select(col("idA"), col("idB"),
          round(Dedup.ngramJaccard(col("tA"), col("tB"), 3), 4).as("jac"))
    }): Q,
      Some("""WITH g AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(0, greatest(length(n3) - 3, 0) + 1),
             |    i -> substr(n3, i + 1, 3))) AS grams
             |  FROM (SELECT doc_id,
             |          regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS n3
             |        FROM documents))
             |SELECT a.doc_id AS idA, b.doc_id AS idB,
             |  round(CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0
             |        THEN len(list_intersect(a.grams, b.grams))::DOUBLE
             |             / len(list_distinct(list_concat(a.grams, b.grams)))
             |        ELSE 1.0 END, 4) AS jac
             |FROM g a JOIN g b ON b.doc_id = a.doc_id + 1""".stripMargin)),

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

    // ---- int8 scalar quantization of embeddings ------------------------
    // Per-vector scale + relative L2 reconstruction error. floor(x+0.5)
    // ties + sequential folds make the formula engine-portable
    // term-by-term.
    ("q_embed_quant", ((s, dir) => {
      val e = Similarity.withQuantizedInt8(
        emb(s, dir).withColumn("v", transform(col("embedding"), _.cast("double"))),
        "v")
      e.select(col("vec_id"),
        round(col("q.scale"), 6).as("scale"),
        round(Similarity.quantError(col("v"), col("q")), 5).as("rel_err"))
    }): Q,
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |s AS (SELECT vec_id, v,
             |        list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
             |qz AS (SELECT vec_id, v, scale,
             |        CASE WHEN scale > 0
             |             THEN list_transform(v, x -> greatest(least(floor(x / scale + 0.5), 127.0), -127.0))
             |             ELSE list_transform(v, x -> 0.0) END AS code
             |       FROM s)
             |SELECT vec_id, round(scale, 6) AS scale,
             |  round(CASE WHEN list_sum(list_transform(v, x -> x * x)) > 0
             |    THEN sqrt(list_sum(list_transform(range(1, len(v) + 1),
             |           i -> (v[i] - code[i] * scale) * (v[i] - code[i] * scale)))
             |         / list_sum(list_transform(v, x -> x * x)))
             |    ELSE 0.0 END, 5) AS rel_err
             |FROM qz""".stripMargin)),

    // ---- top-k search over the QUANTIZED tier --------------------------
    // Same shape as q_embed_topk but both sides reconstructed from int8
    // codes — proves search quality survives the compression the 100 TB
    // store would actually serve from.
    ("q_ann_quant_topk", ((s, dir) => {
      val e = Similarity.withQuantizedInt8(
          emb(s, dir).withColumn("v", transform(col("embedding"), _.cast("double"))),
          "v")
        .withColumn("v", Similarity.dequantizeInt8(col("q"))).drop("q")
      val queries = e.filter(col("vec_id").isin(0L, 1L, 2L))
      Similarity.bruteForceTopK(e, queries, "vec_id", "v", k = 5)
        .select(col("query_id"), col("neighbor_id"), round(col("sim"), 3).as("sim"),
          col("rk"))
    }): Q,
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |s AS (SELECT vec_id, v,
             |        list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
             |dq AS (SELECT vec_id,
             |        CASE WHEN scale > 0
             |             THEN list_transform(v, x -> greatest(least(floor(x / scale + 0.5), 127.0), -127.0) * scale)
             |             ELSE list_transform(v, x -> 0.0) END AS v
             |       FROM s)
             |SELECT query_id, neighbor_id, round(sim, 3) AS sim, rk FROM (
             |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |    list_cosine_similarity(c.v, q.v) AS sim,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id ASC) AS rk
             |  FROM dq c, dq q
             |  WHERE q.vec_id IN (0, 1, 2) AND c.vec_id <> q.vec_id)
             |WHERE rk <= 5""".stripMargin)),

    // ---- LSH-bucketed ANN (scale path) ----------------------------------
    // The hyperplanes are deterministic literals, so the oracle rebuilds
    // the same signatures with list_dot_product and mirrors the bucket
    // join + per-query top-k exactly.
    ("q_ann_lsh", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val queries = e.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L))
      // `+ 0.0` canonicalizes a possible round(-ε,3) = -0.0 (bucketed
      // neighbors can have slightly negative cosine)
      Similarity.lshTopK(e, queries, "vec_id", "embedding",
        dim = 64, nBits = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          (round(col("sim"), 3) + lit(0.0)).as("sim"), col("rk"))
    }): Q,
      Some(annLshOracle)),

    // ---- LSH ANN with exact fallback for capped buckets ----------------
    // maxBucket=50 is small enough that real buckets exceed it at every
    // test SF: those queries brute-force the corpus, the rest keep the
    // bucket join — full recall either way, and the oracle mirrors the
    // cap split exactly.
    ("q_ann_lsh_fallback", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val queries = e.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L))
      Similarity.lshTopKWithFallback(e, queries, "vec_id", "embedding",
        dim = 64, nBits = 4, k = 5, maxBucket = 50)
        .select(col("query_id"), col("neighbor_id"),
          (round(col("sim"), 3) + lit(0.0)).as("sim"), col("rk"))
    }): Q,
      Some(annLshFallbackOracle)),

    // ---- LSH search through a PERSISTED index (round 18) ---------------
    // Same search as q_ann_lsh, but the signed corpus + bucket counts
    // make a parquet round-trip (saveLshIndex → lshTopKIndexed) first —
    // the sign-once / serve-many contract that makes LSH search's
    // per-search shuffle strictly corpus-size-independent (the no-index
    // tier pays a bucket-count aggregation per search). Identical oracle:
    // signatures are deterministic literals and doubles round-trip
    // parquet bit-exactly.
    ("q_ann_lsh_persisted", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      // per-pid via RuntimeTmp (ADVICE r18): a second JVM benching the
      // same sf dir must not re-run saveLshIndex over an index another
      // live JVM is mid-scan (SaveMode.Overwrite deletes lsh/sigs under
      // the reader). toHexString also sidesteps math.abs(Int.MinValue).
      val idx = RuntimeTmp.perPid(
        "graft_lsh_idx_" + Integer.toHexString(dir.hashCode))
      // fit-once contract: the save is the nightly index build, the
      // timed part is the search through the LOADED index
      bucketedIdxBuilt.getOrElsePut(s"${System.identityHashCode(s)}:$idx") {
        Similarity.saveLshIndex(e, "vec_id", "embedding", idx,
          dim = 64, nBits = 4); true
      }
      val queries = e.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L))
      Similarity.lshTopKIndexed(s, idx, queries, "vec_id", "embedding",
        dim = 64, nBits = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          (round(col("sim"), 3) + lit(0.0)).as("sim"), col("rk"))
    }): Q,
      Some(annLshOracle)),

    // ---- LSH index APPEND path (round 18) ------------------------------
    // The incremental-ingest lifecycle: saveLshIndex over HALF the
    // corpus (even vec_ids), appendToLshIndex folds in the other half
    // (batch-signed, counts merged incrementally — the corpus sigs are
    // never re-scanned), and the search over the stitched index must
    // equal lshTopK over the full corpus — same oracle as q_ann_lsh.
    ("q_ann_lsh_incr", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      // per-pid for the same concurrent-clobber reason as
      // q_ann_lsh_persisted above; doubly so here — a half-stitched
      // index (post-save, mid-append) returns silently wrong top-k.
      val idx = RuntimeTmp.perPid(
        "graft_lsh_incr_idx_" + Integer.toHexString(dir.hashCode))
      bucketedIdxBuilt.getOrElsePut(s"${System.identityHashCode(s)}:$idx") {
        Similarity.saveLshIndex(e.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", idx, dim = 64, nBits = 4)
        Similarity.appendToLshIndex(s, idx, e.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", dim = 64, nBits = 4)
        true
      }
      val queries = e.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L))
      Similarity.lshTopKIndexed(s, idx, queries, "vec_id", "embedding",
        dim = 64, nBits = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          (round(col("sim"), 3) + lit(0.0)).as("sim"), col("rk"))
    }): Q,
      Some(annLshOracle)),

    // ---- LSH index COMPACTION path (round 20) ---------------------------
    // The long-lived nightly-append lifecycle's maintenance step: save
    // over half the corpus, append the other half, then compactLshIndex
    // folds the batch dirs into one base_v dir (manifest base= redirect,
    // IndexCommit.compact) — the search through the COMPACTED index must
    // still equal lshTopK over the full corpus. Same oracle as q_ann_lsh;
    // this drives the compaction protocol through the driver's gate.
    ("q_ann_lsh_compacted", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val idx = RuntimeTmp.perPid(
        "graft_lsh_cpct_idx_" + Integer.toHexString(dir.hashCode))
      bucketedIdxBuilt.getOrElsePut(s"${System.identityHashCode(s)}:$idx") {
        Similarity.saveLshIndex(e.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", idx, dim = 64, nBits = 4)
        Similarity.appendToLshIndex(s, idx, e.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", dim = 64, nBits = 4)
        require(Similarity.compactLshIndex(s, idx) == 1,
          s"compactLshIndex folded an unexpected batch count at $idx")
        true
      }
      val queries = e.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L))
      Similarity.lshTopKIndexed(s, idx, queries, "vec_id", "embedding",
        dim = 64, nBits = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          (round(col("sim"), 3) + lit(0.0)).as("sim"), col("rk"))
    }): Q,
      Some(annLshOracle)),

    // ---- IVF coarse quantization (ANN scale path #2) -------------------
    // Deterministic seed centroids (4 lowest vec_ids) ⇒ the assignment
    // argmax is SQL-expressible; the kmeans-fitted variant below
    // exercises the real quantizer.
    ("q_ann_ivf", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val centroids = seedCentroids(s, dir, e)
      Similarity.ivfAssign(e, "embedding", centroids)
        .groupBy(col("ivf_cell")).agg(count(lit(1)).as("n"))
    }): Q,
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
             |sc AS (SELECT e.vec_id, c.cid,
             |         list_cosine_similarity(e.v, c.cv) AS sim
             |       FROM e CROSS JOIN c),
             |a AS (SELECT vec_id, cid, row_number() OVER
             |        (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
             |      FROM sc)
             |SELECT cid::INT AS ivf_cell, count(*) AS n
             |FROM a WHERE rn = 1 GROUP BY 1""".stripMargin)),

    // ---- IVF top-k SEARCH (nprobe=1 within the probe's cell) -----------
    ("q_ann_ivf_search", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val centroids = seedCentroids(s, dir, e)
      val queries = e.filter(col("vec_id").isin(0L, 1L, 2L))
      Similarity.ivfTopK(e, queries, "vec_id", "embedding", centroids, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          (round(col("sim"), 3) + lit(0.0)).as("sim"), col("rk"))
    }): Q,
      Some(ivfSearchOracle)),

    // ---- IVF search through a PERSISTED index --------------------------
    // Same search as q_ann_ivf_search, but the centroids make a parquet
    // round-trip (saveIvfIndex → loadIvfIndex) first — the fit-once /
    // serve-many contract a 100 TB store runs on, adjudicated by the
    // identical oracle (doubles pass through parquet bit-exactly).
    ("q_ann_ivf_persisted", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val centroids = seedCentroids(s, dir, e)
      // dir-hashed path: a second sf dir in ONE session must get its
      // own save + centroid memo, not the first dir's (the file's
      // per-(session, sf dir) memo contract)
      val idx = "/tmp/graft_ivf_idx_" + math.abs(dir.hashCode).toString
      // fit-once contract: the save is the nightly index build, the
      // timed part is the search through the LOADED index
      bucketedIdxBuilt.getOrElsePut(s"${System.identityHashCode(s)}:$idx") {
        Similarity.saveIvfIndex(s, idx, centroids); true
      }
      val loaded = Similarity.loadIvfIndex(s, idx)
      val queries = e.filter(col("vec_id").isin(0L, 1L, 2L))
      Similarity.ivfTopK(e, queries, "vec_id", "embedding", loaded, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          (round(col("sim"), 3) + lit(0.0)).as("sim"), col("rk"))
    }): Q,
      Some(ivfSearchOracle)),

    // ---- IVF multi-probe search (nprobe=2: recall recovers near cell
    // boundaries at ~2× the candidate cost) ------------------------------
    ("q_ann_ivf_probe2", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val centroids = seedCentroids(s, dir, e)
      val queries = e.filter(col("vec_id").isin(0L, 1L, 2L))
      Similarity.ivfTopK(e, queries, "vec_id", "embedding", centroids,
        k = 5, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          (round(col("sim"), 3) + lit(0.0)).as("sim"), col("rk"))
    }): Q,
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
             |sc AS (SELECT e.vec_id, c.cid,
             |         list_cosine_similarity(e.v, c.cv) AS csim
             |       FROM e CROSS JOIN c),
             |a AS (SELECT vec_id, cid FROM (
             |        SELECT vec_id, cid, row_number() OVER
             |          (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
             |        FROM sc) WHERE rn = 1),
             |qc AS (SELECT vec_id AS query_id, cid FROM (
             |        SELECT vec_id, cid, row_number() OVER
             |          (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
             |        FROM sc) WHERE rn <= 2 AND vec_id IN (0, 1, 2)),
             |s2 AS (SELECT qc.query_id, a.vec_id AS neighbor_id,
             |         list_cosine_similarity(x.v, y.v) AS sim
             |       FROM a JOIN qc ON a.cid = qc.cid AND a.vec_id <> qc.query_id
             |       JOIN e x ON x.vec_id = a.vec_id
             |       JOIN e y ON y.vec_id = qc.query_id),
             |r AS (SELECT query_id, neighbor_id, sim, row_number() OVER
             |        (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
             |      FROM s2)
             |SELECT query_id, neighbor_id, round(sim, 3) + 0.0 AS sim, rk
             |FROM r WHERE rk <= 5""".stripMargin)),

    // ---- IVF with kmeans-lite fitted centroids -------------------------
    // Oracle mirrors the ENTIRE fit: centroid updates accumulate as
    // scaled integers (exact in both engines, order-independent), so 3
    // unrolled Lloyd iterations in SQL reproduce the centroids
    // bit-for-bit; the fit runs on the full corpus here because a
    // Spark-seeded sample has no DuckDB mirror.
    ("q_ann_ivf_kmeans", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val cents = Similarity.kmeansFit(e, "vec_id", "embedding", k = 4, iters = 3)
      Similarity.ivfAssign(e, "embedding", cents)
        .groupBy(col("ivf_cell")).agg(count(lit(1)).as("n"))
    }): Q,
      Some(kmeansIvfOracle)),

    // ---- IVF with SAMPLED kmeans fit (the 100 TB shape, verified) ------
    // Lloyd rounds run on the deterministic mod-4 sample (25% of the
    // corpus); the full corpus is assigned once at the end. Because the
    // sample is a plain SQL predicate (vec_id % 4 = 0), the oracle
    // mirrors the ENTIRE sampled fit — proving the sampled path, not
    // just the full-corpus fallback.
    ("q_ann_ivf_sampled", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val cents = Similarity.kmeansFitMod(e, "vec_id", "embedding", k = 4,
        m = 4, iters = 3)
      Similarity.ivfAssign(e, "embedding", cents)
        .groupBy(col("ivf_cell")).agg(count(lit(1)).as("n"))
    }): Q,
      Some(kmeansIvfSampledOracle)),

    // ---- product quantization: per-subspace sampled codebooks ----------
    // 2 subspaces × 4 centroids, fit on the mod-4 sample with 2 Lloyd
    // rounds each; every vector gets its (pq_c0, pq_c1) code tuple.
    // The oracle unrolls BOTH subspace fits — the entire PQ training +
    // assignment path is hash-adjudicated.
    ("q_ann_pq", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val cbs = Similarity.pqFitMod(e, "vec_id", "embedding", dim = 64,
        mSub = 2, k = 4, sampleMod = 4, iters = 2)
      Similarity.pqAssign(e, "embedding", cbs, dim = 64)
        .groupBy(col("pq_c0"), col("pq_c1")).agg(count(lit(1)).as("n"))
    }): Q,
      Some(pqOracle)),

    // ---- residual IVF+PQ (the FAISS IVFPQ index shape) -----------------
    // Coarse quantizer assigns cells; PQ codebooks are fit on the
    // RESIDUALS (v − centroid[cell]) — same PQ budget, far lower
    // reconstruction error. Output = occupancy of (cell, code-tuple).
    ("q_ann_ivfpq", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val coarse = Similarity.kmeansFitMod(e, "vec_id", "embedding", k = 4,
        m = 4, iters = 2)
      val resid = Similarity.residuals(
        Similarity.ivfAssign(e, "embedding", coarse), "embedding", "ivf_cell",
        coarse)
      val cbs = Similarity.pqFitMod(resid, "vec_id", "res", dim = 64,
        mSub = 2, k = 4, sampleMod = 4, iters = 2)
      Similarity.pqAssign(resid, "res", cbs, dim = 64)
        .groupBy(col("ivf_cell"), col("pq_c0"), col("pq_c1"))
        .agg(count(lit(1)).as("n"))
    }): Q,
      Some(ivfPqOracle)),

    // ---- ADC search over the residual IVF+PQ index ---------------------
    // Per-query distance TABLES (coarse centroid + residual codeword
    // folded in), scored by mSub lookups per (row, query) — no
    // per-pair reconstruction or O(dim) cosine (the full IVFPQ lookup).
    ("q_ann_ivfpq_search", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val coarse = Similarity.kmeansFitMod(e, "vec_id", "embedding", k = 4,
        m = 4, iters = 2)
      val resid = Similarity.residuals(
        Similarity.ivfAssign(e, "embedding", coarse), "embedding", "ivf_cell",
        coarse)
      val cbs = Similarity.pqFitMod(resid, "vec_id", "res", dim = 64,
        mSub = 2, k = 4, sampleMod = 4, iters = 2)
      val coded = Similarity.pqAssign(resid, "res", cbs, dim = 64)
        .select(col("vec_id"), col("ivf_cell"), col("pq_c0"), col("pq_c1"))
      val q = e.filter(col("vec_id").isin(0L, 1L, 2L))
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Similarity.pqAdcTopK(coded, "vec_id", cbs, q, k = 5,
          coarse = Some(("ivf_cell", coarse)))
        .select(col("query_id"), col("neighbor_id"),
          round(col("sim"), 3).as("sim"), col("rk"))
    }): Q,
      Some(ivfPqSearchOracle)),

    // ---- ADC search over the PQ tier -----------------------------------
    // Asymmetric distance: RAW queries vs PQ codes via per-query lookup
    // tables (the lookup a PQ index actually serves). Tables are
    // broadcast literals; scoring is mSub element_at calls per pair.
    ("q_ann_pq_search", ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      val cbs = Similarity.pqFitMod(e, "vec_id", "embedding", dim = 64,
        mSub = 2, k = 4, sampleMod = 4, iters = 2)
      val coded = Similarity.pqAssign(e, "embedding", cbs, dim = 64)
        .select(col("vec_id"), col("pq_c0"), col("pq_c1"))
      val q = e.filter(col("vec_id").isin(0L, 1L, 2L))
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Similarity.pqAdcTopK(coded, "vec_id", cbs, q, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("sim"), 3).as("sim"), col("rk"))
    }): Q,
      Some(pqSearchOracle)),

    // ---- embedding near-dup pairs (LSH buckets + exact cosine) ---------
    ("q_cosine_pairs", ((s, dir) => {
      // The raw table has no pair above cosine 0.6, so the old form
      // hash-matched vacuously on zero rows (round-10 verdict). Every
      // 10th embedding gets a PLANTED near-duplicate twin (first
      // coordinate +0.01, id +1e6 — the q_semdedup planting, mirrored
      // in the oracle), so the LSH banding has a real positive
      // population to find at every SF.
      val e0 = emb(s, dir)
        .withColumn("embedding", transform(col("embedding"), _.cast("double")))
        .select(col("vec_id"), col("embedding"))
      val planted = e0.filter(pmod(col("vec_id"), lit(10)) === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          concat(array(element_at(col("embedding"), 1) + lit(0.01)),
            slice(col("embedding"), 2, 63)).as("embedding"))
      val e = e0.unionByName(planted)
      // nBits sizes the bucket count (2^nBits per table): 12 bits keeps
      // per-bucket occupancy ~corpus/4096, so bucket-local pair
      // generation stays near-linear at sf0.1 and beyond (4 bits = 16
      // buckets was a quadratic blowup)
      Similarity.cosinePairs(e, "vec_id", "embedding", dim = 64, nBits = 12,
        threshold = 0.8, tables = 2)
        .select(col("idA"), col("idB"), round(col("sim"), 3).as("sim"))
    }): Q,
      Some(cosinePairsOracle)),

    // ---- SemDeDup pairs: kmeans-cell semantic near-dups ----------------
    // (Abbas et al. 2023, arXiv:2303.09540) Cells are the candidate
    // buckets — disjoint by construction, assignment argmax-mirrored in
    // SQL like q_ann_ivf; the [2, maxCell] cell cap is mirrored too so
    // both engines drop the same degenerate cells at any SF. The raw
    // table has no pair above cosine 0.6, so every 10th embedding gets
    // a PLANTED near-duplicate twin (first coordinate +0.01, id +1e6,
    // mirrored in SQL) — giving the dedup a real duplicate population
    // at every SF instead of a vacuously-empty result.
    ("q_semdedup_pairs", ((s, dir) => {
      val (corpus, centroids) = semdedupCorpus(s, dir)
      Similarity.semanticPairs(corpus, "vec_id", "embedding", centroids,
        threshold = 0.8)
        .select(col("idA"), col("idB"),
          (round(col("sim"), 3) + lit(0.0)).as("sim"))
    }): Q,
      Some(s"""$semanticCellsSql,
              |p AS (SELECT x.vec_id AS idA, y.vec_id AS idB,
              |        list_cosine_similarity(ex.v, ey.v) AS sim
              |      FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
              |      JOIN el ON el.cid = x.cid
              |      JOIN e ex ON ex.vec_id = x.vec_id
              |      JOIN e ey ON ey.vec_id = y.vec_id)
              |SELECT idA, idB, round(sim, 3) + 0.0 AS sim
              |FROM p WHERE sim >= 0.8""".stripMargin)),

    // ---- incremental SemDeDup: embedding batch vs persisted cell index -
    // The planted twins arrive as the "new batch"; the originals are the
    // persisted corpus (saveCellIndex: centroids + assigned (id, cell,
    // vec) parquet). Each twin must surface against its original via the
    // SAVED state only — the embedding half of the daily ingest loop.
    ("q_semdedup_incr", ((s, dir) => {
      val (all, centroids) = semdedupCorpus(s, dir)
      val corpus = all.filter(col("vec_id") < 1000000L)
      val batch = all.filter(col("vec_id") >= 1000000L)
      val idx = s"/tmp/graft_cell_idx_${math.abs(dir.hashCode)}"
      // fit-once contract (the bucketed-index pattern above): build the
      // persisted cell index once per (session, corpus); time the search
      bucketedIdxBuilt.getOrElsePut(s"${System.identityHashCode(s)}:$idx") {
        Similarity.saveCellIndex(corpus, "vec_id", "embedding", centroids, idx)
        true
      }
      Similarity.semIncremental(s, idx, batch, "vec_id", "embedding",
        threshold = 0.8)
        .select(col("new_id"), col("dup_of"),
          (round(col("sim"), 3) + lit(0.0)).as("sim"))
    }): Q,
      Some(s"""$semanticCellsSql,
              |corp AS (SELECT vec_id, cid FROM a WHERE vec_id < 1000000),
              |newb AS (SELECT vec_id, cid FROM a WHERE vec_id >= 1000000),
              |ok AS (SELECT cid FROM (SELECT cid, count(*) AS n FROM corp
              |       GROUP BY 1) WHERE n <= 1000),
              |p AS (SELECT n.vec_id AS new_id, x.vec_id AS dup_of,
              |        list_cosine_similarity(en.v, ex.v) AS sim
              |      FROM newb n JOIN corp x ON n.cid = x.cid
              |      JOIN ok ON ok.cid = n.cid
              |      JOIN e en ON en.vec_id = n.vec_id
              |      JOIN e ex ON ex.vec_id = x.vec_id)
              |SELECT new_id, dup_of, round(sim, 3) + 0.0 AS sim
              |FROM p WHERE sim >= 0.8""".stripMargin)),

    // ---- SemDeDup keep-one: components over semantic pairs -------------
    // Pairwise pruning is not transitive (chain A≈B≈C would drop B AND
    // C); the oracle walks the same pair list with the recursive-CTE
    // component mirror and keeps min(component) per group — every
    // planted twin's component collapses to its original.
    ("q_semdedup_reps", ((s, dir) => {
      val (corpus, centroids) = semdedupCorpus(s, dir)
      Similarity.semanticDedup(corpus, "vec_id", "embedding", centroids,
        threshold = 0.8)
        .select(col("vec_id"))
    }): Q,
      Some(s"""${semanticCellsSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
              |p AS (SELECT x.vec_id AS idA, y.vec_id AS idB
              |      FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
              |      JOIN el ON el.cid = x.cid
              |      JOIN e ex ON ex.vec_id = x.vec_id
              |      JOIN e ey ON ey.vec_id = y.vec_id
              |      WHERE list_cosine_similarity(ex.v, ey.v) >= 0.8),
              |edges AS (SELECT idA AS s, idB AS d FROM p
              |          UNION SELECT idB AS s, idA AS d FROM p),
              |r(id, reach) AS (
              |  SELECT s, s FROM edges
              |  UNION
              |  SELECT r.id, g.d FROM r JOIN edges g ON g.s = r.reach)
              |SELECT vec_id FROM e
              |WHERE vec_id NOT IN (
              |  SELECT id FROM (SELECT id, min(reach) AS component
              |                  FROM r GROUP BY id)
              |  WHERE component <> id)""".stripMargin)),

    // ---- duplicate spans: winnowed substring fingerprints --------------
    // (Schleimer et al. SIGMOD 2003 winnowing; re-expresses the
    // suffix-array substring dedup of arXiv:2107.06499 distributively.)
    // Every 20th document gets a planted twin (id +1e6) whose text is a
    // marker head + the original's first 400 chars — the shared content
    // sits at a DIFFERENT offset in the twin, so only offset-independent
    // fingerprint selection can pair them. Window-min selection, the
    // [k, w] guarantee band, and the planting are all mirrored in SQL.
    ("q_span_dup", ((s, dir) =>
      graft.dedup.Dedup.duplicateSpans(spanCorpus(s, dir), "doc_id", "text",
        k = 20, w = 8)): Q,
      Some(s"""$spanSelectSql
              |SELECT span_fp, count(DISTINCT doc_id) AS n_docs
              |FROM sel GROUP BY span_fp
              |HAVING count(DISTINCT doc_id) >= 2""".stripMargin)),

    ("q_span_docs", ((s, dir) =>
      graft.dedup.Dedup.spanFlaggedDocs(spanCorpus(s, dir), "doc_id", "text",
        k = 20, w = 8)): Q,
      Some(s"""$spanSelectSql
              |SELECT DISTINCT doc_id FROM sel
              |WHERE span_fp IN (
              |  SELECT span_fp FROM sel GROUP BY span_fp
              |  HAVING count(DISTINCT doc_id) >= 2)""".stripMargin)),

    // ---- DSIR importance weighting (arXiv:2302.03169) ------------------
    // Raw distribution = all documents; target = the English subset.
    // Hashed unigram+bigram buckets (portable md5, B=256), add-one
    // smoothing, per-doc log-ratio sum — every stage mirrored in SQL.
    // All three queries run the SUBSET fast path (target = the en
    // slice of the corpus): one combined count fit, log-ratio diffs
    // back as a 256-double literal, scoring as a projection-local
    // array aggregate — no per-doc shuffle. Identical math to the
    // general importanceWeights, so the oracle is unchanged.
    ("q_dsir_weights", ((s, dir) =>
      graft.curate.Dsir.importanceWeightsSubset(docs(s, dir), "doc_id",
        "text", col("lang") === "en", buckets = 256)
        .select(col("doc_id"),
          (round(col("logw"), 3) + lit(0.0)).as("logw"))): Q,
      Some(s"""$dsirWeightsSql
              |SELECT doc_id, round(logw, 3) + 0.0 AS logw FROM w""".stripMargin)),

    // Top-100 selection: ranking on the ROUNDED weight (ties broken by
    // doc_id) so the engines' summation-order ulp differences cannot
    // flip the cut line.
    ("q_dsir_top", ((s, dir) =>
      graft.curate.Dsir.importanceWeightsSubset(docs(s, dir), "doc_id",
        "text", col("lang") === "en", buckets = 256)
        .select(col("doc_id"),
          (round(col("logw"), 3) + lit(0.0)).as("logw"))
        .orderBy(col("logw").desc, col("doc_id")).limit(100)): Q,
      Some(s"""$dsirWeightsSql
              |SELECT doc_id, logw FROM (
              |  SELECT doc_id, round(logw, 3) + 0.0 AS logw FROM w)
              |ORDER BY logw DESC, doc_id LIMIT 100""".stripMargin)),

    // The 100 TB selection tier: at-least-100 docs via the largest
    // rounded-weight threshold keeping >= 100 — a bounded value
    // histogram + running count, no global sort of the corpus. The
    // oracle replays histogram, cumulative count, threshold, and cut.
    ("q_dsir_select", ((s, dir) =>
      graft.curate.Dsir.selectAtLeastW(
        graft.curate.Dsir.importanceWeightsSubset(docs(s, dir), "doc_id",
          "text", col("lang") === "en", buckets = 256), n = 100)): Q,
      Some(s"""$dsirWeightsSql,
              |r AS (SELECT doc_id, round(logw, 3) + 0.0 AS lw FROM w),
              |h AS (SELECT lw, count(*) AS c FROM r GROUP BY 1),
              |cu AS (SELECT lw, sum(c) OVER (ORDER BY lw DESC) AS cum FROM h),
              |t AS (SELECT coalesce(
              |        (SELECT max(lw) FROM cu WHERE cum >= 100),
              |        '-infinity'::DOUBLE) AS thr)
              |SELECT doc_id, lw AS logw FROM r, t WHERE lw >= thr""".stripMargin)),

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
      // per-process suffix: a concurrent JVM benching the same dir must
      // not overwrite the CSV this one is scanning (same hazard as
      // q_fwrite_float_roundtrip's path); RuntimeTmp registers the dir
      // for shutdown-hook deletion + sweeps dead predecessors' leftovers
      val out = RuntimeTmp.perPid("graft_fread_rt")
      graft.sources.Fread.fwrite(Tables.load(s, dir, "nation"), out,
        graft.sources.Fread.FwriteOptions(sep = "\t"))
      graft.sources.Fread.fread(s, out)   // sep auto-sniffed
        .select(col("n_nationkey").cast("int").as("n_nationkey"),
          col("n_name"), col("n_regionkey").cast("int").as("n_regionkey"))
    }): Q,
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation")),

    // ---- fwrite float formatting (src/fwrite.c writeFloat64) -----------
    // The written CSV carries the reference's 15-s.f. width-chosen float
    // text; values at ≤15 s.f. round-trip exactly, so the fread-back
    // adjudicates the whole write→parse cycle against the parquet
    // original. Exotic corners (scipen, 3-digit exponents) are pinned in
    // FwriteFloatSpec — this query proves the format on real data.
    ("q_fwrite_float_roundtrip", ((s, dir) => {
      // per-dir AND per-process output path: the memo is per (session,
      // dir), so two SF dirs in one session must not overwrite each
      // other's CSV — and two concurrent JVMs benching the same dir must
      // not clobber each other mid-scan (one's SaveMode.Overwrite would
      // delete the CSV under the other's fread). toHexString also avoids
      // math.abs(Int.MinValue) staying negative.
      val out = RuntimeTmp.perPid("graft_fwrite_float_rt_" +
        java.lang.Integer.toHexString(dir.hashCode))
      // write ONCE per (session, sf dir) — the builder runs at every
      // bench rep, and re-exporting 600k rows of CSV per rep would
      // dominate the timing (the bucketed-index memo convention; the
      // input parquet is immutable within a run, so the written CSV is
      // too; Fits.clearAll evicts via clearQueryFits)
      bucketedIdxBuilt.getOrElsePut(
        s"fwrite_rt:${System.identityHashCode(s)}:$dir") {
        graft.sources.Fread.fwrite(
          Tables.load(s, dir, "lineitem").select(col("l_orderkey"),
            col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")), out)
        true
      }
      graft.sources.Fread.fread(s, out)
        .select(col("l_orderkey").cast("bigint").as("l_orderkey"),
          col("l_linenumber").cast("bigint").as("l_linenumber"),
          col("l_quantity").cast("double").as("l_quantity"),
          col("l_extendedprice").cast("double").as("l_extendedprice"),
          col("l_discount").cast("double").as("l_discount"),
          col("l_tax").cast("double").as("l_tax"))
    }): Q,
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             |  l_discount, l_tax FROM lineitem""".stripMargin)),

    // ---- float text form itself, adjudicated per value -----------------
    // Both engines correctly round the SAME binary double to 15
    // significant digits, so the digit strings agree by construction;
    // the value ranges here (1..105k, 0..0.1, /32 keeps the exponent
    // small) keep the reference's width rule and fmt's g-rule on the
    // same side of the decimal-vs-scientific choice, making the oracle
    // exact. /32 is an exact binary scale: both engines divide to the
    // identical double, whose 15-s.f. expansion runs the full digit
    // budget.
    ("q_dtoa_format", ((s, dir) =>
      Tables.load(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_linenumber"),
        graft.sources.DtoaExpr(col("l_quantity"), 0).as("qty_s"),
        graft.sources.DtoaExpr(col("l_extendedprice"), 0).as("price_s"),
        graft.sources.DtoaExpr(col("l_discount"), 0).as("disc_s"),
        graft.sources.DtoaExpr(col("l_tax"), 0).as("tax_s"),
        graft.sources.DtoaExpr(col("l_extendedprice") / lit(32.0), 0)
          .as("p32_s"))): Q,
      Some("""SELECT l_orderkey, l_linenumber,
             |  format('{:.15g}', l_quantity) AS qty_s,
             |  format('{:.15g}', l_extendedprice) AS price_s,
             |  format('{:.15g}', l_discount) AS disc_s,
             |  format('{:.15g}', l_tax) AS tax_s,
             |  format('{:.15g}', l_extendedprice / 32) AS p32_s
             |FROM lineitem""".stripMargin)),

    // ---- JSONL roundtrip (training-data interchange format) ------------
    // Write documents as JSON lines, read back under an explicit schema
    // (the 100 TB contract: no inference scan), adjudicate content parity
    // against the parquet original.
    ("q_jsonl_roundtrip", ((s, dir) => {
      import org.apache.spark.sql.types._
      val out = RuntimeTmp.perPid("graft_jsonl_rt")
      graft.sources.Fread.fwriteJsonl(
        docs(s, dir).select(col("doc_id"), col("lang"), col("text")), out)
      graft.sources.Fread.freadJsonl(s, out, schema = Some(StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("text", StringType)))))
    }): Q,
      Some("SELECT doc_id, lang, text FROM documents")),

    // ---- multimodal decode plumbing (portable md5 stub codec) ----------
    // Runs the ARROW batch path under the oracle: payload → md5 → affine
    // feature family (PortableHash constants), mirrored bit-for-bit in
    // DuckDB. Features are k/1000 as float32; ×1000 + round recovers the
    // integer k exactly on both sides, so the hash gate adjudicates the
    // full decode pipeline (marshal → codec → unmarshal), zero recall gap.
    ("q_media_features", ((s, dir) => {
      val blobs = graft.mm.Multimodal.blobsFromDocuments(
        Tables.load(s, dir, "documents"))
      graft.mm.Multimodal.extractFeaturesArrow(blobs, batchSize = 64).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes").cast("bigint").as("n_bytes"),
          round(element_at(col("features"), 1).cast("double") * 1000.0).cast("bigint").as("f0_milli"),
          round(element_at(col("features"), 8).cast("double") * 1000.0).cast("bigint").as("f7_milli"),
          round(element_at(col("features"), 16).cast("double") * 1000.0).cast("bigint").as("f15_milli"))
    }): Q,
      Some(mediaOracle)),

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
             |    CAST(sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
             |  FROM (SELECT user_id, ts, event_id,
             |          epoch_us(ts) - lag(epoch_us(ts))
             |            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
             |        FROM events))
             |GROUP BY user_id""".stripMargin))
  )

  private def sqlStops: String =
    TextFunctions.stopwordsEn.map(s => s"'$s'").mkString("[", ", ", "]")

  // ---- generated oracle SQL (mirrors of the portable-hash pipelines) ---

  /** langIdHeuristic mirror: stopword-ratio per language, argmax with
    * ties going to the first language in TextFunctions.langs order.
    */
  private def langidOracle: String = {
    val scores = TextFunctions.langs.map { case (lang, stops) =>
      val lst = stops.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, w -> list_contains($lst, w)))::DOUBLE" +
        s" / greatest(len(toks), 1) AS s_$lang"
    }.mkString(",\n    ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_transform(string_split_regex(trim(text), '\\s+'), x -> lower(x)) AS toks
       |  FROM documents),
       |s AS (SELECT doc_id,
       |    $scores
       |  FROM t)
       |SELECT CASE
       |    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       |    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       |    WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS lang_pred,
       |  count(*) AS n
       |FROM s GROUP BY 1""".stripMargin
  }

  /** PortableSimHash mirror: 60 generated bit-vote terms over md5 token
    * hashes (see plans/PortableHashExprs.scala for the bit layout).
    */
  private def simhashOracle: String = {
    val terms = (0 until 60).map { b =>
      s"CASE WHEN 2*len(list_filter(h, x -> ((x >> $b) & 1) = 1)) > len(h)" +
        s" THEN ${1L << b} ELSE 0 END"
    }.mkString("(", "\n   + ", ")")
    s"""WITH th AS (
       |  SELECT doc_id, list_transform(
       |    string_split_regex(trim(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), '\\s+'),
       |    t -> ('0x'||substr(md5(t),1,15))::BIGINT) AS h
       |  FROM documents)
       |SELECT doc_id,
       |  $terms::BIGINT AS sig
       |FROM th""".stripMargin
  }

  /** minhashPairsPortable mirror: the full LSH pipeline in SQL —
    * shingle md5 identities → 32-hash affine signature → 8 rotate-xor
    * band hashes → capped buckets → distinct candidate pairs → exact
    * shingle-set jaccard ≥ threshold. Constants match PortableHash.
    */
  /** Shared banding prefix (toks → shingles → signature → banded) of the
    * portable minhash mirror; [[minhashOracle]] and [[oversizedOracle]]
    * both compose it, so a hash-constant fix here fixes both.
    */
  private def minhashBandedCtes: String = {
    val maskA = "288230376151711743"   // 2^58-1
    val mask40 = "1099511627775"       // 2^40-1
    val maskB = "9007199254740991"     // 2^53-1
    val sigTerms = (0 until 32).map { i =>
      s"list_min(list_transform(sh, a -> (a & $maskA)" +
        s" + $i * (xor(a >> 7, (a & $mask40) << 13) & $maskB)))"
    }.mkString("[\n    ", ",\n    ", "]")
    def rot(e: String) = s"((($e & 4503599627370495) << 7) | ($e >> 52))"
    def bh(b: Int): String = {
      var e = s"list_extract(sig, ${b * 4 + 1})"
      for (j <- 2 to 4) e = s"xor(${rot(e)}, list_extract(sig, ${b * 4 + j}))"
      e
    }
    val bandSelects = (0 until 8).map(b =>
      s"SELECT id, $b AS band, ${bh(b)} AS bh FROM sig").mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id AS id,
       |    string_split_regex(trim(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), '\\s+') AS t
       |  FROM documents),
       |shl AS (
       |  SELECT id, list_distinct(list_transform(
       |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |         ELSE list_transform(range(0, len(t)-2),
       |                i -> array_to_string(list_slice(t, i+1, i+3), ' ')) END,
       |    s -> ('0x'||substr(md5(s),1,15))::BIGINT)) AS sh
       |  FROM toks),
       |sig AS (SELECT id, sh, $sigTerms AS sig FROM shl),
       |banded AS (
       |  $bandSelects)""".stripMargin
  }

  private def minhashOracle: String =
    s"""$minhashBandedCtes,
       |sizes AS (SELECT band, bh, count(*) AS n FROM banded GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a.id AS idA, b.id AS idB
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
       |  JOIN sizes s ON s.band = a.band AND s.bh = a.bh
       |  WHERE s.n BETWEEN 2 AND 1000),
       |j AS (
       |  SELECT idA, idB,
       |    len(list_intersect(x.sh, y.sh))::DOUBLE /
       |      len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
       |  FROM cand JOIN shl x ON x.id = cand.idA JOIN shl y ON y.id = cand.idB)
       |SELECT idA, idB, jaccard FROM j WHERE jaccard >= 0.5""".stripMargin

  /** IVF top-k search mirror (centroids = embeddings vec_id < 4, queries
    * = vec_id 0-2, k = 5) — shared by `q_ann_ivf_search` (in-memory fit)
    * and `q_ann_ivf_persisted` (parquet round-tripped fit): persistence
    * is value-exact, so one oracle adjudicates both paths.
    */
  private def ivfSearchOracle: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
      |sc AS (SELECT e.vec_id, c.cid,
      |         list_cosine_similarity(e.v, c.cv) AS csim
      |       FROM e CROSS JOIN c),
      |a AS (SELECT vec_id, cid FROM (
      |        SELECT vec_id, cid, row_number() OVER
      |          (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
      |        FROM sc) WHERE rn = 1),
      |q AS (SELECT vec_id AS query_id, cid FROM a WHERE vec_id IN (0, 1, 2)),
      |s2 AS (SELECT q.query_id, a.vec_id AS neighbor_id,
      |         list_cosine_similarity(x.v, y.v) AS sim
      |       FROM a JOIN q ON a.cid = q.cid AND a.vec_id <> q.query_id
      |       JOIN e x ON x.vec_id = a.vec_id
      |       JOIN e y ON y.vec_id = q.query_id),
      |r AS (SELECT query_id, neighbor_id, sim, row_number() OVER
      |        (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
      |      FROM s2)
      |SELECT query_id, neighbor_id, round(sim, 3) + 0.0 AS sim, rk
      |FROM r WHERE rk <= 5""".stripMargin

  /** Mirror of `Dedup.minhashIncrementalPortable` with base = doc_id % 7
    * <> 0 and batch = doc_id % 7 = 0: band the whole corpus with the
    * shared CTEs, split by side, cap base buckets, verify cross-side
    * candidates with exact Jaccard.
    */
  private def incrementalOracle: String = incrementalOracleMod(7)

  /** Corpus-side-capped incremental LSH mirror, split by `id % mod` —
    * shared by the incremental-dedup oracles (mod=7) and the fuzzy
    * decontamination oracle (mod=37, which wraps it in a per-corpus-doc
    * aggregation).
    */
  private def incrementalOracleMod(mod: Int): String =
    s"""$minhashBandedCtes,
       |baseb AS (SELECT * FROM banded WHERE id % $mod <> 0),
       |newb  AS (SELECT * FROM banded WHERE id % $mod = 0),
       |bucket AS (SELECT band, bh, count(*) AS n FROM baseb
       |           GROUP BY 1, 2 HAVING count(*) <= 1000),
       |cand AS (
       |  SELECT DISTINCT n.id AS new_id, b.id AS dup_of
       |  FROM newb n JOIN baseb b ON n.band = b.band AND n.bh = b.bh
       |  JOIN bucket s ON s.band = n.band AND s.bh = n.bh),
       |j AS (
       |  SELECT new_id, dup_of,
       |    len(list_intersect(x.sh, y.sh))::DOUBLE /
       |      len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
       |  FROM cand JOIN shl x ON x.id = cand.new_id
       |            JOIN shl y ON y.id = cand.dup_of)
       |SELECT new_id, dup_of, jaccard FROM j WHERE jaccard >= 0.5""".stripMargin

  /** Mirror of `Dedup.minhashOversizedPortable`: the LSH buckets a
    * `maxBucket` cap would drop, with their membership counts.
    */
  private def oversizedOracle(maxBucket: Int): String =
    s"""$minhashBandedCtes
       |SELECT band, bh, count(*) AS n_ids FROM banded
       |GROUP BY 1, 2 HAVING count(*) > $maxBucket""".stripMargin

  /** StubCodec mirror: payload = UTF-8 bytes of `text`, so DuckDB's
    * md5(text) hashes the exact bytes the Arrow codec sees; feature i's
    * integer milli-value is ((a & 2^58-1) + i·b(a)) % 1000 with the
    * PortableHash masks — overflow-free on both engines.
    */
  private def mediaOracle: String = {
    val maskA = "288230376151711743"   // 2^58-1
    val mask40 = "1099511627775"       // 2^40-1
    val maskB = "9007199254740991"     // 2^53-1
    def fi(i: Int) =
      s"((a & $maskA) + $i * (xor(a >> 7, (a & $mask40) << 13) & $maskB)) % 1000"
    s"""WITH h AS (
       |  SELECT doc_id AS media_id, 'image' AS kind,
       |    octet_length(encode(text))::BIGINT AS n_bytes,
       |    ('0x'||substr(md5(text),1,15))::BIGINT AS a
       |  FROM documents)
       |SELECT media_id, kind, n_bytes,
       |  ${fi(0)} AS f0_milli,
       |  ${fi(7)} AS f7_milli,
       |  ${fi(15)} AS f15_milli
       |FROM h""".stripMargin
  }

  /** kmeansFit + ivfAssign mirror: 3 unrolled Lloyd iterations. The
    * centroid update sums scaled integers (CAST(round(x·2^20) AS
    * BIGINT)) — exact and order-independent in both engines — and the
    * final doubles come from the same (sum/scale)/n expression shape, so
    * the fitted centroids match Spark's bit-for-bit. Assignment argmax
    * ties break to the lowest cell id (mirroring ivfAssign's strict-
    * greater scan). Empty cells keep the previous centroid (COALESCE).
    */
  // ---- shared Lloyd-iteration SQL (ONE copy; four oracles compose it:
  // full fit, sampled fit, PQ subspace chains, residual IVF+PQ — a
  // tie-break or scaling fix here fixes every mirror at once) ----------
  private val lloydScale = 1L << 20
  private def lloydAssign(a: String, rel: String, c: String): String =
    s"""$a AS (SELECT vec_id, cid FROM (
       |  SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid ASC) AS rn
       |  FROM $rel e CROSS JOIN $c c) WHERE rn = 1)""".stripMargin
  private def lloydUpdate(u: String, a: String, exs: String, cPrev: String,
                          c: String): String =
    s"""$u AS (SELECT $a.cid, ex.d,
       |  (sum(CAST(round(ex.x * $lloydScale) AS BIGINT))::DOUBLE / $lloydScale) / count(*) AS val
       |  FROM $a JOIN $exs ex ON ex.vec_id = $a.vec_id GROUP BY $a.cid, ex.d),
       |$c AS (SELECT $cPrev.cid, COALESCE(n.cv, $cPrev.cv) AS cv FROM $cPrev
       |  LEFT JOIN (SELECT cid, list(val ORDER BY d) AS cv FROM $u GROUP BY cid) n
       |  ON n.cid = $cPrev.cid)""".stripMargin

  private def kmeansIvfOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ex AS (SELECT vec_id, unnest(v) AS x, unnest(range(1, len(v)+1)) AS d FROM e),
       |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
       |${lloydAssign("a1", "e", "c0")},
       |${lloydUpdate("u1", "a1", "ex", "c0", "c1")},
       |${lloydAssign("a2", "e", "c1")},
       |${lloydUpdate("u2", "a2", "ex", "c1", "c2")},
       |${lloydAssign("a3", "e", "c2")},
       |${lloydUpdate("u3", "a3", "ex", "c2", "c3")},
       |${lloydAssign("af", "e", "c3")}
       |SELECT cid::INT AS ivf_cell, count(*) AS n FROM af GROUP BY 1""".stripMargin

  /** kmeansFitMod + ivfAssign mirror: identical scaled-integer Lloyd
    * structure to [[kmeansIvfOracle]], but the fit relations (`es`,
    * `exs`) carry only the mod-4 sample and the seeds are the 4
    * lowest-id SAMPLED vectors (cid = row_number within the sample,
    * matching kmeansFitMod's collect order). Only the final assignment
    * `af` touches the full corpus.
    */
  private def kmeansIvfSampledOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |es AS (SELECT vec_id, v FROM e WHERE vec_id % 4 = 0),
       |exs AS (SELECT vec_id, unnest(v) AS x, unnest(range(1, len(v)+1)) AS d FROM es),
       |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
       |       FROM es ORDER BY vec_id LIMIT 4),
       |${lloydAssign("a1", "es", "c0")},
       |${lloydUpdate("u1", "a1", "exs", "c0", "c1")},
       |${lloydAssign("a2", "es", "c1")},
       |${lloydUpdate("u2", "a2", "exs", "c1", "c2")},
       |${lloydAssign("a3", "es", "c2")},
       |${lloydUpdate("u3", "a3", "exs", "c2", "c3")},
       |${lloydAssign("af", "e", "c3")}
       |SELECT cid::INT AS ivf_cell, count(*) AS n FROM af GROUP BY 1""".stripMargin

  /** PQ mirror: two independent sampled-Lloyd chains (one per
    * subspace, suffix `_0`/`_1`), each the exact structure of
    * [[kmeansIvfSampledOracle]] but over `list_slice`d vectors
    * (DuckDB's list_slice is begin/END-inclusive, vs Spark's
    * start/LENGTH), joined on vec_id for the final code-tuple counts.
    */
  private def pqOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${pqChains()}
       |SELECT af_0.cid::INT AS pq_c0, af_1.cid::INT AS pq_c1, count(*) AS n
       |FROM af_0 JOIN af_1 USING (vec_id) GROUP BY 1, 2""".stripMargin

  /** Coarse sampled fit (suffix-free `c*` CTEs, 2 rounds) + residual
    * relation `r` + the shared per-subspace PQ chains reading from `r`
    * — the WITH body shared by the IVF+PQ occupancy and search mirrors.
    */
  private def ivfPqChains: String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ces AS (SELECT vec_id, v FROM e WHERE vec_id % 4 = 0),
       |cexs AS (SELECT vec_id, unnest(v) AS x, unnest(range(1, len(v)+1)) AS d FROM ces),
       |cc0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
       |       FROM ces ORDER BY vec_id LIMIT 4),
       |${lloydAssign("ca1", "ces", "cc0")},
       |${lloydUpdate("cu1", "ca1", "cexs", "cc0", "cc1")},
       |${lloydAssign("ca2", "ces", "cc1")},
       |${lloydUpdate("cu2", "ca2", "cexs", "cc1", "cc2")},
       |${lloydAssign("caf", "e", "cc2")},
       |r AS (SELECT e.vec_id, list_transform(range(1, len(e.v) + 1),
       |        i -> e.v[i] - c.cv[i]) AS v
       |      FROM e JOIN caf ON caf.vec_id = e.vec_id
       |      JOIN cc2 c ON c.cid = caf.cid),
       |${pqChains(src = "r")}""".stripMargin

  private def ivfPqOracle: String =
    s"""WITH $ivfPqChains
       |SELECT caf.cid::INT AS ivf_cell, af_0.cid::INT AS pq_c0,
       |  af_1.cid::INT AS pq_c1, count(*) AS n
       |FROM caf JOIN af_0 USING (vec_id) JOIN af_1 USING (vec_id)
       |GROUP BY 1, 2, 3""".stripMargin

  /** IVF+PQ ADC search mirror: reconstruction = coarse centroid +
    * concatenated residual-subspace centroids, scored against raw
    * queries.
    */
  private def ivfPqSearchOracle: String =
    s"""WITH $ivfPqChains,
       |reccb AS (
       |  SELECT caf.vec_id, cc.cv AS ccv, list_concat(x.cv, y.cv) AS rcv
       |  FROM caf JOIN cc2 cc ON cc.cid = caf.cid
       |  JOIN af_0 ON af_0.vec_id = caf.vec_id
       |  JOIN c${pqIters}_0 x ON x.cid = af_0.cid
       |  JOIN af_1 ON af_1.vec_id = caf.vec_id
       |  JOIN c${pqIters}_1 y ON y.cid = af_1.cid),
       |rec AS (SELECT vec_id,
       |  list_transform(range(1, len(ccv) + 1), i -> ccv[i] + rcv[i]) AS rv
       |  FROM reccb),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0, 1, 2))
       |SELECT query_id, neighbor_id, round(sim, 3) AS sim, rk FROM (
       |  SELECT q.query_id, r.vec_id AS neighbor_id,
       |    list_cosine_similarity(r.rv, q.qv) AS sim,
       |    row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY list_cosine_similarity(r.rv, q.qv) DESC, r.vec_id ASC) AS rk
       |  FROM rec r CROSS JOIN q WHERE r.vec_id <> q.query_id)
       |WHERE rk <= 5""".stripMargin

  /** ADC search mirror: reconstruct each corpus vector from its two
    * subspace centroids (`rv`), score raw queries against the
    * reconstructions.
    */
  private def pqSearchOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${pqChains()},
       |rec AS (
       |  SELECT af_0.vec_id, list_concat(x.cv, y.cv) AS rv
       |  FROM af_0 JOIN af_1 USING (vec_id)
       |  JOIN c${pqIters}_0 x ON x.cid = af_0.cid
       |  JOIN c${pqIters}_1 y ON y.cid = af_1.cid),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0, 1, 2))
       |SELECT query_id, neighbor_id, round(sim, 3) AS sim, rk FROM (
       |  SELECT q.query_id, r.vec_id AS neighbor_id,
       |    list_cosine_similarity(r.rv, q.qv) AS sim,
       |    row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY list_cosine_similarity(r.rv, q.qv) DESC, r.vec_id ASC) AS rk
       |  FROM rec r CROSS JOIN q WHERE r.vec_id <> q.query_id)
       |WHERE rk <= 5""".stripMargin

  /** The shared per-subspace sampled-Lloyd CTE chains (suffix `_j`),
    * reading (vec_id, v) from `src` and ending in full-corpus
    * assignments `af_j` with final codebooks `c<iters>_j`. Callers
    * must define `src` (raw vectors for plain PQ, residuals for
    * IVF+PQ).
    */
  // Shared PQ geometry: pqChains' chain structure and every consumer
  // referencing its CTE names (e.g. the final codebooks `c<pqIters>_j`
  // in pqSearchOracle) derive from these — never hardcode the round
  // count at a use site.
  private val pqIters = 2
  private val pqSub = 2

  private def pqChains(src: String = "e"): String = {
    val (k, dim) = (4, 64)
    val subLen = dim / pqSub
    def chain(j: Int): String = {
      val off = j * subLen
      val slices = Seq(
        s"ef_$j AS (SELECT vec_id, list_slice(v, ${off + 1}, ${off + subLen}) AS v FROM $src)",
        s"es_$j AS (SELECT vec_id, v FROM ef_$j WHERE vec_id % 4 = 0)",
        s"exs_$j AS (SELECT vec_id, unnest(v) AS x, unnest(range(1, len(v)+1)) AS d FROM es_$j)",
        s"""c0_$j AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
           |       FROM es_$j ORDER BY vec_id LIMIT $k)""".stripMargin)
      val rounds = (1 to pqIters).flatMap { i =>
        Seq(lloydAssign(s"a${i}_$j", s"es_$j", s"c${i - 1}_$j"),
          lloydUpdate(s"u${i}_$j", s"a${i}_$j", s"exs_$j", s"c${i - 1}_$j", s"c${i}_$j"))
      }
      (slices ++ rounds :+ lloydAssign(s"af_$j", s"ef_$j", s"c${pqIters}_$j")).mkString(",\n")
    }
    (0 until pqSub).map(chain).mkString(",\n")
  }

  /** Signature text for the random-hyperplane LSH: bit b = sign of the
    * dot product with the deterministic literal plane (the same
    * constants Similarity.planeComponent bakes into the Spark plan).
    */
  private def lshSigSql(vecExpr: String, bitOffset: Int, nBits: Int): String =
    (bitOffset until bitOffset + nBits).map { b =>
      val plane = (0 until 64).map(d =>
        Similarity.planeComponent(b, d).toString).mkString("[", ", ", "]")
      s"CASE WHEN list_dot_product($vecExpr, $plane) >= 0 THEN '1' ELSE '0' END"
    }.mkString("(", " || ", ")")

  /** Mirrors lshTopK INCLUDING its default corpus-side bucket cap
    * (maxBucket=1000): without the z.n filter the two engines diverge
    * as soon as any signature bucket outgrows the cap at a larger SF.
    */
  private def annLshOracle: String =
    s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (SELECT vec_id, v, ${lshSigSql("v", 0, 4)} AS sig FROM c),
       |z AS (SELECT sig, count(*) AS n FROM s GROUP BY 1),
       |q AS (SELECT vec_id AS query_id, v AS qv, sig FROM s
       |      WHERE vec_id IN (0, 1, 2, 3, 4)),
       |sc AS (SELECT q.query_id, s.vec_id AS neighbor_id,
       |         list_cosine_similarity(s.v, q.qv) AS sim
       |       FROM s JOIN q ON s.sig = q.sig AND s.vec_id <> q.query_id
       |       JOIN z ON z.sig = q.sig WHERE z.n <= 1000),
       |r AS (SELECT query_id, neighbor_id, sim, row_number() OVER
       |        (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
       |      FROM sc)
       |SELECT query_id, neighbor_id, round(sim, 3) + 0.0 AS sim, rk
       |FROM r WHERE rk <= 5""".stripMargin

  /** lshTopKWithFallback mirror: queries in eligible buckets keep the
    * signature join; queries whose corpus bucket exceeds the cap score
    * against the whole corpus. Disjoint by query, so ranking the union
    * per query matches Spark's rank-within-each-path union.
    */
  private def annLshFallbackOracle: String =
    s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (SELECT vec_id, v, ${lshSigSql("v", 0, 4)} AS sig FROM c),
       |z AS (SELECT sig, count(*) AS n FROM s GROUP BY 1),
       |q AS (SELECT vec_id AS query_id, v AS qv, sig FROM s
       |      WHERE vec_id IN (0, 1, 2, 3, 4)),
       |lsh AS (SELECT q.query_id, s2.vec_id AS neighbor_id,
       |          list_cosine_similarity(s2.v, q.qv) AS sim
       |        FROM s s2 JOIN q ON s2.sig = q.sig AND s2.vec_id <> q.query_id
       |        JOIN z ON z.sig = q.sig WHERE z.n <= 50),
       |fbq AS (SELECT q.query_id, q.qv FROM q
       |        JOIN z ON z.sig = q.sig WHERE z.n > 50),
       |fb AS (SELECT fbq.query_id, s2.vec_id AS neighbor_id,
       |         list_cosine_similarity(s2.v, fbq.qv) AS sim
       |       FROM s s2 CROSS JOIN fbq WHERE s2.vec_id <> fbq.query_id),
       |u AS (SELECT * FROM lsh UNION ALL SELECT * FROM fb),
       |r AS (SELECT query_id, neighbor_id, sim, row_number() OVER
       |        (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
       |      FROM u)
       |SELECT query_id, neighbor_id, round(sim, 3) + 0.0 AS sim, rk
       |FROM r WHERE rk <= 5""".stripMargin

  private def cosinePairsOracle: String =
    s"""WITH e0 AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |e AS (SELECT id, v FROM e0
       |      UNION ALL
       |      SELECT id + 1000000, list_concat([v[1] + 0.01], v[2:])
       |      FROM e0 WHERE id % 10 = 0),
       |banded AS (
       |  SELECT id, '0|' || ${lshSigSql("v", 0, 12)} AS sig FROM e
       |  UNION ALL
       |  SELECT id, '1|' || ${lshSigSql("v", 12, 12)} AS sig FROM e),
       |sizes AS (SELECT sig, count(*) AS n FROM banded GROUP BY 1),
       |cand AS (
       |  SELECT DISTINCT a.id AS idA, b.id AS idB
       |  FROM banded a JOIN banded b ON a.sig = b.sig AND a.id < b.id
       |  JOIN sizes s ON s.sig = a.sig
       |  WHERE s.n BETWEEN 2 AND 1000),
       |p AS (SELECT idA, idB, list_cosine_similarity(x.v, y.v) AS sim
       |      FROM cand JOIN e x ON x.id = cand.idA JOIN e y ON y.id = cand.idB)
       |SELECT idA, idB, round(sim, 3) AS sim FROM p WHERE sim >= 0.8""".stripMargin

  /** Shared DSIR oracle: unigram+bigram buckets (portable 60-bit md5
    * hash mod 256) per doc, add-one-smoothed log-probs for the raw
    * corpus and the English target subset over ALL 256 buckets, and the
    * per-doc log-ratio sum. Every doc has >= 1 gram (an empty text
    * tokenizes to one empty token in both engines), so the final join
    * loses nothing.
    */
  private def dsirWeightsSql: String =
    """WITH tk AS (SELECT doc_id, lang,
      |    string_split_regex(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
      |                       '\s+') AS t
      |  FROM documents),
      |g AS (SELECT doc_id, lang, unnest(t) AS gram FROM tk
      |      UNION ALL
      |      SELECT doc_id, lang,
      |        unnest(CASE WHEN len(t) >= 2
      |          THEN list_transform(range(0, len(t) - 1),
      |                 i -> array_to_string(list_slice(t, i + 1, i + 2), ' '))
      |          ELSE [] END) AS gram
      |      FROM tk),
      |b AS (SELECT doc_id, lang,
      |        (('0x' || substr(md5(gram), 1, 15))::BIGINT % 256)::INT AS bucket
      |      FROM g),
      |rc AS (SELECT bucket, count(*) AS c FROM b GROUP BY 1),
      |tc AS (SELECT bucket, count(*) AS c FROM b WHERE lang = 'en' GROUP BY 1),
      |rt AS (SELECT count(*) AS n FROM b),
      |tt AS (SELECT count(*) AS n FROM b WHERE lang = 'en'),
      |ab AS (SELECT unnest(range(0, 256))::INT AS bucket),
      |d AS (SELECT ab.bucket,
      |        ln((coalesce(tc.c, 0) + 1)::DOUBLE / (tt.n + 256)) -
      |        ln((coalesce(rc.c, 0) + 1)::DOUBLE / (rt.n + 256)) AS diff
      |      FROM ab LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket),
      |           rt, tt),
      |w AS (SELECT b.doc_id, sum(d.diff) AS logw
      |      FROM b JOIN d USING (bucket) GROUP BY 1)""".stripMargin

  /** Shared duplicate-span query input: documents UNION a planted twin
    * of every 20th doc (id +1e6) carrying the original's first 400
    * chars behind a marker head — same raw substring, different offset.
    */
  private def spanCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.filter(pmod(col("doc_id"), lit(20)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("PLANTED HEAD "), substring(col("text"), 1, 400))
          .as("text")))
  }

  /** Shared duplicate-span oracle prefix: the planted-twin corpus,
    * canonicalization, 20-char window Karp-Rabin polynomial hashes
    * (Σ codepoint·B^j mod 2^61−1, computed DEFINITIONALLY per window
    * with HUGEINT intermediates — the Spark side rolls the identical
    * polynomial in O(1) per char, graft.plans.WinnowHash), and the
    * winnowing selection — min hash of each run of 8 consecutive
    * windows, distinct per doc, runs clipped to full width exactly
    * like `winnowFingerprints` (docs with fewer than 8 windows select
    * nothing).
    */
  private def spanSelectSql: String =
    s"""WITH d0 AS (SELECT doc_id, text FROM documents),
      |d AS (SELECT doc_id, text FROM d0
      |      UNION ALL
      |      SELECT doc_id + 1000000, 'PLANTED HEAD ' || substr(text, 1, 400)
      |      FROM d0 WHERE doc_id % 20 = 0),
      |c AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
      |        '[^a-z0-9]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM d),
      |g0 AS (SELECT doc_id, t,
      |         unnest(range(1, greatest(length(t) - 18, 1))) AS i FROM c),
      |g AS (SELECT doc_id, i,
      |        (list_sum(list_transform(range(0, 20),
      |           j -> unicode(substr(t, (i + j)::INT, 1))::HUGEINT *
      |                (${graft.plans.WinnowHash.powTableSql(20)})[j + 1]))
      |         % 2305843009213693951)::BIGINT AS h
      |      FROM g0),
      |m AS (SELECT doc_id, i,
      |        min(h) OVER (PARTITION BY doc_id ORDER BY i
      |                     ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
      |          AS span_fp,
      |        count(*) OVER (PARTITION BY doc_id) AS n_g
      |      FROM g),
      |sel AS (SELECT DISTINCT doc_id, span_fp FROM m WHERE i <= n_g - 7)""".stripMargin

  /** Shared SemDeDup query input: embeddings (as double) UNION a
    * planted near-duplicate twin of every 10th vector (first coordinate
    * nudged +0.01, id offset +1e6), plus the four lowest-id ORIGINAL
    * vectors as centroids. [[semanticCellsSql]] mirrors the planting.
    */
  private def semdedupCorpus(s: SparkSession, dir: String)
      : (DataFrame, Seq[Seq[Double]]) = {
    val e = emb(s, dir)
      .withColumn("embedding", transform(col("embedding"), _.cast("double")))
      .select(col("vec_id"), col("embedding"))
    val planted = e.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.01)),
          slice(col("embedding"), 2, 63)).as("embedding"))
    (e.unionByName(planted), seedCentroids(s, dir, e))
  }

  /** Shared SemDeDup oracle prefix: the planted-twin corpus, argmax
    * cell assignment against the four lowest-id original embeddings as
    * centroids (the q_ann_ivf mirror), and the [2, maxCell] eligibility
    * filter matching `cappedBuckets`.
    */
  private def semanticCellsSql: String =
    """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |e AS (SELECT vec_id, v FROM e0
      |      UNION ALL
      |      SELECT vec_id + 1000000, list_concat([v[1] + 0.01], v[2:])
      |      FROM e0 WHERE vec_id % 10 = 0),
      |c AS (SELECT vec_id AS cid, v AS cv FROM e0 WHERE vec_id < 4),
      |sc AS (SELECT e.vec_id, c.cid,
      |         list_cosine_similarity(e.v, c.cv) AS csim
      |       FROM e CROSS JOIN c),
      |a AS (SELECT vec_id, cid FROM (
      |        SELECT vec_id, cid, row_number() OVER
      |          (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
      |        FROM sc) WHERE rn = 1),
      |el AS (SELECT cid FROM (SELECT cid, count(*) AS n FROM a GROUP BY 1)
      |       WHERE n BETWEEN 2 AND 1000)""".stripMargin
}
