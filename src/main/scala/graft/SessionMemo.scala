package graft

/** Session-scoped memo of expensive driver-side fits and persisted
  * frames — ONE implementation of the registry semantics the engine's
  * caches share (Dedup shingle bases + index bucket aggs, Similarity
  * kmeans/PQ fits + persisted cell indexes, Sampling token-totals,
  * Contamination bench blooms, Sketches CMS fits).
  *
  * Contract, shared by every call site:
  *
  *  - '''Race-safe insert''' ([[getOrElsePut]]): the compute runs
  *    under a PER-KEY lock, so concurrent callers of one key get the
  *    one registered value and the compute runs once (driver-side
  *    parallelism is real: the PQ subspace fits run from Futures).
  *    The previous putIfAbsent + loser-evict design was self-defeating
  *    for persisted DataFrames — Spark's CacheManager keys on the
  *    LOGICAL PLAN, so the race loser's `onEvict(_.unpersist())`
  *    uncached the semantically identical plan the winner had just
  *    registered, silently dropping the cache under the very race the
  *    memo defends against (round-10 advisory).
  *  - '''Writer eviction''' ([[evictPrefix]]/[[clear]]): every removal
  *    path funnels through `remove` + [[onEvict]], so a future change
  *    to the unpersist-race semantics is one edit here, not five.
  *  - '''Owned observability''' ([[keys]]/[[snapshot]]/[[size]]):
  *    tests assert on the memo's OWNED set, never on the
  *    ContextCleaner-raced global `getPersistentRDDs` count.
  *
  * Values must tolerate [[onEvict]] running at most once per inserted
  * value. Keys are caller-constructed strings, conventionally
  * `session-identity : analyzed-plan semanticHash : columns : params`
  * so prefix eviction can target one corpus/index.
  */
final class SessionMemo[V](onEvict: V => Unit = (_: V) => ()) {

  private val map = scala.collection.concurrent.TrieMap.empty[String, V]
  // per-key compute locks — TrieMap.getOrElseUpdate is atomic (scala
  // 2.13), so exactly one lock object exists per key. Lock objects are
  // tiny and never removed (keys are bounded fit/index tags).
  private val locks = scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Memoized value for `key`, computing (and registering) it if
    * absent — under a per-key lock, so concurrent callers of one key
    * run the compute ONCE and all observe the registered value. An
    * eviction racing the compute can still reinstate a stale value
    * (same exposure as the previous putIfAbsent form); writers evict
    * between pipelines, not mid-fit.
    */
  def getOrElsePut(key: String)(compute: => V): V =
    map.get(key).getOrElse {
      val lock = locks.getOrElseUpdate(key, new Object)
      lock.synchronized {
        map.get(key).getOrElse {
          val fresh = compute
          map.put(key, fresh)
          fresh
        }
      }
    }

  /** Drop (and release) every entry whose key starts with `prefix` —
    * the writer-eviction hook: callers that rewrite a corpus/index
    * evict its plan- or path-prefixed entries so a stale memo can
    * never serve the new version.
    */
  def evictPrefix(prefix: String): Unit =
    map.keys.filter(_.startsWith(prefix)).foreach { k =>
      map.remove(k).foreach(onEvict)
    }

  /** Drop (and release) every entry. */
  def clear(): Unit =
    map.keys.foreach(k => map.remove(k).foreach(onEvict))

  /** Keys of the currently-memoized entries — the OWNED set tests
    * assert on.
    */
  def keys: Set[String] = map.keySet.toSet

  /** Snapshot of the memoized values (key -> value); for persisted
    * frames `frame.storageLevel` reads CacheManager synchronously, so
    * eviction is assertable per owned frame.
    */
  def snapshot: Map[String, V] = map.toMap

  def size: Int = map.size
}
