package graft

/** Session-scoped memo of expensive driver-side fits and persisted
  * frames — ONE implementation of the registry semantics the engine's
  * caches share (Dedup shingle bases + index bucket aggs, Similarity
  * kmeans/PQ fits + persisted cell indexes, Sampling token-totals,
  * Contamination bench blooms, Sketches CMS fits).
  *
  * Contract, shared by every call site:
  *
  *  - '''Race-safe insert''' ([[getOrElsePut]]): a naive
  *    `TrieMap.getOrElseUpdate` can run the by-name compute on two
  *    threads with the loser's value left live but unregistered — for
  *    a `.persist()`ed DataFrame that is a MEMORY_AND_DISK leak no
  *    eviction hook could ever reclaim (driver-side parallelism is
  *    real: the PQ subspace fits run from Futures). `putIfAbsent`
  *    decides the winner; the loser's value is released via
  *    [[onEvict]] (for persisted frames the compute is lazy —
  *    `df.persist` schedules no job — so the loser's copy was never
  *    materialized).
  *  - '''Writer eviction''' ([[evictPrefix]]/[[clear]]): every removal
  *    path funnels through `remove` + [[onEvict]], so a future change
  *    to the unpersist-race semantics is one edit here, not five.
  *  - '''Owned observability''' ([[keys]]/[[snapshot]]/[[size]]):
  *    tests assert on the memo's OWNED set, never on the
  *    ContextCleaner-raced global `getPersistentRDDs` count.
  *
  * Values must tolerate [[onEvict]] running at most once per inserted
  * value (the loser of an insert race is evicted without ever being
  * registered). Keys are caller-constructed strings, conventionally
  * `session-identity : analyzed-plan semanticHash : columns : params`
  * so prefix eviction can target one corpus/index.
  */
final class SessionMemo[V](onEvict: V => Unit = (_: V) => ()) {

  private val map = scala.collection.concurrent.TrieMap.empty[String, V]

  /** Memoized value for `key`, computing (and registering) it if
    * absent. Under a concurrent insert race both threads may run
    * `compute`; exactly one value wins registration and the loser is
    * released through `onEvict`.
    */
  def getOrElsePut(key: String)(compute: => V): V =
    map.get(key).getOrElse {
      val fresh = compute
      map.putIfAbsent(key, fresh) match {
        case Some(existing) => onEvict(fresh); existing
        case None => fresh
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
