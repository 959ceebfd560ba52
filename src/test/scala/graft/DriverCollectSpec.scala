package graft

import org.scalatest.funsuite.AnyFunSuite

/** Grep-anchored lock on the driver-side materialization contract
  * (README.md "Driver-side materialization contract"): every
  * `.collect()` in src/main must be a registered, provably bounded fit
  * or invariant. Adding a collect without updating the registry (and
  * the README row explaining its bound) fails this spec — the point is
  * that driver materialization is a deliberate act, never an accident.
  */
class DriverCollectSpec extends AnyFunSuite {

  private val root = java.nio.file.Paths.get("src/main/scala/graft")

  /** file (relative to src/main/scala/graft) -> expected number of
    * `.collect()` calls on CODE lines (comment lines stripped).
    */
  private val registry: Map[String, Int] = Map(
    "DT.scala" -> 3,                          // splitBy cap, print head/tail
    "operators/GlobalOrdered.scala" -> 1,     // bounds fit (≤200k sample)
    "operators/Reshape.scala" -> 2,           // pivot domains ×2 (implicit/string), both MAX_PIVOT-capped + memoized
    "operators/Scale.scala" -> 1,             // catalog Location row
    "curate/Sampling.scala" -> 1,             // per-source token totals
    "curate/Dsir.scala" -> 2,                 // grand total, 1024-bucket table
    "curate/Contamination.scala" -> 1,        // benchmark-gram bloom build
    "operators/IndexCommit.scala" -> 1,       // batchKey: 1-row agg (count+hash)
    "dedup/Dedup.scala" -> 1,                 // opt-in debug id-uniqueness tripwire: limit(1)
    "sim/Similarity.scala" -> 7,              // kmeans seeds ×2, Lloyd sums, ADC tables, IVF/PQ loads, LSH counts (≤2^nBits; memoized)
    "QueriesTextSim.scala" -> 1)              // 4 harness seed centroids

  private def codeLines(p: java.nio.file.Path): Iterator[String] = {
    val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    src.linesIterator.filterNot { l =>
      val t = l.trim
      t.startsWith("*") || t.startsWith("//") || t.startsWith("/*")
    }
  }

  test("every .collect() in src/main is in the bounded-fit registry") {
    import scala.jdk.CollectionConverters._
    val found = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map { p =>
        val rel = root.relativize(p).toString
        rel -> codeLines(p).map(l =>
          l.sliding(".collect()".length).count(_ == ".collect()")).sum
      }
      .filter(_._2 > 0)
      .toMap
    assert(found == registry,
      s"""driver-collect inventory drifted:
         |  unregistered: ${(found.toSet -- registry.toSet).toSeq.sorted}
         |  stale:        ${(registry.toSet -- found.toSet).toSeq.sorted}
         |Update the registry here AND the README contract table.""".stripMargin)
  }

  test("the README contract table names every registered file") {
    val readme = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("README.md")), "UTF-8")
    assert(readme.contains("## Driver-side materialization contract"))
    val missing = registry.keys.filterNot(f =>
      readme.contains(f.split('/').last))
    assert(missing.isEmpty, s"README contract table missing: $missing")
  }
}
