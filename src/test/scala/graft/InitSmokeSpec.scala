package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-initializes commit gate (VERDICT r15 #2): a few seconds,
  * JVM-only, NO SparkSession — forces every module object's static init
  * plus every shipped resource, so a half-landed resource migration
  * fails HERE at commit time instead of erasing the round's entire
  * correctness/bench signal at engine init.
  */
class InitSmokeSpec extends AnyFunSuite {

  test("every gate enumerates: SparkEntry.queries serves the full inventory") {
    assert(SparkEntry.queries.size == 166)
  }

  test("executionConfs and prewarms reference real gates only") {
    // a typo'd gate name here would silently no-op: the conf never
    // applies (or the prewarm never runs) and nothing fails loudly
    val qs = SparkEntry.queries.keySet
    val confStrays = SparkEntry.executionConfs.keySet.diff(qs)
    assert(confStrays.isEmpty, s"executionConfs names unknown gates: $confStrays")
    val warmStrays = SparkEntry.prewarms.keySet.diff(qs)
    assert(warmStrays.isEmpty, s"prewarms names unknown gates: $warmStrays")
  }

  test("every oracle thunk builds (no gate silently degraded to rows-only)") {
    val entries = SparkEntry.allEntries
    val built = SparkEntry.oracleSql
    // gates whose oracle thunk LEGITIMATELY returns "" (rows-only by
    // design) are fine; what must never happen silently is a THROWING
    // thunk — evaluate each one and name the culprit
    entries.foreach { case (k, (_, oracle)) =>
      val sql = oracle() // throws → this test fails with the gate's name
      assert(sql != null, s"gate '$k' oracle is null")
    }
    val emptyByDesign = entries.count { case (_, (_, o)) => o().isEmpty }
    assert(built.size == entries.size - emptyByDesign)
  }

  test("shipped BPE merges load, are hex-clean, and id space is laid out") {
    val m = graft.functions.BpeVocab.merges
    assert(m.nonEmpty)
    // every symbol is a byte string (latin-1 form) that hex-round-trips
    m.foreach { case (l, r) =>
      Seq(l, r).foreach { s =>
        assert(s.forall(_ < 256), s"non-byte symbol '$s'")
        assert(graft.functions.BpeVocab.hexOf(s).length == 2 * s.length)
      }
    }
    assert(graft.functions.BpeVocab.EosId == 256L + m.length)
  }

  test("shipped subword vocab and bigram LM load") {
    assert(graft.functions.SubwordVocab.entries.nonEmpty)
    assert(graft.functions.BigramLm.entries.nonEmpty)
  }

  test("a throwing oracle thunk degrades its own gate only (crash radius)") {
    val boom: Gate.Entry = Gate((_, _) => sys.error("unused"),
      throw new ExceptionInInitializerError("simulated bad resource"))
    val ok: Gate.Entry = Gate((_, _) => sys.error("unused"), "SELECT 1 AS x")
    val dumped = SparkEntry.dumpOracles(Map("bad_gate" -> boom, "good_gate" -> ok))
    assert(dumped == Map("good_gate" -> "SELECT 1 AS x"))
  }
}
