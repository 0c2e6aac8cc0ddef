package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures the LAST 2,000 bytes of Bench stdout and parses
  * the final line as the round's official perf record. BENCH_r17 and
  * BENCH_r19 both came back `parsed: null` because the final line
  * carried every per-query wall and outgrew that window as the headline
  * grew. This spec pins the r20 contract: the final line's byte size is
  * a function of FIXED fields only — independent of headline growth —
  * and stays under 1,900 bytes even at worst-case numeric widths.
  */
class BenchEmissionSpec extends AnyFunSuite {

  test("final line stays <1,900 B at worst-case field widths") {
    // every numeric field at an absurdly wide rendering: 5-digit totals,
    // negative sentinels, a long sf path — wider than any real run
    val walls = Bench.flagships.map(_ -> 99999.999).toMap
    val line = Bench.finalLine(
      total = 99999.999, walls = walls,
      calPre = (99999.999, 99999.999), calPost = (99999.999, 99999.999),
      bwPre = (99999.9, 99999.9), bwPost = (99999.9, 99999.9),
      contended = true, sharedTotal = 99999.999, retryTotal = 99999.999,
      sfDir = "/root/testdata/sf0.1/some/unusually/deep/dataset/directory")
    val n = line.getBytes("UTF-8").length
    assert(n < 1900, s"final line $n B — driver tail capture would truncate it")
    // generous headroom: the contract is fixed-size, not barely-fits
    assert(n < 1000, s"final line $n B — fixed-field record should be well under 1 KB")
  }

  test("final line is valid JSON with the driver-contract fields") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val line = Bench.finalLine(
      total = 42.112, walls = Map("ndsh_q1" -> 0.385, "ndsh_q6" -> 0.156),
      calPre = (0.418, 0.509), calPost = (0.667, 0.749),
      bwPre = (21.3, 48.7), bwPost = (14.2, 31.9),
      contended = true, sharedTotal = 42.112, retryTotal = 36.001,
      sfDir = "/root/testdata/sf0.1")
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("value").asDouble() == 42.112)
    assert(node.get("unit").asText() == "sec")
    assert(node.get("contended").asBoolean())
    assert(node.get("shared_set_total").asDouble() == 42.112)
    assert(node.get("shared_set_n").asInt() == 69)
    assert(node.get("shared_set_retry_total").asDouble() == 36.001)
    assert(node.get("queries").get("ndsh_q1").asDouble() == 0.385)
    // a flagship missing from the walls map renders as the -1 sentinel,
    // never a missing key (fixed schema)
    assert(node.get("queries").get("ndsh_q9").asDouble() == -1.0)
    assert(node.get("cal_post_single_s").asDouble() == 0.667)
    assert(node.get("cal_membw_allcores_gbps").asDouble() == 48.7)
    assert(node.get("cal_post_membw_allcores_gbps").asDouble() == 31.9)
  }

  test("flagship set is fixed, small, and inside the headline") {
    assert(Bench.flagships == Seq("ndsh_q1", "ndsh_q5", "ndsh_q6", "ndsh_q9"))
    assert(Bench.flagships.forall(Bench.headline.contains))
  }

  test("every headline query beyond the pinned 69 is excluded explicitly") {
    // the startup require enforces size == 69; this asserts the other
    // direction — the shared set is a SUBSET of the headline, so a
    // renamed query can't silently leave a stale exclusion behind
    assert(Bench.sharedSet69.subsetOf(Bench.headline.toSet))
  }
}
