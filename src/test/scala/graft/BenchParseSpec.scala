package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's round-over-round baseline parser ([[Bench.parsePrevSteady]])
  * — a pure function that has now caused two silent-baseline losses
  * (BENCH_r03: truncated head; BENCH_r15: the driver wrapper arrived
  * with `parsed: null` and ONLY the escaped tail fragment, so the r16
  * bench initially ran with no prev map and an empty regress watch).
  * Pinned against all three shapes, including the actual r15 artifact.
  */
class BenchParseSpec extends AnyFunSuite {

  test("raw one-line JSON (this main's own output) parses") {
    val raw = """{"metric":"total","value":1.5,"unit":"sec","err":[],""" +
      """"queries":{"q01":0.5,"q152":3.018},"noise":{"q01":0.2},"sf":"x"}"""
    assert(Bench.parsePrevSteady(raw) ===
      Some(Map("q01" -> 0.5, "q152" -> 3.018)))
  }

  test("the noise/regress maps cannot pollute the baseline (scoped to " +
      "the FIRST queries object)") {
    val raw = """{"queries":{"q01":0.5},"regress":{"q99":9.9}}"""
    assert(Bench.parsePrevSteady(raw) === Some(Map("q01" -> 0.5)))
  }

  test("the driver wrapper's ESCAPED tail fragment parses (the r15 " +
      "failure shape)") {
    val wrapper = """{"n": 15, "rc": 0, "tail": "\",\"value\":183.1,""" +
      """\"err\":[],\"queries\":{\"q95\":0.5,\"q140\":1.3},""" +
      """\"sf\":\"sf0.1\"}", "parsed": null}"""
    assert(Bench.parsePrevSteady(wrapper) ===
      Some(Map("q95" -> 0.5, "q140" -> 1.3)))
  }

  test("the ACTUAL BENCH_r15.json artifact yields a non-empty baseline " +
      "with sane values") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_r15.json")), "UTF-8")
    val m = Bench.parsePrevSteady(txt)
    assert(m.nonEmpty, "the r15 record must parse as a baseline")
    assert(m.get.size > 100,
      s"the r15 tail carries the full steady map: ${m.get.size} entries")
    assert(m.get.values.forall(v => v >= 0.0 && v < 100.0),
      "steady seconds must be sane")
    assert(m.get.contains("q152"), "the canary must be present")
  }

  test("garbage and absent-queries inputs return None, never a partial map") {
    assert(Bench.parsePrevSteady("") === None)
    assert(Bench.parsePrevSteady("""{"metric":"total","value":1}""") === None)
  }
}
