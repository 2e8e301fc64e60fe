package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's timeout-proof output discipline (the r15
  * official artifact died at rc=124 with zero per-query data because the
  * sweep printed everything at the end).
  *
  * No SparkSession: these are pure string/parse contracts.
  */
class BenchArtifactSpec extends AnyFunSuite {

  test("entryLine is one compact parseable JSON object per entry") {
    assert(Bench.entryLine("q01_agg", 1.2345) ==
      """{"q":"q01_agg","sec":1.235}""")
    assert(!Bench.entryLine("q01_agg", 1.2345).contains("\n"))
  }

  test("summaryLine without truncation matches the historical shape") {
    val line = Bench.summaryLine(
      Seq("q01" -> 1.0, "q02" -> 2.5), "/root/testdata/sf0.1", None)
    assert(line ==
      """{"queries":{"q01":1.000,"q02":2.500},"metric":"total","value":3.500,"unit":"sec","sf":"/root/testdata/sf0.1"}""")
  }

  test("budget truncation yields a parseable summary over the completed " +
      "subset with truncated_after naming the last completed entry") {
    val line = Bench.summaryLine(
      Seq("q01" -> 1.0, "q02" -> 2.5), "sfdir", Some("q02"))
    assert(line.endsWith(""","truncated_after":"q02"}"""))
    assert(line.contains(""""queries":{"q01":1.000,"q02":2.500}"""))
    assert(line.contains(""""value":3.500"""))
    // still one line, braces balanced
    assert(!line.contains("\n"))
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("compactLine is the LAST line of stdout: complete, parseable, and " +
      "small enough for any stdout-tail window (the r16 lesson — the 8 KB " +
      "summary line overflowed the harness's ~2000-char tail)") {
    val line = Bench.compactLine(270.599, 268, 2.052,
      "/root/testdata/sf0.1", None)
    assert(line ==
      """{"metric":"total","value":270.599,"unit":"sec","n":268,"canary":2.052,"sf":"/root/testdata/sf0.1"}""")
    assert(!line.contains("\n"))
    assert(line.length < 300, "compact line must fit any tail window")
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("compactLine carries truncated_after when the budget cut the sweep") {
    val line = Bench.compactLine(100.0, 50, 2.0, "sfdir", Some("q99_hits"))
    assert(line.endsWith(""","truncated_after":"q99_hits"}"""))
    assert(line.startsWith("""{"metric":"total","value":100.000"""))
  }

  test("compactLine does not poison prevRecord parsing: no q/b-prefixed " +
      "keys, so an artifact tail holding only the compact line falls " +
      "back to an older artifact for the outlier defense") {
    val compact = Bench.compactLine(100.0, 50, 2.0, "sfdir", None)
    val older = """{"queries":{"q01":1.500},"canary":1.900}"""
    val rec = Bench.parsePrevRecord(Seq(compact, older))
    assert(rec.get("q01").contains(1.5))
  }

  test("prevRecord falls back past artifacts with no per-query values " +
      "(the rc=124 carcass) to the newest artifact that parses") {
    val dead =
      """{"metric":"total","rc":124,"parsed":null,"stdout_tail":""}"""
    val live =
      """{"queries":{"q01":1.500,"b02":0.300},"canary":1.900,"total":1.8}"""
    val older =
      """{"queries":{"q01":9.900},"canary":2.500}"""
    val rec = Bench.parsePrevRecord(Seq(dead, live, older))
    assert(rec.get("q01").contains(1.5))
    assert(rec.get("b02").contains(0.3))
    assert(rec.get("canary").contains(1.9))
  }

  test("prevRecord parses the driver's JSON-escaped-tail encoding") {
    // the driver stores the bench stdout tail as an escaped string, so
    // names appear as \"q01\":1.5 inside the artifact
    val escaped =
      """{"stdout_tail":"{\"queries\":{\"q01\":1.500},\"canary\":1.900}"}"""
    val rec = Bench.parsePrevRecord(Seq(escaped))
    assert(rec.get("q01").contains(1.5))
  }

  test("prevRecord with only dead artifacts is empty (defense disabled " +
      "loudly-by-absence, not wrong values)") {
    assert(Bench.parsePrevRecord(Seq("""{"rc":124}""", "")).isEmpty)
  }
}
