package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's truncation contract: the round harvester
  * keeps only the LAST 2000 characters of stdout, and BENCH_r08 lost
  * its `value`/`valid` head (plus two query rows) to that — the
  * official artifact could not prove the gate passed. `renderLine`
  * therefore repeats the verdict in a compact trailer after the big
  * `queries` map; these tests fail if anyone reorders the line so the
  * verdict can be truncated away again.
  */
class BenchLineSpec extends AnyFunSuite {

  private val many = (1 to 77).map(i => f"q$i%02d_name_of_query" -> i * 0.01)

  test("verdict fields survive a 2000-char tail capture on a passing run") {
    val line = Bench.renderLine(many, buildSec = 85.0, sfDir = "/x/sf0.1")
    val tail = line.takeRight(2000)
    assert(tail.contains("\"total2\":"), "total2 missing from tail")
    assert(tail.contains("\"valid2\":true"), "valid2 missing from tail")
    assert(tail.contains("\"failed2\":[]"), "failed2 missing from tail")
    assert(line.endsWith("}") && line.startsWith("{"))
    // head still leads with the human-readable verdict
    assert(line.take(120).contains("\"value\":"))
    assert(line.take(120).contains("\"valid\":true"))
  }

  test("scalar verdict fields are the LAST fields, after any failed list") {
    // worst case: every query fails — the failed2 array is long, but
    // total2/valid2 sit after it so even a tiny tail capture has them
    val allFail = many.map { case (k, _) => k -> -1.0 }
    val line = Bench.renderLine(allFail, buildSec = 85.0, sfDir = "/x/sf0.1")
    assert(line.takeRight(60).contains("\"total2\":-1.000"))
    assert(line.takeRight(60).contains("\"valid2\":false"))
    assert(line.contains("\"value\":-1.000"),
      "a run with failures must not report a partial total as the value")
  }

  test("worst-rows line ranks by ratio against parsed pins") {
    // pin block in BASELINE.md's shape, including a historical mention
    // AFTER the canonical value (first occurrence must win) and prose
    // numbers that must not parse as pins
    val pins = Bench.parsePins(
      """Per-query reference (sec, warm):
        |q01 0.50, q02 1.00, q03 2.0, s03 1.7 (s03 is a streaming row;
        |q03 4.00 → 2.0 was the r5 re-pin; r4 47.1 total; sift10M 7530)
        |""".stripMargin)
    assert(pins == Map("q01" -> 0.50, "q02" -> 1.00, "q03" -> 2.0, "s03" -> 1.7))
    // prose ABOVE the header must not shadow a pin (parsing is anchored)
    val shadowed = Bench.parsePins(
      """In r4 q01 9.99 was a contended reading, since re-pinned.
        |Per-query reference (sec, warm):
        |q01 0.50, q02 1.00
        |""".stripMargin)
    assert(shadowed == Map("q01" -> 0.50, "q02" -> 1.00))
    // ... and a MID-LINE prose mention of the header phrase above the
    // real header must not become the anchor either (line-start match)
    val midline = Bench.parsePins(
      """see the Per-query reference table below; q01 9.99 was contended.
        |Per-query reference (sec, warm):
        |q01 0.50, q02 1.00
        |""".stripMargin)
    assert(midline == Map("q01" -> 0.50, "q02" -> 1.00))
    // a markdown-heading reformat of the header must keep anchoring
    // (previously fell back to a whole-document scan → shadowing), and
    // a prose line that merely BEGINS with the phrase must not anchor
    val heading = Bench.parsePins(
      """Per-query reference values from r4 are retired; q01 9.99 there.
        |## Per-query reference (sec, warm):
        |q01 0.50, q02 1.00
        |""".stripMargin)
    assert(heading == Map("q01" -> 0.50, "q02" -> 1.00))
    val results = Seq("q01_a" -> 0.25, "q02_b" -> 3.0, "q03_c" -> 2.0,
      "s03_d" -> 1.7)
    val line = Bench.renderWorstLine(results, pins)
    // q02 at 3.0× leads; q01 at 0.5× trails
    assert(line.startsWith("""{"worst":{"q02_b":3.000"""), line)
    assert(line.contains(""""basis":"ratio_vs_pin""""), line)
    assert(line.indexOf("q01_a") > line.indexOf("s03_d"), line)
  }

  test("worst-rows line falls back to seconds without pins, failures lead") {
    val results = Seq("q01_a" -> 0.25, "q02_b" -> -1.0, "q03_c" -> 5.0)
    val line = Bench.renderWorstLine(results, Map.empty)
    assert(line.startsWith("""{"worst":{"q02_b":-1.000,"q03_c":5.000"""), line)
    assert(line.contains(""""basis":"sec""""), line)
  }

  test("all-rows line fits a 77-row inventory in the tail capture") {
    val pins = (1 to 77).map(i => f"q$i%02d" -> 0.5).toMap
    val line = Bench.renderAllRowsLine(many, pins)
    assert(line.length < 1100, s"all-rows line too long: ${line.length}")
    assert(line.contains("\"q01\":"), line.take(60))
    assert(line.contains("\"q77\":"))
    assert(line.contains(""""basis":"ratio_vs_pin""""))
    assert(line.contains(""""n":77"""))
    // ratio math: q02 median 0.02 / pin 0.5 = 0.04
    assert(line.contains("\"q02\":0.040"), line)
    // without pins: seconds basis, failures as -1
    val noPins = Bench.renderAllRowsLine(
      Seq("q01_a" -> 0.25, "q02_b" -> -1.0), Map.empty)
    assert(noPins.contains("\"q01\":0.250") && noPins.contains("\"q02\":-1.000"))
    assert(noPins.contains(""""basis":"sec""""))
  }

  test("all-rows line falls back to full names on short-name collision") {
    // "q01_warm" and "q01_cold" share the short key "q01" — short keys
    // would emit duplicate JSON keys (later shadows earlier in most
    // parsers) while "n" still said 2
    val line = Bench.renderAllRowsLine(
      Seq("q01_warm" -> 0.25, "q01_cold" -> 0.75), Map.empty)
    assert(line.contains("\"q01_warm\":0.250") &&
      line.contains("\"q01_cold\":0.750"), line)
    assert(!line.contains("\"q01\":"), line)
    assert(line.contains(""""n":2"""))
    // collision-free inventories keep the compact short keys
    val ok = Bench.renderAllRowsLine(
      Seq("q01_warm" -> 0.25, "q02_cold" -> 0.75), Map.empty)
    assert(ok.contains("\"q01\":0.250") && ok.contains("\"q02\":0.750"), ok)
  }

  test("seconds line: short keys, absolute medians, -1 for failures, fits tail capture") {
    val line = Bench.renderSecondsLine(
      Seq("q01_pricing" -> 0.251, "a01_bounded" -> 1.5, "v02_knn" -> -1.0))
    assert(line.contains("\"secs\":{"), line)
    assert(line.contains("\"q01\":0.251") && line.contains("\"a01\":1.500"), line)
    assert(line.contains("\"v02\":-1.000"), line)
    assert(line.contains(""""n":3"""), line)
    // a full 87-row inventory stays within the ~2k tail capture budget
    val big = (1 to 87).map(i => f"q$i%02d_long_query_name" -> i * 0.123)
    assert(Bench.renderSecondsLine(big).length < 1600)
    // short-name collision falls back to full names (no shadowed keys)
    val coll = Bench.renderSecondsLine(
      Seq("q01_warm" -> 0.25, "q01_cold" -> 0.75))
    assert(coll.contains("\"q01_warm\":0.250") &&
      coll.contains("\"q01_cold\":0.750") && !coll.contains("\"q01\":"), coll)
  }

  test("trailer agrees with the head fields") {
    val mixed = many.updated(3, "q04_name_of_query" -> -1.0)
    val line = Bench.renderLine(mixed, buildSec = 1.0, sfDir = "/x")
    def field(name: String): String = {
      val i = line.indexOf("\"" + name + "\":")
      assert(i >= 0, s"$name not in line")
      line.drop(i + name.length + 3).takeWhile(c => c != ',' && c != '}')
    }
    assert(field("value") == field("total2"))
    assert(field("valid") == field("valid2"))
    assert(line.contains("\"failed\":[\"q04_name_of_query\"]"))
    assert(line.contains("\"failed2\":[\"q04_name_of_query\"]"))
  }
}
