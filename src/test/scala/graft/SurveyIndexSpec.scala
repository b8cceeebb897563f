package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** The mechanical id-index invariant the round-11 verdict caught
  * drifting (d36 shipped green but undocumented): SURVEY.md §2E must
  * list EXACTLY the ids in `SparkEntry.queries` — the contract that
  * makes the survey's coverage counts verifiable instead of
  * aspirational. This spec enforces it at `sbt test` time, so a new
  * query id cannot merge without its §2E row (and a removed query
  * cannot leave a stale row behind).
  */
class SurveyIndexSpec extends AnyFunSuite {

  private def surveyIds(): Set[String] = {
    val path = Paths.get("SURVEY.md")
    assert(Files.exists(path), "SURVEY.md not found at the repo root")
    val text = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
    // §2E is the table between its header and the next section header
    val start = text.indexOf("### 2E.")
    assert(start >= 0, "SURVEY.md has no '### 2E.' section")
    val rest = text.substring(start)
    val end = rest.indexOf("\n## ")
    val section = if (end >= 0) rest.substring(0, end) else rest
    val row = """(?m)^\| `([a-z][a-z0-9_]+)`(?: \*\(envelope\)\*)? \|""".r
    row.findAllMatchIn(section).map(_.group(1)).toSet
  }

  test("SURVEY 2E ids == SparkEntry.queries keys, mechanically") {
    val survey = surveyIds()
    val code = SparkEntry.queries.keySet
    val undocumented = (code -- survey).toSeq.sorted
    val stale = (survey -- code).toSeq.sorted
    assert(undocumented.isEmpty,
      s"queries implemented but missing a SURVEY 2E row: " +
        s"${undocumented.mkString(", ")}")
    assert(stale.isEmpty,
      s"SURVEY 2E rows with no implementing query: ${stale.mkString(", ")}")
  }

  test("every oracle-less query is marked (envelope) in SURVEY 2E") {
    val path = Paths.get("SURVEY.md")
    val text = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
    val start = text.indexOf("### 2E.")
    val rest = text.substring(start)
    val end = rest.indexOf("\n## ")
    val section = if (end >= 0) rest.substring(0, end) else rest
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    noOracle.toSeq.sorted.foreach { id =>
      val row = section.linesIterator.find(_.startsWith(s"| `$id`"))
      assert(row.isDefined, s"no 2E row for $id")
      assert(row.get.contains("envelope"),
        s"$id has no DuckDB oracle but its 2E row is not marked (envelope)")
    }
  }
}
