package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** SURVEY.md §2 is the coverage contract: every operator marked
  * implemented ([x] or [s]) must exist in SparkEntry.queries, and
  * every [x] must also carry an oracle. Keeps the inventory honest. */
class SurveyConsistencySpec extends AnyFunSuite {

  private val rows: Seq[(String, String)] = {
    val lines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get("/root/repo/SURVEY.md"))
      .asScala
    val row = raw"\|\s*\[([xs])\]\s*\|\s*`([a-z0-9_]+)`".r
    lines.flatMap(l => row.findFirstMatchIn(l)
      .map(m => (m.group(1), m.group(2)))).toSeq
  }

  test("SURVEY §2 lists implemented operators") {
    assert(rows.nonEmpty, "no [x]/[s] rows parsed from SURVEY.md")
    assert(rows.size > 40, s"only ${rows.size} inventory rows parsed")
  }

  test("every [x]/[s] inventory key is a registered query") {
    val q = SparkEntry.queries.keySet
    val missing = rows.map(_._2).filterNot(q)
      .filterNot(_ == "streaming") // streaming twins are spec-level
    assert(missing.isEmpty,
      s"inventory keys without a registered query: $missing")
  }

  test("every [x] inventory key has an oracle") {
    val o = SparkEntry.oracleSql.keySet
    val missing = rows.collect { case ("x", k) => k }.filterNot(o)
    assert(missing.isEmpty, s"[x] keys without oracle SQL: $missing")
  }

  test("every registered query appears in the SURVEY inventory") {
    val inv = rows.map(_._2).toSet
    val missing = SparkEntry.queries.keySet.filterNot(inv)
    assert(missing.isEmpty, s"queries missing from SURVEY §2: $missing")
  }
}
