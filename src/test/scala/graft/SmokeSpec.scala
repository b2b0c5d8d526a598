package graft

/** t1 smoke (SURVEY.md §5.2): every registered query runs end-to-end on
  * sf0.001 and yields rows. Schema/value correctness is the DuckDB
  * oracle's job (Verify + tools/oracle_check.py); this gate catches
  * runtime regressions (analysis errors, bad casts, empty results).
  */
class SmokeSpec extends SparkTestBase {

  // Queries that may legitimately return 0 rows at tiny scale.
  private val mayBeEmpty = Set("q02_filter_pushdown", "q05_anti_join")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      if (mayBeEmpty(name)) assert(n >= 0)
      else assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }
}
