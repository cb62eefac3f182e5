package graft

/** Every SparkEntry query must run at sf0.001 and (except candidate-pair
  * mining, which may legitimately find nothing at tiny scale) return rows.
  * Catches runtime breakage in any registered query, and enforces the
  * queries ↔ oracleSql contract invariants.
  */
class QueriesSmokeSpec extends SparkSpec {

  // legitimately empty at tiny scale: set difference / intersection /
  // anti-join results
  private val mayBeEmpty = Set("q_set_ops", "q_anti_join", "q_intersect")

  test("queries and oracleSql cover each other exactly (every op is proven)") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
    val unproven = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unproven.isEmpty,
      s"queries without a DuckDB oracle (add one — 'runs' is not 'proven'): $unproven")
  }

  test("every query runs on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sf0001).count()
        if (n == 0 && !mayBeEmpty(name)) Some(s"$name: 0 rows") else None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}")
      }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("entry() returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
