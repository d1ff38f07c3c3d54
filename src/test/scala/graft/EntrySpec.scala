package graft

/** The driver's smoke contract: entry() must return rows on sf0.001,
  * and every declared oracle key must have a matching query. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on the smoke scale factor") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    // flagship shape: day, event_type, n, sum_value, pct_of_day
    assert(rows.head.schema.fieldNames.contains("pct_of_day"))
  }

  test("every oracle key has a query; names are unique") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(os.keySet.subsetOf(qs.keySet),
      s"oracles without queries: ${os.keySet.diff(qs.keySet)}")
    assert(queries.Suite.all.map(_.name).distinct.size ==
      queries.Suite.all.size)
  }
}
