package graft

class SparkEntrySpec extends SparkSpec {

  test("entry() returns the flagship aggregation with rows > 0") {
    val df = SparkEntry.entry(spark)
    df.columns.toSeq shouldBe Seq("l_suppkey", "total_amount", "total_quantity")
    df.count() should be > 0L
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    missing shouldBe empty
  }

  test("a healthy share of queries have DuckDB oracles (non-SQL ops are the exception)") {
    val withOracle = SparkEntry.queries.keySet & SparkEntry.oracleSql.keySet
    withOracle.size should be >= 30
    (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).size should be <= 6
  }
}
