package graft

/** Harness-contract checks: every query runs and returns rows at sf0.001,
  * oracle entries refer to registered queries, and the flagship smoke works.
  */
class QueriesSpec extends SparkSuite {

  test("entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracles are in exact 1:1 correspondence (no rows-only drift)") {
    // as of round 2 EVERY query is oracled; a new query without an oracle
    // (or a stale oracle for a removed query) should fail loudly here, not
    // silently downgrade the driver's check to rows-only
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      s"mismatch: only-in-queries=${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}, " +
        s"only-in-oracles=${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
  }

  test("Tables.events fails loudly when the ns-as-long builder conf is absent") {
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try {
      val e = intercept[IllegalArgumentException](Tables.events(spark, sf))
      assert(e.getMessage.contains("nanosAsLong"))
    } finally spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType.typeName == "long")
    assert(df.count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      // q06 (customers without orders) is legitimately empty at tiny SF
      if (name == "q06_no_orders") assert(df.count() >= 0)
      else assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
