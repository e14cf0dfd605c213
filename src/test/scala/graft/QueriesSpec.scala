package graft

import org.apache.spark.sql.types._

/** Harness-contract checks: every query runs and returns rows at sf0.001,
  * oracle entries refer to registered queries, no hashed output carries a
  * DECIMAL column, and the flagship smoke works.
  */
class QueriesSpec extends SparkSuite {

  /** Paths of every DecimalType inside a (possibly nested) data type. The
    * driver's hasher normalizes decimal values differently across
    * duckdb/pyarrow versions (round-6 adjudication: the ONLY four red rows
    * were exactly the four queries emitting DECIMAL output columns), so the
    * standing rule is: hashed outputs are BIGINT / DOUBLE / STRING /
    * BOOLEAN (or arrays/structs thereof) only — fixed-point scaled BIGINT
    * where exactness matters.
    */
  private def decimalPaths(dt: DataType, path: String): Seq[String] =
    dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.toSeq.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => decimalPaths(a.elementType, s"$path[]")
      case m: MapType =>
        decimalPaths(m.keyType, s"$path<key>") ++
          decimalPaths(m.valueType, s"$path<value>")
      case _ => Nil
    }

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
    test(s"$name runs, returns rows at sf0.001, and emits no DECIMAL column") {
      val df = fn(spark, sf)
      val bad = df.schema.fields.toSeq
        .flatMap(f => decimalPaths(f.dataType, f.name))
      assert(bad.isEmpty,
        s"$name hashed output carries DECIMAL at ${bad.mkString(", ")} — " +
          "driver-hasher decimal normalization is version-sensitive " +
          "(round 6); emit scaled BIGINT or DOUBLE instead")
      // q06 (customers without orders) is legitimately empty at tiny SF
      if (name == "q06_no_orders") assert(df.count() >= 0)
      else assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
