package graft

import org.apache.spark.sql.types._

/** Testdata schema-drift sentinel.
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * changed physical encodings once (round 8: `events.ts` went from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS), silently breaking 32 queries).
  * This spec pins the canonical column set and the ACCEPTABLE logical types
  * per table, so the next regeneration fails here with a message naming the
  * drifted column instead of as dozens of opaque query errors.
  *
  * Timestamp-bearing columns accept any of {LongType (legacy nanos-as-long),
  * TimestampType, TimestampNTZType} — the engine's loaders are required to
  * be encoding-adaptive across exactly that set (see [[Tables.events]]).
  */
class TestdataSchemaSpec extends SparkSuite {

  private val ts: Set[DataType] = Set(LongType, TimestampType, TimestampNTZType)
  private def one(t: DataType): Set[DataType] = Set(t)
  // generators flip between int32/int64 for key columns; both are fine
  private val int: Set[DataType] = Set(IntegerType, LongType)

  private val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> int, "r_name" -> one(StringType)),
    "nation" -> Seq("n_nationkey" -> int, "n_name" -> one(StringType),
      "n_regionkey" -> int),
    "customer" -> Seq("c_custkey" -> int, "c_name" -> one(StringType),
      "c_nationkey" -> int, "c_acctbal" -> one(DoubleType),
      "c_mktsegment" -> one(StringType)),
    "supplier" -> Seq("s_suppkey" -> int, "s_name" -> one(StringType),
      "s_nationkey" -> int, "s_acctbal" -> one(DoubleType)),
    "part" -> Seq("p_partkey" -> int, "p_name" -> one(StringType),
      "p_brand" -> one(StringType), "p_type" -> one(StringType),
      "p_size" -> int, "p_retailprice" -> one(DoubleType)),
    "orders" -> Seq("o_orderkey" -> int, "o_custkey" -> int,
      "o_orderstatus" -> one(StringType), "o_totalprice" -> one(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> one(StringType)),
    "lineitem" -> Seq("l_orderkey" -> int, "l_partkey" -> int,
      "l_suppkey" -> int, "l_linenumber" -> int,
      "l_quantity" -> one(DoubleType), "l_extendedprice" -> one(DoubleType),
      "l_discount" -> one(DoubleType), "l_tax" -> one(DoubleType),
      "l_returnflag" -> one(StringType), "l_linestatus" -> one(StringType),
      "l_shipdate" -> ts),
    "events" -> Seq("event_id" -> int, "ts" -> ts, "user_id" -> int,
      "event_type" -> one(StringType), "value" -> one(DoubleType),
      "props" -> one(StringType)),
    "documents" -> Seq("doc_id" -> int, "text" -> one(StringType),
      "lang" -> one(StringType), "source" -> one(StringType),
      "n_chars" -> int),
    "embeddings" -> Seq("vec_id" -> int,
      "embedding" -> Set[DataType](ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false),
        ArrayType(DoubleType, containsNull = true),
        ArrayType(DoubleType, containsNull = false)),
      "label" -> int)
  )

  // all three generated sizes: a regeneration can drift one SF and not
  // another (the footers are written per directory)
  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"testdata schema sentinel: $table") {
      for (dir <- sfDirs) {
        val schema = spark.read.parquet(s"$dir/$table.parquet").schema
        val actualNames = schema.fields.map(_.name).toSeq
        val expectedNames = cols.map(_._1)
        assert(actualNames == expectedNames,
          s"$dir/$table column drift: expected $expectedNames, " +
            s"testdata has $actualNames")
        for ((name, ok) <- cols) {
          val actual = schema(name).dataType
          assert(ok.contains(actual),
            s"$dir/$table.$name type drift: testdata has $actual, engine " +
              s"accepts ${ok.mkString("{", ", ", "}")} — if the generator " +
              "changed encoding again, teach the loader (see Tables.events), " +
              "then widen this sentinel")
        }
      }
    }
  }
}
