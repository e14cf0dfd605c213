package graft

import graft.io.Sinks
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: an equi-join between two tables bucketed on
  * the join key runs with NO shuffle exchange — the physical property the
  * 100 TB fact-table design relies on.
  */
class BucketingSpec extends SparkSuite {

  test("join between bucket-aligned tables has no shuffle Exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the shuffle question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Sinks.writeBucketed(
        Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
        "li_bucketed", "l_orderkey", 8, sortCol = Some("l_orderkey"))
      Sinks.writeBucketed(
        Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
        "o_bucketed", "o_orderkey", 8, sortCol = Some("o_orderkey"))

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      // and the result matches the plain-join answer
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("groupBy on the bucket key of a bucketed table avoids the shuffle") {
    try {
      Sinks.writeBucketed(
        Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
        "li_bucketed2", "l_orderkey", 8)
      val agg = spark.table("li_bucketed2")
        .groupBy("l_orderkey").agg(sum("l_quantity"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed agg still shuffles:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed2")
    }
  }

  test("dynamic partition overwrite touches only the landed partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("dpo")
    dir.toFile.deleteOnExit()
    val p = dir.toString
    io.Sinks.overwritePartitions(
      Seq((1L, "d1"), (2L, "d1"), (3L, "d2")).toDF("id", "day"), p,
      Seq("day"))
    // re-land ONLY d2 with different rows; d1 must survive untouched
    io.Sinks.overwritePartitions(
      Seq((9L, "d2")).toDF("id", "day"), p, Seq("day"))
    val back = spark.read.parquet(p)
      .select(col("id"), col("day")).as[(Long, String)].collect().toSet
    assert(back === Set((1L, "d1"), (2L, "d1"), (9L, "d2")))
    // contrast: a STATIC overwrite of d2 would have dropped d1 entirely
  }
}
