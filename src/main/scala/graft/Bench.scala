package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is fully materialized through the `noop`
  * sink (a bare `count()` would let Catalyst prune most of the plan and time
  * nothing). One untimed warmup query first so JIT/codegen/session init cost
  * isn't attributed to the first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    // warmup: touch every input table once (JIT + codegen + FS cache), so
    // per-query timings measure compute, not first-touch file reads
    // (q02: customer+orders, q09: supplier+nation, q03: region, q21: part)
    for (w <- Seq("q01_pricing_rollup", "q02_cust_orders", "q09_nation_revenue",
                  "q03_region_rollup", "q21_yolo_norm", "q11_sessionize",
                  "q13_quality_features", "q19_cosine_topk"))
      try run(w) catch { case _: Throwable => () }

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      val ok = try { run(name); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
