package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries repeatedly (and optionally print the
  * executed plan) inside one warmed JVM — the per-query feedback loop for
  * plan tuning that Bench (one shot per query) can't give.
  *
  * Usage: runMain graft.Probe [-explain] <query> [query ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4),
  *      SPARK_GRAFT_REPS (default 3).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("-explain")
    val names = args.filterNot(_.startsWith("-"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq(Tables.lineitem _, Tables.orders _, Tables.customer _, Tables.part _,
      Tables.supplier _, Tables.nation _, Tables.region _, Tables.documents _,
      Tables.embeddings _, Tables.events _)
      .foreach(t => t(spark, sfDir).cache().count())
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (explain) {
        df.write.mode("overwrite").format("noop").save()
        println(s"==== $name executed plan ====")
        println(df.queryExecution.executedPlan.toString.take(8000))
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-24s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
