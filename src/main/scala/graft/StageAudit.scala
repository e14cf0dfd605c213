package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan + per-stage cost audit for one registered query — the tool behind
  * the NOTES scale audits (q151/q206-class attributions): prints the
  * FORMATTED plan, then one line per completed stage with task count,
  * executor CPU, shuffle read/write and spill, then the wall time. Run:
  *
  * {{{
  *   sbt "runMain graft.StageAudit q206_repeated_spans /tmp/graft-sf1-synth"
  * }}}
  *
  * Stage lines attribute super-linear scaling to a concrete exchange
  * (gram shuffle vs window sort vs verify join) instead of guessing from
  * wall clock alone.
  */
object StageAudit {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // what-if knob: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" to audit a config
    // hypothesis (e.g. AQE coalescing) without touching the session code
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(
      _.split(';').filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v)
          case _ => sys.error(s"SPARK_GRAFT_EXTRA_CONF segment '$kv' is " +
            "not k=v — fix the env var (';'-separated k=v pairs)")
        }
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        val shufR = (m.shuffleReadMetrics.remoteBytesRead +
          m.shuffleReadMetrics.localBytesRead) / 1048576
        // runMs = task run (wall) time summed over tasks; cpuMs = actual
        // executor CPU (executorCpuTime is ns) — a stage with high runMs
        // but low cpuMs is waiting (IO/scheduler), not computing
        println(f"STAGE ${s.stageInfo.stageId}%3d tasks=${s.stageInfo.numTasks}%4d " +
          f"runMs=${m.executorRunTime}%8d cpuMs=${m.executorCpuTime / 1000000}%8d " +
          f"shufWriteMB=${m.shuffleWriteMetrics.bytesWritten / 1048576}%5d " +
          f"shufReadMB=$shufR%5d spillMB=${m.diskBytesSpilled / 1048576}%5d " +
          s"| ${s.stageInfo.name.linesIterator.next().take(80)}")
      }
    })
    // SPARK_GRAFT_CACHE=1 reproduces Bench's hot-table setup — cached
    // inputs change InMemoryRelation stats and can flip join strategies,
    // so an audit of a Bench regression must run under the same cache
    if (sys.env.get("SPARK_GRAFT_CACHE").contains("1"))
      Seq(Tables.lineitem _, Tables.orders _, Tables.customer _,
        Tables.part _, Tables.supplier _, Tables.nation _, Tables.region _,
        Tables.documents _, Tables.embeddings _, Tables.events _)
        .foreach(t => t(spark, sfDir).cache().count())
    val df = SparkEntry.queries(name)(spark, sfDir)
    println("=== PLAN ===")
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    val t0 = System.nanoTime
    df.write.mode("overwrite").format("noop").save()
    println(f"=== WALL ${(System.nanoTime - t0) / 1e9}%.1f s ===")
    spark.stop()
  }
}
