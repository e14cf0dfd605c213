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
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        val shufR = (m.shuffleReadMetrics.remoteBytesRead +
          m.shuffleReadMetrics.localBytesRead) / 1048576
        println(f"STAGE ${s.stageInfo.stageId}%3d tasks=${s.stageInfo.numTasks}%4d " +
          f"cpuMs=${m.executorRunTime}%8d " +
          f"shufWriteMB=${m.shuffleWriteMetrics.bytesWritten / 1048576}%5d " +
          f"shufReadMB=$shufR%5d spillMB=${m.diskBytesSpilled / 1048576}%5d " +
          s"| ${s.stageInfo.name.linesIterator.next().take(80)}")
      }
    })
    val df = SparkEntry.queries(name)(spark, sfDir)
    println("=== PLAN ===")
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    val t0 = System.nanoTime
    df.write.mode("overwrite").format("noop").save()
    println(f"=== WALL ${(System.nanoTime - t0) / 1e9}%.1f s ===")
    spark.stop()
  }
}
