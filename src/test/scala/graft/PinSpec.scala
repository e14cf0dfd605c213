package graft

import org.apache.spark.sql.functions._

/** Reliable-checkpoint option (verdict r5 item 8): with
  * `sc.setCheckpointDir(...)` set, every iterative operator's lineage pin
  * switches from localCheckpoint (executor memory, dies with an executor)
  * to reliable checkpoint() (replicated store, survives executor loss) —
  * and results are bit-identical either way.
  */
class PinSpec extends SparkSuite {
  import spark.implicits._

  test("iterative operators are bit-identical under reliable checkpointing, and the store is used") {
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 6L), (3L, 7L))
      .toDF("a", "b")
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog dog"),
      (2L, "brown dog brown dog quick quick fox")).toDF("doc_id", "text")

    def run(): (Seq[(Long, Long)], Seq[(Long, Double)], Seq[String]) = (
      ext.Components.connectedComponents(edges, localSolveMaxEdges = 0)
        .as[(Long, Long)].collect().sorted.toSeq,
      ext.Components.pageRank(edges).as[(Long, Long, Double)]
        .collect().sortBy(_._1).map(r => (r._1, r._3)).toSeq,
      ext.TextStats.bpeLearnMerges(docs, nMerges = 3)
        .select(concat_ws("|", col("step"), col("merged_a"), col("merged_b"),
          col("total")))
        .as[String].collect().sorted.toSeq)

    val before = run() // localCheckpoint path (no checkpoint dir set)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    try {
      spark.sparkContext.setCheckpointDir(dir.toString)
      val after = run() // reliable checkpoint() path
      assert(after === before)
      // the reliable store was actually engaged: rdd checkpoint data landed
      def count(p: java.io.File): Int =
        if (p.isDirectory) p.listFiles.map(count).sum else 1
      assert(count(dir.toFile) > 1, s"no checkpoint data under $dir")
    } finally {
      org.apache.spark.CheckpointDirReset.clear(spark.sparkContext)
      import scala.util.Try
      def rm(p: java.io.File): Unit = {
        if (p.isDirectory) p.listFiles.foreach(rm); Try(p.delete()) }
      rm(dir.toFile)
    }
  }
}
