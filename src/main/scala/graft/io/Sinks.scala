package graft.io

import org.apache.spark.sql.DataFrame

/** Output sinks sized for scale (the generalization of S9/S11's per-file
  * writes, which are a small-files antipattern beyond a few thousand rows).
  *
  * The two knobs that matter at 100 TB:
  *  - partition layout: `partitionBy` columns become directory partitions →
  *    partition pruning on read (split=train/val, date, language, …);
  *  - file sizing: `maxRecordsPerFile` bounds the large end; a pre-write
  *    `repartition` on the partition columns bounds the small end (one
  *    shuffle, removes the files×tasks explosion where every task writes a
  *    sliver into every partition).
  */
object Sinks {

  /** Partitioned parquet with bounded file sizes. */
  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String],
                              maxRecordsPerFile: Long = 1000000L): Unit = {
    val prepared =
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(df.col): _*)
      else df
    prepared.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Bucketed table write: rows are hash-bucketed (and optionally sorted)
    * by the join/aggregation key at write time, so subsequent equi-joins and
    * groupBys on that key read co-located, pre-sorted buckets and skip the
    * shuffle entirely — the standard answer to "this 100 TB fact table is
    * joined on the same key by every job". Requires a catalog table
    * (`saveAsTable`); bucket metadata lives in the catalog.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }

  /** The converter's dataset sink (§3.1): label lines partitioned by split.
    * One directory per split, parquet with (stem, lines) — the scalable
    * analog of one-txt-per-image; `LabelsIO.writePerImage` remains for
    * byte-parity tooling.
    */
  def writeDataset(ds: DataFrame, path: String): Unit =
    writePartitionedParquet(ds, path, Seq("split"))
}
