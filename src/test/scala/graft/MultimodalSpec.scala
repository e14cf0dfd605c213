package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: schema, batch decode, determinism,
  * null/empty handling, frame sampling. (Decode itself is a documented stub.)
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val media =
    Multimodal.mediaFromDocuments(Tables.documents(spark, sf)).cache()

  test("media table carries binary content + typed metadata") {
    assert(media.schema("content").dataType.typeName == "binary")
    val r = media.select("media_id", "media_type", "meta.source").limit(1).collect()
    assert(r.nonEmpty)
  }

  test("decodeFeatures is deterministic and total over the corpus") {
    val f1 = Multimodal.decodeFeatures(media)
      .select("media_id", "checksum").as[(Long, Long)].collect().toMap
    val f2 = Multimodal.decodeFeatures(media)
      .select("media_id", "checksum").as[(Long, Long)].collect().toMap
    assert(f1 == f2)
    assert(f1.size == media.count())
  }

  test("decode output shape: n_bytes matches content, 8-dim feature") {
    val joined = Multimodal.decodeFeatures(media)
      .join(media.select(col("media_id"), length(col("content")).as("len")), "media_id")
    assert(joined.filter(col("n_bytes") =!= col("len")).count() == 0)
    val Array(featLen) = Multimodal.decodeFeatures(media.limit(1))
      .select(size(col("feature"))).as[Int].collect()
    assert(featLen == 8)
  }

  test("empty binary decodes without error") {
    val df = Seq((1L, "image/x", Array.emptyByteArray)).toDF("media_id", "media_type", "content")
    val r = Multimodal.decodeFeatures(df).collect()(0)
    assert(r.getAs[Long]("n_bytes") == 0)
    assert(r.getAs[Int]("width") == 16 && r.getAs[Int]("height") == 16)
  }

  test("sampleFrames explodes k deterministic offsets per row") {
    val df = Seq((1L, "video/x", Array.fill[Byte](100)(7))).toDF("media_id", "media_type", "content")
    val r = Multimodal.sampleFrames(df, k = 4)
      .select("frame_no", "byte_offset").as[(Int, Long)].collect().toSeq
    assert(r == Seq((0, 0L), (1, 25L), (2, 50L), (3, 75L)))
  }
}
