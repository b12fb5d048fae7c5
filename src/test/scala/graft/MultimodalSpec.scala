package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload + metadata struct schema, the
  * partition-local typed feature pass, and stub shape contracts
  * (frame count, fixed-size thumb).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world this is a binary payload stand-in", "en", "src0", 45L),
    (2L, "tiny", "en", "src1", 4L),
    (3L, "", "en", "src2", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("asMedia: binary column + typed metadata struct") {
    val m = Multimodal.asMedia(docs)
    assert(m.schema("payload").dataType.typeName === "binary")
    assert(m.schema("media_meta").dataType.typeName === "struct")
    val meta = m.filter($"doc_id" === 1L).select("media_meta.n_bytes", "media_meta.format")
      .head()
    assert(meta.getInt(0) === 45 && meta.getString(1) === "fake/utf8")
  }

  test("extractFeatures: frame math + fixed-size thumb via mapPartitions") {
    val f = Multimodal.extractFeatures(Multimodal.asMedia(docs), frameSize = 16)
      .orderBy("doc_id").collect()
    assert(f(0).getAs[Long]("n_frames") === 3) // ceil(46/16)
    assert(f(0).getAs[Array[Byte]]("frame0").length === 16)
    assert(f(0).getAs[Array[Byte]]("thumb").length === 8)
    assert(f(1).getAs[Long]("n_frames") === 1)
    assert(f(1).getAs[Array[Byte]]("frame0").length === 4)
    assert(f(2).getAs[Long]("n_frames") === 0) // empty payload
    assert(f(2).getAs[Array[Byte]]("thumb").length === 0)
  }
}
