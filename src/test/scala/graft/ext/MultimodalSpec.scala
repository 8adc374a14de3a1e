package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fakeFeature is deterministic and shape-stable (the stub contract)") {
    val f1 = Multimodal.fakeFeature("hello".getBytes("UTF-8"))
    val f2 = Multimodal.fakeFeature("hello".getBytes("UTF-8"))
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 16)
    assert(f1(0) == 'h'.toInt / 255.0f)
    assert(Multimodal.fakeFeature(Array.emptyByteArray).toSeq == Seq.fill(16)(0.0f))
  }

  test("decodeFeatures: typed mapPartitions plumbing preserves rows + schema") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(docs))
    assert(feats.columns.toSeq ==
      Seq("mediaId", "modality", "nBytes", "features"))
    assert(feats.count() == docs.count())
    val r = feats.orderBy("mediaId").head()
    assert(r.getAs[scala.collection.Seq[Float]]("features").length == 16)
    assert(r.getAs[Int]("nBytes") > 0)
  }

  test("mediaTable: payload bytes match the source text length") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val bad = Multimodal.mediaTable(docs)
      .join(docs, col("media_id") === col("doc_id"))
      .filter(octet_length(col("payload")) =!= length(col("text")))
      .count()
    assert(bad == 0) // fixture text is ascii: 1 byte per char
  }

  test("binaryObjects reads opaque files with path + length + content") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bin")
    java.nio.file.Files.write(tmp.resolve("a.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(tmp.resolve("b.bin"), Array[Byte](4, 5))
    val df = Multimodal.binaryObjects(spark, tmp.toString)
    assert(df.count() == 2)
    val lens = df.select("length").collect().map(_.getLong(0)).sorted
    assert(lens.toSeq == Seq(2L, 3L))
  }
}
