package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // reference formulation: split + window arithmetic through built-ins
  // (the literal shape the DuckDB oracle replays)
  private def reference(chunk: Int, stride: Int) = {
    val docs = fixture
    val w = split(col("text"), " ")
    val m = size(w)
    val nch = when(m <= chunk, lit(1))
      .otherwise(floor((m - chunk + stride - 1).cast("double") / stride)
        .cast("int") + 1)
    docs.select(col("doc_id"), w.as("_w"), nch.as("_n"))
      .select(col("doc_id"), col("_w"),
        posexplode(sequence(lit(0), col("_n") - 1)).as(Seq("_pos", "k")))
      .select(col("doc_id"), col("k").cast("int").as("chunk_id"),
        concat_ws(" ", slice(col("_w"), col("k") * stride + 1, lit(chunk)))
          .as("chunk_text"))
  }

  private def fixture = {
    val hostile = Seq(
      "",                                  // 1 empty token -> 1 chunk
      "one",                               // single word
      (1 to 64).map("w" + _).mkString(" "),  // exactly chunk tokens -> 1 chunk
      (1 to 65).map("w" + _).mkString(" "),  // one past -> 2 chunks
      (1 to 200).map("w" + _).mkString(" "), // several windows
      "a  b   c",                          // separator runs -> empty tokens
      " lead trail ",
      "café 😀 " + (1 to 100).map("é" + _).mkString(" ")) // multibyte
    // ids offset past the fixture corpus range so the union never collides
    hostile.zipWithIndex.map { case (t, i) => (1000000L + i, t) }
      .toDF("doc_id", "text")
      .union(spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
        .select(col("doc_id"), col("text")))
  }

  test("chunks equal the split-and-slice reference on hostile docs and the fixture corpus") {
    val got = Chunking.chunk(fixture, chunk = 64, stride = 48)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
    val want = reference(64, 48)
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("windows cover every token and stop at the first end-reaching window") {
    val c = 64; val s = 48
    val perDoc = Chunking.chunk(fixture, c, s)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nch"), max(col("chunk_id")).as("maxk"),
        sum(col("n_tok")).as("sum_tok"), max(col("n_tok")).as("max_tok"))
      .join(fixture.select(col("doc_id"),
        (length(col("text")) - length(translate(col("text"), " ", ""))
          + lit(1)).as("m")), "doc_id")
      .collect()
    perDoc.foreach { r =>
      val (nch, maxk, m) = (r.getAs[Long]("nch"), r.getAs[Int]("maxk"),
        r.getAs[Int]("m"))
      assert(maxk == nch - 1) // dense 0-based ids
      val expected = if (m <= c) 1L else ((m - c + s - 1) / s + 1).toLong
      assert(nch == expected, s"doc ${r.get(0)}: m=$m nch=$nch")
      assert(r.getAs[Int]("max_tok") <= c)
      // coverage: windows at stride s reach the last token, so summed
      // window widths are at least m (overlap re-counts)
      assert(r.getAs[Long]("sum_tok") >= m)
    }
  }

  test("stride > chunk samples gapped windows") {
    val got = Chunking.chunk(Seq((1L, (1 to 10).map("t" + _).mkString(" ")))
        .toDF("doc_id", "text"), chunk = 2, stride = 4)
      .orderBy(col("chunk_id"))
      .select(col("chunk_text")).as[String].collect()
    // starts 0,4,8: t1 t2 | t5 t6 | t9 t10
    assert(got.toSeq == Seq("t1 t2", "t5 t6", "t9 t10"))
  }

  test("span manifest rebuild identity: byte slices at spans == chunk text, bit-for-bit") {
    val f = fixture
    val chunks = Chunking.chunk(f, 64, 48)
      .select(col("doc_id"), col("chunk_id"),
        col("chunk_text"), col("n_tok").as("n_tok_text"))
    // FULL join: a window present on one side but not the other (count
    // drift between the two kernels) surfaces as a null and fails below
    val rows = Chunking.spans(f, 64, 48)
      .join(chunks, Seq("doc_id", "chunk_id"), "full")
      .join(f, "doc_id")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val chunkText = r.getAs[String]("chunk_text")
      assert(chunkText != null && !r.isNullAt(r.fieldIndex("start_byte")),
        s"window-count drift between spans and chunks at ${r.get(0)}")
      assert(r.getAs[Int]("n_tok") == r.getAs[Int]("n_tok_text"))
      val bytes = r.getAs[String]("text").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val start = r.getAs[Int]("start_byte")
      val len = r.getAs[Int]("len_bytes")
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, start, start + len),
        chunkText.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
        s"doc ${r.get(0)} chunk ${r.get(1)}: slice [$start,+$len) != chunk text")
    }
  }

  test("spans: explicit offsets on a separator-run doc") {
    // "a  b   c" tokens: a | "" | b | "" | "" | c at byte starts 0,2,3,5,6,7
    val got = Chunking.spans(Seq((1L, "a  b   c")).toDF("doc_id", "text"),
        chunk = 2, stride = 2)
      .orderBy(col("chunk_id"))
      .select(col("start_tok"), col("n_tok"), col("start_byte"), col("len_bytes"))
      .as[(Int, Int, Int, Int)].collect()
    // windows: "a "+empty [0,2), "b "+empty [3,5), empty+" c" -> [6,8)
    assert(got.toSeq == Seq((0, 2, 0, 2), (2, 2, 3, 2), (4, 2, 6, 2)))
  }

  test("span manifest is map-side only and metadata-sized") {
    val spans = Chunking.spans(
      spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet"), 64, 48)
    import org.apache.spark.sql.execution.exchange.Exchange
    assert(spans.queryExecution.executedPlan
      .collect { case e: Exchange => e }.isEmpty)
    // no string column survives into the manifest output
    assert(spans.schema.fields.forall(_.dataType != org.apache.spark.sql.types.StringType))
  }

  test("chunking is map-side only: no exchange in the plan") {
    val plan = Chunking.chunk(
        spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet"), 64, 48)
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.Exchange
    assert(plan.collect { case e: Exchange => e }.isEmpty, plan.toString)
  }
}
