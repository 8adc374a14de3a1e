package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.model.ExtractionMethod

/** SURVEY §5.3 / §7.4 risk 1: the watermark exactly-once property.
  *
  * For ANY strictly-increasing ext_col sequence split into arbitrary run
  * boundaries, the incremental lifecycle must read every row exactly once:
  * the first run (no watermark) is a full read recording the probed max;
  * every later run reads the half-open interval (previous max, new max].
  * A recording TableSource captures exactly which reads the algorithm
  * requests — the intervals must tile the timeline with no gap/overlap.
  */
class WatermarkPropertySpec extends AnyFunSuite {

  private final class RecordingSource(var maxTs: Option[Timestamp])
      extends TableSource {
    var fullReads = 0
    val intervals = scala.collection.mutable.ArrayBuffer[(Timestamp, Timestamp)]()
    def probeMax(extCol: String): Option[Timestamp] = maxTs
    def readFull(): DataFrame = { fullReads += 1; null }
    def readInterval(extCol: String, last: Timestamp, max: Timestamp): DataFrame = {
      intervals += ((last, max)); null
    }
  }

  private def ts(epochSec: Long) = new Timestamp(epochSec * 1000L)

  test("incremental runs tile the timeline: no row read twice, none skipped") {
    // run boundaries = a strictly increasing list of source high watermarks
    val gen = Gen.nonEmptyListOf(Gen.choose(1L, 1000000L)).map(_.distinct.sorted)
    val prop = Prop.forAll(gen) { cuts: List[Long] =>
      val src = new RecordingSource(None)
      var watermark: Option[Timestamp] = None
      cuts.foreach { c =>
        src.maxTs = Some(ts(c))
        val e = IncrementalExtractor.extract(
          src, ExtractionMethod.Incremental, Some("ts"), watermark)
        watermark = e.newWatermark.orElse(watermark)
      }
      val firstRunFull = src.fullReads == 1
      val intervalsChain = src.intervals.toList == cuts.sliding(2).toList
        .collect { case List(a, b) => (ts(a), ts(b)) }
      val watermarkIsLastMax = watermark.contains(ts(cuts.last))
      firstRunFull && intervalsChain && watermarkIsLastMax
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("a run with no new rows requests the empty interval (last, last]") {
    val src = new RecordingSource(Some(ts(100)))
    val e = IncrementalExtractor.extract(
      src, ExtractionMethod.Incremental, Some("ts"), Some(ts(100)))
    assert(src.intervals.toList == List((ts(100), ts(100)))) // empty by (l, u]
    assert(e.newWatermark.contains(ts(100)))
  }

  test("empty source table on first incremental run: full read, no watermark") {
    val src = new RecordingSource(None)
    val e = IncrementalExtractor.extract(
      src, ExtractionMethod.Incremental, Some("ts"), None)
    assert(src.fullReads == 1)
    assert(e.newWatermark.isEmpty)
  }

  test("full method never probes and records a NULL watermark") {
    val src = new RecordingSource(Some(ts(42)))
    val e = IncrementalExtractor.extract(
      src, ExtractionMethod.Full, None, None)
    assert(e.newWatermark.isEmpty) // dataIngestionUtils.py:43,193-194,247
    assert(src.intervals.isEmpty && src.fullReads == 1)
  }

  test("incremental without ext_col is rejected") {
    val src = new RecordingSource(None)
    assertThrows[IllegalArgumentException](
      IncrementalExtractor.extract(src, ExtractionMethod.Incremental, None, None))
  }
}
