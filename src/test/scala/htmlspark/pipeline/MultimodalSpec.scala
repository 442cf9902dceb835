package htmlspark.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Magic-byte sniffing against the generator-kind oracle (no sniffer on the
  * expected side) + frame-sampling fan-out bounds. */
class MultimodalSpec extends AnyFunSuite {

  test("sniffMediaType recovers the generator kind for 2000 blobs") {
    (0L until 2000L).foreach { i =>
      val got = MultimodalOps.sniffMediaType(PagesGen.mediaBlob(i))
      val want = PagesGen.mediaTypeName(PagesGen.mediaKind(i))
      assert(got == want, s"blob $i: sniffed $got, want $want")
    }
    // all 7 kinds represented in the range
    val kinds = (0L until 2000L).map(PagesGen.mediaKind).toSet
    assert(kinds == (0 to 6).toSet)
  }

  test("frame sampling fan-out is bounded and offsets are in range") {
    (0L until 200L).foreach { i =>
      val b = PagesGen.mediaBlob(i)
      val frames = math.min(16, math.max(b.length / 512, 1))
      assert(frames >= 1 && frames <= 16)
    }
  }
}
