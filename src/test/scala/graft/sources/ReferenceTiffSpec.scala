package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** TIFF readers validated against the reference repo's own bundled
  * fixtures (externally-produced files): test/data/tiffs (single-page
  * uint16, id×channel layout — the S2/S3 path) and test/data/images
  * (8-page float32 multiframe — the S4 path). */
class ReferenceTiffSpec extends SparkSpec {

  private val tiffDir = "/root/reference/test/data/tiffs"
  private val multiDir = "/root/reference/test/data/images"

  test("S2/S3: reference id-x-channel tiffs scan and stack") {
    assume(Files.exists(Paths.get(tiffDir)))
    val meta = Tiff.metaFromDirectory(spark, tiffDir,
      ".*test(?<id>[0-9]+)_(?<channel>[0-9]+)\\.tiff")
    val events = Tiff.loadPixels(meta, Seq("1", "2")).collect().sortBy(_.meta("id"))
    assert(events.length == 2)
    events.foreach { e =>
      assert(e.channels == 2 && e.height == 400 && e.width == 400)
      assert(e.pixels.exists(_ > 0), "u16 pixel data must be non-trivial")
      // uint16 range
      assert(e.pixels.forall(v => v >= 0 && v <= 65535))
    }
    // channel planes differ (distinct files)
    val e0 = events.head
    assert(!e0.plane(0).sameElements(e0.plane(1)))
  }

  test("S4: reference float32 multiframe tiffs load page-per-channel") {
    assume(Files.exists(Paths.get(multiDir)))
    val events = Tiff.loadMultiframeDirectory(spark, multiDir).collect()
    assert(events.length == 11)
    events.foreach { e =>
      assert(e.channels == 8, s"${e.path}: ${e.channels} pages")
      assert(e.height > 0 && e.width > 0)
      // float32 intensity data: finite, non-constant
      assert(e.pixels.forall(v => !v.isNaN && !v.isInfinite))
      assert(e.pixels.distinct.length > 10)
      // group = FULL parent path (multiframe_tiff.py:69 str(p.parent))
      assert(e.group == "/root/reference/test/data/images")
    }
  }
}
