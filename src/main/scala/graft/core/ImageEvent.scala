package graft.core

/** The engine's unit of data: one imaging event (a field of view, or a
  * detected cell after segmentation). Mirrors the reference's free-form
  * event dict (SURVEY.md §1.1; key inventory from loading/tiff.py:141,
  * masking/__init__.py:83-242, segmentation/__init__.py:70-119) as a
  * typed Spark row.
  *
  * Ragged images: `pixels` is the (channels × height × width) image
  * flattened row-major — the same trick the reference's zarr layout
  * uses (docs/source/input.rst) — so every kernel addresses
  * (c, r, col) via stride math and H×W can vary per record.
  *
  * Tombstone contract: a record that fails a filter is NOT dropped —
  * `pixels`/`mask` become null and the metadata husk flows to the
  * output (utils/util.py:195-208 `copy_without`/`@check`). Every op
  * must pass tombstones through untouched; use [[ImageEvent.whenPixels]].
  *
  * `mask` holds per-channel labels (0 = background; masking methods
  * emit 0/1, segmentation emits 1..n) flattened C·H·W. `combinedMask`
  * is the H·W union mask. `bbox*` = -1 until computed.
  */
case class ImageEvent(
    path: String,
    idx: Long,
    group: String,
    meta: Map[String, String],
    channels: Int,
    height: Int,
    width: Int,
    pixels: Array[Float],
    maskFilter: Array[Boolean],
    mask: Array[Int],
    regions: Array[Int],
    combinedMask: Array[Int],
    background: Array[Double],
    combinedBackground: Array[Double],
    bboxMinr: Int,
    bboxMinc: Int,
    bboxMaxr: Int,
    bboxMaxc: Int,
    id: Int) {

  def hasPixels: Boolean = pixels != null
  def hasMask: Boolean = mask != null
  def planeSize: Int = height * width

  /** channel c of the image as its own plane */
  def plane(c: Int): Array[Float] =
    java.util.Arrays.copyOfRange(pixels, c * planeSize, (c + 1) * planeSize)

  /** channel c of the mask as booleans (label > 0) */
  def maskPlane(c: Int): Array[Boolean] = {
    val out = new Array[Boolean](planeSize)
    var i = 0
    while (i < planeSize) { out(i) = mask(c * planeSize + i) > 0; i += 1 }
    out
  }

  def combinedMaskBool: Array[Boolean] = {
    val out = new Array[Boolean](planeSize)
    var i = 0
    while (i < planeSize) { out(i) = combinedMask(i) > 0; i += 1 }
    out
  }

  /** drop pixel-ish payloads, keep the metadata husk (`copy_without`) */
  def tombstone: ImageEvent =
    copy(pixels = null, mask = null, combinedMask = null)
}

object ImageEvent {
  /** fresh event with only source fields populated */
  def fromPixels(path: String, idx: Long, group: String,
      meta: Map[String, String], channels: Int, height: Int, width: Int,
      pixels: Array[Float]): ImageEvent =
    ImageEvent(path, idx, group, meta, channels, height, width, pixels,
      maskFilter = null, mask = null, regions = null, combinedMask = null,
      background = null, combinedBackground = null,
      bboxMinr = -1, bboxMinc = -1, bboxMaxr = -1, bboxMaxc = -1, id = 0)

  /** the `@check` combinator (utils/util.py:202-208): apply `f` only
    * when pixels are present; tombstones pass through unchanged. */
  def whenPixels(f: ImageEvent => ImageEvent)(e: ImageEvent): ImageEvent =
    if (e.hasPixels) f(e) else e
}
