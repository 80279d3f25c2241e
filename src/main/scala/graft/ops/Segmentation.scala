package graft.ops

import graft.core.ImageEvent
import graft.core.Codecs._
import graft.kernels._
import org.apache.spark.sql.Dataset

/** Segmentation: detect cells in a field of view and explode to
  * per-cell events — reference C10 + X1
  * (segmentation/watershed_dapi.py:29-62, segmentation/__init__.py:70-119).
  * Cellpose (C9) is a torch model outside JVM scope; `Segmenter` is the
  * plugin point (the reference ships it as an optional extra too,
  * setup.cfg:55-57).
  */
object Segmentation {

  trait Segmenter extends Serializable {
    /** labeled mask (1..n) for the parent channel plane */
    def segment(plane: Array[Float], h: Int, w: Int): Array[Int]
  }

  /** watershed-DAPI (C10): gaussian denoise (stand-in for NL-means —
    * same role, JVM-implementable) → Otsu foreground → EDT →
    * peak_local_max(min_distance = cellDiameter) → watershed(−EDT) →
    * expand_labels */
  final case class WatershedDapi(cellDiameter: Int = 10, expand: Int = 1) extends Segmenter {
    def segment(plane: Array[Float], h: Int, w: Int): Array[Int] = {
      val den = Filters.gaussian(plane, h, w, 1.0)
      val t = Thresholds.otsu(den)
      val fg = den.map(_ > t)
      val dist = Watershed.distanceTransform(fg, h, w)
      val peaks = Watershed.peakLocalMax(dist, h, w, cellDiameter)
      if (peaks.isEmpty) return new Array[Int](h * w)
      val markers = Watershed.markersFromPeaks(peaks, h * w)
      val neg = dist.map(-_)
      val ws = Watershed.watershed(neg, h, w, markers, fg)
      Morphology.expandLabels(ws, h, w, expand)
    }
  }

  /** run the segmenter on the parent channel; the labeled parent mask
    * is copied to every channel (the watershed_dapi contract: one
    * labeled mask indexed per channel in to_events) */
  def segment(ds: Dataset[ImageEvent], segmenter: Segmenter,
      parentChannelIndex: Int): Dataset[ImageEvent] =
    ds.map(ImageEvent.whenPixels { e =>
      val ps = e.planeSize
      val labels = segmenter.segment(e.plane(parentChannelIndex), e.height, e.width)
      val mask = new Array[Int](e.channels * ps)
      var c = 0
      while (c < e.channels) {
        System.arraycopy(labels, 0, mask, c * ps, ps)
        c += 1
      }
      val regions = Array.fill(e.channels)(Morphology.labelCount(labels))
      e.copy(mask = mask, regions = regions)
    })

  /** mask subtraction P6 (segmentation/__init__.py:11-13): channel k's
    * mask becomes mask(i) − mask(j) (set difference) */
  def subtractMask(ds: Dataset[ImageEvent], k: Int, i: Int, j: Int): Dataset[ImageEvent] =
    ds.map(ImageEvent.whenPixels { e =>
      if (!e.hasMask) e
      else {
        val ps = e.planeSize
        val mask = e.mask.clone()
        var p = 0
        while (p < ps) {
          mask(k * ps + p) =
            if (e.mask(i * ps + p) > 0 && e.mask(j * ps + p) == 0) e.mask(i * ps + p) else 0
          p += 1
        }
        e.copy(mask = mask)
      }
    })

  /** X1 `to_events` (segmentation/__init__.py:70-119): one event per
    * detected region in the parent channel — pixels and mask cropped
    * to the region bbox, per-channel regions flags, zeroed backgrounds,
    * `id` = region label. Pixel-less records pass through as
    * tombstones (every input appears in the output). */
  def toEvents(ds: Dataset[ImageEvent], parentChannelIndex: Int,
      groupKeys: Seq[String] = null): Dataset[ImageEvent] =
    ds.flatMap { e =>
      if (!e.hasPixels || !e.hasMask) Iterator.single(e)
      else {
        val ps = e.planeSize
        val w = e.width
        // regions of the labeled parent plane
        val parent = new Array[Int](ps)
        System.arraycopy(e.mask, parentChannelIndex * ps, parent, 0, ps)
        val nLabels = Morphology.labelCount(parent)
        val group =
          if (groupKeys == null) e.group
          else groupKeys.map(k => e.meta.getOrElse(k, "")).mkString("_")
        (1 to nLabels).iterator.flatMap { lbl =>
          // bbox of this label in the parent channel
          var minR = e.height; var minC = w; var maxR = 0; var maxC = 0
          var i = 0
          while (i < ps) {
            if (parent(i) == lbl) {
              val r = i / w; val c = i % w
              if (r < minR) minR = r
              if (c < minC) minC = c
              if (r + 1 > maxR) maxR = r + 1
              if (c + 1 > maxC) maxC = c + 1
            }
            i += 1
          }
          if (maxR <= minR) Iterator.empty
          else {
            val ch = e.channels
            val nh = maxR - minR; val nw = maxC - minC
            val nps = nh * nw
            val px = new Array[Float](ch * nps)
            val mk = new Array[Int](ch * nps)
            val cmb = new Array[Int](nps)
            val regions = new Array[Int](ch)
            var c = 0
            while (c < ch) {
              var r = 0
              while (r < nh) {
                var cc = 0
                while (cc < nw) {
                  val src = (minR + r) * w + (minC + cc)
                  px(c * nps + r * nw + cc) = e.pixels(c * ps + src)
                  val m = if (e.mask(c * ps + src) == lbl) 1 else 0
                  mk(c * nps + r * nw + cc) = m
                  if (m > 0) { cmb(r * nw + cc) = 1; regions(c) = 1 }
                  cc += 1
                }
                r += 1
              }
              c += 1
            }
            Iterator.single(e.copy(
              group = group,
              height = nh, width = nw,
              pixels = px, mask = mk, combinedMask = cmb,
              regions = regions,
              background = new Array[Double](ch),
              combinedBackground = new Array[Double](ch),
              bboxMinr = minR, bboxMinc = minC, bboxMaxr = maxR, bboxMaxc = maxC,
              id = lbl))
          }
        }
      }
    }
}
