package graft.kernels

/** Binary morphology and labeling on boolean masks stored row-major
  * with dims (h, w). Covers the mask post-processing chain of the
  * reference (masking/__init__.py:245-251: remove_small_holes,
  * expand_labels, remove_small_objects, label) and the binary
  * closing/erosion used by masking kernels and the edge intensity view
  * (features/intensity.py erosion-XOR).
  */
object Morphology {

  def erodeBinary(mask: Array[Boolean], h: Int, w: Int, radius: Int): Array[Boolean] = {
    val offs = Filters.diskOffsets(radius)
    val out = new Array[Boolean](h * w)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        var all = true
        var i = 0
        while (all && i < offs.length) {
          val rr = r + offs(i)._1; val cc = c + offs(i)._2
          // out-of-bounds counts as FOREGROUND: skimage.morphology.
          // binary_erosion passes border_value=True to ndi so erosion
          // never eats the image border — the edge-XOR view
          // (features/intensity.py:80-81) depends on this for masks
          // touching their bbox crop
          if (rr >= 0 && rr < h && cc >= 0 && cc < w && !mask(rr * w + cc)) all = false
          i += 1
        }
        out(r * w + c) = all
        c += 1
      }
      r += 1
    }
    out
  }

  def dilateBinary(mask: Array[Boolean], h: Int, w: Int, radius: Int): Array[Boolean] = {
    val offs = Filters.diskOffsets(radius)
    val out = new Array[Boolean](h * w)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        var any = false
        var i = 0
        while (!any && i < offs.length) {
          val rr = r + offs(i)._1; val cc = c + offs(i)._2
          if (rr >= 0 && rr < h && cc >= 0 && cc < w && mask(rr * w + cc)) any = true
          i += 1
        }
        out(r * w + c) = any
        c += 1
      }
      r += 1
    }
    out
  }

  def closeBinary(mask: Array[Boolean], h: Int, w: Int, radius: Int): Array[Boolean] =
    erodeBinary(dilateBinary(mask, h, w, radius), h, w, radius)

  def openBinary(mask: Array[Boolean], h: Int, w: Int, radius: Int): Array[Boolean] =
    dilateBinary(erodeBinary(mask, h, w, radius), h, w, radius)

  /** edge view: mask XOR erosion(mask, disk(radius)) — the boundary
    * band used by the `edge_*` intensity features
    * (features/intensity.py:54-164, disk 6) */
  def edgeBand(mask: Array[Boolean], h: Int, w: Int, radius: Int): Array[Boolean] = {
    val er = erodeBinary(mask, h, w, radius)
    val out = new Array[Boolean](h * w)
    var i = 0
    while (i < mask.length) { out(i) = mask(i) ^ er(i); i += 1 }
    out
  }

  // ---- connected components ---------------------------------------------

  private val off8 = Array((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
  private val off4 = Array((-1, 0), (0, -1), (0, 1), (1, 0))

  /** connected-component labeling, labels 1..n in scan order of first
    * pixel (skimage.measure.label; connectivity 2 = 8-conn default in
    * 2-D, connectivity 1 = 4-conn). BFS flood fill. */
  def label(mask: Array[Boolean], h: Int, w: Int, connectivity: Int = 2): Array[Int] = {
    val offs = if (connectivity >= 2) off8 else off4
    val out = new Array[Int](h * w)
    var next = 0
    // primitive int stack: an ArrayDeque[Int] boxes every pixel index
    // (several boxed Integers per foreground pixel), and label() runs
    // ~5x per plane per branch in the fused hot path. Labels are
    // assigned at seed discovery (scan order), so traversal order
    // (stack vs queue) cannot change the labeling.
    var stack = new Array[Int](1024)
    var top = 0
    var idx = 0
    while (idx < mask.length) {
      if (mask(idx) && out(idx) == 0) {
        next += 1
        out(idx) = next
        stack(0) = idx
        top = 1
        while (top > 0) {
          top -= 1
          val cur = stack(top)
          val r = cur / w; val c = cur % w
          var i = 0
          while (i < offs.length) {
            val rr = r + offs(i)._1; val cc = c + offs(i)._2
            if (rr >= 0 && rr < h && cc >= 0 && cc < w) {
              val j = rr * w + cc
              if (mask(j) && out(j) == 0) {
                out(j) = next
                if (top == stack.length)
                  stack = java.util.Arrays.copyOf(stack, stack.length * 2)
                stack(top) = j
                top += 1
              }
            }
            i += 1
          }
        }
      }
      idx += 1
    }
    out
  }

  def labelCount(labels: Array[Int]): Int = {
    var mx = 0; var i = 0
    while (i < labels.length) { if (labels(i) > mx) mx = labels(i); i += 1 }
    mx
  }

  /** remove connected components with area < minSize
    * (skimage.morphology.remove_small_objects — its DEFAULT is
    * connectivity=1, i.e. 4-conn, which the reference relies on in
    * otsu.py/li.py cleanup and mask_post_process; diagonal-only
    * touching blobs are separate components here) */
  def removeSmallObjects(mask: Array[Boolean], h: Int, w: Int, minSize: Int): Array[Boolean] = {
    val labels = label(mask, h, w, connectivity = 1)
    val n = labelCount(labels)
    val areas = new Array[Int](n + 1)
    var i = 0
    while (i < labels.length) { areas(labels(i)) += 1; i += 1 }
    val out = new Array[Boolean](h * w)
    i = 0
    while (i < labels.length) {
      out(i) = labels(i) > 0 && areas(labels(i)) >= minSize
      i += 1
    }
    out
  }

  /** fill background holes with area < threshold + 1. Implemented
    * exactly as skimage.morphology.remove_small_holes: complement →
    * remove_small_objects(complement, threshold + 1, connectivity=1) →
    * complement, so exactly-threshold holes fill too. No border
    * special-casing — a small background bay touching the image edge
    * IS filled when it forms its own component, and the threshold is a
    * double because the reference passes the float (h*w)/4
    * (otsu.py:39, li.py:41). */
  def removeSmallHoles(mask: Array[Boolean], h: Int, w: Int, areaThreshold: Double): Array[Boolean] = {
    val inv = new Array[Boolean](h * w)
    var i = 0
    while (i < mask.length) { inv(i) = !mask(i); i += 1 }
    val labels = label(inv, h, w, connectivity = 1)
    val n = labelCount(labels)
    val areas = new Array[Int](n + 1)
    i = 0
    while (i < labels.length) {
      if (labels(i) > 0) areas(labels(i)) += 1
      i += 1
    }
    val out = mask.clone()
    i = 0
    while (i < labels.length) {
      val l = labels(i)
      // skimage >= 0.16 (the reference pins >= 0.18) implements
      // remove_small_holes as remove_small_objects(complement,
      // area_threshold + 1), whose keep test is strict <: a hole is
      // filled iff area < threshold + 1 — so exactly-threshold holes
      // fill (and non-integral thresholds round UP, e.g. th=12.25
      // fills up to 13). Strict < threshold was an off-by-one.
      if (l > 0 && areas(l) < areaThreshold + 1) out(i) = true
      i += 1
    }
    out
  }

  /** scipy.ndimage.binary_fill_holes: background components (4-conn)
    * NOT connected to the image border become foreground — used by
    * regionprops' filled image, which unlike remove_small_holes never
    * fills border-touching background. */
  def fillHoles(mask: Array[Boolean], h: Int, w: Int): Array[Boolean] = {
    val inv = new Array[Boolean](h * w)
    var i = 0
    while (i < mask.length) { inv(i) = !mask(i); i += 1 }
    val labels = label(inv, h, w, connectivity = 1)
    val n = labelCount(labels)
    val touchesBorder = new Array[Boolean](n + 1)
    i = 0
    while (i < labels.length) {
      val l = labels(i)
      if (l > 0) {
        val r = i / w; val c = i % w
        if (r == 0 || r == h - 1 || c == 0 || c == w - 1) touchesBorder(l) = true
      }
      i += 1
    }
    val out = mask.clone()
    i = 0
    while (i < labels.length) {
      if (labels(i) > 0 && !touchesBorder(labels(i))) out(i) = true
      i += 1
    }
    out
  }

  /** grow each label into the background by up to `distance` (euclidean;
    * nearest label wins, smaller label on exact ties —
    * skimage.segmentation.expand_labels) */
  def expandLabels(labels: Array[Int], h: Int, w: Int, distance: Double): Array[Int] = {
    val rad = math.floor(distance).toInt
    if (rad < 1) return labels.clone()
    val out = labels.clone()
    val d2max = distance * distance
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        if (labels(r * w + c) == 0) {
          var bestD2 = Double.MaxValue
          var bestL = 0
          var dr = -rad
          while (dr <= rad) {
            var dc = -rad
            while (dc <= rad) {
              val rr = r + dr; val cc = c + dc
              if (rr >= 0 && rr < h && cc >= 0 && cc < w) {
                val l = labels(rr * w + cc)
                if (l > 0) {
                  val d2 = (dr * dr + dc * dc).toDouble
                  // exact-distance ties break on the SMALLEST label —
                  // a documented deterministic choice. skimage's
                  // expand_labels inherits its tie order from scipy's
                  // EDT feature-transform scan, which is an internal
                  // implementation detail with no stated contract;
                  // smallest-label is stable across platforms where
                  // replaying scipy's scan order would not be.
                  if (d2 <= d2max && (d2 < bestD2 || (d2 == bestD2 && l < bestL))) {
                    bestD2 = d2; bestL = l
                  }
                }
              }
              dc += 1
            }
            dr += 1
          }
          if (bestL > 0) out(r * w + c) = bestL
        }
        c += 1
      }
      r += 1
    }
    out
  }

  /** The reference's mask post-processing chain
    * (masking/__init__.py:245-251): remove_small_holes(300) →
    * expand_labels(1) → remove_small_objects(20) → label. Returns the
    * final labeled mask. */
  def postProcess(mask: Array[Boolean], h: Int, w: Int): Array[Int] = {
    val filled = removeSmallHoles(mask, h, w, 300)
    val expandedLabels = expandLabels(label(filled, h, w), h, w, 1)
    val asBool = new Array[Boolean](h * w)
    var i = 0
    while (i < asBool.length) { asBool(i) = expandedLabels(i) > 0; i += 1 }
    val kept = removeSmallObjects(asBool, h, w, 20)
    label(kept, h, w)
  }

  /** border-region scrub (_regions_touching, masking/__init__.py:
    * 132-155): the four borders are CONCATENATED (corners counted
    * twice) and a label is dropped when its total border presence
    * exceeds the single limit int(0.25·min(h,w)); surviving-region
    * count is len(set(unique) − set(dropped)) − 1, i.e. background 0
    * participates only when a background pixel exists. Returns the
    * filtered mask and the surviving-region count. */
  def scrubBorder(mask: Array[Boolean], h: Int, w: Int): (Array[Boolean], Int) = {
    val labels = label(mask, h, w)
    val n = labelCount(labels)
    if (n == 0) return (new Array[Boolean](h * w), 0)
    val limit = (math.min(h, w) * 0.25).toInt
    val borderCount = new Array[Int](n + 1)
    var hasBackground = false
    var i = 0
    while (i < labels.length) {
      val l = labels(i)
      if (l == 0) hasBackground = true
      else {
        val r = i / w; val c = i % w
        // corner pixels sit on two borders of the concatenation
        if (r == 0) borderCount(l) += 1
        if (r == h - 1) borderCount(l) += 1
        if (c == 0) borderCount(l) += 1
        if (c == w - 1) borderCount(l) += 1
      }
      i += 1
    }
    val drop = new Array[Boolean](n + 1)
    var l = 1
    while (l <= n) { drop(l) = borderCount(l) > limit; l += 1 }
    val out = new Array[Boolean](h * w)
    i = 0
    while (i < labels.length) {
      val li = labels(i)
      if (li > 0 && !drop(li)) out(i) = true
      i += 1
    }
    var surviving = if (hasBackground) 0 else -1
    l = 1
    while (l <= n) { if (!drop(l)) surviving += 1; l += 1 }
    (out, math.max(0, surviving))
  }
}
