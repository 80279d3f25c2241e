package graft.kernels

import scala.collection.mutable

/** Euclidean distance transform, peak detection, and priority-flood
  * watershed — the segmentation core of masking kernel C4
  * (masking/watershed.py:26-61, compactness=1) and the watershed-DAPI
  * segmenter C10 (segmentation/watershed_dapi.py:29-62: EDT →
  * peak_local_max → watershed(−distance)).
  */
object Watershed {

  /** exact euclidean distance transform (distance to nearest background
    * pixel) via the Felzenszwalb-Huttenlocher two-pass parabola method.
    * Foreground = true. */
  def distanceTransform(mask: Array[Boolean], h: Int, w: Int): Array[Double] = {
    val INF = 1e20
    val f = new Array[Double](math.max(h, w))
    val d = new Array[Double](math.max(h, w))
    val v = new Array[Int](math.max(h, w))
    val z = new Array[Double](math.max(h, w) + 1)

    def dt1d(n: Int): Unit = {
      var k = 0
      v(0) = 0
      z(0) = -INF
      z(1) = INF
      var q = 1
      while (q < n) {
        var s = ((f(q) + q * q) - (f(v(k)) + v(k) * v(k))) / (2.0 * q - 2.0 * v(k))
        while (s <= z(k)) {
          k -= 1
          s = ((f(q) + q * q) - (f(v(k)) + v(k) * v(k))) / (2.0 * q - 2.0 * v(k))
        }
        k += 1
        v(k) = q
        z(k) = s
        z(k + 1) = INF
        q += 1
      }
      k = 0
      q = 0
      while (q < n) {
        while (z(k + 1) < q) k += 1
        d(q) = (q - v(k)) * (q - v(k)) + f(v(k))
        q += 1
      }
    }

    val sq = new Array[Double](h * w)
    // columns pass
    var c = 0
    while (c < w) {
      var r = 0
      while (r < h) { f(r) = if (mask(r * w + c)) INF else 0.0; r += 1 }
      dt1d(h)
      r = 0
      while (r < h) { sq(r * w + c) = d(r); r += 1 }
      c += 1
    }
    // rows pass
    val out = new Array[Double](h * w)
    var r = 0
    while (r < h) {
      c = 0
      while (c < w) { f(c) = sq(r * w + c); c += 1 }
      dt1d(w)
      c = 0
      while (c < w) { out(r * w + c) = math.sqrt(d(c)); c += 1 }
      r += 1
    }
    out
  }

  /** peak_local_max: local maxima of `img` within a (2·minDistance+1)
    * square window, greedily suppressed so surviving peaks are
    * > minDistance apart (descending intensity, row-major tiebreak —
    * skimage.feature.peak_local_max semantics). Peaks within
    * `excludeBorder` pixels of any edge are dropped; skimage's default
    * (exclude_border=True) means minDistance, so -1 selects that.
    * Returns peak indices. */
  def peakLocalMax(img: Array[Double], h: Int, w: Int, minDistance: Int,
      thresholdAbs: Double = 1e-12, excludeBorder: Int = -1): Array[Int] = {
    val rad = math.max(1, minDistance)
    val eb = if (excludeBorder < 0) minDistance else excludeBorder
    val candidates = mutable.ArrayBuffer.empty[Int]
    var r = eb
    while (r < h - eb) {
      var c = eb
      while (c < w - eb) {
        val v = img(r * w + c)
        if (v > thresholdAbs) {
          var isMax = true
          var dr = -rad
          while (isMax && dr <= rad) {
            var dc = -rad
            while (isMax && dc <= rad) {
              val rr = r + dr; val cc = c + dc
              if (rr >= 0 && rr < h && cc >= 0 && cc < w && img(rr * w + cc) > v)
                isMax = false
              dc += 1
            }
            dr += 1
          }
          if (isMax) candidates += (r * w + c)
        }
        c += 1
      }
      r += 1
    }
    // greedy min-distance suppression, strongest first
    val sorted = candidates.sortBy(i => (-img(i), i))
    val kept = mutable.ArrayBuffer.empty[Int]
    val minD2 = minDistance.toDouble * minDistance
    sorted.foreach { i =>
      val r0 = i / w; val c0 = i % w
      val ok = kept.forall { j =>
        val dr = r0 - j / w; val dc = c0 - j % w
        dr * dr + dc * dc > minD2
      }
      if (ok) kept += i
    }
    kept.toArray
  }

  // skimage watershed default connectivity=1 → 4-neighborhood, iterated
  // in ascending raveled-offset order (up, left, right, down)
  private val off4 = Array((-1, 0), (0, -1), (0, 1), (1, 0))

  /** priority-flood watershed from labeled markers over elevation
    * `img`, optionally restricted to `mask`, with compactness à la
    * compact watershed (Neubert & Protzel 2014). Mirrors skimage's
    * `watershed_raveled`: 4-connected; plain mode labels neighbors at
    * push (each pixel enqueued once); compact mode enqueues a pixel
    * once per reaching seed with priority img + compactness · euclidean
    * distance to that SEED, and labels at first pop. Matches the call
    * shapes of masking/watershed.py:58 (compactness=1) and
    * segmentation/watershed_dapi.py:55 (mask, compactness=0). */
  /** primitive min-heap over (priority, insertion order, pixel, seed):
    * the flood enqueues on the order of h·w entries, so a boxed
    * PriorityQueue of Tuple4s costs one tuple + three box allocations
    * per push on the per-event segmentation hot path. Parallel
    * primitive arrays allocate nothing per operation. Orders are
    * unique, so (prio, ord) is a strict total order — semantics
    * identical to the tuple ordering it replaces (golden-pinned). */
  private final class FloodHeap(initCap: Int) {
    private var prio = new Array[Double](initCap)
    private var ord = new Array[Long](initCap)
    private var px = new Array[Int](initCap)
    private var sd = new Array[Int](initCap)
    private var n = 0
    var curPx = 0
    var curSd = 0
    def nonEmpty: Boolean = n > 0
    private def less(a: Int, b: Int): Boolean =
      prio(a) < prio(b) || (prio(a) == prio(b) && ord(a) < ord(b))
    private def swap(a: Int, b: Int): Unit = {
      val p = prio(a); prio(a) = prio(b); prio(b) = p
      val o = ord(a); ord(a) = ord(b); ord(b) = o
      val x = px(a); px(a) = px(b); px(b) = x
      val s = sd(a); sd(a) = sd(b); sd(b) = s
    }
    def enqueue(p: Double, o: Long, x: Int, s: Int): Unit = {
      if (n == prio.length) {
        val cap = prio.length * 2
        prio = java.util.Arrays.copyOf(prio, cap)
        ord = java.util.Arrays.copyOf(ord, cap)
        px = java.util.Arrays.copyOf(px, cap)
        sd = java.util.Arrays.copyOf(sd, cap)
      }
      prio(n) = p; ord(n) = o; px(n) = x; sd(n) = s
      var i = n
      n += 1
      while (i > 0 && less(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }
    /** pops the minimum into curPx/curSd */
    def dequeue(): Unit = {
      curPx = px(0); curSd = sd(0)
      n -= 1
      if (n > 0) {
        prio(0) = prio(n); ord(0) = ord(n); px(0) = px(n); sd(0) = sd(n)
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = l + 1
          var m = i
          if (l < n && less(l, m)) m = l
          if (r < n && less(r, m)) m = r
          if (m == i) done = true
          else { swap(i, m); i = m }
        }
      }
    }
  }

  def watershed(img: Array[Double], h: Int, w: Int, markers: Array[Int],
      mask: Array[Boolean] = null, compactness: Double = 0.0): Array[Int] = {
    val out = new Array[Int](h * w)
    val pq = new FloodHeap(math.max(16, h * w / 4))
    var order = 0L

    @inline def inMask(i: Int): Boolean = mask == null || mask(i)

    var i = 0
    while (i < markers.length) {
      if (markers(i) > 0 && inMask(i)) {
        out(i) = markers(i)
        pq.enqueue(img(i), order, i, i)
        order += 1
      }
      i += 1
    }
    while (pq.nonEmpty) {
      pq.dequeue()
      val cur = pq.curPx
      val seed = pq.curSd
      if (compactness > 0 && out(cur) != 0 && cur != seed) {
        // already claimed by an earlier pop via a cheaper path
      } else {
        if (compactness > 0) out(cur) = out(seed)
        val lbl = out(cur)
        val r = cur / w; val c = cur % w
        var k = 0
        while (k < off4.length) {
          val rr = r + off4(k)._1; val cc = c + off4(k)._2
          if (rr >= 0 && rr < h && cc >= 0 && cc < w) {
            val j = rr * w + cc
            if (out(j) == 0 && inMask(j)) {
              val prio =
                if (compactness > 0) {
                  val dr = (rr - seed / w).toDouble; val dc = (cc - seed % w).toDouble
                  img(j) + compactness * math.sqrt(dr * dr + dc * dc)
                } else {
                  out(j) = lbl // plain mode: claim at push, single enqueue
                  img(j)
                }
              pq.enqueue(prio, order, j, seed)
              order += 1
            }
          }
          k += 1
        }
      }
    }
    out
  }

  /** markers array from peak indices — the reference builds markers
    * via measure.label of the peak mask (watershed_dapi.py:51-53):
    * 8-connected components numbered by scan position. Labeling the
    * mask (not the raw peaks) matters at minDistance=1, where two
    * diagonal peaks (d=sqrt2 > 1) both survive peak_local_max and must
    * MERGE into one marker, not seed two cells. */
  def markersFromPeaks(peaks: Array[Int], h: Int, w: Int): Array[Int] = {
    val mask = new Array[Boolean](h * w)
    peaks.foreach(mask(_) = true)
    Morphology.label(mask, h, w, connectivity = 2)
  }
}
