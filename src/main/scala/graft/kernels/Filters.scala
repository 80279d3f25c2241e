package graft.kernels

/** 2-D image filters over a single channel plane stored row-major in
  * `Array[Float]` with dims (h, w), index r*w+c. Boundary handling is
  * reflect (skimage's default 'reflect'/'nearest' family — documented
  * per function). These are the primitives behind the masking kernels
  * C1-C5 (reference masking/otsu.py, li.py, sobel.py, watershed.py,
  * spot.py).
  */
object Filters {

  @inline private def reflect(i: Int, n: Int): Int = {
    // scipy 'reflect' (d c b a | a b c d | d c b a)
    var x = i
    if (n == 1) return 0
    val period = 2 * n
    x = ((x % period) + period) % period
    if (x >= n) period - 1 - x else x
  }

  @inline private def clampIdx(i: Int, n: Int): Int =
    if (i < 0) 0 else if (i >= n) n - 1 else i

  /** separable gaussian blur, radius = int(truncate*sigma + 0.5) with
    * truncate=4 and 'nearest' (edge-replicate) boundary — the exact
    * defaults of skimage.filters.gaussian, which the reference calls
    * everywhere (otsu.py:30, li.py:38-40, watershed.py smoothing);
    * scipy's own gaussian_filter defaults to reflect, but skimage
    * overrides mode='nearest'. */
  def gaussian(img: Array[Float], h: Int, w: Int, sigma: Double): Array[Float] = {
    if (sigma <= 0) return img.clone()
    val radius = (4.0 * sigma + 0.5).toInt
    val kernel = new Array[Double](2 * radius + 1)
    var s = 0.0
    var i = -radius
    while (i <= radius) {
      val v = math.exp(-(i * i) / (2.0 * sigma * sigma))
      kernel(i + radius) = v; s += v; i += 1
    }
    i = 0
    while (i < kernel.length) { kernel(i) /= s; i += 1 }

    val tmp = new Array[Float](h * w)
    val out = new Array[Float](h * w)
    // horizontal
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        var acc = 0.0; var k = -radius
        while (k <= radius) {
          acc += kernel(k + radius) * img(r * w + clampIdx(c + k, w)); k += 1
        }
        tmp(r * w + c) = acc.toFloat; c += 1
      }
      r += 1
    }
    // vertical
    r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        var acc = 0.0; var k = -radius
        while (k <= radius) {
          acc += kernel(k + radius) * tmp(clampIdx(r + k, h) * w + c); k += 1
        }
        out(r * w + c) = acc.toFloat; c += 1
      }
      r += 1
    }
    out
  }

  /** Sobel gradient magnitude with skimage's 1/4-normalized kernels
    * and the final 1/sqrt(ndim) magnitude normalization of
    * skimage.filters.sobel (sqrt(gx² + gy²)/sqrt(2) in 2-D), reflect
    * boundary (ndi.convolve default). */
  def sobel(img: Array[Float], h: Int, w: Int): Array[Float] = {
    val out = new Array[Float](h * w)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        @inline def p(dr: Int, dc: Int): Double =
          img(reflect(r + dr, h) * w + reflect(c + dc, w))
        val gy = ((p(-1, -1) + 2 * p(-1, 0) + p(-1, 1)) -
          (p(1, -1) + 2 * p(1, 0) + p(1, 1))) / 4.0
        val gx = ((p(-1, -1) + 2 * p(0, -1) + p(1, -1)) -
          (p(-1, 1) + 2 * p(0, 1) + p(1, 1))) / 4.0
        out(r * w + c) = (math.sqrt(gx * gx + gy * gy) / math.sqrt(2.0)).toFloat
        c += 1
      }
      r += 1
    }
    out
  }

  /** disk structuring element offsets: all (dr,dc) with dr²+dc² <= r²
    * (skimage.morphology.disk) */
  def diskOffsets(radius: Int): Array[(Int, Int)] = {
    val buf = Array.newBuilder[(Int, Int)]
    var dr = -radius
    while (dr <= radius) {
      var dc = -radius
      while (dc <= radius) {
        if (dr * dr + dc * dc <= radius * radius) buf += ((dr, dc))
        dc += 1
      }
      dr += 1
    }
    buf.result()
  }

  /** median filter with a disk footprint, skimage.filters.rank.median
    * semantics (the reference's otsu.py:27,35): out-of-image pixels are
    * NOT part of the window (the cython rank kernels bounds-check and
    * skip, no padding), and the median of an n-pixel window is the
    * first value whose cumulative count exceeds n/2 — the upper-middle
    * for even n. */
  def medianDisk(img: Array[Float], h: Int, w: Int, radius: Int): Array[Float] = {
    val offs = diskOffsets(radius)
    val out = new Array[Float](h * w)
    val window = new Array[Float](offs.length)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        var n = 0
        var i = 0
        while (i < offs.length) {
          val (dr, dc) = offs(i)
          val rr = r + dr; val cc = c + dc
          if (rr >= 0 && rr < h && cc >= 0 && cc < w) {
            window(n) = img(rr * w + cc); n += 1
          }
          i += 1
        }
        // rank-(n/2) selection — a full O(k log k) sort of the ~81-
        // element window per pixel is pure waste (medianSquare already
        // selects); quickSelect returns exactly sorted(window)(n/2)
        out(r * w + c) = quickSelect(window, n, n / 2)
        c += 1
      }
      r += 1
    }
    out
  }

  /** median filter with a SQUARE size×size window, scipy.ndimage.
    * median_filter semantics (the reference's illumination correction,
    * jones_2006.py:93-95 with size=50): reflect boundary, even sizes
    * span offsets -(size/2) .. size-size/2-1, and the median is the
    * rank size²/2 element (0-based) of the window — scipy implements
    * median_filter as rank_filter(rank = n // 2). */
  def medianSquare(img: Array[Float], h: Int, w: Int, size: Int): Array[Float] = {
    val lo = -(size / 2)
    val hi = size - size / 2 - 1
    val n = size * size
    val window = new Array[Float](n)
    val out = new Array[Float](h * w)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        var k = 0
        var dr = lo
        while (dr <= hi) {
          var dc = lo
          while (dc <= hi) {
            window(k) = img(reflect(r + dr, h) * w + reflect(c + dc, w))
            k += 1
            dc += 1
          }
          dr += 1
        }
        // rank selection, not a full sort: same element, O(n) per pixel
        out(r * w + c) = quickSelect(window, n, n / 2)
        c += 1
      }
      r += 1
    }
    out
  }

  /** Hoare quickselect over a(0 until n): value at sorted rank k.
    * Deterministic middle pivot — the inputs are image windows, not
    * adversarial. Mutates `a`. */
  private def quickSelect(a: Array[Float], n: Int, k: Int): Float = {
    var lo = 0
    var hi = n - 1
    while (lo < hi) {
      val pivot = a((lo + hi) >>> 1)
      var i = lo
      var j = hi
      while (i <= j) {
        while (a(i) < pivot) i += 1
        while (a(j) > pivot) j -= 1
        if (i <= j) {
          val t = a(i); a(i) = a(j); a(j) = t
          i += 1; j -= 1
        }
      }
      if (k <= j) hi = j
      else if (k >= i) lo = i
      else return a(k)
    }
    a(lo)
  }

  @inline private def mirror(i: Int, n: Int): Int = {
    // numpy.pad mode='reflect': edge NOT duplicated (d c b | a b c d | c b a)
    if (n == 1) return 0
    val period = 2 * n - 2
    var x = ((i % period) + period) % period
    if (x >= n) period - x else x
  }

  /** Non-local means denoising with UNIFORM patch weighting — the
    * semantics of skimage.restoration.denoise_nl_means(fast_mode=True),
    * which the reference's watershed-DAPI segmenter calls with
    * patch_size=3, patch_distance=2 (segmentation/watershed_dapi.py:44;
    * h=0.1 and sigma=0 defaults). For every pixel, candidate patches
    * within `patchDistance` are weighted exp(−max(d²−2σ², 0)/h²) where
    * d² is the mean squared difference over the patch; the center
    * naturally gets weight 1. Borders are numpy-pad 'reflect'
    * (edge NOT duplicated — unlike scipy's reflect). Direct evaluation
    * (h·w·(2d+1)²·s² ops) computes exactly what skimage's
    * integral-image fast path computes. */
  def nlMeansDenoise(img: Array[Float], h: Int, w: Int,
      patchSize: Int = 3, patchDistance: Int = 2,
      filterH: Double = 0.1, sigma: Double = 0.0): Array[Float] = {
    val off = patchSize / 2
    val h2 = filterH * filterH
    val twoVar = 2.0 * sigma * sigma
    // skimage forces an EVEN patch_size up to the next odd value (the
    // window below is already that (2*off+1)-square), so the patch
    // mean must divide by the odd size squared — patchSize=2 (the
    // watershed noisy-channel call) means a 3x3 patch over 9 terms,
    // not 4
    val oddSize = 2 * off + 1
    val s2 = (oddSize * oddSize).toDouble
    val out = new Array[Float](h * w)
    @inline def at(r: Int, c: Int): Double = img(mirror(r, h) * w + mirror(c, w))
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        var wsum = 0.0
        var acc = 0.0
        var dr = -patchDistance
        while (dr <= patchDistance) {
          var dc = -patchDistance
          while (dc <= patchDistance) {
            var d2 = 0.0
            var pr = -off
            while (pr <= off) {
              var pc = -off
              while (pc <= off) {
                val diff = at(r + pr, c + pc) - at(r + dr + pr, c + dc + pc)
                d2 += diff * diff
                pc += 1
              }
              pr += 1
            }
            val dist = math.max(d2 / s2 - twoVar, 0.0)
            val wgt = math.exp(-dist / h2)
            wsum += wgt
            acc += wgt * at(r + dr, c + dc)
            dc += 1
          }
          dr += 1
        }
        out(r * w + c) = (acc / wsum).toFloat
        c += 1
      }
      r += 1
    }
    out
  }

  /** grayscale erosion (min) over a disk footprint, reflect boundary */
  def erodeGray(img: Array[Float], h: Int, w: Int, radius: Int): Array[Float] =
    rankExtreme(img, h, w, radius, isMin = true)

  /** grayscale dilation (max) over a disk footprint */
  def dilateGray(img: Array[Float], h: Int, w: Int, radius: Int): Array[Float] =
    rankExtreme(img, h, w, radius, isMin = false)

  private def rankExtreme(img: Array[Float], h: Int, w: Int, radius: Int,
      isMin: Boolean): Array[Float] = {
    val offs = diskOffsets(radius)
    val out = new Array[Float](h * w)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        var ext = if (isMin) Float.MaxValue else Float.MinValue
        var i = 0
        while (i < offs.length) {
          val (dr, dc) = offs(i)
          val v = img(reflect(r + dr, h) * w + reflect(c + dc, w))
          if (isMin) { if (v < ext) ext = v } else if (v > ext) ext = v
          i += 1
        }
        out(r * w + c) = ext
        c += 1
      }
      r += 1
    }
    out
  }

  /** grayscale opening = dilate(erode) */
  def openGray(img: Array[Float], h: Int, w: Int, radius: Int): Array[Float] =
    dilateGray(erodeGray(img, h, w, radius), h, w, radius)

  /** grayscale closing = erode(dilate) */
  def closeGray(img: Array[Float], h: Int, w: Int, radius: Int): Array[Float] =
    erodeGray(dilateGray(img, h, w, radius), h, w, radius)

  /** white tophat = img − opening(img) — the spot-enhancement kernel
    * (reference masking/spot.py:23-49 with disk(spotsize)) */
  def whiteTophat(img: Array[Float], h: Int, w: Int, radius: Int): Array[Float] = {
    val opened = openGray(img, h, w, radius)
    val out = new Array[Float](h * w)
    var i = 0
    while (i < img.length) { out(i) = img(i) - opened(i); i += 1 }
    out
  }

  /** linear rescale to [0,1] (skimage rescale_intensity); a constant
    * image divides by zero in skimage's formula and lands on
    * clip(image, 0, 1) — constant 5 becomes all 1.0, NOT zeros */
  def rescale01(img: Array[Float]): Array[Float] = {
    val (mn, mx) = Stats.minMax(img)
    val out = new Array[Float](img.length)
    if (mx == mn) {
      var i = 0
      while (i < img.length) {
        out(i) = math.max(0f, math.min(1f, img(i)))
        i += 1
      }
      return out
    }
    val inv = 1.0 / (mx - mn)
    var i = 0
    while (i < img.length) { out(i) = ((img(i) - mn) * inv).toFloat; i += 1 }
    out
  }
}
