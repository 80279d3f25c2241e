package graft.ops

import graft.core.ImageEvent
import graft.kernels._
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.types._

/** Feature extraction: event → one wide row of float features with the
  * reference's column naming, schema declared eagerly before execution
  * (features/__init__.py:34-46,104-161).
  *
  * Families (all per reference):
  *  - bbox  (C15): the 4 bbox coords → meta columns
  *  - shape (C11): 59 regionprops × (combined + each channel)
  *  - intensity (C12): 11 stats × 8 views × channel
  *  - raw   (C13): 11 stats on unmasked pixels (same column names as
  *    intensity's first view — when both families are requested,
  *    intensity wins, replicating features/__init__.py:86-97 where the
  *    raw block does not advance the column cursor)
  *  - texture (C14): 6 GLCM props × {mean,std} × 2 distances + 4 sobel
  *    stats, × {channel mask, combined mask}
  *
  * Tombstones (null pixels) emit only meta + regions — the
  * `if "pixels" in p` guard (features/__init__.py:76-99): every input
  * row appears in the output.
  *
  * One `Dataset.map` per branch — no shuffle; the row is built in a
  * single pass and lands in a static schema so downstream relational
  * ops (column pruning!) see real columns, not a blob.
  */
object Features {

  val IntensityProps: Seq[String] = Seq("mean", "median", "max", "min", "std",
    "mad", "lower_quartile", "upper_quartile", "sum", "skewness", "kurtosis")
  val IntensityViews: Seq[String] = Seq("", "bgcorr_", "edge_", "bgcorr_edge_",
    "combined_", "combined_bgcorr_", "combined_edge_", "combined_bgcorr_edge_")
  val GlcmDistances: Seq[Int] = Seq(3, 5)
  val TextureBins = 15

  /** ordered feature column names for a family (pre-rename) */
  def familyNames(family: String, channelNames: Seq[String]): Seq[String] = family match {
    case "bbox" => Seq("bbox_minr", "bbox_minc", "bbox_maxr", "bbox_maxc")
    case "regions" => channelNames.map(c => s"regions_$c")
    case "shape" =>
      ("combined" +: channelNames).flatMap(n => RegionProps.Names.map(p => s"${p}_$n"))
    case "raw" =>
      channelNames.flatMap(c => IntensityProps.map(p => s"${p}_$c"))
    case "intensity" =>
      channelNames.flatMap(c =>
        IntensityViews.flatMap(v => IntensityProps.map(p => s"$v${p}_$c")))
    case "texture" =>
      // single source of truth with the computation side: a drifted
      // hand-maintained copy here would zip-truncate silently
      channelNames.flatMap(c => textureNames(c, "") ++ textureNames(c, "combined_"))
    case other => throw new IllegalArgumentException(s"unknown feature family: $other")
  }

  /** the reference's rename (features/__init__.py:34-46): loader keys →
    * meta_, bbox/regions → meta_[prefix_], features → feat_[prefix_] */
  def renamed(name: String, prefix: String, isLoaderMeta: Boolean): String =
    if (isLoaderMeta) s"meta_$name"
    else if (name.startsWith("bbox") || name.startsWith("regions"))
      if (prefix == null) s"meta_$name" else s"meta_${prefix}_$name"
    else if (prefix == null) s"feat_$name"
    else s"feat_${prefix}_$name"

  def schema(channelNames: Seq[String], types: Seq[String], prefix: String): StructType = {
    val metaFields = Seq(
      StructField(renamed("path", prefix, isLoaderMeta = true), StringType),
      StructField(renamed("idx", prefix, isLoaderMeta = true), LongType),
      StructField(renamed("group", prefix, isLoaderMeta = true), StringType),
      StructField(renamed("id", prefix, isLoaderMeta = true), IntegerType))
    val featNames = featureNames(channelNames, types)
    StructType(metaFields ++ featNames.map(n =>
      StructField(renamed(n, prefix, isLoaderMeta = false), DoubleType)))
  }

  /** canonical family computation order — raw BEFORE intensity so the
    * shared `{prop}_{ch}` names are written last by intensity (the
    * reference's dict-update semantics, features/__init__.py:86-97),
    * regardless of the order the caller listed the families in */
  val CanonicalOrder: Seq[String] =
    Seq("regions", "bbox", "shape", "raw", "intensity", "texture")

  private def ordered(types: Seq[String]): Seq[String] =
    CanonicalOrder.filter(types.contains) ++
      types.filterNot(CanonicalOrder.contains)

  /** deduplicated ordered (pre-rename) feature names — duplicates keep
    * the FIRST slot but are written by the LAST family computing them */
  def featureNames(channelNames: Seq[String], types: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    ordered(types).foreach(f => familyNames(f, channelNames).foreach(seen.add))
    seen.toSeq
  }

  /** Precomputed per-stage write plan. The per-record hot path used to
    * interpolate every feature NAME and resolve it through a HashMap
    * per record — hundreds of string allocations per event, all fully
    * determined by (channelNames, types). The layout resolves each
    * emitted value to its output slot ONCE per stage; records then
    * write doubles by position. `emitIdx` relies on the invariant that
    * each family computes its values in exactly [[familyNames]] order
    * (true by construction — texture even shares the name source); a
    * name duplicated across families maps every emission to the same
    * FIRST slot, so the canonical-order last writer wins as before. */
  final case class CellLayout(typesOrdered: Array[String],
      emitIdx: Array[Int], regionsIdx: Array[Int], nSlots: Int)

  def layout(channelNames: Seq[String], types: Seq[String]): CellLayout = {
    val names = featureNames(channelNames, types)
    val nameIdx = names.zipWithIndex.toMap
    val ord = ordered(types)
    CellLayout(
      ord.toArray,
      ord.filterNot(_ == "regions")
        .flatMap(f => familyNames(f, channelNames)).map(nameIdx).toArray,
      if (types.contains("regions"))
        channelNames.map(c => nameIdx(s"regions_$c")).toArray
      else Array.empty[Int],
      names.length)
  }

  /** the per-record feature cells in schema order (shared by the
    * per-branch extract and the fused single-pass pipeline) */
  def featureCells(e: ImageEvent, channelNames: Seq[String],
      lay: CellLayout): Array[Any] = {
    val feats = new Array[Any](lay.nSlots)
    // regions always available (survives tombstoning)
    var c = 0
    while (c < lay.regionsIdx.length) {
      feats(lay.regionsIdx(c)) =
        (if (e.regions != null && c < e.regions.length) e.regions(c).toDouble
         else null): Any
      c += 1
    }
    if (e.hasPixels)
      // canonical order so raw never clobbers intensity's shared names
      computeFeatures(e, channelNames, lay.typesOrdered, feats, lay.emitIdx)
    feats
  }

  /** extract features for one branch → DataFrame with the declared
    * schema */
  def extract(ds: Dataset[ImageEvent], channelNames: Seq[String],
      types: Seq[String], prefix: String = null): DataFrame = {
    val sch = schema(channelNames, types, prefix)
    val lay = layout(channelNames, types)
    val enc = org.apache.spark.sql.Encoders.row(sch)
    ds.map({ e =>
      Row.fromSeq(Seq[Any](e.path, e.idx, e.group, e.id) ++
        featureCells(e, channelNames, lay))
    })(enc)
  }

  /** all requested non-regions families for a pixel-bearing event,
    * written straight into `feats` through the layout's slot plan
    * (emission order per family == [[familyNames]] order — the
    * contract [[layout]] documents; later families overwrite shared
    * slots) */
  private def computeFeatures(e: ImageEvent, channelNames: Seq[String],
      types: Array[String], feats: Array[Any], emitIdx: Array[Int]): Unit = {
    val h = e.height; val w = e.width
    var k = 0
    def emit(v: Double): Unit = { feats(emitIdx(k)) = v; k += 1 }
    def emitAll(row: Array[Double]): Unit = {
      var i = 0
      while (i < row.length) { emit(row(i)); i += 1 }
    }
    types.foreach {
      case "bbox" =>
        emit(e.bboxMinr.toDouble)
        emit(e.bboxMinc.toDouble)
        emit(e.bboxMaxr.toDouble)
        emit(e.bboxMaxc.toDouble)

      case "shape" =>
        // combined first, then channels (features/shape.py:143-150)
        emitAll(shapeRow(e.combinedMaskBool, h, w))
        var c = 0
        while (c < channelNames.length) {
          val mp = e.maskPlane(c)
          emitAll(
            if (mp.exists(identity)) shapeRow(mp, h, w)
            else RegionProps.Names.indices.map(i =>
              if (i <= 10) 0.0 else Double.NaN).toArray)
          c += 1
        }

      case "raw" =>
        var c = 0
        while (c < channelNames.length) {
          emitAll(Stats.intensityRow(e.plane(c)))
          c += 1
        }

      case "intensity" =>
        var c = 0
        while (c < channelNames.length) {
          val rows = intensityViews(e, c)
          var v = 0
          while (v < 8) { emitAll(rows(v)); v += 1 }
          c += 1
        }

      case "texture" =>
        // combined mask is loop-invariant (one O(H*W) build, not C);
        // each channel plane copies once, not twice
        val texCombined = e.combinedMaskBool
        var c = 0
        while (c < channelNames.length) {
          val mp = e.maskPlane(c)
          val pl = e.plane(c)
          emitAll(
            if (mp.exists(identity)) textureRow(pl, mp, h, w)
            else Array.fill(texRowLen)(Double.NaN))
          emitAll(textureRow(pl, texCombined, h, w))
          c += 1
        }

      case "regions" => // handled by the caller's regionsIdx slots
      case other => throw new IllegalArgumentException(s"unknown family $other")
    }
  }

  /** mean-over-regions of the 59 regionprops (features/shape.py:
    * 115-123). Every prop is bbox-local/translation-invariant (exactly
    * how skimage regionprops crops each region), so regions are
    * cropped to their bboxes first — total cost O(image + Σ bbox)
    * instead of O(regions × image). */
  private def shapeRow(mask: Array[Boolean], h: Int, w: Int): Array[Double] = {
    val labels = Morphology.label(mask, h, w)
    val n = Morphology.labelCount(labels)
    // reference _row on an empty mask: regionprops_table yields empty
    // prop arrays and numpy.mean([]) = NaN for EVERY prop (the
    // combined row has no channel-style 0/NaN default split) — zeros
    // here polluted downstream aggregates as real measurements
    if (n == 0) return Array.fill(RegionProps.NumProps)(Double.NaN)
    // one pass: bbox per label
    val minR = Array.fill(n + 1)(h); val maxR = new Array[Int](n + 1)
    val minC = Array.fill(n + 1)(w); val maxC = new Array[Int](n + 1)
    var i = 0
    while (i < labels.length) {
      val l = labels(i)
      if (l > 0) {
        val r = i / w; val c = i % w
        if (r < minR(l)) minR(l) = r
        if (r > maxR(l)) maxR(l) = r
        if (c < minC(l)) minC(l) = c
        if (c > maxC(l)) maxC(l) = c
      }
      i += 1
    }
    val acc = new Array[Double](RegionProps.NumProps)
    var lbl = 1
    while (lbl <= n) {
      val bh = maxR(lbl) - minR(lbl) + 1
      val bw = maxC(lbl) - minC(lbl) + 1
      val m = new Array[Boolean](bh * bw)
      var r = 0
      while (r < bh) {
        var c = 0
        while (c < bw) {
          m(r * bw + c) = labels((minR(lbl) + r) * w + (minC(lbl) + c)) == lbl
          c += 1
        }
        r += 1
      }
      val row = RegionProps.compute(m, bh, bw)
      i = 0
      while (i < acc.length) { acc(i) += row(i); i += 1 }
      lbl += 1
    }
    i = 0
    while (i < acc.length) { acc(i) /= n; i += 1 }
    acc
  }

  /** the 8 intensity views of features/intensity.py:84-164 */
  private def intensityViews(e: ImageEvent, c: Int): Array[Array[Double]] = {
    val ps = e.planeSize
    val out = Array.fill(8)(new Array[Double](IntensityProps.length))
    val plane = e.plane(c)
    val mp = e.maskPlane(c)
    val cm = e.combinedMaskBool
    val bg = if (e.background != null) e.background(c) else 0.0
    val cbg = if (e.combinedBackground != null) e.combinedBackground(c) else 0.0

    def select(m: Array[Boolean]): Array[Float] = {
      var n = 0; var i = 0
      while (i < ps) { if (m(i)) n += 1; i += 1 }
      val v = new Array[Float](n)
      var j = 0; i = 0
      while (i < ps) { if (m(i)) { v(j) = plane(i); j += 1 }; i += 1 }
      v
    }
    def minus(v: Array[Float], b: Double): Array[Float] =
      v.map(x => (x - b).toFloat)

    if (mp.exists(identity)) {
      val mpx = select(mp)
      out(0) = Stats.intensityRow(mpx)
      out(1) = Stats.intensityRow(minus(mpx, bg))
      val edge = Morphology.edgeBand(mp, e.height, e.width, 6)
      if (edge.exists(identity)) {
        val epx = select(edge)
        out(2) = Stats.intensityRow(epx)
        out(3) = Stats.intensityRow(minus(epx, bg))
      } // else views 2..3 stay 0 (reference zeroes 2: before recomputing 4+)
    } // else views 0..3 stay 0
    val cpx = select(cm)
    out(4) = Stats.intensityRow(cpx)
    out(5) = Stats.intensityRow(minus(cpx, cbg))
    val cedge = Morphology.edgeBand(cm, e.height, e.width, 6)
    if (cedge.exists(identity)) {
      val cepx = select(cedge)
      out(6) = Stats.intensityRow(cepx)
      out(7) = Stats.intensityRow(minus(cepx, cbg))
    }
    out
  }

  val texRowLen: Int = Glcm.Props.length * 2 * GlcmDistances.length + 4

  private def textureNames(cname: String, prefix: String): Seq[String] =
    Glcm.Props.flatMap(p =>
      GlcmDistances.map(n => s"${prefix}glcm_mean_${p}_${n}_$cname") ++
        GlcmDistances.map(n => s"${prefix}glcm_std_${p}_${n}_$cname")) ++
      Seq(s"${prefix}sobel_mean_$cname", s"${prefix}sobel_std_$cname",
        s"${prefix}sobel_max_$cname", s"${prefix}sobel_min_$cname")

  /** GLCM + sobel stats over a masked view (features/texture.py:52-94):
    * quantize valid pixels to 15 levels (16 with the min-edge level),
    * invalid = -1 dropped pairwise; sobel stats over masked values */
  private def textureRow(plane: Array[Float], mask: Array[Boolean],
      h: Int, w: Int): Array[Double] = {
    val out = new Array[Double](texRowLen)
    // range over valid pixels
    var mn = Double.MaxValue; var mx = Double.MinValue
    var i = 0
    while (i < plane.length) {
      if (mask(i)) { val v = plane(i); if (v < mn) mn = v; if (v > mx) mx = v }
      i += 1
    }
    val levels = TextureBins + 1
    val q = new Array[Int](plane.length)
    val step = if (mx > mn) (mx - mn) / TextureBins else 1.0
    i = 0
    while (i < plane.length) {
      q(i) =
        if (!mask(i)) -1
        // an in-mask NaN (normalization of a constant/empty-extent
        // channel) digitizes into the reference's cropped top bin and
        // is DROPPED (texture.py: digitize right=True → level 16,
        // glcm[:-1,:-1]); ceil(NaN).toInt would quantize it to level 0
        // and concentrate the GLCM at (0,0)
        else if (plane(i).isNaN) -1
        else if (mx == mn) 0
        else {
          // digitize right=True over 16 equal edges: level = #edges < x
          val lv = math.ceil((plane(i) - mn) / step - 1e-9).toInt
          if (lv < 0) 0 else if (lv > TextureBins) TextureBins else lv
        }
      i += 1
    }
    // one matrix+properties pass per (distance, angle) — hoisted out of
    // the per-prop loop (recomputing the co-occurrence matrices per
    // property is |Props|× redundant work, O(H·W) each on real images)
    val perDistAll = GlcmDistances.map(d => Glcm.meanStdOverAngles(q, h, w, levels, d))
    var k = 0
    Glcm.Props.indices.foreach { p =>
      val perDist = perDistAll.map(_(p))
      perDist.foreach { ms => out(k) = ms._1; k += 1 }
      perDist.foreach { ms => out(k) = ms._2; k += 1 }
    }
    // sobel over the masked view, exactly as the reference: sobel runs
    // on the NaN-holed image (NaN propagates through the float window
    // arithmetic just like numpy) and the stats are nan-stats — only
    // pixels whose whole sobel window sits in-mask contribute
    // (features/texture.py:82-94, incl. the all-NaN -> NaN branch)
    val holed = new Array[Float](plane.length)
    i = 0
    while (i < plane.length) {
      holed(i) = if (mask(i)) plane(i) else Float.NaN
      i += 1
    }
    val s = Filters.sobel(holed, h, w)
    var sSum = 0.0; var sN = 0L; var sMax = Double.MinValue; var sMin = Double.MaxValue
    i = 0
    while (i < s.length) {
      if (!s(i).isNaN) {
        sSum += s(i); sN += 1
        if (s(i) > sMax) sMax = s(i)
        if (s(i) < sMin) sMin = s(i)
      }
      i += 1
    }
    if (sN == 0) {
      out(k) = Double.NaN; out(k + 1) = Double.NaN
      out(k + 2) = Double.NaN; out(k + 3) = Double.NaN
    } else {
      val sMean = sSum / sN
      var ss = 0.0
      i = 0
      while (i < s.length) {
        if (!s(i).isNaN) { val d = s(i) - sMean; ss += d * d }
        i += 1
      }
      out(k) = sMean
      out(k + 1) = math.sqrt(ss / sN)
      out(k + 2) = sMax
      out(k + 3) = sMin
    }
    out
  }
}
