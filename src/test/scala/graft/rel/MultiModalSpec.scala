package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultiModalSpec extends SparkSpec {

  /** Driver-side ground truth: luma of the formula pixel (no codec). */
  private def lumaF(seed: Long, x: Int, y: Int): Int =
    MultiModal.luma(MultiModal.pix(seed, x, y, 0),
      MultiModal.pix(seed, x, y, 1), MultiModal.pix(seed, x, y, 2))

  /** Driver-side ground truth: luma for a DOCUMENT pixel (dot logic). */
  private def lumaDoc(docId: Long, x: Int, y: Int): Int =
    if (MultiModal.hasDot(docId) && x == 0 && y == 0) 255
    else lumaF(MultiModal.seedOf(docId), x, y)

  test("PNG round-trip is pixel-exact against the formula (real codec)") {
    for (id <- Seq(0L, 7L, 13L, 63L)) {
      val img = MultiModal.decode(
        MultiModal.encodePng(MultiModal.renderFixture(id))).get
      assert(img.getWidth == MultiModal.widthOf(id))
      assert(img.getHeight == MultiModal.heightOf(id))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == MultiModal.pix(id, x, y, 0))
        assert(((rgb >> 8) & 0xff) == MultiModal.pix(id, x, y, 1))
        assert((rgb & 0xff) == MultiModal.pix(id, x, y, 2))
      }
    }
    // the planted dot overrides exactly one pixel of the doc render
    val dotted = MultiModal.decode(
      MultiModal.encodePng(MultiModal.renderDoc(9L))).get
    assert(dotted.getRGB(0, 0) == 0xffffffff.toInt)
    assert(dotted.getRGB(1, 0) ==
      MultiModal.decode(MultiModal.encodePng(MultiModal.renderDoc(1L)))
        .get.getRGB(1, 0)) // doc 9 = seed 1 + dot
  }

  test("extractMediaFeatures: real decode stats, schema, and tombstones") {
    import spark.implicits._
    val goodId = 5L
    val good = MultiModal.encodePng(MultiModal.renderFixture(goodId))
    val garbage = "definitely not an image".getBytes("UTF-8")
    val df = Seq((1L, good), (2L, null.asInstanceOf[Array[Byte]]),
      (3L, garbage)).toDF("id", "payload")
    val out = MultiModal.extractMediaFeatures(df)
    assert(out.columns.toSeq == Seq("id", "payload", "width", "height",
      "channels", "r_sum", "g_sum", "b_sum"))
    val rows = out.orderBy("id").collect()
    assert(rows.length == 3)
    // decoded stats equal the formula sums
    val w = MultiModal.widthOf(goodId); val h = MultiModal.heightOf(goodId)
    val expSums = (0 until 3).map(b =>
      (for (y <- 0 until h; x <- 0 until w)
        yield MultiModal.pix(goodId, x, y, b).toLong).sum)
    assert(rows(0).getInt(2) == w && rows(0).getInt(3) == h)
    assert(rows(0).getInt(4) == 3)
    assert(Seq(rows(0).getLong(5), rows(0).getLong(6), rows(0).getLong(7))
      == expSums)
    // tombstone contract: null payload AND undecodable payload keep
    // their rows with null metadata (SQL null propagation, not a fake
    // zero-sized decode)
    for (r <- Seq(rows(1), rows(2)); i <- 2 until 8) assert(r.isNullAt(i))
  }

  test("m01: Spark md5(hex(bytes)) matches a JVM replay over the same files") {
    // pins the cross-engine fingerprint convention (uppercase hex →
    // md5 → lowercase hex digest) that the DuckDB oracle relies on
    val got = SparkEntryQuery("m01_binary_meta")
    assert(got.length == MultiModal.FixtureImages)
    val md = java.security.MessageDigest.getInstance("MD5")
    for (r <- got) {
      val path = java.nio.file.Paths.get(MultiModal.pngFixtureDir,
        f"img_${r.getLong(0)}%04d.png")
      val bytes = java.nio.file.Files.readAllBytes(path)
      assert(r.getLong(1) == bytes.length)
      val hexUpper = bytes.map(b => f"${b & 0xff}%02X").mkString
      val dig = md.digest(hexUpper.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      md.reset()
      assert(r.getString(2) == dig, s"md5 mismatch for img ${r.getLong(0)}")
    }
  }

  private def SparkEntryQuery(name: String) =
    MultiModal.all.find(_.name == name).get.fn(spark, sfDir).collect()

  test("m02: decoded band sums over the fixture scan match the formula") {
    val got = SparkEntryQuery("m02_media_features")
    assert(got.length == MultiModal.FixtureImages)
    for (r <- got) {
      val id = r.getLong(0)
      val w = MultiModal.widthOf(id); val h = MultiModal.heightOf(id)
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getInt(3) == 3)
      val exp = (0 until 3).map(b =>
        (for (y <- 0 until h; x <- 0 until w)
          yield MultiModal.pix(id, x, y, b).toLong).sum)
      assert(Seq(r.getLong(4), r.getLong(5), r.getLong(6)) == exp,
        s"band sums diverge for img $id")
    }
  }

  test("m03: sampled frame luma sums incl. partial tails match the formula") {
    val got = SparkEntryQuery("m03_frame_sample")
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    var expected = Map.empty[(Long, Long), Long]
    var sawPartialTail = false
    for (id <- 0L until MultiModal.FixtureImages.toLong) {
      val w = MultiModal.widthOf(id); val h = MultiModal.heightOf(id)
      val nFrames = (h + 7) / 8
      if (h % 8 != 0 && (nFrames - 1) % 2 == 0) sawPartialTail = true
      for (f <- 0 until nFrames by 2) {
        val sum = (for (y <- f * 8 until math.min(f * 8 + 8, h);
                        x <- 0 until w) yield lumaF(id, x, y).toLong).sum
        expected += (id, f.toLong) -> sum
      }
    }
    assert(sawPartialTail, "fixture must exercise a partial tail frame")
    assert(got == expected)
  }

  test("m04: decoded 8x8 thumbnails match the formula (sum + weighted sum)") {
    val got = SparkEntryQuery("m04_resize_thumb")
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(got.length == nDocs)
    for (r <- got.take(60)) {
      val id = r.getLong(0)
      val s = MultiModal.seedOf(id)
      val w = MultiModal.widthOf(s); val h = MultiModal.heightOf(s)
      var sum = 0L; var wsum = 0L
      for (j <- 0 until 64) {
        val l = lumaDoc(id, ((j % 8) * w) / 8, ((j / 8) * h) / 8)
        sum += l; wsum += (j + 1).toLong * l
      }
      assert(r.getInt(1) == 64)
      assert(r.getLong(2) == sum && r.getLong(3) == wsum,
        s"thumbnail diverges for doc $id")
    }
  }

  /** Formula replay of the full m05 fingerprint (no codec). */
  private def pHashFormula(docId: Long): Long = {
    val g = MultiModal.PHashGrid
    val s = MultiModal.seedOf(docId)
    val w = MultiModal.widthOf(s); val h = MultiModal.heightOf(s)
    val grid = Array.tabulate[Byte](g * g) { k =>
      lumaDoc(docId, ((k % g) * w) / g, ((k / g) * h) / g).toByte
    }
    MultiModal.pHash60(grid).get
  }

  test("m05: decoded fingerprints match the formula; partner counts agree with brute force") {
    val docIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val exp = docIds.map(id => (id, pHashFormula(id)))
    val got = MultiModal.perceptualNearDup(spark, sfDir, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => (t._1, t._2)).toSeq == exp.toSeq)
    // brute-force partner counts over the full pair space
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (i <- exp.indices; j <- (i + 1) until exp.length)
      if (java.lang.Long.bitCount(exp(i)._2 ^ exp(j)._2) <= 3) {
        counts(exp(i)._1) += 1; counts(exp(j)._1) += 1
      }
    assert(got.map(t => (t._1, t._3)).toSeq == exp.map(t => (t._1, counts(t._1))).toSeq)
    // the planted structure produces live pairs: doc k and k+16 render
    // identically (hamming 0), k and k+8 differ by one grid sample
    for (k <- 0L until 8L) {
      assert(pHashFormula(k) == pHashFormula(k + 16))
      assert(java.lang.Long.bitCount(pHashFormula(k) ^ pHashFormula(k + 8)) <= 1)
      assert(counts(k) >= 1, s"doc $k found no partners")
    }
  }

  test("m06: WAV round-trip decodes the exact PCM formula (real codec)") {
    for (id <- Seq(0L, 5L, 123L, 4999L)) {
      val m = MultiModal.decodeWav(MultiModal.encodeWav(id)).get
      assert(m.n_samples == MultiModal.audioLen(id))
      assert(m.sample_rate == 8000 && m.channels == 1)
      val xs = (0 until MultiModal.audioLen(id)).map(MultiModal.pcm(id, _))
      assert(m.sum_amp == xs.map(_.toLong).sum)
      assert(m.sum_abs == xs.map(x => math.abs(x.toLong)).sum)
      assert(m.peak == xs.map(x => math.abs(x.toLong)).max)
      val zc = (1 until xs.length).count(t => (xs(t) < 0) != (xs(t - 1) < 0))
      assert(m.zero_cross == zc.toLong)
    }
    // tombstone: non-WAV bytes decode to None, not a crash
    assert(MultiModal.decodeWav("definitely not audio".getBytes("UTF-8")).isEmpty)
  }

  test("m05: planted near-dup payloads are discovered through band blocking") {
    import spark.implicits._
    // n=122 puts sample point i at byte 2i; mutating one sample-point
    // byte touches at most its two adjacent comparisons (bits i-1, i).
    // Zeroing bytes 4 and 10 flips exactly the [p2<p4] and [p8<p10]
    // comparisons (both true in base, both false at 0) while leaving
    // [p4<p6]/[p10<p12] true -> hamming exactly 2, <= 3 by construction
    val base = Array.tabulate[Byte](122)(i => ((i * 37 + 11) % 251).toByte)
    val near = base.clone()
    near(4) = 0
    near(10) = 0
    val far = Array.tabulate[Byte](122)(i => ((i * 101 + 7) % 249).toByte)
    val ph = Seq(base, near, far).map(p => MultiModal.pHash60(p).get)
    val hamNear = java.lang.Long.bitCount(ph(0) ^ ph(1))
    assert(hamNear >= 1 && hamNear <= 3, s"planted pair at hamming $hamNear")
    assert(java.lang.Long.bitCount(ph(0) ^ ph(2)) > 3, "far payload too close")
    val hashes = Seq((1L, ph(0)), (2L, ph(1)), (3L, ph(2))).toDS()
    val pairs = MultiModal.pHashPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, hamNear.toLong)),
      s"expected exactly the planted pair, got $pairs")
  }

  test("m07 audio fingerprint: real RIFF round-trip, content-keyed groups, driver replay") {
    import spark.implicits._
    // the real container round-trip is sample-exact against the formula
    for (ck <- Seq(0L, 3L, 5L, 99L)) {
      val s = MultiModal.decodeWavSamples(MultiModal.encodeContentWav(ck)).get
      assert(s.length == MultiModal.audioLen2(ck))
      s.indices.foreach(t => assert(s(t) == MultiModal.pcm2(ck, t)))
    }
    // fingerprint is a pure function of content: identical PCM → equal
    val fpOf = (0L until 100L).map { ck =>
      ck -> MultiModal.audioFingerprint(
        MultiModal.decodeWavSamples(MultiModal.encodeContentWav(ck)).get)
    }.toMap
    assert(fpOf(5L) == MultiModal.audioFingerprint(
      MultiModal.decodeWavSamples(MultiModal.encodeContentWav(5L)).get))
    // distinct content rarely collides (3 bits/frame over 2-8 frames is
    // a COARSE robust hash — some collisions are inherent; require the
    // overwhelming majority separate)
    assert(fpOf.values.toSet.size >= 80, s"only ${fpOf.values.toSet.size}")
    // the distributed grouping equals a full driver replay
    val ids = Tables.documents(spark, sfDir).select("doc_id").as[Long]
      .collect().toSeq
    val expected = ids.groupBy(id => fpOf(MultiModal.audioContentKey(id)))
      .map { case (fp, g) => (fp, g.size.toLong, g.min) }.toSet
    val got = MultiModal.all.find(_.name == "m07_audio_fingerprint").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // duplicates exist and group: at least one multi-copy fingerprint
    assert(got.exists(_._2 > 1), "no duplicate recordings grouped")
  }

  test("m08 animated-GIF round-trip is frame- and pixel-exact; keyframe query matches replay") {
    import spark.implicits._
    // the real sequence writer/reader round-trip: frame count from the
    // reader's own container walk, every pixel of every frame exact
    for (id <- Seq(0L, 1L, 7L, 42L)) {
      val frames = MultiModal.decodeGifFrames(MultiModal.encodeGif(id)).get
      assert(frames.length == MultiModal.videoFrameCount(id))
      frames.zipWithIndex.foreach { case (img, f) =>
        assert(img.getWidth == MultiModal.VideoW)
        assert(img.getHeight == MultiModal.VideoH)
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
          assert((img.getRGB(x, y) & 0xff) == MultiModal.videoPx(id, f, x, y),
            s"id=$id f=$f ($x,$y)")
      }
    }
    // distributed result equals a full driver replay from the formula
    val ids = Tables.documents(spark, sfDir).select("doc_id").as[Long]
      .collect().toSeq
    val expected = (for {
      id <- ids
      nf = MultiModal.videoFrameCount(id).toLong
      f <- 0L until nf by 2
    } yield (id, nf, f,
      (for (y <- 0 until MultiModal.VideoH; x <- 0 until MultiModal.VideoW)
        yield MultiModal.videoPx(id, f.toInt, x, y).toLong).sum)).toSet
    val got = MultiModal.all.find(_.name == "m08_video_keyframes").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }

  test("m07/m08 decoders tombstone corrupt payloads; fingerprint rejects ragged frames") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37 + 5).toByte)
    assert(MultiModal.decodeWavSamples(junk).isEmpty)
    assert(MultiModal.decodeWavSamples(Array.emptyByteArray).isEmpty)
    assert(MultiModal.decodeGifFrames(junk).isEmpty)
    assert(MultiModal.decodeGifFrames(Array.emptyByteArray).isEmpty)
    // a TRUNCATED but header-valid container must not decode silently
    val wav = MultiModal.encodeContentWav(3L)
    val gif = MultiModal.encodeGif(3L)
    assert(MultiModal.decodeGifFrames(gif.take(gif.length / 2)).isEmpty ||
      MultiModal.decodeGifFrames(gif.take(gif.length / 2)).get.nonEmpty,
      "truncated GIF neither tombstoned nor partially decoded")
    // fingerprint contract: whole 256-sample frames only
    intercept[IllegalArgumentException] {
      MultiModal.audioFingerprint(new Array[Int](300))
    }
    // valid decode is unaffected by the guards
    assert(MultiModal.decodeWavSamples(wav).get.length ==
      MultiModal.audioLen2(3L))
  }

  test("m09 JPEG: real lossy round-trip keeps dims exact and distortion well inside the envelope") {
    // measured headroom: the registry gate uses MAE <= 8 / PSNR >= 25;
    // pin the actual distortion much tighter here so codec drift (a
    // different quantization table, a broken band order) surfaces as a
    // spec failure even while the generous gate still passes
    var worstMae = 0.0; var worstPsnr = Double.PositiveInfinity
    for (id <- 0L until 64L) {
      val dec = MultiModal.decode(
        MultiModal.encodeJpeg(MultiModal.renderSmooth(id), 0.9f)).get
      val seed = MultiModal.seedOf(id)
      assert(dec.getWidth == MultiModal.widthOf(seed))
      assert(dec.getHeight == MultiModal.heightOf(seed))
      val (mae, psnr) = MultiModal.jpegDistortion(id, dec)
      worstMae = math.max(worstMae, mae)
      worstPsnr = math.min(worstPsnr, psnr)
    }
    info(f"measured worst MAE $worstMae%.3f, worst PSNR $worstPsnr%.1f dB")
    assert(worstMae <= 3.0, s"MAE drifted: $worstMae")
    assert(worstPsnr >= 35.0, s"PSNR drifted: $worstPsnr")
    // registry query: every flag green, dims match the formula
    val got = MultiModal.all.find(_.name == "m09_jpeg_decode").get
      .fn(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(3) == 1L && r.getLong(4) == 1L && r.getLong(5) == 1L,
        s"flags off for doc ${r.getLong(0)}")
    }
  }

  test("m10: corrupt-payload classes tombstone fully; valid classes decode fully") {
    // the registry gate checks counts against DuckDB; this pins the
    // CLASS semantics directly — both corrupt constructions really
    // exercise distinct tombstone paths (truncated PNG = reader throws,
    // delta-7 bytes = no reader matches), and no row is ever dropped
    val truncated = java.util.Arrays.copyOf(
      MultiModal.encodePng(MultiModal.renderDoc(5L)), 24)
    assert(MultiModal.decode(truncated).isEmpty, "truncated PNG must tombstone")
    val garbage = Array.tabulate(64)(i => ((11L * 31 + i * 7) % 251).toByte)
    assert(MultiModal.decode(garbage).isEmpty, "delta-7 bytes must tombstone")

    val out = MultiModal.all.find(_.name == "m10_decode_tombstones").get
      .fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L))
    out.foreach { case (cls, (n, tomb, dec)) =>
      assert(tomb + dec == n, s"class $cls dropped rows: $n != $tomb+$dec")
      if (cls < 2) assert(tomb == n && dec == 0L,
        s"corrupt class $cls decoded $dec rows")
      else assert(dec == n && tomb == 0L,
        s"valid class $cls tombstoned $tomb rows")
    }
  }

  test("m13: header-only parse equals the full decode, and rejects non-PNG bytes") {
    // the fast path must agree with the slow path it replaces: for a
    // sample of real encoder outputs, IHDR-parsed dims == full-decode
    // dims, and the format constants match the encoder contract
    for (id <- Seq(0L, 7L, 13L, 63L, 500L)) {
      val payload = MultiModal.encodePng(MultiModal.renderDoc(id))
      val (w, h, depth, ct) = MultiModal.pngHeader(payload)
        .getOrElse(fail(s"encoder output for doc $id not header-parseable"))
      val img = MultiModal.decode(payload).get
      assert((w, h) == (img.getWidth, img.getHeight), s"doc $id dims")
      assert(depth == 8 && ct == 2, s"doc $id format ($depth, $ct)")
    }
    // malformed containers return None, never throw: too short, bad
    // signature, signature without IHDR first
    assert(MultiModal.pngHeader(Array[Byte](1, 2, 3)).isEmpty)
    assert(MultiModal.pngHeader(Array.fill[Byte](64)(0x42)).isEmpty)
    val sigOnly = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++ Array.fill[Byte](40)(0)
    assert(MultiModal.pngHeader(sigOnly).isEmpty)
    // a signature-valid payload whose IHDR declares the wrong length
    // (spec says exactly 13) is malformed even though the type bytes
    // match — the parser must reject it, not trust the dims
    val badLen = MultiModal.encodePng(MultiModal.renderDoc(0L)).clone()
    badLen(11) = 14.toByte // length 13 -> 14 (bytes 8-11 big-endian)
    assert(MultiModal.pngHeader(badLen).isEmpty)
  }

  test("m11: planted partner videos are the ONLY near-dups, at the designed Jaccard") {
    // the registry gate hash-checks the pair list against the DuckDB
    // pixel replay; this pins the CONSTRUCTION claim: every reported
    // pair is a (ck, ck+30) partner with Jaccard exactly (nf-1)/(nf+1),
    // every partner whose both sides exist in the corpus is reported,
    // and nothing else is.
    import org.apache.spark.sql.functions.col
    val docIds = graft.rel.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val cks = docIds.map(MultiModal.videoContentKey).toSet
    val keeper = docIds.groupBy(MultiModal.videoContentKey)
      .map { case (ck, ids) => ck -> ids.min }
    val expected = (0L until 30L).flatMap { c =>
      if (cks.contains(c) && cks.contains(c + 30)) {
        val ks = Seq(keeper(c), keeper(c + 30)).sorted
        val nf = MultiModal.nearFrameCount(c)
        Some((ks(0), ks(1)) ->
          BigDecimal((nf - 1).toDouble / (nf + 1).toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      } else None
    }.toMap
    val got = MultiModal.all.find(_.name == "m11_video_neardup").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(got.keySet == expected.keySet,
      s"pair set mismatch: got ${got.keySet}, want ${expected.keySet}")
    expected.foreach { case (k, j) =>
      assert(math.abs(got(k) - j) < 1e-9, s"pair $k jacc ${got(k)} != $j")
    }
    assert(got.nonEmpty, "no planted pairs present at this sf")
  }
}
