package graft.rel

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing over REAL image payloads: image bytes are
  * genuine PNG streams, decoded executor-side with `javax.imageio` (the
  * same codec stack `sources/Tiff.scala` uses for the reference's TIFF
  * loader, /root/reference/src/scip/loading/tiff.py:45-77), modeled as
  * opaque `BinaryType` columns processed by batched partition-level
  * functions (`mapPartitions` — the JVM analogue of `mapInPandas`).
  *
  * ORACLE DESIGN: every image's pixels are a pure integer function of
  * its id ([[pix]]), so DuckDB can recompute the expected decode output
  * (dims, per-band sums, luminance thumbnails, perceptual hashes) from
  * first principles — arithmetic only, no codec — while the Spark side
  * travels the full real path: render → PNG encode → (disk for the
  * fixture scans) → ImageIO decode → stats. A decoder that mangled any
  * pixel would hash-mismatch the formula replay. The SQL snippets are
  * generated from the same Scala constants ([[pixSql]]/[[lumaSql]]) so
  * the two sides cannot drift silently.
  */
object MultiModal {

  // One-time JVM codec config: never spill ImageIO scratch to disk —
  // decode hot loops must stay in-memory on executors.
  ImageIO.setUseCache(false)

  // ------------------------------------------------------------------
  // Deterministic image corpus (ground truth shared with the oracles)
  // ------------------------------------------------------------------

  /** Image dims as a function of the render seed (20..32 × 16..26 —
    * deliberately non-square and varied so resize/stride bugs show). */
  def widthOf(seed: Long): Int = 20 + (seed % 13).toInt
  def heightOf(seed: Long): Int = 16 + ((seed * 7) % 11).toInt

  /** Ground-truth pixel value in 0..255 — pure integer arithmetic,
    * replicated verbatim in the DuckDB oracles via [[pixSql]].
    *
    * The last term is a Knuth-multiply of the seed read through a
    * POSITION-DEPENDENT bit window (shift varies with x/y/band). It
    * exists because the original all-linear form was degenerate for
    * gradient-sign fingerprints: in any luma DIFFERENCE between two
    * pixels of the same image the seed·31 term cancels (mod
    * wraparound aside), so m05's 60-bit pHash collapsed to the 143
    * (w, h) dimension classes and the true near-dup structure went
    * quadratic at the 100× replica — a fixture artifact, not an
    * engine property. With the windowed term the seed survives
    * differencing: 499,990 distinct fingerprints across 500k docs
    * (replica scale), the planted trios the ONLY equal-hash groups,
    * zero accidental Hamming≤3 pairs, hottest pHash band bucket 574
    * docs (guard ceiling 4096). seed·2654435761 ≤ ~2⁵⁴ for any
    * realistic replica, so the Long/BIGINT product never overflows
    * and `>>` on the non-negative value is floor division in both
    * engines. */
  def pix(seed: Long, x: Int, y: Int, band: Int): Int =
    ((seed * 31 + x * 7 + y * 13 + band * 101 + (x * y) % 17 +
      ((seed * 2654435761L) >> ((x + 2 * y + band) % 48))) % 256).toInt

  /** ITU-R 601 integer luma (floor division, both engines). */
  def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000
  def lumaOf(rgb: Int): Int =
    luma((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)

  /** Near-dup planting for the document-derived corpus (m04/m05):
    * doc_ids 0..23 collapse onto 8 render seeds (three identical
    * copies of each base image), and the middle copy (8..15) carries a
    * one-pixel bright "dot" at the origin — a Hamming ≤ 1 perturbation
    * of the perceptual hash (grid sample 0 feeds only hash bit 0). All
    * other doc_ids render unique images, so bucket sizes stay O(1) at
    * any corpus scale. */
  def seedOf(docId: Long): Long = if (docId < 24) docId % 8 else docId
  def hasDot(docId: Long): Boolean = docId >= 8 && docId < 16

  /** Render the RGB image for a fixture id (plain formula, no dot). */
  def renderFixture(imgId: Long): BufferedImage = render(imgId, dot = false)

  /** Render the RGB image for a document id (seed collapse + dot). */
  def renderDoc(docId: Long): BufferedImage =
    render(seedOf(docId), dot = hasDot(docId))

  private def render(seed: Long, dot: Boolean): BufferedImage = {
    val w = widthOf(seed); val h = heightOf(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb =
          if (dot && x == 0 && y == 0) 0xffffff
          else (pix(seed, x, y, 0) << 16) | (pix(seed, x, y, 1) << 8) |
            pix(seed, x, y, 2)
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Real PNG encode (lossless, so decode must return [[pix]] exactly). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "PNG", bos), "no PNG writer available")
    bos.toByteArray
  }

  /** Header-ONLY PNG metadata: (width, height, bitDepth, colorType)
    * parsed directly from the container bytes — the 8-byte signature
    * then the mandatory first chunk (IHDR: 4-byte length, 4-byte
    * type, 13-byte payload with big-endian dims). No decompression,
    * no reader dispatch, no pixel pass: O(33 bytes) per payload
    * regardless of image size — the fast path a metadata-only query
    * takes at 100 TB instead of [[decode]]'s full inflate. None on
    * anything that isn't a signature-valid PNG with IHDR first (the
    * spec requires IHDR first, so a None here is a malformed file,
    * not a miss). */
  def pngHeader(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    def be(off: Int): Int =
      ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
        ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
    if (p.length < 33 || !sig.indices.forall(i => (p(i) & 0xff) == sig(i))) None
    else if (be(8) != 13) None // IHDR payload is exactly 13 bytes by spec
    else if (!(p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')) None
    else Some((be(16), be(20), p(24) & 0xff, p(25) & 0xff))
  }

  /** Real PNG/JPEG/BMP/... decode — container sniffing is ImageIO's;
    * unrecognized bytes decode to None (tombstone contract). NonFatal,
    * not just IIOException: sniffing dispatches to every installed
    * reader, and a valid magic over corrupt data (e.g. 'GIF89a' +
    * garbage LZW) can surface as AIOOBE/IllegalArgument from inside a
    * reader — those are tombstones too, not task failures. */
  def decode(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------------
  // SQL replicas of the ground-truth formulas (oracle generators)
  // ------------------------------------------------------------------

  /** DuckDB expression for [[pix]](seed=`s`, x, y, band). All BIGINT
    * arithmetic; `//` is floor division on the non-negative operands
    * used here, matching JVM `/` on non-negative ints. */
  private def pixSql(s: String, x: String, y: String, band: Int): String =
    s"((($s)*31 + ($x)*7 + ($y)*13 + ${band * 101} + (($x)*($y))%17 + " +
      s"((($s)*2654435761) >> ((($x) + 2*($y) + $band) % 48))) % 256)"

  /** DuckDB expression for [[luma]] of the formula pixel at (x, y). */
  private def lumaSql(s: String, x: String, y: String): String =
    s"((299*${pixSql(s, x, y, 0)} + 587*${pixSql(s, x, y, 1)} + " +
      s"114*${pixSql(s, x, y, 2)})//1000)"

  /** [[lumaSql]] with the document-corpus dot override (columns `sd`,
    * `dot`, `w`, `h` in scope). The dot pixel is (255,255,255), whose
    * luma is exactly 255 under the integer 299/587/114 weights. */
  private def lumaDocSql(x: String, y: String): String =
    s"(CASE WHEN dot = 1 AND ($x) = 0 AND ($y) = 0 THEN 255 " +
      s"ELSE ${lumaSql("sd", x, y)} END)"

  /** Shared oracle CTE: per-document seed, dot flag, and dims. */
  private val docDimsCte: String =
    """d AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id < 24 THEN doc_id % 8 ELSE doc_id END AS sd,
      |         CASE WHEN doc_id >= 8 AND doc_id < 16 THEN 1 ELSE 0 END AS dot,
      |         20 + (CASE WHEN doc_id < 24 THEN doc_id % 8 ELSE doc_id END) % 13 AS w,
      |         16 + ((CASE WHEN doc_id < 24 THEN doc_id % 8 ELSE doc_id END)*7) % 11 AS h
      |  FROM documents)""".stripMargin

  /** Shared oracle CTE: per-fixture-image id and dims. */
  private def fixtureDimsCte(n: Int): String =
    s"""d AS (
       |  SELECT unnest(generate_series(0, ${n - 1})) AS img_id),
       |dd AS (
       |  SELECT img_id, CAST(20 + img_id % 13 AS BIGINT) AS w,
       |         CAST(16 + (img_id*7) % 11 AS BIGINT) AS h
       |  FROM d)""".stripMargin

  // ------------------------------------------------------------------
  // On-disk PNG fixture (the binary-file scan path)
  // ------------------------------------------------------------------

  /** Fixture corpus size. 64 images × ≤32×26 px — big enough that every
    * (width, height) residue class occurs, small enough that the
    * oracle's arithmetic replay stays trivial. */
  val FixtureImages = 64

  /** Deterministic on-disk PNG corpus (`img_0000.png`..): written once
    * per machine via the crash-safe [[Fixtures.ensure]] rename pattern;
    * content is a pure function of [[pix]], and the oracle reads THE
    * SAME files via DuckDB `read_blob`, so the byte-level checks (m01)
    * are over identical physical bytes. Fixed path, not tmpdir-config
    * dependent — same rationale as PipelineQueries.sourceFixtures. */
  lazy val pngFixtureDir: String = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get("/tmp", "graft-img-fixtures")
    Files.createDirectories(root)
    // v2: the pixel formula gained the seed-windowed term (see [[pix]])
    // — a versioned directory name so a cached v1 fixture from an
    // earlier process can never green-wash against the new oracles
    Fixtures.ensure(root.resolve("png-v2")) { dir =>
      Files.createDirectories(dir)
      for (k <- 0 until FixtureImages)
        Files.write(dir.resolve(f"img_$k%04d.png"),
          encodePng(renderFixture(k.toLong)))
    }.toString
  }

  /** The fixture scan: Spark's `binaryFile` source (path, length,
    * content) with the image id recovered from the filename — the same
    * regex→meta discipline as the loader sources (SURVEY S9). */
  private def scanPngFixtures(s: SparkSession): DataFrame =
    s.read.format("binaryFile").load(pngFixtureDir)
      .select(
        regexp_extract(col("path"), "img_(\\d+)\\.png", 1)
          .cast("long").as("img_id"),
        col("length").as("n_bytes"),
        col("content").as("payload"))

  // ------------------------------------------------------------------
  // Batched decode plumbing
  // ------------------------------------------------------------------

  /** Typed metadata emitted by the real decoder. */
  case class MediaMeta(width: Int, height: Int, channels: Int,
      r_sum: Long, g_sum: Long, b_sum: Long)

  /** Decode one payload to per-band statistics. */
  def decodeStats(payload: Array[Byte]): Option[MediaMeta] =
    decode(payload).map { img =>
      val w = img.getWidth; val h = img.getHeight
      var rs = 0L; var gs = 0L; var bs = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff; bs += rgb & 0xff
          x += 1
        }
        y += 1
      }
      MediaMeta(w, h, img.getColorModel.getNumComponents, rs, gs, bs)
    }

  /** Batched feature extraction over a binary column: the decoder runs
    * once per row inside a partition-level pass (one codec context per
    * partition — the executor-singleton pattern for model handles,
    * segmentation/cellpose.py:70-79 in the reference). Schema-append:
    * every input column survives, decode metadata lands alongside.
    * Tombstone contract: a null OR undecodable payload keeps its row
    * with null metadata — SQL null propagation, not a fake decode. */
  def extractMediaFeatures(df: DataFrame): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType), StructField("r_sum", LongType),
      StructField("g_sum", LongType), StructField("b_sum", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](payloadIdx)
        val extras = Option(p).flatMap(decodeStats) match {
          case Some(m) =>
            Seq[Any](m.width, m.height, m.channels, m.r_sum, m.g_sum, m.b_sum)
          case None => Seq[Any](null, null, null, null, null, null)
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ extras)
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // Perceptual hashing (dHash family) over decoded pixels
  // ------------------------------------------------------------------

  /** dHash-style perceptual fingerprint: 60 ordered sample points at
    * offsets ⌊i·n/61⌋ (i = 0..60) of a byte sequence, bit i =
    * [p(i) < p(i+1)]. 60 bits (not 64) keeps the value strictly
    * positive in a signed 64-bit lane, so the DuckDB replay (BIGINT
    * shifts) agrees bit-for-bit. None for empty sequences. */
  private[rel] def pHash60(p: Array[Byte]): Option[Long] = {
    val n = p.length.toLong
    if (n < 1) return None
    var out = 0L
    var i = 0
    while (i < 60) {
      val a = p(((i.toLong * n) / 61).toInt) & 0xff
      val b = p((((i + 1).toLong * n) / 61).toInt) & 0xff
      if (a < b) out |= (1L << i)
      i += 1
    }
    Some(out)
  }

  /** Perceptual-hash grid edge: 16×16 nearest-neighbor luminance. */
  val PHashGrid = 16

  /** The real-pixel perceptual hash: decode → nearest-neighbor resample
    * to a 16×16 luminance grid (x = ⌊gx·w/16⌋, y = ⌊gy·h/16⌋) →
    * [[pHash60]] over the 256-byte row-major grid. This is the actual
    * aHash/dHash recipe (resize, grayscale, gradient sign). */
  def pHashImage(img: BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val g = PHashGrid
    val grid = new Array[Byte](g * g)
    var gy = 0
    while (gy < g) {
      var gx = 0
      while (gx < g) {
        grid(gy * g + gx) =
          lumaOf(img.getRGB((gx * w) / g, (gy * h) / g)).toByte
        gx += 1
      }
      gy += 1
    }
    pHash60(grid).get // g*g = 256 >= 1 always
  }

  /** Candidate pairs at Hamming ≤ maxHamming from a (doc_id, ph)
    * fingerprint set, via 4×15-bit pigeonhole band blocking (shuffle
    * carries 8-byte band keys + the signature, never payloads; the
    * exact bit_count verify runs in-bucket). */
  private[rel] def pHashPairs(hashes: Dataset[(Long, Long)],
      maxHamming: Int): DataFrame = {
    // 4 × 15-bit bands cover exactly Hamming <= 3 (pigeonhole); a
    // larger radius would silently lose candidates
    require(maxHamming <= 3,
      s"4-band pHash blocking supports maxHamming <= 3, got $maxHamming")
    val spark = hashes.sparkSession
    import spark.implicits._
    hashes
      .flatMap { case (id, ph) =>
        (0 until 4).iterator.map { c =>
          ((c.toLong << 15) | ((ph >>> (c * 15)) & 0x7fffL), id, ph)
        }
      }
      .toDF("bucket", "doc_id", "ph")
      .groupBy("bucket")
      .agg(collect_list(struct(col("doc_id"), col("ph"))).as("xs"))
      .where(size(col("xs")) > 1)
      .as[(Long, Seq[(Long, Long)])]
      .flatMap { case (_, xs) =>
        require(xs.length <= Dedup.MaxBucketDocs,
          s"pHash band bucket of ${xs.length} docs exceeds " +
            s"${Dedup.MaxBucketDocs} — near-constant fingerprints " +
            "(e.g. mass flat-color images) need a pre-filter")
        val s = xs.sortBy(_._1)
        for {
          i <- s.indices.iterator
          j <- (i + 1) until s.length
          h = java.lang.Long.bitCount(s(i)._2 ^ s(j)._2)
          if h <= maxHamming && s(i)._1 != s(j)._1
        } yield (s(i)._1, s(j)._1, h)
      }
      .toDF("da", "db", "h")
      .select(col("da"), col("db"), col("h").cast("long").as("hamming"))
      .distinct()
  }

  /** The per-document PNG payload column: render from the doc_id
    * formula, REAL PNG encode. At 100 TB the payload would arrive from
    * storage instead; everything downstream of the `payload` column is
    * the path a real corpus would take. */
  private def docPayloads(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, encodePng(renderDoc(id)))))
      .toDF("doc_id", "payload")
  }

  /** Image near-dup via perceptual hash over REAL decoded pixels (see
    * the m05 registry comment). Emits ONE ROW PER DOC — (doc_id, ph,
    * n_partners) — not just the pair list: per-doc fingerprints keep
    * every one of the n hash values under the hash gate regardless of
    * pair structure (a pairs-only result would be vacuously green on a
    * pair-free corpus even if the fingerprints diverged). */
  def perceptualNearDup(spark: SparkSession, dir: String,
      maxHamming: Int): DataFrame = {
    import spark.implicits._
    // ONE corpus pass computes the fingerprints (encode→decode→hash);
    // the lineage cut materializes 16 B/doc and feeds both the per-doc
    // base and the blocking pass, instead of re-decoding per consumer
    val base = Lineage.cut(docPayloads(spark, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val img = decode(p).getOrElse(
          sys.error(s"undecodable PNG payload for doc $id"))
        (id, pHashImage(img))
      })
      .toDF("doc_id", "ph"))
    val pairs = pHashPairs(base.as[(Long, Long)], maxHamming)
    val partners = pairs.select(col("da").as("doc_id"))
      .unionAll(pairs.select(col("db").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_partners"))
    base.join(partners, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ph"),
        coalesce(col("n_partners"), lit(0L)).as("n_partners"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Audio modality: REAL WAV codec (javax.sound.sampled)
  // ------------------------------------------------------------------

  /** Samples per document: 800..1056 (varied so frame math can't
    * assume a fixed length). */
  def audioLen(docId: Long): Int = 800 + (docId % 257).toInt

  /** Ground-truth PCM sample in -32768..32767 — pure integer
    * arithmetic, replicated in the m06 oracle. */
  def pcm(docId: Long, t: Int): Int =
    ((docId * 31 + t.toLong * 17) % 65536).toInt - 32768

  /** Real WAV encode: 16-bit signed little-endian mono PCM at 8 kHz
    * through the actual RIFF container writer. */
  def encodeWav(docId: Long): Array[Byte] = {
    import javax.sound.sampled._
    val n = audioLen(docId)
    val raw = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s = pcm(docId, t)
      raw(2 * t) = (s & 0xff).toByte
      raw(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Typed metadata from the real WAV decode. */
  case class AudioMeta(n_samples: Long, sample_rate: Int, channels: Int,
      sum_amp: Long, sum_abs: Long, peak: Long, zero_cross: Long)

  /** Real WAV decode: container parse via AudioSystem (header,
    * format, frame stream), then integer features over the PCM
    * samples. None for unparseable payloads (tombstone contract). */
  def decodeWav(payload: Array[Byte]): Option[AudioMeta] =
    try {
      import javax.sound.sampled._
      val ais = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"unexpected WAV format $fmt")
      val bytes = ais.readAllBytes()
      ais.close()
      val n = bytes.length / 2
      var sum = 0L; var sabs = 0L; var peak = 0L; var zc = 0L
      var prev = 0
      var t = 0
      while (t < n) {
        val s = ((bytes(2 * t + 1) << 8) | (bytes(2 * t) & 0xff))
        sum += s; val a = math.abs(s.toLong); sabs += a
        if (a > peak) peak = a
        // zero crossing: sign change between consecutive samples,
        // sign(0) counted as non-negative
        if (t > 0 && ((s < 0) != (prev < 0))) zc += 1
        prev = s
        t += 1
      }
      Some(AudioMeta(n.toLong, fmt.getSampleRate.toInt, fmt.getChannels,
        sum, sabs, peak, zc))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  // ---- m07: acoustic fingerprint over the real WAV decode ------------

  /** m07 ground truth: audio CONTENT is keyed by `doc_id % 100`, so
    * distinct documents deliberately carry byte-identical recordings
    * (the re-uploaded-file case an audio dedup pass exists to catch).
    * Length is a whole number of 256-sample frames. */
  def audioContentKey(docId: Long): Long = docId % 100
  def audioLen2(ck: Long): Int = 512 + (ck % 7).toInt * 256

  /** Quadratic-in-t congruential PCM — deliberately NONLINEAR: a linear
    * ramp (the m06 formula) yields near-identical sub-band energies in
    * every frame, collapsing the energy-difference bits to a handful of
    * patterns. Products stay ≤ ~3e12 — Long/BIGINT-exact in both
    * engines. */
  def pcm2(ck: Long, t: Int): Int =
    (((ck * 7349L + 13L) * (t.toLong * t + t.toLong * 31 + 7)) % 65536).toInt - 32768

  /** Real WAV encode of the m07 content stream (same RIFF writer as
    * [[encodeWav]], different PCM formula + duplicate-group keying). */
  def encodeContentWav(ck: Long): Array[Byte] = {
    import javax.sound.sampled._
    val n = audioLen2(ck)
    val raw = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s = pcm2(ck, t)
      raw(2 * t) = (s & 0xff).toByte
      raw(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real WAV decode returning the raw 16-bit PCM samples (the
    * [[decodeWav]] container parse, kept separate because m06's
    * feature fold never materializes the sample array). */
  def decodeWavSamples(payload: Array[Byte]): Option[Array[Int]] =
    try {
      import javax.sound.sampled._
      val ais = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"unexpected WAV format $fmt")
      val bytes = ais.readAllBytes()
      ais.close()
      val n = bytes.length / 2
      val out = new Array[Int](n)
      var t = 0
      while (t < n) {
        out(t) = (bytes(2 * t + 1) << 8) | (bytes(2 * t) & 0xff)
        t += 1
      }
      Some(out)
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Energy-difference acoustic fingerprint (the Haitsma–Kalker 2002
    * bit-derivation shape, over time-domain sub-band energies so every
    * step is INTEGER-exact and oracle-replayable): 256-sample frames ×
    * 4 sub-slots of 64 samples; slot energy = Σ s² (≤ 64·32768² —
    * Long-safe); bit(f,b) = sign of the frame-over-frame difference of
    * adjacent-slot energy differences; bits fold through the rolling
    * hash seeded with the frame count (so equal bit streams of
    * different lengths cannot collide by construction). */
  def audioFingerprint(samples: Array[Int]): Long = {
    val Mod = 1000000007L
    val nf = samples.length / 256
    require(nf >= 1 && samples.length == nf * 256,
      s"fingerprint needs whole 256-sample frames, got ${samples.length}")
    val en = Array.ofDim[Long](nf, 4)
    var f = 0
    while (f < nf) {
      var b = 0
      while (b < 4) {
        var s = 0L; var j = 0
        while (j < 64) {
          val x = samples(f * 256 + b * 64 + j).toLong
          s += x * x; j += 1
        }
        en(f)(b) = s; b += 1
      }
      f += 1
    }
    var h = nf.toLong
    f = 1
    while (f < nf) {
      var b = 0
      while (b < 3) {
        val bit =
          if ((en(f)(b) - en(f)(b + 1)) - (en(f - 1)(b) - en(f - 1)(b + 1)) > 0)
            1L
          else 0L
        h = (h * 31 + bit) % Mod
        b += 1
      }
      f += 1
    }
    h
  }

  // ---- m08: multi-frame container (animated GIF), keyframe sampling --

  val VideoW = 16
  val VideoH = 12
  def videoFrameCount(id: Long): Int = 3 + (id % 4).toInt

  /** Ground-truth 8-bit gray pixel of video frame f — pure integer
    * arithmetic, replicated in the m08 oracle. */
  def videoPx(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 19 + f.toLong * 577 + x.toLong * 31 + y.toLong * 53
      + (x.toLong * y) % 17) % 256).toInt

  /** Real multi-frame encode: every frame through the JDK's actual GIF
    * sequence writer (LZW, 256-entry gray palette — lossless for 8-bit
    * gray, so the round-trip must be pixel-exact). */
  def encodeGif(id: Long): Array[Byte] = {
    import javax.imageio.stream.MemoryCacheImageOutputStream
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      val nf = videoFrameCount(id)
      while (f < nf) {
        val img = new BufferedImage(VideoW, VideoH,
          BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < VideoH) {
          var x = 0
          while (x < VideoW) {
            raster.setSample(x, y, 0, videoPx(id, f, x, y)); x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Real multi-frame decode: the GIF reader's own frame enumeration
    * (`getNumImages(true)` walks the container's image blocks), each
    * frame materialized independently. None for unparseable payloads. */
  def decodeGifFrames(payload: Array[Byte]): Option[IndexedSeq[BufferedImage]] =
    try {
      import javax.imageio.stream.MemoryCacheImageInputStream
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      val iis = new MemoryCacheImageInputStream(
        new ByteArrayInputStream(payload))
      try {
        reader.setInput(iis, false, true)
        val n = reader.getNumImages(true)
        // a valid GIF has >= 1 image block; the reader reports 0 (not
        // an error) for byte streams it can't recognize — tombstone
        if (n <= 0) None
        else Some((0 until n).map(reader.read))
      } finally { reader.dispose(); iis.close() }
    } catch {
      case _: java.io.IOException => None
      case _: IndexOutOfBoundsException => None
    }

  // ---- m09: LOSSY codec path (real JPEG encode/decode) ---------------

  /** Real baseline-JPEG encode at an explicit quality — the lossy leg
    * of the codec tier (PNG/GIF/TIFF legs are lossless and
    * pixel-replayable; JPEG's DCT quantization is not, so m09 gates
    * CONTRACT flags instead: exact dims + bounded distortion). */
  def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageWriteParam}
    import javax.imageio.stream.MemoryCacheImageOutputStream
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new IIOImage(img, null, null), p)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Smooth ground-truth pixel for the lossy tier: pure linear
    * gradients per band. The hash-noise [[pix]] formula is JPEG's
    * adversarial worst case (measured MAE ≈ 19/255 at q0.9 — the DCT
    * cannot represent white noise), while production photos are
    * piecewise-smooth; gradients model that class and make the m09
    * distortion envelope MEANINGFULLY tight (measured MAE < 2). */
  def smoothPix(seed: Long, x: Int, y: Int, band: Int): Int = {
    val w = widthOf(seed); val h = heightOf(seed)
    band match {
      case 0 => (x * 255) / math.max(1, w - 1)
      case 1 => (y * 255) / math.max(1, h - 1)
      case _ => ((x + y) * 255) / math.max(1, w + h - 2)
    }
  }

  /** Render of the m09 smooth content for a document (same dims
    * formula as the noise tier). */
  def renderSmooth(docId: Long): BufferedImage = {
    val seed = seedOf(docId)
    val w = widthOf(seed); val h = heightOf(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (smoothPix(seed, x, y, 0) << 16) |
          (smoothPix(seed, x, y, 1) << 8) | smoothPix(seed, x, y, 2))
        x += 1
      }
      y += 1
    }
    img
  }

  /** (meanAbsErr across RGB bands, PSNR dB) of a decoded image vs the
    * SMOOTH formula ground truth for `docId`. */
  def jpegDistortion(docId: Long, dec: BufferedImage): (Double, Double) = {
    val w = dec.getWidth; val h = dec.getHeight
    var sumAbs = 0L; var sumSq = 0L
    val seed = seedOf(docId)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val got = dec.getRGB(x, y)
        val dr = ((got >> 16) & 0xff) - smoothPix(seed, x, y, 0)
        val dg = ((got >> 8) & 0xff) - smoothPix(seed, x, y, 1)
        val db = (got & 0xff) - smoothPix(seed, x, y, 2)
        sumAbs += math.abs(dr) + math.abs(dg) + math.abs(db)
        sumSq += dr.toLong * dr + dg.toLong * dg + db.toLong * db
        x += 1
      }
      y += 1
    }
    val n = 3L * w * h
    val mae = sumAbs.toDouble / n
    val mse = sumSq.toDouble / n
    val psnr = if (mse == 0.0) Double.PositiveInfinity
      else 10.0 * math.log10(255.0 * 255.0 / mse)
    (mae, psnr)
  }

  // ------------------------------------------------------------------
  // Oracle SQL (generated from the same formula constants)
  // ------------------------------------------------------------------

  /** m05 oracle: rebuild each document's 16×16 luminance grid and the
    * 60-bit gradient hash from the pixel formula (no codec), then count
    * partners. Every fingerprint is value-checked row by row. Pair
    * generation blocks on 4×15-bit bands — EXACT by pigeonhole (any
    * pair at Hamming ≤ 3 differs in ≤ 3 of the 4 bands, so at least
    * one band matches identically), and the final ham ≤ 3 filter runs
    * on the FULL fingerprints, so a blocking bug that INVENTS a pair
    * still breaks the hash match. The blocking is re-derived here in
    * SQL from the theorem, not shared with the engine; rounds ≤ 7
    * gated the identical query against the blocking-FREE quadratic
    * formula at sf ≤ 0.1, pinning agreement of the two oracle shapes.
    * Blocked, the oracle is near-linear and runs at the 10× replica
    * (500k docs) where the quadratic form (1.25e11 pairs) cannot. */
  private[rel] lazy val pHashOracleSql: String = {
    val g = PHashGrid
    // grid index for sample point i (0..60), then image coords
    val gidx = s"((i*${g * g})//61)"
    val xExpr = s"((($gidx) % $g) * w) // $g"
    val yExpr = s"((($gidx) // $g) * h) // $g"
    s"""WITH $docDimsCte,
       |g AS (
       |  SELECT doc_id, list_transform(generate_series(0, 60),
       |      i -> ${lumaDocSql(xExpr, yExpr)}) AS ls
       |  FROM d),
       |h AS (
       |  SELECT doc_id, CAST(coalesce(list_sum(list_transform(
       |      generate_series(0, 59),
       |      i -> CASE WHEN ls[i+1] < ls[i+2]
       |           THEN (1::BIGINT << i) ELSE 0::BIGINT END)), 0) AS BIGINT) AS ph
       |  FROM g),
       |bands AS (
       |  SELECT doc_id, ph, t.b AS band,
       |         (ph >> (t.b * 15)) & 32767 AS bv
       |  FROM h, unnest(generate_series(0, 3)) AS t(b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
       |         a.ph AS pa, b.ph AS pb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT da, db FROM cand WHERE bit_count(xor(pa, pb)) <= 3),
       |pc AS (
       |  SELECT doc_id, count(*) AS n FROM (
       |    SELECT da AS doc_id FROM pairs
       |    UNION ALL SELECT db AS doc_id FROM pairs)
       |  GROUP BY doc_id)
       |SELECT h.doc_id, h.ph, CAST(coalesce(pc.n, 0) AS BIGINT) AS n_partners
       |FROM h LEFT JOIN pc USING (doc_id) ORDER BY h.doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    // Binary-file scan plumbing with a BYTE-EXACT oracle: both engines
    // read the same on-disk PNGs (Spark binaryFile vs DuckDB
    // read_blob) and fingerprint the raw container bytes — md5 over
    // the uppercase hex expansion, since DuckDB 1.0 lacks md5(BLOB).
    Q("m01_binary_meta",
      s"""SELECT CAST(regexp_extract(filename, 'img_(\\d+)\\.png', 1) AS BIGINT)
         |         AS img_id,
         |       size AS n_bytes, md5(hex(content)) AS payload_md5
         |FROM read_blob('$pngFixtureDir/*.png') ORDER BY img_id""".stripMargin) {
      (s, _) =>
        scanPngFixtures(s)
          .select(col("img_id"), col("n_bytes"),
            md5(hex(col("payload"))).as("payload_md5"))
          .orderBy("img_id")
    },

    // REAL DECODE under the value gate: binaryFile scan → ImageIO PNG
    // decode (mapPartitions) → dims + per-band pixel sums. The oracle
    // recomputes the expected sums from the pixel formula — pure
    // arithmetic, no codec — so any decoder deviation on any pixel of
    // any image breaks the hash match.
    Q("m02_media_features",
      s"""WITH ${fixtureDimsCte(FixtureImages)},
         |t AS (
         |  SELECT img_id, w, h,
         |    CAST(list_sum(list_transform(generate_series(0, w*h - 1),
         |      i -> ${pixSql("img_id", "i % w", "i // w", 0)})) AS BIGINT) AS r_sum,
         |    CAST(list_sum(list_transform(generate_series(0, w*h - 1),
         |      i -> ${pixSql("img_id", "i % w", "i // w", 1)})) AS BIGINT) AS g_sum,
         |    CAST(list_sum(list_transform(generate_series(0, w*h - 1),
         |      i -> ${pixSql("img_id", "i % w", "i // w", 2)})) AS BIGINT) AS b_sum
         |  FROM dd)
         |SELECT img_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |       3 AS channels, r_sum, g_sum, b_sum
         |FROM t ORDER BY img_id""".stripMargin) { (s, _) =>
      extractMediaFeatures(scanPngFixtures(s))
        .select("img_id", "width", "height", "channels",
          "r_sum", "g_sum", "b_sum")
        .orderBy("img_id")
    },

    // Frame sampling — the video path of the multimodal brief: each
    // decoded image is treated as a frame stack (8-pixel-row strips),
    // and every 2nd frame is kept with its luminance sum. One narrow
    // flatMap pass over real decoded pixels; rows explode to the
    // sampled frames only — at scale this is the shape that lets a
    // downstream model stage see a bounded frame rate. Oracle replays
    // the strip sums (incl. partial tail strips) from the formula.
    Q("m03_frame_sample",
      s"""WITH ${fixtureDimsCte(FixtureImages)},
         |fr AS (
         |  SELECT img_id, CAST(f.f AS BIGINT) AS frame_idx,
         |    CAST(list_sum(list_transform(
         |      generate_series(0, w * least(8, h - f.f*8) - 1),
         |      i -> ${lumaSql("img_id", "i % w", "f.f*8 + i // w")})) AS BIGINT)
         |      AS luma_sum
         |  FROM dd, unnest(generate_series(0, ((h+7)//8 - 1)::INT)) AS f(f)
         |  WHERE f.f % 2 = 0)
         |SELECT img_id, frame_idx, luma_sum
         |FROM fr ORDER BY img_id, frame_idx""".stripMargin) { (s, _) =>
      import s.implicits._
      scanPngFixtures(s)
        .select(col("img_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, p) =>
          decode(p) match {
            case None => Iterator.empty // tombstone: undecodable → no frames
            case Some(img) =>
              val w = img.getWidth; val h = img.getHeight
              val nFrames = (h + 7) / 8
              (0 until nFrames by 2).iterator.map { f =>
                var sum = 0L
                var y = f * 8
                val yEnd = math.min(f * 8 + 8, h)
                while (y < yEnd) {
                  var x = 0
                  while (x < w) { sum += lumaOf(img.getRGB(x, y)); x += 1 }
                  y += 1
                }
                (id, f.toLong, sum)
              }
          }
        }
        .toDF("img_id", "frame_idx", "luma_sum")
        .orderBy("img_id", "frame_idx")
    },

    // Resize/thumbnail — the image path, sf-scaled: per document a
    // REAL PNG payload is built (render → encode), then the decode
    // stage parses the actual PNG stream and nearest-neighbor
    // resamples to an 8×8 luminance thumbnail. thumb_sum checks the
    // values, thumb_wsum (position-weighted) checks their ORDER — a
    // transposed or flipped resample passes the plain sum but not the
    // weighted one. Narrow per-row pass, no shuffle but the
    // presentation sort; bench measures real codec throughput.
    Q("m04_resize_thumb", {
      val xExpr = "((j % 8) * w) // 8"
      val yExpr = "((j // 8) * h) // 8"
      s"""WITH $docDimsCte,
         |t AS (
         |  SELECT doc_id,
         |    CAST(list_sum(list_transform(generate_series(0, 63),
         |      j -> ${lumaDocSql(xExpr, yExpr)})) AS BIGINT) AS thumb_sum,
         |    CAST(list_sum(list_transform(generate_series(0, 63),
         |      j -> (j+1) * ${lumaDocSql(xExpr, yExpr)})) AS BIGINT) AS thumb_wsum
         |  FROM d)
         |SELECT doc_id, 64 AS thumb_px, thumb_sum, thumb_wsum
         |FROM t ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      docPayloads(s, d)
        .as[(Long, Array[Byte])]
        .map { case (id, p) =>
          val img = decode(p).getOrElse(
            sys.error(s"undecodable PNG payload for doc $id"))
          val w = img.getWidth; val h = img.getHeight
          var sum = 0L; var wsum = 0L
          var j = 0
          while (j < 64) {
            val l = lumaOf(img.getRGB(((j % 8) * w) / 8, ((j / 8) * h) / 8))
            sum += l; wsum += (j + 1).toLong * l
            j += 1
          }
          (id, 64, sum, wsum)
        }
        .toDF("doc_id", "thumb_px", "thumb_sum", "thumb_wsum")
        .orderBy("doc_id")
    },

    // Perceptual-hash near-duplicate detection — the IMAGE-dedup path
    // of the multimodal brief (aHash/dHash family) over REAL decoded
    // pixels: render → PNG encode → ImageIO decode → 16×16 luminance
    // grid → 60-bit gradient fingerprint, then d05's pigeonhole
    // discipline — 4×15-bit band blocking guarantees every pair at
    // Hamming ≤ 3 shares an exact band. One row per doc (fingerprint +
    // partner count), so all n fingerprints are value-checked against
    // DuckDB's formula replay (pair space band-blocked since round 8 —
    // pigeonhole-exact, see pHashOracleSql — so the oracle runs at the
    // 10× replica too); the planted doc_id<24 groups guarantee live
    // pairs at every scale factor.
    Q("m05_phash_neardup", pHashOracleSql) { (s, d) =>
      perceptualNearDup(s, d, maxHamming = 3)
    },

    // AUDIO modality with a REAL codec: per document a genuine WAV
    // payload (16-bit LE mono PCM at 8 kHz through the actual RIFF
    // writer), decoded with javax.sound.sampled — container header,
    // format negotiation, frame stream — then integer signal features
    // (amplitude sums, peak, zero crossings). All features are
    // integer-exact, so the oracle recomputes them from the PCM
    // formula arithmetically; a codec deviation on any sample of any
    // document breaks the hash. Narrow per-row pass, sf-scaled.
    Q("m06_wav_features",
      """WITH d AS (SELECT doc_id, 800 + doc_id % 257 AS n FROM documents),
        |s AS (SELECT doc_id, n,
        |  list_transform(generate_series(0, n::INT - 1),
        |    t -> ((doc_id*31 + t*17) % 65536) - 32768) AS xs
        |  FROM d),
        |f AS (SELECT doc_id, n,
        |  CAST(list_sum(xs) AS BIGINT) AS sum_amp,
        |  CAST(list_sum(list_transform(xs, x -> abs(x))) AS BIGINT) AS sum_abs,
        |  CAST(list_max(list_transform(xs, x -> abs(x))) AS BIGINT) AS peak,
        |  CAST(list_sum(list_transform(generate_series(1, n::INT - 1),
        |    t -> CASE WHEN (xs[t+1] < 0) != (xs[t] < 0)
        |         THEN 1 ELSE 0 END)) AS BIGINT) AS zero_cross
        |  FROM s)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples, 8000 AS sample_rate,
        |  1 AS channels, sum_amp, sum_abs, peak, zero_cross
        |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val m = decodeWav(encodeWav(id)).getOrElse(
            sys.error(s"undecodable WAV payload for doc $id"))
          (id, m.n_samples, m.sample_rate, m.channels,
            m.sum_amp, m.sum_abs, m.peak, m.zero_cross)
        })
        .toDF("doc_id", "n_samples", "sample_rate", "channels",
          "sum_amp", "sum_abs", "peak", "zero_cross")
        .orderBy("doc_id")
    },

    // Acoustic-fingerprint near-dup over REAL decoded audio: every
    // document's WAV round-trips the actual RIFF container
    // (AudioSystem write → parse), the decoded PCM folds to the
    // integer-exact Haitsma–Kalker-shaped fingerprint (see
    // audioFingerprint), and duplicate recordings group on it. Scale
    // shape: decode + fingerprint is a NARROW per-row pass — audio
    // bytes never shuffle, only the 8-byte fingerprint reaches the
    // hash-aggregate (map-side combined). The oracle replays the
    // fingerprint arithmetically from the PCM formula — a codec
    // deviation on any sample of any document, or a grouping bug,
    // breaks the hash match.
    Q("m07_audio_fingerprint",
      """WITH d AS (SELECT doc_id, doc_id % 100 AS ck FROM documents),
        |p AS (SELECT doc_id, ck, (512 + (ck % 7) * 256) // 256 AS nf FROM d),
        |e AS (SELECT doc_id, nf,
        |  list_transform(generate_series(0, nf * 4 - 1), i ->
        |    list_sum(list_transform(list_transform(
        |      list_transform(generate_series(0, 63),
        |        j -> (i // 4) * 256 + (i % 4) * 64 + j),
        |      t -> ((ck*7349 + 13) * (t*t + t*31 + 7)) % 65536 - 32768),
        |      x -> x * x))) AS en
        |  FROM p),
        |f AS (SELECT doc_id,
        |  list_reduce(
        |    list_prepend(nf::BIGINT,
        |      list_transform(generate_series(0, (nf - 1) * 3 - 1), t ->
        |        CASE WHEN (en[(t // 3 + 1) * 4 + (t % 3) + 1]
        |                   - en[(t // 3 + 1) * 4 + (t % 3) + 2])
        |                - (en[(t // 3) * 4 + (t % 3) + 1]
        |                   - en[(t // 3) * 4 + (t % 3) + 2]) > 0
        |             THEN 1::BIGINT ELSE 0::BIGINT END)),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |  FROM e)
        |SELECT fp AS fingerprint, count(*) AS n_copies, min(doc_id) AS keeper
        |FROM f GROUP BY fp ORDER BY fingerprint""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val samples = decodeWavSamples(encodeContentWav(audioContentKey(id)))
            .getOrElse(sys.error(s"undecodable WAV payload for doc $id"))
          (id, audioFingerprint(samples))
        })
        .toDF("doc_id", "fp")
        .groupBy("fp")
        .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keeper"))
        .select(col("fp").as("fingerprint"), col("n_copies"), col("keeper"))
        .orderBy("fingerprint")
    },

    // Keyframe sampling from a REAL multi-frame container: every
    // document's frames round-trip the JDK's actual animated-GIF
    // sequence writer/reader (LZW over a 256-gray palette — lossless,
    // so decode must be pixel-exact), the reader's own frame
    // enumeration reports the frame count, and every 2nd frame is kept
    // with its luminance sum — the bounded-frame-rate shape a training
    // pipeline feeds a vision model. One narrow flatMap pass; payload
    // bytes never shuffle, rows explode to sampled frames only. The
    // oracle replays frame count and per-frame sums arithmetically —
    // a codec deviation on any pixel of any frame breaks the hash.
    Q("m08_video_keyframes",
      """WITH d AS (SELECT doc_id, 3 + doc_id % 4 AS nf FROM documents),
        |fr AS (
        |  SELECT doc_id, nf, CAST(f.f AS BIGINT) AS frame_idx,
        |    CAST(list_sum(list_transform(generate_series(0, 191), i ->
        |      (doc_id*19 + f.f*577 + (i % 16)*31 + (i // 16)*53
        |       + ((i % 16) * (i // 16)) % 17) % 256)) AS BIGINT) AS luma_sum
        |  FROM d, unnest(generate_series(0, (nf - 1)::INT)) AS f(f)
        |  WHERE f.f % 2 = 0)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, frame_idx, luma_sum
        |FROM fr ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val frames = decodeGifFrames(encodeGif(id)).getOrElse(
            sys.error(s"undecodable GIF payload for doc $id"))
          val nf = frames.length.toLong
          frames.indices.by(2).iterator.map { f =>
            val img = frames(f)
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sum += (img.getRGB(x, y) & 0xff); x += 1
              }
              y += 1
            }
            (id, nf, f.toLong, sum)
          }
        }
        .toDF("doc_id", "n_frames", "frame_idx", "luma_sum")
        .orderBy("doc_id", "frame_idx")
    },

    // The LOSSY leg of the codec tier: real baseline JPEG (DCT +
    // quantization at quality 0.9) through the JDK's actual
    // writer/reader. Pixels are NOT bit-replayable by construction —
    // the claim a lossy codec CAN make is gated instead: container
    // round-trip preserves exact dimensions, and distortion against
    // the formula ground truth stays within the published envelope
    // (MAE ≤ 8/255 per band, PSNR ≥ 25 dB — generous for q0.9 on this
    // content; measured headroom pinned tighter in MultiModalSpec).
    // Narrow per-row pass; only (id, dims, flags) leave the executor.
    Q("m09_jpeg_decode",
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id < 24 THEN doc_id % 8 ELSE doc_id END AS seed
        |  FROM documents)
        |SELECT doc_id, 20 + seed % 13 AS w, 16 + (seed * 7) % 11 AS h,
        |  CAST(1 AS BIGINT) AS dims_ok, CAST(1 AS BIGINT) AS err_bounded,
        |  CAST(1 AS BIGINT) AS psnr_ok
        |FROM d ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val dec = decode(encodeJpeg(renderSmooth(id), 0.9f)).getOrElse(
            sys.error(s"undecodable JPEG payload for doc $id"))
          val seed = seedOf(id)
          val dimsOk = dec.getWidth == widthOf(seed) &&
            dec.getHeight == heightOf(seed)
          val (mae, psnr) = jpegDistortion(id, dec)
          (id, dec.getWidth.toLong, dec.getHeight.toLong,
            if (dimsOk) 1L else 0L,
            if (mae <= 8.0) 1L else 0L,
            if (psnr >= 25.0) 1L else 0L)
        })
        .toDF("doc_id", "w", "h", "dims_ok", "err_bounded", "psnr_ok")
        .orderBy("doc_id")
    },

    // The DECODE-TOMBSTONE contract under the value gate (the imaging
    // tier's F4 discipline brought to the m-tier): a MIXED corpus
    // where, by deterministic doc_id class, payloads are (0) a PNG
    // truncated mid-IHDR — valid magic, dead stream, (1) non-image
    // bytes no installed reader's magic can match (byte deltas are
    // fixed at 7 mod 251; every JDK magic needs a different delta), or
    // (2+) a valid render. extractMediaFeatures must keep EVERY row —
    // corrupt payloads surviving with NULL features, never dropped,
    // never failing the task — and the oracle pins the per-class
    // tombstone/decoded counts AND the decoded rows' pixel sums
    // arithmetically. A decoder that throws on garbage, drops the row,
    // or "decodes" noise breaks the hash.
    Q("m10_decode_tombstones", {
      val rsum =
        s"""CAST(list_sum(list_transform(generate_series(0, w*h - 1),
           |      i -> ${pixSql("sd", "i % w", "i // w", 0)}))
           |    + CASE WHEN dot = 1 THEN 255 - ${pixSql("sd", "0", "0", 0)}
           |      ELSE 0 END AS BIGINT)""".stripMargin
      s"""WITH $docDimsCte,
         |c AS (SELECT doc_id, doc_id % 5 AS payload_class, sd, dot, w, h
         |      FROM d)
         |SELECT payload_class, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN payload_class < 2 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_tombstones,
         |  CAST(sum(CASE WHEN payload_class >= 2 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_decoded,
         |  CAST(coalesce(sum(CASE WHEN payload_class >= 2 THEN $rsum
         |    ELSE NULL END), 0) AS BIGINT) AS r_sum_total
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      val mixed = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val payload: Array[Byte] = (id % 5) match {
            case 0 =>
              // magic + chunk header survive, IHDR is cut mid-payload:
              // the sniffer dispatches to the PNG reader, the stream
              // dies inside it — the exception-path tombstone
              java.util.Arrays.copyOf(encodePng(renderDoc(id)), 24)
            case 1 =>
              // the no-reader-matches tombstone (ImageIO.read == null)
              Array.tabulate(64)(i => ((id * 31 + i * 7) % 251).toByte)
            case _ => encodePng(renderDoc(id))
          }
          (id, id % 5, payload)
        }).toDF("doc_id", "payload_class", "payload")
      extractMediaFeatures(mixed)
        .groupBy("payload_class")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("width").isNull.cast("long")).as("n_tombstones"),
          sum(col("width").isNotNull.cast("long")).as("n_decoded"),
          coalesce(sum(col("r_sum")), lit(0L)).as("r_sum_total"))
        .orderBy("payload_class")
    },

    // AUDIO activity segmentation over REAL decoded PCM — the
    // energy-threshold VAD shape every speech pipeline runs before
    // transcription (cut the signal into active spans, drop silence):
    // each document's WAV round-trips the genuine RIFF codec (m06),
    // the decoded samples fold into 64-sample frame energies, the
    // per-doc mean energy is the activation threshold, and maximal
    // runs of above-threshold frames become segments — gaps-and-
    // islands ON THE DECODED SIGNAL. All arithmetic is integer-exact
    // (energies are exact BIGINTs; the mean is one double division of
    // exact integers, identical in both engines), so the oracle
    // replays segmentation from the PCM formula and a codec deviation
    // on any sample moves a frame energy and breaks the hash. Narrow
    // per-row pass: audio bytes never shuffle, only (doc, seg) rows.
    Q("m12_audio_segments",
      """WITH d AS (SELECT doc_id, 800 + doc_id % 257 AS n FROM documents),
        |fr AS (SELECT doc_id, f.f AS f,
        |  CAST(list_sum(list_transform(generate_series(0, 63), j ->
        |    CAST(((doc_id*31 + (f.f*64 + j)*17) % 65536) - 32768 AS BIGINT)
        |    * (((doc_id*31 + (f.f*64 + j)*17) % 65536) - 32768))) AS BIGINT) AS e
        |  FROM d, unnest(generate_series(0, n // 64 - 1)) AS f(f)),
        |thr AS (SELECT doc_id, sum(e)::DOUBLE / count(*) AS thr
        |  FROM fr GROUP BY 1),
        |fl AS (SELECT fr.doc_id, f, e, e > thr AS hot,
        |  lag(e > thr) OVER (PARTITION BY fr.doc_id ORDER BY f) AS prev
        |  FROM fr JOIN thr USING (doc_id)),
        |st AS (SELECT doc_id, f, e,
        |  CASE WHEN prev IS NULL OR NOT prev THEN 1 ELSE 0 END AS new_s
        |  FROM fl WHERE hot),
        |sg AS (SELECT doc_id, f, e,
        |  sum(new_s) OVER (PARTITION BY doc_id ORDER BY f) AS seg FROM st)
        |SELECT doc_id, CAST(seg AS BIGINT) AS seg,
        |  min(f) AS start_frame, count(*) AS n_frames,
        |  CAST(sum(e) AS BIGINT) AS energy
        |FROM sg GROUP BY 1, 2 ORDER BY doc_id, seg""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val xs = decodeWavSamples(encodeWav(id)).getOrElse(
            sys.error(s"undecodable WAV payload for doc $id"))
          val nf = xs.length / 64
          val e = Array.tabulate(nf) { f =>
            var acc = 0L; var j = 0
            while (j < 64) {
              val x = xs(f * 64 + j).toLong; acc += x * x; j += 1
            }
            acc
          }
          var tot = 0L; e.foreach(tot += _)
          val thr = tot.toDouble / nf
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Long, Long)]
          var seg = 0L
          var f = 0
          while (f < nf) {
            if (e(f) > thr) {
              seg += 1
              val start = f
              var energy = 0L; var cnt = 0L
              while (f < nf && e(f) > thr) { energy += e(f); cnt += 1; f += 1 }
              out += ((id, seg, start.toLong, cnt, energy))
            } else f += 1
          }
          out
        }
        .toDF("doc_id", "seg", "start_frame", "n_frames", "energy")
        .orderBy("doc_id", "seg")
    },

    // VIDEO near-duplicate detection over REAL decoded frames — the
    // frame-fingerprint-set form every video-dedup pipeline uses
    // (decode → per-frame fingerprint → videos sharing most frames are
    // near-dups). Payloads are genuine animated GIFs (the m08 codec):
    // 60 distinct videos keyed doc_id%60, where partners ck and ck+30
    // share every frame EXCEPT the last (nearPx keys the final frame
    // on the full ck) — planted near-dup pairs with Jaccard
    // (nf-1)/(nf+1) ∈ [0.5, 0.71] at every sf, 0.5 exactly
    // representable so the >= 0.5 gate has no float boundary. Scale
    // shape: decode+fingerprint is a NARROW per-row pass (payload
    // bytes never shuffle — only 8-byte fingerprints); videos dedupe
    // on the video-level fold first (near-dup runs on DISTINCT
    // contents, the d01-before-d04 discipline); candidate pairs come
    // from a frame-fingerprint equi-join (the d03 bucket shape), never
    // an all-pairs product. The oracle replays frame fingerprints
    // arithmetically from the pixel formula — a codec deviation on any
    // pixel of any frame of any video breaks the hash.
    Q("m11_video_neardup",
      """WITH v AS (SELECT doc_id % 60 AS ck, min(doc_id) AS keeper
        |  FROM documents GROUP BY 1),
        |nfv AS (SELECT ck, keeper, (3 + (ck % 30) % 4)::BIGINT AS nf FROM v),
        |fr AS (SELECT ck, keeper, f.f AS f,
        |  list_reduce(list_prepend(192::BIGINT,
        |    list_transform(generate_series(0, 191), i ->
        |      ((CASE WHEN f.f < nf - 1 THEN ck % 30 ELSE ck END) * 7919
        |        + f.f * 577 + (i % 16) * 31 + (i // 16) * 53
        |        + ((i % 16) * (i // 16)) % 17) % 256)),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |  FROM nfv, unnest(generate_series(0, (nf - 1)::INT)) AS f(f)),
        |df AS (SELECT DISTINCT keeper, fp FROM fr),
        |fs AS (SELECT keeper, count(*) AS nfp FROM df GROUP BY 1),
        |pr AS (SELECT a.keeper AS ka, b.keeper AS kb, count(*) AS shared
        |  FROM df a JOIN df b ON a.fp = b.fp AND a.keeper < b.keeper
        |  GROUP BY 1, 2)
        |SELECT pr.ka AS keeper_a, pr.kb AS keeper_b,
        |  CAST(pr.shared AS BIGINT) AS shared,
        |  CAST(fa.nfp AS BIGINT) AS na, CAST(fb.nfp AS BIGINT) AS nb,
        |  round(pr.shared / (fa.nfp + fb.nfp - pr.shared)::DOUBLE, 6) AS jacc
        |FROM pr JOIN fs fa ON pr.ka = fa.keeper
        |  JOIN fs fb ON pr.kb = fb.keeper
        |WHERE pr.shared / (fa.nfp + fb.nfp - pr.shared)::DOUBLE >= 0.5
        |ORDER BY keeper_a, keeper_b""".stripMargin) { (s, d) =>
      import s.implicits._
      val perDoc = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val frames = decodeGifFrames(encodeNearGif(videoContentKey(id)))
            .getOrElse(sys.error(s"undecodable GIF payload for doc $id"))
          val fps = frames.map(frameFingerprint).toArray
          // video-level fold (m07's shape): seed = frame count
          var vfp = fps.length.toLong
          fps.foreach(fp => vfp = (vfp * 31 + fp) % 1000000007L)
          (id, vfp, fps)
        }).toDF("doc_id", "vfp", "fps")
      // near-dup over DISTINCT videos: group exact copies first. Every
      // fps array in a vfp group is identical by construction, so
      // first() is deterministic here.
      val videos = perDoc.groupBy("vfp")
        .agg(min("doc_id").as("keeper"), first("fps").as("fps"))
      val frames = Lineage.cut(videos
        .select(col("keeper"), explode(array_distinct(col("fps"))).as("fp")))
      val sizes = frames.groupBy("keeper").agg(count(lit(1)).as("nfp"))
      val a = frames.toDF("ka", "fp")
      val b = frames.toDF("kb", "fp")
      a.join(b, a("fp") === b("fp") && col("ka") < col("kb"))
        .groupBy("ka", "kb").agg(count(lit(1)).as("shared"))
        .join(broadcast(sizes.toDF("ka", "na")), Seq("ka"))
        .join(broadcast(sizes.toDF("kb", "nb")), Seq("kb"))
        .withColumn("jacc", col("shared") / (col("na") + col("nb") - col("shared")))
        .filter(col("jacc") >= 0.5)
        .select(col("ka").as("keeper_a"), col("kb").as("keeper_b"),
          col("shared"), col("na"), col("nb"), round(col("jacc"), 6).as("jacc"))
        .orderBy("keeper_a", "keeper_b")
    },

    // Header-ONLY metadata extraction — the fast path a 100 TB
    // metadata query must take instead of paying the decode: dims and
    // pixel format parsed from the PNG container's fixed IHDR layout
    // (signature + first chunk) in O(33 bytes) per payload, no
    // inflate, no reader dispatch, no pixel pass. The payloads are the
    // REAL encoder's output and the parse is a real byte-level
    // container walk (signature and chunk type verified, loud on
    // mismatch); the oracle replays dims from the dims formula and the
    // format constants from the encoder contract (TYPE_INT_RGB → PNG
    // bit depth 8, color type 2 truecolor), so an encoder or parser
    // byte-offset deviation on any doc breaks the hash. The spec
    // additionally pins header == full-decode dims on a sample.
    // Narrow per-row pass; payload bytes never shuffle.
    Q("m13_header_metadata",
      s"""WITH $docDimsCte
         |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |  8 AS bit_depth, 2 AS color_type
         |FROM d ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      docPayloads(s, d).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) =>
          val (w, h, depth, ct) = pngHeader(p).getOrElse(
            sys.error(s"doc $id payload is not a signature-valid PNG"))
          (id, w, h, depth, ct)
        })
        .toDF("doc_id", "width", "height", "bit_depth", "color_type")
        .orderBy("doc_id")
    }
  )

  // ---- m11: video near-dup content (shared-frame GIF family) ---------

  /** 60 distinct videos; ck and ck+30 share all frames but the last. */
  def videoContentKey(docId: Long): Long = docId % 60
  def nearFrameCount(ck: Long): Int = 3 + ((ck % 30) % 4).toInt
  /** Frame pixel: keyed on ck%30 for all but the LAST frame (shared
    * between partner videos), on the full ck for the last (the frame
    * that differs) — near-dups by construction, exactly replayable. */
  def nearPx(ck: Long, nf: Int, f: Int, x: Int, y: Int): Int = {
    val fk = if (f < nf - 1) ck % 30 else ck
    ((fk * 7919 + f.toLong * 577 + x.toLong * 31 + y.toLong * 53
      + (x.toLong * y) % 17) % 256).toInt
  }
  /** The m08 GIF sequence writer over the near-dup frame family. */
  def encodeNearGif(ck: Long): Array[Byte] = {
    import javax.imageio.stream.MemoryCacheImageOutputStream
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val nf = nearFrameCount(ck)
      var f = 0
      while (f < nf) {
        val img = new BufferedImage(VideoW, VideoH,
          BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < VideoH) {
          var x = 0
          while (x < VideoW) {
            raster.setSample(x, y, 0, nearPx(ck, nf, f, x, y)); x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }
  /** Row-major fold of decoded luma — seed 192 (the pixel count), the
    * m07 fold constant; identical to the oracle's list_reduce replay. */
  def frameFingerprint(img: BufferedImage): Long = {
    var a = (img.getWidth * img.getHeight).toLong
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        a = (a * 31 + (img.getRGB(x, y) & 0xff)) % 1000000007L
        x += 1
      }
      y += 1
    }
    a
  }
}
