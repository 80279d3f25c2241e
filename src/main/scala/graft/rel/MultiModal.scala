package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `BinaryType` columns with typed metadata, processed by
  * batched partition-level functions (`mapPartitions` — the JVM
  * analogue of `mapInPandas`).
  *
  * The actual codec step is STUBBED (this container ships no image or
  * audio libraries): `decodeStub` derives deterministic fake
  * width/height/channels from the payload bytes. Everything around it —
  * schema, batching, partitioning, null-tombstone handling — is real
  * and tested, so swapping in a real decoder is a one-function change.
  */
object MultiModal {

  /** Typed metadata emitted by the (stubbed) decoder. */
  case class MediaMeta(n_bytes: Long, width: Int, height: Int,
      channels: Int, byte_sum: Long)

  /** STUB decoder: a real implementation would parse the container
    * format (PNG/JPEG/WAV...) here. The fake is deterministic in the
    * payload so specs and oracles are stable. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    MediaMeta(
      n_bytes = payload.length.toLong,
      width = (payload.length % 64 + 16).toInt,
      height = ((sum % 64) + 16).toInt,
      channels = 3,
      byte_sum = sum)
  }

  /** Batched feature extraction over a binary column: one decoder
    * instance per partition (the executor-singleton pattern for model
    * handles, segmentation/cellpose.py:70-79 in the reference). */
  def extractMediaFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("n_bytes", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("channels", IntegerType),
      StructField("byte_sum", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // per-partition "decoder handle" init would go here
      rows.map { r =>
        val p = r.getAs[Array[Byte]](payloadIdx)
        // tombstone contract: a null payload keeps its row but carries
        // null metadata — "decode of nothing is unknown", matching SQL
        // null propagation, not a fake zero-sized decode
        val extras =
          if (p == null) Seq[Any](null, null, null, null, null)
          else {
            val m = decodeStub(p)
            Seq[Any](m.n_bytes, m.width, m.height, m.channels, m.byte_sum)
          }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ extras)
      }
    }(enc)
  }

  /** dHash-style perceptual fingerprint: 60 ordered sample points at
    * byte offsets ⌊i·n/61⌋ (i = 0..60), bit i = [p(i) < p(i+1)] — the
    * gradient-sign hash the aHash/dHash family uses on resized pixel
    * rows, applied to the stub decode's byte stream. 60 bits (not 64)
    * keeps the value strictly positive in a signed 64-bit lane, so the
    * DuckDB replay (BIGINT shifts) agrees bit-for-bit. Returns None
    * for payloads with no bytes (no gradient signal — and the oracle's
    * n >= 1 filter agrees no row materializes). */
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

  /** Candidate pairs at Hamming ≤ maxHamming from a (doc_id, ph)
    * fingerprint set, via 4×15-bit pigeonhole band blocking (shuffle
    * carries 8-byte band keys + the signature, never payloads; the
    * exact bit_count verify runs in-bucket). */
  private[rel] def pHashPairs(hashes: org.apache.spark.sql.Dataset[(Long, Long)],
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
            "(e.g. mass single-byte payloads) need a pre-filter")
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

  /** Image near-dup via perceptual hash (see the m05 registry
    * comment). Emits ONE ROW PER DOC — (doc_id, ph, n_partners) — not
    * just the pair list: the corpus may legitimately contain zero
    * near-dup pairs, and a pairs-only result would then be vacuously
    * green even if the fingerprint computation diverged from the
    * oracle. Per-doc fingerprints keep every one of the n hash values
    * under the hash gate regardless of pair structure; the
    * pair-discovery path is exercised by the planted-payload spec. */
  def perceptualNearDup(spark: SparkSession, dir: String,
      maxHamming: Int): DataFrame = {
    import spark.implicits._
    // ONE corpus scan: the fingerprint pass materializes via a lineage
    // cut (8 B/doc) and feeds both the per-doc base and the blocking
    // pass, instead of re-hashing the payloads for each consumer
    val base = Lineage.cut(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        if (p == null) Iterator.empty
        else pHash60(p).iterator.map((id, _))
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

  /** DuckDB replica of the full m05 pipeline: hex-expand the payload,
    * rebuild the 60-bit gradient hash with BIGINT shifts, then count
    * each doc's partners over the ENTIRE quadratic pair space — the
    * oracle has no blocking, so a blocking bug that INVENTS a pair
    * breaks the hash match, and every fingerprint is value-checked
    * row by row. */
  private[rel] val pHashOracleSql: String =
    """WITH b AS (
      |  SELECT doc_id, encode(text) AS p, octet_length(encode(text)) AS n
      |  FROM documents
      |  WHERE text IS NOT NULL AND octet_length(encode(text)) >= 1),
      |h AS (
      |  SELECT doc_id, CAST(coalesce(list_sum(list_transform(
      |      generate_series(0, 59),
      |      i -> CASE WHEN ('0x' || substr(hex(p), 2*((i*n)//61)+1, 2))::BIGINT
      |                   < ('0x' || substr(hex(p), 2*(((i+1)*n)//61)+1, 2))::BIGINT
      |           THEN (1::BIGINT << i) ELSE 0::BIGINT END)), 0) AS BIGINT) AS ph
      |  FROM b),
      |pairs AS (
      |  SELECT da, db FROM (
      |    SELECT a.doc_id AS da, b.doc_id AS db,
      |           bit_count(xor(a.ph, b.ph)) AS ham
      |    FROM h a JOIN h b ON a.doc_id < b.doc_id)
      |  WHERE ham <= 3),
      |pc AS (
      |  SELECT doc_id, count(*) AS n FROM (
      |    SELECT da AS doc_id FROM pairs
      |    UNION ALL SELECT db AS doc_id FROM pairs)
      |  GROUP BY doc_id)
      |SELECT h.doc_id, h.ph, CAST(coalesce(pc.n, 0) AS BIGINT) AS n_partners
      |FROM h LEFT JOIN pc USING (doc_id) ORDER BY h.doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    // Binary-column plumbing with an oracle on the byte-exact parts:
    // payload = UTF-8 bytes of text (both engines encode identically).
    Q("m01_binary_meta",
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        | octet_length(encode(text)) % 64 + 16 AS width
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          (octet_length(col("payload")) % 64 + 16).as("width"))
        .orderBy("doc_id")
    },

    // Full stubbed decode via mapPartitions — oracle-checked: the stub
    // is deterministic byte arithmetic, which DuckDB replays by
    // hex-expanding the UTF-8 payload (unsigned byte sum, fake dims).
    Q("m02_media_features",
      """WITH b AS (
        |  SELECT doc_id, encode(text) AS p, octet_length(encode(text)) AS n
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, n,
        |    CAST(coalesce(list_sum(list_transform(generate_series(1, n::INT),
        |         i -> ('0x' || substr(hex(p), 2*i-1, 2))::BIGINT)),
        |      CASE WHEN n IS NULL THEN NULL ELSE 0 END) AS BIGINT)
        |      AS byte_sum
        |  FROM b
        |)
        |SELECT doc_id, n AS n_bytes, n % 64 + 16 AS width,
        |       (byte_sum % 64) + 16 AS height,
        |       CASE WHEN n IS NULL THEN NULL ELSE 3 END AS channels, byte_sum
        |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
      val withPayload = Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      extractMediaFeatures(withPayload)
        .select("doc_id", "n_bytes", "width", "height", "channels", "byte_sum")
        .orderBy("doc_id")
    },

    // Frame sampling — the video path of the multimodal brief: treat
    // the payload as fixed-size frames (64 B here; a real container
    // parser slots into the same loop) and keep every 2nd frame. A
    // pure per-row flatMap: one narrow pass, rows explode to the
    // sampled frames only — at scale this is the shape that lets the
    // downstream model stage see a bounded frame rate instead of
    // every frame. Oracle hex-expands the same windows.
    Q("m03_frame_sample",
      """WITH b AS (
        |  SELECT doc_id, encode(text) AS p, octet_length(encode(text)) AS n
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, f.f AS frame_idx,
        |    CAST(list_sum(list_transform(
        |      generate_series(f.f*64+1, least((f.f+1)*64, n)::INT),
        |      i -> ('0x' || substr(hex(p), 2*i-1, 2))::BIGINT)) AS BIGINT)
        |      AS frame_sum
        |  FROM b, unnest(range(0, ((n+63)//64)::INT)) AS f(f)
        |  WHERE f.f % 2 = 0)
        |SELECT doc_id, frame_idx, frame_sum
        |FROM fr ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, p) =>
          if (p == null) Iterator.empty // oracle: range over NULL emits no frames
          else {
          val nFrames = (p.length + 63) / 64
          (0 until nFrames by 2).iterator.map { f =>
            var sum = 0L
            var i = f * 64
            val end = math.min((f + 1) * 64, p.length)
            while (i < end) { sum += p(i) & 0xff; i += 1 }
            (id, f, sum)
          }
          }
        }
        .toDF("doc_id", "frame_idx", "frame_sum")
        .orderBy("doc_id", "frame_idx")
    },

    // Resize/thumbnail stub — the image path: deterministic strided
    // downsample to ≤16 sample points (a real resize kernel slots
    // into the same per-row map; the stride arithmetic and the
    // columnar shape are what the plan sees either way). Narrow
    // per-row pass, no shuffle but the presentation sort.
    Q("m04_resize_thumb",
      """WITH b AS (
        |  SELECT doc_id, encode(text) AS p, octet_length(encode(text)) AS n
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, least(16, n) AS thumb_px,
        |    CAST(list_sum(list_transform(
        |      generate_series(0, least(16, n)::INT - 1),
        |      j -> ('0x' || substr(hex(p),
        |             2*(j*greatest(1, n//16)) + 1, 2))::BIGINT)) AS BIGINT)
        |      AS thumb_sum
        |  FROM b WHERE n > 0)
        |SELECT doc_id, thumb_px, thumb_sum
        |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .filter(t => t._2 != null && t._2.length > 0) // oracle: WHERE n > 0 drops NULL too
        .map { case (id, p) =>
          val n = p.length
          val m = math.min(16, n)
          val k = math.max(1, n / 16)
          var sum = 0L
          var j = 0
          while (j < m) { sum += p(j * k) & 0xff; j += 1 }
          (id, m, sum)
        }
        .toDF("doc_id", "thumb_px", "thumb_sum")
        .orderBy("doc_id")
    },

    // Perceptual-hash near-duplicate detection — the IMAGE-dedup path
    // of the multimodal brief (aHash/dHash family): a 60-bit
    // brightness-gradient fingerprint over the (stubbed) decode, then
    // d05's pigeonhole discipline — 4×15-bit band blocking guarantees
    // every pair at Hamming ≤ 3 shares an exact band. One row per doc
    // (fingerprint + partner count), so all n fingerprints are
    // value-checked against DuckDB's blocking-free quadratic replay
    // even when the corpus holds no near-dup pair; planted-payload
    // pair discovery is spec-pinned (see perceptualNearDup).
    Q("m05_phash_neardup", pHashOracleSql) { (s, d) =>
      perceptualNearDup(s, d, maxHamming = 3)
    }
  )
}
