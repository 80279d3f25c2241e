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
    }
  )
}
