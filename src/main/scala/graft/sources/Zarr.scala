package graft.sources

import graft.core.{Codecs, ImageEvent}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal zarr v2 reader — reference S5-S7 (loading/zarr.py:20-115).
  *
  * Supports the engine's documented event layout (the same contract as
  * the reference's input docs): one 2-D array of shape (N, maxLen),
  * little-endian f4/f8/u2, C order, compressor `null` or zlib, with
  * `.zattrs` carrying `object_number` and per-record `shape` lists.
  * Ragged events live in zero-padded rows and are re-shaped by their
  * `shape` attribute at load. (The reference test fixture's
  * blosc/vlen-array encoding is a python-ecosystem specific codec;
  * raw/zlib covers the format spec for this engine's reader.)
  *
  * Scale posture: the metadata scan reads only the two small JSON
  * files on the driver (S5); pixel I/O happens per partition on the
  * executors with chunk-grouped coordinate selection (S6) — the same
  * partition-grouped read as `load_image_partition`.
  */
object Zarr {

  final case class ZarrMeta(
      shape: Seq[Int], chunks: Seq[Int], dtype: String,
      compressor: String, objectNumbers: Seq[Long], recordShapes: Seq[Seq[Int]],
      vlenDtype: Option[String] = None, fillValue: Double = 0.0) {
    def zlib: Boolean = compressor == "zlib"
  }

  // ObjectMapper construction is heavyweight and the instance is
  // thread-safe for reads — build once, not twice per readMeta
  private val mapper = new ObjectMapper()

  def readMeta(path: String): ZarrMeta = {
    val za = mapper.readTree(Files.readAllBytes(Paths.get(path, ".zarray")))
    val compNode = za.get("compressor")
    val comp =
      if (compNode == null || compNode.isNull) "raw"
      else {
        val id = compNode.get("id").asText()
        require(id == "zlib" || id == "blosc", s"unsupported zarr compressor: $id")
        id
      }
    // numcodecs vlen-array filter: object arrays of ragged numeric rows.
    // Any OTHER filter (delta, quantize, fixedscaleoffset, ...) changes
    // the byte semantics — ignoring one would decode silently corrupt
    // values, so unknown filters fail loudly like unknown compressors
    val filterIds = Option(za.get("filters")).filterNot(_.isNull)
      .map(fs => (0 until fs.size()).map(fs.get(_).get("id").asText()))
      .getOrElse(Seq.empty)
    val unknownFilters = filterIds.filterNot(_ == "vlen-array")
    require(unknownFilters.isEmpty,
      s"unsupported zarr filters $unknownFilters in $path - decoding " +
        "without applying them would silently corrupt values")
    val vlenDtype = Option(za.get("filters")).filterNot(_.isNull).flatMap { fs =>
      (0 until fs.size()).map(fs.get)
        .find(f => f.get("id").asText() == "vlen-array")
        .map(_.get("dtype").asText())
    }
    // zarr v2: an absent chunk file means a chunk full of fill_value
    val fillValue = Option(za.get("fill_value")).filterNot(_.isNull).map { n =>
      if (n.isTextual) n.asText() match {
        case "NaN" => Double.NaN
        case "Infinity" => Double.PositiveInfinity
        case "-Infinity" => Double.NegativeInfinity
        case other => throw new IllegalArgumentException(
          s"unsupported textual fill_value '$other'")
      } else n.asDouble()
    }.getOrElse(0.0)
    require(za.get("order").asText() == "C", "only C-order zarr supported")
    val shape = (0 until za.get("shape").size()).map(za.get("shape").get(_).asInt())
    val chunks = (0 until za.get("chunks").size()).map(za.get("chunks").get(_).asInt())
    val attrsFile = Paths.get(path, ".zattrs")
    val (objNums, recShapes) =
      if (Files.exists(attrsFile)) {
        val at = mapper.readTree(Files.readAllBytes(attrsFile))
        val on = Option(at.get("object_number")).map(n =>
          (0 until n.size()).map(n.get(_).asLong())).getOrElse(Seq.empty)
        val sh = Option(at.get("shape")).map(n =>
          (0 until n.size()).map { i =>
            val row = n.get(i)
            (0 until row.size()).map(row.get(_).asInt())
          }).getOrElse(Seq.empty)
        (on, sh)
      } else (Seq.empty[Long], Seq.empty[Seq[Int]])
    ZarrMeta(shape, chunks, za.get("dtype").asText(), comp, objNums, recShapes,
      vlenDtype, fillValue)
  }

  /** per-partition decompressed-chunk cache: partition rows are
    * typically chunk-adjacent, so retaining the last chunk avoids
    * re-reading + re-inflating it once per row */
  final class ChunkCache {
    private var key: (String, String) = null
    private var bytes: Array[Byte] = null
    def get(path: String, m: ZarrMeta, name: String): Array[Byte] = {
      if (key == null || key != ((path, name))) {
        bytes = readChunk(path, m, name)
        key = (path, name)
      }
      bytes
    }
  }

  /** read logical row `idx` — 2-D (N, len) numeric arrays and 1-D
    * vlen-array object arrays (the reference's own fixture encoding:
    * blosc-lz4 chunks of `[u32 count][u32 nbytes + payload]*` items) */
  def readRow(path: String, m: ZarrMeta, idx: Int,
      cache: ChunkCache = null): Array[Float] = {
    if (m.vlenDtype.isDefined) return readVlenRow(path, m, idx, cache)
    require(m.shape.length == 2, "expected 2-D (N, len) zarr array")
    // out-of-range rows (e.g. .zattrs listing more objects than the
    // array holds) would resolve to an ABSENT chunk, and the
    // legitimate fill_value path below would fabricate zero pixels —
    // the reference's z[idx] raises IndexError instead
    require(idx >= 0 && idx < m.shape.head,
      s"zarr row $idx out of range for shape ${m.shape.mkString("(", ",", ")")} in $path")
    val Seq(_, rowLen) = m.shape
    val Seq(chunkRows, chunkCols) = m.chunks
    require(chunkCols == rowLen, "row-chunked zarr expected (chunks[1] == shape[1])")
    val chunkIdx = idx / chunkRows
    val rowInChunk = idx % chunkRows
    val raw =
      if (cache != null) cache.get(path, m, s"$chunkIdx.0")
      else readChunk(path, m, s"$chunkIdx.0")
    sliceFloats(raw, m.dtype, rowInChunk * rowLen, rowLen)
  }

  /** one item of a 1-D vlen object array, as floats by its dtype */
  private def readVlenRow(path: String, m: ZarrMeta, idx: Int,
      cache: ChunkCache): Array[Float] = {
    require(m.shape.length == 1, "vlen-array zarr must be 1-D")
    require(idx >= 0 && idx < m.shape.head,
      s"zarr item $idx out of range for shape ${m.shape.mkString("(", ",", ")")} in $path")
    val chunkRows = m.chunks.head
    val chunkIdx = idx / chunkRows
    val itemInChunk = idx % chunkRows
    val raw =
      if (cache != null) cache.get(path, m, s"$chunkIdx")
      else readChunk(path, m, s"$chunkIdx")
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val count = bb.getInt(0)
    require(itemInChunk < count, s"vlen item $itemInChunk >= chunk count $count")
    var off = 4
    var i = 0
    while (i < itemInChunk) { off += 4 + bb.getInt(off); i += 1 }
    val nb = bb.getInt(off)
    val dtype = m.vlenDtype.get
    sliceFloats(java.util.Arrays.copyOfRange(raw, off + 4, off + 4 + nb),
      dtype, 0, nb / elemSize(dtype))
  }

  private def elemSize(dtype: String): Int = dtype match {
    case "<u2" | "<i2" => 2
    case "<f4" | "<i4" | "<u4" => 4
    case "<f8" => 8
    case other => throw new IllegalArgumentException(s"unsupported zarr dtype: $other")
  }

  /** zarr v2 semantics: a chunk file that was never written (e.g.
    * write_empty_chunks=False) IS a chunk full of fill_value — crash
    * here and every all-padding chunk kills the partition */
  private def fillChunk(m: ZarrMeta): Array[Byte] = {
    val elems = m.chunks.product
    val es = elemSize(m.dtype)
    val out = new Array[Byte](elems * es)
    if (m.fillValue != 0.0) {
      val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      m.dtype match {
        case "<f4" => while (i < elems) { bb.putFloat(i * 4, m.fillValue.toFloat); i += 1 }
        case "<f8" => while (i < elems) { bb.putDouble(i * 8, m.fillValue); i += 1 }
        case "<u2" | "<i2" =>
          while (i < elems) { bb.putShort(i * 2, m.fillValue.toInt.toShort); i += 1 }
        case "<i4" | "<u4" =>
          while (i < elems) { bb.putInt(i * 4, m.fillValue.toInt); i += 1 }
        case other => // unreachable: elemSize already rejected it
          throw new IllegalArgumentException(s"unsupported zarr dtype: $other")
      }
    }
    out
  }

  private def readChunk(path: String, m: ZarrMeta, name: String): Array[Byte] = {
    // vlen chunks of a 1-D array are named "<i>", 2-D row chunks "<i>.0"
    val f = Paths.get(path, name)
    if (!Files.exists(f)) {
      // vlen fill synthesis is undefined (item count unknowable): fail
      // with the semantics named instead of NoSuchFileException
      require(m.vlenDtype.isEmpty,
        s"missing vlen chunk $name in $path (zarr treats absent chunks " +
          "as fill_value, which has no defined vlen encoding)")
      return fillChunk(m)
    }
    val bytes = Files.readAllBytes(f)
    if (m.compressor == "blosc") Blosc.decode(bytes)
    else if (!m.zlib) bytes
    else {
      val inf = new java.util.zip.Inflater()
      inf.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](65536)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // any zero-progress state (truncated input, FDICT preset
        // dictionary, corrupt stream) must throw — the loop would
        // otherwise spin forever and hang the task
        if (n == 0 && !inf.finished())
          throw new java.io.IOException(
            if (inf.needsDictionary()) "zlib chunk requires a preset dictionary"
            else "truncated or stalled zlib chunk")
        out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    }
  }

  private def sliceFloats(bytes: Array[Byte], dtype: String,
      offset: Int, n: Int): Array[Float] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](n)
    dtype match {
      case "<f4" =>
        var i = 0
        while (i < n) { out(i) = bb.getFloat((offset + i) * 4); i += 1 }
      case "<f8" =>
        var i = 0
        while (i < n) { out(i) = bb.getDouble((offset + i) * 8).toFloat; i += 1 }
      case "<u2" =>
        var i = 0
        while (i < n) { out(i) = (bb.getShort((offset + i) * 2) & 0xffff).toFloat; i += 1 }
      case "<i2" =>
        var i = 0
        while (i < n) { out(i) = bb.getShort((offset + i) * 2).toFloat; i += 1 }
      case "<i4" =>
        var i = 0
        while (i < n) { out(i) = bb.getInt((offset + i) * 4).toFloat; i += 1 }
      case "<u4" =>
        var i = 0
        while (i < n) { out(i) = (bb.getInt((offset + i) * 4) & 0xffffffffL).toFloat; i += 1 }
      case other => throw new IllegalArgumentException(s"unsupported zarr dtype: $other")
    }
    out
  }

  /** S5: metadata scan — one row per event: (path, zarr_idx,
    * object_number) + regex meta from the path */
  def metaFromDirectory(spark: SparkSession, path: String, regex: String = null): DataFrame = {
    import spark.implicits._
    val m = readMeta(path)
    val metaCols: Map[String, String] =
      if (regex == null) Map.empty
      else {
        // a non-matching regex must fail like the reference's
        // re.search(...).groupdict() (and like Czi.metaFromDirectory):
        // silently empty meta would drop metadata columns AND collapse
        // the record into the default "all" group
        val mm = regex.r.findFirstMatchIn(path).getOrElse(
          throw new IllegalArgumentException(
            s"regex '$regex' does not match zarr path $path"))
        Tiff.namedGroups(regex).map(g => g -> mm.group(g)).toMap
      }
    m.objectNumbers.zipWithIndex.map { case (obj, i) =>
      (path, i, obj, metaCols)
    }.toDF("path", "zarr_idx", "object_number", "meta")
  }

  /** S6: partition-grouped pixel load; channel slice per record shape */
  def loadPixels(meta: DataFrame, channels: Seq[Int] = null): Dataset[ImageEvent] = {
    import Codecs._
    val fields = meta.schema.fieldNames
    val pathI = fields.indexOf("path")
    val idxI = fields.indexOf("zarr_idx")
    val objI = fields.indexOf("object_number")
    val metaI = fields.indexOf("meta")
    meta.mapPartitions { rows =>
      // open each zarr once per partition (S6's grouped I/O); the
      // chunk cache keeps the last decompressed chunk across rows
      val metaCache = scala.collection.mutable.Map.empty[String, ZarrMeta]
      val chunkCache = new ChunkCache
      rows.map { row =>
        val path = row.getString(pathI)
        val zm = metaCache.getOrElseUpdate(path, readMeta(path))
        val zi = row.getInt(idxI)
        val flat = readRow(path, zm, zi, chunkCache)
        val Seq(c0, h, w) = zm.recordShapes(zi)
        val wanted = if (channels == null) 0 until c0 else channels
        // numpy raises IndexError here; reading past c0 would silently
        // hand the event zero-padding as a "channel"
        require(wanted.forall(c => c >= 0 && c < c0),
          s"channel selection $wanted out of range for record $zi " +
            s"with $c0 channels ($path)")
        val ps = h * w
        val px = new Array[Float](wanted.length * ps)
        wanted.zipWithIndex.foreach { case (c, j) =>
          System.arraycopy(flat, c * ps, px, j * ps, ps)
        }
        val metaMap = row.getMap[String, String](metaI).toMap
        ImageEvent.fromPixels(
          path = path, idx = row.getLong(objI),
          group = metaMap.getOrElse("group", "all"),
          meta = metaMap + ("zarr_idx" -> zi.toString),
          channels = wanted.length, height = h, width = w, pixels = px)
      }
    }
  }

  /** S7: re-load pixels only for surviving (mask-bearing) records —
    * the second-scan memory pattern (zarr.py:35-49, main.py:224-228).
    * Records without a mask stay pixel-less. */
  def reloadPixels(ds: Dataset[ImageEvent], channels: Seq[Int] = null): Dataset[ImageEvent] = {
    import Codecs._
    ds.mapPartitions { events =>
      val metaCache = scala.collection.mutable.Map.empty[String, ZarrMeta]
      val chunkCache = new ChunkCache
      events.map { e =>
        if (!e.hasMask) e
        else {
          val zm = metaCache.getOrElseUpdate(e.path, readMeta(e.path))
          val zi = e.meta("zarr_idx").toInt
          val flat = readRow(e.path, zm, zi, chunkCache)
          val Seq(c0, h, w) = zm.recordShapes(zi)
          val wanted = if (channels == null) 0 until c0 else channels
          require(wanted.forall(c => c >= 0 && c < c0),
            s"channel selection $wanted out of range for record $zi " +
              s"with $c0 channels (${e.path})")
          val ps = h * w
          val px = new Array[Float](wanted.length * ps)
          wanted.zipWithIndex.foreach { case (c, j) =>
            System.arraycopy(flat, c * ps, px, j * ps, ps)
          }
          e.copy(pixels = px)
        }
      }
    }
  }
}
