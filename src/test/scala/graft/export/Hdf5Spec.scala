package graft.export

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import java.nio.{ByteBuffer, ByteOrder}

/** Independent structural HDF5 reader (written against the file-format
  * spec, sharing no code with the writer) + AnnData export checks. */
object H5Read {
  final case class H5Obj(
      attrs: Map[String, Any],
      children: Map[String, H5Obj],
      dims: Seq[Long],
      dtype: String,
      data: Array[Byte],
      vlenStrs: Seq[String] = Seq.empty,
      attrDtypes: Map[String, String] = Map.empty)

  def read(path: String): H5Obj = {
    val raw = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val sig = Array.tabulate(8)(bb.get(_))
    require(sig.toSeq == Seq[Byte](0x89.toByte, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a),
      "bad HDF5 signature")
    require(bb.get(13) == 8 && bb.get(14) == 8, "offsets/lengths must be 8 bytes")
    val eof = bb.getLong(40)
    require(eof == raw.length.toLong, s"EOF address $eof != file size ${raw.length}")
    val rootHeader = bb.getLong(64)
    readObject(bb, rootHeader)
  }

  private def readObject(bb: ByteBuffer, addr: Long): H5Obj = {
    require(addr % 8 == 0, s"unaligned object header $addr")
    val a = addr.toInt
    require(bb.get(a) == 1, "object header version must be 1")
    val nMsgs = bb.getShort(a + 2) & 0xffff
    var p = a + 16
    var attrs = Map.empty[String, Any]
    var attrDtypes = Map.empty[String, String]
    var children = Map.empty[String, H5Obj]
    var dims: Seq[Long] = Seq.empty
    var dtype = ""
    var dtypeSize = 0
    var dataAddr = -1L
    var dataSize = -1L
    for (_ <- 0 until nMsgs) {
      val tpe = bb.getShort(p) & 0xffff
      val size = bb.getShort(p + 2) & 0xffff
      val body = p + 8
      tpe match {
        case 0x0001 => // dataspace
          val rank = bb.get(body + 1) & 0xff
          dims = (0 until rank).map(i => bb.getLong(body + 8 + i * 8))
        case 0x0003 =>
          val (t, s) = parseDatatype(bb, body)
          dtype = t; dtypeSize = s
        case 0x0008 =>
          require(bb.get(body) == 3 && bb.get(body + 1) == 1, "layout must be v3 contiguous")
          dataAddr = bb.getLong(body + 2)
          dataSize = bb.getLong(body + 10)
        case 0x000C =>
          val (name, value, tp) = parseAttr(bb, body)
          attrs += name -> value
          attrDtypes += name -> tp
        case 0x0011 =>
          val btree = bb.getLong(body)
          val heap = bb.getLong(body + 8)
          children = readGroupLinks(bb, btree, heap)
            .map { case (n, a2) => n -> readObject(bb, a2) }.toMap
        case _ =>
      }
      p = body + size
    }
    val data =
      if (dataAddr >= 0) {
        val out = new Array[Byte](dataSize.toInt)
        var i = 0
        while (i < out.length) { out(i) = bb.get(dataAddr.toInt + i); i += 1 }
        out
      } else Array.empty[Byte]
    val vlen =
      if (dtype == "vlenstr" && dataAddr >= 0) {
        val n = dims.product.toInt
        (0 until n).map { i =>
          val off = dataAddr.toInt + i * 16
          val len = bb.getInt(off)
          val heapAddr = bb.getLong(off + 4)
          val heapIdx = bb.getInt(off + 12)
          if (len == 0) "" else readGlobalHeapObject(bb, heapAddr, heapIdx, len)
        }
      } else Seq.empty[String]
    H5Obj(attrs, children, dims, if (dtype.isEmpty) "" else s"$dtype$dtypeSize",
      data, vlen, attrDtypes)
  }

  /** resolve one object out of a GCOL global heap collection */
  private def readGlobalHeapObject(bb: ByteBuffer, addr: Long, idx: Int,
      len: Int): String = {
    require(readSig(bb, addr.toInt) == "GCOL", "bad global heap signature")
    require(bb.get(addr.toInt + 4) == 1, "global heap version must be 1")
    val collSize = bb.getLong(addr.toInt + 8)
    var p = addr.toInt + 16
    val end = addr.toInt + collSize.toInt
    while (p + 16 <= end) {
      val oIdx = bb.getShort(p) & 0xffff
      val oSize = bb.getLong(p + 8)
      if (oIdx == idx) {
        require(oSize == len.toLong, s"heap object $idx size $oSize != ref length $len")
        val out = new Array[Byte](len)
        var i = 0
        while (i < len) { out(i) = bb.get(p + 16 + i); i += 1 }
        return new String(out, java.nio.charset.StandardCharsets.US_ASCII)
      }
      require(oIdx != 0, s"hit free space before finding heap object $idx")
      p += 16 + pad8(oSize.toInt)
    }
    throw new IllegalStateException(s"global heap object $idx not found at $addr")
  }

  private def parseDatatype(bb: ByteBuffer, p: Int): (String, Int) = {
    val cv = bb.get(p) & 0xff
    val cls = cv & 0x0f
    val size = bb.getInt(p + 4)
    cls match {
      case 0 => ("int", size)
      case 1 => ("float", size)
      case 3 => ("str", size)
      case 9 =>
        // vlen: require the string flavor (bits 0-3 of bit field = 1)
        require((bb.get(p + 1) & 0x0f) == 1, "vlen datatype must be a string")
        ("vlenstr", size)
      case c => (s"class$c", size)
    }
  }

  private def pad8(n: Int): Int = (n + 7) / 8 * 8

  private def parseAttr(bb: ByteBuffer, p: Int): (String, Any, String) = {
    require(bb.get(p) == 1, "attribute message version must be 1")
    val nameSize = bb.getShort(p + 2) & 0xffff
    val dtSize = bb.getShort(p + 4) & 0xffff
    val dsSize = bb.getShort(p + 6) & 0xffff
    var q = p + 8
    val name = readCStr(bb, q)
    q += pad8(nameSize)
    val (tp, elemSize) = parseDatatype(bb, q)
    q += pad8(dtSize)
    val rank = bb.get(q + 1) & 0xff
    val n = if (rank == 0) -1 else bb.getLong(q + 8).toInt
    q += pad8(dsSize)
    def vlenAt(off: Int): String = {
      val len = bb.getInt(off)
      val heapAddr = bb.getLong(off + 4)
      val heapIdx = bb.getInt(off + 12)
      if (len == 0) "" else readGlobalHeapObject(bb, heapAddr, heapIdx, len)
    }
    tp match {
      case "str" =>
        if (n < 0) (name, readFixedStr(bb, q, elemSize), tp)
        else (name, (0 until n).map(i => readFixedStr(bb, q + i * elemSize, elemSize)), tp)
      case "vlenstr" =>
        if (n < 0) (name, vlenAt(q), tp)
        else (name, (0 until n).map(i => vlenAt(q + i * 16)), tp)
      case other => throw new IllegalStateException(s"unsupported attr datatype $other")
    }
  }

  private def readCStr(bb: ByteBuffer, p: Int): String = {
    val sb = new StringBuilder
    var i = p
    while (bb.get(i) != 0) { sb.append(bb.get(i).toChar); i += 1 }
    sb.toString
  }
  private def readFixedStr(bb: ByteBuffer, p: Int, size: Int): String = {
    val sb = new StringBuilder
    var i = p
    while (i < p + size && bb.get(i) != 0) { sb.append(bb.get(i).toChar); i += 1 }
    sb.toString
  }

  private def readGroupLinks(bb: ByteBuffer, btree: Long, heap: Long): Seq[(String, Long)] = {
    require(readSig(bb, heap.toInt) == "HEAP", "bad local heap signature")
    val heapData = bb.getLong(heap.toInt + 24)
    require(readSig(bb, btree.toInt) == "TREE", "bad btree signature")
    require(bb.get(btree.toInt + 4) == 0 && bb.get(btree.toInt + 5) == 0,
      "btree must be a level-0 group node")
    val entries = bb.getShort(btree.toInt + 6) & 0xffff
    (0 until entries).flatMap { e =>
      val child = bb.getLong(btree.toInt + 24 + 8 + e * 16)
      require(readSig(bb, child.toInt) == "SNOD", "bad symbol node signature")
      val nSym = bb.getShort(child.toInt + 6) & 0xffff
      (0 until nSym).map { s =>
        val entry = child.toInt + 8 + s * 40
        val nameOff = bb.getLong(entry)
        val headerAddr = bb.getLong(entry + 8)
        readCStr(bb, (heapData + nameOff).toInt) -> headerAddr
      }
    }
  }
  private def readSig(bb: ByteBuffer, p: Int): String =
    new String(Array.tabulate(4)(i => bb.get(p + i)), java.nio.charset.StandardCharsets.US_ASCII)
}

class Hdf5Spec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def floats(o: H5Read.H5Obj): Array[Float] = {
    val bb = ByteBuffer.wrap(o.data).order(ByteOrder.LITTLE_ENDIAN)
    Array.tabulate(o.data.length / 4)(i => bb.getFloat(i * 4))
  }
  private def longs(o: H5Read.H5Obj): Array[Long] = {
    val bb = ByteBuffer.wrap(o.data).order(ByteOrder.LITTLE_ENDIAN)
    Array.tabulate(o.data.length / 8)(i => bb.getLong(i * 8))
  }
  private def strs(o: H5Read.H5Obj): Seq[String] =
    if (o.dtype.startsWith("vlenstr")) o.vlenStrs
    else {
      val size = o.dtype.stripPrefix("str").toInt
      (0 until o.dims.head.toInt).map { i =>
        new String(o.data.slice(i * size, (i + 1) * size).takeWhile(_ != 0),
          java.nio.charset.StandardCharsets.US_ASCII)
      }
    }

  test("anndata export roundtrips through an independent HDF5 reader") {
    import spark.implicits._
    val df = Seq(
      ("a.tif", 7L, 1.5, 2.5),
      ("b.tif", 8L, -3.0, 0.25),
      ("c.tif", 9L, 10.0, 1e-3))
      .toDF("meta_path", "meta_idx", "feat_area_ch0", "feat_mean_ch0")
      .coalesce(1)
    val dir = Files.createTempDirectory("anndata-spec").toString
    AnnData.export(df, dir, "features")
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".h5ad"))
    assert(files.length == 1)
    val root = H5Read.read(files.head.getPath)

    assert(root.attrs("encoding-type") == "anndata")
    val x = root.children("X")
    assert(x.attrs("encoding-type") == "array")
    assert(x.dims == Seq(3L, 2L) && x.dtype == "float4")
    assert(floats(x).toSeq == Seq(1.5f, 2.5f, -3.0f, 0.25f, 10.0f, 1e-3f))

    val obs = root.children("obs")
    assert(obs.attrs("encoding-type") == "dataframe")
    assert(obs.attrs("_index") == "_index")
    assert(obs.attrs("column-order") == Seq("meta_path", "meta_idx"))
    assert(strs(obs.children("_index")) == Seq("0", "1", "2"))
    assert(strs(obs.children("meta_path")) == Seq("a.tif", "b.tif", "c.tif"))
    assert(longs(obs.children("meta_idx")).toSeq == Seq(7L, 8L, 9L))

    val v = root.children("var")
    assert(strs(v.children("_index")) == Seq("feat_area_ch0", "feat_mean_ch0"))
    assert(v.attrs("column-order") == Seq.empty[String])

    // every string attribute is written VARIABLE-length (class 9, the
    // encoding h5py itself uses for str attrs, so values round-trip as
    // Python str) — scalar and array-valued alike
    def allAttrDtypes(o: H5Read.H5Obj): Seq[String] =
      o.attrDtypes.values.toSeq ++ o.children.values.flatMap(allAttrDtypes)
    val dts = allAttrDtypes(root)
    assert(dts.nonEmpty && dts.forall(_ == "vlenstr"),
      s"expected all-vlen attr dtypes, got ${dts.distinct}")
  }

  test("nullable int obs columns promote to float64+NaN (pandas semantics)") {
    import spark.implicits._
    val df = Seq(("a", Some(5L), 1.0), ("b", None, 2.0), ("c", Some(-2L), 3.0))
      .toDF("meta_path", "meta_n", "feat_v").coalesce(1)
    val dir = Files.createTempDirectory("anndata-nulls").toString
    AnnData.export(df, dir, "f")
    val root = H5Read.read(s"$dir/f.0.h5ad")
    val col = root.children("obs").children("meta_n")
    assert(col.dtype == "float8", s"expected F64 promotion, got ${col.dtype}")
    val bb = ByteBuffer.wrap(col.data).order(ByteOrder.LITTLE_ENDIAN)
    val vals = Array.tabulate(3)(i => bb.getDouble(i * 8))
    assert(vals(0) == 5.0 && vals(1).isNaN && vals(2) == -2.0)
  }

  test("one .h5ad per partition, partition-local indices") {
    import spark.implicits._
    val df = (0 until 10).map(i => (s"p$i", i.toDouble))
      .toDF("meta_path", "feat_v").repartition(3)
    val dir = Files.createTempDirectory("anndata-parts").toString
    AnnData.export(df, dir, "f")
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".h5ad")).sortBy(_.getName)
    assert(files.length == 3)
    val total = files.map { f =>
      val root = H5Read.read(f.getPath)
      val n = root.children("X").dims.head.toInt
      assert(strs(root.children("obs").children("_index")) ==
        (0 until n).map(_.toString))
      n
    }.sum
    assert(total == 10)
  }

  test("randomized schemas/contents roundtrip (property-style)") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 8) {
      val nFeat = 1 + rng.nextInt(6)
      val nRows = 1 + rng.nextInt(12)
      val featNames = (0 until nFeat).map(i => s"feat_c${trial}_$i")
      val rows = (0 until nRows).map { r =>
        (s"p$r-${rng.nextInt(1000)}", rng.nextLong() % 100000,
          (0 until nFeat).map(_ => (rng.nextDouble() - 0.5) * math.pow(10, rng.nextInt(6))))
      }
      val df = rows.toDF("meta_path", "meta_idx", "vals")
        .select(col("meta_path") +: col("meta_idx") +:
          featNames.zipWithIndex.map { case (n, i) => col("vals")(i).as(n) }: _*)
        .coalesce(1)
      val dir = Files.createTempDirectory(s"anndata-prop-$trial").toString
      AnnData.export(df, dir, "t")
      val root = H5Read.read(
        new java.io.File(dir).listFiles().filter(_.getName.endsWith(".h5ad")).head.getPath)
      val x = root.children("X")
      assert(x.dims == Seq(nRows.toLong, nFeat.toLong), s"trial $trial dims")
      val expected = rows.flatMap(_._3.map(_.toFloat))
      assert(floats(x).toSeq == expected, s"trial $trial X values")
      assert(strs(root.children("var").children("_index")) == featNames, s"trial $trial var")
      assert(longs(root.children("obs").children("meta_idx")).toSeq ==
        rows.map(_._2), s"trial $trial obs")
    }
  }

  test("a 20-column obs group stays readable (many links in one symbol node)") {
    import spark.implicits._
    val cols = (0 until 20).map(i => s"meta_c$i")
    val df = Seq(Seq.fill(20)(1.0)).toDF("v")
      .select(cols.zipWithIndex.map { case (n, i) => col("v")(i).as(n) } :+
        lit(2.5).as("feat_x"): _*)
      .coalesce(1)
    val dir = Files.createTempDirectory("anndata-wide").toString
    AnnData.export(df, dir, "w")
    val root = H5Read.read(
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".h5ad")).head.getPath)
    assert(root.children("obs").children.keySet == (cols.toSet + "_index"))
    assert(root.children("obs").attrs("column-order") == cols)
  }

  test("oversized attribute payloads fail loudly instead of wrapping the u16 size") {
    // v1 object-header message sizes are u16: a >65528 B attr body
    // would wrap modulo 2^16 and write a silently corrupt file
    val f = new Hdf5.File
    val huge = Seq.tabulate(5000)(i => s"name_$i")
    val ex = intercept[IllegalArgumentException] {
      f.dataset(Seq(1L), Hdf5.F64, Hdf5.f64Raw(Array(1.0)),
        Seq(Hdf5.Attr("names", Hdf5.StrArrV(huge))))
    }
    assert(ex.getMessage.contains("message-size limit"))
  }

  test("vlen string datasets: global heap roundtrip incl. empty and long values") {
    val f = new Hdf5.File
    val vals = Seq("", "a", "x" * 100, "", "mixed-Ascii_09", "y" * 7, "z" * 8)
    val dsAddr = f.vlenStrDataset(vals)
    val rootAddr = f.group(Seq("s" -> dsAddr))
    val dir = Files.createTempDirectory("vlen-spec")
    val p = dir.resolve("v.h5").toString
    Files.write(Paths.get(p), f.finish(rootAddr))
    val root = H5Read.read(p)
    val ds = root.children("s")
    assert(ds.dtype == "vlenstr16")
    assert(ds.dims == Seq(vals.length.toLong))
    assert(strs(ds) == vals)
    // empty strings must carry the null reference, not a heap object
    val refBytes = ds.data
    Seq(0, 3).foreach { i =>
      assert(refBytes.slice(i * 16, (i + 1) * 16).forall(_ == 0), s"ref $i")
    }
  }

  test("global heap collections honor libhdf5's constraints") {
    // (a) minimum collection size 4096, surplus carried by a
    // free-space object; (b) >65535 objects roll over to a second
    // collection (the object index is a u16)
    val f = new Hdf5.File
    val small = Seq("alpha", "beta")
    val smallAddr = f.vlenStrDataset(small)
    val n = 70000
    val big = (0 until n).map(i => s"v$i")
    val bigAddr = f.vlenStrDataset(big)
    val rootAddr = f.group(Seq("s" -> smallAddr, "b" -> bigAddr))
    val dir = Files.createTempDirectory("vlen-gcol")
    val p = dir.resolve("g.h5").toString
    Files.write(Paths.get(p), f.finish(rootAddr))
    val raw = Files.readAllBytes(Paths.get(p))
    // every GCOL must declare size >= 4096
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    var gcols = 0
    var i = 0
    while (i + 4 <= raw.length) {
      if (raw(i) == 'G' && raw(i + 1) == 'C' && raw(i + 2) == 'O' &&
          raw(i + 3) == 'L' && i % 8 == 0) {
        val size = bb.getLong(i + 8)
        assert(size >= 4096, s"GCOL at $i declares $size bytes")
        gcols += 1
        i += size.toInt // skip the collection body
      } else i += 1
    }
    assert(gcols == 3, s"expected 1 small + 2 rollover collections, found $gcols")
    // and everything reads back exactly
    val root = H5Read.read(p)
    assert(strs(root.children("s")) == small)
    assert(strs(root.children("b")) == big)
  }

  test("vlen dataset with only empty strings writes no heap at all") {
    val f = new Hdf5.File
    val dsAddr = f.vlenStrDataset(Seq("", "", ""))
    val rootAddr = f.group(Seq("e" -> dsAddr))
    val dir = Files.createTempDirectory("vlen-empty")
    val p = dir.resolve("e.h5").toString
    Files.write(Paths.get(p), f.finish(rootAddr))
    val ds = H5Read.read(p).children("e")
    assert(strs(ds) == Seq("", "", ""))
    assert(!new String(Files.readAllBytes(Paths.get(p)),
      java.nio.charset.StandardCharsets.ISO_8859_1).contains("GCOL"))
  }

  test("substring column match mirrors the reference's pandas filter(regex)") {
    import spark.implicits._
    // 'nofeat_x' contains "feat" -> X column; 'other' matches neither
    val df = Seq((1.0, 2.0, "g", 3.0))
      .toDF("feat_a", "nofeat_x", "meta_g", "other").coalesce(1)
    val dir = Files.createTempDirectory("anndata-match").toString
    AnnData.export(df, dir, "f")
    val root = H5Read.read(
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".h5ad")).head.getPath)
    assert(strs(root.children("var").children("_index")) == Seq("feat_a", "nofeat_x"))
    assert(root.children("obs").children.keySet == Set("_index", "meta_g"))
  }
}
