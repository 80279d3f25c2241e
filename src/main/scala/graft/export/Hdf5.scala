package graft.export

import java.nio.charset.StandardCharsets

/** Minimal HDF5 writer — just enough of the public HDF5 File Format
  * Specification (version 0 superblock, old-style groups with local
  * heap + v1 B-tree + symbol nodes, v1 object headers, contiguous
  * layout, global heap collections) to emit AnnData `.h5ad` containers
  * (reference K2, export/anndata.py:12-60) from a JVM with no HDF5
  * binding. String datasets AND string attributes use the
  * variable-length encoding h5py writes for `str` data (class-9 vlen
  * datatype, UTF-8 charset, GCOL global heap collections), so both
  * round-trip through h5py as Python str unchanged. Verified
  * structurally by the independent reader in Hdf5Spec.
  */
object Hdf5 {

  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF — the "undefined address"

  /** little-endian growable buffer with 8-alignment and patching */
  final class Buf {
    private var arr = new Array[Byte](1 << 16)
    private var len = 0
    def pos: Long = len.toLong
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        val need = len.toLong + n
        require(need <= Int.MaxValue - 8,
          s"HDF5 buffer would exceed 2 GiB ($need bytes) — repartition to smaller partitions")
        var cap = arr.length.toLong
        while (cap < need) cap *= 2
        arr = java.util.Arrays.copyOf(arr, math.min(cap, Int.MaxValue - 8L).toInt)
      }
    def u8(v: Int): Unit = { ensure(1); arr(len) = v.toByte; len += 1 }
    def u16(v: Int): Unit = { u8(v & 0xff); u8((v >> 8) & 0xff) }
    def u32(v: Long): Unit = { u16((v & 0xffff).toInt); u16(((v >> 16) & 0xffff).toInt) }
    def u64(v: Long): Unit = { u32(v & 0xffffffffL); u32((v >>> 32) & 0xffffffffL) }
    def bytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, arr, len, b.length); len += b.length }
    def zeros(n: Int): Unit = { ensure(n); len += n }
    def align8(): Long = { while (len % 8 != 0) u8(0); pos }
    def result(): Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  // ---- datatypes ----------------------------------------------------------

  sealed trait Dtype { def size: Int; def encode(b: Buf): Unit }

  private def floatType(b: Buf, size: Int, prec: Int, expLoc: Int, expSz: Int,
      manSz: Int, bias: Int, signLoc: Int): Unit = {
    b.u8(0x11) // version 1, class 1 (float)
    b.u8(0x20) // LE, implied-msb mantissa normalization
    b.u8(signLoc); b.u8(0)
    b.u32(size.toLong)
    b.u16(0); b.u16(prec)
    b.u8(expLoc); b.u8(expSz); b.u8(0); b.u8(manSz)
    b.u32(bias.toLong)
  }

  case object F64 extends Dtype {
    val size = 8
    def encode(b: Buf): Unit = floatType(b, 8, 64, 52, 11, 52, 1023, 63)
  }
  case object F32 extends Dtype {
    val size = 4
    def encode(b: Buf): Unit = floatType(b, 4, 32, 23, 8, 23, 127, 31)
  }
  case object I64 extends Dtype {
    val size = 8
    def encode(b: Buf): Unit = {
      b.u8(0x10) // version 1, class 0 (fixed-point)
      b.u8(0x08) // LE, signed
      b.u8(0); b.u8(0)
      b.u32(8)
      b.u16(0); b.u16(64)
    }
  }

  /** variable-length string (class 9): each element is a 16-byte
    * (length, global-heap collection address, object index) reference —
    * the encoding libhdf5/h5py write for str data. Charset UTF-8 on
    * both the vlen and its base type, exactly like h5py's str dtype,
    * so h5py decodes values back to Python str (not bytes). */
  case object VlenStr extends Dtype {
    val size = 16
    def encode(b: Buf): Unit = {
      b.u8(0x19) // version 1, class 9 (variable-length)
      b.u8(0x01) // bits 0-3: vlen type = string; bits 4-7: padding 0
      b.u8(0x01) // bits 8-11: charset 1 (UTF-8)
      b.u8(0)
      b.u32(16)
      // base datatype: 1-byte null-terminated UTF-8 string
      b.u8(0x13) // version 1, class 3 (string)
      b.u8(0x10) // bits 0-3: null-terminated; bits 4-7: charset UTF-8
      b.u8(0); b.u8(0)
      b.u32(1)
    }
  }

  private def dtypeBytes(t: Dtype): Array[Byte] = {
    val b = new Buf; t.encode(b); b.result()
  }

  /** simple dataspace: rank 0 = scalar */
  private def dataspaceBytes(dims: Seq[Long]): Array[Byte] = {
    val b = new Buf
    b.u8(1); b.u8(dims.length); b.u8(0); b.zeros(5)
    dims.foreach(b.u64)
    b.result()
  }

  // ---- attributes ---------------------------------------------------------

  sealed trait AttrValue
  final case class StrV(v: String) extends AttrValue
  final case class StrArrV(v: Seq[String]) extends AttrValue
  final case class Attr(name: String, value: AttrValue)

  private def pad8(n: Int): Int = (n + 7) / 8 * 8

  private def packAttr(name: String, dt: Array[Byte], ds: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val nameB = name.getBytes(StandardCharsets.US_ASCII) :+ 0.toByte
    val b = new Buf
    b.u8(1); b.u8(0)
    b.u16(nameB.length)
    b.u16(dt.length)
    b.u16(ds.length)
    b.bytes(nameB); b.zeros(pad8(nameB.length) - nameB.length)
    b.bytes(dt); b.zeros(pad8(dt.length) - dt.length)
    b.bytes(ds); b.zeros(pad8(ds.length) - ds.length)
    b.bytes(data)
    b.result()
  }

  // ---- object headers -----------------------------------------------------

  private final case class Msg(tpe: Int, body: Array[Byte])

  /** v1 object header: 16-byte prefix + 8-byte-aligned messages */
  private def writeObjectHeader(b: Buf, msgs: Seq[Msg]): Long = {
    val encoded = msgs.map { m =>
      val padded = pad8(m.body.length)
      // the per-message size field is u16: a body over 65528 bytes
      // (e.g. an attribute holding thousands of strings) would wrap
      // modulo 2^16 and write a silently corrupt file — fail loudly;
      // oversized attr payloads belong in a dataset, not an attribute
      require(padded <= 0xFFF8,
        s"object-header message type ${m.tpe} is ${m.body.length} B — " +
          "exceeds the HDF5 v1 u16 message-size limit (65528); store " +
          "large payloads as a dataset instead of an attribute")
      (m.tpe, m.body, padded)
    }
    val total = encoded.map(8 + _._3).sum
    val addr = b.align8()
    b.u8(1); b.u8(0)
    b.u16(msgs.length)
    b.u32(1) // reference count
    b.u32(total.toLong)
    b.zeros(4)
    encoded.foreach { case (tpe, body, padded) =>
      b.u16(tpe); b.u16(padded); b.u8(0); b.zeros(3)
      b.bytes(body); b.zeros(padded - body.length)
    }
    addr
  }

  // ---- file assembly ------------------------------------------------------

  /** one HDF5 file built root-last; datasets/groups return their
    * object-header addresses for linking */
  final class File {
    val b = new Buf
    b.zeros(96) // superblock patched in finish()

    /** contiguous N-D dataset */
    def dataset(dims: Seq[Long], dtype: Dtype, raw: Array[Byte],
        attrs: Seq[Attr] = Seq.empty): Long = {
      require(raw.length.toLong == dims.product * dtype.size, "raw size mismatch")
      val dataAddr = b.align8()
      b.bytes(raw)
      val layout = {
        val lb = new Buf
        lb.u8(3); lb.u8(1) // version 3, contiguous
        lb.u64(dataAddr); lb.u64(raw.length.toLong)
        lb.result()
      }
      writeObjectHeader(b,
        Seq(Msg(0x0001, dataspaceBytes(dims)), Msg(0x0003, dtypeBytes(dtype)),
          Msg(0x0008, layout)) ++ attrs.map(a => Msg(0x000C, attrBody(a))))
    }

    /** variable-length string dataset: string bytes live in global
      * heap collections (GCOL) written just before the dataset; the
      * dataset's raw data is the 16-byte references. Empty strings get
      * the null reference (length 0, address 0, index 0), matching
      * libhdf5. Collections honor libhdf5's constraints: at least
      * 4096 bytes each (smaller collections are rejected by its heap
      * deserializer), trailing space carried by a free-space object
      * (index 0), and at most 65535 objects per collection (the index
      * is a u16) — a new collection starts when one fills up. */
    def vlenStrDataset(vals: Seq[String], attrs: Seq[Attr] = Seq.empty): Long = {
      val raw = writeVlenRefs(vals.map(_.getBytes(StandardCharsets.UTF_8)))
      dataset(Seq(vals.length.toLong), VlenStr, raw, attrs)
    }

    /** write string payloads into GCOL collections and return the
      * packed 16-byte (length, collection addr, index) vlen references
      * — shared by vlen datasets and vlen attributes */
    private def writeVlenRefs(strBytes: Seq[Array[Byte]]): Array[Byte] = {
      val MinCollection = 4096L
      val MaxObjects = 65535
      val refs = Array.fill(strBytes.length)((0, 0L)) // (heap index, collection addr)
      // batch non-empty strings into <=65535-object collections
      val nonEmpty = strBytes.zipWithIndex.filter(_._1.nonEmpty)
      nonEmpty.grouped(MaxObjects).foreach { batch =>
        val addr = b.align8()
        val exact = 16L + batch.map(x => 16L + pad8(x._1.length)).sum
        // meet the 4096-byte minimum; any surplus must fit a 16-byte
        // free-space object header
        val total = {
          val t = math.max(exact, MinCollection)
          if (t == exact || t - exact >= 16) t else exact + 16
        }
        b.bytes("GCOL".getBytes(StandardCharsets.US_ASCII))
        b.u8(1); b.zeros(3)
        b.u64(total)
        var idx = 1
        batch.foreach { case (sb, i) =>
          b.u16(idx); b.u16(1) // object index, reference count
          b.u32(0)
          b.u64(sb.length.toLong)
          b.bytes(sb); b.zeros(pad8(sb.length) - sb.length)
          refs(i) = (idx, addr)
          idx += 1
        }
        val free = total - exact
        if (free > 0) {
          // free-space object: index 0, size covers the free space
          // including its own 16-byte header
          b.u16(0); b.u16(0); b.u32(0)
          b.u64(free)
          b.zeros((free - 16).toInt)
        }
      }
      val raw = new Buf
      strBytes.zipWithIndex.foreach { case (sb, i) =>
        val (idx, addr) = refs(i)
        raw.u32(sb.length.toLong)
        raw.u64(addr)
        raw.u32(idx.toLong)
      }
      raw.result()
    }

    /** attribute message body: vlen UTF-8 string scalar/array — the
      * string payloads go to the global heap first (like h5py's str
      * attrs), then the body carries the 16-byte references */
    private[Hdf5] def attrBody(a: Attr): Array[Byte] = a.value match {
      case StrV(v) =>
        packAttr(a.name, dtypeBytes(VlenStr), dataspaceBytes(Seq.empty),
          writeVlenRefs(Seq(v.getBytes(StandardCharsets.UTF_8))))
      case StrArrV(vs) =>
        packAttr(a.name, dtypeBytes(VlenStr), dataspaceBytes(Seq(vs.length.toLong)),
          writeVlenRefs(vs.map(_.getBytes(StandardCharsets.UTF_8))))
    }

    /** old-style group over already-written children. All links live in
      * one symbol node, which the superblock's group-leaf K (1024)
      * makes valid for up to 2·K entries. */
    def group(children: Seq[(String, Long)], attrs: Seq[Attr] = Seq.empty): Long = {
      require(children.length <= 2048,
        s"single-node group supports <= 2048 links, got ${children.length}")
      val sorted = children.sortBy(_._1)
      // local heap data: offset 0 holds the empty string; names 8-aligned
      val heapData = new Buf
      heapData.zeros(8)
      val nameOffsets = sorted.map { case (name, _) =>
        val off = heapData.pos
        val nb = name.getBytes(StandardCharsets.US_ASCII) :+ 0.toByte
        heapData.bytes(nb); heapData.align8()
        name -> off
      }.toMap
      val heapDataAddr = b.align8()
      val heapRaw = heapData.result()
      b.bytes(heapRaw)
      val heapAddr = b.align8()
      b.bytes("HEAP".getBytes(StandardCharsets.US_ASCII))
      b.u8(0); b.zeros(3)
      b.u64(heapRaw.length.toLong)
      b.u64(Undef) // no free list
      b.u64(heapDataAddr)
      // symbol node with all entries — fits because the superblock
      // declares group-leaf K=1024 (nsyms <= 2K = 2048, matching the
      // require above; wide feature-table groups need far more than
      // the library-default K=4's 8 entries)
      val snodAddr = b.align8()
      b.bytes("SNOD".getBytes(StandardCharsets.US_ASCII))
      b.u8(1); b.u8(0)
      b.u16(sorted.length)
      sorted.foreach { case (name, headerAddr) =>
        b.u64(nameOffsets(name)); b.u64(headerAddr)
        b.u32(0); b.u32(0); b.zeros(16)
      }
      // B-tree v1, single leaf child
      val btreeAddr = b.align8()
      b.bytes("TREE".getBytes(StandardCharsets.US_ASCII))
      b.u8(0); b.u8(0)
      b.u16(1)
      b.u64(Undef); b.u64(Undef)
      b.u64(0) // key 0: before all names
      b.u64(snodAddr)
      b.u64(sorted.lastOption.map(c => nameOffsets(c._1)).getOrElse(0L)) // key 1
      val symtab = { val sb = new Buf; sb.u64(btreeAddr); sb.u64(heapAddr); sb.result() }
      writeObjectHeader(b,
        Msg(0x0011, symtab) +: attrs.map(a => Msg(0x000C, attrBody(a))))
    }

    /** patch the version-0 superblock around the root group */
    def finish(rootHeaderAddr: Long): Array[Byte] = {
      val end = b.pos
      val sb = new Buf
      sb.bytes(Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      sb.u8(0); sb.u8(0); sb.u8(0); sb.u8(0) // superblock/freespace/root-STE versions
      sb.u8(0); sb.u8(8); sb.u8(8); sb.u8(0) // shared-header ver, offset+length sizes
      // leaf K bounds symbols per symbol node (nsyms <= 2K): 1024
      // keeps the single-SNOD groups above spec-valid up to 2048 links
      sb.u16(1024); sb.u16(16) // group leaf / internal K
      sb.u32(0) // consistency flags
      sb.u64(0) // base address
      sb.u64(Undef) // free-space info
      sb.u64(end) // end of file
      sb.u64(Undef) // driver info
      // root symbol table entry
      sb.u64(0); sb.u64(rootHeaderAddr); sb.u32(0); sb.u32(0); sb.zeros(16)
      val sbBytes = sb.result()
      var i = 0
      val out = b.result()
      while (i < sbBytes.length) { out(i) = sbBytes(i); i += 1 }
      out
    }
  }

  // ---- raw encoders -------------------------------------------------------

  def f32Raw(vals: Array[Float]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(vals.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putFloat); bb.array()
  }
  def f64Raw(vals: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(vals.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putDouble); bb.array()
  }
  def i64Raw(vals: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(vals.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putLong); bb.array()
  }
}
