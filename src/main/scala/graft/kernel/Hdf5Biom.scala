package graft.kernel

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM HDF5 reader for BIOM v2.1 files — no Spark deps.
  *
  * Covers exactly the subset h5py-written BIOM 2.1 containers use
  * (verified against the reference's committed fixtures, reference:
  * src/BIOMReader.cpp:117-186, data/biom): superblock v0 with 8-byte
  * offsets, symbol-table groups (B-tree v1 + local heap + SNOD),
  * object header v1 (dataspace/datatype/layout/attribute/continuation
  * messages), contiguous AND chunked dataset layouts (B-tree v1 chunk
  * index, deflate filter), fixed-width ints/floats and variable-length
  * strings through global heap collections. Filters other than deflate
  * are rejected with a clear error.
  */
object Hdf5Biom {

  final class Hdf5Exception(msg: String) extends IllegalArgumentException(msg)

  private final class Reader(data: Array[Byte], path: String) {
    private val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    private def u16(off: Long): Int = buf.getShort(off.toInt) & 0xffff
    private def u32(off: Long): Long = buf.getInt(off.toInt) & 0xffffffffL
    private def u64(off: Long): Long = buf.getLong(off.toInt)
    private def sig(off: Long, s: String): Boolean =
      (0 until s.length).forall(i => data(off.toInt + i) == s.charAt(i).toByte)

    if (data.length < 56 || !sig(0, "HDF"))
      throw new Hdf5Exception(s"File is not a BIOM file: $path")
    if (data(8) != 0)
      throw new Hdf5Exception(s"Unsupported HDF5 superblock version ${data(8)}: $path")

    private val rootSte = 56L // root group symbol table entry (v0 layout)
    val rootHeader: Long = u64(rootSte + 8)
    private val rootBtree = u64(rootSte + 24)
    private val rootHeap = u64(rootSte + 32)

    final case class Entry(name: String, header: Long, isGroup: Boolean,
        btree: Long, heap: Long)

    private def localHeapData(off: Long): Long = {
      if (!sig(off, "HEAP")) throw new Hdf5Exception(s"Bad local heap at $off: $path")
      u64(off + 24)
    }

    private def heapString(heapData: Long, offset: Long): String = {
      var end = heapData + offset
      while (data(end.toInt) != 0) end += 1
      new String(data, (heapData + offset).toInt, (end - heapData - offset).toInt, "UTF-8")
    }

    def groupEntries(btree: Long, heap: Long): Seq[Entry] = {
      val hd = localHeapData(heap)
      val out = Seq.newBuilder[Entry]
      def walk(node: Long): Unit = {
        if (!sig(node, "TREE")) throw new Hdf5Exception(s"Bad btree node at $node: $path")
        val level = data(node.toInt + 5)
        val n = u16(node + 6)
        var p = node + 24
        val children = (0 until n).map { _ =>
          p += 8; val c = u64(p); p += 8; c
        }
        for (c <- children) {
          if (level > 0) walk(c)
          else {
            if (!sig(c, "SNOD")) throw new Hdf5Exception(s"Bad SNOD at $c: $path")
            val ns = u16(c + 6)
            var q = c + 8
            for (_ <- 0 until ns) {
              val cache = u32(q + 16)
              out += Entry(heapString(hd, u64(q)), u64(q + 8), cache == 1,
                u64(q + 24), u64(q + 32))
              q += 40
            }
          }
        }
      }
      walk(btree)
      out.result()
    }

    def rootEntries: Seq[Entry] = groupEntries(rootBtree, rootHeap)

    /** (type, bodyOffset, size) object-header-v1 messages. */
    def messages(hdr: Long): Seq[(Int, Long, Int)] = {
      val nmsgs = u16(hdr + 2)
      val hdrSize = u32(hdr + 8)
      val msgs = Seq.newBuilder[(Int, Long, Int)]
      var count = 0
      var blocks = List((hdr + 16, hdrSize))
      while (blocks.nonEmpty && count < nmsgs) {
        val (boff, bsize) = blocks.head
        blocks = blocks.tail
        var p = boff
        while (p < boff + bsize - 4 && count < nmsgs) {
          val mtype = u16(p)
          val msize = u16(p + 2)
          if (mtype == 0x10) blocks = blocks :+ ((u64(p + 8), u64(p + 16)))
          msgs += ((mtype, p + 8, msize))
          count += 1
          p += 8 + msize
        }
      }
      msgs.result()
    }

    final case class Dataset(dims: Seq[Long], dtClass: Int, dtSize: Int,
        contiguous: Option[(Long, Long)],
        chunked: Option[(Long, Seq[Int])], // (chunk btree addr, chunk dims incl. element size)
        deflate: Boolean) {
      def elemCount: Int = dims.product.toInt
    }

    def dataset(hdr: Long): Dataset = {
      var dims: Seq[Long] = Seq.empty
      var dtClass = -1
      var dtSize = 0
      var contiguous: Option[(Long, Long)] = None
      var chunked: Option[(Long, Seq[Int])] = None
      var deflate = false
      for ((mtype, boff, msize) <- messages(hdr)) mtype match {
        case 0x1 => // dataspace v1
          val rank = data(boff.toInt + 1)
          dims = (0 until rank).map(i => u64(boff + 8 + 8 * i))
        case 0x3 => // datatype
          dtClass = data(boff.toInt) & 0xf
          dtSize = u32(boff + 4).toInt
        case 0x8 => // layout v3
          val ver = data(boff.toInt)
          if (ver != 3) throw new Hdf5Exception(s"Unsupported layout version $ver: $path")
          data(boff.toInt + 1) match {
            case 1 => contiguous = Some((u64(boff + 2), u64(boff + 10)))
            case 2 =>
              val dim = data(boff.toInt + 2) & 0xff
              val btreeAddr = u64(boff + 3)
              val chunkDims = (0 until dim).map(i => u32(boff + 11 + 4 * i).toInt)
              chunked = Some((btreeAddr, chunkDims))
            case 0 => throw new Hdf5Exception(
              s"Compact HDF5 datasets are outside the supported BIOM subset: $path")
            case other => throw new Hdf5Exception(s"Unknown layout class $other: $path")
          }
        case 0xB => // filter pipeline v1: only deflate (id 1) supported
          val nf = data(boff.toInt + 1) & 0xff
          var p = boff + 8
          for (_ <- 0 until nf) {
            val fid = u16(p)
            val nameLen = u16(p + 2)
            val nValues = u16(p + 6)
            if (fid == 1) deflate = true
            else throw new Hdf5Exception(s"Unsupported HDF5 filter id $fid: $path")
            p += 8 + ((nameLen + 7) & ~7) + 4 * nValues
            if (nValues % 2 == 1) p += 4 // client values padded to 8
          }
        case _ =>
      }
      Dataset(dims, dtClass, dtSize, contiguous, chunked, deflate)
    }

    private def inflate(off: Long, len: Long): Array[Byte] = {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data, off.toInt, len.toInt)
      val out = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(tmp)
        if (n == 0 && inf.needsInput())
          throw new Hdf5Exception(s"Truncated deflate chunk at $off: $path")
        out.write(tmp, 0, n)
      }
      inf.end()
      out.toByteArray
    }

    /** Reconstruct a (rank ≤ 1) dataset's raw bytes — contiguous slice
      * or chunk-btree walk with optional deflate.
      */
    def raw(ds: Dataset): Array[Byte] = {
      val elemSize = if (ds.dtClass == 9) 16 else ds.dtSize
      val total = ds.elemCount * elemSize
      (ds.contiguous, ds.chunked) match {
        case (Some((addr, _)), _) =>
          val out = new Array[Byte](total)
          if (total > 0) System.arraycopy(data, addr.toInt, out, 0, total)
          out
        case (None, Some((btreeAddr, chunkDims))) =>
          val out = new Array[Byte](total)
          val keyDims = chunkDims.length
          def walk(node: Long): Unit = {
            if (!sig(node, "TREE"))
              throw new Hdf5Exception(s"Bad chunk btree at $node: $path")
            val level = data(node.toInt + 5)
            val n = u16(node + 6)
            var p = node + 24
            for (_ <- 0 until n) {
              val storedSize = u32(p)
              val offs = (0 until keyDims).map(i => u64(p + 8 + 8 * i))
              p += 8 + 8 * keyDims
              val child = u64(p)
              p += 8
              if (level > 0) walk(child)
              else {
                val bytes =
                  if (ds.deflate) inflate(child, storedSize)
                  else { val b = new Array[Byte](storedSize.toInt)
                    System.arraycopy(data, child.toInt, b, 0, storedSize.toInt); b }
                val dst = offs.head.toInt * elemSize
                val len = math.min(bytes.length, total - dst)
                if (len > 0) System.arraycopy(bytes, 0, out, dst, len)
              }
            }
          }
          if (total > 0 && btreeAddr != -1L && btreeAddr != 0xffffffffffffffffL)
            walk(btreeAddr)
          out
        case _ => throw new Hdf5Exception(s"Dataset has no data layout: $path")
      }
    }

    /** Root attribute first-int values by name (enough for
      * format-version / shape / nnz checks).
      */
    def rootAttrFirstInt(name: String): Option[Long] = {
      for ((mtype, boff, _) <- messages(rootHeader) if mtype == 0xC) {
        val nsz = u16(boff + 2); val dsz = u16(boff + 4); val ssz = u16(boff + 6)
        var p = boff + 8
        val end = {
          var e = p
          while (data(e.toInt) != 0) e += 1
          e
        }
        val aname = new String(data, p.toInt, (end - p).toInt, "UTF-8")
        p += (nsz + 7) & ~7
        p += (dsz + 7) & ~7
        p += (ssz + 7) & ~7
        if (aname == name) return Some(u32(p))
      }
      None
    }

    private def globalHeapObject(collection: Long, index: Long): Array[Byte] = {
      if (!sig(collection, "GCOL"))
        throw new Hdf5Exception(s"Bad global heap at $collection: $path")
      val size = u64(collection + 8)
      var p = collection + 16
      while (p < collection + size) {
        val idx = u16(p)
        val osz = u64(p + 8)
        if (idx == index) {
          val out = new Array[Byte](osz.toInt)
          System.arraycopy(data, p.toInt + 16, out, 0, osz.toInt)
          return out
        }
        p += 16 + ((osz + 7) & ~7)
      }
      throw new Hdf5Exception(s"Global heap object $index not found: $path")
    }

    def vlenStrings(ds: Dataset): Seq[String] = {
      require(ds.dtClass == 9, s"expected vlen strings, got class ${ds.dtClass}")
      val bytes = raw(ds)
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      (0 until ds.elemCount).map { i =>
        val len = bb.getInt(16 * i)
        val gaddr = bb.getLong(16 * i + 4)
        val gidx = bb.getInt(16 * i + 12)
        new String(globalHeapObject(gaddr, gidx.toLong), 0, len, "UTF-8")
      }
    }

    def fixedStrings(ds: Dataset): Seq[String] = {
      require(ds.dtClass == 3, s"expected fixed strings, got class ${ds.dtClass}")
      val bytes = raw(ds)
      (0 until ds.elemCount).map { i =>
        val off = ds.dtSize * i
        var end = off
        while (end < off + ds.dtSize && bytes(end) != 0) end += 1
        new String(bytes, off, end - off, "UTF-8")
      }
    }

    def strings(ds: Dataset): Seq[String] =
      if (ds.elemCount == 0) Seq.empty // empty arrays carry h5py's default dtype
      else if (ds.dtClass == 9) vlenStrings(ds)
      else fixedStrings(ds)

    def longs(ds: Dataset): Array[Long] = {
      val bytes = raw(ds)
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      Array.tabulate(ds.elemCount) { i =>
        ds.dtSize match {
          case 1 => bytes(i).toLong
          case 2 => bb.getShort(2 * i).toLong
          case 4 => bb.getInt(4 * i).toLong
          case 8 => bb.getLong(8 * i)
          case s => throw new Hdf5Exception(s"Unsupported int width $s: $path")
        }
      }
    }

    def doubles(ds: Dataset): Array[Double] = {
      val bytes = raw(ds)
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      Array.tabulate(ds.elemCount) { i =>
        ds.dtSize match {
          case 4 => bb.getFloat(4 * i).toDouble
          case 8 => bb.getDouble(8 * i)
          case s => throw new Hdf5Exception(s"Unsupported float width $s: $path")
        }
      }
    }
  }

  /** Parse a BIOM v2.1 HDF5 image → COO (sample_id, feature_id, value)
    * rows via the sample-major CSR group.
    */
  def readCoo(bytes: Array[Byte], path: String): Vector[(String, String, Double)] = {
    val r = new Reader(bytes, path)
    if (!r.rootAttrFirstInt("format-version").contains(2L))
      throw new Hdf5Exception(s"File is not a BIOM file: $path")
    val root = r.rootEntries.map(e => e.name -> e).toMap
    def group(name: String): Map[String, r.Entry] = {
      val e = root.getOrElse(name,
        throw new Hdf5Exception(s"File is not a BIOM file (missing /$name): $path"))
      r.groupEntries(e.btree, e.heap).map(x => x.name -> x).toMap
    }
    val sample = group("sample")
    val observation = group("observation")
    val sampleIds = r.strings(r.dataset(sample("ids").header))
    val obsIds = r.strings(r.dataset(observation("ids").header))
    val matrix = r.groupEntries(sample("matrix").btree, sample("matrix").heap)
      .map(x => x.name -> x).toMap
    val values = r.doubles(r.dataset(matrix("data").header))
    val indices = r.longs(r.dataset(matrix("indices").header))
    val indptr = r.longs(r.dataset(matrix("indptr").header))
    val out = Vector.newBuilder[(String, String, Double)]
    for (s <- sampleIds.indices) {
      var j = indptr(s)
      while (j < indptr(s + 1)) {
        out += ((sampleIds(s), obsIds(indices(j.toInt).toInt), values(j.toInt)))
        j += 1
      }
    }
    out.result()
  }
}
