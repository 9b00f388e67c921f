package graft.source

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

/** Pure-JVM reader for the subset of HDF5 that netCDF-4 files use
  * (S1 completion — the reference's primary input path opens
  * HDF5-backed forecast netCDFs via h5netcdf/xarray, ref
  * generator.py:485,661, and its slice writer emits netCDF-4 zlib-9,
  * ref generator.py:969-977). Implemented from the public "HDF5 File
  * Format Specification Version 3.0"; no native libs.
  *
  * Supported: superblock v0/v1/v2/v3; object headers v1 and v2 (with
  * continuation blocks); symbol-table groups (B-tree v1 + local heap +
  * SNOD) and compact link-message groups, recursively; datatypes
  * fixed-point (1/2/4/8 LE/BE signed/unsigned), IEEE float (2/4/8 —
  * binary16 included, the ML-array dtype),
  * fixed + vlen strings, object references, vlen sequences; compact /
  * contiguous / chunked (B-tree v1) data layouts; deflate, shuffle and
  * fletcher32 filters plus the registered hdf5plugin trio lz4 32004,
  * bitshuffle 32008 and zstd 32015 ([[H5Filters]]); global heap
  * (GCOL) for vlen attribute payloads;
  * netCDF-4 dimension scales (DIMENSION_LIST object-reference
  * resolution); DENSE groups and DENSE attributes (fractal-heap
  * storage + name-index v2 B-trees of ANY depth, types 5 and 8 —
  * the "latest"-format layouts h5py emits once links/attributes
  * outgrow compact storage); v4 data layouts with Single Chunk,
  * Implicit, Fixed Array (direct and PAGED), Extensible Array (ONE
  * unlimited dim — h5py `maxshape=(None,…)`, incl. super blocks and
  * paged data blocks) and v2 B-tree (≥2 unlimited dims) chunk
  * indexes; fractal heaps with child indirect blocks and I/O-filtered
  * (deflated) direct blocks. Not supported: huge/tiny heap objects,
  * non-IEEE floats — all rejected with explicit errors.
  */
object Hdf5 {

  private val Magic: Array[Byte] =
    Array(0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n')

  def isHdf5(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == Magic(i))

  val Undefined: Long = -1L // all-ones address

  /** Random-access byte provider — the seam that frees the parser from
    * a whole-file buffer. Small files wrap an in-memory array; archives
    * past 2 GiB read positioned ranges (metadata on the driver, chunk
    * payloads per executor — the Zarr split, Zarr.scala:251).
    */
  trait ByteSource extends java.io.Closeable {
    def length: Long
    /** Exactly `len` bytes at `pos` (throws on short read). */
    def read(pos: Long, len: Int): Array[Byte]
    override def close(): Unit = ()
  }

  final class ArraySource(bytes: Array[Byte]) extends ByteSource {
    def length: Long = bytes.length.toLong
    def read(pos: Long, len: Int): Array[Byte] = {
      // copyOfRange would silently zero-pad past the array end — a
      // truncated file must FAIL the contract, not parse as zeros
      require(pos >= 0 && len >= 0 && pos + len <= bytes.length,
        s"read past EOF at $pos+$len (file ${bytes.length} bytes)")
      java.util.Arrays.copyOfRange(bytes, pos.toInt, pos.toInt + len)
    }
  }

  /** Buffered absolute-position cursor over a [[ByteSource]] — the
    * ByteBuffer-shaped API the parser reads headers through. A small
    * readahead window keeps per-field reads off the underlying source
    * (one positioned read per ~8 KiB of header, not per short).
    */
  private[source] final class Cursor(src: ByteSource, start: Long,
                                     window: Int = 8192) {
    private var pos: Long = start
    private var ord: ByteOrder = ByteOrder.LITTLE_ENDIAN
    private var win: Array[Byte] = Array.emptyByteArray
    private var winStart: Long = 0L

    def position: Long = pos
    def seek(p: Long): Unit = pos = p
    def skip(n: Long): Unit = pos += n
    def order(o: ByteOrder): Unit = ord = o

    private def bb(n: Int): ByteBuffer = {
      if (pos < winStart || pos + n > winStart + win.length) {
        val avail = src.length - pos
        require(avail >= n, s"read past EOF at $pos+$n (len ${src.length})")
        win = src.read(pos, math.min(math.max(n, window).toLong, avail).toInt)
        winStart = pos
      }
      val b = ByteBuffer.wrap(win, (pos - winStart).toInt, n).order(ord)
      pos += n
      b
    }
    def get(): Byte = bb(1).get()
    def getShort(): Short = bb(2).getShort()
    def getInt(): Int = bb(4).getInt()
    def getLong(): Long = bb(8).getLong()
    def get(dst: Array[Byte]): Unit = {
      val src2 = read(dst.length)
      System.arraycopy(src2, 0, dst, 0, dst.length)
    }
    /** `n` bytes from the current position, advancing past them. */
    def read(n: Int): Array[Byte] = {
      require(pos >= 0 && pos + n <= src.length,
        s"read past EOF at $pos+$n (len ${src.length})")
      val out = src.read(pos, n)
      pos += n
      out
    }
  }

  /** Message types whose bodies we actually parse — the set whose
    * SHARED variants get resolved through the indirection record (a
    * shared variant of anything else is skipped anyway).
    */
  private val ConsumedMessages: Set[Int] =
    Set(0x0001, 0x0002, 0x0003, 0x0006, 0x0008, 0x000B, 0x000C, 0x0011, 0x0015)

  // datatype classes we understand
  val ClsFixed = 0; val ClsFloat = 1; val ClsString = 3
  val ClsBitfield = 4; val ClsOpaque = 5
  val ClsCompound = 6; val ClsReference = 7; val ClsEnum = 8
  val ClsVlen = 9; val ClsArray = 10

  /** One member of a compound datatype: (name, byte offset in the
    * record, member type).
    */
  final case class H5Member(name: String, offset: Int, tpe: H5Type)

  final case class H5Type(cls: Int, size: Int, littleEndian: Boolean,
                          signed: Boolean, base: Option[H5Type] = None,
                          vlenIsString: Boolean = false,
                          enumNames: Seq[String] = Nil,
                          enumValues: Seq[Long] = Nil,
                          members: Seq[H5Member] = Nil,
                          arrayDims: Seq[Int] = Nil,
                          bitPrecision: Int = 0,
                          /** Class-5 (opaque) tag string. */
                          opaqueTag: String = "") {
    /** True when only the low `bitPrecision` bits are significant — the
      * H5Tset_precision shape the nbit filter packs (padding bits come
      * back ZERO, so signed values need re-extension from precision).
      */
    def partialPrecision: Boolean =
      cls == ClsFixed && bitPrecision > 0 && bitPrecision < size * 8
  }

  /** The numeric type a value of `t` decodes through: enums decode as
    * their base integer type (CF flag variables are enum-of-int8, ref
    * generator.py:485 reads them transparently via libhdf5).
    */
  @annotation.tailrec
  def numericType(t: H5Type): H5Type = t.cls match {
    case ClsEnum => numericType(t.base.getOrElse(
      throw new IllegalArgumentException("enum datatype without base")))
    // bitfields (class 4, H5T_STD_B*) carry plain bytes and decode as
    // the unsigned integer of the same width and byte order
    case ClsBitfield => t.copy(cls = ClsFixed, signed = false)
    case _ => t
  }

  /** Dataspace: current extents plus max extents, where −1 marks an
    * UNLIMITED (appendable) dimension — the layout h5py's
    * `maxshape=(None, …)` produces, which selects the Extensible
    * Array / v2 B-tree chunk indexes.
    */
  final case class Space(dims: Seq[Long], maxDims: Seq[Long])

  sealed trait Layout
  final case class Contiguous(addr: Long, size: Long) extends Layout
  /** chunkDims excludes the trailing element-size pseudo-dimension. */
  final case class Chunked(btree: Long, chunkDims: Seq[Int]) extends Layout
  final case class Compact(data: Array[Byte]) extends Layout
  // v4 ("latest"-format) chunk indexes: the three shapes h5py/libhdf5
  // emit for fixed-shape datasets. Extensible Array and v2 B-tree
  // indexes (unlimited dimensions) are rejected explicitly at parse.
  /** One chunk covers the whole dataset; filteredSize < 0 = unfiltered. */
  final case class ChunkedSingle(addr: Long, chunkDims: Seq[Int],
                                 filteredSize: Long, filterMask: Int)
      extends Layout
  /** Unfiltered chunks laid out contiguously in row-major grid order. */
  final case class ChunkedImplicit(addr: Long, chunkDims: Seq[Int])
      extends Layout
  /** Fixed Array index: FAHD header → FADB element block. */
  final case class ChunkedFixedArray(addr: Long, chunkDims: Seq[Int])
      extends Layout
  /** Extensible Array index (ONE unlimited dimension — the appendable
    * time axis of a growing forecast archive): EAHD header → EAIB
    * index block → super/data blocks; chunks linearized with the
    * unlimited dim swizzled slowest.
    */
  final case class ChunkedExtArray(addr: Long, chunkDims: Seq[Int])
      extends Layout
  /** v2 B-tree index (≥2 unlimited dimensions): type-10/11 records
    * carrying scaled chunk coordinates directly.
    */
  final case class ChunkedBtreeV2(addr: Long, chunkDims: Seq[Int])
      extends Layout

  /** Chunk shape of any chunked layout flavor. */
  def chunkDims(l: Layout): Seq[Int] = l match {
    case Chunked(_, cd) => cd
    case ChunkedSingle(_, cd, _, _) => cd
    case ChunkedImplicit(_, cd) => cd
    case ChunkedFixedArray(_, cd) => cd
    case ChunkedExtArray(_, cd) => cd
    case ChunkedBtreeV2(_, cd) => cd
    case other =>
      throw new IllegalArgumentException(s"not a chunked layout: $other")
  }

  final case class Filter(id: Int, client: Seq[Int])

  /** Field widths of a version-2 B-tree at a given node size — the
    * capacity recurrence the library derives from the node size
    * (H5B2 header math): the LEAF capacity sizes every per-child
    * record-count field (leaves hold the most records), and internal
    * capacities compound into the total-subtree-count widths that
    * appear in child pointers at depth ≥ 2. Shared by the reader's
    * walk and the writer's fixture rendering so both sides agree.
    */
  private[source] final case class V2BtreeGeometry(nodeSize: Int,
                                                   recordSize: Int,
                                                   depth: Int) {
    private def bytesFor(v: Long): Int = {
      var b = 1; var cap = 256L
      while (v >= cap) { b += 1; cap *= 256 }
      b
    }
    val leafMax: Int = (nodeSize - 10) / recordSize
    val maxNrecSize: Int = bytesFor(leafMax)
    /** record capacity of an internal node at depth d (d ≥ 1) */
    val intMax: Array[Int] = new Array[Int](depth + 1)
    /** max records a subtree rooted at depth d can hold */
    val cumMax: Array[Long] = new Array[Long](depth + 1)
    /** width of the total-count field under a depth-d child (0 for leaves) */
    val cumNrecSize: Array[Int] = new Array[Int](depth + 1)
    cumMax(0) = leafMax
    cumNrecSize(0) = 0
    (1 to depth).foreach { d =>
      val ptr = 8 + maxNrecSize + cumNrecSize(d - 1)
      intMax(d) = (nodeSize - 10 - ptr) / (recordSize + ptr)
      cumMax(d) = (intMax(d) + 1).toLong * cumMax(d - 1) + intMax(d)
      cumNrecSize(d) = bytesFor(cumMax(d))
    }
    /** on-disk size of a node at depth d holding `nrec` records */
    def nodeBytes(d: Int, nrec: Int): Long =
      if (d == 0) 10L + nrec.toLong * recordSize
      else 10L + nrec.toLong * recordSize +
        (nrec + 1).toLong * (8 + maxNrecSize + cumNrecSize(d - 1))
  }

  /** Attribute with the decodings we need: text (fixed or vlen string),
    * numeric values, and object-reference lists (one Seq per dataspace
    * element — DIMENSION_LIST is a vlen-of-refs per dimension).
    */
  final case class Attr(name: String, text: String, nums: Seq[Double],
                        refs: Seq[Seq[Long]])

  final case class Dataset(name: String, addr: Long, dims: Seq[Int],
                           dtype: H5Type, layout: Layout,
                           filters: Seq[Filter], attrs: Seq[Attr],
                           maxDims: Seq[Long] = Seq.empty) {
    def attr(n: String): Option[Attr] = attrs.find(_.name == n)
    /** max extents, −1 = unlimited; empty maxDims means "= dims" */
    def maxDimsOr: Seq[Long] =
      if (maxDims.isEmpty) dims.map(_.toLong) else maxDims
    def unlimited: Set[Int] =
      maxDims.indices.filter(maxDims(_) == -1L).toSet
    def attrText(n: String): Option[String] =
      attr(n).flatMap(a => Option(a.text))
    def isDimScale: Boolean = attrText("CLASS").contains("DIMENSION_SCALE")
  }

  final case class File(gatts: Seq[Attr], datasets: Seq[Dataset]) {
    def dataset(n: String): Option[Dataset] = datasets.find(_.name == n)
    def gatt(n: String): Option[Attr] = gatts.find(_.name == n)
    private lazy val byAddr: Map[Long, Dataset] =
      datasets.map(d => d.addr -> d).toMap
    /** netCDF-4 dimension names of a variable: DIMENSION_LIST object
      * references resolved to the dim-scale datasets' link names; falls
      * back to positional `phony_dim_<i>` when the attribute is absent.
      */
    def dimNames(ds: Dataset): Seq[String] = ds.attr("DIMENSION_LIST") match {
      case Some(a) if a.refs.nonEmpty =>
        a.refs.zipWithIndex.map { case (rs, i) =>
          rs.headOption.flatMap(byAddr.get).map(_.name)
            .getOrElse(s"phony_dim_$i")
        }
      case _ => ds.dims.indices.map(i => s"phony_dim_$i")
    }
  }

  // ------------------------------------------------------------- parse

  def read(bytes: Array[Byte]): File = read(new ArraySource(bytes))

  /** Parse through a positioned-read source — the >2 GiB path: headers,
    * heaps and B-trees are read as small ranges; chunk payloads as
    * exact byte ranges. No whole-file buffer anywhere.
    */
  def read(src: ByteSource): File = new Parser(src).parse()

  private final class Parser(src: ByteSource) {
    private def cur(pos: Long): Cursor = new Cursor(src, pos)
    private def u2(c: Cursor): Int = c.getShort() & 0xFFFF
    private def u4(c: Cursor): Long = c.getInt().toLong & 0xFFFFFFFFL
    private def u2(b: ByteBuffer): Int = b.getShort() & 0xFFFF
    private def u4(b: ByteBuffer): Long = b.getInt().toLong & 0xFFFFFFFFL

    def parse(): File = {
      require(src.length >= 8 && isHdf5(src.read(0, 8)),
        "not an HDF5 file (bad signature)")
      val c = cur(8)
      val sbVer = c.get().toInt
      val rootOh: Long = sbVer match {
        case 0 | 1 =>
          c.get(); c.get(); c.get(); c.get() // fs ver, root ver, res, shared ver
          val so = c.get().toInt; val sl = c.get().toInt
          require(so == 8 && sl == 8,
            s"unsupported offset/length sizes $so/$sl (8/8 expected)")
          c.get() // reserved
          u2(c); u2(c); u4(c) // leaf k, internal k, flags
          if (sbVer == 1) { u2(c); u2(c) } // indexed-storage k + reserved
          val base = c.getLong(); c.getLong(); c.getLong(); c.getLong() // base, fs, eof, driver
          require(base == 0, s"non-zero base address $base unsupported")
          c.getLong() // root link-name offset
          c.getLong() // root object-header address
        case 2 | 3 =>
          val so = c.get().toInt; val sl = c.get().toInt
          require(so == 8 && sl == 8,
            s"unsupported offset/length sizes $so/$sl (8/8 expected)")
          c.get() // flags
          val base = c.getLong()
          sbExtAddr = c.getLong() // superblock extension (SOHM table et al.)
          c.getLong() // eof
          require(base == 0, s"non-zero base address $base unsupported")
          c.getLong() // root object-header address
        case v => throw new IllegalArgumentException(s"superblock version $v")
      }
      val out = Vector.newBuilder[Dataset]
      val rootAttrs = walkObject(rootOh, prefix = "", out)
      File(rootAttrs, out.result())
    }

    /** Parse the object at `oh`; groups recurse (child names joined with
      * '/'), datasets append to `out`. Returns the object's attributes
      * (meaningful for the root group's global attrs).
      */
    private def walkObject(oh: Long, prefix: String,
                           out: scala.collection.mutable.Builder[Dataset, Vector[Dataset]]): Seq[Attr] = {
      val msgs = readMessages(oh)
      // compact attribute messages, plus DENSE attribute storage (the
      // "latest"-format layout once an object outgrows the compact
      // limit): attribute messages as fractal-heap managed objects
      // indexed by a name v2 B-tree — same machinery as dense links
      val attrs = msgs.collect { case (0x000C, body) => parseAttribute(body) } ++
        msgs.collectFirst { case (0x0015, body) => body }.toSeq.flatMap { body =>
          val b = buf0(body); b.get()
          val flags = b.get().toInt
          if ((flags & 0x1) != 0) u2(b) // max creation index
          val fheap = b.getLong()
          val nameBtree = b.getLong()
          if (fheap == Undefined) Seq.empty
          else denseAttributes(fheap, nameBtree)
        }
      val space = msgs.collectFirst { case (0x0001, body) => parseDataspace(body) }
      val dtype = msgs.collectFirst { case (0x0003, body) => parseDatatype(buf0(body)) }
      val parsedLayout = msgs.collectFirst { case (0x0008, body) => parseLayout(body) }
      val layout = parsedLayout.map(_._1)
      val denseChildren: Seq[(String, Long)] =
        msgs.collectFirst { case (0x0002, body) => body }.toSeq.flatMap { body =>
          // Link Info: a defined fractal-heap address means the group's
          // links are DENSE — stored as link messages inside a fractal
          // heap, indexed by a name v2 B-tree (the "latest"-format layout
          // h5py/libhdf5 emit once a group outgrows compact storage)
          val b = buf0(body); b.get()
          val flags = b.get().toInt
          if ((flags & 0x1) != 0) b.getLong() // max creation index
          val fheap = b.getLong()
          val nameBtree = b.getLong()
          if (fheap == Undefined) Seq.empty else denseLinks(fheap, nameBtree)
        }
      val isDataset = space.isDefined && dtype.isDefined && layout.isDefined
      if (isDataset) {
        val filters = msgs.collectFirst { case (0x000B, body) => parseFilters(body) }
          .getOrElse(Nil)
        // flags bit 0 = DONT_FILTER_PARTIAL_BOUND_CHUNKS
        // (H5Pset_chunk_opts): edge chunks are stored UNFILTERED while
        // the index reports filter mask 0, so running the pipeline
        // would silently mis-decode them — fail loudly, but only when
        // a pipeline actually exists (the flag is harmless otherwise)
        require(!parsedLayout.get._2 || filters.isEmpty,
          "v4 chunked layout: unfiltered partial edge chunks " +
            "(DONT_FILTER_PARTIAL_BOUND_CHUNKS) with a filter " +
            "pipeline unsupported")
        // v4 chunk-dims convention insurance: writers differ on whether
        // the encoded dims are the dataspace rank or rank+1 with the
        // element size as a trailing pseudo-dim (the v3 convention);
        // reconcile against the dataspace so both decode correctly
        val lay = reconcileV4Chunks(layout.get, space.get.dims.length,
          dtype.get.size)
        // ENUM-typed datasets surface their name↔value map as synthetic
        // attributes (the CF flag_meanings/flag_values shape netCDF4-
        // python derives from the enum dict) so downstream relational
        // plans can label categories without re-opening the type
        val enumAttrs = dtype.filter(_.cls == ClsEnum).toSeq.flatMap { t =>
          Seq(Attr("enum_names", t.enumNames.mkString(" "), Nil, Nil),
            Attr("enum_values", null, t.enumValues.map(_.toDouble), Nil))
        }
        out += Dataset(prefix.stripPrefix("/"), oh,
          space.get.dims.map(_.toInt), dtype.get, lay, filters,
          attrs ++ enumAttrs, space.get.maxDims)
      } else {
        // group: symbol-table children + compact link-message children
        msgs.collectFirst { case (0x0011, body) => body }.foreach { body =>
          val b = buf0(body)
          val btree = b.getLong(); val heap = b.getLong()
          symbolTableChildren(btree, heap).foreach { case (name, a) =>
            walkObject(a, s"$prefix/$name", out)
          }
        }
        msgs.collect { case (0x0006, body) => parseLink(body) }.foreach {
          case Some((name, a)) => walkObject(a, s"$prefix/$name", out)
          case None            => ()
        }
        denseChildren.foreach { case (name, a) =>
          walkObject(a, s"$prefix/$name", out)
        }
      }
      attrs
    }

    // ---- dense groups: fractal heap + name-index v2 B-tree

    /** All (name, objectHeaderAddr) links of a dense group: walk the
      * name-index v2 B-tree for the heap IDs (type-5 records: 4-byte
      * name hash + heap ID), then fetch each link message from the
      * fractal heap and parse it like any compact link.
      */
    private def denseLinks(fheapAddr: Long,
                           nameBtreeAddr: Long): Seq[(String, Long)] = {
      val heap = new FractalHeap(fheapAddr)
      v2BtreeRecords(nameBtreeAddr, Set(5))._2.flatMap { rec =>
        val heapId = java.util.Arrays.copyOfRange(rec, 4, rec.length)
        parseLink(heap.managedObject(heapId))
      }
    }

    private def reconcileV4Chunks(lay: Layout, rank: Int, elem: Int): Layout = {
      def fix(cd: Seq[Int]): Seq[Int] =
        if (cd.length == rank + 1 && cd.last == elem) cd.dropRight(1) else cd
      lay match {
        case ChunkedSingle(a, cd, f, m) => ChunkedSingle(a, fix(cd), f, m)
        case ChunkedImplicit(a, cd) => ChunkedImplicit(a, fix(cd))
        case ChunkedFixedArray(a, cd) => ChunkedFixedArray(a, fix(cd))
        case ChunkedExtArray(a, cd) => ChunkedExtArray(a, fix(cd))
        case ChunkedBtreeV2(a, cd) => ChunkedBtreeV2(a, fix(cd))
        case other => other
      }
    }

    /** Attributes stored densely: each v2 B-tree type-8 record is
      * heap ID (8) + message flags (1) + creation order (4) + name
      * hash (4); the heap object is a regular attribute-message body.
      * A SHARED record (flag bit 1) carries a heap ID into the SOHM
      * heap instead of the group's own attribute heap.
      */
    private def denseAttributes(fheapAddr: Long,
                                nameBtreeAddr: Long): Seq[Attr] = {
      val heap = new FractalHeap(fheapAddr)
      v2BtreeRecords(nameBtreeAddr, Set(8))._2.map { rec =>
        val heapId = java.util.Arrays.copyOfRange(rec, 0, 8)
        if ((rec(8) & 0x02) != 0)
          parseAttribute(sohmObject(0x000C, heapId))
        else parseAttribute(heap.managedObject(heapId))
      }
    }

    /** Records of a version-2 B-tree at ANY depth. Internal (BTIN)
      * nodes hold N records and N+1 child pointers; a pointer carries
      * the child's address, its record count in a variable-width field
      * sized from the LEAF capacity (H5VM_limit_enc_size of
      * (nodeSize-10)/recordSize — leaves hold the most records), and —
      * only when the child is itself internal — the child subtree's
      * total record count, whose width comes from the cumulative
      * per-depth capacity recurrence the library derives from the node
      * size (H5B2_NUM_INT_REC). Both recurrences are pinned by
      * DenseGroupSpec's depth-2 fixture.
      */
    private def v2BtreeRecords(addr: Long,
                               allowed: Set[Int]): (Int, Seq[Array[Byte]]) = {
      val h = cur(addr)
      require(h.read(4).sameElements("BTHD".getBytes(StandardCharsets.US_ASCII)),
        s"bad v2 B-tree header signature at $addr")
      require(h.get() == 0, "v2 B-tree header version")
      val btype = h.get().toInt
      require(allowed(btype),
        s"v2 B-tree type $btype (expected one of ${allowed.mkString(",")})")
      val nodeSize = u4(h).toInt
      val recordSize = u2(h)
      val depth = u2(h)
      h.get(); h.get() // split / merge percent
      val rootAddr = h.getLong()
      val rootNrec = u2(h)
      h.getLong() // total records
      val geo = V2BtreeGeometry(nodeSize, recordSize, depth)
      btype -> walkV2Btree(rootAddr, rootNrec, depth, btype, recordSize, geo)
    }

    /** Depth-recursive walk shared by the name-index trees and the v2
      * B-tree CHUNK indexes (types 10/11): collects every record in
      * key order (child 0, record 0, child 1, …).
      */
    private def walkV2Btree(addr: Long, nrec: Int, depth: Int, btype: Int,
                            recordSize: Int,
                            geo: V2BtreeGeometry): Seq[Array[Byte]] =
      if (depth == 0) {
        val b = cur(addr)
        require(b.read(4).sameElements("BTLF".getBytes(StandardCharsets.US_ASCII)),
          s"bad v2 B-tree leaf signature at $addr")
        require(b.get() == 0, "BTLF version")
        require(b.get().toInt == btype, "BTLF record type mismatch")
        (0 until nrec).map(_ => b.read(recordSize))
      } else {
        val b = cur(addr)
        require(b.read(4).sameElements(
          "BTIN".getBytes(StandardCharsets.US_ASCII)),
          s"bad v2 B-tree internal node signature at $addr")
        require(b.get() == 0, "BTIN version")
        require(b.get().toInt == btype, "BTIN record type mismatch")
        val recs = (0 until nrec).map(_ => b.read(recordSize))
        def leUn(bytes: Array[Byte]): Long = {
          var c = 0L
          bytes.indices.foreach(i => c |= (bytes(i).toLong & 0xFF) << (8 * i))
          c
        }
        val kids = (0 to nrec).map { _ =>
          val a = b.getLong()
          val c = leUn(b.read(geo.maxNrecSize))
          // total-subtree count: present only under internal children
          if (depth > 1) b.read(geo.cumNrecSize(depth - 1))
          (a, c.toInt)
        }
        val outSeq = Vector.newBuilder[Array[Byte]]
        kids.indices.foreach { i =>
          outSeq ++= walkV2Btree(kids(i)._1, kids(i)._2, depth - 1, btype,
            recordSize, geo)
          if (i < recs.length) outSeq += recs(i)
        }
        outSeq.result()
      }

    /** Fractal heap, managed objects only: the header fixes the heap ID
      * geometry (offset/length field widths); the root block is a
      * single direct block, or an indirect block whose doubling table
      * lists direct blocks (row sizes 2× per row past the second) and —
      * past `maxDirectRows` — child INDIRECT blocks, walked
      * recursively. Heaps with I/O filters store each direct block
      * compressed (the FRHP carries a filter-pipeline message and each
      * doubling-table entry gains stored size + filter mask); images
      * decompress on demand and are cached per block. HUGE objects
      * (over the max managed size — e.g. a very large shared attribute)
      * resolve through the heap's huge-object v2 B-tree; TINY objects
      * are rejected explicitly (no consumed message fits one at the
      * 8-byte ID lengths dense/SOHM heaps use).
      */
    private final class FractalHeap(addr: Long) {
      private val h = cur(addr)
      require(h.read(4).sameElements("FRHP".getBytes(StandardCharsets.US_ASCII)),
        s"bad fractal heap signature at $addr")
      require(h.get() == 0, "FRHP version")
      private val heapIdLen = u2(h)
      private val ioFilterLen = u2(h)
      h.get() // flags
      u4(h) // max managed object size
      h.getLong() // next huge object ID
      private val hugeBtAddr = h.getLong() // v2 B-tree of huge objects
      (0 until 10).foreach(_ => h.getLong()) // free/managed/tiny stats
      private val tableWidth = u2(h)
      private val startBlockSize = h.getLong()
      private val maxDirectBlockSize = h.getLong()
      private val maxHeapSizeBits = u2(h)
      u2(h) // starting # rows
      private val rootBlockAddr = h.getLong()
      private val curRows = u2(h)
      // filtered heap extras: root-direct stored size + mask + the
      // encoded filter-pipeline message
      private val (rootFilteredSize, rootFilterMask, heapFilters) =
        if (ioFilterLen == 0) (-1L, 0, Nil: Seq[Filter])
        else {
          val fsz = h.getLong()
          val mask = h.getInt()
          (fsz, mask, parseFilters(h.read(ioFilterLen)))
        }
      private val offSize = (maxHeapSizeBits + 7) / 8
      private val lenSize = heapIdLen - 1 - offSize
      require(lenSize >= 1 && lenSize <= 8,
        s"fractal heap ID geometry $heapIdLen/$offSize unsupported")
      private def log2l(v: Long): Int =
        63 - java.lang.Long.numberOfLeadingZeros(v)
      private val maxDirectRows =
        log2l(maxDirectBlockSize) - log2l(startBlockSize) + 2
      private def rowSize(r: Int): Long =
        if (r < 2) startBlockSize else startBlockSize << (r - 1)
      /** rows of an indirect block covering `covered` bytes of heap
        * space (spec: log2(covered) − log2(start·width) + 1)
        */
      private def nrowsFor(covered: Long): Int =
        log2l(covered) - log2l(startBlockSize * tableWidth) + 1

      /** (heapOffset, nominalSize, fileAddr, storedSize | −1, mask) per
        * direct block, heap-offset order.
        */
      private val dblocks: Seq[(Long, Long, Long, Long, Int)] = {
        val outB = Seq.newBuilder[(Long, Long, Long, Long, Int)]
        def walkIndirect(a: Long, baseOff: Long, nrows: Int): Unit = {
          val b = cur(a)
          require(b.read(4).sameElements(
            "FHIB".getBytes(StandardCharsets.US_ASCII)),
            s"bad fractal heap indirect block at $a")
          require(b.get() == 0, "FHIB version")
          b.getLong() // heap header address
          b.read(offSize) // this block's heap offset (trust computed)
          var off = baseOff
          (0 until nrows).foreach { r =>
            val size = rowSize(r)
            (0 until tableWidth).foreach { _ =>
              if (r < maxDirectRows) {
                val da = b.getLong()
                val (fsz, mask) =
                  if (ioFilterLen > 0) (b.getLong(), b.getInt())
                  else (-1L, 0)
                if (da != Undefined) outB += ((off, size, da, fsz, mask))
              } else {
                val ca = b.getLong()
                if (ca != Undefined) walkIndirect(ca, off, nrowsFor(size))
              }
              off += size
            }
          }
        }
        if (rootBlockAddr == Undefined) ()
        else if (curRows == 0)
          outB += ((0L, startBlockSize, rootBlockAddr, rootFilteredSize,
            rootFilterMask))
        else walkIndirect(rootBlockAddr, 0L, curRows)
        outB.result()
      }

      private def leUnsigned(bytes: Array[Byte]): Long =
        bytes.zipWithIndex.map { case (x, i) => (x.toLong & 0xFF) << (8 * i) }.sum

      /** decompressed images of filtered direct blocks, by file addr */
      private val imageCache =
        scala.collection.mutable.Map.empty[Long, Array[Byte]]
      private def blockImage(ba: Long, fsz: Long, mask: Int): Array[Byte] =
        imageCache.getOrElseUpdate(ba, {
          var img = src.read(ba, fsz.toInt)
          heapFilters.zipWithIndex.reverse.foreach { case (f, i) =>
            if ((mask & (1 << i)) == 0) img = unfilter(f, img, 1)
          }
          require(img.length >= 4 && img(0) == 'F' && img(1) == 'H' &&
            img(2) == 'D' && img(3) == 'B',
            s"filtered fractal heap block at $ba decompressed without " +
              "its FHDB signature")
          img
        })

      /** Raw bytes of a managed object addressed by heap ID. Object
        * offsets live in the heap's virtual space, which INCLUDES each
        * direct block's header — so file address = blockAddr +
        * (offset − blockHeapOffset), no header arithmetic needed.
        */
      def managedObject(heapId: Array[Byte]): Array[Byte] = {
        require(heapId.length >= 1, "empty fractal heap ID")
        val vt = heapId(0).toInt
        require((vt & 0xC0) == 0, s"fractal heap ID version ${(vt >> 6) & 0x3}")
        ((vt >> 4) & 0x3) match {
          case 0 => // managed: falls through to the doubling-table walk
          case 1 => return hugeObject(heapId)
          case t => throw new IllegalArgumentException(
            // type 2 (tiny) cannot hold any message this reader consumes
            // at the 8-byte ID lengths dense/SOHM heaps use — reject
            // pointedly rather than decode an impossible shape
            s"fractal heap ID type $t (tiny/reserved) unsupported")
        }
        require(heapId.length >= 1 + offSize + lenSize,
          s"heap ID of ${heapId.length} bytes (need ${1 + offSize + lenSize})")
        val off = leUnsigned(java.util.Arrays.copyOfRange(heapId, 1, 1 + offSize))
        val len = leUnsigned(java.util.Arrays.copyOfRange(
          heapId, 1 + offSize, 1 + offSize + lenSize))
        val (bo, _, ba, fsz, mask) = dblocks
          .find(d => off >= d._1 && off + len <= d._1 + d._2)
          .getOrElse(throw new IllegalArgumentException(
            s"fractal heap offset $off+$len outside every direct block"))
        if (fsz < 0) src.read(ba + (off - bo), len.toInt)
        else {
          val img = blockImage(ba, fsz, mask)
          java.util.Arrays.copyOfRange(img, (off - bo).toInt,
            (off - bo + len).toInt)
        }
      }

      /** HUGE object (ID type 1): the ID's remaining bytes are the huge
        * object NUMBER, looked up in the heap's huge-object v2 B-tree
        * (record type 1 unfiltered / 2 filtered — address, length,
        * [mask + memory size,] id); the object itself is a plain byte
        * range, unfiltered through the heap's pipeline when type 2.
        */
      private lazy val hugeRecords: (Int, Seq[Array[Byte]]) = {
        require(hugeBtAddr != Undefined,
          "huge fractal heap ID but the heap has no huge-object B-tree")
        v2BtreeRecords(hugeBtAddr, Set(1, 2))
      }

      private def hugeObject(heapId: Array[Byte]): Array[Byte] = {
        val id = leUnsigned(
          java.util.Arrays.copyOfRange(heapId, 1, heapId.length))
        val (btype, recs) = hugeRecords
        val idOff = if (btype == 2) 28 else 16
        val rec = recs.find(r => ByteBuffer.wrap(r)
            .order(ByteOrder.LITTLE_ENDIAN).getLong(idOff) == id)
          .getOrElse(throw new IllegalArgumentException(
            s"huge object $id absent from the huge-object B-tree"))
        val b = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
        val addr = b.getLong(0)
        val len = b.getLong(8)
        // a stored length past Int.MaxValue would silently truncate (or
        // go negative) through toInt — no real heap object this reader
        // consumes approaches 2 GiB, so fail with the number instead
        require(len >= 0 && len <= Int.MaxValue,
          s"huge object $id length $len unsupported (exceeds 2 GiB buffer)")
        var img = src.read(addr, len.toInt)
        if (btype == 2) {
          val mask = b.getInt(16)
          heapFilters.zipWithIndex.reverse.foreach { case (f, i) =>
            if ((mask & (1 << i)) == 0) img = unfilter(f, img, 1)
          }
        }
        img
      }
    }

    private def buf0(body: Array[Byte]): ByteBuffer =
      ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)

    // ---- shared messages

    private var sbExtAddr: Long = Undefined

    /** Resolve a SHARED message (header flag bit 1): its body is an
      * indirection record, not the message. Versions 1/2 and version-3
      * type 2 point at another object header holding the real message —
      * the committed-datatype shape h5py's `f["t"] = dtype` +
      * `create_dataset(dtype=f["t"])` produces. Version-3 type 1 is an
      * 8-byte fractal-heap ID into the file's SOHM heap, reached through
      * the superblock extension's Shared Message Table message.
      */
    private def resolveShared(t: Int, body: Array[Byte]): Array[Byte] = {
      val b = buf0(body)
      b.get().toInt match {
        case 1 =>
          b.get(); b.position(b.position() + 6) // msg type + 6 reserved
          sharedFromObjectHeader(b.getLong(), t)
        case 2 =>
          b.get() // msg type
          sharedFromObjectHeader(b.getLong(), t)
        case 3 =>
          b.get().toInt match {
            case 2 => sharedFromObjectHeader(b.getLong(), t)
            case 1 =>
              val heapId = new Array[Byte](8); b.get(heapId)
              sohmObject(t, heapId)
            case other => throw new IllegalArgumentException(
              s"shared message v3 type $other for 0x${t.toHexString}")
          }
        case v =>
          throw new IllegalArgumentException(s"shared message version $v")
      }
    }

    private def sharedFromObjectHeader(addr: Long, t: Int): Array[Byte] =
      readMessages(addr).collectFirst { case (`t`, body) => body }
        .getOrElse(throw new IllegalArgumentException(
          s"shared message 0x${t.toHexString} absent from its object " +
            s"header at $addr"))

    /** SOHM indexes from the superblock extension: Shared Message Table
      * message (0x0F) → SMTB master table → (message-type-flags,
      * fractal heap) per index. The list / v2 B-tree index structures
      * exist for WRITERS to find duplicates; a reader resolves heap IDs
      * straight against the heap.
      */
    private lazy val sohmIndexes: Seq[(Int, FractalHeap)] =
      if (sbExtAddr == Undefined) Nil
      else readMessages(sbExtAddr).collectFirst { case (0x000F, body) =>
        val b = buf0(body)
        require(b.get() == 0, "shared-message-table message version")
        val tableAddr = b.getLong()
        val nIndexes = b.get().toInt
        val c = cur(tableAddr)
        require(c.read(4).sameElements(
          "SMTB".getBytes(StandardCharsets.US_ASCII)),
          s"bad shared message table signature at $tableAddr")
        (0 until nIndexes).flatMap { _ =>
          c.get() // index version
          c.get() // index type (1 = list, 2 = v2 B-tree) — not needed
          val typeFlags = u2(c)
          u4(c) // minimum message size
          u2(c); u2(c); u2(c) // list cutoff, B-tree cutoff, message count
          c.getLong() // index (list/B-tree) address
          val heapAddr = c.getLong()
          if (heapAddr == Undefined) Nil
          else Seq(typeFlags -> new FractalHeap(heapAddr))
        }
      }.getOrElse(Nil)

    /** H5O_SHMESG_*_FLAG bit for a shareable message type. */
    private def shmesgFlag(t: Int): Int = t match {
      case 0x0001 => 0x0001 // dataspace
      case 0x0003 => 0x0002 // datatype
      case 0x0005 => 0x0004 // fill value
      case 0x000B => 0x0008 // filter pipeline
      case 0x000C => 0x0010 // attribute
      case _ => 0
    }

    private def sohmObject(t: Int, heapId: Array[Byte]): Array[Byte] = {
      val flag = shmesgFlag(t)
      val candidates = sohmIndexes.filter(i => (i._1 & flag) != 0) match {
        case Seq() => sohmIndexes // older files may leave flags 0
        case hits => hits
      }
      require(candidates.nonEmpty,
        s"message 0x${t.toHexString} is SOHM-heap shared but the file " +
          "carries no shared-message table")
      candidates.head._2.managedObject(heapId)
    }

    /** All (type, body) messages of an object header, v1 or v2, following
      * continuation blocks.
      */
    private def readMessages(oh: Long): Seq[(Int, Array[Byte])] = {
      val out = Vector.newBuilder[(Int, Array[Byte])]
      val sig = src.read(oh, 4)
      if (sig.sameElements("OHDR".getBytes(StandardCharsets.US_ASCII))) {
        // ---- version 2
        val first = cur(oh + 4)
        val ver = first.get().toInt
        require(ver == 2, s"OHDR version $ver")
        val flags = first.get().toInt
        if ((flags & 0x20) != 0) { u4(first); u4(first); u4(first); u4(first) }
        if ((flags & 0x10) != 0) { u2(first); u2(first) }
        val chunkSize = (flags & 0x3) match {
          case 0 => first.get().toLong & 0xFF
          case 1 => u2(first).toLong
          case 2 => u4(first)
          case 3 => first.getLong()
        }
        val trackOrder = (flags & 0x4) != 0
        var blocks = List((first.position, chunkSize))
        while (blocks.nonEmpty) {
          val (start, len) = blocks.head; blocks = blocks.tail
          val end = start + len - 4 // trailing checksum
          val b = cur(start)
          // a continuation block starts with OCHK
          if (src.read(start, 4).sameElements(
              "OCHK".getBytes(StandardCharsets.US_ASCII))) b.seek(start + 4)
          while (b.position + 4 <= end) {
            val t = b.get().toInt & 0xFF
            val sz = u2(b)
            val mf = b.get().toInt
            if (trackOrder) u2(b)
            val body = b.read(sz)
            if (t == 0x10) {
              val cb = buf0(body)
              blocks = (cb.getLong(), cb.getLong()) :: blocks
            } else if ((mf & 0x2) != 0 && ConsumedMessages(t))
              // a SHARED message's body is an indirection record, not
              // the message — resolve it before parsing
              out += (t -> resolveShared(t, body))
            else out += (t -> body)
          }
        }
      } else {
        // ---- version 1
        val b = cur(oh)
        val ver = b.get().toInt
        require(ver == 1, s"object header version $ver at $oh")
        b.get() // reserved
        var remaining = u2(b)
        u4(b) // reference count
        val hdrSize = u4(b)
        b.skip(4) // pad to 8-byte alignment
        var blocks = List((b.position, hdrSize))
        while (blocks.nonEmpty && remaining > 0) {
          val (start, len) = blocks.head; blocks = blocks.tail
          val bb = cur(start)
          val end = start + len
          while (bb.position + 8 <= end && remaining > 0) {
            val t = u2(bb)
            val sz = u2(bb)
            val mf = bb.get().toInt
            bb.get(); bb.get(); bb.get() // reserved
            val body = bb.read(sz)
            remaining -= 1
            if (t == 0x10) {
              val cb = buf0(body)
              blocks = blocks :+ ((cb.getLong(), cb.getLong()))
            } else if ((mf & 0x2) != 0 && ConsumedMessages(t))
              out += (t -> resolveShared(t, body))
            else out += (t -> body)
          }
        }
      }
      out.result()
    }

    // ---- individual messages

    private def parseDataspace(body: Array[Byte]): Space = {
      val b = buf0(body)
      val ver = b.get().toInt
      val rank = b.get().toInt
      val flags = b.get().toInt
      ver match {
        case 1 => b.get(); b.getInt() // reserved ×5
        case 2 => b.get() // type
        case v => throw new IllegalArgumentException(s"dataspace version $v")
      }
      val dims = (0 until rank).map(_ => b.getLong())
      // max-dims: −1 (all-ones) marks an UNLIMITED dimension. The
      // Extensible Array chunk index linearizes over the MAX grid with
      // the unlimited dim rotated slowest, so both the values and the
      // unlimited markers matter downstream.
      val maxDims =
        if ((flags & 1) == 0) dims
        else (0 until rank).map(_ => b.getLong())
      Space(dims, maxDims)
    }

    private def parseDatatype(b: ByteBuffer): H5Type = {
      val cv = b.get().toInt & 0xFF
      val cls = cv & 0xF
      val ver = (cv >> 4) & 0xF
      val bits = (b.get().toInt & 0xFF) | ((b.get().toInt & 0xFF) << 8) |
        ((b.get().toInt & 0xFF) << 16)
      val size = u4(b).toInt
      // null-terminated name; versions 1/2 pad to a multiple of 8,
      // version 3 ("latest") stores it unpadded
      def name(): String = {
        val start = b.position()
        while (b.get() != 0) {}
        val rawLen = b.position() - start
        val all = rawLen + (if (ver < 3) (8 - rawLen % 8) % 8 else 0)
        val out = new Array[Byte](rawLen - 1)
        b.position(start); b.get(out); b.position(start + all)
        new String(out, java.nio.charset.StandardCharsets.UTF_8)
      }
      cls match {
        case ClsFixed =>
          // fixed-point properties (bit offset + precision): consumed so
          // NESTED parses (compound members, enum bases) land on the
          // next field; precision kept for nbit-packed datasets
          val bitOff = b.getShort() & 0xFFFF
          val prec = b.getShort() & 0xFFFF
          require(bitOff == 0,
            s"fixed-point bit offset $bitOff unsupported")
          H5Type(cls, size, littleEndian = (bits & 1) == 0,
            signed = (bits & 0x8) != 0, bitPrecision = prec)
        case ClsFloat =>
          require(size == 2 || size == 4 || size == 8, s"float size $size")
          // bit offset/precision, exponent/mantissa geometry, bias
          b.getShort(); b.getShort(); b.getInt(); b.getInt()
          H5Type(cls, size, littleEndian = (bits & 1) == 0, signed = true)
        case ClsString =>
          H5Type(cls, size, littleEndian = true, signed = false)
        case ClsBitfield =>
          // same property block as fixed-point (bit offset + precision);
          // values are flag words, decoded as unsigned integers
          val bitOff = b.getShort() & 0xFFFF
          val prec = b.getShort() & 0xFFFF
          require(bitOff == 0,
            s"bitfield bit offset $bitOff unsupported")
          H5Type(cls, size, littleEndian = (bits & 1) == 0,
            signed = false, bitPrecision = prec)
        case ClsOpaque =>
          // bits 0-7 of the class bit field = tag length (null-padded
          // ASCII); payload stays opaque bytes, surfaced by tag
          val tagLen = bits & 0xFF
          val raw = new Array[Byte](tagLen); b.get(raw)
          H5Type(cls, size, littleEndian = true, signed = false,
            opaqueTag = new String(raw.takeWhile(_ != 0),
              java.nio.charset.StandardCharsets.UTF_8))
        case ClsCompound =>
          // per-member: name, record offset, member type. v1 carries
          // old-style array dims inline (pre-class-10 writers); v3
          // shrinks the offset to the fewest bytes that span `size`
          val n = bits & 0xFFFF
          val ms = (0 until n).map { _ =>
            val mname = name()
            val (off, adims) = ver match {
              case 1 =>
                val o = u4(b).toInt
                val ndims = b.get().toInt
                b.get(); b.get(); b.get() // reserved
                b.getInt()                // dimension permutation
                b.getInt()                // reserved
                val ds = (0 until 4).map(_ => u4(b).toInt)
                (o, ds.take(ndims))
              case 2 => (u4(b).toInt, Nil)
              case 3 =>
                val nb = Math.max(1,
                  (64 - java.lang.Long.numberOfLeadingZeros(
                    Math.max(1L, size.toLong)) + 7) / 8)
                var o = 0L
                (0 until nb).foreach(i =>
                  o |= (b.get().toLong & 0xFF) << (8 * i))
                (o.toInt, Nil)
              case v => throw new IllegalArgumentException(
                s"compound datatype version $v")
            }
            val mt0 = parseDatatype(b)
            val mt = if (adims.isEmpty) mt0
              else H5Type(ClsArray, mt0.size * adims.product,
                mt0.littleEndian, mt0.signed, base = Some(mt0),
                arrayDims = adims)
            H5Member(mname, off, mt)
          }
          H5Type(cls, size, littleEndian = true, signed = false, members = ms)
        case ClsReference =>
          H5Type(cls, size, littleEndian = true, signed = false)
        case ClsEnum =>
          // base type first, then all names, then all values (base-size
          // each, base byte order)
          val base = parseDatatype(b)
          val n = bits & 0xFFFF
          val names = (0 until n).map(_ => name())
          val bt = numericType(base)
          val values = (0 until n).map { _ =>
            val raw = new Array[Byte](bt.size); b.get(raw)
            var v = 0L
            val idx = if (bt.littleEndian) raw.indices.reverse else raw.indices
            idx.foreach(i => v = (v << 8) | (raw(i).toLong & 0xFF))
            // sign-extend signed bases so enum-of-int8 keeps -1 flags
            if (bt.signed && bt.size < 8) {
              val sh = 64 - bt.size * 8
              (v << sh) >> sh
            } else v
          }
          H5Type(cls, size, littleEndian = base.littleEndian,
            signed = base.signed, base = Some(base),
            enumNames = names, enumValues = values)
        case ClsVlen =>
          val vlenStr = (bits & 0xF) == 1
          val base = parseDatatype(b)
          H5Type(cls, size, littleEndian = true, signed = false,
            base = Some(base), vlenIsString = vlenStr)
        case ClsArray =>
          val ndims = b.get().toInt
          if (ver == 2) { b.get(); b.get(); b.get() } // reserved
          val dims = (0 until ndims).map(_ => u4(b).toInt)
          if (ver == 2) (0 until ndims).foreach(_ => b.getInt()) // permutation
          val base = parseDatatype(b)
          H5Type(cls, size, base.littleEndian, base.signed,
            base = Some(base), arrayDims = dims)
        case c =>
          throw new IllegalArgumentException(s"datatype class $c unsupported")
      }
    }

    /** (layout, DONT_FILTER_PARTIAL_BOUND_CHUNKS flag) — the flag only
      * matters when the dataset also has a filter pipeline, which the
      * caller knows and this parser doesn't, so it travels up.
      */
    private def parseLayout(body: Array[Byte]): (Layout, Boolean) = {
      val b = buf0(body)
      val ver = b.get().toInt
      require(ver == 3 || ver == 4,
        s"data layout version $ver (v3 and v4 supported)")
      b.get().toInt match {
        case 0 =>
          val sz = u2(b)
          val d = new Array[Byte](sz); b.get(d)
          (Compact(d), false)
        case 1 =>
          (Contiguous(b.getLong(), b.getLong()), false)
        case 2 if ver == 3 =>
          val dimsPlus1 = b.get().toInt
          val btree = b.getLong()
          val cdims = (0 until dimsPlus1).map(_ => u4(b).toInt)
          (Chunked(btree, cdims.dropRight(1)), false) // last is element size
        case 2 => // v4 chunked: flags + sized dims + one of five indexes
          val flags = b.get().toInt
          val unfilteredPartials = (flags & 0x1) != 0
          val ndims = b.get().toInt
          val encLen = b.get().toInt
          def uN(): Long = {
            var v = 0L
            (0 until encLen).foreach(i => v |= (b.get().toLong & 0xFF) << (8 * i))
            v
          }
          val cdims = (0 until ndims).map(_ => uN().toInt)
          val lay = b.get().toInt match {
            case 1 => // single chunk
              val (fsz, fmask) =
                if ((flags & 0x2) != 0) (b.getLong(), b.getInt()) else (-1L, 0)
              ChunkedSingle(b.getLong(), cdims, fsz, fmask)
            case 2 => ChunkedImplicit(b.getLong(), cdims)
            case 3 =>
              b.get() // page bits (the header repeats them)
              ChunkedFixedArray(b.getLong(), cdims)
            case 4 =>
              // Extensible Array: five 1-byte creation params (max
              // bits, index elements, min pointers, min elements, page
              // bits) — all repeated in the EAHD header, so skipped
              (0 until 5).foreach(_ => b.get())
              ChunkedExtArray(b.getLong(), cdims)
            case 5 =>
              // v2 B-tree: node size + split/merge percents — the
              // BTHD header repeats them
              b.getInt(); b.get(); b.get()
              ChunkedBtreeV2(b.getLong(), cdims)
            case t => throw new IllegalArgumentException(
              s"v4 chunk index type $t unsupported")
          }
          (lay, unfilteredPartials)
        case c => throw new IllegalArgumentException(s"layout class $c")
      }
    }

    private def parseFilters(body: Array[Byte]): Seq[Filter] = {
      val b = buf0(body)
      val ver = b.get().toInt
      val n = b.get().toInt
      if (ver == 1) { b.get(); b.get(); b.getInt() } // reserved
      (0 until n).map { _ =>
        val id = u2(b)
        val nameLen = if (ver == 2 && id < 256) 0 else u2(b)
        u2(b) // flags
        val nClient = u2(b)
        if (nameLen > 0) {
          val padded =
            if (ver == 1) (nameLen + 7) / 8 * 8 else nameLen
          b.position(b.position() + padded)
        }
        val client = (0 until nClient).map(_ => u4(b).toInt)
        if (ver == 1 && nClient % 2 == 1) b.getInt() // pad
        Filter(id, client)
      }
    }

    private def parseLink(body: Array[Byte]): Option[(String, Long)] = {
      val b = buf0(body)
      val ver = b.get().toInt
      require(ver == 1, s"link message version $ver")
      val flags = b.get().toInt
      val ltype = if ((flags & 0x8) != 0) b.get().toInt else 0
      if ((flags & 0x4) != 0) b.getLong() // creation order
      if ((flags & 0x10) != 0) b.get() // charset
      val nameLen = (flags & 0x3) match {
        case 0 => b.get().toLong & 0xFF
        case 1 => u2(b).toLong
        case 2 => u4(b)
        case 3 => b.getLong()
      }
      val nb = new Array[Byte](nameLen.toInt); b.get(nb)
      val name = new String(nb, StandardCharsets.UTF_8)
      if (ltype == 0) Some(name -> b.getLong()) // hard link
      else None // soft/external links don't occur in netCDF-4 output
    }

    private def parseAttribute(body: Array[Byte]): Attr = {
      val b = buf0(body)
      val ver = b.get().toInt
      require(ver >= 1 && ver <= 3, s"attribute message version $ver")
      val flags = if (ver == 1) { b.get(); 0 } else b.get().toInt
      val nameSize = u2(b)
      val dtSize = u2(b)
      val dsSize = u2(b)
      if (ver == 3) b.get() // charset
      def pad8(n: Int): Int = if (ver == 1) (n + 7) / 8 * 8 else n
      val nb = new Array[Byte](pad8(nameSize)); b.get(nb)
      val name = new String(nb, 0, math.max(0, nameSize - 1),
        StandardCharsets.UTF_8) // size includes NUL
      val dtb = new Array[Byte](pad8(dtSize)); b.get(dtb)
      val dsb = new Array[Byte](pad8(dsSize)); b.get(dsb)
      // flag bits 0/1: the embedded datatype/dataspace block is a SHARED
      // record, not the message — e.g. an attribute typed by a committed
      // datatype; resolve through the same machinery as header messages
      val dtype = parseDatatype(buf0(
        if ((flags & 0x1) != 0) resolveShared(0x0003, dtb) else dtb))
      val dims = parseDataspace(
        if ((flags & 0x2) != 0) resolveShared(0x0001, dsb) else dsb).dims
      val n = if (dims.isEmpty) 1 else dims.product.toInt
      val data = new Array[Byte](body.length - b.position())
      b.get(data)
      decodeAttr(name, dtype, n, data)
    }

    private def decodeAttr(name: String, t: H5Type, n: Int,
                           data: Array[Byte]): Attr = {
      val b = buf0(data)
      t.cls match {
        case ClsString =>
          val raw = new Array[Byte](math.min(n * t.size, data.length))
          b.get(raw)
          Attr(name, cString(raw), Nil, Nil)
        case ClsVlen if t.vlenIsString =>
          // first element only — string attrs in netCDF are scalar
          b.getInt() // byte length (redundant with heap object size)
          val gaddr = b.getLong(); val gidx = b.getInt()
          Attr(name, new String(globalHeapObject(gaddr, gidx),
            StandardCharsets.UTF_8), Nil, Nil)
        case ClsVlen if t.base.exists(_.cls == ClsReference) =>
          val refs = (0 until n).map { _ =>
            val cnt = b.getInt()
            val gaddr = b.getLong(); val gidx = b.getInt()
            val ob = buf0(globalHeapObject(gaddr, gidx))
            (0 until cnt).map(_ => ob.getLong())
          }
          Attr(name, null, Nil, refs)
        case ClsReference =>
          Attr(name, null, Nil, Seq((0 until n).map(_ => b.getLong())))
        case ClsFixed | ClsFloat =>
          val nums = (0 until n).map(_ => readNum(b, t))
          Attr(name, null, nums, Nil)
        case ClsEnum | ClsBitfield =>
          val bt = numericType(t)
          val nums = (0 until n).map(_ => readNum(b, bt))
          Attr(name, null, nums, Nil)
        case _ => Attr(name, null, Nil, Nil)
      }
    }

    private def cString(raw: Array[Byte]): String = {
      val end = raw.indexOf(0.toByte) match { case -1 => raw.length; case i => i }
      new String(raw, 0, end, StandardCharsets.UTF_8)
    }

    private def readNum(b: ByteBuffer, t: H5Type): Double = {
      b.order(if (t.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val v = (t.cls, t.size) match {
        case (ClsFloat, 2) => Half.toDouble(b.getShort())
        case (ClsFloat, 4) => b.getFloat().toDouble
        case (ClsFloat, 8) => b.getDouble()
        case (ClsFixed, 1) =>
          val x = b.get(); if (t.signed) x.toDouble else (x & 0xFF).toDouble
        case (ClsFixed, 2) =>
          val x = b.getShort(); if (t.signed) x.toDouble else (x & 0xFFFF).toDouble
        case (ClsFixed, 4) =>
          val x = b.getInt(); if (t.signed) x.toDouble else (x.toLong & 0xFFFFFFFFL).toDouble
        case (ClsFixed, 8) => b.getLong().toDouble
        case (c, s) => throw new IllegalArgumentException(s"numeric ($c,$s)")
      }
      b.order(ByteOrder.LITTLE_ENDIAN)
      v
    }

    // ---- symbol-table groups

    private def symbolTableChildren(btree: Long, heap: Long): Seq[(String, Long)] = {
      val names = Vector.newBuilder[(String, Long)]
      def walkNode(a: Long): Unit = {
        val b = cur(a)
        val sig = b.read(4)
        require(sig.sameElements("TREE".getBytes(StandardCharsets.US_ASCII)),
          s"bad group B-tree signature at $a")
        b.get() // node type 0
        val level = b.get().toInt
        val used = u2(b)
        b.getLong(); b.getLong() // siblings
        // key0, child0, key1, child1, ... keyN — keys are heap offsets
        // of boundary names, irrelevant for a full walk
        val kids = (0 until used).map { _ =>
          b.getLong() // key
          b.getLong() // child
        }
        kids.foreach { child =>
          if (level > 0) walkNode(child) else readSnod(child)
        }
      }
      def readSnod(a: Long): Unit = {
        val b = cur(a)
        val sig = b.read(4)
        require(sig.sameElements("SNOD".getBytes(StandardCharsets.US_ASCII)),
          s"bad SNOD signature at $a")
        b.get(); b.get()
        val n = u2(b)
        (0 until n).foreach { _ =>
          val nameOff = b.getLong()
          val oh = b.getLong()
          b.getInt(); b.getInt() // cache type + reserved
          b.skip(16) // scratch
          names += heapString(heap, nameOff) -> oh
        }
      }
      walkNode(btree)
      names.result()
    }

    private def heapString(heap: Long, off: Long): String = {
      val b = cur(heap)
      val sig = b.read(4)
      require(sig.sameElements("HEAP".getBytes(StandardCharsets.US_ASCII)),
        s"bad local heap signature at $heap")
      b.skip(4) // version + 3 reserved
      b.getLong() // data segment size
      b.getLong() // free-list head
      val dataAddr = b.getLong()
      cStringAt(dataAddr + off)
    }

    /** NUL-terminated string at an absolute position, read in bounded
      * windows (never assumes the rest of the file is in memory).
      */
    private def cStringAt(pos: Long): String = {
      val out = new java.io.ByteArrayOutputStream(64)
      var p = pos
      var done = false
      while (!done) {
        val n = math.min(256L, src.length - p).toInt
        if (n <= 0) done = true
        else {
          val chunk = src.read(p, n)
          val i = chunk.indexOf(0.toByte)
          if (i >= 0) { out.write(chunk, 0, i); done = true }
          else { out.write(chunk, 0, n); p += n }
        }
      }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    }

    // ---- global heap

    private def globalHeapObject(collection: Long, index: Int): Array[Byte] = {
      val b = cur(collection)
      val sig = b.read(4)
      require(sig.sameElements("GCOL".getBytes(StandardCharsets.US_ASCII)),
        s"bad global heap signature at $collection")
      b.skip(4) // version + reserved
      val size = b.getLong()
      val end = collection + size
      while (b.position < end) {
        val idx = u2(b)
        u2(b); u4(b) // refcount + reserved
        val objSize = b.getLong()
        if (idx == 0) // free space — object not found past here
          throw new IllegalArgumentException(
            s"global heap object $index not found at $collection")
        val data = b.read(objSize.toInt)
        val pad = ((8 - objSize % 8) % 8).toInt
        b.skip(pad)
        if (idx == index) return data
      }
      throw new IllegalArgumentException(
        s"global heap object $index not found at $collection")
    }

    // ------------------------------------------------------------ data

    /** Raw dataset bytes assembled per layout, filters reversed.
      *
      * `keep` is the chunk-pruning predicate (hyperslab pushdown): for
      * each dimension position, `Some(i)` restricts the read to chunks
      * whose extent covers index `i` along that dimension — chunks
      * outside the slice are never copied, unshuffled, or INFLATED,
      * which is the dominant cost for deflate-9 forecast payloads when
      * a query wants one leadtime of ~93. Pruned-away cells stay zero
      * in the full-shape output; callers only index the kept slice.
      */
    def rawData(ds: Dataset,
                keep: Array[Option[Long]] = Array.empty): Array[Byte] = {
      val elem = ds.dtype.size
      val total = ds.dims.map(_.toLong).product * elem
      require(total <= Int.MaxValue, s"dataset ${ds.name} too large for one buffer")
      ds.layout match {
        case Compact(d) => d
        case Contiguous(a, sz) =>
          val out = new Array[Byte](total.toInt)
          if (a != Undefined) {
            val n = math.min(sz, total).toInt
            System.arraycopy(src.read(a, n), 0, out, 0, n)
          }
          out
        case _ =>
          val cdims = Hdf5.chunkDims(ds.layout)
          val out = new Array[Byte](total.toInt)
          def wanted(coords: Array[Long]): Boolean =
            keep.isEmpty || coords.indices.forall { d =>
              keep.lift(d).flatten.forall(i =>
                coords(d) <= i && i < coords(d) + cdims(d))
            }
          // shared per-chunk pipeline for every index flavor: exact
          // byte-range read — a pruned-away chunk is never fetched, so
          // a >2 GiB archive costs only its slice — then the filter
          // pipeline in reverse, honoring the skip mask
          foreachChunk(ds) { (coords, storedSize, mask, caddr) =>
            if (wanted(coords)) {
              var chunk = src.read(caddr, storedSize)
              ds.filters.zipWithIndex.reverse.foreach { case (f, i) =>
                if ((mask & (1 << i)) == 0) chunk = unfilter(f, chunk, elem)
              }
              scatter(chunk, coords, cdims, ds.dims, elem, out)
            }
          }
          out
      }
    }

    /** Enumerate every STORED chunk of a chunked dataset across all
      * five index flavors: the callback receives (array-coordinate
      * origin, stored byte size, filter mask, absolute file address).
      * These byte-range facts are the read pipeline's plan AND the
      * export surface for kerchunk-style reference stores
      * ([[Kerchunk]]), which record exactly (address, size) per chunk.
      */
    def foreachChunk(ds: Dataset)(
        emit: (Array[Long], Int, Int, Long) => Unit): Unit = {
      val elem = ds.dtype.size
      val cdims = Hdf5.chunkDims(ds.layout)
      val nominal = (cdims.map(_.toLong).product * elem).toInt
      // row-major chunk-grid coordinates for linear index i
      val nPer = ds.dims.zip(cdims).map { case (d, c) => (d + c - 1) / c }
      def gridCoords(i: Long): Array[Long] = {
        val coords = new Array[Long](cdims.length)
        var rest = i
        (cdims.length - 1) to 0 by -1 foreach { d =>
          coords(d) = (rest % nPer(d)) * cdims(d); rest /= nPer(d)
        }
        coords
      }
      ds.layout match {
            case Chunked(btree, _) =>
              if (btree != Undefined) walkChunkTree(btree, ds.dims.length) {
                case (coords, storedSize, mask, caddr) =>
                  emit(coords, storedSize, mask, caddr)
              }
            case ChunkedSingle(addr, _, fsz, fmask) =>
              if (addr != Undefined)
                emit(new Array[Long](cdims.length),
                  if (fsz >= 0) fsz.toInt else nominal,
                  if (fsz >= 0) fmask else 0, addr)
            case ChunkedImplicit(addr, _) =>
              if (addr != Undefined) {
                val n = ds.dims.zip(cdims)
                  .map { case (d, c) => ((d + c - 1) / c).toLong }.product
                (0L until n).foreach(i =>
                  emit(gridCoords(i), nominal, 0, addr + i * nominal))
              }
            case ChunkedFixedArray(addr, _) =>
              if (addr != Undefined)
                fixedArrayChunks(addr, nominal)(
                  (i, sz, mask, ca) => emit(gridCoords(i), sz, mask, ca))
            case ChunkedExtArray(addr, _) =>
              if (addr != Undefined) {
                val rank = cdims.length
                val unlim = ds.unlimited
                require(unlim.size <= 1,
                  s"extensible array with ${unlim.size} unlimited dims")
                val u = unlim.headOption.getOrElse(0)
                // linearization grid: MAX extents for the fixed dims
                // (libhdf5 indexes against the maximal grid), CURRENT
                // extent for the unlimited one (its position is
                // slowest, so its extent never enters a stride)
                val maxD = ds.maxDimsOr
                val grid = Array.tabulate(rank) { i =>
                  if (i == u || maxD(i) == -1L) nPer(i).toLong
                  else (maxD(i) + cdims(i) - 1) / cdims(i)
                }
                // swizzle: unlimited dim rotated to position 0
                val sGrid = grid(u) +:
                  (grid.take(u) ++ grid.drop(u + 1)).toSeq
                def eaCoords(idx: Long): Array[Long] = {
                  val sc = new Array[Long](rank)
                  var rest = idx
                  (rank - 1) to 1 by -1 foreach { d =>
                    sc(d) = rest % sGrid(d); rest /= sGrid(d)
                  }
                  sc(0) = rest
                  val out2 = new Array[Long](rank)
                  out2(u) = sc(0) * cdims(u)
                  (0 until u).foreach(i => out2(i) = sc(i + 1) * cdims(i))
                  (u + 1 until rank).foreach(i => out2(i) = sc(i) * cdims(i))
                  out2
                }
                extArrayChunks(addr, nominal)(
                  (i, sz, mask, ca) => emit(eaCoords(i), sz, mask, ca))
              }
            case ChunkedBtreeV2(addr, _) =>
              if (addr != Undefined) {
                val rank = cdims.length
                val (btype, recs) = v2BtreeRecords(addr, Set(10, 11))
                recs.foreach { r =>
                  val bb = buf0(r)
                  val a = bb.getLong()
                  val (sz, mask) =
                    if (btype == 11) {
                      val szLen = r.length - 12 - 8 * rank
                      require(szLen >= 1 && szLen <= 8,
                        s"v2 B-tree chunk record of ${r.length} bytes at rank $rank")
                      var s = 0L
                      (0 until szLen).foreach(j =>
                        s |= (bb.get().toLong & 0xFF) << (8 * j))
                      (s.toInt, bb.getInt())
                    } else {
                      require(r.length == 8 + 8 * rank,
                        s"v2 B-tree chunk record of ${r.length} bytes at rank $rank")
                      (nominal, 0)
                    }
                  val coords = Array.tabulate(rank)(i => bb.getLong() * cdims(i))
                  if (a != Undefined) emit(coords, sz, mask, a)
                }
              }
            case other => throw new IllegalStateException(s"layout $other")
      }
    }

    /** Walk a Fixed Array chunk index (FAHD header → FADB element
      * block): client 0 entries are bare chunk addresses (unfiltered,
      * nominal size), client 1 entries carry (address, stored size,
      * filter mask). Paged data blocks (more entries than one page) are
      * rejected explicitly.
      */
    private def fixedArrayChunks(faAddr: Long, nominal: Int)(
        f: (Long, Int, Int, Long) => Unit): Unit = {
      val h = cur(faAddr)
      require(h.read(4).sameElements("FAHD".getBytes(StandardCharsets.US_ASCII)),
        s"bad Fixed Array header signature at $faAddr")
      require(h.get() == 0, "FAHD version")
      val clientId = h.get().toInt
      require(clientId == 0 || clientId == 1, s"FAHD client $clientId")
      val entrySize = h.get().toInt
      val pageBits = h.get().toInt
      val maxEntries = h.getLong()
      val dbAddr = h.getLong()
      if (dbAddr == Undefined) return
      val b = cur(dbAddr)
      require(b.read(4).sameElements("FADB".getBytes(StandardCharsets.US_ASCII)),
        s"bad Fixed Array data block signature at $dbAddr")
      require(b.get() == 0, "FADB version")
      require(b.get().toInt == clientId, "FADB client mismatch")
      b.getLong() // header back-pointer
      val szBytes = entrySize - 12 // client-1 entry: addr(8) + size + mask(4)
      def readEntries(c: Cursor, from: Long, count: Long): Unit =
        (0L until count).foreach { i =>
          if (clientId == 0) {
            val a = c.getLong()
            if (a != Undefined) f(from + i, nominal, 0, a)
          } else {
            val a = c.getLong()
            var sz = 0L
            (0 until szBytes).foreach(j => sz |= (c.get().toLong & 0xFF) << (8 * j))
            val mask = c.getInt()
            if (a != Undefined) f(from + i, sz.toInt, mask, a)
          }
        }
      val pageSize = 1L << pageBits
      if (maxEntries <= pageSize) readEntries(b, 0L, maxEntries)
      else {
        // PAGED data block (the shape any dataset past ~1024 chunks
        // produces): a page-init bitmap + checksum in the block, then
        // the element pages contiguously after it, each with its own
        // trailing checksum; uninitialized pages hold no chunks
        val nPages = ((maxEntries + pageSize - 1) / pageSize).toInt
        val bitmap = b.read((nPages + 7) / 8)
        b.getInt() // data-block checksum
        var pageAddr = b.position
        var from = 0L
        (0 until nPages).foreach { pg =>
          val count = math.min(pageSize, maxEntries - from)
          if ((bitmap(pg / 8) & (1 << (pg % 8))) != 0)
            readEntries(cur(pageAddr), from, count)
          pageAddr += count * entrySize + 4 // + page checksum
          from += count
        }
      }
    }

    /** Walk an Extensible Array chunk index: EAHD header → EAIB index
      * block (first `idxBlkElmts` elements inline, then the first
      * 2·(minPtrs−1) data-block addresses, then super-block
      * addresses) → EASB super blocks → EADB data blocks, paged once a
      * data block's element count exceeds the header's page size. The
      * doubling geometry is the published recurrence: super block `u`
      * holds 2^(u/2) data blocks of 2^((u+1)/2)·minElmts elements, and
      * super blocks 0 … 2·log2(minPtrs)−1 have their data blocks
      * addressed straight from the index block. Client 0 elements are
      * bare chunk addresses; client 1 adds stored size + filter mask
      * (same shapes as the Fixed Array). `f(linearIdx, size, mask,
      * addr)` — callers map linearIdx through the swizzled chunk grid.
      */
    private def extArrayChunks(eaAddr: Long, nominal: Int)(
        f: (Long, Int, Int, Long) => Unit): Unit = {
      val h = cur(eaAddr)
      require(h.read(4).sameElements("EAHD".getBytes(StandardCharsets.US_ASCII)),
        s"bad Extensible Array header signature at $eaAddr")
      require(h.get() == 0, "EAHD version")
      val clientId = h.get().toInt
      require(clientId == 0 || clientId == 1, s"EAHD client $clientId")
      val elemSize = h.get().toInt
      val maxBits = h.get().toInt
      val idxBlkElmts = h.get().toInt
      val minElmts = h.get().toInt
      val minPtrs = h.get().toInt
      val pageBits = h.get().toInt
      h.skip(48) // six 8-byte stored statistics
      val iblockAddr = h.getLong()
      if (iblockAddr == Undefined) return
      val arrOffSize = (maxBits + 7) / 8
      val pageNelmts = 1L << pageBits
      def log2(x: Int): Int = 31 - Integer.numberOfLeadingZeros(x)
      require(minElmts > 0 && minPtrs > 0, s"EAHD params $minElmts/$minPtrs")
      val nsblks = 1 + (maxBits - log2(minElmts)) / 2
      val sblkFirstIdx = math.min(2 * log2(minPtrs), nsblks)
      val ndblkAddrs = 2 * (minPtrs - 1)
      val nsblkAddrs = nsblks - sblkFirstIdx
      val ndblks = Array.tabulate(nsblks)(u => 1L << (u / 2))
      val dblkNelmts =
        Array.tabulate(nsblks)(u => (1L << ((u + 1) / 2)) * minElmts)
      val startIdx = new Array[Long](nsblks) // element idx past the iblock's
      (1 until nsblks).foreach { u =>
        startIdx(u) = startIdx(u - 1) + ndblks(u - 1) * dblkNelmts(u - 1)
      }
      val szBytes = elemSize - 12 // client-1: addr(8) + size + mask(4)
      def readElements(c: Cursor, from: Long, count: Long): Unit =
        (0L until count).foreach { i =>
          if (clientId == 0) {
            val a = c.getLong()
            if (a != Undefined) f(from + i, nominal, 0, a)
          } else {
            val a = c.getLong()
            var sz = 0L
            (0 until szBytes).foreach(j =>
              sz |= (c.get().toLong & 0xFF) << (8 * j))
            val mask = c.getInt()
            if (a != Undefined) f(from + i, sz.toInt, mask, a)
          }
        }
      // ---- index block
      val ib = cur(iblockAddr)
      require(ib.read(4).sameElements(
        "EAIB".getBytes(StandardCharsets.US_ASCII)),
        s"bad Extensible Array index block at $iblockAddr")
      require(ib.get() == 0, "EAIB version")
      require(ib.get().toInt == clientId, "EAIB client mismatch")
      ib.getLong() // header back-pointer
      readElements(ib, 0L, idxBlkElmts.toLong)
      val dblkAddrs = (0 until ndblkAddrs).map(_ => ib.getLong())
      val sblkAddrs = (0 until nsblkAddrs).map(_ => ib.getLong())
      /** one data block: prefix, then elements inline (unpaged) or —
        * past the page size — a closing checksum with the element
        * pages contiguous after it, each page carrying its own
        */
      def readDataBlock(addr: Long, from: Long, nelmts: Long,
                        pageInit: Int => Boolean): Unit = {
        if (addr == Undefined) return
        val b = cur(addr)
        require(b.read(4).sameElements(
          "EADB".getBytes(StandardCharsets.US_ASCII)),
          s"bad Extensible Array data block at $addr")
        require(b.get() == 0, "EADB version")
        require(b.get().toInt == clientId, "EADB client mismatch")
        b.getLong() // header back-pointer
        b.skip(arrOffSize) // block offset (redundant with `from`)
        if (nelmts <= pageNelmts) readElements(b, from, nelmts)
        else {
          b.skip(4) // prefix checksum; pages follow contiguously
          var pageAddr = b.position
          val npages = (nelmts / pageNelmts).toInt
          (0 until npages).foreach { pg =>
            if (pageInit(pg))
              readElements(cur(pageAddr), from + pg * pageNelmts, pageNelmts)
            pageAddr += pageNelmts * elemSize + 4 // + page checksum
          }
        }
      }
      // ---- data blocks addressed straight from the index block
      var dc = 0
      (0 until sblkFirstIdx).foreach { u =>
        (0L until ndblks(u)).foreach { d =>
          // Only super blocks carry a page-init bitmap; a data block
          // pointed straight from the index block therefore reads every
          // page when it exceeds the page size (possible only with
          // non-default creation params — libhdf5's H5D constants keep
          // these first blocks under one page, but the header's params
          // govern). Absent chunks are undefined addresses either way.
          readDataBlock(dblkAddrs(dc),
            idxBlkElmts + startIdx(u) + d * dblkNelmts(u), dblkNelmts(u),
            _ => true)
          dc += 1
        }
      }
      // ---- super blocks
      (sblkFirstIdx until nsblks).foreach { u =>
        val sa = sblkAddrs(u - sblkFirstIdx)
        if (sa != Undefined) {
          val sb = cur(sa)
          require(sb.read(4).sameElements(
            "EASB".getBytes(StandardCharsets.US_ASCII)),
            s"bad Extensible Array super block at $sa")
          require(sb.get() == 0, "EASB version")
          require(sb.get().toInt == clientId, "EASB client mismatch")
          sb.getLong() // header back-pointer
          sb.skip(arrOffSize) // block offset
          val paged = dblkNelmts(u) > pageNelmts
          val npagesPer = if (paged) (dblkNelmts(u) / pageNelmts).toInt else 0
          val bitmap =
            if (paged) sb.read(((ndblks(u) * npagesPer + 7) / 8).toInt)
            else Array.emptyByteArray
          (0L until ndblks(u)).foreach { d =>
            val da = sb.getLong()
            readDataBlock(da,
              idxBlkElmts + startIdx(u) + d * dblkNelmts(u), dblkNelmts(u),
              pg => {
                val bit = (d * npagesPer + pg).toInt
                (bitmap(bit / 8) & (1 << (bit % 8))) != 0
              })
          }
        }
      }
    }

    private def walkChunkTree(a: Long, rank: Int)(
        f: (Array[Long], Int, Int, Long) => Unit): Unit = {
      val b = cur(a)
      val sig = b.read(4)
      require(sig.sameElements("TREE".getBytes(StandardCharsets.US_ASCII)),
        s"bad chunk B-tree signature at $a")
      require(b.get() == 1, "B-tree node type 1 expected for chunks")
      val level = b.get().toInt
      val used = u2(b)
      b.getLong(); b.getLong() // siblings
      (0 until used).foreach { _ =>
        val size = u4(b).toInt
        val mask = u4(b).toInt
        val coords = new Array[Long](rank)
        (0 until rank).foreach(i => coords(i) = b.getLong())
        b.getLong() // element-size pseudo-dim offset (always 0)
        val child = b.getLong()
        // each node gets its own cursor, so recursion into a child
        // cannot disturb this node's read position
        if (level > 0) walkChunkTree(child, rank)(f)
        else f(coords, size, mask, child)
      }
    }

    private def unfilter(f: Filter, data: Array[Byte], elem: Int): Array[Byte] =
      f.id match {
        case 1 => inflate(data)
        case 2 => unshuffle(data, f.client.headOption.getOrElse(elem))
        case 3 => // fletcher32: verify the trailing LE checksum, then strip
          require(data.length >= 4, s"fletcher32 stream of ${data.length} bytes")
          val stored = ByteBuffer.wrap(data, data.length - 4, 4)
            .order(ByteOrder.LITTLE_ENDIAN).getInt()
          val computed = H5Filters.fletcher32(data, data.length - 4)
          require(computed == stored,
            f"fletcher32 mismatch: stored 0x$stored%08x, computed 0x$computed%08x")
          java.util.Arrays.copyOfRange(data, 0, data.length - 4)
        case 4 => H5Filters.szipDecode(data, f.client)
        case 5 => H5Filters.nbitDecode(data, f.client)
        case 6 => H5Filters.scaleOffsetDecode(data, f.client)
        case 32004 => H5Filters.lz4Decode(data)
        case 32008 => H5Filters.bitshuffleDecode(data, f.client, elem)
        case 32015 => H5Filters.zstdDecode(data)
        case id => throw new IllegalArgumentException(s"filter $id unsupported")
      }

    private def inflate(data: Array[Byte]): Array[Byte] = {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val tmp = new Array[Byte](65536)
      while (!inf.finished()) {
        val n = inf.inflate(tmp)
        if (n == 0 && inf.needsInput()) throw new IllegalArgumentException(
          "truncated deflate stream in chunk")
        out.write(tmp, 0, n)
      }
      inf.end()
      out.toByteArray
    }

    private def unshuffle(data: Array[Byte], elem: Int): Array[Byte] =
      ByteShuffle.reverse(data, elem)

    /** Copy one decoded chunk into the full row-major output, clipping
      * edge chunks; inner runs along the last axis use arraycopy.
      */
    private def scatter(chunk: Array[Byte], origin: Array[Long],
                        cdims: Seq[Int], dims: Seq[Int], elem: Int,
                        out: Array[Byte]): Unit = {
      val rank = dims.length
      if (rank == 0) { System.arraycopy(chunk, 0, out, 0, elem); return }
      val cd = cdims.toArray
      val dd = dims.toArray
      // effective lengths per dim after edge clipping
      val eff = Array.tabulate(rank)(i =>
        math.max(0, math.min(cd(i).toLong, dd(i) - origin(i)).toInt))
      if (eff.exists(_ == 0)) return
      val lastRun = eff(rank - 1) * elem
      val idx = new Array[Int](rank) // chunk-local coords over dims 0..rank-2
      def copyRuns(): Unit = {
        var done = false
        while (!done) {
          // flat positions of the current run
          var src = 0L; var dst = 0L
          var i = 0
          while (i < rank - 1) {
            src = src * cd(i) + idx(i)
            dst = dst * dd(i) + (origin(i) + idx(i))
            i += 1
          }
          src = (src * cd(rank - 1)) * elem
          dst = (dst * dd(rank - 1) + origin(rank - 1)) * elem
          System.arraycopy(chunk, src.toInt, out, dst.toInt, lastRun)
          // odometer increment over dims 0..rank-2
          var d = rank - 2
          var carry = true
          while (carry && d >= 0) {
            idx(d) += 1
            if (idx(d) < eff(d)) carry = false else { idx(d) = 0; d -= 1 }
          }
          if (d < 0) done = true
        }
      }
      if (rank == 1) {
        System.arraycopy(chunk, 0, out, origin(0).toInt * elem, lastRun)
      } else copyRuns()
    }

    /** Numeric dataset decoded to doubles (row-major); `keep` prunes
      * chunks as in [[rawData]].
      */
    def readDoubles(ds: Dataset,
                    keep: Array[Option[Long]] = Array.empty): Array[Double] = {
      val raw = rawData(ds, keep)
      // enums decode through their base integer type; array-typed cells
      // flatten (dataset dims × array dims, row-major — the layout the
      // bytes are already in)
      val t = numericType(ds.dtype) match {
        case a if a.cls == ClsArray => numericType(a.base.get)
        case other => other
      }
      val perCell = numericType(ds.dtype) match {
        case a if a.cls == ClsArray => a.arrayDims.map(_.toLong).product
        case _ => 1L
      }
      val n = (ds.dims.map(_.toLong).product * perCell).toInt
      val out = new Array[Double](n)
      val b = ByteBuffer.wrap(raw).order(
        if (t.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      var i = 0
      if (t.partialPrecision) {
        // nbit-packed integers: padding bits above `precision` came back
        // zero from the filter — re-extend from the precision bit
        val sh = 64 - t.bitPrecision
        while (i < n) {
          val raw0 = t.size match {
            case 1 => (b.get() & 0xFF).toLong
            case 2 => (b.getShort() & 0xFFFF).toLong
            case 4 => b.getInt().toLong & 0xFFFFFFFFL
            case _ => b.getLong()
          }
          out(i) =
            if (t.signed) ((raw0 << sh) >> sh).toDouble
            else ((raw0 << sh) >>> sh).toDouble
          i += 1
        }
        return out
      }
      (t.cls, t.size) match {
        case (ClsFloat, 8) => while (i < n) { out(i) = b.getDouble(); i += 1 }
        case (ClsFloat, 4) => while (i < n) { out(i) = b.getFloat().toDouble; i += 1 }
        case (ClsFloat, 2) =>
          while (i < n) { out(i) = Half.toDouble(b.getShort()); i += 1 }
        case (ClsFixed, 1) =>
          if (t.signed) while (i < n) { out(i) = b.get().toDouble; i += 1 }
          else while (i < n) { out(i) = (b.get() & 0xFF).toDouble; i += 1 }
        case (ClsFixed, 2) =>
          if (t.signed) while (i < n) { out(i) = b.getShort().toDouble; i += 1 }
          else while (i < n) { out(i) = (b.getShort() & 0xFFFF).toDouble; i += 1 }
        case (ClsFixed, 4) =>
          if (t.signed) while (i < n) { out(i) = b.getInt().toDouble; i += 1 }
          else while (i < n) { out(i) = (b.getInt().toLong & 0xFFFFFFFFL).toDouble; i += 1 }
        case (ClsFixed, 8) => while (i < n) { out(i) = b.getLong().toDouble; i += 1 }
        case (c, s) => throw new IllegalArgumentException(
          s"cannot decode dataset ${ds.name} of class $c size $s to doubles")
      }
      out
    }

    /** One member of a COMPOUND dataset decoded to doubles: strides the
      * record buffer at the member's offset (array-typed members — the
      * coordinate-bounds shape — emit arrayDims.product values per
      * record, row-major).
      */
    def readMemberDoubles(ds: Dataset, member: String,
                          keep: Array[Option[Long]] = Array.empty): Array[Double] = {
      require(ds.dtype.cls == ClsCompound,
        s"dataset ${ds.name} is not compound")
      val m = ds.dtype.members.find(_.name == member).getOrElse(
        throw new IllegalArgumentException(
          s"no member $member in compound ${ds.name} " +
            s"(has ${ds.dtype.members.map(_.name).mkString(", ")})"))
      val mt = numericType(m.tpe) match {
        case a if a.cls == ClsArray => numericType(a.base.get)
        case other => other
      }
      val perRec = numericType(m.tpe) match {
        case a if a.cls == ClsArray => a.arrayDims.product
        case _ => 1
      }
      val raw = rawData(ds, keep)
      val recSize = ds.dtype.size
      val nRec = ds.dims.map(_.toLong).product.toInt
      val out = new Array[Double](nRec * perRec)
      val b = ByteBuffer.wrap(raw).order(
        if (mt.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      var r = 0
      while (r < nRec) {
        b.position(r * recSize + m.offset)
        var j = 0
        while (j < perRec) {
          out(r * perRec + j) = readNum(b, mt)
          j += 1
        }
        r += 1
      }
      out
    }

    private def vlenDescriptors(ds: Dataset): Array[(Int, Long, Int)] = {
      require(ds.dtype.size == 16,
        s"vlen descriptor size ${ds.dtype.size} (16 expected with " +
          "8-byte offsets)")
      val raw = rawData(ds)
      val n = ds.dims.map(_.toLong).product.toInt
      val db = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      Array.tabulate(n) { i =>
        db.position(i * 16)
        val cnt = db.getInt()
        require(cnt >= 0, s"vlen cell $i count $cnt")
        val addr = db.getLong()
        val idx = db.getInt()
        (cnt, addr, idx)
      }
    }

    /** VARIABLE-LENGTH (class 9) dataset decode — netCDF-4 VLEN types
      * (h5py `vlen_dtype`): each stored cell is a (count u4,
      * global-heap collection address, object index u4) descriptor,
      * the payload a GCOL object. One ragged row per cell; count-0
      * cells yield empty rows.
      */
    def readVlenRows(ds: Dataset): Array[Array[Double]] = {
      val t = ds.dtype
      require(t.cls == ClsVlen && !t.vlenIsString,
        s"dataset ${ds.name} is not a numeric vlen sequence")
      val bt = numericType(t.base.get)
      vlenDescriptors(ds).map { case (cnt, addr, idx) =>
        if (cnt == 0) Array.empty[Double]
        else {
          val payload = globalHeapObject(addr, idx)
          require(payload.length >= cnt.toLong * bt.size,
            s"vlen payload ${payload.length} B < $cnt × ${bt.size}")
          val pb = ByteBuffer.wrap(payload).order(
            if (bt.littleEndian) ByteOrder.LITTLE_ENDIAN
            else ByteOrder.BIG_ENDIAN)
          Array.fill(cnt)(readNum(pb, bt))
        }
      }
    }

    /** vlen STRING dataset (netCDF-4 `string` variables): the
      * descriptor count is the BYTE length of each UTF-8 payload.
      */
    def readVlenStrings(ds: Dataset): Array[String] = {
      val t = ds.dtype
      require(t.cls == ClsVlen && t.vlenIsString,
        s"dataset ${ds.name} is not a vlen string array")
      vlenDescriptors(ds).map { case (cnt, addr, idx) =>
        if (cnt == 0) ""
        else {
          val payload = globalHeapObject(addr, idx)
          require(payload.length >= cnt,
            s"vlen string payload ${payload.length} B < $cnt")
          new String(payload, 0, cnt, StandardCharsets.UTF_8)
        }
      }
    }
  }

  /** Convenience: parse + per-dataset numeric decode. The primary
    * constructor takes a positioned [[ByteSource]] (the >2 GiB path);
    * the array overload serves callers that already hold the whole file
    * (the binaryFile scan path).
    */
  final class Reader(src: ByteSource) {
    def this(bytes: Array[Byte]) = this(new ArraySource(bytes))
    private val parser = new Parser(src)
    val file: File = parser.parse()
    /** Per-chunk byte-range enumeration (see Parser.foreachChunk). */
    def foreachChunk(ds: Dataset)(
        f: (Array[Long], Int, Int, Long) => Unit): Unit =
      parser.foreachChunk(ds)(f)
    def readDoubles(ds: Dataset): Array[Double] = parser.readDoubles(ds)
    def readDoubles(name: String): Array[Double] =
      readDoubles(file.dataset(name).getOrElse(
        throw new IllegalArgumentException(s"no dataset $name")))
    /** Chunk-pruned read: only chunks covering the fixed indices are
      * decompressed; output keeps the full shape with pruned cells 0.
      */
    def readDoublesSliced(name: String,
                          keep: Array[Option[Long]]): Array[Double] =
      parser.readDoubles(file.dataset(name).getOrElse(
        throw new IllegalArgumentException(s"no dataset $name")), keep)
    /** One member of a compound dataset, decoded to doubles. */
    def readMemberDoubles(name: String, member: String): Array[Double] =
      parser.readMemberDoubles(file.dataset(name).getOrElse(
        throw new IllegalArgumentException(s"no dataset $name")), member)
    /** Ragged rows of a numeric VLEN (class 9) dataset. */
    def readVlenRows(name: String): Array[Array[Double]] =
      parser.readVlenRows(file.dataset(name).getOrElse(
        throw new IllegalArgumentException(s"no dataset $name")))
    /** Cells of a vlen-string dataset (netCDF-4 `string` variables). */
    def readVlenStrings(name: String): Array[String] =
      parser.readVlenStrings(file.dataset(name).getOrElse(
        throw new IllegalArgumentException(s"no dataset $name")))
  }
}
