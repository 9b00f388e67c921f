package graft.source

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Kerchunk-style REFERENCE STORES (the fsspec `ReferenceFileSystem`
  * format the Pangeo stack uses to expose archival netCDF-4/HDF5 as a
  * zarr v2 store WITHOUT rewriting a byte): a JSON document mapping
  * zarr keys to either inline content (metadata, `base64:` chunks) or
  * `[url, offset, length]` byte ranges into the original files.
  *
  * Spec: fsspec ReferenceFileSystem / kerchunk docs — version 0 is the
  * flat key→ref object; version 1 wraps it as {"version": 1, "refs":
  * {...}} with optional string templates `{{name}}` substituted from
  * a "templates" object.
  *
  * Both directions are implemented from that public spec:
  *
  *  - [[build]] is the index side: walk an HDF5 file's chunk B-trees
  *    via [[Hdf5.Reader.foreachChunk]] and emit genuine zarr v2
  *    metadata plus per-chunk byte ranges. Only deflate/shuffle filter
  *    pipelines are representable as numcodecs chains; anything else
  *    is rejected with the workaround named.
  *  - [[parse]]/[[readArray]] are the read side: chunks decode through
  *    the SAME [[ZarrCodec.decodeChunk]] every zarr store uses — the
  *    whole point of the format is that a zarr reader needs no HDF5
  *    code — with byte ranges fetched by positioned reads.
  *
  * At 100 TB the reference JSON is metadata-scale (one row per chunk);
  * the chunk reads it plans are exactly the positioned-read splits the
  * DSv2 netCDF source derives from HDF5 metadata itself — kerchunk
  * just persists that plan as data, letting the archive scan skip
  * every header walk.
  */
object Kerchunk {

  /** Positioned reads over a local file (FileChannel-backed). */
  private final class PathByteSource(p: Path) extends Hdf5.ByteSource {
    private val ch = java.nio.channels.FileChannel.open(p,
      java.nio.file.StandardOpenOption.READ)
    override val length: Long = ch.size()
    override def read(off: Long, len: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(len)
      var pos = off
      while (bb.hasRemaining) {
        val n = ch.read(bb, pos)
        require(n > 0, s"short read at $pos in $p")
        pos += n
      }
      bb.array()
    }
    override def close(): Unit = ch.close()
  }

  sealed trait Ref
  final case class FileRef(path: String, offset: Long, length: Long)
    extends Ref
  final case class InlineRef(bytes: Array[Byte]) extends Ref

  final case class RefStore(metas: Seq[ZarrCodec.ArrayMeta],
                            refs: Map[String, Ref],
                            /** _ARRAY_DIMENSIONS per array, when the
                              * refs carry .zattrs. */
                            dims: Map[String, Seq[String]] = Map.empty,
                            /** raw metadata JSON entries (".zgroup",
                              * "var/.zarray", "var/.zattrs") kept
                              * verbatim so the parquet emitter can
                              * round-trip them without re-deriving. */
                            metaJson: Map[String, String] = Map.empty)

  private val mapper = new ObjectMapper()

  /** zarr v2 dtype string for a (numeric) HDF5 type. */
  private def zarrDtype(t0: Hdf5.H5Type): String = {
    val t = Hdf5.numericType(t0)
    val order = if (t.size == 1) "|" else if (t.littleEndian) "<" else ">"
    val kind = t.cls match {
      case Hdf5.ClsFloat => "f"
      case Hdf5.ClsFixed => if (t.signed) "i" else "u"
      case c => throw new IllegalArgumentException(
        s"datatype class $c has no zarr v2 numeric dtype")
    }
    s"$order$kind${t.size}"
  }

  /** Build a version-1 reference JSON for one HDF5/netCDF-4 file. The
    * URL recorded for every chunk is the file's own path (template
    * `{{u}}`), so the refs stay valid wherever the pair travels
    * together.
    */
  def build(h5: Path): String = {
    val src = new PathByteSource(h5)
    try {
      val r = new Hdf5.Reader(src)
      val refs = scala.collection.mutable.LinkedHashMap[String, Any]()
      refs(".zgroup") = """{"zarr_format":2}"""
      r.file.datasets.foreach { ds =>
        val t = Hdf5.numericType(ds.dtype)
        require(t.cls == Hdf5.ClsFloat || t.cls == Hdf5.ClsFixed,
          s"dataset ${ds.name}: only numeric datasets are " +
            "kerchunk-indexable here (strings/compounds: read directly)")
        // representable filter pipelines only: deflate -> zlib
        // compressor, shuffle -> numcodecs shuffle filter
        val comp = ds.filters.collect {
          case f if f.id == 1 => """{"id":"zlib","level":6}"""
        }
        val shuf = ds.filters.collect {
          case f if f.id == 2 =>
            s"""{"id":"shuffle","elementsize":${t.size}}"""
        }
        val unsupported = ds.filters.filterNot(f => f.id == 1 || f.id == 2)
        require(unsupported.isEmpty,
          s"dataset ${ds.name}: filters ${unsupported.map(_.id)} have " +
            "no numcodecs twin — h5repack to deflate/shuffle first")
        require(comp.size <= 1, s"dataset ${ds.name}: two deflate stages")
        val chunks = ds.layout match {
          case _: Hdf5.Contiguous | _: Hdf5.Compact => ds.dims
          case l => Hdf5.chunkDims(l)
        }
        val name = ds.name.stripPrefix("/")
        // Unallocated contiguous storage (addr undefined) has no chunk
        // ref to emit; HDF5's default fill for numeric data is 0, so the
        // .zarray must say fill_value 0 — with null, an external zarr
        // reader would treat the missing chunk as undefined instead of
        // reproducing the all-zeros region h5py reads. (Explicit
        // non-default fill-value messages are not parsed by the HDF5
        // reader; allocated datasets keep null = every chunk present.)
        val unallocated = ds.layout match {
          case Hdf5.Contiguous(addr, _) => addr == Hdf5.Undefined
          case _ => false
        }
        refs(s"$name/.zarray") =
          s"""{"zarr_format":2,"shape":[${ds.dims.mkString(",")}],""" +
            s""""chunks":[${chunks.mkString(",")}],""" +
            s""""dtype":"${zarrDtype(ds.dtype)}",""" +
            s""""compressor":${comp.headOption.getOrElse("null")},""" +
            s""""filters":${
              if (shuf.isEmpty) "null" else shuf.mkString("[", ",", "]")},""" +
            s""""fill_value":${if (unallocated) "0" else "null"},""" +
            """"order":"C"}"""
        // coordinate (dimension-scale) variables name their own axis,
        // exactly as xarray/kerchunk record them
        val dims =
          if (ds.isDimScale) Seq(ds.name.stripPrefix("/"))
          else r.file.dimNames(ds)
        if (dims.nonEmpty)
          refs(s"$name/.zattrs") =
            s"""{"_ARRAY_DIMENSIONS":[${
              dims.map(d => s""""$d"""").mkString(",")}]}"""
        ds.layout match {
          case Hdf5.Contiguous(addr, size) =>
            val key = name + "/" + ds.dims.map(_ => "0").mkString(".")
            if (addr != Hdf5.Undefined)
              refs(key) = (addr, size)
          case Hdf5.Compact(data) =>
            val key = name + "/" + ds.dims.map(_ => "0").mkString(".")
            refs(key) = data
          case _ =>
            val cdims = Hdf5.chunkDims(ds.layout)
            r.foreachChunk(ds) { (coords, storedSize, mask, caddr) =>
              require(mask == 0,
                s"dataset ${ds.name}: partial filter masks are not " +
                  "representable in zarr refs")
              val key = name + "/" + coords.zip(cdims)
                .map { case (c, w) => (c / w).toString }.mkString(".")
              refs(key) = (caddr, storedSize.toLong)
            }
        }
      }
      val sb = new StringBuilder
      sb.append("""{"version":1,"templates":{"u":""")
        .append(mapper.writeValueAsString(h5.toString)).append("},\"refs\":{")
      var first = true
      refs.foreach { case (k, v) =>
        if (!first) sb.append(',')
        first = false
        sb.append(mapper.writeValueAsString(k)).append(':')
        v match {
          case s: String => sb.append(mapper.writeValueAsString(s))
          case (off: Long, len: Long) =>
            sb.append(s"""["{{u}}",$off,$len]""")
          case bytes: Array[Byte] =>
            sb.append(mapper.writeValueAsString(
              "base64:" + java.util.Base64.getEncoder.encodeToString(bytes)))
          case other => throw new IllegalStateException(other.toString)
        }
      }
      sb.append("}}")
      sb.toString
    } finally src.close()
  }

  /** Parse a version-0 or version-1 reference JSON. */
  def parse(json: String): RefStore = {
    val root = mapper.readTree(json)
    val (refsNode, templates) =
      if (root.has("refs")) {
        val t = Option(root.get("templates")).map(_.properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty[String, String])
        (root.get("refs"), t)
      } else (root, Map.empty[String, String])
    def substitute(u: String): String =
      templates.foldLeft(u) { case (s, (k, v)) => s.replace(s"{{$k}}", v) }
    val entries = refsNode.properties().asScala.toSeq
      .map(e => e.getKey -> e.getValue)
    val metas = entries.collect {
      case (k, v) if k.endsWith("/.zarray") =>
        val name = k.stripSuffix("/.zarray")
        ZarrCodec.parseV2Array(java.nio.file.Paths.get("/kerchunk"),
          mapper.readTree(v.asText()), name, s"refs!$k")
    }
    val dims = entries.collect {
      case (k, v) if k.endsWith("/.zattrs") =>
        val node = mapper.readTree(v.asText())
        k.stripSuffix("/.zattrs") ->
          Option(node.get("_ARRAY_DIMENSIONS")).map(_.elements().asScala
            .map(_.asText()).toSeq).getOrElse(Seq.empty)
    }.filter(_._2.nonEmpty).toMap
    val refs = entries.collect {
      case (k, v) if !k.endsWith(".zarray") && !k.endsWith(".zattrs") &&
          !k.endsWith(".zgroup") && !k.endsWith(".zmetadata") =>
        val ref: Ref =
          if (v.isArray) FileRef(substitute(v.get(0).asText()),
            v.get(1).asLong(), v.get(2).asLong())
          else {
            val s = v.asText()
            if (s.startsWith("base64:"))
              InlineRef(java.util.Base64.getDecoder.decode(s.drop(7)))
            else InlineRef(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        k -> ref
    }.toMap
    val metaJson = entries.collect {
      case (k, v) if k.endsWith(".zarray") || k.endsWith(".zattrs") ||
          k.endsWith(".zgroup") => k -> v.asText()
    }.toMap
    RefStore(metas, refs, dims, metaJson)
  }

  /** Decode one referenced chunk through the shared zarr codec. */
  def decodeRef(meta: ZarrCodec.ArrayMeta, key: String, ref: Ref)
      : (Array[Int], Array[Int], Array[Double]) =
    ZarrCodec.decodeChunk(meta, key, fetch(ref))


  /** MultiZarr combine (kerchunk's `MultiZarrToZarr`): concatenate
    * per-file reference stores into ONE virtual store along
    * `concatDim`. Arrays whose leading `_ARRAY_DIMENSIONS` entry is
    * the concat dimension get their shape summed and their chunk keys
    * re-indexed by each file's cumulative chunk-row offset; every
    * other array must agree across files and is taken from the first.
    * Requires chunk-aligned parts (each file's extent a multiple of
    * the chunk size along the axis) — the layout h5py/netCDF4 produce
    * for per-timestep archives — so a chunk never straddles files.
    */
  def combine(stores: Seq[RefStore], concatDim: String): RefStore = {
    // case-class equality trips on NaN fill values (NaN != NaN);
    // compare with the fill normalized out, then NaN-aware
    def sameMeta(a: ZarrCodec.ArrayMeta, b: ZarrCodec.ArrayMeta): Boolean =
      a.copy(fillValue = 0) == b.copy(fillValue = 0) &&
        (a.fillValue == b.fillValue ||
          (a.fillValue.isNaN && b.fillValue.isNaN))
    require(stores.nonEmpty, "no stores to combine")
    val head = stores.head
    val names = head.metas.map(_.name)
    stores.tail.foreach(st => require(st.metas.map(_.name) == names,
      "stores carry different array sets"))
    def isConcat(name: String): Boolean =
      head.dims.get(name).exists(_.headOption.contains(concatDim))
    val outRefs = scala.collection.mutable.LinkedHashMap[String, Ref]()
    val outMetas = head.metas.map { m0 =>
      val perFile = stores.map(_.metas.find(_.name == m0.name).get)
      if (!isConcat(m0.name)) {
        require(perFile.forall(sameMeta(_, m0)),
          s"${m0.name}: non-concat arrays must be identical across files")
        chunkRefs(head, m0).foreach { case (k, r) =>
          outRefs(s"${m0.name}/$k") = r
        }
        m0
      } else {
        val chunkT = m0.chunks.head
        perFile.foreach { m =>
          require(sameMeta(m.copy(shape = m0.shape, nChunks = m0.nChunks), m0),
            s"${m.name}: incompatible metadata across files")
          require(m.shape.head % chunkT == 0,
            s"${m.name}: extent ${m.shape.head} along $concatDim is not " +
              s"a multiple of chunk $chunkT — a chunk would straddle files")
        }
        var rowOff = 0
        stores.zip(perFile).foreach { case (st, m) =>
          chunkRefs(st, m).foreach { case (k, r) =>
            val idx = k.split('.')
            val shifted = ((idx.head.toInt + rowOff) +: idx.tail.toSeq)
              .mkString(".")
            outRefs(s"${m0.name}/$shifted") = r
          }
          rowOff += m.shape.head / chunkT
        }
        val total = perFile.map(_.shape.head).sum
        m0.copy(shape = total +: m0.shape.tail,
          nChunks = ((total + chunkT - 1) / chunkT) +: m0.nChunks.tail)
      }
    }
    // carry the raw metadata forward, patching concat arrays' shapes so
    // the parquet emitter round-trips the COMBINED geometry
    val outMetaJson = head.metaJson.map {
      case (k, v) if k.endsWith("/.zarray") &&
          isConcat(k.stripSuffix("/.zarray")) =>
        val m = outMetas.find(_.name == k.stripSuffix("/.zarray")).get
        val node = mapper.readTree(v).asInstanceOf[
          com.fasterxml.jackson.databind.node.ObjectNode]
        val arr = node.putArray("shape")
        m.shape.foreach(arr.add)
        k -> mapper.writeValueAsString(node)
      case kv => kv
    }
    RefStore(outMetas, outRefs.toMap, head.dims, outMetaJson)
  }

  // ---------------------------------------------------------------- //
  // Parquet reference stores (fsspec LazyReferenceMapper layout): the
  // at-scale twin of the JSON document. One row PER CHUNK, C-ordered by
  // chunk index, `recordSize` rows per refs.{i}.parq file under each
  // array's directory; `.zmetadata` holds the consolidated zarr
  // metadata plus "record_size". A 100 TB archive's JSON refs are
  // gigabytes of text parsed on one node — the parquet form keeps the
  // same information columnar, splittable, and lazily readable per
  // array, which is why the fsspec ecosystem moved to it.
  // ---------------------------------------------------------------- //

  // one shared Configuration: constructing one per refs file costs more
  // than the write itself at fixture scale
  private lazy val hadoopConf = new org.apache.hadoop.conf.Configuration()

  private val refsSchema = org.apache.parquet.schema.MessageTypeParser
    .parseMessageType(
      """message refs {
        |  optional binary path (UTF8);
        |  optional int64 offset;
        |  optional int64 size;
        |  optional binary raw;
        |}""".stripMargin)

  /** C-order chunk keys of an array ("0.0", "0.1", ...). */
  private def chunkKeysInOrder(m: ZarrCodec.ArrayMeta): Seq[String] = {
    val n = m.nChunks.map(_.toLong).product
    require(n <= Int.MaxValue, s"${m.name}: $n chunks")
    (0L until n).map { ord =>
      val idx = new Array[Long](m.nChunks.length)
      var rem = ord
      var d = m.nChunks.length - 1
      while (d >= 0) { idx(d) = rem % m.nChunks(d); rem /= m.nChunks(d); d -= 1 }
      idx.mkString(".")
    }
  }

  /** Emit a parquet reference store for `store` at `dir`: `.zmetadata`
    * (consolidated metadata + record_size) and per-array
    * `<name>/refs.{i}.parq` files. Missing chunks (fill-value regions)
    * become all-null rows — the row POSITION is the chunk ordinal, so
    * absence must be encoded, not skipped.
    */
  def writeParquetRefs(store: RefStore, dir: Path,
                       recordSize: Int = 10000): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.io.api.Binary
    require(recordSize >= 1, s"recordSize $recordSize")
    Files.createDirectories(dir)
    val metaNode = mapper.createObjectNode()
    val mNode = metaNode.putObject("metadata")
    store.metaJson.toSeq.sortBy(_._1).foreach { case (k, v) =>
      mNode.set[com.fasterxml.jackson.databind.JsonNode](k, mapper.readTree(v))
    }
    metaNode.put("record_size", recordSize)
    Files.writeString(dir.resolve(".zmetadata"),
      mapper.writeValueAsString(metaNode))
    store.metas.foreach { m =>
      val aDir = dir.resolve(m.name)
      Files.createDirectories(aDir)
      // Clear ALL previous refs.*.parq first: a rewrite with a smaller
      // layout (fewer chunks or a larger record_size) must not leave
      // stale higher-index blocks behind — readParquetRefs walks
      // refs.{i}.parq while the file exists, so a survivor from an old
      // layout would be ingested and trip the ordinal/keys check.
      val prior = Files.list(aDir)
      try prior.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("refs.") && n.endsWith(".parq"))
          Files.deleteIfExists(p)
      } finally prior.close()
      chunkKeysInOrder(m).grouped(recordSize).zipWithIndex.foreach {
        case (block, i) =>
          val f = aDir.resolve(s"refs.$i.parq")
          Files.deleteIfExists(f)
          val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
            .builder(new org.apache.hadoop.fs.Path(f.toString))
            .withType(refsSchema)
            .withConf(hadoopConf)
            .build()
          try block.foreach { key =>
            val g = new SimpleGroup(refsSchema)
            store.refs.get(s"${m.name}/$key").foreach {
              case FileRef(p, off, len) =>
                g.append("path", p)
                g.append("offset", off)
                g.append("size", len)
              case InlineRef(bytes) =>
                g.append("raw", Binary.fromConstantByteArray(bytes))
            }
            w.write(g)
          } finally w.close()
      }
    }
  }

  /** Read a parquet reference store written by [[writeParquetRefs]] (or
    * fsspec): `.zmetadata` supplies the array metadata and record size,
    * each refs.{i}.parq row maps back to its chunk by position.
    */
  def readParquetRefs(dir: Path): RefStore = {
    import org.apache.parquet.example.data.Group
    val metaNode = mapper.readTree(Files.readString(dir.resolve(".zmetadata")))
    val recordSize = metaNode.get("record_size").asInt()
    val mNode = metaNode.get("metadata")
    val entries = mNode.properties().asScala.toSeq
      .map(e => e.getKey -> e.getValue)
    val metaJson = entries
      .map { case (k, v) => k -> mapper.writeValueAsString(v) }.toMap
    val metas = entries.collect {
      case (k, v) if k.endsWith("/.zarray") =>
        ZarrCodec.parseV2Array(Paths.get("/kerchunk"), v,
          k.stripSuffix("/.zarray"), s"zmetadata!$k")
    }
    val dims = entries.collect {
      case (k, v) if k.endsWith("/.zattrs") =>
        k.stripSuffix("/.zattrs") ->
          Option(v.get("_ARRAY_DIMENSIONS")).map(_.elements().asScala
            .map(_.asText()).toSeq).getOrElse(Seq.empty)
    }.filter(_._2.nonEmpty).toMap
    val refs = scala.collection.mutable.LinkedHashMap[String, Ref]()
    metas.foreach { m =>
      val keys = chunkKeysInOrder(m)
      val aDir = dir.resolve(m.name)
      var ord = 0
      var i = 0
      while (Files.exists(aDir.resolve(s"refs.$i.parq"))) {
        val r = org.apache.parquet.hadoop.ParquetReader
          .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
            new org.apache.hadoop.fs.Path(aDir.resolve(s"refs.$i.parq").toString))
          .withConf(hadoopConf)
          .build()
        try {
          var g: Group = r.read()
          while (g != null) {
            require(ord < keys.length,
              s"${m.name}: more ref rows than chunks (${keys.length})")
            val key = keys(ord)
            if (g.getFieldRepetitionCount("path") > 0)
              refs(s"${m.name}/$key") = FileRef(g.getString("path", 0),
                g.getLong("offset", 0), g.getLong("size", 0))
            else if (g.getFieldRepetitionCount("raw") > 0)
              refs(s"${m.name}/$key") =
                InlineRef(g.getBinary("raw", 0).getBytes)
            // all-null row = missing chunk (fill value): no ref entry
            ord += 1
            g = r.read()
          }
        } finally r.close()
        i += 1
      }
      require(ord == keys.length,
        s"${m.name}: $ord ref rows for ${keys.length} chunks " +
          s"(record_size $recordSize, $i files)")
    }
    RefStore(metas, refs.toMap, dims, metaJson)
  }

  private def fetch(ref: Ref): Array[Byte] = ref match {
    case InlineRef(b) => b
    case FileRef(p, off, len) =>
      require(len <= Int.MaxValue, s"chunk of $len bytes")
      val src = new PathByteSource(java.nio.file.Paths.get(p))
      try src.read(off, len.toInt) finally src.close()
  }

  /** Chunk refs of one array: (chunkKey, ref), key in zarr "0.0" form. */
  def chunkRefs(st: RefStore, meta: ZarrCodec.ArrayMeta)
  : Seq[(String, Ref)] = {
    val prefix = meta.name + "/"
    st.refs.toSeq.collect {
      case (k, r) if k.startsWith(prefix) => k.stripPrefix(prefix) -> r
    }.sortBy(_._1)
  }

  /** Assemble one array (driver-side; the distributed path maps the
    * same `chunkRefs` over executors — q121).
    */
  def readArray(st: RefStore, meta: ZarrCodec.ArrayMeta): Array[Double] = {
    val out = new Array[Double](meta.nValues.toInt)
    val outStrides = meta.shape.scanRight(1)((d, acc) => d * acc).tail
    chunkRefs(st, meta).foreach { case (key, ref) =>
      val (origin, shape, values) =
        ZarrCodec.decodeChunk(meta, key, fetch(ref))
      val st2 = shape.scanRight(1)((d, acc) => d * acc).tail
      var i = 0
      while (i < values.length) {
        var rem = i; var dst = 0; var d = 0
        while (d < shape.length) {
          val c = rem / st2(d); rem %= st2(d)
          dst += (origin(d) + c) * outStrides(d); d += 1
        }
        out(dst) = values(i)
        i += 1
      }
    }
    out
  }
}
