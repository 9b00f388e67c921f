package graft.source.v2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.SnapshotTable

/** GROUP-BASED (copy-on-write) row-level operations — what turns SQL
  * `MERGE INTO` and `UPDATE` loose on the snapshot table:
  *
  *   1. Spark asks [[GraftRowLevelOperation.newScanBuilder]] for a
  *      scan of the target; our ordinary [[GraftScanBuilder]] serves
  *      it, so static predicates AND the runtime group filter Spark
  *      injects (`RowLevelOperationRuntimeGroupFiltering` — the
  *      matched source keys come back as an `In` filter) prune the
  *      rewrite to the files that can actually hold affected rows.
  *      The built scan records the exact file set it planned: those
  *      files ARE the groups being replaced.
  *   2. Spark rewrites the plan to `ReplaceData`: the merged/updated
  *      rows of the affected groups arrive at this operation's
  *      [[GraftBatchWrite]], whose executors write parquet with
  *      Spark's own row codec ([[org.apache.spark.sql.execution
  *      .datasources.parquet.ParquetWriteSupport]]) while tracking
  *      per-file stats.
  *   3. commit() swaps the manifests: files = (base − scanned) + new,
  *      stats carried for survivors and recomputed for the batch,
  *      blooms rebuilt for new files, schema meta carried under the
  *      current epoch. The create-exclusive put targets base+1, so a
  *      concurrent commit fails THIS operation loudly — the
  *      plan-against-base mutation policy, same as compact/merge.
  *
  * Boundaries, stated loudly: hidden-partitioned tables reject (a
  * group rewrite would break partition purity — route through
  * [[SnapshotTable.mergePartitioned]]), and DV-carrying or
  * schema-ALTERed tables reject at scan resolution as everywhere
  * else. Translatable DELETEs never land here — [[GraftTable]]'s
  * `SupportsDelete` intercepts them with the cheaper DV + fold path;
  * a DELETE whose predicate has no safe SQL rendering falls back to
  * this group-based rewrite, which evaluates it as a Catalyst
  * expression. CHECK constraints validate the rewritten batch before
  * commit, and the history op records the actual command.
  */
final class GraftRowLevelOperation(
    path: String,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  private val res = GraftTableSource.resolveForScan(Map("path" -> path))
  require(res.ver.part.isEmpty,
    s"table is hidden-partitioned (${res.ver.part.get}) — a group " +
      "rewrite would break partition purity; use " +
      "SnapshotTable.mergePartitioned")

  /** The scan serving the operation — kept so commit() knows exactly
    * which files were read (= replaced).
    */
  @volatile private var scan: GraftScan = _

  override def command(): RowLevelOperation.Command = cmd

  /** Requiring `_file` routes the write through Spark's
    * metadata-aware task, which strips the merge bookkeeping column
    * and projects rows back to the table schema — and gives the
    * runtime group filter a column that names EXACTLY the files
    * holding matched rows.
    */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("_file"))

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new GraftScanBuilder(res) {
    override def build(): org.apache.spark.sql.connector.read.Scan = {
      val s = super.build()
      s match {
        // the REWRITE scan reads every table column (it reproduces
        // whole rows); the runtime group-filter SUBQUERY scan reads
        // only the join key + _file and must not become the group set
        case g: GraftScan if res.schema.fieldNames.forall(
            g.readSchema().fieldNames.contains) => scan = g
        case _ => ()
      }
      s
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = rowLevelWrite(info)
    }

  private def rowLevelWrite(info: LogicalWriteInfo): Write = {
    new Write {
      override def description(): String =
        s"graft_table $path $cmd (group-based rewrite)"
      override def toBatch: BatchWrite =
        new GraftBatchWrite(path, res, info.schema(), cmd.toString, () => {
          require(scan != null && scan.plannedFileNames != null,
            "row-level write committed before its scan planned — " +
              "no group set to replace")
          scan.plannedFileNames
        })
    }
  }
}

/** One rewritten group batch: executors write parquet files under a
  * fresh batch directory; the driver swaps them for the scanned files
  * in one conditional-put commit.
  */
private[v2] final class GraftBatchWrite(
    path: String,
    res: GraftTableSource.Resolved,
    rowSchema: StructType,
    op: String,
    scannedFiles: () => Seq[String]) extends BatchWrite {

  private val batchDir =
    s"$path/files/batch-${java.util.UUID.randomUUID().toString.take(12)}"

  private val statsIdx: Option[(Int, Boolean)] =
    res.ver.stats.map(_.col).map { c =>
      val i = rowSchema.fieldIndex(c)
      (i, rowSchema.fields(i).dataType == IntegerType)
    }

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    // ParquetWriteSupport.init reads these SQL confs from the hadoop
    // Configuration (FileFormatWriter copies them in the ordinary
    // write path); resolve them ON THE DRIVER through their typed
    // entries — defaults only resolve against a live SQLConf — and
    // ship the rendered values
    import org.apache.spark.sql.internal.SQLConf
    val sc = SQLConf.get
    val sqlConfs = Map(
      SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key ->
        sc.getConf(SQLConf.PARQUET_WRITE_LEGACY_FORMAT).toString,
      SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key ->
        sc.getConf(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE).toString,
      SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key ->
        sc.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString,
      SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key ->
        sc.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key ->
        sc.getConf(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED).toString,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key ->
        sc.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    new GraftRowWriterFactory(batchDir, rowSchema, statsIdx, sqlConfs)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val written = messages.toSeq.collect {
      case m: GraftRowWriteMessage if m.rows > 0 => m
    }.sortBy(_.file)
    // MERGE/UPDATE ingest rows: CHECK constraints validate the
    // rewritten batch exactly like every other data-ingesting commit
    SnapshotTable.enforceConstraintsOn(spark, path, written.map(_.file))
    val removed = scannedFiles().map(SnapshotTable.canonFile).toSet
    val base = res.ver
    val keepIdx = base.files.indices
      .filterNot(i => removed(SnapshotTable.canonFile(base.files(i))))
    // sizes: one driver-side stat per new file, O(batch)
    val conf = new Configuration()
    def sizeOf(f: String): Long = {
      val p = new HPath(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }
    val files = keepIdx.map(base.files) ++ written.map(_.file)
    val rows = keepIdx.map(i => base.fileRows.get(i)) ++ written.map(_.rows)
    val bytes = keepIdx.map(i => base.fileBytes.get(i)) ++
      written.map(m => sizeOf(m.file))
    val stats = base.stats.map { st =>
      SnapshotTable.Stats(st.col,
        keepIdx.map(st.mins) ++ written.map(_.statMin),
        keepIdx.map(st.maxs) ++ written.map(_.statMax))
    }
    base.bloom.foreach { bc =>
      if (written.nonEmpty)
        graft.ops.BloomIndex.buildRows(spark, written.map(_.file),
            bc.col, bc.expectedPerFile, fpp = bc.fpp)
          .coalesce(1).write.mode("errorifexists")
          .json(s"$path/bloomidx/idx-${java.util.UUID.randomUUID()
            .toString.take(12)}")
    }
    SnapshotTable.commitReplaceGroups(spark, path, base, files, rows,
      bytes, stats, keepIdx, written.length, op = op)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    messages.foreach {
      case m: GraftRowWriteMessage =>
        val p = new HPath(m.file)
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) fs.delete(p, false)
      case _ => ()
    }
  }
}

private[v2] final case class GraftRowWriteMessage(
    file: String, rows: Long, statMin: Long, statMax: Long)
    extends WriterCommitMessage

private[v2] final class GraftRowWriterFactory(
    batchDir: String, schema: StructType,
    statsIdx: Option[(Int, Boolean)],
    sqlConfs: Map[String, String])
    extends DataWriterFactory {

  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport

      private val file =
        s"$batchDir/part-$partitionId-$taskId.parquet"
      private var n = 0L
      private var mn = Long.MaxValue
      private var mx = Long.MinValue

      private lazy val writer = {
        val conf = new Configuration()
        sqlConfs.foreach { case (k, v) => if (v != null) conf.set(k, v) }
        ParquetWriteSupport.setSchema(schema, conf)
        val support = new ParquetWriteSupport
        new org.apache.parquet.hadoop.ParquetWriter[InternalRow](
          new HPath(file), support,
          org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY,
          org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE,
          org.apache.parquet.hadoop.ParquetWriter.DEFAULT_PAGE_SIZE,
          org.apache.parquet.hadoop.ParquetWriter.DEFAULT_PAGE_SIZE,
          true, false,
          org.apache.parquet.hadoop.ParquetWriter.DEFAULT_WRITER_VERSION,
          conf)
      }

      // carried-over rows arrive with their metadata row; the
      // rewrite only needs the data projection
      override def write(metadata: InternalRow,
                         record: InternalRow): Unit = write(record)

      override def write(record: InternalRow): Unit = {
        statsIdx.foreach { case (i, isInt) =>
          if (!record.isNullAt(i)) {
            val v = if (isInt) record.getInt(i).toLong else record.getLong(i)
            if (v < mn) mn = v
            if (v > mx) mx = v
          }
        }
        n += 1
        writer.write(record)
      }

      override def commit(): WriterCommitMessage = {
        if (n > 0) writer.close()
        GraftRowWriteMessage(file, n,
          if (mn == Long.MaxValue) 0L else mn,
          if (mx == Long.MinValue) 0L else mx)
      }

      override def abort(): Unit =
        if (n > 0) {
          try writer.close() catch { case _: Throwable => () }
          try {
            val hp = new HPath(file)
            val fs = hp.getFileSystem(new Configuration())
            if (fs.exists(hp)) fs.delete(hp, false)
          } catch { case _: Throwable => () }
        }

      override def close(): Unit = ()
    }
}
