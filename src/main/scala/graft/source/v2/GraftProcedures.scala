package graft.source.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.SnapshotTable

/** The snapshot table's MAINTENANCE operations as SQL procedures —
  * Spark 4's `ProcedureCatalog`, so a pure-SQL user runs day-two
  * operations without touching the Scala API:
  *
  * {{{
  *   CALL graft.system.optimize(`table` => 'db.t', target_bytes => 64000000)
  *   CALL graft.system.zorder('db.t', 'k', 8)
  *   CALL graft.system.expire('db.t', 3)
  *   CALL graft.system.vacuum('db.t', 3600000)
  *   CALL graft.system.materialize_deletes('db.t')
  *   CALL graft.system.materialize_schema('db.t')
  *   CALL graft.system.analyze('db.t', 'ship_d, name')
  * }}}
  *
  * The namespace is decorative (procedures are catalog-global); the
  * `table` argument is the catalog-relative identifier. Each call
  * routes to the corresponding [[SnapshotTable]] operation — the same
  * create-exclusive commit protocol as every other mutation — and
  * returns its result record as a one-row relation, so callers can
  * assert on versions/file counts in plain SQL. `optimize` routes to
  * the partitioned or plain compaction automatically.
  */
private[v2] object GraftProcedures {

  val names: Seq[String] = Seq("optimize", "zorder", "expire", "vacuum",
    "materialize_deletes", "materialize_schema", "restore", "clone",
    "analyze", "create_branch", "create_tag", "fast_forward",
    "stage_branch", "publish", "drop_ref")

  def load(root: String, name: String): UnboundProcedure = {
    def pathOf(table: String): String =
      (root +: table.split('.').toSeq).mkString("/")
    name match {
      case "optimize" => proc("optimize",
        Seq("table" -> StringType, "target_bytes" -> LongType),
        StructType(Seq(StructField("version", LongType),
          StructField("files_before", IntegerType),
          StructField("files_after", IntegerType),
          StructField("rewritten", IntegerType)))) { args =>
        val spark = SparkSession.active
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        val target = args(1).asInstanceOf[Long]
        val ver = SnapshotTable.readVersion(spark, p,
          SnapshotTable.latestVersion(p))
        val r =
          if (ver.part.isDefined)
            SnapshotTable.compactPartitioned(spark, p, target)
          else SnapshotTable.compact(spark, p, target)
        // cached resolutions predate the commit
        GraftTableSource.invalidate(p)
        Seq[Any](r.version, r.filesBefore, r.filesAfter, r.rewritten)
      }
      case "zorder" => proc("zorder",
        Seq("table" -> StringType, "cluster_col" -> StringType,
          "num_partitions" -> IntegerType),
        StructType(Seq(StructField("version", LongType),
          StructField("files_before", IntegerType),
          StructField("files_after", IntegerType)))) { args =>
        val spark = SparkSession.active
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        // partition-aware since r19: curve-order INSIDE each hidden
        // tuple ([[SnapshotTable.reclusterPartitioned]]) so rectangle
        // pruning composes with partition pruning
        val ver = SnapshotTable.readVersion(spark, p,
          SnapshotTable.latestVersion(p))
        val r =
          if (ver.part.isDefined)
            SnapshotTable.reclusterPartitioned(spark, p,
              args(1).asInstanceOf[UTF8String].toString,
              args(2).asInstanceOf[Int])
          else SnapshotTable.recluster(spark, p,
            args(1).asInstanceOf[UTF8String].toString,
            args(2).asInstanceOf[Int])
        GraftTableSource.invalidate(p)
        Seq[Any](r.version, r.filesBefore, r.filesAfter)
      }
      // write-audit-publish from pure SQL (r19): stage on a branch,
      // audit by `SELECT ... FROM t VERSION AS OF`/ref reads, publish
      // with one atomic fast-forward
      case "create_branch" => proc("create_branch",
        Seq("table" -> StringType, "name" -> StringType,
          "version" -> LongType),
        StructType(Seq(StructField("version", LongType)))) { args =>
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        Seq[Any](SnapshotTable.createBranch(p,
          args(1).asInstanceOf[UTF8String].toString,
          args(2).asInstanceOf[Long]))
      }
      case "create_tag" => proc("create_tag",
        Seq("table" -> StringType, "name" -> StringType,
          "version" -> LongType),
        StructType(Seq(StructField("version", LongType)))) { args =>
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        Seq[Any](SnapshotTable.createTag(p,
          args(1).asInstanceOf[UTF8String].toString,
          args(2).asInstanceOf[Long]))
      }
      case "fast_forward" => proc("fast_forward",
        Seq("table" -> StringType, "to" -> StringType,
          "from" -> StringType),
        StructType(Seq(StructField("version", LongType)))) { args =>
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        Seq[Any](SnapshotTable.fastForward(p,
          args(1).asInstanceOf[UTF8String].toString,
          args(2).asInstanceOf[UTF8String].toString))
      }
      case "stage_branch" => proc("stage_branch",
        Seq("table" -> StringType, "name" -> StringType,
          "version" -> LongType, "base" -> LongType),
        StructType(Seq(StructField("version", LongType)))) { args =>
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        Seq[Any](SnapshotTable.stageBranch(p,
          args(1).asInstanceOf[UTF8String].toString,
          args(2).asInstanceOf[Long], args(3).asInstanceOf[Long]))
      }
      case "publish" => proc("publish",
        Seq("table" -> StringType, "to" -> StringType,
          "from" -> StringType),
        StructType(Seq(StructField("version", LongType),
          StructField("staged", LongType),
          StructField("mode", StringType),
          StructField("files_added", IntegerType),
          StructField("files_removed", IntegerType),
          StructField("dv_added", IntegerType)))) { args =>
        // publish-as-cherry-pick: safe when other staged batches
        // (possibly failed-audit ones) sit between the published and
        // staged versions — see [[SnapshotTable.publish]]
        val spark = SparkSession.active
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        val r = SnapshotTable.publish(spark, p,
          args(1).asInstanceOf[UTF8String].toString,
          args(2).asInstanceOf[UTF8String].toString)
        GraftTableSource.invalidate(p)
        Seq[Any](r.version, r.staged, UTF8String.fromString(r.mode),
          r.filesAdded, r.filesRemoved, r.dvAdded)
      }
      case "drop_ref" => proc("drop_ref",
        Seq("table" -> StringType, "name" -> StringType),
        StructType(Seq(StructField("dropped", BooleanType)))) { args =>
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        SnapshotTable.dropRef(p,
          args(1).asInstanceOf[UTF8String].toString)
        Seq[Any](true)
      }
      case "analyze" => proc("analyze",
        Seq("table" -> StringType, "columns" -> StringType),
        StructType(Seq(StructField("version", LongType),
          StructField("columns", IntegerType)))) { args =>
        // ANALYZE TABLE for the typed stats index: declare (or
        // re-declare) the comma-separated column list and commit
        // per-file bounds for every live file — the one deliberate
        // O(table-stats-columns) read in the lifecycle, now reachable
        // from pure SQL
        val spark = SparkSession.active
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        val cols = args(1).asInstanceOf[UTF8String].toString
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val v = SnapshotTable.analyzeStats(spark, p, cols)
        GraftTableSource.invalidate(p)
        Seq[Any](v, cols.length)
      }
      case "expire" => proc("expire",
        Seq("table" -> StringType, "keep_from" -> LongType),
        StructType(Seq(StructField("manifests_deleted", IntegerType),
          StructField("files_deleted", IntegerType),
          StructField("files_retained", IntegerType)))) { args =>
        val spark = SparkSession.active
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        val r = SnapshotTable.expire(spark, p, args(1).asInstanceOf[Long])
        GraftTableSource.invalidate(p)
        Seq[Any](r.manifestsDeleted, r.filesDeleted, r.filesRetained)
      }
      case "vacuum" => proc("vacuum",
        Seq("table" -> StringType, "older_than_ms" -> LongType),
        StructType(Seq(StructField("orphans_deleted", IntegerType),
          StructField("bytes_freed", LongType),
          StructField("index_rows_dropped", LongType),
          StructField("files_live", IntegerType)))) { args =>
        val spark = SparkSession.active
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        val r = SnapshotTable.vacuum(spark, p, args(1).asInstanceOf[Long])
        Seq[Any](r.orphansDeleted, r.bytesFreed, r.indexRowsDropped, r.filesLive)
      }
      case "materialize_deletes" => proc("materialize_deletes",
        Seq("table" -> StringType),
        StructType(Seq(StructField("version", LongType),
          StructField("files_before", IntegerType),
          StructField("files_after", IntegerType),
          StructField("rewritten", IntegerType)))) { args =>
        val spark = SparkSession.active
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        val r = SnapshotTable.materializeDeletes(spark, p)
        GraftTableSource.invalidate(p)
        Seq[Any](r.version, r.filesBefore, r.filesAfter, r.rewritten)
      }
      case "materialize_schema" => proc("materialize_schema",
        Seq("table" -> StringType),
        StructType(Seq(StructField("version", LongType),
          StructField("files_before", IntegerType),
          StructField("files_after", IntegerType),
          StructField("rewritten", IntegerType)))) { args =>
        val spark = SparkSession.active
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        val r = SnapshotTable.materializeSchema(spark, p)
        GraftTableSource.invalidate(p)
        Seq[Any](r.version, r.filesBefore, r.filesAfter, r.rewritten)
      }
      case "restore" => proc("restore",
        Seq("table" -> StringType, "to_version" -> LongType),
        StructType(Seq(StructField("version", LongType)))) { args =>
        val spark = SparkSession.active
        val p = pathOf(args(0).asInstanceOf[UTF8String].toString)
        val v = SnapshotTable.restore(spark, p, args(1).asInstanceOf[Long])
        GraftTableSource.invalidate(p)
        Seq[Any](v)
      }
      case "clone" => proc("clone",
        Seq("source" -> StringType, "target" -> StringType,
          "version" -> LongType),
        StructType(Seq(StructField("version", LongType)))) { args =>
        val spark = SparkSession.active
        val src = pathOf(args(0).asInstanceOf[UTF8String].toString)
        val dst = pathOf(args(1).asInstanceOf[UTF8String].toString)
        Seq[Any](SnapshotTable.cloneAt(spark, src, dst,
          args(2).asInstanceOf[Long]))
      }
      case other => throw new UnsupportedOperationException(
        s"no graft procedure $other — available: ${names.mkString(", ")}")
    }
  }

  /** An UnboundProcedure from (name, IN parameters, result schema,
    * body): bind validates arity, call extracts the coerced arguments
    * positionally and returns the body's record as one
    * [[LocalScan]] — the shape Spark's `InvokeProcedures` rule turns
    * into a LocalRelation command result.
    */
  private def proc(pname: String, params: Seq[(String, DataType)],
                   result: StructType)(body: Seq[Any] => Seq[Any])
      : UnboundProcedure = new UnboundProcedure {
    override def name(): String = pname
    override def description(): String =
      s"graft $pname(${params.map(p => s"${p._1} ${p._2.sql}").mkString(", ")})"
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = pname
        override def description(): String = pname
        override def isDeterministic: Boolean = false
        override def parameters(): Array[ProcedureParameter] =
          params.map { case (n, dt) =>
            ProcedureParameter.in(n, dt).build()
          }.toArray
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val args = params.indices.map { i =>
            require(!input.isNullAt(i),
              s"$pname: argument ${params(i)._1} is NULL")
            input.get(i, params(i)._2)
          }
          val row = InternalRow.fromSeq(body(args))
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = result
          }).iterator()
        }
      }
  }
}
