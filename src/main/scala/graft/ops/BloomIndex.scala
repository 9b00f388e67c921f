package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.Base64

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom index for point lookups on a column the physical
  * layout does NOT cluster on — the complement of [[ZOrderCluster]]'s
  * min/max manifests.
  *
  * Min/max skipping only pays when the layout sorts by the queried
  * column: a high-cardinality key scattered uniformly across files
  * (orderkey in a time-partitioned fact table, doc_id in a
  * crawl-ordered corpus) has every file's [min, max] spanning the whole
  * domain, so range stats prune nothing. A per-file Bloom filter keeps
  * pruning alive for EQUALITY probes regardless of layout: no false
  * negatives (a file holding the key always reads), false positives
  * only cost an extra file read the residual predicate then empties.
  * This is the same role parquet's optional column-index blooms play,
  * lifted to the file-manifest level so the planner can skip whole
  * objects without opening footers — at 100 TB the difference between
  * touching ~2 files and listing+reading thousands for one key.
  *
  * Build cost is one pass: per-scan-partition partial blooms (bounded
  * memory: one `numBits/8`-byte array per distinct file seen by the
  * partition), shuffled and OR-merged per file — the shuffle carries
  * only bloom bytes, O(files × bloomBytes), never the data. Blooms are
  * order-independent bit-sets over Murmur3 of the key, so the merged
  * index is deterministic for a deterministic layout.
  *
  * The PROBE side is distributed too: the index relation is filtered
  * in executors (each task decodes only its partition's blooms, tests
  * membership, and emits at most the file NAME), so the driver holds
  * O(hit files) strings — never O(files × bloomBytes). At 100k files ×
  * ~1.2 MB blooms that is the difference between a few KB of hit
  * names and ~120 GB of driver heap for one point lookup.
  *
  * Like the curve-key manifests, the index is derived by re-scanning
  * the written files (`input_file_name`), recording what a reader will
  * actually observe, whatever the committer renamed.
  */
object BloomIndex {

  final case class FileBloom(file: String, n: Long, bloomB64: String,
                             col: String)

  /** The index relation's schema, pinned: every probe would otherwise
    * pay a full JSON schema-INFERENCE pass over the index files
    * before the actual read — one read per probe instead of two.
    */
  val indexSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("file", StringType),
      StructField("n", LongType),
      StructField("bloomB64", StringType),
      StructField("col", StringType)))
  }

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  private def deserialize(b: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(b))

  /** Canonical BUILD-side key expression for a bloom column: the bloom
    * physically holds either longs or UTF-8 strings, and build/probe
    * must agree on the encoding per source type —
    *
    *  - integral types: the long value itself
    *  - DATE:           epoch DAYS (matches [[TypedBounds.keyOfValue]])
    *  - TIMESTAMP:      epoch MICROS (ditto)
    *  - STRING:         the string, hashed via `putString`
    *
    * Float/double/binary keys are rejected loudly: equality probes on
    * floats are a correctness trap (NaN, -0.0) and the reference
    * never needs them.
    */
  private def canonExpr(dt: org.apache.spark.sql.types.DataType,
                        keyName: String): (Column, Boolean) = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => (col(keyName), true)
      case DateType =>
        (datediff(col(keyName), to_date(lit("1970-01-01"))).cast("long"),
          false)
      case TimestampType => (unix_micros(col(keyName)), false)
      case ByteType | ShortType | IntegerType | LongType =>
        (col(keyName).cast("long"), false)
      // DECIMAL (p ≤ 18): the UNSCALED long at the column's scale —
      // exact, same canonical long the bounds/partition planes use.
      // Probe values arrive as BigDecimal already cast to the column
      // type, so their own scale IS the column scale ([[canonProbe]])
      case d: DecimalType if d.precision <= 18 =>
        ((col(keyName) * lit(TypedBounds.pow10(d.scale))).cast("long"),
          false)
      case other => throw new IllegalArgumentException(
        s"bloom index on '$keyName' of type $other — supported key " +
          "types are integral, STRING, DATE, TIMESTAMP, DECIMAL(≤18) " +
          "(float/double equality probes are a NaN/-0.0 correctness " +
          "trap)")
    }
  }

  /** Canonical PROBE-side key for a value Spark's filter pushdown (or
    * a caller) hands us: the runtime class decides, mirroring
    * [[canonExpr]] exactly. Returns `Left(long)` or `Right(string)`;
    * `None` = not a bloom-probeable value (caller must NOT prune).
    */
  def canonProbe(v: Any): Option[Either[Long, String]] = v match {
    case l: Long => Some(Left(l))
    case i: Int => Some(Left(i.toLong))
    case s: Short => Some(Left(s.toLong))
    case b: Byte => Some(Left(b.toLong))
    case s: String => Some(Right(s))
    case s: org.apache.spark.unsafe.types.UTF8String =>
      Some(Right(s.toString))
    case d: java.sql.Date => Some(Left(d.toLocalDate.toEpochDay))
    case d: java.time.LocalDate => Some(Left(d.toEpochDay))
    case t: java.sql.Timestamp => Some(Left(
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .fromJavaTimestamp(t)))
    case t: java.time.Instant => Some(Left(
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .instantToMicros(t)))
    // decimal probes canonicalize at the VALUE's own scale — the
    // pushdown path casts literals to the column type first, so the
    // scales agree; an API caller must pass the column-scaled value
    case bd: java.math.BigDecimal =>
      TypedBounds.unscaledOf(bd, bd.scale).map(Left(_))
    case dec: org.apache.spark.sql.types.Decimal =>
      Some(Left(dec.toUnscaledLong))
    case _ => None
  }

  /** One index row per file of `files`: per-scan-partition partial
    * blooms OR-merged per file. The shuffle carries only bloom bytes;
    * nothing here ever materializes data or blooms on the driver.
    * Shared by the standalone index writer and the snapshot-table
    * per-batch index maintenance ([[SnapshotTable]]).
    *
    * The key column may be integral, STRING, DATE, or TIMESTAMP —
    * the canonical encoding ([[canonExpr]]) is derived from the
    * batch's own parquet schema, so every write path gets typed keys
    * with no declaration change (the manifest still names only the
    * column).
    *
    * `expectedPerFile <= 0` sizes each file's bloom from its EXACT row
    * count (one counting pre-pass over the batch, an O(files) map in
    * the task closures). A fixed guess cannot survive growth: at 10×
    * the file sizes a 65k-sized bloom holds 375k keys, its fpp
    * saturates toward 1, and pruning silently stops — measured exactly
    * so on the 10× scale run. Partials for the SAME file always use
    * that file's count, so the OR-merge compatibility requirement
    * (identical bit size) still holds.
    */
  def buildRows(spark: SparkSession, files: Seq[String], keyName: String,
                expectedPerFile: Long, fpp: Double): Dataset[FileBloom] = {
    require(files.nonEmpty,
      "bloom index build over zero files — callers skip empty batches")
    import spark.implicits._
    val raw = spark.read.parquet(files: _*)
    val (kExpr, isString) = canonExpr(raw.schema(keyName).dataType, keyName)
    // NULL keys never satisfy an equality probe (NULL = x is never
    // true), so they are excluded from the bloom — a file holding
    // only nulls prunes away, correctly
    val src = raw.select(input_file_name().as("file"), kExpr.as("k"))
      .filter(col("k").isNotNull)
    val sizes: Map[String, Long] =
      if (expectedPerFile > 0) Map.empty
      else src.groupBy("file").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def sizeFor(file: String): Long =
      if (expectedPerFile > 0) expectedPerFile
      else math.max(sizes.getOrElse(file, 1L), 1L)
    def merged[K](keyed: Dataset[(String, K)],
                  put: (BloomFilter, K) => Unit): Dataset[FileBloom] =
      keyed.mapPartitions { rows =>
        val acc = scala.collection.mutable.Map.empty[String, (BloomFilter, Long)]
        rows.foreach { case (file, k) =>
          val (bf, n) = acc.getOrElseUpdate(file,
            (BloomFilter.create(sizeFor(file), fpp), 0L))
          put(bf, k)
          acc(file) = (bf, n + 1)
        }
        acc.iterator.map { case (f, (bf, n)) => (f, n, serialize(bf)) }
      }
      .groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val bf = deserialize(a._3)
        bf.mergeInPlace(deserialize(b._3))
        (a._1, a._2 + b._2, serialize(bf))
      }
      .map { case (file, (_, n, bytes)) =>
        FileBloom(file, n, Base64.getEncoder.encodeToString(bytes),
          keyName)
      }
    val built =
      if (isString)
        merged[String](src.as[(String, String)], (bf, k) => bf.putString(k))
      else
        merged[Long](src.as[(String, Long)], (bf, k) => bf.putLong(k))
    // a file whose keys are ALL null contributes no partials above,
    // but must still get an index row (empty bloom = prunes on every
    // probe, correct for equality) — otherwise the probe-side
    // completeness check `total == files` fails and pruning silently
    // turns off for the whole table
    val emptyB64 = Base64.getEncoder.encodeToString(
      serialize(BloomFilter.create(1, fpp)))
    val missing = spark.createDataset(files).toDF("file")
      .join(built.toDF().select(col("file")), Seq("file"), "left_anti")
      .as[String]
      .map(f => FileBloom(f, 0L, emptyB64, keyName))
    built.union(missing)
  }

  /** Lay `df` out range-partitioned by `sortCol` (the natural archive
    * order — time, crawl sequence) and build the per-file Bloom index
    * over long-castable column `keyName`.
    *
    * `expectedPerFile <= 0` (the scale-safe default) sizes each file's
    * bloom from its exact row count; a positive value fixes the size —
    * an undershoot only inflates the false-positive rate, so pruning
    * degrades, correctness never does (blooms have no false negatives).
    */
  def write(df: DataFrame, path: String, sortCol: Column, keyName: String,
            numPartitions: Int, expectedPerFile: Long = -1L,
            fpp: Double = 0.01): Unit = {
    val spark = df.sparkSession
    df.repartitionByRange(numPartitions, sortCol)
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)
    val files = spark.read.parquet(path)
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSeq // O(files) names, metadata only
    buildRows(spark, files, keyName, expectedPerFile, fpp)
      .coalesce(1)
      .write.mode("overwrite").json(path + "_bloomidx")
  }

  /** The probe RELATION: one row `(files_total, hit_files)` where
    * membership is evaluated per index row IN EXECUTORS — each task
    * decodes its partition's blooms, tests the probe keys, and emits
    * the file name iff some key might be present. The schema of what
    * reaches the driver is `(bigint, array<string>)`: bloom bytes never
    * leave the executors, so probe-side driver memory is O(hit files)
    * however many files the index covers. Exposed (rather than inlined
    * in [[scanKeys]]) so tests can pin that schema property.
    */
  def probePlan(idx: DataFrame, keys: Seq[Long]): DataFrame =
    probePlanTyped(idx, keys.map(Left(_)))

  /** Typed probe plan: each canonical key is `Left(long)` (integral /
    * DATE-days / TIMESTAMP-micros) or `Right(string)`, matching the
    * build-side encoding ([[canonExpr]]). Longs and strings may mix
    * (an IN list after a cast); a key of the wrong physical kind for
    * the bloom simply never hits — blooms have no false negatives
    * only for keys of the kind that was put.
    */
  def probePlanTyped(idx: DataFrame,
                     keys: Seq[Either[Long, String]]): DataFrame = {
    require(keys.nonEmpty, "bloom probe needs at least one key")
    val spark = idx.sparkSession
    import spark.implicits._
    val longs = keys.collect { case Left(l) => l }.toArray
    val strs = keys.collect { case Right(s) => s }.toArray
    idx.select(col("file"), col("bloomB64")).as[(String, String)]
      .map { case (f, b64) =>
        val bf = deserialize(Base64.getDecoder.decode(b64))
        (f, longs.exists(bf.mightContainLong)
          || strs.exists(bf.mightContainString))
      }
      .toDF("file", "hit")
      // collect_list skips the nulls the `when` leaves for misses, so
      // the single collected row carries ONLY hit names plus the total
      .agg(count(lit(1)).as("files_total"),
        collect_list(when(col("hit"), col("file"))).as("hit_files"))
  }

  /** Executor-side probe over an index relation: (hitFiles, filesTotal). */
  def probeFiles(idx: DataFrame, keys: Seq[Long]): (Seq[String], Int) =
    probeFilesTyped(idx, keys.map(Left(_)))

  /** Typed twin of [[probeFiles]]. */
  def probeFilesTyped(idx: DataFrame,
                      keys: Seq[Either[Long, String]]): (Seq[String], Int) = {
    val r = probePlanTyped(idx, keys).collect().head
    (r.getAs[scala.collection.Seq[String]]("hit_files").toSeq.sorted,
      r.getAs[Long]("files_total").toInt)
  }

  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(indexSchema).json(path + "_bloomidx")

  /** Equality probe with file skipping: read only the files whose bloom
    * MIGHT contain at least one probe key, with the exact `IN` predicate
    * as the residual. Returns (relation, filesRead, filesTotal) so
    * callers can ASSERT the skipping payoff, [[ZOrderCluster.scanRange]]
    * style. Membership tests run in executors ([[probePlan]]); the
    * driver receives only the hit file names.
    */
  def scanKeys(spark: SparkSession, path: String, keyName: String,
               keys: Seq[Long]): (DataFrame, Int, Int) = {
    val (hit, total) = probeFiles(readIndex(spark, path), keys)
    val df =
      if (hit.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(hit: _*)
    (df.filter(col(keyName).isin(keys: _*)), hit.length, total)
  }

  /** Typed twin of [[scanKeys]]: probe values in their SOURCE types
    * (String / Date / Timestamp / integral) — canonicalized per
    * [[canonProbe]] for the bloom test, applied verbatim as the
    * residual `IN`.
    */
  def scanKeysTyped(spark: SparkSession, path: String, keyName: String,
                    keys: Seq[Any]): (DataFrame, Int, Int) = {
    val canon = keys.map(v => canonProbe(v).getOrElse(
      throw new IllegalArgumentException(
        s"bloom probe value $v (${v.getClass.getName}) has no " +
          "canonical bloom encoding")))
    val (hit, total) = probeFilesTyped(readIndex(spark, path), canon)
    val df =
      if (hit.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(hit: _*)
    (df.filter(col(keyName).isin(keys: _*)), hit.length, total)
  }
}
