package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.Base64

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Like the curve-key manifests, the index is derived by re-scanning
  * the written files (`input_file_name`), recording what a reader will
  * actually observe, whatever the committer renamed.
  */
object BloomIndex {

  final case class FileBloom(file: String, n: Long, bloomB64: String)

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  private def deserialize(b: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(b))

  /** Lay `df` out range-partitioned by `sortCol` (the natural archive
    * order — time, crawl sequence) and build the per-file Bloom index
    * over long-castable column `keyName`.
    *
    * `expectedPerFile` sizes every bloom identically (a requirement for
    * the OR-merge); an undershoot only inflates the false-positive rate
    * — pruning degrades, correctness never does.
    */
  def write(df: DataFrame, path: String, sortCol: Column, keyName: String,
            numPartitions: Int, expectedPerFile: Long,
            fpp: Double = 0.01): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    df.repartitionByRange(numPartitions, sortCol)
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)
    val partials = spark.read.parquet(path)
      .select(input_file_name().as("file"),
        col(keyName).cast("long").as("k"))
      .as[(String, Long)]
      .mapPartitions { rows =>
        val acc = scala.collection.mutable.Map.empty[String, (BloomFilter, Long)]
        rows.foreach { case (file, k) =>
          val (bf, n) = acc.getOrElseUpdate(file,
            (BloomFilter.create(expectedPerFile, fpp), 0L))
          bf.putLong(k)
          acc(file) = (bf, n + 1)
        }
        acc.iterator.map { case (f, (bf, n)) => (f, n, serialize(bf)) }
      }
    partials
      .groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val bf = deserialize(a._3)
        bf.mergeInPlace(deserialize(b._3))
        (a._1, a._2 + b._2, serialize(bf))
      }
      .map { case (file, (_, n, bytes)) =>
        FileBloom(file, n, Base64.getEncoder.encodeToString(bytes))
      }
      .coalesce(1)
      .write.mode("overwrite").json(path + "_bloomidx")
  }

  def readIndex(spark: SparkSession, path: String): Seq[FileBloom] =
    spark.read.json(path + "_bloomidx").collect().map { r =>
      FileBloom(r.getAs[String]("file"), r.getAs[Long]("n"),
        r.getAs[String]("bloomB64"))
    }.toSeq

  /** Equality probe with file skipping: read only the files whose bloom
    * MIGHT contain at least one probe key, with the exact `IN` predicate
    * as the residual. Returns (relation, filesRead, filesTotal) so
    * callers can ASSERT the skipping payoff, [[ZOrderCluster.scanRange]]
    * style.
    */
  def scanKeys(spark: SparkSession, path: String, keyName: String,
               keys: Seq[Long]): (DataFrame, Int, Int) = {
    require(keys.nonEmpty, "bloom probe needs at least one key")
    val index = readIndex(spark, path)
    val hit = index.filter { fb =>
      val bf = deserialize(Base64.getDecoder.decode(fb.bloomB64))
      keys.exists(bf.mightContainLong)
    }
    val df =
      if (hit.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(hit.map(_.file): _*)
    (df.filter(col(keyName).isin(keys: _*)), hit.length, index.length)
  }
}
