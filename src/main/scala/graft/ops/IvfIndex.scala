package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DotProductExpr.dot

/** Persistent IVF (inverted-file) ANN index over an embedding corpus —
  * the index LIFECYCLE around the q56 query path: build once, store,
  * reopen, serve many query batches.
  *
  * Layout on disk:
  *   <dir>/centroids.parquet      (cid, centroid array<double>) — tiny
  *   <dir>/corpus/cell=<cid>/...  vectors + norms, PARTITIONED BY cell
  *
  * The partition layout is the scale point: a probe of `nprobe` cells
  * compiles to partition-pruned scans (`cell IN (...)` never touches the
  * other directories), so per-query-batch I/O is nprobe/k of the corpus,
  * not a full scan — the disk-level analogue of the in-memory cell
  * filter. Training stays sample-sized on the driver (the standard IVF
  * recipe); the corpus itself is assigned map-side and never collected.
  *
  * Determinism: fixed init (first k sample vectors in vec_id order) and
  * a fixed iteration count make the codebook — and therefore the cell
  * assignment and every query answer — bit-identical across runs, which
  * is what lets IvfIndexSpec pin recall against the exact baseline.
  */
object IvfIndex {

  /** Codebook size from corpus cardinality: k ≈ √n (the standard IVF
    * sizing — cell population ≈ √n ≈ k balances probe cost against cell
    * scan cost), clamped to [16, 65536]. A FIXED k is the scale killer:
    * k=16 over a 100 TB corpus makes every probe touch nprobe/16 ≈ 25%
    * of all vectors; √n keeps the probed fraction shrinking as n grows.
    */
  def deriveK(n: Long): Int =
    math.min(65536L, math.max(16L, math.round(math.sqrt(n.toDouble)))).toInt

  /** Probe width scales with √k (so probed-corpus-fraction ≈ nprobe/k ≈
    * 1/√k also shrinks with n), floored at 8: at small k a wide probe is
    * cheap (8/16 of a tiny corpus) and keeps recall up; at the k ceiling
    * the clamp is 64/65536 ≈ 0.1% of the corpus per query.
    */
  def deriveNprobe(k: Int): Int =
    math.max(8, math.min(64, math.round(math.sqrt(k.toDouble)).toInt))

  /** Deterministic sample-trained k-means codebook (shared with q56).
    * `k` is clamped to the sample size: a tiny corpus yields fewer cells
    * rather than an out-of-bounds centroid table.
    */
  def trainCodebook(sample: Array[Array[Double]], k0: Int,
                    iters: Int): Array[(Long, Array[Double])] = {
    require(sample.nonEmpty, "IVF codebook training needs a non-empty sample")
    val k = math.min(k0, sample.length)
    val dim = sample.head.length
    var cents = sample.take(k).map(_.clone)
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bd = Double.MaxValue
        var j = 0
        while (j < cents.length) {
          var dist = 0.0; var i = 0
          while (i < dim) { val t = v(i) - cents(j)(i); dist += t * t; i += 1 }
          if (dist < bd) { bd = dist; best = j }
          j += 1
        }
        counts(best) += 1
        val su = sums(best); var i = 0
        while (i < dim) { su(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k)(j =>
        if (counts(j) == 0) cents(j) else sums(j).map(_ / counts(j)))
    }
    cents.zipWithIndex.map { case (c, j) => (j.toLong, c) }
  }

  /** The `nprobe` nearest cells of `emb`, as an array of structs sorted
    * by L2 distance (constant-folded centroid literals; ||c||² is
    * precomputed, the per-row work is one dot product per centroid).
    */
  def nearestCells(emb: Column, centroids: Array[(Long, Array[Double])],
                   nprobe: Int): Column = {
    val cells = centroids.map { case (cid, c) =>
      val c2 = c.map(x => x * x).sum
      struct((dot(emb, typedLit(c.toSeq)) * -2 + c2).as("d"),
        lit(cid).as("cid"))
    }
    slice(array_sort(array(cells: _*)), 1, nprobe)
  }

  /** Train on a sampled subset and write the index. `corpus` must carry
    * (vec_id long, emb array<double>); `samplePredicate` thins the
    * candidate pool and `maxSample` caps what actually reaches the
    * driver — the collect is bounded by a CONSTANT independent of corpus
    * size (a fraction alone would still be driver-OOM at 100 TB). The
    * cap keeps determinism: candidates are ordered by vec_id and the
    * limit takes the first `maxSample` of that order.
    */
  def build(spark: SparkSession, corpus: DataFrame, dir: String, k: Int = 0,
            iters: Int = 8,
            samplePredicate: Column = col("vec_id") % 7 === 0,
            maxSample: Int = 100000): Unit = {
    import spark.implicits._
    val sample = corpus.filter(samplePredicate).orderBy(col("vec_id"))
      .limit(maxSample)
      .select(col("emb")).as[Seq[Double]].collect().map(_.toArray)
    // k=0 (default) derives the codebook size from corpus cardinality —
    // count(*) over parquet is footer-metadata-only, not a data scan
    val kEff = if (k > 0) k else deriveK(corpus.count())
    val centroids = trainCodebook(sample, kEff, iters)
    centroids.toSeq.map { case (cid, c) => (cid, c.toSeq) }
      .toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    corpus
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
      .withColumn("cell",
        nearestCells(col("emb"), centroids, 1)(0).getField("cid"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/corpus")
  }

  // ------------------------------------------------ version lineage

  /** Build the index FROM a [[SnapshotTable]] version's scan and pin
    * its lineage: the index lives under `<tablePath>/ivfidx/v<N>` with
    * a lineage record naming the exact (table, version) it serves —
    * the piece a bare side-directory index lacks, where any MERGE or
    * delete silently stales it. One index per version; versions share
    * nothing (an index is derived data — rebuild cost, not a
    * correctness coupling). [[SnapshotTable.vacuum]] walks only the
    * data/DV roots, so index dirs survive GC; indexes of
    * [[SnapshotTable.expire]]d versions are the caller's to drop.
    */
  def buildAt(spark: SparkSession, tablePath: String, version: Long,
              idCol: String = "vec_id", embCol: String = "emb",
              k: Int = 0, iters: Int = 8): String = {
    val (scan, _, _) = SnapshotTable.scanAt(spark, tablePath, version)
    val dir = s"$tablePath/ivfidx/v$version"
    build(spark, scan.select(col(idCol).as("vec_id"),
      col(embCol).as("emb")), dir, k = k, iters = iters)
    TableIo.forPath(tablePath).write(s"$dir/lineage.json", graft.Json.obj(
      Seq("table" -> graft.Json.quote(tablePath),
        "version" -> version.toString)))
    dir
  }

  /** Open the index serving EXACTLY `version` of the table — a probe
    * must never silently answer from another version's index (a v1
    * probe against a post-delete index would hide rows v1 still has;
    * the reverse would resurrect deleted ones). Missing or foreign
    * lineage fails loudly.
    */
  def openAt(spark: SparkSession, tablePath: String,
             version: Long): Opened = {
    val dir = s"$tablePath/ivfidx/v$version"
    val tio = TableIo.forPath(tablePath)
    require(tio.exists(s"$dir/lineage.json"),
      s"no IVF index built at $tablePath v$version — buildAt(...) " +
        "first; a probe never silently serves another version's index")
    val lin = tio.readString(s"$dir/lineage.json")
    val v = "\"version\":\\s*(\\d+)".r.findFirstMatchIn(lin)
      .map(_.group(1).toLong)
    require(v.contains(version),
      s"index lineage at $dir claims version $v, probe wants $version")
    open(spark, dir)
  }

  final case class Opened(centroids: Array[(Long, Array[Double])],
                          corpus: DataFrame)

  def open(spark: SparkSession, dir: String): Opened = {
    import spark.implicits._
    require(Files.exists(Paths.get(dir, "centroids.parquet")),
      s"no IVF index at $dir")
    val centroids = spark.read.parquet(s"$dir/centroids.parquet")
      .as[(Long, Seq[Double])].collect()
      .sortBy(_._1).map { case (cid, c) => (cid, c.toArray) }
    Opened(centroids, spark.read.parquet(s"$dir/corpus"))
  }

  /** Top-`topk` cosine neighbors for each query vector, probing
    * `nprobe` cells. The query side is broadcast (a query batch is small
    * by construction); the corpus scan is partition-pruned to the probed
    * cells.
    */
  def query(index: Opened, queries: DataFrame, nprobe: Int,
            topk: Int): DataFrame = {
    val q = queries
      .select(col("vec_id").as("q_id"), col("emb").as("qe"))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
      .withColumn("probe_cell",
        explode(transform(nearestCells(col("qe"), index.centroids, nprobe),
          _.getField("cid"))))
    val probedCells = q.select(col("probe_cell")).distinct()
      .collect().map(_.getLong(0))
    val pairs = index.corpus
      // literal IN list => partition pruning on the cell directories
      .filter(col("cell").isin(probedCells: _*))
      .join(broadcast(q),
        col("cell") === col("probe_cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qe"), col("emb")) / (col("qn") * col("nrm"))).as("cos"))
    val rn = row_number().over(
      Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id")))
    pairs.withColumn("rank", rn).filter(col("rank") <= topk)
      .select(col("q_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }
}
