package graft

import org.apache.spark.sql.functions._
import graft.ops.IvfIndex

/** The persisted IVF lifecycle: build → reopen → query must (a) prune
  * the corpus scan to the probed cell partitions, (b) reach the same
  * recall the inline q56 path reaches against the exact baseline, and
  * (c) be deterministic across a rebuild.
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val corpus = Tables.embeddings(spark, sf)
    .select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("emb"))

  private lazy val dir: String = {
    val d = Work.stableDir("ivftest").toString
    IvfIndex.build(spark, corpus, d, k = 16)
    d
  }

  test("probing reads only the probed cell partitions") {
    val idx = IvfIndex.open(spark, dir)
    val queries = corpus.filter(col("vec_id") % 100 === 0)
    val res = IvfIndex.query(idx, queries, nprobe = 4, topk = 3)
    val scan = res.queryExecution.executedPlan.toString
      .linesIterator.find(l => l.contains("FileScan") && l.contains("corpus"))
      .getOrElse(fail("no corpus scan in plan"))
    assert(scan.contains("PartitionFilters") && scan.contains("cell#"),
      s"corpus scan is not partition-pruned: $scan")
    assert(res.count() > 0)
  }

  test("recall@3 of the persisted index matches the inline path") {
    val idx = IvfIndex.open(spark, dir)
    val queries = corpus.filter(col("vec_id") % 100 === 0)
    val approx = IvfIndex.query(idx, queries, nprobe = 4, topk = 3)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet

    // exact top-3 via brute force over the same corpus
    val e = corpus.withColumn("nrm",
      sqrt(graft.functions.DotProductExpr.dot($"emb", $"emb")))
    val q = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"emb".as("qe"), $"nrm".as("qn"))
    val pairs = e.crossJoin(broadcast(q)).filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        (graft.functions.DotProductExpr.dot($"qe", $"emb") / ($"qn" * $"nrm"))
          .as("cos"))
    val rn = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"cos".desc, $"neighbor_id")
    val exact = pairs
      .withColumn("rank", row_number().over(rn)).filter($"rank" <= 3)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet

    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@3 = $recall")
  }

  test("training collect is capped: maxSample bounds the driver-side " +
    "sample independent of corpus size") {
    // a cap below k is the observable proof: the codebook can only hold
    // as many centroids as collected vectors, so a 10-vector cap with
    // k=16 must yield ≤10 cells (k clamps; no out-of-bounds centroids)
    val d = Work.stableDir("ivfcap").toString
    IvfIndex.build(spark, corpus, d, k = 16, maxSample = 10)
    val idx = IvfIndex.open(spark, d)
    assert(idx.centroids.length <= 10,
      s"cap ignored: ${idx.centroids.length} centroids from a 10-row sample")
    assert(idx.centroids.nonEmpty)
    // the capped index still answers queries
    val res = IvfIndex.query(idx, corpus.limit(3), nprobe = 2, topk = 2)
    assert(res.count() > 0)
  }

  test("codebook size derives from corpus cardinality: k ≈ √n in " +
    "[16, 65536], nprobe ≈ √k in [4, 64]") {
    assert(IvfIndex.deriveK(100) === 16)           // floor clamp
    assert(IvfIndex.deriveK(1000000) === 1000)     // √n in range
    assert(IvfIndex.deriveK(10000000000000L) === 65536) // ceiling clamp
    assert(IvfIndex.deriveNprobe(16) === 8)        // floor clamp
    assert(IvfIndex.deriveNprobe(1024) === 32)
    assert(IvfIndex.deriveNprobe(65536) === 64)    // ceiling clamp
    // the probed corpus fraction must SHRINK as n grows
    val f1 = IvfIndex.deriveNprobe(IvfIndex.deriveK(10000)).toDouble /
      IvfIndex.deriveK(10000)
    val f2 = IvfIndex.deriveNprobe(IvfIndex.deriveK(100000000)).toDouble /
      IvfIndex.deriveK(100000000)
    assert(f2 < f1, s"probe fraction did not shrink: $f1 -> $f2")
    // build with the default k=0 derives from the corpus
    val d = Work.stableDir("ivfderive").toString
    IvfIndex.build(spark, corpus, d)
    val idx = IvfIndex.open(spark, d)
    val expected = math.min(IvfIndex.deriveK(corpus.count()),
      corpus.filter(col("vec_id") % 7 === 0).count().toInt) // sample clamp
    assert(idx.centroids.length === expected)
  }

  test("codebook k clamps to the sample size (tiny-corpus safety)") {
    val sample = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 1.0))
    val cents = IvfIndex.trainCodebook(sample, k0 = 16, iters = 2)
    assert(cents.length === 3)
    intercept[IllegalArgumentException] {
      IvfIndex.trainCodebook(Array.empty, k0 = 4, iters = 1)
    }
  }

  test("rebuild is bit-deterministic") {
    val d2 = Work.stableDir("ivftest2").toString
    IvfIndex.build(spark, corpus, d2, k = 16)
    val a = IvfIndex.open(spark, dir)
    val b = IvfIndex.open(spark, d2)
    assert(a.centroids.map(_._2.toSeq).toSeq === b.centroids.map(_._2.toSeq).toSeq)
    val ca = a.corpus.select("vec_id", "cell").as[(Long, Long)].collect().toSet
    val cb = b.corpus.select("vec_id", "cell").as[(Long, Long)].collect().toSet
    assert(ca === cb)
  }
}
