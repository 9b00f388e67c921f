package graft

import org.apache.spark.sql.functions._
import graft.queries.TextPipeline

/** The LSH mega-bucket guard (`spark.graft.lsh.maxBucket`): a degenerate
  * bucket must stop emitting quadratic candidate pairs once capped, while
  * pairs from healthy buckets survive.
  */
class LshCapSpec extends SparkSpec {

  private def corpusDir(): String = {
    import spark.implicits._
    // docs 1-6: identical text → one size-6 bucket in every band (15 pairs)
    // docs 7-8: a near-dup pair in its own small bucket
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val near = (1 to 10).map(i => s"n$i").mkString(" ")
    val docs = (1L to 6L).map(i => (i, boiler)) ++
      Seq((7L, near), (8L, near + " extra"))
    val dir = java.nio.file.Files.createTempDirectory("lshcap").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("uncapped: degenerate bucket emits all quadratic pairs") {
    val dir = corpusDir()
    spark.conf.unset("spark.graft.lsh.maxBucket")
    val pairs = TextPipeline.minhashBands.fn(spark, dir).collect()
    assert(pairs.length == 15 + 1) // C(6,2) boilerplate + the near-dup pair
  }

  test("capped: oversize bucket drops, healthy pairs survive") {
    val dir = corpusDir()
    spark.conf.set("spark.graft.lsh.maxBucket", "5")
    try {
      val pairs = TextPipeline.minhashBands.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.toSeq == Seq((7L, 8L)),
        "only the small-bucket pair must remain under the cap")
    } finally spark.conf.unset("spark.graft.lsh.maxBucket")
  }
}
