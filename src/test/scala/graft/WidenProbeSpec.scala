package graft
class WidenProbeSpec extends SparkSpec {
  test("probe") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("wp").toString
    Seq((1, 1.5f)).toDF("a", "f").write.parquet(d + "/p1")
    Seq((10L, 10.5)).toDF("a", "f").write.parquet(d + "/p2")
    try {
      val m = spark.read.option("mergeSchema", "true")
        .parquet(d + "/p1", d + "/p2")
      info("merged schema: " + m.schema.simpleString)
      info("rows: " + m.orderBy("a").collect().mkString(","))
    } catch { case e: Throwable => info("MERGE FAILED: " + e.getMessage.take(300)) }
    // plain read (no mergeSchema) infers from one file — with an explicit widened schema?
    try {
      import org.apache.spark.sql.types._
      val w = spark.read.schema(StructType(Seq(StructField("a", LongType),
        StructField("f", DoubleType)))).parquet(d + "/p1", d + "/p2")
      info("explicit rows: " + w.orderBy("a").collect().mkString(","))
    } catch { case e: Throwable => info("EXPLICIT FAILED: " + e.getMessage.take(300)) }
  }
}
