package graft

/** Benchmark entry point. One warmup pass (JVM/codegen startup absorbed)
  * then one timed pass per query, materialized through the `noop` sink so
  * the full physical plan — including any terminal sort — executes rather
  * than being pruned by `EliminateSorts` under a bare `count()`.
  *
  * Emits ONE JSON line with per-query seconds; a failed query is recorded
  * as `-1` in `queries`, listed in `failed`, and flips the exit code to 1 —
  * failures must never masquerade as timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)

    def runOnce(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(runOnce) // warmup: absorb JVM/codegen/IO-cache startup
    val results: Seq[(String, Either[String, Double])] =
      names.map(n => n -> runOnce(n))

    val qs = results.map {
      case (k, Right(v)) => s""""$k":${"%.3f".format(v)}"""
      case (k, Left(_))  => s""""$k":-1"""
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, Left(err)) =>
      s""""$k":"${err.replaceAll("[\"\\\\\n\r\t]", " ")}""""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val nFail = results.count(_._2.isLeft)
    println(
      s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec","queries":$qs,"failed":$failed,"n_failed":$nFail,"sf":"$sfDir"}""")
    spark.stop()
    if (nFail > 0) sys.exit(1)
  }
}
