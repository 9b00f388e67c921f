package graft

import org.apache.spark.sql.functions._

/** Scale-curve probe for q172's SemDeDup shape (dev harness, not part
  * of the gated surface). q172 pins k=4 so the DuckDB oracle can
  * replay the clustering exactly; at 10× the corpus that fixed k makes
  * every cluster 10× larger and the within-cluster pair join 100× —
  * the quadratic the operator's doc says you must counter by RAISING k
  * with corpus size (keep |cluster| roughly constant, so Σ|cluster|²
  * grows linearly with n). This main measures exactly that discipline:
  * seed k centers deterministically from the corpus, run one k-means
  * refinement, then the τ-thresholded within-cluster pair join and the
  * survivor aggregate — the same plan as q172 with k as a parameter.
  * Run it at (sf0.1, k=4) and (10×, k=40) and compare: linear-ish
  * total, NOT the 100× a fixed k would cost.
  *
  * Usage: graft.SemDedupProbe <sfDir> <k>
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = args(1).toInt
    val tau = 1300000L
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def once(): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val qv = Tables.embeddings(spark, dir).select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000).cast("long")).as("v"))
      // deterministic seeds: the k smallest md5-ranked ids — content
      // addressed, no RNG, works at any corpus size
      val seeds = qv.select(col("vec_id"),
          md5(col("vec_id").cast("string")).as("r"))
        .orderBy("r").limit(k).select("vec_id")
      val c0 = qv.join(broadcast(seeds), "vec_id")
        .select(col("vec_id").as("cid"), col("v").as("c"))
      def dist2 = aggregate(
        zip_with(col("v"), col("c"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
      def assign(centers: DataFrame0) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("dist"), col("cid"))
        qv.crossJoin(broadcast(centers))
          .select(col("vec_id"), col("cid"), col("v"), dist2.as("dist"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
      }
      val a1 = assign(c0)
      val c1 = a1.select(col("cid"),
          posexplode(col("v")).as(Seq("i", "comp")))
        .groupBy(col("cid"), col("i"))
        .agg(sum("comp").as("sm"), count(lit(1)).as("m"))
        .withColumn("cv", expr("sm div m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("i"), col("cv"))))
          .as("pairs"))
        .select(col("cid"),
          transform(col("pairs"), p => p.getField("cv")).as("c"))
      val m = assign(c1).select("cid", "vec_id", "v")
      val pd2 = aggregate(
        zip_with(col("a.v"), col("b.v"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x)
      val dups = m.as("a").join(m.as("b"),
          col("a.cid") === col("b.cid") &&
            col("b.vec_id") < col("a.vec_id"))
        .select(col("a.cid").as("cid"), col("a.vec_id").as("i"),
          pd2.as("d2"))
        .filter(col("d2") <= tau)
        .select("cid", "i").distinct()
      val r = m.join(dups,
          m("cid") === dups("cid") && m("vec_id") === dups("i"), "left")
        .agg(count(lit(1)).as("n"), count(dups("i")).as("n_dup"))
        .head()
      ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getLong(1))
    }
    once() // warmup
    val (sec, n, nDup) = once()
    println(s"""{"probe":"semdedup","k":$k,"n":$n,"n_dup":$nDup,""" +
      s""""sec":${f"$sec%.3f"}}""")
    spark.stop()
  }

  private type DataFrame0 = org.apache.spark.sql.DataFrame
}
