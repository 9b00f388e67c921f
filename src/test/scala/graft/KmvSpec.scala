package graft

import graft.functions.{KmvDistinctExpr, KmvState}
import org.apache.spark.unsafe.types.UTF8String

/** KMV distinct sketch: exactness below k, estimator accuracy and
  * merge-shape independence above k, serialization, SQL surface.
  * (The cross-engine digit-level estimator parity is q112's oracle.)
  */
class KmvSpec extends SparkSpec {

  private def h(s: String): Long = KmvState.hash60(UTF8String.fromString(s))

  test("hash60 is the first 15 hex digits of md5, read base-16") {
    // md5("42") = a1d0c6e83f027327d8461063f4ac58a6 →
    // first 15 hex digits a1d0c6e83f02732
    assert(h("42") === java.lang.Long.parseLong("a1d0c6e83f02732", 16))
    // 60 bits → never negative, whatever the digest's high bit
    for (i <- 0 until 1000) assert(h(s"key$i") >= 0)
  }

  test("below k the sketch is exact; at k it transitions to estimating") {
    val st = new KmvState(64)
    for (i <- 0 until 63; _ <- 0 until 3) st.add(h(s"v$i")) // dups ignored
    assert(st.estimate === ((63L, -1L)))
    for (i <- 0 until 64) st.add(h(s"v$i"))
    val (est, kth) = st.estimate
    assert(kth >= 0)
    assert(est >= 40 && est <= 100, s"est $est for 64 distinct")
  }

  test("estimator accuracy: within ~4/sqrt(k) relative error at 20k keys") {
    val k = 256
    val st = new KmvState(k)
    val n = 20000
    for (i <- 0 until n) st.add(h(s"user-$i"))
    val (est, _) = st.estimate
    val rel = math.abs(est - n).toDouble / n
    assert(rel < 4.0 / math.sqrt(k), s"est $est vs $n (rel $rel)")
  }

  test("merge shape does not change the result (pure function of the set)") {
    val keys = (0 until 5000).map(i => h(s"doc:$i"))
    val one = new KmvState(128)
    keys.foreach(one.add)
    // 7 partials, round-robin, merged pairwise then into one
    val parts = Array.fill(7)(new KmvState(128))
    keys.zipWithIndex.foreach { case (x, i) => parts(i % 7).add(x) }
    val merged = new KmvState(128)
    parts.foreach(merged.mergeIn)
    assert(merged.estimate === one.estimate)
    assert(merged.set === one.set)
  }

  test("serialization round-trips the bounded state") {
    val st = new KmvState(32)
    for (i <- 0 until 1000) st.add(h(s"x$i"))
    val back = KmvState.deserialize(st.serialize())
    assert(back.k === 32 && back.set === st.set)
    assert(back.estimate === st.estimate)
  }

  test("kmvMins exposes the ascending k minima; union-from-sketches " +
    "equals the sketch of the union (composability)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val aKeys = (0 until 3000).map(i => s"a$i")
    val bKeys = (1500 until 4500).map(i => s"a$i") // half-overlapping
    val dfA = aKeys.toDF("s"); val dfB = bKeys.toDF("s")
    def mins(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(KmvDistinctExpr.kmvMins($"s", 128).as("m"))
        .head().getSeq[Long](0)
    val ma = mins(dfA); val mb = mins(dfB)
    assert(ma.length === 128 && ma === ma.sorted)
    // k minima of A ∪ B from the two sketches = sketch of A ∪ B
    val direct = mins(dfA.union(dfB))
    val combined = (ma ++ mb).distinct.sorted.take(128)
    assert(combined === direct)
    // intersection ratio recovers the true overlap within KMV error
    val matches = combined.count(h => ma.contains(h) && mb.contains(h))
    val estU = (BigInt(127) << 60) / BigInt(combined.last)
    val estI = matches * estU / 128
    assert((estI.toDouble - 1500).abs / 1500 < 0.5,
      s"est intersection $estI vs 1500")
  }

  test("SQL surface graft_kmv_distinct agrees with the Column API and " +
    "rejects non-literal k") {
    import spark.implicits._
    val df = (1 to 3000).map(i => s"k${i % 700}").toDF("s")
    df.createOrReplaceTempView("graft_kmv_in")
    val viaSql = spark.sql(
      "SELECT graft_kmv_distinct(s, 64).est AS e FROM graft_kmv_in")
      .head().getLong(0)
    val viaCol = df.agg(
      KmvDistinctExpr.kmvDistinct($"s", 64).getField("est").as("e"))
      .head().getLong(0)
    assert(viaSql === viaCol)
    assert(math.abs(viaSql - 700).toDouble / 700 < 4.0 / math.sqrt(64))
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_kmv_distinct(s, CAST(rand()*10 AS INT)) " +
        "FROM graft_kmv_in").collect()
    }
    assert(ex.getMessage.contains("literal"))
  }
}
