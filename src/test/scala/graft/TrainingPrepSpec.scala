package graft

import org.apache.spark.sql.functions._
import graft.queries.TrainingPrep

/** Semantics of the training-data-prep operators (q69–q72) pinned on the
  * sf0.001 testdata plus hand-built frames where invariants are easier to
  * state exactly.
  */
class TrainingPrepSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("decontamination: benchmark docs excluded, flags iff shared 5-gram") {
    val out = TrainingPrep.decontaminate.fn(spark, sf).cache()
    // benchmark docs (doc_id % 50 == 0) never appear in the manifest
    assert(out.filter(col("doc_id") % 50 === 0).count() == 0)
    // contaminated <=> n_matched > 0, with both outcomes present
    assert(out.filter(col("contaminated") =!= (col("n_matched") > 0)).count() == 0)
    val rows = out.count()
    val hits = out.filter(col("contaminated")).count()
    assert(rows > 0 && hits > 0 && hits < rows)
  }

  test("repetition: a repeated-token doc trips the Gopher thresholds") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"), // dup ratio 7/8
      (2L, "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("trainprep").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TrainingPrep.repetition.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(3), "all-spam doc must flag repetitive")
    assert(!out(2L).getBoolean(3), "all-distinct doc must pass")
    assert(out(2L).getDouble(1) == 0.0) // dup_token_ratio
  }

  test("stratified sample: kept counts within the hash-bucket bound") {
    val out = TrainingPrep.stratifiedSample.fn(spark, sf).collect()
    assert(out.length > 0)
    out.foreach { r =>
      val (rate, n, kept) = (r.getInt(1), r.getLong(2), r.getLong(3))
      assert(kept <= n)
      // deterministic hash: rate 0 would keep nothing; all rates here >0
      assert(rate >= 10 && rate <= 55)
    }
    // determinism: a second run yields the identical manifest
    val again = TrainingPrep.stratifiedSample.fn(spark, sf).collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("dup-cluster gate: one entry point survives adversarial graphs") {
    import spark.implicits._
    // the dedup gate clusters near-dup PAIRS; callers must not need to
    // know the graph shape in advance. Shallow star (the common case):
    // budgeted propagation handles it…
    val shallow = Seq((1L, 7L), (1L, 9L), (40L, 41L)).toDF("src", "dst")
    val (sDf, sAlgo) = graft.ops.ConnectedComponents.componentsChosen(shallow)
    assert(sAlgo === "propagation")
    assert(sDf.as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 7L -> 1L, 9L -> 1L, 40L -> 40L, 41L -> 40L))
    // …while a transitive near-dup CHAIN (A~B~C~…, each link barely over
    // threshold — the adversarial shape for propagation) silently falls
    // back to the O(log n) star contraction, same output contract
    val chain = (0L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    val (cDf, cAlgo) = graft.ops.ConnectedComponents.componentsChosen(chain)
    assert(cAlgo === "star")
    assert(cDf.as[(Long, Long)].collect().toMap ===
      (0L to 64L).map(_ -> 0L).toMap)
  }

  test("corpus assembly: every disposition branch fires on a crafted corpus") {
    import spark.implicits._
    // doc 0 is the benchmark (doc_id % 50 == 0). Hash buckets (md5 of the
    // id string, first 6 hex digits % 100): doc 2 → 94, doc 4 → 6, so with
    // src9's 55% rate doc 2 samples out and doc 4 survives every rate.
    val distinct20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lam mu nu xi omicron pi rho sigma tau upsilon"), // benchmark
      (1L, "tiny doc"), // short
      (4L, distinct20), // survivor of the 4/54 dup pair; bucket 6 → kept
      (54L, distinct20), // duplicate (same text, larger id)
      (6L, "alpha beta gamma delta epsilon " +
        (1 to 15).map(i => s"x$i").mkString(" ")), // shares a bench 5-gram
      (7L, Seq.fill(25)("spam").mkString(" ")), // repetitive
      (2L, (1 to 20).map(i => s"y$i").mkString(" ")) // bucket 94 → sampled_out
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("corpusasm").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("src9"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TrainingPrep.corpusAssembly.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(!out.contains(0L), "benchmark doc excluded from the manifest")
    assert(out(1L) == "short")
    assert(out(54L) == "duplicate")
    assert(out(6L) == "contaminated")
    assert(out(7L) == "repetitive")
    assert(out(2L) == "sampled_out")
    assert(out(4L) == "kept")
  }

  test("sequence packing: offsets consistent within each shard") {
    val rows = TrainingPrep.sequencePacking.fn(spark, sf)
      .orderBy("shard", "doc_id").collect()
    assert(rows.nonEmpty)
    // per shard: cumulative offsets reconstruct from n_tok in doc_id order
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      var cum = 0L
      rs.foreach { r =>
        val nTok = r.getLong(2)
        assert(r.getLong(3) == cum / 2048, "first_seq")
        assert(r.getLong(4) == (cum + nTok - 1) / 2048, "last_seq")
        assert(r.getLong(5) == cum % 2048, "seq_offset")
        cum += nTok
      }
    }
  }

  test("span dedup: identical docs are fully covered, unique docs clean") {
    import spark.implicits._
    // two byte-identical 12-token docs, one unique doc, one doc that
    // repeats its own leading 8-gram internally (self-duplication counts)
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val self = ((1 to 8) ++ (1 to 8)).map(i => s"s$i").mkString(" ")
    val docs = Seq((0L, a), (1L, a), (2L, "unique " + (1 to 11).mkString(" u")),
      (3L, self)).toDF("doc_id", "text")
    val out = TrainingPrep.spanDedup.fn(spark, sf)
    // invariant on real data: 0 <= n_dup_tokens <= n_tokens, keep consistent
    assert(out.filter(col("n_dup_tokens") > col("n_tokens")).count() == 0)
    assert(out.filter(col("keep") =!= (col("dup_fraction") <= 0.5)).count() == 0)
    val byDoc = TrainingPrep.spanDedupOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(byDoc(0L) == ((12L, 12L, false)), "dup twin fully covered")
    assert(byDoc(1L) == ((12L, 12L, false)))
    assert(byDoc(2L)._2 == 0L && byDoc(2L)._3, "unique doc untouched")
    assert(byDoc(3L) == ((16L, 16L, false)), "self-repeating doc fully covered")
  }

  test("PII scrub: injected emails/IPs are counted and redacted") {
    val sf = "/root/testdata/sf0.001"
    val out = TrainingPrep.piiScrub.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 0: divisible by 3 AND 4 — two emails, two IPs; doc 3: emails
    // only; doc 4: IPs only; doc 1: clean
    assert(out(0L) == ((2L, 2L)))
    assert(out(3L) == ((2L, 0L)))
    assert(out(4L) == ((0L, 2L)))
    assert(out(1L) == ((0L, 0L)))
    // redaction removes every match: re-scrubbing a scrubbed text finds 0
    val scrubbed = TrainingPrep.piiScrub.fn(spark, sf)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("n_emails"))).collect()(0).getLong(0)
    assert(scrubbed > 0, "fixture must inject at least one email")
  }
}
