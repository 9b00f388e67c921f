package graft

import org.scalatest.funsuite.AnyFunSuite

/** A8 — the bench regression tracker. Rounds 5/6 shipped a tracker whose
  * regex only matched the PLAIN `"qNN":<num>` form, while the committed
  * BENCH_r*.json wrappers hold the bench line JSON-escaped inside a
  * "tail" string (`\"qNN\":`), so `prevTimes` was always empty and
  * BENCH_r06 printed `"slower":{}` over a 1.90× q47 regression. These
  * tests pin the escaped form, the canary normalization, and the gate.
  */
class BenchTrackerSpec extends AnyFunSuite {

  private val escapedWrapper =
    """{"n":6,"rc":0,"tail":"...ars\":0.1,\"q47_preprocess_e2e\":4.046,""" +
      """\"q48_ingest_dry_run\":3.187,\"q49_image\":0.5},\"failed\":{},""" +
      """\"cpu_cal_ms\":99.900,\"sf\":\"/root/testdata/sf0.1\"}\n"}"""

  test("parsePrevTimes recovers pairs from the ESCAPED wrapper form") {
    val t = Bench.parsePrevTimes(escapedWrapper)
    assert(t("q47_preprocess_e2e") === 4.046)
    assert(t("q48_ingest_dry_run") === 3.187)
    assert(Bench.parsePrevCal(escapedWrapper) === Some(99.9))
  }

  test("parsePrevTimes still reads the plain one-line form") {
    val plain = """{"queries":{"q01_x":0.41,"q47_preprocess_e2e":4.05},""" +
      """"cpu_cal_ms":125.417}"""
    val t = Bench.parsePrevTimes(plain)
    assert(t === Map("q01_x" -> 0.41, "q47_preprocess_e2e" -> 4.05))
    assert(Bench.parsePrevCal(plain) === Some(125.417))
  }

  test("the committed round-6 artifact itself parses non-vacuously") {
    // The exact input the round-5/6 tracker silently failed on.
    val f = new java.io.File("BENCH_r06.json")
    assume(f.isFile, "BENCH_r06.json not present in cwd")
    val t = Bench.parsePrevTimes(java.nio.file.Files.readString(f.toPath))
    assert(t.size > 50, s"only ${t.size} pairs recovered")
    assert(t("q47_preprocess_e2e") > 7.0) // 7.677 in r6
    assert(Bench.parsePrevCal(
      java.nio.file.Files.readString(f.toPath)).exists(_ > 100))
  }

  test("a ≥1.25× slowdown is flagged; sub-gate and tiny queries are not") {
    val results: Seq[(String, Either[String, Double])] = Seq(
      "q47_preprocess_e2e" -> Right(7.68), // 1.90× — must flag
      "q48_ingest_dry_run" -> Right(3.50), // 1.10× — below gate
      "q49_image" -> Right(5.0))           // prev 0.5 < ... 10× but prev ok
    val out = Bench.regressionsJson(results, "BENCH_r05.json",
      escapedWrapper, calNow = 99.9)
    assert(out.contains(""""vs":"BENCH_r05.json""""))
    assert(out.contains(""""matched":3"""))
    assert(out.contains("q47_preprocess_e2e") && out.contains(""""ratio":1.898"""))
    assert(!out.contains("q48_ingest_dry_run"))
    assert(out.contains("q49_image")) // prev 0.5 ≥ 0.2 and 10× — flags
  }

  test("canary normalization suppresses host-tide-only slowdowns") {
    val results: Seq[(String, Either[String, Double])] =
      Seq("q47_preprocess_e2e" -> Right(6.0)) // raw 1.48×
    // host now 2× slower than prev run: normalized 0.74× — not a regression
    val slowHost = Bench.regressionsJson(results, "p", escapedWrapper,
      calNow = 199.8)
    assert(!slowHost.contains("q47_preprocess_e2e"))
    // same host speed: 1.48× both ways — flags
    val sameHost = Bench.regressionsJson(results, "p", escapedWrapper,
      calNow = 99.9)
    assert(sameHost.contains("q47_preprocess_e2e"))
  }

  test("pretty-printed baselines (space after the colon) still parse — " +
    "the r9 repaired artifact's form") {
    val pretty = """{"queries": {"q01_band_stats": 0.349, "q02": 1.5},
      | "cpu_cal_ms": 108.244, "cpu_cal_mt_ms": 250.0}""".stripMargin
    val t = Bench.parsePrevTimes(pretty)
    assert(t === Map("q01_band_stats" -> 0.349, "q02" -> 1.5))
    assert(Bench.parsePrevCal(pretty) === Some(108.244))
    assert(Bench.parsePrevCalMt(pretty) === Some(250.0))
  }

  test("multi-core canary normalization wins over single-thread when " +
    "both artifacts carry it") {
    val prev = """{"queries":{"q47":4.0},"cpu_cal_ms":100.0,""" +
      """"cpu_cal_mt_ms":200.0}"""
    val results: Seq[(String, Either[String, Double])] =
      Seq("q47" -> Right(6.0)) // raw 1.5×
    // single-thread canary flat, but MT canary shows the host 1.5×
    // contended: normalized 1.0× — suppressed
    val tide = Bench.regressionsJson(results, "p", prev,
      calNow = 100.0, calMtNow = 300.0)
    assert(!tide.contains("q47"))
    // MT canary flat too: real regression — flags
    val real = Bench.regressionsJson(results, "p", prev,
      calNow = 100.0, calMtNow = 200.0)
    assert(real.contains("q47"))
    // prev artifact without cpu_cal_mt_ms falls back to single-thread
    val old = """{"queries":{"q47":4.0},"cpu_cal_ms":100.0}"""
    val fb = Bench.regressionsJson(results, "p", old,
      calNow = 150.0, calMtNow = 300.0)
    assert(!fb.contains("q47")) // 1.5× ÷ 1.5 single-thread tide
  }

  test("failed (-1) prev entries never count as a baseline") {
    val prev = """{"queries":{"q47_preprocess_e2e":-1}}"""
    val out = Bench.regressionsJson(
      Seq("q47_preprocess_e2e" -> Right(10.0)), "p", prev, 100.0)
    assert(!out.contains(""""prev":-1"""))
    assert(out.contains(""""matched":1"""))
  }

  test("baseline guard refuses a shrinking overwrite unless --rebaseline") {
    val full = """{"queries":{"q01_a":1.0,"q02_b":2.0,"q03_c":3.0}}"""
    // partial dev run (1 of 3 queries): refused with a reason
    val refused = Bench.baselineWriteDecision(Some(full), Set("q01_a"),
      rebaseline = false)
    assert(refused.isLeft)
    assert(refused.swap.toOption.get.contains("--rebaseline"))
    // same or larger coverage: allowed
    assert(Bench.baselineWriteDecision(Some(full),
      Set("q01_a", "q02_b", "q03_c"), rebaseline = false).isRight)
    assert(Bench.baselineWriteDecision(Some(full),
      Set("q01_a", "q02_b", "q03_c", "q04_d"), rebaseline = false).isRight)
    // no existing file: allowed (first write)
    assert(Bench.baselineWriteDecision(None, Set("q01_a"),
      rebaseline = false).isRight)
    // explicit override: allowed
    assert(Bench.baselineWriteDecision(Some(full), Set("q01_a"),
      rebaseline = true).isRight)
  }

  test("baseline guard refuses a cross-SF overwrite unless --rebaseline") {
    val full = """{"queries":{"q01_a":1.0},"sf":"/root/testdata/sf0.1"}"""
    val keys = Set("q01_a")
    // same sf: allowed
    assert(Bench.baselineWriteDecision(Some(full), keys,
      rebaseline = false, newSf = "/root/testdata/sf0.1").isRight)
    // different sf (the dev loop at sf0.001): refused with a reason
    val refused = Bench.baselineWriteDecision(Some(full), keys,
      rebaseline = false, newSf = "/root/testdata/sf0.001")
    assert(refused.isLeft)
    assert(refused.swap.toOption.get.contains("cross-SF"))
    // --rebaseline overrides
    assert(Bench.baselineWriteDecision(Some(full), keys,
      rebaseline = true, newSf = "/root/testdata/sf0.001").isRight)
    // legacy baseline without an sf field: allowed (nothing to compare)
    val noSf = """{"queries":{"q01_a":1.0}}"""
    assert(Bench.baselineWriteDecision(Some(noSf), keys,
      rebaseline = false, newSf = "/root/testdata/sf0.001").isRight)
  }
}
