package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.Scalars._

/** Unit tests for the §2.8 scalar-function library, mirroring the
  * reference's pytest coverage (reference tests/stac/test_generator.py)
  * plus property-style sweeps for F1 round-trips and F14 determinism.
  */
class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c).collect().head.getAs[T](0)

  test("F1 frequency parse: docstring examples round-trip") {
    // reference utils.py:139-148 examples
    val cases = Seq("2hours" -> (2.0, "hours"), "3days" -> (3.0, "days"),
      "1months" -> (1.0, "months"), "0.5years" -> (0.5, "years"),
      "2Weeks" -> (2.0, "weeks"), " 3 days " -> (3.0, "days"))
    val df = cases.map(_._1).toDF("raw")
      .select(col("raw"), freqStep(col("raw")).as("v"), freqUnit(col("raw")).as("u"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getString(2))).toMap
    cases.foreach { case (raw, expected) => assert(df(raw) === expected) }
  }

  test("F1 frequency parse: invalid strings yield null (reference raises)") {
    val df = Seq("bogus", "5 lightyears", "", "days", "1.2.3days")
      .toDF("raw").select(freqStep(col("raw")).as("v"), freqUnit(col("raw")).as("u"))
      .collect()
    assert(df.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("F1 property: generated value+unit strings round-trip (ScalaCheck gen)") {
    val gen = for {
      n <- Gen.choose(1, 99999)
      denom <- Gen.oneOf(1, 2, 4, 10, 100)
      unit <- Gen.oneOf("hours", "days", "weeks", "months", "years")
      pad <- Gen.oneOf("", " ", "  ")
    } yield (n.toDouble / denom, unit, pad)
    val cases = Gen.listOfN(200, gen).sample.get
    val rows = cases.map { case (v, u, pad) => (s"$pad$v$pad$u$pad", v, u) }
      .toDF("raw", "v_expected", "u_expected")
      .select(freqStep(col("raw")) === col("v_expected"),
        freqUnit(col("raw")) === col("u_expected"))
      .collect()
    assert(rows.forall(r => r.getBoolean(0) && r.getBoolean(1)))
  }

  test("F2 calendar add: month-end clamp matches relativedelta") {
    val ts = to_timestamp(lit("2024-01-31 06:00:00"))
    // render in-plan (session-TZ string): the java8API session collects
    // timestamps as java.time.Instant, whose toString format differs
    def s(c: org.apache.spark.sql.Column): String =
      one[String](c.cast("timestamp").cast("string"))
    assert(s(calendarAdd(ts, lit("months"), lit(1)))
      .startsWith("2024-02-29"))
    assert(s(calendarAdd(ts, lit("years"), lit(1)))
      .startsWith("2025-01-31"))
    assert(s(calendarAdd(ts, lit("hours"), lit(1.5)))
      .startsWith("2024-01-31 07:30:00"))
    // fractional months are ambiguous in relativedelta (raises) → null here
    assert(one[Any](calendarAdd(ts, lit("months"), lit(1.5))) == null)
  }

  test("F4 format_time: filename-safe ISO (reference utils.py:207 example)") {
    val ts = to_timestamp(lit("2025-08-14 06:00:00"))
    assert(one[String](formatTime(ts)) === "2025-08-14T06-00-00Z")
    assert(one[String](formatTime(ts, withSeconds = false)) === "2025-08-14T06-00Z")
  }

  test("F7 title cleanup: capitalize lowers the tail, _/- become spaces") {
    assert(one[String](titleClean(lit("my_ICE-model"))) === "My ice model")
    assert(one[String](titleClean(lit("north_sic"))) === "North sic")
  }

  test("F8 href rewrite: ./ prefix swapped for server URL, others untouched") {
    val hrefs = Seq("./cogs/a.tif", "cogs/a.tif", "https://x/a.tif").toDF("href")
      .select(hrefRewrite(col("href"), "https://files.example.org").as("out"))
      .collect().map(_.getString(0))
    assert(hrefs === Seq("https://files.example.org/cogs/a.tif",
      "cogs/a.tif", "https://x/a.tif"))
  }

  test("F9/P3 unit normalization: km and 1000-meter scale x1000 (reference test_convert_units_km)") {
    val out = Seq((1.0, "km"), (2.0, "km"), (3.0, "km"),
        (4.0, "1000 meter"), (5.0, "m"))
      .toDF("c", "units")
      .select(normalizeCoord(col("c"), col("units")).as("m")).collect().map(_.getDouble(0))
    assert(out === Seq(1000.0, 2000.0, 3000.0, 4000.0, 5.0))
  }

  test("F10 floor to 2dp") {
    assert(one[Double](floor2dp(lit(66.66999))) === 66.66)
    assert(one[Double](floor2dp(lit(100.0))) === 100.0)
  }

  test("F13/F14 multihash: known digests, incl. the digest-of-digest quirk") {
    // constants computed with python hashlib + the reference's multihash framing
    assert(one[String](multihashMd5(lit("hello")))
      === "d5105d41402abc4b2a76b9719d911017c592")
    assert(one[String](blockMultihashMd5(lit("hello")))
      === "d51062109206880d38a4010a98e11243924a")
    assert(one[String](blockMultihashMd5(lit("graft engine")))
      === "d510c8a2b8c087d36fd2e4dd2149f33f3862")
    assert(one[String](blockMultihashMd5(lit("")))
      === "d51059adb24ef3cdbe0297f05b395827453f")
  }

  test("F14 property: determinism + framing across generated inputs") {
    val inputs = Gen.listOfN(100, Gen.alphaNumStr).sample.get
    val rows = inputs.toDF("s")
      .select(blockMultihashMd5(col("s")).as("a"), blockMultihashMd5(col("s")).as("b"))
      .collect()
    assert(rows.forall(r => r.getString(0) == r.getString(1)))
    assert(rows.forall(_.getString(0).matches("d510[0-9a-f]{32}")))
  }

  test("F15 mime type by extension") {
    val out = Seq("a.tif", "b.TIFF", "c.jpg", "d.png", "e.nc", "f.json", "g.zarr")
      .toDF("p").select(mimeType(col("p")).as("m")).collect().map(_.getString(0))
    assert(out === Seq("image/tiff", "image/tiff", "image/jpeg", "image/png",
      "application/x-netcdf", "application/json", null))
  }

  test("P9/F18 hemisphere: north, south, missing-empty, out-of-range raises") {
    val out = Seq[(java.lang.Double, Int)]((45.0, 0), (-30.0, 1), (null, 2))
      .toDF("lat", "i")
      .select(hemisphere(col("lat")).as("h")).collect().map(_.getString(0))
    assert(out === Seq("north", "south", ""))
    intercept[Exception] {
      Seq(120.0).toDF("lat").select(hemisphere(col("lat"))).collect()
    }
  }
}
