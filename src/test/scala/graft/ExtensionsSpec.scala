package graft

import org.apache.spark.sql.functions._
import graft.functions.VecStatsExpr

/** GraftExtensions SQL registration + VecStatsExpr kernel semantics. */
class ExtensionsSpec extends SparkSpec {

  test("vec_dot is callable from SQL and matches the Column API") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head.getDouble(0)
    assert(r === 32.0)
  }

  test("vec_stats skips NaN and nulls, counts totals") {
    import spark.implicits._
    val df = Seq(Seq[java.lang.Double](1.0, Double.NaN, 3.0, null, 5.0))
      .toDF("a")
      .select(VecStatsExpr.vecStats(col("a").cast("array<double>")).as("st"))
      .select("st.n_total", "st.n_valid", "st.vmin", "st.vmax", "st.vsum",
        "st.vsumsq")
    val row = df.head
    assert(row.getInt(0) === 5)
    assert(row.getInt(1) === 3)
    assert(row.getDouble(2) === 1.0)
    assert(row.getDouble(3) === 5.0)
    assert(row.getDouble(4) === 9.0)
    assert(row.getDouble(5) === 35.0)
  }

  test("vec_stats on an all-NaN array yields NaN min/max and zero sums") {
    val row = spark.sql(
      "SELECT vec_stats(array(CAST('NaN' AS DOUBLE))) AS st").select(
      "st.n_total", "st.n_valid", "st.vmin", "st.vsum").head
    assert(row.getInt(0) === 1)
    assert(row.getInt(1) === 0)
    assert(row.getDouble(2).isNaN)
    assert(row.getDouble(3) === 0.0)
  }

  test("interpreted eval matches codegen for vec_stats") {
    // force both paths on the same input: eval via the expression
    // directly, codegen via a projection executed by Spark
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    val arr = ArrayData.toArrayData(Array(2.0, Double.NaN, 8.0))
    val lit = Literal(arr,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
    val evald = VecStatsExpr(lit).eval(InternalRow.empty)
      .asInstanceOf[InternalRow]
    val viaSql = spark.sql(
      "SELECT vec_stats(array(2.0d, CAST('NaN' AS DOUBLE), 8.0d)) AS st")
      .select("st.n_total", "st.n_valid", "st.vmin", "st.vmax", "st.vsum",
        "st.vsumsq").head
    assert(evald.getInt(0) === viaSql.getInt(0))
    assert(evald.getInt(1) === viaSql.getInt(1))
    assert(evald.getDouble(2) === viaSql.getDouble(2))
    assert(evald.getDouble(3) === viaSql.getDouble(3))
    assert(evald.getDouble(4) === viaSql.getDouble(4))
    assert(evald.getDouble(5) === viaSql.getDouble(5))
  }

  test("wrong arity raises an analysis-time error") {
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0d))").collect()
    }
    assert(e.getMessage.contains("vec_dot"))
  }

  test("graft_nfc normalizes combining sequences from SQL and the " +
    "Column API, interpreted and codegen agreeing") {
    // e+U+0301 -> U+00E9; U+212B ANGSTROM SIGN -> U+00C5; NFC text as-is
    val r = spark.sql(
      "SELECT graft_nfc('cafe\u0301 \u212B'), graft_nfc('plain ascii')")
      .collect()(0)
    assert(r.getString(0) === "caf\u00e9 \u00c5")
    assert(r.getString(1) === "plain ascii")
    import graft.functions.NfcNormalizeExpr
    val viaCol = spark.range(1)
      .select(NfcNormalizeExpr.nfcCol(
        org.apache.spark.sql.functions.lit("A\u0300o\u0308")))
      .collect()(0).getString(0)
    assert(viaCol === "\u00c0\u00f6")
    // interpreted path (no codegen) matches
    val interp = NfcNormalizeExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString("A\u0300"),
        org.apache.spark.sql.types.StringType)).eval(null)
    assert(interp.toString === "\u00c0")
  }

  test("graft_winnow_anchors is callable from SQL and matches the " +
    "Column API (binary byte-grams)") {
    val txt = "abcabcabcabcabcXYZabcabcabc"
    def asStrings(r: org.apache.spark.sql.Row): Set[String] =
      r.getSeq[Array[Byte]](0).map(new String(_, "UTF-8")).toSet
    val viaSql = asStrings(spark.sql(
      s"SELECT graft_winnow_anchors('$txt', 4, 5) AS a").head)
    val viaCol = asStrings(spark.range(1)
      .select(graft.functions.WinnowAnchorsExpr
        .winnowAnchors(lit(txt), 4, 5).as("a")).head)
    assert(viaSql === viaCol)
    assert(viaSql.nonEmpty)
    viaSql.foreach(g => assert(g.length === 4 && txt.contains(g)))
  }

  test("graft_snapshot reads a committed version from the FROM clause") {
    import spark.implicits._
    import graft.ops.SnapshotTable
    val path =
      java.nio.file.Files.createTempDirectory("tvf").toString + "/t"
    SnapshotTable.append((1L to 100L).toDF("x"), path, 2)
    SnapshotTable.append((101L to 250L).toDF("x"), path, 2)
    val v1 = spark.sql(
      s"SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s " +
        s"FROM graft_snapshot('$path', 1)").head
    assert(v1.getLong(0) === 100 && v1.getLong(1) === 5050)
    // one argument = latest version
    val head = spark.sql(
      s"SELECT count(*) AS n FROM graft_snapshot('$path')").head
    assert(head.getLong(0) === 250)
    // joins against ordinary relations work — it's just a relation
    val joined = spark.sql(
      s"SELECT count(*) AS n FROM graft_snapshot('$path', 2) a " +
        s"JOIN graft_snapshot('$path', 1) b ON a.x = b.x").head
    assert(joined.getLong(0) === 100)
    // non-literal args and missing versions are loud
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_snapshot('$path', 9)").collect()
    }
  }

  test("graft_changes surfaces the version delta to SQL") {
    import spark.implicits._
    import graft.ops.SnapshotTable
    val path =
      java.nio.file.Files.createTempDirectory("tvfc").toString + "/t"
    SnapshotTable.append((1L to 100L).toDF("x"), path, 2)
    SnapshotTable.append((101L to 250L).toDF("x"), path, 2)
    val r = spark.sql(
      s"SELECT _change, count(*) AS n, CAST(sum(x) AS BIGINT) AS s " +
        s"FROM graft_changes('$path', 1, 2) GROUP BY _change").collect()
    assert(r.length === 1)
    assert(r.head.getString(0) === "insert")
    assert(r.head.getLong(1) === 150 &&
      r.head.getLong(2) === (101L to 250L).sum)
    // an empty delta is an empty relation, not an error
    assert(spark.sql(
      s"SELECT * FROM graft_changes('$path', 2, 2)").count() === 0)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_changes('$path', 1)").collect()
    }
  }
}
