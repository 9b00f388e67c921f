package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the single right row with the
  * greatest right-time <= left-time within the same key group (inner
  * semantics — left rows with no preceding right row are dropped).
  *
  * Spark has no built-in as-of join; the naive formulation (equi-join on
  * key + range filter + per-left-row max) shuffles the join fan-out
  * (every left row × every earlier right row) before collapsing it. This
  * implementation uses the union+window trick instead: tag both sides,
  * union them, and run one `last(_, ignoreNulls)` window per key ordered
  * by time. Cost is ONE hash shuffle of |L|+|R| rows on the key — no
  * join blow-up — which is the formulation that survives 100 TB: the
  * sort within each key group is local to its reducer, and skewed keys
  * are bounded by the same AQE/salting recipes as any single-shuffle op.
  *
  * The right row's payload travels as one struct so all its columns are
  * picked from the SAME row even when individual payload fields are null.
  * Ties (right-time == left-time) match, mirroring DuckDB `ASOF JOIN ...
  * ON l.k = r.k AND l.t >= r.t`: the right side sorts before the left at
  * equal time.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns pass through
    * @param right     reference side; its non-key columns are attached
    * @param keys      equality keys present on both sides
    * @param leftTime  ordering column on `left`
    * @param rightTime ordering column on `right` (must share a comparable
    *                  type with leftTime); emitted on the output
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String): DataFrame = {
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val reserved = Seq("_t", "_side", "_payload", "_match")
    val clashes = (left.columns ++ right.columns).filter(reserved.contains)
    require(clashes.isEmpty,
      s"joinAsOf: input columns collide with internal names: ${clashes.mkString(", ")}")
    val overwritten = left.columns.filter(payloadCols.contains)
    require(overwritten.isEmpty,
      "joinAsOf: right payload columns shadow left columns: " +
        s"${overwritten.mkString(", ")} — rename one side before joining")
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(
        right.select(struct(payloadCols.map(col): _*)).schema.head.dataType))
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_payload", struct(payloadCols.map(col): _*))
      .select((keys ++ Seq("_t", "_side", "_payload")).map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // _payload as the final sort key makes ties among right rows at the
    // SAME (key, time) deterministic: Spark orders structs field-by-field,
    // so last() always elects the same row. Left rows carry a NULL payload
    // (sorted first) and are already separated by _side.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_match").isNotNull)
    val out = payloadCols.foldLeft(matched) { (df, c) =>
      df.withColumn(c, col("_match").getField(c))
    }
    out.select((left.columns.toSeq ++ payloadCols).map(col): _*)
  }
}
