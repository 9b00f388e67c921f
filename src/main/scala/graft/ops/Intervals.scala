package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union (coverage merge): collapse overlapping-or-touching
  * half-open [start, end) intervals per key into maximal disjoint
  * runs — the "what does the archive actually cover" primitive behind
  * temporal-extent bookkeeping (A3/A4 track ONE extent per key; this
  * is the exact multi-run form: gaps survive instead of being absorbed
  * into min/max).
  *
  * The classic gaps-and-islands construction, all in integer
  * arithmetic: an interval opens a new island iff its start exceeds
  * the running maximum end of every earlier interval in its key
  * (half-open semantics: touching runs merge); the island id is the
  * running count of such opens; islands aggregate to (min start,
  * max end).
  *
  * Scale shape: one shuffle on the key (the window partition), then a
  * partial+final hash agg on (key, island) that co-locates with it —
  * no self-join, no explode. Within-key work is a sort, so a single
  * pathological key holding billions of intervals would need a
  * coarser pre-merge; real keys (users, stations, files) are fine.
  */
object Intervals {

  /** Merged maximal intervals: key, island, start, end, n_raw. */
  def merge(df: DataFrame, key: Column, start: Column, end: Column)
  : DataFrame = {
    val base = df.select(key.as("k"), start.cast("long").as("s"),
      end.cast("long").as("e"))
    val w = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
    val prevMax = max(col("e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMax.isNull || col("s") > prevMax, 1L)
      .otherwise(0L)
    base
      .withColumn("island", sum(opens)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("k"), col("island"))
      .agg(min(col("s")).as("start"), max(col("e")).as("end"),
        count(lit(1)).as("n_raw"))
  }
}
