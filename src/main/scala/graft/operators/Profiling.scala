package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — the pre-flight check a 100 TB ingest runs before
  * anything else: per-column null counts, exact distinct cardinality, and
  * min/max rendered as strings. One aggregate pass per profile (all
  * columns' statistics computed in a single job, not one scan per
  * column); the output is a small long-format table keyed by column name.
  *
  * Deterministic (no sketches), so the whole report is oracle-checkable;
  * for the approximate-at-scale variant see Sketches (HLL distinct).
  */
object Profiling {

  /** (column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    * requested column; values cast to string so heterogeneous columns fit
    * one schema (engine-portable for int/long/string columns — float
    * rendering differs per engine, so round floats upstream first).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__rows_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    wide
      .select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }
}
