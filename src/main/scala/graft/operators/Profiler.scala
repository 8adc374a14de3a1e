package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style data profiling: per-column non-null count, exact
  * distinct count, and lexicographic min/max (as strings, so the output
  * schema is column-type-agnostic) — the table-statistics pass a lake
  * catalog runs after landing.
  *
  * All columns profile in ONE aggregation job: Catalyst plans the
  * multiple COUNT(DISTINCT)s through a single Expand (one scan,
  * data×columns intermediate rows, map-side partials) — at 100 TB a
  * per-column loop of separate jobs would scan the table once per
  * column instead. For width-heavy tables swap exact distinct for
  * approx_count_distinct and the Expand disappears.
  */
object Profiler {

  /** One row per column: (column_name, n_total, n_nonnull, n_distinct,
    * min_s, max_s). String-cast min/max keeps the schema uniform; cast
    * only bigint/string columns' values feed oracles (float formatting
    * differs across engines). */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fieldNames.toSeq
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max"))
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column_name"),
        col("__total").as("n_total"),
        col(s"${c}__nn").as("n_nonnull"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_s"),
        col(s"${c}__max").as("max_s"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }
}
