package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the ANALYZE TABLE primitive: per-column row/null/
  * distinct counts and min/max, the first pass every ingest pipeline
  * runs before trusting a new drop. */
object Profile {

  /** Profile the given columns in ONE corpus scan: every measure for
    * every column lands in a single aggregate row (multi-distinct plans
    * through Catalyst's Expand — still one pass over the data, no
    * per-column jobs), which is then reshaped result-side into one row
    * per column.
    *
    * `specs` maps output name → the value expression to profile; the
    * caller canonicalizes types there (e.g. cast a double to
    * DECIMAL(18,2) so min/max stringify identically on every engine).
    * min/max are emitted as strings so heterogeneous columns share one
    * schema — the profile IS a report, not a typed table.
    *
    * Output: (col_name, n_rows, n_null, n_distinct, min_s, max_s). */
  def profile(df: DataFrame, specs: Seq[(String, Column)]): DataFrame = {
    require(specs.nonEmpty, "profile needs at least one column spec")
    val measures = count(lit(1)).as("__n") +: specs.flatMap { case (name, c) =>
      Seq(
        count(when(c.isNull, lit(1))).as(s"__nn_$name"),
        countDistinct(c).as(s"__nd_$name"),
        min(c).cast("string").as(s"__mn_$name"),
        max(c).cast("string").as(s"__mx_$name"))
    }
    val aggRow = df.agg(measures.head, measures.tail: _*)
    // reshape with ONE stack generator over the single aggregate row —
    // a per-column union would re-plan (and re-print) the scan subtree
    // per branch; stack keeps the whole profile a single-subtree plan
    // with exactly one scan
    val stacked = specs.flatMap { case (name, _) =>
      Seq(lit(name), col(s"__nn_$name"), col(s"__nd_$name"),
        col(s"__mn_$name"), col(s"__mx_$name"))
    }
    aggRow.select(col("__n").as("n_rows"),
        stack((lit(specs.size) +: stacked): _*)
          .as(Seq("col_name", "n_null", "n_distinct", "min_s", "max_s")))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }
}
