package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, NumericType, StringType}

/** Table profiler — the per-column data-quality audit a pipeline runs
  * on every new corpus drop before anything else touches it (the
  * deequ/TFDV "statistics" pass): row count, null count, completeness,
  * distinct cardinality, min/max, and a numeric mean or a string
  * mean-length per column.
  *
  * Scale shape: ONE corpus scan. All measures land in a single
  * `df.agg(...)` — Spark plans the multiple `count(DISTINCT ...)`
  * aggregates with one Expand (rows × (#distinct-aggs + 1)) feeding a
  * partially-aggregated exchange, so the input is read once no matter
  * how many columns are profiled. The wide 1-row result is reshaped to
  * the long per-column report with a driver-built `explode(array(
  * struct...))` — pure projection over one row, no second pass. At
  * 100 TB the exact distinct counts are the expensive part (the Expand
  * multiplies shuffle input by #profiled columns); [[profileTableApprox]]
  * swaps them for the mergeable KMV sketch ([[graft.functions
  * .SketchFunctions.kmvDistinct]]) — no Expand, one ordinary
  * partial-agg pass with fixed k·8-byte state per column — which is
  * what a production profile job should run, with the exact variant as
  * its small-scale twin (ProfileSpec gates sketch vs exact).
  *
  * Determinism contract (hash-oracle-able): counts are exact BIGINTs;
  * `completeness`/`mean_v`/`avg_len` divide exact integer/decimal sums
  * as the LAST step and round to 6 (add-order free, so shuffle- and
  * engine-independent); min/max render through CAST(x AS STRING) which
  * agrees between Spark and DuckDB for BIGINT/VARCHAR columns.
  */
object Profile {

  /** Exact shuffle-safe sum: double/int -> decimal(18,4) (the
    * Tables.dec idiom — exact, add-order free). */
  private def dec(c: Column): Column = c.cast("decimal(18,4)")
  private def asD(c: Column): Column = c.cast("double")

  /** One report row per profiled column:
    * (column, n_rows, n_null, n_distinct, completeness, min_v, max_v,
    * mean_v, avg_len). `mean_v` is null for non-numeric columns,
    * `avg_len` null for non-string columns. */
  def profileTable(df: DataFrame, columns: Seq[String]): DataFrame =
    profile(df, columns, c => countDistinct(col(c)))

  /** The 100 TB variant: identical report, but `n_distinct` comes from
    * the mergeable KMV sketch instead of exact count-distinct — the
    * plan loses the Expand entirely. `n_distinct` is then an estimate:
    * ProfileSpec gates it within 15% of exact at k=256. */
  def profileTableApprox(df: DataFrame, columns: Seq[String], k: Int = 256): DataFrame = {
    import graft.functions.SketchFunctions.kmvDistinct
    profile(df, columns, c => kmvDistinct(col(c).cast("string"), k))
  }

  private def profile(df: DataFrame, columns: Seq[String],
      distinctAgg: String => Column): DataFrame = {
    val kinds: Map[String, DataType] = columns.map(c => c -> df.schema(c).dataType).toMap
    def isNum(c: String) = kinds(c).isInstanceOf[NumericType]
    def isStr(c: String) = kinds(c) == StringType

    val measures: Seq[Column] = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__cnt"),
        distinctAgg(c).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        (if (isNum(c)) sum(dec(col(c))) else lit(null).cast("decimal(28,4)"))
          .as(s"${c}__sum"),
        (if (isStr(c)) sum(length(col(c)).cast("long")) else lit(null).cast("long"))
          .as(s"${c}__slen"))
    }
    val one = df.agg(count(lit(1)).as("__n"), measures: _*)

    val rows = columns.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__cnt")).as("n_null"),
        col(s"${c}__nd").cast("long").as("n_distinct"),
        (round(col(s"${c}__cnt").cast("double") / col("__n"), 6) + lit(0.0))
          .as("completeness"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"),
        (if (isNum(c))
           round(asD(col(s"${c}__sum")) / col(s"${c}__cnt"), 6) + lit(0.0)
         else lit(null).cast("double")).as("mean_v"),
        (if (isStr(c))
           round(col(s"${c}__slen").cast("double") / col(s"${c}__cnt"), 6) + lit(0.0)
         else lit(null).cast("double")).as("avg_len"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .orderBy(col("column"))
  }
}
