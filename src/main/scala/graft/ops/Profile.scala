package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators: equi-width histograms and a single-pass
  * per-column summary — the "what is in this 100 TB table" pass that
  * precedes any pipeline design.
  *
  * Scale notes: the histogram is two aggregations (global extent, then
  * bucket counts) with the 2-row extent broadcast; the column profile is ONE
  * aggregation computing every per-column metric in the same pass (the
  * rows-to-columns unpivot happens on the single result row, not the data).
  * `count_distinct` is exact here; at 100 TB the same query shape swaps in
  * `approx_count_distinct` per column.
  */
object Profile {

  /** Equi-width histogram of `valueCol` per `groupCol`, bucketed on the
    * GLOBAL [min, max] so buckets align across groups.
    *
    * @return (group, bucket, bucket_lo, bucket_hi, cnt) — only non-empty
    *         buckets (dense-ify at the call site if needed)
    */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
                nBuckets: Int = 16): DataFrame = {
    val v = col(valueCol).cast("double")
    val ext = df.filter(v.isNotNull)
      .agg(min(v).as("__lo"), max(v).as("__hi"))
    val width = (col("__hi") - col("__lo")) / nBuckets
    val bucket = when(col("__hi") === col("__lo"), 0L)
      .otherwise(least(floor((v - col("__lo")) / width).cast("long"),
        lit(nBuckets - 1L)))
    df.filter(v.isNotNull)
      .crossJoin(broadcast(ext))
      .select(col(groupCol), bucket.as("bucket"), col("__lo"), col("__hi"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        // lo/hi are group-constant; first() keeps them without a re-join
        first(col("__lo")).as("__lo"), first(col("__hi")).as("__hi"))
      .select(col(groupCol), col("bucket"),
        (col("__lo") + col("bucket") * (col("__hi") - col("__lo")) / nBuckets)
          .as("bucket_lo"),
        (col("__lo") + (col("bucket") + 1) * (col("__hi") - col("__lo")) / nBuckets)
          .as("bucket_hi"),
        col("cnt"))
  }

  /** One profile row per listed column: row count, null count, exact
    * distinct count, and min/max — numerically for numeric/timestamp columns
    * (`min_num`/`max_num`, timestamps as epoch microseconds), lexically for
    * string columns (`min_str`/`max_str`).
    *
    * Two aggregation branches over the same scan, deliberately: a var-length
    * value (`min(string)`) in an aggregate buffer forces SORT-based
    * aggregation, and with the multi-distinct Expand (|distinct cols| ×
    * input rows) in the same aggregate that sort swallowed the whole
    * pipeline (measured 2.4× slower). Branch 1 carries everything with
    * fixed-width buffers (counts, distincts, numeric extrema) and stays a
    * HashAggregate end-to-end; branch 2 sorts only the two string extrema
    * with no Expand. The single-row results cross-join for free.
    *
    * The unpivot is driven by the COLUMN LIST, not the data: one aggregate
    * row explodes into |columns| result rows.
    */
  def columnProfile(df: DataFrame, numericCols: Seq[String],
                    stringCols: Seq[String]): DataFrame = {
    def num(c: String): Column = {
      val raw = col(c)
      df.schema(c).dataType.typeName match {
        // TIMESTAMP_NTZ → TIMESTAMP is exact under the pinned UTC session
        case "timestamp" | "timestamp_ntz" =>
          unix_micros(raw.cast("timestamp")).cast("double")
        case _ => raw.cast("double")
      }
    }
    val fixedAggs: Seq[Column] =
      count(lit(1)).as("__n") +:
        (numericCols.flatMap { c =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
            count_distinct(col(c)).as(s"__nd_$c"),
            min(num(c)).as(s"__min_$c"), max(num(c)).as(s"__max_$c"))
        } ++ stringCols.flatMap { c =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
            count_distinct(col(c)).as(s"__nd_$c"))
        })
    val fixed = df.agg(fixedAggs.head, fixedAggs.tail: _*)
    val one =
      if (stringCols.isEmpty) fixed
      else {
        val strAggs = stringCols.flatMap { c =>
          Seq(min(col(c)).as(s"__smin_$c"), max(col(c)).as(s"__smax_$c"))
        }
        fixed.crossJoin(broadcast(df.agg(strAggs.head, strAggs.tail: _*)))
      }
    val rows: Seq[Column] =
      numericCols.map { c =>
        struct(lit(c).as("col_name"), col("__n").as("n"),
          col(s"__nulls_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
          col(s"__min_$c").as("min_num"), col(s"__max_$c").as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))
      } ++ stringCols.map { c =>
        struct(lit(c).as("col_name"), col("__n").as("n"),
          col(s"__nulls_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          col(s"__smin_$c").as("min_str"), col(s"__smax_$c").as("max_str"))
      }
    one.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** Declarative data-quality expectations (the dbt-test / Deequ shape):
    * every rule is a per-row violation indicator summed in ONE aggregation
    * pass, plus a uniqueness check (rows − distinct). The result is the
    * quality report a pipeline gates on before consuming a drop.
    *
    * @param rules (rule_name, violation predicate) pairs — true = violation
    * @param uniqueCols columns that must be unique (checked exactly)
    * @return (rule, n_violations, n_rows) one row per rule
    */
  def expectations(df: DataFrame, rules: Seq[(String, Column)],
                   uniqueCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +:
        (rules.map { case (name, pred) =>
          sum(when(pred, 1L).otherwise(0L)).as(s"__v_$name")
        } ++ uniqueCols.map { c =>
          count_distinct(col(c)).as(s"__nd_$c")
        })
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows: Seq[Column] =
      rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(s"__v_$name").as("n_violations"),
          col("__n").as("n_rows"))
      } ++ uniqueCols.map { c =>
        struct(lit(s"unique_$c").as("rule"),
          (col("__n") - col(s"__nd_$c")).as("n_violations"),
          col("__n").as("n_rows"))
      }
    one.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }
}
