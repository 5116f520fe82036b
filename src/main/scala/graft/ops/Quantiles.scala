package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles over an integer-valued column via the
  * histogram-CDF rewrite — the corpus-profiling primitive (token
  * counts, document lengths, turns-per-conversation) where
  * `approxQuantile` gives non-reproducible answers and a global
  * `orderBy` sorts 100 TB to read four rows.
  *
  * Rewrite: groupBy(value).count() collapses the corpus to its value
  * HISTOGRAM first — map-side combined, so the shuffle carries at
  * most |distinct values| rows per partition, not the corpus. The
  * cumulative-count window and the quantile pick then run on the
  * histogram, which is small BY CONTRACT: integer metrics like
  * token counts have bounded domains (≤ ~10^6 distinct values at any
  * corpus size); for unbounded/continuous columns, bucket first and
  * quantile the buckets. The single-partition window over the
  * histogram is deliberate and safe under that contract (and the
  * place to re-partition by value range if someone breaks it).
  *
  * Semantics: inverted-CDF ("lower") quantile — q ↦ the smallest
  * value v with CDF(v) ≥ ⌈q·n⌉ rows. Exact, deterministic,
  * engine-portable (pinned by the DuckDB oracle); q=1.0 is the max,
  * q=0.0 the min.
  */
object Quantiles {

  /** @param qs quantile probabilities in [0,1], emitted one row per q
    *           as (q, value, n_rows). */
  def exactHistogram(df: DataFrame, valueCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cdf",
      sum($"c").over(Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = hist.agg(sum($"c").as("n"))
    val probe = qs.distinct.sorted.toDF("q")
    probe.crossJoin(total) // 1-row and |qs|-row sides: broadcast, no shuffle
      .join(cum, $"cdf" >= greatest(ceil($"q" * $"n"), lit(1L)))
      .groupBy($"q", $"n")
      .agg(min($"v").as("value"))
      .select($"q", $"value", $"n".as("n_rows"))
      .orderBy($"q")
  }
}
