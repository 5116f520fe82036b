package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-defusing primitives (north star: "salted
  * repartitioning to defuse hot-conversation skew"; AQE skew-join
  * splitting is the second line of defense and is enabled in
  * [[graft.GraftSession]]).
  */
object Skew {

  /** Deterministic salt in [0, salts): hash of the row's full key
    * columns, NOT rand() — reruns and retries must land rows in the
    * same partition (determinism invariant, SURVEY.md §7.4). */
  def saltCol(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts))

  /** Spread a hot-keyed DataFrame over `salts` x partitions of the
    * key: repartition by (key, salt). Downstream per-key operations
    * must be salt-aware (see [[saltedAgg]]). */
  def saltedRepartition(df: DataFrame, keyCol: String, salts: Int,
                        saltSource: Seq[String]): DataFrame =
    df.withColumn("__salt", saltCol(salts, saltSource.map(col): _*))
      .repartition(col(keyCol), col("__salt"))

  /** Two-phase salted aggregation: partial agg on (key, salt) — which
    * splits a hot key across `salts` reducers — then final combine on
    * key. Equivalent to a direct groupBy(key) for any combinable
    * aggregate; this is the explicit form of what map-side partial
    * aggregation does, pushed one level further for keys too hot for
    * a single final reducer.
    *
    * @param partial per-(key,salt) aggregates, e.g. count/sum pairs
    * @param combine how to merge partials, keyed by output name */
  def saltedAgg(df: DataFrame, keyCol: String, salts: Int,
                saltSource: Seq[String],
                partial: Seq[Column], combine: Seq[Column]): DataFrame =
    df.withColumn("__salt", saltCol(salts, saltSource.map(col): _*))
      .groupBy(col(keyCol), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(keyCol))
      .agg(combine.head, combine.tail: _*)
}
