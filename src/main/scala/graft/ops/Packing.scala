package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk step that turns a cleaned
  * document stream into fixed-capacity training windows: documents
  * are laid end-to-end in a stable order and the token stream is cut
  * every `capacity` tokens, so each document occupies the half-open
  * token interval [start_offset, start_offset + n_tokens) and the
  * chunks it touches are start_offset/capacity .. (end-1)/capacity.
  *
  * The hard part at 100 TB is the global prefix sum (every document's
  * start offset depends on ALL earlier documents). A naive
  * `Window.orderBy(id)` moves the corpus to ONE partition — the
  * classic scale-killer. This implements the two-phase distributed
  * prefix sum instead:
  *
  *  1. range-repartition by the order key (so partition p holds a
  *     contiguous key range, all keys < partition p+1's);
  *  2. per-partition token subtotals — ONE row per partition reaches
  *     the driver, never data;
  *  3. broadcast the partition-prefix offsets; a within-partition
  *     cumulative window (keyed on the partition id — parallel, not
  *     global) plus the broadcast offset yields the global offset.
  *
  * The result is a pure function of (order key, token counts):
  * range-partition boundaries are data-dependent, but offsets are
  * partitioning-independent — asserted by the parallelism-invariance
  * test and the oracle's single-window twin.
  */
object Packing {

  /** @param docs      input with a unique integral order column and a
    *                  token-count column
    * @param capacity  tokens per training window (> 0)
    * @return input columns + (start_offset, chunk_first, chunk_last)
    */
  def packByOffset(spark: SparkSession, docs: DataFrame, orderCol: String,
                   nTokensCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be > 0, got $capacity")
    val ranged = docs.repartitionByRange(col(orderCol))
      .withColumn("_part", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one row per partition: (partition id, token subtotal, min key)
      val subtotal = ranged.groupBy(col("_part"))
        .agg(sum(col(nTokensCol).cast("long")).as("subtotal"),
          min(col(orderCol).cast("long")).as("lo"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      // range partitions are key-ordered; sort by min key, prefix-sum
      val prefix: Map[Int, Long] =
        if (subtotal.isEmpty) Map.empty
        else subtotal.sortBy(_._3).scanLeft((-1, 0L)) {
          case ((_, acc), (p, s, _)) => (p, acc + s)
        }.sliding(2).collect { case Array((_, acc), (p, _)) => (p, acc) }.toMap
      // the partition->offset lookup as a literal map + element_at —
      // a codegen'd expression, unlike a scalar Scala UDF which would
      // break whole-stage codegen for the whole packing projection
      // (map size = #partitions: always literal-safe)
      val offsetOf: Column =
        if (prefix.isEmpty) lit(0L)
        else element_at(typedLit(prefix), col("_part"))
      val w = Window.partitionBy(col("_part")).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      ranged
        .withColumn("start_offset",
          offsetOf + coalesce(
            sum(col(nTokensCol).cast("long")).over(w), lit(0L)))
        // `div` = 64-bit integer division (a double-based floor would
        // drift past 2^53 total tokens — reachable at 100 TB)
        .withColumn("chunk_first", expr(s"start_offset div ${capacity}L"))
        .withColumn("chunk_last",
          expr(s"(start_offset + $nTokensCol - 1) div ${capacity}L"))
        .drop("_part")
    } finally { ranged.unpersist(): Unit }
  }
}
