package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output sinks (reference §2.1 S4/S5).
  *
  * The reference's training-data sink is a read-modify-write JSON
  * file with a date-stamped filename (reference
  * utils/data_manager.py:11-35) — a driver-side pattern that cannot
  * scale or survive concurrent writers. The Spark-native equivalent
  * is an append-mode, date-partitioned table write: idempotent task
  * commits, no read-modify-write, one directory per day.
  */
object Sinks {

  /** Date-partitioned JSON append (training-data sink). `tsCol` must
    * be a timestamp; rows land under dt=YYYYMMDD/. */
  def appendTrainingJson(df: DataFrame, tsCol: String, dir: String): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyyMMdd"))
      .write.mode("append").partitionBy("dt").json(dir)

  /** Pretty export sink (reference pages/live_mode.py:106-123): one
    * JSON file of search results for download. */
  def exportJson(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(path)

  /** Parquet append partitioned by arbitrary columns (the general
    * triple/edge sink shape; Iceberg in production, same layout). */
  def appendPartitioned(df: DataFrame, dir: String, partitionCols: String*): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*).parquet(dir)
}
