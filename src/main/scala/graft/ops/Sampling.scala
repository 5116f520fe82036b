package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the corpus-rebalancing
  * operator of a training-data pipeline (e.g. downsample English,
  * keep all low-resource languages). Unlike `DataFrame.sample`, the
  * keep/drop decision is a pure function of the row id, so it is
  * reproducible across runs, engines, partitionings and retries —
  * a requirement both for resumable 100 TB jobs (a re-executed task
  * must sample identically) and for external verification.
  *
  * The hash is Knuth's multiplicative scramble on the id modulo 2^32
  * (`(id * 2654435761) mod 2^32`), chosen over xxhash64/md5 because
  * it is trivially recomputable in ANY engine with 64-bit integer
  * arithmetic — the same engine-portability contract as
  * [[graft.Functions.hash64_str]]. id * 2654435761 stays well inside
  * signed-64 range for any realistic id space (id < 2^32).
  *
  * Scale shape: map-only — a broadcast of the (tiny) per-stratum rate
  * table plus one filter; no shuffle, no driver participation.
  */
object Sampling {

  private val Knuth = 2654435761L
  private val Mod = 4294967296L // 2^32

  /** Uniform bucket in [0, 2^32) derived from the row id. */
  def bucket(id: Column): Column = pmod(id.cast("long") * Knuth, lit(Mod))

  /** Keep rows where bucket < rate * 2^32, rate chosen per stratum.
    *
    * @param docs      input with an integral id column and a stratum
    *                  column (language, source, quality band, ...)
    * @param rates     stratum value -> keep rate in [0, 1]
    * @param defaultRate rate for strata not in `rates`
    * @return the sampled subset, original columns plus the decision
    *         inputs (bucket, rate) for auditability.
    */
  def stratified(docs: DataFrame, idCol: String, strataCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0)
      && defaultRate >= 0.0 && defaultRate <= 1.0,
      s"sampling rates must be in [0,1]: $rates default=$defaultRate")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    docs.withColumn("bucket", bucket(col(idCol)))
      .withColumn("rate", rate)
      // floor() the threshold so both sides of an engine-portable
      // oracle compare integers, never a float boundary
      .filter(col("bucket") < floor(col("rate") * Mod))
  }
}
