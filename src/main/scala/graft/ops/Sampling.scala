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

  /** Epoch-weighted mixture resampling — the "repeat high-quality
    * sources 2.3×, downsample crawl to 0.4×" step of assembling a
    * training mix. Every row is emitted `⌊w⌋ + [bucket < frac(w)·2³²]`
    * times with an `epoch` column (0-based copy index), so a weight of
    * 2.3 means two full passes plus a deterministic 30% third pass —
    * the standard fractional-epoch semantics, reproducible across
    * runs/engines/retries because the fractional keep decision is the
    * same Knuth-hash threshold as [[stratified]] (never `rand()`).
    *
    * Scale shape: map-only — per-row copy count from a broadcast
    * weight literal chain, then a generator expansion (explode); no
    * shuffle, no driver participation. Weights are validated ≥ 0;
    * rows whose stratum resolves to copies = 0 disappear (explode of
    * an empty sequence), which is exactly downsampling.
    */
  def mixtureEpochs(docs: DataFrame, idCol: String, strataCol: String,
                    weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    require(weights.values.forall(_ >= 0.0) && defaultWeight >= 0.0,
      s"mixture weights must be >= 0: $weights default=$defaultWeight")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val copies = (floor(w).cast("int")
      + when(bucket(col(idCol)) < floor((w - floor(w)) * Mod), 1).otherwise(0))
    docs.withColumn("copies", copies)
      // guard: sequence(0, -1) would DESCEND in Spark; empty-array
      // explode is the copies=0 drop
      .withColumn("epoch", explode(when(col("copies") > 0,
        sequence(lit(0), col("copies") - 1))))
      .drop("copies")
  }
}
