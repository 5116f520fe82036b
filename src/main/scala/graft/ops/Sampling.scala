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

  /** Deterministic fixed-k-per-stratum sample — eval/holdout-set
    * construction ("exactly 500 docs per source"). Contract: the k
    * rows with the SMALLEST Knuth buckets per stratum, ties broken by
    * id — a pure function of the id set, so the selected sample is
    * reproducible across runs, engines, partitionings and retries
    * (same portability contract as [[stratified]]); a stratum with
    * fewer than k rows returns all of them.
    *
    * Scale shape — the naive form (rank window over the whole corpus)
    * fully sorts every stratum and cannot be skew-split (AQE does not
    * split window partitions; one 90%-of-corpus language would sort
    * 90 TB on one task chain). Instead: a MAP-ONLY bucket prefilter
    * keeps rows below ~`safety`·k/n of the hash range (expected
    * `safety`·k survivors per stratum, n from one tiny broadcast
    * count), and the exact rank window runs on that k-proportional
    * survivor set only. The prefilter undershooting min(k, n) for
    * some stratum is Chernoff-suppressed (P ≤ exp(-0.77·(safety-1)²/
    * safety·k) ≈ e^-150 at defaults) and GUARDED: a deterministic
    * in-plan assertion fails the job rather than silently returning a
    * short sample, and the fix is raising `safety` (cost: linearly
    * more survivor rows, still ~k-proportional). The guard rides the
    * returned plan itself (`assert_true` over a second window on the
    * same stratum partitioning — no extra shuffle, no extra job), so
    * the operator stays a LAZY transform: the prefilter + rank plan
    * executes exactly once, when the caller consumes the result —
    * not eagerly at call time and then again downstream. Laziness
    * caveat: the guard fires when the result is MATERIALIZED (any
    * full scan — count/collect/write); a partial consumption
    * (`take(n)`, a pushed-down stratum filter) checks only the
    * strata it actually scans, which are exactly the strata whose
    * sample it returns.
    *
    * @return original columns plus (bucket, rk) for auditability,
    *         rk = 1-based rank within the stratum.
    */
  def kPerGroup(docs: DataFrame, idCol: String, strataCol: String,
                k: Int, safety: Int = 8): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(safety >= 2, s"safety factor must be >= 2, got $safety")
    val counts = docs.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
    // threshold >= Mod (keep all) whenever n <= safety*k — small
    // strata never prefilter, so the guard below can only trip on the
    // Chernoff tail of a genuinely large stratum
    val thr = ceil(lit(Mod.toDouble) * safety * k / col("_n")).cast("long")
    val pre = docs.withColumn("bucket", bucket(col(idCol)))
      .join(broadcast(counts), Seq(strataCol))
      .filter(col("bucket") < thr)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("bucket"), col(idCol))
    val ranked = pre.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
    // undershoot guard, folded into the plan: per stratum the rows
    // kept (= max rk on the post-filter set, same window partitioning
    // so no second exchange) must reach min(k, n). assert_true returns
    // null when the condition holds, so the filter keeps every row and
    // raises — naming the stratum — the moment a Chernoff-tail
    // undershoot materializes.
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    val guard = assert_true(
      col("_got") >= least(lit(k.toLong), col("_n")),
      concat(lit("kPerGroup prefilter undershot min(k, n) for stratum "),
        col(strataCol).cast("string"),
        lit(s"; raise safety (= $safety)")))
    ranked.withColumn("_got", max(col("rk")).over(wAll).cast("long"))
      .filter(coalesce(guard, lit(true)))
      .drop("_got", "_n")
  }

  /** Leakage-safe train/val/test split assignment: the split is a
    * pure function of the GROUP key (conversation id, document
    * source, ...), so every row of a group lands in the same split —
    * the invariant that prevents cross-split leakage when rows are
    * correlated (turns of one conversation, chunks of one document).
    * Splitting row-wise instead is the classic eval-contamination
    * bug; this operator makes the group-consistent form the easy one.
    *
    * Deterministic and engine-portable: bucket = pmod(hash64_str(
    * group), 2^32) (same FNV-1a + avalanche hash the sketches
    * replay in the oracle), compared against cumulative integer
    * thresholds floor(cum_fraction * 2^32) — never a float boundary.
    * Reproducible across runs, engines, partitionings and retries.
    *
    * Scale shape: map-only — one hash + a literal threshold chain
    * per row; no shuffle, no driver participation.
    *
    * @param splits ordered (name, fraction) list; fractions must sum
    *               to 1 (within 1e-9)
    * @return input plus (split_bucket, split) columns
    */
  def assignSplit(docs: DataFrame, groupCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0.0),
      s"split fractions must be >= 0: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    // a null group key would hash to null, fail every `b < thr` test
    // and silently land in the LAST split — a quiet leakage-safety
    // hole. Fail fast instead (in-plan, map-only): leakage safety is
    // only meaningful when every row has a real group identity.
    val keyGuard = assert_true(col(groupCol).isNotNull,
      lit(s"assignSplit: null group key in column '$groupCol' — " +
        "split assignment must be a function of a non-null group"))
    val b = pmod(graft.Functions.hash64_str(col(groupCol).cast("string")),
      lit(Mod))
    val thresholds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c * Mod).toLong)
    val named = splits.map(_._1).zip(thresholds)
    val expr = named.init.reverse
      .foldLeft(lit(named.last._1): Column) { case (acc, (name, thr)) =>
        when(b < thr, lit(name)).otherwise(acc)
      }
    docs.filter(coalesce(keyGuard, lit(true)))
      .withColumn("split_bucket", b).withColumn("split", expr)
  }
}
