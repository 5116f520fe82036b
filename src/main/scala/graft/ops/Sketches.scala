package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Functions

/** Mergeable distinct-count sketches — the cardinality primitives a
  * 100 TB training-data pipeline needs where an exact
  * `COUNT(DISTINCT)` would shuffle the full key set: vocabulary
  * sizes, unique-document counts per source, dedup-rate dashboards.
  * Both sketches hash with the engine's portable
  * [[graft.functions.Hashing.hash64]] (FNV-1a 64 + splitmix64), so
  * the DuckDB oracle recomputes them bit-exactly in HUGEINT
  * arithmetic — estimates included, to the last rounded digit.
  *
  * Why two: KMV is the simplest mergeable sketch (its state is just
  * the k smallest distinct hashes — union two states and re-take k);
  * HyperLogLog-shaped registers give fixed O(m) memory independent
  * of k and are what production systems actually ship. Both are
  * order- and partitioning-independent by construction, the property
  * that makes them safe to compute map-side and merge.
  */
object Sketches {

  /** Bottom-k distinct hashes as a typed [[Aggregator]] — the state
    * IS the sketch, and `merge` is the distributed story: each
    * partition reduces to ≤ k longs, the driver merges ≤ P·k longs.
    * No corpus shuffle at all (contrast: `distinct()` ships every
    * distinct hash). Buffer ops re-sort a ≤ k array per row — fine
    * for the k ≤ few-hundred sketches this is for; a production tune
    * would keep a bounded TreeSet.
    */
  final class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], h: Long): Seq[Long] =
      if (b.contains(h)) b
      else if (b.size < k) (b :+ h).sorted
      else if (h < b.last) (b.init :+ h).sorted
      else b
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** KMV (k-minimum-values) distinct-count estimate over a string
    * column. Returns ONE row: (k, k_used, kth_hash, est_distinct).
    *
    * Hash ordering is the SIGNED Long order — a fixed rotation of
    * the unsigned order, equally uniform — so the k-th smallest
    * signed hash s maps to unsigned position u = s + 2^63 and the
    * classic estimator is (k−1) · 2^64 / u. When the column has
    * fewer than k distinct values the sketch is exhaustive and the
    * estimate is exactly k_used.
    */
  def kmvDistinct(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val kmv = udaf(new KmvAgg(k), Encoders.scalaLong)
    val sketch = df
      .select(Functions.hash64_str(col(textCol)).as("h"))
      .agg(kmv(col("h")).as("mins"))
    sketch.select(
      lit(k).as("k"),
      size(col("mins")).as("k_used"),
      element_at(col("mins"), -1).as("kth_hash"),
      when(size(col("mins")) < k, size(col("mins")).cast("double"))
        .otherwise(
          (lit(k - 1).cast("double") * lit(1.8446744073709552e19)) /
            (element_at(col("mins"), -1).cast("double") + lit(9.223372036854776e18)))
        .as("est_raw"))
      .select(col("k"), col("k_used"), col("kth_hash"),
        (floor(col("est_raw") * 100 + 0.5) / 100).as("est_distinct"))
  }

  /** HyperLogLog register table over a string column: one row per
    * occupied register, (register, max_rho). Pure column math — the
    * hash splits into a b-bit register index (low bits) and a
    * (64−b)-bit word w; rho = leading zeros of w within that window
    * + 1, computed exactly via `64−b−bitlen(w)+1` with
    * `bitlen = length(bin(w))` (integer-exact, no log2 floats). The
    * groupBy(register).max(rho) is map-side combined: the shuffle
    * carries ≤ m rows per partition regardless of corpus size, and
    * register tables from disjoint batches merge with the same max —
    * the HLL merge law (asserted in SketchesSpec).
    */
  def hllRegisters(df: DataFrame, textCol: String, b: Int): DataFrame = {
    require(b >= 4 && b <= 16, s"register bits b in [4,16], got $b")
    val m = 1 << b
    val h = Functions.hash64_str(col(textCol))
    val w = shiftrightunsigned(h, b)
    val rho = when(w === 0, lit(64 - b + 1))
      .otherwise(lit(64 - b + 1) - length(bin(w)))
    df.select(h.bitwiseAND(lit(m - 1L)).as("register"), rho.as("rho"))
      .groupBy("register").agg(max("rho").as("max_rho"))
  }

  /** Tokenized occurrences of a string column: one row per token, WITH
    * multiplicity (unlike the distinct shingle ops) — the input shape
    * for frequency sketches. Same tokenizer contract as
    * [[graft.functions.Hashing.tokenize]]: lowercase, split on
    * non-letter/digit runs, drop empties. */
  def tokenOccurrences(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), "[^\\p{L}\\p{N}]+")).as("token"))
      .filter(col("token") =!= "")

  /** Count-Min sketch table (d rows × 2^wBits counters) over token
    * occurrences: one output row per OCCUPIED cell, (row, pos, cnt).
    * The d row-positions are disjoint wBits-wide slices of the single
    * 64-bit token hash (d·wBits ≤ 64) — the standard
    * one-strong-hash-many-fields construction, so the DuckDB twin
    * recomputes every cell bit-exactly. The groupBy is map-side
    * combined: the shuffle carries at most d·2^wBits rows per
    * partition REGARDLESS of corpus size, and two batches' tables
    * merge by cell-wise addition (the CMS merge law, asserted in
    * SketchesSpec).
    */
  def countMinTable(df: DataFrame, textCol: String,
                    d: Int = 4, wBits: Int = 12): DataFrame =
    countMinOverTokens(tokenOccurrences(df, textCol), "token", d, wBits)

  /** [[countMinTable]] over a pre-tokenized occurrence stream (one
    * row per occurrence of `tokenCol`) — lets callers sketch any key
    * domain (word shingles, n-grams, ids), not just the default
    * tokenizer's output. */
  def countMinOverTokens(tok: DataFrame, tokenCol: String,
                         d: Int = 4, wBits: Int = 12): DataFrame = {
    require(d >= 1 && wBits >= 1 && d * wBits <= 64,
      s"need d*wBits <= 64, got d=$d wBits=$wBits")
    val mask = (1L << wBits) - 1
    val h = graft.Functions.hash64_str(col(tokenCol))
    val cells = (0 until d).map(j =>
      struct(lit(j).as("row"),
        shiftrightunsigned(h, j * wBits).bitwiseAND(lit(mask)).as("pos")))
    tok
      .select(explode(array(cells: _*)).as("cell"))
      .groupBy(col("cell.row").as("row"), col("cell.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a CMS table: for each probe token,
    * min over the d cells its hash addresses (the classic CMS upper
    * bound: est ≥ true count always, est ≤ true + εN w.h.p.). The
    * sketch side of the join is ≤ d·2^wBits rows — broadcast — so
    * probing any number of tokens is map-only over the probe set. */
  def countMinEstimate(cms: DataFrame, probes: DataFrame, tokenCol: String,
                       d: Int = 4, wBits: Int = 12): DataFrame = {
    require(d >= 1 && wBits >= 1 && d * wBits <= 64,
      s"need d*wBits <= 64, got d=$d wBits=$wBits")
    val mask = (1L << wBits) - 1
    val h = graft.Functions.hash64_str(col(tokenCol))
    val cells = (0 until d).map(j =>
      struct(lit(j).as("row"),
        shiftrightunsigned(h, j * wBits).bitwiseAND(lit(mask)).as("pos")))
    probes
      .select(col(tokenCol).as("token"), explode(array(cells: _*)).as("cell"))
      .join(broadcast(cms),
        col("cell.row") === cms("row") && col("cell.pos") === cms("pos"),
        "left")
      .groupBy(col("token"))
      // a missing cell means 0 occurrences hashed there -> est 0
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** HLL cardinality estimate from a register table. All float work
    * is ONE division at the end: the harmonic sum Σ 2^−rho is kept
    * exact as Σ 2^(59−rho) in DECIMAL(38,0) (empty registers
    * contribute rho=0 ⇒ 2^59 each), so the result is independent of
    * register order — the usual Σ double(2^−rho) is not, once
    * exponents span > 53 bits. No small-range linear-counting branch:
    * it needs ln(), whose last-ulp value is libm-dependent and would
    * unpin the cross-engine oracle; raw HLL bias at low cardinality
    * is part of the pinned semantics (est/exact ratio is asserted
    * separately in SketchesSpec).
    * Returns ONE row (b, m, n_nonempty, est_hll).
    */
  def hllEstimate(registers: DataFrame, b: Int): DataFrame = {
    val m = 1 << b
    val alpha =
      if (m == 16) 0.673 else if (m == 32) 0.697 else if (m == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    registers
      .agg(count(lit(1)).as("n_nonempty"),
        sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 59 - max_rho) AS DECIMAL(38,0))"))
          .as("s_occupied"))
      .select(lit(b).as("b"), lit(m).as("m"), col("n_nonempty"),
        (col("s_occupied") +
          (lit(m).cast("decimal(38,0)") - col("n_nonempty").cast("decimal(38,0)")) *
            lit(576460752303423488L).cast("decimal(38,0)")).as("s_total"))
      .select(col("b"), col("m"), col("n_nonempty"),
        (floor(lit(alpha) * lit(m.toDouble) * lit(m.toDouble) *
          lit(5.76460752303423488e17) / col("s_total").cast("double") * 100 + 0.5) / 100)
          .as("est_hll"))
  }
}
