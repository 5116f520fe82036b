package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Functions

/** Text-quality operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions (whole-stage codegen; zero UDF boxing except the
  * single-pass fingerprint expression).
  */
object TextAnalysis {

  /** Stopword marker sets per language — tiny fixed lists keep the
    * heuristic deterministic and oracle-checkable. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "la", "los", "que", "es", "un", "una", "en"))

  /** n-gram/stopword language ID: count tokens hitting each language's
    * stopword set; winner = max count (ties + all-zero -> "und").
    * Deterministic tie-break: lexicographically smallest language. */
  def langId(text: Column): Column = {
    val toks = split(Functions.norm_text(text), " ")
    val ordered = stopwords.keys.toSeq.sorted
    val scores = ordered.zipWithIndex.map { case (lang, i) =>
      val cnt = size(filter(toks, t => t.isin(stopwords(lang).map(lit(_)): _*)))
      // pref makes the lexicographically SMALLEST lang win score ties
      struct(cnt.as("score"), lit(ordered.size - 1 - i).as("pref"), lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("score") <= 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Per-doc quality features + a composite score in [0,1]:
    * word stats, stopword ratio, punctuation density, repetition.
    * Ratios use floor(x*1e4+0.5)/1e4 (HALF_UP), never round(): Spark
    * round is HALF_UP but DuckDB's is half-even on exact halfway
    * doubles — the floor form is identical in both engines. */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def r4(c: Column): Column = floor(c * 1e4 + 0.5) / 1e4
    val toks = split(Functions.norm_text(col(textCol)), " ")
    val nWords = size(toks)
    val nChars = length(col(textCol))
    val allStop = stopwords.values.flatten.toSeq.distinct
    val stopRatio = size(filter(toks, t => t.isin(allStop.map(lit(_)): _*)))
      .cast("double") / greatest(nWords, lit(1))
    val punctRatio = (nChars - length(regexp_replace(col(textCol), "[\\p{Punct}]", "")))
      .cast("double") / greatest(nChars, lit(1))
    val distinctRatio = size(array_distinct(toks)).cast("double") / greatest(nWords, lit(1))
    val meanWordLen = (length(regexp_replace(col(textCol), "\\s+", "")))
      .cast("double") / greatest(nWords, lit(1))
    docs.select(col(idCol),
      nWords.as("n_words"),
      r4(stopRatio).as("stopword_ratio"),
      r4(punctRatio).as("punct_ratio"),
      r4(distinctRatio).as("distinct_ratio"),
      r4(meanWordLen).as("mean_word_len"),
      // composite: long enough, not punct-soup, lexically diverse
      r4(least(lit(1.0), nWords.cast("double") / 50) * (lit(1.0) - punctRatio)
        * distinctRatio).as("quality_score"))
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(split(Functions.norm_text(text), " "))

  /** BPE-ish subword count: word tokens are split into runs of
    * letters / digits / single punctuation (a common pre-tokenizer
    * regex shape), counted via regexp extraction. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"), lit(0)))

  /** Order-sensitive rolling-hash fingerprint (native expression). */
  def fingerprint(text: Column): Column = Functions.doc_fingerprint(text)

  // ---- PII redaction ----------------------------------------------
  // Patterns are deliberately restricted to the regex subset with
  // identical semantics in Java regex and RE2 (char classes, bounded
  // repeats, \b, ASCII \d) so the operator stays oracle-checkable in
  // any engine. Applied in order: emails first (their domains contain
  // dots that would otherwise half-match the IP pattern), then IPv4,
  // then long digit runs (card/account numbers).

  private[ops] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[ops] val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[ops] val LongNumRe = "\\b\\d{13,16}\\b"

  /** Redact emails / IPv4s / 13-16 digit runs, counting each kind.
    * Map-only (pure column expressions, whole-stage codegen), the
    * right shape for a 100 TB scrub pass.
    * @return (redacted, n_emails, n_ips, n_longnums) columns to
    *         select alongside the caller's id. */
  def piiRedact(text: Column): Seq[Column] = {
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    val afterNum = regexp_replace(afterIp, LongNumRe, "<NUM>")
    Seq(
      afterNum.as("redacted"),
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))).as("n_ips"),
      size(regexp_extract_all(afterIp, lit(LongNumRe), lit(0))).as("n_longnums"))
  }

  // ---- repetition signals (Gopher-rules family) -------------------

  /** Per-doc line-repetition report: (id, n_lines, dup_line_frac,
    * dup_line_char_frac), fractions floor-rounded to 4dp (the
    * engine-unambiguous rounding used by every oracle-compared
    * ratio). Single native-expression pass per row — a per-doc
    * quality signal must stay map-only; never explode + groupBy the
    * corpus for it. */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def r4(c: Column): Column = floor(c * 1e4 + 0.5) / 1e4
    val st = Functions.repetition_stats(col(textCol))
    docs.select(col(idCol), st.as("st"))
      .select(col(idCol),
        col("st.n_lines").as("n_lines"),
        r4(col("st.dup_line_frac")).as("dup_line_frac"),
        r4(col("st.dup_line_char_frac")).as("dup_line_char_frac"))
  }

  /** CORPUS-level duplicated-n-gram fraction — the cross-document
    * complement of [[repetition]] (which sees one doc at a time): per
    * document, the fraction of its DISTINCT n-grams (word_shingles
    * dedups within a doc) found in more than `threshold` documents
    * corpus-wide — i.e. the document-frequency boilerplate signal.
    * High fractions mark template/mirror documents that per-doc
    * signals miss (each copy looks clean in isolation). Docs with
    * fewer than n tokens have no n-grams and are absent.
    *
    * Two keyed shuffles: the n-gram frequency groupBy (map-side
    * partial agg) and the join back — both keyed on xxhash64(shingle)
    * rather than the shingle STRING (guide §2.3 "narrower types":
    * 8-byte fixed keys instead of ~30-byte strings on both shuffle
    * sides; a collision would need ~2^32 distinct shingles to reach
    * even 50% birthday odds, and the df threshold makes a single
    * collision's effect a one-count overstatement — negligible at
    * these thresholds, and value-verified against the exact-string
    * DuckDB oracle on the driver's data). For the form that drops the
    * df shuffle entirely see [[dupNgramFractionCms]] — the Count-Min
    * probe with this exact form as the oracle-checkable ground truth.
    */
  def dupNgramFraction(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Long = 1): DataFrame = {
    def r4(c: Column): Column = floor(c * 1e4 + 0.5) / 1e4
    val occ = docs.select(col(idCol),
        explode(Functions.word_shingles(col(textCol), n)).as("_sh"))
      .select(col(idCol), xxhash64(col("_sh")).as("shingle"))
    val freq = occ.groupBy(col("shingle")).agg(count(lit(1)).as("corpus_n"))
    occ.join(freq, "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("corpus_n") > threshold, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_fraction",
        r4(col("n_dup").cast("double") / col("n_ngrams")))
  }

  /** Count-Min variant of [[dupNgramFraction]] — the genuinely
    * map-only 100 TB form that operator's scaladoc promises: the
    * per-shingle document frequency is read from a broadcast
    * Count-Min table (≤ d·2^wBits rows REGARDLESS of corpus size)
    * instead of the exact df groupBy + join-back, so after the
    * cell-bounded sketch build the probe pass is d broadcast hash
    * joins over the exploded shingles — never a corpus-keyed df
    * shuffle — followed by the one unavoidable per-doc aggregation.
    * CMS estimates only ever overcount (est ≥ true df), so
    * dup_fraction_cms ≥ dup_fraction_exact per document; the catalog
    * query pins both side by side.
    */
  def dupNgramFractionCms(docs: DataFrame, idCol: String, textCol: String,
                          n: Int = 3, threshold: Long = 1,
                          d: Int = 4, wBits: Int = 12): DataFrame = {
    def r4(c: Column): Column = floor(c * 1e4 + 0.5) / 1e4
    val occ = docs.select(col(idCol),
      explode(Functions.word_shingles(col(textCol), n)).as("shingle"))
    val cms = Sketches.countMinOverTokens(
      occ.select(col("shingle").as("token")), "token", d, wBits)
    // d broadcast left joins (one per sketch row), then least():
    // missing cell -> 0 occurrences hashed there -> estimate 0
    val mask = (1L << wBits) - 1
    var probed = occ.withColumn("_h", Functions.hash64_str(col("shingle")))
    val cnts = (0 until d).map { j =>
      val cj = cms.filter(col("row") === j)
        .select(col("pos").as(s"_pos_$j"), col("cnt").as(s"_cnt_$j"))
      probed = probed
        .withColumn(s"_pos_$j",
          shiftrightunsigned(col("_h"), j * wBits).bitwiseAND(lit(mask)))
        .join(broadcast(cj), Seq(s"_pos_$j"), "left")
      coalesce(col(s"_cnt_$j"), lit(0L))
    }
    val cmsDf = if (cnts.size == 1) cnts.head else least(cnts: _*)
    probed.withColumn("cms_df", cmsDf)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("cms_df") > threshold, 1L).otherwise(0L)).as("n_dup_cms"))
      .withColumn("dup_fraction_cms",
        r4(col("n_dup_cms").cast("double") / col("n_ngrams")))
  }

  /** Fixed-size token-window chunking with stride overlap — the
    * standard long-document preprocessing step before embedding or
    * context packing (each chunk keeps `chunkTokens - stride` tokens
    * of left context). Emits one row per (doc, window):
    * (id, chunk_idx, chunk_text, chunk_tokens).
    *
    * Window count = 1 + ceil(max(0, n - chunkTokens) / stride), so a
    * short document yields exactly one (possibly partial) chunk and
    * the final window is allowed to be partial — no token is dropped
    * and none duplicated beyond the declared overlap.
    *
    * 100 TB shape: pure column expressions (split + explode(sequence)
    * + slice) — map-only, no shuffle, whole-stage codegen; output
    * row count is input tokens / stride, a declared linear expansion
    * (same class as word_shingles), never data-dependent blowup.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens, got chunkTokens=$chunkTokens stride=$stride")
    // null text yields NO chunks (Spark's greatest/least skip nulls,
    // so an unguarded null row would emit one chunk_text=null row with
    // chunk_tokens=chunkTokens — overstating a document that has no
    // tokens at all, against the "no token dropped, none invented"
    // contract). The filter is map-only and keeps the single codegen
    // span (plan-asserted in PlanSpec).
    val guarded = docs.filter(col(textCol).isNotNull)
    val toks = split(trim(col(textCol)), "\\s+")
    // integer ceil-div staged as floor((extra + stride-1)/stride);
    // doubles are exact here (token counts << 2^53)
    val extra = greatest(size(toks) - chunkTokens, lit(0))
    val nChunks =
      (lit(1) + floor((extra + lit(stride - 1)) / lit(stride))).cast("int")
    guarded.select(col(idCol), toks.as("_toks"), size(toks).as("_n"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("_toks"), col("chunk_idx") * stride + 1,
          lit(chunkTokens)), " ").as("chunk_text"),
        least(col("_n") - col("chunk_idx") * stride, lit(chunkTokens))
          .as("chunk_tokens"))
  }
}
