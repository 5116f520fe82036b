package graft.functions

/** Deterministic hashing primitives shared by the vectorizer, MinHash,
  * SimHash and the document fingerprinter. All pure, seed-fixed, no
  * wall-clock — results are identical across JVMs, partitionings and
  * parallelism levels (required for the engine's determinism
  * invariants, SURVEY.md §7.4).
  */
object Hashing {

  /** FNV-1a 64-bit over UTF-8 bytes. Public-domain algorithm. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit finalizer (splitmix64) — decorrelates fnv output bits. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hash64(s: String): Long = mix64(fnv1a64(s))

  // precompiled: String.split/replaceAll with a multi-char regex
  // compile the Pattern on EVERY call — norm() runs once per detected
  // mention, making per-call Pattern.compile the hottest wasted work
  // in the whole pipeline (it dominated stack samples of the
  // mention-detect stage)
  private val NonAlnumRun = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  /** Word tokenizer: lowercase, split on non-letter/digit runs. */
  def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else NonAlnumRun.split(text.toLowerCase).filter(_.nonEmpty)

  @inline private def isWs(c: Char): Boolean = // Java regex \s exactly
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Normalized surface form used for all dictionary keys:
    * lowercase, trim, collapse inner whitespace. Mirrors the
    * reference's toLower + strip normalization
    * (reference exact_match.py:76,80). Allocation-free when already
    * normalized; byte-identical to the previous
    * `replaceAll("\\s+", " ")` (each \s-run becomes one space). */
  def norm(s: String): String = {
    if (s == null) return ""
    val t = s.trim.toLowerCase
    var i = 0
    var needs = false
    while (i < t.length && !needs) {
      val c = t.charAt(i)
      if (isWs(c) && (c != ' ' ||
          (i + 1 < t.length && isWs(t.charAt(i + 1))))) needs = true
      i += 1
    }
    if (!needs) return t
    val sb = new java.lang.StringBuilder(t.length)
    i = 0
    var prevWs = false
    while (i < t.length) {
      val c = t.charAt(i)
      if (isWs(c)) { if (!prevWs) sb.append(' '); prevWs = true }
      else { sb.append(c); prevWs = false }
      i += 1
    }
    sb.toString
  }

  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  /** Tokenization matching the SQL composition
    * `split(regexp_replace(lower(trim(text)), "\\s+", " "), " ", -1)`
    * BYTE-EXACTLY, including its edges: trim strips ' ' (0x20) only
    * (Spark/DuckDB `trim`, NOT Java `String.trim`), a leading or
    * trailing non-space whitespace run therefore yields an EMPTY
    * token, and the empty string yields `[""]`. Needed so the native
    * [[WordShingles]] expression is oracle-twinnable with the same
    * DuckDB SQL as the Column form it replaces. */
  def sqlNormTokens(text: String): Array[String] = {
    var b = 0
    var e = text.length
    while (b < e && text.charAt(b) == ' ') b += 1
    while (e > b && text.charAt(e - 1) == ' ') e -= 1
    WsRun.split(text.substring(b, e).toLowerCase, -1)
  }

  /** Distinct word n-gram shingles over [[sqlNormTokens]], first
    * occurrence order; fewer than n tokens -> empty (the SQL
    * `CASE WHEN size(toks) < n THEN array()` contract — unlike
    * [[wordShingles]], which falls back to one whole-text shingle).
    * Single pass: this exists because the equivalent
    * `transform(sequence(...), i => array_join(slice(toks, i, n)))`
    * Column tree re-evaluates the full normalize+split per lambda
    * element (O(tokens) regexes per row) and again in every pushed
    * filter that references the alias. */
  def sqlWordShingles(text: String, n: Int): Array[String] = {
    val toks = sqlNormTokens(text)
    if (toks.length < n) Array.empty
    else {
      val seen = new java.util.LinkedHashSet[String]
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      seen.toArray(new Array[String](seen.size))
    }
  }

  /** Character k-gram shingles of the normalized text. */
  def charShingles(text: String, k: Int): Array[String] = {
    val t = norm(text)
    if (t.length < k) { if (t.isEmpty) Array.empty else Array(t) }
    else Array.tabulate(t.length - k + 1)(i => t.substring(i, i + k))
  }

  /** Word n-gram shingles. */
  def wordShingles(text: String, n: Int): Array[String] = {
    val toks = tokenize(text)
    if (toks.length < n) { if (toks.isEmpty) Array.empty else Array(toks.mkString(" ")) }
    else Array.tabulate(toks.length - n + 1)(i => toks.slice(i, i + n).mkString(" "))
  }

  /** MinHash signature of a shingle set: numHashes independent
    * permutations h_i(x) = mix64(x ^ seed_i), signature_i = min.
    * Empty set => all Long.MaxValue. */
  def minHash(shingles: Iterator[String], numHashes: Int): Array[Long] = {
    val seeds = minHashSeeds(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    while (shingles.hasNext) {
      val base = hash64(shingles.next())
      var i = 0
      while (i < numHashes) {
        val h = mix64(base ^ seeds(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  private def minHashSeeds(n: Int): Array[Long] = {
    // deterministic seed stream via splitmix64 from a fixed root
    val out = new Array[Long](n)
    var s = 0x5eed5eed5eed5eedL
    var i = 0
    while (i < n) { s = mix64(s); out(i) = s; i += 1 }
    out
  }

  /** 64-bit SimHash over the token multiset. */
  def simHash64(tokens: Iterator[String]): Long = {
    val acc = new Array[Int](64)
    while (tokens.hasNext) {
      val h = hash64(tokens.next())
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Polynomial rolling-hash fingerprint of the raw text (document
    * identity fingerprint; order-sensitive unlike SimHash). */
  def rollingFingerprint(text: String): Long = {
    var h = 1125899906842597L // prime
    var i = 0
    val n = if (text == null) 0 else text.length
    while (i < n) { h = 31 * h + text.charAt(i); i += 1 }
    h
  }
}
