package graft.dict

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary artifacts prepared ONCE and reused across pipeline
  * runs: the broadcast automaton, the cascade resolution table, the
  * TF-IDF surface token index, the normalized KNN matrix, the
  * definition-embedding matrix, and the canonicalization map. In
  * production the dictionary changes rarely while transcripts arrive
  * forever — every per-batch job should pay zero dictionary-derivation
  * cost (it is serial, driver-coordinated work that otherwise caps
  * scaling efficiency).
  */
final case class PreparedDict(
    dict: ConceptDict,
    automaton: Broadcast[AhoCorasick],
    resolution: DataFrame,                       // (norm, code, stage) winner
    fuzzySurfaces: DataFrame,                    // (norm, code, ctype) unified term-search table
    fuzzyTokens: DataFrame,                      // (ctype, code, surf_norm, token, idf, surf_w)
    fuzzyTokensAny: DataFrame,                   // same, deduped across ctype (no ctype col)
    idfTable: DataFrame,                         // (token, idf) — distinct, for query-side weighting
    maxIdf: Double,                              // idf assigned to tokens unseen in the dictionary
    bm25Tokens: DataFrame,                       // (ctype, code, surf_norm, token, contrib) — quantized
                                                 // per-token BM25 contribution (k1/b saturation baked in)
    bm25TokensAny: DataFrame,                    // same, deduped across ctype (no ctype col)
    bm25Idf: DataFrame,                          // (token, idf) — BM25 idf, for query-side self-score
    bm25MaxIdf: Double,                          // BM25 idf at df=0 (unseen query tokens)
    bm25N: Long,                                 // distinct surfaces (BM25 "N docs")
    bm25TotalTok: Long,                          // Σ token count over distinct surfaces (avgdl = total/N)
    vecs: Broadcast[Array[(String, Array[Float])]], // L2-normalized, terms >= MinCosineLen chars
    surfaces: Broadcast[SurfaceLengthIndex],        // length-bucketed (norm, code) edit-distance index
    defs: Broadcast[Array[(String, String, String, String, Array[Float])]],
                                                 // (ctype, code, term, definition, defVec) — raw
                                                 // (un-normalized) vectors for double-exact cosine
    canonical: DataFrame,                        // (code, canonical)
    dictTriples: DataFrame)                      // (subj, pred, obj) — dictionary-derived
                                                 // MAPS_TO / HAS_SYNONYM / SAME_AS edges

/** Length-bucketed (norm surface, code) index for the bounded-edit-
  * distance ladder stage: `byLen(L)` holds every surface of exactly
  * L chars. A residue mention of length n compares only against
  * buckets n-2..n+2 (the edit cutoff — any surface outside them is
  * unreachable within distance 2), turning the per-mention scan from
  * O(|dictionary|) into O(|surfaces within +-2 of n|). Output is
  * identical to the flat scan: the flat version skipped exactly these
  * surfaces via a per-element length guard, and the per-code max it
  * feeds is order-independent. */
final class SurfaceLengthIndex(val byLen: Array[Array[(String, String)]])
    extends Serializable {
  @inline def bucket(len: Int): Array[(String, String)] =
    if (len >= 0 && len < byLen.length) byLen(len)
    else SurfaceLengthIndex.EmptyBucket
  def totalSurfaces: Int = { var n = 0; byLen.foreach(n += _.length); n }
}

object SurfaceLengthIndex {
  private val EmptyBucket = Array.empty[(String, String)]
  def build(surfaces: Array[(String, String)]): SurfaceLengthIndex = {
    val maxLen = surfaces.foldLeft(0)((m, s) => math.max(m, s._1.length))
    val buckets = Array.fill(maxLen + 1)(
      scala.collection.mutable.ArrayBuffer.empty[(String, String)])
    surfaces.foreach(s => buckets(s._1.length) += s)
    new SurfaceLengthIndex(buckets.map(_.toArray))
  }
}

object PreparedDict {

  /** Terms shorter than this get NO cosine matching: <6 chars yield
    * 1-3 char-trigram features, where a single hash collision reads
    * as cosine 0.5-1.0 — short surfaces are matched exactly or by
    * bounded edit distance instead (measured: every spurious semantic
    * link in the fixture corpus came from this collision class). */
  val MinCosineLen = 6

  def prepare(spark: SparkSession, dict: ConceptDict): PreparedDict = {
    import spark.implicits._
    val ac = dict.broadcastAutomaton(spark)
    val resolution = graft.link.MatchLadder.resolutionTable(spark, dict)
      .cache()
    resolution.count() // materialize now, not inside the first batch

    // unified term-search surface table WITH a node-type column, so a
    // type-filtered search ("only CDEs") is one predicate — mirrors the
    // reference's single ftTermIndex spanning all labels + `type`
    // property (tests/test_neoretrievers.py:22-31)
    def normTerm = graft.Functions.norm_text($"term").as("norm")
    val fuzzy = dict.ncit.select(normTerm, $"code", lit("NCIT").as("ctype"))
      .unionByName(dict.pv.select(normTerm, $"code", lit("PV").as("ctype")))
      .unionByName(dict.cde.select(normTerm, $"code", lit("CDE").as("ctype")))
      .unionByName(dict.synonyms.select(normTerm, $"code", lit("SYN").as("ctype")))
      .distinct().cache()
    fuzzy.count()

    // TF-IDF token index over the surface table — deterministic
    // stand-in for the reference's Lucene BM25 full-text scores
    // (exact_match.py:143-154): idf(t) = ln(1 + N/df(t)) with df =
    // number of distinct surfaces containing t, N = distinct surfaces.
    // surf_w = Σ idf over a surface's tokens (weighted-Jaccard mass).
    // idf is QUANTIZED to 2^-20 steps: dyadic rationals add exactly,
    // so weight sums are independent of partial-aggregation order —
    // scores stay bit-identical across partitionings and vs SQL oracles.
    val Q = (1 << 20).toDouble
    val nSurf = fuzzy.select($"norm").distinct().count()
    val maxIdf = math.floor(math.log1p(nSurf.toDouble) * Q + 0.5) / Q
    val surfTok = fuzzy
      .withColumn("toks", array_distinct(split($"norm", " ")))
      .select($"ctype", $"code", $"norm".as("surf_norm"), explode($"toks").as("token"))
    val idf = surfTok.select($"surf_norm", $"token").distinct()
      .groupBy($"token").agg(count(lit(1)).as("df"))
      .select($"token",
        (floor(log(lit(1.0) + lit(nSurf.toDouble) / $"df") * Q + 0.5) / Q).as("idf"))
    val fuzzyTokens = surfTok.join(idf, "token")
      .withColumn("surf_w",
        sum($"idf").over(Window.partitionBy($"ctype", $"code", $"surf_norm")))
      .select($"ctype", $"code", $"surf_norm", $"token", $"idf", $"surf_w")
      .cache()
    fuzzyTokens.count()
    val fuzzyTokensAny = fuzzyTokens
      .select($"code", $"surf_norm", $"token", $"idf", $"surf_w")
      .distinct().cache()
    fuzzyTokensAny.count()
    val idfTable = idf.cache()
    idfTable.count()

    // BM25 token index — the true Lucene-relevance twin of the
    // reference's ftTermIndex (exact_match.py:143-154), replacing the
    // weighted-Jaccard stand-in as the ladder's stage-4 scorer:
    //   idf(t)      = ln(1 + (N − df + ½)/(df + ½))        (Lucene BM25 idf)
    //   contrib(t,S)= idf(t)·(tf·(k1+1))/(tf + k1·(1−b+b·dl/avgdl))
    // with k1 = 1.25 and b = 0.75 — NONSTANDARD on purpose: both are
    // dyadic rationals, so 2.25, 1.25, 0.25, 0.75 are exact double
    // literals in every engine (1.2 is not), and dl/avgdl is computed
    // as the exact integer ratio (dl·N)/totalTok before ONE IEEE
    // division. idf and contrib are quantized to 2^-20 steps: the
    // per-surface score is then a sum of dyadic rationals — exact,
    // order-independent, bit-identical across partitionings and
    // engines. tf = term frequency within the surface (k1 saturation),
    // dl = surface token count (b length normalization).
    val surfTokTf = fuzzy
      .withColumn("toks", split($"norm", " "))
      .select($"ctype", $"code", $"norm".as("surf_norm"),
        size($"toks").as("dl"), explode($"toks").as("token"))
      .groupBy($"ctype", $"code", $"surf_norm", $"dl", $"token")
      .agg(count(lit(1)).as("tf"))
    val totalTok = fuzzy.select($"norm").distinct()
      .select(size(split($"norm", " ")).as("dl"))
      .agg(sum($"dl".cast("long"))).head().getLong(0)
    def bm25IdfOf(dfCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(log(lit(1.0) +
        (lit(nSurf.toDouble) - dfCol + lit(0.5)) / (dfCol + lit(0.5))) * Q + 0.5) / Q
    val bm25Idf = surfTokTf.select($"surf_norm", $"token").distinct()
      .groupBy($"token").agg(count(lit(1)).as("df"))
      .select($"token", bm25IdfOf($"df".cast("double")).as("idf"))
    val bm25MaxIdf = { // df = 0: the weight of a query token unseen in
      // the dictionary. log(1.0 + x), NOT log1p(x): must be the same
      // double expression the Column/SQL forms evaluate.
      val n = nSurf.toDouble
      math.floor(math.log(1.0 + (n - 0.0 + 0.5) / (0.0 + 0.5)) * Q + 0.5) / Q
    }
    val lennorm = lit(0.25) +
      lit(0.75) * (($"dl".cast("long") * lit(nSurf)).cast("double") /
        lit(totalTok.toDouble))
    val bm25Tokens = surfTokTf.join(bm25Idf, "token")
      .withColumn("contrib",
        floor($"idf" * (($"tf".cast("double") * lit(2.25)) /
          ($"tf".cast("double") + lit(1.25) * lennorm)) * Q + 0.5) / Q)
      .select($"ctype", $"code", $"surf_norm", $"token", $"contrib")
      .cache()
    bm25Tokens.count()
    val bm25TokensAny = bm25Tokens
      .select($"code", $"surf_norm", $"token", $"contrib")
      .distinct().cache()
    bm25TokensAny.count()
    val bm25IdfTable = bm25Idf.cache()
    bm25IdfTable.count()

    val dictVecs = dict.ncit.select(graft.Functions.norm_text($"term").as("norm"), $"code", $"embedding")
      .unionByName(dict.pv.select(graft.Functions.norm_text($"term").as("norm"), $"code", $"embedding"))
      .unionByName(dict.cde.select(graft.Functions.norm_text($"term").as("norm"), $"code", $"embedding"))
      .filter(length($"norm") >= MinCosineLen)
      .select($"code", $"embedding")
      .as[(String, Array[Float])].collect()
      .sortBy(_._1).map { case (c, v) => (c, l2(v)) }
    val bcVecs = spark.sparkContext.broadcast(dictVecs)

    // all linkable surfaces for the bounded-edit-distance scan,
    // bucketed by length: a mention only ever scans lengths within
    // the edit cutoff (+-2) — ~20-50x fewer candidate iterations than
    // a flat scan on a 10^5-surface dictionary, identical output
    val surfArr = fuzzy.select($"norm", $"code")
      .distinct().as[(String, String)].collect().sortBy(identity)
    val bcSurf = spark.sparkContext.broadcast(SurfaceLengthIndex.build(surfArr))

    // definition-embedding matrix for the description retrievers
    // (reference cdeIndex/ncitIndex over node.definition,
    // semantic_retrievers.py:129-205). Vectors kept RAW (un-normalized)
    // so per-pair double cosine is bit-exact vs a SQL oracle.
    val defArr = dict.ncit.select($"code", $"term", $"definition", lit("NCIT").as("ctype"))
      .unionByName(dict.cde.select($"code", $"term", $"definition", lit("CDE").as("ctype")))
      .filter($"definition".isNotNull)
      .as[(String, String, String, String)].collect()
      .sortBy { case (code, _, _, ctype) => (ctype, code) }
      .map { case (code, term, defn, ctype) =>
        (ctype, code, term, defn, graft.functions.Vectorizer.vectorizeChar(defn))
      }
    val bcDefs = spark.sparkContext.broadcast(defArr)

    val canonical = graft.canon.Canonicalizer.canonicalMap(spark, dict).cache()
    canonical.count()
    // dictionary-derived triples are STATIC per dictionary: derive the
    // MAPS_TO chain flatten, the BASE structural edges (HAS_CONCEPT /
    // HAS_VDM / HAS_PV / HAS_DEC / HAS_OC — the reference's serving
    // graph must be reconstructible from the output tables alone),
    // synonym edges, and canonical merges once here, not once per
    // transcript batch (a per-batch pipeline run must only pay
    // corpus-proportional work)
    val dictTriples = graft.triples.Triples.mapsTo(spark, dict)
      .unionByName(graft.triples.Triples.hasSynonym(spark, dict))
      .unionByName(graft.triples.Triples.sameAs(canonical))
      .unionByName(graft.triples.Triples.baseEdges(spark, dict))
      .cache()
    dictTriples.count()
    PreparedDict(dict, ac, resolution, fuzzy, fuzzyTokens, fuzzyTokensAny,
      idfTable, maxIdf, bm25Tokens, bm25TokensAny, bm25IdfTable, bm25MaxIdf,
      nSurf, totalTok, bcVecs, bcSurf, bcDefs, canonical, dictTriples)
  }

  private[graft] def l2(v: Array[Float]): Array[Float] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    if (n == 0.0) v
    else { val inv = (1.0 / math.sqrt(n)).toFloat
      val out = new Array[Float](v.length)
      i = 0; while (i < v.length) { out(i) = v(i) * inv; i += 1 }; out }
  }
}
