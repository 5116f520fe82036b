package graft.link

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dict.ConceptDict
import graft.functions.Vectorizer
import graft.model.{Link, Mention}

/** The de-LLM-ed priority cascade (reference llm_agent_4o.py:485-508:
  * exact -> fuzzy -> synonym -> semantic -> definition), computed
  * SET-BASED over all mentions at once instead of one agent
  * round-trip per value (SURVEY.md §2.9). Stages:
  *
  *   1 exact code lookup        (reference exact_match.py:17-65,  P1)
  *   2 exact normalized term    (reference exact_match.py:67-120, P2)
  *   3 synonym surface          (reference synonym_tool.py:19-88, J1/J2)
  *   4 fuzzy TF-IDF top-k       (reference exact_match.py:122-180, W2)
  *   5 semantic KNN top-k       (reference semantic_retrievers.py:62-76, W1)
  *   6 definition-embedding search for multi-word DESCRIPTIONS
  *     (reference semantic_retrievers.py:129-205; the agent routes
  *     "a phrase ... over 4 words" here, llm_agent_4o.py:507)
  *
  * Scale architecture: the cascade winner for stages 1-3 depends only
  * on the mention's normalized surface, so the priority selection is
  * PRECOMPUTED on the dictionary side ([[resolutionTable]]: per
  * surface, min stage then min code) and applied to the mention
  * stream as ONE broadcast hash left join — the entire exact cascade
  * is map-only: no shuffle, no window, no anti-join over the corpus.
  * Only the unresolved residue (raw values: misspellings, junk —
  * a small fraction by construction) enters the fuzzy/semantic
  * stages, whose top-k windows therefore shuffle only residue-sized
  * data. Winner ordering is pinned deterministic everywhere
  * (stage ASC, score DESC, code ASC; SURVEY.md §7.4).
  *
  * Confidence bands per reference test_semantic_retrievers.py:270-276:
  * exact/synonym stages -> "high"; semantic/fuzzy: >0.95 high,
  * >0.85 good, else low.
  */
object MatchLadder {

  val DefaultFuzzyK = 5       // reference exact_match.py:122 default limit
  val DefaultSemanticK = 3    // reference llm_agent_4o.py:252 agent top_k
  val DefaultFuzzyMin = 0.34
  val DefaultSemanticMin = 0.5
  /** Minimum word count for the definition stage — the reference
    * routes "a phrase ... over 4 words" to definition search
    * (llm_agent_4o.py:507). */
  val DefinitionMinWords = 5

  private val mentionKey = Seq("conv_id", "turn_idx", "begin", "end")

  /** Dictionary-side cascade resolution: norm surface ->
    * (code, stage) winner under (stage ASC, code ASC). Stage 1 rows
    * are the codes themselves as surfaces (exact code lookup). */
  def resolutionTable(spark: SparkSession, dict: ConceptDict): DataFrame = {
    import spark.implicits._
    val codes = dict.ncit.select($"code")
      .unionByName(dict.pv.select($"code"))
      .unionByName(dict.cde.select($"code"))
      .select(lower($"code").as("norm"), $"code", lit(1).as("stage"))
    val terms = dict.ncit.select(graft.Functions.norm_text($"term").as("norm"), $"code")
      .unionByName(dict.pv.select(graft.Functions.norm_text($"term").as("norm"), $"code"))
      .unionByName(dict.cde.select(graft.Functions.norm_text($"term").as("norm"), $"code"))
      .withColumn("stage", lit(2))
    val syns = dict.synonyms
      .select(graft.Functions.norm_text($"term").as("norm"), $"code", lit(3).as("stage"))
    val w = Window.partitionBy($"norm").orderBy($"stage".asc, $"code".asc)
    codes.unionByName(terms).unionByName(syns)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"norm", $"code", $"stage")
  }

  /** Slow-path convenience: prepares dictionary artifacts inline.
    * Production / benchmarks should [[graft.dict.PreparedDict.prepare]]
    * once and call the overload below. */
  def link(spark: SparkSession, mentions: Dataset[Mention], dict: ConceptDict,
           fuzzyK: Int = DefaultFuzzyK, semanticK: Int = DefaultSemanticK,
           fuzzyMin: Double = DefaultFuzzyMin,
           semanticMin: Double = DefaultSemanticMin): Dataset[Link] =
    link(spark, mentions, graft.dict.PreparedDict.prepare(spark, dict),
      fuzzyK, semanticK, fuzzyMin, semanticMin)

  def link(spark: SparkSession, mentions: Dataset[Mention],
           prepared: graft.dict.PreparedDict,
           fuzzyK: Int, semanticK: Int,
           fuzzyMin: Double,
           semanticMin: Double): Dataset[Link] = {
    import spark.implicits._

    val m = mentions.toDF()

    // --- stages 1-3 in one broadcast join (map-only over the corpus) ---
    val resolution = prepared.resolution
    val resolved = m.join(broadcast(resolution), Seq("norm"), "left")
    val exactLinks = resolved.filter($"code".isNotNull)
      .select((mentionKey.map(col) :+ $"surface" :+ $"code" :+ $"stage" :+
        lit(1.0).as("score")): _*)
    // residue: raw values the dictionary can't resolve exactly
    val unmatched = resolved.filter($"code".isNull)
      .select((mentionKey.map(col) :+ $"surface" :+ $"norm"): _*)

    // --- stage 4: BM25 full-text top-k (W2 — the deterministic twin
    //     of the reference's Lucene relevance, exact_match.py:143-154,
    //     with true k1 saturation + b length normalization; scores
    //     self-normalized to [0,~1] so fuzzyMin and the confidence
    //     bands keep their scale). Inverted-index join against the
    //     broadcast surface token index; shuffles only residue-sized
    //     data. ---
    val s4 = bm25TopK(spark,
        unmatched.select((mentionKey.map(col) :+ $"surface" :+ $"norm"): _*),
        mentionKey :+ "surface", prepared, fuzzyK, fuzzyMin)
      .select((mentionKey.map(col) :+ $"surface" :+ $"code" :+
        lit(4).as("stage") :+ $"score"): _*)

    // --- stage 5: semantic + surface-similarity KNN (W1) — broadcast
    //     brute-force replacing Neo4j db.index.vector.queryNodes;
    //     per-row top-k inside flatMap, no shuffle, no materialized
    //     cross join. Runs on the whole residue (not anti-joined with
    //     s4: the priority window below prefers stage 4 anyway, and
    //     skipping the anti-join saves a shuffle).
    //     Hybrid score per code = max(trigram cosine, bounded-edit
    //     similarity): cosine carries longer surfaces, edit distance
    //     carries short ones where trigram signals are unstable (both
    //     sides gated at MinCosineLen for the cosine path). ---
    val bcVecs = prepared.vecs
    val bcSurf = prepared.surfaces
    val k = semanticK
    val minS = semanticMin
    val minCosLen = graft.dict.PreparedDict.MinCosineLen
    val s5 = unmatched
      .select($"conv_id", $"turn_idx", $"begin", $"end", $"surface", $"norm")
      .as[(String, Int, Int, Int, String, String)]
      .flatMap { case (cid, ti, b, e, surf, norm) =>
        val best = scala.collection.mutable.HashMap.empty[String, Double]
        if (norm.length >= minCosLen) {
          val q = Vectorizer.vectorizeChar(norm)
          BroadcastKnn.topK(q, bcVecs.value, k, minS).foreach { case (code, score) =>
            val cur = best.getOrElse(code, 0.0)
            if (score > cur) best(code) = score
          }
        }
        // bounded edit distance (cutoff 2) over the length-bucketed
        // surface index: only lengths within +-2 are reachable, so
        // only those buckets are scanned (SurfaceLengthIndex scaladoc)
        val idx = bcSurf.value
        var len = math.max(0, norm.length - 2)
        val maxLen = norm.length + 2
        while (len <= maxLen) {
          val surfaces = idx.bucket(len)
          var i = 0
          while (i < surfaces.length) {
            val (snorm, code) = surfaces(i)
            val d = graft.functions.EditDistance.bounded(norm, snorm, 2)
            if (d > 0) { // d == 0 impossible: exact surfaces resolved at stages 1-3
              val sim = 1.0 - d.toDouble / math.max(norm.length, snorm.length)
              if (sim >= minS && sim > best.getOrElse(code, 0.0)) best(code) = sim
            }
            i += 1
          }
          len += 1
        }
        best.toSeq.sortBy { case (c, s) => (-s, c) }.take(k)
          .map { case (code, score) => (cid, ti, b, e, surf, code, 5, score) }
      }
      .toDF("conv_id", "turn_idx", "begin", "end", "surface", "code", "stage", "score")

    // --- stage 6: definition-embedding search for multi-word
    //     DESCRIPTIONS (the reference's semantic_cde_definition /
    //     semantic_ncit_definition fallback, fired only for phrases
    //     over 4 words — llm_agent_4o.py:507 — and, via the priority
    //     window below, only when every surface stage missed). ---
    val bcDefs = prepared.defs
    val minWords = DefinitionMinWords
    val s6 = unmatched
      .filter(size(split($"norm", " ")) >= minWords)
      .select($"conv_id", $"turn_idx", $"begin", $"end", $"surface", $"norm")
      .as[(String, Int, Int, Int, String, String)]
      .flatMap { case (cid, ti, b, e, surf, norm) =>
        val qv = Vectorizer.vectorizeChar(norm)
        val cde = DefinitionSearch.topDefs(qv, bcDefs.value, "CDE", k)
        val ncit = DefinitionSearch.topDefs(qv, bcDefs.value, "NCIT", k)
        (cde ++ ncit).map { case (code, _, _, score) => (code, score) }
          .groupBy(_._1).map { case (c, xs) => (c, xs.map(_._2).max) }
          .filter { case (_, s) => s >= minS }
          .toSeq.sortBy { case (c, s) => (-s, c) }.take(k)
          .map { case (code, score) => (cid, ti, b, e, surf, code, 6, score) }
      }
      .toDF("conv_id", "turn_idx", "begin", "end", "surface", "code", "stage", "score")

    // --- priority selection over the residue only ---
    val w = Window.partitionBy(mentionKey.map(col): _*)
      .orderBy($"stage".asc, $"score".desc, $"code".asc)
    val residueWinners = s4.unionByName(s5).unionByName(s6)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")

    exactLinks.unionByName(residueWinners)
      .withColumn("confidence",
        when($"stage" <= 3, lit("high"))
          .when($"score" > 0.95, lit("high"))
          .when($"score" > 0.85, lit("good"))
          .otherwise(lit("low")))
      .select($"conv_id", $"turn_idx", $"begin", $"end", $"surface",
        $"code", $"stage", $"score", $"confidence")
      .as[Link]
  }

  /** IDF-weighted token-overlap top-k of `queries` against the
    * prepared surface token index — the deterministic replacement for
    * the reference's Lucene BM25 scores (exact_match.py:143-154):
    *
    *   score = Σ_{t ∈ Q∩S} idf(t) / (W_Q + W_S − Σ_{t ∈ Q∩S} idf(t))
    *
    * a weighted Jaccard in [0,1] where rare tokens dominate; query
    * tokens unseen in the dictionary weigh maxIdf = ln(1+N) (they
    * dilute the score — a misspelled token is evidence AGAINST a
    * surface, exactly like Lucene's unmatched-term penalty).
    *
    * @param queries DataFrame with `keyCols` + a `norm` column
    * @param typeFilter restrict to one node type (NCIT/PV/CDE/SYN) —
    *   the reference's ftTermIndex `type` filter
    *   (tests/test_neoretrievers.py:22-31)
    * @return keyCols + (rank, code, surf_norm, score), top-k per key
    *   under (score DESC, code ASC), best surface per (key, code). */
  def weightedFuzzyTopK(spark: SparkSession, queries: DataFrame, keyCols: Seq[String],
                        prepared: graft.dict.PreparedDict, k: Int, minScore: Double,
                        typeFilter: Option[String] = None): DataFrame = {
    import spark.implicits._
    val key = keyCols.map(col)
    val surfTok = typeFilter match {
      case Some(t) => prepared.fuzzyTokens.filter($"ctype" === t).drop("ctype")
      case None => prepared.fuzzyTokensAny
    }
    val idfMap = prepared.idfTable
    // W_Q includes tokens matching NO surface (they must dilute) —
    // carried alongside every token row via a window sum, so no
    // second query-side join is ever needed (idf values are dyadic,
    // so the sum is exact and order-independent)
    val qTok = queries
      .withColumn("toks", array_distinct(split($"norm", " ")))
      .select((key :+ explode($"toks").as("token")): _*)
      .join(broadcast(idfMap), Seq("token"), "left")
      .withColumn("w", coalesce($"idf", lit(prepared.maxIdf)))
      .withColumn("q_w", sum($"w").over(Window.partitionBy(key: _*)))
    val matched = qTok.select((key ++ Seq($"token", $"q_w")): _*)
      .join(broadcast(surfTok), "token")
      .groupBy((key ++ Seq($"code", $"surf_norm", $"surf_w", $"q_w")): _*)
      .agg(sum($"idf").as("ov_w"))
    matched
      .withColumn("score", $"ov_w" / ($"q_w" + $"surf_w" - $"ov_w"))
      .filter($"score" >= minScore)
      // best surface per (key, code), then top-k codes per key
      .withColumn("rs", row_number().over(Window.partitionBy(
        (key :+ $"code"): _*).orderBy($"score".desc, $"surf_norm".asc)))
      .filter($"rs" === 1)
      .withColumn("rank", row_number().over(Window.partitionBy(key: _*)
        .orderBy($"score".desc, $"code".asc)))
      .filter($"rank" <= k)
      .select((key ++ Seq($"rank", $"code", $"surf_norm", $"score")): _*)
  }

  /** Self-normalized BM25 top-k of `queries` against the prepared
    * BM25 surface token index — the ranking-faithful replacement for
    * [[weightedFuzzyTopK]] (which lacks tf saturation and length
    * normalization, so its ORDER can differ from Lucene's on
    * multi-word queries). Per surface S and query Q:
    *
    *   raw(Q,S)  = Σ_{t ∈ distinct(Q) ∩ S} contrib(t,S)
    *   score     = raw(Q,S) / self(Q)
    *
    * where contrib is the precomputed quantized BM25 term weight
    * (PreparedDict.bm25Tokens scaladoc: k1 = 1.25, b = 0.75, dyadic
    * 2^-20 quantization) and self(Q) is Q scored against itself as if
    * it were a surface (its own tf/dl, unseen tokens at the df=0
    * idf). The per-query constant leaves BM25's ranking untouched but
    * maps a perfect self-match to ~1, so thresholds and confidence
    * bands keep the [0,1] scale of the other ladder stages; scores
    * can slightly exceed 1 when a matched surface is shorter than
    * avgdl (BM25's length reward — pinned in the oracle).
    *
    * Raw sums are dyadic-exact and the final division is one IEEE
    * double op on exact operands: bit-identical across engines and
    * partitionings, like every other oracle-compared score.
    *
    * @param queries DataFrame with `keyCols` + a `norm` column
    * @return keyCols + (rank, code, surf_norm, score), top-k per key
    *   under (score DESC, code ASC), best surface per (key, code). */
  def bm25TopK(spark: SparkSession, queries: DataFrame, keyCols: Seq[String],
               prepared: graft.dict.PreparedDict, k: Int, minScore: Double,
               typeFilter: Option[String] = None): DataFrame = {
    import spark.implicits._
    val key = keyCols.map(col)
    val surfTok = typeFilter match {
      case Some(t) => prepared.bm25Tokens.filter($"ctype" === t).drop("ctype")
      case None => prepared.bm25TokensAny
    }
    val Q = (1 << 20).toDouble
    val n = prepared.bm25N
    val total = prepared.bm25TotalTok
    // query side: per-(key, token) tf + query length, BM25 idf with
    // unseen tokens at the df=0 weight, self-score carried on every
    // token row via a window sum (dyadic -> exact)
    val qTok = queries
      .withColumn("toks", split($"norm", " "))
      .withColumn("dl_q", size($"toks"))
      .select((key :+ $"dl_q" :+ explode($"toks").as("token")): _*)
      .groupBy((key :+ $"dl_q" :+ $"token"): _*)
      .agg(count(lit(1)).as("tf_q"))
      .join(broadcast(prepared.bm25Idf), Seq("token"), "left")
      .withColumn("w", coalesce($"idf", lit(prepared.bm25MaxIdf)))
      .withColumn("lennorm_q",
        lit(0.25) + lit(0.75) * (($"dl_q".cast("long") * lit(n)).cast("double") /
          lit(total.toDouble)))
      .withColumn("cq",
        floor($"w" * (($"tf_q".cast("double") * lit(2.25)) /
          ($"tf_q".cast("double") + lit(1.25) * $"lennorm_q")) * Q + 0.5) / Q)
      .withColumn("q_self", sum($"cq").over(Window.partitionBy(key: _*)))
    val matched = qTok.select((key ++ Seq($"token", $"q_self")): _*)
      .join(broadcast(surfTok), "token")
      .groupBy((key ++ Seq($"code", $"surf_norm", $"q_self")): _*)
      .agg(sum($"contrib").as("raw"))
    matched
      .withColumn("score", $"raw" / $"q_self")
      .filter($"score" >= minScore)
      .withColumn("rs", row_number().over(Window.partitionBy(
        (key :+ $"code"): _*).orderBy($"score".desc, $"surf_norm".asc)))
      .filter($"rs" === 1)
      .withColumn("rank", row_number().over(Window.partitionBy(key: _*)
        .orderBy($"score".desc, $"code".asc)))
      .filter($"rank" <= k)
      .select((key ++ Seq($"rank", $"code", $"surf_norm", $"score")): _*)
  }

  /** Unified type-filtered term search (the reference's ftTermIndex
    * spanning all labels with a `type` property filter): search the
    * whole dictionary — or one node type — for the best-matching
    * surfaces of free-text queries. queries: (query_id, text).
    * Kept on the weighted-Jaccard scorer it has always used (its
    * oracle pins those scores); [[termSearchBm25]] is the
    * Lucene-faithful variant. */
  def termSearch(spark: SparkSession, queries: DataFrame,
                 prepared: graft.dict.PreparedDict, k: Int = DefaultFuzzyK,
                 minScore: Double = 0.0,
                 typeFilter: Option[String] = None): DataFrame = {
    import spark.implicits._
    val q = queries.select($"query_id",
      graft.Functions.norm_text($"text").as("norm"))
    weightedFuzzyTopK(spark, q, Seq("query_id"), prepared, k, minScore, typeFilter)
  }

  /** [[termSearch]] on the BM25 scorer — the ladder's stage-4 ranking
    * exposed as a query-id search. */
  def termSearchBm25(spark: SparkSession, queries: DataFrame,
                     prepared: graft.dict.PreparedDict, k: Int = DefaultFuzzyK,
                     minScore: Double = 0.0,
                     typeFilter: Option[String] = None): DataFrame = {
    import spark.implicits._
    val q = queries.select($"query_id",
      graft.Functions.norm_text($"text").as("norm"))
    bm25TopK(spark, q, Seq("query_id"), prepared, k, minScore, typeFilter)
  }
}

/** Driver-broadcast brute-force KNN: score one query against the
  * normalized dictionary matrix, keep top-k above a floor. The Spark
  * replacement for a vector index at dictionary scale (~10^5 x 64
  * floats = tens of MB — always broadcastable; SURVEY.md §7.3). */
object BroadcastKnn {
  def topK(query: Array[Float], dictVecs: Array[(String, Array[Float])],
           k: Int, minScore: Double): Seq[(String, Double)] = {
    // query is already L2-normalized by the vectorizer; dict vectors
    // normalized at broadcast time -> cosine == dot product
    val heap = new java.util.PriorityQueue[(String, Double)](k + 1,
      (a: (String, Double), b: (String, Double)) => {
        val c = java.lang.Double.compare(a._2, b._2)
        if (c != 0) c else b._1.compareTo(a._1) // min-heap: worst on top
      })
    var i = 0
    while (i < dictVecs.length) {
      val (code, v) = dictVecs(i)
      var dot = 0.0; var j = 0
      val n = math.min(v.length, query.length)
      while (j < n) { dot += v(j).toDouble * query(j); j += 1 }
      if (dot >= minScore) {
        heap.add((code, dot))
        if (heap.size > k) heap.poll()
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    while (!heap.isEmpty) out += heap.poll()
    out.sortBy { case (c, s) => (-s, c) }.toSeq
  }

  /** KNN of (query_id, text) rows against a broadcast (code, term,
    * embedding) corpus — the shared kernel of the composed semantic
    * searches ([[SemanticNcitSearch]] over NCIT, [[SemanticPvSearch]]
    * over PV). Full double cosine on RAW vectors (bit-identical to the
    * SQL oracles, unlike [[topK]]'s normalized-dot fast path) through
    * a bounded heap (O(C log k)); one output row per hit, rank 1..k by
    * (score DESC, code ASC). */
  def scanTermTopK(spark: SparkSession, queries: DataFrame,
                   corpus: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    // dictionary-sized broadcast (same contract as PreparedDict.vecs:
    // ~10^5 concepts x 64 floats — always driver-safe; the query
    // stream never passes through the driver)
    val arr: Array[(String, String, Array[Float])] = corpus
      .select(col("code"), col("term"), col("embedding"))
      .as[(String, String, Array[Float])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(arr)
    val kk = k
    queries
      .select(queries.col("query_id").cast("string"),
        queries.col("text").cast("string"))
      .as[(String, String)]
      .flatMap { case (qid, text) =>
        val qv = Vectorizer.vectorizeChar(text)
        val heap = new java.util.PriorityQueue[(String, String, Double)](kk + 1,
          (a: (String, String, Double), b: (String, String, Double)) => {
            val c = java.lang.Double.compare(a._3, b._3)
            if (c != 0) c else b._1.compareTo(a._1) // worst on top; ties evict larger code
          })
        val cands = bc.value
        var i = 0
        while (i < cands.length) {
          val (code, term, v) = cands(i)
          heap.add((code, term, graft.functions.VectorMath.cosine(qv, v)))
          if (heap.size > kk) heap.poll()
          i += 1
        }
        // successive polls yield worst-to-best: fill back-to-front
        val out = new Array[(String, String, Double)](heap.size)
        var j = heap.size - 1
        while (j >= 0) { out(j) = heap.poll(); j -= 1 }
        out.iterator.zipWithIndex.map { case ((code, term, s), r) =>
          (qid, r + 1, code, term, s) }
      }
      .toDF("query_id", "rank", "code", "term", "score")
  }
}
