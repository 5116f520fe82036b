package graft.link

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dict.ConceptDict
import graft.functions.{CosineSimilarity => _, _}
import graft.model.{Link, Mention}

/** The de-LLM-ed priority cascade (reference llm_agent_4o.py:485-508:
  * exact -> fuzzy -> synonym -> semantic), computed SET-BASED over all
  * mentions at once instead of one agent round-trip per value
  * (SURVEY.md §2.9). Stages:
  *
  *   1 exact code lookup        (reference exact_match.py:17-65,  P1)
  *   2 exact normalized term    (reference exact_match.py:67-120, P2)
  *   3 synonym surface          (reference synonym_tool.py:19-88, J1/J2)
  *   4 fuzzy token-overlap top-k(reference exact_match.py:122-180, W2)
  *   5 semantic KNN top-k       (reference semantic_retrievers.py:62-76, W1)
  *
  * Every stage is a broadcast join against the (small) dictionary —
  * the transcript side never shuffles. Stages 4/5 run ONLY on
  * mentions unmatched by 1-3 (cascade short-circuit: at corpus scale
  * the expensive stages see a tiny residue). Winner per mention by
  * the pinned deterministic ordering (stage ASC, score DESC, code
  * ASC) — reference tie order is unspecified, we pin it
  * (SURVEY.md §7.4).
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

  private val mentionKey = Seq("conv_id", "turn_idx", "begin", "end")

  def link(spark: SparkSession, mentions: Dataset[Mention], dict: ConceptDict,
           fuzzyK: Int = DefaultFuzzyK, semanticK: Int = DefaultSemanticK,
           fuzzyMin: Double = DefaultFuzzyMin,
           semanticMin: Double = DefaultSemanticMin): Dataset[Link] = {
    import spark.implicits._

    val m = mentions.toDF().cache()

    // --- dictionary side (all broadcast-sized by design) ---
    val termSurfaces = dict.ncit.select(graft.Functions.norm_text($"term").as("norm"), $"code")
      .unionByName(dict.pv.select(graft.Functions.norm_text($"term").as("norm"), $"code"))
      .unionByName(dict.cde.select(graft.Functions.norm_text($"term").as("norm"), $"code"))
      .distinct()
    val synSurfaces = dict.synonyms
      .select(graft.Functions.norm_text($"term").as("norm"), $"code").distinct()
    val allCodes = dict.ncit.select($"code")
      .unionByName(dict.pv.select($"code"))
      .unionByName(dict.cde.select($"code")).distinct()

    // --- stage 1: exact code lookup (P1) ---
    val s1 = m.filter($"norm".rlike("^[a-z]{1,4}\\d+$"))
      .join(broadcast(allCodes), upper($"norm") === $"code")
      .select(mentionCols(m) :+ $"code" :+ lit(1).as("stage") :+ lit(1.0).as("score"): _*)

    // --- stage 2: exact normalized term (P2; case-insensitive per
    //     reference exact_match.py:80) ---
    val s2 = m.join(broadcast(termSurfaces), "norm")
      .select(mentionCols(m) :+ $"code" :+ lit(2).as("stage") :+ lit(1.0).as("score"): _*)

    // --- stage 3: synonym surface (J1/J2 flattened) ---
    val s3 = m.join(broadcast(synSurfaces), "norm")
      .select(mentionCols(m) :+ $"code" :+ lit(3).as("stage") :+ lit(1.0).as("score"): _*)

    val matched123 = s1.select(mentionKey.map(col): _*)
      .unionByName(s2.select(mentionKey.map(col): _*))
      .unionByName(s3.select(mentionKey.map(col): _*))
      .distinct()
    val unmatched = m.join(matched123, mentionKey, "left_anti").cache()

    // --- stage 4: fuzzy token-overlap top-k (W2 stand-in for the
    //     Lucene full-text index; deterministic Jaccard scoring) ---
    val allSurfaces = termSurfaces.unionByName(synSurfaces).distinct()
    val surfTok = allSurfaces
      .withColumn("toks", array_distinct(split($"norm", " ")))
      .select($"code", $"norm".as("surf_norm"), size($"toks").as("ntok"),
        explode($"toks").as("token"))
    val mTok = unmatched
      .withColumn("toks", array_distinct(split($"norm", " ")))
      .select((mentionKey.map(col) :+ $"surface" :+ size($"toks").as("mtok") :+
        explode($"toks").as("token")): _*)
    val s4 = mTok.join(broadcast(surfTok), "token")
      .groupBy((mentionKey.map(col) :+ $"surface" :+ $"mtok" :+ $"code" :+
        $"surf_norm" :+ $"ntok"): _*)
      .agg(count(lit(1)).as("ov"))
      .withColumn("score", $"ov".cast("double") / ($"mtok" + $"ntok" - $"ov"))
      .filter($"score" >= fuzzyMin)
      // best surface per (mention, code), then top-k codes per mention
      .withColumn("rs", row_number().over(Window.partitionBy(
        (mentionKey.map(col) :+ $"code"): _*).orderBy($"score".desc, $"surf_norm".asc)))
      .filter($"rs" === 1)
      .withColumn("rk", row_number().over(Window.partitionBy(
        mentionKey.map(col): _*).orderBy($"score".desc, $"code".asc)))
      .filter($"rk" <= fuzzyK)
      .select((mentionKey.map(col) :+ $"surface" :+ $"code" :+
        lit(4).as("stage") :+ $"score"): _*)

    // --- stage 5: semantic KNN (W1) — broadcast brute-force replacing
    //     Neo4j db.index.vector.queryNodes; per-partition top-k inside
    //     flatMap, no shuffle, no materialized cross join ---
    val unmatched45 = unmatched.join(
      s4.select(mentionKey.map(col): _*).distinct(), mentionKey, "left_anti")
    val dictVecs: Array[(String, Array[Float])] =
      dict.ncit.select($"code", $"embedding").as[(String, Array[Float])].collect() ++
      dict.pv.select($"code", $"embedding").as[(String, Array[Float])].collect() ++
      dict.cde.select($"code", $"embedding").as[(String, Array[Float])].collect()
    val bcVecs = spark.sparkContext.broadcast(
      dictVecs.sortBy(_._1).map { case (c, v) => (c, l2norm(v)) })
    val k = semanticK
    val minS = semanticMin
    val s5 = unmatched45
      .select($"conv_id", $"turn_idx", $"begin", $"end", $"surface", $"norm")
      .as[(String, Int, Int, Int, String, String)]
      .flatMap { case (cid, ti, b, e, surf, norm) =>
        val q = Vectorizer.vectorizeChar(norm)
        BroadcastKnn.topK(q, bcVecs.value, k, minS).map { case (code, score) =>
          (cid, ti, b, e, surf, code, 5, score)
        }
      }
      .toDF("conv_id", "turn_idx", "begin", "end", "surface", "code", "stage", "score")

    // --- priority selection: one winner per mention ---
    val all = s1.unionByName(s2).unionByName(s3).unionByName(s4).unionByName(s5)
    val w = Window.partitionBy(mentionKey.map(col): _*)
      .orderBy($"stage".asc, $"score".desc, $"code".asc)
    all.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .withColumn("confidence",
        when($"stage" <= 3, lit("high"))
          .when($"score" > 0.95, lit("high"))
          .when($"score" > 0.85, lit("good"))
          .otherwise(lit("low")))
      .select($"conv_id", $"turn_idx", $"begin", $"end", $"surface",
        $"code", $"stage", $"score", $"confidence")
      .as[Link]
  }

  private def mentionCols(m: DataFrame): Seq[org.apache.spark.sql.Column] =
    (mentionKey :+ "surface").map(m.apply)

  private def l2norm(v: Array[Float]): Array[Float] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    if (n == 0.0) v
    else { val inv = (1.0 / math.sqrt(n)).toFloat
      val out = new Array[Float](v.length)
      i = 0; while (i < v.length) { out(i) = v(i) * inv; i += 1 }; out }
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
}
