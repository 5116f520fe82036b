package graft.dict

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.length

/** Dictionary artifacts prepared ONCE and reused across pipeline
  * runs: the broadcast automaton, the cascade resolution table, the
  * normalized KNN matrix, and the canonicalization map. In production
  * the dictionary changes rarely while transcripts arrive forever —
  * every per-batch job should pay zero dictionary-derivation cost
  * (it is serial, driver-coordinated work that otherwise caps scaling
  * efficiency).
  */
final case class PreparedDict(
    dict: ConceptDict,
    automaton: Broadcast[AhoCorasick],
    resolution: DataFrame,                       // (norm, code, stage) winner
    fuzzySurfaces: DataFrame,                    // (norm, code) for token index
    vecs: Broadcast[Array[(String, Array[Float])]], // L2-normalized, terms >= MinCosineLen chars
    surfaces: Broadcast[Array[(String, String)]],   // (norm, code) for edit-distance scan
    canonical: DataFrame)                        // (code, canonical)

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
    val fuzzy = resolution.select($"norm", $"code")
      .unionByName(dict.synonyms.select(
        graft.Functions.norm_text($"term").as("norm"), $"code"))
      .distinct().cache()
    fuzzy.count()
    val dictVecs = dict.ncit.select(graft.Functions.norm_text($"term").as("norm"), $"code", $"embedding")
      .unionByName(dict.pv.select(graft.Functions.norm_text($"term").as("norm"), $"code", $"embedding"))
      .unionByName(dict.cde.select(graft.Functions.norm_text($"term").as("norm"), $"code", $"embedding"))
      .filter(length($"norm") >= MinCosineLen)
      .select($"code", $"embedding")
      .as[(String, Array[Float])].collect()
      .sortBy(_._1).map { case (c, v) => (c, l2(v)) }
    val bcVecs = spark.sparkContext.broadcast(dictVecs)
    // all linkable surfaces for the bounded-edit-distance scan
    val surfArr = fuzzy.as[(String, String)].collect().sortBy(identity)
    val bcSurf = spark.sparkContext.broadcast(surfArr)
    val canonical = graft.canon.Canonicalizer.canonicalMap(spark, dict).cache()
    canonical.count()
    PreparedDict(dict, ac, resolution, fuzzy, bcVecs, bcSurf, canonical)
  }

  private def l2(v: Array[Float]): Array[Float] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    if (n == 0.0) v
    else { val inv = (1.0 / math.sqrt(n)).toFloat
      val out = new Array[Float](v.length)
      i = 0; while (i < v.length) { out(i) = v(i) * inv; i += 1 }; out }
  }
}
