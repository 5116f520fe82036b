package graft.dict

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}

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
    vecs: Broadcast[Array[(String, Array[Float])]], // L2-normalized
    canonical: DataFrame)                        // (code, canonical)

object PreparedDict {

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
    val dictVecs = dict.ncit.select($"code", $"embedding")
      .unionByName(dict.pv.select($"code", $"embedding"))
      .unionByName(dict.cde.select($"code", $"embedding"))
      .as[(String, Array[Float])].collect()
      .sortBy(_._1).map { case (c, v) => (c, l2(v)) }
    val bcVecs = spark.sparkContext.broadcast(dictVecs)
    val canonical = graft.canon.Canonicalizer.canonicalMap(spark, dict).cache()
    canonical.count()
    PreparedDict(dict, ac, resolution, fuzzy, bcVecs, canonical)
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
