package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.Canonicalizer
import graft.dict.ConceptDict
import graft.extract.MentionDetect
import graft.link.MatchLadder
import graft.model.{Link, Mention, Triple, Turn}
import graft.resume.StageManifest
import graft.triples.Triples

/** End-to-end KG construction: transcripts -> mentions -> links ->
  * canonicalized triples (SURVEY.md §7.1 architecture). Stateless
  * object; all state lives in the passed SparkSession / output dir.
  */
object Pipeline {

  final case class Result(
      mentions: Dataset[Mention],
      links: Dataset[Link],
      canonical: DataFrame,
      triples: Dataset[Triple])

  /** Pure in-memory run (tests, convenience): prepares dictionary
    * artifacts inline. */
  def run(spark: SparkSession, turns: Dataset[Turn], dict: ConceptDict): Result =
    run(spark, turns, graft.dict.PreparedDict.prepare(spark, dict))

  /** Production shape: dictionary artifacts prepared once, reused for
    * every transcript batch — per-batch cost is the single transcript
    * pass (map-only exact cascade + residue ladder). */
  def run(spark: SparkSession, turns: Dataset[Turn],
          prepared: graft.dict.PreparedDict): Result = {
    import spark.implicits._
    // observe(): metric aggregates ride inside the job, no extra pass
    // (collected via graft.metrics.PipelineMetrics when registered)
    val mentions = MentionDetect.detect(turns, prepared.automaton)
      .observe("graft_mentions", count(lit(1)).as("n_mentions"),
        approx_count_distinct($"conv_id").as("n_convs"))
    val links = MatchLadder.link(spark, mentions, prepared,
      MatchLadder.DefaultFuzzyK, MatchLadder.DefaultSemanticK,
      MatchLadder.DefaultFuzzyMin, MatchLadder.DefaultSemanticMin)
      .observe("graft_links", count(lit(1)).as("n_links"),
        sum(when($"stage" <= 3, 1).otherwise(0)).as("n_exact"),
        sum(when($"stage" === 4, 1).otherwise(0)).as("n_fuzzy"),
        sum(when($"stage" === 5, 1).otherwise(0)).as("n_semantic"))
    val triples = Triples.all(spark, links, prepared)
    Result(mentions, links, prepared.canonical, triples)
  }

  /** Materialized, resumable run: every stage lands in `outDir` and is
    * recorded in the manifest; a rerun after a crash reloads completed
    * stages instead of recomputing (north-rule resumability). */
  def runResumable(spark: SparkSession, turns: Dataset[Turn], dict: ConceptDict,
                   outDir: String, paramsFp: String = "v1"): Result = {
    import spark.implicits._
    val man = new StageManifest(spark, outDir)
    val fpBase = StageManifest.fp("pipeline", paramsFp)
    lazy val prepared = graft.dict.PreparedDict.prepare(spark, dict)

    val fpMentions = StageManifest.fp(fpBase, "mentions")
    val mentions = man.stage("mentions", fpMentions) {
      MentionDetect.detect(turns, prepared.automaton).toDF()
    }.as[Mention]

    val fpLinks = StageManifest.fp(fpMentions, "links")
    val links = man.stage("links", fpLinks) {
      MatchLadder.link(spark, mentions, prepared,
        MatchLadder.DefaultFuzzyK, MatchLadder.DefaultSemanticK,
        MatchLadder.DefaultFuzzyMin, MatchLadder.DefaultSemanticMin).toDF()
    }.as[Link]

    val fpCanon = StageManifest.fp(fpBase, "canonical")
    val canonical = man.stage("canonical", fpCanon) {
      prepared.canonical
    }

    val fpTriples = StageManifest.fp(fpLinks, fpCanon, "triples")
    val triples = man.stage("triples", fpTriples) {
      Triples.all(spark, links, dict, canonical).toDF()
    }.as[Triple]

    Result(mentions, links, canonical, triples)
  }
}
