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

  /** Pure in-memory run (tests, benchmarks). */
  def run(spark: SparkSession, turns: Dataset[Turn], dict: ConceptDict): Result = {
    import spark.implicits._
    val ac = dict.broadcastAutomaton(spark)
    val mentions = MentionDetect.detect(turns, ac)
    val links = MatchLadder.link(spark, mentions, dict)
    val canonical = Canonicalizer.canonicalMap(spark, dict)
    val triples = Triples.all(spark, links, dict, canonical)
    Result(mentions, links, canonical, triples)
  }

  /** Materialized, resumable run: every stage lands in `outDir` and is
    * recorded in the manifest; a rerun after a crash reloads completed
    * stages instead of recomputing (north-rule resumability). */
  def runResumable(spark: SparkSession, turns: Dataset[Turn], dict: ConceptDict,
                   outDir: String, paramsFp: String = "v1"): Result = {
    import spark.implicits._
    val man = new StageManifest(spark, outDir)
    val fpBase = StageManifest.fp("pipeline", paramsFp)

    val ac = dict.broadcastAutomaton(spark)
    val fpMentions = StageManifest.fp(fpBase, "mentions")
    val mentions = man.stage("mentions", fpMentions) {
      MentionDetect.detect(turns, ac).toDF()
    }.as[Mention]

    val fpLinks = StageManifest.fp(fpMentions, "links")
    val links = man.stage("links", fpLinks) {
      MatchLadder.link(spark, mentions, dict).toDF()
    }.as[Link]

    val fpCanon = StageManifest.fp(fpBase, "canonical")
    val canonical = man.stage("canonical", fpCanon) {
      Canonicalizer.canonicalMap(spark, dict)
    }

    val fpTriples = StageManifest.fp(fpLinks, fpCanon, "triples")
    val triples = man.stage("triples", fpTriples) {
      Triples.all(spark, links, dict, canonical).toDF()
    }.as[Triple]

    Result(mentions, links, canonical, triples)
  }
}
