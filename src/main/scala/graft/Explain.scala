package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the pipeline stages and
  * representative queries — the "is this the plan I'd want at 100 TB"
  * review loop (broadcasts where expected, pushed filters, pruned
  * scans, whole-stage codegen spans).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.build("local[8]", 8, "graft-explain")
    import spark.implicits._

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    val dict = graft.fixtures.Fixtures.dict(spark)
    val turns = graft.fixtures.Fixtures.transcripts(spark, 200, 6)
    val ac = dict.broadcastAutomaton(spark)
    val mentions = graft.extract.MentionDetect.detect(turns, ac)
    val links = graft.link.MatchLadder.link(spark, mentions, dict)
    dump("pipeline_links", links.toDF())
    val canon = graft.canon.Canonicalizer.canonicalMap(spark, dict)
    dump("triples_linked_to", graft.triples.Triples.linkedTo(links, canon))

    for (q <- args.drop(1)) {
      dump(q, SparkEntry.queries(q)(spark, sfDir))
    }
    spark.stop()
  }
}
