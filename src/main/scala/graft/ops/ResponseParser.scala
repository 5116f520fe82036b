package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Agent-transcript response parsing — the set-based version of the
  * reference's line-by-line ReAct response parser
  * (reference utils/response_parser.py:5-43: startswith classification
  * into Thought/Action/Observation/Final Answer) and its code/
  * confidence extractors (reference utils/search_engine.py:45-52).
  *
  * NOTE: response_parser.py:58 has a real bug — the last clause of the
  * tool-detection chain is missing `in response.lower()` so it is
  * always truthy; we do NOT reproduce it (SURVEY.md F9).
  */
object ResponseParser {

  /** Explode a multi-line agent response into classified lines:
    * (…, line_no, kind, content). */
  def parseLines(df: DataFrame, textCol: String): DataFrame = {
    val lines = posexplode(split(col(textCol), "\n"))
    df.select(col("*"), lines.as(Seq("line_no", "line")))
      .withColumn("kind",
        when(col("line").startsWith("Thought:"), "thought")
          .when(col("line").startsWith("Action:"), "action")
          .when(col("line").startsWith("Observation:"), "observation")
          .when(col("line").startsWith("Final Answer:"), "final")
          .otherwise("other"))
      .withColumn("content", trim(regexp_replace(col("line"),
        "^(Thought:|Action:|Observation:|Final Answer:)\\s*", "")))
      .drop("line")
  }

  /** NCIT-style code extractor (reference search_engine.py:45-47). */
  def extractCode(c: Column): Column = regexp_extract(c, "([A-Z]\\d+)", 1)

  /** Confidence extractor, case-insensitive
    * (reference search_engine.py:50-52). */
  def extractConfidence(c: Column): Column =
    initcap(regexp_extract(c, "(?i)Confidence[:\\s]*(High|Medium|Low)", 1))

  /** Tool-usage detection over the lowercased response — fixed version
    * of the reference's always-true bug. */
  def detectTool(c: Column): Column = {
    val lc = lower(c)
    when(lc.contains("action: term_matcher"), "term_matcher")
      .when(lc.contains("action: node_matcher"), "node_matcher")
      .when(lc.contains("action: semantic_search"), "semantic_search")
      .otherwise("none")
  }
}
