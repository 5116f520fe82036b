package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.ResponseParser
import graft.sources.Sinks

class SinksParserSpec extends SparkTestBase {
  import spark.implicits._

  test("training sink: date-partitioned json append; append twice doubles rows") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/training"
    val df = Seq(
      ("q1", "C4878", "high", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      ("q2", "C3117", "low", java.sql.Timestamp.valueOf("2024-01-02 11:00:00"))
    ).toDF("query", "code", "confidence", "ts")
    Sinks.appendTrainingJson(df, "ts", dir)
    val once = spark.read.json(dir)
    assert(once.count() == 2)
    assert(once.select($"dt").distinct().as[String].collect().sorted
      .sameElements(Array("20240101", "20240102")))
    Sinks.appendTrainingJson(df, "ts", dir)
    assert(spark.read.json(dir).count() == 4)
  }

  test("export sink writes one json file of results") {
    val dir = Files.createTempDirectory("graft-export").toString + "/out"
    val df = Seq(("q1", "C4878", 0.97)).toDF("query", "code", "score")
    Sinks.exportJson(df, dir)
    val back = spark.read.json(dir)
    assert(back.count() == 1)
    assert(back.select($"code").as[String].collect()(0) == "C4878")
  }

  test("response parser classifies lines and strips prefixes") {
    val df = Seq((1, "Thought: find it\nAction: term_matcher\nObservation: C40625 found\nFinal Answer: C40625 Confidence: High\nnoise"))
      .toDF("id", "response")
    val parsed = ResponseParser.parseLines(df, "response")
      .select($"line_no", $"kind", $"content").as[(Int, String, String)]
      .collect().toList
    assert(parsed == List(
      (0, "thought", "find it"),
      (1, "action", "term_matcher"),
      (2, "observation", "C40625 found"),
      (3, "final", "C40625 Confidence: High"),
      (4, "other", "noise")))
    val ext = df.select(
      ResponseParser.extractCode($"response").as("code"),
      ResponseParser.extractConfidence($"response").as("conf"),
      ResponseParser.detectTool($"response").as("tool")).collect()(0)
    assert(ext.getString(0) == "C40625")
    assert(ext.getString(1) == "High")
    assert(ext.getString(2) == "term_matcher")
  }

  test("tool detection is not always-true (the reference's F9 bug is fixed)") {
    val none = Seq((1, "Final Answer: nothing used")).toDF("id", "response")
      .select(ResponseParser.detectTool($"response")).as[String].collect()(0)
    assert(none == "none")
  }
}
