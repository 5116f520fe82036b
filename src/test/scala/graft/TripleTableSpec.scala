package graft

import java.nio.file.Files

import graft.fixtures.Fixtures

class TripleTableSpec extends SparkTestBase {
  import spark.implicits._

  test("pred-partitioned triple table prunes partitions at read") {
    val dir = Files.createTempDirectory("graft-triples").toString + "/edges"
    val res = Pipeline.run(spark, Fixtures.transcripts(spark, 15, 6),
      Fixtures.dict(spark))
    graft.triples.Triples.write(res.triples, dir)
    // layout: one directory per predicate
    val preds = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("pred=")).sorted
    assert(preds.sameElements(Array("pred=HAS_SYNONYM", "pred=LINKED_TO",
      "pred=MAPS_TO", "pred=SAME_AS")))
    // predicate filter becomes a partition filter (no data read from
    // other predicates)
    val q = spark.read.parquet(dir).filter($"pred" === "LINKED_TO")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(pred"), plan)
    assert(q.count() > 0)
  }

  test("entry() flagship returns non-empty triples (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq == Seq("subj", "pred", "obj"))
  }
}
