package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures
import graft.model.Triple
import graft.triples.{GraphMerge, Triples}

/** MERGE-upsert semantics of the materialized graph (the Neo4j MERGE
  * replacement): create-if-absent keyed (subj, pred, obj) /
  * (label, code), idempotent under replay, append-only. */
class GraphMergeSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-merge").toString + "/graph"

  private def edges(dir: String) = spark.read.parquet(s"$dir/edges")

  test("mergeEdges: first merge creates, exact replay is a no-op") {
    val dir = freshDir()
    val dict = Fixtures.dict(spark)
    val base = Triples.hasSynonym(spark, dict)
      .unionByName(Triples.baseEdges(spark, dict)).as[Triple]
    val n0 = base.count()
    assert(GraphMerge.mergeEdges(spark, dir, base) == n0)
    assert(GraphMerge.mergeEdges(spark, dir, base) == 0L, "replay must be a no-op")
    assert(edges(dir).count() == n0, "no duplicate rows after replay")
  }

  test("mergeEdges: overlapping delta appends only the genuinely-new rows") {
    val dir = freshDir()
    val dict = Fixtures.dict(spark)
    val syn = Triples.hasSynonym(spark, dict).as[Triple]
    val sim = Triples.similarEdges(spark, dict, k = 2).drop("score").as[Triple]
    GraphMerge.mergeEdges(spark, dir, syn)
    val fresh = GraphMerge.mergeEdges(spark, dir, syn.unionByName(sim))
    assert(fresh == sim.count(), "only the SIMILAR rows are new")
    // final table is the exact set union, no multiplicity
    val expect = syn.unionByName(sim).distinct().count()
    assert(edges(dir).count() == expect)
    assert(edges(dir).distinct().count() == expect)
  }

  test("mergeEdges: duplicate rows WITHIN one delta collapse to one") {
    val dir = freshDir()
    val d = Seq(Triple("a", "LINKED_TO", "x"), Triple("a", "LINKED_TO", "x"),
      Triple("b", "LINKED_TO", "y")).toDS()
    assert(GraphMerge.mergeEdges(spark, dir, d) == 2L)
    assert(edges(dir).count() == 2L)
  }

  test("mergeVertices: keyed (label, code), replay no-op, first writer wins") {
    val dir = freshDir()
    val v1 = Seq(("C1", "NCIT", "term one", null: String, "C1"),
      ("P1", "PV", "pv one", null: String, "C1"))
      .toDF("code", "label", "term", "definition", "canonical")
    assert(GraphMerge.mergeVertices(spark, dir, v1) == 2L)
    // same keys, different properties: MERGE on the key leaves the
    // existing vertex untouched (Neo4j MERGE-on-key semantics)
    val v2 = Seq(("C1", "NCIT", "RENAMED", null: String, "C1"),
      ("C2", "NCIT", "term two", null: String, "C2"))
      .toDF("code", "label", "term", "definition", "canonical")
    assert(GraphMerge.mergeVertices(spark, dir, v2) == 1L)
    val rows = spark.read.parquet(s"$dir/vertices")
      .select("code", "term").as[(String, String)].collect().toMap
    assert(rows.size == 3)
    assert(rows("C1") == "term one", "existing vertex properties survive")
    assert(rows("C2") == "term two")
  }

  test("merged graph serves GraphTables traversals identically to a full rewrite") {
    val dir = freshDir()
    val dict = Fixtures.dict(spark)
    val prepared = graft.dict.PreparedDict.prepare(spark, dict)
    // incremental build: base edges, then derived, then vertices
    GraphMerge.mergeEdges(spark, dir,
      Triples.hasSynonym(spark, dict).unionByName(Triples.baseEdges(spark, dict)).as[Triple])
    GraphMerge.mergeEdges(spark, dir,
      Triples.mapsTo(spark, dict).unionByName(Triples.sameAs(prepared.canonical)).as[Triple])
    GraphMerge.mergeVertices(spark, dir, Triples.vertices(spark, dict, prepared.canonical))
    val gt = graft.triples.GraphTables(spark, dir)
    // the J3 flatten recomputed from merged BASE edges equals the
    // directly-derived MAPS_TO edge set
    val fromTables = gt.mapsTo.orderBy("ncit_code", "cde_code").collect()
    val direct = Triples.mapsTo(spark, dict)
      .select(col("subj").as("ncit_code"), col("obj").as("cde_code"))
      .orderBy("ncit_code", "cde_code").collect()
    assert(fromTables.sameElements(direct))
  }
}
