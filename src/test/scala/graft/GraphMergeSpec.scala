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

  test("refreshVertices: delta wins on key, inserts the rest, rewrites only its labels") {
    val dir = freshDir()
    val v1 = Seq(
      ("C1", "NCIT", "term one", null: String, "C1"),
      ("C2", "NCIT", "term two", null: String, "C2"),
      ("P1", "PV", "pv one", null: String, "C1"))
      .toDF("code", "label", "term", "definition", "canonical")
    GraphMerge.mergeVertices(spark, dir, v1)
    def pvFiles(): Set[(String, Long)] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/vertices/label=PV")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isFile).map(s =>
        (s.getPath.getName, s.getModificationTime)).toSet
    }
    val pvBefore = pvFiles()
    // refresh: C1 renamed (ON MATCH SET), C3 new (ON CREATE)
    val delta = Seq(
      ("C1", "NCIT", "term one v2", "now defined", "C1"),
      ("C3", "NCIT", "term three", null: String, "C3"))
      .toDF("code", "label", "term", "definition", "canonical")
    assert(GraphMerge.refreshVertices(spark, dir, delta) == ((1L, 1L)))
    val rows = spark.read.parquet(s"$dir/vertices")
      .select("code", "term").as[(String, String)].collect().toMap
    assert(rows == Map("C1" -> "term one v2", "C2" -> "term two",
      "C3" -> "term three", "P1" -> "pv one"))
    // dynamic partition overwrite: the PV partition (absent from the
    // delta) keeps its files byte-identical — not rewritten
    assert(pvFiles() == pvBefore, "untouched label partition must not be rewritten")
  }

  test("compactEdges collapses merge-accumulated small files, content bit-identical") {
    val dir = freshDir()
    // 5 successive disjoint merges -> at least 5 file sets in LINKED_TO
    (1 to 5).foreach { i =>
      val d = Seq(Triple(s"m$i", "LINKED_TO", s"C$i")).toDS()
      assert(GraphMerge.mergeEdges(spark, dir, d) == 1L)
    }
    val before = edges(dir).orderBy("subj", "pred", "obj").collect()
    val report = GraphMerge.compactEdges(spark, dir, Seq("LINKED_TO"))
    val (nBefore, nAfter) = report("LINKED_TO")
    assert(nBefore >= 5, s"expected >=5 pre-compaction files, saw $nBefore")
    assert(nAfter == 1)
    val after = edges(dir).orderBy("subj", "pred", "obj").collect()
    assert(after.sameElements(before), "compaction must not change content")
    // compacting an already-compact partition is a no-op
    assert(GraphMerge.compactEdges(spark, dir, Seq("LINKED_TO"))("LINKED_TO") == ((1, 1)))
    // and merging after compaction still works
    assert(GraphMerge.mergeEdges(spark, dir,
      Seq(Triple("m9", "LINKED_TO", "C9")).toDS()) == 1L)
    assert(edges(dir).count() == 6)
  }

  test("hinted merges: same fresh counts as discovery path, wrong hint fails fast") {
    val dir = freshDir()
    val d1 = Seq(Triple("a", "LINKED_TO", "x"), Triple("a", "LINKED_TO", "x"),
      Triple("b", "MAPS_TO", "y")).toDS()
    // first merge (table absent): single fused write, count via observe
    assert(GraphMerge.mergeEdgesWithPreds(spark, dir, d1,
      Seq("LINKED_TO", "MAPS_TO")) == 2L)
    // replay is a no-op; overlapping delta appends only the new row —
    // identical contract to the discovery-path mergeEdges
    assert(GraphMerge.mergeEdgesWithPreds(spark, dir, d1,
      Seq("LINKED_TO", "MAPS_TO")) == 0L)
    val d2 = Seq(Triple("b", "MAPS_TO", "y"), Triple("c", "MAPS_TO", "z")).toDS()
    assert(GraphMerge.mergeEdgesWithPreds(spark, dir, d2, Seq("MAPS_TO")) == 1L)
    assert(edges(dir).count() == 3L)
    // a hint that does NOT cover the delta's preds must raise (the
    // in-plan guard), never silently skip the duplicate check
    val e = intercept[Exception] {
      GraphMerge.mergeEdgesWithPreds(spark, dir,
        Seq(Triple("d", "LINKED_TO", "w")).toDS(), Seq("MAPS_TO"))
    }
    def rootMessages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + rootMessages(t.getCause)
    assert(rootMessages(e).contains("not covered by the hint"), rootMessages(e))
    assert(edges(dir).count() == 3L, "failed merge must not have appended")
    // vertices: same shape
    val v1 = Seq(("C1", "NCIT", "t1", null: String, "C1"),
      ("P1", "PV", "p1", null: String, "C1"))
      .toDF("code", "label", "term", "definition", "canonical")
    assert(GraphMerge.mergeVerticesWithLabels(spark, dir, v1, Seq("NCIT", "PV")) == 2L)
    assert(GraphMerge.mergeVerticesWithLabels(spark, dir, v1, Seq("NCIT", "PV")) == 0L)
    intercept[Exception] {
      GraphMerge.mergeVerticesWithLabels(spark, dir,
        v1.withColumn("label", lit("OC")), Seq("NCIT", "PV"))
    }
  }

  test("empty first delta leaves NO table behind (no data-file-less parquet dir)") {
    // a zero-row append onto an absent table would otherwise create a
    // dir with only _SUCCESS, and every later merge's read would die
    // on schema inference — the rollback must restore "never written"
    val dir = freshDir()
    val empty = spark.emptyDataset[Triple]
    assert(GraphMerge.mergeEdges(spark, dir, empty) == 0L)
    assert(GraphMerge.mergeEdgesWithPreds(spark, dir, empty, Seq("LINKED_TO")) == 0L)
    // table still absent: the next REAL merge initializes it cleanly
    assert(GraphMerge.mergeEdges(spark, dir,
      Seq(Triple("a", "LINKED_TO", "x")).toDS()) == 1L)
    assert(edges(dir).count() == 1L)
    // and an empty delta onto an EXISTING table is a plain no-op
    assert(GraphMerge.mergeEdgesWithPreds(spark, dir, empty, Seq("LINKED_TO")) == 0L)
    assert(edges(dir).count() == 1L)
  }

  test("merge anti-join prunes the existing side to the delta's pred partitions") {
    val dir = freshDir()
    val dict = Fixtures.dict(spark)
    GraphMerge.mergeEdges(spark, dir,
      Triples.hasSynonym(spark, dict).unionByName(Triples.baseEdges(spark, dict)).as[Triple])
    GraphMerge.mergeEdges(spark, dir,
      Seq(Triple("m1", "LINKED_TO", "C1")).toDS())
    // a LINKED_TO batch merge must read ONLY the LINKED_TO partition
    // of the (now 8-pred) table — at corpus scale that partition is
    // the big one, but HAS_*/MAPS_TO must never even be opened
    val p = GraphMerge.freshEdges(spark, s"$dir/edges",
      Seq(Triple("m2", "LINKED_TO", "C2")).toDS())
      .queryExecution.executedPlan.toString
    val partFilter = "PartitionFilters: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(partFilter.contains("pred") && partFilter.contains("LINKED_TO"), p)
    assert(!partFilter.contains("HAS_SYNONYM"), p)
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
