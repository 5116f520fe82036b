package graft

import java.nio.file.Files

import graft.dict.ConceptDict
import graft.fixtures.Fixtures

/** The production dictionary persistence path: ConceptDict.save/load
  * round-trips every vertex label and edge table through the
  * partitioned parquet layout (Iceberg-shaped DDL, SURVEY.md §1.3) so
  * a cluster job can load the dictionary without re-deriving it. */
class ConceptDictSpec extends SparkTestBase {
  import spark.implicits._

  test("save/load round-trips all vertex labels and edge tables") {
    val dir = Files.createTempDirectory("graft-dict-rt").toString
    val d = Fixtures.dict(spark)
    ConceptDict.save(d, dir)
    val d2 = ConceptDict.load(spark, dir)

    def edges(ds: org.apache.spark.sql.Dataset[graft.model.DictEdge]) =
      ds.collect().map(e => (e.src, e.dst)).toSet
    assert(edges(d2.hasConcept) == edges(d.hasConcept))
    assert(edges(d2.hasVdm) == edges(d.hasVdm))
    assert(edges(d2.hasPv) == edges(d.hasPv))
    assert(edges(d2.hasDec) == edges(d.hasDec))
    assert(edges(d2.hasOc) == edges(d.hasOc))
    assert(edges(d2.hasPr) == edges(d.hasPr))

    def codes(df: org.apache.spark.sql.DataFrame) =
      df.select($"code", $"term").as[(String, String)].collect().toSet
    assert(codes(d2.vdm) == codes(d.vdm))
    assert(codes(d2.dec) == codes(d.dec))
    assert(codes(d2.pr) == codes(d.pr))
    assert(codes(d2.ncit.toDF()) == codes(d.ncit.toDF()))
    assert(codes(d2.pv.toDF()) == codes(d.pv.toDF()))
    assert(codes(d2.cde.toDF()) == codes(d.cde.toDF()))
    assert(codes(d2.oc.toDF()) == codes(d.oc.toDF()))
    assert(d2.synonyms.collect().map(s => (s.code, s.term)).toSet ==
      d.synonyms.collect().map(s => (s.code, s.term)).toSet)

    // embeddings survive bit-exactly (float arrays through parquet)
    val e1 = d.ncit.select($"code", $"embedding")
      .as[(String, Array[Float])].collect().toMap
    val e2 = d2.ncit.select($"code", $"embedding")
      .as[(String, Array[Float])].collect().toMap
    assert(e1.keySet == e2.keySet)
    assert(e1.forall { case (c, v) => java.util.Arrays.equals(v, e2(c)) })

    // the linkable surface set — what the automaton and ladder see —
    // is identical from the loaded dictionary
    val s1 = d.surfaces(spark).as[(String, String, String)].collect().toSet
    val s2 = d2.surfaces(spark).as[(String, String, String)].collect().toSet
    assert(s1 == s2)
  }
}
