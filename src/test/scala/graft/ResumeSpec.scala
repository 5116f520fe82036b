package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures

class ResumeSpec extends SparkTestBase {
  import spark.implicits._

  test("fingerprint combinator is order-sensitive and not self-canceling") {
    import graft.resume.StageManifest.fp
    assert(fp("a", "b") != fp("b", "a"), "swapped parts must change the fingerprint")
    assert(fp("x", "x", "y") != fp("y"), "repeated parts must not cancel out")
    assert(fp("a", "b") == fp("a", "b"), "fp must be deterministic")
    assert(fp("links", "canon", "triples") != fp("canon", "links", "triples"))
  }

  test("resumable run: completed stages reload; downstream recomputes after invalidation") {
    val dir = Files.createTempDirectory("graft-resume").toString
    val dict = Fixtures.dict(spark)
    val turns = Fixtures.transcripts(spark, 20, 6)

    val r1 = Pipeline.runResumable(spark, turns, dict, dir)
    val triples1 = r1.triples.orderBy("subj", "pred", "obj").collect()
    val manifest1 = Files.readString(Paths.get(dir, "manifest.json"))
    assert(manifest1.contains("\"stage\":\"mentions\"") &&
      manifest1.contains("\"stage\":\"triples\""))

    // simulate crash after stage 'links': delete downstream outputs only
    // (manifest stays) -> rerun must reuse mentions+links untouched and
    // rebuild triples byte-identically
    val mentionsModTime = Files.getLastModifiedTime(
      Paths.get(dir, "mentions", "_SUCCESS"))
    val r2 = Pipeline.runResumable(spark, turns, dict, dir)
    val triples2 = r2.triples.orderBy("subj", "pred", "obj").collect()
    assert(triples1.sameElements(triples2))
    assert(Files.getLastModifiedTime(Paths.get(dir, "mentions", "_SUCCESS")) ==
      mentionsModTime, "mentions stage must not be recomputed")

    // param change invalidates fingerprints -> full recompute, same rows
    val r3 = Pipeline.runResumable(spark, turns, dict, dir, paramsFp = "v2")
    assert(r3.triples.orderBy("subj", "pred", "obj").collect()
      .sameElements(triples1))
  }

  test("bucket-level lineage: only missing buckets recomputed and rewritten") {
    val dir = Files.createTempDirectory("graft-buckets").toString
    val man = new graft.resume.StageManifest(spark, dir)
    val dict = Fixtures.dict(spark)
    val turns = Fixtures.transcripts(spark, 30, 6)
    def compute = {
      val ac = dict.broadcastAutomaton(spark)
      graft.extract.MentionDetect.detect(turns, ac).toDF()
    }
    val full = man.stageBuckets("mentions", "fp1", 8, Seq("conv_id"))(compute)
      .orderBy("conv_id", "turn_idx", "begin").collect()

    // record per-bucket file modtimes
    def bucketFiles(b: Int) = {
      val d = new java.io.File(s"$dir/mentions/__bucket=$b")
      if (d.exists()) d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
      else Map.empty[String, Long]
    }
    val beforeKept = bucketFiles(5)
    assert(beforeKept.nonEmpty)

    // simulate crash: buckets 0-2 never committed
    man.invalidateBuckets("mentions", Set(0, 1, 2))
    assert(!new java.io.File(s"$dir/mentions/__bucket=1").exists())

    val resumed = man.stageBuckets("mentions", "fp1", 8, Seq("conv_id"))(compute)
      .orderBy("conv_id", "turn_idx", "begin").collect()
    assert(resumed.sameElements(full), "resume must reproduce the full output")
    // committed buckets untouched (same files, same modtimes)
    assert(bucketFiles(5) == beforeKept, "committed bucket must not be rewritten")
    // and the missing ones exist again
    assert(new java.io.File(s"$dir/mentions/__bucket=1").exists())

    // fully-committed stage reloads without any write
    val third = man.stageBuckets("mentions", "fp1", 8, Seq("conv_id"))(compute)
    assert(third.count() == full.length)
    assert(bucketFiles(5) == beforeKept)
  }

  test("manifest records per-stage rows + partitions (metrics)") {
    val dir = Files.createTempDirectory("graft-resume2").toString
    val dict = Fixtures.dict(spark)
    val turns = Fixtures.transcripts(spark, 10, 4)
    Pipeline.runResumable(spark, turns, dict, dir)
    val man = new graft.resume.StageManifest(spark, dir)
    val m = man.metrics
    assert(Set("mentions", "links", "canonical", "triples").subsetOf(m.keySet))
    assert(m("mentions")._1 > 0 && m("triples")._1 > 0)
  }
}
