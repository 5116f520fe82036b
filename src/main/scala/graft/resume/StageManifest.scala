package graft.resume

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** Checkpoint/resume manifest: per-stage materialization with an
  * idempotent completion record (north rule: "resumable from
  * checkpoint with per-partition lineage + metrics").
  *
  * Protocol (crash-safe without any external coordinator):
  *  1. stage output written to `<dir>/<stage>` via Spark's committer
  *     (task-level atomicity: _temporary rename on commit);
  *  2. only AFTER a successful write is the stage recorded in
  *     `manifest.json` (written to a temp file, then atomically
  *     renamed) together with row count + input fingerprint;
  *  3. on re-run, a recorded stage whose fingerprint matches is
  *     reloaded from parquet — upstream stages are NOT recomputed; a
  *     fingerprint mismatch (inputs changed) invalidates the stage
  *     and everything downstream.
  *
  * Lineage granularity is the stage output's parquet partitioning —
  * Spark's committer already guarantees no partial files, so
  * re-running a failed stage rewrites only that stage (the
  * "per-partition lineage": each stage records its partition count
  * and the committer re-runs only uncommitted tasks on retry-
  * within-job; across jobs we re-run at stage granularity).
  */
final class StageManifest(spark: SparkSession, dir: String) {

  private val manifestPath = Paths.get(dir, "manifest.json")
  private val entries: mutable.LinkedHashMap[String, StageManifest.Entry] = load()

  private def load(): mutable.LinkedHashMap[String, StageManifest.Entry] = {
    val m = mutable.LinkedHashMap.empty[String, StageManifest.Entry]
    if (Files.exists(manifestPath)) {
      val txt = new String(Files.readAllBytes(manifestPath), StandardCharsets.UTF_8)
      // minimal parser for the fixed shape we write below
      val entryRe =
        """\{"stage":"([^"]+)","rows":(\d+),"partitions":(\d+),"fingerprint":"([^"]+)","buckets":\[([0-9,]*)\]\}""".r
      entryRe.findAllMatchIn(txt).foreach { g =>
        val buckets = g.group(5).split(",").filter(_.nonEmpty).map(_.toInt).toSet
        m += g.group(1) -> StageManifest.Entry(g.group(1), g.group(2).toLong,
          g.group(3).toInt, g.group(4), buckets)
      }
    }
    m
  }

  private def save(): Unit = {
    val json = entries.values.map(e =>
      s"""{"stage":"${e.stage}","rows":${e.rows},"partitions":${e.partitions},"fingerprint":"${e.fingerprint}","buckets":[${e.buckets.toSeq.sorted.mkString(",")}]}""")
      .mkString("[", ",", "]")
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, "manifest.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def completed(stage: String, fingerprint: String): Boolean =
    entries.get(stage).exists(_.fingerprint == fingerprint)

  def metrics: Map[String, (Long, Int)] =
    entries.map { case (k, e) => k -> (e.rows, e.partitions) }.toMap

  /** Run-or-reload a stage. `fingerprint` must capture everything the
    * stage output depends on (input params + upstream fingerprints);
    * any change recomputes this stage and, transitively, downstream
    * callers that include this stage's fingerprint in theirs. */
  def stage(name: String, fingerprint: String)(compute: => DataFrame): DataFrame = {
    val path = s"$dir/$name"
    if (completed(name, fingerprint)) {
      spark.read.parquet(path)
    } else {
      entries.remove(name) // invalidate any stale record before rewrite
      val df = compute
      df.write.mode("overwrite").parquet(path)
      val out = spark.read.parquet(path)
      val rows = out.count()
      val partitions = out.rdd.getNumPartitions
      entries += name -> StageManifest.Entry(name, rows, partitions, fingerprint)
      save()
      out
    }
  }

  /** Per-partition lineage variant: the stage output is bucketed by a
    * deterministic hash of `bucketKeyCols` into `nBuckets` directory
    * partitions, and the manifest records WHICH buckets committed. A
    * crashed run resumes by recomputing and writing ONLY the missing
    * buckets (committed buckets are never rewritten). When the
    * `compute` plan is expression-based — or its source table is
    * bucketed on the same key — Catalyst additionally pushes the
    * bucket predicate to the scan, pruning input-side work too;
    * through opaque typed lambdas the recompute is filtered after the
    * lambda (write amplification still avoided).
    *
    * Crash safety: each bucket lands via Spark's committer under
    * `__bucket=k/`; the manifest is updated (atomic rename) only after
    * the write succeeds; a crash between write and manifest update
    * re-runs those buckets INTO the same directories via overwrite of
    * exactly the missing dynamic partitions. */
  def stageBuckets(name: String, fingerprint: String, nBuckets: Int,
                   bucketKeyCols: Seq[String])(compute: => DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = s"$dir/$name"
    val prior = entries.get(name).filter(_.fingerprint == fingerprint)
    val done = prior.map(_.buckets).getOrElse(Set.empty[Int])
    val all = (0 until nBuckets).toSet
    if (prior.isEmpty) {
      // stale or absent -> full rebuild
      entries.remove(name)
      save()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    }
    val missing = if (prior.isEmpty) all else all -- done
    if (missing.nonEmpty) {
      val df = compute
      val bucketed = df.withColumn("__bucket",
        pmod(xxhash64(bucketKeyCols.map(col): _*), lit(nBuckets)).cast("int"))
      val todo = bucketed.filter(col("__bucket").isin(missing.toSeq: _*))
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try todo.write.mode("overwrite").partitionBy("__bucket").parquet(path)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      val out = spark.read.parquet(path)
      entries += name -> StageManifest.Entry(name, out.count(),
        out.rdd.getNumPartitions, fingerprint, all)
      save()
      out.drop("__bucket")
    } else {
      spark.read.parquet(path).drop("__bucket")
    }
  }

  /** Test/ops hook: mark some buckets of a stage as NOT committed
    * (simulates a crash after partial bucket commit). Deletes their
    * data directories and shrinks the manifest record. */
  def invalidateBuckets(name: String, buckets: Set[Int]): Unit = {
    entries.get(name).foreach { e =>
      buckets.foreach { b =>
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$dir/$name/__bucket=$b"))
      }
      entries += name -> e.copy(buckets = e.buckets -- buckets)
      save()
    }
  }
}

object StageManifest {
  final case class Entry(stage: String, rows: Long, partitions: Int,
                         fingerprint: String, buckets: Set[Int] = Set.empty)

  /** Order-SENSITIVE fingerprint combinator: each part is absorbed
    * then mixed, so fp(a,b) != fp(b,a) and fp(x,x,y) != fp(y) — a
    * plain XOR fold is both order-insensitive and self-canceling,
    * which would let distinct stage inputs collide and silently reuse
    * a stale checkpoint on resume. */
  def fp(parts: String*): String =
    java.lang.Long.toHexString(
      parts.foldLeft(0x9e3779b97f4a7c15L) { (h, p) =>
        graft.functions.Hashing.mix64(h ^ graft.functions.Hashing.hash64(p))
      })
}
