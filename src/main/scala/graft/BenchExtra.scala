package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extra (non-driver) benchmark: the 100x scale-step for the six
  * highest-10x-ratio catalog queries (round-5 verdict task #7).
  *
  * The driver ships sf0.01/sf0.1 only, so the 100x point is a
  * SYNTHETIC sf1-equivalent derived from sf0.1 by 10x replication
  * with id-shifts; document texts get a per-replica token suffix so
  * every replica shard reproduces the original near-dup/df structure
  * instead of forming cross-replica 10-cliques (which would inflate
  * pair OUTPUT quadratically by data construction and measure
  * nothing about the plans). Embeddings/events replicate with id
  * shifts only. This probes PLAN scaling, not oracle correctness —
  * the catalog queries run verbatim against the synthetic dir.
  *
  * Also measured: `Ann.ivfTopK` with nCentroids scaled ~linearly in
  * corpus size (16 -> 160 at 10x) — fixed-nCentroids IVF is
  * inherently quadratic in compared pairs (n * nProbe * n/nCentroids)
  * and the catalog entry pins nCentroids=16, so its 100x point is
  * EXPECTED to curve upward; the scaled-centroid row shows the same
  * operator staying near-linear when the index is sized for the
  * corpus, which is the production contract.
  *
  * Output: one JSON line + SPARK_GRAFT_SCALE_OUT (default
  * BENCH/catalog_100x_subset.json).
  */
object BenchExtra {

  private val Subset = Seq("range_join_value_windows", "dedup_minhash_lsh",
    "text_dup_ngrams", "decontam_bloom", "kg_relation_extract", "ann_ivf_topk")

  /** 10x replication with id shifts; texts token-suffixed per replica
    * (see scaladoc). Deterministic, seedless. */
  def synthesize(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val events = spark.read.parquet(s"$srcDir/events.parquet")
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    def replicate(df: DataFrame, k: Int)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => shift(df, i)).reduce(_.unionByName(_))
    replicate(docs, 10) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * 5000000L))
        .withColumn("text",
          if (i == 0) col("text")
          else array_join(transform(split(col("text"), " "),
            x => concat(x, lit(s"_$i"))), " "))
    }.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    replicate(events, 10) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * 100000000L))
        .withColumn("user_id", col("user_id") + lit(i * 10000000L))
    }.write.mode("overwrite").parquet(s"$outDir/events.parquet")
    replicate(emb, 10) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
    }.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val small = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-100x")
    val big = s"${System.getProperty("java.io.tmpdir")}/graft_sf1_${ProcessHandle.current().pid()}"
    synthesize(spark, small, big)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      SparkEntry.rmTree(new java.io.File(big))))

    def time(fn: => Long): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val rows = Subset.map { name =>
      val fn = SparkEntry.queries(name)
      time(fn(spark, small).count()) // untimed warmup
      val ts = math.min(time(fn(spark, small).count()), time(fn(spark, small).count()))
      val tb = math.min(time(fn(spark, big).count()), time(fn(spark, big).count()))
      System.err.println(f"[100x] $name%-28s small=$ts%.2fs big=$tb%.2fs ratio=${tb / ts}%.1f")
      (name, ts, tb)
    }
    // the scaled-index IVF twin: same operator, nCentroids sized for
    // the corpus (16 at sf0.1 -> 160 at the 10x point)
    def ivfAt(dir: String, nc: Int): Long = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.ops.Ann.ivfTopK(spark, e, k = 3, nCentroids = nc).count()
    }
    ivfAt(small, 16) // warmup
    val ivfS = math.min(time(ivfAt(small, 16)), time(ivfAt(small, 16)))
    val ivfB = math.min(time(ivfAt(big, 160)), time(ivfAt(big, 160)))
    System.err.println(f"[100x] ivf_scaled_centroids          small=$ivfS%.2fs big=$ivfB%.2fs ratio=${ivfB / ivfS}%.1f")

    val qJson = (rows.map { case (n, ts, tb) =>
      "\"" + n + f"""\":{"small_sec":$ts%.3f,"big_sec":$tb%.3f,"ratio":${tb / ts}%.2f}"""
    } :+ ("\"ann_ivf_topk_scaled_centroids\":" +
      f"""{"small_sec":$ivfS%.3f,"big_sec":$ivfB%.3f,"ratio":${ivfB / ivfS}%.2f,""" +
      """"note":"nCentroids 16->160 (sized to corpus)"}"""))
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"catalog_100x_subset","factor":10,"small":"$small",""" +
      s""""big":"synthetic 10x of sf0.1 (see graft.BenchExtra scaladoc)","cpus":$cpus,""" +
      s""""queries":$qJson}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "BENCH/catalog_100x_subset.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    println(json)
    spark.stop()
  }
}
