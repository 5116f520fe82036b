package graft

/** Catalog scale-step harness: runs every SparkEntry catalog query at
  * two driver-provided scale factors exactly 10x apart (sf0.01 vs
  * sf0.1) and reports per-query wall-time ratios — the closest
  * in-sandbox proxy for "does this plan survive a scale-up" and the
  * place an accidental O(n²) shows up long before a real cluster
  * would find it.
  *
  * Interpretation: for a data-bound query, linear scaling means
  * ratio ≈ 10 at 10x data; constant per-session overhead (planning,
  * broadcast builds, fixed job scheduling) pushes real ratios far
  * BELOW 10 at these sizes. Fixture-bound queries (dictionary-only —
  * kg_graph_materialize, kg_bgp_query, …) don't read the sf dir at
  * all and sit near 1 by construction. The red flag is the other
  * direction: ratio > factor * 1.5 (superlinear) — those are listed
  * in `flagged` and must be explained in BENCH/BASELINE.md.
  *
  * Protocol per query: one untimed warmup at the small sf (retires
  * JIT/codegen/fixture one-time costs — same rationale as the Bench
  * warmup pass), then min-of-2 timed at small, min-of-2 timed at big.
  */
object CatalogScale {

  def main(args: Array[String]): Unit = {
    val small = sys.env.getOrElse("SPARK_GRAFT_SCALE_SMALL", "/root/testdata/sf0.01")
    val big = sys.env.getOrElse("SPARK_GRAFT_SCALE_BIG", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-catalog-scale")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    final case class Row(name: String, smallSec: Double, bigSec: Double,
                         err: Option[String]) {
      def ratio: Double = if (smallSec > 0) bigSec / smallSec else -1.0
    }

    val rows = qs.map { case (name, fn) =>
      def once(dir: String): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        once(small) // untimed warmup
        val ts = math.min(once(small), once(small))
        val tb = math.min(once(big), once(big))
        System.err.println(f"[scale] $name%-28s small=$ts%.2fs big=$tb%.2fs ratio=${tb / ts}%.1f")
        Row(name, ts, tb, None)
      } catch { case e: Throwable =>
        System.err.println(s"[scale] $name FAILED: ${e.getMessage}")
        Row(name, -1, -1, Some(e.getClass.getSimpleName))
      }
    }

    val flagged = rows.filter(r => r.err.isEmpty && r.ratio > factor * 1.5)
    val qJson = rows.map { r =>
      "\"" + r.name + "\":{" +
        f""""small_sec":${r.smallSec}%.3f,"big_sec":${r.bigSec}%.3f,""" +
        f""""ratio":${r.ratio}%.2f""" +
        r.err.map(e => s""","err":"$e"""").getOrElse("") + "}"
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"catalog_scale_step","factor":$factor,""" +
      s""""small":"$small","big":"$big","cpus":$cpus,""" +
      s""""n_queries":${rows.size},"n_failed":${rows.count(_.err.nonEmpty)},""" +
      s""""flagged_superlinear":${flagged.map("\"" + _.name + "\"").mkString("[", ",", "]")},""" +
      s""""queries":$qJson}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "BENCH/catalog_10x.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    // compact stdout line (same budget discipline as Bench)
    println(s"""{"metric":"catalog_scale_step","factor":$factor,""" +
      s""""n_queries":${rows.size},"n_failed":${rows.count(_.err.nonEmpty)},""" +
      s""""flagged_superlinear":${flagged.map("\"" + _.name + "\"").mkString("[", ",", "]")},""" +
      s""""out":"$outFile"}""")
    spark.stop()
  }
}
