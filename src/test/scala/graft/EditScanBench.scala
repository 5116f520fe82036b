package graft

import graft.dict.SurfaceLengthIndex

/** Interleaved A/B microbench for the stage-5 edit-distance scan:
  * flat O(|dict|) scan with a length guard (the pre-round-3 shape) vs
  * the length-bucketed SurfaceLengthIndex scan. Same JVM, alternating
  * rounds, min-of-5 — the only measurement protocol that survives this
  * host's contention windows (BENCH/BASELINE.md). Also asserts the two
  * produce IDENTICAL per-code best-similarity maps.
  *
  * Run: sbt "Test/runMain graft.EditScanBench"
  */
object EditScanBench {

  /** NCIT-like length profile: multi-word clinical surfaces spanning
    * ~4-60 chars (real NCIT preferred terms + synonyms spread widely),
    * so a +-2 length window holds a small fraction of the dictionary
    * — the regime the bucketing targets. */
  private def synthDict(n: Int): Array[(String, String)] = {
    val words = Array("lung", "breast", "tumor", "stage", "status", "grade",
      "cell", "node", "scan", "dose", "anemia", "fever", "cough", "pain",
      "heart", "renal", "liver", "bone", "skin", "blood", "carcinoma",
      "malignant", "receptor", "therapy", "syndrome", "chronic", "acute",
      "bilateral", "metastatic", "adenocarcinoma")
    Array.tabulate(n) { i =>
      val h = graft.functions.Hashing.mix64(i.toLong * 2654435761L + 7)
      val nw = 1 + (java.lang.Math.floorMod(h, 6L)).toInt
      val surf = (0 until nw).map(j =>
        words(java.lang.Math.floorMod(h >> (j * 7 + 3), words.length.toLong).toInt))
        .mkString(" ") + s" ${java.lang.Math.floorMod(h >> 40, 97L)}"
      (surf, f"C$i%06d")
    }.distinct
  }

  private def flatScan(norm: String, surfaces: Array[(String, String)],
                       minS: Double): collection.mutable.HashMap[String, Double] = {
    val best = collection.mutable.HashMap.empty[String, Double]
    var i = 0
    while (i < surfaces.length) {
      val (snorm, code) = surfaces(i)
      if (math.abs(snorm.length - norm.length) <= 2) {
        val d = graft.functions.EditDistance.bounded(norm, snorm, 2)
        if (d > 0) {
          val sim = 1.0 - d.toDouble / math.max(norm.length, snorm.length)
          if (sim >= minS && sim > best.getOrElse(code, 0.0)) best(code) = sim
        }
      }
      i += 1
    }
    best
  }

  private def bucketScan(norm: String, idx: SurfaceLengthIndex,
                         minS: Double): collection.mutable.HashMap[String, Double] = {
    val best = collection.mutable.HashMap.empty[String, Double]
    var len = math.max(0, norm.length - 2)
    val maxLen = norm.length + 2
    while (len <= maxLen) {
      val surfaces = idx.bucket(len)
      var i = 0
      while (i < surfaces.length) {
        val (snorm, code) = surfaces(i)
        val d = graft.functions.EditDistance.bounded(norm, snorm, 2)
        if (d > 0) {
          val sim = 1.0 - d.toDouble / math.max(norm.length, snorm.length)
          if (sim >= minS && sim > best.getOrElse(code, 0.0)) best(code) = sim
        }
        i += 1
      }
      len += 1
    }
    best
  }

  def main(args: Array[String]): Unit = {
    val dict = synthDict(100000)
    val idx = SurfaceLengthIndex.build(dict)
    val queries = Array.tabulate(500) { i =>
      val (s, _) = dict(java.lang.Math.floorMod(i * 7919, dict.length))
      if (s.length < 4) s else s.substring(0, s.length / 2) + s.substring(s.length / 2 + 1)
    }
    val inWindow = queries.map(q =>
      (math.max(0, q.length - 2) to q.length + 2).map(idx.bucket(_).length).sum)
    println(s"dict=${dict.length} surfaces, ${idx.byLen.length} length buckets, " +
      s"queries=${queries.length}, mean in-window candidates=${inWindow.sum / queries.length} " +
      f"(${100.0 * inWindow.sum / queries.length / dict.length}%.1f%% of dict)")

    // identical outputs first
    queries.foreach { q =>
      val a = flatScan(q, dict, 0.5)
      val b = bucketScan(q, idx, 0.5)
      require(a == b, s"MISMATCH for '$q': flat=$a bucket=$b")
    }
    println("outputs identical over all queries")

    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e6
    }
    var flatBest = Double.MaxValue
    var bucketBest = Double.MaxValue
    for (_ <- 1 to 7) { // 2 warm-up + 5 measured, interleaved
      val tf = time(() => queries.foreach(q => flatScan(q, dict, 0.5)))
      val tb = time(() => queries.foreach(q => bucketScan(q, idx, 0.5)))
      println(f"flat=$tf%.1f ms  bucketed=$tb%.1f ms")
      flatBest = math.min(flatBest, tf)
      bucketBest = math.min(bucketBest, tb)
    }
    println(f"min-of-runs: flat=$flatBest%.1f ms bucketed=$bucketBest%.1f ms " +
      f"speedup=${flatBest / bucketBest}%.1fx")
  }
}
