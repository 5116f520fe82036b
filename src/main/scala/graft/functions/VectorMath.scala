package graft.functions

/** Shared double-precision vector math on Array[Float] — the same
  * arithmetic as [[CosineSimilarity.compute]] (fused single pass,
  * doubles for all accumulators) so JVM-side scores are bit-identical
  * to the Catalyst expression's. */
object VectorMath {
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    if (a == null || b == null) return 0.0
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    var j = n
    while (j < a.length) { val x = a(j).toDouble; na += x * x; j += 1 }
    j = n
    while (j < b.length) { val y = b(j).toDouble; nb += y * y; j += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
