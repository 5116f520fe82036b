package graft.functions

/** Bounded Levenshtein distance (classic two-row DP with band
  * early-exit). Returns -1 when the distance exceeds `max` —
  * callers use small cutoffs (<=2) so most comparisons abort after a
  * couple of rows, making a broadcast linear scan over ~10^5 surfaces
  * cheaper than the cosine path it complements.
  */
object EditDistance {

  def bounded(a: String, b: String, max: Int): Int = {
    val la = a.length; val lb = b.length
    if (math.abs(la - lb) > max) return -1
    if (la == 0) return if (lb <= max) lb else -1
    if (lb == 0) return if (la <= max) la else -1
    var prev = new Array[Int](lb + 1)
    var curr = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= la) {
      curr(0) = i
      var rowMin = curr(0)
      j = 1
      while (j <= lb) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        val ins = curr(j - 1) + 1
        if (del < v) v = del
        if (ins < v) v = ins
        curr(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > max) return -1 // band exceeded: abort early
      val t = prev; prev = curr; curr = t
      i += 1
    }
    if (prev(lb) <= max) prev(lb) else -1
  }
}
