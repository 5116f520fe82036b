package graft.functions

/** Deterministic local text vectorizer — the stand-in for the
  * reference's per-string OpenAI ada-002 embedding RPC
  * (reference semantic_retrievers.py:23-35), which is irreproducible
  * offline and a per-row network call (the N+1 anti-pattern,
  * SURVEY.md S6). We use the signed feature-hashing trick
  * (Weinberger et al., ICML 2009 — public knowledge): token -> bucket
  * via hash, sign via an independent hash bit, L2-normalized.
  *
  * Pure function of the text: identical vectors on every executor,
  * every run, every parallelism level. Applied in batch inside
  * `mapPartitions` / typed map — no external calls.
  */
object Vectorizer {
  val DefaultDim = 64

  /** Word-token feature hashing (documents / topical similarity). */
  def vectorize(text: String, dim: Int = DefaultDim): Array[Float] =
    hashFeatures(Hashing.tokenize(text), dim)

  /** Char-trigram feature hashing — robust to misspellings; used for
    * the semantic ladder stage + dictionary embeddings (the ada-002
    * stand-in for surface-form similarity). */
  def vectorizeChar(text: String, dim: Int = DefaultDim): Array[Float] =
    hashFeatures(Hashing.charShingles(Hashing.norm(text), 3), dim)

  private def hashFeatures(toks: Array[String], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < toks.length) {
      val h = Hashing.hash64(toks(i))
      val bucket = java.lang.Math.floorMod(h, dim.toLong).toInt
      val sign = if (((h >>> 62) & 1L) == 1L) 1.0f else -1.0f
      v(bucket) += sign
      i += 1
    }
    // L2 normalize
    var nrm = 0.0
    var j = 0
    while (j < dim) { nrm += v(j).toDouble * v(j); j += 1 }
    if (nrm > 0) {
      val inv = (1.0 / math.sqrt(nrm)).toFloat
      j = 0
      while (j < dim) { v(j) *= inv; j += 1 }
    }
    v
  }
}
