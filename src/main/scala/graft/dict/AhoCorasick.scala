package graft.dict

import scala.collection.mutable

/** Serializable Aho–Corasick automaton for multi-pattern dictionary
  * matching — the broadcast replacement for the reference's per-value
  * Neo4j index lookups (SURVEY.md §2.10, §4.2 custom #1). Built once
  * on the driver over all normalized dictionary surfaces (preferred
  * terms + synonyms), broadcast to executors, and run inside
  * `Dataset.flatMap` over turn text.
  *
  * Match semantics (pinned for determinism):
  *  - matching is done on the char-lowercased text (length-preserving),
  *  - a hit must be word-bounded: the chars immediately before `begin`
  *    and at `end` are non-letter/digit (or string edge),
  *  - all word-bounded occurrences are emitted, then reduced to the
  *    LONGEST match per start offset (leftmost-longest, ties impossible
  *    since patterns at same (begin,end) are identical strings),
  *  - output sorted by (begin, end).
  */
final class AhoCorasick private (
    // flat trie: goto transitions as per-node hashmaps (built once; read-mostly)
    private val children: Array[mutable.LongMap[Int]],
    private val fail: Array[Int],
    // per node: lengths of patterns ending here (via output links collapsed)
    private val outputs: Array[Array[Int]]) extends Serializable {

  @inline private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c)

  /** All word-bounded, longest-per-start matches.
    * Returns (begin, end) offsets into `text` ([begin, end)). */
  def findMatches(text: String): IndexedSeq[(Int, Int)] = {
    if (text == null || text.isEmpty) return Vector.empty
    val n = text.length
    val raw = mutable.ArrayBuffer.empty[(Int, Int)]
    var state = 0
    var i = 0
    while (i < n) {
      val c = Character.toLowerCase(text.charAt(i)).toLong
      var s = state
      while (s != 0 && !children(s).contains(c)) s = fail(s)
      state = children(s).getOrElse(c, 0)
      val outs = outputs(state)
      var k = 0
      while (k < outs.length) {
        val len = outs(k)
        val begin = i + 1 - len
        val boundedLeft = begin == 0 || !isWordChar(text.charAt(begin - 1))
        val boundedRight = i + 1 == n || !isWordChar(text.charAt(i + 1))
        if (boundedLeft && boundedRight) raw += ((begin, i + 1))
        k += 1
      }
      i += 1
    }
    if (raw.isEmpty) Vector.empty
    else {
      // longest per begin, sorted by begin, then drop matches fully
      // contained in an earlier (longer) match: begins are distinct
      // and ascending, so containment == end <= max end seen so far
      val longest = raw.groupBy(_._1).iterator
        .map { case (_, ms) => ms.maxBy(_._2) }
        .toVector.sortBy(m => (m._1, m._2))
      var maxEnd = -1
      longest.filter { case (_, e) =>
        val keep = e > maxEnd
        if (keep) maxEnd = e
        keep
      }
    }
  }

  def numNodes: Int = children.length
}

object AhoCorasick {

  /** Build from normalized surfaces (caller must pre-normalize with
    * [[graft.functions.Hashing.norm]]; matching lowercases text
    * chars 1:1 so offsets remain valid in the original text). */
  def build(surfaces: Iterable[String]): AhoCorasick = {
    val children = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
    val patLen = mutable.ArrayBuffer(-1) // pattern length ending at node, -1 if none
    // trie insert
    surfaces.iterator.filter(s => s != null && s.nonEmpty).foreach { pat =>
      var node = 0
      var i = 0
      while (i < pat.length) {
        val c = pat.charAt(i).toLong
        node = children(node).getOrElse(c, {
          children += mutable.LongMap.empty[Int]
          patLen += -1
          val nn = children.length - 1
          children(node).update(c, nn)
          nn
        })
        i += 1
      }
      patLen(node) = pat.length
    }
    val size = children.length
    val fail = new Array[Int](size)
    val outBuf = Array.fill(size)(mutable.ArrayBuffer.empty[Int])
    // BFS failure links
    val queue = mutable.Queue.empty[Int]
    children(0).foreach { case (_, child) =>
      fail(child) = 0
      if (patLen(child) >= 0) outBuf(child) += patLen(child)
      queue.enqueue(child)
    }
    while (queue.nonEmpty) {
      val node = queue.dequeue()
      children(node).foreach { case (c, child) =>
        var f = fail(node)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(child) = children(f).getOrElse(c, 0) match {
          case `child` => 0 // self-loop guard at root
          case other   => other
        }
        outBuf(child) ++= outBuf(fail(child))
        if (patLen(child) >= 0) outBuf(child) += patLen(child)
        queue.enqueue(child)
      }
    }
    new AhoCorasick(children.toArray, fail,
      outBuf.map(_.distinct.sorted.toArray))
  }
}
