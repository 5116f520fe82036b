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
  *
  * Storage is flat primitive arrays, not per-node hash maps: a real
  * NCIT-scale dictionary (10^5 concepts + synonyms) builds millions of
  * trie nodes, and one boxed map per node would (a) multiply the
  * broadcast size ~5x and (b) turn the per-char hot loop into random
  * heap chasing. Layout:
  *  - root transitions: one dense 64K int table (~256 KB) — the common
  *    case in transcript text is "char starts no pattern", resolved in
  *    a single array read with no hashing and no failure chasing;
  *  - depth>=1 transitions: all (char -> target) pairs flattened into
  *    two parallel arrays, char-sorted per node, sliced by a node
  *    offset table; lookup is a branch-light binary search over a
  *    cache-resident slice (surface alphabets are small);
  *  - outputs: pattern lengths flattened the same way.
  */
final class AhoCorasick private (
    private val rootNext: Array[Int],   // dense char -> state (0 = none)
    private val nodeOff: Array[Int],    // node -> [start, end) into trans*
    private val transChar: Array[Char], // sorted within each node slice
    private val transTo: Array[Int],
    private val fail: Array[Int],
    private val outOff: Array[Int],     // node -> [start, end) into outLen
    private val outLen: Array[Int]) extends Serializable {

  @inline private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c)

  /** Transition from `s` on `c`; -1 if absent (root never returns -1:
    * missing root transitions self-loop to 0). */
  @inline private def next(s: Int, c: Char): Int = {
    if (s == 0) rootNext(c)
    else {
      var lo = nodeOff(s)
      var hi = nodeOff(s + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mc = transChar(mid)
        if (mc == c) return transTo(mid)
        if (mc < c) lo = mid + 1 else hi = mid - 1
      }
      -1
    }
  }

  /** All word-bounded, longest-per-start matches.
    * Returns (begin, end) offsets into `text` ([begin, end)). */
  def findMatches(text: String): IndexedSeq[(Int, Int)] = {
    if (text == null || text.isEmpty) return Vector.empty
    val n = text.length
    var raw: mutable.ArrayBuffer[(Int, Int)] = null
    var state = 0
    var i = 0
    while (i < n) {
      val c = Character.toLowerCase(text.charAt(i))
      var s = state
      var t = next(s, c)
      while (t < 0 && s != 0) { s = fail(s); t = next(s, c) }
      state = if (t < 0) 0 else t
      var k = outOff(state)
      val kEnd = outOff(state + 1)
      while (k < kEnd) {
        val len = outLen(k)
        val begin = i + 1 - len
        val boundedLeft = begin == 0 || !isWordChar(text.charAt(begin - 1))
        val boundedRight = i + 1 == n || !isWordChar(text.charAt(i + 1))
        if (boundedLeft && boundedRight) {
          if (raw == null) raw = mutable.ArrayBuffer.empty[(Int, Int)]
          raw += ((begin, i + 1))
        }
        k += 1
      }
      i += 1
    }
    if (raw == null) Vector.empty
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

  def numNodes: Int = nodeOff.length - 1
}

object AhoCorasick {

  /** Build from normalized surfaces (caller must pre-normalize with
    * [[graft.functions.Hashing.norm]]; matching lowercases text
    * chars 1:1 so offsets remain valid in the original text).
    * Construction uses per-node maps (driver-side, one-off); the
    * result is compacted into the flat broadcast layout. */
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
    // ---- compact into the flat layout ----
    val rootNext = new Array[Int](Char.MaxValue + 1)
    children(0).foreach { case (c, t) => rootNext(c.toInt) = t }
    val nodeOff = new Array[Int](size + 1)
    var total = 0
    var i = 1 // node 0's transitions live in rootNext only
    while (i < size) { total += children(i).size; i += 1 }
    val transChar = new Array[Char](total)
    val transTo = new Array[Int](total)
    var pos = 0
    i = 0
    nodeOff(0) = 0; nodeOff(1) = 0 // empty slice for root
    while (i < size) {
      if (i > 0) {
        val sorted = children(i).toArray.sortBy(_._1)
        var j = 0
        while (j < sorted.length) {
          transChar(pos) = sorted(j)._1.toChar
          transTo(pos) = sorted(j)._2
          pos += 1; j += 1
        }
      }
      nodeOff(i + 1) = pos
      i += 1
    }
    val outs = outBuf.map(_.distinct.sorted)
    val outOff = new Array[Int](size + 1)
    i = 0
    var opos = 0
    while (i < size) { outOff(i) = opos; opos += outs(i).length; i += 1 }
    outOff(size) = opos
    val outLen = new Array[Int](opos)
    i = 0
    while (i < size) {
      var j = 0
      val off = outOff(i)
      while (j < outs(i).length) { outLen(off + j) = outs(i)(j); j += 1 }
      i += 1
    }
    new AhoCorasick(rootNext, nodeOff, transChar, transTo, fail, outOff, outLen)
  }
}
