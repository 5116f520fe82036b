package graft

import java.sql.Timestamp

import graft.ops.{Conversations, Packing, TextAnalysis}

/** Sequence packing (distributed prefix sum), corpus-level duplicated
  * n-gram fraction, and conversation-level exact dedup. Pins offset
  * arithmetic, parallelism invariance (the prefix sum must not depend
  * on range-partition boundaries), occurrence counting, and the
  * order-pinned conversation fingerprint. */
class PackDupSpec extends SparkTestBase {
  import spark.implicits._

  test("packing: offsets are the serial prefix sum; chunks split correctly") {
    val docs = Seq((0L, 100L), (1L, 50L), (2L, 200L), (3L, 10L), (4L, 300L))
      .toDF("id", "n")
    val got = Packing.packByOffset(spark, docs, "id", "n", capacity = 128L)
      .select("id", "start_offset", "chunk_first", "chunk_last")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 0L, 0L, 0L),     // [0,100) in chunk 0
      (1L, 100L, 0L, 1L),   // [100,150) spans the 128 boundary
      (2L, 150L, 1L, 2L),   // [150,350)
      (3L, 350L, 2L, 2L),
      (4L, 360L, 2L, 5L)))  // [360,660) spans chunks 2..5
  }

  test("packing: invariant under input partitioning and size") {
    val docs = (0L until 500L).map(i => (i, 1L + i % 37)).toDF("id", "n")
    val a = Packing.packByOffset(spark, docs.repartition(1), "id", "n", 256L)
      .select("id", "start_offset").as[(Long, Long)].collect().sortBy(_._1)
    val b = Packing.packByOffset(spark, docs.repartition(13), "id", "n", 256L)
      .select("id", "start_offset").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    // serial ground truth
    var acc = 0L
    val expect = (0L until 500L).map { i =>
      val o = acc; acc += 1L + i % 37; (i, o) }
    assert(a.toSeq == expect)
  }

  test("packing: two-phase prefix sum creates no single-partition exchange") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, sum}
    val docs = (0L until 1000L).map(i => (i, 1L + i % 7)).toDF("id", "n")
    val packed = Packing.packByOffset(spark, docs.repartition(4), "id", "n", 128L)
    val plan = packed.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
    // the naive global-window form DOES — the scale hazard avoided
    val naive = docs.withColumn("off", sum(col("n")).over(
      Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, -1)))
    assert(naive.queryExecution.executedPlan.toString.contains("SinglePartition"))
  }

  test("dupNgramFraction: per-doc DISTINCT shingles, df-based dup flag") {
    val docs = Seq(
      (1L, "a b c a b c"),  // distinct shingles: {a b c, b c a, c a b}
      (2L, "a b c d"),      // {a b c, b c d}
      (3L, "x y")           // too short -> absent
    ).toDF("id", "text")
    val got = TextAnalysis.dupNgramFraction(docs, "id", "text", n = 3,
        threshold = 1)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // df("a b c") = 2 docs > 1 -> dup; everything else df = 1
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 3L, 1L), (2L, 2L, 1L)))
    assert(got(0)._4 == 0.3333 && got(1)._4 == 0.5)
  }

  test("conversation dedup: order-pinned fingerprint groups exact copies") {
    def turn(c: String, i: Int, t: String) =
      (c, i, "user", t, null: String, new Timestamp(1704067200000L + i))
    val turns = (Seq(
      turn("cA", 0, "hello"), turn("cA", 1, "world"),
      turn("cB", 1, "world"), turn("cB", 0, "hello"), // same content, rows shuffled
      turn("cC", 0, "world"), turn("cC", 1, "hello")  // same texts, OTHER order
    )).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = Conversations.dedupExact(turns.repartition(5))
      .as[(String, Long, Long, String, Long, Int)].collect().sortBy(_._1)
    val byConv = got.map(r => r._1 -> r).toMap
    assert(byConv("cA")._4 == "cA" && byConv("cA")._5 == 2 && byConv("cA")._6 == 1)
    assert(byConv("cB")._4 == "cA" && byConv("cB")._6 == 0) // dup of cA
    assert(byConv("cC")._4 == "cC" && byConv("cC")._5 == 1) // order differs
    assert(byConv("cA")._3 == byConv("cB")._3
      && byConv("cA")._3 != byConv("cC")._3)
  }
}
