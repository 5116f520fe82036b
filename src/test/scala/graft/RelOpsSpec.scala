package graft

import java.sql.Timestamp


import org.apache.spark.sql.functions._

import graft.ops.{AsofJoin, Quantiles, RangeJoin}

/** As-of join, bucketed range join, exact histogram quantiles —
  * each checked against an independent brute-force reference on
  * randomized (seeded) data, plus the plan-shape guarantees that make
  * them scale. */
class RelOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asof: latest at-or-before snapshot per key, ties match, no-match is null") {
    val left = Seq(
      (1L, "a", ts(100)), (2L, "a", ts(105)), (3L, "a", ts(99)),
      (4L, "b", ts(100)), (5L, "c", ts(500))
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts(100), 10.0), ("a", ts(104), 11.0), ("b", ts(101), 20.0),
      ("c", ts(1), 30.0)
    ).toDF("k", "t", "v")
    val out = AsofJoin.asof(left, right, "k", "t", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(10.0)) // tie at ts 100 matches
    assert(out(2L).contains(11.0)) // latest of the two
    assert(out(3L).isEmpty)        // before any snapshot
    assert(out(4L).isEmpty)        // snapshot is AFTER the left row
    assert(out(5L).contains(30.0)) // old snapshot still live
  }

  test("asof: (key, ts) collisions reduce to the greatest payload deterministically") {
    val left = Seq((1L, "a", ts(10))).toDF("id", "k", "t")
    val right = Seq(("a", ts(5), 1.0, "x"), ("a", ts(5), 2.0, "y"))
      .toDF("k", "t", "v", "s")
    val r = AsofJoin.asof(left, right, "k", "t", Seq("v", "s")).head()
    assert(r.getAs[Double]("asof_v") == 2.0 && r.getAs[String]("asof_s") == "y")
  }

  test("asof matches the brute-force reference on seeded random data") {
    val rnd = new scala.util.Random(42)
    val keys = Vector("k0", "k1", "k2", "k3")
    val leftRows = (1 to 300).map(i =>
      (i.toLong, keys(rnd.nextInt(4)), ts(rnd.nextInt(1000).toLong)))
    val rightRows = (1 to 80).map(_ =>
      (keys(rnd.nextInt(4)), ts(rnd.nextInt(1000).toLong), rnd.nextInt(100).toDouble))
    val out = AsofJoin.asof(leftRows.toDF("id", "k", "t"),
        rightRows.toDF("k", "t", "v"), "k", "t", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[Double])].collect().toMap
    // reference: dedupe (k,t) to max v, then latest at-or-before
    val dedup = rightRows.groupBy(r => (r._1, r._2.getTime))
      .map { case (k, rs) => (k._1, k._2, rs.map(_._3).max) }
    leftRows.foreach { case (id, k, t) =>
      val expect = dedup.filter(r => r._1 == k && r._2 <= t.getTime)
      val got = out(id)
      if (expect.isEmpty) assert(got.isEmpty, s"id=$id")
      else assert(got.contains(expect.maxBy(_._2)._3), s"id=$id")
    }
  }

  test("asof plan: exactly one exchange — no pair explosion, no point joins") {
    val left = (1 to 50).map(i => (i.toLong, s"k${i % 3}", ts(i.toLong))).toDF("id", "k", "t")
    val right = (1 to 20).map(i => (s"k${i % 3}", ts(i.toLong), i.toDouble)).toDF("k", "t", "v")
    val p = AsofJoin.asof(left, right, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    // one shuffle for the (key,ts) dedupe of the right side feeding
    // the union, one for the window partitioning — both on key-sized
    // data; crucially ZERO joins in the plan at all
    assert("Exchange".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("Join"), s"asof must be join-free:\n$p")
  }

  test("bucketed range join equals the naive range filter, across widths") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 400).map(i => (i.toLong, rnd.nextDouble() * 100))
      .toDF("pid", "pv")
    val ivals = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 95
      (i.toLong, lo, lo + rnd.nextDouble() * 10)
    }.toDF("iid", "lo", "hi")
    val naive = points.join(ivals, $"pv" >= $"lo" && $"pv" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(0.5, 5.0, 200.0)) {
      val got = RangeJoin.bucketed(points, "pv", ivals, "lo", "hi", w)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"width $w")
    }
    intercept[IllegalArgumentException] {
      RangeJoin.bucketed(points, "pv", ivals, "lo", "hi", 0.0)
    }
  }

  test("range join plan: hash-partitioned equi-join, no nested loop") {
    val points = (1 to 100).map(i => (i.toLong, i * 0.7)).toDF("pid", "pv")
    val ivals = (1 to 20).map(i => (i.toLong, i * 3.0, i * 3.0 + 5)).toDF("iid", "lo", "hi")
    val p = RangeJoin.bucketed(points, "pv", ivals, "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoop"),
      s"bucketed range join must not nested-loop:\n$p")
    assert(p.contains("Join"), p) // it IS a real (hash) equi-join
    // the naive formulation DOES nested-loop — that's the point
    val naive = points.join(ivals, $"pv" >= $"lo" && $"pv" <= $"hi")
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoop"), naive)
  }

  test("exact histogram quantiles match the sorted-array reference") {
    val rnd = new scala.util.Random(11)
    val xs = (1 to 999).map(_ => rnd.nextInt(50).toLong)
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val got = Quantiles.exactHistogram(xs.toDF("v"), "v", qs)
      .select($"q", $"value").as[(Double, Long)].collect().toMap
    val sorted = xs.sorted
    qs.foreach { q =>
      val rank = math.max(math.ceil(q * xs.size).toLong, 1L)
      assert(got(q) == sorted((rank - 1).toInt), s"q=$q")
    }
    assert(got(1.0) == xs.max && got(0.0) == xs.min)
  }

  test("sessionize: gap splits, ties share a session, matches reference") {
    val rnd = new scala.util.Random(13)
    // seconds-resolution events incl. deliberate duplicate timestamps
    val rows = (1 to 400).map { i =>
      val k = s"u${i % 5}"
      val t = rnd.nextInt(2000).toLong * 10
      (i.toLong, k, ts(t))
    } ++ Seq((9001L, "u0", ts(50)), (9002L, "u0", ts(50))) // forced ties
    val gapUs = 300L * 1000000 // 300s
    val got = graft.ops.Sessionize
      .stats(rows.toDF("id", "k", "t"), "k", "t", gapUs)
      .select($"k", $"session_idx", $"n_events", $"t_start_us", $"t_end_us")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // reference: sort per key, break on gap > 300s (ties: diff 0)
    val expect = rows.groupBy(_._2).flatMap { case (k, rs) =>
      val sorted = rs.map(_._3.getTime * 1000).sorted
      val sessions = scala.collection.mutable.ArrayBuffer[Vector[Long]](Vector(sorted.head))
      sorted.tail.foreach { t =>
        if (t - sessions.last.last > gapUs) sessions += Vector(t)
        else sessions(sessions.size - 1) = sessions.last :+ t
      }
      sessions.zipWithIndex.map { case (s, i) =>
        (k, i.toLong, s.size.toLong, s.head, s.last)
      }
    }.toSet
    assert(got == expect)
  }

  test("sessionize agrees with Spark's built-in session_window") {
    // boundary semantics differ at EXACT gap (session_window breaks at
    // diff >= gap, ours at diff > gap): ts are multiples of 10s and the
    // gap 305s is not, so no tie can land on the boundary and the two
    // must partition identically
    val rnd = new scala.util.Random(17)
    val rows = (1 to 300).map { i =>
      (i.toLong, s"u${i % 4}", ts(rnd.nextInt(3000).toLong * 10))
    }
    val df = rows.toDF("id", "k", "t")
    val ours = graft.ops.Sessionize.stats(df, "k", "t", gapUs = 305L * 1000000)
      .select($"k", $"n_events", $"t_start_us", $"t_end_us")
      .as[(String, Long, Long, Long)].collect().toSet
    val builtin = df
      .groupBy($"k", session_window($"t".cast("timestamp"), "305 seconds"))
      .agg(count(lit(1)).as("n"), unix_micros(min($"t".cast("timestamp"))).as("s"),
        unix_micros(max($"t".cast("timestamp"))).as("e"))
      .select($"k", $"n", $"s", $"e")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(ours == builtin)
  }

  test("adaptive CC: local union-find and distributed alternation agree") {
    val rnd = new scala.util.Random(3)
    val edges = (1 to 150).map(_ =>
      (s"n${rnd.nextInt(60)}", s"n${rnd.nextInt(60)}")).toDF("src", "dst")
    val local = graft.canon.ConnectedComponents
      .runAdaptive(spark, edges, localThreshold = Long.MaxValue)
      .as[(String, String)].collect().toSet
    val dist = graft.canon.ConnectedComponents
      .runAdaptive(spark, edges, localThreshold = 0L)
      .as[(String, String)].collect().toSet
    // distributed run() drops self-loop-only isolated nodes the same
    // way runLocal does (both see only edge endpoints)
    assert(local == dist)
  }
}
