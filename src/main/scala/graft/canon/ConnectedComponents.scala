package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components — the GraphFrames-style synonym
  * merge of the north star, hand-rolled because no GraphFrames jar
  * ships in this sandbox (SURVEY.md §7.3).
  *
  * Default algorithm ([[run]]): alternating large-star / small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014 — public knowledge): each round rewires every node's
  * strictly-larger neighbors (large-star) then its smaller-or-equal
  * neighbors (small-star) to the minimum of its neighborhood.
  * Converges in O(log n) rounds on ANY graph shape — a long chain
  * that costs min-label propagation O(diameter) rounds collapses
  * logarithmically. `localCheckpoint` truncates lineage per round
  * (the classic iterative-join pitfall).
  *
  * [[runLabelProp]] keeps the one-join-per-round min-label variant:
  * cheaper per round, the right call when components are known
  * shallow (synonym clusters: diameter ~2-4).
  */
object ConnectedComponents {

  /** Driver-local union-find for SMALL edge lists (dictionary-sized
    * synonym graphs: ~10^5 edges even at full NCIT scale). The
    * iterative distributed path costs ~6-10 Spark jobs of fixed
    * scheduling latency — pure serial overhead that caps scaling
    * efficiency when the component graph is tiny next to the corpus.
    * Returns the same (node, component=min reachable) contract as
    * [[run]]. */
  def runLocal(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val es = edges.select(col("src").cast("string"), col("dst").cast("string"))
      .as[(String, String)].collect()
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val rows = parent.keys.toSeq.sorted.map(n => (n, find(n)))
    spark.createDataset(rows).toDF("node", "component")
  }

  /** @param edges DataFrame with string columns (src, dst), undirected.
    * @return DataFrame (node, component) where component = min node id
    *         reachable (lexicographic). O(log n) large-star/small-star
    *         rounds. */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 30): DataFrame =
    runLogStarStats(spark, edges, maxIter)._1

  /** Size-adaptive dispatch between [[runLocal]] and [[run]]. The
    * component graph is typically orders of magnitude smaller than
    * the corpus it was mined from (near-dup pairs, synonym edges), in
    * which case the distributed alternation's ~6–10 jobs per round
    * are pure scheduler latency; at or below `localThreshold` edges
    * the driver union-find answers in one collect. Both paths honor
    * the same contract (component = lexicographic-min reachable
    * node — union always roots at the smaller id and a root is
    * therefore its set's minimum by induction), so the choice is
    * invisible to callers and to the oracles (asserted in CanonSpec).
    * The input is persisted around the dispatch count so an expensive
    * pair-mining lineage (a similarity join) evaluates once, not
    * twice. */
  def runAdaptive(spark: SparkSession, edges: DataFrame,
                  localThreshold: Long = 200000L): DataFrame = {
    val e = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (e.count() <= localThreshold) runLocal(spark, e)
      else run(spark, e) // run() localCheckpoints first: safe to unpersist after
    } finally { e.unpersist(): Unit }
  }

  /** [[run]] + the number of alternation rounds executed (tests assert
    * logarithmic convergence on adversarial chains). */
  def runLogStarStats(spark: SparkSession, edges: DataFrame,
                      maxIter: Int = 30): (DataFrame, Int) = {
    import spark.implicits._
    // checkpoint the distinct edge set FIRST and derive everything
    // else from it: the input lineage (often an expensive similarity
    // join) is evaluated exactly once, not once per derived table
    val e0 = edges.select($"src".as("u"), $"dst".as("v")).distinct()
      .localCheckpoint()
    val nodes = e0.select($"u".as("node"))
      .unionByName(e0.select($"v".as("node"))).distinct()
      .localCheckpoint()

    def largeStar(e: DataFrame): DataFrame = {
      // symmetrize, then connect every strictly-larger neighbor of u
      // to min(N(u) ∪ {u})
      val sym = e.select($"u", $"v").unionByName(e.select($"v".as("u"), $"u".as("v")))
      val m = least(min($"v").over(Window.partitionBy($"u")), $"u")
      sym.withColumn("m", m)
        .filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .filter($"u" =!= $"v").distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // orient larger->smaller, then connect every smaller neighbor of
      // u AND u itself to min(N≤(u) ∪ {u})
      val dir = e.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
      val withMin = dir.withColumn("m", min($"v").over(Window.partitionBy($"u")))
      withMin.select($"v".as("u"), $"m".as("v"))
        .unionByName(withMin.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v").distinct()
    }
    // xor-fold of row hashes: a sound SET signature (rows are
    // distinct) that cannot overflow under ANSI arithmetic. The
    // signature rides each round's checkpoint materialization as an
    // observe() metric — one job per round instead of two (the
    // previous shape ran a separate agg job over the checkpointed
    // round output just to decide convergence).
    val sigExprs = Seq(count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h"))
    def observedCheckpoint(df: DataFrame): (DataFrame, (Long, Long)) = {
      val obs = new org.apache.spark.sql.Observation()
      val cp = df.observe(obs, sigExprs.head, sigExprs.tail: _*).localCheckpoint()
      (cp, (obs.get("n").asInstanceOf[Long], obs.get("h").asInstanceOf[Long]))
    }

    var (e, sig) = observedCheckpoint(e0.filter($"u" =!= $"v"))
    var iter = 0
    var converged = sig._1 == 0L
    while (iter < maxIter && !converged) {
      val (next, nextSig) = observedCheckpoint(smallStar(largeStar(e)))
      converged = nextSig == sig
      sig = nextSig
      e = next
      iter += 1
    }
    // converged: a star forest of (child, center=component-min) edges;
    // centers (and isolated inputs) map to themselves
    val comp = nodes
      .join(e.groupBy($"u".as("node")).agg(min($"v").as("c")), Seq("node"), "left")
      .select($"node", coalesce($"c", $"node").as("component"))
    (comp, iter)
  }

  /** Iterative min-label propagation: every node adopts the minimum
    * label among itself and its neighbors, O(diameter) rounds —
    * cheaper per round than [[run]], right for shallow graphs. */
  def runLabelProp(spark: SparkSession, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    import spark.implicits._
    val und = edges.select($"src".as("a"), $"dst".as("b"))
      .unionByName(edges.select($"dst".as("a"), $"src".as("b")))
      .filter($"a" =!= $"b").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var comp = und.select($"a".as("node"))
      .unionByName(und.select($"b".as("node"))).distinct()
      .withColumn("component", $"node")
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrMin = und
        .join(comp.withColumnRenamed("node", "b"), "b")
        .groupBy($"a".as("node")).agg(min($"component").as("nbr_min"))
      // changed-row count rides the checkpoint job (observe over the
      // old/new label pair) — no separate next⋈comp probe join per
      // round
      val obs = new org.apache.spark.sql.Observation()
      val next = comp.join(nbrMin, Seq("node"), "left")
        .select($"node", $"component".as("_old"),
          least($"component", coalesce($"nbr_min", $"component")).as("component"))
        .observe(obs, sum(when($"component" =!= $"_old", 1L).otherwise(0L))
          .as("changed"))
        .select($"node", $"component")
        .localCheckpoint()
      val changed = Option(obs.get("changed")).map(_.asInstanceOf[Long])
        .getOrElse(0L)
      comp.unpersist(blocking = false)
      comp = next
      converged = changed == 0
      iter += 1
    }
    und.unpersist(blocking = false)
    comp
  }
}
