package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative min-label
  * propagation over DataFrame joins — the GraphFrames-style synonym
  * merge of the north star, hand-rolled because no GraphFrames jar
  * ships in this sandbox (SURVEY.md §7.3).
  *
  * Each iteration: every node adopts the minimum label among itself
  * and its neighbors; `localCheckpoint` truncates lineage so the plan
  * doesn't grow with iterations (the classic iterative-join pitfall).
  * Converges in O(diameter) rounds; synonym clusters are shallow
  * (diameter ~2-4), and `maxIter` bounds adversarial chains
  * (SURVEY.md §7.4 "CC convergence cost").
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
    *         reachable (lexicographic). */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 25): DataFrame = {
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
      val next = comp.join(nbrMin, Seq("node"), "left")
        .select($"node",
          least($"component", coalesce($"nbr_min", $"component")).as("component"))
        .localCheckpoint()
      val changed = next.as("n").join(comp.as("c"), "node")
        .filter($"n.component" =!= $"c.component").limit(1).count()
      comp.unpersist(blocking = false)
      comp = next
      converged = changed == 0
      iter += 1
    }
    und.unpersist(blocking = false)
    comp
  }
}
