package graft.triples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Basic-graph-pattern queries over a materialized (subj, pred, obj)
  * edge table — the declarative replacement for the reference's
  * ad-hoc Cypher MATCH patterns (e.g. the 3-hop chain at reference
  * semantic_retrievers.py:67 `(node)<-[:HAS_PV]-(vdm)<-[:HAS_VDM]-
  * (cde)` is the pattern `[(?cde HAS_VDM ?vdm), (?vdm HAS_PV ?pv)]`).
  * A pattern term starting with `?` is a variable; anything else is a
  * constant. The result is one column per distinct variable, one row
  * per binding (set semantics, like SPARQL SELECT DISTINCT).
  *
  * Compilation is pure Catalyst algebra: each pattern becomes a
  * filtered scan of the edge table (a CONSTANT predicate hits the
  * `pred` partitioning of [[Triples.writeTriples]], so each scan reads
  * only its predicate's files), and patterns chain by inner equi-joins
  * on their shared variables. Catalyst then owns join ordering,
  * broadcast selection for small predicate partitions, and AQE skew
  * handling — exactly the machinery a hand-written traversal would
  * reimplement. Each consecutive pattern must share ≥ 1 variable with
  * the ones before it (enforced), so no cartesian product can appear.
  */
object BgpQuery {

  private def isVar(t: String) = t.startsWith("?")
  private def varName(t: String) = t.substring(1)

  /** Compile one pattern to a DataFrame of its variable bindings. */
  private def one(edges: DataFrame, p: (String, String, String)): DataFrame = {
    val (s, pr, o) = p
    var df = edges.select(col("subj"), col("pred"), col("obj"))
    if (!isVar(pr)) df = df.filter(col("pred") === pr)
    if (!isVar(s)) df = df.filter(col("subj") === s)
    if (!isVar(o)) df = df.filter(col("obj") === o)
    // same variable twice in one pattern constrains equality in place
    if (isVar(s) && isVar(o) && varName(s) == varName(o))
      df = df.filter(col("subj") === col("obj"))
    if (isVar(s) && isVar(pr) && varName(s) == varName(pr))
      df = df.filter(col("subj") === col("pred"))
    if (isVar(o) && isVar(pr) && varName(o) == varName(pr))
      df = df.filter(col("obj") === col("pred"))
    val bound = Seq(
      if (isVar(s)) Some(varName(s) -> col("subj")) else None,
      if (isVar(pr)) Some(varName(pr) -> col("pred")) else None,
      if (isVar(o)) Some(varName(o) -> col("obj")) else None
    ).flatten
    require(bound.nonEmpty, s"pattern $p binds no variable")
    // dedupe repeated-variable projections (?x pred ?x projects once)
    val seen = scala.collection.mutable.LinkedHashMap[String, Column]()
    bound.foreach { case (n, c) => if (!seen.contains(n)) seen(n) = c.as(n) }
    df.select(seen.values.toSeq: _*)
  }

  /** Match `patterns` conjunctively against `edges`; returns the
    * distinct variable bindings, columns in first-appearance order.
    */
  def query(edges: DataFrame, patterns: Seq[(String, String, String)]): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    val compiled = patterns.map(one(edges, _))
    val joined = compiled.reduceLeft { (acc, next) =>
      val shared = acc.columns.intersect(next.columns).toSeq
      require(shared.nonEmpty,
        "disconnected BGP: every pattern must share a variable with a " +
          s"previous one (have ${acc.columns.mkString(",")}; " +
          s"next binds ${next.columns.mkString(",")})")
      acc.join(next, shared)
    }
    // a using-columns join puts the keys first; re-project to the
    // variables' first-appearance order across the patterns
    val order = compiled.flatMap(_.columns).distinct
    joined.select(order.map(col): _*).distinct()
  }
}
