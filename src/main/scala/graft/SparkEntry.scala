package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Decontaminate, Dedup, Multimodal, Sampling, TextAnalysis}

/** Driver contract (see /root/repo/SURVEY.md §2 for the operator
  * inventory each query demonstrates). Every SQL-expressible operator
  * carries a DuckDB oracle in [[oracleSql]] with IDENTICAL column
  * names and ordering; non-SQL-expressible ops (sketch-hash dedup,
  * the full pipeline) are rows-only checked.
  */
object SparkEntry {

  // ---------- helpers ----------

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private[graft] def rmTree(f: java.io.File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(rmTree)
    f.delete(): Unit
  }

  /** JVM-exit cleanup for per-invocation temp dirs whose files are
    * still lazily referenced by the returned DataFrame (the JSON sink
    * round-trips): repeated bench/verify/scale-step runs in one
    * session must not accumulate a directory per call forever. ONE
    * shared shutdown hook drains a queue of paths — not a new hook
    * thread per invocation. */
  private val exitCleanupQueue =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val exitCleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = exitCleanupQueue.poll()
      while (p != null) { rmTree(new java.io.File(p)); p = exitCleanupQueue.poll() }
    }))
  private def rmTreeOnExit(path: String): String = {
    exitCleanupHook
    exitCleanupQueue.add(path)
    path
  }

  /** Transcript table of exactly the BASELINE.json input_hint shape,
    * derived deterministically from the driver's `documents` table so
    * DuckDB can derive the identical table for oracles. */
  private def transcripts(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    T(s, dir, "documents").select(
      concat(lit("conv-"), col("source")).as("conv_id"),
      (row_number().over(w) - 1).as("turn_idx"),
      when(col("doc_id") % 3 === 0, "user")
        .when(col("doc_id") % 3 === 1, "assistant")
        .otherwise("tool").as("role"),
      col("text"),
      when(col("doc_id") % 3 === 2,
        concat(lit("tool_"), (col("doc_id") % 5).cast("string")))
        .otherwise(lit(null).cast("string")).as("tool"),
      timestamp_seconds(lit(1704067200L) + col("doc_id")).as("ts"))
  }

  /** The same derivation as ANSI SQL for DuckDB (ts excluded from
    * oracle projections — engines format timestamps differently). */
  private val transcriptsSql: String =
    """SELECT 'conv-' || source AS conv_id,
      |  (row_number() OVER (PARTITION BY source ORDER BY doc_id)) - 1 AS turn_idx,
      |  CASE WHEN doc_id % 3 = 0 THEN 'user'
      |       WHEN doc_id % 3 = 1 THEN 'assistant' ELSE 'tool' END AS role,
      |  text,
      |  CASE WHEN doc_id % 3 = 2 THEN 'tool_' || (doc_id % 5) END AS tool
      |FROM documents""".stripMargin

  /** Shared by kg_mention_detect (batch) and streaming_mention_parity
    * (the same extraction through Structured Streaming) — one oracle,
    * two execution engines. Lazy: references kgTermsSqlValues, which
    * is declared further down this object. */
  private lazy val mentionDetectSql: String =
    s"""WITH t AS ($transcriptsSql),
       | d(code, term) AS (SELECT * FROM (VALUES $kgTermsSqlValues) v(code, term))
       |SELECT conv_id, turn_idx, term,
       | len(regexp_extract_all(lower(t.text), '\\b' || d.term || '\\b')) AS n
       |FROM t, d
       |WHERE len(regexp_extract_all(lower(t.text), '\\b' || d.term || '\\b')) > 0
       |ORDER BY conv_id, turn_idx, term""".stripMargin

  /** Time-stamped (concept, MENTIONED_IN, conv) triple observations —
    * one row per (conversation, turn, concept) mention with the turn's
    * exact epoch seconds; shared by the temporal-scoping queries. */
  private def mentionObs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ac = s.sparkContext.broadcast(
      graft.dict.AhoCorasick.build(kgTerms.map(_._2)))
    val dictDf = kgTerms.toDF("code", "term")
    transcripts(s, dir)
      .select(col("conv_id"), col("turn_idx"),
        unix_timestamp(col("ts")).as("ts_epoch"), col("text"))
      .as[(String, Int, Long, String)]
      .flatMap { case (cid, ti, ts, text) =>
        ac.value.findMatches(text).map { case (b, e) =>
          (cid, ti, ts, text.substring(b, e).toLowerCase)
        }
      }.toDF("conv_id", "turn_idx", "ts_epoch", "term").distinct()
      .join(broadcast(dictDf), "term")
      .select(col("code").as("subj"), lit("MENTIONED_IN").as("pred"),
        col("conv_id").as("obj"), col("ts_epoch"))
  }

  /** Per-turn linked mentions (conv_id, turn_idx, code, term) —
    * word-bounded Aho–Corasick detection against the broadcast mini
    * dictionary; shared by the relation-extraction / coref /
    * incremental queries. */
  private[graft] def testKgMentions(s: SparkSession, dir: String): DataFrame =
    kgMentions(s, dir)

  private def kgMentions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ac = s.sparkContext.broadcast(
      graft.dict.AhoCorasick.build(kgTerms.map(_._2)))
    val dictDf = kgTerms.toDF("code", "term")
    transcripts(s, dir)
      .select(col("conv_id"), col("turn_idx"), col("text"))
      .as[(String, Int, String)]
      .flatMap { case (cid, ti, text) =>
        ac.value.findMatches(text).map { case (b, e) =>
          (cid, ti, text.substring(b, e).toLowerCase)
        }
      }.toDF("conv_id", "turn_idx", "term").distinct()
      .join(broadcast(dictDf), "term")
      .select(col("conv_id"), col("turn_idx"), col("code"), col("term"))
  }

  /** Mini KG dictionary over the documents vocabulary for the
    * oracle-checkable mention-detection / entity-link queries. No
    * surface is a word-bounded substring or prefix-sharer of another
    * (keeps AC longest-match == per-term regex semantics). */
  private val kgTerms: Seq[(String, String)] = Seq(
    ("K001", "spark"), ("K002", "data table"), ("K003", "hash join"),
    ("K004", "sort merge"), ("K005", "stream"), ("K006", "vector"),
    ("K007", "window filter"), ("K008", "batch"), ("K009", "scan"),
    ("K010", "agg"))

  private val kgTermsSqlValues: String =
    kgTerms.map { case (c, t) => s"('$c','$t')" }.mkString(", ")

  /** Child → parent is-a edges over the mini dictionary (two internal
    * categories + a root) — shared by kg_hierarchy_rollup and its
    * oracle. */
  private val kgIsaEdges: Seq[(String, String)] = Seq(
    ("K002", "K100"), ("K003", "K100"), ("K004", "K100"),
    ("K005", "K101"), ("K008", "K101"),
    ("K100", "K999"), ("K101", "K999"),
    ("K001", "K999"), ("K006", "K999"), ("K007", "K999"),
    ("K009", "K999"), ("K010", "K999"))

  private val kgIsaSqlValues: String =
    kgIsaEdges.map { case (c, p) => s"('$c','$p')" }.mkString(", ")

  /** Recursive-CTE connected-components ground truth — shared by the
    * adaptive-dispatch AND forced-distributed catalog entries (both
    * honor the same component = min-reachable-node contract). */
  private val ccOracleSql: String =
    """WITH RECURSIVE e AS (
      |  SELECT DISTINCT 's' || l_suppkey AS a, 'p' || (l_partkey % 20) AS b FROM lineitem),
      | und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
      | reach(n, m) AS (
      |  SELECT a, b FROM und
      |  UNION
      |  SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a WHERE u.b <> r.n)
      |SELECT n AS node, least(n, min(m)) AS component FROM reach
      |GROUP BY n ORDER BY node""".stripMargin

  /** Shared by the kg_semantic_definition query AND its oracle. */
  private val semanticDefQueries: Seq[(String, String)] = Seq(
    ("q1", "persistently high blood pressure"),
    ("q2", "malignant tumor found in lung tissue"),
    ("q3", "indicator of receptor expression status"))

  /** Shared by kg_term_search_typed + oracle. Pre-normalized (lower,
    * single-spaced) so query text == norm_text(query text). */
  private val termSearchQueries: Seq[(String, String)] = Seq(
    ("q1", "tumor stage category"),
    ("q2", "smoking status"))

  /** Fixture dictionary definitions as (node_type, code, term,
    * defVector) SQL VALUES — the DuckDB twin of PreparedDict.defs. */
  private lazy val defRowsSqlValues: String = {
    val ncit = graft.fixtures.Fixtures.ncitRows.collect {
      case (c, t, d, _) if d != null => ("NCIT", c, t, d) }
    val cde = graft.fixtures.Fixtures.cdeRows.map { case (c, t, _) => ("CDE", c, t, t) }
    (ncit ++ cde).map { case (ty, c, t, d) =>
      s"('$ty','${sqlQuote(c)}','${sqlQuote(t)}'," +
        s"${vecSql(graft.functions.Vectorizer.vectorizeChar(d))})"
    }.mkString(",\n  ")
  }

  private lazy val semanticDefQuerySqlValues: String =
    semanticDefQueries.map { case (id, d) =>
      s"('$id',${vecSql(graft.functions.Vectorizer.vectorizeChar(d))})"
    }.mkString(",\n  ")

  /** Fixture surface table (norm, code, ctype) as SQL VALUES — the
    * DuckDB twin of PreparedDict.fuzzySurfaces (same construction:
    * NCIT/PV/CDE preferred terms + synonyms, normalized, distinct). */
  private lazy val surfaceSqlValues: String = {
    import graft.fixtures.Fixtures._
    import graft.functions.Hashing.norm
    val rows =
      ncitRows.map { case (c, t, _, _) => (norm(t), c, "NCIT") } ++
      pvRows.map { case (c, t, _) => (norm(t), c, "PV") } ++
      cdeRows.map { case (c, t, _) => (norm(t), c, "CDE") } ++
      ncitRows.flatMap { case (c, _, _, ss) => ss.map(s => (norm(s), c, "SYN")) }
    rows.distinct.map { case (n, c, ty) =>
      s"('${sqlQuote(n)}','${sqlQuote(c)}','$ty')" }.mkString(",\n  ")
  }

  /** JVM twins of PreparedDict's N-surfaces + maxIdf over the fixture
    * dict (needed as literals in the term-search oracle). */
  private lazy val fixtureNSurf: Long = {
    import graft.fixtures.Fixtures._
    import graft.functions.Hashing.norm
    (ncitRows.map(r => norm(r._2)) ++ pvRows.map(r => norm(r._2)) ++
      cdeRows.map(r => norm(r._2)) ++ ncitRows.flatMap(_._4).map(norm))
      .distinct.size.toLong
  }
  private lazy val fixtureMaxIdf: Double =
    math.floor(math.log1p(fixtureNSurf.toDouble) * 1048576 + 0.5) / 1048576

  /** JVM twins of PreparedDict's BM25 constants over the fixture dict
    * (literals in the kg_term_search_bm25 oracle): total token count
    * over distinct surfaces, and the df=0 idf for unseen query tokens
    * (same log(1.0 + x) expression the Column/SQL forms evaluate). */
  private lazy val fixtureTotalTok: Long = {
    import graft.fixtures.Fixtures._
    import graft.functions.Hashing.norm
    (ncitRows.map(r => norm(r._2)) ++ pvRows.map(r => norm(r._2)) ++
      cdeRows.map(r => norm(r._2)) ++ ncitRows.flatMap(_._4).map(norm))
      .distinct.map(_.split(" ").length.toLong).sum
  }
  private lazy val fixtureBm25MaxIdf: Double = {
    val n = fixtureNSurf.toDouble
    math.floor(math.log(1.0 + (n - 0.0 + 0.5) / (0.0 + 0.5)) * 1048576 + 0.5) / 1048576
  }

  /** Shared by kg_term_search_bm25 + oracle. Pre-normalized; q3
    * repeats a token to pin the tf>1 (k1 saturation) path. */
  private val bm25SearchQueries: Seq[(String, String)] = Seq(
    ("q1", "tumor stage category"),
    ("q2", "smoking status"),
    ("q3", "stage iv stage"))

  /** Shared by kg_rerank_oc + oracle: (query_id, cde_code|null, base
    * score). Exercises OC present / CDE-without-OC / no-CDE rows. */
  private val rerankCandidates: Seq[(String, String, Double)] = Seq(
    ("q_stage", "CDE2001", 0.92), ("q_stage", "CDE2007", 0.85),
    ("q_stage", "CDE2008", 0.80), ("q_stage", null, 0.75))

  /** cde -> (oc term, oc embedding) VALUES — DuckDB twin of
    * Rerank.cdeToOc over the fixture dict (one OC per CDE there). */
  private lazy val cdeOcSqlValues: String =
    graft.fixtures.Fixtures.decOc.map { case (cde, _, _, ocTerm) =>
      s"('$cde','${sqlQuote(ocTerm)}',${vecSql(graft.fixtures.Fixtures.embed(ocTerm))})"
    }.mkString(",\n  ")

  /** Fixture synonym + PV edges as SQL VALUES (kg_synonym_lookup oracle). */
  private lazy val synonymSqlValues: String =
    graft.fixtures.Fixtures.ncitRows.flatMap { case (c, _, _, ss) =>
      ss.map(s => s"('$c','${sqlQuote(s)}')") }.mkString(", ")
  private lazy val pvEdgeSqlValues: String =
    graft.fixtures.Fixtures.pvRows.map { case (c, t, n) =>
      s"('$c','${sqlQuote(t)}','$n')" }.mkString(", ")

  /** Fixture NCIT vertices / CDE->VDM / VDM->PV edges as SQL VALUES
    * (kg_graph_materialize oracle). */
  private lazy val ncitVertexSqlValues: String =
    graft.fixtures.Fixtures.ncitRows.map { case (c, t, _, _) =>
      s"('$c','${sqlQuote(t)}')" }.mkString(", ")
  private lazy val cdeVdmSqlValues: String =
    graft.fixtures.Fixtures.cdeRows.map { case (c, t, v) =>
      s"('$c','${sqlQuote(t)}','$v')" }.mkString(", ")
  private lazy val vdmPvSqlValues: String =
    graft.fixtures.Fixtures.vdmPv.toSeq.sortBy(_._1).flatMap { case (v, ps) =>
      ps.map(p => s"('$v','$p')") }.mkString(", ")

  /** SemanticType vertices + NCIT->ST edges as SQL VALUES
    * (HAS_SEMANTIC_TYPE, reference synonym_tool.py:90-96). */
  private lazy val stSqlValues: String =
    graft.fixtures.Fixtures.stRows.map { case (c, t) =>
      s"('$c','${sqlQuote(t)}')" }.mkString(", ")
  private lazy val ncitStSqlValues: String =
    graft.fixtures.Fixtures.ncitSt.map { case (n, s) =>
      s"('$n','$s')" }.mkString(", ")

  /** Fixture CDE->DEC->OC chain as SQL VALUES (base-edge + OC/DEC
    * vertex twin for the kg_graph_materialize oracle). */
  private lazy val decOcSqlValues: String =
    graft.fixtures.Fixtures.decOc.map { case (cde, dec, oc, ocTerm) =>
      s"('$cde','$dec','$oc','${sqlQuote(ocTerm)}')" }.mkString(", ")

  /** Fixture DEC->PR->NCIT chain + OC->NCIT grounding as SQL VALUES
    * (HAS_PR base edges, PR vertices and the non-PV HAS_CONCEPT
    * grounding rows of the kg_graph_materialize oracle). */
  private lazy val decPrSqlValues: String =
    graft.fixtures.Fixtures.decPr.map { case (dec, pr, prTerm, ncit) =>
      s"('$dec','$pr','${sqlQuote(prTerm)}','$ncit')" }.mkString(", ")
  private lazy val ocGroundSqlValues: String =
    graft.fixtures.Fixtures.ocGround.map { case (oc, ncit) =>
      s"('$oc','$ncit')" }.mkString(", ")

  /** Fixture NCIT (code, term, term-embedding) VALUES — the DuckDB
    * twin of the broadcast KNN matrix in SemanticNcitSearch. */
  private lazy val ncitVecSqlValues: String =
    graft.fixtures.Fixtures.ncitRows.map { case (c, t, _, _) =>
      s"('$c','${sqlQuote(t)}',${vecSql(graft.fixtures.Fixtures.embed(t))})"
    }.mkString(",\n  ")

  /** Shared by kg_semantic_ncit_search + oracle. Queries chosen so the
    * top-5 KNN hits mix PV-carrying concepts (fan-out rows) with
    * PV-less ones (dropped by the inner HAS_CONCEPT match). */
  private val ncitSearchQueries: Seq[(String, String)] = Seq(
    ("q1", "tumor staging"), ("q2", "smoking status of patient"),
    ("q3", "estrogen receptor"))

  private lazy val ncitSearchQuerySqlValues: String =
    ncitSearchQueries.map { case (id, t) =>
      s"('$id',${vecSql(graft.functions.Vectorizer.vectorizeChar(t))})"
    }.mkString(",\n  ")

  /** Fixture PV (code, term, term-embedding) VALUES — DuckDB twin of
    * the SemanticPvSearch broadcast KNN matrix. */
  private lazy val pvVecSqlValues: String =
    graft.fixtures.Fixtures.pvRows.map { case (c, t, _) =>
      s"('$c','${sqlQuote(t)}',${vecSql(graft.fixtures.Fixtures.embed(t))})"
    }.mkString(",\n  ")

  /** Shared by kg_semantic_pv_search + oracle. */
  private val pvSearchQueries: Seq[(String, String)] = Seq(
    ("q1", "stage four"), ("q2", "former smoker"), ("q3", "positive finding"))

  private lazy val pvSearchQuerySqlValues: String =
    pvSearchQueries.map { case (id, t) =>
      s"('$id',${vecSql(graft.functions.Vectorizer.vectorizeChar(t))})"
    }.mkString(",\n  ")

  /** One PreparedDict per session for the fixture-dictionary queries:
    * preparation is the amortized-once production cost and must not be
    * re-paid per catalog query. */
  private val preparedCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, graft.dict.PreparedDict]()
  private def preparedFixture(s: SparkSession): graft.dict.PreparedDict =
    preparedCache.computeIfAbsent(s,
      sess => graft.dict.PreparedDict.prepare(sess, graft.fixtures.Fixtures.dict(sess)))

  private def sqlQuote(x: String): String = x.replace("'", "''")

  /** Render a float vector as a SQL list of STRING literals. Elements
    * are printed via Double.toString of the WIDENED float (shortest
    * decimal that round-trips to that double); [[duckCosine]] CASTs
    * every element AS DOUBLE, and DuckDB's string->double parse is
    * correctly rounded — so the oracle computes on bit-identical
    * float64 values. (A bare numeric list would be inferred DECIMAL,
    * whose int*10^-scale double conversion can be 1 ulp off.) */
  private def vecSql(v: Array[Float]): String =
    v.map(x => "'" + x.toDouble.toString + "'").mkString("[", ", ", "]")

  /** Exact double literal via string parse (see [[vecSql]]). */
  private def dblSql(x: Double): String = s"CAST('${x.toString}' AS DOUBLE)"

  /** HALF_UP rounding identical in both engines (Spark round is
    * HALF_UP, DuckDB's is half-even on exact halfway doubles). */
  private def floorRound(expr: String, scale: String): String =
    s"floor(($expr) * $scale + 0.5) / $scale"

  /** DuckDB cosine in full DOUBLE precision (list_cosine_similarity
    * computes in float32 and diverges from Spark at ~1e-7; this
    * expression is bit-identical to [[Functions.cosine_sim]]). */
  private def duckCosine(a: String, b: String): String =
    s"""(list_aggregate(list_transform(list_zip($a, $b),
       |   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
       | / (sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))
       |  * sqrt(list_aggregate(list_transform($b, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))))""".stripMargin

  /** [[duckCosine]] with the engine's zero-norm convention: a signed
    * feature-hashed embedding CAN be the all-zero vector (trigrams
    * cancelling — e.g. fixture term "dead"), where
    * [[graft.functions.VectorMath.cosine]] returns 0.0 but DuckDB's
    * double 0/0 yields NULL (which sorts LAST under DESC while 0.0
    * ranks above negative cosines — a silent ranking divergence). */
  private def duckCosine0(a: String, b: String): String =
    s"coalesce(${duckCosine(a, b)}, 0.0)"

  // ---------- driver contract ----------

  /** Flagship: full KG pipeline (mention detect -> match ladder ->
    * canonicalize -> triples) on the deterministic fixture corpus. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.prepare(spark)
    val dict = graft.fixtures.Fixtures.dict(spark)
    val turns = graft.fixtures.Fixtures.transcripts(spark, 50, 6)
    Pipeline.run(spark, turns, dict).triples.toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ======== §2.2 projections / filters / predicates ========

    // P1: exact key lookup with projection
    "p1_exact_code_lookup" -> ((s, dir) => {
      T(s, dir, "part").filter(col("p_partkey") === 42)
        .select(col("p_partkey"), col("p_name"), col("p_type"))
    }),

    // P2: case-insensitive term match with input normalization
    // (reference exact_match.py:76-86: strip + toLower on both sides)
    "p2_ci_term_match" -> ((s, dir) => {
      T(s, dir, "nation")
        .filter(lower(col("n_name")) === lower(trim(lit("  nation_7  "))))
        .select(col("n_nationkey"), col("n_name"))
    }),

    // P3: upper(trim()) normalization projection
    "p3_normalize" -> ((s, dir) => {
      T(s, dir, "customer")
        .select(col("c_custkey"), upper(trim(col("c_mktsegment"))).as("seg_norm"),
          lower(col("c_name")).as("name_lower"))
        .orderBy(col("c_custkey")).limit(100)
    }),

    // P4: null-filtering projection (reference synonym_tool.py:39)
    "p4_null_filter" -> ((s, dir) => {
      transcripts(s, dir).where(col("tool").isNotNull)
        .select(col("conv_id"), col("turn_idx"), col("tool"))
        .orderBy(col("conv_id"), col("turn_idx"))
    }),

    // P6: string truncation projection (reference exact_match.py:58)
    "p6_substring" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 100).as("text_head"))
        .orderBy(col("doc_id"))
    }),

    // ======== §2.3 joins ========

    // J1: 1-hop inner equi-join, broadcast small dim
    "j1_join_1hop" -> ((s, dir) => {
      val n = T(s, dir, "nation")
      val r = T(s, dir, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .orderBy(col("n_nationkey"))
    }),

    // J2: 2-hop chained inner joins
    "j2_join_2hop" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val n = T(s, dir, "nation")
      val r = T(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("c_custkey"), col("n_name"), col("r_name"))
        .orderBy(col("c_custkey"))
    }),

    // J3: 3-hop join with fan-out (reference semantic_retrievers.py:62-76)
    "j3_join_3hop" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double").as("total_price"))
        .orderBy(col("c_mktsegment"))
    }),

    // J4: left-outer join + null-dropping aggregation
    // (reference semantic_retrievers.py:103-119 OPTIONAL MATCH + collect)
    "j4_leftouter_agg" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_big_orders"),
          min(col("o_orderkey")).as("first_okey"))
        .orderBy(col("c_custkey"))
    }),

    // J5: per-key point join de-looped + deterministic LIMIT 1
    // (reference semantic_retrievers.py:212-229 N+1 pattern, set-based)
    "j5_point_join_limit1" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("l_suppkey").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      li.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
        .orderBy(col("l_partkey"))
    }),

    // semi/anti joins (EXISTS / NOT EXISTS)
    "j6_semi_anti" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_f_order").as("tag"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_f_order").as("tag"))
      semi.unionByName(anti).orderBy(col("c_custkey"), col("tag"))
    }),

    // ======== §2.4 aggregations ========

    // A1-ish umbrella group-agg (TPC-H Q1 shape; exact decimal sums)
    "a1_group_agg" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity").cast("decimal(18,4)")), 2).cast("double").as("sum_qty"),
          round(sum(col("l_extendedprice").cast("decimal(18,4)")), 2).cast("double").as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A1: collect-list aggregation (order pinned; string-joined for
    // engine-portable comparison)
    "a1_collect_list" -> ((s, dir) => {
      T(s, dir, "orders").filter(col("o_totalprice") > 450000)
        .groupBy(col("o_custkey"))
        .agg(array_join(transform(sort_array(collect_list(col("o_orderkey"))),
          _.cast("string")), ",").as("okeys"))
        .orderBy(col("o_custkey"))
    }),

    // A3: distinct count per group
    "a3_distinct_count" -> ((s, dir) => {
      T(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy(col("l_returnflag"))
    }),

    // A4: ordinal mapping + mean (reference data_manager.py:62-70)
    "a4_ordinal_avg" -> ((s, dir) => {
      val ord = when(col("o_orderpriority") === "1-URGENT", 4)
        .when(col("o_orderpriority") === "2-HIGH", 3)
        .when(col("o_orderpriority") === "3-MEDIUM", 2)
        .otherwise(1)
      T(s, dir, "orders").groupBy(col("o_orderstatus"))
        .agg(round(avg(ord.cast("decimal(18,6)")), 2).cast("double").as("avg_priority"))
        .orderBy(col("o_orderstatus"))
    }),

    // A5: value counts (reference data_manager.py:73-74)
    "a5_value_counts" -> ((s, dir) => {
      T(s, dir, "events").groupBy(col("event_type"))
        .agg(count(lit(1)).as("n")).orderBy(col("event_type"))
    }),

    // A6: min/max + confidence banding
    // (reference tests/test_semantic_retrievers.py:268-276)
    "a6_minmax_bands" -> ((s, dir) => {
      T(s, dir, "events").groupBy(col("user_id"))
        .agg(round(min(col("value")), 4).as("min_v"),
          round(max(col("value")), 4).as("max_v"))
        .withColumn("band",
          when(col("max_v") > 0.95, "high")
            .when(col("max_v") > 0.85, "good").otherwise("low"))
        .orderBy(col("user_id"))
    }),

    // A7: DISTINCT projection (reference semantic_retrievers.py:225)
    "a7_distinct" -> ((s, dir) => {
      T(s, dir, "part").select(col("p_brand"), col("p_type")).distinct()
        .orderBy(col("p_brand"), col("p_type"))
    }),

    // ======== §2.5 windows / top-k / sorts / limits ========

    // W1: per-group score top-k with pinned tie-break
    "w1_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      T(s, dir, "orders").withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("rank"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_custkey"), col("rank"))
    }),

    // W2: full-text relevance top-k — IDF-WEIGHTED token score of a
    // fixed query against documents (the reference's Lucene BM25
    // shape, exact_match.py:143-154: rare query tokens dominate).
    // idf(t) = ln(N/df(t)) over the corpus, quantized to 2^-20 dyadic
    // steps and summed in a FIXED token order so the score is
    // bit-identical across engines and partitionings.
    "w2_fulltext_topk" -> ((s, dir) => {
      val qTokens = Seq("spark", "join", "vector")
      val docs = T(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("token"))
        .filter(col("token").isin(qTokens: _*))
      val dfTab = toks.groupBy("token").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val Q = (1 << 20).toDouble
      val weighted = toks.join(broadcast(dfTab), "token").crossJoin(broadcast(nDocs))
        .withColumn("idf",
          floor(log(col("n_docs").cast("double") / col("df")) * Q + 0.5) / Q)
      val perTokenW = qTokens.zipWithIndex.map { case (t, i) =>
        max(when(col("token") === t, col("idf"))).as(s"w$i") }
      val agged = weighted.groupBy(col("doc_id"))
        .agg(perTokenW.head, perTokenW.tail: _*)
      agged
        .withColumn("score",
          floor((coalesce(col("w0"), lit(0.0)) + coalesce(col("w1"), lit(0.0))
            + coalesce(col("w2"), lit(0.0))) * 1e6 + 0.5) / 1e6)
        .filter(col("score") > 0)
        .orderBy(col("score").desc, col("doc_id").asc).limit(5)
        .select(col("doc_id"), col("score"))
    }),

    // W2 variant: TRUE BM25 relevance top-k of the same fixed query
    // against documents — term-frequency saturation (k1=1.25) and
    // length normalization (b=0.75) over real per-doc tf/dl, the
    // ranking shape w2_fulltext_topk's IDF-overlap lacks. Constants
    // are dyadic, idf and per-term contributions quantized to 2^-20
    // (PreparedDict.bm25Tokens scaladoc has the full determinism
    // argument); raw BM25 sums here (no self-normalization — nothing
    // downstream needs a [0,1] scale).
    "w2_fulltext_bm25" -> ((s, dir) => {
      val qTokens = Seq("spark", "join", "vector")
      val Q = (1 << 20).toDouble
      val docs = T(s, dir, "documents")
      val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
      val totals = dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl").cast("long")).as("total_tok"))
      val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token").isin(qTokens: _*))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val scored = tf
        .join(broadcast(tf.groupBy("token").agg(count(lit(1)).as("df"))), "token")
        .join(dl, "doc_id")
        .crossJoin(broadcast(totals))
        .withColumn("idf", floor(log(lit(1.0) +
          (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) * Q + 0.5) / Q)
        .withColumn("lennorm", lit(0.25) + lit(0.75) *
          ((col("dl").cast("long") * col("n_docs")).cast("double") /
            col("total_tok").cast("double")))
        .withColumn("contrib", floor(col("idf") *
          ((col("tf").cast("double") * lit(2.25)) /
            (col("tf").cast("double") + lit(1.25) * col("lennorm"))) * Q + 0.5) / Q)
      scored.groupBy(col("doc_id")).agg(sum(col("contrib")).as("raw"))
        .withColumn("score", floor(col("raw") * 1e6 + 0.5) / 1e6)
        .orderBy(col("score").desc, col("doc_id").asc).limit(5)
        .select(col("doc_id"), col("score"))
    }),

    // W4: deterministic global LIMIT 1 (reference exact_match.py:40)
    "w4_limit1" -> ((s, dir) => {
      T(s, dir, "orders").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(1).select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
    }),

    // W5: stable (conv_id, turn_idx) turn ordering — the north-rule
    // per-turn invariant surface
    "w5_stable_turn_order" -> ((s, dir) => {
      val t = transcripts(s, dir)
      val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      t.withColumn("turn_rank", row_number().over(w))
        .withColumn("prev_role", lag(col("role"), 1).over(w))
        .select(col("conv_id"), col("turn_idx"), col("turn_rank"),
          col("role"), col("prev_role"))
        .orderBy(col("conv_id"), col("turn_idx"))
    }),

    // ======== §2.6 set ops ========

    "set_union_except" -> ((s, dir) => {
      val hi = T(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey")).distinct()
      val f = T(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey")).distinct()
      hi.intersect(f).withColumn("src", lit("both"))
        .unionByName(hi.except(f).withColumn("src", lit("hi_only")))
        .orderBy(col("o_custkey"), col("src"))
    }),

    // ======== §2.7 scalar functions ========

    // F4: cosine similarity, native codegen expression
    "f4_cosine_pairs" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = e.select((col("vec_id") + 250).as("id_a"), col("embedding").as("vb"))
      a.join(b, "id_a")
        .select(col("id_a"),
          round(Functions.cosine_sim(col("va"), col("vb")), 6).as("cos"))
        .orderBy(col("id_a"))
    }),

    // F5: weighted score combine with null fallback
    // (reference semantic_retrievers.py:234-237: 0.7*base + 0.3*oc, null->0)
    "f5_weighted_combine" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val base = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("value").as("score"))
      // exact-decimal sum then double divide: bit-stable across engines
      val ocs = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(round(sum(col("value").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("oc_score"))
      base.join(ocs, Seq("user_id"), "left")
        // floor-based rounding: HALF_UP vs half-even differs between
        // engines exactly on halfway doubles; floor(x*1e6+0.5) is not
        // ambiguous
        .withColumn("combined",
          floor((col("score") * 0.7 + coalesce(col("oc_score"), lit(0.0)) * 0.3)
            * 1e6 + 0.5) / 1e6)
        .select(col("user_id"), col("event_id"), col("combined"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // F6/F7: regex extraction, case-insensitive variant
    // (reference search_engine.py:45-52)
    "f6_regex_extract" -> ((s, dir) => {
      T(s, dir, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
          regexp_extract(upper(col("p_type")), "(?i)(widget|gizmo|gear)", 1).as("kind"))
        .orderBy(col("p_partkey"))
    }),

    // F11/F12: date formatting + rounding (reference data_manager.py:15,70)
    "f11_date_format" -> ((s, dir) => {
      T(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyyMM").as("ym"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double").as("total"))
        .orderBy(col("ym"))
    }),

    // F8: agent-response line parsing (reference response_parser.py:5-43)
    "f8_parse_lines" -> ((s, dir) => {
      val resp = T(s, dir, "documents").select(col("doc_id"),
        concat(lit("Thought: map raw value\n"),
          lit("Action: term_matcher\n"),
          lit("Observation: found code C"), pmod(col("doc_id"), lit(97)), lit("\n"),
          lit("Final Answer: C"), pmod(col("doc_id"), lit(97)),
          lit(" Confidence: "),
          when(col("doc_id") % 3 === 0, "High")
            .when(col("doc_id") % 3 === 1, "Medium").otherwise("Low")).as("response"))
      graft.ops.ResponseParser.parseLines(resp, "response")
        .select(col("doc_id"), col("line_no"), col("kind"))
        .orderBy(col("doc_id"), col("line_no"))
    }),

    // F9: code/confidence/tool extraction from the full response
    "f9_parse_response" -> ((s, dir) => {
      val resp = T(s, dir, "documents").select(col("doc_id"),
        concat(lit("Action: term_matcher\nFinal Answer: C"),
          pmod(col("doc_id"), lit(97)), lit(" confidence: "),
          when(col("doc_id") % 3 === 0, "high")
            .when(col("doc_id") % 3 === 1, "medium").otherwise("low")).as("response"))
      resp.select(col("doc_id"),
        graft.ops.ResponseParser.extractCode(col("response")).as("code"),
        graft.ops.ResponseParser.extractConfidence(col("response")).as("confidence"),
        graft.ops.ResponseParser.detectTool(col("response")).as("tool"))
        .orderBy(col("doc_id"))
    }),

    // explicit two-phase salted aggregation over the hot conv_id key
    // (north star skew handling; result identical to direct groupBy)
    "skew_salted_agg" -> ((s, dir) => {
      val t = transcripts(s, dir)
      graft.ops.Skew.saltedAgg(t, "conv_id", salts = 8,
        saltSource = Seq("conv_id", "turn_idx"),
        partial = Seq(count(lit(1)).as("pc"), sum(length(col("text"))).as("ps")),
        combine = Seq(sum(col("pc")).as("n_turns"),
          sum(col("ps")).cast("long").as("total_chars")))
        .orderBy(col("conv_id"))
    }),

    // ======== KG pipeline (the north-star operators) ========

    // mention detection: broadcast Aho-Corasick over transcript turns
    "kg_mention_detect" -> ((s, dir) => {
      import s.implicits._
      val ac = s.sparkContext.broadcast(
        graft.dict.AhoCorasick.build(kgTerms.map(_._2)))
      val terms = kgTerms.map(_._2)
      val t = transcripts(s, dir)
      t.select(col("conv_id"), col("turn_idx"), col("text"))
        .as[(String, Int, String)]
        .flatMap { case (cid, ti, text) =>
          ac.value.findMatches(text).map { case (b, e) =>
            (cid, ti, text.substring(b, e).toLowerCase)
          }
        }
        .toDF("conv_id", "turn_idx", "term")
        .groupBy(col("conv_id"), col("turn_idx"), col("term"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("conv_id"), col("turn_idx"), col("term"))
    }),

    // entity linking: detected mentions joined to the dictionary
    // (exact stage of the ladder, set-based broadcast join)
    "kg_entity_link" -> ((s, dir) => {
      import s.implicits._
      val ac = s.sparkContext.broadcast(
        graft.dict.AhoCorasick.build(kgTerms.map(_._2)))
      val dictDf = kgTerms.toDF("code", "term")
      val t = transcripts(s, dir)
      val mentions = t.select(col("conv_id"), col("turn_idx"), col("text"))
        .as[(String, Int, String)]
        .flatMap { case (cid, ti, text) =>
          ac.value.findMatches(text).map { case (b, e) =>
            (cid, ti, text.substring(b, e).toLowerCase)
          }
        }.toDF("conv_id", "turn_idx", "term").distinct()
      mentions.join(broadcast(dictDf), "term")
        .select(col("conv_id"), col("turn_idx"), col("code"),
          lit(2).as("stage"))
        .orderBy(col("conv_id"), col("turn_idx"), col("code"))
    }),

    // triple extraction: (turn, LINKED_TO, code) edges — distinct per
    // (turn, code) so the subject key is SQL-derivable (char offsets
    // are pinned separately by kg_mention_detect + PipelineSpec)
    "kg_triple_extract" -> ((s, dir) => {
      import s.implicits._
      val ac = s.sparkContext.broadcast(
        graft.dict.AhoCorasick.build(kgTerms.map(_._2)))
      val dictDf = kgTerms.toDF("code", "term")
      val t = transcripts(s, dir)
      t.select(col("conv_id"), col("turn_idx"), col("text"))
        .as[(String, Int, String)]
        .flatMap { case (cid, ti, text) =>
          ac.value.findMatches(text).map { case (b, e) =>
            (cid, ti, text.substring(b, e).toLowerCase)
          }
        }.toDF("conv_id", "turn_idx", "term").distinct()
        .join(broadcast(dictDf), "term")
        .select(concat_ws("#", col("conv_id"), col("turn_idx")).as("subj"),
          lit("LINKED_TO").as("pred"), col("code").as("obj"))
        .orderBy(col("subj"), col("obj"))
    }),

    // entity co-occurrence lift: concepts co-mentioned in the same
    // 10-turn conversation segment, scored by exact-integer lift
    // (triples/Cooccurrence — see scaladoc for why the score is a
    // floor-scaled rational, never a float log). The context key is
    // the segment, not the whole conversation: fixture conversations
    // are long enough that every term hits every conversation, which
    // would degenerate the statistic
    "kg_cooccur_lift" -> ((s, dir) => {
      import s.implicits._
      val ac = s.sparkContext.broadcast(
        graft.dict.AhoCorasick.build(kgTerms.map(_._2)))
      val dictDf = kgTerms.toDF("code", "term")
      val t = transcripts(s, dir)
      val links = t.select(col("conv_id"), col("turn_idx"), col("text"))
        .as[(String, Int, String)]
        .flatMap { case (cid, ti, text) =>
          ac.value.findMatches(text).map { case (b, e) =>
            (s"$cid#${ti / 10}", text.substring(b, e).toLowerCase)
          }
        }.toDF("seg", "term").distinct()
        .join(broadcast(dictDf), "term")
        .select(col("seg").as("conv_id"), col("code"))
      graft.triples.Cooccurrence.convCooccur(links)
        .orderBy(col("code_a"), col("code_b"))
    }),

    // connected components (canonicalization kernel) on a derived
    // bipartite edge list — the PRODUCTION dispatch (runAdaptive):
    // driver union-find below the edge threshold (one job instead of
    // ~6-10 jobs × O(log n) rounds of pure scheduler latency on a
    // tiny graph), the distributed Kiveris large-star/small-star
    // alternation above it. Identical (node, component=min-reachable)
    // contract on both paths (CanonSpec agreement test).
    "kg_connected_components" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val edges = li.select(
        concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), pmod(col("l_partkey"), lit(20))).as("dst")).distinct()
      graft.canon.ConnectedComponents.runAdaptive(s, edges)
        .orderBy(col("node"))
    }),

    // the distributed large-star/small-star kernel itself, forced
    // (threshold 0 disables the local path) — keeps the 100 TB-scale
    // code path under the same DuckDB recursive-CTE oracle as the
    // adaptive entry above
    "kg_connected_components_dist" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val edges = li.select(
        concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), pmod(col("l_partkey"), lit(20))).as("dst")).distinct()
      graft.canon.ConnectedComponents.runAdaptive(s, edges, localThreshold = 0L)
        .orderBy(col("node"))
    }),

    // synonym lookups (J1/J2) over the fixture dictionary, preserving
    // the reference's case-sensitivity asymmetry (rows-only check;
    // semantics pinned in SynonymLookupSpec)
    "kg_synonym_lookup" -> ((s, dir) => {
      import s.implicits._
      val dict = graft.fixtures.Fixtures.dict(s)
      val byCode = graft.link.SynonymLookup.byCode(s, dict,
        Seq("C4878", "C3117", "C9305").toDF("code"))
        .select(col("code").as("input"), col("synonym"))
      val byPv = graft.link.SynonymLookup.byPvTerm(s, dict,
        Seq("Stage IV", "Female", "stage iv" /* case miss */).toDF("pv_term"))
        .select(col("pv_term").as("input"), col("synonym"))
      byCode.unionByName(byPv).orderBy(col("input"), col("synonym"))
    }),

    // OC-context rerank (J5 de-looped + F5 weighted combine) over the
    // fixture dict: exercises OC present (CDE2001/2007), CDE with no
    // OC path (CDE2008 -> 0.7*score) and NO cde at all (raw-score
    // passthrough, reference semantic_retrievers.py:213-219)
    "kg_rerank_oc" -> ((s, dir) => {
      import s.implicits._
      val dict = graft.fixtures.Fixtures.dict(s)
      val qv = graft.fixtures.Fixtures.embed("tumor stage")
      val candidates = rerankCandidates.map { case (q, c, sc) => (q, c, sc, qv) }
        .toDF("query_id", "cde_code", "score", "query_vec")
      def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      graft.link.Rerank.rerankWithOcContext(s, candidates, dict)
        .select(col("query_id"), col("cde_code"), r6(col("score")).as("score"),
          r6(col("oc_score")).as("oc_score"),
          r6(col("combined_score")).as("combined_score"))
        .orderBy(col("combined_score").desc, col("cde_code").asc_nulls_first)
    }),

    // definition-embedding semantic search (reference
    // semantic_retrievers.py:129-205: cdeIndex + ncitIndex over
    // node.definition): three free-text descriptions, top-3 per node
    // type; full double-cosine oracle over the fixture definitions
    "kg_semantic_definition" -> ((s, dir) => {
      import s.implicits._
      val prepared = preparedFixture(s)
      val q = semanticDefQueries.toDF("query_id", "description")
      val ncit = graft.link.DefinitionSearch.findNcitByDefinition(s, q, prepared, k = 3)
        .withColumn("node_type", lit("NCIT"))
      val cde = graft.link.DefinitionSearch.findCdeByDefinition(s, q, prepared, k = 3)
        .withColumn("node_type", lit("CDE"))
      ncit.unionByName(cde)
        .select(col("query_id"), col("node_type"), col("rank"), col("code"),
          col("term"), (floor(col("score") * 1e6 + 0.5) / 1e6).as("score"))
        .orderBy(col("query_id"), col("node_type"), col("rank"))
    }),

    // composed semantic NCIT search (reference find_cde_from_ncit_term,
    // semantic_retrievers.py:85-126): KNN over NCIT term embeddings,
    // inner HAS_CONCEPT fan-out to PV, optional VDM/CDE chain collected
    // per (concept, pv); full double-cosine + string_agg oracle
    "kg_semantic_ncit_search" -> ((s, dir) => {
      import s.implicits._
      val dict = graft.fixtures.Fixtures.dict(s)
      val q = ncitSearchQueries.toDF("query_id", "text")
      graft.link.SemanticNcitSearch.search(s, q, dict, k = 5)
        .select(col("query_id"), col("rank"), col("concept_code"),
          col("concept_term"), col("pv_code"), col("pv_term"),
          (floor(col("score") * 1e6 + 0.5) / 1e6).as("score"), col("of_cdes"))
        .orderBy(col("query_id"), col("rank"), col("pv_code"))
    }),

    // composed semantic PV search (reference find_cde_from_pv_term,
    // semantic_retrievers.py:38-83 — the primary direct-library entry
    // point, SURVEY.md §3.3): KNN over PV term embeddings, inner
    // 3-hop PV<-VDM<-CDE fan-out with CDE metadata per path
    "kg_semantic_pv_search" -> ((s, dir) => {
      import s.implicits._
      val dict = graft.fixtures.Fixtures.dict(s)
      val q = pvSearchQueries.toDF("query_id", "text")
      graft.link.SemanticPvSearch.search(s, q, dict, k = 5)
        .select(col("query_id"), col("rank"), col("pv_code"), col("pv_term"),
          col("cde_code"), col("cde_term"), col("cde_defn"),
          (floor(col("score") * 1e6 + 0.5) / 1e6).as("score"))
        .orderBy(col("query_id"), col("rank"), col("cde_code"))
    }),

    // unified TYPE-FILTERED term search (reference ftTermIndex spans
    // all labels with a `type` property filter,
    // tests/test_neoretrievers.py:22-31) with IDF-weighted scores;
    // full oracle recomputes the weighted Jaccard in SQL
    "kg_term_search_typed" -> ((s, dir) => {
      import s.implicits._
      val prepared = preparedFixture(s)
      val q = termSearchQueries.toDF("query_id", "text")
      val cdeOnly = graft.link.MatchLadder.termSearch(s, q, prepared, k = 3,
        typeFilter = Some("CDE")).withColumn("type_filter", lit("CDE"))
      val any = graft.link.MatchLadder.termSearch(s, q, prepared, k = 3)
        .withColumn("type_filter", lit("ANY"))
      cdeOnly.unionByName(any)
        .select(col("query_id"), col("type_filter"), col("rank"), col("code"),
          col("surf_norm"), (floor(col("score") * 1e6 + 0.5) / 1e6).as("score"))
        .orderBy(col("query_id"), col("type_filter"), col("rank"))
    }),

    // the ladder's stage-4 scorer as a term search: self-normalized
    // BM25 with k1 saturation + length normalization (reference
    // exact_match.py:143-154 Lucene relevance — the ranking-faithful
    // replacement for the IDF-overlap of kg_term_search_typed, which
    // stays pinned as the legacy scorer). The oracle replays the
    // whole quantized-arithmetic chain: dyadic idf, per-token
    // contribution, query self-score, one final IEEE division.
    "kg_term_search_bm25" -> ((s, dir) => {
      import s.implicits._
      val prepared = preparedFixture(s)
      val q = bm25SearchQueries.toDF("query_id", "text")
      val cdeOnly = graft.link.MatchLadder.termSearchBm25(s, q, prepared, k = 3,
        typeFilter = Some("CDE")).withColumn("type_filter", lit("CDE"))
      val any = graft.link.MatchLadder.termSearchBm25(s, q, prepared, k = 3)
        .withColumn("type_filter", lit("ANY"))
      cdeOnly.unionByName(any)
        .select(col("query_id"), col("type_filter"), col("rank"), col("code"),
          col("surf_norm"), (floor(col("score") * 1e6 + 0.5) / 1e6).as("score"))
        .orderBy(col("query_id"), col("type_filter"), col("rank"))
    }),

    // graph materialization round-trip (north star: partitioned
    // vertex/edge tables replacing Neo4j serving): write the COMPLETE
    // fixture dictionary graph — all 7 reference labels incl. SYN, the
    // derived MAPS_TO/SAME_AS edges AND the base structural edges
    // (HAS_CONCEPT/HAS_VDM/HAS_PV/HAS_DEC/HAS_OC, reference
    // semantic_retrievers.py:108-109,224) — as label-partitioned
    // vertices + pred-partitioned edges, read both back, and return
    // one (kind, a, b, c) relation. The oracle rebuilds the canonical
    // synonym-merge map with a recursive-CTE CC over the same
    // shares-a-surface star edges and re-derives every edge kind from
    // the fixture VALUES.
    "kg_graph_materialize" -> ((s, dir) => {
      import s.implicits._
      val dict = graft.fixtures.Fixtures.dict(s)
      val canonical = preparedFixture(s).canonical
      val verts = graft.triples.Triples.vertices(s, dict, canonical)
      val edges = graft.triples.Triples.mapsTo(s, dict)
        .unionByName(graft.triples.Triples.sameAs(canonical))
        .unionByName(graft.triples.Triples.hasSynonym(s, dict))
        .unionByName(graft.triples.Triples.baseEdges(s, dict))
        .unionByName(graft.triples.Triples.similarEdges(s, dict, k = 2)
          .drop("score"))
        .as[graft.model.Triple]
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_graph_mat"
      // fixture graph is dictionary-sized: single-task writes (the
      // production path keeps the incoming partitioning)
      graft.triples.Triples.writeGraph(verts.repartition(1),
        edges.repartition(1), out)
      val v = s.read.parquet(s"$out/vertices")
        .select(concat(lit("vertex:"), $"label").as("kind"),
          $"code".as("a"), $"term".as("b"), $"canonical".as("c"))
      val e = s.read.parquet(s"$out/edges")
        .select(concat(lit("edge:"), $"pred").as("kind"),
          $"subj".as("a"), $"obj".as("b"), lit(null).cast("string").as("c"))
      v.unionByName(e).orderBy($"kind", $"a", $"b")
    }),

    // incremental graph maintenance (the Neo4j-MERGE replacement,
    // triples/GraphMerge): build the edge table in four MERGE steps —
    // base structural+synonym edges into an empty table, the derived
    // MAPS_TO/SAME_AS delta, an exact REPLAY of that delta (crash/
    // restart semantics: fresh must be 0), and an overlapping delta
    // (HAS_SYNONYM already present + SIMILAR new) — plus a vertex
    // merge and its replay. Output: per-step fresh counts + final
    // per-pred edge counts; the oracle recomputes every count from
    // the fixture VALUES (set algebra: fresh = |delta \ existing|).
    "kg_graph_merge" -> ((s, dir) => {
      import s.implicits._
      val dict = graft.fixtures.Fixtures.dict(s)
      val prepared = preparedFixture(s)
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_graph_merge_${ProcessHandle.current().pid()}"
      // merge is append-based: a stale table from a prior invocation
      // would break the fresh-count contract, so start from nothing
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      import graft.triples.{GraphMerge, Triples}
      val hasSyn = Triples.hasSynonym(s, dict).persist()
      val base = hasSyn
        .unionByName(Triples.baseEdges(s, dict)).as[graft.model.Triple]
      // persisted: merged twice (merge2 + its replay merge3) — the
      // sameAs side carries the CC canonical-map lineage
      val derived = Triples.mapsTo(s, dict)
        .unionByName(Triples.sameAs(prepared.canonical))
        .as[graft.model.Triple].persist()
      val overlap = hasSyn
        .unionByName(Triples.similarEdges(s, dict, k = 2).drop("score"))
        .as[graft.model.Triple]
      val verts = Triples.vertices(s, dict, prepared.canonical).persist()
      // merge producers KNOW their edge/label vocabulary (it is fixed
      // by construction), so the hinted merges skip the per-merge
      // preds/labels discovery job and fuse dedup+anti-join+count into
      // the single append pass (wrong hints fail in-plan, they cannot
      // silently duplicate)
      val basePreds = Seq("HAS_SYNONYM", "HAS_CONCEPT", "HAS_VDM", "HAS_PV",
        "HAS_DEC", "HAS_OC", "HAS_PR", "HAS_SEMANTIC_TYPE")
      val vertLabels = Seq("NCIT", "PV", "CDE", "OC", "VDM", "DEC", "PR",
        "SemanticType", "SYN")
      val steps = try Seq(
        ("merge1_base_fresh", GraphMerge.mergeEdgesWithPreds(s, out, base, basePreds)),
        ("merge2_derived_fresh", GraphMerge.mergeEdgesWithPreds(s, out, derived,
          Seq("MAPS_TO", "SAME_AS"))),
        ("merge3_replay_fresh", GraphMerge.mergeEdgesWithPreds(s, out, derived,
          Seq("MAPS_TO", "SAME_AS"))),
        ("merge4_overlap_fresh", GraphMerge.mergeEdgesWithPreds(s, out, overlap,
          Seq("HAS_SYNONYM", "SIMILAR"))),
        ("vmerge1_fresh", GraphMerge.mergeVerticesWithLabels(s, out, verts, vertLabels)),
        ("vmerge2_replay_fresh", GraphMerge.mergeVerticesWithLabels(s, out, verts, vertLabels))
      ) finally {
        hasSyn.unpersist(); derived.unpersist(); verts.unpersist(): Unit
      }
      // dictionary-version upgrade (ON MATCH SET): C2991 exists ->
      // updated in place; Z9999 is new -> inserted
      val refreshDelta = Seq(
        ("C2991", "NCIT", "disease or disorder v2", Some("refreshed"), "C2991"),
        ("Z9999", "NCIT", "novel concept", None: Option[String], "Z9999"))
        .toDF("code", "label", "term", "definition", "canonical")
      val (nUpd, nIns) = GraphMerge.refreshVertices(s, out, refreshDelta)
      val all = steps ++ Seq(("vrefresh_updated", nUpd), ("vrefresh_inserted", nIns))
      val perPred = s.read.parquet(s"$out/edges").groupBy($"pred")
        .agg(count(lit(1)).as("n"))
        .select(concat(lit("edges:"), $"pred").as("kind"), $"n")
      val perLabel = s.read.parquet(s"$out/vertices").groupBy($"label")
        .agg(count(lit(1)).as("n"))
        .select(concat(lit("vertices:"), $"label").as("kind"), $"n")
      all.toDF("kind", "n").unionByName(perPred).unionByName(perLabel)
        .orderBy($"kind")
    }),

    // NCIT-[:SIMILAR]->NCIT self-relation (reference schema.png): each
    // concept's top-2 nearest neighbors by term-embedding cosine; full
    // double-cosine oracle (the serving-graph enrichment edge kind,
    // also written by kg_graph_materialize)
    "kg_similar_ncit" -> ((s, dir) => {
      val dict = graft.fixtures.Fixtures.dict(s)
      graft.triples.Triples.similarEdges(s, dict, k = 2)
        .select(col("subj"), col("obj"),
          (floor(col("score") * 1e6 + 0.5) / 1e6).as("score"))
        .orderBy(col("subj"), col("score").desc, col("obj"))
    }),

    // IVF recall vs exact brute force at k=3 across the
    // redundancy/probe dial — one row per config, all deterministic
    // (fixed hash-seeded centroids => bit-stable at any parallelism),
    // pinned in the oracle. The synthetic embeddings are ISOTROPIC
    // (measured avg pairwise cosine ~0.0003 within AND across labels),
    // the worst case for coarse quantization: high recall costs
    // multi-assignment redundancy here; on clustered data the same
    // operator reaches 0.85+ recall at fractional scan (OpsSpec).
    "ann_ivf_recall" -> ((s, dir) => {
      GraftSession.prepare(s)
      val e = T(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val exact = Ann.bruteForceTopK(s, e, e, k = 3).select("query_id", "id")
      val nExact = exact.groupBy("query_id").agg(count(lit(1)).as("n"))
      ivfRecallConfigs.map { case (cfg, nc, np, nd) =>
        val ivf = Ann.ivfTopK(s, e, k = 3, nCentroids = nc, nProbe = np,
          nAssign = nd).select("query_id", "id")
        val hits = exact.join(ivf, Seq("query_id", "id"))
          .groupBy("query_id").agg(count(lit(1)).as("h"))
        nExact.join(hits, Seq("query_id"), "left")
          .agg(count(lit(1)).as("n_queries"),
            (floor(sum(coalesce(col("h"), lit(0L))).cast("double")
              / sum(col("n")) * 1e4 + 0.5) / 1e4).as("recall_at_3"))
          .select(lit(cfg).as("config"), col("n_queries"), col("recall_at_3"))
      }.reduce(_.unionByName(_)).orderBy(col("config"))
    }),

    // full pipeline end-to-end on the seeded fixture corpus (scaled by
    // sf dir name; rows-only check — semantics covered by sbt test)
    "kg_pipeline_full" -> ((s, dir) => {
      GraftSession.prepare(s)
      val sf = dir.split("sf").last.toDouble
      val nConvs = math.max(50L, (sf * 20000).toLong)
      val turns = graft.fixtures.Fixtures.transcripts(s, nConvs, 8)
      Pipeline.run(s, turns, preparedFixture(s)).triples.toDF()
        .groupBy(col("pred")).agg(count(lit(1)).as("n")).orderBy(col("pred"))
    }),

    // ======== training-data ops: dedup ========

    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(T(s, dir, "documents"), "doc_id", "text")
        .select(col("content_hash"), col("survivor_id"), col("n_copies"))
        .orderBy(col("content_hash"))
    }),

    "dedup_minhash_lsh" -> ((s, dir) => {
      GraftSession.prepare(s)
      Dedup.minHashLsh(T(s, dir, "documents"), "doc_id", "text", threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_simhash" -> ((s, dir) => {
      GraftSession.prepare(s)
      Dedup.simHash(T(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // composed LSH-then-verify (the 100 TB near-dup pipeline shape):
    // MinHash-band candidates pruned at est>=0.5, exact distinct-token
    // Jaccard on the survivors at >=0.7. HALF_UP floor-rounding both
    // sides: est_jaccard = k/64 hits exact halfway doubles where
    // round() diverges between the engines.
    "dedup_lsh_verified" -> ((s, dir) => {
      GraftSession.prepare(s)
      def r4(c: Column): Column = floor(c * 1e4 + 0.5) / 1e4
      Dedup.lshVerified(T(s, dir, "documents"), "doc_id", "text",
        estThreshold = 0.5, threshold = 0.7)
        .select(col("id_a"), col("id_b"), r4(col("est_jaccard")).as("est_jaccard"),
          r4(col("jaccard")).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // exact verify-side of near-dup detection. Bounded demo subset:
    // this synthetic corpus shares one tiny vocabulary, so the token
    // inverted index degenerates to all-pairs; at scale the candidate
    // set comes from MinHash-LSH (dedup_minhash_lsh) and this exact
    // Jaccard runs only on those candidates (LSH-then-verify).
    "dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccard(T(s, dir, "documents").filter(col("doc_id") < 600),
        "doc_id", "text", threshold = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_embedding_cosine" -> ((s, dir) => {
      GraftSession.prepare(s)
      Dedup.embeddingCosine(T(s, dir, "embeddings"), "vec_id", "embedding",
        "label", threshold = 0.35)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ======== training-data ops: similarity search ========

    "ann_bruteforce_topk" -> ((s, dir) => {
      GraftSession.prepare(s)
      val e = T(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ann.bruteForceTopK(s, queries, corpus, k = 5)
        .select(col("query_id"), col("rank"), col("id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id").cast("long"), col("rank"))
    }),

    "ann_lsh_topk" -> ((s, dir) => {
      GraftSession.prepare(s)
      val e = T(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ann.lshTopK(s, e, k = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    "ann_ivf_topk" -> ((s, dir) => {
      GraftSession.prepare(s)
      val e = T(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ann.ivfTopK(s, e, k = 3)
        .select(col("query_id"), col("rank"), col("id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ======== training-data ops: text analysis ========

    "text_langid" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    "text_quality" -> ((s, dir) => {
      TextAnalysis.quality(T(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Gopher-style line-repetition quality signals. The synthetic
    // corpus has no newlines, so the query derives a deterministic
    // line structure first (every 2 tokens -> one line) — the regex
    // transform is replicated verbatim in the oracle.
    "text_repetition" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"), "(\\S+ \\S+) ", "$1\n").as("text"))
      TextAnalysis.repetition(docs, "doc_id", "text").orderBy(col("doc_id"))
    }),

    "text_token_count" -> ((s, dir) => {
      T(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("ws_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpeish_tokens"))
        .orderBy(col("doc_id"))
    }),

    "text_fingerprint" -> ((s, dir) => {
      GraftSession.prepare(s)
      T(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // ======== training-data ops: multimodal (real BMP/WAV/AVI
    // payloads, header-parsed decode, movi-walking frame sample) ========

    "mm_media_meta" -> ((s, dir) => {
      Multimodal.mediaFromText(T(s, dir, "documents"), "doc_id", "text")
        .select(col("media_id"), col("kind"),
          length(col("payload")).cast("long").as("n_bytes"))
        .orderBy(col("media_id"))
    }),

    "mm_decode" -> ((s, dir) => {
      val media = Multimodal.mediaFromText(T(s, dir, "documents"), "doc_id", "text")
      Multimodal.decode(s, media).toDF()
        .withColumn("valid", col("valid").cast("int"))
        .orderBy(col("media_id"))
    }),

    "mm_frame_sample" -> ((s, dir) => {
      val media = Multimodal.mediaFromText(T(s, dir, "documents"), "doc_id", "text")
      Multimodal.frameSample(s, media).toDF()
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // ======== training-data ops: cluster-canonical dedup ========

    // near-dup PAIRS -> CLUSTERS (similarity isn't transitive) via the
    // same O(log n) CC the canonicalizer uses; keep min-id per cluster.
    // Same bounded subset + pair source as dedup_ngram_jaccard.
    "dedup_cluster_canonical" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("doc_id") < 600)
      val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", threshold = 0.8)
      Dedup.clusterCanonical(s, docs, "doc_id", pairs)
        .withColumn("is_canonical", col("is_canonical").cast("int"))
        .orderBy(col("doc_id"))
    }),

    // ======== training-data ops: benchmark decontamination ========

    // flag corpus docs sharing 3-gram shingles with a benchmark set
    // (here: every 37th doc plays the eval set; broadcast its shingles)
    "decontam_ngram" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Decontaminate.report(
        docs.filter(col("doc_id") % 37 =!= 0), "doc_id", "text",
        bench = docs.filter(col("doc_id") % 37 === 0), n = 3, minShared = 1)
        .orderBy(col("doc_id"))
    }),

    // ======== training-data ops: deterministic stratified sampling ====

    // rebalance the corpus by language with engine-portable hash
    // sampling: keep 50% of en, all de, 25% of everything else
    "sample_stratified" -> ((s, dir) => {
      Sampling.stratified(T(s, dir, "documents"), "doc_id", "lang",
          rates = Map("en" -> 0.5, "de" -> 1.0), defaultRate = 0.25)
        .select(col("doc_id"), col("lang"), col("bucket"),
          col("rate").cast("double").as("rate"))
        .orderBy(col("doc_id"))
    }),

    // ======== training-data ops: PII redaction ========

    // deterministic PII is synthesized INTO the text (the driver corpus
    // carries none) so the redaction + counts are oracle-checkable
    "text_pii_redact" -> ((s, dir) => {
      val withPii = T(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), concat(col("text"),
          lit(" contact u"), col("doc_id"),
          lit("@ex-"), col("doc_id"), lit(".org from 10."),
          pmod(col("doc_id"), lit(256)), lit(".0.1 card 4111111111111111")
        ).as("text"))
      withPii.select(col("doc_id") +: TextAnalysis.piiRedact(col("text")): _*)
        .orderBy(col("doc_id"))
    }),

    // ======== as-of join: point-in-time snapshot lookup ========

    // every 97th event plays a config/rate snapshot; each event gets
    // the latest snapshot of its type at-or-before its ts. ONE
    // shuffle + window — zero joins (asserted in RelOpsSpec's plan
    // test); the oracle is the naive per-row latest-row pick.
    "asof_join_snapshots" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val snaps = ev.filter(col("event_id") % 97 === 0)
        .select(col("event_type"), col("ts"), col("value").as("snap_value"))
      graft.ops.AsofJoin.asof(
          ev.select(col("event_id"), col("event_type"), col("ts")),
          snaps, "event_type", "ts", Seq("snap_value"))
        .select(col("event_id"), col("event_type"),
          // parquet ts is TIMESTAMP_NTZ; the session is pinned UTC, so
          // the cast is the identity instant DuckDB's epoch_us sees
          unix_micros(col("asof_ts").cast("timestamp")).as("snap_ts_us"),
          (floor(col("asof_snap_value") * 1e4 + 0.5) / 1e4).as("snap_value"))
        .orderBy(col("event_id"))
    }),

    // ======== range join: interval containment, bucketed ========

    // every 131st event opens a [value, value+25] window; pair every
    // event inside it via the bucketed-expansion equi-join (no
    // BroadcastNestedLoop — the naive inequality-join plan), then
    // aggregate per window. Oracle = the naive range join.
    "range_join_value_windows" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val iv = ev.filter(col("event_id") % 131 === 0)
        .select(col("event_id").as("window_id"), col("value").as("lo"),
          (col("value") + lit(25.0)).as("hi"))
      val pts = ev.select(col("event_id").as("pid"), col("value").as("pv"),
        col("event_type").as("ptype"))
      graft.ops.RangeJoin.bucketed(pts, "pv", iv, "lo", "hi", bucketWidth = 25.0)
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_points"),
          countDistinct(col("ptype")).as("n_types"),
          (floor(min(col("pv")) * 1e4 + 0.5) / 1e4).as("v_min"),
          (floor(max(col("pv")) * 1e4 + 0.5) / 1e4).as("v_max"))
        .orderBy(col("window_id"))
    }),

    // ======== exact distributed quantiles (histogram CDF) ========

    // inverted-CDF quantiles of document length: the corpus collapses
    // to its value histogram map-side before any ordering happens
    "quantile_exact_hist" -> ((s, dir) =>
      graft.ops.Quantiles.exactHistogram(
        T(s, dir, "documents"), "n_chars", Seq(0.25, 0.5, 0.9, 0.99, 1.0))),

    // ======== graph statistics over the SIMILAR kNN edges ========

    // exact triangle count with the degree-ordered orientation (the
    // skew-proof plan); oracle recomputes the same kNN graph from the
    // fixture VALUES and counts id-ordered triangles — same total
    "graph_triangle_stats" -> ((s, dir) => {
      val dict = graft.fixtures.Fixtures.dict(s)
      graft.triples.GraphStats.triangleStats(
        graft.triples.Triples.similarEdges(s, dict, k = 2).select("subj", "obj"))
    }),

    "graph_degree_hist" -> ((s, dir) => {
      val dict = graft.fixtures.Fixtures.dict(s)
      graft.triples.GraphStats.degreeHistogram(
          graft.triples.Triples.similarEdges(s, dict, k = 2).select("subj", "obj"))
        .orderBy(col("degree"))
    }),

    // ======== mergeable distinct-count sketches ========

    // KMV bottom-k UDAF (map-side sketch state, driver merge — no
    // distinct shuffle); oracle recomputes the k smallest distinct
    // hashes exhaustively and the identical estimator arithmetic
    "sketch_kmv_distinct" -> ((s, dir) =>
      graft.ops.Sketches.kmvDistinct(T(s, dir, "documents"), "text", k = 64)),

    // HLL registers + estimate, all-integer harmonic sum (order-
    // independent by construction), bit-exact DuckDB twin
    "sketch_hll_distinct" -> ((s, dir) =>
      graft.ops.Sketches.hllEstimate(
        graft.ops.Sketches.hllRegisters(T(s, dir, "documents"), "text", b = 6), b = 6)),

    // ======== gap-based sessionization (6h silence) ========

    // batch twin of streaming session windows; tie-safe RANGE-frame
    // session index (deterministic under any partitioning)
    "sessionize_events" -> ((s, dir) =>
      graft.ops.Sessionize.stats(T(s, dir, "events"), "user_id", "ts",
          gapUs = 21600000000L)
        .orderBy(col("user_id"), col("session_idx"))),

    // ======== bounded-depth graph traversal (Cypher [*1..k] twin) ====

    // 3-hop undirected neighborhood of CDE2001 over the base
    // structural + synonym edges — frontier BFS (per-round work ∝
    // frontier fan-out, never path count); oracle is a recursive-CTE
    // BFS with min-hop over the identical fixture edge union
    "kg_khop_traverse" -> ((s, dir) => {
      import s.implicits._
      val dict = graft.fixtures.Fixtures.dict(s)
      val edges = graft.triples.Triples.baseEdges(s, dict)
        .unionByName(graft.triples.Triples.hasSynonym(s, dict))
        .select("subj", "obj")
      graft.triples.GraphTraverse.kHop(s, edges,
          Seq("CDE2001").toDF("node"), maxHops = 3, directed = false)
        .orderBy($"node")
    }),

    // ======== weighted shortest paths (min-plus Bellman-Ford) ========

    // multi-hop minimum-cost distances from supplier s1 over the
    // symmetrized weighted lineitem bipartite graph — semi-naive
    // relaxation (per-round work ∝ improved frontier); the cost<=8
    // horizon is applied identically in both engines, so a node is
    // present iff its TRUE min cost fits the horizon (prefixes of a
    // shortest walk never exceed its total under non-negative weights)
    "kg_shortest_path" -> ((s, dir) => {
      import s.implicits._
      val e = T(s, dir, "lineitem").select(
        concat(lit("s"), col("l_suppkey")).as("subj"),
        concat(lit("p"), col("l_partkey") % 20).as("obj"),
        (lit(1L) + col("l_partkey") % 3).as("w")).distinct()
      val und = e.unionByName(
        e.select(col("obj").as("subj"), col("subj").as("obj"), col("w")))
      graft.triples.GraphTraverse.shortestPaths(s, und, Seq("s1").toDF("node"))
        .filter($"cost" <= 8L)
        .orderBy($"node")
    }),

    // ======== entity salience per conversation ========

    // which concepts a conversation is ABOUT: fraction of its turns
    // mentioning the concept (turn presence, not mention frequency),
    // exact floor-scaled ppm + deterministic per-conv rank
    "kg_entity_salience" -> ((s, dir) => {
      import s.implicits._
      val ac = s.sparkContext.broadcast(
        graft.dict.AhoCorasick.build(kgTerms.map(_._2)))
      val dictDf = kgTerms.toDF("code", "term")
      val t = transcripts(s, dir)
      val mentions = t.select(col("conv_id"), col("turn_idx"), col("text"))
        .as[(String, Int, String)]
        .flatMap { case (cid, ti, text) =>
          ac.value.findMatches(text).map { case (b, e) =>
            (cid, ti, text.substring(b, e).toLowerCase)
          }
        }.toDF("conv_id", "turn_idx", "term").distinct()
        .join(broadcast(dictDf), "term")
        .select(col("conv_id"), col("turn_idx"), col("code"))
      graft.extract.Salience.perConversation(mentions, t)
        .orderBy(col("conv_id"), col("rank"))
    }),

    // ======== temporal scoping of extracted edges ========

    // validity windows for (concept, MENTIONED_IN, conv) edges — exact
    // epoch-seconds min/max/count per edge identity (timestamps never
    // cross the compare path as formatted strings)
    "kg_temporal_edges" -> ((s, dir) => {
      val obs = mentionObs(s, dir)
      graft.triples.TemporalScope.scopeEdges(obs)
        .orderBy(col("subj"), col("obj"))
    }),

    // the graph AS OF the corpus midpoint, active-only under a
    // quarter-span staleness horizon — both cutoffs derived in exact
    // integer arithmetic from the observation stream itself (the
    // 2-long collect is a 1-row aggregate, never corpus-sized)
    "kg_graph_asof" -> ((s, dir) => {
      // checkpoint the observation stream once: the min/max-cutoff
      // aggregate and the scoped query would otherwise each re-run
      // the Aho-Corasick extraction lineage (2 traversals -> 1)
      val obs = mentionObs(s, dir).localCheckpoint()
      val r = obs.agg(min(col("ts_epoch")).cast("long"),
        max(col("ts_epoch")).cast("long")).first()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val mid = (lo + hi) / 2
      val scoped = graft.triples.TemporalScope.scopeEdges(obs)
      graft.triples.TemporalScope.asOf(scoped, mid,
          activeOnly = true, horizon = (hi - lo) / 4)
        .orderBy(col("subj"), col("obj"))
    }),

    // ======== triple schema validation (SHACL-lite gate) ========

    // extracted LINKED_TO edges + injected violation rows classified
    // against a broadcast label map and allowed-signature table —
    // map-only over the triple stream, verdict is a codegen CASE
    "kg_schema_validate" -> ((s, dir) => {
      import s.implicits._
      val t = transcripts(s, dir)
      val ac = s.sparkContext.broadcast(
        graft.dict.AhoCorasick.build(kgTerms.map(_._2)))
      val dictDf = kgTerms.toDF("code", "term")
      val linked = t.select(col("conv_id"), col("text"))
        .as[(String, String)]
        .flatMap { case (cid, text) =>
          ac.value.findMatches(text).map { case (b, e) =>
            (cid, text.substring(b, e).toLowerCase)
          }
        }.toDF("conv_id", "term").distinct()
        .join(broadcast(dictDf), "term")
        .select(col("code").as("subj"), lit("LINKED_TO").as("pred"),
          col("conv_id").as("obj"))
      val bad = Seq(
        ("K001", "LINKED_TO", "K002"),   // concept->concept: bad_signature
        ("QX99", "LINKED_TO", "K001"),   // unlabeled subj: unknown_subj
        ("K002", "LINKED_TO", "zz-none"),// unlabeled obj: unknown_obj
        ("K003", "RELATED_TO", "K004")   // pred with no signature
      ).toDF("subj", "pred", "obj")
      val labels = kgTerms.map(_._1).map((_, "CONCEPT")).toDF("code", "label")
        .unionByName(t.select(col("conv_id")).distinct()
          .select(col("conv_id").as("code"), lit("CONV").as("label")))
      val sigs = Seq(("CONCEPT", "LINKED_TO", "CONV"))
        .toDF("subj_label", "pred", "obj_label")
      graft.triples.SchemaValidate.validate(
          linked.unionByName(bad), labels, sigs)
        .select(col("subj"), col("pred"), col("obj"),
          coalesce(col("subj_label"), lit("-")).as("subj_label"),
          coalesce(col("obj_label"), lit("-")).as("obj_label"),
          col("verdict"))
        .orderBy(col("subj"), col("pred"), col("obj"))
    }),

    // ======== pattern-based relation extraction ========

    // typed predicates mined from connective keywords between two
    // linked mentions in one turn — candidates come from the detected
    // mention set (never dictionary² × corpus); acceptance is ONE
    // regex evaluated identically in both engines
    "kg_relation_extract" -> ((s, dir) => {
      import s.implicits._
      val t = transcripts(s, dir).select(
        col("conv_id"), col("turn_idx"), col("text"))
      val patterns = Seq(("fast", "REL_FAST"), ("slow", "REL_SLOW"),
        ("big", "REL_BIG")).toDF("kw", "pred")
      graft.extract.RelationExtract
        .patternRelations(t, kgMentions(s, dir), patterns)
        .orderBy(col("subj"), col("pred"), col("obj"),
          col("conv_id"), col("turn_idx"))
    }),

    // ======== coreference-lite (recency antecedents) ========

    // anaphoric marker turns resolved to the latest earlier anchored
    // turn in the same conversation — running last-non-null window
    // under the north-rule's stable (conv_id, turn_idx) order
    "kg_coref_resolve" -> ((s, dir) => {
      val t = transcripts(s, dir).select(
        col("conv_id"), col("turn_idx"), col("text"))
      val mentions = kgMentions(s, dir)
        .select(col("conv_id"), col("turn_idx"), col("code"))
      graft.extract.Coref.resolveMarkers(t, mentions, Seq("the", "a"))
        .orderBy(col("conv_id"), col("turn_idx"))
    }),

    // ======== edge confidence scoring ========

    // 0.7 support + 0.3 recency weighted combine over the temporal
    // edge table, exact floor-scaled ppm integers end to end
    "kg_edge_confidence" -> ((s, dir) => {
      val scoped = graft.triples.TemporalScope.scopeEdges(mentionObs(s, dir))
      graft.triples.EdgeConfidence.score(scoped)
        .orderBy(col("subj"), col("obj"))
    }),

    // ======== incremental canonicalization (delta CC) ========

    // fold a "new day" of merge edges (odd orderkeys) into the
    // canonical map built from history (even orderkeys) WITHOUT
    // touching historical edges; the oracle recomputes full CC over
    // everything — equality proves increment == recompute
    "kg_incremental_cc" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      def edges(parity: Int) = li
        .filter(col("l_orderkey") % 2 === parity)
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), pmod(col("l_partkey"), lit(20))).as("dst"))
        .distinct()
      val oldMap = graft.canon.ConnectedComponents.runAdaptive(s, edges(0))
      graft.canon.IncrementalCC.merge(s, oldMap, edges(1))
        .orderBy(col("node"))
    }),

    // ======== fixed-point integer PageRank over SIMILAR kNN edges ====

    // 5 iterations, rank mass in BIGINT units of 1e-12 — division,
    // damping and summation are all integer ops, so the result is
    // independent of partitioning/reduction order and the oracle
    // replays the identical arithmetic on the fixture kNN graph
    "graph_pagerank" -> ((s, dir) => {
      val dict = graft.fixtures.Fixtures.dict(s)
      graft.triples.GraphStats.pageRank(
          graft.triples.Triples.similarEdges(s, dict, k = 2)
            .select("subj", "obj"), iters = 5)
        .orderBy(col("node"))
    }),

    // ======== exact heavy hitters (the CMS ground truth) ========

    // top-20 most frequent tokens corpus-wide: two-stage agg (map-side
    // partial) + TakeOrdered — no full sort, no driver-side counting
    "text_top_terms" -> ((s, dir) =>
      graft.ops.Sketches.tokenOccurrences(T(s, dir, "documents"), "text")
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)),

    // ======== Count-Min frequency sketch ========

    // CMS (4×4096 cells, disjoint 12-bit slices of one hash64) built
    // corpus-wide, probed with the exact top-10 tokens; output pins
    // (exact_n, cms_est) side by side — est ≥ exact by construction
    // (asserted in SketchesSpec), bit-exact HUGEINT twin in DuckDB
    "sketch_countmin_freq" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val occ = graft.ops.Sketches.tokenOccurrences(docs, "text")
      val exact = occ.groupBy(col("token")).agg(count(lit(1)).as("exact_n"))
      val probes = exact.orderBy(col("exact_n").desc, col("token")).limit(10)
      val cms = graft.ops.Sketches.countMinTable(docs, "text", d = 4, wBits = 12)
      val est = graft.ops.Sketches.countMinEstimate(
        cms, probes.select("token"), "token", d = 4, wBits = 12)
      probes.join(est, "token")
        .select(col("token"), col("exact_n"), col("cms_est"))
        .orderBy(col("token"))
    }),

    // ======== multi-level aggregation: ROLLUP + grouping_id ========

    // per-(type, user-bucket) subtotals, per-type totals and the
    // grand total in ONE pass (Expand + partial agg — not three
    // scans); value sums quantized to integer cents so every level
    // is reduction-order-independent and engine-portable
    "agg_rollup" -> ((s, dir) => {
      val ev = T(s, dir, "events")
        .withColumn("user_bucket", col("user_id") % 10)
      ev.rollup(col("event_type"), col("user_bucket"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100).cast("long")).as("sum_v2"),
          grouping_id().as("lvl")) // must live inside the agg list
        .orderBy(col("lvl"), col("event_type").asc_nulls_first,
          col("user_bucket").asc_nulls_first)
    }),

    // ======== pivot: lang × source contingency counts ========

    // static pivot column set keeps the schema analysis-time-known
    // (the scale contract for pivot: never pivot on an unbounded
    // domain); absent combos filled 0 to match the SQL CASE-sum twin
    "agg_pivot" -> ((s, dir) =>
      T(s, dir, "documents")
        .groupBy(col("lang"))
        .pivot("source", Seq("src0", "src1", "src2", "src3", "src4"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("lang"))),

    // ======== KG negative sampling (contrastive training input) ====

    // k=2 deterministic corrupted tails per base edge via the
    // bucket-uniform sampler (no rand(), no global row_number):
    // bucket from the hash's low 6 bits, intra-bucket rank from the
    // rest mod bucket size; filtered-negatives discipline drops
    // accidental true triples — every row a pure function of the edge
    "kg_negative_sample" -> ((s, dir) => {
      val dict = graft.fixtures.Fixtures.dict(s)
      graft.triples.NegativeSample.corruptTails(
          graft.triples.Triples.baseEdges(s, dict), k = 2, bBits = 6)
        .orderBy(col("subj"), col("pred"), col("obj"), col("slot"))
    }),

    // ======== int8 embedding quantization ========

    // max-abs/127 symmetric quantization, exploded to scalar rows for
    // the cross-engine compare; the float contract (exact max, element
    // division, explicit HALF_UP floor(x+0.5)) is pinned in scaladoc
    "embed_quantize_int8" -> ((s, dir) =>
      graft.ops.Embeddings.quantizeInt8(
          T(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy(col("id"), col("d"))),

    // ======== Bloom-filter decontamination prefilter ========

    // same corpus/bench split as decontam_ngram, but membership via a
    // 2^16-bit bloom (3 disjoint 16-bit probes of one hash64): bloom
    // hits vs exact hits per doc — the false-positive overshoot is
    // observable output, pinned bit-exactly by the HUGEINT oracle
    "decontam_bloom" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ops.Decontaminate.bloomReport(
        docs.filter(col("doc_id") % 37 =!= 0), "doc_id", "text",
        bench = docs.filter(col("doc_id") % 37 === 0),
        n = 3, mBits = 16, k = 3)
        .orderBy(col("doc_id"))
    }),

    // ======== context-response training pairs (SFT extraction) ====

    // one bounded window pass per conversation — the previous 3 turns
    // render as "role: text" lines; no self-join, state ≤ 3 lines/row
    "conv_context_pairs" -> ((s, dir) =>
      graft.ops.Conversations.contextPairs(transcripts(s, dir), nContext = 3)
        .orderBy(col("conv_id"), col("turn_idx"))),

    // ======== per-conversation integrity report ========

    // transcript-quality gate: index gaps, broken role alternation,
    // start-role and tool density — one lag window + one groupBy
    "conv_integrity" -> ((s, dir) =>
      graft.ops.Conversations.integrity(transcripts(s, dir))
        .orderBy(col("conv_id"))),

    // ======== tool-call transition bigrams ========

    // Markov transition counts over each conversation's tool turns
    // (START sentinel for the first); pair domain is tools² — tiny
    "tool_transitions" -> ((s, dir) =>
      graft.ops.Conversations.toolTransitions(transcripts(s, dir))
        .orderBy(col("prev_tool"), col("next_tool"))),

    // ======== basic-graph-pattern query (Cypher MATCH twin) ========

    // the reference's CDE value-domain + DEC chain as ONE declarative
    // pattern over the materialized edges: each constant-predicate
    // pattern is a partition-prunable scan, joins are plain Catalyst
    // equi-joins on the shared variables
    "kg_bgp_query" -> ((s, dir) => {
      val dict = graft.fixtures.Fixtures.dict(s)
      graft.triples.BgpQuery.query(
          graft.triples.Triples.baseEdges(s, dict), Seq(
            ("?cde", "HAS_VDM", "?vdm"), ("?vdm", "HAS_PV", "?pv"),
            ("?pv", "HAS_CONCEPT", "?ncit"), ("?cde", "HAS_DEC", "?dec"),
            // the typing hop of reference synonym_tool.py:90-96
            ("?ncit", "HAS_SEMANTIC_TYPE", "?stype")))
        .orderBy(col("cde"), col("vdm"), col("pv"), col("ncit"),
          col("dec"), col("stype"))
    }),

    // ======== transitive closure (ancestors table) ========

    // semi-naive reachability over the directed structural edges —
    // per-round work ∝ NEW pairs only; the materialized subsumption
    // closure every KG serving layer precomputes
    "kg_transitive_closure" -> ((s, dir) => {
      val dict = graft.fixtures.Fixtures.dict(s)
      graft.triples.GraphTraverse.closure(s,
          graft.triples.Triples.baseEdges(s, dict))
        .orderBy(col("src"), col("dst"))
    }),

    // ======== ontology hierarchy rollup ========

    // per-concept mention-turn counts aggregated up the is-a DAG:
    // every ancestor carries its subtree total (the precomputed
    // subsumption aggregate the reference answers with per-query
    // Cypher traversals); the ancestors table is ontology-sized, the
    // corpus is touched only by the direct-count aggregation
    "kg_hierarchy_rollup" -> ((s, dir) => {
      import s.implicits._
      val direct = kgMentions(s, dir)
        .groupBy(col("code")).agg(count(lit(1)).as("n_direct"))
      graft.triples.Hierarchy.rollupCounts(s,
          kgIsaEdges.toDF("subj", "obj"), direct)
        .orderBy(col("code"))
    }),

    // ======== sequence packing (concat-and-chunk) ========

    // fixed-capacity training windows via the TWO-PHASE distributed
    // prefix sum (range partition → per-partition subtotal → broadcast
    // offsets + within-partition window) — never a global single-
    // partition Window.orderBy; offsets are partitioning-independent
    "pack_sequences" -> ((s, dir) =>
      graft.ops.Packing.packByOffset(s,
          T(s, dir, "documents").select("doc_id", "n_chars"),
          "doc_id", "n_chars", capacity = 2048L)
        .orderBy(col("doc_id"))),

    // ======== corpus-level duplicated-n-gram fraction ========

    // df-based boilerplate signal: fraction of a doc's distinct
    // 3-grams found in >1 documents — the cross-document complement
    // of the per-doc text_repetition signal
    "text_dup_ngrams" -> ((s, dir) =>
      graft.ops.TextAnalysis.dupNgramFraction(
          T(s, dir, "documents"), "doc_id", "text", n = 3, threshold = 1)
        .orderBy(col("doc_id"))),

    // the Count-Min form of the same signal (df read from a broadcast
    // 4x4096 sketch — no corpus-keyed df shuffle, the true 100 TB
    // shape), pinned SIDE BY SIDE with the exact fractions: the
    // oracle recomputes every sketch cell in HUGEINT and the
    // overcount est>=exact is part of the pinned output
    "text_dup_ngrams_cms" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val exact = TextAnalysis.dupNgramFraction(docs, "doc_id", "text",
          n = 3, threshold = 1)
        .select(col("doc_id"), col("n_ngrams"),
          col("n_dup").as("n_dup_exact"),
          col("dup_fraction").as("dup_fraction_exact"))
      val cms = TextAnalysis.dupNgramFractionCms(docs, "doc_id", "text",
          n = 3, threshold = 1, d = 4, wBits = 12)
        .select(col("doc_id"), col("n_dup_cms"), col("dup_fraction_cms"))
      exact.join(cms, "doc_id")
        .select(col("doc_id"), col("n_ngrams"), col("n_dup_exact"),
          col("n_dup_cms"), col("dup_fraction_exact"), col("dup_fraction_cms"))
        .orderBy(col("doc_id"))
    }),

    // ======== conversation-level exact dedup ========

    // whole conversations as the dedup unit: order-pinned fingerprint
    // (sorted (turn_idx, text) structs — collect_list alone has no
    // ordering guarantee) groups re-ingested transcripts; fixture
    // duplicates injected for conv_ids ending in '0'
    "conv_dedup_exact" -> ((s, dir) => {
      val t = transcripts(s, dir)
      val withDups = t.unionByName(
        t.filter(col("conv_id").endsWith("0"))
          .withColumn("conv_id", concat(col("conv_id"), lit("-dup"))))
      graft.ops.Conversations.dedupExact(withDups).orderBy(col("conv_id"))
    }),

    // ======== deterministic random-walk corpus (KG embeddings) ====

    // node2vec/DeepWalk input sequences over the SIMILAR kNN graph:
    // 2 walks × 4 steps from every node, each step a pure hash
    // function of the walk identity (no rand()) — the oracle replays
    // every step from the fixture VALUES with the HUGEINT hash twin
    "kg_random_walks" -> ((s, dir) => {
      val dict = graft.fixtures.Fixtures.dict(s)
      graft.triples.RandomWalks.walks(s,
          graft.triples.Triples.similarEdges(s, dict, k = 2)
            .select("subj", "obj"),
          walksPerNode = 2, walkLen = 4)
        .orderBy(col("start"), col("walk"), col("step"))
    }),

    // skip-gram (center, context) counts over the same walk corpus —
    // offset-explode + equi-join (O(rows × window), never per-walk
    // quadratic); window 2 both sides
    "kg_skipgram_pairs" -> ((s, dir) => {
      val dict = graft.fixtures.Fixtures.dict(s)
      val corpus = graft.triples.RandomWalks.walks(s,
        graft.triples.Triples.similarEdges(s, dict, k = 2)
          .select("subj", "obj"),
        walksPerNode = 2, walkLen = 4)
      graft.triples.RandomWalks.skipGramPairs(corpus, window = 2)
        .orderBy(col("center"), col("context"))
    }),

    // ======== graph snapshot diff ========

    // added/removed/retained classification between the even- and
    // odd-orderkey edge snapshots — ONE full outer join on the edge
    // identity, status a null-flag CASE
    "kg_graph_diff" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      def snap(parity: Int) = li
        .filter(col("l_orderkey") % 2 === parity)
        .select(concat(lit("s"), col("l_suppkey")).as("subj"),
          concat(lit("P"), pmod(col("l_partkey"), lit(3))).as("pred"),
          concat(lit("p"), pmod(col("l_partkey"), lit(20))).as("obj"))
      graft.triples.GraphDiff.diff(snap(0), snap(1))
        .orderBy(col("subj"), col("pred"), col("obj"))
    }),

    // ======== epoch-weighted mixture resampling ========

    // fractional-epoch training mix (2.5 epochs of src0, a quarter
    // pass of src1, ...) — map-only, deterministic Knuth-hash
    // fractional keep, dyadic weights so the float threshold is
    // engine-exact
    "sample_mixture_epochs" -> ((s, dir) =>
      graft.ops.Sampling.mixtureEpochs(
          T(s, dir, "documents").select("doc_id", "source"),
          "doc_id", "source",
          Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 1.0),
          defaultWeight = 0.75)
        .orderBy(col("doc_id"), col("epoch"))),

    // ======== leakage-safe split assignment ========

    // train/val/test split keyed on conv_id so every turn of a
    // conversation lands in the same split (the row-wise version is
    // the classic eval-contamination bug); summarized per split for a
    // compact oracle that still pins every row's assignment (group
    // counts + bucket checksum)
    "sample_split_assign" -> ((s, dir) =>
      graft.ops.Sampling.assignSplit(transcripts(s, dir), "conv_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(countDistinct(col("conv_id")).as("n_convs"),
          count(lit(1)).as("n_turns"),
          sum(col("split_bucket")).as("bucket_sum"))
        .orderBy(col("split"))),

    // ======== fixed-k-per-stratum sampling ========

    // exactly 25 docs per source, selected as the k smallest Knuth
    // buckets (prefilter + window on the k-proportional survivor set;
    // oracle replays the pure rank contract over all rows)
    "sample_k_per_group" -> ((s, dir) =>
      graft.ops.Sampling.kPerGroup(
          T(s, dir, "documents").select("doc_id", "source"),
          "doc_id", "source", k = 25)
        .select(col("source"), col("doc_id"), col("bucket"), col("rk"))
        .orderBy(col("source"), col("rk"))),

    // ======== token-window document chunking ========

    // 32-token windows, stride 24 (8 tokens of overlap) — map-only
    // split + explode(sequence) + slice; oracle replays the identical
    // window arithmetic with DuckDB list slicing
    "text_chunking" -> ((s, dir) =>
      graft.ops.TextAnalysis.chunk(
          T(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", chunkTokens = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // ======== streaming executions under the batch oracle (§2.8) ====

    // Structured Streaming event-time windowed aggregation, run to
    // completion with Trigger.AvailableNow into a memory sink
    // (StreamingIngest.runAvailableNow) — a REAL streaming execution
    // (StreamExecution, micro-batch planner, stateful agg operator)
    // whose result sits under the same DuckDB oracle as the batch
    // operators. Complete output mode: every window emitted, no
    // late-data boundary to reconcile. Tumbling windows align to the
    // epoch in both engines, so the oracle is integer floor division
    // on epoch micros.
    "streaming_windowed_counts" -> ((s, dir) => {
      val ev = s.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
          "event_type STRING, value DOUBLE, props STRING")
        // glob, not bare file path: the file stream source requires a
        // directory or pattern (basePath must be a directory)
        .parquet(s"$dir/events.*")
      val agg = ev
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        // parquet ts is NTZ (no UTC adjustment in the file's metadata);
        // session tz is UTC, so the NTZ->LTZ cast yields the same epoch
        // the oracle's epoch_us computes on the naive value
        .select(unix_micros(col("window.start").cast("timestamp"))
            .as("window_start_us"),
          col("event_type"), col("n"))
      graft.streaming.StreamingIngest.runAvailableNow(s, agg, "complete")
        .orderBy(col("window_start_us"), col("event_type"))
    }),

    // the KG pipeline's front stage (broadcast Aho–Corasick mention
    // detection) executed ON A STREAM of the same transcript table
    // kg_mention_detect reads in batch — same flatMap, same grouped
    // output, same oracle SQL; proves the extraction is
    // streaming-safe (stateless flatMap + complete-mode count) with
    // value-identical results, not just row counts
    "streaming_mention_parity" -> ((s, dir) => {
      import s.implicits._
      val staged = java.nio.file.Files
        .createTempDirectory("graft-stream-transcripts").toString
      try {
      transcripts(s, dir).write.mode("overwrite").parquet(staged)
      val ac = s.sparkContext.broadcast(
        graft.dict.AhoCorasick.build(kgTerms.map(_._2)))
      val turns = s.readStream
        .schema(graft.streaming.StreamingIngest.turnSchema).parquet(staged)
      val mentions = turns.select(col("conv_id"), col("turn_idx"), col("text"))
        .as[(String, Int, String)]
        .flatMap { case (cid, ti, text) =>
          ac.value.findMatches(text).map { case (b, e) =>
            (cid, ti, text.substring(b, e).toLowerCase)
          }
        }
        .toDF("conv_id", "turn_idx", "term")
        .groupBy(col("conv_id"), col("turn_idx"), col("term"))
        .agg(count(lit(1)).as("n"))
      graft.streaming.StreamingIngest.runAvailableNow(s, mentions, "complete")
        .orderBy(col("conv_id"), col("turn_idx"), col("term"))
      // the memory-sink result is materialized independent of the
      // staged files once the AvailableNow run drains, so the staged
      // corpus is deleted EAGERLY — repeated bench/verify invocations
      // in one session no longer accumulate a transcript copy per call
      } finally { rmTree(new java.io.File(staged)) }
    }),

    // session windows through the STREAMING state store (the
    // merging-session operator, not the tumbling one) under the batch
    // oracle — complete mode, so no watermark eviction to reconcile;
    // 12h gap over the events table gives a real merge/split mix
    // (~3.3k sessions, up to 18 events merged, at sf0.01). Boundary
    // semantics pinned: session_window splits at diff >= gap, so the
    // oracle's lag-flag uses >= (the batch Sessionize op splits at
    // > gap — divergence documented there and in StreamingSpec).
    "streaming_session_parity" -> ((s, dir) => {
      val ev = s.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
          "event_type STRING, value DOUBLE, props STRING")
        .parquet(s"$dir/events.*")
      val agg = ev
        .groupBy(session_window(col("ts"), "12 hours").as("sw"),
          col("user_id"))
        .agg(count(lit(1)).as("n"),
          unix_micros(min(col("ts")).cast("timestamp")).as("first_us"),
          unix_micros(max(col("ts")).cast("timestamp")).as("last_us"))
        .select(col("user_id"), col("n"), col("first_us"), col("last_us"))
      graft.streaming.StreamingIngest.runAvailableNow(s, agg, "complete")
        .orderBy(col("user_id"), col("first_us"))
    }),

    // ======== sinks round-tripped under the oracle (S4/S5) ========

    // S4 training-data sink: date-partitioned JSON append
    // (Sinks.appendTrainingJson) written to a fresh dir and read
    // back — the oracle checks the ROUND-TRIP (partition derivation,
    // JSON encode/decode, partition-column recovery), not just the
    // projection. dt comes back via partition discovery (inferred
    // integer, cast to the string the oracle derives with strftime).
    "sink_training_roundtrip" -> ((s, dir) => {
      val out = rmTreeOnExit(java.nio.file.Files
        .createTempDirectory("graft-sink-training").toString) + "/table"
      graft.sources.Sinks.appendTrainingJson(
        T(s, dir, "events").select("event_id", "event_type", "ts"), "ts", out)
      // read back with a DECLARED schema (the production contract for
      // a table you own): no schema-inference pre-pass over every JSON
      // file, and the unused ts field is never even parsed (column
      // pruning). dt still arrives via partition discovery, typed by
      // the declared schema — same recovered values the oracle derives.
      s.read.schema("event_id BIGINT, event_type STRING, dt STRING").json(out)
        .select(col("event_id").cast("long").as("event_id"),
          col("event_type"), col("dt").cast("string").as("dt"))
        .orderBy(col("event_id"))
    }),

    // S5 export sink: single-file pretty JSON export
    // (Sinks.exportJson) of a top-10 result, read back and compared
    // value-exact — counts survive the JSON number round-trip
    // losslessly (int64)
    "sink_export_roundtrip" -> ((s, dir) => {
      val out = rmTreeOnExit(java.nio.file.Files
        .createTempDirectory("graft-sink-export").toString) + "/export"
      val top = T(s, dir, "events")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type")).limit(10)
      graft.sources.Sinks.exportJson(top, out)
      s.read.json(out).select(col("event_type"), col("n").cast("long").as("n"))
        .orderBy(col("n").desc, col("event_type"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "p1_exact_code_lookup" ->
      "SELECT p_partkey, p_name, p_type FROM part WHERE p_partkey = 42",

    "p2_ci_term_match" ->
      "SELECT n_nationkey, n_name FROM nation WHERE lower(n_name) = lower(trim('  nation_7  '))",

    "p3_normalize" ->
      """SELECT c_custkey, upper(trim(c_mktsegment)) AS seg_norm,
        | lower(c_name) AS name_lower FROM customer ORDER BY c_custkey LIMIT 100""".stripMargin,

    "p4_null_filter" ->
      s"""WITH t AS ($transcriptsSql)
         |SELECT conv_id, turn_idx, tool FROM t WHERE tool IS NOT NULL
         |ORDER BY conv_id, turn_idx""".stripMargin,

    "p6_substring" ->
      "SELECT doc_id, substring(text, 1, 100) AS text_head FROM documents ORDER BY doc_id",

    "j1_join_1hop" ->
      """SELECT n_nationkey, n_name, r_name FROM nation
        |JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey""".stripMargin,

    "j2_join_2hop" ->
      """SELECT c_custkey, n_name, r_name FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey ORDER BY c_custkey""".stripMargin,

    "j3_join_3hop" ->
      """SELECT c_mktsegment, count(*) AS n_lines,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "j4_leftouter_agg" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big_orders, min(o_orderkey) AS first_okey
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
        | ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "j5_point_join_limit1" ->
      """SELECT l_partkey, l_suppkey, l_orderkey FROM (
        | SELECT l_partkey, l_suppkey, l_orderkey,
        |  row_number() OVER (PARTITION BY l_partkey
        |    ORDER BY l_suppkey, l_orderkey, l_linenumber) AS rn
        | FROM lineitem) WHERE rn = 1 ORDER BY l_partkey""".stripMargin,

    "j6_semi_anti" ->
      """SELECT c_custkey, 'has_f_order' AS tag FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |UNION ALL
        |SELECT c_custkey, 'no_f_order' AS tag FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey, tag""".stripMargin,

    "a1_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a1_collect_list" ->
      """SELECT o_custkey, string_agg(o_orderkey, ',' ORDER BY o_orderkey) AS okeys
        |FROM orders WHERE o_totalprice > 450000
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "a3_distinct_count" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
        | count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a4_ordinal_avg" ->
      """SELECT o_orderstatus,
        | CAST(round(avg(CAST(CASE o_orderpriority WHEN '1-URGENT' THEN 4
        |   WHEN '2-HIGH' THEN 3 WHEN '3-MEDIUM' THEN 2 ELSE 1 END AS DECIMAL(18,6))), 2) AS DOUBLE)
        |   AS avg_priority
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "a5_value_counts" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type",

    "a6_minmax_bands" ->
      """SELECT user_id, min_v, max_v,
        | CASE WHEN max_v > 0.95 THEN 'high' WHEN max_v > 0.85 THEN 'good'
        |  ELSE 'low' END AS band
        |FROM (SELECT user_id, round(min(value), 4) AS min_v, round(max(value), 4) AS max_v
        |      FROM events GROUP BY user_id) ORDER BY user_id""".stripMargin,

    "a7_distinct" ->
      "SELECT DISTINCT p_brand, p_type FROM part ORDER BY p_brand, p_type",

    "w1_topk_per_group" ->
      """SELECT o_custkey, rank, o_orderkey, round(o_totalprice, 2) AS price FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rank
        | FROM orders) WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,

    "w2_fulltext_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        |  FROM documents),
        | hit AS (SELECT doc_id, token FROM toks
        |  WHERE token IN ('spark', 'join', 'vector')),
        | df AS (SELECT token, count(*) AS df FROM hit GROUP BY token),
        | n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        | w AS (SELECT h.doc_id, h.token,
        |   floor(ln(n.n_docs / d.df) * 1048576 + 0.5) / 1048576 AS idf
        |  FROM hit h JOIN df d USING (token) CROSS JOIN n),
        | agged AS (SELECT doc_id,
        |   max(CASE WHEN token = 'spark' THEN idf END) AS w0,
        |   max(CASE WHEN token = 'join' THEN idf END) AS w1,
        |   max(CASE WHEN token = 'vector' THEN idf END) AS w2
        |  FROM w GROUP BY doc_id)
        |SELECT doc_id, score FROM (
        | SELECT doc_id,
        |  floor((coalesce(w0, 0.0) + coalesce(w1, 0.0) + coalesce(w2, 0.0)) * 1e6 + 0.5)
        |    / 1e6 AS score
        | FROM agged) s WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 5""".stripMargin,

    "w2_fulltext_bm25" ->
      """WITH dl AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        | totals AS (SELECT count(*) AS n_docs, sum(dl) AS total_tok FROM dl),
        | tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |   SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE token IN ('spark', 'join', 'vector') GROUP BY doc_id, token),
        | dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        | scored AS (
        |  SELECT t.doc_id,
        |   floor((floor(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
        |       * 1048576 + 0.5) / 1048576)
        |     * ((CAST(t.tf AS DOUBLE) * 2.25) / (CAST(t.tf AS DOUBLE)
        |        + 1.25 * (0.25 + 0.75 * (CAST(d.dl * n_docs AS DOUBLE)
        |                                 / CAST(total_tok AS DOUBLE)))))
        |     * 1048576 + 0.5) / 1048576 AS contrib
        |  FROM tf t JOIN dfq USING (token) JOIN dl d USING (doc_id)
        |  CROSS JOIN totals)
        |SELECT doc_id, floor(sum(contrib) * 1e6 + 0.5) / 1e6 AS score
        |FROM scored GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 5""".stripMargin,

    "w4_limit1" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 1""".stripMargin,

    "w5_stable_turn_order" ->
      s"""WITH t AS ($transcriptsSql)
         |SELECT conv_id, turn_idx,
         | row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS turn_rank,
         | role,
         | lag(role, 1) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
         |FROM t ORDER BY conv_id, turn_idx""".stripMargin,

    "set_union_except" ->
      """WITH hi AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000),
        | f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT o_custkey, 'both' AS src FROM (SELECT * FROM hi INTERSECT SELECT * FROM f)
        |UNION ALL
        |SELECT o_custkey, 'hi_only' AS src FROM (SELECT * FROM hi EXCEPT SELECT * FROM f)
        |ORDER BY o_custkey, src""".stripMargin,

    "f4_cosine_pairs" ->
      s"""SELECT a.vec_id AS id_a,
         | round(${duckCosine("a.embedding", "b.embedding")}, 6) AS cos
         |FROM embeddings a JOIN embeddings b ON a.vec_id = b.vec_id + 250
         |ORDER BY id_a""".stripMargin,

    "f5_weighted_combine" ->
      """WITH base AS (SELECT user_id, event_id, value AS score FROM events
        |  WHERE event_type = 'view'),
        | ocs AS (SELECT user_id,
        |   round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS oc_score
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT base.user_id, event_id,
        | floor((score * 0.7 + coalesce(oc_score, 0.0) * 0.3) * 1e6 + 0.5) / 1e6 AS combined
        |FROM base LEFT JOIN ocs ON base.user_id = ocs.user_id
        |ORDER BY base.user_id, event_id""".stripMargin,

    "f6_regex_extract" ->
      """SELECT p_partkey, regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
        | regexp_extract(upper(p_type), '(?i)(widget|gizmo|gear)', 1) AS kind
        |FROM part ORDER BY p_partkey""".stripMargin,

    "f11_date_format" ->
      """SELECT strftime(o_orderdate, '%Y%m') AS ym, count(*) AS n,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY ym""".stripMargin,

    "f8_parse_lines" ->
      """WITH resp AS (SELECT doc_id,
        |  'Thought: map raw value' || chr(10) || 'Action: term_matcher' || chr(10) ||
        |  'Observation: found code C' || (doc_id % 97) || chr(10) ||
        |  'Final Answer: C' || (doc_id % 97) || ' Confidence: ' ||
        |  CASE WHEN doc_id % 3 = 0 THEN 'High' WHEN doc_id % 3 = 1 THEN 'Medium'
        |   ELSE 'Low' END AS response FROM documents),
        | lines AS (SELECT doc_id,
        |   generate_subscripts(string_split(response, chr(10)), 1) - 1 AS line_no,
        |   unnest(string_split(response, chr(10))) AS line FROM resp)
        |SELECT doc_id, line_no,
        | CASE WHEN starts_with(line, 'Thought:') THEN 'thought'
        |  WHEN starts_with(line, 'Action:') THEN 'action'
        |  WHEN starts_with(line, 'Observation:') THEN 'observation'
        |  WHEN starts_with(line, 'Final Answer:') THEN 'final'
        |  ELSE 'other' END AS kind
        |FROM lines ORDER BY doc_id, line_no""".stripMargin,

    "f9_parse_response" ->
      """WITH resp AS (SELECT doc_id,
        |  'Action: term_matcher' || chr(10) || 'Final Answer: C' || (doc_id % 97) ||
        |  ' confidence: ' ||
        |  CASE WHEN doc_id % 3 = 0 THEN 'high' WHEN doc_id % 3 = 1 THEN 'medium'
        |   ELSE 'low' END AS response FROM documents)
        |SELECT doc_id, regexp_extract(response, '([A-Z]\d+)', 1) AS code,
        | CASE lower(regexp_extract(response, '(?i)Confidence[:\s]*(High|Medium|Low)', 1))
        |  WHEN 'high' THEN 'High' WHEN 'medium' THEN 'Medium' WHEN 'low' THEN 'Low'
        |  ELSE '' END AS confidence,
        | CASE WHEN contains(lower(response), 'action: term_matcher') THEN 'term_matcher'
        |  WHEN contains(lower(response), 'action: node_matcher') THEN 'node_matcher'
        |  WHEN contains(lower(response), 'action: semantic_search') THEN 'semantic_search'
        |  ELSE 'none' END AS tool
        |FROM resp ORDER BY doc_id""".stripMargin,

    "skew_salted_agg" ->
      s"""WITH t AS ($transcriptsSql)
         |SELECT conv_id, count(*) AS n_turns,
         | CAST(sum(length(text)) AS BIGINT) AS total_chars
         |FROM t GROUP BY conv_id ORDER BY conv_id""".stripMargin,

    "kg_mention_detect" -> mentionDetectSql,

    // identical extraction executed through Structured Streaming
    // (AvailableNow + memory sink) — same oracle by construction
    "streaming_mention_parity" -> mentionDetectSql,

    "streaming_windowed_counts" ->
      """SELECT (epoch_us(ts) // 600000000) * 600000000 AS window_start_us,
        | event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "sample_split_assign" -> {
      val h = SketchOracles.hash64_expr.replace("__EXPR__", "conv_id")
      // unsigned-HUGEINT hash % 2^32 == Spark's pmod(signed, 2^32)
      // (2^64 is a multiple of 2^32); thresholds floor(0.8 * 2^32)
      // and floor(0.9 * 2^32)
      s"""WITH t AS ($transcriptsSql),
         | b AS (SELECT conv_id, ($h) % 4294967296 AS bucket FROM t)
         |SELECT CASE WHEN bucket < 3435973836 THEN 'train'
         |            WHEN bucket < 3865470566 THEN 'val'
         |            ELSE 'test' END AS split,
         |  count(DISTINCT conv_id) AS n_convs, count(*) AS n_turns,
         |  CAST(sum(bucket) AS BIGINT) AS bucket_sum
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "sample_k_per_group" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |    (doc_id * 2654435761) % 4294967296 AS bucket
        |  FROM documents),
        | r AS (
        |  SELECT source, doc_id, bucket,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY bucket, doc_id) AS rk
        |  FROM b)
        |SELECT source, doc_id, bucket, rk FROM r
        |WHERE rk <= 25 ORDER BY source, rk""".stripMargin,

    "text_chunking" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        | s AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    1 + CAST(floor((greatest(len(toks) - 32, 0) + 23) / 24.0) AS INT) AS nc
        |  FROM d),
        | w AS (
        |  SELECT doc_id, toks, n,
        |    unnest(generate_series(0, nc - 1)) AS i
        |  FROM s)
        |SELECT doc_id, i AS chunk_idx,
        |  array_to_string(toks[i*24 + 1 : i*24 + 32], ' ') AS chunk_text,
        |  least(n - i*24, 32) AS chunk_tokens
        |FROM w ORDER BY doc_id, chunk_idx""".stripMargin,

    "streaming_session_parity" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts) >= 43200000000
        |    THEN 1 ELSE 0 END AS flag
        |  FROM events),
        | a AS (
        |  SELECT user_id, us,
        |    sum(flag) OVER (PARTITION BY user_id ORDER BY us
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sidx
        |  FROM g)
        |SELECT user_id, count(*) AS n, min(us) AS first_us,
        |  max(us) AS last_us
        |FROM a GROUP BY user_id, sidx ORDER BY user_id, first_us""".stripMargin,

    "sink_training_roundtrip" ->
      """SELECT event_id, event_type, strftime(ts, '%Y%m%d') AS dt
        |FROM events ORDER BY event_id""".stripMargin,

    "sink_export_roundtrip" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type LIMIT 10""".stripMargin,

    "kg_entity_link" ->
      s"""WITH t AS ($transcriptsSql),
         | d(code, term) AS (SELECT * FROM (VALUES $kgTermsSqlValues) v(code, term))
         |SELECT conv_id, turn_idx, code, 2 AS stage
         |FROM t, d
         |WHERE len(regexp_extract_all(lower(t.text), '\\b' || d.term || '\\b')) > 0
         |ORDER BY conv_id, turn_idx, code""".stripMargin,

    "kg_cooccur_lift" ->
      s"""WITH t AS ($transcriptsSql),
         | d(code, term) AS (SELECT * FROM (VALUES $kgTermsSqlValues) v(code, term)),
         | links AS (
         |  SELECT DISTINCT t.conv_id || '#' || CAST(t.turn_idx // 10 AS VARCHAR) AS conv_id, d.code
         |  FROM t, d
         |  WHERE len(regexp_extract_all(lower(t.text), '\\b' || d.term || '\\b')) > 0),
         | na AS (SELECT code, count(*) AS n FROM links GROUP BY code),
         | nc AS (SELECT count(DISTINCT conv_id) AS n_conv FROM links),
         | pairs AS (
         |  SELECT a.code AS code_a, b.code AS code_b, count(*) AS pair_n
         |  FROM links a JOIN links b ON a.conv_id = b.conv_id AND a.code < b.code
         |  GROUP BY 1, 2)
         |SELECT p.code_a, p.code_b, p.pair_n, x.n AS n_a, y.n AS n_b, nc.n_conv,
         | CAST((1000000::HUGEINT * p.pair_n * nc.n_conv)
         |   // (x.n::HUGEINT * y.n) AS BIGINT) AS lift_ppm
         |FROM pairs p
         |JOIN na x ON p.code_a = x.code
         |JOIN na y ON p.code_b = y.code
         |CROSS JOIN nc
         |ORDER BY code_a, code_b""".stripMargin,

    "kg_connected_components" -> ccOracleSql,
    "kg_connected_components_dist" -> ccOracleSql,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS survivor_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, len(list_distinct(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS ntok,
        |   unnest(list_distinct(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS token
        |  FROM documents WHERE doc_id < 600)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | round(CAST(count(*) AS DOUBLE) / (a.ntok + b.ntok - count(*)), 4) AS jaccard
        |FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id, a.ntok, b.ntok
        |HAVING CAST(count(*) AS DOUBLE) / (a.ntok + b.ntok - count(*)) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_embedding_cosine" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         | round(${duckCosine("a.embedding", "b.embedding")}, 6) AS cos
         |FROM embeddings a JOIN embeddings b
         | ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,

    "ann_bruteforce_topk" ->
      s"""SELECT CAST(q.vec_id AS VARCHAR) AS query_id, rank,
         | CAST(c_vec_id AS VARCHAR) AS id, cos FROM (
         | SELECT q.vec_id, c.vec_id AS c_vec_id,
         |  round(${duckCosine("q.embedding", "c.embedding")}, 6) AS cos,
         |  row_number() OVER (PARTITION BY q.vec_id
         |   ORDER BY ${duckCosine("q.embedding", "c.embedding")} DESC,
         |            CAST(c.vec_id AS VARCHAR)) AS rank
         | FROM (SELECT * FROM embeddings WHERE vec_id < 8) q
         | JOIN embeddings c ON q.vec_id <> c.vec_id) q
         |WHERE rank <= 5 ORDER BY q.vec_id, rank""".stripMargin,

    "text_langid" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(string_split(
        |   regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        | FROM documents),
        |scores AS (
        | SELECT doc_id,
        |  count(*) FILTER (tok IN ('the','a','of','and','to','in','is','that')) AS en,
        |  count(*) FILTER (tok IN ('der','die','das','und','ist','nicht','ein','zu')) AS de,
        |  count(*) FILTER (tok IN ('le','la','les','et','est','un','une','dans')) AS fr,
        |  count(*) FILTER (tok IN ('el','la','los','que','es','un','una','en')) AS es
        | FROM toks GROUP BY doc_id)
        |SELECT d.doc_id,
        | CASE WHEN greatest(coalesce(en,0),coalesce(de,0),coalesce(es,0),coalesce(fr,0)) <= 0 THEN 'und'
        |  WHEN coalesce(de,0) >= coalesce(en,0) AND coalesce(de,0) >= coalesce(es,0) AND coalesce(de,0) >= coalesce(fr,0) THEN 'de'
        |  WHEN coalesce(en,0) >= coalesce(es,0) AND coalesce(en,0) >= coalesce(fr,0) THEN 'en'
        |  WHEN coalesce(es,0) >= coalesce(fr,0) THEN 'es'
        |  ELSE 'fr' END AS lang_pred
        |FROM documents d LEFT JOIN scores USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "text_token_count" ->
      """SELECT doc_id,
        | len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS ws_tokens,
        | len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |   regexp_replace(text, '(\S+ \S+) ', '\1' || chr(10), 'g') AS text
        |  FROM documents),
        | lines AS (
        |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM docs),
        | per AS (
        |  SELECT doc_id, line, count(*) AS c, length(line) AS len
        |  FROM lines GROUP BY doc_id, line),
        | agg AS (
        |  SELECT doc_id, CAST(sum(c) AS INT) AS n_lines, count(*) AS n_distinct,
        |   sum(c * len) AS total_chars, sum((c - 1) * len) AS dup_chars
        |  FROM per GROUP BY doc_id)
        |SELECT doc_id, n_lines,
        | floor((1 - CAST(n_distinct AS DOUBLE) / n_lines) * 1e4 + 0.5) / 1e4 AS dup_line_frac,
        | CASE WHEN total_chars = 0 THEN 0.0
        |  ELSE floor((CAST(dup_chars AS DOUBLE) / total_chars) * 1e4 + 0.5) / 1e4
        | END AS dup_line_char_frac
        |FROM agg ORDER BY doc_id""".stripMargin,

    // payload sizes re-derived per format: BMP = 54-byte header +
    // h rows of stride ((3w+3)/4)*4 with hash-derived dims (<=64);
    // WAV = 44-byte header + one byte per UTF-8 text byte; AVI =
    // 224-byte header region + nf frames of 8 + h*stride bytes with
    // hash-derived dims <=16 and 1-4 frames (the hash twins live in
    // SketchOracles)
    "mm_media_meta" -> {
      val w = "((((h1 % 64) + 64) % 64) + 1)"
      val h = "((((h2 % 64) + 64) % 64) + 1)"
      val vw = "((((h1 % 16) + 16) % 16) + 1)"
      val vh = "((((h2 % 16) + 16) % 16) + 1)"
      val nf = "((((h3 % 4) + 4) % 4) + 1)"
      s"""WITH hashed AS (
         | SELECT doc_id, text,
         |  ${SketchOracles.mm_hash64_text} AS h1,
         |  ${SketchOracles.mm_hash64_text_h} AS h2,
         |  ${SketchOracles.mm_hash64_text_f} AS h3
         | FROM documents)
         |SELECT doc_id AS media_id,
         | CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
         |  ELSE 'video' END AS kind,
         | CAST(CASE
         |  WHEN doc_id % 3 = 0 THEN 54 + $h * (((3 * $w + 3) // 4) * 4)
         |  WHEN doc_id % 3 = 1 THEN 44 + octet_length(encode(text))
         |  ELSE 224 + $nf * (8 + $vh * (((3 * $vw + 3) // 4) * 4))
         |  END AS BIGINT) AS n_bytes
         |FROM hashed ORDER BY media_id""".stripMargin
    },

    "kg_triple_extract" ->
      s"""WITH t AS ($transcriptsSql),
         | d(code, term) AS (SELECT * FROM (VALUES $kgTermsSqlValues) v(code, term))
         |SELECT conv_id || '#' || turn_idx AS subj, 'LINKED_TO' AS pred, code AS obj
         |FROM t, d
         |WHERE len(regexp_extract_all(lower(t.text), '\\b' || d.term || '\\b')) > 0
         |ORDER BY subj, obj""".stripMargin,

    "kg_synonym_lookup" ->
      s"""WITH syn(code, term) AS (SELECT * FROM (VALUES $synonymSqlValues) v(code, term)),
         | pv(pv_code, pv_term, ncit_code) AS (
         |   SELECT * FROM (VALUES $pvEdgeSqlValues) v(pv_code, pv_term, ncit_code)),
         | bycode AS (
         |  SELECT upper(trim(c.code)) AS input, s.term AS synonym
         |  FROM (VALUES ('C4878'), ('C3117'), ('C9305')) c(code)
         |  JOIN syn s ON s.code = upper(trim(c.code))
         |  WHERE s.term IS NOT NULL),
         | bypv AS (
         |  SELECT q.pv_term AS input, s.term AS synonym
         |  FROM (VALUES ('Stage IV'), ('Female'), ('stage iv')) q(pv_term)
         |  JOIN pv p ON p.pv_term = q.pv_term
         |  JOIN syn s ON s.code = p.ncit_code
         |  WHERE s.term IS NOT NULL)
         |SELECT input, synonym FROM (
         |  SELECT * FROM bycode UNION ALL SELECT * FROM bypv)
         |ORDER BY input, synonym""".stripMargin,

    "kg_rerank_oc" -> {
      val candVals = rerankCandidates.map { case (q, c, sc) =>
        val code = if (c == null) "NULL" else s"'$c'"
        s"('$q', $code, ${dblSql(sc)})"
      }.mkString(", ")
      val qvec = vecSql(graft.fixtures.Fixtures.embed("tumor stage"))
      s"""WITH oc(cde_code, oc_term, oc_vec) AS (
         |  SELECT * FROM (VALUES $cdeOcSqlValues) v(cde_code, oc_term, oc_vec)),
         | qv(qvec) AS (SELECT $qvec),
         | cand(query_id, cde_code, score) AS (
         |  SELECT * FROM (VALUES $candVals) v(query_id, cde_code, score)),
         | j AS (
         |  SELECT c.query_id, c.cde_code, c.score,
         |   CASE WHEN o.oc_vec IS NULL THEN 0.0
         |    ELSE ${duckCosine("qv.qvec", "o.oc_vec")} END AS oc_score
         |  FROM cand c CROSS JOIN qv LEFT JOIN oc o ON c.cde_code = o.cde_code)
         |SELECT query_id, cde_code,
         | ${floorRound("score", "1e6")} AS score,
         | ${floorRound("oc_score", "1e6")} AS oc_score,
         | ${floorRound(
              "CASE WHEN cde_code IS NULL OR cde_code = '' THEN score " +
              "ELSE 0.7 * score + 0.3 * oc_score END", "1e6")} AS combined_score
         |FROM j
         |ORDER BY combined_score DESC, cde_code ASC NULLS FIRST""".stripMargin
    },

    // DuckDB twin of the graph-materialization round-trip: rebuild the
    // canonical map (recursive-CTE CC over the same shares-a-surface
    // star edges Canonicalizer derives), then emit the identical
    // (kind, a, b, c) relation over ALL 7 vertex labels and ALL edge
    // kinds (derived MAPS_TO/SAME_AS + base HAS_* + HAS_SYNONYM).
    "kg_graph_materialize" ->
      s"""WITH RECURSIVE surf(norm, code, ty) AS (SELECT * FROM (VALUES
         |  $surfaceSqlValues) v(norm, code, ty)),
         | ncit(code, term) AS (SELECT * FROM (VALUES $ncitVertexSqlValues) v(code, term)),
         | pv(pv_code, pv_term, ncit_code) AS (
         |   SELECT * FROM (VALUES $pvEdgeSqlValues) v(pv_code, pv_term, ncit_code)),
         | cde(cde_code, cde_term, vdm_code) AS (
         |   SELECT * FROM (VALUES $cdeVdmSqlValues) v(cde_code, cde_term, vdm_code)),
         | vdmpv(vdm_code, pv_code) AS (SELECT * FROM (VALUES $vdmPvSqlValues) v(vdm_code, pv_code)),
         | decoc(cde_code, dec_code, oc_code, oc_term) AS (
         |   SELECT * FROM (VALUES $decOcSqlValues) v(cde_code, dec_code, oc_code, oc_term)),
         | decpr(dec_code, pr_code, pr_term, ncit_code) AS (
         |   SELECT * FROM (VALUES $decPrSqlValues) v(dec_code, pr_code, pr_term, ncit_code)),
         | ocg(oc_code, ncit_code) AS (SELECT * FROM (VALUES $ocGroundSqlValues) v(oc_code, ncit_code)),
         | st(st_code, st_term) AS (SELECT * FROM (VALUES $stSqlValues) v(st_code, st_term)),
         | ncitst(ncit_code, st_code) AS (SELECT * FROM (VALUES $ncitStSqlValues) v(ncit_code, st_code)),
         | ncitv(code, vec) AS (SELECT code, vec FROM (VALUES
         |  $ncitVecSqlValues) v(code, term, vec)),
         | syn(code, term) AS (SELECT * FROM (VALUES $synonymSqlValues) v(code, term)),
         | link_surf AS (SELECT DISTINCT norm, code FROM surf WHERE ty <> 'CDE'),
         | star AS (
         |   SELECT m.src, s.code AS dst
         |   FROM link_surf s
         |   JOIN (SELECT norm, min(code) AS src FROM link_surf GROUP BY norm) m USING (norm)
         |   WHERE s.code <> m.src),
         | und AS (SELECT src AS a, dst AS b FROM star UNION SELECT dst, src FROM star),
         | reach(n, m) AS (
         |   SELECT a, b FROM und
         |   UNION
         |   SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a WHERE u.b <> r.n),
         | comp AS (SELECT n AS code, least(n, min(m)) AS component FROM reach GROUP BY n),
         | allcodes(code, label, term) AS (
         |   SELECT code, 'NCIT', term FROM ncit
         |   UNION ALL SELECT pv_code, 'PV', pv_term FROM pv
         |   UNION ALL SELECT cde_code, 'CDE', cde_term FROM cde
         |   UNION ALL SELECT DISTINCT vdm_code, 'VDM', 'value domain ' || vdm_code FROM cde
         |   UNION ALL SELECT DISTINCT dec_code, 'DEC', 'data element concept ' || dec_code FROM decoc
         |   UNION ALL SELECT DISTINCT oc_code, 'OC', oc_term FROM decoc
         |   UNION ALL SELECT DISTINCT pr_code, 'PR', pr_term FROM decpr
         |   UNION ALL SELECT st_code, 'SemanticType', st_term FROM st
         |   UNION ALL SELECT DISTINCT term, 'SYN', term FROM syn),
         | canon AS (
         |   SELECT a.code, a.label, a.term, coalesce(c.component, a.code) AS canonical
         |   FROM allcodes a LEFT JOIN comp c USING (code)),
         | verts AS (
         |   SELECT 'vertex:' || label AS kind, code AS a, term AS b, canonical AS c
         |   FROM canon),
         | maps_to AS (
         |   SELECT DISTINCT 'edge:MAPS_TO' AS kind, p.ncit_code AS a,
         |     c.cde_code AS b, CAST(NULL AS VARCHAR) AS c
         |   FROM cde c
         |   JOIN vdmpv vp ON c.vdm_code = vp.vdm_code
         |   JOIN pv p ON vp.pv_code = p.pv_code),
         | same_as AS (
         |   SELECT 'edge:SAME_AS' AS kind, code AS a, canonical AS b,
         |     CAST(NULL AS VARCHAR) AS c
         |   FROM canon WHERE code <> canonical),
         | base_edges AS (
         |   SELECT DISTINCT 'edge:HAS_CONCEPT' AS kind, pv_code AS a,
         |     ncit_code AS b, CAST(NULL AS VARCHAR) AS c FROM pv
         |   UNION ALL SELECT DISTINCT 'edge:HAS_CONCEPT', oc_code, ncit_code, NULL FROM ocg
         |   UNION ALL SELECT DISTINCT 'edge:HAS_CONCEPT', pr_code, ncit_code, NULL FROM decpr
         |   UNION ALL SELECT DISTINCT 'edge:HAS_VDM', cde_code, vdm_code, NULL FROM cde
         |   UNION ALL SELECT DISTINCT 'edge:HAS_PV', vdm_code, pv_code, NULL FROM vdmpv
         |   UNION ALL SELECT DISTINCT 'edge:HAS_DEC', cde_code, dec_code, NULL FROM decoc
         |   UNION ALL SELECT DISTINCT 'edge:HAS_OC', dec_code, oc_code, NULL FROM decoc
         |   UNION ALL SELECT DISTINCT 'edge:HAS_PR', dec_code, pr_code, NULL FROM decpr
         |   UNION ALL SELECT DISTINCT 'edge:HAS_SEMANTIC_TYPE', ncit_code, st_code, NULL FROM ncitst),
         | simranked AS (
         |   SELECT a.code AS sa, b.code AS sb,
         |     row_number() OVER (PARTITION BY a.code
         |       ORDER BY ${duckCosine0("a.vec", "b.vec")} DESC, b.code) AS r
         |   FROM ncitv a JOIN ncitv b ON a.code <> b.code),
         | sim_edges AS (
         |   SELECT 'edge:SIMILAR' AS kind, sa AS a, sb AS b,
         |     CAST(NULL AS VARCHAR) AS c FROM simranked WHERE r <= 2),
         | has_syn AS (
         |   SELECT DISTINCT 'edge:HAS_SYNONYM' AS kind, code AS a, term AS b,
         |     CAST(NULL AS VARCHAR) AS c FROM syn)
         |SELECT kind, a, b, c FROM (
         |  SELECT * FROM verts UNION ALL SELECT * FROM maps_to
         |  UNION ALL SELECT * FROM same_as
         |  UNION ALL SELECT * FROM base_edges
         |  UNION ALL SELECT * FROM sim_edges
         |  UNION ALL SELECT * FROM has_syn)
         |ORDER BY kind, a, b""".stripMargin,

    // DuckDB twin of the 4-step MERGE upsert: every fresh count is
    // recomputed as set algebra (fresh = |delta \ table-so-far| via
    // EXCEPT) over the same fixture VALUES, so idempotent-replay
    // (fresh=0) and partial-overlap semantics are oracle-checked, not
    // just asserted
    "kg_graph_merge" ->
      s"""WITH RECURSIVE surf(norm, code, ty) AS (SELECT * FROM (VALUES
         |  $surfaceSqlValues) v(norm, code, ty)),
         | ncit(code, term) AS (SELECT * FROM (VALUES $ncitVertexSqlValues) v(code, term)),
         | pv(pv_code, pv_term, ncit_code) AS (
         |   SELECT * FROM (VALUES $pvEdgeSqlValues) v(pv_code, pv_term, ncit_code)),
         | cde(cde_code, cde_term, vdm_code) AS (
         |   SELECT * FROM (VALUES $cdeVdmSqlValues) v(cde_code, cde_term, vdm_code)),
         | vdmpv(vdm_code, pv_code) AS (SELECT * FROM (VALUES $vdmPvSqlValues) v(vdm_code, pv_code)),
         | decoc(cde_code, dec_code, oc_code, oc_term) AS (
         |   SELECT * FROM (VALUES $decOcSqlValues) v(cde_code, dec_code, oc_code, oc_term)),
         | decpr(dec_code, pr_code, pr_term, ncit_code) AS (
         |   SELECT * FROM (VALUES $decPrSqlValues) v(dec_code, pr_code, pr_term, ncit_code)),
         | ocg(oc_code, ncit_code) AS (SELECT * FROM (VALUES $ocGroundSqlValues) v(oc_code, ncit_code)),
         | st(st_code, st_term) AS (SELECT * FROM (VALUES $stSqlValues) v(st_code, st_term)),
         | ncitst(ncit_code, st_code) AS (SELECT * FROM (VALUES $ncitStSqlValues) v(ncit_code, st_code)),
         | ncitv(code, vec) AS (SELECT code, vec FROM (VALUES
         |  $ncitVecSqlValues) v(code, term, vec)),
         | syn(code, term) AS (SELECT * FROM (VALUES $synonymSqlValues) v(code, term)),
         | link_surf AS (SELECT DISTINCT norm, code FROM surf WHERE ty <> 'CDE'),
         | star AS (
         |   SELECT m.src, s.code AS dst
         |   FROM link_surf s
         |   JOIN (SELECT norm, min(code) AS src FROM link_surf GROUP BY norm) m USING (norm)
         |   WHERE s.code <> m.src),
         | und AS (SELECT src AS a, dst AS b FROM star UNION SELECT dst, src FROM star),
         | reach(n, m) AS (
         |   SELECT a, b FROM und
         |   UNION
         |   SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a WHERE u.b <> r.n),
         | comp AS (SELECT n AS code, least(n, min(m)) AS component FROM reach GROUP BY n),
         | allcodes(code, label, term) AS (
         |   SELECT code, 'NCIT', term FROM ncit
         |   UNION ALL SELECT pv_code, 'PV', pv_term FROM pv
         |   UNION ALL SELECT cde_code, 'CDE', cde_term FROM cde
         |   UNION ALL SELECT DISTINCT vdm_code, 'VDM', 'value domain ' || vdm_code FROM cde
         |   UNION ALL SELECT DISTINCT dec_code, 'DEC', 'data element concept ' || dec_code FROM decoc
         |   UNION ALL SELECT DISTINCT oc_code, 'OC', oc_term FROM decoc
         |   UNION ALL SELECT DISTINCT pr_code, 'PR', pr_term FROM decpr
         |   UNION ALL SELECT st_code, 'SemanticType', st_term FROM st
         |   UNION ALL SELECT DISTINCT term, 'SYN', term FROM syn),
         | canon AS (
         |   SELECT a.code, coalesce(c.component, a.code) AS canonical
         |   FROM allcodes a LEFT JOIN comp c USING (code)),
         | e_base(pred, a, b) AS (
         |   SELECT DISTINCT 'HAS_SYNONYM', code, term FROM syn
         |   UNION SELECT 'HAS_CONCEPT', pv_code, ncit_code FROM pv
         |   UNION SELECT 'HAS_CONCEPT', oc_code, ncit_code FROM ocg
         |   UNION SELECT 'HAS_CONCEPT', pr_code, ncit_code FROM decpr
         |   UNION SELECT 'HAS_VDM', cde_code, vdm_code FROM cde
         |   UNION SELECT 'HAS_PV', vdm_code, pv_code FROM vdmpv
         |   UNION SELECT 'HAS_DEC', cde_code, dec_code FROM decoc
         |   UNION SELECT 'HAS_OC', dec_code, oc_code FROM decoc
         |   UNION SELECT 'HAS_PR', dec_code, pr_code FROM decpr
         |   UNION SELECT 'HAS_SEMANTIC_TYPE', ncit_code, st_code FROM ncitst),
         | e_derived(pred, a, b) AS (
         |   SELECT DISTINCT 'MAPS_TO', p.ncit_code, c.cde_code
         |   FROM cde c
         |   JOIN vdmpv vp ON c.vdm_code = vp.vdm_code
         |   JOIN pv p ON vp.pv_code = p.pv_code
         |   UNION SELECT 'SAME_AS', code, canonical FROM (SELECT DISTINCT code, canonical FROM canon) WHERE code <> canonical),
         | simranked AS (
         |   SELECT a.code AS sa, b.code AS sb,
         |     row_number() OVER (PARTITION BY a.code
         |       ORDER BY ${duckCosine0("a.vec", "b.vec")} DESC, b.code) AS r
         |   FROM ncitv a JOIN ncitv b ON a.code <> b.code),
         | e_overlap(pred, a, b) AS (
         |   SELECT DISTINCT 'HAS_SYNONYM', code, term FROM syn
         |   UNION SELECT 'SIMILAR', sa, sb FROM simranked WHERE r <= 2),
         | t2(pred, a, b) AS (
         |   SELECT DISTINCT * FROM (SELECT * FROM e_base UNION ALL SELECT * FROM e_derived)),
         | t4(pred, a, b) AS (
         |   SELECT DISTINCT * FROM (SELECT * FROM t2 UNION ALL SELECT * FROM e_overlap)),
         | rdelta(code, label) AS (SELECT * FROM (VALUES
         |   ('C2991', 'NCIT'), ('Z9999', 'NCIT')) v(code, label)),
         | vfinal(label, code) AS (
         |   SELECT DISTINCT label, code FROM (
         |     SELECT label, code FROM allcodes
         |     UNION ALL SELECT label, code FROM rdelta))
         |SELECT kind, n FROM (
         |  SELECT 'merge1_base_fresh' AS kind, count(*) AS n FROM e_base
         |  UNION ALL SELECT 'merge2_derived_fresh', count(*) FROM
         |    (SELECT * FROM e_derived EXCEPT SELECT * FROM e_base)
         |  UNION ALL SELECT 'merge3_replay_fresh', count(*) FROM
         |    (SELECT * FROM e_derived EXCEPT SELECT * FROM t2)
         |  UNION ALL SELECT 'merge4_overlap_fresh', count(*) FROM
         |    (SELECT * FROM e_overlap EXCEPT SELECT * FROM t2)
         |  UNION ALL SELECT 'vmerge1_fresh', count(*) FROM
         |    (SELECT DISTINCT label, code FROM allcodes)
         |  UNION ALL SELECT 'vmerge2_replay_fresh', CAST(0 AS BIGINT)
         |  UNION ALL SELECT 'vrefresh_updated', count(*) FROM rdelta d
         |    WHERE EXISTS (SELECT 1 FROM allcodes a
         |                  WHERE a.label = d.label AND a.code = d.code)
         |  UNION ALL SELECT 'vrefresh_inserted', count(*) FROM rdelta d
         |    WHERE NOT EXISTS (SELECT 1 FROM allcodes a
         |                      WHERE a.label = d.label AND a.code = d.code)
         |  UNION ALL SELECT 'edges:' || pred, count(*) FROM t4 GROUP BY pred
         |  UNION ALL SELECT 'vertices:' || label, count(*) FROM vfinal GROUP BY label)
         |ORDER BY kind""".stripMargin,

    // DuckDB twin of Triples.similarEdges: full double-cosine all-pairs
    // with row_number top-2 per source, ties by code
    "kg_similar_ncit" ->
      s"""WITH ncitv(code, vec) AS (SELECT code, vec FROM (VALUES
         |  $ncitVecSqlValues) v(code, term, vec)),
         | scored AS (
         |  SELECT a.code AS subj, b.code AS obj,
         |    ${duckCosine0("a.vec", "b.vec")} AS cos
         |  FROM ncitv a JOIN ncitv b ON a.code <> b.code),
         | ranked AS (
         |  SELECT subj, obj, cos,
         |   row_number() OVER (PARTITION BY subj ORDER BY cos DESC, obj) AS r
         |  FROM scored)
         |SELECT subj, obj, ${floorRound("cos", "1e6")} AS score
         |FROM ranked WHERE r <= 2
         |ORDER BY subj, cos DESC, obj""".stripMargin,

    "kg_semantic_definition" ->
      s"""WITH defs(node_type, code, term, vec) AS (SELECT * FROM (VALUES
         |  $defRowsSqlValues) v(node_type, code, term, vec)),
         | q(query_id, qvec) AS (SELECT * FROM (VALUES
         |  $semanticDefQuerySqlValues) v(query_id, qvec)),
         | scored AS (
         |  SELECT query_id, node_type, code, term,
         |   ${duckCosine0("qvec", "vec")} AS cos
         |  FROM q CROSS JOIN defs),
         | ranked AS (
         |  SELECT query_id, node_type, code, term, cos,
         |   row_number() OVER (PARTITION BY query_id, node_type
         |     ORDER BY cos DESC, code) AS rank
         |  FROM scored)
         |SELECT query_id, node_type, rank, code, term,
         | ${floorRound("cos", "1e6")} AS score
         |FROM ranked WHERE rank <= 3
         |ORDER BY query_id, node_type, rank""".stripMargin,

    // DuckDB twin of SemanticNcitSearch: same KNN (double cosine, ties
    // by code), same inner PV fan-out, same per-PV sorted CDE collect
    // (string_agg ORDER BY == Spark array_sort(collect_list)); a PV
    // with no chain coalesces to '' exactly like the Spark side.
    "kg_semantic_ncit_search" ->
      s"""WITH ncitv(code, term, vec) AS (SELECT * FROM (VALUES
         |  $ncitVecSqlValues) v(code, term, vec)),
         | q(query_id, qvec) AS (SELECT * FROM (VALUES
         |  $ncitSearchQuerySqlValues) v(query_id, qvec)),
         | pv(pv_code, pv_term, ncit_code) AS (
         |   SELECT * FROM (VALUES $pvEdgeSqlValues) v(pv_code, pv_term, ncit_code)),
         | cde(cde_code, cde_term, vdm_code) AS (
         |   SELECT * FROM (VALUES $cdeVdmSqlValues) v(cde_code, cde_term, vdm_code)),
         | vdmpv(vdm_code, pv_code) AS (SELECT * FROM (VALUES $vdmPvSqlValues) v(vdm_code, pv_code)),
         | scored AS (
         |  SELECT query_id, code, term, ${duckCosine0("qvec", "vec")} AS cos
         |  FROM q CROSS JOIN ncitv),
         | ranked AS (
         |  SELECT query_id, code, term, cos,
         |   row_number() OVER (PARTITION BY query_id
         |     ORDER BY cos DESC, code) AS rank
         |  FROM scored),
         | hits AS (SELECT * FROM ranked WHERE rank <= 5),
         | pvcdes AS (
         |  SELECT vp.pv_code, string_agg(c.cde_code, ',' ORDER BY c.cde_code) AS of_cdes
         |  FROM vdmpv vp JOIN cde c ON c.vdm_code = vp.vdm_code
         |  GROUP BY vp.pv_code)
         |SELECT h.query_id, h.rank, h.code AS concept_code,
         | h.term AS concept_term, p.pv_code, p.pv_term,
         | ${floorRound("h.cos", "1e6")} AS score,
         | coalesce(pc.of_cdes, '') AS of_cdes
         |FROM hits h
         |JOIN pv p ON p.ncit_code = h.code
         |LEFT JOIN pvcdes pc USING (pv_code)
         |ORDER BY h.query_id, h.rank, p.pv_code""".stripMargin,

    // DuckDB twin of SemanticPvSearch: same KNN (double cosine, ties
    // by code), same INNER 3-hop fan-out to CDE. Fixture CDE
    // definitions equal their terms (Fixtures.dict), hence
    // cde_term AS cde_defn.
    "kg_semantic_pv_search" ->
      s"""WITH pvv(code, term, vec) AS (SELECT * FROM (VALUES
         |  $pvVecSqlValues) v(code, term, vec)),
         | q(query_id, qvec) AS (SELECT * FROM (VALUES
         |  $pvSearchQuerySqlValues) v(query_id, qvec)),
         | cde(cde_code, cde_term, vdm_code) AS (
         |   SELECT * FROM (VALUES $cdeVdmSqlValues) v(cde_code, cde_term, vdm_code)),
         | vdmpv(vdm_code, pv_code) AS (SELECT * FROM (VALUES $vdmPvSqlValues) v(vdm_code, pv_code)),
         | scored AS (
         |  SELECT query_id, code, term, ${duckCosine0("qvec", "vec")} AS cos
         |  FROM q CROSS JOIN pvv),
         | ranked AS (
         |  SELECT query_id, code, term, cos,
         |   row_number() OVER (PARTITION BY query_id
         |     ORDER BY cos DESC, code) AS rank
         |  FROM scored),
         | hits AS (SELECT * FROM ranked WHERE rank <= 5)
         |SELECT h.query_id, h.rank, h.code AS pv_code, h.term AS pv_term,
         | c.cde_code, c.cde_term, c.cde_term AS cde_defn,
         | ${floorRound("h.cos", "1e6")} AS score
         |FROM hits h
         |JOIN vdmpv vp ON vp.pv_code = h.code
         |JOIN cde c ON c.vdm_code = vp.vdm_code
         |ORDER BY h.query_id, h.rank, c.cde_code""".stripMargin,

    "kg_term_search_typed" -> {
      val qVals = termSearchQueries.map { case (id, t) => s"('$id','${sqlQuote(t)}')" }
        .mkString(", ")
      s"""WITH surf(norm, code, ctype) AS (SELECT * FROM (VALUES
         |  $surfaceSqlValues) v(norm, code, ctype)),
         | stok AS (
         |  SELECT DISTINCT norm, code, ctype, unnest(string_split(norm, ' ')) AS token
         |  FROM surf),
         | idf AS (
         |  SELECT token,
         |   floor(ln(1 + CAST($fixtureNSurf AS DOUBLE) / count(*)) * 1048576 + 0.5)
         |     / 1048576 AS idf
         |  FROM (SELECT DISTINCT norm, token FROM stok) dt GROUP BY token),
         | q(query_id, qnorm) AS (SELECT * FROM (VALUES $qVals) v(query_id, qnorm)),
         | qtok AS (
         |  SELECT query_id, unnest(list_distinct(string_split(qnorm, ' '))) AS token
         |  FROM q),
         | qw AS (
         |  SELECT query_id, sum(coalesce(i.idf, ${dblSql(fixtureMaxIdf)})) AS q_w
         |  FROM qtok LEFT JOIN idf i USING (token) GROUP BY query_id),
         | branch AS (
         |  SELECT 'CDE' AS type_filter, s.norm, s.code, s.token, i.idf
         |  FROM stok s JOIN idf i USING (token) WHERE s.ctype = 'CDE'
         |  UNION ALL
         |  SELECT DISTINCT 'ANY' AS type_filter, s.norm, s.code, s.token, i.idf
         |  FROM stok s JOIN idf i USING (token)),
         | surfw AS (
         |  SELECT type_filter, norm, code, sum(idf) AS surf_w
         |  FROM branch GROUP BY type_filter, norm, code),
         | ov AS (
         |  SELECT qt.query_id, b.type_filter, b.code, b.norm, sum(b.idf) AS ov_w
         |  FROM qtok qt JOIN branch b USING (token)
         |  GROUP BY qt.query_id, b.type_filter, b.code, b.norm),
         | scored AS (
         |  SELECT o.query_id, o.type_filter, o.code, o.norm AS surf_norm,
         |   o.ov_w / (w.q_w + s.surf_w - o.ov_w) AS score
         |  FROM ov o
         |  JOIN qw w USING (query_id)
         |  JOIN surfw s ON s.type_filter = o.type_filter
         |   AND s.code = o.code AND s.norm = o.norm),
         | best AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id, type_filter, code
         |    ORDER BY score DESC, surf_norm) AS rs FROM scored),
         | ranked AS (
         |  SELECT query_id, type_filter, code, surf_norm, score,
         |   row_number() OVER (PARTITION BY query_id, type_filter
         |     ORDER BY score DESC, code) AS rank
         |  FROM best WHERE rs = 1)
         |SELECT query_id, type_filter, rank, code, surf_norm,
         | ${floorRound("score", "1e6")} AS score
         |FROM ranked WHERE rank <= 3
         |ORDER BY query_id, type_filter, rank""".stripMargin
    },

    // full quantized-BM25 replay: dyadic idf at 2^-20, per-(surface,
    // token) contribution with k1=1.25 / b=0.75 saturation+lennorm,
    // query self-score (unseen tokens at the df=0 idf), one IEEE
    // division — identical operation order to MatchLadder.bm25TopK /
    // PreparedDict.bm25Tokens
    "kg_term_search_bm25" -> {
      val qVals = bm25SearchQueries.map { case (id, t) => s"('$id','${sqlQuote(t)}')" }
        .mkString(", ")
      val bm25Contrib = (idf: String, tf: String, dl: String) =>
        s"""floor($idf * ((CAST($tf AS DOUBLE) * 2.25) / (CAST($tf AS DOUBLE)
           |     + 1.25 * (0.25 + 0.75 * (CAST($dl * $fixtureNSurf AS DOUBLE)
           |                              / ${dblSql(fixtureTotalTok.toDouble)}))))
           |   * 1048576 + 0.5) / 1048576""".stripMargin
      s"""WITH surf(norm, code, ctype) AS (SELECT * FROM (VALUES
         |  $surfaceSqlValues) v(norm, code, ctype)),
         | dn AS (SELECT DISTINCT norm FROM surf),
         | stok AS (
         |  SELECT norm, dl, token, count(*) AS tf FROM (
         |   SELECT norm, len(string_split(norm, ' ')) AS dl,
         |          unnest(string_split(norm, ' ')) AS token
         |   FROM dn) GROUP BY norm, dl, token),
         | idf AS (
         |  SELECT token,
         |   floor(ln(1.0 + (CAST($fixtureNSurf AS DOUBLE) - df + 0.5) / (df + 0.5))
         |     * 1048576 + 0.5) / 1048576 AS idf
         |  FROM (SELECT token, count(*) AS df
         |        FROM (SELECT DISTINCT norm, token FROM stok) GROUP BY token)),
         | contrib AS (
         |  SELECT s.norm, s.token,
         |   ${bm25Contrib("i.idf", "s.tf", "s.dl")} AS contrib
         |  FROM stok s JOIN idf i USING (token)),
         | q(query_id, qnorm) AS (SELECT * FROM (VALUES $qVals) v(query_id, qnorm)),
         | qtok AS (
         |  SELECT query_id, dl_q, token, count(*) AS tf_q FROM (
         |   SELECT query_id, len(string_split(qnorm, ' ')) AS dl_q,
         |          unnest(string_split(qnorm, ' ')) AS token
         |   FROM q) GROUP BY query_id, dl_q, token),
         | qself AS (
         |  SELECT query_id, sum(cq) AS q_self FROM (
         |   SELECT query_id,
         |    ${bm25Contrib(s"coalesce(i.idf, ${dblSql(fixtureBm25MaxIdf)})", "qt.tf_q", "qt.dl_q")} AS cq
         |   FROM qtok qt LEFT JOIN idf i USING (token)) GROUP BY query_id),
         | branch AS (
         |  SELECT 'CDE' AS type_filter, s.norm, s.code, c.token, c.contrib
         |  FROM surf s JOIN contrib c ON c.norm = s.norm WHERE s.ctype = 'CDE'
         |  UNION ALL
         |  SELECT DISTINCT 'ANY' AS type_filter, s.norm, s.code, c.token, c.contrib
         |  FROM surf s JOIN contrib c ON c.norm = s.norm),
         | ov AS (
         |  SELECT qt.query_id, b.type_filter, b.code, b.norm, sum(b.contrib) AS raw
         |  FROM (SELECT DISTINCT query_id, token FROM qtok) qt
         |  JOIN branch b USING (token)
         |  GROUP BY qt.query_id, b.type_filter, b.code, b.norm),
         | scored AS (
         |  SELECT o.query_id, o.type_filter, o.code, o.norm AS surf_norm,
         |   o.raw / s.q_self AS score
         |  FROM ov o JOIN qself s USING (query_id)),
         | best AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id, type_filter, code
         |    ORDER BY score DESC, surf_norm) AS rs FROM scored),
         | ranked AS (
         |  SELECT query_id, type_filter, code, surf_norm, score,
         |   row_number() OVER (PARTITION BY query_id, type_filter
         |     ORDER BY score DESC, code) AS rank
         |  FROM best WHERE rs = 1)
         |SELECT query_id, type_filter, rank, code, surf_norm,
         | ${floorRound("score", "1e6")} AS score
         |FROM ranked WHERE rank <= 3
         |ORDER BY query_id, type_filter, rank""".stripMargin
    },

    "text_quality" -> {
      val stopList = graft.ops.TextAnalysis.stopwords.values.flatten.toSeq.distinct
        .map(s => s"'$s'").mkString("[", ", ", "]")
      s"""WITH f AS (
         | SELECT doc_id, text,
         |  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks,
         |  length(text) AS n_chars
         | FROM documents),
         | g AS (
         | SELECT doc_id, text, toks, n_chars, len(toks) AS n_words,
         |  CAST(len(list_filter(toks, t -> list_contains($stopList, t))) AS DOUBLE)
         |    / greatest(len(toks), 1) AS stop_ratio,
         |  CAST(n_chars - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
         |    / greatest(n_chars, 1) AS punct_ratio,
         |  CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS distinct_ratio,
         |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |    / greatest(len(toks), 1) AS mean_word_len
         | FROM f)
         |SELECT doc_id, n_words,
         | ${floorRound("stop_ratio", "1e4")} AS stopword_ratio,
         | ${floorRound("punct_ratio", "1e4")} AS punct_ratio,
         | ${floorRound("distinct_ratio", "1e4")} AS distinct_ratio,
         | ${floorRound("mean_word_len", "1e4")} AS mean_word_len,
         | ${floorRound(
            "least(1.0, CAST(n_words AS DOUBLE) / 50) * (1.0 - punct_ratio) * distinct_ratio",
            "1e4")} AS quality_score
         |FROM g ORDER BY doc_id""".stripMargin
    },

    // the JVM rolling hash (h = 31*h + charCode, 64-bit wraparound)
    // recomputed in DuckDB via a HUGEINT mod-2^64 list fold over
    // codepoints (all document text is ASCII, so UTF-16 units ==
    // codepoints) — bit-exact vs graft.functions.Hashing.rollingFingerprint
    "text_fingerprint" ->
      """SELECT doc_id, CAST(
        | CASE WHEN r >= 9223372036854775808::HUGEINT
        |  THEN r - 18446744073709551616::HUGEINT ELSE r END AS BIGINT) AS fp
        |FROM (
        | SELECT doc_id,
        |  list_reduce(
        |    list_concat([1125899906842597::HUGEINT],
        |      [CAST(unicode(text[i+1:i+1]) AS HUGEINT) for i in range(length(text))]),
        |    (h, c) -> (31 * h + c) % 18446744073709551616::HUGEINT) AS r
        | FROM documents) ORDER BY doc_id""".stripMargin,

    // deterministic regression pin for the FLAGSHIP pipeline: the
    // fixture corpus is seed-fixed, so per-predicate triple counts at
    // sf0.01 (200 convs x 8 turns + hot skew) are constants; any
    // semantic drift in mention detection, the ladder, canonicalization
    // or triple emission breaks this hash
    "kg_pipeline_full" ->
      """SELECT pred, CAST(n AS BIGINT) AS n FROM (VALUES
        |  ('HAS_CONCEPT', 25), ('HAS_DEC', 7), ('HAS_OC', 7),
        |  ('HAS_PR', 7), ('HAS_PV', 17), ('HAS_SEMANTIC_TYPE', 50),
        |  ('HAS_SYNONYM', 76), ('HAS_VDM', 8), ('LINKED_TO', 2150),
        |  ('MAPS_TO', 14), ('SAME_AS', 9)) v(pred, n)
        |ORDER BY pred""".stripMargin,

    // deterministic regression pin: IVF is seeded by fixed id hashes,
    // so its recall vs exact brute force is a constant of the sf0.01
    // dataset — values measured once and pinned; any code change that
    // shifts recall breaks the hash match (see OpsSpec for the
    // threshold assertion on synthetic clusters). Values re-pinned
    // when centroid seeding moved from xxhash64 to engine-portable
    // hash64 (which made ann_ivf_topk itself fully oracle-checkable).
    "ann_ivf_recall" ->
      s"""SELECT config, CAST(n_queries AS BIGINT) AS n_queries,
         | CAST(recall AS DOUBLE) AS recall_at_3
         |FROM (VALUES
         |  ('a_base_p4x1',  500, '0.4807'),
         |  ('b_dup_p4x2',   500, '0.7067'),
         |  ('c_highrecall_p8x3', 500, '0.9853')
         | ) v(config, n_queries, recall)
         |ORDER BY config""".stripMargin,

    // ==== sketch / ANN / multimodal oracles (generated, bit-exact):
    // graft's FNV-1a+splitmix64 hashing recomputed in DuckDB HUGEINT
    // arithmetic; each oracle runs the NAIVE all-pairs / exhaustive
    // algorithm against the Spark side's banded/blocked/inverted-list
    // distributed plan. See tools/gen_sketch_oracles.py. ====
    "dedup_simhash" -> SketchOracles.dedup_simhash,
    "dedup_minhash_lsh" -> SketchOracles.dedup_minhash_lsh,
    "dedup_lsh_verified" -> SketchOracles.dedup_lsh_verified,
    "ann_lsh_topk" -> SketchOracles.ann_lsh_topk,
    "ann_ivf_topk" -> SketchOracles.ann_ivf_topk,
    "mm_decode" -> SketchOracles.mm_decode,
    "mm_frame_sample" -> SketchOracles.mm_frame_sample,
    "sketch_kmv_distinct" -> SketchOracles.sketch_kmv_distinct,
    "sketch_hll_distinct" -> SketchOracles.sketch_hll_distinct,
    "sketch_countmin_freq" -> SketchOracles.sketch_countmin_freq,
    "text_dup_ngrams_cms" -> SketchOracles.text_dup_ngrams_cms,
    "decontam_bloom" -> SketchOracles.decontam_bloom,

    // ROLLUP levels via GROUPING bitmask (same bit order as Spark's
    // grouping_id over the listed columns)
    "agg_rollup" ->
      """WITH ev AS (SELECT event_type, user_id % 10 AS user_bucket,
        |  CAST(floor(value * 100) AS BIGINT) AS v2 FROM events)
        |SELECT event_type, user_bucket, count(*) AS n,
        |  CAST(sum(v2) AS BIGINT) AS sum_v2,
        |  GROUPING(event_type) * 2 + GROUPING(user_bucket) AS lvl
        |FROM ev GROUP BY ROLLUP(event_type, user_bucket)
        |ORDER BY lvl, event_type NULLS FIRST, user_bucket NULLS FIRST""".stripMargin,

    "agg_pivot" ->
      """SELECT lang,
        |  CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS src0,
        |  CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS src1,
        |  CAST(sum(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT) AS src2,
        |  CAST(sum(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS BIGINT) AS src3,
        |  CAST(sum(CASE WHEN source = 'src4' THEN 1 ELSE 0 END) AS BIGINT) AS src4
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // identical bucket-uniform draw over the fixture base-edge graph:
    // hash64 recomputed in HUGEINT (via the generated hash64_expr
    // snippet), ranks ordered by the SIGNED hash to match the JVM
    "kg_negative_sample" -> {
      def h64(e: String) = SketchOracles.hash64_expr.replace("__EXPR__", e)
      s"""WITH pv(pv_code, pv_term, ncit_code) AS (
         |   SELECT * FROM (VALUES $pvEdgeSqlValues) v(pv_code, pv_term, ncit_code)),
         | cde(cde_code, cde_term, vdm_code) AS (
         |   SELECT * FROM (VALUES $cdeVdmSqlValues) v(cde_code, cde_term, vdm_code)),
         | vdmpv(vdm_code, pv_code) AS (SELECT * FROM (VALUES $vdmPvSqlValues) v(vdm_code, pv_code)),
         | decoc(cde_code, dec_code, oc_code, oc_term) AS (
         |   SELECT * FROM (VALUES $decOcSqlValues) v(cde_code, dec_code, oc_code, oc_term)),
         | decpr(dec_code, pr_code, pr_term, ncit_code) AS (
         |   SELECT * FROM (VALUES $decPrSqlValues) v(dec_code, pr_code, pr_term, ncit_code)),
         | ocg(oc_code, ncit_code) AS (SELECT * FROM (VALUES $ocGroundSqlValues) v(oc_code, ncit_code)),
         | ncitst(ncit_code, st_code) AS (SELECT * FROM (VALUES $ncitStSqlValues) v(ncit_code, st_code)),
         | ed AS (
         |   SELECT DISTINCT subj, pred, obj FROM (
         |     SELECT pv_code AS subj, 'HAS_CONCEPT' AS pred, ncit_code AS obj FROM pv
         |     UNION ALL SELECT oc_code, 'HAS_CONCEPT', ncit_code FROM ocg
         |     UNION ALL SELECT pr_code, 'HAS_CONCEPT', ncit_code FROM decpr
         |     UNION ALL SELECT cde_code, 'HAS_VDM', vdm_code FROM cde
         |     UNION ALL SELECT vdm_code, 'HAS_PV', pv_code FROM vdmpv
         |     UNION ALL SELECT cde_code, 'HAS_DEC', dec_code FROM decoc
         |     UNION ALL SELECT dec_code, 'HAS_OC', oc_code FROM decoc
         |     UNION ALL SELECT dec_code, 'HAS_PR', pr_code FROM decpr
         |     UNION ALL SELECT ncit_code, 'HAS_SEMANTIC_TYPE', st_code FROM ncitst)),
         | verts AS (SELECT DISTINCT v FROM
         |   (SELECT subj AS v FROM ed UNION ALL SELECT obj FROM ed)),
         | vh AS (SELECT v, ${h64("v")} AS vh FROM verts),
         | ranked AS (
         |   SELECT v, CAST(vh & 63::HUGEINT AS BIGINT) AS bucket,
         |     row_number() OVER (
         |       PARTITION BY CAST(vh & 63::HUGEINT AS BIGINT)
         |       ORDER BY (CASE WHEN vh >= 9223372036854775808::HUGEINT
         |         THEN vh - 18446744073709551616::HUGEINT ELSE vh END), v)
         |       - 1 AS rank
         |   FROM vh),
         | cnts AS (SELECT bucket, count(*) AS cnt FROM ranked GROUP BY bucket),
         | pstr AS (
         |   SELECT e.subj, e.pred, e.obj, s.slot,
         |     e.subj || chr(1) || e.pred || chr(1) || e.obj || chr(1)
         |       || CAST(s.slot AS VARCHAR) AS pk
         |   FROM ed e, range(2) s(slot)),
         | probes AS (
         |   SELECT subj, pred, obj, CAST(slot AS INT) AS slot,
         |     ${h64("pk")} AS h
         |   FROM pstr),
         | pb AS (SELECT subj, pred, obj, slot,
         |   CAST(h & 63::HUGEINT AS BIGINT) AS bucket, h FROM probes),
         | joined AS (
         |   SELECT p.subj, p.pred, p.obj, p.slot, r.v AS neg_obj
         |   FROM pb p JOIN cnts c USING (bucket)
         |   JOIN ranked r ON r.bucket = p.bucket
         |     AND r.rank = CAST((p.h >> 6) % c.cnt::HUGEINT AS BIGINT))
         |SELECT subj, pred, obj, neg_obj, slot FROM joined j
         |WHERE neg_obj <> obj
         |  AND NOT EXISTS (SELECT 1 FROM ed t
         |    WHERE t.subj = j.subj AND t.pred = j.pred AND t.obj = j.neg_obj)
         |ORDER BY subj, pred, obj, slot""".stripMargin
    },

    // same max-abs/127 scheme, elementwise double math, HALF_UP floor
    "embed_quantize_int8" ->
      """WITH sc AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    list_aggregate(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0 AS scale
        |  FROM embeddings),
        | ex AS (
        |  SELECT id, scale,
        |    unnest([{'d': i, 'v': vec[i+1]} for i in range(len(vec))]) AS s
        |  FROM sc)
        |SELECT id, CAST(s.d AS INT) AS d,
        |  CASE WHEN scale = 0 THEN 0
        |       ELSE CAST(greatest(-127, least(127,
        |         floor(CAST(s.v AS DOUBLE) / scale + 0.5))) AS INT) END AS q,
        |  floor(scale * 1e6 + 0.5) / 1e6 AS scale6
        |FROM ex ORDER BY id, d""".stripMargin,

    // corpus-wide exact token frequencies, total (n DESC, token) order
    "text_top_terms" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text),
        |    '[^\p{L}\p{N}]+'), tk -> tk <> '')) AS token FROM documents)
        |SELECT token, count(*) AS n FROM t
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    // recursive-CTE min-hop BFS over the identical fixture edge union
    // (base structural edges + HAS_SYNONYM), symmetrized — the naive
    // twin of the frontier-limited iterative join
    "kg_khop_traverse" ->
      s"""WITH RECURSIVE
         | pv(pv_code, pv_term, ncit_code) AS (
         |   SELECT * FROM (VALUES $pvEdgeSqlValues) v(pv_code, pv_term, ncit_code)),
         | cde(cde_code, cde_term, vdm_code) AS (
         |   SELECT * FROM (VALUES $cdeVdmSqlValues) v(cde_code, cde_term, vdm_code)),
         | vdmpv(vdm_code, pv_code) AS (SELECT * FROM (VALUES $vdmPvSqlValues) v(vdm_code, pv_code)),
         | decoc(cde_code, dec_code, oc_code, oc_term) AS (
         |   SELECT * FROM (VALUES $decOcSqlValues) v(cde_code, dec_code, oc_code, oc_term)),
         | decpr(dec_code, pr_code, pr_term, ncit_code) AS (
         |   SELECT * FROM (VALUES $decPrSqlValues) v(dec_code, pr_code, pr_term, ncit_code)),
         | ocg(oc_code, ncit_code) AS (SELECT * FROM (VALUES $ocGroundSqlValues) v(oc_code, ncit_code)),
         | ncitst(ncit_code, st_code) AS (SELECT * FROM (VALUES $ncitStSqlValues) v(ncit_code, st_code)),
         | syn(code, term) AS (SELECT * FROM (VALUES $synonymSqlValues) v(code, term)),
         | ed AS (
         |   SELECT DISTINCT pv_code AS s, ncit_code AS o FROM pv
         |   UNION SELECT oc_code, ncit_code FROM ocg
         |   UNION SELECT pr_code, ncit_code FROM decpr
         |   UNION SELECT cde_code, vdm_code FROM cde
         |   UNION SELECT vdm_code, pv_code FROM vdmpv
         |   UNION SELECT cde_code, dec_code FROM decoc
         |   UNION SELECT dec_code, oc_code FROM decoc
         |   UNION SELECT dec_code, pr_code FROM decpr
         |   UNION SELECT ncit_code, st_code FROM ncitst
         |   UNION SELECT code, term FROM syn),
         | und AS (SELECT s AS a, o AS b FROM ed WHERE s <> o
         |         UNION SELECT o, s FROM ed WHERE s <> o),
         | reach(node, hop) AS (
         |   SELECT 'CDE2001', 0
         |   UNION ALL
         |   SELECT u.b, r.hop + 1 FROM reach r JOIN und u ON u.a = r.node
         |   WHERE r.hop < 3)
         |SELECT node, CAST(min(hop) AS INT) AS hop
         |FROM reach GROUP BY node ORDER BY node""".stripMargin,

    // recursive-CTE bounded-cost walk enumeration + min per node — the
    // naive twin of the semi-naive Bellman-Ford; the cost<=8 horizon
    // matches the Spark-side filter exactly (see the query comment)
    "kg_shortest_path" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT 's' || l_suppkey AS src, 'p' || (l_partkey % 20) AS dst,
        |   CAST(1 + l_partkey % 3 AS BIGINT) AS w FROM lineitem),
        | und AS (SELECT src, dst, w FROM e UNION SELECT dst, src, w FROM e),
        | walk(node, cost) AS (
        |  SELECT 's1', CAST(0 AS BIGINT)
        |  UNION
        |  SELECT u.dst, w0.cost + u.w FROM walk w0 JOIN und u ON w0.node = u.src
        |  WHERE w0.cost + u.w <= 8)
        |SELECT node, min(cost) AS cost FROM walk GROUP BY node
        |ORDER BY node""".stripMargin,

    "kg_entity_salience" ->
      s"""WITH t AS ($transcriptsSql),
         | d(code, term) AS (SELECT * FROM (VALUES $kgTermsSqlValues) v(code, term)),
         | m AS (
         |  SELECT DISTINCT t.conv_id, t.turn_idx, d.code FROM t, d
         |  WHERE len(regexp_extract_all(lower(t.text), '\\b' || d.term || '\\b')) > 0),
         | mc AS (SELECT conv_id, code, count(*) AS n_mention_turns FROM m GROUP BY 1, 2),
         | tc AS (SELECT conv_id, count(*) AS n_turns FROM t GROUP BY 1)
         |SELECT mc.conv_id, mc.code, mc.n_mention_turns, tc.n_turns,
         | CAST((1000000 * mc.n_mention_turns) // tc.n_turns AS BIGINT) AS salience_ppm,
         | CAST(row_number() OVER (
         |   PARTITION BY mc.conv_id
         |   ORDER BY (1000000 * mc.n_mention_turns) // tc.n_turns DESC, mc.code) AS INT) AS rank
         |FROM mc JOIN tc USING (conv_id)
         |ORDER BY conv_id, rank""".stripMargin,

    "kg_temporal_edges" ->
      s"""WITH tt AS (
         |  SELECT 'conv-' || source AS conv_id,
         |   CAST(1704067200 + doc_id AS BIGINT) AS ts_epoch, text FROM documents),
         | d(code, term) AS (SELECT * FROM (VALUES $kgTermsSqlValues) v(code, term)),
         | obs AS (
         |  SELECT DISTINCT d.code AS subj, 'MENTIONED_IN' AS pred,
         |   tt.conv_id AS obj, tt.ts_epoch
         |  FROM tt, d
         |  WHERE len(regexp_extract_all(lower(tt.text), '\\b' || d.term || '\\b')) > 0)
         |SELECT subj, pred, obj, CAST(min(ts_epoch) AS BIGINT) AS first_seen,
         | CAST(max(ts_epoch) AS BIGINT) AS last_seen, count(*) AS n_obs
         |FROM obs GROUP BY 1, 2, 3 ORDER BY subj, obj""".stripMargin,

    "kg_graph_asof" ->
      s"""WITH tt AS (
         |  SELECT 'conv-' || source AS conv_id,
         |   CAST(1704067200 + doc_id AS BIGINT) AS ts_epoch, text FROM documents),
         | d(code, term) AS (SELECT * FROM (VALUES $kgTermsSqlValues) v(code, term)),
         | obs AS (
         |  SELECT DISTINCT d.code AS subj, 'MENTIONED_IN' AS pred,
         |   tt.conv_id AS obj, tt.ts_epoch
         |  FROM tt, d
         |  WHERE len(regexp_extract_all(lower(tt.text), '\\b' || d.term || '\\b')) > 0),
         | b AS (SELECT min(ts_epoch) AS lo, max(ts_epoch) AS hi FROM obs),
         | scoped AS (
         |  SELECT subj, pred, obj, CAST(min(ts_epoch) AS BIGINT) AS first_seen,
         |   CAST(max(ts_epoch) AS BIGINT) AS last_seen, count(*) AS n_obs
         |  FROM obs GROUP BY 1, 2, 3)
         |SELECT s.* FROM scoped s, b
         |WHERE s.first_seen <= (b.lo + b.hi) // 2
         |  AND s.last_seen >= (b.lo + b.hi) // 2 - (b.hi - b.lo) // 4
         |ORDER BY subj, obj""".stripMargin,

    "kg_schema_validate" ->
      s"""WITH t AS ($transcriptsSql),
         | d(code, term) AS (SELECT * FROM (VALUES $kgTermsSqlValues) v(code, term)),
         | linked AS (
         |  SELECT DISTINCT d.code AS subj, 'LINKED_TO' AS pred, t.conv_id AS obj
         |  FROM t, d
         |  WHERE len(regexp_extract_all(lower(t.text), '\\b' || d.term || '\\b')) > 0),
         | bad(subj, pred, obj) AS (VALUES
         |  ('K001','LINKED_TO','K002'), ('QX99','LINKED_TO','K001'),
         |  ('K002','LINKED_TO','zz-none'), ('K003','RELATED_TO','K004')),
         | tri AS (SELECT * FROM linked UNION ALL SELECT * FROM bad),
         | labels AS (SELECT code, 'CONCEPT' AS label FROM d
         |   UNION ALL SELECT DISTINCT conv_id, 'CONV' FROM t),
         | sigs(subj_label, pred, obj_label) AS (VALUES ('CONCEPT','LINKED_TO','CONV'))
         |SELECT tri.subj, tri.pred, tri.obj,
         | coalesce(ls.label, '-') AS subj_label, coalesce(lo.label, '-') AS obj_label,
         | CASE WHEN ls.label IS NULL THEN 'unknown_subj'
         |      WHEN lo.label IS NULL THEN 'unknown_obj'
         |      WHEN sg.subj_label IS NULL THEN 'bad_signature'
         |      ELSE 'ok' END AS verdict
         |FROM tri
         |LEFT JOIN labels ls ON tri.subj = ls.code
         |LEFT JOIN labels lo ON tri.obj = lo.code
         |LEFT JOIN sigs sg ON ls.label = sg.subj_label AND tri.pred = sg.pred
         |  AND lo.label = sg.obj_label
         |ORDER BY tri.subj, tri.pred, tri.obj""".stripMargin,

    // the SAME \b…\b.*\b…\b.*\b…\b pattern the Spark side evaluates —
    // equality is by regex construction, not reimplementation
    "kg_relation_extract" ->
      s"""WITH t AS ($transcriptsSql),
         | d(code, term) AS (SELECT * FROM (VALUES $kgTermsSqlValues) v(code, term)),
         | p(kw, pred) AS (VALUES ('fast','REL_FAST'), ('slow','REL_SLOW'),
         |   ('big','REL_BIG')),
         | m AS (
         |  SELECT DISTINCT t.conv_id, t.turn_idx, d.code, d.term FROM t, d
         |  WHERE len(regexp_extract_all(lower(t.text), '\\b' || d.term || '\\b')) > 0)
         |SELECT m1.code AS subj, p.pred, m2.code AS obj,
         | m1.conv_id AS conv_id, m1.turn_idx AS turn_idx
         |FROM m m1
         |JOIN m m2 ON m1.conv_id = m2.conv_id AND m1.turn_idx = m2.turn_idx
         |  AND m1.code <> m2.code
         |JOIN t ON t.conv_id = m1.conv_id AND t.turn_idx = m1.turn_idx
         |CROSS JOIN p
         |WHERE regexp_matches(lower(t.text),
         |  '\\b' || m1.term || '\\b.*\\b' || p.kw || '\\b.*\\b' || m2.term || '\\b')
         |ORDER BY 1, 2, 3, 4, 5""".stripMargin,

    "kg_coref_resolve" ->
      s"""WITH t AS ($transcriptsSql),
         | d(code, term) AS (SELECT * FROM (VALUES $kgTermsSqlValues) v(code, term)),
         | m AS (
         |  SELECT DISTINCT t.conv_id, t.turn_idx, d.code FROM t, d
         |  WHERE len(regexp_extract_all(lower(t.text), '\\b' || d.term || '\\b')) > 0),
         | anchor AS (
         |  SELECT conv_id, turn_idx, min(code) AS turn_code FROM m GROUP BY 1, 2),
         | rw AS (
         |  SELECT t.conv_id, t.turn_idx, t.text,
         |   last_value(a.turn_code IGNORE NULLS) OVER w AS antecedent_code,
         |   last_value(CASE WHEN a.turn_code IS NOT NULL THEN t.turn_idx END
         |     IGNORE NULLS) OVER w AS antecedent_turn
         |  FROM t LEFT JOIN anchor a
         |    ON t.conv_id = a.conv_id AND t.turn_idx = a.turn_idx
         |  WINDOW w AS (PARTITION BY t.conv_id ORDER BY t.turn_idx
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         |SELECT conv_id, turn_idx,
         | CASE WHEN regexp_matches(lower(text), '\\bthe\\b') THEN 'the'
         |      WHEN regexp_matches(lower(text), '\\ba\\b') THEN 'a' END AS marker,
         | antecedent_code, antecedent_turn
         |FROM rw
         |WHERE (regexp_matches(lower(text), '\\bthe\\b')
         |    OR regexp_matches(lower(text), '\\ba\\b'))
         |  AND antecedent_code IS NOT NULL
         |ORDER BY conv_id, turn_idx""".stripMargin,

    "kg_edge_confidence" ->
      s"""WITH tt AS (
         |  SELECT 'conv-' || source AS conv_id,
         |   CAST(1704067200 + doc_id AS BIGINT) AS ts_epoch, text FROM documents),
         | d(code, term) AS (SELECT * FROM (VALUES $kgTermsSqlValues) v(code, term)),
         | obs AS (
         |  SELECT DISTINCT d.code AS subj, 'MENTIONED_IN' AS pred,
         |   tt.conv_id AS obj, tt.ts_epoch
         |  FROM tt, d
         |  WHERE len(regexp_extract_all(lower(tt.text), '\\b' || d.term || '\\b')) > 0),
         | scoped AS (
         |  SELECT subj, pred, obj, CAST(min(ts_epoch) AS BIGINT) AS first_seen,
         |   CAST(max(ts_epoch) AS BIGINT) AS last_seen, count(*) AS n_obs
         |  FROM obs GROUP BY 1, 2, 3),
         | b AS (SELECT min(first_seen) AS lo, max(last_seen) AS hi FROM scoped),
         | sc AS (
         |  SELECT s.*,
         |   CAST((1000000 * least(s.n_obs, 10)) // 10 AS BIGINT) AS support_ppm,
         |   CAST(CASE WHEN b.hi = b.lo THEN 1000000
         |    ELSE (1000000 * (s.last_seen - b.lo)) // (b.hi - b.lo) END AS BIGINT)
         |    AS recency_ppm
         |  FROM scoped s, b)
         |SELECT subj, pred, obj, first_seen, last_seen, n_obs,
         | support_ppm, recency_ppm,
         | CAST((7 * support_ppm + 3 * recency_ppm) // 10 AS BIGINT) AS conf_ppm
         |FROM sc ORDER BY subj, obj""".stripMargin,

    // full CC over even ∪ odd edges — the incremental fold must equal
    // the from-scratch recompute exactly
    "kg_incremental_cc" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT 's' || l_suppkey AS a, 'p' || (l_partkey % 20) AS b
        |  FROM lineitem),
        | und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
        | reach(n, m) AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a WHERE u.b <> r.n)
        |SELECT n AS node, least(n, min(m)) AS component FROM reach
        |GROUP BY n ORDER BY node""".stripMargin,

    // 5 unrolled iterations of the identical integer fixed-point
    // arithmetic over the fixture SIMILAR kNN graph (HUGEINT sums
    // cast back per step; integer ops make order irrelevant)
    "graph_pagerank" -> {
      val base =
        s"""WITH ncitv(code, vec) AS (SELECT code, vec FROM (VALUES
           |  $ncitVecSqlValues) v(code, term, vec)),
           | simranked AS (
           |  SELECT a.code AS sa, b.code AS sb,
           |    row_number() OVER (PARTITION BY a.code
           |      ORDER BY ${duckCosine0("a.vec", "b.vec")} DESC, b.code) AS r
           |  FROM ncitv a JOIN ncitv b ON a.code <> b.code),
           | fwd AS (SELECT DISTINCT sa AS src, sb AS dst FROM simranked
           |         WHERE r <= 2 AND sa <> sb),
           | nodes AS (SELECT DISTINCT n AS node FROM
           |   (SELECT src AS n FROM fwd UNION ALL SELECT dst FROM fwd)),
           | nn AS (SELECT count(*) AS n FROM nodes),
           | od AS (SELECT src, count(*) AS outdeg FROM fwd GROUP BY src),
           | it0 AS (SELECT node, 1000000000000 // n AS r FROM nodes, nn)""".stripMargin
      val its = (1 to 5).map { i =>
        s""",
           | it$i AS (
           |  SELECT nd.node,
           |    CAST(((15 * 1000000000000) // 100) // nn.n
           |         + coalesce(s.c, 0) AS BIGINT) AS r
           |  FROM nodes nd CROSS JOIN nn LEFT JOIN (
           |    SELECT f.dst AS node,
           |      CAST(sum(((p.r // o.outdeg) * 85) // 100) AS BIGINT) AS c
           |    FROM fwd f JOIN it${i - 1} p ON p.node = f.src
           |         JOIN od o ON o.src = f.src
           |    GROUP BY f.dst) s ON s.node = nd.node)""".stripMargin
      }.mkString
      base + its + "\nSELECT node, r AS rank FROM it5 ORDER BY node"
    },

    // naive latest-at-or-before pick — the N+1 the asof operator
    // replaces with one window pass
    "asof_join_snapshots" ->
      """WITH snaps0 AS (
        |  SELECT event_type, ts, value AS v FROM events WHERE event_id % 97 = 0),
        | snaps AS (
        |  SELECT event_type, ts, max(v) AS v FROM snaps0 GROUP BY 1, 2),
        | ranked AS (
        |  SELECT l.event_id, l.event_type, s.ts AS st, s.v,
        |    row_number() OVER (PARTITION BY l.event_id ORDER BY s.ts DESC) AS r
        |  FROM events l LEFT JOIN snaps s
        |    ON s.event_type = l.event_type AND s.ts <= l.ts)
        |SELECT event_id, event_type, epoch_us(st) AS snap_ts_us,
        |  floor(v * 1e4 + 0.5) / 1e4 AS snap_value
        |FROM ranked WHERE r = 1
        |ORDER BY event_id""".stripMargin,

    // naive inequality range join — the BroadcastNestedLoop the
    // bucketed rewrite avoids
    "range_join_value_windows" ->
      """SELECT i.event_id AS window_id,
        |  count(*) AS n_points,
        |  count(DISTINCT p.event_type) AS n_types,
        |  floor(min(p.value) * 1e4 + 0.5) / 1e4 AS v_min,
        |  floor(max(p.value) * 1e4 + 0.5) / 1e4 AS v_max
        |FROM events i JOIN events p
        |  ON p.value >= i.value AND p.value <= i.value + 25.0
        |WHERE i.event_id % 131 = 0
        |GROUP BY 1
        |ORDER BY window_id""".stripMargin,

    // identical lag/flag/RANGE-cumsum construction (DuckDB sums
    // integers into HUGEINT — cast back to BIGINT for schema parity)
    "sessionize_events" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts) > 21600000000
        |    THEN 1 ELSE 0 END AS flag
        |  FROM events),
        | a AS (
        |  SELECT user_id, us,
        |    sum(flag) OVER (PARTITION BY user_id ORDER BY us
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sidx
        |  FROM g)
        |SELECT user_id, CAST(sidx AS BIGINT) AS session_idx,
        |  count(*) AS n_events, min(us) AS t_start_us, max(us) AS t_end_us,
        |  max(us) - min(us) AS duration_us
        |FROM a GROUP BY 1, 2
        |ORDER BY user_id, session_idx""".stripMargin,

    // inverted-CDF lower quantile, identical histogram construction
    "quantile_exact_hist" ->
      """WITH hist AS (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
        | cum AS (SELECT v, sum(c) OVER (ORDER BY v
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cdf FROM hist),
        | total AS (SELECT count(*) AS n FROM documents),
        | qs AS (SELECT unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.9::DOUBLE,
        |   0.99::DOUBLE, 1.0::DOUBLE]) AS q)
        |SELECT q, min(v) AS value, n AS n_rows
        |FROM qs, total, cum
        |WHERE cdf >= greatest(ceil(q * n), 1)
        |GROUP BY q, n
        |ORDER BY q""".stripMargin,

    // kNN SIMILAR graph from the fixture VALUES -> id-ordered
    // triangle join (exact; equals the Spark side's degree-ordered
    // orientation count)
    "graph_triangle_stats" ->
      s"""WITH ncitv(code, vec) AS (SELECT code, vec FROM (VALUES
         |  $ncitVecSqlValues) v(code, term, vec)),
         | scored AS (
         |  SELECT a.code AS subj, b.code AS obj,
         |    ${duckCosine0("a.vec", "b.vec")} AS cos
         |  FROM ncitv a JOIN ncitv b ON a.code <> b.code),
         | ranked AS (
         |  SELECT subj, obj,
         |   row_number() OVER (PARTITION BY subj ORDER BY cos DESC, obj) AS r
         |  FROM scored),
         | und AS (
         |  SELECT DISTINCT least(subj, obj) AS src, greatest(subj, obj) AS dst
         |  FROM ranked WHERE r <= 2),
         | nodes AS (SELECT count(DISTINCT n) AS n_nodes FROM
         |  (SELECT src AS n FROM und UNION ALL SELECT dst FROM und)),
         | eds AS (SELECT count(*) AS n_edges FROM und),
         | tri AS (SELECT count(*) AS n_triangles
         |  FROM und e1 JOIN und e2 ON e2.src = e1.dst
         |       JOIN und e3 ON e3.src = e1.src AND e3.dst = e2.dst)
         |SELECT n_nodes, n_edges, n_triangles FROM nodes, eds, tri""".stripMargin,

    "graph_degree_hist" ->
      s"""WITH ncitv(code, vec) AS (SELECT code, vec FROM (VALUES
         |  $ncitVecSqlValues) v(code, term, vec)),
         | scored AS (
         |  SELECT a.code AS subj, b.code AS obj,
         |    ${duckCosine0("a.vec", "b.vec")} AS cos
         |  FROM ncitv a JOIN ncitv b ON a.code <> b.code),
         | ranked AS (
         |  SELECT subj, obj,
         |   row_number() OVER (PARTITION BY subj ORDER BY cos DESC, obj) AS r
         |  FROM scored),
         | und AS (
         |  SELECT DISTINCT least(subj, obj) AS src, greatest(subj, obj) AS dst
         |  FROM ranked WHERE r <= 2),
         | deg AS (SELECT n AS node, count(*) AS degree FROM
         |  (SELECT src AS n FROM und UNION ALL SELECT dst FROM und) GROUP BY 1)
         |SELECT degree, count(*) AS n_nodes FROM deg
         |GROUP BY degree ORDER BY degree""".stripMargin,

    // pairs (same CTE as dedup_ngram_jaccard) -> recursive-CTE
    // transitive closure -> numeric-min component + singleton docs
    "dedup_cluster_canonical" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, len(list_distinct(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS ntok,
        |   unnest(list_distinct(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS token
        |  FROM documents WHERE doc_id < 600),
        | pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.ntok, b.ntok
        |  HAVING CAST(count(*) AS DOUBLE) / (a.ntok + b.ntok - count(*)) >= 0.8),
        | und AS (SELECT id_a AS a, id_b AS b FROM pairs
        |         UNION SELECT id_b, id_a FROM pairs),
        | reach(n, m) AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a WHERE u.b <> r.n),
        | comp AS (SELECT n AS doc_id, least(n, min(m)) AS canonical_id
        |          FROM reach GROUP BY n),
        | labeled AS (
        |  SELECT d.doc_id, coalesce(c.canonical_id, d.doc_id) AS canonical_id
        |  FROM (SELECT doc_id FROM documents WHERE doc_id < 600) d
        |  LEFT JOIN comp c ON d.doc_id = c.doc_id)
        |SELECT l.doc_id, l.canonical_id, cnt.cluster_size,
        |  CAST(l.doc_id = l.canonical_id AS INT) AS is_canonical
        |FROM labeled l JOIN (
        |  SELECT canonical_id, count(*) AS cluster_size
        |  FROM labeled GROUP BY canonical_id) cnt USING (canonical_id)
        |ORDER BY doc_id""".stripMargin,

    "decontam_ngram" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        | sh AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 3
        |    THEN list_distinct([array_to_string(toks[i+1:i+3], ' ')
        |                        for i in range(len(toks)-2)])
        |    ELSE [] END AS sh
        |  FROM norm),
        | corpus AS (
        |  SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS shingle
        |  FROM sh WHERE doc_id % 37 <> 0),
        | bench AS (
        |  SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE doc_id % 37 = 0)
        |SELECT c.doc_id, c.n_shingles, count(*) AS n_shared,
        | round(CAST(count(*) AS DOUBLE) / c.n_shingles, 4) AS contamination
        |FROM corpus c JOIN bench b ON c.shingle = b.shingle
        |GROUP BY c.doc_id, c.n_shingles
        |HAVING count(*) >= 1
        |ORDER BY doc_id""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang,
        |  (doc_id * 2654435761) % 4294967296 AS bucket,
        |  CAST(CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'de' THEN 1.0
        |       ELSE 0.25 END AS DOUBLE) AS rate
        |FROM documents
        |WHERE (doc_id * 2654435761) % 4294967296 <
        |  floor(CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'de' THEN 1.0
        |        ELSE 0.25 END * 4294967296)
        |ORDER BY doc_id""".stripMargin,

    "text_pii_redact" ->
      """WITH pii AS (
        |  SELECT doc_id, text || ' contact u' || doc_id || '@ex-' || doc_id
        |    || '.org from 10.' || (doc_id % 256)
        |    || '.0.1 card 4111111111111111' AS text
        |  FROM documents WHERE doc_id < 200),
        | s1 AS (SELECT doc_id, text, regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS r1
        |  FROM pii),
        | s2 AS (SELECT *, regexp_replace(r1,
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS r2 FROM s1),
        | s3 AS (SELECT *, regexp_replace(r2,
        |   '\b\d{13,16}\b', '<NUM>', 'g') AS redacted FROM s2)
        |SELECT doc_id, redacted,
        | len(regexp_extract_all(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        | len(regexp_extract_all(r1,
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        | len(regexp_extract_all(r2, '\b\d{13,16}\b')) AS n_longnums
        |FROM s3 ORDER BY doc_id""".stripMargin,

    // windowed string_agg evaluates in frame order (idx ASC) — the
    // exact twin of the bounded collect_list context rendering; the
    // positional frame is never empty for kept rows because derived
    // turn_idx is dense from 0 per conversation
    "conv_context_pairs" ->
      s"""WITH t AS ($transcriptsSql)
         |SELECT conv_id, turn_idx,
         |  string_agg(role || ': ' || text, chr(10)) OVER (
         |    PARTITION BY conv_id ORDER BY turn_idx
         |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS context,
         |  text AS response
         |FROM t
         |QUALIFY role = 'assistant' AND turn_idx > 0
         |ORDER BY conv_id, turn_idx""".stripMargin,

    "conv_integrity" ->
      s"""WITH t AS ($transcriptsSql),
         | lagged AS (
         |  SELECT *, CASE WHEN lag(role) OVER (
         |    PARTITION BY conv_id ORDER BY turn_idx) = role
         |   THEN 1 ELSE 0 END AS role_repeat
         |  FROM t)
         |SELECT conv_id, count(*) AS n_turns, max(turn_idx) AS max_idx,
         |  max(turn_idx) + 1 - count(*) AS n_gaps,
         |  CAST(sum(role_repeat) AS BIGINT) AS n_role_repeats,
         |  coalesce(max(CASE WHEN turn_idx = 0 THEN role END) = 'user',
         |    false) AS starts_with_user,
         |  count(tool) AS n_tool_turns,
         |  count(DISTINCT tool) AS n_distinct_tools
         |FROM lagged GROUP BY conv_id ORDER BY conv_id""".stripMargin,

    "tool_transitions" ->
      s"""WITH t AS ($transcriptsSql),
         | lagged AS (
         |  SELECT coalesce(lag(tool) OVER (
         |    PARTITION BY conv_id ORDER BY turn_idx), 'START') AS prev_tool,
         |   tool AS next_tool
         |  FROM t WHERE tool IS NOT NULL)
         |SELECT prev_tool, next_tool, count(*) AS n
         |FROM lagged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the BGP compiled by hand: one join per shared variable over the
    // identical fixture edge relations
    "kg_bgp_query" ->
      s"""WITH pv(pv_code, pv_term, ncit_code) AS (
         |   SELECT * FROM (VALUES $pvEdgeSqlValues) v(pv_code, pv_term, ncit_code)),
         | cde(cde_code, cde_term, vdm_code) AS (
         |   SELECT * FROM (VALUES $cdeVdmSqlValues) v(cde_code, cde_term, vdm_code)),
         | vdmpv(vdm_code, pv_code) AS (SELECT * FROM (VALUES $vdmPvSqlValues) v(vdm_code, pv_code)),
         | decoc(cde_code, dec_code, oc_code, oc_term) AS (
         |   SELECT * FROM (VALUES $decOcSqlValues) v(cde_code, dec_code, oc_code, oc_term)),
         | ncitst(ncit_code, st_code) AS (SELECT * FROM (VALUES $ncitStSqlValues) v(ncit_code, st_code))
         |SELECT DISTINCT c.cde_code AS cde, c.vdm_code AS vdm,
         |  vp.pv_code AS pv, p.ncit_code AS ncit, d.dec_code AS dec,
         |  ns.st_code AS stype
         |FROM cde c
         |JOIN vdmpv vp ON vp.vdm_code = c.vdm_code
         |JOIN pv p ON p.pv_code = vp.pv_code
         |JOIN decoc d ON d.cde_code = c.cde_code
         |JOIN ncitst ns ON ns.ncit_code = p.ncit_code
         |ORDER BY cde, vdm, pv, ncit, dec, stype""".stripMargin,

    // recursive-CTE reachability over the identical directed edge
    // union Triples.baseEdges builds (no synonym edges)
    "kg_transitive_closure" ->
      s"""WITH RECURSIVE
         | pv(pv_code, pv_term, ncit_code) AS (
         |   SELECT * FROM (VALUES $pvEdgeSqlValues) v(pv_code, pv_term, ncit_code)),
         | cde(cde_code, cde_term, vdm_code) AS (
         |   SELECT * FROM (VALUES $cdeVdmSqlValues) v(cde_code, cde_term, vdm_code)),
         | vdmpv(vdm_code, pv_code) AS (SELECT * FROM (VALUES $vdmPvSqlValues) v(vdm_code, pv_code)),
         | decoc(cde_code, dec_code, oc_code, oc_term) AS (
         |   SELECT * FROM (VALUES $decOcSqlValues) v(cde_code, dec_code, oc_code, oc_term)),
         | decpr(dec_code, pr_code, pr_term, ncit_code) AS (
         |   SELECT * FROM (VALUES $decPrSqlValues) v(dec_code, pr_code, pr_term, ncit_code)),
         | ocg(oc_code, ncit_code) AS (SELECT * FROM (VALUES $ocGroundSqlValues) v(oc_code, ncit_code)),
         | ncitst(ncit_code, st_code) AS (SELECT * FROM (VALUES $ncitStSqlValues) v(ncit_code, st_code)),
         | ed AS (
         |   SELECT DISTINCT pv_code AS s, ncit_code AS o FROM pv
         |   UNION SELECT oc_code, ncit_code FROM ocg
         |   UNION SELECT pr_code, ncit_code FROM decpr
         |   UNION SELECT cde_code, vdm_code FROM cde
         |   UNION SELECT vdm_code, pv_code FROM vdmpv
         |   UNION SELECT cde_code, dec_code FROM decoc
         |   UNION SELECT dec_code, oc_code FROM decoc
         |   UNION SELECT dec_code, pr_code FROM decpr
         |   UNION SELECT ncit_code, st_code FROM ncitst),
         | cl(src, dst) AS (
         |   SELECT s, o FROM ed WHERE s <> o
         |   UNION
         |   SELECT c.src, e.o FROM cl c JOIN ed e ON e.s = c.dst
         |   WHERE c.src <> e.o)
         |SELECT src, dst FROM cl ORDER BY src, dst""".stripMargin,

    // the serial single-window prefix sum — the ground truth the
    // two-phase distributed form must reproduce exactly
    "pack_sequences" ->
      """WITH p AS (
        |  SELECT doc_id, n_chars,
        |    CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS start_offset
        |  FROM documents)
        |SELECT doc_id, n_chars, start_offset,
        |  start_offset // 2048 AS chunk_first,
        |  (start_offset + n_chars - 1) // 2048 AS chunk_last
        |FROM p ORDER BY doc_id""".stripMargin,

    // identical distinct-shingle construction (the decontam_ngram
    // tokenization), df counted over docs, HALF_UP 4dp fraction
    "text_dup_ngrams" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        | sh AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 3
        |    THEN list_distinct([array_to_string(toks[i+1:i+3], ' ')
        |                        for i in range(len(toks)-2)])
        |    ELSE [] END AS sh
        |  FROM norm),
        | occ AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        | freq AS (SELECT shingle, count(*) AS df FROM occ GROUP BY 1)
        |SELECT o.doc_id, count(*) AS n_ngrams,
        |  CAST(sum(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  floor(CAST(sum(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) * 1e4 + 0.5) / 1e4 AS dup_fraction
        |FROM occ o JOIN freq f USING (shingle)
        |GROUP BY o.doc_id ORDER BY doc_id""".stripMargin,

    // rendered = turn texts in ORDER BY turn_idx (the order-pinned
    // twin of the sorted-struct collect); hash64 via the HUGEINT
    // template with the signed two's-complement fold
    "conv_dedup_exact" -> {
      val h = SketchOracles.hash64_expr.replace("__EXPR__", "rendered")
      val signed = s"CAST(list_transform([$h], g -> CASE" +
        " WHEN g >= 9223372036854775808::HUGEINT" +
        " THEN g - 18446744073709551616::HUGEINT ELSE g END)[1] AS BIGINT)"
      s"""WITH t AS ($transcriptsSql),
         | t2 AS (
         |  SELECT conv_id, turn_idx, text FROM t
         |  UNION ALL
         |  SELECT conv_id || '-dup', turn_idx, text FROM t
         |  WHERE conv_id LIKE '%0'),
         | g AS (
         |  SELECT conv_id, count(*) AS n_turns,
         |    string_agg(text, chr(10) ORDER BY turn_idx) AS rendered
         |  FROM t2 GROUP BY conv_id),
         | h AS (SELECT conv_id, n_turns, $signed AS conv_hash FROM g)
         |SELECT conv_id, n_turns, conv_hash,
         |  min(conv_id) OVER (PARTITION BY conv_hash) AS canonical_id,
         |  count(*) OVER (PARTITION BY conv_hash) AS group_size,
         |  CAST(conv_id = min(conv_id) OVER (PARTITION BY conv_hash)
         |    AS INT) AS is_canonical
         |FROM h ORDER BY conv_id""".stripMargin
    },

    // the same kNN graph as graph_pagerank, symmetrized; every walk
    // step replayed with the HUGEINT hash64 twin over the identical
    // sorted adjacency lists
    "kg_random_walks" ->
      s"""$walkOracleCtes
         |SELECT start, walk, step, node FROM (
         |$walkOracleUnion
         |)
         |ORDER BY start, walk, step""".stripMargin,

    // band self-join over the replayed corpus — the naive twin of the
    // Spark side's offset-explode + equi-join
    "kg_skipgram_pairs" ->
      s"""$walkOracleCtes,
         | corpus AS (
         |$walkOracleUnion
         | ),
         | pairs AS (
         |  SELECT c1.node AS center, c2.node AS context
         |  FROM corpus c1 JOIN corpus c2
         |    ON c1.start = c2.start AND c1.walk = c2.walk
         |   AND c2.step BETWEEN c1.step - 2 AND c1.step + 2
         |   AND c1.step <> c2.step)
         |SELECT center, context, count(*) AS n_pairs
         |FROM pairs GROUP BY 1, 2
         |ORDER BY center, context""".stripMargin,

    "kg_graph_diff" ->
      """WITH b AS (
        |  SELECT DISTINCT 's' || l_suppkey AS subj, 'P' || (l_partkey % 3) AS pred,
        |   'p' || (l_partkey % 20) AS obj, 1 AS in_before
        |  FROM lineitem WHERE l_orderkey % 2 = 0),
        | a AS (
        |  SELECT DISTINCT 's' || l_suppkey AS subj, 'P' || (l_partkey % 3) AS pred,
        |   'p' || (l_partkey % 20) AS obj, 1 AS in_after
        |  FROM lineitem WHERE l_orderkey % 2 = 1)
        |SELECT subj, pred, obj,
        | CASE WHEN in_before IS NULL THEN 'added'
        |      WHEN in_after IS NULL THEN 'removed'
        |      ELSE 'retained' END AS status
        |FROM b FULL OUTER JOIN a USING (subj, pred, obj)
        |ORDER BY subj, pred, obj""".stripMargin,

    // recursive-CTE ancestor closure + the same contribute-to-every-
    // ancestor-and-self aggregation
    "kg_hierarchy_rollup" ->
      s"""WITH RECURSIVE t AS ($transcriptsSql),
         | d(code, term) AS (SELECT * FROM (VALUES $kgTermsSqlValues) v(code, term)),
         | isa(c, p) AS (SELECT * FROM (VALUES $kgIsaSqlValues) v(c, p)),
         | m AS (
         |  SELECT DISTINCT t.conv_id, t.turn_idx, d.code FROM t, d
         |  WHERE len(regexp_extract_all(lower(t.text), '\\b' || d.term || '\\b')) > 0),
         | direct AS (SELECT code, count(*) AS n_direct FROM m GROUP BY 1),
         | cl(src, dst) AS (
         |  SELECT c, p FROM isa
         |  UNION
         |  SELECT cl.src, isa.p FROM cl JOIN isa ON cl.dst = isa.c),
         | nodes AS (SELECT c AS code FROM isa UNION SELECT p FROM isa),
         | contrib AS (
         |  SELECT src AS code, dst AS anc FROM cl
         |  UNION ALL SELECT code, code FROM nodes),
         | roll AS (
         |  SELECT contrib.anc, sum(coalesce(direct.n_direct, 0)) AS n_rollup
         |  FROM contrib LEFT JOIN direct USING (code) GROUP BY 1)
         |SELECT roll.anc AS code,
         | CAST(coalesce(d2.n_direct, 0) AS BIGINT) AS n_direct,
         | CAST(roll.n_rollup AS BIGINT) AS n_rollup
         |FROM roll LEFT JOIN direct d2 ON roll.anc = d2.code
         |ORDER BY code""".stripMargin,

    // identical Knuth-hash fractional-epoch arithmetic; dyadic
    // weights make every float threshold exact in both engines
    "sample_mixture_epochs" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    CASE source WHEN 'src0' THEN 2.5::DOUBLE
        |      WHEN 'src1' THEN 0.25::DOUBLE WHEN 'src2' THEN 1.0::DOUBLE
        |      ELSE 0.75::DOUBLE END AS wt
        |  FROM documents),
        | c AS (
        |  SELECT doc_id, source,
        |    CAST(floor(wt) AS INT)
        |    + CASE WHEN (doc_id * 2654435761) % 4294967296 <
        |        floor((wt - floor(wt)) * 4294967296) THEN 1 ELSE 0 END AS copies
        |  FROM w)
        |SELECT doc_id, source, CAST(unnest(range(copies)) AS INT) AS epoch
        |FROM c
        |ORDER BY doc_id, epoch""".stripMargin
  )

  /** The replayed deterministic walk corpus (wk0..wk4 CTE chain over
    * the SIMILAR kNN fixture graph) — shared by the kg_random_walks
    * and kg_skipgram_pairs oracles. */
  private lazy val walkOracleCtes: String = {
    def h32(e: String) =
      s"CAST(${SketchOracles.hash64_expr.replace("__EXPR__", e)}" +
        " & 4294967295::HUGEINT AS BIGINT)"
    def stepCte(t: Int) =
      s""",
         | wk$t AS (
         |  SELECT w.start, w.walk,
         |    a.nbrs[${h32(s"concat_ws('|', w.start, w.walk, $t, w.cur)")}
         |           % len(a.nbrs) + 1] AS cur
         |  FROM wk${t - 1} w JOIN adj a ON a.src = w.cur)""".stripMargin
    s"""WITH ncitv(code, vec) AS (SELECT code, vec FROM (VALUES
       |  $ncitVecSqlValues) v(code, term, vec)),
       | simranked AS (
       |  SELECT a.code AS sa, b.code AS sb,
       |    row_number() OVER (PARTITION BY a.code
       |      ORDER BY ${duckCosine0("a.vec", "b.vec")} DESC, b.code) AS r
       |  FROM ncitv a JOIN ncitv b ON a.code <> b.code),
       | fwd AS (SELECT DISTINCT sa AS src, sb AS dst FROM simranked
       |         WHERE r <= 2 AND sa <> sb),
       | und AS (SELECT DISTINCT src, dst FROM (
       |   SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd)
       |  WHERE src <> dst),
       | adj AS (SELECT src, list(dst ORDER BY dst) AS nbrs
       |         FROM und GROUP BY src),
       | wk0 AS (SELECT src AS start, w AS walk, src AS cur
       |         FROM adj, (VALUES (0), (1)) ww(w))""".stripMargin +
      (1 to 4).map(stepCte).mkString
  }

  private lazy val walkOracleUnion: String =
    "  SELECT start, walk, 0 AS step, cur AS node FROM wk0\n" +
      (1 to 4).map(t =>
        s"  UNION ALL SELECT start, walk, $t, cur FROM wk$t").mkString("\n")

  /** (label, nCentroids, nProbe, nAssign) — the IVF recall/redundancy
    * dial pinned by ann_ivf_recall. */
  private val ivfRecallConfigs: Seq[(String, Int, Int, Int)] = Seq(
    ("a_base_p4x1", 16, 4, 1),
    ("b_dup_p4x2", 16, 4, 2),
    ("c_highrecall_p8x3", 16, 8, 3))
}
