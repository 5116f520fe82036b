package graft.triples

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Triple

/** Incremental graph maintenance: Neo4j-`MERGE`-equivalent upserts
  * into the materialized vertex/edge tables written by
  * [[Triples.writeGraph]].
  *
  * The reference serves its graph from Neo4j, where the loader's
  * `MERGE` gives idempotent create-if-absent per node/relationship.
  * The table-backed replacement needs the same property or every
  * re-run / replayed micro-batch / resumed stage would duplicate
  * edges. The set-based equivalent of a per-row `MERGE` loop is:
  *
  *   fresh = delta ANTI-JOIN existing ON full key; APPEND fresh
  *
  * keyed (subj, pred, obj) for edges and (label, code) for vertices.
  *
  * Scale shape (10^12-turn corpus, edges partitioned by pred):
  *  - the existing side is read PARTITION-PRUNED to only the preds
  *    present in the delta (a handful of literals — the predicate
  *    vocabulary is tiny and fixed), so a LINKED_TO batch merge never
  *    touches MAPS_TO/HAS_* partitions;
  *  - the anti-join shuffles delta + pruned-existing on the edge key —
  *    the unavoidable comparison; AQE picks broadcast when the pruned
  *    existing side is small (first batches) and shuffled-hash later;
  *  - append-only writes: no rewrite of existing partitions, so merge
  *    cost is O(delta + pruned-existing-scan), independent of total
  *    graph size across preds.
  *
  * Crash/replay semantics: the anti-join re-derives the delta against
  * the CURRENT table state, so re-running a merge whose append
  * committed is a no-op (fresh = 0) and re-running one that failed
  * before commit just completes it — this is what makes the
  * Structured Streaming triple sink
  * ([[graft.streaming.StreamingIngest.tripleSink]]) effectively
  * exactly-once: at-least-once micro-batch replay composed with an
  * idempotent sink. Parquet's commit protocol makes the append
  * visible atomically per job (files surface on commit); on a real
  * cluster the same algebra lands as an Iceberg `MERGE INTO`
  * snapshot commit (SURVEY.md §1.3 format note).
  */
object GraphMerge {

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Upsert `delta` into the pred-partitioned edge table at
    * `dir/edges`; returns the number of genuinely-new edges appended.
    * Duplicate rows WITHIN the delta collapse to one (MERGE touches
    * each key once). */
  /** The not-yet-present rows of `delta` vs the live edge table —
    * the plan `mergeEdges` appends. Exposed for plan assertions: the
    * existing side must scan ONLY the pred partitions the delta
    * names (PartitionFilters, asserted in PlanSpec). */
  private[graft] def freshEdges(spark: SparkSession, path: String,
                                delta: Dataset[Triple]): DataFrame = {
    val dedup = delta.toDF().select("subj", "pred", "obj").distinct()
    if (!exists(spark, path)) dedup
    else {
      // pruning literal: the delta's pred vocabulary (collect is
      // bounded by the fixed predicate set, never corpus-sized)
      val preds = dedup.select("pred").distinct().collect().map(_.getString(0))
      val existing = spark.read.parquet(path).where(col("pred").isin(preds.toSeq: _*))
      dedup.join(existing, Seq("subj", "pred", "obj"), "left_anti")
    }
  }

  /** [[mergeEdges]] with the delta's pred vocabulary supplied by the
    * caller — the production fast path. A merge producer almost always
    * KNOWS the edge kinds it emits (a LINKED_TO batch writer, the
    * MAPS_TO deriver), so the preds-collect job that exists only to
    * discover them is pure overhead; with the hint the delta lineage
    * is traversed exactly ONCE, by the fused anti-join + append job
    * (no persist, no collect, no count job). SAFE, not trust-based:
    * an in-plan assertion fails the job on the first delta row whose
    * pred escapes the hint — a wrong hint can never silently skip the
    * duplicate check and corrupt the table. File sizing is left to
    * AQE partition coalescing (small deltas still collapse to few
    * files; large deltas keep their parallelism). */
  def mergeEdgesWithPreds(spark: SparkSession, dir: String,
                          delta: Dataset[Triple], preds: Seq[String]): Long = {
    val path = s"$dir/edges"
    val guard = assert_true(col("pred").isin(preds: _*),
      concat(lit("mergeEdgesWithPreds: delta pred '"), col("pred"),
        lit(s"' not covered by the hint ${preds.mkString("[", ",", "]")} — " +
          "the anti-join would miss existing rows and duplicate edges")))
    // the wrong-hint guard applies on BOTH branches: a first merge
    // with a bad vocabulary must fail before it writes mislabeled
    // partitions, not on the second batch
    val dedup = delta.toDF().select("subj", "pred", "obj").distinct()
      .filter(coalesce(guard, lit(true)))
    val hadTable = exists(spark, path)
    val fresh =
      if (!hadTable) dedup
      else {
        val existing = spark.read.parquet(path).where(col("pred").isin(preds: _*))
        dedup.join(existing, Seq("subj", "pred", "obj"), "left_anti")
      }
    val n = writePartitioned(spark, fresh, "pred", path, hadTable)
    n
  }

  /** Fused append: count rides the write as an observe() metric —
    * one traversal of the delta lineage, no separate count job. File
    * sizing comes from AQE partition coalescing at the plan's own
    * shuffle boundaries (the delta `distinct` and, for a large
    * existing side, the sort-merge anti-join): a small fresh set
    * lands in one or two files per partition, a large one keeps its
    * parallelism. Residual bounded case: a BROADCAST anti-join after
    * a very large delta distinct can spread a tiny fresh set over the
    * delta's post-AQE partition count (tens of files, not
    * shuffle-partition-many) — absorbed by the documented
    * [[compactEdges]] maintenance path rather than an extra
    * per-merge rebalance shuffle.
    * A zero-row append onto a PREVIOUSLY ABSENT table leaves an empty
    * parquet dir (just _SUCCESS) that would poison every later read —
    * it is rolled back so table state equals "never written". */
  private def writePartitioned(spark: SparkSession, df: DataFrame,
                               partCol: String, path: String,
                               hadTable: Boolean): Long = {
    val fObs = new org.apache.spark.sql.Observation()
    df.observe(fObs, count(lit(1)).as("n"))
      .write.mode("append").partitionBy(partCol).parquet(path)
    // defensive read: AQE empty-relation propagation can eliminate
    // the CollectMetrics node when the input is provably empty, in
    // which case the observation completes with an empty metrics map
    // — which means exactly "0 rows appended"
    val n = Option(fObs.getAsJava.get("n"))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    if (n == 0 && !hadTable) {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
    }
    n
  }

  def mergeEdges(spark: SparkSession, dir: String, delta: Dataset[Triple]): Long = {
    val path = s"$dir/edges"
    // persist the deduped delta FIRST: its lineage can be expensive
    // (similarEdges' cosine kNN, the CC canonical map) and is
    // otherwise re-traversed by both the preds-collect and the
    // anti-join+append. The appended-row count rides the write job as
    // an observe() metric (no separate count job), and the REBALANCE
    // hint sizes output files adaptively — a small FRESH set collapses
    // to one file per pred partition even when the delta itself was
    // large (the replay case), a large one splits to advisory-sized
    // files; no small-files debt for later anti-join scans either way.
    val dedup = delta.toDF().select("subj", "pred", "obj").distinct().persist()
    try {
      val hadTable = exists(spark, path)
      val fresh =
        if (!hadTable) dedup
        else {
          // pruning literal: the delta's pred vocabulary (collect is
          // bounded by the fixed predicate set, never corpus-sized)
          val preds = dedup.select("pred").distinct().collect().map(_.getString(0))
          val existing = spark.read.parquet(path).where(col("pred").isin(preds.toSeq: _*))
          dedup.join(existing, Seq("subj", "pred", "obj"), "left_anti")
        }
      writePartitioned(spark, fresh, "pred", path, hadTable)
    } finally { dedup.unpersist(): Unit }
  }

  /** Upsert rows of [[Triples.vertices]] shape (code, label, term,
    * definition, canonical) into the label-partitioned vertex table,
    * keyed (label, code): first writer wins, properties of existing
    * vertices are left untouched (Neo4j `MERGE` on the key alone).
    * Returns the number of new vertices appended. */
  /** [[mergeVertices]] with the delta's label vocabulary supplied by
    * the caller — same fused single-traversal shape and in-plan
    * wrong-hint assertion as [[mergeEdgesWithPreds]]. The vertex label
    * vocabulary is FIXED by schema construction (NCIT/PV/CDE/OC/VDM/
    * DEC/PR/SemanticType/SYN), so callers can pass it literally. */
  def mergeVerticesWithLabels(spark: SparkSession, dir: String,
                              delta: DataFrame, labels: Seq[String]): Long = {
    val path = s"$dir/vertices"
    val guard = assert_true(col("label").isin(labels: _*),
      concat(lit("mergeVerticesWithLabels: delta label '"), col("label"),
        lit(s"' not covered by the hint ${labels.mkString("[", ",", "]")} — " +
          "the anti-join would miss existing rows and duplicate vertices")))
    val dedup = delta.dropDuplicates("label", "code")
      .filter(coalesce(guard, lit(true)))
    val hadTable = exists(spark, path)
    val fresh =
      if (!hadTable) dedup
      else {
        val existing = spark.read.parquet(path)
          .where(col("label").isin(labels: _*))
          .select("label", "code")
        dedup.join(existing, Seq("label", "code"), "left_anti")
      }
    writePartitioned(spark, fresh, "label", path, hadTable)
  }

  def mergeVertices(spark: SparkSession, dir: String, delta: DataFrame): Long = {
    val path = s"$dir/vertices"
    // same persist-the-delta-first + observe-fused-count +
    // REBALANCE-sized-files shape as mergeEdges
    val dedup = delta.dropDuplicates("label", "code").persist()
    try {
      val hadTable = exists(spark, path)
      val fresh =
        if (!hadTable) dedup
        else {
          val labels = dedup.select("label").distinct().collect().map(_.getString(0))
          val existing = spark.read.parquet(path)
            .where(col("label").isin(labels.toSeq: _*))
            .select("label", "code")
          dedup.join(existing, Seq("label", "code"), "left_anti")
        }
      writePartitioned(spark, fresh, "label", path, hadTable)
    } finally { dedup.unpersist(): Unit }
  }

  /** The `ON MATCH SET` half of Neo4j's MERGE — property refresh for
    * existing vertices (the dictionary-version-upgrade path: a new
    * NCIT release changes terms/definitions in place). Delta rows WIN
    * on key collision (label, code); unmatched existing rows are
    * preserved; unmatched delta rows are inserted. Returns
    * (updated, inserted).
    *
    * Scale shape: rewrites ONLY the label partitions present in the
    * delta (dynamic partition overwrite — a LINKED_TO-sized vertex
    * table is never touched by an NCIT refresh); the merged result is
    * staged to a temp path first because Spark (correctly) refuses a
    * plan that overwrites its own input, then lands with
    * partitionOverwriteMode=dynamic so untouched label partitions
    * keep their files byte-identical (asserted in GraphMergeSpec).
    * On Iceberg this whole dance is one MERGE INTO snapshot commit. */
  def refreshVertices(spark: SparkSession, dir: String, delta: DataFrame): (Long, Long) = {
    val path = s"$dir/vertices"
    val dedup = delta.dropDuplicates("label", "code")
    if (!exists(spark, path)) {
      dedup.write.mode("overwrite").partitionBy("label").parquet(path)
      return (0L, dedup.count())
    }
    val labels = dedup.select("label").distinct().collect().map(_.getString(0))
    val existing = spark.read.parquet(path).where(col("label").isin(labels.toSeq: _*))
    // one job for both counts: updated = delta keys already present,
    // inserted = the rest (was two separate count actions)
    val Array(updated, inserted) = dedup
      .join(existing.select(col("label"), col("code"), lit(1).as("is_ex")),
        Seq("label", "code"), "left")
      .agg(count(col("is_ex")).as("updated"),
        coalesce(sum(when(col("is_ex").isNull, 1L).otherwise(0L)), lit(0L))
          .as("inserted"))
      .first() match { case r => Array(r.getLong(0), r.getLong(1)) }
    val keep = existing.join(dedup.select("label", "code"), Seq("label", "code"), "left_anti")
    val merged = dedup.unionByName(keep.select(dedup.columns.map(col).toSeq: _*))
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/.refresh_tmp")
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    merged.write.mode("overwrite").parquet(tmp.toString)
    spark.read.parquet(tmp.toString)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("label").parquet(path)
    fs.delete(tmp, true)
    (updated, inserted)
  }

  /** Maintenance compaction: every merge job appends its own file set,
    * so a partition that has absorbed k merges carries O(k·tasks)
    * small files — reads stay partition-pruned but per-file open cost
    * grows without bound on a long-lived graph. `compactEdges`
    * rewrites each named pred partition into `filesPerPartition`
    * files (the Iceberg `rewrite_data_files` analog; list the preds
    * you merge into often — LINKED_TO absorbs every transcript batch,
    * the dictionary preds almost never change).
    *
    * Swap protocol per partition: write compacted files to a temp
    * dir, move the live dir aside, move the temp dir in, drop the old
    * files — readers see either the old or the new file set, and a
    * crash mid-swap leaves the old data recoverable in `.compact_old`
    * (never silently lost). On object storage without atomic rename
    * this is exactly why production uses an Iceberg snapshot commit;
    * the algebra is identical.
    *
    * Returns (filesBefore, filesAfter) per pred. */
  def compactEdges(spark: SparkSession, dir: String, preds: Seq[String],
                   filesPerPartition: Int = 1): Map[String, (Int, Int)] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: Path): Int =
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    preds.map { pred =>
      val live = new Path(s"$dir/edges/pred=$pred")
      val before = parquetFiles(live)
      if (before <= filesPerPartition) pred -> (before, before)
      else {
        val tmp = new Path(s"$dir/.compact_tmp/pred=$pred")
        val old = new Path(s"$dir/.compact_old/pred=$pred")
        fs.delete(tmp, true); fs.delete(old, true)
        fs.mkdirs(tmp.getParent); fs.mkdirs(old.getParent)
        // partition-dir read: pred lives in the path, files carry (subj, obj)
        spark.read.parquet(live.toString)
          .repartition(filesPerPartition)
          .write.mode("overwrite").parquet(tmp.toString)
        require(fs.rename(live, old), s"compact: could not move $live aside")
        require(fs.rename(tmp, live), s"compact: could not move $tmp into place")
        fs.delete(old, true)
        pred -> (before, parquetFiles(live))
      }
    }.toMap
  }
}
