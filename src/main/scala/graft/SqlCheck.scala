package graft

import org.apache.spark.sql.SparkSession

/** End-to-end probe for the `spark.sql.extensions` config path: built
  * to run under a REAL spark-submit (`tools/submit.sh graft.SqlCheck`)
  * where the session is created fresh with
  * `--conf spark.sql.extensions=graft.GraftExtensions`. It
  * deliberately does NOT call [[Functions.register]] or
  * [[GraftSession.build]] — if the functions resolve here, they were
  * injected by the extensions mechanism alone. Prints one JSON line;
  * exits non-zero on any failure.
  */
object SqlCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-sql-check")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val injected = spark.conf.getOption("spark.sql.extensions")
      .exists(_.contains("graft.GraftExtensions"))
    require(injected,
      "run via tools/submit.sh graft.SqlCheck (needs --conf spark.sql.extensions=graft.GraftExtensions)")

    val row = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
        |       simhash64('the same text') = simhash64('the same text') AS sim_det,
        |       doc_fingerprint('abc') <> doc_fingerprint('acb') AS fp_order,
        |       hash64('x') AS h64,
        |       size(minhash_sig('one two three four five', 32)) AS mh_k,
        |       size(hash_embed('hello world', 16)) AS emb_dim
        |""".stripMargin).head()

    val cos = row.getDouble(0)
    require(math.abs(cos - 1.0) < 1e-12, s"cosine_sim: $cos")
    require(row.getBoolean(1), "simhash64 not deterministic")
    require(row.getBoolean(2), "doc_fingerprint not order-sensitive")
    require(row.getInt(4) == 32, s"minhash_sig k: ${row.getInt(4)}")
    require(row.getInt(5) == 16, s"hash_embed dim: ${row.getInt(5)}")
    // DESCRIBE works because injectFunction carries ExpressionInfo
    val desc = spark.sql("DESCRIBE FUNCTION cosine_sim")
      .collect().map(_.getString(0)).mkString("\n")
    require(desc.contains("cosine_sim"), s"DESCRIBE FUNCTION failed:\n$desc")

    println(s"""{"sql_extensions_ok":true,"cos":$cos,"hash64_x":${row.getLong(3)},"functions":${GraftExtensions.functions.size}}""")
    spark.stop()
  }
}
