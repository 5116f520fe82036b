package graft

import org.apache.spark.sql.functions._

/** The SQL-function surface: every [[GraftExtensions]] builder is the
  * single source of truth for both registration paths
  * ([[Functions.register]] on the shared test session here; the
  * `spark.sql.extensions` config under a real spark-submit — proven
  * by `tools/submit.sh graft.SqlCheck`). These tests run real SQL
  * through the injected builders and pin the argument contracts.
  */
class ExtensionsSpec extends SparkTestBase {

  test("every graft function is visible to SHOW FUNCTIONS with ExpressionInfo") {
    val shown = spark.sql("SHOW USER FUNCTIONS")
      .collect().map(_.getString(0).split("\\.").last).toSet
    for ((ident, _, _) <- GraftExtensions.functions)
      assert(shown.contains(ident.funcName), s"missing ${ident.funcName} in $shown")
    val desc = spark.sql("DESCRIBE FUNCTION minhash_sig")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("minhash_sig(text[, k])"), desc)
  }

  test("SQL path equals Column path on data (cosine, simhash, fingerprint, hash64)") {
    import spark.implicits._
    val df = Seq(
      ("a", Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f), "stage iv colon cancer"),
      ("b", Array(0.0f, 0.0f), Array(1.0f, 1.0f), "aspirin 81 mg daily"),
      ("c", null, Array(1.0f), "")
    ).toDF("id", "va", "vb", "txt")
    df.createOrReplaceTempView("ext_probe")
    val viaSql = spark.sql(
      """SELECT id, cosine_sim(va, vb) AS cos, simhash64(txt) AS sh,
        |       doc_fingerprint(txt) AS fp, hash64(txt) AS h
        |FROM ext_probe""".stripMargin)
    val viaCol = df.select(col("id"),
      Functions.cosine_sim(col("va"), col("vb")).as("cos"),
      Functions.simhash64(col("txt")).as("sh"),
      Functions.doc_fingerprint(col("txt")).as("fp"),
      Functions.hash64_str(col("txt")).as("h"))
    assert(viaSql.orderBy("id").collect().toSeq ===
      viaCol.orderBy("id").collect().toSeq)
  }

  test("minhash_sig and hash_embed honor the optional literal int argument") {
    val r = spark.sql(
      """SELECT size(minhash_sig('alpha beta gamma delta epsilon')) AS k_def,
        |       size(minhash_sig('alpha beta gamma delta epsilon', 16)) AS k_16,
        |       size(hash_embed('alpha beta')) AS d_def,
        |       size(hash_embed('alpha beta', 8)) AS d_8""".stripMargin).head()
    assert(r.getInt(0) === 64)
    assert(r.getInt(1) === 16)
    assert(r.getInt(2) === graft.functions.Vectorizer.DefaultDim)
    assert(r.getInt(3) === 8)
  }

  test("static int parameters reject non-literal arguments with a clear message") {
    import spark.implicits._
    Seq((1, "t")).toDF("n", "t").createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(t, n) FROM ext_bad").collect()
    }
    assert(e.getMessage.contains("k must be an integer literal"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(e2.getMessage.contains("cosine_sim expects 2"), e2.getMessage)
  }
}
