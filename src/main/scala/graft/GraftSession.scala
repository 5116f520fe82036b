package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Tuned for the sandbox (local[N], single JVM) but every knob is the
  * one we would set on a real multi-executor cluster too: AQE on
  * (skew-join splitting + partition coalescing), broadcast threshold
  * sized so the concept dictionary (~10^5 rows) always broadcasts,
  * shuffle partitions matched to parallelism instead of the 200
  * default.
  */
object GraftSession {

  /** Default shuffle partition count: match core count locally; on a
    * real cluster this would be ~2-3x total executor cores.
    *
    * `SPARK_GRAFT_MASTER` (opt-in, unset in the driver contract)
    * overrides the caller's master so the UNCHANGED mains can be run
    * under `spark-submit --master local-cluster[N,cores,mem]` — real
    * separate executor JVMs with cross-process shuffle/broadcast and
    * task serialization, the closest in-sandbox realization of a
    * multi-executor cluster. Without it the builder's .master() would
    * silently win over spark-submit's --master. */
  def build(master: String = "local[*]", shufflePartitions: Int = 32,
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", master))
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // dictionary tables (<=100k concepts x ~100B) must broadcast:
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Functions.register(spark)
    spark
  }

  /** Registers graft SQL functions on an externally-built session. */
  def prepare(spark: SparkSession): SparkSession = {
    Functions.register(spark)
    spark
  }
}
