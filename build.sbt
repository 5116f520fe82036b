ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ncitsemanticmapperspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked run's stdout through UNWRAPPED: the default logger
// prefixes every line with [info], which breaks line-oriented JSON
// parsing of Bench/Scaling output downstream.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// diagnostics hook: SPARK_GRAFT_JVM_EXTRA="-Xlog:jit+compilation=info"
// etc. reaches the forked run/test JVMs
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_EXTRA")
  .map(_.split("\\s+").toSeq).getOrElse(Seq.empty)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] = 32 executor threads in ONE JVM: size the heap for the
  // thread count (~2g/thread) or GC caps scaling — measured: 32 cores
  // at 24g degrade 1.36M -> 0.84M turns/sec on long runs (box: 125g)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")}",
  // Pre-fault the whole heap at startup on 2M pages. This VM's
  // anonymous page-fault service time intermittently collapses ~25x
  // (measured: 2 GiB of fresh 4k faults = 48s in a bad window, ~2.5s
  // otherwise); a 32-thread run faulting tens of GB of fresh heap
  // then burns 1000+s of SYS time counted as executor CPU — the real
  // cause of the erratic 25-35x local[32] slowdowns misattributed to
  // host steal in round 2 (BENCH/BASELINE.md round-3 note). Fixed
  // Xms + AlwaysPreTouch moves every heap fault to JVM startup
  // (outside all timed windows) and THP cuts fault count 512x.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")}",
  "-XX:+UseTransparentHugePages",
  "-XX:+AlwaysPreTouch",
)
// The fixed 64g Xms above is sized for BENCHMARK runs (32 executor
// threads over multi-GB corpora). Test JVMs work on fixture-sized data
// and must not pre-commit 64 GB each — AlwaysPreTouch turns Xms into
// an immediate hard commit, so `sbt test` next to a bench JVM would
// demand 128 GB on this 125 GB box (OOM-killer territory) and fail
// outright on smaller hosts. Tests keep the same fault-free-window
// discipline at a fixture-appropriate heap.
Test / javaOptions := (Test / javaOptions).value
  .filterNot(o => o.startsWith("-Xmx") || o.startsWith("-Xms")) ++ {
    val m = sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "24g")
    Seq(s"-Xmx$m", s"-Xms$m")
  }
