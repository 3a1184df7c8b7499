ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tsdisaggspark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  // r12: never use the bypass-merge shuffle writer. For a ≤200-partition
  // exchange Spark's default writes ONE FILE PER REDUCE PARTITION PER MAP
  // TASK (32 map × 32 reduce = 1024 file creates + a concat pass per
  // exchange); thread-dump sampling showed graph_pagerank tasks spending
  // most of their runtime in FileOutputStream.open0 — a ~200-400 ms
  // PER-TASK constant on this container, growing as blockmgr dirs fill
  // over a 193-query sweep (the r11 in-sweep graph regression). 0 routes
  // every exchange to the serialized UnsafeShuffleWriter (one data file +
  // index per map task — the standard path above 200 partitions anyway),
  // measured 70 → 20 s of task CPU on graph_pagerank. Env-overridable for
  // A/B (GRAFT_BYPASS_THRESH=200 restores the Spark default).
  s"-Dspark.shuffle.sort.bypassMergeThreshold=${sys.env.getOrElse("GRAFT_BYPASS_THRESH", "0")}",
  // let dev.ludovic.netlib use the Vector API BLAS (no native libs in
  // this container; the Vector implementation is ~4x the Java fallback)
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
