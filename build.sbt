ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "icspark"
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
// Pass the forked JVM's stdout/stderr through verbatim instead of routing
// them through sbt's logger — the `[info] `/`[error] ` prefixes broke the
// driver's JSON-line parse of Bench output in rounds 1–3 (parsed: null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: the bench runs 70+ queries in one JVM with several
  // session-lifetime caches (MoR fixture, q41 docs/pairs, IVF assignment);
  // at 8g Spark's unified pool (~4.6g) evicts those caches under the
  // 32-thread execution load and mid-bench queries silently recompute
  // whole upstream pipelines (q53 paid a full q41 re-run). The container
  // has 128 GiB; 16 GiB keeps every cache resident with headroom.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
  .flatMap(_.split("\\s+").toSeq).filter(_.nonEmpty)
