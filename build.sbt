ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "airflowpostgrestos3pipelinespark"
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
// Forked run output goes RAW to sbt's stdout instead of through the
// logger, which would prepend "[info] " to every line — Bench/Verify
// emit line-oriented JSON that downstream log-tail parsers consume
// verbatim (seven rounds of bench artifacts failed to parse on that
// prefix alone).
run / outputStrategy := Some(StdoutOutput)
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
  // Pin the JVM default zone too: java.sql.{Date,Timestamp}.valueOf and
  // anything else that consults user.timezone must agree with the UTC
  // session zone on any host (ADVICE r1).
  "-Duser.timezone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // ad-hoc flags for measurement runs (e.g. -Xlog:gc for the
  // small-heap driver-ceiling gate, PERF.md round 11)
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq
    .flatMap(_.split(" ").filter(_.nonEmpty))
