ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "globalweatheretlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress).
// The r10 host-incident classpath repair (lib-recovered/ substituting
// four disk-rotten jars — see HOST_INCIDENT.md) was retired in r12
// after the host rebuild: the stock jars read cleanly again and were
// verified byte-identical to the recovered copies. Top-level jars
// only (connect-repl/ REPL jars are not application deps).
unmanagedBase := file("/opt/spark/jars")
Compile / unmanagedJars := Attributed.blankSeq((unmanagedBase.value * "*.jar").get)
Test / unmanagedJars := Attributed.blankSeq((unmanagedBase.value * "*.jar").get)
Runtime / unmanagedJars := Attributed.blankSeq((unmanagedBase.value * "*.jar").get)
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked-run output goes raw to stdout (no "[info] " prefix) so the
// driver can json-parse Bench's single output line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// No trailing "[success] Total time" line after Bench's JSON.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
