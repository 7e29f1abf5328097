ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "globalweatheretlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// r10 host-incident repair (HOST_INCIDENT.md): the host disk developed
// bad read extents under four stock jars (SIGBUS on page-in, JVM fatal
// error at class load). CRC-clean byte-identical copies recovered from
// sbt's bg-jobs classpath snapshot live in lib-recovered/ and REPLACE
// the unreadable files on the classpath; the unused connect-repl/
// subtree (REPL-only jars, also on bad extents) is dropped from the
// default recursive glob so the classloader never maps it.
val brokenJars = Set("spark-sql_2.13-4.1.2.jar", "zstd-jni-1.5.7-6.jar",
  "hadoop-client-api-3.4.2.jar", "hive-metastore-2.3.10.jar")
def repairedClasspath(base: File): Seq[Attributed[File]] = {
  val recovered = (file("lib-recovered") * "*.jar").get
  val stock = (base * "*.jar").get.filterNot(f => brokenJars(f.getName))
  Attributed.blankSeq(recovered ++ stock)
}
Compile / unmanagedJars := repairedClasspath(unmanagedBase.value)
Test / unmanagedJars := repairedClasspath(unmanagedBase.value)
Runtime / unmanagedJars := repairedClasspath(unmanagedBase.value)
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
