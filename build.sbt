ThisBuild / scalaVersion := "2.13.17"
// Keep sbt's "[success] Total time" line off stdout: the driver parses
// the LAST stdout line of `runMain graft.Bench` as the bench JSON, and
// the success banner after it has made every round's artifact
// unparseable (BENCH_r01–r08 all carry parsed: null).
Global / showSuccess := false
// ...and keep sbt's logger from prefixing the forked JVM's stdout with
// "[info] ": every BENCH_rNN.json through r10 carries parsed:null even
// after the last-line fix, because the driver's JSON parse sees
// "[info] {\"metric\"...}". StdoutOutput makes the forked process
// inherit stdout directly — the contract line reaches the driver bare.
run / outputStrategy := Some(StdoutOutput)
ThisBuild / version := "0.1.0"
name := "axolotlsspark"
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // A 313-query suite generates thousands of whole-stage-codegen
  // classes in ONE JVM; the JDK17 default 240 MB code cache fills
  // mid-suite, the JIT stops compiling, and unrelated queries go
  // interpreted at 20-40x (measured: q137-q24x window of a full
  // suite run). Size the cache for the suite and keep flushing on.
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
)
