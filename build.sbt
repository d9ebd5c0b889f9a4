ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "prefectflowarckgpostgresetlspark"
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
// Forward the forked JVM's stdout verbatim instead of through sbt's
// logger: Bench/Verify print machine-read JSON lines, and the logger's
// "[info] " prefix breaks line-oriented `{...}` parsing downstream.
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
  // NOT 32g: at Xmx >= 32g the JVM drops compressed oops and this
  // row-pointer-heavy workload measured 10x slower (42s vs 4.3s for the
  // same query). Stay well under the 32g cliff.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // A 70-query battery JIT-compiles thousands of generated classes; the
  // 240m default code cache fills mid-battery, the JIT shuts off
  // ("CodeCache is full. Compiler has been disabled."), and every later
  // query runs interpreted — ~2x on scan-shaped queries, 20-70x on the
  // widest codegen plans (measured: q_index_doc 0.9s early-battery vs
  // 60s late-battery, 3s standalone). Size the cache for the battery
  // and let flushing reclaim cold compiled code under pressure.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
