ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vectordatabaseinrustspark"
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
// Inherit the forked run's stdio instead of logging it: sbt's default
// LoggedOutput prefixes every stdout line with "[info] ", which breaks
// any downstream per-line JSON parse of the bench output (the driver
// capture does exactly that).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // pre-size the heap to the SAME cap (standard Spark driver practice):
  // an adaptive G1 heap shrinks to the live set and then concurrent-
  // marks constantly (A/B'd: 234 vs 138 mark cycles across one bench
  // run), stealing cores from the 32 worker threads. The memory
  // contract is unchanged — max stays 8g unless SPARK_DRIVER_MEM says
  // otherwise.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // dev-only GC diagnostics for the forked JVM (off unless set):
  //   SPARK_GRAFT_GCLOG=/tmp/gc.log sbt "runMain graft.Bench"
  sys.env.get("SPARK_GRAFT_GCLOG").map(p => s"-Xlog:gc*:file=$p").toSeq
