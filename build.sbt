ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "knowledgebotspark"
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
// Forked run output must reach stdout raw (no sbt "[info] " prefix):
// the driver parses Bench's single JSON line from stdout.
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
  // local[32] runs 32 concurrent tasks in ONE JVM: execution memory,
  // broadcast relations, and cached intermediates all share this heap.
  // 8g caused stop-the-world full-GC pauses that showed up as random
  // multi-second spikes in unrelated bench queries; 32g (of 128 GiB
  // available) keeps GC off the critical path.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // 46 queries x (warmup + 2 timed runs) of whole-stage-codegen classes
  // in one JVM overflow the default 240m JIT code cache; silent flushing
  // then forces hot generated loops back to the interpreter, showing up
  // as multi-second slowdowns on whichever query runs late. More C2
  // threads drain the compile queue faster after each new plan.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:CICompilerCount=6",
)
