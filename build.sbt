ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "squirtlespark"
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
// Forked runs default to LoggedOutput, which prefixes every stdout line
// with "[info] " — that breaks machine parsing of Bench's one-line JSON
// (the driver's bench harness stores parsed:null every round). StdoutOutput
// passes the child's stdout/stderr through verbatim.
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
  // 24g, not 8g: local[32] runs 32 concurrent vectorized parquet
  // readers in ONE JVM — at 8g the bench's parallel-scan stages spent
  // 0.8+ s/stage in GC (task run-vs-cpu gap 300-450‰, QTasks round 15);
  // at 24g the same stages read zero GC. The sandbox has 128 GiB;
  // 0.75 g/core matches guide §5's executor-sizing posture.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
