ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "auncelspark"
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
// Forked run output goes STRAIGHT to this process's stdout instead of
// through sbt's logger: Bench's one-line JSON artifacts arrive bare
// (machine-parseable) rather than wrapped in "[info] " — every prior
// round's BENCH_rN.json had "parsed": null because of that prefix.
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
// forward graft.* tuning properties from the sbt JVM (-J-Dgraft.…=…)
// into forked run/test JVMs, so dev A/B experiments actually reach the app
javaOptions ++= sys.props.toSeq.collect {
  case (k, v) if k.startsWith("graft.") => s"-D$k=$v"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // dozens of codegen'd stages exhaust the default code cache, after
  // which C2 silently stops compiling and hot loops run interpreted
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
)
