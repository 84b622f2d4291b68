ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "snowavspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Soak-tier gating: the full suite runs ~33 min sequentially, past the
// verification window. Multi-minute lifecycle/soak tests are tagged
// graft.SlowTest and excluded from the default `sbt test`; the full tier
// (every assertion, nothing deleted) is `GRAFT_SLOW_TESTS=1 sbt test`.
Test / testOptions ++= (
  if (sys.env.get("GRAFT_SLOW_TESTS").contains("1")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.SlowTest")))
run / fork := true
// Forked run output goes straight to this process's stdout/stderr instead
// of through sbt's logger: the logger prefixes every line with "[info] ",
// which breaks line-oriented JSON parsing of Bench's result line.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // ~60 queries × several whole-stage-codegen classes each overflow the
  // default 240m JIT code cache mid-run — compilation then stops and
  // random queries degrade 5-10× (interpreted execution)
  "-XX:ReservedCodeCacheSize=1g",
)
