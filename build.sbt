ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datalakeingestionservicespark"
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
// Single source of truth: tools/add_opens.txt (also read by the plain-java
// launchers tools/run_bench.sh and tools/run_scaling.sh — no drift).
val jdk17AddOpens: Seq[String] =
  IO.readLines(file("tools/add_opens.txt"))
    .map(_.trim)
    .filter(l => l.nonEmpty && !l.startsWith("#"))
    .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] with 44 bench queries in one JVM needs headroom: an 8g heap
  // showed GC-pressure outliers (30-76s on queries whose warm cost is ~1.5s)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
