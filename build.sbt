ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hbasewdspark"
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
// Driver-contract output hygiene (VERDICT r19 item 8): the driver captures
// a ~2 KB stdout tail and tries to parse the bench's one-line JSON out of
// it. With the default LoggedOutput strategy every forked-run line is
// prefixed "[info] " (and sbt appends a "[success] Total time ..." line
// after the run), so no line in the capture is bare JSON and every
// BENCH_r*.json through r19 recorded "parsed": null — even r01, whose
// complete per-query line sat inside the tail. Emit the forked process's
// stdout verbatim and drop the success banner; exit codes (the driver's
// rc) are unaffected, and Bench/Verify/Calib methodology is unchanged.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
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
  // 32g default (was 8g): the driver's forked Bench/Verify JVMs run 189
  // queries x 3 passes over sf0.1 with a generation of persisted frames
  // live — at 8g the storage fraction thrashes (cached frames spill to
  // disk / recompute) and driver artifacts read slower than controlled
  // runs for reasons that have nothing to do with the code. The box has
  // 128 GiB; -Xmx is a cap, not a commitment.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++ // fuzz-soak knobs reach the forked test JVM via env
  sys.env.get("GRAFT_FUZZ_SEED").map(s => s"-Dgraft.fuzz.seed=$s").toSeq ++
  sys.env.get("GRAFT_FUZZ_ROUNDS").map(r => s"-Dgraft.fuzz.rounds=$r").toSeq
