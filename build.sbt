ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fossilspark"
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
// Forked `run` output goes straight to stdout, NOT through sbt's logger —
// the driver json-parses Bench's single output line and an "[info] " prefix
// breaks it (BENCH_r01.json parsed:null).
run / outputStrategy := Some(StdoutOutput)
// Forward sbt's stdin to the forked run — the REPL reads from it.
run / connectInput := true
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
// Fixed, pre-touched initial heap: on this host a fresh page costs ~25 s
// of system CPU per GB to fault in (hypervisor-backed memory), so a JVM
// whose heap grows lazily pays first-touch page faults INSIDE whatever
// query happens to be running — 32 tasks fault-zeroing new G1 regions
// concurrently measured 8-20x on the first sf0.1-scale row at local[32]
// (r19: dedup_ngram 10.2s -> 1.0s median, ann_pq 20.3s -> 1.5s once the
// heap was pre-touched). Committing and touching a FIXED working heap at
// JVM start moves that cost out of every timed region, and G1 never
// shrinks below -Xms so the pages stay resident. -Xmx keeps the caller's
// full budget as headroom; the touched floor is capped at 12g (measured
// ample for the whole battery) because pre-touching the full 90g budget
// would itself take minutes on this host.
val driverXmx = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
def memMb(s: String): Long = {
  val m = "(?i)^(\\d+)([kmg]?)$".r
  s.trim match {
    case m(n, u) => u.toLowerCase match {
      case "g" => n.toLong * 1024
      case "m" => n.toLong
      case "k" => n.toLong / 1024
      case _ => n.toLong / (1024 * 1024)
    }
    case _ => 8192L
  }
}
val driverXms = sys.env.get("SPARK_DRIVER_MEM_MIN")
  .getOrElse(if (memMb(driverXmx) <= 12288L) driverXmx else "12g")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverXmx",
  s"-Xms$driverXms",
  "-XX:+AlwaysPreTouch",
)
