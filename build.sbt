ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hustlespark"
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
// forward stdin to the forked JVM so the Dump REPL works under runMain
run / connectInput := true
// Inherit stdout instead of routing it through sbt's logger: the bench
// metric line must reach the invoking harness UNPREFIXED (sbt's default
// strategy prepends "[info] ", which is what left BENCH_r15.json with
// "parsed": null — its tail parser never saw a line starting with '{').
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
// Heap sizing for the forked mains: 24g default, SPARK_DRIVER_MEM honored
// up to 24g. The sweet spot is MEASURED, same code/protocol/machine
// (r16 full default-tier suite, flag set below in all cases):
//  - 8g: allocation-heavy shingle kernels 10-25% slower under GC pressure
//    (r14 A/B: containment 2.01s@8g vs 1.57s@24g);
//  - 24g: 176.4s / 173.9s (runs A/B);
//  - 32g: 190.6s (run D);
//  - 90g: 212.1s on the day's QUIETEST machine, gc_timed just 3.4s — the
//    oversized heap's background work (concurrent-cycle span, region-set
//    bookkeeping, first-touch commit of fresh regions) lands inside
//    whichever query is being timed, producing the few-catastrophic-rows
//    drift pattern three rounds of records documented.
// A deliberately huge heap for a special run can bypass the clamp via
// SPARK_GRAFT_JVM_EXTRA="-Xmx90g" (appended after, so it wins).
// Fixture-sized default (r18 heap ladder, BENCH_sf10_heap48_r18.json):
// 24g is the measured sweet spot up to sf1 (~200 MB fixtures), but at the
// sf10 tier (~1.8 GB) 48g runs the heavy rows ~12% faster with GC halved —
// per-query working sets (pair aggregates, posting lists) outgrow the
// young-gen. Pick the default by the fixture's on-disk size so big-tier
// runs are honest by default; an explicit SPARK_DRIVER_MEM still wins
// (clamped), SPARK_GRAFT_JVM_EXTRA still overrides everything.
val fixtureDefaultHeap: String = {
  val sfDir = java.nio.file.Paths.get(
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
  val bytes: Long =
    if (!java.nio.file.Files.isDirectory(sfDir)) 0L
    else {
      val s = java.nio.file.Files.walk(sfDir)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum
      finally s.close()
    }
  if (bytes > 500L * 1024 * 1024) {
    println(s"[graft] fixture $sfDir is ${bytes / (1024 * 1024)} MiB " +
      "(> sf1 tier) — defaulting heap to 48g per the r18 heap ladder")
    "48g"
  } else "24g"
}
val benchHeap: String = sys.env.get("SPARK_DRIVER_MEM") match {
 case None => fixtureDefaultHeap // ladder default, not a request — no clamp
 case Some(req) =>
  // normalize every -Xmx suffix (k/m/g/t) to MiB so a request can't dodge
  // the clamp by unit choice; unrecognized shapes are rejected loudly
  // rather than passed through to a confusing JVM launch error
  val s = req.trim.toLowerCase
  val mib: Option[Long] =
    if (s.nonEmpty && s.init.nonEmpty && s.init.forall(_.isDigit))
      s.last match {
        case 'k' => Some(s.init.toLong / 1024)
        case 'm' => Some(s.init.toLong)
        case 'g' => Some(s.init.toLong * 1024)
        case 't' => Some(s.init.toLong * 1024 * 1024)
        case _   => None
      }
    else None
  mib match {
    case None =>
      sys.error(s"SPARK_DRIVER_MEM='$req' is not <digits>[kmgt]; " +
        "use e.g. 24g (values above 24g are clamped — bypass via " +
        "SPARK_GRAFT_JVM_EXTRA=\"-Xmx<size>\")")
    case Some(m) if m > 24576L =>
      // visible at load so a silently-shrunk big run (e.g. a 64g 10x
      // StressScale) is attributable from the sbt log, not a mystery OOM
      println(s"[graft] SPARK_DRIVER_MEM=$req clamped to 24g — the " +
        "measured sweet spot (see NOTES_r16); bypass with " +
        "SPARK_GRAFT_JVM_EXTRA=\"-Xmx" + req + "\"")
      "24g"
    case _ => s
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$benchHeap",
  // The bench protocol calls System.gc() between queries (untimed
  // hygiene so later queries aren't timed under earlier queries' heap
  // debt). As a DEFAULT full STW collection that hygiene cost 54s of a
  // 176s suite run (86% of all GC time; r16 A/B, gc_hygiene_sec in the
  // bench env block) — and at the invoking harness's ~90g heap it was
  // the bulk of 76s. This flag turns explicit GC into a CONCURRENT G1
  // cycle: same reclamation, pauses only at initial-mark/remark.
  // Measured: gc_sec 62.4 -> 7.6 on the identical full suite, total
  // unchanged (176.4 -> 173.9).
  "-XX:+ExplicitGCInvokesConcurrent",
) ++
  // Escape hatch for GC/JIT experiments (A/B flags without editing the
  // build): space-separated JVM flags, applied after the defaults.
  sys.env.get("SPARK_GRAFT_JVM_EXTRA").map(_.split(" ").toSeq.filter(_.nonEmpty))
    .getOrElse(Seq.empty)
