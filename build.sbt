ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkconnectorsspark"
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
  // local[32] on one JVM: the driver heap IS the cluster memory. Fixed
  // Xms=Xmx + pre-touch so the heap never grows/shrinks mid-sweep, and
  // moderate (20g, box has 128 GiB) rather than huge: with -Xmx48g the
  // old-gen NEVER filled, so GC never ran, so Spark's GC-triggered
  // ContextCleaner never released accumulated broadcasts/shuffles.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  "-XX:+AlwaysPreTouch",
  // ~170 queries x 2 passes of whole-stage codegen overflow the default
  // 240 MB JIT code cache mid-run; once it fills, compilation stops and
  // trivial queries go 10-20x slower (interpreted serialization loops).
  "-XX:ReservedCodeCacheSize=1g",
  // THE r3 bench-stall fix. A long sweep churns thousands of generated
  // classes through megamorphic core methods (ArrayData.toArray,
  // InternalRow accessors, ObjectStream internals); each new shape
  // deoptimizes them, and once a method passes HotSpot's recompilation
  // cutoff (default 400) it is made not-compilable and runs INTERPRETED
  // forever — measured 30-150x: q_complex_types 1.6s pass-1 vs 55s
  // pass-2 with zero GC, thread dumps showing interpreted eval /
  // ObjectInputStream loops. -1 disables the cutoffs so hot methods are
  // always eligible for recompilation.
  "-XX:PerMethodRecompilationCutoff=-1",
  "-XX:PerBytecodeRecompilationCutoff=-1",
)
