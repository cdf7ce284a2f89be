package graft

import org.scalatest.funsuite.AnyFunSuite

/** MULTI-EXECUTOR validation: forks [[graft.tools.ClusterSmoke]] on
  * `local-cluster[2,2,1024]` — two REAL executor JVMs, so the manifest
  * file index, bloom bitsets, dv mask joins, and column-mapping
  * projections must genuinely serialize off the driver (the suite's
  * shared session is `local[*]`, where a driver-local assumption can
  * hide forever). A second SparkContext cannot share this JVM, hence
  * the fork; the smoke prints CLUSTER_SMOKE OK only after every leg
  * asserted, and asserts the tasks ran on >=2 non-driver executors. */
class ClusterSpec extends AnyFunSuite {

  test("local-cluster[2,2,1024]: versioned read, CoW update, scoped-dv, bloom prune, colmap, partition pruning survive real executor boundaries") {
    // ABSOLUTE entries only: the executor JVMs run from their own work
    // dir, where a relative classes path silently resolves to nothing
    // and every task dies deserializing the first closure
    val cp = sys.props("java.class.path")
      .split(java.io.File.pathSeparator)
      .map(e => new java.io.File(e).getAbsolutePath)
      .mkString(java.io.File.pathSeparator)
    val javaBin = sys.props("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val out = java.nio.file.Files.createTempDirectory("graft_cluster_out").toString
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g",
      "-Dspark.master=local-cluster[2,2,1024]",
      "-Dspark.executor.memory=1g",
      // the executor JVMs are launched by the in-process Worker and
      // need the graft classes on THEIR classpath to deserialize tasks
      s"-Dspark.executor.extraClassPath=$cp",
      "-Dspark.ui.enabled=false",
      "-cp", cp, "graft.tools.ClusterSmoke", out)
    val pb = new ProcessBuilder(cmd: _*)
    // the Worker's executor-launch command builder resolves the Spark
    // jars through SPARK_HOME
    pb.environment().put("SPARK_HOME", "/opt/spark")
    // the launch scripts normally export this; without it the
    // executor command builder walks SPARK_HOME/launcher/target and
    // dies with "Cannot find any build directories"
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    // drain stdout on a DAEMON thread: reading to EOF on the test
    // thread before waitFor would block forever on a hung smoke JVM
    // and turn the 10-minute timeout into dead code
    val buf = new java.lang.StringBuilder
    val drainer = new Thread(() => {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      var line = reader.readLine()
      while (line != null) {
        buf.synchronized { buf.append(line).append('\n') }
        line = reader.readLine()
      }
    }, "cluster-smoke-drain")
    drainer.setDaemon(true)
    drainer.start()
    val finished = p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) p.destroyForcibly()
    drainer.join(10000)
    val outStr = buf.synchronized(buf.toString)
    assert(finished, s"cluster smoke timed out\n${outStr.takeRight(4000)}")
    assert(p.exitValue() == 0 && outStr.contains("CLUSTER_SMOKE OK"),
      s"cluster smoke failed (exit ${p.exitValue()}):\n${outStr.takeRight(6000)}")
  }
}
