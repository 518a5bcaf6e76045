package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hive-metastore-backed catalog (BASELINE.json's prescribed "Spark
  * SQL + Hive metastore" architecture; SURVEY §1.1): the lifecycle
  * runs in TWO CHILD JVMs against one embedded-Derby metastore dir, so
  * "databases/tables/partitions/stats survive an engine restart" is a
  * real cross-process fact, not a same-SharedState illusion. (The
  * in-process route is impossible anyway: the suite's shared local
  * session pins the in-memory catalog for this JVM, and
  * catalogImplementation is a static conf.) */
class MetastoreCatalogSpec extends AnyFunSuite {

  private def runPhase(phase: String, baseDir: String): (Int, String) = {
    val java = s"${sys.props("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.tools.MetastoreLifecycle", phase, baseDir)
    val out = new StringBuilder
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val src = scala.io.Source.fromInputStream(p.getInputStream)
    try src.getLines().foreach { l => out.append(l).append('\n') }
    finally src.close()
    (p.waitFor(), out.toString)
  }

  test("metastore catalog persists DB/table/partitions/view/stats across JVM restarts") {
    val base = java.nio.file.Files.createTempDirectory("graft_ms").toString
    val (rc1, out1) = runPhase("create", base)
    assert(rc1 == 0 && out1.contains("PHASE-OK create"),
      s"create phase failed (rc=$rc1):\n${out1.takeRight(4000)}")
    val (rc2, out2) = runPhase("read", base)
    assert(rc2 == 0 && out2.contains("PHASE-OK read"),
      s"read phase failed (rc=$rc2):\n${out2.takeRight(4000)}")
  }
}
