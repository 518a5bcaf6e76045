package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI entry point (SURVEY §3.1 #1 CliDriver): a child JVM runs
  * `graft.tools.GraftCli` exactly as a user would invoke `hive -e` /
  * `hive -f`, and the spec asserts on its stdout. Statement splitting
  * is unit-tested in-process. */
class GraftCliSpec extends AnyFunSuite {

  private def runCli(args: Seq[String]): (Int, String) = {
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
      "graft.tools.GraftCli") ++ args
    val out = new StringBuilder
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val src = scala.io.Source.fromInputStream(p.getInputStream)
    try src.getLines().foreach { l => out.append(l).append('\n') }
    finally src.close()
    (p.waitFor(), out.toString)
  }

  test("statement splitting: top-level semicolons, quotes, comments") {
    import graft.tools.GraftCli.statements
    assert(statements("SELECT 1; SELECT 2") == Seq("SELECT 1", "SELECT 2"))
    assert(statements("SELECT 'a;b'; SELECT 2") ==
      Seq("SELECT 'a;b'", "SELECT 2"))
    assert(statements("-- comment\nSELECT 1;\n# more\nSELECT 2;") ==
      Seq("SELECT 1", "SELECT 2"))
    assert(statements("SELECT `weird;col` FROM t") ==
      Seq("SELECT `weird;col` FROM t"))
    // trailing comment after code: the ';' inside the comment must not
    // split, and the comment itself is stripped
    assert(statements("SELECT 1 -- note; not a statement\n; SELECT 2") ==
      Seq("SELECT 1", "SELECT 2"))
    assert(statements("SELECT 1; -- tail comment, no newline") ==
      Seq("SELECT 1"))
    // mid-line '#' is NOT a comment (only line-start, shell-style)...
    assert(statements("SELECT 'a' AS `x#y`; SELECT 2") ==
      Seq("SELECT 'a' AS `x#y`", "SELECT 2"))
    // ...and '--' inside quotes is literal
    assert(statements("SELECT '--not a comment; really'") ==
      Seq("SELECT '--not a comment; really'"))
  }

  test("variable substitution: namespaces, nesting cap, unresolved pass-through") {
    import graft.tools.GraftCli.substitute
    val spark = LocalSpark.spark
    val hc = Map("day" -> "2024-01-01")
    val hv = Map("tbl" -> "orders", "alias" -> "${tbl}", "loop" -> "${loop}")
    assert(substitute("SELECT * FROM ${tbl} WHERE ds='${hiveconf:day}'", hc, hv, spark)
      == "SELECT * FROM orders WHERE ds='2024-01-01'")
    assert(substitute("FROM ${hivevar:tbl}", hc, hv, spark) == "FROM orders")
    // nested: ${alias} -> ${tbl} -> orders
    assert(substitute("FROM ${alias}", hc, hv, spark) == "FROM orders")
    // self-reference terminates at the 40-round cap, verbatim
    assert(substitute("FROM ${loop}", hc, hv, spark) == "FROM ${loop}")
    // unresolved names pass through verbatim (reference warns + continues)
    assert(substitute("SELECT '${nope:x}' || '${missing}'", hc, hv, spark)
      == "SELECT '${nope:x}' || '${missing}'")
    // system: namespace reads JVM properties
    sys.props("graft.cli.test") = "zz"
    assert(substitute("-- ${system:graft.cli.test}", hc, hv, spark) == "-- zz")
  }

  test("-f parameterized script: --hiveconf/-d variables expand end-to-end") {
    val script = java.nio.file.Files.createTempFile("graft_cli_vars", ".sql")
    java.nio.file.Files.writeString(script,
      """-- the canonical migrating shape: hive -f etl.sql -d tbl=... --hiveconf cutoff=...
        |SELECT r_regionkey, r_name FROM ${tbl}
        |WHERE r_regionkey < ${hiveconf:cutoff}
        |ORDER BY r_regionkey;
        |SELECT '${unresolved}' AS echo;
        |""".stripMargin)
    val (rc, out) = runCli(Seq(
      "-f", script.toString, "--sf", LocalSpark.sf,
      "-d", "tbl=region", "--hiveconf", "cutoff=2"))
    assert(rc == 0, s"cli failed (rc=$rc):\n${out.takeRight(4000)}")
    val lines = out.linesIterator.toSeq
    assert(lines.contains("0\tAFRICA") && lines.contains("1\tAMERICA"), out)
    assert(!lines.exists(_.startsWith("2\t")), out)
    // an unresolved reference reaches the engine verbatim
    assert(lines.contains("${unresolved}"), out)
  }

  test("--hiveconf hive.variable.substitute=false disables expansion") {
    val (rc, out) = runCli(Seq(
      "-e", "SELECT '${x}' AS echo", "-d", "x=BOOM",
      "--hiveconf", "hive.variable.substitute=false"))
    assert(rc == 0, s"cli failed (rc=$rc):\n${out.takeRight(4000)}")
    assert(out.linesIterator.contains("${x}"), out)
  }

  test("SOURCE command and -i init script: CliDriver composition surface") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_src")
    // init script: set up the view the main script's fragment uses
    java.nio.file.Files.writeString(dir.resolve("init.sql"),
      "CREATE OR REPLACE TEMP VIEW two AS SELECT 2 AS v;\n")
    // sourced fragment: referenced from the main script via ${dir}
    java.nio.file.Files.writeString(dir.resolve("common.sql"),
      "SELECT 40 + v AS answer FROM two;\n")
    java.nio.file.Files.writeString(dir.resolve("main.sql"),
      "SOURCE ${dir}/common.sql;\n")
    val (rc, out) = runCli(Seq(
      "-f", s"$dir/main.sql", "-i", s"$dir/init.sql", "-d", s"dir=$dir"))
    assert(rc == 0, s"cli failed (rc=$rc):\n${out.takeRight(4000)}")
    assert(out.linesIterator.contains("42"), out)
  }

  test("--database issues USE before init files and the script (CliDriver order)") {
    // a nonexistent database fails the run — proof the flag really
    // issues USE (Hive's processSelectDatabase runs before init files,
    // so the database must pre-exist)
    val (rcBad, _) = runCli(Seq("-e", "SELECT 1", "--database", "graft_no_such_db"))
    assert(rcBad != 0)
    val (rc, out) = runCli(Seq(
      "-e", "SELECT current_database()", "--database", "default"))
    assert(rc == 0, out.takeRight(2000))
    assert(out.linesIterator.contains("default"), out)
  }

  test("SOURCE cycle fails loudly at the depth cap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_cycle")
    java.nio.file.Files.writeString(dir.resolve("a.sql"),
      s"SOURCE $dir/a.sql;\n")
    val (rc, out) = runCli(Seq("-f", s"$dir/a.sql"))
    assert(rc != 0)
    assert(out.contains("SOURCE nesting"), out.takeRight(2000))
  }

  test("dfs and ! shell commands: processLine's non-SQL dispatches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_dfs")
    java.nio.file.Files.writeString(dir.resolve("probe.txt"), "hi\n")
    // dfs -ls lists through FsShell; !cat runs a shell pipeline; a
    // failing shell command aborts the run non-zero
    val (rc, out) = runCli(Seq(
      "-e", s"dfs -ls $dir; !cat $dir/probe.txt; SELECT 7 AS ok"))
    assert(rc == 0, out.takeRight(4000))
    assert(out.contains("probe.txt"), out)
    assert(out.contains("hi"), out)
    assert(out.linesIterator.contains("7"), out)
    val (rcBad, outBad) = runCli(Seq("-e", "!false; SELECT 1"))
    assert(rcBad != 0)
    assert(outBad.contains("shell command failed"), outBad.takeRight(2000))
  }

  test("hive.cli.print.header prints column names; SET toggles it mid-script") {
    val (rc, out) = runCli(Seq(
      "-e", "SELECT 1 AS a, 'x' AS b; SET hive.cli.print.header=false; SELECT 2 AS c",
      "--hiveconf", "hive.cli.print.header=true"))
    assert(rc == 0, out.takeRight(2000))
    val lines = out.linesIterator.toSeq
    assert(lines.contains("a\tb") && lines.contains("1\tx"), out)
    // after SET ...=false the third statement prints no 'c' header
    assert(!lines.contains("c"), out)
    assert(lines.contains("2"), out)
  }

  test("flag missing its value dies with a usage error, not AIOOBE") {
    val (rc, out) = runCli(Seq("-e"))
    assert(rc != 0)
    assert(out.contains("missing value for -e"), out.takeRight(2000))
  }

  test("-f script runs against the registered tables, CliDriver output shape") {
    val script = java.nio.file.Files.createTempFile("graft_cli", ".sql")
    java.nio.file.Files.writeString(script,
      """-- a migrating hive -f script: DDL-free analytics statements
        |SELECT 19 + 23 AS x;
        |SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey;
        |SELECT NULL AS nothing;
        |""".stripMargin)
    val (rc, out) = runCli(Seq(
      "-f", script.toString, "--sf", LocalSpark.sf))
    assert(rc == 0, s"cli failed (rc=$rc):\n${out.takeRight(4000)}")
    val lines = out.linesIterator.toSeq
    assert(lines.contains("42"), out)
    assert(lines.contains("0\tAFRICA") && lines.contains("4\tMIDDLE EAST"), out)
    assert(lines.contains("NULL"), out)
  }
}
