package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden-value tests for scalar functions whose semantics DuckDB can't
  * mirror 1:1 (xpath family, Hive-specific date helpers, conv/format) —
  * the Hive-qfile idea (`ql/src/test/queries/clientpositive/udf_*.q`)
  * with expectations inlined. */
class ScalarGoldenSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark

  private def one(sql: String): org.apache.spark.sql.Row =
    spark.sql(s"SELECT $sql").collect()(0)

  test("xpath family") {
    val xml = "'<a><b>1</b><b>2</b><c>txt</c></a>'"
    assert(one(s"XPATH($xml, 'a/b/text()')").getSeq[String](0) == Seq("1", "2"))
    assert(one(s"XPATH_STRING($xml, 'a/c')").getString(0) == "txt")
    assert(one(s"XPATH_INT($xml, 'sum(a/b)')").getInt(0) == 3)
    assert(one(s"XPATH_DOUBLE($xml, 'a/b[2]')").getDouble(0) == 2.0)
    assert(one(s"XPATH_BOOLEAN($xml, 'a/c = \"txt\"')").getBoolean(0))
  }

  test("hive date helpers: next_day, trunc, months_between, utc shifts") {
    assert(one("NEXT_DAY(DATE'2024-01-01', 'FRIDAY')").getDate(0).toString == "2024-01-05")
    assert(one("TRUNC(DATE'2024-02-17', 'MM')").getDate(0).toString == "2024-02-01")
    assert(one("TRUNC(DATE'2024-02-17', 'YEAR')").getDate(0).toString == "2024-01-01")
    assert(one("MONTHS_BETWEEN(DATE'2024-03-31', DATE'2024-01-31')").getDouble(0) == 2.0)
    // session tz is UTC: shifting to UTC is identity, to a zone is not
    assert(one("FROM_UTC_TIMESTAMP(TIMESTAMP'2024-01-01 12:00:00', 'PST')")
      .getTimestamp(0).toString == "2024-01-01 04:00:00.0")
    assert(one("TO_UTC_TIMESTAMP(TIMESTAMP'2024-01-01 04:00:00', 'PST')")
      .getTimestamp(0).toString == "2024-01-01 12:00:00.0")
  }

  test("conv / bin / format_number / str_to_map") {
    assert(one("CONV('ff', 16, 10)").getString(0) == "255")
    assert(one("CONV('255', 10, 2)").getString(0) == "11111111")
    assert(one("BIN(10)").getString(0) == "1010")
    assert(one("FORMAT_NUMBER(1234567.891, 2)").getString(0) == "1,234,567.89")
    val m = one("STR_TO_MAP('a:1,b:2', ',', ':')").getMap[String, String](0)
    assert(m("a") == "1" && m("b") == "2")
    assert(one("SENTENCES('Hello there! How are you?')")
      .getSeq[Seq[String]](0).length == 2)
  }

  test("hash/digest family: crc32, sha1, sha2, md5 known vectors") {
    assert(one("CRC32(CAST('abc' AS BINARY))").getLong(0) == 891568578L)
    assert(one("SHA1(CAST('abc' AS BINARY))").getString(0) ==
      "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(one("SHA2(CAST('abc' AS BINARY), 256)").getString(0) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(one("MD5(CAST('abc' AS BINARY))").getString(0) ==
      "900150983cd24fb0d6963f7d28e17f72")
    assert(one("BASE64(CAST('abc' AS BINARY))").getString(0) == "YWJj")
  }

  test("misc parity corners: soundex, levenshtein, initcap, hash stability") {
    assert(one("SOUNDEX('Robert')").getString(0) == "R163")
    assert(one("LEVENSHTEIN('kitten','sitting')").getInt(0) == 3)
    assert(one("INITCAP('apache spark sql')").getString(0) == "Apache Spark Sql")
    // hash() differs from Hive's algorithm by design (SURVEY §2.7) but
    // must be stable within the engine
    assert(one("HASH('x') = HASH('x')").getBoolean(0))
  }
}
