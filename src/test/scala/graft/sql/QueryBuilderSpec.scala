package graft.sql

import org.scalatest.funsuite.AnyFunSuite

class QueryBuilderSpec extends AnyFunSuite {
  import QueryBuilder._

  test("select composes cols/where/order/limit/offset") {
    val sql = Select("t", Seq("a", "b"), Some("a > 1"),
      Seq(("a", true), ("b", false)), Some(10), Some(5)).sql
    assert(sql ==
      "SELECT a, b FROM t WHERE a > 1 ORDER BY a ASC, b DESC LIMIT 10 OFFSET 5")
  }

  test("empty column list means *") {
    assert(Select("t").sql == "SELECT * FROM t")
  }

  test("identifiers are validated, not interpolated blind") {
    assertThrows[IllegalArgumentException](Select("t; drop table x").sql)
    assertThrows[IllegalArgumentException](Select("t", Seq("a, b FROM x --")).sql)
    assertThrows[IllegalArgumentException](
      Select("t", orderBy = Seq(("a'; --", true))).sql)
    assert(ident("schema.table_1") == "schema.table_1")
  }

  test("string literals double embedded quotes") {
    assert(lit("o'brien") == "'o''brien'")
    assert(lit(None) == "NULL")
    assert(lit(Some(3)) == "3")
    assert(lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) ==
      "TIMESTAMP '2024-01-10 00:00:00'")
  }

  test("insert/update/delete shapes match the reference surface") {
    assert(insert("t", Seq("a" -> lit(1), "b" -> lit("x"))) ==
      "INSERT INTO t (a, b) VALUES (1, 'x')")
    assert(update("t", Seq("a" -> lit(2)), "id = 1") ==
      "UPDATE t SET a = 2 WHERE id = 1")
    assert(delete("t", "id = 1") == "DELETE FROM t WHERE id = 1")
    assert(truncate("t") == "TRUNCATE TABLE t")
    assert(drop("t") == "DROP TABLE IF EXISTS t")
  }
}
