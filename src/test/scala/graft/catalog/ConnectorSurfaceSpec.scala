package graft.catalog

import java.sql.{DriverManager, Timestamp}
import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.sql.QueryBuilder

/** The remaining reference `Connector` surface (SURVEY §2.4 / r1 VERDICT
  * item 8): bulk insert, CSV export, transactions, list-tables, version —
  * run live against embedded Derby. RETURNING is PostgreSQL-flavored and
  * covered as SQL construction. */
class ConnectorSurfaceSpec extends AnyFunSuite {

  private lazy val store: JdbcMetadataStore = {
    val url = "jdbc:derby:memory:graftconn;create=true"
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("""create table data_asset_catalogs(
      exec_id varchar(100), src_sys_id int, asset_id int,
      dq_validation varchar(20), data_publish varchar(20), data_masking varchar(20),
      src_file_path varchar(500), s3_log_path varchar(500),
      proc_start_ts timestamp, created_ts timestamp, last_ext_time timestamp)""")
    c.close()
    new JdbcMetadataStore(url, new java.util.Properties())
  }

  private def entry(execId: String) = CatalogEntry(
    execId, 1, 5, "not started", "not started", "not started",
    "file:///raw", "", Timestamp.valueOf("2024-01-01 00:00:00"),
    Timestamp.valueOf("2024-01-01 00:00:00"), None)

  test("bulk insert lands every row in one batched transaction") {
    store.insertCatalogEntries((1 to 10).map(i => entry(s"bulk$i")))
    assert(store.catalogEntries(5).size == 10)
  }

  test("transactions: a failing scope rolls back all statements") {
    val before = store.catalogEntries(5).size
    assertThrows[RuntimeException] {
      store.withTransaction { c =>
        val st = c.prepareStatement(
          "update data_asset_catalogs set dq_validation = ? where exec_id = ?")
        st.setString(1, "passed"); st.setString(2, "bulk1"); st.executeUpdate()
        throw new RuntimeException("abort")
      }
    }
    assert(store.catalogEntries(5)
      .find(_.execId == "bulk1").get.dqValidation == "not started")
    assert(store.catalogEntries(5).size == before)
  }

  test("csv export writes header + quoted values") {
    val sw = new java.io.StringWriter()
    store.exportCsv(QueryBuilder.Select("data_asset_catalogs",
      cols = Seq("exec_id", "asset_id"), where = Some("exec_id = 'bulk1'")), sw)
    val lines = sw.toString.trim.split("\n")
    assert(lines(0).toLowerCase == "exec_id,asset_id")
    assert(lines(1) == "bulk1,5")
  }

  test("listTables and serverVersion probe the live engine") {
    assert(store.listTables().contains("data_asset_catalogs"))
    assert(store.serverVersion().toLowerCase.contains("derby"))
  }

  test("raw execute runs DDL and DML from builder strings") {
    store.execute(QueryBuilder.create("scratch_t", "id int"))
    assert(store.listTables().contains("scratch_t"))
    assert(store.execute("insert into scratch_t values (1)") == 1)
    store.execute(QueryBuilder.delete("scratch_t", "id = 1"))
    store.execute("drop table scratch_t") // derby has no IF EXISTS form
    assert(!store.listTables().contains("scratch_t"))
  }

  test("RETURNING / insertMany SQL construction (postgres control store)") {
    assert(QueryBuilder.insert("t", Seq("a" -> "1"), returning = Seq("id")) ==
      "INSERT INTO t (a) VALUES (1) RETURNING id")
    assert(QueryBuilder.update("t", Seq("a" -> "2"), "id = 1", Seq("a")) ==
      "UPDATE t SET a = 2 WHERE id = 1 RETURNING a")
    assert(QueryBuilder.delete("t", "id = 1", Seq("id")) ==
      "DELETE FROM t WHERE id = 1 RETURNING id")
    assert(QueryBuilder.insertMany("t",
      Seq(Seq("a" -> "1", "b" -> "'x'"), Seq("a" -> "2", "b" -> "'y'"))) ==
      "INSERT INTO t (a, b) VALUES (1, 'x'), (2, 'y')")
    assertThrows[IllegalArgumentException](
      QueryBuilder.insertMany("t", Seq(Seq("a" -> "1"), Seq("b" -> "2"))))
  }
}
