package graft.catalog

import java.sql.{DriverManager, Timestamp}
import org.scalatest.funsuite.AnyFunSuite
import graft.model._

class MetadataStoreSpec extends AnyFunSuite {

  private def entry(execId: String, assetId: Int, wm: Option[Timestamp]) =
    CatalogEntry(execId, 1, assetId, CatalogEntry.StatusNotStarted,
      CatalogEntry.StatusNotStarted, CatalogEntry.StatusNotStarted,
      "file:///raw", "", Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-01 00:00:00"), wm)

  test("in-memory store: highest watermark skips NULLs and picks the max") {
    val st = new InMemoryMetadataStore()
    assert(st.highestWatermark(7).isEmpty)
    st.insertCatalogEntry(entry("e1", 7, Some(Timestamp.valueOf("2024-01-10 00:00:00"))))
    st.insertCatalogEntry(entry("e2", 7, None)) // full-mode run: NULL watermark
    st.insertCatalogEntry(entry("e3", 7, Some(Timestamp.valueOf("2024-01-05 00:00:00"))))
    st.insertCatalogEntry(entry("e4", 99, Some(Timestamp.valueOf("2025-01-01 00:00:00"))))
    assert(st.highestWatermark(7).contains(Timestamp.valueOf("2024-01-10 00:00:00")))
  }

  test("in-memory store: status updates flip only the named column") {
    val st = new InMemoryMetadataStore()
    st.insertCatalogEntry(entry("e1", 7, None))
    st.updateCatalogStatus("e1", "dq_validation", "passed")
    val e = st.catalogEntries(7).head
    assert(e.dqValidation == "passed")
    assert(e.dataMasking == CatalogEntry.StatusNotStarted)
    assertThrows[IllegalArgumentException](
      st.updateCatalogStatus("e1", "exec_id", "hack"))
  }

  // ---- the same contract against a real JDBC engine (embedded Derby) ----

  private lazy val derby: JdbcMetadataStore = {
    val url = "jdbc:derby:memory:graftmeta;create=true"
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("""create table source_system_ingstn_atrbts(
      src_sys_id int, ingstn_pattern varchar(20), db_type varchar(20),
      db_hostname varchar(100), db_username varchar(50), db_schema varchar(50),
      db_port int, db_name varchar(50), ingstn_src_bckt_nm varchar(100))""")
    st.execute("""create table data_asset_ingstn_atrbts(
      asset_id int, src_table_name varchar(100), src_sql_query varchar(500),
      trigger_mechanism varchar(20), ext_method varchar(20), ext_col varchar(50))""")
    st.execute("""create table data_asset_catalogs(
      exec_id varchar(100) not null, src_sys_id int, asset_id int not null,
      dq_validation varchar(20), data_publish varchar(20), data_masking varchar(20),
      src_file_path varchar(500), s3_log_path varchar(500),
      proc_start_ts timestamp, created_ts timestamp, last_ext_time timestamp,
      constraint data_asset_catalogs_run_uq unique (exec_id, asset_id))""")
    st.execute("""insert into source_system_ingstn_atrbts values
      (1, 'database', 'postgres', 'dbhost', 'svc', 'public', 5432, 'sales', 'bkt')""")
    st.execute("""insert into data_asset_ingstn_atrbts values
      (7, 'orders', null, 'time_driven', 'incremental', 'updated_at')""")
    c.close()
    new JdbcMetadataStore(url, new java.util.Properties())
  }

  test("jdbc store: metadata lookups hydrate typed rows") {
    val src = derby.sourceSystem(1).get
    assert(src.ingestionPattern == IngestionPattern.Database)
    assert(src.dbType.contains(DbType.Postgres))
    assert(src.dbPort.contains(5432))
    val asset = derby.dataAsset(7).get
    assert(asset.extMethod == ExtractionMethod.Incremental)
    assert(asset.extCol.contains("updated_at"))
    assert(derby.sourceSystem(999).isEmpty)
  }

  test("jdbc store: watermark round-trip with NULL exclusion and update") {
    assert(derby.highestWatermark(7).isEmpty)
    derby.insertCatalogEntry(entry("j1", 7, Some(Timestamp.valueOf("2024-01-10 00:00:00"))))
    derby.insertCatalogEntry(entry("j2", 7, None))
    derby.insertCatalogEntry(entry("j3", 7, Some(Timestamp.valueOf("2024-01-05 00:00:00"))))
    assert(derby.highestWatermark(7).contains(Timestamp.valueOf("2024-01-10 00:00:00")))
    derby.updateCatalogStatus("j1", "data_publish", "done")
    val e = derby.catalogEntries(7).find(_.execId == "j1").get
    assert(e.dataPublish == "done" && e.dqValidation == CatalogEntry.StatusNotStarted)
    // the targeted existence probe (the mirror's idempotence check —
    // one-row JDBC query, never an O(run-history) fetch)
    assert(derby.hasCatalogEntry("j1", 7))
    assert(!derby.hasCatalogEntry("j-missing", 7))
  }

  test("jdbc store: insert-if-absent is atomic under CONCURRENT retries — the unique key resolves the probe race, duplicate-key is success") {
    // sequential: second call no-ops
    assert(derby.insertCatalogEntryIfAbsent(entry("race0", 7, None)))
    assert(!derby.insertCatalogEntryIfAbsent(entry("race0", 7, None)))
    assert(derby.catalogEntries(7).count(_.execId == "race0") == 1)
    // concurrent: N retries of ONE published run race past any probe —
    // exactly one may insert, the rest must see duplicate-key-as-success
    // (never an exception, never a second row)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val gate = new java.util.concurrent.CountDownLatch(1)
    try {
      val fs = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            gate.await()
            derby.insertCatalogEntryIfAbsent(entry("race1", 7, None))
          }
        })
      }
      gate.countDown()
      val inserted = fs.map(_.get()).count(identity)
      assert(inserted == 1, s"exactly one concurrent retry may insert (got $inserted)")
    } finally pool.shutdown()
    assert(derby.catalogEntries(7).count(_.execId == "race1") == 1,
      "concurrent retries must never double-insert the mirror row")
    // same exec_id under a DIFFERENT asset is a distinct run record
    assert(derby.insertCatalogEntryIfAbsent(entry("race1", 8, None)))
  }
}
