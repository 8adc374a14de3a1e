package graft.catalog

import java.sql.Timestamp
import graft.model._

/** Control-store port — the reference's `Connector` surface
  * (`/root/reference/ingestion/connector/pg_connect.py`) reduced to the
  * operations the engine actually needs, behind a trait so tests run
  * hermetically (SURVEY §7.4 risk 6). Implementations: [[InMemoryMetadataStore]]
  * for tests, [[JdbcMetadataStore]] for a real RDBMS control store.
  */
trait MetadataStore {
  /** `where src_sys_id = ?` lookup — `dataIngestionUtils.py:48-54`. */
  def sourceSystem(srcSysId: Int): Option[SourceSystem]

  /** `where asset_id = ?` lookup — `dataIngestionUtils.py:56-61`. */
  def dataAsset(assetId: Int): Option[DataAsset]

  /** The high-watermark read: latest non-NULL `last_ext_time` for the
    * asset, i.e. `where asset_id=? and last_ext_time is not null
    * order by last_ext_time desc limit 1` — `dataIngestionUtils.py:120-129`.
    */
  def highestWatermark(assetId: Int): Option[Timestamp]

  /** Run-record insert — the lineage commit point
    * (`dataIngestionUtils.py:234-249`). Called AFTER the landing write
    * succeeds, same ordering as the reference (`dataIngestion.py:26-34`).
    */
  def insertCatalogEntry(e: CatalogEntry): Unit

  /** Downstream stages flip the status columns seeded "not started" —
    * `pg_connect.py:365-384` usage. */
  def updateCatalogStatus(execId: String, column: String, value: String): Unit

  def catalogEntries(assetId: Int): Seq[CatalogEntry]

  /** Does a run record for `execId` exist? The idempotence probe the
    * transactional mirror uses before its best-effort insert. Default
    * scans the asset's rows; JDBC-backed stores override with a
    * targeted one-row query — an O(run-history) fetch per ingest would
    * grow without bound. */
  def hasCatalogEntry(execId: String, assetId: Int): Boolean =
    catalogEntries(assetId).exists(_.execId == execId)

  /** Insert `e` unless a run record for (exec_id, asset_id) already
    * exists — the mirror's probe+insert made ATOMIC, because two
    * concurrent retries of one published run can both pass a separate
    * probe and double-insert. Returns true iff this call inserted.
    * Single-process stores synchronize the pair; the JDBC store backs
    * it with the control store's unique key on (exec_id, asset_id) and
    * treats a duplicate-key rejection as already-present. */
  def insertCatalogEntryIfAbsent(e: CatalogEntry): Boolean =
    if (hasCatalogEntry(e.execId, e.assetId)) false
    else { insertCatalogEntry(e); true }
}

/** Thread-safe in-memory store for tests and local runs. */
final class InMemoryMetadataStore(
    sources: Seq[SourceSystem] = Nil,
    assets: Seq[DataAsset] = Nil) extends MetadataStore {
  private val bySrc = sources.map(s => s.srcSysId -> s).toMap
  private val byAsset = assets.map(a => a.assetId -> a).toMap
  private val entries = scala.collection.mutable.ArrayBuffer[CatalogEntry]()

  def sourceSystem(id: Int): Option[SourceSystem] = bySrc.get(id)
  def dataAsset(id: Int): Option[DataAsset] = byAsset.get(id)

  def highestWatermark(assetId: Int): Option[Timestamp] = synchronized {
    entries.filter(e => e.assetId == assetId && e.lastExtTime.isDefined)
      .flatMap(_.lastExtTime).sortBy(_.getTime).lastOption
  }

  def insertCatalogEntry(e: CatalogEntry): Unit = synchronized { entries += e }

  override def insertCatalogEntryIfAbsent(e: CatalogEntry): Boolean =
    synchronized {
      if (entries.exists(x => x.execId == e.execId && x.assetId == e.assetId))
        false
      else { entries += e; true }
    }

  def updateCatalogStatus(execId: String, column: String, value: String): Unit =
    synchronized {
      val i = entries.indexWhere(_.execId == execId)
      require(i >= 0, s"no catalog entry for exec_id=$execId")
      val e = entries(i)
      entries(i) = column match {
        case "dq_validation" => e.copy(dqValidation = value)
        case "data_masking"  => e.copy(dataMasking = value)
        case "data_publish"  => e.copy(dataPublish = value)
        case other => throw new IllegalArgumentException(
          s"not a status column: $other")
      }
    }

  def catalogEntries(assetId: Int): Seq[CatalogEntry] = synchronized {
    entries.filter(_.assetId == assetId).toSeq
  }
}

/** JDBC-backed store: single-row metadata lookups run as plain driver-side
  * JDBC (a Spark job per lookup would be waste — SURVEY §2.1 S9 note).
  * Uses PreparedStatement binding throughout — never string interpolation —
  * fixing the reference's unquoted-literal bugs
  * (`dataIngestionUtils.py:150,159,168`).
  */
final class JdbcMetadataStore(url: String, props: java.util.Properties)
    extends MetadataStore {
  import java.sql.{Connection, DriverManager}

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url, props)
    try f(c) finally c.close()
  }

  /** Explicit multi-statement transaction scope — the reference's
    * commit/rollback/close surface (`pg_connect.py:75-95`; close commits
    * first, `:81`). Everything in `f` runs on ONE connection with
    * autocommit off; success commits, any throw rolls back and rethrows.
    */
  def withTransaction[A](f: Connection => A): A = withConn { c =>
    c.setAutoCommit(false)
    try { val r = f(c); c.commit(); r }
    catch { case e: Throwable => c.rollback(); throw e }
  }

  /** Bulk catalog insert in one batched round trip — the reference's
    * `insert_many` / `execute_values` (`pg_connect.py:340-363`). */
  def insertCatalogEntries(es: Seq[CatalogEntry]): Unit =
    if (es.nonEmpty) withTransaction { c =>
      val st = c.prepareStatement(InsertCatalogSql)
      es.foreach { e => bindCatalogEntry(st, e); st.addBatch() }
      st.executeBatch()
    }

  /** Control-table CSV export — `retrieve_csv` / `COPY ... TO STDOUT WITH
    * CSV HEADER` (`pg_connect.py:307-328`). Driver-side on purpose:
    * control tables are metadata-sized; a Spark job per export is waste
    * (same reasoning as the S9 lookups). */
  def exportCsv(select: graft.sql.QueryBuilder.Select, out: java.io.Writer): Unit =
    withConn { c =>
      val rs = c.createStatement().executeQuery(select.sql)
      val md = rs.getMetaData
      val n = md.getColumnCount
      def csv(v: String): String =
        if (v == null) ""
        else if (v.exists(ch => ch == ',' || ch == '"' || ch == '\n'))
          "\"" + v.replace("\"", "\"\"") + "\""
        else v
      out.write((1 to n).map(md.getColumnName).mkString(",") + "\n")
      while (rs.next())
        out.write((1 to n).map(i => csv(rs.getString(i))).mkString(",") + "\n")
      out.flush()
    }

  /** Raw statement execution (DDL + DML) — the `Connector.execute` /
    * create/truncate/drop surface (`pg_connect.py:215-267`). */
  def execute(sql: String): Int = withConn { c =>
    val st = c.createStatement()
    if (st.execute(sql)) 0 else st.getUpdateCount
  }

  /** User table list — `pg_connect.py:205-213`, via the portable JDBC
    * catalog API instead of a pg_class query. */
  def listTables(): Seq[String] = withConn { c =>
    val rs = c.getMetaData.getTables(null, null, "%", Array("TABLE"))
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    while (rs.next()) buf += rs.getString("TABLE_NAME").toLowerCase
    buf.toSeq
  }

  /** Server version probe — `pg_connect.py:196-203`. */
  def serverVersion(): String = withConn { c =>
    s"${c.getMetaData.getDatabaseProductName} ${c.getMetaData.getDatabaseProductVersion}"
  }

  private val InsertCatalogSql =
    """insert into data_asset_catalogs
      |(exec_id, src_sys_id, asset_id, dq_validation, data_publish,
      | data_masking, src_file_path, s3_log_path, proc_start_ts,
      | created_ts, last_ext_time)
      |values (?,?,?,?,?,?,?,?,?,?,?)""".stripMargin

  private def bindCatalogEntry(st: java.sql.PreparedStatement, e: CatalogEntry): Unit = {
    st.setString(1, e.execId); st.setInt(2, e.srcSysId); st.setInt(3, e.assetId)
    st.setString(4, e.dqValidation); st.setString(5, e.dataPublish)
    st.setString(6, e.dataMasking); st.setString(7, e.srcFilePath)
    st.setString(8, e.s3LogPath); st.setTimestamp(9, e.procStartTs)
    st.setTimestamp(10, e.createdTs)
    e.lastExtTime match {
      case Some(t) => st.setTimestamp(11, t)
      case None    => st.setNull(11, java.sql.Types.TIMESTAMP)
    }
  }

  def sourceSystem(id: Int): Option[SourceSystem] = withConn { c =>
    val st = c.prepareStatement(
      """select src_sys_id, ingstn_pattern, db_type, db_hostname, db_username,
        |db_schema, db_port, db_name, ingstn_src_bckt_nm
        |from source_system_ingstn_atrbts where src_sys_id = ?""".stripMargin)
    st.setInt(1, id)
    val rs = st.executeQuery()
    if (!rs.next()) None else Some(SourceSystem(
      rs.getInt(1), IngestionPattern.parse(rs.getString(2)),
      Option(rs.getString(3)).map(DbType.parse),
      Option(rs.getString(4)), Option(rs.getString(5)),
      Option(rs.getString(6)),
      { val p = rs.getInt(7); if (rs.wasNull()) None else Some(p) },
      Option(rs.getString(8)), Option(rs.getString(9))))
  }

  def dataAsset(id: Int): Option[DataAsset] = withConn { c =>
    val st = c.prepareStatement(
      """select asset_id, src_table_name, src_sql_query, trigger_mechanism,
        |ext_method, ext_col
        |from data_asset_ingstn_atrbts where asset_id = ?""".stripMargin)
    st.setInt(1, id)
    val rs = st.executeQuery()
    if (!rs.next()) None else Some(DataAsset(
      rs.getInt(1), rs.getString(2), Option(rs.getString(3)),
      TriggerMechanism.parse(rs.getString(4)),
      ExtractionMethod.parse(rs.getString(5)), Option(rs.getString(6))))
  }

  def highestWatermark(assetId: Int): Option[Timestamp] = withConn { c =>
    // ANSI FETCH FIRST, not LIMIT: runs on Postgres (the reference
    // control store) and embedded engines (Derby in the test suite) alike.
    val st = c.prepareStatement(
      """select last_ext_time from data_asset_catalogs
        |where asset_id = ? and last_ext_time is not null
        |order by last_ext_time desc fetch first 1 rows only""".stripMargin)
    st.setInt(1, assetId)
    val rs = st.executeQuery()
    if (rs.next()) Option(rs.getTimestamp(1)) else None
  }

  def insertCatalogEntry(e: CatalogEntry): Unit = withConn { c =>
    val st = c.prepareStatement(InsertCatalogSql)
    bindCatalogEntry(st, e)
    st.executeUpdate()
  }

  /** The probe backed by the control store's UNIQUE KEY on
    * (exec_id, asset_id): the probe stays as the cheap fast path, and
    * the race two concurrent retries can still win together resolves at
    * the constraint — a duplicate-key rejection (SQLState 23xxx / the
    * JDBC integrity subclass) IS the already-present verdict, never an
    * error. Deployments add the key once:
    * `alter table data_asset_catalogs add constraint
    * data_asset_catalogs_run_uq unique (exec_id, asset_id)`. Without
    * it this degrades to the probe-then-insert default — same rows
    * under sequential retries, unprotected only against the concurrent
    * double-insert the constraint exists to close. */
  override def insertCatalogEntryIfAbsent(e: CatalogEntry): Boolean =
    if (hasCatalogEntry(e.execId, e.assetId)) false
    else
      try { insertCatalogEntry(e); true }
      catch {
        case ex: java.sql.SQLException if isDuplicateKey(ex) => false
      }

  private def isDuplicateKey(ex: java.sql.SQLException): Boolean =
    ex.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
      Option(ex.getSQLState).exists(_.startsWith("23"))

  override def hasCatalogEntry(execId: String, assetId: Int): Boolean =
    withConn { c =>
      // scope to the asset like the trait default: exec_id uniqueness
      // across assets is not enforced anywhere (an orchestrator may
      // reuse one run id across a multi-asset run), and an unscoped
      // probe would silently skip asset B's mirror because asset A
      // already recorded the id
      val st = c.prepareStatement(
        """select 1 from data_asset_catalogs
          |where exec_id = ? and asset_id = ?
          |fetch first 1 rows only""".stripMargin)
      st.setString(1, execId)
      st.setInt(2, assetId)
      st.executeQuery().next()
    }

  def updateCatalogStatus(execId: String, column: String, value: String): Unit = {
    require(Set("dq_validation", "data_masking", "data_publish")(column),
      s"not a status column: $column")
    withConn { c =>
      val st = c.prepareStatement(
        s"update data_asset_catalogs set $column = ? where exec_id = ?")
      st.setString(1, value); st.setString(2, execId)
      st.executeUpdate()
    }
  }

  def catalogEntries(assetId: Int): Seq[CatalogEntry] = withConn { c =>
    val st = c.prepareStatement(
      """select exec_id, src_sys_id, asset_id, dq_validation, data_publish,
        |data_masking, src_file_path, s3_log_path, proc_start_ts, created_ts,
        |last_ext_time from data_asset_catalogs where asset_id = ?""".stripMargin)
    st.setInt(1, assetId)
    val rs = st.executeQuery()
    val buf = scala.collection.mutable.ArrayBuffer[CatalogEntry]()
    while (rs.next()) buf += CatalogEntry(
      rs.getString(1), rs.getInt(2), rs.getInt(3), rs.getString(4),
      rs.getString(5), rs.getString(6), rs.getString(7), rs.getString(8),
      rs.getTimestamp(9), rs.getTimestamp(10), Option(rs.getTimestamp(11)))
    buf.toSeq
  }
}
