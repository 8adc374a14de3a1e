package graft.model

import java.sql.Timestamp

/** Core domain model of the engine.
  *
  * Reproduces the reference's four metadata abstractions (see
  * `/root/reference/ingestion/utils/dataIngestionUtils.py:24-46` and
  * `/root/reference/ingestion/connector/pg_connect.py:288-305`) as typed
  * case classes instead of stringly-typed dict rows. Pure Scala — no Spark
  * dependency — so the catalog and the watermark algorithm are unit-testable
  * without a session.
  */

/** Ingestion pattern dispatch — reference: `dataIngestion.py:25-33`. */
sealed trait IngestionPattern
object IngestionPattern {
  case object Database extends IngestionPattern
  case object File     extends IngestionPattern
  case object Stream   extends IngestionPattern
  def parse(s: String): IngestionPattern = s.trim.toLowerCase match {
    case "database" => Database
    case "file"     => File
    case "stream"   => Stream
    case other => throw new IllegalArgumentException(
      s"unknown ingestion pattern '$other' (expected database|file|stream)")
  }
}

/** Extraction method — reference: `dataIngestionUtils.py:181-194`. */
sealed trait ExtractionMethod
object ExtractionMethod {
  case object Full        extends ExtractionMethod
  case object Incremental extends ExtractionMethod
  def parse(s: String): ExtractionMethod = s.trim.toLowerCase match {
    case "full"        => Full
    case "incremental" => Incremental
    case other => throw new IllegalArgumentException(
      s"unknown extraction method '$other' (expected full|incremental)")
  }
}

/** Source database flavor — reference branches at
  * `dataIngestionUtils.py:132-168`. Each flavor carries its JDBC driver
  * class and URL template. The reference's sqlserver branch interpolates
  * the hostname where the port belongs (`dataIngestionUtils.py:162`) —
  * deliberately fixed here.
  */
sealed abstract class DbType(val name: String, val driver: String) {
  def url(host: String, port: Int, db: String): String
  /** Whether extraction SQL qualifies the table with the schema name.
    * Reference: only the postgres branch does (`dataIngestionUtils.py:138`
    * vs `:148,157,166`). */
  def qualifiesSchema: Boolean = false
}
object DbType {
  case object Postgres extends DbType("postgres", "org.postgresql.Driver") {
    def url(h: String, p: Int, d: String) = s"jdbc:postgresql://$h:$p/$d"
    override def qualifiesSchema = true
  }
  case object MySql extends DbType("mysql", "com.mysql.cj.jdbc.Driver") {
    def url(h: String, p: Int, d: String) = s"jdbc:mysql://$h:$p/$d"
  }
  case object Oracle extends DbType("oracle", "oracle.jdbc.driver.OracleDriver") {
    def url(h: String, p: Int, d: String) = s"jdbc:oracle:thin:@//$h:$p/$d"
  }
  case object SqlServer extends DbType("sqlserver", "com.microsoft.sqlserver.jdbc.SQLServerDriver") {
    def url(h: String, p: Int, d: String) =
      s"jdbc:sqlserver://$h:$p;databaseName=$d"
  }
  /** Seam for embedded/local databases (Derby in the test suite) — NOT one
    * of the reference's four flavors (`dataIngestionUtils.py:132-168`) and
    * not parseable from metadata; constructed explicitly by callers that
    * need a hermetic JDBC target. `fetchFirst` selects the single-row
    * clause style and `tsLiteralFn` the timestamp-literal form (Derby:
    * FETCH FIRST + `TIMESTAMP('...')`). */
  final case class Custom(
      n: String, d: String, urlFn: (String, Int, String) => String,
      fetchFirst: Boolean = false,
      tsLiteralFn: Option[String => String] = None)
      extends DbType(n, d) {
    def url(h: String, p: Int, db: String): String = urlFn(h, p, db)
  }

  val all: Seq[DbType] = Seq(Postgres, MySql, Oracle, SqlServer)
  def parse(s: String): DbType =
    all.find(_.name == s.trim.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown db type '$s'"))
}

/** One row of `source_system_ingstn_atrbts` — fields consumed at
  * `dataIngestionUtils.py:25-32`. */
final case class SourceSystem(
    srcSysId: Int,
    ingestionPattern: IngestionPattern,
    dbType: Option[DbType],
    dbHostname: Option[String],
    dbUsername: Option[String],
    dbSchema: Option[String],
    dbPort: Option[Int],
    dbName: Option[String],
    inboundBucket: Option[String])

/** One row of `data_asset_ingstn_atrbts` — fields consumed at
  * `dataIngestionUtils.py:34-38`. */
final case class DataAsset(
    assetId: Int,
    srcTableName: String,
    srcSqlQuery: Option[String],
    triggerMechanism: TriggerMechanism,
    extMethod: ExtractionMethod,
    extCol: Option[String])

/** time_driven | event_driven — selects the inbound bucket
  * (`dataIngestionUtils.py:197-200`). */
sealed trait TriggerMechanism
object TriggerMechanism {
  case object TimeDriven  extends TriggerMechanism
  case object EventDriven extends TriggerMechanism
  def parse(s: String): TriggerMechanism = s.trim.toLowerCase match {
    case "time_driven"  => TimeDriven
    case "event_driven" => EventDriven
    case other => throw new IllegalArgumentException(
      s"unknown trigger mechanism '$other'")
  }
}

/** One row of `data_asset_catalogs` — the run record / lineage commit
  * point. Fields written at `dataIngestionUtils.py:234-249`. */
final case class CatalogEntry(
    execId: String,
    srcSysId: Int,
    assetId: Int,
    dqValidation: String,
    dataPublish: String,
    dataMasking: String,
    srcFilePath: String,
    s3LogPath: String,
    procStartTs: Timestamp,
    createdTs: Timestamp,
    lastExtTime: Option[Timestamp])

object CatalogEntry {
  val StatusNotStarted = "not started"  // dataIngestionUtils.py:240-242
}

/** The reference's S3 path convention (SURVEY §1.4) — the de-facto storage
  * layout. Builder + parser kept as a total, round-trippable pair
  * (reference recovers the timestamp positionally at
  * `dataIngestionUtils.py:40`).
  */
final case class PathConvention(fmPrefix: String, region: String) {
  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMddHHmmss").withZone(java.time.ZoneOffset.UTC)

  def formatTs(t: java.time.Instant): String = tsFmt.format(t)
  def parseTs(tok: String): Timestamp = Timestamp.valueOf(
    java.time.LocalDateTime.parse(tok,
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")))

  /** Raw-zone landing path — `dl_fmwrk_dag_template.py:11-13`. */
  def rawLanding(srcSysId: Int, assetId: Int, ts: String): String =
    s"s3://$fmPrefix-$srcSysId-$region/$assetId/init/$ts"

  /** Timestamp token recovered from the landing path. The reference grabs
    * `split("/")[5]` (`dataIngestionUtils.py:40`), which hard-codes the
    * `s3://bucket/asset/init/ts` shape; here the token is the segment
    * after `init/` — same value for s3:// paths, and it also holds for
    * file:// and bare local paths (hermetic tests). */
  def timestampToken(sourcePath: String): String = {
    val segs = sourcePath.split("/").filter(_.nonEmpty)
    val i = segs.lastIndexOf("init")
    require(i >= 0 && i + 1 < segs.length,
      s"path '$sourcePath' has no init/<timestamp> segment")
    segs(i + 1)
  }

  /** Inbound bucket by trigger mechanism — `dataIngestionUtils.py:197-200`. */
  def inboundBucket(t: TriggerMechanism): String = t match {
    case TriggerMechanism.TimeDriven  => s"$fmPrefix-time-drvn-inbound-$region"
    case TriggerMechanism.EventDriven => s"$fmPrefix-evnt-drvn-inbound-$region"
  }

  /** Inbound key prefix — `dataIngestionUtils.py:204,223,257`. */
  def inboundPrefix(srcSysId: Int, assetId: Int): String =
    s"init/$srcSysId/$assetId/"

  /** Post-processing archive prefix — `dataIngestionUtils.py:229,284`. */
  def processedPrefix(srcSysId: Int, assetId: Int): String =
    s"processed/$srcSysId/$assetId/"

  /** Run log path — `dataIngestionUtils.py:244`. */
  def logPath(bucket: String, assetId: Int, execId: String): String =
    s"s3://$bucket/$assetId/logs/$execId/"

  /** Exec id scheme — `dl_fmwrk_dag_template.py:11-12`. */
  def execId(srcSysId: Int, assetId: Int, ts: String): String =
    s"${srcSysId}_${assetId}_$ts"

  /** The S3-event trigger's key parse: exactly 4 segments with a non-empty
    * leaf → (srcSysId, assetId) from positions 1 and 2
    * (`dag_trigerrer.py:10-16`). Returns None for non-conforming keys. */
  def parseEventKey(key: String): Option[(Int, Int)] = {
    val segs = key.split("/", -1)
    if (segs.length == 4 && segs(3).nonEmpty && segs(0) == "init")
      scala.util.Try((segs(1).toInt, segs(2).toInt)).toOption
    else None
  }
}
