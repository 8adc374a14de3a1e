package graft.app

import java.util.Properties

/** Typed deployment config — re-expression of the reference's
  * `globalConfig.json` load (`/root/reference/ingestion/dataIngestion.py:
  * 8-17`; fields `ingestion/config/globalConfig.json:1-17`) as a
  * properties file + case class. No JSON library dependency; the five
  * fields the engine consumes are explicit and validated at load time
  * instead of living in a free-form dict.
  */
final case class EngineConfig(
    fmPrefix: String,
    region: String,
    controlDbUrl: String,
    controlDbUser: String,
    /** Name of the control-store secret resolved via [[CredentialProvider]]
      * — mirrors the reference's secret-name config, without AWS. */
    controlSecretName: String,
    /** When true, database-pattern landings commit through
      * [[graft.land.AtomicLanding]] (manifest-pointer snapshots) instead
      * of writing parquet directly into the raw path — closing the
      * reference's partial-write window (`dataIngestion.py:26-34`).
      * Defaults to the reference-compatible direct write. */
    atomicLanding: Boolean = false,
    /** When > 0, [[IngestionJob.maintain]] compacts an atomic table once
      * its live snapshot exceeds this many data dirs (streaming
      * micro-batch appends) and vacuums unreachable files. 0 disables
      * maintenance. */
    landingCompactThreshold: Int = 0) {

  def paths: graft.model.PathConvention =
    graft.model.PathConvention(fmPrefix, region)
}

object EngineConfig {

  def fromProps(p: Properties): EngineConfig = {
    def req(k: String): String = {
      val v = p.getProperty(k)
      require(v != null && v.nonEmpty, s"missing config key: $k")
      v
    }
    EngineConfig(
      fmPrefix = req("fm.prefix"),
      region = req("region"),
      controlDbUrl = req("control.db.url"),
      controlDbUser = p.getProperty("control.db.user", ""),
      controlSecretName = p.getProperty("control.secret.name", "control-db"),
      atomicLanding = p.getProperty("landing.atomic", "false").toBoolean,
      landingCompactThreshold =
        p.getProperty("landing.compact.threshold", "0").toInt)
  }

  def load(path: String): EngineConfig = {
    val p = new Properties()
    val in = new java.io.FileInputStream(path)
    try p.load(in) finally in.close()
    fromProps(p)
  }
}

/** Secrets seam — re-expression of `get_secret()` /
  * `Connector.get_credentials()` (`/root/reference/ingestion/utils/
  * dataIngestionUtils.py:70-115`, `pg_connect.py:41-73`) behind a trait so
  * tests and offline runs never touch a cloud secret store. A secret is a
  * flat string map (the reference's JSON secret payload): the per-source
  * ingestion secret is keyed by src_sys_id; the control-store secret
  * carries host/port/username/password/dbname.
  */
trait CredentialProvider {
  /** The secret payload for `name`, or an empty map if absent. */
  def secret(name: String): Map[String, String]

  /** The reference's per-source DB password lookup: secret
    * `{fmPrefix}-ingstn-db-secrets-{srcSysId}`, key = srcSysId
    * (`dataIngestionUtils.py:78-85,100-110`). */
  def dbPassword(fmPrefix: String, srcSysId: Int): Option[String] =
    secret(s"$fmPrefix-ingstn-db-secrets-$srcSysId").get(srcSysId.toString)
}

/** Environment-variable provider: secret `my-name` key `k` is read from
  * `GRAFT_SECRET_MY_NAME_K` (non-alphanumerics folded to '_'). */
final class EnvCredentialProvider(env: Map[String, String] = sys.env)
    extends CredentialProvider {
  private def fold(s: String) = s.toUpperCase.map(c => if (c.isLetterOrDigit) c else '_')
  def secret(name: String): Map[String, String] = {
    val prefix = s"GRAFT_SECRET_${fold(name)}_"
    env.collect { case (k, v) if k.startsWith(prefix) =>
      k.drop(prefix.length).toLowerCase -> v
    }
  }
}

/** Properties-file provider: secret `name` lives at `<dir>/<name>.properties`. */
final class PropsFileCredentialProvider(dir: String) extends CredentialProvider {
  def secret(name: String): Map[String, String] = {
    val f = new java.io.File(dir, s"$name.properties")
    if (!f.exists()) Map.empty
    else {
      val p = new Properties()
      val in = new java.io.FileInputStream(f)
      try p.load(in) finally in.close()
      import scala.jdk.CollectionConverters._
      p.asScala.toMap
    }
  }
}

/** In-memory provider for tests. */
final class InMemoryCredentialProvider(secrets: Map[String, Map[String, String]])
    extends CredentialProvider {
  def secret(name: String): Map[String, String] = secrets.getOrElse(name, Map.empty)
}
