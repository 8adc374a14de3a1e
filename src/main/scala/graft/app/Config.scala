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
    landingCompactThreshold: Int = 0,
    /** Database-pattern runs commit landing + catalog run-record (and
      * with it the extraction watermark) in ONE linked-root swing —
      * [[TransactionalIngest]] — closing the reference's
      * crash-between-write-and-catalog window. Requires atomicLanding;
      * incremental-extraction assets only (full extracts are
      * overwrite-per-run, a different commit shape). */
    transactionalCatalog: Boolean = false) {

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
        p.getProperty("landing.compact.threshold", "0").toInt,
      transactionalCatalog =
        p.getProperty("landing.transactional", "false").toBoolean)
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

  /** Binary secret payload (the reference's SecretBinary branch,
    * `dataIngestionUtils.py:113-115`): raw decoded bytes, or None when the
    * secret is absent or string-typed. Backends without a binary notion
    * return None. */
  def secretBinary(name: String): Option[Array[Byte]] = None

  /** The reference's per-source secret name scheme
    * (`dataIngestionUtils.py:71`). */
  def dbSecretName(fmPrefix: String, srcSysId: Int): String =
    s"$fmPrefix-ingstn-db-secrets-$srcSysId"

  /** The reference's per-source DB password lookup: secret
    * `{fmPrefix}-ingstn-db-secrets-{srcSysId}`, key = srcSysId
    * (`dataIngestionUtils.py:78-85,100-110`). */
  def dbPassword(fmPrefix: String, srcSysId: Int): Option[String] =
    secret(dbSecretName(fmPrefix, srcSysId)).get(srcSysId.toString)
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

/** File-backed emulation of the Secrets Manager DATA MODEL the reference
  * consumes (`/root/reference/ingestion/utils/dataIngestionUtils.py:70-115`,
  * `pg_connect.py:41-73`): secret `<name>` lives at `<dir>/<name>.secret`,
  * whose content is the GetSecretValue response body — a JSON object
  * carrying either `SecretString` (itself a JSON-encoded flat string map,
  * e.g. the control store's host/port/username/password/dbname or the
  * per-source `{"<src_sys_id>": "<password>"}`) or `SecretBinary`
  * (base64, decoded to raw bytes exactly as `dataIngestionUtils.py:113-115`
  * does). No AWS SDK in the sandbox — the emulation proves the key scheme
  * and both decode paths; a cloud deployment swaps in an SDK-backed
  * implementation of the same trait.
  */
final class SecretsStoreCredentialProvider(dir: String) extends CredentialProvider {

  private def responseBody(name: String): Option[Map[String, String]] = {
    val f = new java.io.File(dir, s"$name.secret")
    if (!f.exists()) None
    else Some(FlatJson.parse(java.nio.file.Files.readString(f.toPath)))
  }

  /** The SecretString branch: the inner payload parsed as a flat map
    * (`dataIngestionUtils.py:108-111`: `json.loads` then key lookup). */
  def secret(name: String): Map[String, String] =
    responseBody(name).flatMap(_.get("SecretString"))
      .map(FlatJson.parse).getOrElse(Map.empty)

  /** The SecretBinary branch: base64-decoded raw bytes
    * (`dataIngestionUtils.py:113-115`). None when the secret is absent or
    * string-typed — mirroring the reference's either/or response shape. */
  override def secretBinary(name: String): Option[Array[Byte]] =
    responseBody(name).flatMap(_.get("SecretBinary"))
      .map(java.util.Base64.getDecoder.decode)
}

/** Minimal flat-JSON-object codec for secret payloads: `{"k": "v", ...}`
  * with string keys and string/number/bool/null values (values coerced to
  * their literal text; nulls dropped). Handles the full JSON string escape
  * set including \uXXXX. Deliberately NOT a general JSON parser — secrets
  * in the reference are flat maps, and the engine takes no JSON library
  * dependency. */
private[app] object FlatJson {

  def parse(s: String): Map[String, String] = {
    var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def fail(msg: String) =
      throw new IllegalArgumentException(s"bad secret JSON at $i: $msg")
    def expect(c: Char): Unit = { ws(); if (i >= s.length || s(i) != c) fail(s"expected '$c'"); i += 1 }
    def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          if (i >= s.length) fail("dangling escape")
          s(i) match {
            case '"' => b += '"'; case '\\' => b += '\\'; case '/' => b += '/'
            case 'b' => b += '\b'; case 'f' => b += '\f'; case 'n' => b += '\n'
            case 'r' => b += '\r'; case 't' => b += '\t'
            case 'u' =>
              if (i + 4 >= s.length) fail("truncated \\u")
              b += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case c => fail(s"bad escape \\$c")
          }
        } else b += s(i)
        i += 1
      }
      expect('"')
      b.result()
    }
    def scalar(): Option[String] = {
      ws()
      if (i < s.length && s(i) == '"') Some(str())
      else {
        val start = i
        while (i < s.length && !",}".contains(s(i)) && !s(i).isWhitespace) i += 1
        s.substring(start, i) match {
          case "null" => None
          case "" => fail("empty value")
          case lit => Some(lit)
        }
      }
    }
    val out = Map.newBuilder[String, String]
    expect('{')
    ws()
    if (i < s.length && s(i) == '}') { i += 1; return out.result() }
    var more = true
    while (more) {
      val k = str()
      expect(':')
      scalar().foreach(v => out += k -> v)
      ws()
      if (i < s.length && s(i) == ',') { i += 1; ws() }
      else { expect('}'); more = false }
    }
    out.result()
  }
}
