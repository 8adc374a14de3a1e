package graft.app

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("config loads from a properties file and validates required keys") {
    val f = java.nio.file.Files.createTempFile("graft-cfg", ".properties")
    java.nio.file.Files.writeString(f,
      """fm.prefix=dl-fw
        |region=us-east-2
        |control.db.url=jdbc:postgresql://ctrl:5432/meta
        |control.db.user=svc
        |""".stripMargin)
    val cfg = EngineConfig.load(f.toString)
    assert(cfg.fmPrefix == "dl-fw")
    assert(cfg.paths.inboundBucket(graft.model.TriggerMechanism.TimeDriven) ==
      "dl-fw-time-drvn-inbound-us-east-2")
    assert(cfg.controlSecretName == "control-db") // default
  }

  test("missing required keys are rejected at load time") {
    val p = new java.util.Properties()
    p.setProperty("fm.prefix", "x")
    assertThrows[IllegalArgumentException](EngineConfig.fromProps(p))
  }

  test("env credential provider folds secret names to env-var keys") {
    val env = Map(
      "GRAFT_SECRET_DL_FW_INGSTN_DB_SECRETS_3_3" -> "pw3",
      "GRAFT_SECRET_CONTROL_DB_PASSWORD" -> "cpw",
      "UNRELATED" -> "nope")
    val creds = new EnvCredentialProvider(env)
    assert(creds.dbPassword("dl-fw", 3).contains("pw3"))
    assert(creds.secret("control-db") == Map("password" -> "cpw"))
    assert(creds.secret("nothing").isEmpty)
  }

  test("props-file credential provider reads <dir>/<name>.properties") {
    val dir = java.nio.file.Files.createTempDirectory("graft-secrets")
    java.nio.file.Files.writeString(dir.resolve("control-db.properties"),
      "password=s3cret\nhost=ctrl\n")
    val creds = new PropsFileCredentialProvider(dir.toString)
    assert(creds.secret("control-db") ==
      Map("password" -> "s3cret", "host" -> "ctrl"))
    assert(creds.secret("absent").isEmpty)
  }

  test("run logger: timed blocks log and rethrow; buffer ships via relay") {
    val buf = new BufferSink
    val log = new RunLogger(Seq(buf))
    assert(log.timed("ok-step")(41 + 1) == 42)
    assertThrows[RuntimeException](
      log.timed("bad-step")(throw new RuntimeException("boom")))
    val tmp = java.nio.file.Files.createTempDirectory("graft-log").toString
    val relay = new graft.files.FileRelay()
    log.ship(buf, relay, s"$tmp/logs/run.log")
    val shipped = relay.readUtf8(new org.apache.hadoop.fs.Path(s"$tmp/logs/run.log"))
    assert(shipped.contains("ok-step: start"))
    assert(shipped.contains("bad-step: failed: boom"))
  }
}
