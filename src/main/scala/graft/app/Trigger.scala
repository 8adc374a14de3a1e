package graft.app

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Where a detected event's pipeline launch goes — the seam between key
  * parsing ([[EventTrigger.handle]]) and the orchestrator's REST API. The
  * reference hardwires an Airflow `dagRuns` POST inside its Lambda
  * (`/root/reference/airflow/dag_trigerrer/dag_trigerrer.py:17-27`);
  * here the same contract is a trait so tests run against an embedded
  * server and offline runs can launch in-process instead.
  */
trait TriggerSink {
  /** Launch one run of `dagId`. Returns the orchestrator's response body.
    * Throws on a non-2xx response — the reference's Lambda silently
    * prints `response.text`, which swallows a dead orchestrator; failing
    * loudly is the engine's behavior everywhere else. */
  def trigger(dagId: String, payload: String = "{}"): String
}

/** The reference's DAG-per-asset naming scheme
  * (`dag_trigerrer.py:15`, `dag_generator.py` placeholder substitution):
  * `{src_sys_id}_{asset_id}_workflow`. */
object TriggerSink {
  def dagId(srcSysId: Int, assetId: Int): String =
    s"${srcSysId}_${assetId}_workflow"
}

/** HTTP implementation of the reference's trigger call
  * (`dag_trigerrer.py:17-27`): POST
  * `{baseUrl}/api/v1/dags/{DAG_ID}/dagRuns` with Basic auth and a JSON
  * payload. JDK HttpClient — no new dependencies. The reference embeds
  * `Basic YWRtaW46YWRtaW4=` (admin:admin) as a literal; credentials here
  * arrive from the [[CredentialProvider]] seam instead of source code.
  */
final class HttpTriggerSink(baseUrl: String, user: String, password: String,
    timeout: Duration = Duration.ofSeconds(30)) extends TriggerSink {

  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()

  private val authHeader: String =
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$user:$password".getBytes(StandardCharsets.UTF_8))

  override def trigger(dagId: String, payload: String): String = {
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"${baseUrl.stripSuffix("/")}/api/v1/dags/$dagId/dagRuns"))
      .timeout(timeout)
      .header("content-type", "application/json")
      .header("authorization", authHeader)
      .header("cache-control", "no-cache")
      .POST(HttpRequest.BodyPublishers.ofString(payload, StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2) throw new IllegalStateException(
      s"trigger $dagId failed: HTTP ${resp.statusCode()} ${resp.body()}")
    resp.body()
  }
}

/** In-process sink for tests and offline runs: records every launch. */
final class RecordingTriggerSink extends TriggerSink {
  val launches = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  override def trigger(dagId: String, payload: String): String = {
    launches += ((dagId, payload)); "{}"
  }
}
