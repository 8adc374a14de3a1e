package graft.app

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.model.PathConvention

/** The trigger contract (`/root/reference/airflow/dag_trigerrer/
  * dag_trigerrer.py:9-30`) against a live embedded HTTP server: method,
  * path scheme, Basic auth header, content type, and JSON body. */
class TriggerSpec extends AnyFunSuite {

  private case class Captured(method: String, path: String,
      auth: String, contentType: String, body: String)

  private def withServer(status: Int)(f: (String, () => Option[Captured]) => Unit): Unit = {
    @volatile var captured: Option[Captured] = None
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      captured = Some(Captured(
        x.getRequestMethod, x.getRequestURI.getPath,
        x.getRequestHeaders.getFirst("Authorization"),
        x.getRequestHeaders.getFirst("Content-type"),
        body))
      val resp = """{"dag_run_id":"r1"}""".getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(status, resp.length)
      x.getResponseBody.write(resp)
      x.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", () => captured)
    finally server.stop(0)
  }

  test("fire POSTs dags/{src}_{asset}_workflow/dagRuns with Basic auth") {
    withServer(200) { (base, captured) =>
      val sink = new HttpTriggerSink(base, "admin", "admin")
      val launched = EventTrigger.fire(
        PathConvention("dl-fw", "us-east-2"), "init/3/7/part-0001.csv", sink)
      assert(launched.contains("3_7_workflow"))
      val c = captured().get
      assert(c.method == "POST")
      assert(c.path == "/api/v1/dags/3_7_workflow/dagRuns")
      // the reference's exact admin:admin header value (dag_trigerrer.py:22)
      assert(c.auth == "Basic YWRtaW46YWRtaW4=")
      assert(c.contentType == "application/json")
      assert(c.body == "{}")
    }
  }

  test("non-conforming keys launch nothing; non-2xx fails loudly") {
    withServer(503) { (base, captured) =>
      val sink = new HttpTriggerSink(base, "admin", "admin")
      val paths = PathConvention("dl-fw", "us-east-2")
      // wrong segment count / wrong root / empty leaf: no HTTP call at all
      assert(EventTrigger.fire(paths, "init/3/7/", sink).isEmpty)
      assert(EventTrigger.fire(paths, "other/3/7/f.csv", sink).isEmpty)
      assert(EventTrigger.fire(paths, "init/3/7/x/f.csv", sink).isEmpty)
      assert(captured().isEmpty)
      // a conforming key against a dead orchestrator propagates the failure
      assertThrows[IllegalStateException](
        EventTrigger.fire(paths, "init/3/7/f.csv", sink))
    }
  }
}
