package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.RestRegistryClient

/** Exercises the REST control-plane client against a flaky in-process fake
  * endpoint: transient 500s, duplicate-create 409s, missing devices.
  */
class RestRegistryClientSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val failuresBeforeSuccess = new AtomicInteger(2) // two 500s, then OK
  private val created = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val postCount = new AtomicInteger(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/device/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      (ex.getRequestMethod, path) match {
        case ("GET", "/device/d1") =>
          // realistic document shape: device and owner carry their own
          // `name` fields, which must NOT be reported as transducers
          respond(ex, 200,
            """{"id": "d1", "name": "Boiler 3", "owner": {"name": "ops"},
              | "transducers": [{"name": "Temp"}, {"name": "Hum"}],
              | "properties": {"name": "ignored-too"}}""".stripMargin)
        case ("GET", "/device/missing") =>
          respond(ex, 404, """{"error": "not found"}""")
        case ("POST", p) if p.endsWith("/transducer") =>
          postCount.incrementAndGet()
          if (failuresBeforeSuccess.getAndDecrement() > 0) respond(ex, 500, "flaky")
          else {
            val key = p.stripPrefix("/device/").stripSuffix("/transducer")
            val prev = created.putIfAbsent(key, 1)
            if (prev == null) respond(ex, 201, "created")
            else respond(ex, 409, "already exists") // duplicate create
          }
        case _ => respond(ex, 400, "bad request")
      }
    })
    // the auth-gated half of the fake registry: every /service/ call must
    // carry the reference's HTTPBasicAuth header or get a 401
    server.createContext("/service/", (ex: HttpExchange) => {
      val got = Option(ex.getRequestHeaders.getFirst("Authorization"))
      seenAuth.set(got.orNull)
      if (!got.contains(expectedAuth))
        respond(ex, 401, """{"error": "unauthorized"}""")
      else respond(ex, 200, """[{"id": "d1"}, {"id": "d2"}]""")
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  private val expectedAuth = "Basic " + java.util.Base64.getEncoder
    .encodeToString("svc1:s3cret".getBytes("UTF-8"))
  private val seenAuth = new java.util.concurrent.atomic.AtomicReference[String]()

  override def afterAll(): Unit = server.stop(0)

  private def client = new RestRegistryClient(base, maxAttempts = 5, backoffMs = 1)

  test("device lookup parses ONLY the transducers array; 404 maps to None") {
    // the fake doc carries device/owner/properties `name` fields too —
    // none of them may leak into the transducer list
    assert(client.deviceTransducers("d1") == Seq("temp", "hum"))
    assert(client.getDevice("missing").isEmpty)
  }

  test("create body JSON-escapes publisher-controlled transducer names") {
    import graft.streaming.RestRegistryClient.jsonString
    assert(jsonString("""x","injected":true,"y":"""") ==
      "\"x\\\",\\\"injected\\\":true,\\\"y\\\":\\\"\"")
    assert(jsonString("tab\there\nline") == "\"tab\\there\\nline\"")
    assert(jsonString("\u0001") == "\"\\u0001\"")
  }

  test("create retries through transient 500s and treats 409 as success") {
    failuresBeforeSuccess.set(2)
    postCount.set(0)
    client.createTransducer("d7", "temp") // 500, 500, 201 — succeeds via retry
    assert(postCount.get() == 3, s"expected 2 retries then success, got ${postCount.get()} calls")
    client.createTransducer("d7", "temp") // second create -> 409 -> still success
    assert(created.containsKey("d7"))
  }

  test("permanent 4xx fails fast without burning retries") {
    postCount.set(0)
    val e = intercept[java.io.IOException] {
      // /device/x/nope doesn't match the POST route -> deterministic 400
      new RestRegistryClient(base, maxAttempts = 5, backoffMs = 1).getDevice("x/nope")
    }
    assert(e.getMessage.contains("400"))
  }

  test("Basic auth from config keys reaches the endpoint; 401 fails loudly") {
    // the config-derived header is exactly HTTPBasicAuth(service_id,
    // password) — the reference signs every registry call with it
    val headers = GraftConfig.restAuthHeaders(
      Map("service_id" -> "svc1", "password" -> "s3cret"))
    assert(headers == Map("Authorization" -> expectedAuth))
    val authed = new RestRegistryClient(base, maxAttempts = 2, backoffMs = 1,
      headers = headers)
    assert(authed.serviceThings("svc1") == Seq("d1", "d2"))
    assert(seenAuth.get() == expectedAuth, "header must arrive on the wire")
    // an unsigned client is rejected LOUDLY (401 is a permanent 4xx —
    // no silent empty bootstrap, no retry burn)
    val bare = new RestRegistryClient(base, maxAttempts = 2, backoffMs = 1)
    val e = intercept[java.io.IOException](bare.serviceThings("svc1"))
    assert(e.getMessage.contains("401"))
    // no service_id configured -> no header (offline drills)
    assert(GraftConfig.restAuthHeaders(Map.empty).isEmpty)
  }

  test("exhausted retries surface a terminal error") {
    failuresBeforeSuccess.set(1000) // server never recovers
    val e = intercept[java.io.IOException] {
      new RestRegistryClient(base, maxAttempts = 3, backoffMs = 1).createTransducer("d8", "t")
    }
    assert(e.getMessage.contains("500") || e.getMessage.contains("failed after"))
    failuresBeforeSuccess.set(0)
  }
}
