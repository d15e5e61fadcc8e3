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
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

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

  test("exhausted retries surface a terminal error") {
    failuresBeforeSuccess.set(1000) // server never recovers
    val e = intercept[java.io.IOException] {
      new RestRegistryClient(base, maxAttempts = 3, backoffMs = 1).createTransducer("d8", "t")
    }
    assert(e.getMessage.contains("500") || e.getMessage.contains("failed after"))
    failuresBeforeSuccess.set(0)
  }
}
