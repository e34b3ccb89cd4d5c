package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.core.Lake
import graft.tools.HttpQueryServer

/** The HTTP query surface end-to-end on an ephemeral port: table list,
  * schema describe, SQL with row cap + truncation flag, error capture.
  */
class HttpQueryServerSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val server = {
    val lake = Lake(spark, sfDir)
    lake.registerViews()
    HttpQueryServer.start(spark, lake, 0) // ephemeral port
  }
  private lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = {
    try server.stop(0) finally super.afterAll()
  }

  private def get(path: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def postSql(sql: String, q: String = ""): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"$base/sql$q"))
        .POST(HttpRequest.BodyPublishers.ofString(sql)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("health and table list") {
    assert(get("/health") === (200, """{"status":"ok"}"""))
    val (code, body) = get("/tables")
    assert(code === 200)
    for (t <- Seq("lineitem", "orders", "customer", "documents", "embeddings"))
      assert(body.contains("\"" + t + "\""), s"missing $t in $body")
  }

  test("describe returns the schema with types") {
    val (code, body) = get("/describe?table=orders")
    assert(code === 200)
    assert(body.contains(""""name":"o_orderkey","type":"bigint""""))
    val (bad, err) = get("/describe?table=nope")
    assert(bad === 400 && err.contains("error"))
  }

  test("sql runs a query with columns, rows, timing") {
    val (code, body) = postSql(
      "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1")
    assert(code === 200)
    assert(body.contains(""""columns":["o_orderstatus","n"]"""))
    assert(body.contains(""""truncated":false"""))
    assert(body.contains(""""seconds":"""))
    assert("\"row_count\":(\\d+)".r.findFirstMatchIn(body)
      .exists(_.group(1).toInt >= 2))
  }

  test("row cap honors ?limit= and reports truncation") {
    val (code, body) = postSql("SELECT l_orderkey FROM lineitem", "?limit=7")
    assert(code === 200)
    assert(body.contains(""""row_count":7"""))
    assert(body.contains(""""truncated":true"""))
  }

  test("bad SQL comes back as a 400 with the engine's message, not a stack trace") {
    val (code, body) = postSql("SELECT FROM nowhere")
    assert(code === 400)
    assert(body.startsWith("""{"error":"""))
    assert(!body.contains("at org.apache.spark"), "stack trace leaked")
  }

  test("null and non-finite doubles serialize as valid JSON") {
    val (code, body) = postSql(
      "SELECT CAST(NULL AS STRING) AS s, CAST('NaN' AS DOUBLE) AS d, 1.5 AS x")
    assert(code === 200)
    assert(body.contains("[null,\"NaN\",1.5]"), body)
  }
}
