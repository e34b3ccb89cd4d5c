package graft.tools

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.core.Lake
import graft.engine.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTTP query endpoint over the lake — the reference's Streamlit
  * query_interface.py surface (table list, schema browse, free-form SQL
  * with timing and error capture, query_interface.py:82-96) as a
  * dependency-free JSON API on the JDK's built-in HTTP server. A web UI
  * is a client of exactly these four routes:
  *
  *   GET  /health              → {"status":"ok"}
  *   GET  /tables              → {"tables":[…]}
  *   GET  /describe?table=t    → {"table":t,"columns":[{name,type,nullable}…]}
  *   POST /sql   (body = SQL)  → {"columns":[…],"rows":[[…]…],"row_count":n,
  *                                "truncated":bool,"seconds":s}
  *
  * Results are capped (`limit` query param, default 100, max 10 000) the
  * way every SQL gateway caps interactive fetches — an endpoint that
  * collects an unbounded result to the driver is how a 100 TB cluster
  * driver dies. Errors come back as HTTP 400 `{"error": …}` instead of a
  * stack trace (the reference shows the exception message in the page,
  * query_interface.py:93-96).
  *
  * Concurrency: Spark sessions are thread-safe for read queries; each
  * request runs on the server's executor and becomes an independent
  * Spark job (FIFO-scheduled, same as Verify's 4-way parallelism).
  *
  * Usage: sbt "runMain graft.tools.HttpQueryServer [sfDir] [port]"
  */
object HttpQueryServer {

  def main(args: Array[String]): Unit = {
    val dir =
      if (args.nonEmpty && args.head.startsWith("/")) args.head
      else "/root/testdata/sf0.001"
    val port = args.drop(if (args.headOption.exists(_.startsWith("/"))) 1 else 0)
      .headOption.map(_.toInt).getOrElse(8090)
    val spark = graft.core.SparkSessionFactory.local("graft-http")
    GraftFunctions.register(spark)
    val lake = Lake(spark, dir)
    lake.registerViews()
    val server = start(spark, lake, port)
    println(s"graft query endpoint listening on :${server.getAddress.getPort}")
    Thread.currentThread().join() // serve until killed
  }

  /** Start a server (port 0 = ephemeral, for tests). Caller stops it.
    * Binds LOOPBACK only: the endpoint executes arbitrary SQL against
    * the session with no authentication — exposing it beyond the host
    * is a deployment decision that belongs behind a real gateway, not a
    * default. */
  def start(spark: SparkSession, lake: Lake, port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))

    server.createContext("/health", (ex: HttpExchange) =>
      respond(ex, 200, """{"status":"ok"}"""))

    server.createContext("/tables", (ex: HttpExchange) =>
      handled(ex) {
        val names = lake.tableNames.sorted.map(jstr).mkString("[", ",", "]")
        (200, s"""{"tables":$names}""")
      })

    server.createContext("/describe", (ex: HttpExchange) =>
      handled(ex) {
        val table = params(ex).getOrElse("table",
          throw new IllegalArgumentException("missing ?table="))
        val cols = lake.table(table).schema.fields.map(f =>
          s"""{"name":${jstr(f.name)},"type":${jstr(f.dataType.simpleString)},""" +
            s""""nullable":${f.nullable}}""").mkString("[", ",", "]")
        (200, s"""{"table":${jstr(table)},"columns":$cols}""")
      })

    server.createContext("/sql", (ex: HttpExchange) =>
      handled(ex) {
        val sql = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        require(sql.trim.nonEmpty, "empty SQL body")
        val limit = params(ex).get("limit").map(_.toInt).getOrElse(100).min(10000)
        val t0 = System.nanoTime()
        val df = spark.sql(sql)
        val (body, n, truncated) = render(df, limit)
        val secs = (System.nanoTime() - t0) / 1e9
        (200, s"""{"columns":${cols(df)},"rows":$body,"row_count":$n,""" +
          s""""truncated":$truncated,"seconds":$secs}""")
      })

    server.start()
    server
  }

  /** limit+1 fetch: the cap reaches the PLAN (CollectLimit — no full
    * materialization), and the extra row detects truncation honestly. */
  private def render(df: DataFrame, limit: Int): (String, Int, Boolean) = {
    val rows = df.limit(limit + 1).collect()
    val truncated = rows.length > limit
    val shown = if (truncated) rows.take(limit) else rows
    val body = shown.map(r =>
      (0 until r.length).map(i => jval(if (r.isNullAt(i)) null else r.get(i)))
        .mkString("[", ",", "]")).mkString("[", ",", "]")
    (body, shown.length, truncated)
  }

  private def cols(df: DataFrame): String =
    df.columns.map(jstr).mkString("[", ",", "]")

  /** Route a handler's (status, json) — or its exception as HTTP 400. */
  private def handled(ex: HttpExchange)(body: => (Int, String)): Unit = {
    val (code, payload) =
      try body
      catch {
        case e: Exception =>
          (400, s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.toString).take(500))}}""")
      }
    respond(ex, code, payload)
  }

  private def respond(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&").toSeq)
      .flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) =>
            Some(k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8))
          case _ => None
        }
      }.toMap

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** JSON scalar: numbers/booleans bare, null, everything else (strings,
    * dates, timestamps, decimals, arrays rendered via toString) quoted —
    * a browse/debug surface, not a typed wire protocol. */
  private def jval(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: java.math.BigDecimal => d.toPlainString // SQL DECIMAL is a number
    case d: Double => if (d.isNaN || d.isInfinite) jstr(d.toString) else d.toString
    case f: Float => if (f.isNaN || f.isInfinite) jstr(f.toString) else f.toString
    case other => jstr(String.valueOf(other))
  }
}
