package graft.engine

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.InetSocketAddress
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.graftshim.ArrowBridge

/** Network binding for the four [[GraftService]] entry points — the
  * runnable counterpart of the reference's Arrow Flight server
  * (`serve_flight.py:21-377`). This environment ships no flight/gRPC
  * jars, so the listener is HTTP/1.1 on the JDK's built-in
  * `com.sun.net.httpserver` (zero added dependencies) carrying the SAME
  * Arrow IPC record-batch payloads [[ArrowBridge]] produces and consumes;
  * a Flight binding substitutes transport only, not payloads or service
  * calls.
  *
  * Routes (auth via `X-Graft-Client` / `X-Graft-Password` headers, exactly
  * the credentials the reference's middleware checks):
  *
  *  - `PUT  /files/{filename}`         do_put: body = framed Arrow batches
  *  - `GET  /files/{filename}/report`  do_get get_budget_report
  *  - `GET  /files/{filename}/export`  do_get get_full_clean — STREAMED
  *    via [[ArrowBridge.toArrowBatchIterator]], so a full export never
  *    materializes on the driver (chunked transfer encoding)
  *  - `GET  /files`                    do_action list_files (text listing)
  *
  * Framing: each Arrow IPC batch (schema embedded) is preceded by its
  * 4-byte big-endian length; the stream ends at EOF. Auth failures map to
  * 401 with the service's uniform AUTHENTICATION_FAILED (no client-id
  * enumeration), other rejections to 400, unexpected errors to 500.
  */
final class GraftHttpServer(service: GraftService, port: Int = 0) {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  // small fixed pool: each request may run Spark jobs; unbounded request
  // concurrency would just queue on the cluster anyway
  server.setExecutor(Executors.newFixedThreadPool(4))
  server.createContext("/files", (ex: HttpExchange) => handle(ex))

  /** Start listening; returns the bound port (ephemeral when 0). */
  def start(): Int = { server.start(); server.getAddress.getPort }

  def stop(): Unit = server.stop(0)

  private def handle(ex: HttpExchange): Unit =
    try route(ex)
    catch {
      case e: IllegalArgumentException
          if e.getMessage == "AUTHENTICATION_FAILED" =>
        respondText(ex, 401, "AUTHENTICATION_FAILED")
      case e: IllegalArgumentException =>
        respondText(ex, 400, String.valueOf(e.getMessage))
      case e: Throwable =>
        respondText(ex, 500, s"${e.getClass.getSimpleName}")
    } finally ex.close()

  private def route(ex: HttpExchange): Unit = {
    val client = Option(ex.getRequestHeaders.getFirst("X-Graft-Client"))
      .getOrElse("")
    val password = Option(ex.getRequestHeaders.getFirst("X-Graft-Password"))
      .getOrElse("")
    val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
    (ex.getRequestMethod, parts.toList) match {
      case ("GET", List("files")) =>
        val (raw, clean) = service.listFiles(client, password)
        respondText(ex, 200,
          (raw.map("raw/" + _) ++ clean.map("clean/" + _)).mkString("\n"))
      case ("PUT", List("files", filename)) =>
        val batches = readFrames(ex)
        service.uploadArrow(client, password, filename, batches)
        respondText(ex, 200, "OK")
      case ("GET", List("files", filename, "report")) =>
        val batches = service.budgetReportArrow(client, password, filename)
        respondFrames(ex, batches.iterator)
      case ("GET", List("files", filename, "export")) =>
        val export = service.fullExport(client, password, filename)
        respondFrames(ex, ArrowBridge.toArrowBatchIterator(export))
      case _ =>
        respondText(ex, 404, "NOT_FOUND")
    }
  }

  private def readFrames(ex: HttpExchange): Array[Array[Byte]] = {
    val in = new DataInputStream(ex.getRequestBody)
    val out = Array.newBuilder[Array[Byte]]
    var done = false
    while (!done) {
      val len =
        try in.readInt()
        catch { case _: EOFException => done = true; -1 }
      if (!done) {
        require(len >= 0 && len <= (1 << 30), s"bad frame length $len")
        val buf = new Array[Byte](len)
        in.readFully(buf)
        out += buf
      }
    }
    out.result()
  }

  /** Chunked response: batches are written (and for the export, PULLED
    * from the cluster) one at a time — bounded memory end to end.
    */
  private def respondFrames(ex: HttpExchange,
                            batches: Iterator[Array[Byte]]): Unit = {
    ex.getResponseHeaders.set("Content-Type", "application/x-graft-arrow")
    ex.sendResponseHeaders(200, 0) // length 0 => chunked
    val out = new DataOutputStream(ex.getResponseBody)
    try batches.foreach { b => out.writeInt(b.length); out.write(b) }
    finally out.close()
  }

  private def respondText(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    // sendResponseHeaders: >0 fixed length, 0 would mean chunked, -1 no body
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1L else bytes.length.toLong)
    val out = ex.getResponseBody
    try out.write(bytes)
    finally out.close()
  }
}
