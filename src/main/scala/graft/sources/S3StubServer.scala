package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** In-JVM S3-compatible gateway stub: a path-style object store over HTTP,
  * implementing the protocol subset the engine's object-store path needs —
  * GET (with Range) / HEAD / PUT / DELETE on objects and ListObjectsV2 with
  * `prefix`/`delimiter` on buckets. It plays the role the reference's
  * versitygw gateway plays in its k3d test rig
  * (reference test.sh:40-44, k3d-example/versitygw/statefulset.yaml:17-24):
  * an S3 endpoint with path-style URLs and no TLS, so the store round-trip
  * can execute inside `sbt test` with zero external dependencies.
  *
  * No auth (the reference rig uses static demo credentials; the stub accepts
  * any), objects live in memory — this is a protocol fixture, not a store.
  */
final class S3StubServer(port: Int = 0) {

  private val objects = new ConcurrentHashMap[String, Array[Byte]]()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  server.createContext("/", new HttpHandler {
    def handle(ex: HttpExchange): Unit =
      try route(ex)
      catch { case e: Exception => respond(ex, 500, e.toString.getBytes(StandardCharsets.UTF_8)) }
      finally ex.close()
  })
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
  server.start()

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = server.stop(0)

  def objectCount: Int = objects.size()

  def keys: Seq[String] = objects.keySet().asScala.toSeq.sorted

  /** S3 ETag for a non-multipart object: quoted MD5 hex of the body. */
  private def etagOf(body: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    "\"" + md.digest(body).map("%02x".format(_)).mkString + "\""
  }

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripPrefix("/")
    val query = Option(ex.getRequestURI.getQuery).getOrElse("")
    ex.getRequestMethod match {
      case "PUT" =>
        val body = ex.getRequestBody.readAllBytes()
        // conditional writes, the real S3 contract (2024+): If-None-Match:*
        // = create-only, If-Match:<etag> = compare-and-swap. The compute()
        // runs atomically per key, so two racing conditional PUTs serialize
        // and exactly one wins — the primitive the engine's CAS pointer
        // flip and exact lease are built on.
        val ifNone = Option(ex.getRequestHeaders.getFirst("If-None-Match"))
        val ifMatch = Option(ex.getRequestHeaders.getFirst("If-Match"))
        var failed = false
        objects.compute(path, (_, prev) => {
          val ok = (ifNone, ifMatch) match {
            case (Some("*"), _) => prev == null
            case (_, Some(tag)) => prev != null && etagOf(prev) == tag
            case _ => true
          }
          if (ok) body else { failed = true; prev }
        })
        if (failed) respond(ex, 412, Array.emptyByteArray)
        else {
          ex.getResponseHeaders.set("ETag", etagOf(body))
          respond(ex, 200, Array.emptyByteArray)
        }
      case "DELETE" =>
        objects.remove(path)
        respond(ex, 204, Array.emptyByteArray)
      case "HEAD" =>
        objects.get(path) match {
          case null => respond(ex, 404, Array.emptyByteArray, head = true)
          case o =>
            ex.getResponseHeaders.set("Content-Length", o.length.toString)
            ex.getResponseHeaders.set("ETag", etagOf(o))
            // HEAD: -1 body length means "no body follows"
            ex.sendResponseHeaders(200, -1)
        }
      case "GET" if query.contains("list-type=2") || !path.contains("/") =>
        respond(ex, 200, listXml(path.takeWhile(_ != '/'), query))
      case "GET" =>
        objects.get(path) match {
          case null => respond(ex, 404, Array.emptyByteArray)
          case o =>
            ex.getResponseHeaders.set("ETag", etagOf(o))
            Option(ex.getRequestHeaders.getFirst("Range")) match {
              case Some(r) =>
                // bytes=a-b (inclusive), both bounds always present from our client
                val m = "bytes=(\\d+)-(\\d+)".r.findFirstMatchIn(r).get
                val from = m.group(1).toLong.toInt
                val to = math.min(m.group(2).toLong, o.length - 1L).toInt
                val slice = java.util.Arrays.copyOfRange(o, from, to + 1)
                ex.getResponseHeaders.set("Content-Range", s"bytes $from-$to/${o.length}")
                respond(ex, 206, slice)
              case None => respond(ex, 200, o)
            }
        }
      case _ => respond(ex, 405, Array.emptyByteArray)
    }
  }

  /** ListObjectsV2: path-style `GET /bucket?list-type=2&prefix=p&delimiter=/`.
    * With a delimiter, keys containing it past the prefix roll up into
    * CommonPrefixes, exactly like S3's directory emulation.
    */
  private def listXml(bucket: String, query: String): Array[Byte] = {
    val params = query.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap
    val prefix = params.getOrElse("prefix", "")
    val delimiter = params.get("delimiter").filter(_.nonEmpty)
    val inBucket = objects.keySet().asScala.toSeq.sorted
      .filter(_.startsWith(s"$bucket/")).map(_.stripPrefix(s"$bucket/"))
      .filter(_.startsWith(prefix))
    val (rolled, direct) = delimiter match {
      case Some(d) =>
        val (withDelim, plain) = inBucket.partition(_.drop(prefix.length).contains(d))
        (withDelim.map(k => prefix + k.drop(prefix.length).takeWhile(_ != d.head) + d).distinct, plain)
      case None => (Seq.empty, inBucket)
    }
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val xml = new StringBuilder
    xml ++= """<?xml version="1.0" encoding="UTF-8"?><ListBucketResult>"""
    xml ++= s"<Name>${esc(bucket)}</Name><Prefix>${esc(prefix)}</Prefix><KeyCount>${direct.size + rolled.size}</KeyCount><IsTruncated>false</IsTruncated>"
    direct.foreach { k =>
      val size = objects.get(s"$bucket/$k").length
      xml ++= s"<Contents><Key>${esc(k)}</Key><Size>$size</Size></Contents>"
    }
    rolled.foreach(p => xml ++= s"<CommonPrefixes><Prefix>${esc(p)}</Prefix></CommonPrefixes>")
    xml ++= "</ListBucketResult>"
    xml.toString.getBytes(StandardCharsets.UTF_8)
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte],
      head: Boolean = false): Unit = {
    if (head) ex.sendResponseHeaders(code, -1)
    else {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
      if (body.nonEmpty) { val os = ex.getResponseBody; os.write(body); os.close() }
    }
  }
}
