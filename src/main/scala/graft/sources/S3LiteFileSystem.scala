package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.{HttpURLConnection, URI, URL}
import java.nio.charset.StandardCharsets

/** Conditional object writes — the S3 conditional-PUT contract
  * (`If-None-Match: *` create-only, `If-Match: <etag>` compare-and-swap).
  * A `FileSystem` implementing this gives the engine EXACT commit
  * primitives on the object tier: [[graft.logs.GraftStore.casWritePointer]]
  * flips the version pointer only if it still holds the version the
  * manifest was built from, closing the lost-update window the optimistic
  * re-check leaves open; where the filesystem doesn't implement this, the
  * caller falls back to re-check + plain PUT (best-effort, as before).
  */
trait ConditionalWrites {
  /** Object content + its entity tag, or None when absent. */
  def readWithTag(p: Path): Option[(Array[Byte], String)]

  /** Atomic conditional PUT: with `ifMatch = Some(tag)` the write succeeds
    * only if the object still carries `tag`; with None only if the object
    * does not exist. False on precondition failure (nothing written).
    */
  def putIfTag(p: Path, data: Array[Byte], ifMatch: Option[String]): Boolean
}

/** Minimal Hadoop `FileSystem` speaking the S3 REST dialect (`s3l://bucket/
  * key`, path-style, no auth) — the client half of the in-sandbox object
  * -store round trip (server half: [[S3StubServer]]). The container ships no
  * hadoop-aws/S3A jars, so this stands in with the SAME semantics the
  * engine's scale story assumes of object stores:
  *
  *  - directories are implicit prefixes (zero-byte `key/` markers for
  *    explicitly-created empty dirs, like S3A's dir markers);
  *  - `rename` is GET+PUT+DELETE per object — NOT atomic, NOT O(1) — which
  *    is exactly why [[graft.logs.Compaction]]'s rename-swap tiers are
  *    local/HDFS-only and object stores get the pointer-commit protocol;
  *  - reads are ranged GETs behind a seekable stream (parquet footer-first
  *    access pattern works without buffering whole objects).
  *
  * Conf: `fs.s3l.impl` → this class, `fs.s3l.endpoint` → gateway URL
  * (mirrors the reference's endpoint/path-style wiring, test.sh:40-44).
  */
final class S3LiteFileSystem extends FileSystem with ConditionalWrites {

  private var fsUri: URI = _
  private var endpoint: String = _
  private var workDir: Path = _

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    fsUri = URI.create(s"${uri.getScheme}://${uri.getAuthority}")
    endpoint = conf.get("fs.s3l.endpoint")
    require(endpoint != null, "fs.s3l.endpoint not set")
    workDir = new Path(s"$fsUri/")
  }

  override def getScheme: String = "s3l"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(p: Path): Unit = workDir = p

  /** bucket/key form of an absolute path ("" key = bucket root). */
  private def objectKey(p: Path): String = {
    val abs = makeQualified(p)
    val key = abs.toUri.getPath.stripPrefix("/")
    s"${fsUri.getAuthority}/$key".stripSuffix("/")
  }

  private def http(method: String, pathAndQuery: String,
      headers: Map[String, String] = Map.empty,
      body: Array[Byte] = null): (Int, Array[Byte], Map[String, String]) = {
    val conn = new URL(s"$endpoint/$pathAndQuery").openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    if (body != null) {
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(body.length)
      val os = conn.getOutputStream; os.write(body); os.close()
    }
    val code = conn.getResponseCode
    val bytes =
      if (method == "HEAD") Array.emptyByteArray
      else {
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        if (is == null) Array.emptyByteArray else try is.readAllBytes() finally is.close()
      }
    val retHeaders = Seq("Content-Length", "ETag")
      .flatMap(k => Option(conn.getHeaderField(k)).map(k -> _)).toMap
    conn.disconnect()
    (code, bytes, retHeaders)
  }

  private def head(key: String): Option[Long] = {
    val (code, _, hdrs) = http("HEAD", key)
    if (code == 200) Some(hdrs.getOrElse("Content-Length", "0").toLong) else None
  }

  /** ListObjectsV2 against the gateway; returns (files with sizes, dir names). */
  private def listPrefix(key: String, delimited: Boolean): (Seq[(String, Long)], Seq[String]) = {
    val slash = key.indexOf('/')
    val (bucket, prefix) = if (slash < 0) (key, "") else (key.take(slash), key.drop(slash + 1))
    val q = new StringBuilder(s"$bucket?list-type=2")
    if (prefix.nonEmpty) q ++= s"&prefix=${java.net.URLEncoder.encode(prefix + "/", "UTF-8")}"
    if (delimited) q ++= "&delimiter=%2F"
    val (code, bytes, _) = http("GET", q.toString)
    if (code != 200) throw new IOException(s"LIST $key failed: HTTP $code")
    val xml = new String(bytes, StandardCharsets.UTF_8)
    // protocol fixture: the stub's flat XML is regex-parsable by construction
    val contents = "<Contents><Key>(.*?)</Key><Size>(\\d+)</Size></Contents>".r
      .findAllMatchIn(xml).map(m => (unesc(m.group(1)), m.group(2).toLong)).toSeq
    val dirs = "<CommonPrefixes><Prefix>(.*?)</Prefix></CommonPrefixes>".r
      .findAllMatchIn(xml).map(m => unesc(m.group(1)).stripSuffix("/")).toSeq
    (contents, dirs)
  }

  private def unesc(s: String) =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  override def getFileStatus(p: Path): FileStatus = {
    val key = objectKey(p)
    if (!key.contains("/")) // bucket root
      return new FileStatus(0, true, 1, 0, 0, makeQualified(p))
    head(key) match {
      case Some(len) => new FileStatus(len, false, 1, 64 * 1024 * 1024, 0, makeQualified(p))
      case None =>
        val isDir = head(key + "/").isDefined || {
          val (files, dirs) = listPrefix(key, delimited = true)
          files.nonEmpty || dirs.nonEmpty
        }
        if (isDir) new FileStatus(0, true, 1, 0, 0, makeQualified(p))
        else throw new FileNotFoundException(p.toString)
    }
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val key = objectKey(p)
    if (head(key).isDefined) return Array(getFileStatus(p))
    val (files, dirs) = listPrefix(key, delimited = true)
    val slash = key.indexOf('/')
    val bucketUri = s"$fsUri"
    val fileStatuses = files.collect {
      // drop zero-byte dir-marker objects ("k/" keys list as "k/" prefix-stripped "")
      case (k, size) if !k.endsWith("/") =>
        new FileStatus(size, false, 1, 64 * 1024 * 1024, 0, new Path(s"$bucketUri/$k"))
    }
    val dirStatuses = dirs.map(d => new FileStatus(0, true, 1, 0, 0, new Path(s"$bucketUri/$d")))
    if (fileStatuses.isEmpty && dirStatuses.isEmpty && slash > 0 && head(key + "/").isEmpty)
      throw new FileNotFoundException(p.toString)
    (fileStatuses ++ dirStatuses).toArray
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    val key = objectKey(p)
    if (key.contains("/") && head(key + "/").isEmpty) {
      val (code, _, _) = http("PUT", key + "/", body = Array.emptyByteArray)
      code == 200
    } else true
  }

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val key = objectKey(p)
    val len = head(key).getOrElse(throw new FileNotFoundException(p.toString))
    new FSDataInputStream(new S3LiteInputStream(key, len))
  }

  /** Seekable ranged-GET stream: each read fetches only the requested span,
    * so parquet's footer-then-column access pattern never buffers the object.
    */
  private final class S3LiteInputStream(key: String, len: Long)
      extends FSInputStream {
    private var pos = 0L
    override def seek(target: Long): Unit = pos = target
    override def getPos: Long = pos
    override def seekToNewSource(t: Long): Boolean = false
    override def read(): Int = {
      val b = new Array[Byte](1)
      if (read(b, 0, 1) == -1) -1 else b(0) & 0xff
    }
    override def read(b: Array[Byte], off: Int, n: Int): Int = {
      if (pos >= len) return -1
      val want = math.min(n.toLong, len - pos).toInt
      val (code, bytes, _) = http("GET", key,
        Map("Range" -> s"bytes=$pos-${pos + want - 1}"))
      if (code != 206 && code != 200) throw new IOException(s"GET $key: HTTP $code")
      // a server may ignore Range and answer 200 with the FULL object —
      // slice our span out instead of overflowing the caller's buffer
      val (src, srcOff, got) =
        if (code == 200 && bytes.length > want) (bytes, pos.toInt, want)
        else (bytes, 0, math.min(bytes.length, want))
      System.arraycopy(src, srcOff, b, off, got)
      pos += got
      got
    }
    override def close(): Unit = ()
  }

  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val key = objectKey(p)
    if (!overwrite && head(key).isDefined)
      throw new IOException(s"$p already exists")
    val buf = new ByteArrayOutputStream()
    val out = new java.io.OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, n: Int): Unit = buf.write(b, off, n)
      override def close(): Unit = {
        // create-only maps to the S3 conditional PUT, making
        // `create(overwrite=false)` a REAL mutex (the MaintenanceLease
        // contract) instead of the racy HEAD-then-PUT — exactly the
        // "vendor FileSystem whose create(overwrite=false) maps to
        // conditional writes" the lease scaladoc anticipates
        val headers =
          if (overwrite) Map.empty[String, String]
          else Map("If-None-Match" -> "*")
        val (code, _, _) = http("PUT", key, headers, body = buf.toByteArray)
        if (code == 412) throw new IOException(s"$p already exists")
        if (code != 200) throw new IOException(s"PUT $key: HTTP $code")
      }
    }
    new FSDataOutputStream(new java.io.BufferedOutputStream(out), statistics)
  }

  // ---- ConditionalWrites ------------------------------------------------

  override def readWithTag(p: Path): Option[(Array[Byte], String)] = {
    val (code, body, headers) = http("GET", objectKey(p))
    if (code != 200) None
    else headers.get("ETag").map(t => (body, t))
  }

  override def putIfTag(p: Path, data: Array[Byte],
      ifMatch: Option[String]): Boolean = {
    val h = ifMatch match {
      case Some(tag) => Map("If-Match" -> tag)
      case None => Map("If-None-Match" -> "*")
    }
    val (code, _, _) = http("PUT", objectKey(p), h, body = data)
    if (code == 412) false
    else if (code == 200) true
    else throw new IOException(s"conditional PUT ${objectKey(p)}: HTTP $code")
  }

  override def append(p: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("append is not an object-store operation")

  /** Object-store rename: copy every object under the source then delete it —
    * O(bytes), non-atomic, exactly S3's contract. The committer still works
    * (it tolerates this), but nothing in the engine may assume atomicity on
    * this scheme.
    */
  override def rename(src: Path, dst: Path): Boolean = {
    val srcKey = objectKey(src)
    val dstKey = objectKey(dst)
    head(srcKey) match {
      case Some(_) =>
        copyObject(srcKey, dstKey); http("DELETE", srcKey); true
      case None =>
        val (files, _) = listPrefix(srcKey, delimited = false)
        if (files.isEmpty && head(srcKey + "/").isEmpty) return false
        // dir → dir: if dst already exists as a dir, move INTO it (HDFS contract)
        val effDst =
          if (head(dstKey + "/").isDefined || listPrefix(dstKey, delimited = false)._1.nonEmpty)
            s"$dstKey/${src.getName}"
          else dstKey
        val bucket = srcKey.takeWhile(_ != '/')
        val srcPrefix = srcKey.drop(bucket.length + 1)
        files.foreach { case (k, _) =>
          val rel = k.stripPrefix(srcPrefix).stripPrefix("/")
          val from = s"$bucket/$k"
          val to = if (rel.isEmpty) effDst else s"$effDst/$rel"
          // dir-marker keys already end in '/' — normalize so the copied
          // marker is 'dst/sub/' and never a stray 'dst/sub//'
          if (k.endsWith("/"))
            http("PUT", to.stripSuffix("/") + "/", body = Array.emptyByteArray)
          else copyObject(from, to)
          http("DELETE", from)
        }
        http("DELETE", srcKey + "/")
        true
    }
  }

  private def copyObject(from: String, to: String): Unit = {
    val (code, bytes, _) = http("GET", from)
    if (code != 200) throw new IOException(s"COPY source $from: HTTP $code")
    val (putCode, _, _) = http("PUT", to, body = bytes)
    if (putCode != 200) throw new IOException(s"COPY dest $to: HTTP $putCode")
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val key = objectKey(p)
    if (head(key).isDefined) { http("DELETE", key); return true }
    val (files, dirs) = listPrefix(key, delimited = false)
    val hasMarker = head(key + "/").isDefined
    if (files.isEmpty && !hasMarker) return false
    if (!recursive && (files.exists(!_._1.endsWith("/")) || dirs.nonEmpty))
      throw new IOException(s"$p is a non-empty directory")
    val bucket = key.takeWhile(_ != '/')
    files.foreach { case (k, _) => http("DELETE", s"$bucket/$k") }
    if (hasMarker) http("DELETE", key + "/")
    true
  }
}
