package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * ALL THREE kinds decode for REAL with nothing beyond the JDK:
  * [[ImageIoCodec]] decodes PNG/JPEG payloads with `javax.imageio` — true
  * pixel dimensions and a pixel-level luminance histogram feature.
  * [[WavCodec]] parses PCM WAV with `javax.sound.sampled` — true sample
  * rate, channel count and frame count, plus an 8-window RMS feature over
  * the decoded samples. [[AviCodec]] (r8) parses the AVI/RIFF container —
  * true header dimensions and frame count from `avih`, real per-frame JPEG
  * payloads from the `movi` list, frame features from ImageIO-decoded
  * pixels. [[FakeCodec]] remains only as the degradation path for payloads
  * none of those can parse. Everything Spark-side — schema, batching,
  * partitioning, the typed `mapPartitions` pipeline shape — is identical
  * for all kinds: one partition = one batch of byte payloads through a
  * codec initialized once per partition.
  */
object Multimodal {

  // ImageIO's default stream cache backs EVERY decode/encode with a temp
  // FILE (FileCacheImageInput/OutputStream): with 32 concurrent codec tasks
  // over small in-memory payloads that is pure filesystem create/write/
  // delete churn — the r16 scaling run had m2/m3 running 6-8× FASTER on 8
  // cores than 32. Every payload in this pipeline is an in-memory byte
  // array, so the memory-backed stream is strictly better. JVM-global by
  // API design; set at class load, which happens on driver and executors
  // alike because every codec entry point lives in this object.
  javax.imageio.ImageIO.setUseCache(false)

  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaMeta(media_id: Long, kind: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** STUB decode: deterministic pseudo-metadata + an 8-dim byte-histogram
    * feature from the payload. A real implementation replaces ONLY this
    * object; the Spark plumbing stays identical.
    */
  object FakeCodec {
    def decode(r: MediaRecord): MediaMeta = {
      val b = r.payload
      val h = b.foldLeft(0xcbf29ce484222325L)((acc, x) => acc * 1099511628211L + (x & 0xffL))
      val hist = new Array[Float](8)
      b.foreach(x => hist((x & 0xff) % 8) += 1.0f)
      val n = math.max(b.length, 1).toFloat
      MediaMeta(r.media_id, r.kind, b.length.toLong,
        width = 16 + (math.floorMod(h, 64L)).toInt,
        height = 16 + (math.floorMod(h >> 8, 64L)).toInt,
        n_frames = if (r.kind == "video") 1 + (math.floorMod(h >> 16, 30L)).toInt else 1,
        feature = hist.map(_ / n))
    }
  }

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP): true pixel
    * dimensions plus an 8-bin luminance histogram computed over the actual
    * decoded pixels — the feature a quality/dedup pipeline would hash or
    * embed. Returns None for payloads ImageIO cannot parse (caller falls
    * back to the byte-level stub, so a corrupt object degrades instead of
    * failing the batch).
    */
  object ImageIoCodec {
    /** 8-bin luminance histogram over a decoded image's actual pixels —
      * shared by the image codec and the video codec's frame features.
      */
    private[ext] def luminanceHist(im: java.awt.image.BufferedImage): Array[Float] = {
      val hist = new Array[Float](8)
      var y = 0
      while (y < im.getHeight) {
        var x = 0
        while (x < im.getWidth) {
          val rgb = im.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(lum * 8 / 256) += 1.0f
          x += 1
        }
        y += 1
      }
      val n = (im.getWidth * im.getHeight).toFloat
      hist.map(_ / n)
    }

    def decode(r: MediaRecord): Option[MediaMeta] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: java.io.IOException => null }
      Option(img).map { im =>
        MediaMeta(r.media_id, r.kind, r.payload.length.toLong,
          im.getWidth, im.getHeight, n_frames = 1,
          feature = luminanceHist(im))
      }
    }
  }

  /** Real audio decode via the JDK's `javax.sound.sampled`: parses the WAV
    * container, reporting the TRUE sample rate (as `width`), channel count
    * (as `height`) and per-channel frame count (as `n_frames`), plus an
    * 8-window RMS envelope over the decoded PCM16 samples — the feature an
    * audio quality/dedup pipeline would threshold or embed. None when the
    * payload isn't parseable audio (caller degrades to the byte-level stub,
    * which the m1 gate then flags loudly: stub dims never match the
    * fixture's expected metadata).
    */
  object WavCodec {
    def decode(r: MediaRecord): Option[MediaMeta] =
      try {
        val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        // javax.sound parses 8-bit PCM, mu-law/A-law and big-endian WAVs
        // too — normalize to PCM16 little-endian BEFORE the sample loop so
        // the RMS feature reads real samples, never reinterpreted bytes
        val f = raw.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels,
          f.getChannels * 2, f.getSampleRate, false)
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(target, raw)
        try {
          val pcm = in.readAllBytes()
          // frame length can be NOT_SPECIFIED (-1) on some streams; the
          // decoded byte count is then the authoritative frame count
          val frames =
            if (in.getFrameLength >= 0) in.getFrameLength
            else pcm.length.toLong / (f.getChannels * 2)
          // 8-window RMS over interleaved 16-bit little-endian samples,
          // normalized to [0,1] by the int16 range
          val nSamples = pcm.length / 2
          val rms = new Array[Float](8)
          if (nSamples > 0) {
            val window = math.max(nSamples / 8, 1)
            val acc = new Array[Double](8)
            val cnt = new Array[Long](8)
            var i = 0
            while (i < nSamples) {
              val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort.toDouble
              val w = math.min(i / window, 7)
              acc(w) += s * s
              cnt(w) += 1
              i += 1
            }
            var w = 0
            while (w < 8) {
              if (cnt(w) > 0) rms(w) = (math.sqrt(acc(w) / cnt(w)) / 32768.0).toFloat
              w += 1
            }
          }
          Some(MediaMeta(r.media_id, r.kind, r.payload.length.toLong,
            width = f.getSampleRate.toInt, height = f.getChannels,
            n_frames = frames.toInt, feature = rms))
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real image resize via the JDK: decode → bilinear scale → PNG re-encode.
    * None when the payload isn't a decodable image.
    */
  object ImageResize {
    def resize(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
      val img =
        // ImageIO plugins throw RuntimeExceptions (IllegalArgument, AIOOBE)
        // on corrupt payloads, not just IOException — any decode failure
        // must degrade to the sentinel instead of failing the whole task
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      Option(img).map { im =>
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(im, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }
  }

  case class ResizedMedia(media_id: Long, kind: String, width: Int,
      height: Int, payload: Array[Byte])

  /** Batch resize with the same per-partition batch shape as [[decodeAll]]:
    * images re-encode at (w, h); non-image kinds pass through untouched with
    * sentinel dims (their codec is the stub). An undecodable image payload
    * degrades to the sentinel instead of failing the batch.
    */
  def resizeAll(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.kind == "image")
        ImageResize.resize(r.payload, w, h) match {
          case Some(p) => ResizedMedia(r.media_id, r.kind, w, h, p)
          case None => ResizedMedia(r.media_id, r.kind, -1, -1, r.payload)
        }
      else ResizedMedia(r.media_id, r.kind, -1, -1, r.payload)
    })
  }

  /** REAL video container parse: AVI (RIFF) with MJPEG frames, implemented
    * against the public AVI/RIFF layout — `avih` (MainAVIHeader) carries the
    * true frame count and pixel dimensions; `00dc`/`00db` chunks in the
    * `movi` list carry the per-frame JPEG payloads, which the JDK's ImageIO
    * decodes to real pixels. No video LIBRARY ships in the JDK, but the
    * CONTAINER is just chunked bytes — so metadata, frame extraction, and
    * per-frame pixel features are all real; only exotic codecs inside other
    * containers would fall back to the byte-level stub.
    */
  object AviCodec {
    final case class ParsedAvi(width: Int, height: Int, totalFrames: Int,
        frames: IndexedSeq[Array[Byte]])

    private def fourccAt(b: Array[Byte], p: Int): String =
      new String(b, p, 4, "US-ASCII")
    private def le32At(b: Array[Byte], p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

    /** Structural parse of the RIFF chunk tree; None when the payload is
      * not an AVI. Truncated/corrupt chunks stop the walk (whatever parsed
      * before them is kept) rather than throwing.
      */
    def parse(payload: Array[Byte]): Option[ParsedAvi] = {
      if (payload.length < 12 || fourccAt(payload, 0) != "RIFF" ||
        fourccAt(payload, 8) != "AVI ") return None
      var width = -1; var height = -1; var total = -1
      val frames = IndexedSeq.newBuilder[Array[Byte]]
      def walk(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val id = fourccAt(payload, p)
          val size = le32At(payload, p + 4)
          if (size < 0 || p + 8 + size > to) return // truncated: stop
          if (id == "LIST") walk(p + 12, p + 8 + size)
          else if (id == "avih" && size >= 40) {
            total = le32At(payload, p + 8 + 16)
            width = le32At(payload, p + 8 + 32)
            height = le32At(payload, p + 8 + 36)
          } else if (id == "00dc" || id == "00db")
            frames += java.util.Arrays.copyOfRange(payload, p + 8, p + 8 + size)
          p += 8 + size + (size & 1) // chunks are word-aligned
        }
      }
      walk(12, math.min(payload.length, 8 + le32At(payload, 4)))
      if (width <= 0 || height <= 0 || total <= 0) None
      else Some(ParsedAvi(width, height, total, frames.result()))
    }

    def decodeFrame(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

    def decode(r: MediaRecord): Option[MediaMeta] =
      parse(r.payload).map { p =>
        // feature from REAL pixels: luminance histogram of the first frame
        val hist = p.frames.headOption.flatMap(decodeFrame)
          .map(ImageIoCodec.luminanceHist)
          .getOrElse(new Array[Float](8))
        MediaMeta(r.media_id, r.kind, r.payload.length.toLong,
          p.width, p.height, p.totalFrames, hist)
      }
  }

  /** Dispatch: images (ImageIO), audio (javax.sound), and video (AVI/MJPEG
    * container parse + ImageIO frame decode) all decode for real; the
    * byte-level stub remains only as the degradation path for payloads no
    * JDK-expressible codec can parse — and the m1 gate flags that loudly,
    * because stub dims never match the fixtures' expected metadata.
    */
  def decode(r: MediaRecord): MediaMeta = r.kind match {
    case "image" => ImageIoCodec.decode(r).getOrElse(FakeCodec.decode(r))
    case "audio" => WavCodec.decode(r).getOrElse(FakeCodec.decode(r))
    case "video" => AviCodec.decode(r).getOrElse(FakeCodec.decode(r))
    case _ => FakeCodec.decode(r)
  }

  /** Batch decode via typed `mapPartitions`: the per-partition iterator is the
    * batch boundary (≙ `mapInPandas` batch shape), so a native codec is
    * initialized once per partition, not once per row.
    */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: acquire codec handle here, release after the iterator
      it.map(decode)
    }
  }

  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte],
      frame_feature: Array[Float])

  /** Frame sampling: `n` evenly-spaced REAL frames from a parseable AVI
    * video (each an actual JPEG payload with a decoded-pixel luminance
    * feature); unparseable video payloads degrade to `n` byte-window slices
    * with byte-histogram features so a corrupt object never fails the
    * batch. Images/audio yield a single frame. flatMap fan-out — no
    * shuffle; the codec cost is pure map-side CPU, exactly where a 1000-
    * executor cluster wants it.
    */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val realFrames =
        if (r.kind == "video") AviCodec.parse(r.payload).map(_.frames)
        else None
      realFrames match {
        case Some(fs) if fs.nonEmpty =>
          // evenly-spaced selection over the container's actual frames
          (0 until n).map { i =>
            val idx = (i.toLong * fs.length / n).toInt
            val bytes = fs(math.min(idx, fs.length - 1))
            val feat = AviCodec.decodeFrame(bytes)
              .map(ImageIoCodec.luminanceHist)
              .getOrElse(new Array[Float](8))
            MediaFrame(r.media_id, i, bytes, feat)
          }
        case _ =>
          val frames = if (r.kind == "video") n else 1
          val len = math.max(r.payload.length / math.max(frames, 1), 1)
          (0 until frames).map { i =>
            val from = math.min(i * len, math.max(r.payload.length - 1, 0))
            val slice = r.payload.slice(from, math.min(from + len, r.payload.length))
            val hist = new Array[Float](8)
            slice.foreach(x => hist((x & 0xff) % 8) += 1.0f)
            val total = math.max(slice.length, 1).toFloat
            MediaFrame(r.media_id, i, slice, hist.map(_ / total))
          }
      }
    }
  }

  /** Deterministic tiny PNG for a doc id: dimensions and pixel values derive
    * from the id (FNV-style mixing), encoded by the JDK's ImageIO PNG writer.
    * This makes the image leg of the fixture REAL encoded bytes that the real
    * decoder round-trips, with independently computable expected dimensions.
    */
  object ImageFixture {
    def dims(docId: Long): (Int, Int) =
      (8 + math.floorMod(docId, 25L).toInt, 8 + math.floorMod(docId / 25, 25L).toInt)

    def png(docId: Long): Array[Byte] = {
      val (w, h) = dims(docId)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = docId * 1099511628211L + y * 131L + x * 31L
          img.setRGB(x, y, (v & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Deterministic PCM16 WAV for a doc id: sample rate, channel count and
    * frame count all derive from the id with plain integer arithmetic a SQL
    * oracle can restate, sample values from an LCG. Encoded through the
    * JDK's own WAV writer so the bytes are a real RIFF container the real
    * decoder round-trips — with independently computable expected metadata.
    */
  object WavFixture {
    private val rates = Array(8000, 16000, 44100)
    def sampleRate(docId: Long): Int = rates(math.floorMod(docId / 3, 3L).toInt)
    def channels(docId: Long): Int = 1 + math.floorMod(docId / 5, 2L).toInt
    def frames(docId: Long): Int = 200 + math.floorMod(docId, 100L).toInt

    def wav(docId: Long): Array[Byte] = {
      val ch = channels(docId)
      val n = frames(docId)
      val pcm = new Array[Byte](n * ch * 2)
      var i = 0
      while (i < n * ch) {
        val s = (math.floorMod(docId * 7919L + i * 104729L, 20000L) - 10000L).toShort
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate(docId).toFloat, 16, ch, true, false)
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(stream,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** Deterministic AVI/MJPEG container for a doc id: frame count and pixel
    * dimensions derive from the id with integer arithmetic a gate can
    * restate; each frame is a real JPEG (distinct per frame index) written
    * by the JDK's ImageIO, wrapped in a hand-assembled RIFF tree —
    * `avih` + `strl(strh,strf)` headers and a `movi` list of `00dc`
    * chunks — so the bytes are a real container the real parser
    * round-trips.
    */
  object AviFixture {
    def width(docId: Long): Int = 16 + math.floorMod(docId, 4L).toInt * 8
    def height(docId: Long): Int = 16 + math.floorMod(docId / 4, 4L).toInt * 8
    def frames(docId: Long): Int = 4 + math.floorMod(docId, 5L).toInt

    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad: Array[Byte] =
        if (body.length % 2 == 1) Array(0.toByte) else Array.empty
      cc(id) ++ le32(body.length) ++ body ++ pad
    }
    private def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(typ) ++ body)

    def jpegFrame(docId: Long, idx: Int): Array[Byte] = {
      val w = width(docId); val h = height(docId)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = docId * 1099511628211L + idx * 8191L + y * 131L + x * 31L
          img.setRGB(x, y, (v & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    def avi(docId: Long): Array[Byte] = {
      val w = width(docId); val h = height(docId); val n = frames(docId)
      // MainAVIHeader: µs/frame (10 fps), maxBytesPerSec, padding, flags,
      // totalFrames, initialFrames, streams, suggestedBuffer, width,
      // height, reserved[4]
      val avih = chunk("avih",
        le32(100000) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(n) ++
          le32(0) ++ le32(1) ++ le32(0) ++ le32(w) ++ le32(h) ++
          le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
      // AVIStreamHeader: vids/MJPG, flags, prio+lang, initial, scale=1,
      // rate=10, start, length=n, bufsize, quality=-1, samplesize, rcFrame
      val strh = chunk("strh",
        cc("vids") ++ cc("MJPG") ++ le32(0) ++ le32(0) ++ le32(0) ++
          le32(1) ++ le32(10) ++ le32(0) ++ le32(n) ++ le32(0) ++
          le32(-1) ++ le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
      // BITMAPINFOHEADER: size=40, w, h, planes=1, bitcount=24, 'MJPG',
      // sizeImage, ppm x/y, clrUsed, clrImportant
      val strf = chunk("strf",
        le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
          cc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++
          le32(0) ++ le32(0))
      val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
      val movi = list("movi",
        (0 until n).map(i => chunk("00dc", jpegFrame(docId, i)))
          .foldLeft(Array.empty[Byte])(_ ++ _))
      val body = cc("AVI ") ++ hdrl ++ movi
      cc("RIFF") ++ le32(body.length) ++ body
    }
  }

  /** Build a media table from the documents fixture: image rows carry a real
    * deterministic PNG ([[ImageFixture]]), audio rows a real deterministic
    * PCM WAV ([[WavFixture]]), video rows a real deterministic AVI/MJPEG
    * container ([[AviFixture]]) — every kind's bytes round-trip through its
    * real codec with independently computable expected metadata.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    val kinds = Array("image", "audio", "video")
    // Payloads derive from doc_id alone, so project to the 8-byte id BEFORE
    // spreading (r16, guide §2.3/§2.6): the old shape carried `text` into the
    // typed map unused (defeating column pruning) and inherited the scan's
    // partitioning — the fixture is ONE small parquet file, so every encode
    // and every downstream m1/m2/m3 codec pass ran on a single core while 31
    // idled. Round-robin over max(cores, scan parallelism) shuffles only ids;
    // at real scale the max() keeps the scan's own (larger) parallelism.
    val ids = docs.select(col("doc_id")).as[Long]
    val spread = ids.repartition(
      math.max(spark.sparkContext.defaultParallelism, ids.rdd.getNumPartitions))
    spread.map { id =>
      val kind = kinds(math.floorMod(id, 3L).toInt)
      val payload = kind match {
        case "image" => ImageFixture.png(id)
        case "audio" => WavFixture.wav(id)
        case _ => AviFixture.avi(id)
      }
      MediaRecord(id, kind, payload)
    }
  }

  /** Metadata + features as a DataFrame (flattened, analytics-ready). */
  def decodedTable(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeAll(mediaFromDocuments(spark, docs)).toDF()
}
