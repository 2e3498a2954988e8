package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.9): image/audio/video travel
  * as opaque `binary` payloads with a typed metadata struct; decode /
  * feature-extraction runs as a batched per-partition transform.
  *
  * Two tiers:
  *  - REAL pure-JVM codecs for BMP (24-bit uncompressed, bottom-up rows
  *    padded to 4 bytes) and WAV (RIFF/PCM 16-bit mono): [[decodeMedia]]
  *    parses headers and samples genuinely — dimensions, sample rate and
  *    sample statistics come off the bytes, and the oracle replays the
  *    same arithmetic from the synthesis formulas, so a decoder that
  *    didn't actually invert the container format could not pass.
  *  - The learned-embedding step stays STUBBED ([[decodeStub]] — no
  *    image/audio ML libraries in this environment); swap it for a
  *    JNI/ONNX call in production. The `mapPartitions` batch shape (one
  *    iterator per partition, decoder init amortized per partition, no
  *    per-row JVM↔native churn) is the real, tested scale path for both.
  */
object Multimodal {

  /** Canonical media-table schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
    )), nullable = true),
  ))

  /** Schema of the extracted features appended by [[extractFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false),
  ))

  /** STUB decode: deterministic fake "embedding" from payload bytes.
    * Replace with a real codec (JNI/ONNX) at deployment; signature and
    * batch shape stay identical.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var k = 0
    while (k < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(k) = (h & 0xffff).toFloat / 65535.0f
      k += 1
    }
    out
  }

  /** Batched per-partition feature extraction over a media DataFrame.
    * Uses `mapPartitions` so a real decoder can amortize model/codec init
    * once per partition (the Scala analog of a Pandas-batched UDF).
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      // per-partition init of the (stub) decoder would go here
      rows.map { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        var checksum = 0L
        payload.foreach(b => checksum = (checksum * 131 + (b & 0xff)) & 0x7fffffffffffffL)
        Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
          payload.length.toLong, checksum, decodeStub(payload, dim).toSeq)
      }
    }(enc)
  }

  // ---------------------------------------------------------------------
  // Real codecs (pure JVM, zero dependencies)
  // ---------------------------------------------------------------------

  /** Schema of a binary media table carrying real container payloads. */
  val binaryMediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
  ))

  /** Schema of genuinely-decoded container features. Zero (not null) for
    * fields the container kind lacks, keeping the compare total-typed.
    */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sample_sum", LongType, nullable = false),
  ))

  /** Deterministic 24-bit BMP: width 4+id%5, height 3+id%4; pixel byte at
    * (x, y, channel c∈{0,1,2}) = (id + 3x + 5y + 11c) mod 256. Stored
    * bottom-up with rows padded to 4 bytes, like any real BMP writer.
    */
  def encodeBmp(id: Long): Array[Byte] = encodeBmpBase(id, id)

  /** Deterministic multi-frame "video": a minimal container (`GVID`,
    * int32 frame count, then length-prefixed 24-bit BMP frames). Frame f
    * of id has pixel (x,y,c) = (id + 7f + 3x + 5y + 11c) mod 256 at the
    * id's BMP dimensions; 2 + id%3 frames. Real pipelines carry mp4/webm
    * here — the container walk, stride sampling and per-frame decode are
    * the same shape.
    */
  def encodeVideo(id: Long): Array[Byte] = {
    val nFrames = (2 + id % 3).toInt
    val frames = (0 until nFrames).map(f => encodeBmpBase(id + 7L * f, id))
    val total = 8 + frames.map(4 + _.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GVID".getBytes("US-ASCII")).putInt(nFrames)
    frames.foreach { fr => bb.putInt(fr.length); bb.put(fr) }
    bb.array()
  }

  /** BMP with pixel base offset decoupled from the dimension id (frame
    * synthesis); [[encodeBmp]] is the base == id case.
    */
  private def encodeBmpBase(base: Long, dimId: Long): Array[Byte] = {
    val w = (4 + dimId % 5).toInt
    val h = (3 + dimId % 4).toInt
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val off = 54
    val bb = java.nio.ByteBuffer.allocate(off + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(off + dataSize)
      .putShort(0).putShort(0).putInt(off)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = 0
    while (row < h) {
      val y = h - 1 - row
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          bb.put(((base + 3 * x + 5 * y + 11 * c) % 256).toByte)
          c += 1
        }
        x += 1
      }
      var q = 0
      while (q < pad) { bb.put(0.toByte); q += 1 }
      row += 1
    }
    bb.array()
  }

  /** Walk a GVID container and return every `stride`-th frame's bytes
    * with its index — genuine container parsing (frame count + length
    * prefixes), no knowledge of the synthesis formulas.
    */
  def sampleFrames(p: Array[Byte], stride: Int): Seq[(Int, Array[Byte])] = {
    require(p.length >= 8 && new String(p, 0, 4, "US-ASCII") == "GVID",
      "not a GVID container")
    val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt(4)
    var off = 8
    val out = Seq.newBuilder[(Int, Array[Byte])]
    var f = 0
    while (f < n) {
      val len = bb.getInt(off)
      if (f % stride == 0) out += (f -> java.util.Arrays.copyOfRange(p, off + 4, off + 4 + len))
      off += 4 + len
      f += 1
    }
    out.result()
  }

  /** Schema of per-frame decoded stats from [[frameSample]]. */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sample_sum", LongType, nullable = false),
  ))

  /** Synthesize a video table (every id gets a GVID container). */
  def videoFromIds(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(binaryMediaSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), "video", encodeVideo(r.getLong(0))))
    }(enc)
  }

  /** A TRIMMED re-encode of [[encodeVideo]]'s id: the same container with
    * the first frame cut (frames 1..n−1, bytes bit-identical to the
    * original's) — the classic near-duplicate video shape (trimmed /
    * re-uploaded copies share most frames with the original).
    */
  def encodeVideoTrimmed(id: Long): Array[Byte] = {
    val nFrames = (2 + id % 3).toInt
    val frames = (1 until nFrames).map(f => encodeBmpBase(id + 7L * f, id))
    val total = 8 + frames.map(4 + _.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GVID".getBytes("US-ASCII")).putInt(nFrames - 1)
    frames.foreach { fr => bb.putInt(fr.length); bb.put(fr) }
    bb.array()
  }

  /** Synthesize trimmed-copy videos: each id maps to `id + offset`
    * carrying [[encodeVideoTrimmed]]'s payload.
    */
  def trimmedVideosFromIds(df: DataFrame, idCol: String, offset: Long): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(binaryMediaSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map(r =>
        Row(r.getLong(0) + offset, "video", encodeVideoTrimmed(r.getLong(0))))
    }(enc)
  }

  /** Batched frame sampling + per-frame decode: one output row per
    * sampled frame — the 1-to-N `mapPartitions` shape a real frame
    * extractor (ffmpeg behind JNI) would use.
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(frameSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        sampleFrames(r.getAs[Array[Byte]](1), stride).map { case (f, bytes) =>
          val (w, h, _, n, sum) = decodeMedia(bytes)
          Row(id, f.toLong, w, h, n, sum)
        }
      }
    }(enc)
  }

  /** Deterministic RIFF/WAV, PCM 16-bit mono: sample rate 8000+(id%5)·2000,
    * 32+(id%13)·4 samples, sample i = (id·31 + i·7) mod 4096 − 2048.
    */
  def encodeWav(id: Long): Array[Byte] = {
    val sr = (8000 + (id % 5) * 2000).toInt
    val n = (32 + (id % 13) * 4).toInt
    val dataSize = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sr).putInt(sr * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) {
      bb.putShort(((id * 31 + i * 7) % 4096 - 2048).toShort)
      i += 1
    }
    bb.array()
  }

  /** Genuine container decode: dispatches on magic bytes, parses the BMP
    * info header (pixel offset, dimensions, bpp, row padding) or walks the
    * RIFF chunk list (fmt → sample rate/bits/channels, data → samples).
    * Returns (width, height, sampleRate, nSamples, sampleSum) where
    * nSamples counts pixel bytes (BMP, padding excluded) or PCM samples
    * (WAV) and sampleSum is their integer sum — statistics a decoder can
    * only produce by actually reading the payload it is handed.
    */
  def decodeMedia(p: Array[Byte]): (Long, Long, Long, Long, Long) = {
    require(p.length >= 12, s"payload too short: ${p.length}")
    val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (p(0) == 'B' && p(1) == 'M') {
      val pixelOff = bb.getInt(10)
      val w = bb.getInt(18)
      val h = bb.getInt(22)
      val bpp = bb.getShort(28).toInt
      require(bpp == 24, s"unsupported BMP bpp: $bpp")
      // negative height = top-down row order; reject rather than silently
      // returning empty stats (this codec writes bottom-up only)
      require(w > 0 && h > 0, s"unsupported BMP dims: ${w}x$h (top-down?)")
      val rowBytes = w * 3
      val stride = (rowBytes + 3) / 4 * 4
      var sum = 0L
      var row = 0
      while (row < h) {
        var i = 0
        while (i < rowBytes) {
          sum += p(pixelOff + row * stride + i) & 0xff
          i += 1
        }
        row += 1
      }
      (w.toLong, h.toLong, 0L, rowBytes.toLong * h, sum)
    } else if (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') {
      var off = 12 // past RIFF<size>WAVE
      var sr = 0L; var bits = 0; var channels = 0
      var nSamples = 0L; var sum = 0L
      while (off + 8 <= p.length) {
        val tag = new String(p, off, 4, "US-ASCII")
        val sz = bb.getInt(off + 4)
        if (tag == "fmt ") {
          channels = bb.getShort(off + 10).toInt
          sr = bb.getInt(off + 12).toLong
          bits = bb.getShort(off + 22).toInt
        } else if (tag == "data") {
          require(bits == 16 && channels == 1, s"unsupported WAV: $bits-bit x$channels")
          nSamples = sz / 2L
          var i = 0
          while (i < nSamples) {
            sum += bb.getShort(off + 8 + i * 2).toLong
            i += 1
          }
        }
        off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      }
      (0L, 0L, sr, nSamples, sum)
    } else sys.error("unknown container (not BMP or RIFF/WAV)")
  }

  /** Nearest-neighbor half-resolution resize (BMP) / decimate-by-2
    * resample (WAV), decode → transform → RE-ENCODE: the output is a
    * valid container again, so resizes chain and downstream decoders
    * need no special casing. The BMP path must invert bottom-up row
    * storage to sample LOGICAL even rows (a decoder that sampled storage
    * rows would pick the wrong pixels whenever the height changes
    * parity) and re-pad rows to 4 bytes; the WAV path halves the sample
    * rate and keeps even-index samples.
    */
  def resizeHalf(p: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (p(0) == 'B' && p(1) == 'M') {
      val pixelOff = bb.getInt(10)
      val w = bb.getInt(18)
      val h = bb.getInt(22)
      require(bb.getShort(28) == 24, "resizeHalf: 24-bit BMP only")
      require(w > 0 && h > 0, s"resizeHalf: unsupported BMP dims ${w}x$h (top-down?)")
      val stride = (w * 3 + 3) / 4 * 4
      val w2 = (w + 1) / 2
      val h2 = (h + 1) / 2
      // logical pixel (x, y): stored bottom-up at row h-1-y
      def px(x: Int, y: Int, c: Int): Byte = p(pixelOff + (h - 1 - y) * stride + x * 3 + c)
      val rowBytes2 = w2 * 3
      val pad2 = (4 - rowBytes2 % 4) % 4
      val out = java.nio.ByteBuffer.allocate(54 + (rowBytes2 + pad2) * h2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(54 + (rowBytes2 + pad2) * h2)
        .putShort(0).putShort(0).putInt(54)
      out.putInt(40).putInt(w2).putInt(h2).putShort(1).putShort(24)
        .putInt(0).putInt((rowBytes2 + pad2) * h2).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      var row = 0
      while (row < h2) {
        val y2 = h2 - 1 - row // write bottom-up
        var x2 = 0
        while (x2 < w2) {
          var c = 0
          while (c < 3) { out.put(px(2 * x2, 2 * y2, c)); c += 1 }
          x2 += 1
        }
        var q = 0
        while (q < pad2) { out.put(0.toByte); q += 1 }
        row += 1
      }
      out.array()
    } else if (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') {
      var off = 12
      var sr = 0; var dataOff = -1; var dataSz = 0
      while (off + 8 <= p.length) {
        val tag = new String(p, off, 4, "US-ASCII")
        val sz = bb.getInt(off + 4)
        if (tag == "fmt ") {
          require(bb.getShort(off + 22) == 16 && bb.getShort(off + 10) == 1,
            "resizeHalf: 16-bit mono WAV only")
          sr = bb.getInt(off + 12)
        } else if (tag == "data") { dataOff = off + 8; dataSz = sz }
        off += 8 + sz + (sz & 1)
      }
      require(dataOff >= 0, "resizeHalf: no data chunk")
      val n = dataSz / 2
      val n2 = (n + 1) / 2 // even indices 0, 2, ...
      val out = java.nio.ByteBuffer.allocate(44 + n2 * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n2 * 2)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(sr / 2).putInt(sr).putShort(2).putShort(16)
      out.put("data".getBytes("US-ASCII")).putInt(n2 * 2)
      var j = 0
      while (j < n2) { out.putShort(bb.getShort(dataOff + 4 * j)); j += 1 }
      out.array()
    } else sys.error("unknown container (not BMP or RIFF/WAV)")
  }

  /** Batched resize/resample of a binary media table (see [[resizeHalf]]). */
  def resizeMedia(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(binaryMediaSchema)
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), r.getString(1), resizeHalf(r.getAs[Array[Byte]](2))))
    }(enc)
  }

  /** Synthesize the binary media table: BMP for image/video ids (a video
    * here is its single poster frame), WAV for audio ids. Runs in
    * `mapPartitions` like a real ingest-side transcoder would.
    */
  def mediaBinaryFromIds(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(binaryMediaSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val kind = id % 3 match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
        val payload = if (id % 3 == 1) encodeWav(id) else encodeBmp(id)
        Row(id, kind, payload)
      }
    }(enc)
  }

  /** Batched genuine decode of a binary media table (see [[decodeMedia]]). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      // positional getters: upstream mapPartitions rows carry no schema
      rows.map { r =>
        val (w, h, sr, n, sum) = decodeMedia(r.getAs[Array[Byte]](2))
        Row(r.getLong(0), r.getString(1), w, h, sr, n, sum)
      }
    }(enc)
  }

  /** Build a demo media table from any (id, string) pair — payload =
    * UTF-8 bytes, metadata synthesized. Lets the multimodal path run
    * against fixtures that have no real binary column.
    */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      (when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit(640).as("width"), lit(480).as("height"),
        lit(16000).as("sample_rate"),
        (length(col(textCol)) * 10L).cast("long").as("duration_ms")).as("meta"),
    )
}
