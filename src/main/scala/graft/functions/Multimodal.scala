package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * Decode kernels ship in two tiers: REAL pure-JVM codecs where the
  * JDK carries them (PNG/BMP/GIF/JPEG via javax.imageio, WAV/AIFF/AU
  * via javax.sound.sampled) and a deterministic FAKE for everything
  * else (video, webp, …) standing in for a JNI/FFI binding. Either way
  * the Spark-side contract is identical and tested: schema shape,
  * partition-batched execution (`mapPartitions`, one decoder init per
  * partition, not per row), and null/error tagging instead of task
  * failure. Swapping kernels changes no plan.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("decode_ok", BooleanType),
    StructField("error", StringType)))

  def withMediaSchema(df: DataFrame, binCol: String): StructType =
    StructType(df.schema.fields ++ Seq(StructField("media_meta", mediaMetaType)))

  /** The decoder swap point: a real codec binding (JNI/FFI) implements
    * these two traits and nothing else changes — not the plan, not the
    * schema, not the error channel. The FACTORY ships to executors
    * (Serializable); the decoder it opens does not — it's created once
    * per partition and closed via the task-completion listener, which is
    * where a native codec frees its context.
    */
  trait MediaDecoder extends java.io.Closeable {
    /** format, width, height, n_frames; throw on undecodable payload. */
    def decode(bytes: Array[Byte]): (String, Int, Int, Int)
    override def close(): Unit = ()
  }
  trait MediaDecoderFactory extends Serializable {
    def open(): MediaDecoder
  }

  /** STUB decode kernel — deterministic fake standing in for a real
    * codec: derives pseudo-dimensions from the payload bytes. Replace
    * with an actual decoder binding in production; everything around it
    * (batching, schema, error channel) is the real implementation.
    */
  private[functions] object FakeDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): (String, Int, Int, Int) = {
      if (bytes == null || bytes.isEmpty) throw new IllegalArgumentException("empty payload")
      val h = java.util.Arrays.hashCode(bytes)
      val fmt = (math.abs(h) % 3) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "webp"
      }
      (fmt, 16 + math.abs(h % 1024), 16 + math.abs((h / 7) % 1024),
        1 + math.abs(h % 30))
    }
  }
  object FakeDecoderFactory extends MediaDecoderFactory {
    def open(): MediaDecoder = FakeDecoder
  }

  /** REAL decode kernel for the formats the JDK ships codecs for
    * (PNG/BMP/GIF/JPEG via javax.imageio — pure JVM, no native deps):
    * format from the matched reader's canonical name, dims from the
    * image header, frame count without stream search (animated GIF
    * readers report it; single-image formats → 1). The first frame is
    * actually DECODED so truncated/corrupt payloads fail here and land
    * in the per-row error channel, not downstream. Plugs into the same
    * factory seam as FakeDecoder — the plan, schema, and batching are
    * identical; only the kernel is real.
    */
  object ImageIoDecoderFactory extends MediaDecoderFactory {
    def open(): MediaDecoder = new MediaDecoder {
      // the default ImageIO stream cache is a TEMP FILE per encode/
      // decode — measured ~2 s of pure filesystem churn per 5k images;
      // heap-backed streams make the codec CPU-bound (JVM-global flag,
      // idempotent, set once per opened decoder)
      javax.imageio.ImageIO.setUseCache(false)
      def decode(bytes: Array[Byte]): (String, Int, Int, Int) = {
        if (bytes == null || bytes.isEmpty)
          throw new IllegalArgumentException("empty payload")
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext)
            throw new IllegalArgumentException("unrecognized image format")
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
            val img = reader.read(0)
            val n = reader.getNumImages(false) match {
              case k if k > 0 => k
              case _ => 1
            }
            (fmt, img.getWidth, img.getHeight, n)
          } finally reader.dispose()
        } finally iis.close()
      }
    }
  }

  /** Typed metadata for audio payloads — the audio twin of
    * [[mediaMetaType]]: container format, PCM parameters, frame count.
    */
  val audioMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("frames", LongType),
    StructField("decode_ok", BooleanType),
    StructField("error", StringType)))

  /** Audio decoder swap point — same per-partition open / task-close
    * contract as [[MediaDecoderFactory]].
    */
  trait AudioDecoder extends java.io.Closeable {
    /** (format, sampleRateHz, channels, bitsPerSample, frames);
      * throw on undecodable payload.
      */
    def decode(bytes: Array[Byte]): (String, Int, Int, Int, Long)
    override def close(): Unit = ()
  }
  trait AudioDecoderFactory extends Serializable {
    def open(): AudioDecoder
  }

  /** REAL audio decode kernel for the containers the JDK ships codecs
    * for (WAV/AIFF/AU via javax.sound.sampled — pure JVM, no native
    * deps): format from the parsed file type, PCM params from the
    * header, frame count from the stream. The data section is actually
    * CONSUMED and length-checked against the declared frame count, so
    * a payload truncated mid-data fails here and lands in the per-row
    * error channel — exactly the ImageIo contract, for audio.
    */
  object JavaSoundDecoderFactory extends AudioDecoderFactory {
    def open(): AudioDecoder = new AudioDecoder {
      def decode(bytes: Array[Byte]): (String, Int, Int, Int, Long) = {
        if (bytes == null || bytes.isEmpty)
          throw new IllegalArgumentException("empty payload")
        val bin = new java.io.ByteArrayInputStream(bytes)
        val fileFmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(bin)
        bin.reset()
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(bin)
        try {
          val fmt = ais.getFormat
          val frameSize = fmt.getFrameSize
          val declared = ais.getFrameLength
          // drain the data section: a container whose header promises
          // more frames than the payload carries must FAIL, not
          // silently under-report downstream
          var seen = 0L
          val buf = new Array[Byte](8192)
          var n = ais.read(buf)
          while (n > 0) { seen += n; n = ais.read(buf) }
          if (frameSize > 0 && seen / frameSize < declared)
            throw new java.io.EOFException(
              s"data section truncated: ${seen / frameSize} of $declared frames")
          (fileFmt.getType.toString.toLowerCase(java.util.Locale.ROOT),
            fmt.getSampleRate.toInt, fmt.getChannels,
            fmt.getSampleSizeInBits, declared)
        } finally ais.close()
      }
    }
  }

  /** 64-bit audio fingerprint over REAL decoded PCM samples — the
    * audio twin of [[imageAHash64]]: decode (javax.sound.sampled),
    * take |sample| over the interleaved 16-bit stream, split into 64
    * windows (boundaries ⌊w·n/64⌋), and set bit w iff the window's
    * mean |sample| ≥ the GLOBAL mean |sample| — thresholding against
    * the global mean keeps every comparison a pure integer cross-
    * product (winSum·n ≥ totalSum·winCnt; both sides ≤ 512·n², inside
    * signed 64-bit up to n ≈ 1.3e8 samples ≈ 25 min of 44.1 kHz
    * stereo), so the fingerprint is engine-replayable from the sample
    * formula alone.
    * Empty windows (streams shorter than 64 samples) leave their bit
    * unset. Loudness-profile near-dups then ride the SAME pigeonhole
    * Hamming machinery as image/text signatures.
    *
    * Same partition-batched media contract: per-row error channel
    * (null fingerprint + message), no task aborts on corrupt payloads.
    */
  def audioFingerprint64(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("n_samples", LongType),
      StructField("afp", LongType),
      StructField("afp_ok", BooleanType),
      StructField("afp_error", StringType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.get(binIdx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        val res: Either[String, (Long, Long)] =
          try {
            if (bytes == null || bytes.isEmpty)
              throw new IllegalArgumentException("empty payload")
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 16)
                throw new IllegalArgumentException(
                  s"expected 16-bit PCM, got ${fmt.getSampleSizeInBits}")
              val big = fmt.isBigEndian
              // drain the full stream; 16-bit frames → |sample| array
              val bos = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](8192)
              var r = ais.read(buf)
              while (r > 0) { bos.write(buf, 0, r); r = ais.read(buf) }
              val data = bos.toByteArray
              val n = data.length / 2
              val abs = new Array[Long](n)
              var i = 0
              while (i < n) {
                val lo = data(2 * i + (if (big) 1 else 0)) & 0xff
                val hi = data(2 * i + (if (big) 0 else 1))
                val s = (hi << 8) | lo
                abs(i) = math.abs(s.toLong)
                i += 1
              }
              val total = abs.sum
              var fp = 0L
              var w = 0
              while (w < 64) {
                // Long boundary math: w*n overflows Int past ~33.5M
                // samples (w·n > Int.MaxValue), well inside the
                // documented n ≈ 1.3e8 envelope
                val from = (w.toLong * n / 64).toInt
                val to = ((w + 1).toLong * n / 64).toInt
                if (to > from) {
                  var winSum = 0L; var j = from
                  while (j < to) { winSum += abs(j); j += 1 }
                  // window mean >= global mean, integer cross-product
                  if (winSum * n >= total * (to - from)) fp |= 1L << w
                }
                w += 1
              }
              Right((n.toLong, fp))
            } finally ais.close()
          } catch {
            case e: Exception =>
              Left(Option(e.getMessage).getOrElse(e.getClass.getName))
          }
        Row.fromSeq(row.toSeq ++ (res match {
          case Right((n, fp)) => Seq(n, fp, true, null)
          case Left(m) => Seq(null, null, false, m)
        }))
      }
    }(enc)
  }

  /** Audio decode pass: binary column → audio_meta struct, identical
    * partition-batched shape to [[decodeMeta]] (one decoder per
    * partition, task-completion close, per-row error channel).
    */
  def decodeAudioMeta(df: DataFrame, binCol: String,
      factory: AudioDecoderFactory = JavaSoundDecoderFactory): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("audio_meta", audioMetaType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      val decoder = factory.open()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => decoder.close()))
      rows.map { row =>
        val bytes = row.get(binIdx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        val meta =
          try {
            val (fmt, rate, ch, bits, frames) = decoder.decode(bytes)
            Row(fmt, rate, ch, bits, frames, true, null)
          } catch {
            case e: Exception => Row(null, null, null, null, null, false,
              e.getMessage)
          }
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(enc)
  }

  /** Deterministic synthetic-WAV fixture builder: one real PCM WAV per
    * row (16-bit mono/stereo, header + samples a pure function of the
    * id), truncated mid-data on every `truncateEvery`-th id so the
    * decoder's frame-count check fires. Per-partition map-only, like
    * [[withSyntheticPng]]. Parameter arithmetic (replayed by oracles):
    * channels = 1 + id%2, rate = {8000,16000,44100}[id%3],
    * frames = 50 + (13·id)%200.
    */
  def withSyntheticWav(df: DataFrame, idCol: String,
      truncateEvery: Long = 0L): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(idIdx)
        val channels = (1 + math.floorMod(id, 2L)).toInt
        val rate = math.floorMod(id, 3L) match {
          case 0L => 8000; case 1L => 16000; case _ => 44100
        }
        val frames = (50 + math.floorMod(id * 13, 200L)).toInt
        val dataLen = frames * channels * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(channels.toShort).putInt(rate)
          .putInt(rate * channels * 2).putShort((channels * 2).toShort)
          .putShort(16)
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        var i = 0
        while (i < frames * channels) {
          bb.putShort((math.floorMod(id * 31 + i * 7, 65536L) - 32768L).toShort)
          i += 1
        }
        val wav = bb.array()
        val payload =
          if (truncateEvery > 0 && id % truncateEvery == 0)
            java.util.Arrays.copyOf(wav, 44 + dataLen / 2) // header intact, data cut
          else wav
        Row.fromSeq(row.toSeq :+ payload)
      }
    }(enc)
  }

  /** Deterministic synthetic-PNG fixture builder: one real PNG per row
    * (pixels a pure function of the id, encoded by the JDK PNG writer,
    * dims = 8 + id%16 × 8 + (7·id)%16), truncated to 10 bytes on every
    * `truncateEvery`-th id to exercise the error channel. Generation
    * runs per partition on executors — map-only, nothing driver-side.
    */
  def withSyntheticPng(df: DataFrame, idCol: String,
      truncateEvery: Long = 0L): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // heap-backed streams
      rows.map { row =>
        val id = row.getLong(idIdx)
        val w = (8 + math.floorMod(id, 16L)).toInt
        val h = (8 + math.floorMod(id * 7, 16L)).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((id * 31 + x * 7 + y * 13) & 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val png = bos.toByteArray
        val payload =
          if (truncateEvery > 0 && id % truncateEvery == 0)
            java.util.Arrays.copyOf(png, 10)
          else png
        Row.fromSeq(row.toSeq :+ payload)
      }
    }(enc)
  }

  /** Deterministic synthetic grayscale-PNG fixture with PLANTED
    * near-duplicates: ids sharing `id - id % twinGroup` get identical
    * 8×8 pixel grids except that the j-th twin (j = id % twinGroup > 0)
    * has pixel (j−1, 0) shifted by +128 mod 256 — so twin groups are a
    * few perceptual-hash bits apart while unrelated ids differ
    * everywhere. Pixel values use the repo's portable-hash convention
    * (replayed by oracles): g(x,y) = md5_60("px|base|x|y") mod 256,
    * base = id − id mod twinGroup — a LINEAR per-group formula would
    * make every group's image the same gradient plus a constant, and
    * constant shifts survive the aHash mean threshold (measured: 7k
    * false hamming-0 pairs across unrelated groups). TYPE_BYTE_GRAY
    * PNG round-trips raster samples losslessly, so the decoded lumas
    * equal this formula exactly. Map-only per-partition generation
    * like [[withSyntheticPng]].
    */
  def withSyntheticGrayPng8(df: DataFrame, idCol: String,
      twinGroup: Int = 4): DataFrame = {
    require(twinGroup >= 1, "twinGroup must be >= 1")
    val schema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      // first 15 hex chars parsed base-16 == the digest's first 8
      // bytes big-endian shifted right 4 bits — same 60-bit value the
      // oracle computes, without per-byte "%02x" string formatting
      // (measured 1.8 s of pure format cost per 5k images)
      def px(base: Long, x: Int, y: Int): Int = mdPixel(md, base, x, y)
      rows.map { row =>
        val id = row.getLong(idIdx)
        val base = id - math.floorMod(id, twinGroup.toLong)
        val j = math.floorMod(id, twinGroup.toLong).toInt
        val pixels = Array.ofDim[Byte](8, 8)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val g0 = px(base, x, y)
            val g = if (j > 0 && y == 0 && x == j - 1)
              math.floorMod(g0 + 128, 256) else g0
            pixels(y)(x) = g.toByte
            x += 1
          }
          y += 1
        }
        Row.fromSeq(row.toSeq :+ encodeGrayPng(pixels))
      }
    }(enc)
  }

  /** The aHash kernel over one decoded image: integer luma per pixel
    * (single-band non-palette rasters read the raw sample — no
    * colorspace transform; palette-indexed images go through getRGB,
    * where a gray palette's (g,g,g) luma (77g+150g+29g)»8 recovers g
    * EXACTLY — reading the raster there would hash palette INDICES),
    * ⌊b·dim/8⌋ block-mean grid, bit b set iff block mean ≥ the mean
    * of the 64 block means (comparison scaled by 64 — exact
    * power-of-two — so 8×8 inputs are pure integer arithmetic).
    */
  private[graft] def ahash64Of(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val gray = img.getRaster.getNumBands == 1 &&
      !img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
    val sums = new Array[Double](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        val lum =
          if (gray) img.getRaster.getSample(x, y, 0)
          else {
            val rgb = img.getRGB(x, y)
            (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
              29 * (rgb & 0xff)) >> 8
          }
        val b = by * 8 + bx
        sums(b) += lum; cnts(b) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(b =>
      if (cnts(b) == 0) 0.0 else sums(b) / cnts(b))
    val total = means.sum
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (means(b) * 64.0 >= total) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** Minimal 8-bit grayscale PNG encoder (signature + IHDR + one IDAT
    * of filter-0 rows + IEND). ImageIO.write pays a synchronized
    * writer-registry scan and stream setup PER IMAGE — at millions of
    * fixture images that lock serializes all 32 threads; this encoder
    * is pure local arithmetic. Decoders (including the gate's REAL
    * ImageIO read-back) see a byte-exact lossless gray image.
    */
  private[graft] def encodeGrayPng(
      pixels: Array[Array[Byte]]): Array[Byte] = {
    val h = pixels.length; val w = pixels(0).length
    val crc = new java.util.zip.CRC32
    val out = new java.io.ByteArrayOutputStream()
    def chunk(tag: String, body: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(body.length).array()
      out.write(len, 0, 4)
      val tb = tag.getBytes("US-ASCII")
      crc.reset(); crc.update(tb); crc.update(body)
      out.write(tb, 0, 4); out.write(body, 0, body.length)
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt(crc.getValue.toInt).array(), 0, 4)
    }
    out.write(Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
      0x1a, 0x0a), 0, 8)
    chunk("IHDR", java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte) // gray, depth 8
      .put(0.toByte).put(0.toByte).put(0.toByte).array())
    val raw = new Array[Byte](h * (w + 1)) // filter byte 0 + row
    var y = 0
    while (y < h) {
      System.arraycopy(pixels(y), 0, raw, y * (w + 1) + 1, w)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val bos = new java.io.ByteArrayOutputStream()
    while (!deflater.finished())
      bos.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", bos.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Average-hash (aHash) perceptual fingerprint over REAL decoded
    * pixels: decode (javax.imageio), integer luma per pixel
    * ((77R+150G+29B)»8; single-band rasters read the sample directly —
    * no colorspace transform, so gray PNGs hash their exact stored
    * values), block-mean downsample to an 8×8 grid (block boundaries
    * ⌊b·dim/8⌋ — any input size), then bit i = y·8+x set iff block
    * mean ≥ the mean of the 64 block means. Two visually-near images
    * differ in few bits, so the hash feeds the SAME pigeonhole
    * Hamming machinery as text simhash (Dedup.hammingNearDups) — the
    * image-dedup path of the pipeline, scale-safe end to end.
    *
    * On an 8×8 input every block is one pixel and the comparison
    * 64·g ≥ Σg is exact integer arithmetic — engine-replayable, which
    * is what the gate's oracle does. Partition-batched like every
    * media kernel here: one decoder per partition, task-completion
    * close, per-row error channel (`ahash` null + error string), no
    * task aborts on corrupt payloads.
    */
  def imageAHash64(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("ahash", LongType),
      StructField("ahash_ok", BooleanType),
      StructField("ahash_error", StringType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // heap-backed streams
      // ImageIO.read does a synchronized registry scan + reader
      // construction PER CALL — across 32 threads that lock is the
      // decode bottleneck. One PNG reader per partition, re-targeted
      // per image (setInput resets reader state); non-PNG payloads
      // fall back to the general path.
      val pngReader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => pngReader.dispose()))
      val pngMagic = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47)
      def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
        if (bytes.length > 4 && bytes.take(4).sameElements(pngMagic)) {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            pngReader.setInput(iis, true, true)
            pngReader.read(0)
          } finally iis.close()
        } else
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      rows.map { row =>
        val bytes = row.get(binIdx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        val res: Either[String, Long] =
          try {
            if (bytes == null || bytes.isEmpty)
              throw new IllegalArgumentException("empty payload")
            val img = readImage(bytes)
            if (img == null)
              throw new IllegalArgumentException("undecodable image")
            Right(ahash64Of(img))
          } catch {
            case e: Exception =>
              Left(Option(e.getMessage).getOrElse(e.getClass.getName))
          }
        Row.fromSeq(row.toSeq ++ (res match {
          case Right(v) => Seq(v, true, null)
          case Left(m) => Seq(null, false, m)
        }))
      }
    }(enc)
  }

  /** Decode/feature-extract pass: binary column → media_meta struct.
    * `mapPartitions` so a real decoder initializes once per partition;
    * per-row failures become `decode_ok=false` rows, never task aborts
    * (at 100 TB a single corrupt blob must not kill a stage).
    */
  def decodeMeta(df: DataFrame, binCol: String,
      factory: MediaDecoderFactory = FakeDecoderFactory): DataFrame = {
    val schema = withMediaSchema(df, binCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      // decoder context opens ONCE per partition; a native codec frees
      // its resources in close(), fired at task completion (success or
      // failure) — never per row
      val decoder = factory.open()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => decoder.close()))
      rows.map { row =>
        val bytes = row.get(binIdx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        val meta =
          try {
            val (fmt, w, h, nf) = decoder.decode(bytes)
            Row(fmt, w, h, nf, true, null)
          } catch {
            case e: Exception => Row(null, null, null, null, false,
              e.getMessage)
          }
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(enc)
  }

  /** Resizer swap point — same contract as MediaDecoderFactory. */
  trait MediaResizer extends java.io.Closeable {
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    override def close(): Unit = ()
  }
  trait MediaResizerFactory extends Serializable {
    def open(): MediaResizer
  }

  /** STUB resize kernel — deterministic fake: emits a payload whose
    * length encodes the target dims (real impl: scaler/codec call).
    */
  private[functions] object FakeResizer extends MediaResizer {
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      if (bytes == null || bytes.isEmpty)
        throw new IllegalArgumentException("empty payload")
      val out = new Array[Byte](math.max(4, (w * h) / 64))
      var i = 0
      while (i < out.length) { out(i) = bytes(i % bytes.length); i += 1 }
      out
    }
  }
  object FakeResizerFactory extends MediaResizerFactory {
    def open(): MediaResizer = FakeResizer
  }

  /** Resize pass: binary column → resized binary + (width, height,
    * resize_ok, error) — the same partition-batched contract as
    * decodeMeta (scaler initialized once per partition, per-row error
    * channel; a corrupt blob yields a null payload row, never a task
    * abort). Swap FakeResizer for a real scaler, nothing else changes.
    */
  def resizeTo(df: DataFrame, binCol: String, width: Int,
      height: Int,
      factory: MediaResizerFactory = FakeResizerFactory): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("resize_meta", StructType(Seq(
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("resize_ok", BooleanType),
        StructField("error", StringType))))))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      // scaler context opens ONCE per partition, closed at task end
      val resizer = factory.open()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => resizer.close()))
      rows.map { row =>
        val bytes = row.get(binIdx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        val (payload, meta) =
          try {
            val out = resizer.resize(bytes, width, height)
            (out, Row(width, height, true, null))
          } catch {
            case e: Exception =>
              (null, Row(null, null, false, e.getMessage))
          }
        Row.fromSeq(row.toSeq :+ payload :+ meta)
      }
    }(enc)
  }

  /** Frame sampling plan for video-ish payloads: one output row per
    * sampled frame index (stride `every`), exploded declaratively —
    * the shuffle-free Spark shape for frame extraction fan-out.
    */
  def sampleFrames(df: DataFrame, metaCol: String, every: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest(coalesce(col(s"$metaCol.n_frames"), lit(1)) - 1, lit(0)),
          lit(every))))

  /** Fixed-window chunking — the audio/video framing plan: one output
    * row per `size`-unit window of the payload (binary or string
    * column; SQL substring handles both), with the window's content
    * hash for downstream chunk-level dedup. Declarative explode: the
    * fan-out is a codegen'd generator, no shuffle, no UDF — at 100 TB
    * chunking is a map-only stage whose output feeds the same
    * hash-dedup operators as documents.
    */
  def chunkFixed(df: DataFrame, payloadCol: String, size: Int): DataFrame =
    df.withColumn("chunk_idx",
        explode(sequence(lit(0),
          greatest(ceil(length(col(payloadCol)) / lit(size)).cast("int") - 1,
            lit(0)))))
      .withColumn("chunk",
        expr(s"substring($payloadCol, chunk_idx * $size + 1, $size)"))
      .withColumn("chunk_len", length(col("chunk")))
      .withColumn("chunk_hash", md5(col("chunk")))
      .drop("chunk")

  /** Content-defined chunking — [[chunkFixed]]'s edit-resilient twin
    * (see [[graft.expressions.ContentChunks]]): boundaries from a
    * w-wide polynomial rolling hash, so an insertion shifts only the
    * chunks up to the first boundary past the edit and every later
    * chunk hash is PRESERVED — the property that lets recrawled /
    * re-encoded blobs share chunk-level dedup work. The kernel emits
    * (start, len) spans in one pass; span text + hash are cut
    * declaratively (codegen'd explode, no shuffle, no UDF).
    */
  def chunkContentDefined(df: DataFrame, payloadCol: String,
      window: Int = 16, prime: Long = 31L, modulus: Long = 1000000007L,
      divisor: Long = 64L, remainder: Long = 0L,
      minLen: Int = 1, maxLen: Int = Int.MaxValue): DataFrame =
    df.withColumn("__spans",
        org.apache.spark.sql.graftglue.Glue.column(
          graft.expressions.ContentChunks(
            org.apache.spark.sql.graftglue.Glue.expression(col(payloadCol)),
            window, prime, modulus, divisor, remainder, minLen, maxLen)))
      .select(col("*"), posexplode(col("__spans")).as(Seq("chunk_idx", "__s")))
      .withColumn("chunk_start", col("__s.start"))
      .withColumn("chunk_len", col("__s.len"))
      .withColumn("chunk_hash",
        md5(expr(s"substring($payloadCol, chunk_start, chunk_len)")))
      .drop("__spans", "__s")

  /** Blob-level near-dup pairs via shared content-defined chunks —
    * the file-dedup shape (backup systems, recrawl stores): two blobs
    * pair when the smaller one shares ≥ `threshold` of its DISTINCT
    * chunk hashes with the other. Because CDC boundaries resync after
    * edits, a prefix-/mid-edited copy still shares almost all chunks
    * — the case fixed chunking (and doc-hash exact dedup) misses.
    *
    * Scale shape — the dedup-family candidate discipline: candidates
    * come from an EQUI-JOIN on the chunk hash, never all-pairs; a
    * stop-chunk guard drops hashes appearing in more than `maxDf`
    * blobs first (shared boilerplate headers would otherwise fan out
    * quadratically — same role as lshBands' maxBucket and the
    * rarest-gram prefix filter); verification counts shared hashes
    * per candidate pair only. Both joins are forced shuffle so the
    * fixture-scale plan IS the production plan.
    */
  def chunkOverlapPairs(df: DataFrame, idCol: String, payloadCol: String,
      threshold: Double = 0.5, maxDf: Int = 100, window: Int = 16)
      : DataFrame = {
    val chunks = chunkContentDefined(
        df.select(col(idCol), col(payloadCol)), payloadCol, window = window)
      .select(col(idCol).as("__id"), col("chunk_hash")).distinct()
    val sizes = chunks.groupBy(col("__id"))
      .agg(count(lit(1)).as("__n_chunks"))
    val keep = chunks.groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("chunk_hash"))
    val pruned = chunks.hint("shuffle_merge")
      .join(keep.hint("shuffle_merge"), Seq("chunk_hash"))
    val shared = pruned.select(col("chunk_hash"), col("__id").as("id_a"))
      .hint("shuffle_merge")
      .join(pruned.select(col("chunk_hash"), col("__id").as("id_b"))
        .hint("shuffle_merge"), Seq("chunk_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_chunks"))
    shared
      .join(sizes.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__n_chunks", "n_chunks_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__n_chunks", "n_chunks_b"), Seq("id_b"))
      .withColumn("overlap",
        col("shared_chunks").cast("double") /
          least(col("n_chunks_a"), col("n_chunks_b")).cast("double"))
      .filter(col("overlap") >= threshold)
      .select(col("id_a"), col("id_b"), col("shared_chunks"),
        col("n_chunks_a"), col("n_chunks_b"), col("overlap"))
  }

  /** Byte-level feature extraction that IS runnable here (no codec):
    * payload size, xxhash64 content id, entropy-ish distinct-byte
    * ratio — the cheap pre-filter columns a media pipeline computes
    * before any real decode.
    */
  def byteFeatures(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("media_size", length(col(binCol)))
      .withColumn("media_hash", xxhash64(col(binCol)))

  // ---------------------------------------------------------------
  // Multi-frame container ("video") path: a seekable frame index +
  // selective per-frame decode. Real video sits behind JNI codecs
  // this container can't carry, so the fixture format is a minimal
  // indexed container of REAL PNG frames — the Spark-side contract
  // (parse the index cheaply, decode ONLY the sampled frames,
  // partition-batched reader, per-frame error rows) is exactly what
  // a keyframe-seeking codec binding plugs into.
  // ---------------------------------------------------------------

  private val VideoMagic = Array[Byte]('G', 'V', 'I', 'D')

  private def mdPixel(md: java.security.MessageDigest, seed: Long,
      x: Int, y: Int): Int = {
    val d = md.digest(s"px|$seed|$x|$y".getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    ((v >>> 4) % 256).toInt
  }

  /** Synthetic multi-frame container: `GVID` magic, int32 frame
    * count, then per frame [int32 length][8×8 gray PNG]. Frame `f`
    * of row `id` draws pixel (x,y) from the portable md5 formula
    * with seed `id·100 + f` (no twin perturbation), and the frame
    * count is `6 + id mod 5` — both replayable by an engine oracle,
    * which is the whole point of the fixture.
    */
  def withSyntheticVideo(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("payload", BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { row =>
        val id = row.getLong(idIdx)
        val nFrames = (6 + math.floorMod(id, 5L)).toInt
        val out = new java.io.ByteArrayOutputStream()
        out.write(VideoMagic, 0, 4)
        out.write(java.nio.ByteBuffer.allocate(4).putInt(nFrames).array(), 0, 4)
        var f = 0
        while (f < nFrames) {
          val pixels = Array.ofDim[Byte](8, 8)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              pixels(y)(x) = mdPixel(md, id * 100L + f, x, y).toByte
              x += 1
            }
            y += 1
          }
          val png = encodeGrayPng(pixels)
          out.write(java.nio.ByteBuffer.allocate(4).putInt(png.length).array(),
            0, 4)
          out.write(png, 0, png.length)
          f += 1
        }
        Row.fromSeq(row.toSeq :+ out.toByteArray)
      }
    }(enc)
  }

  /** Strided frame sampling with per-frame perceptual hashing: parse
    * the container index, decode ONLY frames `0, every, 2·every, …`
    * (skipped frames cost a length-field seek, not a decode), aHash
    * each decoded frame. One output row per sampled frame.
    *
    * Scale shape: map-only explode (no shuffle), one shared PNG
    * reader per partition (the ImageIO registry scan is a lock),
    * per-FRAME error channel (`frame_ok=false` + message; a corrupt
    * mid-container frame yields one bad row, never a task abort, and
    * never hides the container's other frames). The output (id,
    * frame_idx, ahash) feeds the same Hamming near-dup machinery as
    * images — video-level dedup = frame-set similarity downstream.
    */
  def frameSampleAHash(df: DataFrame, binCol: String,
      every: Int): DataFrame = {
    require(every >= 1, "frame stride must be >= 1")
    val binIdx = df.schema.fieldIndex(binCol)
    // the container payload does NOT survive into the output: per-
    // frame rows would otherwise each carry the whole multi-MB blob
    // (frames-per-doc copies through every downstream shuffle)
    val keptIdx = df.schema.fields.indices.filter(_ != binIdx)
    val schema = StructType(keptIdx.map(df.schema.fields) ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("ahash", LongType),
      StructField("frame_ok", BooleanType),
      StructField("frame_error", StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val pngReader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => pngReader.dispose()))
      def decodeAHash(bytes: Array[Byte], off: Int, len: Int): Long = {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes, off, len))
        try {
          pngReader.setInput(iis, true, true)
          ahash64Of(pngReader.read(0))
        } finally iis.close()
      }
      rows.flatMap { row =>
        val bytes = row.get(binIdx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        val base = keptIdx.map(row.get)
        def badContainer(msg: String) =
          Iterator.single(Row.fromSeq(
            base ++ Seq(null, null, null, false, msg)))
        if (bytes == null || bytes.length < 8 ||
            !bytes.take(4).sameElements(VideoMagic))
          badContainer("not a GVID container")
        else {
          val bb = java.nio.ByteBuffer.wrap(bytes)
          val nFrames = bb.getInt(4)
          if (nFrames < 0) badContainer(s"negative frame count $nFrames")
          else {
            var off = 8
            var f = 0
            var truncated = false
            val out = Seq.newBuilder[Row]
            while (f < nFrames && !truncated) {
              if (off + 4 > bytes.length) truncated = true
              else {
                val len = bb.getInt(off)
                // overflow-safe bound: `off + 4 + len` wraps negative
                // for a corrupt len near Int.MaxValue and would slip
                // past the guard into an out-of-bounds header read
                if (len < 0 || len > bytes.length - off - 4) truncated = true
                else {
                  if (f % every == 0) {
                    val cell =
                      try Right(decodeAHash(bytes, off + 4, len))
                      catch {
                        case e: Exception => Left(Option(e.getMessage)
                          .getOrElse(e.getClass.getName))
                      }
                    out += Row.fromSeq(base ++ (cell match {
                      case Right(h) => Seq(f, nFrames, h, true, null)
                      case Left(m) => Seq(f, nFrames, null, false, m)
                    }))
                  }
                  off += 4 + len
                }
              }
              if (!truncated) f += 1
            }
            if (truncated)
              out += Row.fromSeq(base ++
                Seq(f, nFrames, null, false, s"truncated at frame $f"))
            out.result().iterator
          }
        }
      }
    }(enc)
  }

  // ---------------------------------------------------------------
  // REAL video container: MJPEG-in-AVI, pure JVM. The GVID fixture
  // above exercises the seek/stride seam with a synthetic index;
  // this is the same seam bound to an actual interchange format —
  // RIFF/AVI structure (the container every MJPEG camera and player
  // speaks) with one baseline-JPEG frame per '00dc' chunk, decoded
  // by the JDK's own ImageIO JPEG codec. No JNI, zero egress.
  // JPEG is LOSSY and its decode is codec-implementation-defined, so
  // this path is spec-gated (determinism, stride, error channel,
  // self-parity against direct ImageIO decode of the same bytes) but
  // deliberately NOT DuckDB-oracle-gated — decoded pixels are not
  // engine-portable, which is a property of JPEG, not of the seam.
  // ---------------------------------------------------------------

  private def le32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Minimal spec-valid MJPEG AVI: RIFF('AVI ') → LIST hdrl (avih +
    * LIST strl (strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) →
    * LIST movi ('00dc' JPEG chunks, word-aligned) → idx1. Frame
    * rate 10 fps nominal; all sizes little-endian per RIFF.
    */
  private[graft] def encodeMjpegAvi(frames: Seq[Array[Byte]],
      width: Int, height: Int): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length % 2 // RIFF chunks are word-aligned
      fourcc(id) ++ le32(body.length) ++ body ++ Array.fill[Byte](pad)(0)
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ le32(4 + body.length) ++ fourcc(kind) ++ body
    val maxLen = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = le32(100000) ++ le32(0) ++ le32(0) ++
      le32(0x10) ++ // AVIF_HASINDEX
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(maxLen) ++
      le32(width) ++ le32(height) ++ Array.fill(4)(le32(0)).flatten
    val strh = fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(1) ++ le32(10) ++ le32(0) ++
      le32(frames.length) ++ le32(maxLen) ++ le32(-1) ++ le32(0) ++
      // rcFrame: left, top, right, bottom as int16
      Array[Byte](0, 0, 0, 0) ++
      java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putShort(width.toShort).putShort(height.toShort).array()
    val strf = le32(40) ++ le32(width) ++ le32(height) ++
      java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putShort(1).putShort(24).array() ++
      fourcc("MJPG") ++ le32(width * height * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl",
        chunk("strh", strh) ++ chunk("strf", strf)))
    val moviChunks = frames.map(f => chunk("00dc", f))
    val movi = list("movi", moviChunks.flatten.toArray)
    // idx1 offsets are relative to the 'movi' fourcc position
    var off = 4
    val idxEntries = moviChunks.zip(frames).map { case (c, f) =>
      val e = fourcc("00dc") ++ le32(0x10) ++ le32(off) ++
        le32(f.length)
      off += c.length
      e
    }
    val idx1 = chunk("idx1", idxEntries.flatten.toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** [[withSyntheticVideo]]'s REAL-FORMAT twin: the same md5-seeded
    * 8×8 gray frames (`6 + id mod 5` of them), JPEG-encoded by
    * ImageIO and wrapped in a spec-valid MJPEG AVI container.
    */
  def withSyntheticMjpegAvi(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("payload", BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { row =>
        val id = row.getLong(idIdx)
        val nFrames = (6 + math.floorMod(id, 5L)).toInt
        val frames = (0 until nFrames).map { f =>
          val img = new java.awt.image.BufferedImage(8, 8,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              img.getRaster.setSample(x, y, 0,
                mdPixel(md, id * 100L + f, x, y))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          bos.toByteArray
        }
        Row.fromSeq(row.toSeq :+ encodeMjpegAvi(frames, 8, 8))
      }
    }(enc)
  }

  /** [[frameSampleAHash]] over REAL MJPEG AVI payloads: walk the RIFF
    * structure to the 'movi' list, scan its chunk headers (a skipped
    * frame costs an 8-byte header read + seek, never a decode),
    * JPEG-decode only frames `0, every, 2·every, …` with one shared
    * ImageIO reader per partition, aHash each. Same output schema and
    * per-frame error channel as the GVID reader — the downstream
    * Hamming dedup cannot tell the containers apart, which is the
    * seam contract.
    */
  def aviFrameSampleAHash(df: DataFrame, binCol: String,
      every: Int): DataFrame = {
    require(every >= 1, "frame stride must be >= 1")
    val binIdx = df.schema.fieldIndex(binCol)
    val keptIdx = df.schema.fields.indices.filter(_ != binIdx)
    val schema = StructType(keptIdx.map(df.schema.fields) ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("ahash", LongType),
      StructField("frame_ok", BooleanType),
      StructField("frame_error", StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val jpgReader = javax.imageio.ImageIO
        .getImageReadersByFormatName("jpeg").next()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => jpgReader.dispose()))
      def decodeAHash(bytes: Array[Byte], off: Int, len: Int): Long = {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes, off, len))
        try {
          jpgReader.setInput(iis, true, true)
          ahash64Of(jpgReader.read(0))
        } finally iis.close()
      }
      def le(bytes: Array[Byte], off: Int): Int =
        (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
          ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
      def cc(bytes: Array[Byte], off: Int): String =
        new String(bytes, off, 4, "US-ASCII")
      rows.flatMap { row =>
        val bytes = row.get(binIdx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        val base = keptIdx.map(row.get)
        def badContainer(msg: String) =
          Iterator.single(Row.fromSeq(
            base ++ Seq(null, null, null, false, msg)))
        if (bytes == null || bytes.length < 12 ||
            cc(bytes, 0) != "RIFF" || cc(bytes, 8) != "AVI ")
          badContainer("not a RIFF/AVI container")
        else {
          // walk top-level chunks for LIST movi
          var off = 12
          var moviStart = -1
          var moviEnd = -1
          var corrupt: String = null
          while (moviStart < 0 && corrupt == null) {
            if (off + 8 > bytes.length) corrupt = "no movi list"
            else {
              val id = cc(bytes, off)
              val sz = le(bytes, off + 4)
              if (sz < 0 || sz > bytes.length - off - 8)
                corrupt = s"corrupt chunk size at $off"
              else if (id == "LIST" && sz >= 4 &&
                  cc(bytes, off + 8) == "movi") {
                moviStart = off + 12
                moviEnd = off + 8 + sz
              } else off += 8 + sz + (sz % 2)
            }
          }
          if (corrupt != null) badContainer(corrupt)
          else {
            // header scan: offsets/lengths of the video chunks only
            val idx = Seq.newBuilder[(Int, Int)]
            var p = moviStart
            while (corrupt == null && p + 8 <= moviEnd) {
              val id = cc(bytes, p)
              val sz = le(bytes, p + 4)
              if (sz < 0 || sz > moviEnd - p - 8)
                corrupt = s"corrupt frame chunk at $p"
              else {
                if (id.endsWith("dc") || id.endsWith("db"))
                  idx += ((p + 8, sz))
                p += 8 + sz + (sz % 2)
              }
            }
            val frames = idx.result()
            val nFrames = frames.length
            val out = Seq.newBuilder[Row]
            var f = 0
            while (f < nFrames) {
              if (f % every == 0) {
                val (fo, fl) = frames(f)
                val cell =
                  try Right(decodeAHash(bytes, fo, fl))
                  catch {
                    case e: Exception => Left(Option(e.getMessage)
                      .getOrElse(e.getClass.getName))
                  }
                out += Row.fromSeq(base ++ (cell match {
                  case Right(h) => Seq(f, nFrames, h, true, null)
                  case Left(m) => Seq(f, nFrames, null, false, m)
                }))
              }
              f += 1
            }
            if (corrupt != null)
              out += Row.fromSeq(base ++
                Seq(nFrames, nFrames, null, false, corrupt))
            out.result().iterator
          }
        }
      }
    }(enc)
  }
}
