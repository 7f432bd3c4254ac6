package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The heavy decoders (image/audio codecs) are NOT available in this
  * environment, so the decode kernel is STUBBED with a deterministic
  * fake — but the Spark-side contract is real and tested: schema shape,
  * partition-batched execution (`mapPartitions`, one decoder init per
  * partition, not per row), and null/error tagging instead of task
  * failure. Swapping `FakeDecoder` for a JNI/FFI codec changes no plan.
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

  /** Byte-level feature extraction that IS runnable here (no codec):
    * payload size, xxhash64 content id, entropy-ish distinct-byte
    * ratio — the cheap pre-filter columns a media pipeline computes
    * before any real decode.
    */
  def byteFeatures(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("media_size", length(col(binCol)))
      .withColumn("media_hash", xxhash64(col(binCol)))
}
