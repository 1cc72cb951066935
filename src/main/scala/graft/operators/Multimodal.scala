package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column pipeline.
  *
  * Media is carried as an opaque `binary` column plus typed metadata — the
  * storage model a 100 TB training-data pipeline uses (media bytes stay in
  * parquet/iceberg binary columns; decode happens distributed, per
  * partition, never on the driver).
  *
  * Image decode is REAL for the formats the JVM ships codecs for
  * ([[decodeImages]]: PNG/BMP/GIF/JPEG via `javax.imageio`, header-only
  * reads, q68-gated, with quarantine-not-fail on corrupt payloads,
  * q73-gated). Audio/video codecs are not present in this environment;
  * an FFmpeg/JNI-backed decoder plugs into exactly the [[decodeImages]]
  * shape — a typed case class + `mapPartitions` with per-partition codec
  * init, streaming over rows, no driver collection — consuming the
  * container-demux rows [[explodeFrames]] emits. (r08: the former
  * hash-derived `decodeStub` plug-point is gone; every decode surface in
  * the library is real and gated.)
  */
object Multimodal {

  /** Attach the opaque binary payload column (here: utf-8 bytes of `text`;
    * in production: the raw media bytes read from the object store).
    */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).cast("binary").as("payload"))

  /** Decoded image metadata: format/dimensions read from the actual bytes
    * by a real decoder, or the hash-stub fallback for payloads no
    * installed codec can read (`decoded = false`).
    */
  final case class ImageMeta(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      decoded: Boolean)

  /** REAL image decode for the formats the JVM ships codecs for (PNG,
    * BMP, GIF, JPEG via `javax.imageio` — no external libraries). Reads
    * only the header-bearing prefix a reader needs, partition-wise, never
    * on the driver. Payloads with no matching reader fall back to the
    * deterministic hash stub (marked `decoded = false`) instead of
    * failing the pipeline — at 100 TB a handful of corrupt blobs must
    * not kill a stage, they must land in a quarantine filter.
    */
  def decodeImages(spark: SparkSession, withBinary: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    withBinary.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) => decodeImageOne(id, bytes) }
      }
  }

  private def decodeImageOne(id: Long, bytes: Array[Byte]): ImageMeta = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (readers.hasNext) {
        val r = readers.next()
        try {
          r.setInput(in)
          // header-only reads: width/height/format come from metadata,
          // no full pixel decode (cheap even for large assets)
          ImageMeta(id, r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0),
            decoded = true)
        } catch {
          // a reader CLAIMED the payload (magic bytes matched) but the
          // header is unreadable — the truncated-upload case. Same
          // quarantine contract as "no reader": flag, don't fail the stage.
          case scala.util.control.NonFatal(_) => quarantineRow(id, bytes)
        } finally r.dispose()
      } else quarantineRow(id, bytes)
    } finally if (in != null) in.close()
  }

  /** Quarantine row for an undecodable payload: `decoded = false`, no
    * dimensions (0 — consumers mask on the flag, as q73 does) —
    * downstream filters route these to review instead of a 100 TB stage
    * dying on one corrupt blob.
    */
  private def quarantineRow(id: Long, bytes: Array[Byte]): ImageMeta =
    ImageMeta(id, "unknown", 0, 0, decoded = false)

  /** Deterministic image fixture: a solid-color `width`×`height` image
    * encoded with the JVM's own PNG/BMP writers. This is the TEST-DATA
    * generator feeding [[decodeImages]] (the sandbox parquet has no real
    * media bytes); production replaces it with the object-store read.
    */
  def encodeTestImage(id: Long, width: Int, height: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (id * 2654435761L & 0xffffffL).toInt // deterministic fill
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos), s"no $format writer")
    bos.toByteArray
  }

  /** Gray level (0..255) of grid cell (x, y) for fixture image `id`:
    * the first two hex chars of md5("id:x:y:g") — the md5-derived
    * construction ([[graft.operators.Projection]] signs, same family)
    * that lets the DuckDB oracle recompute a PIXEL-derived hash from id
    * arithmetic alone.
    */
  def gridGray(id: Long, x: Int, y: Int): Int = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$id:$x:$y:g".getBytes("UTF-8"))
    (hex(0) & 0xff)
  }

  /** Deterministic 8×8-block grayscale fixture image: cell (x, y) of an
    * (8·cell)² image is filled with [[gridGray]]. PNG and BMP encodes of
    * one id carry IDENTICAL pixels — the cross-format duplicate pair
    * content dedup must catch where byte-level hashing (q30) cannot.
    */
  def encodeGridImage(id: Long, cell: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8 * cell, 8 * cell, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val g = gridGray(id, gx, gy)
        val rgb = (g << 16) | (g << 8) | g
        var py = 0
        while (py < cell) {
          var px = 0
          while (px < cell) {
            img.setRGB(gx * cell + px, gy * cell + py, rgb); px += 1
          }
          py += 1
        }
        gx += 1
      }
      gy += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos), s"no $format writer")
    bos.toByteArray
  }

  /** 56-bit difference hash over DECODED pixels (dHash, 8×8 grid, 7
    * horizontal comparisons per row — 56 bits keeps the value inside a
    * signed long, the q76 convention): bit (y·7+x) is set iff the grid
    * cell right of (x, y) is brighter. Content-addressed, so the same
    * image re-encoded through a different lossless container (PNG vs
    * BMP) hashes identically — the image-dedup primitive a byte hash
    * can't provide. Full pixel decode, partition-wise (mapPartitions,
    * the imageio codec boundary); grid cells are sampled top-left
    * nearest-neighbor at width/8 strides, so any integer upscale of the
    * same grid hashes the same.
    */
  def dHash56(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("row_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          val cw = math.max(1, img.getWidth / 8)
          val ch = math.max(1, img.getHeight / 8)
          var hash = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 7) {
              val l = img.getRGB(x * cw, y * ch) & 0xff
              val r = img.getRGB((x + 1) * cw, y * ch) & 0xff
              if (r > l) hash |= (1L << (y * 7 + x))
              x += 1
            }
            y += 1
          }
          (id, hash)
        }
      }.toDF("row_id", "dhash")
  }

  /** Deterministic frame sampling plan: every `stride`-th frame index up to
    * `nFrames` — the "frame-sample" op of a video pipeline, computed
    * declaratively (codegen'd `sequence`, no UDF).
    */
  def frameSamplePlan(features: DataFrame, stride: Int): DataFrame =
    features.select(col("doc_id"), col("n_frames"),
      sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)).as("sampled_frames"))

  /** Byte-chunk the opaque payload into fixed-size frames: one output row
    * per (doc_id, frame_idx, frame) with the raw frame bytes — the
    * "container demux" step of a video pipeline, expressed ENTIRELY in
    * codegen'd expressions (sequence + transform + substring on binary +
    * posexplode); no UDF, no stub. The last frame may be short. A real
    * codec consumes these rows partition-wise exactly like
    * [[decodeImages]] consumes payloads.
    */
  def explodeFrames(withBinary: DataFrame, frameBytes: Int): DataFrame = {
    require(frameBytes >= 1, "frameBytes must be positive")
    // CASE guard: sequence(0, -1) would COUNT DOWN on an empty payload
    withBinary
      .select(col("doc_id"),
        expr(
          s"""CASE WHEN length(payload) = 0 THEN CAST(array() AS ARRAY<BINARY>)
             |ELSE transform(
             |  sequence(0, CAST(ceil(length(payload) / $frameBytes.0) AS INT) - 1),
             |  i -> substring(payload, i * $frameBytes + 1, $frameBytes)) END""".stripMargin)
          .as("__frames"))
      .select(col("doc_id"), posexplode(col("__frames")).as(Seq("frame_idx", "frame")))
  }

  /** Overlapping byte windows (audio-style framing): window w starts at
    * byte w × hop and spans `width` bytes; windows are emitted while their
    * START lies inside the payload (trailing windows may be short). Same
    * all-codegen contract as [[explodeFrames]]; hop < width yields the
    * overlap an STFT-style feature extractor expects.
    */
  def slidingWindows(withBinary: DataFrame, width: Int, hop: Int): DataFrame = {
    require(width >= 1 && hop >= 1, "width and hop must be positive")
    withBinary
      .select(col("doc_id"),
        expr(
          s"""CASE WHEN length(payload) = 0 THEN CAST(array() AS ARRAY<BINARY>)
             |ELSE transform(
             |  sequence(0, CAST(ceil(length(payload) / $hop.0) AS INT) - 1),
             |  w -> substring(payload, w * $hop + 1, $width)) END""".stripMargin)
          .as("__wins"))
      .select(col("doc_id"), posexplode(col("__wins")).as(Seq("window_idx", "window")))
  }
}
