package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages shaped the way a real pipeline runs them at 100 TB.
  *
  * The Spark-side plumbing is REAL — schema, partitioning, per-partition
  * batch iteration (the shape an Arrow/JNI decoder consumes), deterministic
  * output contract, explode-based frame fan-out. Two decoders sit behind
  * the seam: [[imageIoDecoder]], a REAL pure-JVM image decode (whole
  * payloads and, via [[sampleIndexedFrames]] over a [[frameContainer]],
  * real per-frame decode too), and the clearly-marked STUB `fakeDecode`
  * (md5-seeded deterministic features) for payloads no JVM codec reads —
  * the fixture media table carries text bytes, so the oracle-checked
  * queries stay on the stub while MultimodalSpec proves the real decoder
  * on images and frame containers encoded in-test. Swapping decoders
  * changes ONLY the `decoder` argument — every plan shape, schema, and
  * test stays valid.
  *
  * Scale notes:
  *   - media rows are heavy (MBs); `decodeFeatures` repartitions by media_id
  *     so decode parallelism is row-count-bound, not file-layout-bound, and
  *     runs in mapPartitions with no shuffle of the decoded output.
  *   - frame sampling explodes to (media_id, frame_no) BEFORE decode, so
  *     per-frame work distributes; a 2-hour video never decodes on one core.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, format: String, bytes: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           content_md5: String, features: Array[Float])
  case class FrameFeatures(media_id: Long, frame_no: Int, offset_ms: Long,
                           n_bytes: Long, features: Array[Float])

  val FeatureDim = 16

  /** Hard per-row payload ceiling (256 MB). Media rows carry whole encoded
    * payloads, so a single outsized row can OOM an executor or blow the
    * 2 GB array limit long before any decode runs — every decode path
    * checks it and fails LOUDLY with the offending media_id instead of
    * dying opaquely mid-shuffle. Payloads beyond the ceiling belong in
    * object storage with reference-typed rows, not inline bytes. */
  val DefaultMaxBytes: Long = 256L << 20

  /** The decoder contract: (payload bytes, salt) → feature vector. The
    * salt disambiguates sub-row work (frame number); whole-row decodes
    * pass 0. Implementations must be serializable (they ship to
    * executors) and pure — the same (bytes, salt) must always yield the
    * same vector, because features join the oracle-checked surface. */
  type Decoder = (Array[Byte], Int) => Array[Float]

  /** STUB decoder — deterministic fake: 16 floats from md5(bytes ++ salt).
    * A real implementation decodes/resamples here (JNI/FFI), consuming the
    * same per-partition iterator. Salt 0 appends nothing and salt > 0 its
    * decimal ASCII form, so every feature is reproducible from plain
    * `md5(text [|| salt])` in any engine — the q32 oracle depends on it. */
  val stubDecoder: Decoder = fakeDecode _

  private def fakeDecode(bytes: Array[Byte], salt: Int): Array[Float] = {
    val d = MessageDigest.getInstance("MD5")
    d.update(bytes)
    if (salt != 0) d.update(salt.toString.getBytes("UTF-8"))
    val h = d.digest() // 16 bytes → 16 floats in [-1, 1)
    h.map(b => b.toFloat / 128.0f)
  }

  /** REAL image decoder — pure-JVM `javax.imageio` (PNG/BMP/GIF/JPEG
    * readers ship inside the JDK; no native libraries, so this one clears
    * the sandbox constraint that keeps [[stubDecoder]] in the oracle
    * path). Decodes the payload and averages integer luminance
    * (299R+587G+114B)/1000 over a 4×4 grid → 16 floats in [0,1] — a
    * deterministic function of the pixel raster, so the contract
    * ([[Decoder]] purity) holds: same bytes, same vector, on every
    * executor. Non-image payloads fail LOUDLY with the media_id-bearing
    * require in [[decodeBatch]]'s caller frame rather than returning
    * garbage features. Whole-payload decode only (enforced by the salt
    * require below): a byte SLICE of an encoded image is not itself
    * decodable, so [[sampleFrames]]' byte-range stub path keeps the stub
    * decoder — real frame decode goes through [[sampleIndexedFrames]],
    * whose container index cuts complete encoded images per frame (salt
    * 0). The fixture media table carries text bytes, so the
    * oracle-checked queries (q32/q85) stay on [[stubDecoder]]; this
    * decoder is proven by MultimodalSpec over PNGs encoded in-test, and
    * the frame path by [[sampleIndexedFrames]] over a [[frameContainer]]
    * (each indexed slice is a complete encoded image, so frame decodes
    * pass salt 0). */
  val imageIoDecoder: Decoder = (bytes: Array[Byte], salt: Int) => {
    // the salt contract disambiguates NON-decodable sub-row slices (the
    // stub's byte-range frames); a whole-payload decoder must never be
    // wired into that path silently — the slice would decode as garbage
    // or, worse, every frame would share byte-identical features
    require(salt == 0, "imageIoDecoder is whole-payload only: got a frame " +
      s"salt $salt — route frames through an indexed container " +
      "(sampleIndexedFrames) so each slice is a complete encoded image")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image (ImageIO found no reader)")
    val grid = 4
    val out = new Array[Float](FeatureDim)
    var gy = 0
    while (gy < grid) {
      var gx = 0
      while (gx < grid) {
        val x0 = img.getWidth * gx / grid
        val x1 = math.max(x0 + 1, img.getWidth * (gx + 1) / grid)
        val y0 = img.getHeight * gy / grid
        val y1 = math.max(y0 + 1, img.getHeight * (gy + 1) / grid)
        var sum = 0L
        var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            n += 1
            x += 1
          }
          y += 1
        }
        out(gy * grid + gx) = (sum.toFloat / n) / 255.0f
        gx += 1
      }
      gy += 1
    }
    out
  }

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes).map("%02x".format(_)).mkString

  /** Batched decode seam: one call per partition, iterator-in/iterator-out —
    * exactly the shape a vectorized (Arrow-batch) decoder needs. */
  private def decodeBatch(rows: Iterator[MediaRow], maxBytes: Long,
                          decoder: Decoder): Iterator[MediaFeatures] =
    rows.map { r =>
      require(r.bytes.length.toLong <= maxBytes,
        s"media payload ${r.bytes.length} exceeds maxBytes=$maxBytes (media_id=${r.media_id})")
      MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong,
        md5Hex(r.bytes), decoder(r.bytes, 0))
    }

  /** Decode + featurize every media row. Repartitions by media_id first:
    * decode cost is per-row and huge relative to row count, so parallelism
    * must not follow the input file layout. Rows over `maxBytes` fail
    * loudly (see DefaultMaxBytes). `decoder` is the swap-in point for a
    * real codec — nothing else in the plan changes with it. */
  def decodeFeatures(media: Dataset[MediaRow], partitions: Int,
                     maxBytes: Long = DefaultMaxBytes,
                     decoder: Decoder = stubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.repartition(partitions, col("media_id"))
      .mapPartitions(decodeBatch(_, maxBytes, decoder))
  }

  /** Evenly-spaced frame sampling for video rows: each frame row carries
    * ONLY its byte range of the payload — the ranges are cut ROW-LOCALLY
    * before the shuffle (the stub analogue of reading a container's
    * keyframe index), so the payload crosses the wire once in total, not
    * once per frame. A 2-hour video therefore neither decodes on one core
    * (per-frame rows spread by (media_id, frame_no)) NOR multiplies its
    * gigabytes by nFrames through the exchange — the round-1 fan-out kept
    * the first property but paid nFrames× shuffle amplification for it.
    * Frame decode salts with frame_no + 1 over the frame's own slice. */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int, durationMs: Long,
                   partitions: Int, maxBytes: Long = DefaultMaxBytes,
                   decoder: Decoder = stubDecoder): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    require(nFrames >= 1, "nFrames must be >= 1")
    require(maxBytes <= Int.MaxValue.toLong, "maxBytes must fit an on-heap array")
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("bytes"),
        octet_length(col("bytes")).cast("long").as("total"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_no"))
      // frame slice [f·total/n, (f+1)·total/n) — integer DIV, 1-based pos
      .select(col("media_id"), col("frame_no"), col("total"),
        expr(s"""substring(bytes,
          CAST(frame_no * total DIV $nFrames AS INT) + 1,
          CAST((frame_no + 1) * total DIV $nFrames - frame_no * total DIV $nFrames AS INT))""")
          .as("frame_bytes"))
      .repartition(partitions, col("media_id"), col("frame_no"))
      .as[(Long, Int, Long, Array[Byte])]
      .mapPartitions(_.map { case (id, f, total, slice) =>
        require(total <= maxBytes,
          s"media payload $total exceeds maxBytes=$maxBytes (media_id=$id)")
        FrameFeatures(id, f, f.toLong * durationMs / nFrames,
          slice.length.toLong, decoder(slice, f + 1))
      })
  }

  /** Minimal indexed multi-frame container ("GFC1") — the honest stand-in
    * for a real video container's keyframe index, so the REAL
    * whole-payload decoder can prove the frame-sampling path: each
    * indexed slice is a COMPLETE encoded image (contrast [[sampleFrames]]'
    * byte-range stub slices, which are not decodable by construction).
    * Layout: magic "GFC1" | int32 BE frame count | per frame (int64 BE
    * absolute payload offset, int32 BE length) | concatenated encoded
    * frame payloads. Big-endian integers so the Spark-side index parse is
    * plain `conv(hex(substring(...)), 16, 10)` — row-local, codegen'd, no
    * UDF. */
  def frameContainer(frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "a frame container needs at least one frame")
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write("GFC1".getBytes("US-ASCII"))
    out.writeInt(frames.size)
    var off = 8L + 12L * frames.size
    frames.foreach { f => out.writeLong(off); out.writeInt(f.length); off += f.length }
    frames.foreach(out.write)
    out.flush()
    bos.toByteArray
  }

  /** Evenly-spaced frame sampling over an INDEXED container
    * ([[frameContainer]]): the index header is parsed ROW-LOCALLY with
    * codegen'd byte math (`conv(hex(substring))`), each sampled frame row
    * carries ONLY its indexed slice — a complete encoded image — and the
    * decode salts with 0 because the slice itself determines the frame
    * (the whole-payload [[imageIoDecoder]] contract; identical frames
    * yielding identical features is CORRECT for a real decode). Same
    * scale shape as [[sampleFrames]]: slices cut before the shuffle, the
    * payload crosses the wire once in total, per-frame decode spreads by
    * (media_id, frame_no). Non-container payloads and containers with
    * fewer frames than requested fail LOUDLY, naming the media_id. */
  def sampleIndexedFrames(media: Dataset[MediaRow], nFrames: Int,
                          durationMs: Long, partitions: Int,
                          maxBytes: Long = DefaultMaxBytes,
                          decoder: Decoder = imageIoDecoder): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    require(nFrames >= 1, "nFrames must be >= 1")
    require(maxBytes <= Int.MaxValue.toLong, "maxBytes must fit an on-heap array")
    val err = (what: String) => raise_error(concat(lit(what + " (media_id="),
      col("media_id").cast("string"), lit(")"))).cast("int")
    val parsed = expr("CAST(conv(hex(substring(bytes, 5, 4)), 16, 10) AS INT)")
    val nTotal =
      when(substring(col("bytes"), 1, 4) =!= lit("GFC1".getBytes("US-ASCII")),
        err("payload is not a GFC1 frame container"))
        .when(parsed < nFrames,
          err(s"container has fewer frames than the $nFrames requested"))
        .otherwise(parsed)
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("bytes"),
        octet_length(col("bytes")).cast("long").as("total"),
        nTotal.as("n_total"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_no"))
      // global frame index k = frame_no·n_total DIV nFrames; its indexed
      // slice [offset, offset+len) is a whole encoded image
      .withColumn("k", expr(s"CAST(frame_no * n_total DIV $nFrames AS INT)"))
      .select(col("media_id"), col("frame_no"),
        expr(s"k * ${durationMs}L DIV n_total").as("offset_ms"),
        col("total"),
        expr("""substring(bytes,
            CAST(conv(hex(substring(bytes, 9 + 12 * k, 8)), 16, 10) AS INT) + 1,
            CAST(conv(hex(substring(bytes, 17 + 12 * k, 4)), 16, 10) AS INT))""")
          .as("frame_bytes"))
      .repartition(partitions, col("media_id"), col("frame_no"))
      .as[(Long, Int, Long, Long, Array[Byte])]
      .mapPartitions(_.map { case (id, f, offMs, total, slice) =>
        require(total <= maxBytes,
          s"media payload $total exceeds maxBytes=$maxBytes (media_id=$id)")
        FrameFeatures(id, f, offMs, slice.length.toLong, decoder(slice, 0))
      })
  }

  /** Resize/transcode plumbing: metadata transform + stub re-encode (real
    * impl: scale pixels). Output schema carries the new dimensions so
    * downstream stages are written against the final contract. */
  def resizePlan(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    media.withColumn("target_width", lit(targetW))
      .withColumn("target_height", lit(targetH))
      .withColumn("resized_md5", md5(col("bytes"))) // stub: real impl re-encodes

  /** Demo media table derived from the documents fixture (no binary fixture
    * ships): text bytes stand in for encoded media; kinds cycle
    * deterministically. The plumbing downstream is identical. */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        lit("stub").as("format"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaRow]
  }

  /** Featurize the demo table end-to-end (the rows-only q32 entry). */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(mediaFromDocuments(spark, sfDir),
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("content_md5"),
        // first feature surfaced as exact e4 fixed point (f = byte/128 is a
        // dyadic rational — bit-identical in any engine; see fixedPoint)
        floor(element_at(col("features"), 1).cast("double") * 10000 + 0.5)
          .cast("long").as("f0_e4"))
      .orderBy(col("media_id"))
  }
}
