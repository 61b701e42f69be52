package graft.textops

import graft.{Q, T}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque binary columns with typed
  * metadata, decoded/feature-extracted per partition. Real images
  * (PNG/JPEG/GIF/BMP) decode through the JDK's javax.imageio —
  * [[Multimodal.decodeImage]]/[[Multimodal.resizeImage]] produce true
  * pixel dimensions, luminance histograms, and letterboxed re-encodes;
  * non-image bytes fall back to the deterministic [[Multimodal.decodeStub]]
  * twin so the text-only test corpus stays DuckDB-oracle-checkable. The
  * Spark-side plumbing (binary schema, batch iteration via
  * mapPartitions, typed output Encoder, partition-local batching) is
  * shared by both paths and is what matters at 100 TB: decode runs once
  * per row inside a partition with no shuffle, and the feature schema
  * flows through Catalyst as ordinary columns.
  */
object Multimodal {

  /** Typed output of the feature extractor. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      histogram: Array[Double])

  /** STUB: stands in for a real image decode (e.g. JPEG → WxH + channel
    * stats). Deterministic: dimensions derive from byte length, the
    * "histogram" is a 4-bucket distribution over byte values. A real
    * deployment swaps only this function; the operator shape is final. */
  private[textops] def decodeStub(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    val hist = new Array[Double](4)
    var i = 0
    while (i < bytes.length) {
      hist(java.lang.Byte.toUnsignedInt(bytes(i)) >> 6) += 1.0
      i += 1
    }
    val n = math.max(bytes.length, 1)
    MediaFeatures(
      doc_id = docId,
      n_bytes = bytes.length.toLong,
      width = 16 + (bytes.length % 64),
      height = 9 + (bytes.length % 36),
      histogram = hist.map(_ / n))
  }

  /** REAL decode: when the binary column holds an actual encoded image
    * (PNG/JPEG/GIF/BMP — whatever the JDK's javax.imageio reads), the
    * true pixel dimensions and a 4-bucket LUMINANCE histogram come out;
    * anything that isn't a decodable image falls back to [[decodeStub]],
    * so one operator serves mixed corpora. The synthetic text corpus
    * takes the stub twin (whose features the DuckDB oracle restates);
    * TextOpsSpec drives this path with a generated PNG. */
  private[graft] def decodeMedia(docId: Long, bytes: Array[Byte]): MediaFeatures =
    decodeImage(docId, bytes).getOrElse(decodeStub(docId, bytes))

  private[graft] def decodeImage(docId: Long, bytes: Array[Byte]): Option[MediaFeatures] = {
    if (!looksLikeImage(bytes)) return None // cheap magic-byte sniff before ImageIO
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val hist = new Array[Double](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum >> 6) += 1.0
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some(MediaFeatures(docId, bytes.length.toLong, w, h, hist.map(_ / n)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length > 8 && (
      (b(0) == 0x89.toByte && b(1) == 'P'.toByte && b(2) == 'N'.toByte && b(3) == 'G'.toByte) ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) || // JPEG SOI
      (b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte) ||
      (b(0) == 'B'.toByte && b(1) == 'M'.toByte))

  /** Real resize: decode, aspect-preserving scale, symmetric letterbox
    * onto a target canvas, PNG re-encode. Returns the encoded canvas
    * plus the scaled content dims; None when the bytes aren't an image
    * (callers then keep the stub geometry path). */
  private[graft] def resizeImage(bytes: Array[Byte], tw: Int, th: Int): Option[(Array[Byte], Int, Int)] = {
    decodeImage(0L, bytes).flatMap { f =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        val scale = math.min(tw.toDouble / f.width, th.toDouble / f.height)
        val sw = math.round(f.width * scale).toInt
        val sh = math.round(f.height * scale).toInt
        val canvas = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = canvas.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, (tw - sw) / 2, (th - sh) / 2, sw, sh, null)
        } finally g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(canvas, "png", out)
        Some((out.toByteArray, sw, sh))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Binary ingest → partition-local decode → typed features → SQL-able
    * aggregation. The binary column here is fabricated from text (the
    * corpus has no real media), which exercises the identical plumbing. */
  val d11_multimodal_features = Q(
    (s, dir) => {
      import s.implicits._
      val bin = T(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      val features = bin.as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => decodeMedia(id, bytes) })
      features.toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          round(element_at(col("histogram"), 2), 6).as("h1"))
        .orderBy("doc_id")
    },
    // The stub's features are pure functions of the UTF-8 bytes (ASCII
    // corpus: bytes == chars), so the oracle restates them over the
    // text: h1 = share of bytes in [0x40,0x7f] (byte >> 6 == 1).
    Some("""
      SELECT doc_id,
        CAST(LENGTH(text) AS BIGINT) AS n_bytes,
        CAST(16 + LENGTH(text) % 64 AS INT) AS width,
        CAST(9 + LENGTH(text) % 36 AS INT) AS height,
        ROUND(CAST(len(regexp_extract_all(text, '[\x40-\x7f]')) AS DOUBLE)
          / GREATEST(LENGTH(text), 1), 6) AS h1
      FROM documents ORDER BY doc_id"""))

  /** Video-style frame sampling over an opaque media column: fixed
    * frame width, strided sampling (every 2nd frame here), one output
    * row per sampled frame with a per-frame signature — the
    * `frame-sample` stage of a video ingestion pipeline. The "frames"
    * are deterministic character windows standing in for the codec
    * (same stub policy as d11); everything else — the row-per-frame
    * explode, 0-based frame numbering, per-frame hashing, pruned
    * projection — is the real operator shape. Row-local (explode, no
    * shuffle) until the final presentation sort. */
  val d22_frame_sample = Q(
    (s, dir) => {
      val width = 64
      val stride = 128
      T(s, dir, "documents")
        .filter(length(col("text")) >= width)
        .select(col("doc_id"),
          posexplode(expr(
            s"transform(sequence(0, CAST(floor((length(text) - $width) / $stride) AS INT)), i -> substring(text, i * $stride + 1, $width))"))
            .as(Seq("frame_no", "frame")))
        .select(col("doc_id"), col("frame_no"),
          md5(encode(col("frame"), "UTF-8")).as("frame_sig"),
          length(col("frame")).as("frame_chars"))
        .orderBy("doc_id", "frame_no")
    },
    Some("""
      WITH t AS (SELECT doc_id, text, length(text) AS len
                 FROM documents WHERE length(text) >= 64),
      f AS (SELECT doc_id, text,
              unnest(range(0, CAST(floor((len - 64) / 128) AS INT) + 1)) AS frame_no
            FROM t)
      SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
        md5(substring(text, CAST(frame_no * 128 + 1 AS INT), 64)) AS frame_sig,
        CAST(length(substring(text, CAST(frame_no * 128 + 1 AS INT), 64)) AS INT) AS frame_chars
      FROM f ORDER BY doc_id, frame_no"""))

  /** Resize stage: decoded media normalized to a fixed target shape
    * (224×126 here — the fixed-input-tensor contract of a vision
    * model), with the scale factors and a letterbox/crop decision per
    * row. The geometry is REAL (aspect-preserving scale + pad math over
    * the decoded dims); only the pixels are stubbed, same policy as
    * d11/d22. Row-local — the resize stage adds zero shuffles to an
    * ingestion pipeline. */
  val d28_resize = Q(
    (s, dir) => {
      import s.implicits._
      val (tw, th) = (224, 126)
      T(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val f = decodeMedia(id, bytes)
          // aspect-preserving scale to fit, then symmetric letterbox
          val scale = math.min(tw.toDouble / f.width, th.toDouble / f.height)
          val sw = math.round(f.width * scale).toInt
          val sh = math.round(f.height * scale).toInt
          (id, f.width, f.height, sw, sh,
            math.floor(scale * 1e6) / 1e6,
            (tw - sw) / 2, (th - sh) / 2)
        })
        .toDF("doc_id", "src_w", "src_h", "out_w", "out_h",
          "scale", "pad_x", "pad_y")
        .orderBy("doc_id")
    },
    // the geometry restated over the decode-stub dims in DuckDB: same
    // floor-quantized scale, so the doubles compare exactly
    Some("""
      WITH d AS (SELECT doc_id,
                   CAST(16 + LENGTH(text) % 64 AS INT) AS src_w,
                   CAST(9 + LENGTH(text) % 36 AS INT) AS src_h
                 FROM documents),
      s AS (SELECT doc_id, src_w, src_h,
              LEAST(224.0 / src_w, 126.0 / src_h) AS sc
            FROM d)
      SELECT doc_id, src_w, src_h,
        CAST(round(src_w * sc) AS INT) AS out_w,
        CAST(round(src_h * sc) AS INT) AS out_h,
        floor(sc * 1e6) / 1e6 AS scale,
        CAST((224 - CAST(round(src_w * sc) AS INT)) // 2 AS INT) AS pad_x,
        CAST((126 - CAST(round(src_h * sc) AS INT)) // 2 AS INT) AS pad_y
      FROM s ORDER BY doc_id"""))

  /** Audio-path feature extraction over an opaque media column: the
    * bytes are read as a 16-bit little-endian PCM waveform (consecutive
    * byte pairs, DC-centered) and each document reports the classic
    * voice-activity/loudness gate signals — sample count, zero
    * crossings, total energy (exact Σv² as BIGINT), and peak amplitude.
    * The waveform "codec" is the deterministic stand-in (same stub
    * policy as d11/d22 — a real deployment swaps [[pcmSamples]] for an
    * actual decoder); the operator shape — partition-local decode, one
    * row per document, integer features through Catalyst — is the real
    * audio ingestion stage. Row-local, zero shuffles before the
    * presentation sort. */
  private[textops] def pcmSamples(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      // little-endian unsigned 16-bit, DC-centered to signed
      val raw = java.lang.Byte.toUnsignedInt(bytes(2 * i)) |
        (java.lang.Byte.toUnsignedInt(bytes(2 * i + 1)) << 8)
      out(i) = raw - 16384
      i += 1
    }
    out
  }

  val d44_audio_features = Q(
    (s, dir) => {
      import s.implicits._
      T(s, dir, "documents")
        // structural ASCII guard: the oracle equates UTF-8 bytes with
        // character codes, which only holds for 1-byte chars — restrict
        // BOTH sides to byte-length == char-length rows so a non-ASCII
        // fixture is excluded consistently instead of hash-diverging
        .filter(octet_length(col("text")) === length(col("text")))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val v = pcmSamples(bytes)
          var zc = 0L; var energy = 0L; var peak = 0L
          var i = 0
          while (i < v.length) {
            val x = v(i).toLong
            if (i > 0 && v(i - 1).toLong * x < 0) zc += 1
            energy += x * x
            if (math.abs(x) > peak) peak = math.abs(x)
            i += 1
          }
          (id, v.length.toLong, zc, energy, peak)
        })
        .toDF("doc_id", "n_samples", "zero_crossings", "energy", "peak")
        .filter(col("n_samples") > 0)
        .orderBy("doc_id")
    },
    // the waveform restated in DuckDB: sample i (1-based) is the
    // DC-centered little-endian pair of text bytes (ASCII corpus:
    // byte == char code), crossings via lag, energy/peak exact BIGINTs
    Some("""
      WITH samples AS (
        SELECT doc_id, i,
          ascii(substr(text, 2 * i - 1, 1)) + 256 * ascii(substr(text, 2 * i, 1)) - 16384 AS v
        FROM documents, LATERAL (SELECT unnest(generate_series(1, LENGTH(text) // 2)) AS i) t
        WHERE octet_length(encode(text)) = length(text)),
      marked AS (
        SELECT doc_id, v,
          CASE WHEN v * lag(v) OVER (PARTITION BY doc_id ORDER BY i) < 0 THEN 1 ELSE 0 END AS zc
        FROM samples)
      SELECT doc_id, COUNT(*) AS n_samples,
        CAST(SUM(zc) AS BIGINT) AS zero_crossings,
        CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS energy,
        CAST(MAX(ABS(v)) AS BIGINT) AS peak
      FROM marked GROUP BY doc_id
      HAVING COUNT(*) > 0
      ORDER BY doc_id"""))

  val all: Map[String, Q] = Map(
    "d11_multimodal_features" -> d11_multimodal_features,
    "d22_frame_sample" -> d22_frame_sample,
    "d28_resize" -> d28_resize,
    "d44_audio_features" -> d44_audio_features)
}
