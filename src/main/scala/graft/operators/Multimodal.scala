package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side plumbing is real (schema, partitioning, batch shape,
  * typed Encoders) — and so is the decode for every format the bare
  * JDK ships a codec for: PNG/JPEG/BMP/GIF via `javax.imageio`,
  * WAV/AIFF PCM via `javax.sound.sampled` (both headless-safe, no
  * external jars). Formats the JVM cannot decode (video containers,
  * hostile bytes) fall back to a clearly-marked deterministic STUB
  * instead of throwing — a corrupt payload in a 100 TB corpus must
  * degrade, not kill the stage. At production scale the fallback body
  * is the single point to swap for a JNI/ffmpeg decoder; the
  * `mapPartitions` batch shape is exactly where it plugs in.
  */
object Multimodal {

  /** Typed record for decoded-media features. For images
    * (width, height) are pixels; for audio they carry
    * (channels, frames-per-channel) — same shape, per-kind meaning. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, feature: Array[Float])

  /** STUB decode: deterministic pseudo-features derived from the
    * payload bytes — the fallback for payloads no JDK codec accepts.
    * Replace the body with a real codec (e.g. JNI libjpeg / ffmpeg
    * frame sampler); signature and batch shape stay. */
  def stubDecode(id: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
    var h = 0L
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xFF); i += 1 }
    val w = 16 + (Hashing.splitmix64(h) & 0x3F).toInt      // fake 16..79 px
    val ht = 16 + (Hashing.splitmix64(h + 1) & 0x3F).toInt
    val feat = Array.tabulate(8)(j =>
      (Hashing.splitmix64(h + 2 + j).toDouble / Long.MaxValue).toFloat)
    MediaFeatures(id, kind, payload.length, w, ht, feat)
  }

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF —
    * headless-safe). Feature = mean luminance over 8 vertical strips
    * (deterministic, translation-ish robust). None if no installed
    * reader accepts the bytes. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      // no ImageIO disk-cache tmp files on executors
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val feat = new Array[Float](8)
        val counts = new Array[Int](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000f / 255f
            val b = math.min(7, x * 8 / w)
            feat(b) += lum
            counts(b) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < 8) { if (counts(i) > 0) feat(i) /= counts(i); i += 1 }
        Some((w, h, feat))
      }
    } catch { case _: Exception => None }

  /** Per-sample linear-PCM decoder for the formats this module
    * handles: signed 16-bit (either endianness) and 8-bit (signed, or
    * WAV's unsigned convention). None for anything else — a 24/32-bit,
    * float or companded (ULAW/ALAW) stream read through 16-bit math
    * decodes as STRUCTURED NOISE, and fingerprinting noise is strictly
    * worse than the byte-hash fallback the callers degrade to. The one
    * place the sample arithmetic lives — [[decodeAudio]] and
    * [[monoSamples]] share it. */
  private def pcmSampleReader(fmt: javax.sound.sampled.AudioFormat)
      : Option[(Array[Byte], Int) => Float] = {
    import javax.sound.sampled.AudioFormat.Encoding
    val enc = fmt.getEncoding
    val bits = fmt.getSampleSizeInBits
    if (enc == Encoding.PCM_SIGNED && bits == 16) {
      if (fmt.isBigEndian)
        Some((b, o) => ((b(o) << 8) | (b(o + 1) & 0xFF)) / 32768f)
      else
        Some((b, o) => ((b(o + 1) << 8) | (b(o) & 0xFF)) / 32768f)
    } else if (enc == Encoding.PCM_UNSIGNED && bits == 8)
      Some((b, o) => ((b(o) & 0xFF) - 128) / 128f)
    else if (enc == Encoding.PCM_SIGNED && bits == 8)
      Some((b, o) => b(o) / 128f)
    else None
  }

  /** REAL audio decode via javax.sound.sampled (WAV/AIFF PCM). Feature
    * = RMS energy over 8 equal time bins; returns (channels,
    * frames-per-channel, feature). None if the bytes are not a
    * supported audio stream or not a [[pcmSampleReader]]-decodable
    * sample format (those fall through to the stub rather than
    * mis-decode). */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(
          new java.io.ByteArrayInputStream(payload)))
      try {
        val fmt = in.getFormat
        pcmSampleReader(fmt).flatMap { read =>
          val bytes = in.readAllBytes()
          val bps = math.max(1, fmt.getSampleSizeInBits / 8)
          val n = bytes.length / bps
          if (n == 0) None
          else {
            val feat = new Array[Float](8)
            val counts = new Array[Int](8)
            var i = 0
            while (i < n) {
              val v = read(bytes, i * bps)
              val b = math.min(7, (i.toLong * 8 / n).toInt)
              feat(b) += v * v
              counts(b) += 1
              i += 1
            }
            var j = 0
            while (j < 8) {
              if (counts(j) > 0) feat(j) = math.sqrt(feat(j) / counts(j)).toFloat
              j += 1
            }
            val ch = math.max(1, fmt.getChannels)
            Some((ch, n / ch, feat))
          }
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Decode one payload: JDK image codecs first, then JDK audio
    * codecs, then the deterministic stub (video/unknown/corrupt). */
  /** Magic-byte container sniff — dispatch BEFORE attempting a codec.
    * In a mixed 100 TB corpus the overwhelming majority of payloads is
    * not decodable media; without the sniff every such row pays a full
    * failed ImageIO reader probe plus an AudioSystem
    * UnsupportedAudioFileException construction. The magic list IS the
    * supported-format contract — deliberately NARROWER than whatever
    * readers happen to be registered with the running JDK's ImageIO
    * (e.g. WBMP, or plugins a deployment adds): dispatch must be a
    * pure function of the payload bytes so the same corpus routes
    * identically on every executor and JVM, never of registry state.
    * Supported: PNG/JPEG/GIF/BMP/TIFF; WAV/AIFF/AU — anything else
    * goes straight to the deterministic stub; extending support means
    * adding BOTH the magic and verifying the codec, not widening the
    * probe. */
  private[operators] def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P'.toByte && p(2) == 'N'.toByte &&
        p(3) == 'G'.toByte) ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
      (p(0) == 'G'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte &&
        p(3) == '8'.toByte) ||
      (p(0) == 'B'.toByte && p(1) == 'M'.toByte) ||
      (p(0) == 'I'.toByte && p(1) == 'I'.toByte && p(2) == 0x2A.toByte &&
        p(3) == 0.toByte) ||
      (p(0) == 'M'.toByte && p(1) == 'M'.toByte && p(2) == 0.toByte &&
        p(3) == 0x2A.toByte))

  private[operators] def looksLikeAudio(p: Array[Byte]): Boolean =
    p.length >= 12 && (
      (p(0) == 'R'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte &&
        p(3) == 'F'.toByte && p(8) == 'W'.toByte && p(9) == 'A'.toByte &&
        p(10) == 'V'.toByte && p(11) == 'E'.toByte) ||
      (p(0) == 'F'.toByte && p(1) == 'O'.toByte && p(2) == 'R'.toByte &&
        p(3) == 'M'.toByte && p(8) == 'A'.toByte && p(9) == 'I'.toByte &&
        p(10) == 'F'.toByte) ||
      (p(0) == '.'.toByte && p(1) == 's'.toByte && p(2) == 'n'.toByte &&
        p(3) == 'd'.toByte))

  def decode(id: Long, kind: String, payload: Array[Byte]): MediaFeatures =
    (if (looksLikeImage(payload)) decodeImage(payload)
     else if (looksLikeAudio(payload)) decodeAudio(payload)
     else None)
      .map { case (w, h, feat) => MediaFeatures(id, kind, payload.length, w, h, feat) }
      .getOrElse(stubDecode(id, kind, payload))

  /** Feature extraction over a media frame: one decoder instance per
    * partition, rows streamed through it (the batch shape a real
    * decoder needs — no per-row setup, no driver collect). Input needs
    * columns (media_id long, kind string, payload binary). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, payload) => decode(id, kind, payload) }
      }
  }

  /** STUB resize: deterministic downsample of the payload bytes to a
    * `target × target` grid (stride sampling). A real implementation
    * swaps the body for a codec + interpolation kernel; the signature
    * (bytes → bytes + new dims) and the per-partition batch shape are
    * what the pipeline depends on. */
  def stubResize(payload: Array[Byte], target: Int): Array[Byte] = {
    val n = target * target
    if (payload.isEmpty) new Array[Byte](n)
    else Array.tabulate(n)(i => payload((i.toLong * payload.length / n).toInt))
  }

  /** REAL image resize for JDK-decodable payloads: scale to
    * `target × target`, return the grayscale raster bytes (the tensor
    * layout a feature extractor consumes). Headless-safe Graphics2D.
    * None → caller falls back to [[stubResize]]. */
  def resizeImage(payload: Array[Byte], target: Int): Option[Array[Byte]] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(target, target,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = out.createGraphics()
        try g.drawImage(img, 0, 0, target, target, null) finally g.dispose()
        val bytes = new Array[Byte](target * target)
        out.getRaster.getDataElements(0, 0, target, target, bytes)
        Some(bytes)
      }
    } catch { case _: Exception => None }

  /** Resize with the real codec when possible, stub otherwise (same
    * sniff-first dispatch as [[decode]]). */
  def resize(payload: Array[Byte], target: Int): Array[Byte] =
    (if (looksLikeImage(payload)) resizeImage(payload, target) else None)
      .getOrElse(stubResize(payload, target))

  /** Decode + grayscale-downscale to `w × h` raster bytes — the
    * shared kernel behind [[resizeImage]] and [[dHash64]]. */
  private def grayRaster(payload: Array[Byte], w: Int, h: Int)
      : Option[Array[Byte]] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = out.createGraphics()
        try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
        val bytes = new Array[Byte](w * h)
        out.getRaster.getDataElements(0, 0, w, h, bytes)
        Some(bytes)
      }
    } catch { case _: Exception => None }

  /** 64-bit perceptual difference hash (dHash, the standard
    * public-domain construction): grayscale-downscale to a 9×8 grid,
    * one bit per horizontal neighbor comparison (bit set ⇔ right cell
    * brighter). Because it compares PIXELS, two re-encodings of the
    * same image (JPEG at different qualities, PNG vs JPEG) hash within
    * a few bits of each other while byte-level hashing sees them as
    * unrelated — the property [[phashDupPairs]] dedups on. None when
    * no JDK codec accepts the bytes. */
  def dHash64(payload: Array[Byte]): Option[Long] =
    grayRaster(payload, 9, 8).map { g =>
      var bits = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if ((g(y * 9 + x) & 0xFF) < (g(y * 9 + x + 1) & 0xFF))
            bits |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      bits
    }

  /** Deterministic 64-bit content hash over raw bytes — the fallback
    * signature for payloads no codec decodes: byte-identical copies
    * still collapse; re-encodings of an undecodable format cannot be
    * recognized (there are no pixels to compare). */
  def contentHash64(payload: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xFF); i += 1 }
    Hashing.splitmix64(h + payload.length)
  }

  /** Decode a WAV/AIFF/AU PCM payload to MONO samples in [-1, 1]
    * (channels averaged per frame) — the sample stream [[aHash64]]
    * fingerprints. Sample formats are [[pcmSampleReader]]'s (16-bit
    * signed either endianness, 8-bit signed/unsigned); anything else —
    * and anything javax.sound rejects — is None, so the caller falls
    * back to the byte-hash family instead of fingerprinting a
    * mis-decoded stream.
    *
    * Long clips are DECIMATED: past `maxFrames` total frames, only
    * every ⌈n/maxFrames⌉-th frame is converted, bounding the
    * per-payload float work at ~maxFrames regardless of clip length.
    * The envelope fingerprint doesn't need full-rate PCM — each of
    * [[aHash64]]'s 72 bins still averages ≥ maxFrames/72 ≈ 900 RMS
    * samples, and decimation is frame-POSITION-proportional, so two
    * re-encodings of one recording (the dedup contract) subsample the
    * same instants and keep hashing together; clips at or under
    * maxFrames (~8 s at 8 kHz, ~1.5 s at 44.1 kHz) decode
    * bit-identically to the full-rate path. Measured (ScaleBench
    * audio_decim leg, SCALE.md r18): ~1.8-2.0× per-clip on an 18 s
    * 8 kHz clip (stride 3; header parse + readAllBytes bound the
    * win), growing with stride — a 3-minute 44.1 kHz clip strides
    * ~121×, so the float loop all but vanishes. Zero planted-pair
    * drift (StreamSpec long-clip hash-equality test). */
  private[graft] def monoSamples(payload: Array[Byte],
      maxFrames: Int = 1 << 16): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(
          new java.io.ByteArrayInputStream(payload)))
      try {
        val fmt = in.getFormat
        pcmSampleReader(fmt).flatMap { read =>
          val bytes = in.readAllBytes()
          val bps = math.max(1, fmt.getSampleSizeInBits / 8)
          val ch = math.max(1, fmt.getChannels)
          val nFrames = bytes.length / (bps * ch)
          if (nFrames == 0) None
          else {
            val stride = math.max(1, (nFrames + maxFrames - 1) / maxFrames)
            val kept = (nFrames + stride - 1) / stride
            val mono = new Array[Float](kept)
            var k = 0
            while (k < kept) {
              val f = k * stride
              var acc = 0f
              var c = 0
              while (c < ch) {
                acc += read(bytes, (f * ch + c) * bps)
                c += 1
              }
              mono(k) = acc / ch
              k += 1
            }
            Some(mono)
          }
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** 64-bit perceptual audio hash — the [[dHash64]] twin for sound:
    * the energy-difference fingerprint of Haitsma & Kalker 2002 ("A
    * Highly Robust Audio Fingerprinting System"), reduced to the same
    * 8×9 comparison grid dHash uses. The clip is cut into 8 segments
    * × 9 time bins (72 equal frame spans); bit `y*8+x` is set ⇔ the
    * RMS energy of bin x+1 exceeds bin x within segment y. Because it
    * compares ENERGY ENVELOPE, two re-encodings of the same recording
    * (WAV vs AIFF container, 16-bit vs 8-bit quantization) hash within
    * a few bits while byte hashing sees unrelated blobs — the property
    * [[phashDupPairs]] dedups on, now for the audio modality. Bins are
    * frame-proportional, so the hash is also sample-rate-invariant.
    * None when the bytes are not decodable audio or carry fewer than
    * 72 frames (too short to fingerprint). */
  def aHash64(payload: Array[Byte]): Option[Long] =
    monoSamples(payload).flatMap { s =>
      val n = s.length
      if (n < 72) None
      else {
        val rms = new Array[Double](72)
        var b = 0
        while (b < 72) {
          val from = (b.toLong * n / 72).toInt
          val until = ((b + 1).toLong * n / 72).toInt
          var acc = 0.0
          var i = from
          while (i < until) { acc += s(i).toDouble * s(i); i += 1 }
          rms(b) = math.sqrt(acc / math.max(1, until - from))
          b += 1
        }
        var bits = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (rms(y * 9 + x) < rms(y * 9 + x + 1))
              bits |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        Some(bits)
      }
    }

  final case class MediaHash(media_id: Long, phash: Long, modality: String)

  /** Per-payload perceptual hash with the deterministic fallback:
    * decodable images get [[dHash64]] (`modality = "image"`),
    * decodable audio gets [[aHash64]] (`modality = "audio"`),
    * everything else [[contentHash64]] (`modality = "bytes"`). The
    * modality tag keeps the three hash families in DISJOINT match
    * spaces — an image hash and an audio hash that happen to land
    * within the Hamming radius are not duplicates of each other.
    * Same sniff-first dispatch and mapPartitions batch shape as
    * [[extractFeatures]]. */
  def perceptualHashes(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          (if (looksLikeImage(payload)) dHash64(payload).map(("image", _))
           else if (looksLikeAudio(payload)) aHash64(payload).map(("audio", _))
           else None) match {
            case Some((m, h)) => MediaHash(id, h, m)
            case None => MediaHash(id, contentHash64(payload), "bytes")
          }
        }
      }
  }

  /** Perceptual near-dup pairs across modalities:
    * [[perceptualHashes]] → banded Hamming join
    * ([[Dedup.hammingPairs64]] — recall 1 at the radius by pigeonhole,
    * one hash per payload through the shuffle). Image pairs and audio
    * pairs match at `hamming ≤ maxHamming` within their own modality;
    * stub-hashed payloads only at hamming 0 (content-hash equality =
    * byte-identical); the three hash families never cross-match.
    * Returns `(id_a, id_b, hamming)`. Scale shape: the corpus is
    * decoded once map-side into compact (id, hash, modality) rows;
    * the band join never carries pixels or samples. */
  def phashDupPairs(media: DataFrame, maxHamming: Int = 6): DataFrame =
    pairsFromHashes(perceptualHashes(media).toDF().localCheckpoint(true),
      maxHamming)

  /** Pair search over an already-materialized hashes frame — shared by
    * [[phashDupPairs]] and [[phashDedup]] so the decode pass (the
    * expensive part) runs exactly once per entry point. The modality
    * is SALTED INTO the band key (`keyCols`), so cross-modality band
    * collisions — ~1/2⁸ of random image×audio pairs per block on a
    * mixed corpus — are pruned before pair materialization instead of
    * being carried through the Hamming computation and two flag joins
    * only to be fenced afterwards. */
  private def pairsFromHashes(hashes: DataFrame,
      maxHamming: Int): DataFrame =
    Dedup.hammingPairs64(hashes, "media_id", "phash", maxHamming,
        keyCols = Seq("modality"))
      .where(col("modality") =!= "bytes" || col("hamming") === 0)
      .select(col("id_a"), col("id_b"), col("hamming"))

  /** Canonical representative per perceptual-duplicate cluster:
    * `(media_id, canon_id)` for EVERY input row — connected components
    * over [[phashDupPairs]] ([[Dedup.clusters]], distributed past its
    * edge threshold), `canon_id` = the cluster's minimum member, own
    * id for unduplicated media. `media.select(...).join(...)` on
    * `canon_id === media_id` is then the deduped corpus. */
  def phashDedup(media: DataFrame, maxHamming: Int = 6): DataFrame = {
    // hash once (the decode IS the cost); both the pair search and the
    // id universe read the checkpointed 9-byte rows, never the payloads
    val hashes = perceptualHashes(media).toDF().localCheckpoint(true)
    val reps = Dedup.clusters(
      pairsFromHashes(hashes, maxHamming).select("id_a", "id_b"))
    hashes.select(col("media_id"))
      .join(reps.withColumnRenamed("doc_id", "media_id"), Seq("media_id"),
        "left")
      .select(col("media_id"),
        coalesce(col("cluster_id"), col("media_id")).as("canon_id"))
  }

  /** Deterministic 72×64 cell-pattern image whose [[dHash64]] equals
    * `bits` BY CONSTRUCTION: 8 rows × 9 constant-color 8×8 cells, each
    * row a brightness walk `v(x+1) = v(x) ± 14` directed by the target
    * bit — every neighbor comparison decisive by a 14-step margin, and
    * the 8×8 cells align with JPEG's DCT blocks (constant blocks →
    * DC-only → survive lossy re-encode within ±2). The planted-fixture
    * generator for perceptual-dedup gates: the SAME bits encoded at
    * different `format`/`quality` must dedup; different bits must not.
    * `format` ∈ png | jpg. */
  def cellPatternImage(bits: Long, format: String,
      quality: Float = 0.7f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(72, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var v = 128
      var x = 0
      while (x < 9) {
        val rgb = (v << 16) | (v << 8) | v
        var py = 0
        while (py < 8) {
          var px = 0
          while (px < 8) {
            img.setRGB(x * 8 + px, y * 8 + py, rgb)
            px += 1
          }
          py += 1
        }
        if (x < 8)
          v += (if ((bits >> (y * 8 + x) & 1L) != 0L) 14 else -14)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    format match {
      case "png" => javax.imageio.ImageIO.write(img, "png", bos)
      case "jpg" =>
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpeg").next()
        val params = writer.getDefaultWriteParam
        params.setCompressionMode(
          javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        params.setCompressionQuality(quality)
        val out = javax.imageio.ImageIO.createImageOutputStream(bos)
        try {
          writer.setOutput(out)
          writer.write(null, new javax.imageio.IIOImage(img, null, null),
            params)
        } finally { writer.dispose(); out.close() }
      case other =>
        throw new IllegalArgumentException(s"format must be png|jpg: $other")
    }
    bos.toByteArray
  }

  /** Deterministic 0.72 s test clip whose [[aHash64]] equals `bits`
    * BY CONSTRUCTION — the audio twin of [[cellPatternImage]]: 8
    * segments × 9 bins of a 1 kHz sine (80 samples/bin at 8 kHz = 10
    * full periods, so bin RMS is exactly amplitude/√2 regardless of
    * phase), each segment an amplitude walk `a(x+1) = a(x) ± 0.04`
    * directed by the target bit from a 0.5 reset — every neighbor
    * comparison decisive by a 0.028-RMS margin, ~25× the worst-case
    * 8-bit quantization noise, so the SAME bits encoded as WAV-16,
    * AIFF-16 (big-endian container) or lossy WAV-8 must dedup while
    * different bits must not. `format` ∈ wav16 | wav8 | aiff16.
    * `perBin` (a multiple of 8 — whole sine periods, so bin RMS stays
    * exactly amplitude/√2) scales clip LENGTH without changing the
    * envelope: large values build the long clips the decode
    * decimation path must hash identically. */
  def toneEnvelopeAudio(bits: Long, format: String,
      perBin: Int = 80): Array[Byte] = {
    require(perBin > 0 && perBin % 8 == 0, "perBin must be a multiple of 8")
    val samples = new Array[Float](72 * perBin)
    var idx = 0
    var y = 0
    while (y < 8) {
      var a = 0.5f
      var x = 0
      while (x < 9) {
        var i = 0
        while (i < perBin) {
          samples(idx) =
            (a * math.sin(2.0 * math.Pi * idx / 8.0)).toFloat // 1 kHz @ 8 kHz
          idx += 1
          i += 1
        }
        if (x < 8)
          a += (if ((bits >> (y * 8 + x) & 1L) != 0L) 0.04f else -0.04f)
        x += 1
      }
      y += 1
    }
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
    val (fmt, fileType, pcm) = format match {
      case "wav16" =>
        val b = new Array[Byte](samples.length * 2)
        var i = 0
        while (i < samples.length) {
          val v = math.round(samples(i) * 32767f).toShort
          b(i * 2) = (v & 0xFF).toByte          // little-endian
          b(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
          i += 1
        }
        (new AudioFormat(8000f, 16, 1, true, false),
          AudioFileFormat.Type.WAVE, b)
      case "aiff16" =>
        val b = new Array[Byte](samples.length * 2)
        var i = 0
        while (i < samples.length) {
          val v = math.round(samples(i) * 32767f).toShort
          b(i * 2) = ((v >> 8) & 0xFF).toByte   // big-endian
          b(i * 2 + 1) = (v & 0xFF).toByte
          i += 1
        }
        (new AudioFormat(8000f, 16, 1, true, true),
          AudioFileFormat.Type.AIFF, b)
      case "wav8" =>
        val b = new Array[Byte](samples.length)
        var i = 0
        while (i < samples.length) {
          b(i) = (math.round(samples(i) * 127f) + 128).toByte // unsigned
          i += 1
        }
        (new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1,
          8000f, false), AudioFileFormat.Type.WAVE, b)
      case other => throw new IllegalArgumentException(
        s"format must be wav16|wav8|aiff16: $other")
    }
    val bos = new java.io.ByteArrayOutputStream()
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt,
      pcm.length / fmt.getFrameSize)
    try javax.sound.sampled.AudioSystem.write(in, fileType, bos)
    finally in.close()
    bos.toByteArray
  }

  /** STUB frame sampling: split the payload into `frames` equal spans
    * ("frames") and keep every `stride`-th one — the video path's
    * batch shape (one row in, few rows out via flatMap). */
  def stubFrameSample(payload: Array[Byte], frames: Int, stride: Int)
      : Seq[(Int, Array[Byte])] = {
    if (payload.isEmpty || frames <= 0) Nil
    else {
      val span = math.max(1, payload.length / frames)
      (0 until frames by stride).map { f =>
        val start = f * span
        f -> payload.slice(start, math.min(start + span, payload.length))
      }
    }
  }

  final case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Frame extraction over a media frame table: flatMap through the
    * stub sampler, preserving distributed batch shape. */
  def sampleFrames(media: DataFrame, frames: Int = 8, stride: Int = 2)
      : Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        stubFrameSample(payload, frames, stride).map { case (f, b) =>
          Frame(id, f, b)
        }
      }
  }

  /** Metadata pass over binary payloads — pure native expressions
    * (no decode): byte size, content hash, magic-byte sniffing. */
  def describePayloads(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("payload")).as("n_bytes"),
      xxhash64(col("payload")).as("content_hash"),
      substring(col("payload"), 1, 4).cast("string").as("magic"))
}
