package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** An opaque media payload row: binary column + typed metadata — the schema
  * shape a 100 TB multimodal corpus uses (image/audio/video bytes are never
  * interpreted by the engine itself, only by per-partition decoders).
  */
case class MediaRow(
    media_id: Long,
    kind: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    meta: Map[String, String])

/** Decoded/extracted features for one payload. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    header_hex: String,
    width: Int,
    height: Int,
    n_frames: Int,
    feature: Array[Float])

/** One sampled frame of a video/audio payload. */
case class MediaFrame(
    media_id: Long,
    kind: String,
    frame_idx: Int,
    frame_bytes: Array[Byte])

/** Multimodal column processing: decode / feature-extract / resize /
  * frame-sample over opaque binary payloads.
  *
  * The Spark-side plumbing here is real and tested — typed schema, batched
  * per-partition iteration (the JVM mirror of a `mapInPandas` batch loop),
  * deterministic output, partition-preserving execution with no driver
  * materialization. All three modalities have a REAL JDK-only codec path,
  * each spec'd against in-test-generated fixtures: IMAGE via javax.imageio
  * (PNG/JPEG/GIF/BMP decode, bilinear resize, PNG re-encode), AUDIO via
  * javax.sound.sampled (WAV/AIFF/AU PCM decode, per-channel linear
  * resample, WAV re-encode), and VIDEO for MJPEG-in-AVI (hand-walked RIFF
  * container, per-frame JPEG decode, real keyframe extraction). Payloads
  * outside those formats (e.g. H.264/MP4, which no JDK codec covers) fall
  * back to a deterministic stub (`decodeStub`) so the pipeline shape is
  * identical — a deployment swaps the stub for a JNI/codec call without
  * touching any of the plumbing.
  *
  * Scale posture: payloads stay distributed end-to-end; the batch size
  * bounds peak per-task memory (batch × avg payload) exactly like an Arrow
  * batch would; decode is embarrassingly parallel so throughput scales with
  * executor count; output features are fixed-width so downstream joins and
  * ANN (PipelineQueries q23/q28) partition cleanly.
  */
object MediaPipeline {

  val FeatureDim = 16

  // Decode stays in-memory on executors: ImageIO's default disk cache would
  // write a temp file per payload — a pure per-task CPU op must not do I/O.
  javax.imageio.ImageIO.setUseCache(false)

  /** Real JDK codec (javax.imageio): decodes PNG/JPEG/GIF/BMP payloads to
    * an actual image. None for undecodable bytes — callers fall back to the
    * deterministic stub, so the pipeline shape is identical whether a
    * payload is a real image or fixture text bytes. Audio/video have no
    * JDK codec; a deployment swaps in one without touching the plumbing.
    */
  private[multimodal] def decodeImage(
      payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (payload.length < 8) None
    else try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case _: Throwable => None }

  /** Decoded PCM audio: interleaved 16-bit samples + geometry. */
  private[graft] final case class AudioClip(
      sampleRate: Float, channels: Int, samples: Array[Short]) {
    def frames: Int = samples.length / channels
    def durationSec: Double = frames / sampleRate.toDouble
  }

  /** Real JDK audio codec (javax.sound.sampled): decodes WAV/AIFF/AU PCM
    * payloads, normalized to interleaved 16-bit signed samples at the
    * source rate/channel count. None for undecodable bytes — callers fall
    * back to the deterministic stub, exactly like the image path.
    */
  private[graft] def decodeAudio(payload: Array[Byte]): Option[AudioClip] =
    if (payload.length < 12) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val src = in.getFormat
        val fmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels, 2 * src.getChannels,
          src.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(fmt, in)
        val bytes = pcm.readAllBytes()
        val samples = new Array[Short](bytes.length / 2)
        var i = 0
        while (i < samples.length) {
          samples(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
          i += 1
        }
        Some(AudioClip(fmt.getSampleRate, fmt.getChannels, samples))
      } finally in.close()
    } catch { case _: Throwable => None }

  /** Decoded MJPEG-AVI video: geometry + the per-frame JPEG payloads
    * (each independently decodable by the image codec).
    */
  private[graft] final case class VideoClip(
      width: Int, height: Int, microSecPerFrame: Long,
      frames: IndexedSeq[Array[Byte]]) {
    def fps: Double = if (microSecPerFrame <= 0) 0.0 else 1e6 / microSecPerFrame
    def durationSec: Double =
      if (microSecPerFrame <= 0) 0.0 else frames.length * microSecPerFrame / 1e6
  }

  /** Real video decode for the one container+codec pair the JDK can fully
    * handle: MJPEG-in-AVI — a hand-walked RIFF parse (fourcc + u32-LE
    * sizes, LIST recursion) collecting the `avih` main header (frame
    * period, raster geometry) and every `##dc`/`##db` stream chunk, each
    * of which is a standalone JPEG that javax.imageio decodes. None for
    * anything that isn't a well-formed AVI — callers fall back to the
    * deterministic stub, same contract as the image and audio codecs.
    */
  private[graft] def decodeVideo(payload: Array[Byte]): Option[VideoClip] = {
    def u32(off: Int): Long =
      if (off + 4 > payload.length) -1L
      else (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    def cc(off: Int): String =
      if (off + 4 > payload.length) ""
      else new String(payload, off, 4, "US-ASCII")
    if (payload.length < 24 || cc(0) != "RIFF" || cc(8) != "AVI ") return None
    try {
      var header: Option[(Int, Int, Long)] = None
      val frames = IndexedSeq.newBuilder[Array[Byte]]
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = cc(off)
          val size = u32(off + 4)
          if (size < 0 || off + 8 + size > end) return
          val data = off + 8
          if (id == "LIST") walk(data + 4, data + size.toInt)
          else if (id == "avih" && size >= 40)
            header = Some((u32(data + 32).toInt, u32(data + 36).toInt, u32(data)))
          else if (id.endsWith("dc") || id.endsWith("db"))
            frames += java.util.Arrays.copyOfRange(payload, data, data + size.toInt)
          off = data + size.toInt + (size.toInt & 1) // chunks pad to even
        }
      }
      walk(12, math.min(payload.length, 8 + u32(4).toInt))
      val fs = frames.result()
      header.filter(_ => fs.nonEmpty).flatMap { case (w, h, usPerFrame) =>
        // the frames must really be JPEGs the raster codec can decode
        decodeImage(fs.head).map(_ => VideoClip(w, h, usPerFrame, fs))
      }
    } catch { case _: Throwable => None }
  }

  /** Dimensions/frames for a payload: the REAL codec for decodable images,
    * audio, and MJPEG-AVI video; the deterministic stub otherwise. Audio
    * maps its geometry into the shared (width, height, n_frames) shape as
    * (sample rate, channels, per-channel frame count) — duration is
    * frames/rate.
    */
  private[multimodal] def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) =
    (kind match {
      case "image" => decodeImage(payload).map(i => (i.getWidth, i.getHeight, 1))
      case "audio" => decodeAudio(payload).map(a => (a.sampleRate.toInt, a.channels, a.frames))
      case "video" => decodeVideo(payload).map(v => (v.width, v.height, v.frames.length))
      case _ => None
    }).getOrElse(decodeStub(kind, payload))

  /** STUB decoder — deterministic fallback standing in for codecs this JVM
    * lacks. Derives (width, height, frames) from payload bytes so tests are
    * exact.
    */
  private[graft] def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    val b0 = if (n > 0) payload(0) & 0xff else 0
    val b1 = if (n > 1) payload(1) & 0xff else 0
    kind match {
      case "image" => (64 + b0 % 64, 64 + b1 % 64, 1)
      case "audio" => (1, 1, n / 16 + 1) // "frames" = sample windows
      case _       => (64 + b0 % 64, 64 + b1 % 64, n / 256 + 1)
    }
  }

  /** Frame sampling: every `stride`-th byte — stands in for keyframe
    * extraction; real implementation samples decoded frames instead.
    */
  private[multimodal] def sampleFrames(payload: Array[Byte], stride: Int): Array[Byte] =
    payload.indices.collect { case i if i % stride == 0 => payload(i) }.toArray

  /** Fixed-width feature vector from a payload: byte-histogram projection,
    * deterministic. Stands in for an embedding-model forward pass.
    */
  private[multimodal] def featurize(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      acc(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** 64-bit DIFFERENCE HASH (dHash — the standard perceptual image
    * fingerprint): the raster average-pools to a 9×8 luminance grid
    * (Rec.601 weights, integer block bounds — fully deterministic, no
    * Graphics2D resampling to vary), and each bit records whether a cell
    * is darker than its right neighbour. Near-identical images (noise,
    * re-encode, rescale) land within a few bits of Hamming distance;
    * unrelated images differ in ~32.
    */
  private[graft] def dHash(img: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val lum = Array.ofDim[Double](gw, gh)
    var gx = 0
    while (gx < gw) {
      var gy = 0
      while (gy < gh) {
        val x0 = (gx.toLong * w / gw).toInt
        val x1 = math.min(w, math.max(x0 + 1, ((gx + 1).toLong * w / gw).toInt))
        val y0 = (gy.toLong * h / gh).toInt
        val y1 = math.min(h, math.max(y0 + 1, ((gy + 1).toLong * h / gh).toInt))
        var s = 0.0; var n = 0
        var x = x0
        while (x < x1) {
          var y = y0
          while (y < y1) {
            val rgb = img.getRGB(x, y)
            s += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            n += 1; y += 1
          }
          x += 1
        }
        lum(gx)(gy) = if (n == 0) 0.0 else s / n
        gy += 1
      }
      gx += 1
    }
    var bits = 0L; var i = 0; var y = 0
    while (y < gh) {
      var x = 0
      while (x < gw - 1) {
        if (lum(x)(y) < lum(x + 1)(y)) bits |= (1L << i)
        i += 1; x += 1
      }
      y += 1
    }
    bits
  }

  /** 64-bit ENERGY-ENVELOPE difference hash for audio — dHash's twin over
    * time instead of space: the decoded clip pools into 65 equal-duration
    * windows of RMS energy (mono-folded), and each bit records whether a
    * window is quieter than its successor. Pooling by duration FRACTION
    * makes the hash sample-rate-invariant (a resampled copy hashes the
    * same), and the difference SIGN makes it volume-invariant (uniform
    * gain scales every window's RMS equally).
    *
    * Clips shorter than 65 frames pool into min(frames, 65) windows —
    * every unrelated short clip hashing to a shared sentinel would make
    * them all Hamming-0 "near-dups" of each other. Caveats on the
    * short-clip regime: (1) with g windows only g−1 bits carry signal, so
    * callers must not hash clips with < 48 frames — at 15 signal bits the
    * chance of two unrelated clips passing Hamming ≤ 3 is ~1.8%, real
    * false merges in a dedup pass; at ≥ 47 signal bits it is ~2e-9.
    * perceptualHashes routes sub-48-frame clips (< 6 ms at 8 kHz — below
    * any real audio) to the exact-dup byte-fold. (2) clips of 48-64
    * frames leave the top 16-bit chunk all-zero, so they all share one
    * blocking bucket — candidate pairs among them are quadratic, pruned
    * only by the exact verify (fine at these corpus-fraction sizes,
    * another reason real audio should clear 65 frames). (3) the
    * documented sample-rate invariance holds only at ≥ 65 frames, where
    * the window count is frame-count-independent; below that a resampled
    * copy pools on a different grid and may MISS (a false negative on a
    * sub-8 ms clip — never a false positive).
    */
  private[graft] def aHashAudio(clip: AudioClip): Long = {
    val n = clip.frames
    val gw = math.min(65, n)
    val energy = new Array[Double](gw)
    var w = 0
    while (w < gw) {
      val f0 = (w.toLong * n / gw).toInt
      val f1 = math.min(n, math.max(f0 + 1, ((w + 1).toLong * n / gw).toInt))
      var s = 0.0; var f = f0
      while (f < f1) {
        var c = 0; var m = 0.0
        while (c < clip.channels) { m += clip.samples(f * clip.channels + c); c += 1 }
        val v = m / clip.channels
        s += v * v
        f += 1
      }
      energy(w) = s / (f1 - f0)
      w += 1
    }
    var bits = 0L; var i = 0
    while (i < gw - 1) {
      if (energy(i) < energy(i + 1)) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Per-payload perceptual hash column: real dHash for decodable images,
    * the energy-envelope hash for decodable audio, a deterministic
    * byte-fold for everything else (exact-dup-only semantics for stubs —
    * the same honest-fallback shape as decode). One map-side pass; output
    * (media_id, kind, phash).
    */
  def perceptualHashes(ds: Dataset[MediaRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val real: Option[Long] = r.kind match {
        case "image" => decodeImage(r.payload).map(dHash)
        // < 48 frames: too few difference bits for the Hamming verify to
        // separate unrelated clips (~1.8% false-pair odds at 15 bits) —
        // byte-fold fallback (exact-dup-only), never a shared sentinel.
        case "audio" => decodeAudio(r.payload).filter(_.frames >= 48).map(aHashAudio)
        case _ => None
      }
      val h = real.getOrElse(
        r.payload.foldLeft(1125899906842597L)((a, b) => a * 31 + b))
      (r.media_id, r.kind, h)
    }).toDF("media_id", "kind", "phash")
  }

  /** Media NEAR-DUP pairs by perceptual hash (images AND audio — each
    * modality hashes in its own space, and `kind` is part of the blocking
    * key so modalities never cross-pair): SimHash-style chunk blocking
    * (the q27 trick) — the 64-bit hash splits into four 16-bit chunks;
    * by pigeonhole, any pair within Hamming ≤ 3 shares at least one chunk
    * verbatim, so candidates come from an EQUI-JOIN on (kind, chunk
    * index, chunk value) — never an all-pairs product — and only
    * candidates pay the exact `bit_count(xor)` verify. The corpus is
    * decoded ONCE map-side; at 100 TB this is one scan + one bounded
    * equi-join, the media twin of the text SimHash dedup.
    */
  def nearDupMediaPairs(ds: Dataset[MediaRow], maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk blocking only guarantees recall to Hamming 3")
    import org.apache.spark.sql.functions._
    val hashes = perceptualHashes(ds)
    val chunks = hashes.select(col("media_id"), col("kind"), col("phash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("idx"),
          shiftrightunsigned(col("phash"), i * 16)
            .bitwiseAND(lit(0xffffL)).as("chunk"))): _*)).as("c"))
      .select(col("media_id"), col("kind"), col("phash"),
        col("c.idx"), col("c.chunk"))
    val a = chunks.select(col("kind"), col("idx"), col("chunk"),
      col("media_id").as("id_a"), col("phash").as("h_a"))
    val b = chunks.select(col("kind"), col("idx"), col("chunk"),
      col("media_id").as("id_b"), col("phash").as("h_b"))
    a.join(b, Seq("kind", "idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Batched per-partition decode + featurize. `batchSize` bounds peak task
    * memory; results are independent of batch boundaries (asserted in spec).
    */
  def extractFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (w, h, f) = decode(r.kind, r.payload)
          MediaFeatures(
            media_id = r.media_id,
            kind = r.kind,
            n_bytes = r.payload.length.toLong,
            header_hex = r.payload.take(4).map(b => f"${b & 0xff}%02X").mkString,
            width = w,
            height = h,
            n_frames = f,
            feature = featurize(r.payload))
        }
      }
    }
  }

  /** Real raster resize via the JDK: bilinear-draw into the target
    * geometry, re-encoded as PNG bytes.
    */
  private[multimodal] def scaleImage(
      img: java.awt.image.BufferedImage, width: Int, height: Int): Array[Byte] = {
    val out = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, width, height, null)
    } finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", baos)
    baos.toByteArray
  }

  /** Resize: payload → payload at a declared target geometry. Decodable
    * image payloads go through the REAL raster path (decode → bilinear
    * scale → PNG re-encode); everything else falls back to a deterministic
    * byte decimation/repetition to the target pixel count. Typed MediaRow →
    * MediaRow so resize composes with every other stage (the meta map
    * records the target geometry, as a real pipeline's sidecar metadata
    * would).
    */
  def resize(ds: Dataset[MediaRow], width: Int, height: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    val target = width * height
    ds.mapPartitions(_.map { r =>
      val real = if (r.kind == "image") decodeImage(r.payload) else None
      val out = real match {
        case Some(img) => scaleImage(img, width, height)
        case None if r.payload.isEmpty => Array.empty[Byte] // nothing to stretch
        case None =>
          val n = r.payload.length
          Array.tabulate(target)(i => r.payload(((i.toLong * n) / target).toInt % n))
      }
      r.copy(payload = out,
        meta = r.meta + ("resized_w" -> width.toString, "resized_h" -> height.toString))
    })
  }

  /** Real per-channel linear-interpolation resample to `targetHz`. */
  private[multimodal] def resampleClip(c: AudioClip, targetHz: Int): AudioClip =
    if (targetHz == c.sampleRate.toInt || c.frames == 0) c
    else {
      val inFrames = c.frames
      // Long product: inFrames * targetHz overflows Int for ~1 s of
      // 44.1 kHz audio resampled to 48 kHz (wrapped negative -> a clip
      // silently collapsed to one frame).
      val outFrames = math.max(1,
        math.round(inFrames.toLong * targetHz / c.sampleRate.toDouble).toInt)
      val out = new Array[Short](outFrames * c.channels)
      var f = 0
      while (f < outFrames) {
        val pos =
          if (outFrames == 1) 0.0
          else f * (inFrames - 1).toDouble / (outFrames - 1).toDouble
        val i0 = pos.toInt
        val i1 = math.min(inFrames - 1, i0 + 1)
        val frac = pos - i0
        var ch = 0
        while (ch < c.channels) {
          val s = (1.0 - frac) * c.samples(i0 * c.channels + ch) +
            frac * c.samples(i1 * c.channels + ch)
          out(f * c.channels + ch) = math.round(s).toShort
          ch += 1
        }
        f += 1
      }
      AudioClip(targetHz.toFloat, c.channels, out)
    }

  /** PCM clip → WAV bytes (16-bit little-endian) via the JDK writer. */
  private[multimodal] def encodeWav(c: AudioClip): Array[Byte] = {
    val bytes = new Array[Byte](c.samples.length * 2)
    var i = 0
    while (i < c.samples.length) {
      bytes(2 * i) = (c.samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((c.samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      c.sampleRate, 16, c.channels, 2 * c.channels, c.sampleRate, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, c.frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Stub "sample rate" assumed for non-decodable audio payloads, so the
    * fallback decimation scales the byte count by the same ratio a real
    * resample would scale the frame count.
    */
  private val StubAudioHz = 16000

  /** Audio resample as a typed stage: decodable payloads take the REAL
    * path (PCM decode → per-channel linear interpolation → WAV re-encode);
    * non-decodable audio falls back to a deterministic byte re-sampling at
    * the same ratio, so the pipeline shape is uniform. MediaRow → MediaRow,
    * composing with every other stage; meta records the target rate.
    */
  def resampleAudio(ds: Dataset[MediaRow], targetHz: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val real = if (r.kind == "audio") decodeAudio(r.payload) else None
      val out = real match {
        case Some(clip) => encodeWav(resampleClip(clip, targetHz))
        case None if r.payload.isEmpty => Array.empty[Byte]
        case None =>
          val n = r.payload.length
          // Long product: n * targetHz wraps Int for payloads > ~44 KB
          val m = math.max(1, math.round(n.toLong * targetHz / StubAudioHz.toDouble).toInt)
          Array.tabulate(m)(i => r.payload(((i.toLong * n) / m).toInt % n))
      }
      r.copy(payload = out, meta = r.meta + ("resampled_hz" -> targetHz.toString))
    })
  }

  /** Frame sampling as a first-class operator: one output row per sampled
    * frame. Decodable MJPEG-AVI video payloads take the REAL path — every
    * `stride`-th container frame, emitted as its standalone JPEG bytes
    * (directly decodable downstream by the image codec); everything else
    * keeps the deterministic byte-stride fallback (every `stride`-th byte
    * via sampleFrames). A row's frames stay in its task; output
    * cardinality is frames/stride, exactly like a flatMap over decoded
    * frames behaves.
    */
  def sampleKeyframes(ds: Dataset[MediaRow], stride: Int): Dataset[MediaFrame] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val real = if (r.kind == "video") decodeVideo(r.payload) else None
      real match {
        case Some(clip) =>
          clip.frames.zipWithIndex.collect {
            case (jpeg, i) if i % stride == 0 =>
              MediaFrame(r.media_id, r.kind, i, jpeg)
          }
        case None =>
          sampleFrames(r.payload, stride).zipWithIndex.map { case (b, i) =>
            MediaFrame(r.media_id, r.kind, i, Array(b))
          }.toIndexedSeq
      }
    }
  }

  /** Build a MediaRow dataset from the documents table (text bytes standing
    * in for media payloads — the only binary-compatible fixture committed).
    */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))
      .as[MediaRow]
  }
}
