package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus the decode/feature-extract stage shape.
  *
  * Two tiers of "decode":
  *  - REAL codecs — 24-bit BMP and PCM-16 WAV parsed by hand, and
  *    COMPRESSED PNG through the JDK's `javax.imageio`, all via
  *    [[Codecs]]: genuine header parsing, row padding, bottom-up
  *    un-flip, RIFF chunk walking, zlib-inflated scanlines,
  *    nearest-neighbor resampling on real pixels. Exercised end to
  *    end by q80/q81/q107, whose DuckDB oracles recompute the
  *    expected decoded features from the synthesis formula with no
  *    codec (PNG being lossless is what makes its features
  *    replayable; compressed size is writer-dependent and never a
  *    feature).
  *  - [[StubDecoder]] for formats that need native codec libraries
  *    this container doesn't ship (MP3/H.264; JPEG decodes in the JDK
  *    but is lossy, so its features would not be oracle-replayable) —
  *    a documented deterministic fake behind the same `mapPartitions`
  *    seam; swap in javacv / a Pandas-UDF sidecar in production.
  */
object Multimodal {

  /** Canonical multimodal record: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  /** Wrap a text table as opaque media rows (the ingestion shape:
    * payload bytes + metadata, content never interpreted by the engine). */
  def ingest(docs: DataFrame, idCol: String, textCol: String, sourceCol: String): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("media_id"),
      col(textCol).cast(BinaryType).as("payload"),
      lit("text/plain").as("media_type"),
      struct(
        col(sourceCol).as("source"),
        length(col(textCol).cast(BinaryType)).cast(LongType).as("n_bytes")).as("meta"))

  /** STUB decoder: deterministic fake "features" from the payload bytes.
    * Real deployments replace this with a codec; everything around it
    * (partition-parallel `mapPartitions`, feature schema, downstream
    * aggregation) is the production shape. */
  object StubDecoder {
    def decode(payload: Array[Byte]): Array[Float] = {
      // ??? in production: image/audio decode + model features.
      // Deterministic fake: 4 moments of the byte stream.
      if (payload == null || payload.isEmpty) Array(0f, 0f, 0f, 0f)
      else {
        val n = payload.length.toFloat
        val mean = payload.map(_ & 0xff).sum / n
        Array(n, mean, (payload.head & 0xff).toFloat, (payload.last & 0xff).toFloat)
      }
    }
  }

  /** Feature extraction over media rows: per-partition batch decode
    * (the `mapInPandas`-equivalent shape in Scala — one decoder init
    * per partition, streamed batches, no driver involvement). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val rdd = media.select(col("media_id"), col("payload")).rdd.mapPartitions { it =>
      // decoder init would happen here, once per partition
      it.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        Row(id, StubDecoder.decode(payload).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB resize: payload → payload'. Real deployments decode, scale,
    * re-encode (see [[resizeUdf]], the imperative seam a codec slots
    * into); the stub truncate/pad is pure byte arithmetic, so it stays
    * a BUILT-IN: one `rpad` on the binary payload (rpad both truncates
    * and zero-pads to the target length) — whole-stage codegen, no UDF
    * row boxing. */
  def resize(media: DataFrame, targetBytes: Int): DataFrame =
    media.withColumn("payload", rpad(col("payload"), targetBytes, Array[Byte](0)))
      .withColumn("meta", struct(col("meta.source").as("source"),
        // null payloads carry no bytes — stamping targetBytes would
        // corrupt byteStats' sums downstream
        when(col("payload").isNull, lit(null).cast(LongType))
          .otherwise(lit(targetBytes.toLong)).as("n_bytes")))

  /** The imperative form of [[resize]] — byte-identical (asserted in
    * ExtSpec), kept as the seam where a REAL codec (decode → scale →
    * re-encode) replaces the byte arithmetic in production. */
  def resizeUdf(media: DataFrame, targetBytes: Int): DataFrame = {
    val doResize = udf((p: Array[Byte]) =>
      if (p == null) null
      else if (p.length >= targetBytes) p.take(targetBytes)
      else p ++ Array.fill[Byte](targetBytes - p.length)(0))
    media.withColumn("payload", doResize(col("payload")))
      .withColumn("meta", struct(col("meta.source").as("source"),
        when(col("payload").isNull, lit(null).cast(LongType))
          .otherwise(lit(targetBytes.toLong)).as("n_bytes")))
  }

  /** STUB frame sampling: one media row → every `stride`-th fixed-size
    * chunk of the payload as a frame row (media_id, frame_no, frame).
    * Real deployments pull I-frames via a codec ([[frameSampleUdf]] is
    * that seam); the stub's strided slicing is closed-form byte
    * arithmetic, so it stays in codegen: frame count from the payload
    * length, `transform(sequence(...))` to build the slices with
    * binary `substr`, one posexplode for the 1:N fan-out. Null and
    * empty payloads produce an empty array and drop out of the
    * explode, exactly like the imperative form. */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val step = frameBytes * stride
    val nFrames = ceil(length(col("payload")).cast("double") / step).cast("int")
    // sequence(0, -1) would generate a DESCENDING [0, -1] — guard the
    // empty/null payload case to an explicit empty array instead
    val frames = when(coalesce(length(col("payload")), lit(0)) === 0,
        array().cast("array<binary>"))
      .otherwise(transform(sequence(lit(0), nFrames - 1),
        i => col("payload").substr(i * step + 1, lit(frameBytes))))
    media
      .select(col("media_id"), posexplode(frames).as(Seq("frame_no", "frame")))
  }

  /** The imperative form of [[frameSample]] — identical fan-out
    * (asserted in ExtSpec), kept as the seam where a REAL codec pulls
    * I-frames instead of byte slices in production. */
  def frameSampleUdf(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val slice = udf((p: Array[Byte]) =>
      if (p == null) Array.empty[Array[Byte]]
      else Iterator.from(0)
        .map(_ * frameBytes * stride)
        .takeWhile(_ < p.length)
        .map(off => p.slice(off, math.min(off + frameBytes, p.length)))
        .toArray)
    media
      .select(col("media_id"), posexplode(slice(col("payload"))).as(Seq("frame_no", "frame")))
  }

  // ---- REAL codec pipeline (BMP / WAV via [[Codecs]]) ------------------
  //
  // The stub above stays as the seam for formats needing native codec
  // libraries; these paths run GENUINE encode → parse → feature
  // extraction for the two public formats pure byte logic covers. The
  // payloads are standards-conformant files (any image viewer / audio
  // player opens them), and the synthesis is a closed-form function of
  // (media_id, position) so a DuckDB oracle can recompute the expected
  // decoded features WITHOUT a codec — a round-trip hash check: any
  // header, row-padding, bottom-up-flip, or resample bug mismatches.

  /** Synthesized BMP geometry: width 13 forces a 39→40-byte padded row
    * (exercises the stride logic); height 7 keeps 91 pixels per image. */
  val BmpW = 13
  val BmpH = 7

  /** Pixel (index i) channels of media `id`: the first three bytes of
    * md5("id:i"), as unsigned ints — the formula the oracle replays
    * with substr(md5(...)) arithmetic. */
  private def pixelBytes(md: java.security.MessageDigest, id: Long, i: Int): Array[Byte] = {
    md.reset()
    md.update(s"$id:$i".getBytes("US-ASCII"))
    md.digest()
  }

  /** The ids to synthesize, spread across the cores before the
    * expensive per-row work. The bench testdata arrives as ONE
    * parquet row group — the splittability atom — so without this
    * every synthesize→decode chain (the multimodal tier's per-row
    * kernels, all narrow maps in one stage) runs in ONE task no
    * matter how many cores the session has; profiled as two ~1 s
    * single-task jobs in q108 (the second is the orderBy's range
    * sampler re-running the chain). The shuffled payload is one LONG
    * per row; the kernel work it unlocks is orders of magnitude
    * bigger (guide §2.3: shuffle keys, not payloads). Explicit-N
    * round-robin so AQE keeps the fan-out; defaultParallelism follows
    * the master's core count, so the driver's low-core scaling bench
    * sees the honest per-core cost. */
  private def spreadIds(docs: DataFrame, idCol: String): DataFrame =
    Par.spread(docs.select(col(idCol).cast(LongType)))

  /** Deterministic REAL BMP per document id: 13×7 24-bit images whose
    * pixels derive from md5(id:i). One MessageDigest per partition —
    * the decoder-init-per-partition production shape. */
  def synthesizeBmp(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = spreadIds(docs, idCol).rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val id = r.getLong(0)
        val rgb = new Array[Byte](BmpW * BmpH * 3)
        var i = 0
        while (i < BmpW * BmpH) {
          val dg = pixelBytes(md, id, i)
          rgb(3 * i) = dg(0); rgb(3 * i + 1) = dg(1); rgb(3 * i + 2) = dg(2)
          i += 1
        }
        val bytes = Codecs.encodeBmp(Codecs.Image(BmpW, BmpH, rgb))
        Row(id, bytes, "image/bmp", Row("synthetic", bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Synthesized PNG geometry: 11×5 (55 pixels) — deliberately
    * different from the BMP tier so the two oracles can never mask
    * each other. */
  val PngW = 11
  val PngH = 5

  /** Pixel channels for the PNG tier: first three bytes of
    * md5("png:id:i") — a distinct seed namespace from the BMP tier's
    * md5("id:i"), replayed by the oracle with substr(md5(...)). */
  private def pngPixelBytes(md: java.security.MessageDigest, id: Long, i: Int): Array[Byte] = {
    md.reset()
    md.update(s"png:$id:$i".getBytes("US-ASCII"))
    md.digest()
  }

  /** Deterministic REAL PNG per document id, encoded through the JDK's
    * ImageIO writer — a genuinely COMPRESSED interchange format
    * (zlib-deflated scanlines; any browser opens the payload). PNG is
    * lossless, so the decoded pixels equal the md5 formula exactly and
    * the oracle stays codec-free. */
  def synthesizePng(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = spreadIds(docs, idCol).rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val id = r.getLong(0)
        val rgb = new Array[Byte](PngW * PngH * 3)
        var i = 0
        while (i < PngW * PngH) {
          val dg = pngPixelBytes(md, id, i)
          rgb(3 * i) = dg(0); rgb(3 * i + 1) = dg(1); rgb(3 * i + 2) = dg(2)
          i += 1
        }
        val bytes = Codecs.encodePng(Codecs.Image(PngW, PngH, rgb))
        Row(id, bytes, "image/png", Row("synthetic", bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Synthesized GIF geometry: 8×5 frames, 3 + id%3 frames per clip —
    * variable frame counts exercise the 1:N decode fan-out for real. */
  val GifW = 8
  val GifH = 5
  def gifFrameCount(id: Long): Int = 3 + (id % 3).toInt

  /** Gray value of (frame f, pixel i) of media `id`: first byte of
    * md5("gif:id:f:i") — replayed by the oracle with substr(md5(...)). */
  private def gifPixel(md: java.security.MessageDigest, id: Long, f: Int, i: Int): Byte = {
    md.reset()
    md.update(s"gif:$id:$f:$i".getBytes("US-ASCII"))
    md.digest()(0)
  }

  /** Deterministic REAL animated GIF per document id — a genuine
    * multi-frame container (any browser plays it), the honest stand-in
    * for the video tier: frame EXTRACTION from a real container is
    * exercised end to end, only the codec inside the container is
    * simpler than H.264. Grayscale through the identity palette keeps
    * the round-trip lossless and the oracle codec-free. */
  def synthesizeGif(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = spreadIds(docs, idCol).rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val id = r.getLong(0)
        val frames = (0 until gifFrameCount(id)).map(f =>
          Array.tabulate(GifW * GifH)(i => gifPixel(md, id, f, i)))
        val bytes = Codecs.encodeGifFrames(Codecs.Frames(GifW, GifH, frames))
        Row(id, bytes, "image/gif", Row("synthetic", bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** REAL per-frame features off a decoded multi-frame container: one
    * media row fans out to one row per frame (the video-pipeline
    * frame-sample shape, with REAL frames instead of byte slices) with
    * clip-level frame count and per-frame gray stats. Malformed
    * payloads fail loudly. */
  def gifFrameFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("g00", IntegerType, nullable = false),
      StructField("g_last", IntegerType, nullable = false),
      StructField("mean_gray", DoubleType, nullable = false)))
    val rdd = media.select(col("media_id"), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val clip = Codecs.decodeGifFrames(r.getAs[Array[Byte]](1))
        val n = clip.width * clip.height
        clip.frames.zipWithIndex.map { case (g, f) =>
          var s = 0L
          var i = 0
          while (i < n) { s += g(i) & 0xff; i += 1 }
          Row(id, f, clip.frames.length, clip.width, clip.height,
            g(0) & 0xff, g(n - 1) & 0xff, s.toDouble / n)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL image features: parse the BMP (magic, headers, padding,
    * bottom-up un-flip), then per-channel means, the two orientation-
    * pinning corner samples, and the mean of a REAL nearest-neighbor
    * resize to `rsW`×`rsH` — decode → transform → featurize, the full
    * production pipeline shape. Malformed payloads fail loudly. */
  def imageFeatures(media: DataFrame, rsW: Int = 5, rsH: Int = 3): DataFrame =
    imageFeaturesWith(media, rsW, rsH, Codecs.decodeBmp _)

  /** [[imageFeatures]] over the COMPRESSED tier: identical feature
    * kernel, PNG decode (JDK ImageIO) instead of the hand parser. */
  def pngFeatures(media: DataFrame, rsW: Int = 4, rsH: Int = 2): DataFrame =
    imageFeaturesWith(media, rsW, rsH, Codecs.decodePng _)

  private def imageFeaturesWith(media: DataFrame, rsW: Int, rsH: Int,
                                decode: Array[Byte] => Codecs.Image): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("r00", IntegerType, nullable = false),
      StructField("b_last", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false),
      StructField("rs_mean_r", DoubleType, nullable = false)))
    val rdd = media.select(col("media_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img = decode(bytes)
        val n = img.width * img.height
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < n) {
          sr += img.rgb(3 * i) & 0xff; sg += img.rgb(3 * i + 1) & 0xff
          sb += img.rgb(3 * i + 2) & 0xff
          i += 1
        }
        val rs = Codecs.resizeNearest(img, rsW, rsH)
        var srs = 0L
        i = 0
        while (i < rsW * rsH) { srs += rs.rgb(3 * i) & 0xff; i += 1 }
        Row(id, img.width, img.height, bytes.length,
          img.rgb(0) & 0xff, img.rgb(3 * n - 1) & 0xff,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
          srs.toDouble / (rsW * rsH))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthesized WAV: mono 16-bit PCM at 8 kHz, `200 + id % 57`
    * samples, sample j = ((j·(id % 31 + 3) + 17) mod 4096) − 2048 —
    * integer arithmetic the oracle replays verbatim. */
  val WavRate = 8000
  def wavSampleCount(id: Long): Int = 200 + (id % 57).toInt
  def wavSample(id: Long, j: Int): Short =
    (((j * ((id % 31) + 3) + 17) % 4096) - 2048).toShort

  def synthesizeWav(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = spreadIds(docs, idCol).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val samples = Array.tabulate(wavSampleCount(id))(j => wavSample(id, j))
        val bytes = Codecs.encodeWav(Codecs.Audio(WavRate, samples))
        Row(id, bytes, "audio/wav", Row("synthetic", bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** REAL audio features off the parsed PCM stream: sample count,
    * endpoint samples (pin byte order), peak |amplitude|, RMS energy —
    * sums exact in Long, one IEEE division + sqrt at the end so both
    * engines round identically. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("first_sample", IntegerType, nullable = false),
      StructField("last_sample", IntegerType, nullable = false),
      StructField("peak_abs", IntegerType, nullable = false),
      StructField("rms", DoubleType, nullable = false)))
    val rdd = media.select(col("media_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val audio = Codecs.decodeWav(bytes)
        val s = audio.samples
        var sumSq = 0L
        var peak = 0
        var i = 0
        while (i < s.length) {
          val v = s(i).toInt
          sumSq += v.toLong * v
          if (math.abs(v) > peak) peak = math.abs(v)
          i += 1
        }
        Row(id, audio.sampleRate, s.length, bytes.length,
          s.head.toInt, s.last.toInt, peak,
          math.sqrt(sumSq.toDouble / s.length))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** The engine-portable resonator coefficients: exact binary
    * fractions, so c·s is a correctly-rounded IEEE product on every
    * engine and the recursion replays bit-identically. Each c is a
    * Goertzel kernel at ω = acos(c/2) — textbook DFT bins are the
    * same recurrence with c = 2·cos(2πk/N), a constant swap whose
    * transcendental value would differ across engines' cos in the
    * last ulp (and a recursion amplifies last-ulp differences). */
  val ResonatorCoeffs: Seq[Double] = Seq(0.5, 1.25, 1.875)

  /** REAL DSP over decoded PCM — a Goertzel resonator bank: for each
    * coefficient c the second-order recurrence
    * s₁' = x + c·s₁ − s₂, s₂' = s₁ runs over the normalized samples
    * (x = sample/2048 — a power-of-two scale, exact), and the
    * reported energy is s₁² + s₂² − c·s₁·s₂ (the standard Goertzel
    * power form). This is frequency-selective feature extraction the
    * production audio-curation pass runs (voice-band energy,
    * silence/tone detection) — not byte stats; it consumes the REAL
    * decoded sample stream and its oracle replays the identical
    * recurrence in a recursive CTE. Sequential per-clip fold inside
    * one task: bit-stable, and clips parallelize across the corpus
    * (the same shape as every decode stage here). */
  def audioResonatorFeatures(media: DataFrame,
                             coeffs: Seq[Double] = ResonatorCoeffs): DataFrame = {
    require(coeffs.nonEmpty, "need at least one coefficient")
    val spark = media.sparkSession
    val outSchema = StructType(
      StructField("media_id", LongType, nullable = false) +:
      StructField("n_samples", IntegerType, nullable = false) +:
      coeffs.indices.map(i =>
        StructField(s"p$i", DoubleType, nullable = false)))
    val cs = coeffs.toArray
    val rdd = media.select(col("media_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val audio = Codecs.decodeWav(r.getAs[Array[Byte]](1))
        val s = audio.samples
        val powers = cs.map { c =>
          var s1 = 0.0
          var s2 = 0.0
          var j = 0
          while (j < s.length) {
            val x = s(j) / 2048.0
            val next = x + c * s1 - s2
            s2 = s1
            s1 = next
            j += 1
          }
          s1 * s1 + s2 * s2 - c * s1 * s2
        }
        Row.fromSeq(id +: s.length +: powers.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-source byte accounting over the opaque payloads — the kind of
    * manifest stat a 100 TB media crawl needs before any decode. */
  def byteStats(media: DataFrame): DataFrame =
    media.groupBy(col("meta.source").as("source"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))
}
