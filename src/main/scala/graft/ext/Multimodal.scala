package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus the decode/feature-extract stage shape.
  *
  * The real Spark-side mechanics (schema, partitioning, batch shape,
  * per-partition processing) are implemented and tested; the actual
  * media decode is STUBBED with a deterministic fake (this container
  * has no image/audio codecs) — swap [[StubDecoder.decode]] for a real
  * decoder (e.g. javacv / a Pandas-UDF sidecar) in production.
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

  /** Per-source byte accounting over the opaque payloads — the kind of
    * manifest stat a 100 TB media crawl needs before any decode. */
  def byteStats(media: DataFrame): DataFrame =
    media.groupBy(col("meta.source").as("source"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))
}
