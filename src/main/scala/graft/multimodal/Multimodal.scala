package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for large-scale training-data
  * pipelines: media travels as an opaque `binary` column plus a typed
  * metadata struct; decode/feature-extraction runs batched per partition.
  *
  * The actual codec step is STUBBED (this environment ships no image/audio
  * libraries — see [[decodeStub]]); everything around it — schema,
  * format sniffing, partition-batched UDF plumbing, deterministic output
  * shape — is real and tested. Swapping the stub for a JNI/FFI decoder
  * changes one function.
  *
  * Scale notes: media bytes never pass through a driver collect; feature
  * extraction is mapPartitions over fixed-size batches (the same batch
  * shape a pandas_udf / mapInPandas pipeline would see), so executor
  * memory is bounded by batchSize × maxMediaBytes regardless of partition
  * row count.
  */
object Multimodal {

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("is_supported", BooleanType)
  ))

  /** Sniff media format from magic bytes — pure column expressions (this
    * part needs no codec and is fully real).
    */
  def sniffFormat(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hexPrefix = hex(substring(bin, 1, 4))
    when(hexPrefix.startsWith("89504E47"), "png")
      .when(hexPrefix.startsWith("FFD8FF"), "jpeg")
      .when(hexPrefix.startsWith("52494646"), "riff") // wav/avi/webp container
      .when(hexPrefix.startsWith("494433"), "mp3")
      .otherwise("unknown")
  }

  /** Attach the typed metadata struct for a binary media column. */
  def withMediaMeta(df: DataFrame, mediaCol: String = "media"): DataFrame =
    df.withColumn("media_meta", struct(
      sniffFormat(col(mediaCol)).as("format"),
      length(col(mediaCol)).cast("long").as("n_bytes"),
      sniffFormat(col(mediaCol)).isin("png", "jpeg", "riff", "mp3").as("is_supported")
    ))

  /** STUB decode: a real decoder would turn bytes into pixels/samples here.
    * The deterministic fake emits a 16-bin byte histogram normalized to
    * [0,1] — stable across runs/engines, shaped like a real embedding so
    * downstream operators (ANN, near-dup) are exercised end-to-end.
    */
  private[multimodal] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    if (bytes != null && bytes.nonEmpty) {
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1f; i += 1 }
      var j = 0
      while (j < dim) { hist(j) /= bytes.length.toFloat; j += 1 }
    }
    hist
  }

  /** Batched per-partition feature extraction over a binary media column.
    *
    * Real plumbing: rows stream through `mapPartitions` in `batchSize`
    * groups (bounded memory, amortized per-batch decoder setup — exactly
    * the mapInPandas batch contract); only the decode inside
    * [[decodeStub]] is fake.
    */
  def extractFeatures(
      df: DataFrame,
      idCol: String = "media_id",
      mediaCol: String = "media",
      dim: Int = 16,
      batchSize: Int = 64
  ): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("feature", ArrayType(FloatType, containsNull = false))
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch decoder context would be opened here
        batch.iterator.map { r =>
          val feat = decodeStub(r.getAs[Array[Byte]](mediaIdx), dim)
          Row(r.getLong(idIdx), feat.toSeq)
        }
      }
    }(enc)
  }

  /** Fixed-stride frame sampling from a binary stream: emit every `stride`-th
    * window of `frameBytes` bytes as its own row (the Spark-side shape of
    * video frame extraction; the bytes themselves are raw slices since no
    * video codec exists here).
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String = "media_id",
      mediaCol: String = "media",
      frameBytes: Int = 16,
      stride: Int = 2
  ): DataFrame =
    df.select(
        col(idCol),
        posexplode(
          // guard the stop: media shorter than one stride window would make
          // it -1 and sequence(0, -1) counts DOWN — emit no frames instead
          when(length(col(mediaCol)) >= frameBytes * stride,
            transform(
              sequence(lit(0), floor(length(col(mediaCol)) / (frameBytes * stride)).cast("int") - 1),
              k => substring_index_bytes(col(mediaCol), k, frameBytes, stride)
            )
          ).otherwise(array().cast("array<binary>"))
        ).as(Seq("frame_idx", "frame"))
      )
      .filter(length(col("frame")) === frameBytes)

  /** Byte-window slice helper: window k of `frameBytes` at stride `stride`
    * (substring is 1-based; works on binary columns).
    */
  private def substring_index_bytes(
      bin: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column,
      frameBytes: Int, stride: Int): org.apache.spark.sql.Column =
    bin.substr((k * (frameBytes * stride) + 1).cast("int"), lit(frameBytes))
}
