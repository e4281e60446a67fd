package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column processing: media payloads travel as opaque `binary`
  * columns with typed metadata beside them; decode/feature-extraction
  * kernels run per partition over iterator batches (the JVM twin of
  * arrow-batched pandas UDFs — same batch shape, same partitioning
  * contract), so decoder state is initialized once per partition, not per
  * row.
  *
  * The actual codecs (image/audio libs) are NOT in this container — the
  * decode step is a clearly-marked deterministic stub behind the
  * `Decoder` trait. Everything Spark-side (schema, batching, partition
  * sizing, metadata flow) is real and tested.
  */
final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

final case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
    width: Int, height: Int, feature: Array[Float])

object Media {

  /** Decoder contract: bytes → (width, height, feature vector). Swap the
    * stub for a real codec binding in production; everything downstream is
    * agnostic to which.
    */
  trait Decoder extends Serializable {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Array[Float])
  }

  /** Deterministic fake decoder: dimensions and features derived from the
    * payload bytes, so specs can assert exact values. STUB — replace with
    * a real image/audio binding.
    */
  object StubDecoder extends Decoder {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val n = payload.length
      val w = 1 + (n % 64)
      val h = 1 + (n % 48)
      // 4-dim "embedding": byte sums over 4 strides, normalized
      val feat = Array.tabulate(4) { k =>
        var s = 0L
        var i = k
        while (i < n) { s += (payload(i) & 0xff); i += 4 }
        (s % 1000).toFloat / 1000f
      }
      (w, h, feat)
    }
  }

  /** Binary payloads from a documents-like frame: the text bytes stand in
    * for media blobs (the container has no real media), with a
    * deterministic media_type split.
    */
  def payloads(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("media_type"),
      col("text").cast("binary").as("payload"))

  /** Decode + feature-extract, one decoder instance per partition.
    * Partition count is the parallelism AND memory knob: at 100 TB of
    * media, repartition so each task holds one batch of payloads
    * (`spark.sql.files.maxPartitionBytes` governs the scan side; an
    * explicit repartition governs post-shuffle decode width).
    */
  def extractFeatures(rows: Dataset[MediaRow], decoder: Decoder,
      spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    rows.mapPartitions { it =>
      // per-partition decoder setup happens here (model load, codec init)
      val d = decoder
      it.map { r =>
        val (w, h, feat) = d.decode(r.media_type, r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length, w, h, feat)
      }
    }
  }

  /** Resize planning: target dimensions preserving aspect ratio, never
    * upscaling — the metadata half of image resize, pure codegen'd
    * arithmetic over the decoded (width, height). The pixel transform
    * itself belongs to the Decoder implementation (stubbed here — no
    * codecs in this container); a pipeline partitions/batches on these
    * planned dimensions before the expensive pixel pass.
    */
  def resizePlan(decoded: DataFrame, maxDim: Int = 224): DataFrame =
    decoded
      .withColumn("scale",
        least(lit(1.0), lit(maxDim.toDouble) /
          greatest(col("width"), col("height")).cast("double")))
      // the least(maxDim) clamp is load-bearing: ceil(side * (maxDim /
      // side)) can land one past maxDim when the IEEE product rounds up
      // (293 * (224.0/293) = 224.00000000000003 → ceil 225); at scale=1
      // both sides are already ≤ maxDim so the clamp never distorts
      .withColumn("out_width",
        least(ceil(col("width") * col("scale")), lit(maxDim.toLong)).cast("int"))
      .withColumn("out_height",
        least(ceil(col("height") * col("scale")), lit(maxDim.toLong)).cast("int"))

  /** Frame sampling: fixed-stride byte windows standing in for video frame
    * extraction — explode is map-side; downstream only sees
    * (id, frame_no, frame hash).
    */
  def sampleFrames(payloads: DataFrame, frameBytes: Int = 64, stride: Int = 256): DataFrame =
    payloads
      .withColumn("n_frames",
        greatest(lit(1), (length(col("payload")) / stride).cast("int")))
      .select(col("doc_id"), col("media_type"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_no"),
        col("payload"))
      .select(col("doc_id"), col("media_type"), col("frame_no"),
        md5(col("payload").substr(lit(1) + col("frame_no") * stride, lit(frameBytes)))
          .as("frame_md5"))
}
