package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque binary + typed metadata,
  * with a per-partition decode/feature-extract stage (the Scala analog
  * of a batch mapInPandas UDF).
  *
  * !! The decode kernel itself is a STUB: image/audio codec libraries
  * are not present in this build, so `decodeStub` produces a
  * deterministic fake feature vector from the raw bytes. Everything
  * around it — the binary+metadata schema, the per-partition batch
  * shape, row accounting, and output schema — is the real plumbing a
  * codec would drop into.
  *
  * Scale notes: mapPartitions processes each partition as one iterator
  * (amortizing any per-batch model/codec setup, exactly like a Pandas
  * UDF batch); the binary payloads never shuffle — decode happens
  * in-place on the scan partitioning.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_bytes", BinaryType),
    StructField("media_meta", StructType(Seq(
      StructField("modality_tag", StringType),
      StructField("declared_size", LongType))))))

  /** Declared output contract of [[decodeStub]] — the actual schema is
    * encoder-derived; LlmSpec asserts the two stay in lockstep. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("feature", ArrayType(DoubleType))))

  /** Wrap a documents-like frame into the media schema (text bytes stand
    * in for the opaque payload). `carry` appends pass-through columns
    * after the media triple (the no-carry schema is [[mediaSchema]]). */
  def asMedia(docs: DataFrame, carry: Seq[String] = Nil): DataFrame =
    docs.select(Seq(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media_bytes"),
      struct(col("lang").as("modality_tag"),
        col("n_chars").as("declared_size")).as("media_meta")) ++
      carry.map(col): _*)

  /** The decode/feature-extract stage. Swap the body of `extract` for a
    * real codec; the signature and batch shape stay. Typed
    * `Dataset.mapPartitions` (not an RDD hop): the plan stays a
    * Deserialize→MapPartitions→Serialize span inside the Dataset
    * pipeline — Tungsten row format on both sides, encoder-derived
    * schema instead of driver-side reflection, and the same
    * one-iterator-per-partition shape a codec needs to amortize its
    * setup. */
  def decodeStub(spark: SparkSession, media: DataFrame,
      featureDims: Int = 4): DataFrame = {
    import spark.implicits._
    def extract(bytes: Array[Byte]): Array[Double] =
      Array.tabulate(featureDims)(i =>
        bytes.slice(i * 8, i * 8 + 8).map(_.toDouble).sum)   // ??? real codec
    media.select(col("doc_id"), col("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) => (id, bytes.length, extract(bytes)) }
      }
      .toDF("doc_id", "n_bytes", "feature")
  }

  /** Frame sampling over the opaque payload — the video-style stage:
    * treat the byte stream as fixed-size frames, keep every `every`-th
    * (a real pipeline decodes only those — sampling must happen BEFORE
    * decode to be worth anything). The frame slicing here is real byte
    * work on the payload; only the per-frame decode remains stubbed.
    * Same per-partition shape as [[decodeStub]]: payloads never
    * shuffle, the sampler runs on the scan partitioning, and the
    * output is a tiny per-item stat row. */
  def frameSample(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 32, every: Int = 4): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val n = bytes.length
          val nFrames = (n + frameBytes - 1) / frameBytes
          val sampled = (0 until nFrames by every)
            .map(i => bytes.slice(i * frameBytes,
              math.min((i + 1) * frameBytes, n)))
          (id, nFrames.toLong, sampled.size.toLong,
            sampled.map(_.length.toLong).sum)
        }
      }
      .toDF("doc_id", "n_frames", "n_sampled", "sampled_bytes")
  }
}
