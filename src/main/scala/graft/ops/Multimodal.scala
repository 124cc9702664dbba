package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
 * columns with typed metadata, plus batch decode / feature-extract stages.
 *
 * The Spark-side mechanics (schema, partitioning, batch shape) are real; the
 * actual media decode is STUBBED with a deterministic fake — the container
 * has no image/audio codecs. A production deployment swaps `decodeStub` for
 * a real decoder with the same signature; nothing else changes.
 *
 * Scale notes: payloads travel as `BinaryType` cells (Tungsten off-heap,
 * spillable); per-partition batch processing via `mapPartitions` keeps
 * decoder init (model load, codec contexts) amortized per-partition, the
 * same shape a pandas-UDF/Arrow path has in PySpark. Feature outputs are
 * fixed-width arrays so downstream ANN (Similarity) composes directly.
 */
object Multimodal {

  /** Media asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Declarative metadata extraction over the opaque payload — byte length
    * and a content digest; pure projections, no decode needed. */
  def withPayloadMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payloadCol)).cast("long"))
      .withColumn("digest", md5(col(payloadCol)))

  /** STUB decode: a deterministic 4-dim "feature vector" derived from the
    * payload bytes (length + crc32 residues — binary-safe functions only).
    * Replace with a real decoder (same Column-in, array<double>-out shape)
    * in production. */
  def decodeStub(payload: Column): Column = {
    val n = octet_length(payload).cast("double")
    val c = crc32(payload)
    array(
      n / lit(1024.0),
      (c % lit(997L)).cast("double"),
      (c % lit(251L)).cast("double"),
      (c % lit(127L)).cast("double"))
  }

  /** Frame sampling stub for video-like payloads: deterministic byte-offset
    * samples standing in for frame grabs — crc32 of `k` evenly spaced
    * single-byte slices. Real impl: seek+decode at the same offsets. */
  def sampleFramesStub(payload: Column, k: Int): Column = {
    val n = octet_length(payload)
    transform(sequence(lit(0), lit(k - 1)), i => {
      val off = (i * (n - 1) / lit(math.max(k - 1, 1))) + 1
      when(n > 0, crc32(payload.substr(off, lit(1))).cast("double"))
        .otherwise(lit(0.0))
    })
  }

  /** Per-partition batched "decode" — demonstrates the batch shape a real
    * decoder needs (amortized init, bounded memory per batch). The fake
    * feature matches `decodeStub` semantics for the length dim. */
  def decodePartitioned(df: DataFrame, payloadCol: String,
                        batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = inSchema.add("features", ArrayType(DoubleType))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      // expensive-decoder-init would go HERE, once per partition
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val p = r.get(payloadIdx).asInstanceOf[Array[Byte]]
          val feats: Array[Double] =
            if (p == null) Array(0.0, 0.0, 0.0, 0.0)
            else Array(p.length / 1024.0,
              if (p.length > 0) (p.head & 0xff).toDouble else 0.0,
              if (p.length > 0) (p.last & 0xff).toDouble else 0.0,
              p.foldLeft(0L)((a, b) => (a + (b & 0xff)) % 997).toDouble)
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
