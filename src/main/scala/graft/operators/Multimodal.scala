package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * payloads travel as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / resize / frame-sample run as partition-wise
  * batch transforms.
  *
  * The actual media codecs are NOT in this container, so the decoder is a
  * clearly-marked deterministic STUB (`StubCodec`) — the Spark-side
  * contract (schema, partitioning, batch shape, null handling) is real
  * and tested, and a production build swaps `StubCodec` for a JNI/FFmpeg
  * binding without touching the plan shape.
  *
  * Scale notes: payload rows are large — partition sizing must target
  * `spark.sql.files.maxPartitionBytes`-scale partitions, and decode is
  * mapPartitions (one codec init per partition, not per row), the Scala
  * analog of Python's `mapInPandas` batch shape.
  */
object Multimodal {

  /** Canonical media-row schema: id + kind + payload + sparse metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("mime", StringType))), nullable = true)))

  /** ??? STUB codec ??? — deterministic fake in place of the real
    * image/audio decoder (libs not present in this container). Derives
    * "pixels"/"samples" from the payload bytes so tests are stable.
    */
  object StubCodec {
    /** Entropy blocks behind the stub features: concatenated lowercase
      * md5 hex of (payload ++ blockIndex.toString bytes), one 32-char
      * block per 8 features. md5 — not a custom mix — so an external
      * system (the DuckDB oracle: `md5(text || '0') || md5(text || '1')`)
      * can recompute the blocks bit-for-bit and hash-grade the codec
      * path end-to-end.
      */
    def featureBlocksHex(payload: Array[Byte], nBlocks: Int): String = {
      if (payload == null) return null
      val md = java.security.MessageDigest.getInstance("MD5")
      val sb = new java.lang.StringBuilder(nBlocks * 32)
      var k = 0
      while (k < nBlocks) {
        md.reset()
        md.update(payload)
        md.update(String.valueOf(k).getBytes("UTF-8"))
        md.digest().foreach(b => sb.append(f"${b & 0xff}%02x"))
        k += 1
      }
      sb.toString
    }

    /** "Decode" a payload into nFeatures float features in [0, 1): each
      * feature is a 16-bit slice of the [[featureBlocksHex]] entropy
      * scaled by 2^-16 (a dyadic rational — exact in Float). Real impl:
      * decode → resize → normalize → CNN/AST features.
      */
    def decodeFeatures(payload: Array[Byte], nFeatures: Int): Array[Float] = {
      if (payload == null) return null
      val hex = featureBlocksHex(payload, (nFeatures + 7) / 8)
      Array.tabulate(nFeatures) { j =>
        val off = 32 * (j / 8) + 4 * (j % 8)
        Integer.parseInt(hex.substring(off, off + 4), 16) / 65536.0f
      }
    }

    /** "Resize": real impl rescales pixels; stub truncates/pads bytes. */
    def resize(payload: Array[Byte], targetBytes: Int): Array[Byte] =
      if (payload == null) null else java.util.Arrays.copyOf(payload, targetBytes)

    /** Frame-sample positions for a video with n frames, every `stride`. */
    def framePositions(nFrames: Int, stride: Int): Array[Int] =
      (0 until nFrames by stride).toArray
  }

  /** Decode payloads to feature vectors, partition-wise (codec init once
    * per partition — the mapInPandas batch shape). Appends `features`
    * (the float vector) and `features_hex` (the codec's raw entropy
    * blocks, [[StubCodec.featureBlocksHex]]) — the hex column is the
    * hash-gradable scalar witness for the non-SQL float array.
    */
  def extractFeatures(df: DataFrame, nFeatures: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields.toSeq :+
      StructField("features", ArrayType(FloatType), nullable = true) :+
      StructField("features_hex", StringType, nullable = true))
    val enc = Encoders.row(schema)
    val nBlocks = (nFeatures + 7) / 8
    df.mapPartitions { rows =>
      // real codec would initialize here, once per partition
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val hex = StubCodec.featureBlocksHex(payload, nBlocks)
        val feats =
          if (hex == null) null
          else Array.tabulate(nFeatures) { j =>
            val off = 32 * (j / 8) + 4 * (j % 8)
            Integer.parseInt(hex.substring(off, off + 4), 16) / 65536.0f
          }
        Row.fromSeq(r.toSeq :+ feats :+ hex)
      }
    }(enc)
  }

  /** Resize payloads to target (width × height) dims, partition-wise
    * through the codec (stub: truncate/pad to w·h·3 bytes — a real impl
    * rescales pixels); `meta` is rewritten to the target dims. Audio
    * rows pass through unchanged. Schema-preserving, so it composes
    * with the other media transforms.
    */
  def resizeMedia(df: DataFrame, width: Int, height: Int): DataFrame = {
    val enc = Encoders.row(df.schema)
    val pIdx = df.schema.fieldIndex("payload")
    val mIdx = df.schema.fieldIndex("meta")
    val kIdx = df.schema.fieldIndex("kind")
    // resolve width/height positions from the struct's own schema so any
    // field order / extra fields compose — never by hard-coded position
    val metaSchema = df.schema(mIdx).dataType.asInstanceOf[StructType]
    val wIdx = metaSchema.fieldIndex("width")
    val hIdx = metaSchema.fieldIndex("height")
    val target = width * height * 3
    df.mapPartitions { rows =>
      // real codec would initialize here, once per partition
      rows.map { r =>
        if (r.getString(kIdx) == "audio") r
        else {
          val vals = r.toSeq.toArray
          vals(pIdx) = StubCodec.resize(r.getAs[Array[Byte]](pIdx), target)
          val old = r.getAs[Row](mIdx)
          vals(mIdx) =
            if (old == null) null
            else Row.fromSeq(old.toSeq
              .updated(wIdx, Int.box(width)).updated(hIdx, Int.box(height)))
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }(enc)
  }

  /** Cheap metadata pass that needs no codec: byte length + content
    * fingerprint — pure Column expressions, fully pushed down.
    */
  def payloadStats(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("kind"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("content_md5"))

  /** Exact payload-level dedup: the binary-column edition of
    * [[graft.operators.Dedup.exactDupGroups]] — media assets dedup by
    * content fingerprint BEFORE any decode (the cheap first pass a
    * 100 TB media lake runs; frame- or embedding-level near-dup then
    * only touches the survivors). One map-side-combined groupBy on the
    * 128-bit digest; payload bytes never shuffle — only (digest, id,
    * length) rows do.
    */
  def dedupExact(df: DataFrame): DataFrame =
    df.groupBy(md5(col("payload")).as("content_md5"))
      .agg(min(col("media_id")).cast("long").as("keep_id"),
        count(lit(1)).cast("long").as("n_copies"),
        min(octet_length(col("payload"))).cast("long").as("n_bytes"))

  /** Frame sampling for video rows: one output row per sampled frame
    * index (the real impl would slice the payload per frame).
    */
  def sampleFrames(df: DataFrame, stride: Int = 10): DataFrame =
    df.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), greatest(coalesce(col("meta.n_frames"), lit(1)) - 1, lit(0)),
          lit(stride))).as("frame_idx"))
}
