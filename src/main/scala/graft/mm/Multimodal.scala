package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder-prompt extension): image / audio
  * / video payloads as opaque `binary` columns with typed metadata, and
  * decode / feature-extract stages as partition-local batch transforms.
  *
  * The Spark-side plumbing (schema, batching, partition-local execution,
  * output shape) is real and tested; the actual codec call is STUBBED
  * behind [[StubCodec]] with a deterministic fake — the container has no
  * image/audio libraries. Swapping in a real decoder changes ONE
  * function, not the pipeline.
  */
object Multimodal {

  /** A multimodal cell: payload + self-describing metadata. */
  case class MediaBlob(media_id: Long, kind: String, payload: Array[Byte],
                       width: Int, height: Int, sample_rate: Int)

  /** Fixed-size feature row produced by decode+extract. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           features: Array[Float])

  val blobSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false)))

  /** STUB codec: a real implementation would call an image/audio
    * library here (per partition, reusing a decoder instance). The fake
    * derives a deterministic D-dim feature vector from the md5 of the
    * payload bytes via the portable affine family (graft.plans
    * .PortableHash) — overflow-free 64-bit arithmetic only, so a DuckDB
    * SQL mirror reproduces every feature bit-for-bit and the whole
    * decode pipeline is oracle-adjudicable, not just rows-counted.
    */
  object StubCodec {
    val dim = 16
    def decodeAndExtract(b: MediaBlob): MediaFeatures = {
      import graft.plans.PortableHash
      val bytes = Option(b.payload).getOrElse(Array.emptyByteArray)
      val hex = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map(x => f"$x%02x").mkString
      val a = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val a58 = a & PortableHash.MaskA
      val bb = PortableHash.bOf(a)
      val feats = Array.tabulate(dim) { i =>
        ((a58 + i.toLong * bb) % 1000L).toFloat / 1000.0f
      }
      MediaFeatures(b.media_id, b.kind, bytes.length, feats)
    }
  }

  /** Decode + feature-extract over partition-local batches — the Scala
    * analog of a pandas-UDF `mapInPandas` stage: one codec per
    * partition, streaming iterator in/out, no per-row JVM↔native churn.
    */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    blobs.mapPartitions { it =>
      // per-partition codec setup would go here
      it.map(StubCodec.decodeAndExtract)
    }
  }

  /** Decode + feature-extract through ARROW BATCHES: rows are marshalled
    * into a VectorSchemaRoot of `batchSize` per chunk inside each
    * partition and the codec consumes/produces whole columnar batches —
    * the exact interface a native (JNI/GPU) decoder binds to zero-copy.
    * Spark's Scala API has no public mapInArrow (Python-only), so the
    * batch bridge is explicit mapPartitions + arrow-vector; only the
    * codec call inside [[ArrowCodecBridge]] is stubbed.
    */
  def extractFeaturesArrow(blobs: Dataset[MediaBlob],
                           batchSize: Int = 256): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap(rows => ArrowCodecBridge.processBatch(rows))
    }
  }

  /** The Arrow boundary: build the input batch, hand it to the codec,
    * read the result. A real decoder receives `root`'s buffers directly.
    */
  object ArrowCodecBridge {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, FieldVector, VarBinaryVector, VarCharVector, VectorSchemaRoot}

    def processBatch(rows: Seq[MediaBlob]): Seq[MediaFeatures] = {
      val alloc = new RootAllocator(Long.MaxValue)
      try {
        val ids = new BigIntVector("media_id", alloc)
        val kinds = new VarCharVector("kind", alloc)
        val payloads = new VarBinaryVector("payload", alloc)
        val root = new VectorSchemaRoot(
          java.util.Arrays.asList[FieldVector](ids, kinds, payloads))
        try {
          ids.allocateNew(rows.size); kinds.allocateNew(); payloads.allocateNew()
          rows.zipWithIndex.foreach { case (b, i) =>
            ids.setSafe(i, b.media_id)
            kinds.setSafe(i, b.kind.getBytes("UTF-8"))
            if (b.payload == null) payloads.setNull(i)
            else payloads.setSafe(i, b.payload)
          }
          root.setRowCount(rows.size)
          // ---- native-codec boundary: a real implementation passes
          // `root` across JNI and fills the OUTPUT batch below; the stub
          // walks the same Arrow vectors, so both directions of the data
          // path exercise the real columnar interface
          val n = root.getRowCount
          val dim = StubCodec.dim
          val outBytes = new org.apache.arrow.vector.IntVector("n_bytes", alloc)
          val outFeats = new org.apache.arrow.vector.complex.FixedSizeListVector(
            "features", alloc,
            org.apache.arrow.vector.types.pojo.FieldType.nullable(
              new org.apache.arrow.vector.types.pojo.ArrowType.FixedSizeList(dim)), null)
          try {
            outFeats.initializeChildrenFromFields(java.util.Arrays.asList(
              new org.apache.arrow.vector.types.pojo.Field("item",
                org.apache.arrow.vector.types.pojo.FieldType.nullable(
                  new org.apache.arrow.vector.types.pojo.ArrowType.FloatingPoint(
                    org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE)), null)))
            val featData = outFeats.getDataVector
              .asInstanceOf[org.apache.arrow.vector.Float4Vector]
            outBytes.allocateNew(n)
            outFeats.setInitialCapacity(n)
            outFeats.allocateNew()
            var i = 0
            while (i < n) {
              val payload = if (payloads.isNull(i)) null else payloads.get(i)
              val f = StubCodec.decodeAndExtract(MediaBlob(ids.get(i),
                new String(kinds.get(i), "UTF-8"), payload, 0, 0, 0))
              outBytes.setSafe(i, f.n_bytes)
              outFeats.setNotNull(i)
              var j = 0
              while (j < dim) { featData.setSafe(i * dim + j, f.features(j)); j += 1 }
              i += 1
            }
            outBytes.setValueCount(n)
            featData.setValueCount(n * dim)
            outFeats.setValueCount(n)
            // unmarshal the columnar result batch back into rows
            (0 until n).map { i =>
              val fs = Array.tabulate(dim)(j => featData.get(i * dim + j))
              MediaFeatures(ids.get(i), new String(kinds.get(i), "UTF-8"),
                outBytes.get(i), fs)
            }
          } finally { outBytes.close(); outFeats.close() }
        } finally root.close()
      } finally alloc.close()
    }
  }

  /** Build a MediaBlob table from any binary-ish source column —
    * here payloads are synthesized from text bytes (deterministic) so
    * the pipeline runs on the driver-provided `documents` table.
    */
  def blobsFromDocuments(docs: DataFrame): Dataset[MediaBlob] = {
    implicit val enc = Encoders.product[MediaBlob]
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(640)).cast("int") + 32).as("width"),
      (pmod(col("doc_id"), lit(480)).cast("int") + 32).as("height"),
      lit(0).as("sample_rate")).as[MediaBlob]
  }

  /** Frame-sample plumbing: pick every `stride`-th chunk of the payload
    * as a pseudo-frame (the real op would decode video frames); output
    * is one row per sampled frame — a generator (1 row → N rows).
    */
  def sampleFrames(blobs: Dataset[MediaBlob], stride: Int): DataFrame =
    blobs.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest((octet_length(col("payload")) / stride).cast("int") - 1, lit(0)))))
      .withColumn("frame",
        col("payload").substr((col("frame_idx") * stride + 1).cast("int"), lit(stride)))
      .select(col("media_id"), col("frame_idx"), col("frame"))
}
