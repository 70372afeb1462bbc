package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches —
  * the Spark-side shape of a decode/feature-extract stage. The codec
  * itself is STUBBED (no media libraries in this environment) with a
  * deterministic fake; schema, partitioning, batch shape, and the
  * iterator contract are real and tested.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Build a media table from a text corpus: bytes = UTF-8 of the
    * text (stand-in for real image/audio payloads), metadata derived
    * deterministically.
    */
  def packFromText(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("media"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("format"),
        (pmod(col(idCol), lit(640)) + 1).cast("int").as("width"),
        (pmod(col(idCol), lit(480)) + 1).cast("int").as("height")).as("meta"))

  /** STUB decode: a real implementation would hand `bytes` to an
    * image/audio codec here. The fake derives deterministic
    * "features" (byte count, mean byte value) so the plumbing is
    * testable end-to-end.
    */
  private def stubDecode(bytes: Array[Byte]): (Int, Double) = {
    if (bytes == null) return (0, 0.0) // null media row ≡ empty payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
    (bytes.length, if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length)
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("batch_size", IntegerType)))

  /** STUB resize: a real implementation decodes, scales to
    * `(w, h)`, and re-encodes. The fake deterministically truncates/
    * pads the payload to `w*h` bytes so output size tracks the target
    * dimensions — the plumbing (binary→binary map, metadata update,
    * no shuffle) is the real part.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media
      // rpad on binary both truncates and zero-pads to the target
      .withColumn("media", expr(s"rpad(media, ${w * h}, X'00')"))
      .withColumn("meta", struct(
        col("meta.format").as("format"),
        lit(w).as("width"), lit(h).as("height")))

  /** STUB frame sampling: every `every`-th fixed-size slice of the
    * payload becomes one "frame" row — the explode shape of video
    * frame extraction (one input row → N frame rows, order-stable
    * via frame_idx), with the codec faked as byte slicing.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, every: Int): DataFrame = {
    val nFrames = greatest(
      (octet_length(col("media")) / lit(frameBytes)).cast("int"), lit(1))
    media
      .select(col("media_id"), col("meta"), col("media"),
        posexplode(sequence(lit(0), nFrames - 1)).as(Seq("frame_idx", "i")))
      .filter(pmod(col("frame_idx"), lit(every)) === 0)
      .withColumn("frame", expr(s"substring(media, i * $frameBytes + 1, $frameBytes)"))
      .filter(octet_length(col("frame")) > 0)
      .select(col("media_id"), col("frame_idx"), col("frame"), col("meta"))
  }

  /** 63-bit perceptual hash of the media payload — a native one-pass
    * kernel ([[graft.plans.DHashMd5Expression]]): 64-cell histogram of
    * md5-hashed byte 4-grams, bit k = gradient `cell[k+1] > cell[k]`
    * (dHash over a translation-invariant "pixel grid", so a payload
    * with a few bytes prepended — a header change / re-encode — stays
    * within a few bits of the original). */
  def perceptualHash(media: Column): Column =
    graft.plans.NativeCols.dhashMd5(media)

  /** Column-DSL fold twin of [[perceptualHash]] — the spec's
    * equivalence reference, never the production path (O(n·cells)
    * interpreted lambdas per row vs the kernel's one compiled pass).
    */
  private[graft] def perceptualHashFold(mediaCol: String): Column = {
    val buckets = s"""transform(
      if(octet_length($mediaCol) >= 4,
         sequence(1, octet_length($mediaCol) - 3), array()),
      i -> cast(conv(substring(md5(substring($mediaCol, i, 4)), 1, 15),
               16, 10) as bigint) % 64)"""
    val counts =
      s"transform(sequence(0, 63), c -> size(filter($buckets, b -> b = c)))"
    // explicit null propagation: octet_length(NULL) is NULL, which the
    // if() below would otherwise coalesce into the empty-payload path
    expr(s"""if($mediaCol is null, cast(null as bigint),
      aggregate(sequence(0, 62), 0L,
      (acc, k) -> acc + if(element_at($counts, cast(k + 2 as int)) >
                           element_at($counts, cast(k + 1 as int)),
                          shiftleft(1L, cast(k as int)), 0L)))""")
  }

  /** Perceptual near-duplicate pairs over a media table: banded LSH on
    * the 63-bit hash (8 bands of 8 bits) to generate candidates, full
    * hamming-distance verify `bit_count(a ^ b) <= maxHamming`.
    *
    * RECALL-COMPLETE for `maxHamming < bands` by pigeonhole: a pair
    * within hamming h < 8 differs in at most h bands, so at least one
    * band matches exactly and the pair IS a candidate — the banding is
    * pure shuffle-avoidance (each doc emits 8 band keys; only
    * same-bucket slivers join), never a recall trade-off, which is
    * what makes the exhaustive oracle an exact match. At 100 TB: one
    * exchange on (band, bits), candidate volume bounded by bucket
    * occupancy; no all-pairs anywhere.
    */
  /** All-ones mask of `width` low bits, in LONG arithmetic: the Int
    * form overflowed for bands=2 (width 32 → mask 0, every row in one
    * bucket → the banded join degenerated to all-pairs); width 64
    * (bands=1) would wrap the Long shift the same way, so it gets the
    * all-bits mask explicitly. */
  private[graft] def bandMask(width: Int): Long =
    if (width >= 64) -1L else (1L << width) - 1

  def perceptualNearDup(media: DataFrame, idCol: String = "media_id",
      maxHamming: Int = 7, bands: Int = 8): DataFrame = {
    require(maxHamming < bands,
      s"maxHamming=$maxHamming >= bands=$bands loses the pigeonhole " +
        "recall guarantee; raise bands or lower the threshold")
    val hashed = media
      .select(col(idCol).cast("long").as("mid"),
        perceptualHash(col("media")).as("ph"))
    val bandWidth = 64 / bands
    val mask = bandMask(bandWidth)
    val banded = hashed
      .select(col("mid"), col("ph"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bits",
        expr(s"shiftright(ph, band * $bandWidth) & $mask"))
    val a = banded.select(col("band"), col("bits"),
      col("mid").as("id_a"), col("ph").as("ph_a"))
    val b = banded.select(col("band"), col("bits"),
      col("mid").as("id_b"), col("ph").as("ph_b"))
    a.join(b, Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(ph_a ^ ph_b)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Per-partition batched feature extraction — the `mapInPandas`
    * analog in Scala: iterator-of-batches, one codec call per row,
    * bounded memory (`batchSize` rows in flight per partition).
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select(col("media_id"), col("media"), col("meta.format").as("format"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (n, mean) = stubDecode(r.getAs[Array[Byte]]("media"))
            Row(r.getAs[Long]("media_id"), r.getAs[String]("format"),
              n, mean, batch.size)
          }
        }
      }(enc)
  }
}
