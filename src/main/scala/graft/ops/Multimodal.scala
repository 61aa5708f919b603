package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.4): treat image/audio/video as
  * opaque `binary` payloads with typed metadata, and run decode /
  * feature-extraction as batched per-partition transforms.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): [[DecodeStub.decode]] produces deterministic fake
  * pixels from the payload bytes. Everything around it — schema, the
  * partition-batched execution shape, feature schema, frame sampling —
  * is real and tested; swapping in a real decoder changes only the stub
  * body.
  *
  * Scale notes: decode is per-row work inside `mapPartitions` (no
  * shuffle); payloads never pass through the driver; partition sizing
  * for 100 TB of blobs is governed by `spark.sql.files.maxPartitionBytes`
  * on the scan, not anything here.
  */
object Multimodal {

  /** A media row: opaque payload + envelope metadata. */
  case class MediaRecord(media_id: Long, mime: String, payload: Array[Byte])

  /** Decoded-media features (what a real image decoder would emit). */
  case class MediaFeatures(media_id: Long, mime: String, byte_len: Long,
                           width: Int, height: Int, channels: Int,
                           feature: Array[Float])

  object DecodeStub {
    /** STUB — stands in for an image/audio decode (e.g. JPEG → pixels).
      * Deterministic on the payload so tests are stable: "dimensions"
      * derive from the byte length, the "feature vector" from a
      * rolling hash of the bytes.
      */
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.payload.length
      var h = 1125899906842597L // deterministic FNV-ish rolling hash
      var i = 0
      while (i < n) { h = h * 31 + (r.payload(i) & 0xff); i += 1 }
      val feature = Array.tabulate(8) { j =>
        (((h >>> (j * 8)) & 0xff).toInt - 128) / 128.0f
      }
      MediaFeatures(r.media_id, r.mime, n.toLong,
        width = 16 + (n % 64), height = 16 + ((n * 7) % 64), channels = 3,
        feature = feature)
    }
  }

  /** Batched decode over partitions — the Scala analog of a pandas UDF
    * over `mapInPandas`: one iterator per partition, rows processed in
    * batch without per-row task overhead or driver involvement.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(DecodeStub.decode))
  }

  /** A resized media row: fixed target dimensions + pixel buffer. */
  case class ResizedMedia(media_id: Long, width: Int, height: Int,
                          channels: Int, pixels: Array[Byte])

  /** Batched resize to (w, h) — same `mapPartitions` execution shape as
    * [[decodeFeatures]]. The resample itself is a STUB (no imaging
    * library here): it emits a correctly-sized w·h·channels buffer
    * filled deterministically from the source envelope, so buffer
    * shape, schema, and batch behavior are all real and testable;
    * a real bilinear/area resampler changes only the fill loop.
    */
  def resize(decoded: Dataset[MediaFeatures], w: Int, h: Int): Dataset[ResizedMedia] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { m =>
      val px = new Array[Byte](w * h * m.channels)
      var hsh = m.byte_len * 31L + m.width * 7L + m.height
      var i = 0
      while (i < px.length) {
        hsh = hsh * 6364136223846793005L + 1442695040888963407L
        px(i) = (hsh >>> 56).toByte
        i += 1
      }
      ResizedMedia(m.media_id, w, h, m.channels, px)
    })
  }

  /** Pseudo-frame sampling for video-shaped payloads: `n` evenly spaced
    * (frame_idx, byte_offset) rows per media row — the partition-local
    * explode a real frame sampler would do.
    */
  def sampleFrames(media: DataFrame, n: Int,
                   idCol: Column = col("media_id"),
                   payloadCol: Column = col("payload")): DataFrame =
    media.select(idCol.as("media_id"), octet_length(payloadCol).as("byte_len"))
      .select(col("media_id"), col("byte_len"),
        explode(expr(s"sequence(0, ${n - 1})")).as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx") * (col("byte_len") / lit(n)).cast("long"))

  /** 60-bit piecewise-average perceptual hash (the aHash construction
    * image dedup uses: downsample, then threshold each cell against
    * the global mean) over a decoded content stream: the stream splits
    * into 60 equal segments, and bit k is set iff segment k's mean
    * sample exceeds the global mean. Small local edits perturb few
    * segment means, so near-identical media land within small Hamming
    * distance — locality over the SAMPLE SEQUENCE, where [[Dedup]]'s
    * simhash is locality over the token SET. Thresholds are exact
    * integer cross-multiplication (seg_sum·n > total·seg_len — no
    * float means), so the fingerprint is engine- and partitioning-
    * exact. With the stub codec the "samples" are the decoded text's
    * codepoints; a real decoder feeds luma bytes through the same
    * arithmetic.
    *
    * Per-row array math only — the hash adds no shuffle; the pair
    * search is the Manku band channel ([[Dedup.simhashNearDups]]):
    * 4 bands × 15 bits, pigeonhole-complete for Hamming ≤ 3, hot
    * buckets capped before the self-join.
    */
  val aHashBits = 60
  val aHashBands = 4

  /** (media_id, phash) — the codegen'd single-pass
    * [[graft.functions.AHash60]] kernel (registered idempotently, like
    * [[Text.polyHash]]'s fast path). */
  def aHashed(media: DataFrame, contentCol: Column, idCol: Column): DataFrame = {
    // register on the frame's OWN session — getActiveSession is
    // per-thread and silently absent off the driver's main thread,
    // which would surface later as an unresolved-routine error far
    // from the cause; media.sparkSession is the session that will
    // analyze the expression.
    graft.functions.GraftFunctions.registerAHash(media.sparkSession)
    media.select(idCol.as("media_id"),
      call_function("a_hash", contentCol).as("phash"))
  }

  /** Reference formulation via built-in higher-order functions — kept
    * for the equivalence property test of the codegen'd kernel (the
    * [[Text.polyHashHof]] discipline): per-char ascii codes, 60
    * slice-aggregates with the same integer-div bounds and
    * cross-multiplied thresholds. */
  def aHashedHof(media: DataFrame, contentCol: Column, idCol: Column): DataFrame =
    media.select(idCol.as("media_id"),
        transform(split(contentCol, ""), c => ascii(c).cast("long")).as("codes"))
      .select(col("media_id"), col("codes"),
        size(col("codes")).cast("long").as("n"),
        aggregate(col("codes"), lit(0L), (a, x) => a + x).as("total"))
      .select(col("media_id"), expr(
        s"""aggregate(transform(sequence(0L, ${aHashBits - 1}L), k ->
           |  CASE WHEN aggregate(slice(codes,
           |      CAST((k * n) div $aHashBits AS INT) + 1,
           |      CAST(((k+1) * n) div $aHashBits - (k * n) div $aHashBits AS INT)),
           |      0L, (a, x) -> a + x) * n
           |    > total * (((k+1) * n) div $aHashBits - (k * n) div $aHashBits)
           |  THEN shiftleft(1L, CAST(k AS INT)) ELSE 0L END),
           |0L, (a, x) -> a + x)""".stripMargin).as("phash"))

  /** Near-duplicate media pairs by banded Hamming distance over the
    * aHash — same channel shape as [[Dedup.simhashNearDups]]. */
  def aHashNearDups(media: DataFrame, contentCol: Column, idCol: Column,
                    maxHamming: Int = 3, maxBucket: Int = 100): DataFrame = {
    require(maxHamming < aHashBands, "pigeonhole needs hamming < bands")
    val bandW = aHashBits / aHashBands
    val banded = aHashed(media, contentCol, idCol)
      .select(col("media_id").as("doc_id"), col("phash"),
        posexplode(array((0 until aHashBands).map(b =>
          shiftright(col("phash"), b * bandW) % lit(1L << bandW)): _*))
          .as(Seq("band", "bv")))
    Dedup.cappedPairJoin(banded, Seq("band", "bv"), maxBucket,
        payload = Seq("phash"))
      .select(col("x.doc_id").as("media_a"), col("y.doc_id").as("media_b"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).cast("long")
          .as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Columnar feature extraction used by the oracle-checked query:
    * envelope features computable without the codec (byte length,
    * content hash, stub dimensions) as pure expressions.
    */
  def envelopeFeatures(payload: Column, nChars: Column): Seq[Column] = Seq(
    octet_length(payload).cast("long").as("byte_len"),
    sha2(payload, 256).as("sha"),
    (lit(16) + nChars % 64).cast("long").as("width"),
    (lit(16) + (nChars * 7) % 64).cast("long").as("height"),
    lit(3L).as("channels"))
}
