package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2B north star): image/audio/video travel
  * as opaque `binary` content plus a typed metadata struct; decode /
  * feature-extract / frame-sample / resize operate on that contract.
  *
  * The decode step ([[decodeFeatures]] → `decodeOne`) sniffs the payload's
  * magic bytes and decodes what the JDK can: PNG/JPEG/GIF/BMP via
  * `javax.imageio` (features = normalized luminance histogram over actual
  * pixels) and RIFF/WAVE 16-bit PCM via a header parse (features =
  * normalized amplitude histogram over actual samples). Payloads in any
  * other format fall back to a deterministic byte histogram so unknown
  * codecs keep flowing through the pipeline. The demo media table
  * ([[mediaFromDocuments]]) carries one real PNG and one real WAV payload
  * alongside the text-backed rows, so q40 and the specs exercise all three
  * paths. The surrounding plumbing — schema, the `mapPartitions` batch
  * shape (the Scala analogue of a Pandas-UDF `mapInPandas` decode),
  * fixed-width feature vectors — is identical for all paths: adding a
  * codec is one more `decodeOne` branch.
  */
object Multimodal {

  private def isPng(b: Array[Byte]) =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
  private def isJpeg(b: Array[Byte]) =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
  private def isGif(b: Array[Byte]) =
    b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'
  private def isBmp(b: Array[Byte]) =
    b.length > 2 && b(0) == 'B' && b(1) == 'M'
  private def isWav(b: Array[Byte]) =
    b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Luminance histogram over decoded pixels (ITU-R 601 weights). */
  private def imageHistogram(bytes: Array[Byte], dims: Int): Option[Array[Double]] =
    Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { img =>
      val h = new Array[Double](dims)
      val (w, ht) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < ht) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          h(math.min(dims - 1, lum * dims / 256)) += 1.0
          x += 1
        }
        y += 1
      }
      val n = math.max(1, w * ht).toDouble
      h.map(_ / n)
    }

  /** Amplitude histogram over 16-bit PCM samples from a RIFF/WAVE `data`
    * chunk (chunk-walks the container; non-PCM or non-16-bit → None).
    */
  private def wavHistogram(bytes: Array[Byte], dims: Int): Option[Array[Double]] = {
    def le16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    var pos            = 12 // after RIFF size + WAVE
    var fmtOk          = false
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= bytes.length && data.isEmpty) {
      val id   = new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(pos + 4)
      if (id == "fmt " && pos + 24 <= bytes.length)
        fmtOk = le16(pos + 8) == 1 && le16(pos + 22) == 16 // PCM, 16-bit
      else if (id == "data" && fmtOk && size > 0)
        // a non-positive declared size is corrupt — skip it so the decode
        // falls back instead of yielding an all-zeros "histogram"
        data = Some((pos + 8, math.min(size, bytes.length - pos - 8)))
      // malformed chunk sizes (negative, or overflowing the int advance)
      // would stall or reverse the walk — treat as corrupt and stop, long
      // arithmetic so size near Int.MaxValue can't wrap pos negative
      val next = pos.toLong + 8L + size.toLong + (size & 1L)
      if (size < 0 || next <= pos) pos = bytes.length
      else pos = math.min(next, bytes.length.toLong).toInt
    }
    // a data chunk with no complete 16-bit sample (truncated container)
    // is corrupt → None → byte-histogram fallback, never a zero vector
    data.filter(_._2 >= 2).map { case (off, len) =>
      val h        = new Array[Double](dims)
      val nSamples = len / 2
      var i        = 0
      while (i < nSamples) {
        val s = le16(off + 2 * i).toShort.toInt // sign-extend
        h(math.min(dims - 1, (s + 32768) * dims / 65536)) += 1.0
        i += 1
      }
      h.map(_ / nSamples.toDouble)
    }
  }

  /** Fallback for formats the JDK can't decode: normalized byte histogram
    * (deterministic, keeps unknown codecs flowing through the pipeline).
    */
  private[graft] def byteHistogram(bytes: Array[Byte], dims: Int): Array[Double] = {
    val h = new Array[Double](dims)
    var i = 0
    while (i < bytes.length) { h((bytes(i) & 0xff) % dims) += 1.0; i += 1 }
    val n = math.max(1, bytes.length).toDouble
    h.map(_ / n)
  }

  /** Decode-call counter. In `local[*]` (one JVM) it counts EVERY decode
    * across driver and executor threads exactly, which is what the
    * decode-once accounting spec gates (each media row decoded exactly
    * once across an index build plus any number of searches); on a real
    * cluster each executor counts only its own share — treat it as a
    * per-process metric there.
    */
  private[graft] val decodeCount = new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] def decodeOne(bytes: Array[Byte], dims: Int): Array[Double] = {
    decodeCount.incrementAndGet()
    val decoded =
      if (isPng(bytes) || isJpeg(bytes) || isGif(bytes) || isBmp(bytes))
        try imageHistogram(bytes, dims) catch { case scala.util.control.NonFatal(_) => None }
      else if (isWav(bytes))
        try wavHistogram(bytes, dims) catch { case scala.util.control.NonFatal(_) => None }
      else None
    decoded.getOrElse(byteHistogram(bytes, dims))
  }

  /** Deterministic 8×8 RGB gradient PNG, generated once on the driver —
    * a real `javax.imageio`-decodable payload for specs and the demo table.
    */
  private[graft] lazy val samplePngBytes: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) { img.setRGB(x, y, ((x * 32) << 16) | ((y * 32) << 8) | ((x + y) * 15)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 440 Hz sine, 16-bit PCM mono 8 kHz, 400 samples, in a
    * well-formed RIFF/WAVE container — a real decodable audio payload.
    */
  private[graft] lazy val sampleWavBytes: Array[Byte] = {
    val n    = 400
    val sr   = 8000
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * 440 * i / sr) * 16384).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    def w(b: Array[Byte]): Unit = bos.write(b, 0, b.length)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    w("RIFF".getBytes); w(le32(36 + data.length)); w("WAVE".getBytes)
    w("fmt ".getBytes); w(le32(16)); w(le16(1)); w(le16(1)) // PCM, mono
    w(le32(sr)); w(le32(sr * 2)); w(le16(2)); w(le16(16))   // rates, block, 16-bit
    w("data".getBytes); w(le32(data.length)); w(data)
    bos.toByteArray
  }

  /** Demo media table: documents re-cast as opaque binary payloads with
    * typed metadata (kind rotates across image/audio/video by id). Three
    * rows carry REAL payloads so the decode path is exercised end-to-end:
    * doc_ids 3 AND 6 (image-kind under the rotation) get
    * [[samplePngBytes]] — a planted exact-duplicate image for the media
    * dedup op (q62) — and doc_id 1 (audio-kind) gets [[sampleWavBytes]];
    * every other row keeps its text bytes and takes the byte-histogram
    * fallback.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")), (col("doc_id") % 3 + 1).cast("int"))
        .as("kind"),
      when(col("doc_id").isin(3, 6), lit(samplePngBytes))
        .when(col("doc_id") === 1, lit(sampleWavBytes))
        .otherwise(col("text").cast("binary")).as("content"),
      struct(
        lit(64).as("width"),
        lit(64).as("height"),
        lit(16000).as("sample_rate"),
        (length(col("text")) * 10).cast("long").as("duration_ms")).as("meta"))

  /** Decode → fixed-width feature vector via [[decodeOne]]: real pixel /
    * sample histograms for JDK-decodable payloads (PNG/JPEG/GIF/BMP, WAV
    * PCM), byte-histogram fallback for everything else. One partition =
    * one batch inside `mapPartitions` (the Scala analogue of a Pandas-UDF
    * `mapInPandas` decode loop); deterministic for fixed payload bytes.
    */
  def decodeFeatures(media: DataFrame, dims: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // fail fast on a non-integral id column: the Long encoder below would
    // otherwise cast e.g. string ids to null row-by-row, and downstream
    // pair predicates (a_id =!= b_id, a_id < b_id) silently drop null-id
    // rows — an empty result with no diagnostic (ADVICE r14 #5)
    val idType = media.schema("media_id").dataType
    require(
      Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"media_id must be an integral column, got $idType — map ids to long before decoding " +
        "(a lossy cast would null them and every downstream pair predicate drops null ids " +
        "silently)")
    media
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => (id, decodeOne(bytes, dims)) })
      .toDF("media_id", "features")
  }

  /** Frame sampling for video-kind media: n evenly-spaced byte windows per
    * item, each then decodable independently — `posexplode` keeps it one
    * shuffle-free projection, and downstream decode parallelism scales with
    * frames, not items.
    */
  def frameSample(media: DataFrame, nFrames: Int = 4, frameLen: Int = 32): DataFrame =
    media
      .where(col("kind") === "video")
      .select(
        col("media_id"),
        col("meta"),
        posexplode(expr(
          s"transform(sequence(0, $nFrames - 1), " +
            s"i -> substring(content, 1 + i * int(greatest(length(content) / $nFrames, 1)), $frameLen))"))
          .as(Seq("frame_idx", "frame_bytes")))

  // ── persisted decoded features (r15: decode once, search forever) ───
  //
  // VERDICT r14 "what's missing" #2: `mediaNearDupApprox` re-decodes the
  // whole corpus on EVERY search, and the mapPartitions ImageIO/WAV
  // decode is the expensive stage (q138 at sf1 was ~87 s, mostly decode
  // + pairs). The 100 TB posture is the same as every other expensive
  // derivation in this repo: persist the derivation once, make later
  // consumers read the persisted form, and give new media an incremental
  // path that decodes ONLY the new batch (the q117/q139 contract).

  /** Decode a media corpus ONCE into a generational features table
    * (`<outDir>/features/src_batch=<b>/…` + a `meta` sidecar recording
    * `dims`): the durable form of [[decodeFeatures]]. [[appendFeatures]]
    * adds a batch by decoding only that batch; [[mediaNearDupIndexed]] /
    * [[writeMediaIndex]] / [[searchMediaIndexed]] consume the persisted
    * vectors without touching the binary payloads again.
    */
  def writeFeaturesGen(
      media: DataFrame,
      outDir: String,
      dims: Int = 16,
      srcBatch: Long = 0L): Unit = {
    val spark = media.sparkSession
    import spark.implicits._
    decodeFeatures(media, dims)
      .withColumn("src_batch", lit(srcBatch))
      .write
      // NO repartition-by-partition-key here, deliberately (the r14 rule
      // targets writers whose key has MANY values): src_batch is a single
      // constant per write, so every task already lands in the one
      // directory — clustering would only serialize the decode stage
      .partitionBy("src_batch")
      .option("partitionOverwriteMode", "static")
      .mode("overwrite")
      .parquet(s"$outDir/features")
    Seq(Tuple1(dims)).toDF("dims")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/meta")
  }

  /** Incremental decode: ONLY the new batch's payloads are decoded (under
    * the table's recorded `dims`) and appended as generation `srcBatch` —
    * dynamic overwrite of exactly that generation, so replay is
    * idempotent and no already-decoded row is ever decoded again.
    */
  def appendFeatures(
      featuresDir: String,
      media: DataFrame,
      srcBatch: Long): Unit =
    writeFeaturesBatch(
      featuresDir, media,
      media.sparkSession.read.parquet(s"$featuresDir/meta").head().getInt(0),
      srcBatch)

  private def writeFeaturesBatch(
      featuresDir: String,
      media: DataFrame,
      dims: Int,
      srcBatch: Long): Unit =
    decodeFeatures(media, dims)
      .withColumn("src_batch", lit(srcBatch))
      .write
      .partitionBy("src_batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(s"$featuresDir/features")

  /** The persisted feature vectors across all generations — the
    * decode-free input every indexed media consumer reads.
    */
  def readFeatures(
      featuresDir: String,
      spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(s"$featuresDir/features").select("media_id", "features")

  /** Media near-dup through the ANN family (the r14 multimodal→search
    * bridge): decode → fixed-width feature histogram ([[decodeFeatures]])
    * → LSH candidate pairs ([[graft.llm.AnnBuckets]], probed-auto sized
    * like every r14 ANN consumer) → rounded-cosine threshold, unordered
    * (a_id &lt; b_id) pairs. The similarity-RANGE variant next to q62's
    * exact digest grouping: byte-identical duplicates collide in every
    * table (cosine 1.0), and re-encoded/resized variants whose bytes
    * differ but histograms are near surface at tau &lt; 1. Mind the q62
    * caveat at scale: same-domain histograms are near-parallel, so for
    * EXACT duplicate detection the digest grouping is the cheaper shape —
    * this path exists for the tau &lt; 1 band the digest cannot see.
    * Output (a_id, b_id, cos_sim).
    */
  def mediaNearDupApprox(
      media: DataFrame,
      tau: Double,
      dims: Int = 16,
      nBits: Int = graft.llm.AnnBuckets.Auto,
      nTables: Int = graft.llm.AnnBuckets.Auto,
      nProbes: Int = 2,
      seed: Long = 42L): DataFrame = {
    // decode ONCE, eagerly pinned (the searchMediaIndexed economics,
    // VERDICT r15 "what's wrong" #1): without the checkpoint the Auto
    // sizing count AND each of the candidate kernel's per-table scans
    // re-execute the mapPartitions ImageIO/WAV decode — the dominant
    // stage of a one-shot search. Pinned, the payloads decode exactly n
    // times total (spec-gated below the persisted-path accounting), and
    // what is materialized is the n×dims feature vectors, never the
    // payloads. decodeFeatures has already validated the id column as
    // integral and emits a long media_id — no lossy re-cast here.
    val feats = decodeFeatures(media, dims).localCheckpoint(true)
    nearDupFromFeatures(feats, feats.count(), tau, dims, nBits, nTables, nProbes, seed)
  }

  /** The candidate tail [[mediaNearDupApprox]] and [[mediaNearDupIndexed]]
    * share — one kernel so the persisted path cannot drift from the
    * decode path (parity is spec-pinned). `n` is by-name and only forced
    * under Auto sizing; callers pass a count over their CHEAP form (the
    * pinned feature frame, or the parquet features table) — counting the
    * un-pinned decode output here is what double-decoded the corpus
    * before r16.
    */
  private def nearDupFromFeatures(
      features: DataFrame,
      n: => Long,
      tau: Double,
      dims: Int,
      nBits: Int,
      nTables: Int,
      nProbes: Int,
      seed: Long): DataFrame = {
    import graft.functions.GraftFunctions.dot
    import graft.llm.AnnBuckets
    val e = features
      .select(col("media_id").as("vec_id"), col("features").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val nRes   = if (nBits == AnnBuckets.Auto || nTables == AnnBuckets.Auto) n else 0L
    val bits   = if (nBits != AnnBuckets.Auto) nBits else AnnBuckets.autoBits(nRes)
    val tables = AnnBuckets.resolveTables(nRes, nTables, nProbes)
    AnnBuckets
      .candidatesFor(e, bits, dims, tables, nProbes, seed, minSim = Some(tau))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("cos_sim"))
  }

  /** [[mediaNearDupApprox]] over a PERSISTED feature table: identical
    * output for the same corpus (spec-pinned parity), but the expensive
    * decode stage is skipped entirely — the search is feature-scan-bound.
    * This is what a second search (or any search after an ingest) should
    * run.
    */
  def mediaNearDupIndexed(
      featuresDir: String,
      spark: org.apache.spark.sql.SparkSession,
      tau: Double,
      nBits: Int = graft.llm.AnnBuckets.Auto,
      nTables: Int = graft.llm.AnnBuckets.Auto,
      nProbes: Int = 2,
      seed: Long = 42L): DataFrame = {
    val dims  = spark.read.parquet(s"$featuresDir/meta").head().getInt(0)
    val feats = readFeatures(featuresDir, spark)
    // the Auto count runs over the parquet features table — metadata-cheap
    nearDupFromFeatures(feats, feats.count(), tau, dims, nBits, nTables, nProbes, seed)
  }

  /** Build a persisted LSH index OVER the persisted features — the
    * [[graft.llm.AnnBuckets.writeBucketsGen]] machinery fed decode-free:
    * query-vs-corpus media search then runs through
    * [[searchMediaIndexed]] with static bucket pruning, and
    * [[ingestMedia]] keeps features and index in step without ever
    * re-decoding history.
    */
  def writeMediaIndex(
      featuresDir: String,
      indexDir: String,
      spark: org.apache.spark.sql.SparkSession,
      nBits: Int = graft.llm.AnnBuckets.Auto,
      nTables: Int = graft.llm.AnnBuckets.Auto,
      nProbes: Int = 2,
      seed: Long = 42L): Unit = {
    val dims = spark.read.parquet(s"$featuresDir/meta").head().getInt(0)
    graft.llm.AnnBuckets.writeBucketsGen(
      readFeatures(featuresDir, spark), "media_id", "features", indexDir,
      nBits = nBits, dims = dims, nTables = nTables, seed = seed, nProbes = nProbes)
  }

  /** Incremental media ingest: decode the NEW batch once
    * ([[appendFeatures]]), then feed the just-persisted vectors — read
    * BACK from the features table, so the payloads are not decoded a
    * second time for the index — into the LSH index's generational
    * append. Both writes are dynamic overwrites of exactly this batch's
    * partitions: replaying the batch is idempotent on both tables.
    */
  def ingestMedia(
      featuresDir: String,
      indexDir: String,
      media: DataFrame,
      srcBatch: Long): Unit = {
    val spark = media.sparkSession
    graft.llm.AnnBuckets.requireGenerationalBuckets(indexDir, spark)
    ingestMediaLoaded(
      featuresDir, indexDir,
      graft.llm.AnnBuckets.readBucketsMeta(indexDir, spark),
      spark.read.parquet(s"$featuresDir/meta").head().getInt(0),
      media, srcBatch)
  }

  /** The [[ingestMedia]] write against ALREADY-LOADED sidecars — the
    * ingest-loop shape (the `appendToBucketsLoaded` economics, applied
    * here so the streaming media loop does not re-collect two meta
    * sidecars and re-scan the index schema per micro-batch). The
    * feature-vs-index width agreement is validated here — bucketing
    * narrower-than-index vectors silently truncates the hyperplane dot
    * products (the dims/id-cast silent-wrong-results class) — and the
    * index append's per-batch geometry-stamp check still runs inside
    * [[graft.llm.AnnBuckets.appendToBucketsLoaded]], so a mid-stream
    * rebuild fails the loop fast exactly like the other loops.
    */
  def ingestMediaLoaded(
      featuresDir: String,
      indexDir: String,
      indexMeta: graft.llm.AnnBuckets.BucketsMeta,
      featureDims: Int,
      media: DataFrame,
      srcBatch: Long): Unit = {
    val spark = media.sparkSession
    require(featureDims == indexMeta.dims,
      s"feature width mismatch: features at $featuresDir are $featureDims-dim but the index " +
        s"at $indexDir was built for ${indexMeta.dims}-dim vectors — rebuild one side " +
        "(writeMediaIndex derives its width from the features table, so indexes built " +
        "through it cannot drift)")
    writeFeaturesBatch(featuresDir, media, featureDims, srcBatch)
    val justWritten = spark.read
      .parquet(s"$featuresDir/features")
      .where(col("src_batch") === srcBatch)
      .select("media_id", "features")
    graft.llm.AnnBuckets
      .appendToBucketsLoaded(indexDir, indexMeta, justWritten, "media_id", "features", srcBatch)
  }

  /** Query-vs-corpus media search against a [[writeMediaIndex]] index:
    * only the QUERY batch is decoded (it is new media, by definition);
    * the corpus side is the persisted index, read with the recorded
    * probe budget and static bucket pruning
    * ([[graft.llm.AnnBuckets.approxTopKIndexed]]). The query decode
    * width comes from the INDEX's meta sidecar — a caller-supplied dims
    * on a differently-sized index would decode queries at the wrong
    * width and return silently wrong cosines (the dot product truncates
    * to the shorter array), which is the id-cast bug class ADVICE r14
    * already closed once.
    */
  def searchMediaIndexed(
      indexDir: String,
      queryMedia: DataFrame,
      k: Int = 5): DataFrame = {
    val dims = graft.llm.AnnBuckets
      .readBucketsMeta(indexDir, queryMedia.sparkSession).dims
    graft.llm.AnnBuckets.approxTopKIndexed(
      indexDir,
      // eager checkpoint: the indexed read evaluates its query frame once
      // per table (probe explosion) plus the probe-set collect — without
      // pinning, a 100-media batch decoded 4× (measured in
      // MediaFeatureBench); query batches are serve-sized by the indexed
      // read's own probe-set bound, so materializing them is cheap
      decodeFeatures(queryMedia, dims).localCheckpoint(true),
      "media_id", "features", k)
  }

  /** Resize in feature space: fold adjacent histogram bins (the stand-in
    * for spatial resize; same contract — array in, smaller array out).
    */
  def resizeFeatures(features: DataFrame, outDims: Int): DataFrame =
    features.select(
      col("media_id"),
      expr(
        s"transform(sequence(0, $outDims - 1), o -> aggregate(" +
          s"transform(sequence(0, int(size(features) / $outDims) - 1), " +
          s"j -> features[o * int(size(features) / $outDims) + j]), 0D, (a, v) -> a + v))")
        .as("features"))
}
