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

  private[graft] def decodeOne(bytes: Array[Byte], dims: Int): Array[Double] = {
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
    import graft.functions.GraftFunctions.dot
    import graft.llm.AnnBuckets
    // decodeFeatures has already validated the id column as integral and
    // emits a long media_id — no lossy re-cast here
    val e = decodeFeatures(media, dims)
      .select(col("media_id").as("vec_id"), col("features").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val n      = if (nBits == AnnBuckets.Auto || nTables == AnnBuckets.Auto) e.count() else 0L
    val bits   = if (nBits != AnnBuckets.Auto) nBits else AnnBuckets.autoBits(n)
    val tables = AnnBuckets.resolveTables(n, nTables, nProbes)
    AnnBuckets
      .candidatesFor(e, bits, dims, tables, nProbes, seed, minSim = Some(tau))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("cos_sim"))
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
