package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed metadata extracted from an opaque media blob. */
case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
                     n_frames: Int, content_hash: String)

/** A sampled frame reference (video frame-sampling output shape). */
case class FrameRef(doc_id: Long, frame_idx: Int, frame_hash: String)

/** Output of the REAL image decode: dimensions and a position-weighted
  * pixel checksum read from the decoded raster.
  */
case class DecodedImage(doc_id: Long, width: Int, height: Int, px_checksum: Long)

/** Per-frame audio features (energy / zero-crossing rate / peak) — the
  * standard first-pass DSP triple over PCM frames.
  */
case class AudioFrame(doc_id: Long, frame_idx: Int, energy: Long, zcr: Long, peak: Int)

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata. IMAGE decode is REAL — PNG through
  * `javax.imageio` (pure JVM), see [[decodeImages]], oracle-checked via a
  * lossless closed-form pixel replay. Audio/video decode remains a
  * clearly-marked deterministic fake (no such codecs in this container);
  * everything Spark-side — schema, batch iteration via `mapPartitions`,
  * partitioning, result typing — is real and tested.
  *
  * 100 TB design: blobs never pass through a shuffle (metadata is extracted
  * per-partition at scan locality, then only the small typed columns move);
  * `mapPartitions` amortizes any per-batch decoder setup exactly like a
  * Pandas-UDF batch would, and the blob column is pruned from every plan that
  * doesn't touch it.
  */
object MultimodalOps {

  /** STUB decoder — deterministic fake standing in for a real image/audio
    * decode (no codec libraries in this container). Derives pseudo-metadata
    * from the blob bytes only, so tests are reproducible. The frame count is
    * deliberately a pure function of the byte length so the frame-sampling
    * operator is replayable in the DuckDB oracle (`octet_length` +
    * `generate_series`); width/height stay hash-derived.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.floorMod(h, 960)          // 64..1023 "pixels"
    val height = 64 + math.floorMod(h >> 10, 960)
    val frames = 1 + bytes.length % 64              // 1..64 "frames"
    (width, height, frames)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** documents.text encoded as a binary column — the stand-in media corpus
    * (real deployments read `binaryFile` / blob parquet the same way).
    */
  def mediaCorpus(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))

  /** Decode / feature-extract over the blob column. Per-partition batch
    * iteration (decoder init once per partition), typed output.
    */
  def extractMeta(s: SparkSession, d: String): Dataset[MediaMeta] = {
    import s.implicits._
    mediaCorpus(s, d).select(col("doc_id").as[Long], col("blob").as[Array[Byte]])
      .mapPartitions { it =>
        // decoder/session init would happen here, once per partition
        it.map { case (id, blob) =>
          val (w, h, f) = fakeDecode(blob)
          MediaMeta(id, blob.length, w, h, f, md5Hex(blob))
        }
      }
  }

  /** Resize stub over ARBITRARY blobs: plumbing-real (binary in → binary
    * out), decode/re-encode faked as a truncation. The REAL image path —
    * decode, nearest-neighbor resample, re-encode, verify — is
    * [[resizeImagesDf]] (oracled as `m_resize`); this stub remains only
    * for media types with no in-container codec (audio/video).
    */
  def resize(ds: Dataset[(Long, Array[Byte])], maxBytes: Int): Dataset[(Long, Array[Byte])] = {
    implicit val enc = ds.encoder
    ds.mapPartitions(_.map { case (id, blob) => (id, blob.take(maxBytes)) })
  }

  /** Frame-sampling stub: every `stride`-th frame index of the fake-decoded
    * frame count, with a per-frame hash (real impl: decoded frame bytes).
    * The hash is md5 over `blob ++ ":" ++ idx` — byte-identical to DuckDB's
    * `md5(text || ':' || i)`, which makes the whole operator oracle-checkable.
    */
  def sampleFrames(s: SparkSession, d: String, stride: Int = 8): Dataset[FrameRef] = {
    import s.implicits._
    mediaCorpus(s, d).select(col("doc_id").as[Long], col("blob").as[Array[Byte]])
      .flatMap { case (id, blob) =>
        val (_, _, frames) = fakeDecode(blob)
        (0 until frames by stride).map(i => FrameRef(id, i,
          md5Hex(blob ++ s":$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      }
  }

  /** DuckDB replay of [[sampleFrames]] (stride 8): frame count from byte
    * length, frame indices from a lateral generate_series, hash from the
    * same UTF-8 byte stream.
    */
  val frameSampleSql: String =
    """WITH f AS (
      |  SELECT doc_id, text, 1 + (octet_length(encode(text)) % 64) AS n_frames
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, text,
      |         unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 8)) AS i
      |  FROM f
      |)
      |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
      |       md5(text || ':' || CAST(i AS VARCHAR)) AS frame_hash
      |FROM s ORDER BY doc_id, frame_idx""".stripMargin

  /** PCM frame length for [[audioFeatures]] (samples per analysis frame). */
  val FrameLen = 64

  /** Audio feature extraction over the blob column: 8-bit PCM → per-frame
    * energy (Σs²), zero-crossing count, and peak amplitude — the classic
    * first-pass DSP triple (frame windowing exactly as librosa/torchaudio
    * frame it). The DECODER is a clearly-marked deterministic fake (no
    * audio codecs in this container): the "PCM stream" is an LCG synth
    * keyed by (doc_id, sample index) with the blob supplying only the
    * sample count, which is what makes the whole operator replayable in
    * the DuckDB oracle. Everything Spark-side is real and is exactly what
    * a real decoder drops into: binary column in, per-partition batch
    * iteration (decoder init once per partition), tight integer loop per
    * frame, typed columnar output. Only FULL frames are emitted (tail
    * samples dropped, the standard hop convention).
    *
    * 100 TB: blobs never shuffle — features are extracted at scan
    * locality and only (doc_id, frame_idx, 3 ints) move. Frame count per
    * task is bounded by input split size, so no skew beyond the scan's.
    */
  def audioFeatures(s: SparkSession, d: String): Dataset[AudioFrame] = {
    import s.implicits._
    mediaCorpus(s, d).select(col("doc_id").as[Long], col("blob").as[Array[Byte]])
      .mapPartitions { it =>
        // real impl: open codec/DSP context here, once per partition
        it.flatMap { case (id, blob) =>
          if (blob == null) Iterator.empty
          else {
            val base = (id % 65536L) * 1103L
            (0 until blob.length / FrameLen).iterator.map { fi =>
              var energy = 0L; var zcr = 0L; var peak = 0
              var prev = 0; var j = 0
              while (j < FrameLen) {
                val i = fi * FrameLen + j
                val smp = (((base + i * 12345L) % 256L) - 128L).toInt
                energy += smp.toLong * smp
                if (j > 0 && prev * smp < 0) zcr += 1
                if (math.abs(smp) > peak) peak = math.abs(smp)
                prev = smp; j += 1
              }
              AudioFrame(id, fi, energy, zcr, peak)
            }
          }
        }
      }
  }

  def audioFeaturesDf(s: SparkSession, d: String): DataFrame =
    audioFeatures(s, d).toDF().orderBy("doc_id", "frame_idx")

  /** DuckDB replay of [[audioFeatures]]: sample count from the UTF-8 byte
    * length, samples from the same integer LCG, frames from a lateral
    * generate_series, the zero-crossing lead() scoped per frame.
    */
  val audioFeaturesSql: String =
    s"""WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents
       |           WHERE text IS NOT NULL),
       |f AS (SELECT doc_id, unnest(generate_series(0, n // $FrameLen - 1)) AS fi
       |      FROM d WHERE n >= $FrameLen),
       |s AS (SELECT doc_id, fi,
       |        unnest(generate_series(fi * $FrameLen, fi * $FrameLen + ${FrameLen - 1})) AS i
       |      FROM f),
       |v AS (SELECT doc_id, fi, i,
       |        ((doc_id % 65536) * 1103 + i * 12345) % 256 - 128 AS smp FROM s),
       |w AS (SELECT doc_id, fi, smp,
       |        lead(smp) OVER (PARTITION BY doc_id, fi ORDER BY i) AS nxt FROM v)
       |SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
       |  CAST(sum(smp * smp) AS BIGINT) AS energy,
       |  CAST(sum(CASE WHEN nxt IS NOT NULL AND smp * nxt < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zcr,
       |  CAST(max(abs(smp)) AS INTEGER) AS peak
       |FROM w GROUP BY doc_id, fi ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- real
  // image decode: PNG via javax.imageio — pure JVM, no native codecs needed.
  // The corpus is generated deterministically per doc (dimensions and a
  // gray value that are closed-form functions of doc_id/x/y), encoded to
  // REAL PNG bytes, then decoded back through ImageIO.read. Because PNG is
  // lossless, the decoded raster equals the generated pixels — so a DuckDB
  // replay of the closed form matches ONLY if the decode actually ran
  // correctly (dimension extraction + full raster read), which makes the
  // decoder itself oracle-checkable without shipping binary fixtures.

  /** Deterministic per-doc image dims: 8..16 × 8..14 — small enough that
    * the oracle's generate_series replay stays cheap, varied enough that a
    * hardcoded-dimension bug fails the hash.
    */
  private[graft] def dims(docId: Long): (Int, Int) =
    ((8 + docId % 9).toInt, (8 + (docId * 3) % 7).toInt)

  /** Deterministic gray value at (x, y). */
  private[graft] def gray(docId: Long, x: Int, y: Int): Int =
    ((docId * 7 + x * 31 + y * 17) % 256).toInt

  /** doc_id + real PNG bytes (8-bit grayscale, losslessly roundtrippable).
    * One PNG writer per PARTITION (plugin lookup amortized) and an
    * in-memory image output stream: `ImageIO.write`'s default path spools
    * every image through a temp-file cache, which dominates small-image
    * encode time.
    */
  def pngCorpus(s: SparkSession, d: String): Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id").as[Long]).mapPartitions { it =>
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      it.map { id =>
        val (w, h) = dims(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, gray(id, x, y)); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(img)
        ios.close()
        (id, bos.toByteArray)
      }
    }
  }

  /** REAL decode over the PNG blob column: `ImageIO.read` per blob
    * (per-partition batch iteration — decoder plugin lookup amortized),
    * dimensions from the decoded header, checksum from the decoded raster.
    * Every pixel is weighted by its position (1 + x + w·y) so transposed,
    * truncated, or re-ordered rasters fail the oracle hash.
    */
  def decodeImages(s: SparkSession, d: String): Dataset[DecodedImage] = {
    import s.implicits._
    pngCorpus(s, d).mapPartitions { it =>
      // one reader per partition + in-memory input stream: ImageIO.read's
      // per-call plugin scan and temp-file cache dominate small-image decode
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      it.map { case (id, blob) =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(blob))
        reader.setInput(iis, true, true)
        val img = reader.read(0)
        iis.close()
        require(img != null, s"not a decodable image: doc $id")
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sum += raster.getSample(x, y, 0).toLong * (1 + x + w * y)
            x += 1
          }
          y += 1
        }
        DecodedImage(id, w, h, sum)
      }
    }
  }

  def decodeImagesDf(s: SparkSession, d: String): DataFrame =
    decodeImages(s, d).toDF().orderBy("doc_id")

  /** DuckDB replay of [[decodeImagesDf]]: same dims, same gray closed form,
    * same position weights — over generate_series instead of a decoded
    * raster. Integer arithmetic end to end (no float parity traps).
    */
  val decodeSql: String =
    """WITH dims AS (
      |  SELECT doc_id,
      |         CAST(8 + (doc_id % 9) AS BIGINT) AS w,
      |         CAST(8 + ((doc_id * 3) % 7) AS BIGINT) AS h
      |  FROM documents
      |), px AS (
      |  SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS p
      |  FROM dims
      |)
      |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |       CAST(SUM(((doc_id * 7 + (p % w) * 31 + (p // w) * 17) % 256)
      |                * (1 + p)) AS BIGINT) AS px_checksum
      |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  /** REAL image resize — the full production roundtrip, not a truncation
    * stub: decode the PNG, nearest-neighbor resample to half dimensions
    * (explicit raster loops with floor source mapping — no Graphics2D
    * interpolation ambiguity), RE-ENCODE to PNG, decode the re-encoded
    * bytes, and checksum the final raster. Because every step is exact
    * integer arithmetic and PNG is lossless, the DuckDB closed-form replay
    * (`resizeSql`) matches ONLY if decode → resample → encode → decode all
    * ran correctly. Per-partition codec reuse as in [[decodeImages]].
    */
  def resizeImagesDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pngCorpus(s, d).mapPartitions { it =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      def decode(blob: Array[Byte]): java.awt.image.BufferedImage = {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(blob))
        reader.setInput(iis, true, true)
        val img = reader.read(0)
        iis.close()
        img
      }
      it.map { case (id, blob) =>
        val src = decode(blob)
        val (w, h) = (src.getWidth, src.getHeight)
        val (rw, rh) = (math.max(4, w / 2), math.max(4, h / 2))
        val out = new java.awt.image.BufferedImage(
          rw, rh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val sr = src.getRaster
        val or = out.getRaster
        var y = 0
        while (y < rh) {
          var x = 0
          while (x < rw) {
            or.setSample(x, y, 0, sr.getSample(x * w / rw, y * h / rh, 0))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(out)
        ios.close()
        val round = decode(bos.toByteArray) // prove the re-encoded bytes decode
        var sum = 0L
        var yy = 0
        while (yy < rh) {
          var xx = 0
          while (xx < rw) {
            sum += round.getRaster.getSample(xx, yy, 0).toLong * (1 + xx + rw * yy)
            xx += 1
          }
          yy += 1
        }
        DecodedImage(id, rw, rh, sum)
      }
    }.toDF().orderBy("doc_id")
  }

  /** DuckDB replay of [[resizeImagesDf]]: nearest-neighbor source mapping
    * `sx = x'·w / rw` (floor) over the generated gray closed form.
    */
  val resizeSql: String =
    """WITH dims AS (
      |  SELECT doc_id,
      |         CAST(8 + (doc_id % 9) AS BIGINT) AS w,
      |         CAST(8 + ((doc_id * 3) % 7) AS BIGINT) AS h
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, w, h,
      |         greatest(4, w // 2) AS rw, greatest(4, h // 2) AS rh
      |  FROM dims
      |), px AS (
      |  SELECT doc_id, w, h, rw, rh, unnest(generate_series(0, rw * rh - 1)) AS p
      |  FROM r
      |)
      |SELECT doc_id, CAST(rw AS INTEGER) AS width, CAST(rh AS INTEGER) AS height,
      |       CAST(SUM(((doc_id * 7 + ((p % rw) * w // rw) * 31
      |                 + ((p // rw) * h // rh) * 17) % 256) * (1 + p)) AS BIGINT) AS px_checksum
      |FROM px GROUP BY doc_id, rw, rh ORDER BY doc_id""".stripMargin

  /** Per-image feature vector read from the decoded raster. Integer-exact
    * end to end (pixel sum + count instead of a float mean; 4-bin intensity
    * histogram) so the oracle has no float-parity traps.
    */
  case class ImageFeatures(doc_id: Long, n_px: Int, px_sum: Long,
      h0: Int, h1: Int, h2: Int, h3: Int)

  /** REAL feature extraction over the decoded raster — the third member of
    * the decode / resize / feature-extract trio: pixel count, exact
    * intensity sum (the mean as an exact ratio), and a 4-bin histogram
    * (bins of 64). Per-partition decoder reuse as in [[decodeImages]];
    * oracle replays the closed-form pixels, so a decode or binning bug
    * fails the hash.
    */
  def imageFeaturesDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pngCorpus(s, d).mapPartitions { it =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      it.map { case (id, blob) =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(blob))
        reader.setInput(iis, true, true)
        val img = reader.read(0)
        iis.close()
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var sum = 0L
        val bins = new Array[Int](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            sum += v
            bins(v / 64) += 1
            x += 1
          }
          y += 1
        }
        ImageFeatures(id, w * h, sum, bins(0), bins(1), bins(2), bins(3))
      }
    }.toDF().orderBy("doc_id")
  }

  /** DuckDB replay of [[imageFeaturesDf]] over the gray closed form. */
  val imageFeaturesSql: String =
    """WITH dims AS (
      |  SELECT doc_id,
      |         CAST(8 + (doc_id % 9) AS BIGINT) AS w,
      |         CAST(8 + ((doc_id * 3) % 7) AS BIGINT) AS h
      |  FROM documents
      |), px AS (
      |  SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS p
      |  FROM dims
      |), v AS (
      |  SELECT doc_id, w, h,
      |         (doc_id * 7 + (p % w) * 31 + (p // w) * 17) % 256 AS g
      |  FROM px
      |)
      |SELECT doc_id, CAST(w * h AS INTEGER) AS n_px,
      |       CAST(SUM(g) AS BIGINT) AS px_sum,
      |       CAST(count(*) FILTER (WHERE g < 64) AS INTEGER) AS h0,
      |       CAST(count(*) FILTER (WHERE g >= 64 AND g < 128) AS INTEGER) AS h1,
      |       CAST(count(*) FILTER (WHERE g >= 128 AND g < 192) AS INTEGER) AS h2,
      |       CAST(count(*) FILTER (WHERE g >= 192) AS INTEGER) AS h3
      |FROM v GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  /** The oracle-checkable slice of the multimodal surface: byte length and
    * content hash of the blob (pure SQL in both engines; the fake decode
    * stays out of the oracle on purpose).
    */
  def binaryMetaDf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        length(encode(col("text"), "UTF-8")).as("byte_len"),
        md5(encode(col("text"), "UTF-8")).as("content_hash"))
      .orderBy("doc_id")
  val binaryMetaSql: String =
    """SELECT doc_id, octet_length(encode(text)) AS byte_len, md5(text) AS content_hash
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Image near-duplicate detection via average-hash (aHash) with banded
    * Hamming blocking — the visual-dedup pass a multimodal training
    * pipeline runs after exact-byte dedup:
    *
    *  1. REAL decode of each PNG, 8×8 nearest-neighbor downsample off the
    *     decoded raster (floor source mapping, integer-exact — the same
    *     resample contract as [[resizeImagesDf]]);
    *  2. the 64 aHash bits: pixel ≥ raster mean, compared as
    *     `64·gray ≥ Σgray` so no division ever happens;
    *  3. the 64-bit signature split into four 16-bit BANDS — by pigeonhole
    *     any pair within Hamming distance 3 shares at least one intact
    *     band, so equality on (band_idx, band_value) is a lossless
    *     blocking key for the ≤ 2 threshold used here (the same
    *     band-join shape as MinHash-LSH, in Hamming space);
    *  4. exact Hamming distance on candidates via `bit_count(a ^ b)`,
    *     threshold filter.
    *
    * At 100 TB of images nothing here is all-pairs: the shuffle keys are
    * (band, value) buckets, per-bucket fan-out is the collision count, and
    * the signature table is 4 longs per image. The oracle replays decode +
    * resample + hash in closed form over `generate_series` — it matches
    * only if the real decode/resample pipeline is exact.
    */
  val AHashMaxHamming = 2

  def ahashBands(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val grays = pngCorpus(s, d).mapPartitions { it =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      it.map { case (id, blob) =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(blob))
        reader.setInput(iis, true, true)
        val img = reader.read(0)
        iis.close()
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val g = new Array[Int](64)
        var p = 0
        while (p < 64) {
          g(p) = raster.getSample((p % 8) * w / 8, (p / 8) * h / 8, 0)
          p += 1
        }
        (id, g)
      }
    }.toDF("doc_id", "g")
    val bandCols = (0 until 4).map(i =>
      expr(s"aggregate(zip_with(slice(g, ${i * 16 + 1}, 16), " +
        s"sequence(0, 15), (x, j) -> CASE WHEN 64 * x >= s THEN shiftleft(1L, j) ELSE 0L END), " +
        "0L, (acc, v) -> acc + v)").as(s"b$i"))
    grays
      .withColumn("s", expr("aggregate(g, 0L, (acc, x) -> acc + x)"))
      .select(col("doc_id") +: bandCols: _*)
  }

  def ahashNearDup(s: SparkSession, d: String): DataFrame = {
    val wide = ahashBands(s, d).localCheckpoint(true) // feeds bands + 2 rerank sides
    val bands = wide.select(col("doc_id"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"), col(s"b$i").as("bv"))): _*)).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bv"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val wa = wide.select(col("doc_id").as("da"),
      col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val wb = wide.select(col("doc_id").as("db"),
      col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    cand.join(wa, col("doc_a") === col("da")).join(wb, col("doc_b") === col("db"))
      .withColumn("hamming",
        expr("bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + bit_count(a2 ^ c2) + bit_count(a3 ^ c3)")
          .cast("long"))
      .filter(col("hamming") <= AHashMaxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("hamming", "doc_a", "doc_b")
  }

  val ahashNearDupSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id, CAST(8 + (doc_id % 9) AS BIGINT) AS w,
       |         CAST(8 + ((doc_id * 3) % 7) AS BIGINT) AS h
       |  FROM documents
       |), px AS (
       |  SELECT doc_id, w, h, unnest(generate_series(0, 63)) AS p FROM dims
       |), g AS (
       |  SELECT doc_id, p,
       |    ((doc_id * 7 + ((p % 8) * w // 8) * 31 + ((p // 8) * h // 8) * 17) % 256) AS gray
       |  FROM px
       |), m AS (SELECT doc_id, sum(gray) AS s FROM g GROUP BY 1),
       |bits AS (
       |  SELECT g.doc_id, p, CASE WHEN 64 * gray >= s THEN 1 ELSE 0 END AS b
       |  FROM g JOIN m ON g.doc_id = m.doc_id
       |), bands AS (
       |  SELECT doc_id, p // 16 AS band, CAST(sum(b * (1 << (p % 16))) AS BIGINT) AS bv
       |  FROM bits GROUP BY 1, 2
       |), wide AS (
       |  SELECT doc_id,
       |    max(CASE WHEN band = 0 THEN bv END) AS b0,
       |    max(CASE WHEN band = 1 THEN bv END) AS b1,
       |    max(CASE WHEN band = 2 THEN bv END) AS b2,
       |    max(CASE WHEN band = 3 THEN bv END) AS b3
       |  FROM bands GROUP BY 1
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b,
       |  CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
       |     + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3)) AS BIGINT) AS hamming
       |FROM cand
       |JOIN wide wa ON doc_a = wa.doc_id
       |JOIN wide wb ON doc_b = wb.doc_id
       |WHERE bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
       |    + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3)) <= $AHashMaxHamming
       |ORDER BY hamming, doc_a, doc_b""".stripMargin
}
