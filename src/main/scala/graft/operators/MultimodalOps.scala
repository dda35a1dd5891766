package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed metadata extracted from an opaque media blob. */
case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
                     n_frames: Int, content_hash: String)

/** A sampled frame reference (video frame-sampling output shape). */
case class FrameRef(doc_id: Long, frame_idx: Int, frame_hash: String)

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata. The decode step is a clearly-marked
  * deterministic FAKE (this container has no image/audio codecs — see the
  * builder brief); everything Spark-side — schema, batch iteration via
  * `mapPartitions`, partitioning, result typing — is real and tested.
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

  /** Resize stub: plumbing-real (binary in → binary out, metadata updated),
    * decode/re-encode faked as a truncation of the blob.
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
}
