package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star spec): media payloads ride as
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs per-partition so one task amortizes codec setup over
  * a whole batch of rows — the Spark-side shape you'd use with a real
  * image/audio codec on a 1000-executor cluster.
  *
  * The COMPRESSED-codec byte decoder is STUBBED (this container ships
  * no media libraries — JPEG, H.264): [[decodeStub]] derives
  * deterministic pseudo-features from the bytes; swap it for a real
  * codec without touching the pipeline shape. The uncompressed paths
  * are NOT stubs: [[WavCodec]] (RIFF/PCM16, chunk-walking parser) and
  * [[PpmCodec]] (netpbm P6, tokenizing header scanner) are real codecs
  * exercised end-to-end by multimodal_audio_meta / multimodal_image_meta.
  */
object BinaryFeatures {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Int, head_byte: Int, checksum: Long)

  /** STUB decoder — deterministic fake features in place of a real
    * image/audio decode; replace with the codec call in production.
    * The checksum folds mod 1e9+7 at each step (no 64-bit wraparound) so
    * plain SQL reproduces it for the oracle.
    */
  val CrcMod = 1000000007L
  def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    var crc = 0L
    var i = 0
    while (i < payload.length) { crc = (crc * 31 + (payload(i) & 0xff)) % CrcMod; i += 1 }
    (payload.length, if (payload.isEmpty) -1 else payload(0) & 0xff, crc)
  }

  /** Per-partition feature extraction over a binary payload column —
    * the mapPartitions boundary is where codec/model state would be
    * initialized once per task.
    */
  def extract(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // real pipeline: open codec / load model weights HERE, once.
      rows.map { r =>
        val (n, head, crc) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, n, head, crc)
      }
    }
  }

  case class FrameSample(doc_id: Long, frame_idx: Long, fr_bytes: Int, fr_crc: Long)

  /** Frame sampling over an opaque binary payload — the video-decode
    * shape: split the payload into fixed-size frames, keep every
    * `stride`-th one, emit per-frame metadata. The per-frame "decode"
    * is the same stubbed fold as [[decodeStub]]; a real build swaps in
    * the codec at the marked line and the pipeline shape (partitioning,
    * batch iteration, output schema) is unchanged.
    */
  def sampleFrames(media: Dataset[MediaRow], frameLen: Int, stride: Int): Dataset[FrameSample] = {
    implicit val enc = Encoders.product[FrameSample]
    media.mapPartitions { rows =>
      // real pipeline: open the demuxer/codec HERE, once per task.
      rows.flatMap { r =>
        val n = r.payload.length
        val nFrames = (n + frameLen - 1) / frameLen
        Iterator.range(0, nFrames).filter(_ % stride == 0).map { fi =>
          val start = fi * frameLen
          val end = math.min(start + frameLen, n)
          var crc = 0L
          var i = start
          while (i < end) { crc = (crc * 31 + (r.payload(i) & 0xff)) % CrcMod; i += 1 }
          FrameSample(r.doc_id, fi.toLong, end - start, crc)
        }
      }
    }
  }

  /** documents.text treated as an opaque binary payload. */
  def documentsAsMedia(docs: DataFrame): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    docs.select(col("doc_id"), col("text").cast("binary").as("payload")).as[MediaRow]
  }
}
