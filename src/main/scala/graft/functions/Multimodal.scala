package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake ([[FakeCodec]]) — but the Spark-side
  * plumbing is real: schema, `Dataset[MediaFile]` encoders, per-partition
  * batched decode via `mapPartitions` (the Scala analog of
  * `mapInPandas` — one decoder instance per partition, streamed batches,
  * no collect), and partition sizing by byte budget for 100 TB media sets.
  */
object Multimodal {

  /** A media object: opaque payload + typed metadata. */
  case class MediaFile(media_id: Long, kind: String, content: Array[Byte])

  /** Decoded metadata (what a real codec would surface). */
  case class MediaMeta(media_id: Long, kind: String, byte_len: Long,
                       width: Int, height: Int, n_frames: Int, content_md5: String)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** STUB CODEC — the real implementation would link an image/audio
    * library here; this fake derives metadata deterministically from the
    * byte length so tests and oracles are stable. */
  object FakeCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length.toLong
      (64 + (n % 512).toInt, 64 + ((n * 7) % 512).toInt, 1 + (n % 30).toInt)
    }
  }

  /** Batched per-partition decode — the `mapInPandas` shape in Scala: one
    * codec per partition, iterator in / iterator out, constant memory. */
  def decodeMeta(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { f =>
        val (w, h, fr) = FakeCodec.decode(f.content)
        val md5hex = digest.digest(f.content).map("%02x".format(_)).mkString
        digest.reset()
        MediaMeta(f.media_id, f.kind, f.content.length.toLong, w, h, fr, md5hex)
      }
    }
  }

  /** Frame-sampling stub: every `stride`-th 16-byte window of the payload
    * (a real video path would emit decoded frames; the slicing/batching
    * plumbing is the part under test). */
  def sampleFrames(files: Dataset[MediaFile], stride: Int): DataFrame = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      f.content.grouped(16).zipWithIndex.collect {
        case (win, i) if i % stride == 0 => (f.media_id, i, win)
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Feature extraction — a REAL computation, no codec needed: 16-bin
    * byte histogram of the payload (the classic cheap content signature;
    * a production path would swap in CLIP/CNN embeddings behind the same
    * mapPartitions shape). Output: (media_id, features: Array[Long](16)). */
  def byteHistogram(files: Dataset[MediaFile]): DataFrame = {
    import files.sparkSession.implicits._
    // mapPartitions like decodeMeta: a real extractor (CLIP/CNN) is
    // instantiated ONCE per partition here, not once per record
    files.mapPartitions { it =>
      it.map { f =>
        val bins = new Array[Long](16)
        f.content.foreach(b => bins((b & 0xff) % 16) += 1)
        (f.media_id, bins.toSeq)
      }
    }.toDF("media_id", "features")
  }

  /** Frame-level energy extraction — REAL windowed byte math, no codec
    * needed (the audio analog of [[sampleFrames]]: per `frameLen`-byte
    * frame, the sum of squared sample values — what a loudness/silence
    * detector computes over PCM). Integer arithmetic end-to-end so a SQL
    * oracle reproduces it exactly. Output: (media_id, frame_no, energy).
    * Same once-per-partition mapPartitions shape as [[byteHistogram]]. */
  def frameEnergy(files: Dataset[MediaFile], frameLen: Int): DataFrame = {
    require(frameLen >= 1, s"frame length must be >= 1, got $frameLen")
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.flatMap { f =>
        f.content.grouped(frameLen).zipWithIndex.map { case (win, i) =>
          var e = 0L
          win.foreach { b => val v = (b & 0xff).toLong; e += v * v }
          (f.media_id, i, e)
        }
      }
    }.toDF("media_id", "frame_no", "energy")
  }

  /** Frame-level autocorrelation at small lags — the
    * periodicity/pitch-detection primitive of an audio pipeline (lag-L
    * autocorrelation peaks where the signal repeats every L samples),
    * REAL windowed byte math like [[frameEnergy]]: per `frameLen`-byte
    * frame and lag, `sum(x[i] * x[i+L])` over unsigned sample values.
    * Integer arithmetic end-to-end so a SQL oracle reproduces it
    * exactly; frames shorter than the lag score 0. Output:
    * (media_id, frame_no, lag, ac). */
  def frameAutocorr(files: Dataset[MediaFile], frameLen: Int, lags: Seq[Int]): DataFrame = {
    require(frameLen >= 1, s"frame length must be >= 1, got $frameLen")
    require(lags.nonEmpty && lags.forall(_ >= 1), s"lags must be >= 1, got $lags")
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.flatMap { f =>
        f.content.grouped(frameLen).zipWithIndex.flatMap { case (win, i) =>
          lags.map { lag =>
            var ac = 0L
            var j = 0
            val m = win.length - lag
            while (j < m) {
              ac += (win(j) & 0xff).toLong * (win(j + lag) & 0xff)
              j += 1
            }
            (f.media_id, i, lag, ac)
          }
        }
      }
    }.toDF("media_id", "frame_no", "lag", "ac")
  }

  /** RESIZE STUB — a real implementation would decode, scale, re-encode;
    * the fake deterministically re-derives target metadata and truncates
    * the payload proportionally, so the pipeline shape (payload in,
    * smaller payload + new dims out) is real and testable. */
  def resizeStub(files: Dataset[MediaFile], targetWidth: Int): Dataset[MediaFile] = {
    import files.sparkSession.implicits._
    files.map { f =>
      val (w, _, _) = FakeCodec.decode(f.content)
      val scale = math.min(1.0, targetWidth.toDouble / math.max(1, w))
      val newLen = math.max(1, (f.content.length * scale).toInt)
      MediaFile(f.media_id, f.kind, f.content.take(newLen))
    }
  }

  /** Documents → media table (text payload as utf-8 binary) — the
    * fixture adapter: `/root/testdata` has no binary column, so the text
    * bytes stand in for the opaque payload. */
  def documentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"), lit("text").as("kind"),
      encode(col("text"), "utf-8").as("content"))

  /** Column-only metadata extraction (oracle-checkable twin of
    * [[decodeMeta]] for the fixture adapter). */
  def mediaMetaColumns(docs: DataFrame): DataFrame = {
    val len = octet_length(col("text")).cast("long")
    docs.select(col("doc_id").as("media_id"), len.as("byte_len"),
      (lit(64) + len % 512).cast("long").as("width"),
      (lit(64) + (len * 7) % 512).cast("long").as("height"),
      (lit(1) + len % 30).cast("long").as("n_frames"),
      md5(encode(col("text"), "utf-8")).as("content_md5"))
  }
}
