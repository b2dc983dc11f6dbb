package graft.operators

import graft.Tables._
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star mandate, BASELINE.json):
  * image/audio/video payloads are opaque `binary` columns with typed
  * metadata; decode / feature-extract / frame-sample run partition-wise
  * in batches. The reference (`/root/reference/README.md:1-2`) contains
  * no code; this surface is derived per SURVEY.md §0/§2.K.
  *
  * No binary fixture exists (SURVEY.md §7.5), so the payload is the
  * UTF-8 encoding of `documents.text` — the Spark-side plumbing
  * (BinaryType schema, metadata struct, partition-wise batched
  * processing, batch shape) is real and tested. The generic
  * feature/frame paths keep a clearly-marked deterministic STUB where
  * an image/video codec would sit; the WAV path (`mm_wav_meta`, r5)
  * is fully real — canonical PCM bytes synthesized per doc and
  * decoded back by WavDecoder's genuine RIFF chunk walk.
  *
  * Scale notes (100 TB): binary payloads never enter a shuffle — the
  * metadata path is a narrow projection, and the feature extraction is
  * mapPartitions with bounded batch buffers (the exact shape a GPU/codec
  * inference stage needs: fixed batch size, one model/codec init per
  * partition, streaming iterator in and out).
  */
object MultimodalQueries {

  /** Feature row emitted by the stubbed decoder. */
  final case class MmFeature(doc_id: Long, n_bytes: Long, batch_len: Long,
                             feat_sum: Long, feat_head: Long)

  /** STUB decode: stands in for an image/audio decoder (the real codec
    * libraries are not in this container). Deterministic byte-level
    * "features" keep the pipeline testable; a real implementation swaps
    * only this function, the batching around it is production-shaped.
    */
  private def decodeStub(payload: Array[Byte]): (Long, Long) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    val head = payload.take(8).foldLeft(0L)((acc, b) => acc * 256 + (b & 0xff))
    (sum, head)
  }

  /** STUB frame sampling: stands in for video frame extraction —
    * deterministic every-k-th 16-byte window as a "frame", hashed.
    * Real decoder would replace the window arithmetic only.
    */
  private def sampleFrames(payload: Array[Byte],
                           stride: Int): Seq[(Int, Long)] = {
    val frames = Seq.newBuilder[(Int, Long)]
    var idx = 0
    var off = 0
    while (off + 16 <= payload.length) {
      var h = 1125899906842597L // FNV-ish deterministic window hash
      var i = off
      while (i < off + 16) { h = h * 31 + (payload(i) & 0xff); i += 1 }
      frames += ((idx, h))
      idx += 1
      off += stride
    }
    frames.result()
  }

  val queries: Map[String, Q] = Map(
    // Typed-metadata path: binary payload + struct metadata, flattened
    // for output. Oracle-paired on the byte-accurate metadata.
    "mm_binary_meta" -> ((s, d) =>
      documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("meta", struct(
          // fake modality tag — deterministic routing key of the kind a
          // real multimodal table carries
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("modality"),
          length(col("payload")).cast("long").as("n_bytes"),
          col("lang").as("src_lang")))
        .select(col("doc_id"), col("meta.modality").as("modality"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.src_lang").as("src_lang"))
        .orderBy(col("doc_id"))),

    // REAL (non-stub) statistical feature extraction over the payload:
    // byte count, distinct bytes, printable ratio (basis points),
    // repeat mass (Σ count² — exact-integer Simpson diversity), and
    // Shannon entropy in milli-bits. Entropy/printability are the
    // actual junk-filter signals multimodal corpora gate on (random
    // bytes ≈ 8 bits/byte, text ≈ 4), and none of it needs a codec —
    // this is the part of "decode" that is genuinely computable here.
    // Entropy is an ORDERED fold over char-sorted counts, so the
    // double result is bit-identical to the DuckDB oracle's
    // list_reduce (same proof as sim_search_topk). Payload is ASCII
    // (verified: octet_length == char count fixture-wide), so chars
    // are bytes.
    "mm_byte_stats" -> ((s, d) =>
      documents(s, d)
        .withColumn("chs", split(col("text"), ""))
        .withColumn("n", size(col("chs")).cast("double"))
        .withColumn("counts", expr(
          "transform(array_sort(array_distinct(chs)), " +
            "c -> cast(size(filter(chs, x -> x = c)) AS double))"))
        .select(col("doc_id"),
          size(col("chs")).cast("long").as("n_bytes"),
          expr("size(array_distinct(chs))").cast("long").as("n_distinct"),
          expr("size(filter(chs, c -> ascii(c) BETWEEN 32 AND 126)) " +
            "* 10000 div size(chs)").as("printable_bp"),
          expr("aggregate(transform(counts, c -> cast(c * c as bigint)), " +
            "0L, (a, x) -> a + x)").as("sum_sq"),
          expr("cast(round(aggregate(counts, cast(0 as double), " +
            "(acc, c) -> acc - (c / n) * log2(c / n)) * 1000) as bigint)")
            .as("entropy_mbits"))
        .orderBy(col("doc_id"))),

    // Batched partition-wise feature extraction over the binary column:
    // fixed batch size 32, decoder "initialized" once per partition,
    // iterator in / iterator out (no materialization of the partition).
    // N-operator (rows-only + unit tests on batch shape/determinism).
    "mm_feature_extract" -> ((s, d) => {
      val ss = s
      import ss.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          // one decoder init per partition would go here (STUB)
          rows.grouped(32).flatMap { batch =>
            val bl = batch.length.toLong
            batch.iterator.map { case (id, payload) =>
              val (fsum, fhead) = decodeStub(payload)
              MmFeature(id, payload.length.toLong, bl, fsum, fhead)
            }
          }
        }
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // REAL format decode through the batched plumbing (r5): each doc's
    // text bytes become 16-bit PCM samples in a canonical WAV container
    // (WavDecoder.synthesize — real RIFF bytes, rate/channels keyed off
    // doc_id), and the REAL chunk-walking parser (WavDecoder.parse)
    // recovers the audio metadata from those bytes — no stub anywhere
    // on this path. Integer-only outputs make the operator
    // oracle-pairable: the oracle mirrors the synthesis arithmetic
    // (n_samples = payload bytes div channels, duration in µs by
    // integer division), so a parser that misread any header field
    // hash-mismatches immediately. Scale shape: narrow
    // mapPartitions, binary never shuffles, one decoder init per
    // partition.
    "mm_wav_meta" -> ((s, d) => {
      val ss = s
      import ss.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          rows.grouped(32).flatMap { batch =>
            batch.iterator.map { case (id, payload) =>
              val sr = (8000L * (1 + id % 3)).toInt
              val ch = (1 + id % 2).toInt
              val samples =
                payload.map(b => (((b & 0xff) - 128) << 8).toShort)
              val m = WavDecoder.parse(
                WavDecoder.synthesize(sr, ch, samples)).get
              (id, m.audioFormat.toLong, m.nChannels.toLong, m.sampleRate,
                m.bitsPerSample.toLong, m.nSamples,
                m.nSamples * 1000000L / m.sampleRate)
            }
          }
        }
        .toDF("doc_id", "audio_format", "n_channels", "sample_rate",
          "bits_per_sample", "n_samples", "duration_us")
        .orderBy(col("doc_id"))
    }),

    // Frame-sampling path: one output row per sampled "frame" (stride
    // 64 bytes), generator-style fan-out from the binary column. The
    // per-doc frame count is payload-proportional, the plumbing
    // (iterator-in/iterator-out, no partition materialization) is what
    // a real video sampler needs. N-operator (unit + rows-only).
    "mm_frame_sample" -> ((s, d) => {
      val ss = s
      import ss.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          rows.flatMap { case (id, payload) =>
            sampleFrames(payload, 64).iterator
              .map { case (idx, h) => (id, idx, h) }
          }
        }
        .toDF("doc_id", "frame_idx", "frame_hash")
        .orderBy(col("doc_id"), col("frame_idx"))
    })
  )

  val oracle: Map[String, String] = Map(
    // Mirrors the synthesis arithmetic, not the parser: payload is the
    // ASCII text (octet_length == n_chars fixture-wide), one 16-bit
    // sample per byte, frames = samples div channels, duration by
    // integer µs division — any parser misread of the real WAV bytes
    // breaks the hash match.
    "mm_wav_meta" ->
      """SELECT doc_id,
        |  CAST(1 AS BIGINT) AS audio_format,
        |  CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
        |  CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
        |  CAST(16 AS BIGINT) AS bits_per_sample,
        |  CAST(octet_length(encode(text)) // (1 + doc_id % 2) AS BIGINT) AS n_samples,
        |  CAST((octet_length(encode(text)) // (1 + doc_id % 2)) * 1000000
        |    // (8000 * (1 + doc_id % 3)) AS BIGINT) AS duration_us
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_byte_stats" ->
      """WITH b AS (
        |  SELECT doc_id, string_split_regex(text, '') AS chs FROM documents
        |), c AS (
        |  SELECT doc_id, chs, CAST(len(chs) AS DOUBLE) AS n,
        |    list_transform(list_sort(list_distinct(chs)),
        |      ch -> CAST(len(list_filter(chs, x -> x = ch)) AS DOUBLE)) AS counts
        |  FROM b
        |)
        |SELECT doc_id,
        |  CAST(len(chs) AS BIGINT) AS n_bytes,
        |  CAST(len(list_distinct(chs)) AS BIGINT) AS n_distinct,
        |  CAST(len(list_filter(chs, ch -> ascii(ch) BETWEEN 32 AND 126)) * 10000 // len(chs) AS BIGINT) AS printable_bp,
        |  CAST(list_reduce(list_transform(counts, x -> CAST(x * x AS BIGINT)), (a, b) -> a + b) AS BIGINT) AS sum_sq,
        |  CAST(round(list_reduce(list_transform(counts, x -> -(x / n) * log2(x / n)), (a, b) -> a + b) * 1000) AS BIGINT) AS entropy_mbits
        |FROM c ORDER BY doc_id""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS modality,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  lang AS src_lang
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
