package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multimodal column handling (north-star scope, SURVEY.md §2.2 ⊕):
  * media as opaque `binary` columns with typed metadata structs, plus the
  * decode / feature-extract plumbing a media pipeline needs.
  *
  * STUB BOUNDARY: this container has no image/audio codecs, so the
  * decode step is a clearly-marked deterministic fake
  * ([[fakeDecodeFeatures]]) — real deployments swap in a codec behind
  * the same column contract (binary in → fixed-width feature struct
  * out). Everything around the stub — the schema (binary + metadata
  * struct), the batch shape (pure column expressions over partitioned
  * scans, no driver collect), and the downstream consumers — is real and
  * tested.
  *
  * Scale notes: binary payloads ride parquet as byte arrays; at 100 TB
  * the table is partitioned by media kind + date, metadata columns allow
  * pruning without touching payload bytes (columnar projection means a
  * metadata-only query never reads the blobs).
  */
/** Typed rows for the partition-batch decode path (top-level so the
  * product encoders resolve). */
final case class MediaPayload(doc_id: Long, payload: Array[Byte])
final case class ResizedMedia(doc_id: Long, n_bytes: Int,
    resized_bytes: Int, thumb_md5: String)

object Multimodal {

  /** Deterministic fake "decoder" — stands in for image/audio decode.
    * Real impl would be a vectorized UDF over the binary column.
    * md5-derived values (not crc32) so DuckDB can replay them. */
  private def fakeDecodeFeatures(bin: org.apache.spark.sql.Column) = {
    val h = conv(substring(md5(bin), 1, 8), 16, 10).cast("long")
    struct(
      octet_length(bin).as("n_bytes"),
      md5(bin).as("checksum"),
      (h % 256).cast("int").as("fake_width"),
      (h % 192).cast("int").as("fake_height"))
  }

  /** Documents re-cast as a multimodal table: text + binary payload +
    * typed metadata, with stubbed decode features and a metadata-only
    * projection (which never touches payload bytes). */
  def multimodalColumns(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("meta", struct(
        lit("text/plain").as("mime"),
        octet_length(col("payload")).as("n_bytes"),
        col("lang").as("lang")))
      .withColumn("features", fakeDecodeFeatures(col("payload")))
      .select(
        col("doc_id"),
        col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"),
        col("features.checksum").as("checksum"),
        col("features.fake_width").as("fake_width"),
        col("features.fake_height").as("fake_height"))
      .orderBy(col("doc_id"))

  /** "Resize" via the partition-batch UDF shape (`mapPartitions` over a
    * typed Dataset — the Scala analogue of `mapInPandas`): expensive
    * per-partition init (here a MessageDigest; in a real deployment the
    * codec/model load) happens once per partition, then a streaming map
    * over the rows. The stub "resize" truncates the payload to a 64-byte
    * thumbnail; a real impl swaps the body behind the same
    * binary-in → (dims, bytes, digest)-out contract. Fully
    * deterministic, so it IS oracle-able (fixture payloads are ASCII:
    * DuckDB's char ops see the same bytes). */
  def multimodalResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaPayload]
      .mapPartitions { it =>
        // per-partition init — the codec-load analogue
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { m =>
          val k = math.min(64, m.payload.length)
          val thumb = java.util.Arrays.copyOfRange(m.payload, 0, k)
          val hex = md.digest(thumb).map("%02x".format(_)).mkString
          ResizedMedia(m.doc_id, m.payload.length, k, hex)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame sampling: treat the binary payload as fixed-width 32-byte
    * frames, keep every 2nd frame, one output row per sampled frame.
    * Pure generator shape — sequence → explode → per-frame digest, all
    * codegen'd expressions; no UDF, no driver loop. At 100 TB the
    * explode fans out inside the scan stage (no shuffle) and the
    * per-frame rows flow straight into whatever consumer follows. */
  def multimodalFrameSample(s: SparkSession, d: String): DataFrame = {
    val payload = col("payload")
    val nFrames = ceil(octet_length(payload) / lit(32.0)).cast("long")
    val idxs = when(octet_length(payload) > lit(0),
      sequence(lit(0L), nFrames - 1, lit(2L)))
      .otherwise(array().cast("array<bigint>"))
    t(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"), payload,
        explode(idxs).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(payload.substr((col("frame_idx") * 32 + 1).cast("int"),
          lit(32))).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Binary content dedup — media dedup never decodes: identical
    * payload BYTES group on a 16-byte digest (the only dedup that makes
    * sense for opaque blobs; perceptual near-dup would sit behind the
    * decode stub). At 100 TB only digests shuffle; payloads stay in
    * their scan partitions. */
  def multimodalDedup(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .groupBy(md5(col("payload")).as("payload_md5"))
      .agg(min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_copies"),
        sum(octet_length(col("payload"))).as("total_bytes"))
      .select(col("doc_id"), col("payload_md5"), col("n_copies"),
        col("total_bytes"))
      .orderBy(col("doc_id"))

  /** Content-type sniffing from leading magic bytes — the first gate
    * of any multimodal ingest (extensions lie; bytes don't). The
    * fixture SYNTHESIZES payloads with real magic headers (PNG /
    * JPEG / PDF by doc_id mod 4, else bare text) so the sniffer's
    * byte-level inspection path — binary substring + hex compare,
    * all codegen'd — is exercised and the oracle can replay the
    * assignment rule. At scale this projection rides the binaryFile
    * scan (see source_binary_files) and routes payloads to per-type
    * decoders without reading beyond the first bytes. */
  def multimodalMagicSniff(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("payload",
        when(col("doc_id") % 4 === 0,
          concat(unhex(lit("89504E470D0A1A0A")), col("text").cast("binary")))
          .when(col("doc_id") % 4 === 1,
            concat(unhex(lit("FFD8FFE0")), col("text").cast("binary")))
          .when(col("doc_id") % 4 === 2,
            concat(unhex(lit("255044462D")), col("text").cast("binary")))
          .otherwise(col("text").cast("binary")))
      .select(col("doc_id"),
        when(hex(substring(col("payload"), 1, 8)) === "89504E470D0A1A0A",
          "image/png")
          .when(hex(substring(col("payload"), 1, 3)) === "FFD8FF",
            "image/jpeg")
          .when(hex(substring(col("payload"), 1, 5)) === "255044462D",
            "application/pdf")
          .otherwise("text/plain").as("sniffed_mime"),
        octet_length(col("payload")).as("n_bytes"))
      .orderBy(col("doc_id"))

  /** Fixed-size byte chunking — the page/tile splitter every multimodal
    * pipeline runs before per-chunk decode/encode (vision-doc page
    * tiles, audio windows): payload → ⌈n/64⌉ contiguous 64-byte chunks
    * with ordinal + digest, one explode inside the scan stage
    * (chunk_idx derives from sequence(), the bytes come from
    * substring — payloads never leave their partitions, and at 100 TB
    * each chunk row carries 64 bytes + a digest, not the whole blob). */
  def multimodalChunkBytes(s: SparkSession, d: String): DataFrame =
    chunkBytesOf(t(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload")))

  /** Chunking core over any (doc_id, payload binary) relation —
    * separated so the empty-payload edge is unit-testable. */
  def chunkBytesOf(docs: DataFrame): DataFrame = {
    val payload = col("payload")
    docs
      // empty payloads must yield ZERO chunks: without the filter,
      // sequence(0, -1) is a DESCENDING [0, -1] in Spark and would emit
      // two bogus rows where the DuckDB oracle's range(0, 0) emits none
      .filter(octet_length(payload) > 0)
      .select(col("doc_id"), payload,
        explode(sequence(lit(0L),
          ceil(octet_length(payload) / lit(64.0)).cast("long") - 1))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        octet_length(payload.substr((col("chunk_idx") * 64 + 1).cast("int"),
          lit(64))).as("chunk_len"),
        md5(payload.substr((col("chunk_idx") * 64 + 1).cast("int"),
          lit(64))).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Perceptual average-hash (aHash) dedup — the cheapest member of
    * the perceptual-hash family (aHash/dHash/pHash): threshold each
    * "pixel" against the image mean and pack the bits, so
    * re-encoded/slightly-corrupted copies of the same media collide
    * while distinct media don't. Here the stub "image" is the first
    * 32 payload bytes (the [[multimodalResize]] thumbnail contract)
    * and a pixel is a byte's value; the bit rule byte·32 ≥ Σbytes is
    * the mean threshold in EXACT integer cross-multiplied form — no
    * division, no float. The hash is emitted as the 32-char bit
    * string (cross-engine-trivial; a production impl packs it to an
    * int64 and bands it like [[graft.llm.Dedup.dedupSimhash]] for
    * Hamming-neighbor lookup). Fixture payloads are ASCII, so
    * DuckDB's per-char ascii() sees the same bytes Spark's binary
    * substr does.
    *
    * Scale shape: the hash is one in-scan array expression over a
    * 32-element sequence (O(1) per row); the dedup is one hash
    * aggregate on the 32-byte key — [[Dedup.dedupExact]]'s cost
    * model, on perceptual instead of exact identity. */
  def multimodalAhash(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .filter(length(col("text")) >= 32)
      .withColumn("px",
        expr("transform(sequence(1, 32), i -> ascii(substring(text, i, 1)))"))
      .withColumn("sum_px",
        expr("aggregate(px, 0, (acc, v) -> acc + v)"))
      .withColumn("ahash_bits", expr(
        """array_join(transform(px,
          |  v -> CASE WHEN v * 32 >= sum_px THEN '1' ELSE '0' END), '')"""
          .stripMargin))
      .groupBy(col("ahash_bits"))
      .agg(min(col("doc_id")).as("rep_doc"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("ahash_bits"))

  /** Difference hash (dHash) — the gradient-based perceptual hash:
    * bit i = (pixel i+1 > pixel i), which is invariant to uniform
    * brightness/contrast shifts that flip [[multimodalAhash]]'s
    * mean-threshold bits (the standard reason production image-dedup
    * runs dHash alongside aHash). Pixel extraction is the same
    * documented stub as aHash — the first 33 payload bytes stand in
    * for decoded luma cells (no image codecs in this container); the
    * Spark-side shape is real: an O(1)-per-row transform chain in the
    * scan, one hash-keyed aggregate, no shuffle wider than the
    * 32-bit-string key space. */
  def multimodalDhash(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .filter(length(col("text")) >= 33)
      .withColumn("px",
        expr("transform(sequence(1, 33), i -> ascii(substring(text, i, 1)))"))
      .withColumn("dhash_bits", expr(
        """array_join(transform(sequence(1, 32),
          |  i -> CASE WHEN element_at(px, i + 1) > element_at(px, i)
          |       THEN '1' ELSE '0' END), '')""".stripMargin))
      .groupBy(col("dhash_bits"))
      .agg(min(col("doc_id")).as("rep_doc"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("dhash_bits"))

  /** Near-duplicate image pairs by banded dHash — the Hamming-ball
    * search every image-dedup pipeline runs after exact-hash
    * grouping: pack the 32 [[multimodalDhash]] gradient bits into a
    * long, split into FOUR 8-bit bands, and candidate ONLY pairs that
    * share a band (pigeonhole: any pair within Hamming ≤ 3 shares at
    * least one exact band — with the ≤2 verify threshold the banding
    * is exact, not approximate). Verify = bit_count(a XOR b) ≤ 2 on
    * the bounded candidate set. No all-pairs path at any scale: the
    * join key is (band_idx, band_bits). */
  def multimodalNearDup(s: SparkSession, d: String): DataFrame = {
    val hashed = t(s, d, "documents")
      .filter(length(col("text")) >= 33)
      .withColumn("px",
        expr("transform(sequence(1, 33), i -> ascii(substring(text, i, 1)))"))
      .withColumn("v", expr(
        """aggregate(sequence(1, 32), 0L,
          |  (acc, i) -> acc * 2L + CASE
          |    WHEN element_at(px, i + 1) > element_at(px, i)
          |    THEN 1L ELSE 0L END)""".stripMargin))
      .select(col("doc_id"), col("v"))
      // the self-join consumes this twice; cache so the interpreted
      // 32-step fold runs once per doc, not once per side
      .cache()
    val banded = hashed.select(col("doc_id"), col("v"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_bits", expr("shiftright(v, band * 8) % 256"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_bits") === col("b.band_bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.v").as("va"), col("b.v").as("vb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(va ^ vb)"))
      .filter(col("hamming") <= 2)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Audio feature extraction over the opaque binary payload — the
    * waveform-level triage every audio-corpus pipeline runs before
    * expensive transcription (silence/clipping/noise gating): treat
    * the first 64 payload bytes as signed 8-bit PCM samples (the
    * DOCUMENTED decode stub — no audio codecs in this container; a
    * production impl swaps in a real PCM decode behind the same
    * column contract), and compute per clip the exact-integer energy
    * Σs², peak |s|, and zero-crossing count, plus RMS as the one
    * closing sqrt (IEEE-correctly-rounded, cross-engine identical).
    * Stub mapping: space → 0 (silence), letter byte − 110 otherwise —
    * centered MID-ALPHABET so samples straddle zero and the crossing
    * and peak features discriminate per clip (the original −128
    * mapping made every sample negative: zero_crossings was constant
    * 0 and peak constant 96 at every sf — round-11 degeneracy lint).
    * Scale: pure in-scan array expressions, O(1) per row, no shuffle
    * at all — the projection rides the binaryFile scan at 100 TB. */
  def multimodalAudioEnergy(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .filter(length(col("text")) >= 64)
      .withColumn("p", expr(
        """transform(sequence(1, 64),
          |  x -> CASE WHEN ascii(substring(text, x, 1)) = 32 THEN 0
          |       ELSE ascii(substring(text, x, 1)) - 110 END)"""
          .stripMargin))
      .select(col("doc_id"),
        expr("""CAST(aggregate(p, 0L,
                (acc, v) -> acc + CAST(v * v AS BIGINT)) AS BIGINT)""")
          .as("energy"),
        expr("CAST(array_max(transform(p, v -> abs(v))) AS BIGINT)")
          .as("peak"),
        expr("""CAST(aggregate(sequence(1, 63), 0L,
                (acc, x) -> acc + CASE WHEN (element_at(p, x) >= 0)
                  != (element_at(p, x + 1) >= 0)
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)
                AS BIGINT)""").as("zero_crossings"))
      .withColumn("rms",
        expr("ROUND(SQRT(CAST(energy AS DOUBLE) / 64), 4)"))
      .orderBy(col("doc_id"))

  /** Temporal centroid + flatness triage over the same 64-sample PCM
    * stub as [[multimodalAudioEnergy]] — the "where does the energy
    * sit" features a waveform gate computes before windowing: the
    * amplitude-weighted mean sample position Σi·|sᵢ| / Σ|sᵢ| (early-
    * vs-late energy), and the max-to-mean amplitude ratio (peaky vs
    * flat clip). Both numerators/denominators are exact BIGINTs from
    * one in-scan fold; each feature closes in one double division
    * (all-silent clips guard to NULL on the exact integer test).
    * Pure projection — no shuffle at any scale. */
  def multimodalSpectralCentroid(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .filter(length(col("text")) >= 64)
      .withColumn("p", expr(
        """transform(sequence(1, 64),
          |  x -> CASE WHEN ascii(substring(text, x, 1)) = 32 THEN 0
          |       ELSE ascii(substring(text, x, 1)) - 110 END)"""
          .stripMargin))
      .select(col("doc_id"),
        expr("""CAST(aggregate(sequence(1, 64), 0L,
                (acc, i) -> acc + CAST(i AS BIGINT)
                  * abs(element_at(p, i))) AS BIGINT)""").as("wpos"),
        expr("""CAST(aggregate(p, 0L,
                (acc, v) -> acc + abs(v)) AS BIGINT)""").as("mass"),
        expr("CAST(array_max(transform(p, v -> abs(v))) AS BIGINT)")
          .as("peak"))
      .select(col("doc_id"), col("mass"), col("peak"),
        expr("""CASE WHEN mass = 0 THEN NULL
                ELSE ROUND(CAST(wpos AS DOUBLE) / mass, 4) END""")
          .as("centroid_pos"),
        expr("""CASE WHEN mass = 0 THEN NULL
                ELSE ROUND(64e0 * peak / mass, 4) END""")
          .as("crest_ratio"))
      .orderBy(col("doc_id"))

  /** Silence trimming over a 64-sample PCM stub — the lead/trail-
    * silence removal every audio pipeline runs before windowing. NOTE
    * the stub byte mapping here is ascii−128 UNCONDITIONALLY, which is
    * deliberately NOT [[multimodalAudioEnergy]]'s space→0 mapping: the
    * "silent when |s| < 32" rule is the lowercase-letter byte range
    * only under ascii−128, and the oracle replays exactly this mapping
    * — "unifying" the stubs would silently change every trim offset
    * (round-14 review pinned the difference). A sample is silent when
    * |s| < 32, and
    * the clip's first/last active positions give the trim offsets
    * and the active span (all-silent clips trim to zero). Pure
    * in-scan integer array expressions, O(1) per row, no shuffle. */
  def multimodalSilenceTrim(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .filter(length(col("text")) >= 64)
      .withColumn("p", expr(
        "transform(sequence(1, 64), x -> ascii(substring(text, x, 1)) - 128)"))
      .select(col("doc_id"),
        expr("""array_min(transform(sequence(1, 64),
                i -> CASE WHEN abs(element_at(p, i)) >= 32
                     THEN i ELSE 65 END))""").as("fa"),
        expr("""array_max(transform(sequence(1, 64),
                i -> CASE WHEN abs(element_at(p, i)) >= 32
                     THEN i ELSE 0 END))""").as("la"))
      .select(col("doc_id"),
        when(col("fa") === 65, lit(64L))
          .otherwise((col("fa") - 1).cast("long")).as("lead_silence"),
        when(col("fa") === 65, lit(0L))
          .otherwise((lit(64) - col("la")).cast("long")).as("trail_silence"),
        when(col("fa") === 65, lit(0L))
          .otherwise((col("la") - col("fa") + 1).cast("long"))
          .as("active_len"))
      .orderBy(col("doc_id"))

  /** Coefficient D[u][v] = Σ_{j,k} C[u][j]·C[v][k]·px[j·8+k] as a
    * generated flat sum for the DuckDB oracle (basis products
    * pre-multiplied into one literal each, ≤ 1e12; 64 terms ≤
    * 1.63e16 — BIGINT-safe). The basis is the ONE shared definition
    * in [[graft.functions.PhashKernel.dctC]]. */
  private def phashCoef(u: Int, v: Int, px: Int => String): String = {
    val c = graft.functions.PhashKernel.dctC
    (0 until 64).map { i =>
      s"${px(i)} * ${c(u)(i / 8) * c(v)(i % 8)}"
    }.mkString("(", " + ", ")")
  }

  /** pHash — the DCT perceptual hash (the third of the classic image
    * near-dup trio next to [[multimodalAhash]] and [[multimodalDhash]]):
    * 2-D DCT-II of the 8×8 "pixel" block, then one bit per AC
    * coefficient (above/below the AC mean), which keys on SPECTRAL
    * shape — robust to the uniform brightness/contrast and mild blur
    * edits that flip aHash/dHash bits (Round12OpsSpec pins the
    * brightness invariance). Pixel extraction is the same documented
    * stub as its siblings (first 64 payload bytes stand in for
    * decoded luma; no codecs in this container); everything
    * downstream is the real shape.
    *
    * Engine shape: the whole transform is ONE compiled kernel call
    * per row ([[graft.functions.PhashBits]]) inside the scan's
    * codegen stage, then a hash aggregate on the 63-bit key space.
    * The first cut projected a 64-element `px` array feeding 63
    * generated 64-term sums — CollapseProject inlined `px` into all
    * 4096 term references (each re-running ascii(substring(...)))
    * and the scan measured 68.9 s at sf0.1; the kernel does the
    * identical integer algebra in 0.4 s (PERF.md round 12, the
    * CdcChunks lesson for scalar kernels). */
  def multimodalPhash(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    t(s, d, "documents")
      .filter(length(col("text")) >= 64)
      .select(col("doc_id"),
        GraftBridge.column(graft.functions.PhashBits(
          GraftBridge.expression(col("text")))).as("phash_bits"))
      .groupBy(col("phash_bits"))
      .agg(min(col("doc_id")).as("rep_doc"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("phash_bits"))
  }

  /** Video shot-boundary detection (scene cut) — the frame-pair
    * dissimilarity scan every video curation pipeline runs before
    * sampling training frames (PySceneDetect's ContentDetector, shot
    * segmentation in video-text corpora): consecutive frames are
    * compared by HISTOGRAM distance and a cut is declared where the
    * L1 distance exceeds a threshold. "Frames" are the documented
    * stub (32-char windows at stride 16); the histogram is the
    * frame's character multiset — alignment-FREE, which matters: a
    * first cut used the dhash gradient word, but strided windows put
    * shared content at different bit positions, so every neighbor
    * pair looked maximally distant and the detector fired on 76% of
    * transitions (a saturated detector reads identically to a broken
    * one). Histograms of 50%-overlapping windows share ≥ half their
    * mass, so L1 ∈ [10, 28] with p95 ≈ 20 on the fixture — threshold
    * 20 yields a graded ~5% cut rate with both branches populated.
    *
    * Shape: frames explode to rows (one codegen'd substring per
    * frame), characters explode under them (per-doc bounded fan),
    * one (doc, frame, char) count aggregate, and neighbor pairing is
    * the SIGNED-UNION trick — frame f posts +count at transition f
    * and −count at transition f−1, so Σ|Σsigned| per transition IS
    * the L1 distance with no outer join and no missing-key edge
    * cases. Everything shuffles on doc-keyed composites. */
  def multimodalSceneCut(s: SparkSession, d: String): DataFrame = {
    // round 13: the (tr, l1) transition rows come from the
    // [[graft.functions.SceneCutL1]] in-scan generator — one O(frames)
    // pass per doc — replacing a |docs|·frames·32 char explosion
    // through four hash-aggregate exchanges (~5M rows at sf0.1, the
    // bench's #2 key). Only the per-doc roll-up below shuffles, on
    // ~30·|docs| narrow rows. Semantics and every output value are
    // unchanged (same frame/stride/threshold definitions; the oracle
    // still replays the relational histogram form in SQL).
    import org.apache.spark.sql.GraftBridge
    t(s, d, "documents")
      .filter(length(col("text")) >= 96)
      .select(col("doc_id"),
        (expr("CAST((length(text) - 32) DIV 16 AS INT)") + 1)
          .cast("long").as("n_frames"),
        GraftBridge.column(graft.functions.SceneCutL1(
          GraftBridge.expression(col("text")))).as(Seq("tr", "l1")))
      .groupBy(col("doc_id"))
      .agg(
        max(col("n_frames")).as("n_frames"),
        sum(when(col("l1") > 20, 1L).otherwise(0L)).as("n_cuts"),
        min(when(col("l1") > 20, col("tr"))).cast("long")
          .as("first_cut_tr"),
        max(col("l1")).cast("long").as("max_l1"))
      .orderBy(col("doc_id"))
  }

  /** Audio periodicity / tempo estimation — the autocorrelation-peak
    * pitch-and-tempo detector (the classic ACF method behind librosa's
    * tempo and YIN's first stage): over the stub sample window
    * (first 64 payload bytes as PCM stand-ins), find the lag
    * ℓ ∈ [4, 32] whose autocorrelation of the MEAN-CENTERED signal is
    * largest. Centering is exact-integer: X_i = 64·x_i − Σx (scaled by
    * the window length instead of dividing by it), so r(ℓ) = ΣX_iX_{i+ℓ}
    * is a BIGINT both engines compute identically; r(0) rides along
    * as the normalization reference.
    *
    * Shape (the scale form of autocorrelation over LONG series):
    * samples explode to (doc, i, x) rows, centering is one doc-keyed
    * window sum, the lag fan is a bounded ×29 row explosion on the
    * left side of a (doc, i+ℓ) equi-join — NO per-lag rescan of the
    * corpus — and the argmax is a per-doc rank-1 pick Spark runs as a
    * WindowGroupLimit 1-heap. Everything shuffles on doc-keyed
    * composites; real decoders replace the byte stub per the module
    * boundary above. */
  def multimodalTempo(s: SparkSession, d: String): DataFrame = {
    // round 15: the whole recipe runs in the
    // [[graft.functions.TempoAcf]] generator — one O(64×29) integer
    // pass per doc inside the scan, replacing the 64-sample explode +
    // per-doc window sum + ×29 lag fan + (doc, j) self-join + rank
    // (a ~9M-row join at sf0.1, ~38 s of CPU; the generator: ~0.1 s).
    // Same x/centering/argmax algebra — the oracle keeps the
    // relational form and MultimodalSpec pins the per-doc equality.
    import org.apache.spark.sql.GraftBridge
    t(s, d, "documents")
      .filter(length(col("text")) >= 64)
      .select(col("doc_id"),
        GraftBridge.column(graft.functions.TempoAcf(
          GraftBridge.expression(col("text"))))
          .as(Seq("tempo_lag", "r_peak", "r0")))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_tempo" -> (multimodalTempo _),
    "multimodal_scene_cut" -> (multimodalSceneCut _),
    "multimodal_phash" -> (multimodalPhash _),
    "multimodal_silence_trim" -> (multimodalSilenceTrim _),
    "multimodal_audio_energy" -> (multimodalAudioEnergy _),
    "multimodal_spectral_centroid" -> (multimodalSpectralCentroid _),
    "multimodal_near_dup" -> (multimodalNearDup _),
    "multimodal_dhash" -> (multimodalDhash _),
    "multimodal_ahash" -> (multimodalAhash _),
    "multimodal_magic_sniff" -> (multimodalMagicSniff _),
    "multimodal_chunk_roundtrip" -> (multimodalChunkRoundtrip _),
    "multimodal_chunk_bytes" -> (multimodalChunkBytes _),
    "multimodal_columns" -> (multimodalColumns _),
    "multimodal_resize" -> (multimodalResize _),
    "multimodal_dedup" -> (multimodalDedup _),
    "multimodal_frame_sample" -> (multimodalFrameSample _)
  )

  /** Chunk → reassemble → digest-compare round-trip, the losslessness
    * proof for the [[chunkBytesOf]] chunker as a GATE row (the ingest
    * family's roundtrip convention — base64/sink/compact — applied to
    * the multimodal path): every payload is split into 64-byte
    * chunks, the chunks are re-joined in index order inside a per-doc
    * aggregate (collect_list is bounded by the DOCUMENT's chunk
    * count, not the corpus — the allowed class), and the reassembled
    * md5 must equal the original's. `lossless` is pinned TRUE by the
    * oracle for every doc. */
  def multimodalChunkRoundtrip(s: SparkSession, d: String): DataFrame = {
    val payload = col("payload")
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .filter(octet_length(payload) > 0)
    docs
      .select(col("doc_id"), md5(payload).as("orig_md5"),
        explode(sequence(lit(0L),
          ceil(octet_length(payload) / lit(64.0)).cast("long") - 1))
          .as("chunk_idx"), payload)
      .select(col("doc_id"), col("orig_md5"), col("chunk_idx"),
        payload.substr((col("chunk_idx") * 64 + 1).cast("int"), lit(64))
          .cast("string").as("chunk"))
      .groupBy(col("doc_id"), col("orig_md5"))
      .agg(count(lit(1)).as("n_chunks"),
        md5(concat_ws("",
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk"))))
            .getField("chunk"))).as("reassembled_md5"))
      .withColumn("lossless", col("orig_md5") === col("reassembled_md5"))
      .select(col("doc_id"), col("n_chunks"), col("orig_md5"),
        col("lossless"))
      .orderBy(col("doc_id"))
  }

  /** Byte counts use DuckDB strlen() (byte length of the UTF-8 text),
    * matching Spark's octet_length over the encoded binary even for
    * non-ASCII text. The substring-based md5s (thumb/frame) still slice
    * by CHARACTER on the DuckDB side vs BYTE on the Spark side — equal
    * only while fixture payloads are ASCII (they are; documented). */
  /** [[multimodalPhash]] oracle — same generated coefficient sums
    * rendered in DuckDB's 1-based list indexing. */
  private val phashOracle: String = {
    val duckIdx = (i: Int) => s"px[${i + 1}]"
    val dcList = graft.functions.PhashKernel.acPositions
      .map { case (u, v) => phashCoef(u, v, duckIdx) }
      .mkString("[", ", ", "]")
    s"""WITH p AS (
       |  SELECT doc_id, list_transform(range(1, 65),
       |    i -> CAST(ascii(substring(text, CAST(i AS INTEGER), 1))
       |         AS BIGINT)) AS px
       |  FROM documents WHERE strlen(text) >= 64),
       |c AS (SELECT doc_id, $dcList AS dc FROM p),
       |m AS (
       |  SELECT doc_id, dc,
       |    (list_sum(dc) + 63000000000000000) // 63
       |      - 1000000000000000 AS mean_ac
       |  FROM c),
       |h AS (
       |  SELECT doc_id, array_to_string(list_transform(dc,
       |      v -> CASE WHEN v > mean_ac THEN '1' ELSE '0' END), '')
       |    AS phash_bits
       |  FROM m)
       |SELECT phash_bits, MIN(doc_id) AS rep_doc, COUNT(*) AS n_docs
       |FROM h GROUP BY phash_bits ORDER BY phash_bits""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "multimodal_phash" -> phashOracle,
    // same 64·x − Σx exact centering, same [4, 32] lag fan over the
    // (doc, i+ℓ) equi-join, same (r DESC, lag) argmax
    "multimodal_tempo" ->
      """WITH sm AS (
        |  SELECT doc_id, CAST(u.i AS BIGINT) AS i,
        |    CAST(ascii(substring(text, CAST(u.i + 1 AS INTEGER), 1))
        |      AS BIGINT) AS x
        |  FROM documents, LATERAL unnest(range(0, 64)) AS u(i)
        |  WHERE strlen(text) >= 64),
        |cx AS (
        |  SELECT doc_id, i,
        |    64 * x - SUM(x) OVER (PARTITION BY doc_id) AS xc
        |  FROM sm),
        |r0 AS (SELECT doc_id, SUM(xc * xc) AS r0 FROM cx GROUP BY 1),
        |pr AS (
        |  SELECT a.doc_id, l.l AS lag, SUM(a.xc * b.xc) AS r
        |  FROM cx a
        |  CROSS JOIN (SELECT unnest(range(4, 33)) AS l) l
        |  JOIN cx b ON b.doc_id = a.doc_id AND b.i = a.i + l.l
        |  GROUP BY 1, 2),
        |pk AS (
        |  SELECT doc_id, lag, r,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY r DESC, lag) AS rk
        |  FROM pr)
        |SELECT p.doc_id, CAST(p.lag AS INTEGER) AS tempo_lag,
        |  CAST(p.r AS BIGINT) AS r_peak, CAST(r0.r0 AS BIGINT) AS r0
        |FROM pk p JOIN r0 USING (doc_id)
        |WHERE p.rk = 1 ORDER BY p.doc_id""".stripMargin,
    // same stride-16 frames, char-histogram signatures, signed-union
    // L1 pairing, >20 cut rule
    "multimodal_scene_cut" ->
      """WITH ch AS (
        |  SELECT doc_id, (strlen(text) - 32) // 16 AS maxf,
        |    CAST(u.f AS BIGINT) AS f,
        |    substring(text, CAST(u.f * 16 + i.i AS INTEGER), 1) AS ch,
        |    COUNT(*) AS cnt
        |  FROM documents,
        |    LATERAL unnest(range(0, (strlen(text) - 32) // 16 + 1))
        |      AS u(f),
        |    LATERAL unnest(range(1, 33)) AS i(i)
        |  WHERE strlen(text) >= 96
        |  GROUP BY 1, 2, 3, 4),
        |signed AS (
        |  SELECT doc_id, maxf, f AS tr, ch, cnt FROM ch WHERE f < maxf
        |  UNION ALL
        |  SELECT doc_id, maxf, f - 1 AS tr, ch, -cnt FROM ch WHERE f > 0),
        |l1 AS (
        |  SELECT doc_id, maxf, tr, SUM(ABS(s)) AS l1 FROM (
        |    SELECT doc_id, maxf, tr, ch, SUM(cnt) AS s
        |    FROM signed GROUP BY 1, 2, 3, 4)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id,
        |  CAST(MAX(maxf) + 1 AS BIGINT) AS n_frames,
        |  CAST(SUM(CASE WHEN l1 > 20 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_cuts,
        |  CAST(MIN(CASE WHEN l1 > 20 THEN tr END) AS BIGINT)
        |    AS first_cut_tr,
        |  CAST(MAX(l1) AS BIGINT) AS max_l1
        |FROM l1 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // first/last |s| >= 32 positions over the same PCM byte stub;
    // all-silent clips trim to (64, 0, 0)
    "multimodal_silence_trim" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, 64),
        |      x -> ascii(substring(text, x, 1)) - 128) AS p
        |  FROM documents WHERE length(text) >= 64),
        |f AS (
        |  SELECT doc_id,
        |    list_min(list_transform(generate_series(1, 64),
        |      i -> CASE WHEN abs(p[i]) >= 32 THEN i ELSE 65 END)) AS fa,
        |    list_max(list_transform(generate_series(1, 64),
        |      i -> CASE WHEN abs(p[i]) >= 32 THEN i ELSE 0 END)) AS la
        |  FROM px)
        |SELECT doc_id,
        |  CAST(CASE WHEN fa = 65 THEN 64 ELSE fa - 1 END AS BIGINT)
        |    AS lead_silence,
        |  CAST(CASE WHEN fa = 65 THEN 0 ELSE 64 - la END AS BIGINT)
        |    AS trail_silence,
        |  CAST(CASE WHEN fa = 65 THEN 0 ELSE la - fa + 1 END AS BIGINT)
        |    AS active_len
        |FROM f ORDER BY doc_id""".stripMargin,
    // byte-level PCM stub: exact integer energy/peak/zero-crossings
    // (fixture payloads are ASCII, so ascii() sees the same bytes as
    // Spark's substring), RMS the one closing sqrt
    // same stub mapping; exact integer position/mass/peak folds; two
    // guarded closing divisions
    "multimodal_spectral_centroid" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, 64),
        |      x -> CASE WHEN ascii(substring(text, x, 1)) = 32 THEN 0
        |           ELSE ascii(substring(text, x, 1)) - 110 END) AS p
        |  FROM documents WHERE length(text) >= 64),
        |f AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(generate_series(1, 64),
        |      i -> i * abs(p[i]))) AS BIGINT) AS wpos,
        |    CAST(list_sum(list_transform(p, v -> abs(v))) AS BIGINT)
        |      AS mass,
        |    CAST(list_max(list_transform(p, v -> abs(v))) AS BIGINT)
        |      AS peak
        |  FROM px)
        |SELECT doc_id, mass, peak,
        |  CASE WHEN mass = 0 THEN NULL
        |    ELSE ROUND(CAST(wpos AS DOUBLE) / mass, 4) END
        |    AS centroid_pos,
        |  CASE WHEN mass = 0 THEN NULL
        |    ELSE ROUND(64e0 * peak / mass, 4) END AS crest_ratio
        |FROM f ORDER BY doc_id""".stripMargin,
    "multimodal_audio_energy" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, 64),
        |      x -> CASE WHEN ascii(substring(text, x, 1)) = 32 THEN 0
        |           ELSE ascii(substring(text, x, 1)) - 110 END) AS p
        |  FROM documents WHERE length(text) >= 64),
        |f AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(p, v -> v * v)) AS BIGINT)
        |      AS energy,
        |    CAST(list_max(list_transform(p, v -> abs(v))) AS BIGINT)
        |      AS peak,
        |    CAST(list_sum(list_transform(generate_series(1, 63),
        |      x -> CASE WHEN (p[x] >= 0) <> (p[x + 1] >= 0)
        |           THEN 1 ELSE 0 END)) AS BIGINT) AS zero_crossings
        |  FROM px)
        |SELECT doc_id, energy, peak, zero_crossings,
        |  ROUND(SQRT(CAST(energy AS DOUBLE) / 64), 4) AS rms
        |FROM f ORDER BY doc_id""".stripMargin,
    // independent reassembly via string_agg ORDER BY chunk_idx; the
    // oracle pins lossless TRUE for every doc
    "multimodal_chunk_roundtrip" ->
      """WITH d AS (
        |  SELECT doc_id, text, md5(text) AS orig_md5,
        |    strlen(text) AS n
        |  FROM documents WHERE strlen(text) > 0
        |), c AS (
        |  SELECT doc_id, orig_md5, CAST(i AS BIGINT) AS chunk_idx,
        |    substring(text, CAST(i * 64 + 1 AS INTEGER), 64) AS chunk
        |  FROM d, LATERAL unnest(range(0,
        |    CAST(ceil(n / 64.0) AS BIGINT))) AS u(i)
        |), r AS (
        |  SELECT doc_id, orig_md5, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |    md5(string_agg(chunk, '' ORDER BY chunk_idx)) AS re_md5
        |  FROM c GROUP BY doc_id, orig_md5
        |)
        |SELECT doc_id, n_chunks, orig_md5,
        |  orig_md5 = re_md5 AS lossless
        |FROM r ORDER BY doc_id""".stripMargin,
    // ASCII fixture: ascii(char i) == byte i; integer cross-multiplied
    // mean threshold; hash emitted as the 32-char bit string
    // packed dhash long; 8-bit band join (pigeonhole-exact for the
    // ≤2 verify threshold); integer XOR popcount verify
    "multimodal_near_dup" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    list_transform(range(1, 34),
        |      i -> ascii(substring(text, CAST(i AS INTEGER), 1))) AS px
        |  FROM documents WHERE strlen(text) >= 33),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(1, 33),
        |      i -> CASE WHEN px[CAST(i + 1 AS INTEGER)]
        |                     > px[CAST(i AS INTEGER)]
        |           THEN (CAST(1 AS BIGINT) << CAST(32 - i AS INTEGER))
        |           ELSE 0 END)) AS BIGINT) AS v
        |  FROM p),
        |banded AS (
        |  SELECT doc_id, v, band,
        |    (v >> CAST(band * 8 AS INTEGER)) % 256 AS band_bits
        |  FROM h, LATERAL unnest(range(0, 4)) AS u(band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.v AS va, b.v AS vb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.band_bits = b.band_bits
        |   AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(bit_count(xor(va, vb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(va, vb)) <= 2
        |ORDER BY doc_a, doc_b""".stripMargin,
    // adjacent-cell gradient bits over the same stubbed pixel bytes;
    // 1-based DuckDB list indexing mirrors element_at
    "multimodal_dhash" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    list_transform(range(1, 34),
        |      i -> ascii(substring(text, CAST(i AS INTEGER), 1))) AS px
        |  FROM documents WHERE strlen(text) >= 33),
        |h AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(range(1, 33),
        |      i -> CASE WHEN px[CAST(i + 1 AS INTEGER)]
        |                     > px[CAST(i AS INTEGER)]
        |           THEN '1' ELSE '0' END), '') AS dhash_bits
        |  FROM p)
        |SELECT dhash_bits, MIN(doc_id) AS rep_doc, COUNT(*) AS n_docs
        |FROM h GROUP BY dhash_bits ORDER BY dhash_bits""".stripMargin,
    "multimodal_ahash" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    list_transform(range(1, 33),
        |      i -> ascii(substring(text, CAST(i AS INTEGER), 1))) AS px
        |  FROM documents WHERE strlen(text) >= 32),
        |h AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(px,
        |      v -> CASE WHEN v * 32 >= list_sum(px) THEN '1' ELSE '0' END),
        |      '') AS ahash_bits
        |  FROM p)
        |SELECT ahash_bits, MIN(doc_id) AS rep_doc, COUNT(*) AS n_docs
        |FROM h GROUP BY ahash_bits ORDER BY ahash_bits""".stripMargin,
    // ASCII fixture: char slices == byte slices (see scaladoc above)
    "multimodal_chunk_bytes" ->
      """WITH d AS (
        |  SELECT doc_id, text, strlen(text) AS n FROM documents
        |), c AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |    substring(text, CAST(i * 64 + 1 AS INTEGER), 64) AS chunk
        |  FROM d, LATERAL unnest(range(0,
        |    CAST(ceil(n / 64.0) AS BIGINT))) AS u(i)
        |)
        |SELECT doc_id, chunk_idx,
        |  CAST(strlen(chunk) AS INTEGER) AS chunk_len,
        |  md5(chunk) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "multimodal_magic_sniff" ->
      """SELECT doc_id,
        |  -- the %4==3 payload is the RAW text, and the engine sniffs
        |  -- BYTES: word-soup text that happens to start with the
        |  -- all-ASCII '%PDF-' magic legitimately sniffs as pdf, so the
        |  -- oracle sniffs it too instead of hardcoding text/plain
        |  -- (round-14 review; PNG/JPEG magics are non-ASCII and
        |  -- unreachable from text)
        |  CASE CAST(doc_id % 4 AS INTEGER)
        |    WHEN 0 THEN 'image/png'
        |    WHEN 1 THEN 'image/jpeg'
        |    WHEN 2 THEN 'application/pdf'
        |    ELSE CASE WHEN substring(text, 1, 5) = '%PDF-'
        |         THEN 'application/pdf' ELSE 'text/plain' END
        |  END AS sniffed_mime,
        |  CAST(strlen(text) +
        |    CASE CAST(doc_id % 4 AS INTEGER)
        |      WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 5 ELSE 0 END
        |    AS INTEGER) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_columns" ->
      """SELECT doc_id,
        |  'text/plain' AS mime,
        |  CAST(strlen(text) AS INTEGER) AS n_bytes,
        |  md5(text) AS checksum,
        |  CAST(CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 256
        |       AS INTEGER) AS fake_width,
        |  CAST(CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 192
        |       AS INTEGER) AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_dedup" ->
      """SELECT MIN(doc_id) AS doc_id, md5(text) AS payload_md5,
        |  COUNT(*) AS n_copies,
        |  CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    "multimodal_resize" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS INTEGER) AS n_bytes,
        |  CAST(LEAST(strlen(text), 64) AS INTEGER) AS resized_bytes,
        |  md5(substring(text, 1, 64)) AS thumb_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frame_sample" ->
      """SELECT doc_id, f AS frame_idx,
        |  md5(substring(text, CAST(f * 32 + 1 AS INTEGER), 32))
        |    AS frame_md5
        |FROM documents, LATERAL unnest(
        |  range(0, CAST(ceil(strlen(text) / 32.0) AS BIGINT), 2)) AS t(f)
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
