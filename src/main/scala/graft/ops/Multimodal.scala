package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension): media payloads
  * as opaque `binary` columns with typed metadata, plus a
  * feature-extraction stage.
  *
  * The environment has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (byte-level features standing in
  * for pixel/sample features). Everything around it is the real
  * pattern for 100 TB media pipelines:
  *  - payload stays an opaque `BinaryType` column (columnar parquet,
  *    never stringified);
  *  - metadata travels as a typed struct next to the payload;
  *  - decode runs per-partition (mapPartitions) so a real codec would
  *    amortize per-batch init (model load, decoder context) exactly
  *    like a Pandas-UDF/mapInPandas batch on a Python stack;
  *  - partitioning before decode spreads payload bytes evenly.
  */
object Multimodal {

  /** Build the media table: payload = utf-8 bytes of the document text
    * (the fixture's stand-in for an image/audio blob), metadata struct
    * alongside.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("lang").as("lang"),
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes")).as("meta"))

  /** m05: payload dedup by content digest — the media counterpart of
    * d01: a simulated double-ingest (re-delivered assets are the norm
    * in media pipelines) collapses on sha-256 of the raw payload
    * BYTES, keeping the lexicographically first (ingest, doc_id) copy
    * per (digest, modality). One hash shuffle keyed on the 32-byte
    * digest; payloads never travel — only their digests and byte
    * counts do, which is what makes exact media dedup affordable at
    * 100 TB.
    */
  def m05PayloadDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val media = mediaTable(spark, sfDir)
    val ingests = media.withColumn("ingest", lit("a"))
      .unionByName(media.withColumn("ingest", lit("b")))
    ingests
      .groupBy(sha2(col("payload"), 256).as("digest"), col("meta.mime").as("mime"))
      .agg(count(lit(1)).as("n_copies"),
        min(struct(col("ingest"), col("doc_id"))).as("keep"),
        sum(col("meta.n_bytes")).as("total_bytes"))
      .select(col("digest"), col("mime"), col("n_copies"),
        col("keep.ingest").as("keep_ingest"), col("keep.doc_id").as("keep_doc_id"),
        col("total_bytes"))
      .orderBy(col("digest").asc_nulls_last)
  }

  val m05Sql: String =
    """WITH ingests AS (
      |  SELECT 'a' AS ingest, doc_id, text FROM documents
      |  UNION ALL SELECT 'b', doc_id, text FROM documents)
      |SELECT sha256(text) AS digest, 'text/plain' AS mime, count(*) AS n_copies,
      |  min(ingest) AS keep_ingest, min(doc_id) AS keep_doc_id,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
      |FROM ingests GROUP BY 1, 2
      |ORDER BY digest ASC NULLS LAST""".stripMargin

  /** m01: declarative byte-feature extraction — payload length, header
    * bytes, content digest, and a "frame sample" (every 64th byte of
    * the hex stream — the moral equivalent of sampling video frames).
    * Pure built-in expressions: this path stays in whole-stage codegen.
    */
  def m01MediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      lower(hex(substring(col("payload"), 1, 4))).as("header_hex"),
      sha2(col("payload"), 256).as("digest"),
      substring(col("meta.lang"), 1, 2).as("lang2"))
    .orderBy(col("doc_id").asc_nulls_last)

  val m01Sql: String =
    """SELECT doc_id,
      |  'text/plain' AS mime,
      |  octet_length(encode(text)) AS n_bytes,
      |  lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
      |  sha256(text) AS digest,
      |  substr(lang, 1, 2) AS lang2
      |FROM documents ORDER BY doc_id ASC NULLS LAST""".stripMargin

  /** m03: declarative frame sampling — every 32nd byte of the payload
    * becomes a "frame" row with its offset and value, the batch shape
    * of video frame-extraction (sample positions computed per row, one
    * generator, no UDF).
    */
  def m03FrameSample(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, octet_length(payload), 32), " +
          "i -> struct(i - 1 AS byte_offset, hex(substring(payload, i, 1)) AS byte_hex))"))
        .as("frame"))
      .select(col("doc_id"),
        col("frame").getField("byte_offset").cast("long").as("byte_offset"),
        lower(col("frame").getField("byte_hex")).as("byte_hex"))
      .orderBy(col("doc_id").asc_nulls_last, col("byte_offset").asc_nulls_last)

  val m03Sql: String =
    """SELECT doc_id, CAST(s.i - 1 AS BIGINT) AS byte_offset,
      |  lower(hex(encode(substr(text, CAST(s.i AS INT), 1)))) AS byte_hex
      |FROM (
      |  SELECT doc_id, text,
      |    unnest(list_transform(range(1, length(text) + 1, 32), i -> {'i': i})) AS s
      |  FROM documents)
      |ORDER BY doc_id ASC NULLS LAST, byte_offset ASC NULLS LAST""".stripMargin

  /** Payload chunking core over (doc_id, payload, n_bytes): a per-row
    * generator over computed chunk offsets, real binary `substring`
    * slicing, no UDF. Decoding a CHUNK as UTF-8 is only sound when
    * byte arithmetic equals character arithmetic — a chunk boundary
    * inside a multi-byte sequence would yield replacement characters —
    * so non-ASCII payloads (payload byte length ≠ decoded char length)
    * fail fast with raise_error instead of silently corrupting text.
    */
  def payloadChunks(media: DataFrame, chunk: Int): DataFrame =
    media
      // empty payload = no chunks. Without the guard, sequence(0, -1)
      // DESCENDS ([0, -1]) and would fabricate two bogus chunks
      .filter(col("n_bytes") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0), expr(s"(n_bytes + ${chunk - 1}) div $chunk - 1"))))
      .select(col("doc_id"), col("chunk_idx"),
        octet_length(expr(s"substring(payload, chunk_idx * $chunk + 1, $chunk)"))
          .as("chunk_size"),
        when(octet_length(col("payload")) === length(decode(col("payload"), "UTF-8")),
          decode(expr(s"substring(payload, chunk_idx * $chunk + 1, $chunk)"), "UTF-8"))
          .otherwise(raise_error(concat(
            lit("m04: non-ASCII payload, byte-chunk decode unsafe for doc_id="),
            col("doc_id").cast("string"))))
          .as("chunk_text"))
      .orderBy(col("doc_id").asc_nulls_last, col("chunk_idx").asc_nulls_last)

  /** m04: payload chunking — shard a binary blob into fixed-size
    * chunks (the upload/storage unit for large media). The fixture
    * payload is UTF-8 of ASCII text, so the oracle can verify chunk
    * CONTENT via substr on the text; [[payloadChunks]] enforces that
    * precondition per row.
    */
  def m04PayloadChunks(spark: SparkSession, sfDir: String,
      chunk: Int = 256): DataFrame =
    payloadChunks(
      mediaTable(spark, sfDir)
        .select(col("doc_id"), col("payload"), col("meta.n_bytes").as("n_bytes")),
      chunk)

  val m04Sql: String =
    """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
      |c AS (
      |  SELECT doc_id, text, n,
      |    unnest(range(0, (n + 255) // 256)) AS chunk_idx
      |  FROM t)
      |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
      |  CAST(least(256, n - chunk_idx * 256) AS INT) AS chunk_size,
      |  substr(text, CAST(chunk_idx * 256 + 1 AS INT), 256) AS chunk_text
      |FROM c
      |ORDER BY doc_id ASC NULLS LAST, chunk_idx ASC NULLS LAST""".stripMargin

  /** m06: cross-modal integrity — the multimodal-pipeline hygiene
    * check before any paired text↔embedding training run: every
    * document should carry exactly one embedding and vice versa; the
    * full-outer join surfaces BOTH orphan directions in one pass, and
    * the per-lang census localizes where coverage is missing (at the
    * fixture's sf0.1, 3 of 5 thousand docs have no vector — a real
    * finding, not a vacuous all-zeros check). Shuffle shape: one
    * full-outer equi-join on the id (both sides keyed), then a
    * 5-key census — the q43 FK-integrity discipline applied across
    * modalities.
    */
  def m06ModalityIntegrity(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
    val vecs = Tables.embeddings(spark, sfDir).select(col("vec_id"))
    docs.join(vecs, col("doc_id") === col("vec_id"), "full_outer")
      .groupBy(coalesce(col("lang"), lit("<no-doc>")).as("lang"))
      .agg(count(col("doc_id")).as("n_docs"),
        count(col("vec_id")).as("n_vecs"),
        count(when(col("vec_id").isNull, 1)).as("n_docs_without_vec"),
        count(when(col("doc_id").isNull, 1)).as("n_vecs_without_doc"))
      .orderBy(col("lang").asc_nulls_last)
  }

  val m06Sql: String =
    """SELECT coalesce(d.lang, '<no-doc>') AS lang,
      |  count(d.doc_id) AS n_docs,
      |  count(e.vec_id) AS n_vecs,
      |  count(CASE WHEN e.vec_id IS NULL THEN 1 END) AS n_docs_without_vec,
      |  count(CASE WHEN d.doc_id IS NULL THEN 1 END) AS n_vecs_without_doc
      |FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id
      |GROUP BY 1
      |ORDER BY lang ASC NULLS LAST""".stripMargin

  /** Decoded GIMG features, one row per payload. */
  final case class GimgFeatures(
      doc_id: Long, width: Int, height: Int, n_pixels: Int, n_data: Int,
      px_sum: Long, px_wsum: Long, px_min: Int, px_max: Int,
      px_mean: Double, decoder: String)

  /** GIMG v1: a fixed-layout uncompressed "image" format, so the decode
    * stage is a REAL binary parse (magic, version, big-endian header
    * fields, packed pixel plane, zero padding) rather than a stub, while
    * staying deterministic enough that a SQL oracle can recompute the
    * decoded features from the source bytes.
    *
    * Layout (all multi-byte fields big-endian):
    *   bytes 0-3   magic "GIMG"
    *   byte  4     version (1)
    *   bytes 5-6   width  (u16)
    *   bytes 7-8   height (u16)
    *   bytes 9-12  n_data (u32) — meaningful pixels; the rest is padding
    *   bytes 13-   width*height pixel bytes (n_data data, then zeros)
    */
  object GimgCodec {
    val Magic: Array[Byte] = "GIMG".getBytes("US-ASCII")
    val Version: Byte = 1
    val HeaderLen: Int = 13
    val Width: Int = 16

    def decode(id: Long, bytes: Array[Byte]): GimgFeatures = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"gimg: $msg for doc_id=$id")
      if (bytes.length < HeaderLen) fail("payload shorter than header")
      var i = 0
      while (i < 4) {
        if (bytes(i) != Magic(i)) fail("bad magic")
        i += 1
      }
      if (bytes(4) != Version) fail(s"unsupported version ${bytes(4)}")
      val bb = java.nio.ByteBuffer.wrap(bytes, 5, 8)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      val width = bb.getShort & 0xffff
      val height = bb.getShort & 0xffff
      val nData = bb.getInt
      val nPixels = width * height
      if (bytes.length != HeaderLen + nPixels)
        fail(s"length ${bytes.length} != header + $width x $height plane")
      if (nData < 1 || nData > nPixels) fail(s"n_data $nData out of range")
      var sum = 0L; var wsum = 0L; var mn = 256; var mx = -1
      var j = 0
      while (j < nData) {
        val v = bytes(HeaderLen + j) & 0xff
        sum += v
        wsum += (j + 1).toLong * v
        if (v < mn) mn = v
        if (v > mx) mx = v
        j += 1
      }
      while (j < nPixels) {
        if (bytes(HeaderLen + j) != 0) fail(s"nonzero padding at pixel $j")
        j += 1
      }
      GimgFeatures(id, width, height, nPixels, nData, sum, wsum, mn, mx,
        sum.toDouble / nData, "gimg-v1")
    }
  }

  /** Declarative GIMG v1 ENCODER: header fields via hex/lpad/unhex
    * (u16/u32 big-endian), pixel plane = the utf-8 bytes of the text,
    * zero-padded to a whole width-16 raster. Pure built-ins, stays in
    * whole-stage codegen — the 100 TB shape for bulk media re-encode.
    */
  def gimgMedia(spark: SparkSession, sfDir: String): DataFrame =
    gimgMediaOf(Tables.documents(spark, sfDir))

  /** The encoder over an arbitrary (doc_id, text) frame — m09 encodes
    * both the corpus and its re-processed crawl through this.
    */
  def gimgMediaOf(docs: DataFrame): DataFrame = {
    val w = GimgCodec.Width
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .withColumn("n", octet_length(col("data")))
      .withColumn("h", expr(s"(n + ${w - 1}) div $w"))
      .select(col("doc_id"), concat(
        lit(GimgCodec.Magic),
        lit(Array(GimgCodec.Version)),
        unhex(lpad(hex(lit(w)), 4, "0")),
        unhex(lpad(hex(col("h")), 4, "0")),
        unhex(lpad(hex(col("n")), 8, "0")),
        col("data"),
        unhex(repeat(lit("00"), (col("h") * w - col("n")).cast("int")))
      ).as("payload"))
  }

  /** m02: the media decode stage — encode every document payload into
    * GIMG v1, then parse it back per-partition. The decode runs in
    * mapPartitions by design: a real deployment swaps [[GimgCodec]] for
    * a JNI/ONNX codec and keeps the batching, schema, and partitioning
    * (per-partition init amortizes decoder-context setup exactly like a
    * mapInPandas batch on a Python stack). Features are content-derived
    * (positional weighted sum pins byte ORDER, not just multiset), so
    * the DuckDB oracle re-derives them from the same source bytes — a
    * full hash-exact correctness gate on the decode path.
    */
  def m02MediaDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = gimgMedia(spark, sfDir)
      // even payload spread before the expensive stage; on a cluster
      // this is the knob that keeps decoder utilization flat
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("payload"))
    media.as[(Long, Array[Byte])].mapPartitions { rows =>
      // per-partition init happens ONCE here (decoder context/model)
      val decoder = GimgCodec
      rows.map { case (id, bytes) => decoder.decode(id, bytes) }
    }.toDF()
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Oracle: recompute the decoded features from the source text. The
    * fixture corpus is ASCII (verified: octet_length(encode(text)) ==
    * length(text) at every SF), so ord(char) == pixel byte.
    */
  val m02Sql: String =
    """WITH t AS (
      |  SELECT doc_id, length(text) AS n,
      |    list_transform(range(1, length(text) + 1),
      |      i -> ord(substr(text, CAST(i AS INT), 1))) AS px,
      |    list_transform(range(1, length(text) + 1),
      |      i -> i * ord(substr(text, CAST(i AS INT), 1))) AS wpx
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(16 AS INT) AS width,
      |  CAST((n + 15) // 16 AS INT) AS height,
      |  CAST(((n + 15) // 16) * 16 AS INT) AS n_pixels,
      |  CAST(n AS INT) AS n_data,
      |  CAST(list_sum(px) AS BIGINT) AS px_sum,
      |  CAST(list_sum(wpx) AS BIGINT) AS px_wsum,
      |  CAST(list_min(px) AS INT) AS px_min,
      |  CAST(list_max(px) AS INT) AS px_max,
      |  CAST(list_sum(px) AS DOUBLE) / n AS px_mean,
      |  'gimg-v1' AS decoder
      |FROM t ORDER BY doc_id ASC NULLS LAST""".stripMargin

  /** m07: header-only media profile — the dual of m02. Where the
    * decode stage walks every pixel byte in imperative per-partition
    * code, profiling a media lake needs only the FIXED-OFFSET header:
    * magic check plus big-endian u16/u16/u32 field extraction, all via
    * `substring`/`hex`/`conv` built-ins that stay inside whole-stage
    * codegen — 13 of each payload's bytes feed arithmetic, no codec in
    * the plan at all. Aggregated to a (width, height) resolution
    * histogram with byte mass and mean data density: the operator that
    * answers "what is IN this 100 TB media bucket" at column-scan
    * cost. The density ratio divides two exact int64 sums, once per
    * output row. The oracle recomputes the same profile from the
    * source text the payloads were encoded from — an end-to-end check
    * that the binary header parse reads back exactly what the
    * declarative encoder wrote.
    */
  def m07MediaProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val beU16 = (pos: Int) =>
      conv(hex(substring(col("payload"), pos, 2)), 16, 10).cast("int")
    val beU32 = (pos: Int) =>
      conv(hex(substring(col("payload"), pos, 4)), 16, 10).cast("long")
    gimgMedia(spark, sfDir)
      .filter(substring(col("payload"), 1, 4) === lit(GimgCodec.Magic) &&
        substring(col("payload"), 5, 1) === lit(Array(GimgCodec.Version)))
      .select(
        beU16(6).as("width"), beU16(8).as("height"), beU32(10).as("n_data"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("width"), col("height"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("n_data")).as("total_data"),
        (sum(col("n_data")).cast("double") /
          (sum(col("width").cast("long") * col("height").cast("long")))
            .cast("double")).as("mean_density"))
      .orderBy(col("width").asc_nulls_last, col("height").asc_nulls_last)
  }

  /** Oracle from the source text (same derivation path as m02Sql):
    * width is fixed 16, height = ceil(n/16), payload bytes = 13 header
    * + width·height plane, n_data = byte length of the text.
    */
  val m07Sql: String =
    """WITH t AS (
      |  SELECT CAST(16 AS INT) AS width,
      |    CAST((length(text) + 15) // 16 AS INT) AS height,
      |    CAST(length(text) AS BIGINT) AS n_data,
      |    CAST(13 + ((length(text) + 15) // 16) * 16 AS BIGINT) AS n_bytes
      |  FROM documents)
      |SELECT width, height, count(*) AS n_files,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(sum(n_data) AS BIGINT) AS total_data,
      |  CAST(sum(n_data) AS DOUBLE) /
      |    CAST(sum(CAST(width AS BIGINT) * CAST(height AS BIGINT)) AS DOUBLE)
      |    AS mean_density
      |FROM t GROUP BY width, height
      |ORDER BY width ASC NULLS LAST, height ASC NULLS LAST""".stripMargin

  /** m08: byte-budget shard packing — the WebDataset-style write-side
    * index of a media lake: stream payloads per language corpus in
    * doc_id order into ~64 KiB shards and emit each doc's (shard,
    * offset-in-shard) placement, the random-access index a shard
    * reader seeks by. A doc belongs to the shard its START offset
    * falls in (payloads are never split) — the virtual-offset
    * convention p06 uses for token bins, applied to bytes.
    *
    * Scale shape: the running byte offset is the TWO-PHASE distributed
    * prefix sum (doc_id-range buckets → tiny per-lang bucket-offset
    * table → broadcast back → exact window only within (lang, bucket)),
    * never a per-lang window over the fact table; the offset-in-shard
    * rebase is a second window partitioned by (lang, shard) — a key
    * whose cardinality grows with corpus bytes, so per-task work stays
    * bounded by the shard budget. Integer arithmetic throughout: the
    * result is bit-identical to the oracle's single-window form at any
    * partitioning.
    */
  def m08ShardPack(spark: SparkSession, sfDir: String,
      budget: Int = 65536): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = 256 // doc_id-range bucket width for the phase-1 collapse
    val base = mediaTable(spark, sfDir)
      .select(col("doc_id"), col("meta.lang").as("lang"),
        col("meta.n_bytes").cast("long").as("n_bytes"))
      .withColumn("bkt", expr(s"doc_id div $bucket"))
    val wPrefix = Window.partitionBy(col("lang"))
      .orderBy(col("bkt").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = base.groupBy(col("lang"), col("bkt"))
      .agg(sum(col("n_bytes")).as("bbytes"))
      .withColumn("bkt_off", sum(col("bbytes")).over(wPrefix) - col("bbytes"))
      .select(col("lang"), col("bkt"), col("bkt_off"))
    val wIn = Window.partitionBy(col("lang"), col("bkt"))
      .orderBy(col("doc_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wShard = Window.partitionBy(col("lang"), col("shard"))
    base.join(broadcast(offsets), Seq("lang", "bkt"))
      .withColumn("off",
        col("bkt_off") + sum(col("n_bytes")).over(wIn) - col("n_bytes"))
      .withColumn("shard", expr(s"off div $budget"))
      .withColumn("offset_in_shard", col("off") - min(col("off")).over(wShard))
      .select(col("doc_id"), col("lang"), col("n_bytes"), col("shard"),
        col("offset_in_shard"))
      .orderBy(col("lang").asc_nulls_last, col("doc_id").asc_nulls_last)
  }

  val m08Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, lang, n_bytes,
      |    CAST(sum(n_bytes) OVER (PARTITION BY lang ORDER BY doc_id ASC NULLS LAST
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      - n_bytes AS off
      |  FROM t),
      |s AS (SELECT *, off // 65536 AS shard FROM o)
      |SELECT doc_id, lang, n_bytes, shard,
      |  off - min(off) OVER (PARTITION BY lang, shard) AS offset_in_shard
      |FROM s
      |ORDER BY lang ASC NULLS LAST, doc_id ASC NULLS LAST""".stripMargin

  /** The 9 sampled plane columns of the dHash grid: floor(c·16/9). */
  private val DhashCols: Seq[Int] = (0 to 8).map(c => c * 16 / 9)

  /** m09: perceptual (near-dup) image dedup — the image counterpart of
    * d02/d04 and the operator m05's exact payload hash structurally
    * cannot be: a re-PROCESSED crawl (same picture, new bytes) hashes
    * differently but LOOKS the same. Classic dHash over the GIMG pixel
    * plane: sample a fixed 8×9 grid from the raster (rows stretch with
    * image height — the "resize"), emit one bit per horizontally
    * adjacent sample pair (left < right), giving a 64-bit gradient
    * signature that is invariant to uniform brightness change. Stored
    * as two 32-bit halves so every shift stays under the sign bit on
    * both engines.
    *
    * The corpus is the media lake ∪ a brightness-shifted re-encode of
    * every image (each data byte +1 via a printable-ASCII translate
    * before encoding — the deterministic stand-in for a re-JPEG'd
    * crawl; gradient signs are unchanged, so each re-encode collides
    * with its original at hamming 0 while md5/m05 sees disjoint
    * payloads). Candidates come from 4 × 16-bit signature bands —
    * hamming ≤ 3 GUARANTEES a whole-band collision by pigeonhole — and
    * the banded self-join routes through [[Scale.gridSelfJoinPairs]],
    * so a hot band bucket (monochrome rasters, boilerplate headers at
    * corpus scale) splits into grid cells instead of one task's O(n²).
    * Verification is exact: bit_count of the signature XOR, kept at
    * ≤ 3. Pixel extraction reads the PAYLOAD bytes (substring/hex/conv
    * in whole-stage codegen, m07's header idiom applied to the plane)
    * — 72 sampled bytes per image, never the full raster.
    *
    * Oracle: recomputes the same grid from the source text (pixel =
    * ord(char), padding = 0, shifted copy = ord+1 — exactly what the
    * encoder wrote; fixture is ASCII 32..121 so +1 stays printable),
    * bands and verifies in SQL. Grid-vs-plain join equivalence is the
    * helper's proven contract (GridPropertySpec).
    */
  def m09PerceptualDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val shiftFrom = (32 to 126).map(_.toChar).mkString
    val shiftTo = (33 to 127).map(_.toChar).mkString
    val reproc = docs.select((col("doc_id") + 100000L).as("doc_id"),
      translate(col("text"), shiftFrom, shiftTo).as("text"))
    val media = gimgMediaOf(docs.select(col("doc_id"), col("text")))
      .unionByName(gimgMediaOf(reproc))
    // height from header bytes 7-8 (u16 BE); plane starts at byte 14
    // (1-based). Sampled position (r, c): row floor(r·h/8), col
    // DhashCols(c) — always inside the plane since floor(7h/8) ≤ h-1.
    val withH = media.withColumn("h",
      conv(hex(expr("substring(payload, 8, 2)")), 16, 10).cast("long"))
    val px = for { r <- 0 until 8; c <- 0 to 8 } yield
      conv(hex(expr(
        s"substring(payload, 14 + (($r * h) div 8) * 16 + ${DhashCols(c)}, 1)")),
        16, 10).cast("int").as(s"px_${r}_$c")
    val sampled = withH.select(col("doc_id") +: px: _*)
    def half(rows: Range): Column = rows.flatMap { r =>
      (0 until 8).map { c =>
        when(col(s"px_${r}_$c") < col(s"px_${r}_${c + 1}"),
          lit(1L << ((r % 4) * 8 + c))).otherwise(lit(0L))
      }
    }.reduce(_ + _)
    // one lineage cut on the 3-column signature table (guide §8:
    // decide on a lightweight proxy, compute the heavy extraction
    // ONCE): without it the payload build + 72-sample grid runs THREE
    // times — once for the grid census collect and once per self-join
    // side — and the 72-term expression tree is re-optimized/codegen'd
    // in every copy (measured: ~2s of driver gaps at sf0.1). The
    // checkpoint holds doc_id + two longs per image, never the payload.
    val sigs = sampled.select(col("doc_id"),
      half(0 until 4).as("lo"), half(4 until 8).as("hi"))
      .localCheckpoint(false)
    val bands = sigs.select(col("doc_id"), col("lo"), col("hi"),
      posexplode(array(
        col("lo").bitwiseAND(lit(65535L)),
        shiftright(col("lo"), 16).bitwiseAND(lit(65535L)),
        col("hi").bitwiseAND(lit(65535L)),
        shiftright(col("hi"), 16).bitwiseAND(lit(65535L))))
        .as(Seq("band", "key")))
    val a = bands.select(col("doc_id").as("id1"), col("lo").as("lo1"),
      col("hi").as("hi1"), col("band"), col("key"))
    val b = bands.select(col("doc_id").as("id2"), col("lo").as("lo2"),
      col("hi").as("hi2"), col("band"), col("key"))
    Scale.gridSelfJoinPairs(a, b, Seq("band", "key"), "id1", "id2",
        rowsPerCell = 2000)
      .withColumn("hamming", expr(
        "CAST(bit_count(lo1 ^ lo2) + bit_count(hi1 ^ hi2) AS INT)"))
      .filter(col("hamming") <= 3)
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"), col("hamming"))
      .distinct()
      .orderBy(col("id1").asc_nulls_last, col("id2").asc_nulls_last)
  }

  val m09Sql: String =
    """WITH src AS (
      |  SELECT doc_id, text, 0 AS shift FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text, 1 FROM documents),
      |t AS (
      |  SELECT doc_id, shift, text, length(text) AS n,
      |    (length(text) + 15) // 16 AS h
      |  FROM src),
      |smp AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 72), k ->
      |      CASE WHEN (((k // 9) * h) // 8) * 16
      |          + ([0,1,3,5,7,8,10,12,14])[(k % 9) + 1] < n
      |        THEN ord(substr(text, (((k // 9) * h) // 8) * 16
      |          + ([0,1,3,5,7,8,10,12,14])[(k % 9) + 1] + 1, 1)) + shift
      |        ELSE 0 END) AS px
      |  FROM t),
      |lohi AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(0, 32), i ->
      |      CASE WHEN px[(i // 8) * 9 + (i % 8) + 1] < px[(i // 8) * 9 + (i % 8) + 2]
      |        THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END)) AS BIGINT) AS lo,
      |    CAST(list_sum(list_transform(range(0, 32), i ->
      |      CASE WHEN px[(i // 8 + 4) * 9 + (i % 8) + 1] < px[(i // 8 + 4) * 9 + (i % 8) + 2]
      |        THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END)) AS BIGINT) AS hi
      |  FROM smp),
      |bands AS (
      |  SELECT doc_id, lo, hi, b,
      |    CASE b WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
      |           WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS key
      |  FROM lohi CROSS JOIN (VALUES (0), (1), (2), (3)) AS bs(b)),
      |pairs AS (
      |  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2,
      |    CAST(bit_count(xor(l.lo, r.lo)) + bit_count(xor(l.hi, r.hi)) AS INT)
      |      AS hamming
      |  FROM bands l JOIN bands r
      |    ON l.b = r.b AND l.key = r.key AND l.doc_id < r.doc_id)
      |SELECT id1, id2, hamming FROM pairs
      |WHERE hamming <= 3
      |ORDER BY id1 ASC NULLS LAST, id2 ASC NULLS LAST""".stripMargin
}
