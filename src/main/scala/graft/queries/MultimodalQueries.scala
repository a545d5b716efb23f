package graft.queries

import graft.Tables
import graft.ops.Multimodal
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal binary-column queries: the documents table viewed as opaque
  * media payloads (utf8 bytes stand in for image/audio bytes — the test
  * corpus is pure ASCII, so the DuckDB oracle can reproduce every byte
  * operation on the text side). The decode STUB itself is exercised by
  * unit tests (`MultimodalSpec`), not an oracle — a real codec is
  * engine-external by design.
  */
object MultimodalQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // Typed-metadata projection over binary payloads: byte length, content
    // hash of the raw bytes, head-of-header slice. Pure map work; only the
    // payload column is read.
    "mm_binary_meta" -> ((s, d) =>
      Multimodal.asMediaTable(Tables.documents(s, d))
        .select(col("media_id"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.mime").as("mime"),
          md5(col("payload")).as("payload_md5"),
          expr("CAST(substring(payload, 1, 8) AS STRING)").as("head8"))
        .orderBy("media_id")),

    // Frame sampling: slice each payload into 256-byte frames, keep every
    // 2nd frame (posexplode + filter), hash each sampled frame. The
    // explode is shuffle-free; downstream per-frame work (a decoder, a
    // feature extractor) would parallelize over frames.
    "mm_frame_sample" -> ((s, d) =>
      Multimodal.asMediaTable(Tables.documents(s, d))
        .select(col("media_id"), posexplode(Multimodal.framesExpr("payload", 256)))
        .select(col("media_id"), col("pos").cast("long").as("frame_no"),
          col("col").as("frame"))
        .filter(col("frame_no") % 2 === 0)
        .select(col("media_id"), col("frame_no"),
          expr("octet_length(frame)").cast("long").as("frame_bytes"),
          md5(col("frame")).as("frame_md5"))
        .orderBy("media_id", "frame_no")),
    // Resize/downsample slot: stride-4 byte decimation as the
    // deterministic stand-in for a media resize (a real scaler slots into
    // the decodeStub seam like the codec). Pure HOF map work: the
    // "resized" payload keeps every 4th byte; metadata records the scale.
    // r16 (guide §1.2): the transform(sequence(1, n, 4)) → substring
    // spelling materialized a position array and paid an O(i) UTF-8
    // seek per kept character (O(n²/4) character scans per document,
    // 1.36 s at sf0.1). One DOTALL regex pass takes the first character
    // of each ≤4-char block — identical output (every 4th character,
    // including the first of a ragged tail), measured ~3× faster, and
    // a single linear scan per row at any document length.
    "mm_resize_stride" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          regexp_replace(col("text"), "(?s)(.).{0,3}", "$1").as("resized"))
        .select(col("media_id"),
          expr("CAST(length(resized) AS BIGINT)").as("n_bytes_resized"),
          lit(4L).as("stride"),
          md5(col("resized")).as("resized_md5"))
        .orderBy("media_id")),

    // 2-D tile grid — the ViT patch-embedding pre-step: the payload
    // viewed as a 64-byte-per-row raster, cut into a (row, col) grid of
    // 16-byte tiles, each content-hashed. Pure map work (one explode per
    // tile, no shuffle); downstream a patch embedder consumes
    // (media, row, col, tile) exactly like frames. Ragged right/bottom
    // tiles keep their true byte length.
    "mm_tile_grid" -> ((s, d) =>
      Multimodal.asMediaTable(Tables.documents(s, d))
        .filter(col("media_id") < 100)
        .select(col("media_id"), posexplode(Multimodal.framesExpr("payload", 64)))
        .select(col("media_id"), col("pos").cast("long").as("tile_row"),
          col("col").as("row_slice"))
        .select(col("media_id"), col("tile_row"),
          posexplode(Multimodal.framesExpr("row_slice", 16)))
        .select(col("media_id"), col("tile_row"),
          col("pos").cast("long").as("tile_col"),
          expr("octet_length(col)").cast("long").as("tile_bytes"),
          md5(col("col")).as("tile_md5"))
        .orderBy("media_id", "tile_row", "tile_col")),

    // Cross-media duplicate frames: every payload sliced into 16-byte
    // frames, each frame content-hashed, and the hash histogram reduced
    // to frames seen in MORE THAN ONE media item — the video/audio exact
    // dedup primitive (intros, watermarks, silence blocks). Explode is
    // shuffle-free; the only shuffle is the hash aggregate on frame hash,
    // with map-side partial combine, so cost scales with distinct frames
    // not corpus bytes. Top-50 by duplication count, TakeOrdered.
    "mm_frame_dedup" -> ((s, d) =>
      Multimodal.asMediaTable(Tables.documents(s, d))
        .select(col("media_id"), explode(Multimodal.framesExpr("payload", 16)).as("frame"))
        .select(col("media_id"),
          graft.ops.TextOps.hash60(col("frame").cast("string")).as("frame_h"))
        .groupBy("frame_h")
        .agg(countDistinct("media_id").as("n_media"), count(lit(1)).as("n_occ"))
        .filter(col("n_media") > 1)
        .orderBy(col("n_occ").desc, col("frame_h"))
        .limit(50)),

    // PERCEPTUAL HASH (average-hash): the image near-dup primitive — a
    // 16-bit signature from 16 equal tiles over the first 256 payload
    // bytes, bit i set iff tile i's byte mean exceeds the global mean.
    // Equal tile lengths make the comparison exact integers (tsum*16 >
    // total ⇔ mean_tile > mean_global — no float mean). The byte fan-out
    // is pure map work; the two aggregates are hash aggs with partial
    // combine; the dup flag is a window count over the 16-bit hash space
    // (bounded partitions by construction). A real image pipeline swaps
    // the byte grid for decoded luma tiles via the decodeStub seam —
    // the signature/banding mechanics are identical.
    "mm_perceptual_hash" -> ((s, d) => {
      // r16 (guide §1.2/§2.4): the explode(0..255) → ascii(substring)
      // → per-(media, tile) hash-agg → per-media window shape paid a
      // 256× row fan-out, an O(pos) UTF-8 seek per position, one
      // aggregation exchange and one window exchange BEFORE the
      // signature even existed. The per-tile sums now come from one
      // native traversal per row (CodePointGroupSums — same move as
      // MinHashSignature replacing the shingle explode), and the
      // signature folds map-side; the first exchange left in the plan
      // is the dup-count window over the finished 16-bit hash. Same
      // values (oracle unchanged; explode-form equivalence pinned in
      // MultimodalSpec).
      val hashed = Tables.documents(s, d)
        .filter(col("n_chars") >= 256)
        .select(col("doc_id").as("media_id"),
          org.apache.spark.sql.GraftSqlBridge.toColumn(
            graft.functions.CodePointGroupSums(
              org.apache.spark.sql.GraftSqlBridge.toExpression(col("text")),
              groupLen = 16, nChars = 256, squared = false)).as("sums"))
        .withColumn("total", expr("aggregate(sums, 0L, (a, x) -> a + x)"))
        .withColumn("ahash16", expr(
          """aggregate(sequence(0, 15), 0L, (a, t) ->
            |  a + IF(element_at(sums, t + 1) * 16 > total,
            |        shiftleft(CAST(1 AS BIGINT), t), 0L))"""
            .stripMargin.replaceAll("\n", " ")))
        .select("media_id", "ahash16")
      hashed
        .withColumn("n_same_hash",
          count(lit(1)).over(Window.partitionBy("ahash16")))
        .select(col("media_id"), col("ahash16"), col("n_same_hash"),
          (col("n_same_hash") > 1).as("is_dup"))
        .orderBy("media_id")
    }),

    // REAL CODEC ROUND-TRIP + perceptual hash over DECODED pixels: each
    // doc's first 256 chars become a 16×16 8-bit grayscale image, PNG-
    // encoded and decoded back via javax.imageio INSIDE the partition
    // seam (`Multimodal.encodePngGray`/`decodePngGray` — an actual image
    // codec, not the stub), then average-hashed over a true 2-D tile grid
    // (4×4 pixel boxes → 16 tiles), bit i set iff tile-sum·16 > image
    // total — exact integers end to end. PNG is lossless, so the DuckDB
    // oracle reproduces the signature from the text bytes directly: the
    // query proves decode(encode(x)) == x through the full distributed
    // path. The codec stage is per-partition imperative (codec dispatch
    // amortized); dup grouping/order stay declarative.
    "mm_decode_ahash" -> ((s, d) => {
      import s.implicits._
      val sigs = Tables.documents(s, d)
        .filter(col("n_chars") >= 256)
        .select(col("doc_id"), substring(col("text"), 1, 256).as("head"))
        .as[(Long, String)]
        .mapPartitions { rows =>
          rows.map { case (id, head) =>
            val luma = new Array[Byte](256)
            var i = 0
            while (i < 256) { luma(i) = (head.charAt(i) & 0xff).toByte; i += 1 }
            val png = Multimodal.encodePngGray(luma, 16, 16)
            val (w, h, dec) = Multimodal.decodePngGray(png)
            val tsum = new Array[Long](16)
            i = 0
            while (i < dec.length) {
              val r = i / 16
              val c = i % 16
              tsum((r / 4) * 4 + (c / 4)) += (dec(i) & 0xff)
              i += 1
            }
            val total = tsum.sum
            var ahash = 0L
            var t = 0
            while (t < 16) { if (tsum(t) * 16 > total) ahash |= (1L << t); t += 1 }
            (id, w.toLong, h.toLong, ahash)
          }
        }
        .toDF("media_id", "width", "height", "ahash16")
      sigs
        .withColumn("n_same_hash", count(lit(1)).over(Window.partitionBy("ahash16")))
        .select(col("media_id"), col("width"), col("height"), col("ahash16"),
          col("n_same_hash"), (col("n_same_hash") > 1).as("is_dup"))
        .orderBy("media_id")
    }),

    // DECODED-PIXEL RESIZE: the 16×16 grayscale image round-tripped
    // through the real PNG codec (same seam as mm_decode_ahash), then
    // box-averaged to a 4×4 raster — each output pixel the EXACT integer
    // mean (sum div 16) of its 4×4 source box. This is the thumbnail /
    // vision-model-input downsample, done on decoded samples rather than
    // raw payload bytes; lossless codec + exact division keep the oracle
    // bit-for-bit from the source text.
    "mm_resize_decoded" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .filter(col("n_chars") >= 256)
        .select(col("doc_id"), substring(col("text"), 1, 256).as("head"))
        .as[(Long, String)]
        .mapPartitions { rows =>
          rows.flatMap { case (id, head) =>
            val luma = new Array[Byte](256)
            var i = 0
            while (i < 256) { luma(i) = (head.charAt(i) & 0xff).toByte; i += 1 }
            val (_, _, dec) = Multimodal.decodePngGray(
              Multimodal.encodePngGray(luma, 16, 16))
            val sums = new Array[Long](16)
            i = 0
            while (i < dec.length) {
              sums((i / 16 / 4) * 4 + (i % 16) / 4) += (dec(i) & 0xff)
              i += 1
            }
            (0 until 16).map(px => (id, px.toLong, sums(px) / 16))
          }
        }
        .toDF("media_id", "px", "v")
        .orderBy("media_id", "px")
    }),

    // SHOT-BOUNDARY DETECTION — the classic frame-difference segmenter
    // every video pipeline runs before sampling keyframes: per-frame
    // intensity "energy" (byte sum over each 16-byte frame of the first
    // 256 payload bytes), a boundary wherever consecutive frames differ
    // by > 120 (picked to fire on ~14% of transitions at sf0.01), and a
    // running boundary count assigning each frame its shot id. Integer
    // throughout. Both windows partition by media (≤ 16 rows each) — the
    // per-title state a 1000-executor run keeps is one frame row, never a
    // video's worth. A real decoder slots into the same seam as
    // mm_perceptual_hash; the diff/segment mechanics are identical.
    "mm_shot_boundary" -> ((s, d) => {
      // r16: per-frame energies from one native pass per row
      // (CodePointGroupSums) instead of explode(0..255) + per-position
      // substring + a per-(media, frame) aggregation exchange — the
      // fan-out and the agg shuffle are gone; the lag/segment windows
      // below are the first (and only) exchange. Same values.
      val frames = Tables.documents(s, d)
        .filter(col("n_chars") >= 256)
        .select(col("doc_id").as("media_id"),
          posexplode(org.apache.spark.sql.GraftSqlBridge.toColumn(
            graft.functions.CodePointGroupSums(
              org.apache.spark.sql.GraftSqlBridge.toExpression(col("text")),
              groupLen = 16, nChars = 256, squared = false))))
        .select(col("media_id"), col("pos").cast("long").as("frame"),
          col("col").as("energy"))
      val w = Window.partitionBy("media_id").orderBy("frame")
      frames
        .withColumn("diff", abs(col("energy") - lag("energy", 1).over(w)))
        .withColumn("is_boundary", coalesce(col("diff") > 120, lit(false)))
        .withColumn("shot_id",
          sum(when(col("is_boundary"), 1L).otherwise(0L))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("media_id", "frame", "energy", "diff", "is_boundary", "shot_id")
        .orderBy("media_id", "frame")
    }),

    // VOICE-ACTIVITY DETECTION over the audio seam: windowed signal energy
    // (sum of squared samples per 32-sample window over the first 256
    // payload bytes), a fixed energy gate (315000 ≈ the corpus median, so
    // both states are well-populated), and consecutive active windows
    // merged gaps-and-islands-style into speech segments with start/end/
    // energy — the segmenter an ASR pipeline runs before transcription.
    // Integer throughout; both windows partition per media (≤ 8 rows).
    // A real PCM decoder slots into the same seam as the frame ops; the
    // energy-gate/segment-merge mechanics are identical.
    "mm_audio_vad" -> ((s, d) => {
      // r16: per-window squared-sample energies from one native pass per
      // row (CodePointGroupSums squared=true) — explode fan-out,
      // per-position substring and the per-(media, win) aggregation
      // exchange all removed; same values.
      val wins = Tables.documents(s, d)
        .filter(col("n_chars") >= 256)
        .select(col("doc_id").as("media_id"),
          posexplode(org.apache.spark.sql.GraftSqlBridge.toColumn(
            graft.functions.CodePointGroupSums(
              org.apache.spark.sql.GraftSqlBridge.toExpression(col("text")),
              groupLen = 32, nChars = 256, squared = true))))
        .select(col("media_id"), col("pos").cast("long").as("win"),
          col("col").as("ssq"))
      val w = Window.partitionBy("media_id").orderBy("win")
      wins.filter(col("ssq") > 315000)
        .withColumn("brk",
          when(col("win") - lag("win", 1).over(w) === 1, 0L).otherwise(1L))
        .withColumn("seg", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("media_id", "seg")
        .agg(min("win").as("start_win"), max("win").as("end_win"),
          count(lit(1)).as("n_windows"), sum("ssq").as("energy"))
        .select("media_id", "start_win", "end_win", "n_windows", "energy")
        .orderBy("media_id", "start_win")
    }),

    // Feature extraction over sampled frames: an 8-dim feature vector per
    // frame (md5-derived — the deterministic stand-in for an image/audio
    // embedding model; a real extractor slots into the decodeStub seam).
    // Features unpivot to (frame, dim, value) rows so the oracle compares
    // scalars, and downstream similarity ops consume them like any other
    // embedding column.
    "mm_feature_extract" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          posexplode(graft.ops.Multimodal.framesExpr("CAST(text AS BINARY)", 256)))
        .select(col("media_id"), col("pos").cast("long").as("frame_no"),
          md5(col("col")).as("h"))
        .filter(col("frame_no") % 2 === 0)
        .select(col("media_id"), col("frame_no"),
          posexplode(expr(
            "transform(sequence(0, 7), i -> CAST(conv(substring(h, i*2+1, 2), 16, 10) AS DOUBLE) / 255.0)")))
        .select(col("media_id"), col("frame_no"),
          col("pos").cast("long").as("dim"), col("col").as("feature"))
        .orderBy("media_id", "frame_no", "dim")),

    // Batched inference over the media table: fixed-size batches inside
    // each partition (the Arrow/pandas-UDF batch shape), one "model" call
    // per batch, rows back out — see Multimodal.batchInferStub. batch_rows
    // is partition-layout-dependent bookkeeping, so the ORACLE-compared
    // output drops it (the batching mechanics are pinned by unit test
    // instead); feat = payload byte-sum mod 997 is the deterministic
    // stand-in a real encoder replaces.
    "mm_batch_infer" -> ((s, d) =>
      graft.ops.Multimodal.batchInferStub(s,
          graft.ops.Multimodal.asMediaTable(Tables.documents(s, d)), 32)
        .select(col("media_id"), col("feat"), col("n_bytes"))
        .orderBy("media_id")),

    // Raw-media ingest via Spark's binaryFile source: one file per asset
    // read back as (path, length, content) — the format a multimodal lake
    // lands camera/audio dumps in before any decode. The fixture writer
    // is driver-side by construction (Sinks.binaryFilesRoundTrip guard);
    // the scan under test is distributed, parallelizing per file, and
    // the oracle recomputes byte length + sha256 from the source text.
    "mm_scan_binary_files" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text"))
      graft.ops.Sinks.binaryFilesRoundTrip(s, docs,
        s"${sys.props("java.io.tmpdir")}/graft-scratch-mm-$mmNonce/bin_docs")
        .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
          col("length"), sha2(col("content"), 256).as("digest"))
        .orderBy("fname")
    }),
  )

  // Scratch isolation for the binary-file fixture dir, mirroring
  // RelationalQueries' runNonce (concurrent Verify+Bench must not race).
  private val mmNonce: String = java.util.UUID.randomUUID.toString.take(8)

  val oracle: Map[String, String] = Map(
    "mm_perceptual_hash" ->
      """WITH p AS (SELECT doc_id AS media_id, text,
        |    unnest(range(0, 256)) AS pos
        |  FROM documents WHERE n_chars >= 256),
        |b AS (SELECT media_id, pos // 16 AS tile,
        |    CAST(ascii(substring(text, CAST(pos + 1 AS INT), 1)) AS BIGINT) AS b
        |  FROM p),
        |t AS (SELECT media_id, tile, CAST(SUM(b) AS BIGINT) AS tsum
        |  FROM b GROUP BY 1, 2),
        |tt AS (SELECT *, SUM(tsum) OVER (PARTITION BY media_id) AS total FROM t),
        |h AS (SELECT media_id,
        |    CAST(SUM(CASE WHEN tsum * 16 > total
        |         THEN CAST(1 AS BIGINT) << CAST(tile AS INT) ELSE 0 END)
        |      AS BIGINT) AS ahash16
        |  FROM tt GROUP BY 1)
        |SELECT media_id, ahash16,
        |  COUNT(*) OVER (PARTITION BY ahash16) AS n_same_hash,
        |  COUNT(*) OVER (PARTITION BY ahash16) > 1 AS is_dup
        |FROM h ORDER BY media_id""".stripMargin,
    "mm_resize_decoded" ->
      """WITH p AS (SELECT doc_id AS media_id, text,
        |    unnest(range(0, 256)) AS pos
        |  FROM documents WHERE n_chars >= 256),
        |b AS (SELECT media_id,
        |    ((pos // 16) // 4) * 4 + (pos % 16) // 4 AS px,
        |    CAST(ascii(substring(text, CAST(pos + 1 AS INT), 1)) AS BIGINT) % 256 AS b
        |  FROM p)
        |SELECT media_id, CAST(px AS BIGINT) AS px,
        |  CAST(SUM(b) // 16 AS BIGINT) AS v
        |FROM b GROUP BY 1, 2 ORDER BY media_id, px""".stripMargin,
    "mm_decode_ahash" ->
      """WITH p AS (SELECT doc_id AS media_id, text,
        |    unnest(range(0, 256)) AS pos
        |  FROM documents WHERE n_chars >= 256),
        |b AS (SELECT media_id,
        |    ((pos // 16) // 4) * 4 + (pos % 16) // 4 AS tile,
        |    CAST(ascii(substring(text, CAST(pos + 1 AS INT), 1)) AS BIGINT) % 256 AS b
        |  FROM p),
        |t AS (SELECT media_id, tile, CAST(SUM(b) AS BIGINT) AS tsum
        |  FROM b GROUP BY 1, 2),
        |tt AS (SELECT *, SUM(tsum) OVER (PARTITION BY media_id) AS total FROM t),
        |h AS (SELECT media_id,
        |    CAST(SUM(CASE WHEN tsum * 16 > total
        |         THEN CAST(1 AS BIGINT) << CAST(tile AS INT) ELSE 0 END)
        |      AS BIGINT) AS ahash16
        |  FROM tt GROUP BY 1)
        |SELECT media_id, CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
        |  ahash16,
        |  COUNT(*) OVER (PARTITION BY ahash16) AS n_same_hash,
        |  COUNT(*) OVER (PARTITION BY ahash16) > 1 AS is_dup
        |FROM h ORDER BY media_id""".stripMargin,
    "mm_audio_vad" ->
      """WITH p AS (SELECT doc_id AS media_id, text,
        |    unnest(range(0, 256)) AS pos
        |  FROM documents WHERE n_chars >= 256),
        |s AS (SELECT media_id, pos // 32 AS win,
        |    CAST(ascii(substring(text, CAST(pos + 1 AS INT), 1)) AS BIGINT) AS b
        |  FROM p),
        |w AS (SELECT media_id, win, CAST(SUM(b * b) AS BIGINT) AS ssq
        |  FROM s GROUP BY 1, 2),
        |act AS (SELECT * FROM w WHERE ssq > 315000),
        |isl AS (SELECT *, CASE WHEN win - lag(win) OVER (PARTITION BY media_id
        |      ORDER BY win) = 1 THEN 0 ELSE 1 END AS brk FROM act),
        |grp AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY media_id
        |    ORDER BY win ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg FROM isl)
        |SELECT media_id, CAST(MIN(win) AS BIGINT) AS start_win,
        |  CAST(MAX(win) AS BIGINT) AS end_win, COUNT(*) AS n_windows,
        |  CAST(SUM(ssq) AS BIGINT) AS energy
        |FROM grp GROUP BY media_id, seg ORDER BY media_id, start_win""".stripMargin,
    "mm_shot_boundary" ->
      """WITH p AS (SELECT doc_id AS media_id, text,
        |    unnest(range(0, 256)) AS pos
        |  FROM documents WHERE n_chars >= 256),
        |b AS (SELECT media_id, pos // 16 AS frame,
        |    CAST(ascii(substring(text, CAST(pos + 1 AS INT), 1)) AS BIGINT) AS b
        |  FROM p),
        |f AS (SELECT media_id, frame, CAST(SUM(b) AS BIGINT) AS energy
        |  FROM b GROUP BY 1, 2),
        |dd AS (SELECT media_id, frame, energy,
        |    abs(energy - lag(energy) OVER (PARTITION BY media_id
        |      ORDER BY frame)) AS diff
        |  FROM f),
        |sb AS (SELECT *, COALESCE(diff > 120, FALSE) AS is_boundary FROM dd)
        |SELECT media_id, frame, energy, diff, is_boundary,
        |  CAST(SUM(CASE WHEN is_boundary THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY media_id ORDER BY frame
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS shot_id
        |FROM sb ORDER BY media_id, frame""".stripMargin,
    "mm_tile_grid" ->
      """WITH rows_ AS (SELECT doc_id AS media_id, text,
        |    unnest(range(0, CAST(ceil(len(text) / 64.0) AS INT))) AS tile_row
        |  FROM documents WHERE doc_id < 100),
        |rs AS (SELECT media_id, tile_row,
        |    substr(text, CAST(tile_row*64+1 AS INT), 64) AS row_slice FROM rows_),
        |tiles AS (SELECT media_id, tile_row, row_slice,
        |    unnest(range(0, CAST(ceil(len(row_slice) / 16.0) AS INT))) AS tile_col
        |  FROM rs)
        |SELECT media_id, CAST(tile_row AS BIGINT) AS tile_row,
        |  CAST(tile_col AS BIGINT) AS tile_col,
        |  CAST(len(substr(row_slice, CAST(tile_col*16+1 AS INT), 16)) AS BIGINT)
        |    AS tile_bytes,
        |  md5(substr(row_slice, CAST(tile_col*16+1 AS INT), 16)) AS tile_md5
        |FROM tiles ORDER BY media_id, tile_row, tile_col""".stripMargin,
    // ASCII corpus ⇒ byte frames == char frames, so the oracle slices the
    // text side; 60-bit md5-prefix hash matches TextOps.hash60.
    "mm_frame_dedup" ->
      """WITH fr AS (SELECT doc_id AS media_id,
        |    ('0x'||substr(md5(unnest(list_transform(
        |      range(0, CAST(ceil(len(text) / 16.0) AS INT)),
        |      i -> substr(text, i*16+1, 16)))),1,15))::BIGINT AS frame_h
        |  FROM documents)
        |SELECT frame_h, COUNT(DISTINCT media_id) AS n_media, COUNT(*) AS n_occ
        |FROM fr GROUP BY 1 HAVING COUNT(DISTINCT media_id) > 1
        |ORDER BY n_occ DESC, frame_h LIMIT 50""".stripMargin,
    "mm_batch_infer" ->
      """WITH c AS (SELECT doc_id, length(text) AS len,
        |    unnest(generate_series(1, length(text))) AS i, text FROM documents)
        |SELECT doc_id AS media_id,
        |  CAST(SUM(ascii(substring(text, i, 1))) % 997 AS BIGINT) AS feat,
        |  CAST(MAX(len) AS BIGINT) AS n_bytes
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "mm_scan_binary_files" ->
      """SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.bin' AS fname,
        | CAST(octet_length(encode(text)) AS BIGINT) AS length,
        | sha256(text) AS digest
        |FROM documents WHERE doc_id < 50 ORDER BY fname""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id AS media_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | 'text/plain' AS mime,
        | md5(text) AS payload_md5,
        | substr(text, 1, 8) AS head8
        |FROM documents ORDER BY media_id""".stripMargin,
    "mm_resize_stride" ->
      """WITH r AS (SELECT doc_id AS media_id,
        |    array_to_string(list_transform(range(1, length(text)+1, 4),
        |      i -> substr(text, i, 1)), '') AS resized
        |  FROM documents)
        |SELECT media_id, CAST(length(resized) AS BIGINT) AS n_bytes_resized,
        |  CAST(4 AS BIGINT) AS stride, md5(resized) AS resized_md5
        |FROM r ORDER BY media_id""".stripMargin,
    "mm_feature_extract" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id,
        |    unnest(range(0, CAST(ceil(octet_length(encode(text)) / 256.0) AS INT))) AS frame_no,
        |    text
        |  FROM documents),
        |h AS (SELECT media_id, frame_no, md5(substr(text, frame_no * 256 + 1, 256)) AS h
        |  FROM f WHERE frame_no % 2 = 0),
        |dims AS (SELECT media_id, frame_no, h, unnest(range(0, 8)) AS dim FROM h)
        |SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no, CAST(dim AS BIGINT) AS dim,
        |  ('0x'||substr(h, dim*2+1, 2))::INT / 255.0 AS feature
        |FROM dims ORDER BY media_id, frame_no, dim""".stripMargin,
    "mm_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id, text,
        |    unnest(range(0, CAST(ceil(octet_length(encode(text)) / 256.0) AS INT))) AS frame_no
        |  FROM documents)
        |SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no,
        |  CAST(octet_length(encode(substr(text, frame_no * 256 + 1, 256))) AS BIGINT) AS frame_bytes,
        |  md5(substr(text, frame_no * 256 + 1, 256)) AS frame_md5
        |FROM f WHERE frame_no % 2 = 0 ORDER BY media_id, frame_no""".stripMargin,
  )
}
