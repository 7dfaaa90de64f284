package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.{ImageHash, Multimodal, Segmentation}

/** q38: multimodal binary-column pipeline — documents → opaque binary
  * payloads + modality → batch decode pass → typed metadata. The
  * decode stub's outputs are deterministic functions of the payload
  * byte length, so DuckDB mirrors them exactly (strlen = UTF-8 byte
  * count = Spark's binary length); the feature vector is covered by
  * MultimodalSpec instead (not SQL-expressible).
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q38_multimodal",
      (s, dir) => {
        Multimodal.decode(
          Multimodal.mediaTable(Tables.load(s, dir, "documents")),
          Multimodal.StubDecoder)
          .toDF()
          .select(col("doc_id"), col("modality"), col("n_bytes"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_frames").cast("long").as("n_frames"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               strlen(text) AS n_bytes,
               640 - strlen(text) % 320 AS width,
               480 - strlen(text) % 240 AS height,
               1 + strlen(text) % 24 AS n_frames
        FROM documents WHERE text IS NOT NULL
        ORDER BY doc_id""")),

    // ---- q51: video frame sampling (every 2nd frame, REAL demux) ----
    // 1→N partition-local explode over REAL container boundaries
    // (r6 verdict #1): frames come from Y4mDecoder's demuxer walking
    // the actual YUV4MPEG2 stream — offset = first byte of each
    // frame's plane data (38-byte fixture header + per-frame 6-byte
    // FRAME lines), frame_len = the mono Y-plane size. All container
    // arithmetic over doc_id by fixture construction, so DuckDB
    // mirrors the demux exactly. A per-frame LUMA SUM over the sliced
    // frame_bytes pins that the sampled bytes are the real plane data
    // (an off-by-one in the demux offset shifts every sample by 7919
    // and breaks the hash), not just the right offsets.
    QueryDef(
      "q51_frame_sample",
      (s, dir) => {
        import s.implicits._
        Multimodal.frameSample(
          Multimodal.videoFixture(Tables.load(s, dir, "documents")),
          step = 2, Multimodal.Y4mDecoder)
          .map { f =>
            var luma = 0L
            var i = 0
            while (i < f.frame_bytes.length) {
              luma += (f.frame_bytes(i) & 0xff); i += 1
            }
            (f.doc_id, f.frame_idx, f.offset,
              f.frame_bytes.length.toLong, luma)
          }
          .toDF("doc_id", "frame_idx", "offset", "frame_len", "luma_sum")
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""
        WITH v AS (
          SELECT doc_id, 16 * (1 + doc_id % 2) AS w,
                 1 << (doc_id % 4) AS nf
          FROM documents),
        frames AS (
          SELECT doc_id, w * 16 AS sz,
                 unnest(range(0, nf, 2)) AS frame_idx
          FROM v),
        px AS (
          SELECT doc_id, sz, frame_idx,
                 unnest(range(0, sz)) AS k
          FROM frames)
        SELECT doc_id, frame_idx,
               38 + (frame_idx + 1) * 6 + frame_idx * sz AS offset,
               sz AS frame_len,
               CAST(sum((doc_id * 131 + (frame_idx * sz + k) * 7919) % 256)
                 AS BIGINT) AS luma_sum
        FROM px
        GROUP BY doc_id, frame_idx, sz
        ORDER BY doc_id, frame_idx""")),

    // ---- q97: REAL image decoding via javax.imageio ----
    // The r5 verdict's "ship a real decoder" item: generate a real
    // two-tone PNG per document (scan-local map), decode it with the
    // JDK's ImageIO — actual container parsing, actual pixels — and
    // emit dims + the 8-bucket luminance histogram in exploded long
    // form (the q74/q78 array-output lesson). Every decoded quantity
    // is arithmetic over doc_id by fixture construction and PNG is
    // lossless, so the REAL decode path hash-gates exactly: fractions
    // are 0 / 0.5 / 1.0 (halves split the even-height pixel count),
    // all exact in float.
    QueryDef(
      "q97_imageio_decode",
      (s, dir) => {
        val media = Multimodal.imageFixture(Tables.load(s, dir, "documents"))
        Multimodal.decode(media, Multimodal.ImageIoDecoder)
          .toDF()
          .select(col("doc_id"), col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_frames").cast("long").as("n_frames"),
            posexplode(col("feature")).as(Seq("bucket", "frac")))
          .select(col("doc_id"), col("width"), col("height"),
            col("n_frames"), col("bucket").cast("long").as("bucket"),
            col("frac").cast("double").as("frac"))
          .orderBy(col("doc_id"), col("bucket"))
      },
      Some("""
        WITH img AS (
          SELECT doc_id,
                 16 + doc_id % 17 AS width,
                 2 * (8 + doc_id % 9) AS height,
                 (doc_id % 256) // 32 AS b1,
                 ((doc_id * 7) % 256) // 32 AS b2
          FROM documents),
        f AS (
          SELECT doc_id, width, height, b1, b2,
                 unnest(range(0, 8)) AS bucket
          FROM img)
        SELECT doc_id,
               CAST(width AS BIGINT) AS width,
               CAST(height AS BIGINT) AS height,
               CAST(1 AS BIGINT) AS n_frames,
               CAST(bucket AS BIGINT) AS bucket,
               CAST(CASE WHEN b1 = b2 AND bucket = b1 THEN 1.0
                    WHEN bucket = b1 OR bucket = b2 THEN 0.5
                    ELSE 0.0 END AS DOUBLE) AS frac
        FROM f ORDER BY doc_id, bucket""")),

    // ---- q98: REAL audio decoding via javax.sound.sampled ----
    // The audio analog of q97 (zero new dependencies): generate a
    // real 16-bit mono PCM WAV per document, decode it with the JDK's
    // AudioSystem — actual RIFF container parsing, actual samples —
    // and emit the header-derived metadata plus the 8-bucket
    // amplitude histogram in exploded long form. Sample counts are
    // powers of two, so count/n fractions are exact in float; sample
    // values are all-integer arithmetic over (doc_id, i), so DuckDB
    // replays the histogram from generate_series — the decoder's
    // output hash-gates against pure SQL with no decoded artifact in
    // the loop. n_bytes = 44 + 2n pins the canonical RIFF header size
    // (MultimodalSpec asserts the writer emits it).
    QueryDef(
      "q98_wav_decode",
      (s, dir) => {
        val media = Multimodal.audioFixture(Tables.load(s, dir, "documents"))
        Multimodal.decode(media, Multimodal.WavDecoder)
          .toDF()
          .select(col("doc_id"), col("n_bytes"),
            col("width").cast("long").as("sample_hz"),
            col("height").cast("long").as("bits"),
            col("n_frames").cast("long").as("n_samples"),
            posexplode(col("feature")).as(Seq("bucket", "frac")))
          .select(col("doc_id"), col("n_bytes"), col("sample_hz"),
            col("bits"), col("n_samples"),
            col("bucket").cast("long").as("bucket"),
            col("frac").cast("double").as("frac"))
          .orderBy(col("doc_id"), col("bucket"))
      },
      Some("""
        WITH a AS (
          SELECT doc_id, 256 * (1 + doc_id % 2) AS n FROM documents),
        s AS (
          SELECT doc_id, n, unnest(range(0, n)) AS i FROM a),
        hb AS (
          SELECT doc_id, ((doc_id * 131 + i * 7919) % 65536) // 8192 AS bucket,
                 count(*) AS c
          FROM s GROUP BY 1, 2),
        f AS (
          SELECT doc_id, n, unnest(range(0, 8)) AS bucket FROM a)
        SELECT f.doc_id,
               44 + 2 * f.n AS n_bytes,
               CAST(8000 AS BIGINT) AS sample_hz,
               CAST(16 AS BIGINT) AS bits,
               CAST(f.n AS BIGINT) AS n_samples,
               CAST(f.bucket AS BIGINT) AS bucket,
               CAST(COALESCE(hb.c, 0) AS DOUBLE) / f.n AS frac
        FROM f LEFT JOIN hb ON hb.doc_id = f.doc_id AND hb.bucket = f.bucket
        ORDER BY f.doc_id, f.bucket""")),

    // ---- q99: REAL video decoding via the Y4M demuxer ----
    // The video analog of q97/q98 and the r6 verdict's #1 item:
    // generate a real YUV4MPEG2 stream per document (mono colorspace,
    // 1–8 frames), demux it with the hand-rolled pure-JVM parser —
    // actual ASCII header parsing, actual FRAME-delimited planes —
    // and emit the container-derived metadata plus the 8-bucket luma
    // histogram over ALL frames in exploded long form. Total luma
    // sample counts are powers of two, so count/n fractions are exact
    // in float; luma values are all-integer arithmetic over
    // (doc_id, j), so DuckDB replays the histogram from
    // generate_series — the decoder's output hash-gates against pure
    // SQL with no decoded artifact in the loop. n_bytes =
    // 38 + nf·(6 + w·h) pins the exact container layout the muxer
    // emits (header + per-frame FRAME lines + planes).
    QueryDef(
      "q99_y4m_decode",
      (s, dir) => {
        val media = Multimodal.videoFixture(Tables.load(s, dir, "documents"))
        Multimodal.decode(media, Multimodal.Y4mDecoder)
          .toDF()
          .select(col("doc_id"), col("n_bytes"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_frames").cast("long").as("n_frames"),
            posexplode(col("feature")).as(Seq("bucket", "frac")))
          .select(col("doc_id"), col("n_bytes"), col("width"),
            col("height"), col("n_frames"),
            col("bucket").cast("long").as("bucket"),
            col("frac").cast("double").as("frac"))
          .orderBy(col("doc_id"), col("bucket"))
      },
      Some("""
        WITH v AS (
          SELECT doc_id, 16 * (1 + doc_id % 2) AS w,
                 1 << (doc_id % 4) AS nf
          FROM documents),
        a AS (
          SELECT doc_id, w, nf, w * 16 * nf AS n FROM v),
        s AS (
          SELECT doc_id, n, unnest(range(0, n)) AS j FROM a),
        hb AS (
          SELECT doc_id, ((doc_id * 131 + j * 7919) % 256) // 32 AS bucket,
                 count(*) AS c
          FROM s GROUP BY 1, 2),
        f AS (
          SELECT doc_id, w, nf, n, unnest(range(0, 8)) AS bucket FROM a)
        SELECT f.doc_id,
               38 + f.nf * (6 + f.w * 16) AS n_bytes,
               CAST(f.w AS BIGINT) AS width,
               CAST(16 AS BIGINT) AS height,
               CAST(f.nf AS BIGINT) AS n_frames,
               CAST(f.bucket AS BIGINT) AS bucket,
               CAST(COALESCE(hb.c, 0) AS DOUBLE) / f.n AS frac
        FROM f LEFT JOIN hb ON hb.doc_id = f.doc_id AND hb.bucket = f.bucket
        ORDER BY f.doc_id, f.bucket""")),

    // ---- q124: audio frame features (energy + zero-crossings) ----
    // The q98 decode path one stage deeper: real WAV decode → 64-
    // sample frames → Σs² and zero-crossing counts, all integer-exact
    // over samples sᵢ = ((id·131 + i·7919) mod 65536) − 32768, so the
    // oracle replays decode→frame→feature from generate_series with
    // a lag window for the crossings.
    QueryDef(
      "q124_audio_frames",
      (s, dir) => {
        Multimodal.audioFrameFeatures(
            Multimodal.audioFixture(Tables.load(s, dir, "documents")),
            frameLen = 64)
          .toDF()
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""
        WITH a AS (
          SELECT doc_id, 256 * (1 + doc_id % 2) AS n FROM documents),
        s AS (
          SELECT doc_id, i // 64 AS frame_idx, i % 64 AS k,
                 ((doc_id * 131 + i * 7919) % 65536) - 32768 AS sv
          FROM a, unnest(range(0, n)) AS u(i)),
        l AS (
          SELECT doc_id, frame_idx, sv,
                 lag(sv) OVER (PARTITION BY doc_id, frame_idx
                   ORDER BY k) AS pv
          FROM s)
        SELECT doc_id, frame_idx, count(*) AS n_samples,
               CAST(sum(sv * sv) AS BIGINT) AS energy,
               CAST(coalesce(sum(CASE WHEN pv IS NOT NULL AND
                    ((sv >= 0) <> (pv >= 0)) THEN 1 ELSE 0 END), 0)
                 AS BIGINT) AS crossings
        FROM l GROUP BY doc_id, frame_idx
        ORDER BY doc_id, frame_idx""")),

    // ---- q125: video frame stats + scene-cut signal ----
    // Real Y4M demux → per-frame luma sum + successive-frame absolute
    // difference (NULL for each payload's first frame). The previous
    // frame's pixel is analytic — y(j − w·h) — so the oracle needs no
    // self-join: one generate_series per payload replays the whole
    // demux→diff path.
    QueryDef(
      "q125_video_frame_stats",
      (s, dir) => {
        Multimodal.videoFrameStats(
            Multimodal.videoFixture(Tables.load(s, dir, "documents")))
          .toDF()
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""
        WITH v AS (
          SELECT doc_id, 16 * (1 + doc_id % 2) AS w,
                 1 << (doc_id % 4) AS nf
          FROM documents),
        px AS (
          SELECT doc_id, w, j // (w * 16) AS f,
                 (doc_id * 131 + j * 7919) % 256 AS y,
                 (doc_id * 131 + (j - w * 16) * 7919) % 256 AS yp
          FROM v, unnest(range(0, w * 16 * nf)) AS u(j))
        SELECT doc_id, f AS frame_idx,
               CAST(w * 16 AS BIGINT) AS n_px,
               CAST(sum(y) AS BIGINT) AS luma_sum,
               CASE WHEN f = 0 THEN NULL
                    ELSE CAST(sum(abs(y - yp)) AS BIGINT) END AS diff_sum
        FROM px GROUP BY doc_id, f, w
        ORDER BY doc_id, frame_idx""")),

    // ---- q167: perceptual image hash (dHash) over REAL decode ----
    // 18x16 gray PNG per doc (2x2 constant blocks of quadratic
    // residues; id % 50 == 1 replays the previous id's pattern with 3
    // perturbed blocks = planted image near-dups), REAL ImageIO
    // decode, 9x8 dHash packed as two non-negative 32-bit halves.
    // The oracle replays the DECODED hash from the block arithmetic
    // (PNG is lossless, constant 2x2 blocks make the block-sum
    // comparison equal the block-gray comparison).
    QueryDef(
      "q167_image_dhash",
      (s, dir) => {
        ImageHash.dhash(
            ImageHash.dhashFixture(Tables.load(s, dir, "documents")))
          .select(col("doc_id"), col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("hash_hi"), col("hash_lo"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        $dhashCte
        SELECT doc_id, CAST(18 AS BIGINT) AS width,
               CAST(16 AS BIGINT) AS height, hash_hi, hash_lo
        FROM h ORDER BY doc_id""")),

    // ---- q168: image near-dup via banded dHash Hamming join ----
    // 8 bands of 8 bits block candidates — EXACT recall at Hamming
    // <= 7 by pigeonhole (7 differing bits cannot touch all 8 bands),
    // so the blocked Spark plan must equal the oracle's brute-force
    // all-pairs scan, not approximate it. Ids-only candidate
    // exchange; exact bit_count verify.
    QueryDef(
      "q168_dhash_neardup",
      (s, dir) => {
        ImageHash.nearDuplicatePairs(
            ImageHash.dhash(ImageHash.dhashFixture(
              Tables.load(s, dir, "documents"))), maxHamming = 7)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        $dhashCte
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.hash_hi, b.hash_hi)) +
                    bit_count(xor(a.hash_lo, b.hash_lo)) AS BIGINT)
                 AS hamming
        FROM h a JOIN h b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.hash_hi, b.hash_hi)) +
              bit_count(xor(a.hash_lo, b.hash_lo)) <= 7
        ORDER BY doc_a, doc_b""")),

    // ---- q186: voice-activity segments over the REAL WAV decode ----
    // q124's frame energies thresholded into maximal voiced runs —
    // the silence-trim pass a speech pipeline runs before ASR. The
    // per-doc threshold is an exact integer cross-multiply (energy ·
    // n_frames > Σenergy), runs become segments via the
    // gaps-and-islands frame_idx − row_number key, and the oracle
    // replays the whole decode→frame→segment path from the q124
    // analytic signal. One doc_id exchange end-to-end.
    QueryDef(
      "q186_audio_segments",
      (s, dir) => {
        Segmentation.audioSegments(
            Multimodal.audioFrameFeatures(
              Multimodal.audioFixture(Tables.load(s, dir, "documents")),
              frameLen = 64).toDF())
          .orderBy(col("doc_id"), col("seg_idx"))
      },
      Some("""
        WITH a AS (
          SELECT doc_id, 256 * (1 + doc_id % 2) AS n FROM documents),
        s AS (
          SELECT doc_id, i // 64 AS frame_idx, i % 64 AS k,
                 ((doc_id * 131 + i * 7919) % 65536) - 32768 AS sv
          FROM a, unnest(range(0, n)) AS u(i)),
        l AS (
          SELECT doc_id, frame_idx, sv,
                 lag(sv) OVER (PARTITION BY doc_id, frame_idx
                   ORDER BY k) AS pv
          FROM s),
        fr AS (
          SELECT doc_id, frame_idx,
                 CAST(sum(sv * sv) AS BIGINT) AS energy,
                 CAST(coalesce(sum(CASE WHEN pv IS NOT NULL AND
                      ((sv >= 0) <> (pv >= 0)) THEN 1 ELSE 0 END), 0)
                   AS BIGINT) AS crossings
          FROM l GROUP BY doc_id, frame_idx),
        fl AS (
          SELECT *, sum(energy) OVER (PARTITION BY doc_id) AS tot_e,
                 count(*) OVER (PARTITION BY doc_id) AS n_f
          FROM fr),
        v AS (
          SELECT doc_id, frame_idx, energy, crossings,
                 frame_idx - row_number() OVER (PARTITION BY doc_id
                   ORDER BY frame_idx) AS grp
          FROM fl WHERE energy * n_f > tot_e),
        seg AS (
          SELECT doc_id, min(frame_idx) AS start_frame,
                 count(*) AS n_frames,
                 CAST(sum(energy) AS BIGINT) AS energy_sum,
                 CAST(sum(crossings) AS BIGINT) AS crossings_sum
          FROM v GROUP BY doc_id, grp)
        SELECT doc_id,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY start_frame) AS seg_idx,
               start_frame, n_frames, energy_sum, crossings_sum
        FROM seg ORDER BY doc_id, seg_idx""")),

    // ---- q187: shot boundaries + keyframes over the REAL Y4M demux ----
    // q125's luma-diff track thresholded into shots (cut where diff ·
    // n_diffs > Σdiff; frame 0 always opens shot 0), each shot
    // reduced to start/length/total luma plus its keyframe (brightest
    // frame, ties → earliest) — the shot-split-then-sample pass a VLM
    // data pipeline runs. Oracle replays the analytic luma plane.
    QueryDef(
      "q187_video_scenes",
      (s, dir) => {
        Segmentation.videoScenes(
            Multimodal.videoFrameStats(
              Multimodal.videoFixture(Tables.load(s, dir, "documents")))
              .toDF())
          .orderBy(col("doc_id"), col("scene_idx"))
      },
      Some("""
        WITH v AS (
          SELECT doc_id, 16 * (1 + doc_id % 2) AS w,
                 1 << (doc_id % 4) AS nf
          FROM documents),
        px AS (
          SELECT doc_id, w, j // (w * 16) AS f,
                 (doc_id * 131 + j * 7919) % 256 AS y,
                 (doc_id * 131 + (j - w * 16) * 7919) % 256 AS yp
          FROM v, unnest(range(0, w * 16 * nf)) AS u(j)),
        fr AS (
          SELECT doc_id, f AS frame_idx,
                 CAST(sum(y) AS BIGINT) AS luma_sum,
                 CASE WHEN f = 0 THEN NULL
                      ELSE CAST(sum(abs(y - yp)) AS BIGINT) END AS diff_sum
          FROM px GROUP BY doc_id, f),
        st AS (
          SELECT *, CAST(sum(diff_sum) OVER (PARTITION BY doc_id)
                   AS BIGINT) AS sum_d,
                 count(diff_sum) OVER (PARTITION BY doc_id) AS n_d
          FROM fr),
        fl AS (
          SELECT doc_id, frame_idx, luma_sum,
                 CASE WHEN frame_idx = 0 OR diff_sum * n_d > sum_d
                      THEN 1 ELSE 0 END AS cut
          FROM st),
        sc AS (
          SELECT doc_id, frame_idx, luma_sum,
                 CAST(sum(cut) OVER (PARTITION BY doc_id
                   ORDER BY frame_idx) AS BIGINT) - 1 AS scene_idx
          FROM fl),
        scenes AS (
          SELECT doc_id, scene_idx, min(frame_idx) AS start_frame,
                 count(*) AS n_frames,
                 CAST(sum(luma_sum) AS BIGINT) AS scene_luma
          FROM sc GROUP BY doc_id, scene_idx),
        keyf AS (
          SELECT doc_id, scene_idx, frame_idx AS key_frame,
                 luma_sum AS key_luma,
                 row_number() OVER (PARTITION BY doc_id, scene_idx
                   ORDER BY luma_sum DESC, frame_idx) AS rn
          FROM sc)
        SELECT s.doc_id, s.scene_idx, s.start_frame, s.n_frames,
               s.scene_luma, k.key_frame, k.key_luma
        FROM scenes s JOIN keyf k
          ON k.doc_id = s.doc_id AND k.scene_idx = s.scene_idx
          AND k.rn = 1
        ORDER BY s.doc_id, s.scene_idx"""))
  )

  /** Shared oracle CTE: the q167 fixture's decoded dHash, replayed
    * arithmetically — per (doc, block) gray b, difference bits, bits
    * packed into 32-bit halves (k = (r % 4) * 8 + c).
    */
  private def dhashCte = """
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 50 = 1 THEN doc_id - 1
                      ELSE doc_id END AS seed
          FROM documents),
        i AS (
          SELECT doc_id, seed, unnest(range(0, 72)) AS idx FROM d),
        v AS (
          SELECT doc_id, idx,
                 (seed * 999983 + idx * 7919 + 12345) % 1000003 AS v
          FROM i),
        b AS (
          SELECT doc_id, idx,
                 CASE WHEN doc_id % 50 = 1 AND idx % 29 = 0
                      THEN ((v * v) % 1000003 % 256 + 128) % 256
                      ELSE (v * v) % 1000003 % 256 END AS b
          FROM v),
        bits AS (
          SELECT l.doc_id, l.idx // 9 AS r, l.idx % 9 AS c,
                 CASE WHEN l.b < rt.b THEN 1 ELSE 0 END AS bit
          FROM b l JOIN b rt
            ON rt.doc_id = l.doc_id AND rt.idx = l.idx + 1
          WHERE l.idx % 9 < 8),
        h AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN r < 4
                     THEN bit * (CAST(1 AS BIGINT) << ((r % 4) * 8 + c))
                     ELSE 0 END) AS BIGINT) AS hash_hi,
                 CAST(sum(CASE WHEN r >= 4
                     THEN bit * (CAST(1 AS BIGINT) << ((r % 4) * 8 + c))
                     ELSE 0 END) AS BIGINT) AS hash_lo
          FROM bits GROUP BY 1)"""
}
