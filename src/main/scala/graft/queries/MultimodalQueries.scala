package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

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
          Multimodal.mediaTable(Tables.load(s, dir, "documents")))
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

    // ---- q51: video frame sampling (every 4th frame) ----
    // 1→N partition-local explode; the stub's equal-byte-range slicing
    // is deterministic arithmetic over the payload length, so DuckDB
    // mirrors frame indices, offsets and slice lengths exactly.
    QueryDef(
      "q51_frame_sample",
      (s, dir) => {
        Multimodal.frameSample(
          Multimodal.mediaTable(Tables.load(s, dir, "documents")), step = 4)
          .toDF()
          .select(col("doc_id"), col("frame_idx"), col("offset"),
            length(col("frame_bytes")).cast("long").as("frame_len"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""
        WITH v AS (
          SELECT doc_id, strlen(text) AS n, 1 + strlen(text) % 24 AS nf
          FROM documents WHERE doc_id % 3 = 2 AND text IS NOT NULL),
        frames AS (
          SELECT doc_id, unnest(range(0, nf, 4)) AS frame_idx, n // nf AS sz
          FROM v)
        SELECT doc_id, frame_idx, frame_idx * sz AS offset, sz AS frame_len
        FROM frames
        ORDER BY doc_id, frame_idx"""))
  )
}
