package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Segment-level structure on top of the frame tables the real
  * decoders emit ([[Multimodal.audioFrameFeatures]],
  * [[Multimodal.videoFrameStats]]): voice-activity segments from the
  * energy track, shot boundaries + keyframes from the luma-diff
  * track. These are the steps a speech/video curation pipeline runs
  * between "decode" and "sample" — trim silence before ASR, split
  * shots before frame sampling for VLM training.
  *
  * Reference scope: the reference engine has no media path at all
  * (its closest surface is the generic windowed iteration of
  * `pythonql/Executor.py`); these extend the q124/q125 frame
  * operators one pipeline stage further, the same way q125 extended
  * q99.
  *
  * Scale shape (both operators): the frame tables arrive scan-local
  * (1→N mapPartitions off the payload scan, no exchange); everything
  * here is keyed by `doc_id` — per-doc windows and a (doc, group)
  * aggregate — so the whole segmentation pass costs ONE hash
  * exchange on doc_id, rows are fixed-width numerics (never
  * payload bytes), and no window is ever unpartitioned. Thresholds
  * are per-document integer comparisons (`energy · n > Σenergy`),
  * never a collected global constant, so the plan is identical at
  * 100 TB.
  */
object Segmentation {

  /** Energy-threshold voice-activity segmentation: a frame is voiced
    * iff its energy exceeds the payload's mean frame energy (exact
    * integer cross-multiply — no division), and maximal runs of
    * voiced frames become segments via the gaps-and-islands
    * `frame_idx − row_number` key. Emits one row per segment with
    * its start, length, and summed energy/crossings.
    */
  def audioSegments(frames: DataFrame): DataFrame = {
    val wd = Window.partitionBy(col("doc_id"))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val voiced = frames
      .withColumn("_tot_e", sum(col("energy")).over(wd))
      .withColumn("_n_f", count(lit(1)).over(wd))
      .filter(col("energy") * col("_n_f") > col("_tot_e"))
      .withColumn("_grp",
        col("frame_idx") - row_number().over(wOrd).cast("long"))
    voiced
      .groupBy(col("doc_id"), col("_grp"))
      .agg(min(col("frame_idx")).as("start_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("energy_sum"),
        sum(col("crossings")).as("crossings_sum"))
      .withColumn("seg_idx", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("start_frame")))
        .cast("long"))
      .select(col("doc_id"), col("seg_idx"), col("start_frame"),
        col("n_frames"), col("energy_sum"), col("crossings_sum"))
  }

  /** Shot segmentation + keyframe selection: a cut opens wherever the
    * successive-frame luma difference exceeds the payload's mean
    * diff (integer cross-multiply; the first frame always opens shot
    * 0), shots are the running count of cuts, and each shot's
    * keyframe is its brightest frame (ties → earliest). Single-frame
    * payloads yield exactly one shot.
    */
  def videoScenes(stats: DataFrame): DataFrame = {
    val wd = Window.partitionBy(col("doc_id"))
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val cut = stats
      .withColumn("_sum_d", sum(col("diff_sum")).over(wd))
      .withColumn("_n_d", count(col("diff_sum")).over(wd))
      .withColumn("_cut",
        when(col("frame_idx") === 0 ||
          col("diff_sum") * col("_n_d") > col("_sum_d"), 1).otherwise(0))
      .withColumn("scene_idx", sum(col("_cut")).over(wRun) - 1)
    val scenes = cut.groupBy(col("doc_id"), col("scene_idx"))
      .agg(min(col("frame_idx")).as("start_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("luma_sum")).as("scene_luma"))
    val keyframes = cut
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("doc_id"), col("scene_idx"))
          .orderBy(col("luma_sum").desc, col("frame_idx"))))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("scene_idx"),
        col("frame_idx").as("key_frame"), col("luma_sum").as("key_luma"))
    scenes.join(keyframes, Seq("doc_id", "scene_idx"))
      .select(col("doc_id"), col("scene_idx"), col("start_frame"),
        col("n_frames"), col("scene_luma"), col("key_frame"),
        col("key_luma"))
  }
}
