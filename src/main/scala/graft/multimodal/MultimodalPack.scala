package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack

/** The graft.multimodal registration unit: each entry pairs a
  * registered query with its DuckDB oracle AT THE DECLARATION
  * SITE, so the two can never drift apart (VERDICT r16 item 8;
  * SparkEntry is the union of packs, OracleSqlSpec pins it). */
object MultimodalPack extends QueryPack {
  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q122_video_frames",
      ((s: SparkSession, d: String) => graft.multimodal.Multimodal.videoFrames(s, d)),
      graft.multimodal.Multimodal.videoFramesSql),
    // round-15: perceptual-hash image dedup — real PNG encode→JDK
    // decode→exact block-average aHash; cluster structure oracle-checked
    ("q195_image_phash",
      (graft.multimodal.Multimodal.imagePhashDedup _),
      graft.multimodal.Multimodal.imagePhashDedupSql),
    // round-15: audio fingerprint dedup — real WAV decode, exact
    // window-mean fingerprint, time-stretch invariance
    ("q196_audio_fingerprint",
      (graft.multimodal.Multimodal.audioFingerprintDedup _),
      graft.multimodal.Multimodal.audioFingerprintDedupSql),
    // round-15: shot-boundary detection over real-decoded video frames
    ("q197_shot_boundaries",
      (graft.multimodal.Multimodal.shotBoundaries _),
      graft.multimodal.Multimodal.shotBoundariesSql),
    // round-15: VAD segmentation over real-decoded WAV energies
    ("q202_vad_segments",
      (graft.multimodal.Multimodal.vadSegmentation _),
      graft.multimodal.Multimodal.vadSegmentationSql),
  )
}
