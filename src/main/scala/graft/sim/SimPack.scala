package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack

/** The graft.sim registration unit: each entry pairs a
  * registered query with its DuckDB oracle AT THE DECLARATION
  * SITE, so the two can never drift apart (VERDICT r16 item 8;
  * SparkEntry is the union of packs, OracleSqlSpec pins it). */
object SimPack extends QueryPack {
  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    // training-data pipeline: similarity search
    ("q20_cosine_topk",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.cosineTopK(s, d)),
      graft.sim.SimilarityQueries.cosineTopKSql),
    ("q21_cosine_lsh",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.cosineLshPairs(s, d)),
      graft.sim.SimilarityQueries.cosineLshPairsSql),
    ("q31_embedding_neardup",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.embeddingNearDup(s, d)),
      graft.sim.SimilarityQueries.embeddingNearDupSql),
    // training-data pipeline: IVF similarity-search scale path
    ("q44_ivf_topk",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.ivfTopK(s, d)),
      graft.sim.SimilarityQueries.ivfTopKSql),
    ("q53_random_projection",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.randomProjection(s, d)),
      graft.sim.SimilarityQueries.randomProjectionSql),
    // round-6: k-NN majority-label propagation (embedding-space eval op)
    ("q72_knn_label",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.knnLabel(s, d)),
      graft.sim.SimilarityQueries.knnLabelSql),
    // round-7: label propagation composed over the IVF ANN stage
    // (probe-all ≡ exact ⇒ same oracle as q72)
    ("q76_knn_label_ivf",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.knnLabelIvf(s, d)),
      graft.sim.SimilarityQueries.knnLabelSql),
    // round-8: IVF top-k against the PERSISTED codebook + list tables
    // (same search semantics ⇒ same oracle as q44)
    ("q78_ivf_topk_indexed",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.ivfTopKIndexed(s, d)),
      graft.sim.SimilarityQueries.ivfTopKSql),
    // round-8: product-quantized ADC search over the compressed store
    ("q79_pq_topk",
      ((s: SparkSession, d: String) => graft.sim.ProductQuantization.pqTopK(s, d)),
      graft.sim.ProductQuantization.pqTopKSql),
    // round-8: IVF-PQ two-level composition (probe-all ≡ q79 ⇒ same oracle)
    ("q80_ivfpq_topk",
      ((s: SparkSession, d: String) => graft.sim.ProductQuantization.ivfPqTopK(s, d)),
      graft.sim.ProductQuantization.pqTopKSql),
    // round-8: IVF-PQ against the PERSISTED bucketed code table
    ("q81_ivfpq_indexed",
      ((s: SparkSession, d: String) => graft.sim.ProductQuantization.ivfPqTopKIndexed(s, d)),
      graft.sim.ProductQuantization.pqTopKSql),
    // round-8: SemDeDup-style embedding-space near-dup drop list
    ("q88_semantic_dedup",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.semanticDedup(s, d)),
      graft.sim.SimilarityQueries.semanticDedupSql),
    // round-8: centroid-based label-noise audit over the embeddings
    ("q96_label_audit",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.labelAudit(s, d)),
      graft.sim.SimilarityQueries.labelAuditSql),
    // round-8: deterministic contrastive negative sampling
    ("q101_negative_pairs",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.negativePairs(s, d)),
      graft.sim.SimilarityQueries.negativePairsSql),
    // round-8: hard-negative mining (nearest wrong-class vectors)
    ("q104_hard_negatives",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.hardNegatives(s, d)),
      graft.sim.SimilarityQueries.hardNegativesSql),
    // round-9: hard-negative mining over the PERSISTED IVF index
    // (probe-all ≡ q104 ⇒ same oracle; class filter map-side on the
    // label-carrying bucketed lists)
    ("q109_hard_negatives_ivf",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.hardNegativesIvf(s, d)),
      graft.sim.SimilarityQueries.hardNegativesSql),
    // round-9: distributed Lloyd's k-means codebook refinement — the
    // real trainer behind the IVF stride-seed stand-in
    ("q110_kmeans_assign",
      ((s: SparkSession, d: String) => graft.sim.KMeans.kmeansAssign(s, d)),
      graft.sim.KMeans.kmeansAssignSql),
    // round-9: ANN recall eval — production-nProbe IVF vs exact top-k
    ("q112_ann_recall",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.annRecall(s, d)),
      graft.sim.SimilarityQueries.annRecallSql),
    // round-9: search over the TRAINED codebook (probe-all ≡ exact ⇒
    // q20's oracle; restricted-probe recall measured in KMeansSpec)
    ("q113_ivf_trained",
      ((s: SparkSession, d: String) => graft.sim.KMeans.ivfTopKTrained(s, d)),
      graft.sim.SimilarityQueries.cosineTopKSql),
    // round-13: MMR diversified re-ranking over the q20 candidates
    ("q143_mmr_rerank",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.mmrRerank(s, d)),
      graft.sim.SimilarityQueries.mmrRerankSql),
    // round-13: SQ8 scalar-quantized asymmetric ANN (the int8 leg of
    // the compression family next to PQ/IVF-PQ)
    ("q149_sq8_topk",
      ((s: SparkSession, d: String) => graft.sim.ScalarQuantization.sqTopK(s, d)),
      graft.sim.ScalarQuantization.sqTopKSql),
    // round-13: SQ8 recall graded by the shared q112 eval contract
    ("q150_sq8_recall",
      ((s: SparkSession, d: String) => graft.sim.ScalarQuantization.sqRecall(s, d)),
      graft.sim.ScalarQuantization.sqRecallSql),
    // round-14: exact integer Gram/covariance stats of the embedding
    // corpus (PCA/whitening prep) — ONE flat 17 KB buffer per task,
    // never the oracle's N·d² exploded join
    ("q169_gram_matrix",
      (graft.sim.GramMatrix.gramMatrix _),
      graft.sim.GramMatrix.gramMatrixSql),
    // round-15: the IVF append discipline registered end-to-end —
    // persisted base index + frozen-codebook delta append, probe-all
    // search ≡ brute force so the q20 oracle checks the whole arc
    ("q174_ivf_append",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.ivfAppendTopK(s, d)),
      graft.sim.SimilarityQueries.cosineTopKSql),
    // round-15: q169's apply step — top principal direction by exact
    // integer power iteration, projection per vector, zero floats
    ("q175_top_pc_proj",
      (graft.sim.PowerIteration.topPcProjection _),
      graft.sim.PowerIteration.topPcProjectionSql),
    // round-15: embedding-space split-leakage audit — the paraphrase
    // contamination q85/q134 can't see, on q88's cell machinery
    ("q189_semantic_leakage",
      (graft.sim.SimilarityQueries.semanticSplitLeakage _),
      graft.sim.SimilarityQueries.semanticSplitLeakageSql),
    // round-15: matryoshka prefix-dim search graded by the shared
    // integer recall contract (q112/q150 family)
    ("q194_matryoshka_recall",
      (graft.sim.SimilarityQueries.matryoshkaRecall _),
      graft.sim.SimilarityQueries.matryoshkaRecallSql),
    // round-15: 1-bit binary quantization — Hamming shortlist + rescore
    ("q203_bq_topk",
      ((s: SparkSession, d: String) => graft.sim.BinaryQuantization.bqTopK(s, d)),
      graft.sim.BinaryQuantization.bqTopKSql),
    ("q204_bq_recall",
      ((s: SparkSession, d: String) => graft.sim.BinaryQuantization.bqRecall(s, d)),
      graft.sim.BinaryQuantization.bqRecallSql),
    // round-15: reciprocal-rank fusion of the three approximate searchers
    ("q213_rrf_fusion",
      (graft.sim.RankFusion.rrfFusion _),
      graft.sim.RankFusion.rrfFusionSql),
    ("q214_rrf_recall",
      (graft.sim.RankFusion.rrfRecall _),
      graft.sim.RankFusion.rrfRecallSql),
    // round-16: graded nDCG@5 eval of the IVF searcher
    ("q220_ndcg_eval",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.ndcgEval(s, d)),
      graft.sim.SimilarityQueries.ndcgEvalSql),
    // round-16: k-center coreset (farthest-first, O(k) jobs)
    ("q235_kcenter_coreset",
      (graft.sim.KCenter.kCenterCoreset _),
      graft.sim.KCenter.kCenterCoresetSql),
    // round-17: rank-biased overlap between SQ8 and exact top-5
    ("q245_rbo_eval",
      (graft.sim.RankFusion.rboEval _),
      graft.sim.RankFusion.rboEvalSql),
    // round-17: pairwise cosine between label centroids (integer grid)
    ("q261_label_affinity",
      (graft.sim.SimilarityQueries.labelCentroidAffinity _),
      graft.sim.SimilarityQueries.labelCentroidAffinitySql),
    // round-17: corpus coverage of the eval set (best-neighbor histogram)
    ("q265_eval_coverage",
      (graft.sim.SimilarityQueries.evalCoverage _),
      graft.sim.SimilarityQueries.evalCoverageSql),
    // round-17: Calinski–Harabasz scatter ratio over embedding labels
    ("q268_scatter_ratio",
      (graft.sim.SimilarityQueries.scatterRatio _),
      graft.sim.SimilarityQueries.scatterRatioSql),
    // round-16: JL sign-projection recall vs full-dim exact (q194's dual)
    ("q282_jl_recall",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.jlRecall(s, d)),
      graft.sim.SimilarityQueries.jlRecallSql),
    // round-17: the JL family's production searcher — IVF in projected space
    ("q284_jl_ivf_topk",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.jlTopKIvf(s, d)),
      graft.sim.SimilarityQueries.jlTopKIvfSql),
    // round-17: production JL searcher recall vs full-dim exact (pinned eval)
    ("q285_jl_ivf_recall",
      ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.jlIvfRecall(s, d)),
      graft.sim.SimilarityQueries.jlIvfRecallSql),
    // round-18: the DEPLOYED JL configuration — trained √N-list Lloyd
    // codebook in projected space, persisted index, probe-only pull
    ("q287_jl_trained_topk",
      ((s: SparkSession, d: String) => graft.sim.JlIvf.jlTrainedTopK(s, d)),
      graft.sim.JlIvf.jlTrainedTopKSql),
  )
}
