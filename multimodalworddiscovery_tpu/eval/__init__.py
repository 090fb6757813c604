"""Evaluation: alignment F1, word IoU, boundary P/R/F1, cluster purity,
retrieval recall@k, DTW — all computed on device (reference: utils/clusteval.py
and eval scripts, SURVEY.md §2 C11; there they are per-utterance NumPy loops).
"""

from multimodalworddiscovery_tpu.eval.metrics import (
    alignment_prf,
    boundary_prf,
    cluster_nmi,
    cluster_purity,
    word_iou,
)
from multimodalworddiscovery_tpu.eval.dtw import dtw_distance
from multimodalworddiscovery_tpu.eval.retrieval import recall_at_k, retrieval_scores_model1

__all__ = [
    "alignment_prf",
    "boundary_prf",
    "cluster_nmi",
    "cluster_purity",
    "word_iou",
    "dtw_distance",
    "recall_at_k",
    "retrieval_scores_model1",
]
