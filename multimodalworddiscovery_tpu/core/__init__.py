"""Core utilities: masking, log-semiring math, mesh setup, config, metrics IO."""

from multimodalworddiscovery_tpu.core.logsemiring import (
    NEG_INF,
    log_matmul,
    log_normalize,
    masked_log,
    masked_logsumexp,
)
from multimodalworddiscovery_tpu.core.masking import (
    lengths_to_mask,
    pad_and_stack,
    pair_mask,
)

__all__ = [
    "NEG_INF",
    "log_matmul",
    "log_normalize",
    "masked_log",
    "masked_logsumexp",
    "lengths_to_mask",
    "pad_and_stack",
    "pair_mask",
]
