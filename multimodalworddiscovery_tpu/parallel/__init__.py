"""Parallelism: data-parallel EM over a TPU device mesh (single-host
sharding in data_parallel.py, pod-scale multi-process in multihost.py,
time-axis sharding in sequence.py)."""

from multimodalworddiscovery_tpu.parallel.data_parallel import (
    make_data_parallel_step,
    make_shard_map_em_step,
    shard_corpus,
)

__all__ = ["make_data_parallel_step", "make_shard_map_em_step", "shard_corpus"]
