"""Worker for tests/test_multihost.py — one OS process of a 2-process
distributed EM run on CPU (gloo collectives over localhost).

Each process: 4 virtual CPU devices -> global mesh of 8.  Loads only its own
``process_slice`` of the deterministic flickr8k-mini corpus, assembles the
global corpus, runs 3 shard_map EM steps + 1 pjit step, and compares the
result against the single-process ``hmm.train`` on the full corpus (computed
locally — parameters are replicated, so every process can check parity).

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Prints "PARITY OK <loglik>" on success (the parent test asserts it).
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")  # beat sitecustomize's "axon,cpu"
# same persistent compile cache as conftest.py — compiles dominate this test
jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from multimodalworddiscovery_tpu.parallel import multihost

multihost.initialize(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.devices()

import jax.numpy as jnp

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.data.corpus import Corpus
from multimodalworddiscovery_tpu.models import hmm
from multimodalworddiscovery_tpu.parallel import (
    make_data_parallel_step,
    make_shard_map_em_step,
)

N = 24  # deliberately NOT a multiple of 8: exercises shard padding
full, _, _ = make_flickr8k_mini(n_utterances=N, n_concepts=10, n_phones=16, seed=0)

# --- this process loads ONLY its slice (as it would from disk) ---
start, stop = multihost.process_slice(N, pid, nproc)
local = Corpus(
    src=full.src[start:stop],
    src_len=full.src_len[start:stop],
    trg=full.trg[start:stop],
    trg_len=full.trg_len[start:stop],
    src_vocab=full.src_vocab,
    trg_vocab=full.trg_vocab,
)

mesh = multihost.global_mesh()
gcorpus = multihost.global_corpus_from_local(local, mesh)
assert gcorpus.n >= N and gcorpus.n % jax.device_count() == 0

# --- distributed EM: explicit shard_map steps, then one pjit/GSPMD step ---
params = hmm.init(gcorpus)
sm_step = make_shard_map_em_step(hmm, mesh)
for _ in range(3):
    params, stats = sm_step(params, gcorpus)
dp_step = make_data_parallel_step(hmm.em_step, mesh)
params, stats = dp_step(params, gcorpus)
jax.block_until_ready(params)
ll_dist = float(stats["loglik"])

# --- single-process reference on the FULL corpus (replicated check) ---
ref_params, lls = jax.jit(lambda p, c: hmm.train(p, c, 4))(hmm.init(full), full)
ll_ref = float(lls[-1])

# params are replicated: every process holds the full tables
emit_err = float(jnp.max(jnp.abs(
    np.asarray(params.log_emit) - np.asarray(ref_params.log_emit)
)))
ll_err = abs(ll_dist - ll_ref) / max(abs(ll_ref), 1.0)
assert ll_err < 1e-5, f"loglik mismatch: {ll_dist} vs {ll_ref}"
assert emit_err < 1e-4, f"emission table mismatch: {emit_err}"
print(f"PARITY OK {ll_dist:.6f}", flush=True)
