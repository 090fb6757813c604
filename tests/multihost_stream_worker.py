"""Worker for test_multihost.py::test_two_process_streaming_em — one process
of a 2-process POD-SCALE OUT-OF-CORE EM run: each process mmap-streams its
own shard subset (parallel/multihost.train_streaming_multihost) and the
result must match resident single-process EM.

The shard directory has 5 shards over 2 processes: 3 rounds, the last round
padded with an all-zero shard on process 1 — exercising the uneven tail.

Usage: python multihost_stream_worker.py <pid> <nproc> <port> <shard_dir>
"""

import os
import pathlib
import sys

pid, nproc, port, shard_dir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from multimodalworddiscovery_tpu.parallel import multihost

multihost.initialize(f"localhost:{port}", nproc, pid)

from multimodalworddiscovery_tpu.data.stream import ShardedCorpusReader
from multimodalworddiscovery_tpu.models import hmm

reader = ShardedCorpusReader(shard_dir)
assert reader.num_shards % nproc != 0, "test wants an uneven tail"

params0 = hmm.init(reader.load_shard(0))
params, lls = multihost.train_streaming_multihost(hmm, params0, reader, 3)

# reference: resident single-process EM on the materialized corpus
full, _ = reader.materialize()
ref, lls_ref = jax.jit(lambda p, c: hmm.train(p, c, 3))(hmm.init(full), full)
np.testing.assert_allclose(lls, np.asarray(lls_ref), rtol=1e-5)
np.testing.assert_allclose(
    np.asarray(params.log_emit), np.asarray(ref.log_emit), atol=1e-4
)
print(f"PARITY OK {lls[-1]:.6f}", flush=True)

# --- distributed streamed hmm_gaussian via the CLI: exercises the
# partitioned whole-corpus re-seed (process-allgathered moments) + the
# collective checkpoint path on a REAL 2-process run ---
frames_dir = sys.argv[5] if len(sys.argv) > 5 else None
if frames_dir:
    from multimodalworddiscovery_tpu import cli

    wd = str(pathlib.Path(frames_dir).parent / "gauss_wd")
    old = sys.argv
    sys.argv = [
        "mwd", "train", "--workdir", wd,
        "--override", "data.source=stream", f"data.dir={frames_dir}",
        "model.name=hmm_gaussian", "model.init=diagonal",
        "model.anneal_iters=2",  # scale_schedule x process-spanning mesh
        "model.feat_dim=8", "train.num_iterations=2",
        "train.data_parallel=true", "train.distributed=true",
        "train.checkpoint_every=2",
    ]
    try:
        cli.main()
    finally:
        sys.argv = old
    print("GAUSS OK", flush=True)

    # --- streamed x distributed minibatch SGD via the CLI (the gradient-
    # model cell of the scaling matrix, VERDICT r4 item 4a) ---
    wd2 = str(pathlib.Path(frames_dir).parent / "attn_wd")
    sys.argv = [
        "mwd", "train", "--workdir", wd2,
        "--override", "data.source=stream", f"data.dir={shard_dir}",
        "model.name=attention", "model.dim=16", "train.batch_size=8",
        "train.num_iterations=4", "train.data_parallel=true",
        "train.distributed=true", "train.checkpoint_every=4",
    ]
    try:
        cli.main()
    finally:
        sys.argv = old
    print("ATTN STREAMMB OK", flush=True)

# --- bucketed EM spanning hosts (VERDICT r4 item 4b): static per-process
# buckets, per-bucket global assembly; must equal resident full EM exactly
# (bucketed EM is exact) ---
lo, hi = multihost.process_slice(full.n)
local = jax.tree.map(lambda x: x[lo:hi], full)
pb, lls_b = multihost.train_bucketed_multihost(
    hmm, hmm.init(full), local, [10], 3
)
np.testing.assert_allclose(lls_b, np.asarray(lls_ref), rtol=1e-5)
np.testing.assert_allclose(
    np.asarray(pb.log_emit), np.asarray(ref.log_emit), atol=1e-4
)
print("BUCKET OK", flush=True)
