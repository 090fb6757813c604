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

# --- distributed init=vq_teacher: the POD-SCALE FLAGSHIP RECIPE (VERDICT r4
# task 1).  The CLI seeds (merged reservoir -> partitioned quantize ->
# multihost teacher EM -> paired-round seed passes) AND trains the annealed
# Gaussian EM, all under train.distributed data.source=stream.  Frame
# accuracy and params must match the single-host streamed recipe (identical
# codebook by construction; everything else float-addition-order). ---
if frames_dir:
    from multimodalworddiscovery_tpu import cli
    from multimodalworddiscovery_tpu.data.stream import (
        ShardedCorpusReader,
        train_streaming,
    )
    from multimodalworddiscovery_tpu.models import hmm_gaussian as hg
    from multimodalworddiscovery_tpu.utils.checkpoint import CheckpointManager

    wd3 = pathlib.Path(frames_dir).parent / "vqt_wd"
    old = sys.argv
    sys.argv = [
        "mwd", "train", "--workdir", str(wd3),
        "--override", "data.source=stream", f"data.dir={frames_dir}",
        "model.name=hmm_gaussian", "model.init=vq_teacher",
        "model.vq_codes=16", "model.teacher_iters=4", "model.seed_rounds=2",
        "model.n_components=2", "model.feat_dim=8", "model.anneal_iters=2",
        "train.num_iterations=4", "train.data_parallel=true",
        "train.distributed=true", "train.checkpoint_every=4",
    ]
    try:
        cli.main()
    finally:
        sys.argv = old

    freader = ShardedCorpusReader(frames_dir)
    fc, fg = freader.materialize()
    # single-host streamed recipe, same hyperparameters (local per-process
    # compute; both processes run the identical reference)
    ps = hg.init_vq_teacher_streaming(
        freader, wd3 / f"codes_local_{pid}", max_jump=3, n_components=2,
        key=jax.random.PRNGKey(0), n_codes=16, teacher_iters=4,
        seed_rounds=2,
    )
    sched = np.concatenate([np.linspace(0.25, 1.0, 2), np.ones(2)])
    ps, _ = train_streaming(hg, ps, freader, 4, scale_schedule=sched)

    pd_, _ = CheckpointManager(wd3 / "ckpt").restore(
        hg.init(fc, n_components=2, max_jump=3)
    )
    mean_err = float(np.max(np.abs(np.asarray(ps.means) - np.asarray(pd_.means))))
    assert mean_err < 5e-2, f"distributed vq_teacher means drift: {mean_err}"

    wm = np.asarray(fc.src_mask()) & (np.asarray(fg.alignment) > 0)

    def acc(p):
        pred = np.asarray(hg.align(p, fc))
        return float((pred == np.asarray(fg.alignment))[wm].mean())

    a_single, a_dist = acc(ps), acc(pd_)
    assert abs(a_single - a_dist) < 0.05, (a_single, a_dist)
    print(f"VQTEACHER OK {a_dist:.4f} single={a_single:.4f} "
          f"mean_err={mean_err:.2e}", flush=True)

    # --- model.vq_frontend x distributed FRESH fit (previously gated as
    # "writes would race"): the merged-reservoir codebook + partitioned
    # quantize-writes + barrier make the fit race-free ---
    wd4 = pathlib.Path(frames_dir).parent / "vqf_wd"
    sys.argv = [
        "mwd", "train", "--workdir", str(wd4),
        "--override", "data.source=stream", f"data.dir={frames_dir}",
        "model.name=hmm", "model.vq_frontend=true", "model.vq_codes=16",
        "train.num_iterations=2", "train.data_parallel=true",
        "train.distributed=true", "train.checkpoint_every=2",
    ]
    try:
        cli.main()
    finally:
        sys.argv = old
    assert (wd4 / "vq_codebook.npy").exists()
    assert (wd4 / "vq_frontend_codes" / "manifest.json").exists()
    print("VQFRONT OK", flush=True)
