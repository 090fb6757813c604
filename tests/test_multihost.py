"""Multi-host data parallelism: REAL multi-process test.

Launches two OS processes (4 virtual CPU devices each -> 8-device global
mesh, gloo collectives over localhost — the CPU stand-in for ICI/DCN) that
run distributed EM via the process-spanning mesh and check parity against
the single-process result (tests/multihost_worker.py).

SURVEY.md §5.8: the reference has no distributed backend at all; this is the
pod-scale half of the TPU-native equivalent (single-host sharding is
test_parallel.py).
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = pathlib.Path(__file__).parent / "multihost_worker.py"
REPO = WORKER.parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_em_parity():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(REPO),
            env={**os.environ,
                 "PYTHONPATH": f"{REPO}:{os.environ.get('PYTHONPATH', '')}"},
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert "PARITY OK" in out, f"worker {i} no parity line:\n{out[-4000:]}"
    # both processes computed the identical replicated result
    lls = [float(o.split("PARITY OK")[1].split()[0]) for o in outs]
    np.testing.assert_allclose(lls[0], lls[1], rtol=1e-6)


@pytest.mark.slow
def test_two_process_cli_train(tmp_path):
    """`mwd train --override train.distributed=true` as two real OS
    processes sharing a workdir: coordinator writes config/metrics/ckpt,
    the follower stays quiet, and the loglik trajectory matches the
    single-host CLI run on the same config."""
    import json

    port = _free_port()
    # ONE --override flag: nargs="*" collects the pairs (repeated flags
    # would overwrite each other)
    overrides = [
        "--override", "data.n_utterances=24", "model.name=hmm",
        "train.num_iterations=4", "train.checkpoint_every=4",
    ]
    dist_dir, single_dir = tmp_path / "dist", tmp_path / "single"

    def env_for(pid):
        e = {**os.environ,
             "PYTHONPATH": f"{REPO}:{os.environ.get('PYTHONPATH', '')}",
             "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
             "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
             "JAX_NUM_PROCESSES": "2",
             "JAX_PROCESS_ID": str(pid)}
        e.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU tunnel in the workers
        return e

    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "multimodalworddiscovery_tpu.cli", "train",
             "--workdir", str(dist_dir), *overrides,
             "train.data_parallel=true", "train.distributed=true"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(REPO), env=env_for(i),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"cli worker {i} failed:\n{out[-4000:]}"
    assert "iter    3" in outs[0], outs[0][-2000:]  # coordinator logs
    assert "iter" not in outs[1], outs[1][-2000:]   # follower is quiet

    # single-host reference run of the same CLI config
    r = subprocess.run(
        [sys.executable, "-m", "multimodalworddiscovery_tpu.cli", "train",
         "--workdir", str(single_dir), *overrides],
        capture_output=True, text=True, cwd=str(REPO),
        env={**os.environ,
             "PYTHONPATH": f"{REPO}:{os.environ.get('PYTHONPATH', '')}",
             "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
        timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    def lls(d):
        rows = [json.loads(l) for l in (d / "train_metrics.jsonl").read_text().splitlines()]
        return [row["loglik"] for row in rows]

    np.testing.assert_allclose(lls(dist_dir), lls(single_dir), rtol=1e-5)
    assert (dist_dir / "ckpt").exists() and (dist_dir / "config.json").exists()


@pytest.mark.slow
def test_two_process_streaming_em(tmp_path):
    """Pod-scale out-of-core EM: two OS processes, each streaming its own
    shard subset (5 shards -> 3 rounds, uneven tail), must match resident
    single-process EM (tests/multihost_stream_worker.py)."""
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.data.stream import write_shards

    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames

    corpus, gold, _ = make_flickr8k_mini(
        n_utterances=20, n_concepts=10, n_phones=16, seed=5
    )
    shard_dir = tmp_path / "shards"
    assert write_shards(corpus, shard_dir, shard_size=4, gold=gold) == 5
    # frames shards for the distributed hmm_gaussian leg (3 shards over 2
    # processes: the partitioned re-seed sees an uneven split)
    fc, fg, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=0)
    frames_dir = tmp_path / "frames"
    assert write_shards(fc, frames_dir, shard_size=8, gold=fg) == 3

    worker = WORKER.parent / "multihost_stream_worker.py"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port),
             str(shard_dir), str(frames_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(REPO),
            env={**os.environ,
                 "PYTHONPATH": f"{REPO}:{os.environ.get('PYTHONPATH', '')}"},
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"stream worker {i} failed:\n{out[-4000:]}"
        assert "PARITY OK" in out, f"stream worker {i}:\n{out[-4000:]}"
        assert "GAUSS OK" in out, f"stream worker {i} gaussian leg:\n{out[-4000:]}"
        assert "ATTN STREAMMB OK" in out, f"stream worker {i} minibatch leg:\n{out[-4000:]}"
        assert "BUCKET OK" in out, f"stream worker {i} bucketed leg:\n{out[-4000:]}"
        assert "VQTEACHER OK" in out, f"stream worker {i} vq_teacher leg:\n{out[-4000:]}"
        assert "VQFRONT OK" in out, f"stream worker {i} vq_frontend leg:\n{out[-4000:]}"
    assert "seeded from streamed whole-corpus moments" in outs[0]
    assert "seeded from the streamed VQ-teacher recipe (distributed)" in outs[0]
    # the follower stays quiet on coordinator-only prints
    assert "seeded from the streamed VQ-teacher recipe" not in outs[1]
    assert (tmp_path / "vqt_wd" / "vq_codes" / "manifest.json").exists()
    assert (tmp_path / "gauss_wd" / "ckpt").exists()
    assert (tmp_path / "attn_wd" / "ckpt").exists()


@pytest.mark.slow
def test_two_process_minibatch(tmp_path):
    """Distributed minibatch SGD for the gradient models: local sampling,
    all-reduced gradients, state bit-identical across processes — resident
    AND streamed (each process streams its own shard subset)."""
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.data.stream import write_shards

    corpus, _, _ = make_flickr8k_mini(
        n_utterances=32, n_concepts=10, n_phones=16, seed=1
    )
    shard_dir = tmp_path / "shards"
    assert write_shards(corpus, shard_dir, shard_size=8, shuffle=2) == 4

    worker = WORKER.parent / "multihost_minibatch_worker.py"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port),
             str(shard_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(REPO),
            env={**os.environ,
                 "PYTHONPATH": f"{REPO}:{os.environ.get('PYTHONPATH', '')}"},
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"minibatch worker {i} failed:\n{out[-4000:]}"
        assert "PARITY OK" in out, f"minibatch worker {i}:\n{out[-4000:]}"
        assert "STREAMMB OK" in out, f"minibatch worker {i} streamed leg:\n{out[-4000:]}"
    # both processes report the identical loss and checksum (both legs)
    for tag in ("PARITY OK", "STREAMMB OK"):
        tails = [o.split(tag)[1].split()[:2] for o in outs]
        assert tails[0] == tails[1], (tag, tails)


def test_process_slice_partition():
    from multimodalworddiscovery_tpu.parallel import multihost

    for n, p in [(24, 2), (7, 3), (8, 8), (5, 8)]:
        spans = [multihost.process_slice(n, i, p) for i in range(p)]
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b == c and b - a >= d - c >= 0


def test_bucket_local_static_structure():
    """Static bucketing for multi-host: fixed bucket count, edge-padded time
    axes, full row coverage, empty buckets padded to one zero-count row."""
    import jax

    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.parallel.multihost import (
        bucket_local_static,
    )

    corpus, _, _ = make_flickr8k_mini(n_utterances=20, seed=3)
    edges = [6, 10, corpus.max_src_len + 5]  # last clips to max_src_len
    buckets = bucket_local_static(corpus, edges)
    assert len(buckets) == len(edges) + 1
    tss = [b.max_src_len for b, _ in buckets]
    assert tss == [6, 10, corpus.max_src_len, corpus.max_src_len]
    covered = np.concatenate([idx for _, idx in buckets])
    np.testing.assert_array_equal(np.sort(covered), np.arange(20))
    # the final bucket is empty (everything fits earlier edges) -> one
    # zero-length padding row
    last, last_idx = buckets[-1]
    assert len(last_idx) == 0 and last.n == 1
    assert int(jax.numpy.sum(last.src_len)) == 0


def test_train_bucketed_multihost_single_process_parity():
    """train_bucketed_multihost on a 1-process 8-device mesh must equal
    resident full-corpus EM exactly (bucketed EM is exact; the multi-process
    leg lives in the 2-process stream worker)."""
    import jax

    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.models import hmm
    from multimodalworddiscovery_tpu.parallel import multihost

    corpus, _, _ = make_flickr8k_mini(n_utterances=24, seed=7)
    p0 = hmm.init(corpus)
    pb, lls_b = multihost.train_bucketed_multihost(
        hmm, p0, corpus, [10], 3, mesh=multihost.global_mesh()
    )
    ref, lls_ref = jax.jit(lambda p, c: hmm.train(p, c, 3))(p0, corpus)
    np.testing.assert_allclose(lls_b, np.asarray(lls_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pb.log_emit), np.asarray(ref.log_emit), atol=1e-4
    )
