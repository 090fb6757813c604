"""Worker for test_multihost.py::test_two_process_minibatch — one process of
a 2-process distributed MINIBATCH run for the gradient models: per-device
LOCAL batch sampling (no cross-host gathers), gradient all-reduce via the
replicated output sharding.  Checks the replicated state stays bit-identical
across processes after 5 steps.

Usage: python multihost_minibatch_worker.py <pid> <nproc> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from multimodalworddiscovery_tpu.parallel import multihost

multihost.initialize(f"localhost:{port}", nproc, pid)

from jax.experimental import multihost_utils

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.models import attention
from multimodalworddiscovery_tpu.models.minibatch import make_minibatch_step

N = 32
full, _, _ = make_flickr8k_mini(n_utterances=N, n_concepts=10, n_phones=16, seed=1)
mesh = multihost.global_mesh()
lo, hi = multihost.process_slice(N)
local = jax.tree.map(lambda x: x[lo:hi], full)
corpus = multihost.global_corpus_from_local(local, mesh)

state = attention.init(corpus, dim=32, key=jax.random.PRNGKey(0))
state = multihost.replicate_to_global(state, mesh)
step = make_minibatch_step(
    attention.em_step, corpus, batch_size=8, mesh=mesh, sample="local"
)
losses = []
for it in range(5):
    state, stats = step(state, jax.random.PRNGKey(100 + it))
    losses.append(float(stats["loss"]))
assert all(l == l for l in losses), f"NaN loss: {losses}"

# the replicated state must be IDENTICAL on every process (the all-reduced
# gradients are deterministic): allgather a parameter checksum and compare
leaves = jax.tree_util.tree_leaves(state)
checksum = np.float64(sum(float(jax.numpy.sum(x)) for x in leaves))
all_sums = multihost_utils.process_allgather(checksum)
assert np.allclose(all_sums, all_sums[0], rtol=0, atol=0), all_sums
print(f"PARITY OK {losses[-1]:.6f} {checksum:.6f}", flush=True)

# --- streamed x distributed minibatch (VERDICT r4 item 4a): each process
# streams its own shard subset, devices sample locally within the round
# corpus, state must stay bit-identical across processes ---
shard_dir = sys.argv[4] if len(sys.argv) > 4 else None
if shard_dir:
    from multimodalworddiscovery_tpu.data.stream import ShardedCorpusReader

    reader = ShardedCorpusReader(shard_dir)
    st0 = attention.init(
        reader.load_shard(0), dim=32, key=jax.random.PRNGKey(1)
    )
    st, losses2 = multihost.train_minibatch_streaming_multihost(
        attention.em_step, st0, reader, batch_size=8, num_steps=6,
        key=jax.random.PRNGKey(7), mesh=mesh,
    )
    assert len(losses2) == 6 and all(l == l for l in losses2), losses2
    leaves2 = jax.tree_util.tree_leaves(st)
    checksum2 = np.float64(sum(float(jax.numpy.sum(x)) for x in leaves2))
    all2 = multihost_utils.process_allgather(checksum2)
    assert np.allclose(all2, all2[0], rtol=0, atol=0), all2
    print(f"STREAMMB OK {losses2[-1]:.6f} {checksum2:.6f}", flush=True)
