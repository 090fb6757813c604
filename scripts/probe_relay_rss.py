"""Pin streamed-run host-RSS growth on the relay's H2D staging.

Transfers K buffers of --mb MB each through a trivial jit, dropping every
reference and gc-collecting between transfers, then reports peak RSS.  On
the axon relay (round-5 measurement) RSS grows by ~108% of the bytes
shipped — retention is inside the PJRT client, unreachable from JAX-land
(delete/donate/gc do nothing).  The local-CPU control plateaus at ~0.2 GB
(a one-buffer working set) instead of growing.  See docs/PERFORMANCE.md
"Benchmarking in this environment".

  python scripts/probe_relay_rss.py             # TPU via relay
  python scripts/probe_relay_rss.py --cpu       # local backend control
"""

from __future__ import annotations

import argparse
import gc
import resource

import numpy as np


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transfers", type=int, default=40)
    ap.add_argument("--mb", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices())
    f = jax.jit(lambda x: x.sum())
    print("warmup:", float(f(jnp.ones((256, 1024), jnp.float32))),
          f"rss {rss_gb():.2f} GB")
    base = rss_gb()
    n = args.mb * 1024 * 256  # float32s per transfer
    for i in range(args.transfers):
        x = np.random.default_rng(i).standard_normal((n,), dtype=np.float32)
        float(f(jnp.asarray(x)))  # force the transfer + a host read
        del x
        gc.collect()
        if (i + 1) % 10 == 0:
            print(f"after {i + 1} x {args.mb} MB: rss {rss_gb():.2f} GB "
                  f"(delta {rss_gb() - base:.2f})")
    total = args.transfers * args.mb / 1000
    print(f"shipped {total:.1f} GB; retained delta {rss_gb() - base:.2f} GB")


if __name__ == "__main__":
    main()
