"""Out-of-core streaming EM: sharded on-disk corpora + double-buffered I/O.

The reference holds every corpus in Python lists in RAM and loops utterances
(SURVEY.md §1/§3.1); its ceiling is host memory.  The resident-corpus path
here already scales past HBM via the chunk-scanned E-step
(``train.corpus_chunks``), but the corpus still had to fit host RAM once.
This module removes that ceiling: the corpus lives on disk as fixed-shape
shards, and EM streams them through the device.

Why this is EXACT (not minibatch SGD): expected counts are additive over
utterances, so per-iteration

    counts = sum_k expected_counts(params, shard_k);  m_step once

is bit-for-bit the full-batch E-step up to float addition order.

TPU-shaped design decisions:

- Every shard has the SAME padded shape ([shard_size, Ts] / [shard_size, Tt],
  short shards padded with zero-length utterances) so ONE jitted
  ``expected_counts`` is compiled and reused for all shards and all
  iterations — no shape-polymorphic retraces.
- Shards are plain ``.npy`` files opened with ``mmap_mode="r"``: loading a
  shard touches only its bytes; host residency is O(shard), not O(corpus).
- Double buffering: a reader thread mmap-reads and ``jax.device_put``s shard
  k+1 while the device computes counts for shard k (JAX's async dispatch
  overlaps the H2D copy with compute), hiding disk+PCIe latency.

Layout of a shard directory (``write_shards``):

    manifest.json   {"name", "num_shards", "shard_size", "n", "max_src_len",
                     "max_trg_len", "src_vocab", "trg_vocab"}
    src_<k>.npy  src_len_<k>.npy  trg_<k>.npy  trg_len_<k>.npy
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from functools import lru_cache as _lru_cache
from pathlib import Path
from typing import Any, Callable

import jax
import numpy as np

from multimodalworddiscovery_tpu.data.corpus import Corpus

# the per-shard array files: <field>_<k>.npy
FIELDS = ("src", "src_len", "trg", "trg_len")

# valid values for write_shards/ShardWriter storage_dtype.  float16 and not
# bfloat16: storage never touches the MXU (load_shard casts to f32 ON DEVICE
# before any compute), so the only thing that matters is mantissa per byte —
# f16 carries 10 bits to bf16's 7 — and f16 is npy-native (ml_dtypes arrays
# don't round-trip through np.save/np.load).
STORAGE_DTYPES = ("float32", "float16")


def _storage_cast(arr: np.ndarray, storage_dtype: str | None) -> np.ndarray:
    """Float fields -> the storage dtype; int fields pass through."""
    if storage_dtype is None or storage_dtype == "float32":
        return arr
    if storage_dtype not in STORAGE_DTYPES:
        raise ValueError(
            f"storage_dtype {storage_dtype!r} not in {STORAGE_DTYPES}"
        )
    return arr.astype(storage_dtype) if np.issubdtype(
        arr.dtype, np.floating) else arr


@_lru_cache(maxsize=1)
def _device_f32():
    """Cached on-device upcast: H2D ships the compact storage dtype; compute
    sees float32 exactly as with float32 shards (jit preserves the input's
    sharding, so the mesh path works unchanged)."""
    import jax.numpy as jnp

    return jax.jit(lambda x: x.astype(jnp.float32))


def write_shards(
    corpus: Corpus, directory: str | Path, shard_size: int, name: str = "corpus",
    gold=None, shuffle: int | None = None, storage_dtype: str | None = None,
) -> int:
    """Split a (host- or device-resident) corpus into fixed-shape shards.

    ``shuffle`` (an int seed) applies ONE global utterance permutation at
    write time — recorded in the manifest as ``shuffle_seed`` — so each shard
    is a uniform random subset of the corpus.  Real corpora are usually
    ORDERED (by image, speaker, length: Flickr8k files are), and streamed
    minibatch SGD samples within the resident shard
    (models/minibatch.train_minibatch_streaming): without shuffling, every
    batch for ``steps_per_shard`` consecutive steps comes from one contiguous
    corpus slice, which biases SGD (convergence-parity test:
    tests/test_stream.py).  Gold annotations are permuted identically.
    Streamed EM is order-invariant (counts are additive), so ``shuffle``
    matters only for the minibatch paths.

    For corpora too large to ever materialize, build shard files directly in
    this layout (they are plain ``np.save`` arrays) and write the manifest;
    ``ShardedCorpusReader`` only needs the files, not this writer.  ``gold``
    annotations (if any) are saved beside the shards for decode-time
    evaluation.  Returns the number of shards written.

    ``storage_dtype="float16"`` stores FLOAT fields (frames / region
    embeddings) half-size on disk; ``load_shard`` ships the compact bytes
    and upcasts to float32 ON DEVICE, so disk, H2D volume, and (on hosts
    whose transfer plugin retains H2D staging — see PERFORMANCE.md) host RSS
    all halve.  LOSSY: values round to f16 (10-bit mantissa) once at write
    time; everything downstream is the exact float32 pipeline on the
    rounded values.  Opt-in; int token corpora are unaffected.
    """
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    n = corpus.n
    perm = None
    if shuffle is not None:
        perm = np.random.default_rng(shuffle).permutation(n)
        take = lambda x: np.asarray(x)[perm]  # noqa: E731
        corpus = Corpus(
            src=take(corpus.src), src_len=take(corpus.src_len),
            trg=take(corpus.trg), trg_len=take(corpus.trg_len),
            src_vocab=corpus.src_vocab, trg_vocab=corpus.trg_vocab,
        )
    num_shards = max(1, -(-n // shard_size))
    padded = corpus.pad_to(num_shards * shard_size)
    arrays = {
        "src": np.asarray(padded.src),
        "src_len": np.asarray(padded.src_len),
        "trg": np.asarray(padded.trg),
        "trg_len": np.asarray(padded.trg_len),
    }
    for k in range(num_shards):
        lo, hi = k * shard_size, (k + 1) * shard_size
        for field, arr in arrays.items():
            np.save(d / f"{field}_{k}.npy",
                    _storage_cast(arr[lo:hi], storage_dtype))
    (d / "manifest.json").write_text(json.dumps({
        "name": name,
        "num_shards": num_shards,
        "shard_size": shard_size,
        "n": n,
        "max_src_len": corpus.max_src_len,
        "max_trg_len": corpus.max_trg_len,
        "src_vocab": corpus.src_vocab,
        "trg_vocab": corpus.trg_vocab,
        "shuffle_seed": shuffle,
        "storage_dtype": storage_dtype,
    }))
    if gold is not None:
        from multimodalworddiscovery_tpu.data.io import save_alignment_json

        ga = np.asarray(gold.alignment)
        segs = gold.segments
        if perm is not None:
            ga = ga[perm]
            if segs is not None:
                segs = [segs[i] for i in perm]
        save_alignment_json(
            ga, np.asarray(corpus.src_len), d / "gold.json", segments=segs,
        )
    return num_shards


class ShardWriter:
    """Incremental counterpart of ``write_shards`` for corpora too large to
    EVER materialize (round-4 VERDICT task 2: reference-corpus-scale
    pipelines): append fixed-size batches as they are produced (each batch
    becomes one shard file set), then ``close()`` writes the manifest and
    the accumulated gold.  Host residency: O(one batch) for corpus arrays
    (plus the gold alignments, which are O(N·Ts) int32 — tiny next to the
    frames).

    Every appended corpus must share max_src_len / max_trg_len / vocabs
    (corpus-level constants — pad the generator's batches to global maxima);
    the LAST batch may be shorter and is zero-padded to shard_size (the
    zero-length-utterance invariant every consumer relies on).

    Shuffling at this scale happens upstream (permute the GENERATION order,
    e.g. the utterance id list fed to batches) — pass ``shuffle_seed`` to
    record it in the manifest so downstream bias warnings stay accurate.
    """

    def __init__(self, directory: str | Path, shard_size: int,
                 name: str = "corpus", shuffle_seed: int | None = None,
                 storage_dtype: str | None = None):
        if storage_dtype is not None and storage_dtype not in STORAGE_DTYPES:
            raise ValueError(
                f"storage_dtype {storage_dtype!r} not in {STORAGE_DTYPES}"
            )
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.shard_size = int(shard_size)
        self.name = name
        self.shuffle_seed = shuffle_seed
        self.storage_dtype = storage_dtype
        self._k = 0
        self._n = 0
        self._meta = None  # (max_src_len, max_trg_len, src_vocab, trg_vocab)
        self._gold_align: list[np.ndarray] = []
        self._gold_lens: list[np.ndarray] = []
        self._closed = False

    def append(self, corpus: Corpus, gold_alignment=None) -> int:
        """Write one batch as shard ``k``; returns k.  ``gold_alignment``:
        optional [B, max_src_len] int array (0 = NULL / unaligned)."""
        if self._closed:
            raise ValueError("ShardWriter is closed")
        b = int(corpus.n)
        if b > self.shard_size:
            raise ValueError(f"batch of {b} > shard_size {self.shard_size}")
        meta = (corpus.max_src_len, corpus.max_trg_len,
                corpus.src_vocab, corpus.trg_vocab)
        if self._meta is None:
            self._meta = meta
        elif meta != self._meta:
            raise ValueError(
                f"batch shape/vocab drift: {meta} vs first batch {self._meta}"
            )
        padded = corpus.pad_to(self.shard_size)
        for field in FIELDS:
            np.save(self.directory / f"{field}_{self._k}.npy",
                    _storage_cast(np.asarray(getattr(padded, field)),
                                  self.storage_dtype))
        if gold_alignment is not None:
            ga = np.asarray(gold_alignment)
            if ga.shape != (b, corpus.max_src_len):
                raise ValueError(
                    f"gold_alignment shape {ga.shape} != "
                    f"{(b, corpus.max_src_len)}"
                )
            self._gold_align.append(ga.astype(np.int32))
            self._gold_lens.append(np.asarray(corpus.src_len))
        elif self._gold_align:
            raise ValueError("gold_alignment given for some batches only")
        self._n += b
        self._k += 1
        return self._k - 1

    def close(self) -> int:
        """Write the manifest (+ gold.json if gold was appended); returns
        the number of shards."""
        if self._closed:
            return self._k
        if self._meta is None:
            raise ValueError("no batches appended")
        ms, mt, sv, tv = self._meta
        (self.directory / "manifest.json").write_text(json.dumps({
            "name": self.name,
            "num_shards": self._k,
            "shard_size": self.shard_size,
            "n": self._n,
            "max_src_len": ms,
            "max_trg_len": mt,
            "src_vocab": sv,
            "trg_vocab": tv,
            "shuffle_seed": self.shuffle_seed,
            "storage_dtype": self.storage_dtype,
        }))
        if self._gold_align:
            from multimodalworddiscovery_tpu.data.io import (
                save_alignment_json,
            )

            save_alignment_json(
                np.concatenate(self._gold_align),
                np.concatenate(self._gold_lens),
                self.directory / "gold.json",
            )
        self._closed = True
        return self._k

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.close()


class ShardedCorpusReader:
    """mmap-backed reader for a ``write_shards`` directory."""

    def __init__(self, directory: str | Path):
        self.directory = Path(directory)
        m = json.loads((self.directory / "manifest.json").read_text())
        self.num_shards: int = m["num_shards"]
        self.shard_size: int = m["shard_size"]
        self.n: int = m["n"]
        self.max_src_len: int = m["max_src_len"]
        self.max_trg_len: int = m["max_trg_len"]
        self.src_vocab: int = m["src_vocab"]
        self.trg_vocab: int = m["trg_vocab"]
        # seed of the write-time utterance permutation (None = corpus order;
        # manifests predating the shuffle option lack the key)
        self.shuffle_seed = m.get("shuffle_seed")
        # on-disk dtype of FLOAT fields (None/float32 = as computed; float16
        # halves disk + H2D — load_shard upcasts on device)
        self.storage_dtype = m.get("storage_dtype")

    def load_shard(self, k: int, sharding=None) -> Corpus:
        """Shard ``k`` as a device-resident Corpus.

        ``np.ascontiguousarray`` on the mmap slice reads only this shard's
        bytes; ``device_put`` is async, so when called from the prefetch
        thread the H2D copy overlaps the current shard's compute.
        """
        if not 0 <= k < self.num_shards:
            raise IndexError(f"shard {k} of {self.num_shards}")

        def rd(field):
            arr = np.load(self.directory / f"{field}_{k}.npy", mmap_mode="r")
            x = jax.device_put(np.ascontiguousarray(arr), sharding)
            if x.dtype == np.float16:
                # compact dtype crossed H2D; compute wants f32 — upcast on
                # device (cached jit; preserves the input sharding)
                x = _device_f32()(x)
            return x

        return Corpus(
            src=rd("src"), src_len=rd("src_len"),
            trg=rd("trg"), trg_len=rd("trg_len"),
            src_vocab=self.src_vocab, trg_vocab=self.trg_vocab,
        )

    def materialize(self) -> tuple[Corpus, Any]:
        """Whole corpus resident (decode/eval-time convenience, trims the
        last shard's padding back to the true N).  Training should stream —
        this exists so `mwd align/evaluate` work on stream-trained workdirs
        when the corpus fits RAM; (corpus, gold-or-None)."""
        fields = {}
        for field in FIELDS:
            parts = [
                np.load(self.directory / f"{field}_{k}.npy")
                for k in range(self.num_shards)
            ]
            fields[field] = np.concatenate(parts)[: self.n]
            if fields[field].dtype == np.float16:
                fields[field] = fields[field].astype(np.float32)
        corpus = Corpus(
            src=jax.numpy.asarray(fields["src"]),
            src_len=jax.numpy.asarray(fields["src_len"]),
            trg=jax.numpy.asarray(fields["trg"]),
            trg_len=jax.numpy.asarray(fields["trg_len"]),
            src_vocab=self.src_vocab, trg_vocab=self.trg_vocab,
        )
        gold = None
        if (self.directory / "gold.json").exists():
            from multimodalworddiscovery_tpu.data.io import load_alignment_json

            gold = load_alignment_json(
                self.directory / "gold.json", self.n, self.max_src_len
            )
        return corpus, gold


def stream_expected_counts(
    count_fn: Callable[[Any, Corpus], tuple[Any, jax.Array]],
    params: Any,
    reader: ShardedCorpusReader,
    sharding=None,
    prefetch: int = 1,
) -> tuple[Any, jax.Array]:
    """Sum ``count_fn(params, shard)`` over all shards with I/O prefetch.

    ``count_fn`` must be the jitted per-shard E-step (same static shapes for
    every shard — one compile).  ``prefetch`` shards are loaded ahead on a
    reader thread.  Returns (counts, loglik) for the WHOLE corpus.
    """
    # per-shard dispatches stay INDEPENDENT of each other so they pipeline
    # (async dispatch overlaps executes; measured: chaining an accumulator
    # through each call serialized the executes, ~+40 ms/shard over the
    # remote-relay link)
    return tree_sum_bounded(
        count_fn(params, shard)
        for shard in prefetched(
            lambda k: reader.load_shard(k, sharding),
            reader.num_shards,
            prefetch,
        )
    )


def prefetched(load, total: int, prefetch: int = 1):
    """Yield ``load(0) .. load(total-1)`` with ``prefetch`` calls running
    ahead on a reader thread — the I/O-overlap backbone of every streaming
    path (single-host shards, multihost rounds, streamed decode/eval)."""
    if prefetch < 1:
        raise ValueError(f"prefetch must be >= 1, got {prefetch}")
    with ThreadPoolExecutor(max_workers=1) as ex:
        pending = [ex.submit(load, k) for k in range(min(prefetch, total))]
        for k in range(total):
            item = pending.pop(0).result()
            if k + prefetch < total:
                pending.append(ex.submit(load, k + prefetch))
            yield item


@jax.jit
def _tree_sum(results):
    """Elementwise sum of a list of identically-structured pytrees."""
    import functools as _ft

    import jax.numpy as jnp

    return jax.tree.map(lambda *xs: _ft.reduce(jnp.add, xs), *results)


# fold fan-in: results kept live on device at once is bounded by this (plus
# one partial), and _tree_sum retraces only for list lengths {2, _FOLD_CHUNK,
# final remainder} — NOT per distinct shard count
_FOLD_CHUNK = 16


def tree_sum_bounded(items) -> Any:
    """Sum an iterator of identically-structured pytrees with bounded device
    residency: fold every ``_FOLD_CHUNK`` items into a partial (two fused
    dispatches per chunk) instead of keeping all K results live for one
    K-ary sum — at pod scale K is the shard count and O(K) residency would
    defeat the out-of-core design."""
    partial, buf = None, []

    def fold(partial, buf):
        s = _tree_sum(buf)
        return s if partial is None else _tree_sum([partial, s])

    for r in items:
        buf.append(r)
        if len(buf) == _FOLD_CHUNK:
            partial, buf = fold(partial, buf), []
    if buf:
        partial = fold(partial, buf)
    return partial


@_lru_cache(maxsize=64)
def _jitted_step(mod, attr: str, kw_items: tuple, out_shardings=None,
                 scaled: bool = False):
    """Cache the jitted per-shard step by (module, fn, kwargs[, sharding])
    so repeated ``train_streaming`` calls (benchmarks, resumed runs) reuse
    the SAME jit object — fresh ``jax.jit(lambda ...)`` wrappers re-trace
    and re-compile every call (measured: the streamed-EM benchmark paid a
    full E-step compile inside every timed rep).

    ``out_shardings`` (hashable, e.g. a replicated NamedSharding) pins the
    output placement — the multihost path REQUIRES replicated outputs (an
    unconstrained m_step output could legally stay sharded over the data
    axis, and the coordinator's host-copy checkpoint would then fail on
    non-addressable shards)."""
    kw = dict(kw_items)
    if scaled:
        # deterministic-annealing E-step: the emission temperature is a
        # TRACED operand, so one compile serves the whole beta ramp (a
        # static emit_scale kwarg would recompile per temperature)
        fn = lambda p, c, s: getattr(mod, attr)(p, c, emit_scale=s, **kw)  # noqa: E731
    else:
        fn = lambda p, c: getattr(mod, attr)(p, c, **kw)  # noqa: E731
    if out_shardings is not None:
        return jax.jit(fn, out_shardings=out_shardings)
    return jax.jit(fn)


def train_streaming(
    mod: Any,
    params: Any,
    reader: ShardedCorpusReader,
    num_iterations: int,
    count_kwargs: dict | None = None,
    m_step_kwargs: dict | None = None,
    mesh=None,
    prefetch: int = 1,
    on_iteration: Callable[[int, Any, float], None] | None = None,
    scale_schedule=None,
):
    """Exact out-of-core EM for the closed-form aligners (model1 / hmm /
    hmm_gaussian): stream shards from disk every iteration, one M-step per
    iteration.  With ``mesh``, each shard is additionally sharded over the
    device mesh ('data' axis) and the per-shard E-step runs data-parallel
    (GSPMD inserts the psum) — disk -> host -> every chip, no chip ever
    holds more than shard_size / n_devices utterances.

    ``scale_schedule`` (a [num_iterations] float array) runs deterministic
    annealing: iteration i's E-step gets ``emit_scale=scale_schedule[i]``
    as a traced operand, so the full beta ramp reuses ONE compiled E-step
    (hmm_gaussian only — the sole model with an emission temperature).

    Returns (params, [loglik per iteration]).
    """
    ckw = dict(count_kwargs or {})
    mkw = dict(m_step_kwargs or {})
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from multimodalworddiscovery_tpu.core.mesh import DATA_AXIS

        if reader.shard_size % mesh.shape[DATA_AXIS] != 0:
            raise ValueError(
                f"shard_size {reader.shard_size} must divide by the mesh's "
                f"{mesh.shape[DATA_AXIS]} devices"
            )
        sharding = NamedSharding(mesh, P(DATA_AXIS))

    scaled = scale_schedule is not None
    count_fn = _jitted_step(
        mod, "expected_counts", tuple(sorted(ckw.items())), scaled=scaled
    )
    m_fn = _jitted_step(mod, "m_step", tuple(sorted(mkw.items())))
    lls = []
    for it in range(num_iterations):
        if scaled:
            import jax.numpy as jnp

            s = jnp.float32(scale_schedule[it])
            fn = lambda p, c: count_fn(p, c, s)  # noqa: E731  (count_fn cached)
        else:
            fn = count_fn
        counts, ll = stream_expected_counts(
            fn, params, reader, sharding=sharding, prefetch=prefetch
        )
        params = m_fn(params, counts)
        lls.append(float(ll))
        if on_iteration is not None:
            on_iteration(it, params, lls[-1])
    return params, lls
