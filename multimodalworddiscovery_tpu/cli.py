"""Command-line entry points: train / align / segment / evaluate.

Reference counterpart: the top-level ``run_*.py`` experiment drivers
(SURVEY.md §2 C13) — argparse scripts wiring load -> construct discoverer ->
trainUsingEM -> printAlignment -> offline eval.  Here one CLI covers all
models through the registry; state is Orbax checkpoints; alignments and
metrics are JSON/JSONL files.

  mwd train    --config configs/model1_mini.py --workdir /tmp/run
  mwd align    --workdir /tmp/run [--output alignment.json]
  mwd segment  --workdir /tmp/run [--output segments.json]
  mwd evaluate --workdir /tmp/run [--output metrics.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multimodalworddiscovery_tpu.core.config import apply_overrides, base_config, load_config
from multimodalworddiscovery_tpu.core.metrics_io import MetricsWriter, _to_jsonable
from multimodalworddiscovery_tpu.core.mesh import make_mesh
from multimodalworddiscovery_tpu.data.corpus import Corpus, GoldAnnotations
from multimodalworddiscovery_tpu.data.io import load_corpus, save_alignment_json
from multimodalworddiscovery_tpu.data.synthetic import make_flickr8k_mini
from multimodalworddiscovery_tpu.models.registry import get_model
from multimodalworddiscovery_tpu.parallel import make_data_parallel_step, shard_corpus
from multimodalworddiscovery_tpu.segment import (
    boundaries_from_segments,
    segments_from_alignment,
    segments_to_host,
)
from multimodalworddiscovery_tpu.utils.checkpoint import CheckpointManager


def _load_data(cfg) -> tuple[Corpus, GoldAnnotations | None]:
    if cfg.data.source == "synthetic":
        corpus, gold, _ = make_flickr8k_mini(
            n_utterances=cfg.data.n_utterances,
            n_concepts=cfg.data.n_concepts,
            n_phones=cfg.data.n_phones,
            min_concepts=cfg.data.get("min_concepts", 2),
            max_concepts=cfg.data.get("max_concepts", 4),
            seed=cfg.seed,
        )
        if cfg.data.continuous:
            from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames

            corpus, gold, _ = phones_to_frames(
                corpus, gold, feat_dim=cfg.data.feat_dim, seed=cfg.seed
            )
        return corpus, gold
    if cfg.data.source == "disk":
        return load_corpus(cfg.data.dir, cfg.data.name)
    if cfg.data.source == "stream":
        # decode/eval-time convenience: materialize the sharded corpus (the
        # TRAIN path never calls this — cmd_train streams shard by shard)
        from multimodalworddiscovery_tpu.data.stream import ShardedCorpusReader

        return ShardedCorpusReader(cfg.data.dir).materialize()
    raise ValueError(f"unknown data.source {cfg.data.source!r}")


def _resolve_use_pallas(cfg, corpus) -> bool:
    """Resolve model.use_pallas = auto|on|off for the HMM family.

    auto: the fused kernel wins on TPU once the state space is non-trivial
    (bench/results.jsonl hmm_estep entries); the XLA scan path stays the
    CPU/small-S default."""
    mode = str(cfg.model.get("use_pallas", "auto")).lower()
    if mode in ("on", "true", "1"):
        return True
    if mode in ("off", "false", "0"):
        return False
    if mode != "auto":
        raise ValueError(f"model.use_pallas must be auto|on|off, got {mode!r}")
    on_tpu = jax.devices()[0].platform != "cpu"
    # with wide lane blocks (pick_tiles) the fused kernel beats the XLA scan
    # even at S=12 once the corpus fills a block (measured: 3.56 vs 4.43
    # ms/iter at N=8000); keep the scan for small-S + small-N, where the
    # regime is unmeasured and padding waste is worst
    return on_tpu and (2 * corpus.max_trg_len >= 32 or corpus.n >= 1024)


def _resolve_decode_pallas(cfg, corpus) -> bool:
    """Resolve use_pallas for DECODE (Viterbi) separately from the E-step.

    Explicit on/off is honored; ``auto`` keeps decode on the factored scan
    decoder.  Rationale: the fused Viterbi kernel streams f32 delta chunks
    [Ts, S, N] (~4x the scan decoder's int8 backpointers at large S — ~0.7 GB
    at N=40k, S=128), is only ~1.10x faster at the measured shape, and its
    tie-breaking between equally-optimal paths can differ — so auto-routing
    decode through it would let decoded alignments silently change when
    corpus size or platform flips the route (see viterbi_factored docstring)."""
    mode = str(cfg.model.get("use_pallas", "auto")).lower()
    if mode == "auto":
        return False
    return _resolve_use_pallas(cfg, corpus)


def _make_teacher(cfg, corpus):
    """Train the guide teacher (discrete or Gaussian HMM) for guided
    attention; returns (teacher_params, posteriors_fn)."""
    teacher = cfg.model.guide
    iters = cfg.model.get("guide_iters", 15)
    if teacher == "hmm":
        from multimodalworddiscovery_tpu.models import hmm as tmod
    elif teacher == "hmm_gaussian":
        from multimodalworddiscovery_tpu.models import hmm_gaussian as tmod
    else:
        raise ValueError(f"model.guide must be ''|hmm|hmm_gaussian, got {teacher!r}")
    if teacher == "hmm":
        tp = tmod.init(corpus, max_jump=cfg.model.max_jump)
    else:
        tp = tmod.init(
            corpus, max_jump=cfg.model.max_jump,
            n_components=cfg.model.get("n_components", 2),
            key=jax.random.PRNGKey(cfg.seed + 1),
        )
    tp, _ = jax.jit(lambda p: tmod.train(p, corpus, iters))(tp)
    print(f"trained {teacher} teacher ({iters} EM iters); attention will be guided")
    return tp, tmod.posteriors


def _make_model(cfg, corpus, init_only: bool = False):
    """Build (module, params, step) for the configured model.

    ``init_only`` skips expensive step construction (e.g. training the HMM
    teacher for guided attention) — restore paths only need the parameter
    template, never the training step.
    """
    mod = get_model(cfg.model.name)
    name = cfg.model.name
    key = jax.random.PRNGKey(cfg.seed)
    if name == "model1":
        params = mod.init(corpus)
        step = functools.partial(mod.em_step, smoothing=cfg.model.smoothing)
    elif name in ("hmm", "hmm_gaussian", "hmm_dnn", "hmm_crf"):
        use_pallas = _resolve_use_pallas(cfg, corpus)
        dot_dtype = cfg.model.get("dot_dtype", "float32")
        if name == "hmm":
            params = mod.init(corpus, max_jump=cfg.model.max_jump)
            step = functools.partial(
                mod.em_step, smoothing=cfg.model.smoothing,
                use_pallas=use_pallas, dot_dtype=dot_dtype,
            )
        elif name == "hmm_gaussian":
            init_mode = str(cfg.model.get("init", "global"))
            if init_mode not in ("global", "diagonal", "vq_teacher"):
                raise SystemExit(
                    "model.init must be global|diagonal|vq_teacher, "
                    f"got {init_mode!r}"
                )
            # restore paths (init_only) need only the parameter TEMPLATE —
            # skip the seeding work (all init variants return identical
            # pytree shapes)
            init_kw = {}
            if init_only or init_mode == "global":
                init_fn = mod.init
            elif init_mode == "diagonal":
                init_fn = mod.init_diagonal
            else:
                init_fn = mod.init_vq_teacher
                init_kw = dict(
                    n_codes=cfg.model.get("vq_codes", 64),
                    teacher_iters=cfg.model.get("teacher_iters", 10),
                    seed_rounds=cfg.model.get("seed_rounds", 3),
                    use_pallas=use_pallas,
                    chunks=int(cfg.train.get("corpus_chunks", 1)),
                )
            params = init_fn(
                corpus,
                max_jump=cfg.model.max_jump,
                n_components=cfg.model.get("n_components", 2),
                key=key,
                **init_kw,
            )
            step = functools.partial(
                mod.em_step, use_pallas=use_pallas, dot_dtype=dot_dtype
            )
        else:
            learn_trans = bool(cfg.model.get("learn_transitions", False))
            if learn_trans and name != "hmm_crf":
                raise SystemExit(
                    "model.learn_transitions requires model.name=hmm_crf "
                    "(the end-to-end differentiable aligner)"
                )
            init_fn = mod.init_e2e if learn_trans else mod.init
            params = init_fn(
                corpus, max_jump=cfg.model.max_jump,
                hidden=cfg.model.get("hidden", 256),
                learning_rate=cfg.model.get("learning_rate", 1e-3),
                n_sgd=cfg.model.get("n_sgd", 4),
                key=key,
            )
            step_kw = dict(use_pallas=use_pallas, dot_dtype=dot_dtype)
            if name == "hmm_crf":
                step_kw["learn_transitions"] = learn_trans
            step = functools.partial(mod.em_step, **step_kw)
        if use_pallas and not init_only:
            print("E-step: fused Pallas kernel (model.use_pallas)")
    elif name == "attention":
        params = mod.init(
            corpus, dim=cfg.model.get("dim", 128),
            learning_rate=cfg.model.get("learning_rate", 3e-4),
            entropy_weight=cfg.model.get("entropy_weight", 0.0),
            subsample=cfg.model.get("subsample", 1),
            key=key,
        )
        step = mod.em_step
        if cfg.model.get("guide", "") and not init_only:
            # Teacher-guided attention (DNN-HMM-DNN hybrid): train a teacher
            # HMM, supervise cross-attention with its posteriors (measured
            # 0.48 -> 0.99 positional accuracy on the synthetic corpus).
            # The guide matrix is computed INSIDE the step from the teacher's
            # parameters, so it works for full corpora, sharded corpora and
            # minibatches alike.
            tp, posteriors_fn = _make_teacher(cfg, corpus)
            gw = cfg.model.get("guide_weight", 1.0)

            def step(state, c, _tp=tp, _pf=posteriors_fn, _gw=gw):
                g = mod.hmm_guide_matrix(_tp, c, posteriors_fn=_pf)
                return mod.em_step(state, c, guide=g, guide_weight=_gw)

    elif name == "grounding":
        params = mod.init(
            corpus, dim=cfg.model.get("dim", 128),
            learning_rate=cfg.model.get("learning_rate", 1e-3),
            margin=cfg.model.get("margin", 1.0),
            key=key,
        )
        step = mod.em_step
    else:
        params = mod.init(corpus)
        step = mod.em_step
    return mod, params, step


def _decode_kwargs(cfg, mod, corpus) -> dict:
    """Model-specific decode knobs from config (e.g. the attention aligner's
    NULL threshold) when the model's ``align`` supports them."""
    import inspect

    kw = {}
    sig = inspect.signature(mod.align).parameters
    nt = float(cfg.model.get("null_threshold", 0.0) or 0.0)
    if nt and "null_threshold" in sig:
        kw["null_threshold"] = nt
    if "use_pallas" in sig:
        # decode defaults to the scan decoder under auto (memory-light,
        # deterministic ties); explicit use_pallas=on still routes the kernel
        kw["use_pallas"] = _resolve_decode_pallas(cfg, corpus)
    return kw


def _align_call(cfg, mod, params, corpus):
    kw = _decode_kwargs(cfg, mod, corpus)
    return jax.jit(functools.partial(mod.align, **kw))(params, corpus)


def _save_config(cfg, workdir: Path) -> None:
    (workdir / "config.json").write_text(cfg.to_json(indent=2))


def _host_local_copy(x):
    """Fully-replicated (possibly process-spanning) array -> host numpy copy,
    so the coordinator can checkpoint it with a plain single-host save."""
    return np.asarray(x)


def _load_workdir_config(workdir: Path):
    cfg = base_config()
    saved = json.loads((workdir / "config.json").read_text())

    def merge(node, d):
        for k, v in d.items():
            if isinstance(v, dict) and hasattr(node, k):
                merge(getattr(node, k), v)
            else:
                setattr(node, k, v)

    with cfg.unlocked():  # custom config files may carry extra keys
        merge(cfg, saved)
    return cfg


def _train_minibatch_streaming_cmd(cfg, args, workdir: Path, batch_size: int) -> None:
    """Out-of-core minibatch SGD (attention / grounding / hmm_crf): shards
    stream to the device with prefetch; minibatch steps sample within the
    resident shard (models/minibatch.train_minibatch_streaming).  With
    train.distributed, every PROCESS streams its own shard subset and each
    device samples locally (parallel/multihost.
    train_minibatch_streaming_multihost)."""
    from multimodalworddiscovery_tpu.data.stream import ShardedCorpusReader
    from multimodalworddiscovery_tpu.models.minibatch import (
        train_minibatch_streaming,
    )

    if cfg.model.get("guide", ""):
        raise SystemExit(
            "model.guide + data.source=stream would train the teacher on "
            "shard 0 only (silently degraded guidance); train the teacher "
            "with streamed EM first, then guide on a resident corpus "
            "(data.source=disk)"
        )
    distributed = bool(cfg.train.get("distributed", False))
    is_coord = (not distributed) or jax.process_index() == 0
    reader = ShardedCorpusReader(cfg.data.dir)
    if distributed:
        from multimodalworddiscovery_tpu.parallel import multihost

        mesh = multihost.global_mesh()
    else:
        mesh = make_mesh() if cfg.train.data_parallel else None
    shard0 = reader.load_shard(0)
    mod, params, step = _make_model(cfg, shard0)

    ckpt = CheckpointManager(workdir / "ckpt")
    writer = MetricsWriter(
        workdir / "train_metrics.jsonl",
        tensorboard_dir=(workdir / "tb") if cfg.train.get("tensorboard", False) else None,
    )
    start = 0
    if ckpt.latest_step() is not None and not args.fresh:
        params, start = ckpt.restore(params)
        start += 1
        if is_coord:
            print(f"resumed from step {start}")

    def on_step(it, p, loss):
        if is_coord:
            writer.write(it, loglik=loss, batch_size=batch_size)
            if it % 20 == 0 or it == cfg.train.num_iterations - 1:
                print(f"step {it:5d}  loglik {loss:.3f}")
        if (it + 1) % cfg.train.checkpoint_every == 0 or it == cfg.train.num_iterations - 1:
            # collective under jax.distributed (see cmd_train)
            ckpt.save(it, jax.tree.map(_host_local_copy, p) if distributed else p)

    t0 = time.perf_counter()
    if distributed:
        params, losses = multihost.train_minibatch_streaming_multihost(
            step, params, reader, batch_size,
            cfg.train.num_iterations - start,
            key=jax.random.PRNGKey(cfg.seed),
            prefetch=int(cfg.train.get("stream_prefetch", 1)),
            mesh=mesh, start_step=start,
            on_step=on_step,
        )
    else:
        params, losses = train_minibatch_streaming(
            step, params, reader, batch_size,
            cfg.train.num_iterations - start,
            key=jax.random.PRNGKey(cfg.seed),
            prefetch=int(cfg.train.get("stream_prefetch", 1)),
            mesh=mesh, start_step=start,
            on_step=on_step,
        )
    ckpt.close()
    writer.close()
    if is_coord:
        print(
            f"streamed {len(losses)} minibatch steps (B={batch_size}, "
            f"{reader.num_shards} shards x {reader.shard_size}"
            + (f", {mesh.shape} mesh" if mesh else "")
            + f") in {time.perf_counter() - t0:.2f}s"
        )


def _train_streaming_cmd(cfg, args, workdir: Path) -> None:
    """Out-of-core EM: the corpus never materializes — fixed-shape shards
    stream from disk (data/stream.py) with I/O prefetch, counts accumulate
    on device, one M-step per iteration.  Exact (counts are additive)."""
    from multimodalworddiscovery_tpu.data.stream import (
        ShardedCorpusReader,
        train_streaming,
    )

    # gate BEFORE the gradient-model dispatch: silently ignoring the flag
    # at train time would leave a workdir whose own decode/eval commands
    # (which do apply it) all fail (round-4 review finding)
    _vq_frontend_gate(cfg)
    batch_size = int(cfg.train.get("batch_size", 0))
    if cfg.model.name in ("attention", "grounding", "hmm_crf"):
        # gradient models: streamed MINIBATCH training (shards stream to the
        # device; steps sample within the resident shard)
        if not batch_size:
            raise SystemExit(
                "gradient models with data.source=stream need "
                "train.batch_size (minibatch steps sample within each "
                "streamed shard)"
            )
        _train_minibatch_streaming_cmd(cfg, args, workdir, batch_size)
        return
    if cfg.model.name not in ("model1", "hmm", "hmm_gaussian", "hmm_dnn"):
        raise SystemExit(
            "data.source=stream trains the EM aligners "
            "(model1/hmm/hmm_gaussian/hmm_dnn) and the gradient models "
            "(attention/grounding/hmm_crf, with train.batch_size)"
        )
    if cfg.model.name == "hmm_dnn" and (
        cfg.train.get("distributed", False) or cfg.train.data_parallel
    ):
        raise SystemExit(
            "streamed hmm_dnn runs single-device: its incremental neural "
            "M-step CHAINS optimizer state through the shards (each shard's "
            "gradient step uses the previous shard's weights), which has no "
            "data-parallel decomposition the way additive counts do.  Use "
            "train.bucket_edges or train.corpus_chunks for a data-parallel "
            "hmm_dnn, or stream without the mesh"
        )
    if (
        str(cfg.train.get("bucket_edges", "")).strip()
        or batch_size
        or int(cfg.train.get("corpus_chunks", 1)) > 1
    ):
        raise SystemExit(
            "data.source=stream already bounds memory by shard_size; it does "
            "not compose with bucket_edges/batch_size/corpus_chunks "
            "for the EM aligners"
        )
    n_anneal = int(cfg.model.get("anneal_iters", 0) or 0)
    if n_anneal and cfg.model.name != "hmm_gaussian":
        raise SystemExit(
            "model.anneal_iters (deterministic annealing) requires "
            "model.name=hmm_gaussian"
        )
    distributed = bool(cfg.train.get("distributed", False))
    is_coord = (not distributed) or jax.process_index() == 0

    reader = ShardedCorpusReader(cfg.data.dir)
    reader = _apply_vq_frontend_streaming(
        cfg, reader, workdir, distributed, fresh=args.fresh
    )
    shard0 = reader.load_shard(0)
    # streamed vq_teacher seeding happens below over ALL shards — resident
    # seeding on shard 0 here would be both wasted work and wrong
    stream_vq_seed = (
        cfg.model.name == "hmm_gaussian"
        and str(cfg.model.get("init", "global")) == "vq_teacher"
    )
    mod, params, _ = _make_model(cfg, shard0, init_only=stream_vq_seed)
    prefetch = int(cfg.train.get("stream_prefetch", 1))

    ckpt = CheckpointManager(workdir / "ckpt")
    will_resume = ckpt.latest_step() is not None and not args.fresh

    if stream_vq_seed and not will_resume:
        from multimodalworddiscovery_tpu.models import hmm_gaussian

        seed_kwargs = dict(
            max_jump=cfg.model.max_jump,
            n_components=cfg.model.get("n_components", 2),
            key=jax.random.PRNGKey(cfg.seed),
            n_codes=cfg.model.get("vq_codes", 64),
            teacher_iters=cfg.model.get("teacher_iters", 10),
            seed_rounds=cfg.model.get("seed_rounds", 3),
            use_pallas=_resolve_use_pallas(cfg, shard0),
            prefetch=prefetch,
        )
        if distributed:
            # pod-scale seeding: every stage distributed over the
            # process-spanning mesh (workdir must be a SHARED filesystem —
            # each process writes its own code shards into it)
            from multimodalworddiscovery_tpu.parallel import multihost

            params = multihost.init_vq_teacher_streaming_multihost(
                reader, workdir / "vq_codes", **seed_kwargs
            )
        else:
            params = hmm_gaussian.init_vq_teacher_streaming(
                reader, workdir / "vq_codes", **seed_kwargs
            )
        if is_coord:
            print(
                "hmm_gaussian seeded from the streamed VQ-teacher recipe"
                + (" (distributed)" if distributed else "")
                + f" (code shards in {workdir / 'vq_codes'})"
            )

    if (
        not will_resume  # the restore below would discard the seed anyway
        and cfg.model.name == "hmm_gaussian"
        and str(cfg.model.get("init", "global")) in ("global", "diagonal")
    ):
        # re-seed from WHOLE-corpus moments (additive across shards) rather
        # than shard 0's — exact parity with the resident init.
        # (init=vq_teacher takes the streamed seeding pipeline above
        # instead.)  Squared sums are taken about shard 0's mean (the same
        # shift on every shard/process) for two-pass-grade variance
        # stability.
        from multimodalworddiscovery_tpu.data.stream import (
            stream_expected_counts,
            tree_sum_bounded,
        )
        from multimodalworddiscovery_tpu.models import hmm_gaussian

        shift = hmm_gaussian.feature_shift(shard0)
        # init=global never reads the diagonal evidence — skip its [N,Ts,E]
        # one-hot contraction per shard (peak memory scales with trg_vocab)
        with_diag = str(cfg.model.get("init", "global")) == "diagonal"
        mom_fn = jax.jit(
            lambda _, c: (
                hmm_gaussian.init_moments(c, shift, with_diagonal=with_diag),
                jnp.float32(0.0),
            )
        )
        if cfg.train.get("distributed", False):
            # each process scans only ITS shard subset; the (tiny) moment
            # pytrees are summed across processes on the host
            from jax.experimental import multihost_utils

            pid, n_proc = jax.process_index(), jax.process_count()
            mine = [
                mom_fn(None, reader.load_shard(k))[0]
                for k in range(pid, reader.num_shards, n_proc)
            ]
            local = (
                tree_sum_bounded(iter(mine)) if mine
                else jax.tree.map(jnp.zeros_like, mom_fn(None, shard0)[0])
            )
            moments = jax.tree.map(
                lambda x: multihost_utils.process_allgather(np.asarray(x)).sum(axis=0),
                local,
            )
        else:
            moments, _ = stream_expected_counts(
                mom_fn, None, reader, prefetch=prefetch
            )
        params = hmm_gaussian.init_from_moments(
            moments, max_jump=cfg.model.max_jump,
            n_components=cfg.model.get("n_components", 2),
            key=jax.random.PRNGKey(cfg.seed),
            mode=str(cfg.model.get("init", "global")), shift=shift,
        )
        print("hmm_gaussian seeded from streamed whole-corpus moments")

    if cfg.model.name == "model1":
        ckw: dict = {}
        mkw: dict = {"smoothing": cfg.model.smoothing}
    else:
        ckw = {
            "use_pallas": _resolve_use_pallas(cfg, shard0),
            "dot_dtype": cfg.model.get("dot_dtype", "float32"),
        }
        mkw = (
            {"smoothing": cfg.model.smoothing}
            if cfg.model.name == "hmm" else {}
        )
    if distributed:
        from multimodalworddiscovery_tpu.parallel import multihost

        mesh = multihost.global_mesh()
    else:
        mesh = make_mesh() if cfg.train.data_parallel else None

    writer = MetricsWriter(
        workdir / "train_metrics.jsonl",
        tensorboard_dir=(workdir / "tb") if cfg.train.get("tensorboard", False) else None,
    )
    start = 0
    if will_resume:
        params, start = ckpt.restore(params)
        start += 1
        if is_coord:
            print(f"resumed from iteration {start}")

    scale_schedule = None
    if n_anneal:
        # same beta ramp as the resident path; sliced at `start` so a
        # resumed run continues the exact temperature schedule
        beta0 = float(cfg.model.get("anneal_beta0", 0.25))
        total = cfg.train.num_iterations
        scale_schedule = np.concatenate(
            [np.linspace(beta0, 1.0, max(n_anneal, 1)),
             np.ones(max(total - n_anneal, 0))]
        )[:total][start:]
        if is_coord:
            print(
                f"deterministic annealing: emission temperature "
                f"{beta0:g} -> 1 over {n_anneal} iterations (streamed)"
            )

    def on_iteration(i, p, ll):
        it = start + i
        if is_coord:
            writer.write(it, loglik=ll)
            print(f"iter {it:4d}  loglik {ll:.2f}")
        if (it + 1) % cfg.train.checkpoint_every == 0 or it == cfg.train.num_iterations - 1:
            # collective under jax.distributed (see cmd_train)
            ckpt.save(it, jax.tree.map(_host_local_copy, p) if distributed else p)

    t0 = time.perf_counter()
    if distributed:
        # pod-scale out-of-core: every process streams ITS OWN shard subset
        params, lls = multihost.train_streaming_multihost(
            mod, params, reader, cfg.train.num_iterations - start,
            mesh=mesh, count_kwargs=ckw, m_step_kwargs=mkw,
            prefetch=int(cfg.train.get("stream_prefetch", 1)),
            on_iteration=on_iteration, scale_schedule=scale_schedule,
        )
    elif cfg.model.name == "hmm_dnn":
        # incremental generalized EM: per-shard neural updates, exact pooled
        # prior/transition counts (models/hmm_dnn.train_streaming)
        params, lls = mod.train_streaming(
            params, reader, cfg.train.num_iterations - start,
            use_pallas=ckw["use_pallas"], dot_dtype=ckw["dot_dtype"],
            prefetch=int(cfg.train.get("stream_prefetch", 1)),
            on_iteration=on_iteration,
        )
    else:
        params, lls = train_streaming(
            mod, params, reader, cfg.train.num_iterations - start,
            count_kwargs=ckw, m_step_kwargs=mkw, mesh=mesh,
            prefetch=int(cfg.train.get("stream_prefetch", 1)),
            on_iteration=on_iteration, scale_schedule=scale_schedule,
        )
    ckpt.close()
    writer.close()
    if is_coord:
        print(
            f"streamed EM over {reader.num_shards} shards x {reader.shard_size} "
            f"utterances ({reader.n} total"
            + (f", {mesh.shape} mesh" if mesh else "")
            + f") in {time.perf_counter() - t0:.2f}s"
        )


def cmd_train(args) -> None:
    cfg = load_config(args.config) if args.config else base_config()
    apply_overrides(cfg, args.override)

    distributed = bool(cfg.train.get("distributed", False))
    if distributed:
        # must run before the first backend touch — including the profiler
        # trace below, which initializes the backend (jax.distributed
        # refuses to initialize after that).  multihost.initialize is
        # idempotent, so the profiled re-entry is fine.
        from multimodalworddiscovery_tpu.parallel import multihost

        multihost.initialize()
        if not cfg.train.data_parallel:
            raise SystemExit("train.distributed requires train.data_parallel=true")
    is_coord = (not distributed) or jax.process_index() == 0

    if cfg.train.get("profile", False) and not getattr(args, "_profiling", False):
        # capture the WHOLE training run (compile + steps) as a device trace
        from multimodalworddiscovery_tpu.utils.profiling import trace

        args._profiling = True
        with trace(Path(args.workdir) / "profile"):
            cmd_train(args)
        if is_coord:
            print(f"wrote device trace to {Path(args.workdir) / 'profile'}")
        return

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    if args.fresh and is_coord:
        # drop old checkpoints ENTIRELY: merely skipping the restore leaves
        # stale higher-step checkpoints behind, and a fresh run with fewer
        # iterations would then lose latest_step() to them at decode time
        # (observed: evaluate restored the pre-fresh model — with a changed
        # vq_frontend code space, a shape error; with same shapes, silently
        # the wrong parameters)
        import shutil

        shutil.rmtree(workdir / "ckpt", ignore_errors=True)
    if is_coord:
        _save_config(cfg, workdir)

    if cfg.data.source == "stream":
        _train_streaming_cmd(cfg, args, workdir)
        return

    corpus, _ = _load_data(cfg)
    corpus = _apply_vq_frontend(
        cfg, corpus, workdir, distributed, fresh=args.fresh
    )
    mod, params, step = _make_model(cfg, corpus)

    em_models = ("model1", "hmm", "hmm_gaussian", "hmm_dnn")
    # hmm_crf is gradient-trained too (n_sgd Adam steps through the marginal
    # per call + closed-form transition M-step from the batch's counts), so it
    # minibatches the same way as the neural models
    grad_models = ("attention", "grounding", "hmm_crf")
    edges = [int(e) for e in str(cfg.train.get("bucket_edges", "")).split(",") if e.strip()]
    batch_size = int(cfg.train.get("batch_size", 0))
    if edges and cfg.model.name not in em_models:
        raise SystemExit(
            f"train.bucket_edges requires an EM aligner {em_models}; "
            f"{cfg.model.name!r} is gradient-trained — use train.batch_size"
        )
    if batch_size and cfg.model.name not in grad_models:
        raise SystemExit(
            f"train.batch_size requires a gradient model {grad_models}; "
            f"EM aligners use train.bucket_edges for ragged corpora"
        )
    n_anneal = int(cfg.model.get("anneal_iters", 0) or 0)
    if n_anneal and cfg.model.name != "hmm_gaussian":
        raise SystemExit(
            "model.anneal_iters (deterministic annealing) requires "
            "model.name=hmm_gaussian"
        )
    if n_anneal and edges:
        raise SystemExit(
            "model.anneal_iters does not compose with train.bucket_edges; "
            "use train.corpus_chunks for memory instead"
        )
    if distributed and edges and cfg.model.name == "hmm_dnn":
        raise SystemExit(
            "train.distributed + train.bucket_edges supports the closed-form "
            "EM aligners only: hmm_dnn's neural M-step consumes per-bucket "
            "POSTERIORS (sharded activations — pooling them would ship "
            "O(corpus) across hosts every iteration: 1.06 GB/iter at the "
            "Flickr8k bench shape, 13.4 GB/iter at MSCOCO scale, vs <= 1.4 MB "
            "for the supported paths; docs/PERFORMANCE.md 'Rejected "
            "compositions').  Use single-host bucketed EM or the chunked "
            "path for hmm_dnn"
        )

    ckpt = CheckpointManager(workdir / "ckpt")
    writer = MetricsWriter(
        workdir / "train_metrics.jsonl",
        tensorboard_dir=(workdir / "tb") if cfg.train.get("tensorboard", False) else None,
    )

    if edges:
        # --- exact length-bucketed EM (optionally data-parallel, optionally
        # spanning hosts: parallel/multihost.train_bucketed_multihost) ---
        from multimodalworddiscovery_tpu.models.bucketed import train_bucketed

        smoothing = (
            cfg.model.smoothing if cfg.model.name in ("model1", "hmm") else 1e-6
        )
        use_pallas = (
            _resolve_use_pallas(cfg, corpus)
            if cfg.model.name != "model1" else False
        )
        t0 = time.perf_counter()

        def on_iteration(it, p, ll):
            if is_coord:
                writer.write(it, loglik=ll)
                print(f"iter {it:4d}  loglik {ll:.2f}")
            if (it + 1) % cfg.train.checkpoint_every == 0 or it == cfg.train.num_iterations - 1:
                # collective under jax.distributed (see the EM loop below)
                ckpt.save(
                    it,
                    jax.tree.map(_host_local_copy, p) if distributed else p,
                )

        if distributed:
            from multimodalworddiscovery_tpu.parallel import multihost

            mesh = multihost.global_mesh()
            lo, hi = multihost.process_slice(corpus.n)
            local = jax.tree.map(lambda x: x[lo:hi], corpus)
            params, _ = multihost.train_bucketed_multihost(
                mod, params, local, edges, cfg.train.num_iterations,
                smoothing=smoothing, mesh=mesh, use_pallas=use_pallas,
                on_iteration=on_iteration,
            )
        else:
            mesh = make_mesh() if cfg.train.data_parallel else None
            params, _ = train_bucketed(
                mod, params, corpus, edges, cfg.train.num_iterations,
                smoothing=smoothing, mesh=mesh, use_pallas=use_pallas,
                on_iteration=on_iteration,
            )
        ckpt.close()
        writer.close()
        if is_coord:
            print(
                f"bucketed EM ({len(edges) + 1} buckets"
                + (f", {mesh.shape} mesh" if mesh else "")
                + f") in {time.perf_counter() - t0:.2f}s"
            )
        return

    chunks = int(cfg.train.get("corpus_chunks", 1))
    if chunks > 1:
        if cfg.model.name not in ("model1", "hmm", "hmm_gaussian"):
            raise SystemExit(
                "train.corpus_chunks requires a closed-form EM aligner "
                "(model1/hmm/hmm_gaussian); hmm_dnn's neural M-step needs "
                "the per-chunk posteriors — use train.bucket_edges instead"
            )
        # exact chunk-scanned E-step: activation memory / chunks
        from multimodalworddiscovery_tpu.models.bucketed import (
            chunked_expected_counts,
        )

        use_pallas = (
            _resolve_use_pallas(cfg, corpus) if cfg.model.name != "model1"
            else False
        )
        smoothing = (
            cfg.model.smoothing if cfg.model.name in ("model1", "hmm") else 1e-6
        )

        def step(p, c, _mod=mod, **kw):
            counts, ll = chunked_expected_counts(
                _mod, p, c, chunks, use_pallas=use_pallas, **kw
            )
            return _mod.m_step(p, counts, smoothing), {"loglik": ll}

        print(f"E-step scans {chunks} corpus chunks per iteration")

    anneal_sched = None
    if n_anneal:
        # deterministic annealing: emission temperature beta0 -> 1 over the
        # first anneal_iters EM iterations, then exact EM.  The scale is a
        # TRACED argument (one compile; resume indexes the same schedule).
        beta0 = float(cfg.model.get("anneal_beta0", 0.25))
        total = cfg.train.num_iterations
        anneal_sched = np.concatenate(
            [np.linspace(beta0, 1.0, max(n_anneal, 1)),
             np.ones(max(total - n_anneal, 0))]
        )[:total].astype(np.float32)
        base_step = step

        def step(p, c, scale, _base=base_step):
            return _base(p, c, emit_scale=scale)

        print(
            f"deterministic annealing: emission temperature "
            f"{beta0:g} -> 1 over {n_anneal} iterations"
        )

    mesh = None
    if batch_size:
        # --- minibatch SGD for the gradient models (device-resident corpus,
        # per-step on-device gather; guide computed per batch inside step) ---
        from multimodalworddiscovery_tpu.models.minibatch import make_minibatch_step

        if distributed:
            # pod-scale: process-spanning mesh, per-process corpus slice,
            # per-device LOCAL batch sampling (no cross-host gathers),
            # gradient all-reduce from the replicated output sharding
            from multimodalworddiscovery_tpu.parallel import multihost

            mesh = multihost.global_mesh()
            lo, hi = multihost.process_slice(corpus.n)
            local = jax.tree.map(lambda x: x[lo:hi], corpus)
            corpus = multihost.global_corpus_from_local(local, mesh)
            mb_step = make_minibatch_step(
                step, corpus, batch_size, mesh=mesh, sample="local"
            )
        elif cfg.train.data_parallel:
            mesh = make_mesh()
            corpus = shard_corpus(corpus, mesh)
            mb_step = make_minibatch_step(step, corpus, batch_size, mesh=mesh)
        else:
            mb_step = make_minibatch_step(step, corpus, batch_size, mesh=mesh)

        start = 0
        if ckpt.latest_step() is not None and not args.fresh:
            params, start = ckpt.restore(params)
            start += 1
            if is_coord:
                print(f"resumed from step {start}")
        if distributed:
            params = multihost.replicate_to_global(params, mesh)
        key = jax.random.PRNGKey(cfg.seed)
        t_total = 0.0
        for it in range(start, cfg.train.num_iterations):
            t0 = time.perf_counter()
            params, stats = mb_step(params, jax.random.fold_in(key, it))
            jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
            dt = time.perf_counter() - t0
            t_total += dt
            ll = float(stats["loglik"])
            if is_coord:
                writer.write(it, loglik=ll, seconds=dt, batch_size=batch_size)
                if it % 20 == 0 or it == cfg.train.num_iterations - 1:
                    print(f"step {it:5d}  loglik {ll:.2f}  ({dt*1e3:.1f} ms)")
            if (it + 1) % cfg.train.checkpoint_every == 0 or it == cfg.train.num_iterations - 1:
                ckpt.save(
                    it,
                    jax.tree.map(_host_local_copy, params) if distributed else params,
                )
        ckpt.close()
        writer.close()
        if is_coord:
            print(
                f"trained {cfg.train.num_iterations - start} minibatch steps "
                f"(B={batch_size}"
                + (f", {mesh.shape} mesh" if mesh else "")
                + f") in {t_total:.2f}s"
            )
        return

    if cfg.train.data_parallel:
        # guided attention composes too: the guide matrix is computed inside
        # the step from teacher params, so sharding the (padded) corpus is
        # transparent to it
        if distributed:
            # process-spanning mesh; THIS process keeps only its own slice
            # of the loaded corpus (a from-disk loader would read just the
            # slice — parallel/multihost.process_slice is the range)
            from multimodalworddiscovery_tpu.parallel import multihost

            mesh = multihost.global_mesh()
            lo, hi = multihost.process_slice(corpus.n)
            local = jax.tree.map(lambda x: x[lo:hi], corpus)
            corpus = multihost.global_corpus_from_local(local, mesh)
        else:
            mesh = make_mesh()
            corpus = shard_corpus(corpus, mesh)
        step = make_data_parallel_step(
            step, mesh, n_extra_args=1 if anneal_sched is not None else 0
        )
    else:
        step = jax.jit(step)

    start = 0
    if ckpt.latest_step() is not None and not args.fresh:
        params, start = ckpt.restore(params)
        start += 1
        if is_coord:
            print(f"resumed from iteration {start}")
    if distributed:
        # params are identical host-local arrays on every process (same init
        # or same restored checkpoint); lift them to replicated global arrays
        # on the process-spanning mesh.  Done AFTER restore so the checkpoint
        # template stays host-local (every process reads the shared dir).
        from multimodalworddiscovery_tpu.parallel import multihost

        params = multihost.replicate_to_global(params, mesh)

    t_total = 0.0
    for it in range(start, cfg.train.num_iterations):
        t0 = time.perf_counter()
        if anneal_sched is not None:
            params, stats = step(params, corpus, jnp.float32(anneal_sched[it]))
        else:
            params, stats = step(params, corpus)
        jax.block_until_ready(params)
        dt = time.perf_counter() - t0
        t_total += dt
        ll = float(stats["loglik"])
        if is_coord:
            writer.write(it, loglik=ll, seconds=dt)
            print(f"iter {it:4d}  loglik {ll:.2f}  ({dt*1e3:.1f} ms)")
        if (it + 1) % cfg.train.checkpoint_every == 0 or it == cfg.train.num_iterations - 1:
            # orbax saves are COLLECTIVE under jax.distributed (internal
            # cross-process barriers) — every process must call save; params
            # are fully replicated so each passes an identical host copy and
            # orbax's primary host does the writing
            ckpt.save(
                it,
                jax.tree.map(_host_local_copy, params) if distributed else params,
            )
    ckpt.close()
    writer.close()
    if is_coord:
        print(f"trained {cfg.train.num_iterations - start} iterations in {t_total:.2f}s")


def cmd_shard(args) -> None:
    """Split a corpus (synthetic or disk) into fixed-shape shards for
    streaming EM (data/stream.py)."""
    from multimodalworddiscovery_tpu.data.stream import write_shards

    cfg = load_config(args.config) if args.config else base_config()
    apply_overrides(cfg, args.override)
    if cfg.data.source == "stream":
        raise SystemExit("source corpus must be synthetic or disk, not stream")
    corpus, gold = _load_data(cfg)
    if args.storage_dtype == "float16" and not np.issubdtype(
        np.asarray(corpus.src).dtype, np.floating
    ) and not np.issubdtype(np.asarray(corpus.trg).dtype, np.floating):
        raise SystemExit(
            "--storage-dtype float16 only compresses FLOAT fields; this "
            "corpus is fully discrete (int tokens) — drop the flag"
        )
    n = write_shards(
        corpus, args.output, args.shard_size, gold=gold, shuffle=args.shuffle,
        storage_dtype=args.storage_dtype,
    )
    note = f", shuffled (seed {args.shuffle})" if args.shuffle is not None else ""
    if args.storage_dtype:
        note += f", float fields stored {args.storage_dtype}"
    print(
        f"wrote {n} shards x {args.shard_size} utterances "
        f"({corpus.n} total{note}) to {args.output}"
    )


def _restore(workdir: Path, overrides: list[str] | None = None, cfg=None):
    if cfg is None:
        cfg = _load_workdir_config(workdir)
        if overrides:
            # eval-time knobs (retrieval_pool, dtw sampling, null_threshold, ...)
            apply_overrides(cfg, overrides)
    elif overrides:
        raise ValueError(
            "pass EITHER a pre-built cfg (with overrides already applied) "
            "OR overrides, not both — overrides are ignored when cfg is given"
        )
    corpus, gold = _load_data(cfg)
    corpus = _apply_vq_frontend(cfg, corpus, workdir, fit_allowed=False)
    mod, params, _ = _make_model(cfg, corpus, init_only=True)
    ckpt = CheckpointManager(workdir / "ckpt")
    params, step = ckpt.restore(params)
    ckpt.close()
    return cfg, corpus, gold, mod, params


def _vq_frontend_gate(cfg) -> bool:
    """True iff model.vq_frontend is on; raises for non-discrete aligners
    (the ONE model gate — three call sites must never drift)."""
    if not bool(cfg.model.get("vq_frontend", False)):
        return False
    if cfg.model.name not in ("model1", "hmm"):
        raise SystemExit(
            "model.vq_frontend quantizes inputs for the discrete aligners "
            f"(model1/hmm); {cfg.model.name!r} consumes frames directly"
        )
    return True


def _apply_vq_frontend(cfg, corpus, workdir: Path, distributed: bool = False,
                       fit_allowed: bool = True, fresh: bool = False):
    """model.vq_frontend: k-means-quantize continuous frames for the
    DISCRETE aligners (the reference's continuous-SMT mode, SURVEY.md §2
    C5).  The codebook is a persisted workdir artifact: fit once at train
    time, reloaded afterwards so every process/restart quantizes with the
    SAME centroids.  Without the flag, a continuous corpus into a discrete
    aligner errors loudly (the models also refuse at init)."""
    if not _vq_frontend_gate(cfg):
        if cfg.model.name in ("model1", "hmm") and corpus.src.ndim == 3:
            raise SystemExit(
                f"model.name={cfg.model.name} has discrete emissions but the "
                "corpus is continuous frames; set model.vq_frontend=true to "
                "k-means-quantize them (model.vq_codes ids), or use "
                "hmm_gaussian / hmm_dnn"
            )
        return corpus
    if corpus.src.ndim != 3:
        raise SystemExit(
            "model.vq_frontend needs continuous [N,Ts,D] frames; this "
            "corpus is already discrete"
        )
    from multimodalworddiscovery_tpu.frontend import vq

    is_coord = (not distributed) or jax.process_index() == 0
    want_codes = int(cfg.model.get("vq_codes", 64))
    path = workdir / "vq_codebook.npy"
    refit = fresh and fit_allowed
    if path.exists() and not refit:
        cb = vq.load_codebook(path)
        if (
            int(cb.shape[0]) != want_codes
            or int(cb.shape[1]) != int(corpus.src.shape[-1])
        ):
            # a silently-reused stale codebook would quantize into a
            # different code space than the config says (or crash later in
            # an opaque einsum on a feat-dim mismatch)
            raise SystemExit(
                f"workdir codebook is {int(cb.shape[0])}x{int(cb.shape[1])} "
                f"but the config wants {want_codes} codes over "
                f"{int(corpus.src.shape[-1])}-d frames: retrain with "
                "--fresh or use a new workdir"
            )
    elif not fit_allowed:
        # decode/eval must quantize with the TRAINING codebook — fitting a
        # fresh one here would silently decode in a different code space
        raise SystemExit(
            f"vq_frontend codebook missing ({path}): this workdir was not "
            "trained with model.vq_frontend, or the artifact was deleted"
        )
    else:
        cb = vq.fit_codebook(
            corpus, n_codes=want_codes, key=jax.random.PRNGKey(cfg.seed),
        )
        # deterministic fit: under jax.distributed every process computes
        # the identical codebook; only the coordinator writes the artifact
        # (atomic save — a racing reader sees a complete file or none)
        if is_coord:
            vq.save_codebook(path, cb)
            print(
                f"vq_frontend: frames quantized into {cb.shape[0]} codes "
                f"(codebook -> {path})"
            )
    return vq.quantize(corpus, cb)


def _apply_vq_frontend_streaming(cfg, reader, workdir: Path, distributed: bool,
                                 fit_allowed: bool = True, fresh: bool = False):
    """Streamed vq_frontend: quantize every shard ONCE into a parallel
    discrete shard dir in the workdir (codebook from a cross-shard
    reservoir), then stream the code shards.  Subsequent commands (and
    distributed resumes) reuse the artifacts read-only."""
    if not _vq_frontend_gate(cfg):
        return reader
    import numpy as _np

    src0 = _np.load(reader.directory / "src_0.npy", mmap_mode="r")
    if src0.ndim != 3:
        raise SystemExit(
            "model.vq_frontend needs continuous [N,Ts,D] frame shards; "
            "this shard dir is already discrete"
        )
    from multimodalworddiscovery_tpu.data.stream import ShardedCorpusReader
    from multimodalworddiscovery_tpu.frontend import vq
    from multimodalworddiscovery_tpu.models.hmm_gaussian import (
        quantize_shards_streaming,
    )

    code_dir = workdir / "vq_frontend_codes"
    path = workdir / "vq_codebook.npy"
    want_codes = int(cfg.model.get("vq_codes", 64))
    have = path.exists() and (code_dir / "manifest.json").exists()
    if fresh and fit_allowed:
        have = False  # --fresh: refit (the checkpoint is ignored too)
    elif have:
        # staleness checks: silently streaming an OLD corpus's code shards
        # (or an old code space) would train on the wrong data — and a
        # silent REFIT would be worse: any existing checkpoint's emission
        # table is indexed by the OLD code ids, so mismatches always raise
        # (only --fresh, which also discards the checkpoint, refits)
        creader = ShardedCorpusReader(code_dir)
        same_corpus = (
            (creader.n, creader.num_shards, creader.shard_size)
            == (reader.n, reader.num_shards, reader.shard_size)
        )
        if not (same_corpus and creader.src_vocab == want_codes):
            raise SystemExit(
                f"vq_frontend artifacts in {code_dir} were built for a "
                f"different corpus/codebook (codes {creader.src_vocab} "
                f"vs {want_codes}, shards {creader.num_shards}x"
                f"{creader.shard_size}/{creader.n} vs {reader.num_shards}"
                f"x{reader.shard_size}/{reader.n}): retrain single-host "
                "with --fresh or use a new workdir"
            )
    if not have:
        if not fit_allowed:
            raise SystemExit(
                f"vq_frontend artifacts missing ({path} / {code_dir}): this "
                "workdir was not trained with model.vq_frontend, or they "
                "were deleted"
            )
        if distributed:
            # partitioned writes into the SHARED workdir: codebook from the
            # cross-process merged reservoir (identical on every process),
            # process p quantizes+writes its own shard subset, coordinator
            # writes the manifest/codebook, one barrier orders writes
            # before any read
            from jax.experimental import multihost_utils

            from multimodalworddiscovery_tpu.parallel import multihost

            pid, n_proc = jax.process_index(), jax.process_count()
            frames = multihost.reservoir_frames_multihost(reader)
            cb = vq.fit_codebook_streaming(
                reader, n_codes=want_codes,
                key=jax.random.PRNGKey(cfg.seed), frames=frames,
            )
            if pid == 0:
                vq.save_codebook(path, cb)
            quantize_shards_streaming(
                reader, code_dir, codebook=cb,
                shard_ids=range(pid, reader.num_shards, n_proc),
                write_manifest=(pid == 0),
            )
            multihost_utils.sync_global_devices("mwd_vq_frontend_codes")
        else:
            cb = vq.fit_codebook_streaming(
                reader, n_codes=want_codes, key=jax.random.PRNGKey(cfg.seed),
            )
            vq.save_codebook(path, cb)
            quantize_shards_streaming(reader, code_dir, codebook=cb)
        if (not distributed) or jax.process_index() == 0:
            print(
                f"vq_frontend: {reader.num_shards} shards quantized into "
                f"{int(cb.shape[0])} codes ({code_dir})"
            )
    return ShardedCorpusReader(code_dir)


def _restore_streaming(cfg, workdir: Path):
    """(reader, shard0, mod, params) for a streamed workdir: the parameter
    TEMPLATE comes from shard 0 (every shard shares shapes/vocabs — manifest
    constants), then the checkpoint restore overwrites it."""
    from multimodalworddiscovery_tpu.data.stream import ShardedCorpusReader

    reader = ShardedCorpusReader(cfg.data.dir)
    reader = _apply_vq_frontend_streaming(
        cfg, reader, workdir, distributed=False, fit_allowed=False
    )
    shard0 = reader.load_shard(0)
    mod, params, _ = _make_model(cfg, shard0, init_only=True)
    ckpt = CheckpointManager(workdir / "ckpt")
    params, _ = ckpt.restore(params)
    ckpt.close()
    return reader, shard0, mod, params


def _decode_streaming(cfg, workdir: Path, args, with_segments: bool) -> None:
    """Out-of-core decode: align (and optionally segment) shard by shard —
    ONE jit reused for every shard (same padded shape); only the int32
    alignment rows / segment triples reach the host (tiny next to the
    feature arrays that stay on disk)."""
    reader, shard0, mod, params = _restore_streaming(cfg, workdir)
    kw = _decode_kwargs(cfg, mod, shard0)

    @jax.jit
    def decode(p, shard):
        a = mod.align(p, shard, **kw)
        if not with_segments:
            return a, None, None
        segs, mask = segments_from_alignment(a, shard.trg, shard.src_len)
        return a, segs, mask

    from multimodalworddiscovery_tpu.data.stream import prefetched

    alignment = np.zeros((reader.n, reader.max_src_len), dtype=np.int32)
    src_len = np.zeros((reader.n,), dtype=np.int32)
    segments: list[list[tuple[int, int, int]]] = []
    # prefetch overlaps the next shard's disk+H2D with this shard's decode,
    # matching the streamed train/evaluate/discover paths
    loads = prefetched(
        lambda k: reader.load_shard(k) if k else shard0,
        reader.num_shards,
        prefetch=int(cfg.train.get("stream_prefetch", 1)),
    )
    for k, shard in enumerate(loads):
        a, segs, mask = decode(params, shard)
        lo = k * reader.shard_size
        hi = min(lo + reader.shard_size, reader.n)
        alignment[lo:hi] = np.asarray(a)[: hi - lo]
        src_len[lo:hi] = np.asarray(shard.src_len)[: hi - lo]
        if with_segments:
            segments.extend(segments_to_host(segs, mask)[: hi - lo])
    name = "segments.json" if with_segments else "alignment.json"
    out = Path(args.output or workdir / name)
    save_alignment_json(
        alignment, src_len, out, segments=segments if with_segments else None
    )
    print(f"wrote {out} (streamed {reader.num_shards} shards)")


def cmd_align(args) -> None:
    workdir = Path(args.workdir)
    cfg = _load_workdir_config(workdir)
    if getattr(args, "override", None):
        apply_overrides(cfg, args.override)
    if cfg.data.source == "stream":
        _decode_streaming(cfg, workdir, args, with_segments=False)
        return
    cfg, corpus, _, mod, params = _restore(workdir, cfg=cfg)
    alignment = np.asarray(_align_call(cfg, mod, params, corpus))
    out = Path(args.output or workdir / "alignment.json")
    save_alignment_json(alignment, np.asarray(corpus.src_len), out)
    print(f"wrote {out}")


def cmd_segment(args) -> None:
    workdir = Path(args.workdir)
    cfg = _load_workdir_config(workdir)
    if getattr(args, "override", None):
        apply_overrides(cfg, args.override)
    if cfg.data.source == "stream":
        _decode_streaming(cfg, workdir, args, with_segments=True)
        return
    cfg, corpus, _, mod, params = _restore(workdir, cfg=cfg)
    alignment = _align_call(cfg, mod, params, corpus)
    segs, mask = segments_from_alignment(alignment, corpus.trg, corpus.src_len)
    out = Path(args.output or workdir / "segments.json")
    save_alignment_json(
        np.asarray(alignment),
        np.asarray(corpus.src_len),
        out,
        segments=segments_to_host(segs, mask),
    )
    print(f"wrote {out}")


_RETRIEVAL_MODELS = (
    "model1", "hmm", "hmm_gaussian", "hmm_dnn", "hmm_crf", "grounding",
)


def _pooled_scores(cfg, mod, params, corpus, cand, direction: str):
    """[Nq, C] pooled pair scores for the configured model — the one scoring
    dispatch shared by resident pooled retrieval and the streamed
    within-shard protocol."""
    from multimodalworddiscovery_tpu.eval.retrieval import (
        retrieval_scores_hmm_family_pooled,
        retrieval_scores_model1_pooled,
    )

    name = cfg.model.name
    if name == "model1":
        return retrieval_scores_model1_pooled(
            params, corpus, cand, direction=direction
        )
    if name in ("hmm", "hmm_gaussian", "hmm_dnn", "hmm_crf"):
        return retrieval_scores_hmm_family_pooled(
            mod, params, corpus, cand, direction=direction
        )
    return mod.retrieval_scores_pooled(params, corpus, cand, direction=direction)


def _retrieval_metrics(cfg, mod, params, corpus) -> dict:
    """recall@k — dense N x N by default, or over candidate pools when
    eval.retrieval_pool > 0 (the scalable protocol; VERDICT round-1 weak #5)."""
    from multimodalworddiscovery_tpu.eval.retrieval import (
        recall_at_k,
        recall_at_k_pooled,
        retrieval_scores_hmm_family,
        retrieval_scores_model1,
        sample_candidate_pools,
    )

    name = cfg.model.name
    pool = int(cfg.eval.get("retrieval_pool", 0))
    if pool:
        cand = sample_candidate_pools(
            corpus.n, min(pool, corpus.n), jax.random.PRNGKey(cfg.seed)
        )
        out: dict = {}
        for direction in ("c2i", "i2c"):
            scores = _pooled_scores(cfg, mod, params, corpus, cand, direction)
            out.update(recall_at_k_pooled(scores, direction=direction))
        return out
    if name == "model1":
        scores = retrieval_scores_model1(params, corpus)
    elif name in ("hmm", "hmm_gaussian", "hmm_dnn", "hmm_crf"):
        scores = retrieval_scores_hmm_family(mod, params, corpus)
    else:
        scores = mod.retrieval_scores(params, corpus)
    return recall_at_k(scores)


def _check_stream_pool(pool_cfg: int, reader) -> None:
    """Loud upfront rejection when NO shard can fill the configured pool —
    the within-shard protocol draws a query's distractors from its own
    shard, so a pool larger than every shard would silently produce no
    retrieval at all (round-4 review finding).

    Also warns loudly when the shard directory was written WITHOUT a
    shuffle: real corpora are ordered (by image / speaker / length —
    Flickr8k files are), so an unshuffled shard's candidates are
    correlated with its queries and the within-shard protocol is biased.
    Measured on a deliberately concept-sorted corpus the bias INFLATES
    recall — correlated distractors are near-clones of the true pairing
    and rarely beat it strictly, while unbiased uniform pools contain
    genuinely higher-scoring competitors (i2c recall@1 read up to +0.24
    absolute, ~2x, over the shuffled protocol with identical params;
    tests/test_stream.py::test_streamed_retrieval_ordered_shard_bias
    pins it)."""
    feasible = reader.shard_size if reader.num_shards > 1 else reader.n
    if pool_cfg > feasible:
        raise SystemExit(
            f"eval.retrieval_pool={pool_cfg} exceeds the within-shard "
            f"candidate supply ({feasible} rows per shard): lower the pool, "
            f"re-shard with a larger --shard-size, or materialize "
            f"(data.source=disk) for cross-corpus pools"
        )
    if reader.shuffle_seed is None and reader.num_shards > 1:
        print(
            "WARNING: streamed retrieval over an UNSHUFFLED multi-shard "
            f"corpus ({reader.directory}): each query ranks only against "
            "same-shard candidates, which are concept-correlated on ordered "
            "corpora — recall@k is biased (measured: i2c recall@1 INFLATED "
            "up to ~2x on a concept-sorted corpus). Re-shard with "
            "`mwd shard --shuffle SEED` for unbiased within-shard pools."
        )


def _shard_pool(pool_cfg: int, nv: int, seed: int, k: int):
    """Candidate pools for shard k's ``nv`` valid rows: dense within-shard
    when pool_cfg == 0, sampled pools otherwise; None when the (tail) shard
    is smaller than the pool.  The ONE pool-selection dispatch shared by
    streamed evaluate and streamed retrieve (so the two commands always
    report identical retrieval numbers for the same workdir)."""
    from multimodalworddiscovery_tpu.eval.retrieval import (
        dense_candidate_pools,
        sample_candidate_pools,
    )

    if pool_cfg == 0:
        return dense_candidate_pools(nv)
    if nv >= pool_cfg:
        return sample_candidate_pools(
            nv, pool_cfg, jax.random.fold_in(jax.random.PRNGKey(seed), k)
        )
    return None


def _streamed_dtw(cfg, res: dict, ga: np.ndarray) -> dict:
    """Score a reservoir sample of utterances (``_evaluate_streaming``'s
    ``res`` buffers) with the SAME DTW metrics as the resident path.  Rows
    are re-ordered by global utterance index so the result is a pure function
    of the sampled SET (when the sample covers the whole corpus, this matches
    resident DTW on the same utterances to float tolerance)."""
    from multimodalworddiscovery_tpu.eval.dtw import (
        cluster_dtw_coherence,
        dtw_to_gold,
    )

    order = np.argsort(res["idx"])
    feats = jnp.asarray(res["src"][order])
    src_len = jnp.asarray(res["src_len"][order])
    trg = jnp.asarray(res["trg"][order])
    pred_align = jnp.asarray(res["pred"][order])
    gold_align = jnp.asarray(ga[res["idx"][order]])

    pred_segs, pred_mask = segments_from_alignment(pred_align, trg, src_len)
    gold_segs, gold_mask = segments_from_alignment(gold_align, trg, src_len)
    max_len = int(cfg.eval.get("dtw_max_seg_len", 32))
    k_seg = min(pred_segs.shape[1], int(cfg.eval.get("dtw_segments", 8)))
    ps, pm = pred_segs[:, :k_seg], pred_mask[:, :k_seg]
    gs, gm = gold_segs[:, :k_seg], gold_mask[:, :k_seg]
    coh = cluster_dtw_coherence(feats, ps, pm, max_len)
    return dict(coh, to_gold=dtw_to_gold(feats, ps, pm, gs, gm, max_len))


def _evaluate_streaming(cfg, workdir: Path, args) -> None:
    """Out-of-core evaluation — EVERY metric family, no resident corpus:

    - alignment/word-IoU/boundary/purity/NMI decompose into additive
      per-utterance sufficient statistics (eval/metrics.py ``*_stats`` /
      ``*_from_stats``) accumulated as tiny count pytrees;
    - retrieval runs the WITHIN-SHARD pooled protocol: each query is ranked
      against candidates from its own shard (dense = the whole shard when
      eval.retrieval_pool=0, else sampled pools), and the per-query ranks —
      the streamable sufficient statistic — concatenate across shards.  On a
      single-shard corpus the dense variant equals resident dense recall
      exactly (tests/test_cli.py pins it);
    - DTW coherence/to-gold scores a RESERVOIR sample of utterances drawn
      uniformly across all shards (the resident path already scores a capped
      sample — eval.dtw_utterances — so sampling is the protocol, only the
      draw becomes corpus-wide instead of prefix-of-corpus)."""
    from multimodalworddiscovery_tpu.data.io import load_alignment_json
    from multimodalworddiscovery_tpu.data.stream import (
        ShardedCorpusReader,
        tree_sum_bounded,
    )
    from multimodalworddiscovery_tpu.eval.metrics import (
        alignment_from_stats,
        alignment_stats,
        boundary_from_stats,
        boundary_stats,
        purity_counts,
        purity_from_counts,
        word_iou_from_stats,
        word_iou_stats,
    )

    reader, shard0, mod, params = _restore_streaming(cfg, workdir)
    gold_path = reader.directory / "gold.json"
    if not gold_path.exists():
        raise SystemExit(f"no gold annotations ({gold_path}) in the shard dir")
    # gold alignments for the FULL corpus are [N, Ts] int32 — tiny next to
    # the feature arrays, which never leave disk
    gold = load_alignment_json(gold_path, reader.n, reader.max_src_len)
    ga = np.zeros(
        (reader.num_shards * reader.shard_size, reader.max_src_len), np.int32
    )
    ga[: reader.n] = gold.alignment

    kw = _decode_kwargs(cfg, mod, shard0)
    tol = int(cfg.eval.boundary_tolerance)
    thr = float(cfg.eval.iou_threshold)
    n_concepts = reader.trg_vocab

    @jax.jit
    def shard_stats(p, shard, gold_align):
        alignment = mod.align(p, shard, **kw)
        pred_segs, pred_mask = segments_from_alignment(
            alignment, shard.trg, shard.src_len
        )
        gold_segs, gold_mask = segments_from_alignment(
            gold_align, shard.trg, shard.src_len
        )
        pb = boundaries_from_segments(pred_segs, pred_mask, shard.max_src_len)
        gb = boundaries_from_segments(gold_segs, gold_mask, shard.max_src_len)
        return {
            "alignment": alignment_stats(alignment, gold_align, shard.src_mask()),
            "word_iou": word_iou_stats(pred_segs, pred_mask, gold_segs, gold_mask, thr),
            "boundary": boundary_stats(pb, gb, tol),
            "purity": purity_counts(pred_segs, pred_mask, gold_segs, gold_mask, n_concepts),
        }, alignment

    from multimodalworddiscovery_tpu.data.stream import prefetched
    from multimodalworddiscovery_tpu.eval.retrieval import (
        ranks_from_pooled,
        recall_from_ranks,
    )

    do_retrieval = bool(cfg.eval.retrieval) and cfg.model.name in _RETRIEVAL_MODELS
    do_dtw = bool(cfg.eval.get("dtw", True)) and shard0.src.ndim == 3
    pool_cfg = int(cfg.eval.get("retrieval_pool", 0))
    if do_retrieval:
        _check_stream_pool(pool_cfg, reader)
    ranks: dict[str, list[np.ndarray]] = {"c2i": [], "i2c": []}
    retrieval_skipped = 0

    @functools.partial(jax.jit, static_argnames=("direction",))
    def pooled_ranks(p, sub, cand, direction):
        return ranks_from_pooled(_pooled_scores(cfg, mod, p, sub, cand, direction))

    # DTW reservoir (Algorithm R, seeded): uniform over the WHOLE corpus
    k_utt = min(reader.n, int(cfg.eval.get("dtw_utterances", 64)))
    if do_dtw:
        rng = np.random.default_rng(cfg.seed)
        feat_dim = shard0.src.shape[-1]
        res = {
            "idx": np.zeros(k_utt, np.int64),
            "src": np.zeros((k_utt, reader.max_src_len, feat_dim), np.dtype(shard0.src.dtype)),
            "src_len": np.zeros(k_utt, np.int32),
            "trg": np.zeros((k_utt, reader.max_trg_len), np.int32),
            "trg_len": np.zeros(k_utt, np.int32),
            "pred": np.zeros((k_utt, reader.max_src_len), np.int32),
        }
        seen = 0

    def per_shard():
        nonlocal retrieval_skipped, seen
        loads = prefetched(
            lambda k: reader.load_shard(k) if k else shard0,
            reader.num_shards,
            prefetch=int(cfg.train.get("stream_prefetch", 1)),
        )
        for k, shard in enumerate(loads):
            lo = k * reader.shard_size
            nv = min(reader.shard_size, reader.n - lo)  # valid (non-pad) rows
            stats, alignment = shard_stats(
                params, shard, jnp.asarray(ga[lo: lo + reader.shard_size])
            )

            if do_retrieval:
                sub = jax.tree.map(lambda v: v[:nv], shard)
                cand = _shard_pool(pool_cfg, nv, cfg.seed, k)
                if cand is None:  # tail shard smaller than the pool
                    retrieval_skipped += nv
                else:
                    for direction in ("c2i", "i2c"):
                        ranks[direction].append(
                            np.asarray(pooled_ranks(params, sub, cand, direction))
                        )

            if do_dtw:
                # mmap row reads — the features never transit device->host
                src_mm = np.load(reader.directory / f"src_{k}.npy", mmap_mode="r")
                slen_mm = np.load(reader.directory / f"src_len_{k}.npy", mmap_mode="r")
                trg_mm = np.load(reader.directory / f"trg_{k}.npy", mmap_mode="r")
                tlen_mm = np.load(reader.directory / f"trg_len_{k}.npy", mmap_mode="r")
                align_host = None
                for j in range(nv):
                    slot = seen if seen < k_utt else None
                    if slot is None:
                        r = int(rng.integers(0, seen + 1))
                        slot = r if r < k_utt else None
                    seen += 1
                    if slot is None:
                        continue
                    if align_host is None:
                        align_host = np.asarray(alignment)
                    res["idx"][slot] = lo + j
                    res["src"][slot] = src_mm[j]
                    res["src_len"][slot] = slen_mm[j]
                    res["trg"][slot] = trg_mm[j]
                    res["trg_len"][slot] = tlen_mm[j]
                    res["pred"][slot] = align_host[j]

            yield stats

    from multimodalworddiscovery_tpu.eval.metrics import nmi_from_counts

    acc = tree_sum_bounded(per_shard())
    results = {
        "alignment": alignment_from_stats(acc["alignment"]),
        "word_iou": word_iou_from_stats(acc["word_iou"]),
        "boundary": boundary_from_stats(acc["boundary"]),
        "purity": purity_from_counts(acc["purity"]),
        "nmi": nmi_from_counts(acc["purity"]),
    }

    if do_dtw:
        results["dtw"] = _streamed_dtw(cfg, res, ga)
        if k_utt < reader.n:
            print(
                f"dtw: scored a {k_utt}/{reader.n}-utterance reservoir "
                "sample (eval.dtw_utterances)"
            )
    if do_retrieval and any(ranks.values()):
        pool_size = pool_cfg if pool_cfg else reader.shard_size
        for direction in ("c2i", "i2c"):
            r = np.concatenate(ranks[direction])
            results.setdefault("retrieval", {}).update(
                jax.tree.map(float, recall_from_ranks(r, pool_size, direction=direction))
            )
        proto = (
            "dense within-shard" if pool_cfg == 0
            else f"within-shard pools (C={pool_cfg})"
        )
        note = (
            f"; {retrieval_skipped} tail rows skipped (shard smaller than "
            "the pool)" if retrieval_skipped else ""
        )
        print(f"retrieval: {proto} protocol over {reader.num_shards} shards{note}")

    results = _to_jsonable(jax.tree.map(lambda x: float(x), results))
    out = Path(args.output or workdir / "metrics.json")
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    print(f"wrote {out} (streamed {reader.num_shards} shards)")


def cmd_evaluate(args) -> None:
    from multimodalworddiscovery_tpu.eval import (
        alignment_prf,
        boundary_prf,
        cluster_purity,
        word_iou,
    )

    workdir = Path(args.workdir)
    cfg = _load_workdir_config(workdir)
    if getattr(args, "override", None):
        apply_overrides(cfg, args.override)
    if cfg.data.source == "stream":
        _evaluate_streaming(cfg, workdir, args)
        return
    cfg, corpus, gold, mod, params = _restore(workdir, cfg=cfg)
    if gold is None:
        raise SystemExit("no gold annotations available for this dataset")

    alignment = _align_call(cfg, mod, params, corpus)
    gold_alignment = jnp.asarray(gold.alignment)

    pred_segs, pred_mask = segments_from_alignment(alignment, corpus.trg, corpus.src_len)
    gold_segs, gold_mask = segments_from_alignment(gold_alignment, corpus.trg, corpus.src_len)
    pb = boundaries_from_segments(pred_segs, pred_mask, corpus.max_src_len)
    gb = boundaries_from_segments(gold_segs, gold_mask, corpus.max_src_len)

    from multimodalworddiscovery_tpu.eval import cluster_nmi

    results = {
        "alignment": alignment_prf(alignment, gold_alignment, corpus.src_mask()),
        "word_iou": word_iou(pred_segs, pred_mask, gold_segs, gold_mask, cfg.eval.iou_threshold),
        "boundary": boundary_prf(pb, gb, tolerance=cfg.eval.boundary_tolerance),
        "purity": cluster_purity(pred_segs, pred_mask, gold_segs, gold_mask, corpus.trg_vocab),
        "nmi": cluster_nmi(pred_segs, pred_mask, gold_segs, gold_mask, corpus.trg_vocab),
    }
    if cfg.eval.get("dtw", True) and corpus.src.ndim == 3:
        # DTW scoring of discovered word units on acoustic frames
        # (SURVEY.md §3.5) — all on device.  The all-pairs matrix is
        # O((utts * segs)^2) DTW DPs, so it runs on an explicit, LOGGED
        # sample (no silent truncation).
        from multimodalworddiscovery_tpu.eval.dtw import (
            cluster_dtw_coherence,
            dtw_to_gold,
        )

        max_len = int(cfg.eval.get("dtw_max_seg_len", 32))
        k_utt = min(corpus.n, int(cfg.eval.get("dtw_utterances", 64)))
        k_seg = min(pred_segs.shape[1], int(cfg.eval.get("dtw_segments", 8)))
        if k_utt < corpus.n or k_seg < pred_segs.shape[1]:
            print(
                f"dtw: scoring first {k_utt}/{corpus.n} utterances, "
                f"{k_seg} segments each (eval.dtw_utterances/dtw_segments)"
            )
        feats = corpus.src[:k_utt]
        ps, pm = pred_segs[:k_utt, :k_seg], pred_mask[:k_utt, :k_seg]
        gs, gm = gold_segs[:k_utt, :k_seg], gold_mask[:k_utt, :k_seg]
        coh = cluster_dtw_coherence(feats, ps, pm, max_len)
        results["dtw"] = dict(
            coh, to_gold=dtw_to_gold(feats, ps, pm, gs, gm, max_len)
        )

    if cfg.eval.retrieval and cfg.model.name in _RETRIEVAL_MODELS:
        results["retrieval"] = _retrieval_metrics(cfg, mod, params, corpus)

    results = _to_jsonable(jax.tree.map(lambda x: float(x), results))
    out = Path(args.output or workdir / "metrics.json")
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    print(f"wrote {out}")


def _discover_streaming(cfg, workdir: Path, args) -> None:
    """Out-of-core audio-only discovery: segmental k-means EM streams shards
    (its centroid statistics are additive — segmental_kmeans.expected_counts),
    then a per-shard discover pass writes segments and accumulates the
    boundary/purity stats the same way streamed evaluate does."""
    from multimodalworddiscovery_tpu.data.io import load_alignment_json
    from multimodalworddiscovery_tpu.data.stream import (
        ShardedCorpusReader,
        prefetched,
        train_streaming,
        tree_sum_bounded,
    )
    from multimodalworddiscovery_tpu.eval.metrics import (
        boundary_from_stats,
        boundary_stats,
        nmi_from_counts,
        purity_counts,
        purity_from_counts,
    )
    from multimodalworddiscovery_tpu.models import segmental_kmeans as skm

    reader = ShardedCorpusReader(cfg.data.dir)
    shard0 = reader.load_shard(0)
    params = skm.init(
        shard0, n_clusters=args.clusters, key=jax.random.PRNGKey(cfg.seed)
    )  # centroids seeded from shard 0's candidate segments

    writer = MetricsWriter(workdir / "train_metrics.jsonl")

    def on_iteration(it, p, ll):
        writer.write(it, loglik=ll)
        print(f"iter {it:3d}  -distortion {ll:.1f}")

    params, _ = train_streaming(
        skm, params, reader, cfg.train.num_iterations,
        prefetch=int(cfg.train.get("stream_prefetch", 1)),
        on_iteration=on_iteration,
    )
    writer.close()

    has_gold = (reader.directory / "gold.json").exists()
    gold = (
        load_alignment_json(
            reader.directory / "gold.json", reader.n, reader.max_src_len
        )
        if has_gold else None
    )
    ga = np.zeros(
        (reader.num_shards * reader.shard_size, reader.max_src_len), np.int32
    )
    if gold is not None:
        ga[: reader.n] = gold.alignment
    n_lbl = max(args.clusters + 2, reader.trg_vocab)
    tol = int(cfg.eval.boundary_tolerance)

    @jax.jit
    def shard_discover(p, shard, gold_align):
        segs, mask = skm.discover(p, shard)
        stats = None
        if has_gold:
            gs, gm = segments_from_alignment(gold_align, shard.trg, shard.src_len)
            pb = boundaries_from_segments(segs, mask, shard.max_src_len)
            gb = boundaries_from_segments(gs, gm, shard.max_src_len)
            stats = {
                "boundary": boundary_stats(pb, gb, tol),
                "purity": purity_counts(segs, mask, gs, gm, n_lbl),
            }
        return segs, mask, stats

    recs = []
    all_stats = []
    loads = prefetched(
        lambda k: reader.load_shard(k) if k else shard0, reader.num_shards,
        prefetch=int(cfg.train.get("stream_prefetch", 1)),
    )
    for k, shard in enumerate(loads):
        lo = k * reader.shard_size
        hi = min(lo + reader.shard_size, reader.n)
        segs, mask, stats = shard_discover(
            params, shard, jnp.asarray(ga[lo: lo + reader.shard_size])
        )
        host_segs = segments_to_host(segs, mask)[: hi - lo]
        recs.extend(
            {"index": lo + i, "segments": [[int(a) for a in s] for s in host_segs[i]]}
            for i in range(hi - lo)
        )
        if stats is not None:
            all_stats.append(stats)
    out = Path(args.output or workdir / "discovered_segments.json")
    out.write_text(json.dumps(recs, indent=1))
    print(f"wrote {out} (streamed {reader.num_shards} shards)")

    if all_stats:
        acc = tree_sum_bounded(iter(all_stats))
        results = {
            "boundary": {k: float(v) for k, v in boundary_from_stats(acc["boundary"]).items()},
            "purity": float(purity_from_counts(acc["purity"])),
            "nmi": float(nmi_from_counts(acc["purity"])),
        }
        (workdir / "metrics.json").write_text(json.dumps(results, indent=2))
        print(json.dumps(results, indent=2))


def cmd_discover(args) -> None:
    """Audio-only word discovery: segmental k-means over a continuous corpus
    (reference comparison models, SURVEY.md §2 C9).  No concepts used."""
    from multimodalworddiscovery_tpu.eval.metrics import boundary_prf, cluster_purity
    from multimodalworddiscovery_tpu.models import segmental_kmeans as skm

    cfg = load_config(args.config) if args.config else base_config()
    cfg.data.continuous = True
    apply_overrides(cfg, args.override)
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    _save_config(cfg, workdir)

    if cfg.data.source == "stream":
        _discover_streaming(cfg, workdir, args)
        return

    corpus, gold = _load_data(cfg)
    params = skm.init(
        corpus, n_clusters=args.clusters, key=jax.random.PRNGKey(cfg.seed)
    )
    writer = MetricsWriter(
        workdir / "train_metrics.jsonl",
        tensorboard_dir=(workdir / "tb") if cfg.train.get("tensorboard", False) else None,
    )
    step = jax.jit(skm.em_step)
    for it in range(cfg.train.num_iterations):
        t0 = time.perf_counter()
        params, stats = step(params, corpus)
        jax.block_until_ready(params.centroids)
        writer.write(it, loglik=float(stats["loglik"]), n_segments=int(stats["n_segments"]),
                     seconds=time.perf_counter() - t0)
        print(f"iter {it:3d}  -distortion {float(stats['loglik']):.1f}  "
              f"segments {int(stats['n_segments'])}")
    writer.close()

    segs, mask = skm.discover(params, corpus)
    out = Path(args.output or workdir / "discovered_segments.json")
    host_segs = segments_to_host(segs, mask)
    recs = [{"index": i, "segments": [[int(a) for a in s] for s in host_segs[i]]}
            for i in range(corpus.n)]
    out.write_text(json.dumps(recs, indent=1))
    print(f"wrote {out}")

    if gold is not None:
        gold_segs, gold_mask = segments_from_alignment(
            jnp.asarray(gold.alignment), corpus.trg, corpus.src_len
        )
        pb = boundaries_from_segments(segs, mask, corpus.max_src_len)
        gb = boundaries_from_segments(gold_segs, gold_mask, corpus.max_src_len)
        n_lbl = max(args.clusters + 2, corpus.trg_vocab)
        results = {
            "boundary": {k: float(v) for k, v in boundary_prf(pb, gb, tolerance=cfg.eval.boundary_tolerance).items()},
            "purity": float(cluster_purity(segs, mask, gold_segs, gold_mask, n_lbl)),
        }
        (workdir / "metrics.json").write_text(json.dumps(results, indent=2))
        print(json.dumps(results, indent=2))


def _retrieve_streaming(cfg, workdir: Path, args) -> None:
    """Out-of-core retrieval: the same within-shard pooled protocol as
    streamed evaluation (dense = the whole shard when no pool is set), with
    top-k rankings reported as GLOBAL utterance indices."""
    from multimodalworddiscovery_tpu.data.stream import prefetched
    from multimodalworddiscovery_tpu.eval.retrieval import (
        ranks_from_pooled,
        recall_from_ranks,
    )

    if cfg.model.name not in _RETRIEVAL_MODELS:
        raise SystemExit(f"retrieval not supported for model {cfg.model.name!r}")
    reader, shard0, mod, params = _restore_streaming(cfg, workdir)

    pool_cfg = int(
        getattr(args, "pool", 0) or cfg.eval.get("retrieval_pool", 0) or 0
    )
    _check_stream_pool(pool_cfg, reader)

    @functools.partial(jax.jit, static_argnames=("direction",))
    def pooled(p, sub, cand, direction):
        scores = _pooled_scores(cfg, mod, p, sub, cand, direction)
        return scores, ranks_from_pooled(scores)

    ranks: dict[str, list[np.ndarray]] = {"c2i": [], "i2c": []}
    rankings: list[dict] = []
    skipped = 0
    loads = prefetched(
        lambda k: reader.load_shard(k) if k else shard0,
        reader.num_shards,
        prefetch=int(cfg.train.get("stream_prefetch", 1)),
    )
    for k, shard in enumerate(loads):
        lo = k * reader.shard_size
        nv = min(reader.shard_size, reader.n - lo)
        sub = jax.tree.map(lambda v: v[:nv], shard)
        cand = _shard_pool(pool_cfg, nv, cfg.seed, k)
        if cand is None:  # tail shard smaller than the pool
            skipped += nv
            continue
        for direction in ("c2i", "i2c"):
            scores, r = pooled(params, sub, cand, direction)
            ranks[direction].append(np.asarray(r))
            if direction == "c2i" and pool_cfg == 0:
                s = np.asarray(scores)
                cn = np.asarray(cand)
                order = np.argsort(-s, axis=1)[:, : args.top_k]
                for i in range(nv):
                    rankings.append({
                        "caption": lo + i,
                        "top_images": (lo + cn[i, order[i]]).tolist(),
                        "scores": [round(float(s[i, j]), 3) for j in order[i]],
                    })

    pool_size = pool_cfg if pool_cfg else reader.shard_size
    metrics: dict = {}
    for direction in ("c2i", "i2c"):
        r = np.concatenate(ranks[direction])
        metrics.update({
            k: round(float(v), 4)
            for k, v in recall_from_ranks(r, pool_size, direction=direction).items()
        })
    payload: dict = {"recall": metrics, "protocol": (
        "dense within-shard" if pool_cfg == 0
        else f"within-shard pools (C={pool_cfg})"
    )}
    if rankings:
        payload["rankings"] = rankings
    out = Path(args.output or workdir / "retrieval.json")
    out.write_text(json.dumps(payload, indent=1))
    print(json.dumps(metrics, indent=2))
    note = f"; {skipped} tail rows skipped" if skipped else ""
    print(f"wrote {out} (streamed {reader.num_shards} shards{note})")


def cmd_retrieve(args) -> None:
    """Cross-modal retrieval: rank images for every caption (and captions for
    every image) by alignment score; dump top-k + recall metrics
    (reference retrieval scripts, SURVEY.md §3.5)."""
    from multimodalworddiscovery_tpu.eval.retrieval import (
        recall_at_k,
        retrieval_scores_hmm_family,
        retrieval_scores_model1,
    )

    workdir = Path(args.workdir)
    cfg = _load_workdir_config(workdir)
    if getattr(args, "override", None):
        apply_overrides(cfg, args.override)
    if cfg.data.source == "stream":
        _retrieve_streaming(cfg, workdir, args)
        return
    cfg, corpus, _, mod, params = _restore(workdir, cfg=cfg)
    if args.pool:
        cfg.eval.retrieval_pool = args.pool
    if int(cfg.eval.get("retrieval_pool", 0)):
        # pooled protocol: rankings are within each caption's candidate pool
        metrics = {
            k: round(float(v), 4)
            for k, v in _retrieval_metrics(cfg, mod, params, corpus).items()
        }
        out = Path(args.output or workdir / "retrieval.json")
        out.write_text(json.dumps({"recall": metrics}, indent=1))
        print(json.dumps(metrics, indent=2))
        print(f"wrote {out}")
        return
    if cfg.model.name == "model1":
        scores = retrieval_scores_model1(params, corpus)
    elif cfg.model.name in ("hmm", "hmm_gaussian", "hmm_dnn", "hmm_crf"):
        scores = retrieval_scores_hmm_family(mod, params, corpus)
    elif cfg.model.name == "grounding":
        scores = mod.retrieval_scores(params, corpus)
    else:
        raise SystemExit(f"retrieval not supported for model {cfg.model.name!r}")

    s = np.asarray(scores)
    top = np.argsort(-s, axis=1)[:, : args.top_k]
    recs = [
        {"caption": i, "top_images": top[i].tolist(),
         "scores": [round(float(s[i, j]), 3) for j in top[i]]}
        for i in range(s.shape[0])
    ]
    out = Path(args.output or workdir / "retrieval.json")
    out.write_text(json.dumps({
        "recall": {k: float(v) for k, v in recall_at_k(scores).items()},
        "rankings": recs,
    }, indent=1))
    metrics = {k: round(float(v), 4) for k, v in recall_at_k(scores).items()}
    print(json.dumps(metrics, indent=2))
    print(f"wrote {out}")


def cmd_preprocess(args) -> None:
    """Build a corpus directory from public dataset artifacts
    (reference preprocessing scripts, SURVEY.md §2 C4/C13)."""
    from multimodalworddiscovery_tpu.data.io import save_corpus

    if args.dataset == "flickr8k":
        from multimodalworddiscovery_tpu.data import flickr8k

        corpus, gold, meta = flickr8k.build_corpus(
            args.captions, args.lexicon, args.concepts
        )
    elif args.dataset == "mscoco":
        from multimodalworddiscovery_tpu.data import mscoco

        corpus, gold, meta = mscoco.build_corpus(
            args.instances, args.captions, args.lexicon
        )
    else:
        raise SystemExit(f"unknown dataset {args.dataset!r}")

    out = Path(args.output)
    save_corpus(corpus, gold, out, args.name)
    (out / f"{args.name}_vocab.json").write_text(
        json.dumps(
            {"phones": meta["phone_vocab"], "concepts": meta["concept_vocab"],
             "utterance_ids": meta["utterance_ids"]},
            indent=1,
        )
    )
    print(
        f"wrote {out}/{args.name}_*: {corpus.n} utterances, "
        f"{corpus.src_vocab - 1} phones, {corpus.trg_vocab - 1} concepts"
    )


def cmd_export(args) -> None:
    """Export trained model parameters as a plain .npz (the reference's
    printModel-style artifact: inspectable tables, no orbax needed)."""
    workdir = Path(args.workdir)
    cfg = _load_workdir_config(workdir)
    if cfg.data.source == "stream":
        # export needs only the parameter template — never the corpus
        _, _, mod, params = _restore_streaming(cfg, workdir)
    else:
        cfg, corpus, _, mod, params = _restore(workdir, cfg=cfg)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for path, leaf in flat:
        key = "/".join(
            getattr(p, "name", None) or str(getattr(p, "key", getattr(p, "idx", p)))
            for p in path
        )
        arrays[key] = np.asarray(leaf)
    out = Path(args.output or workdir / "model.npz")
    np.savez(out, **arrays)
    print(f"wrote {out}: " + ", ".join(f"{k}{v.shape}" for k, v in list(arrays.items())[:6]))


def _lexicon_counts_streaming(cfg, workdir: Path):
    """Out-of-core lexicon: decode shard by shard (one jit), count phone
    sequences per concept on the host — the counters are O(lexicon), so the
    human-readable payoff of word discovery never needs the resident
    corpus."""
    from collections import Counter, defaultdict

    from multimodalworddiscovery_tpu.data.stream import prefetched

    reader, shard0, mod, params = _restore_streaming(cfg, workdir)
    kw = _decode_kwargs(cfg, mod, shard0)

    @jax.jit
    def decode(p, shard):
        a = mod.align(p, shard, **kw)
        return segments_from_alignment(a, shard.trg, shard.src_len)

    by_concept: dict[int, Counter] = defaultdict(Counter)
    loads = prefetched(
        lambda k: reader.load_shard(k) if k else shard0,
        reader.num_shards,
        prefetch=int(cfg.train.get("stream_prefetch", 1)),
    )
    for k, shard in enumerate(loads):
        nv = min(reader.shard_size, reader.n - k * reader.shard_size)
        segs, mask = decode(params, shard)
        host_segs = segments_to_host(segs, mask)[:nv]
        src = np.load(reader.directory / f"src_{k}.npy", mmap_mode="r")
        for i, utt_segs in enumerate(host_segs):
            for s, e, c in utt_segs:
                word = " ".join(str(int(p)) for p in src[i, s:e])
                by_concept[c][word] += 1
    return by_concept


def cmd_lexicon(args) -> None:
    """Dump the discovered lexicon: for each concept, the most frequent
    phone sequences among its discovered word segments (the human-readable
    payoff of word discovery; reference printModel-style dump)."""
    from collections import Counter, defaultdict

    workdir = Path(args.workdir)
    cfg = _load_workdir_config(workdir)
    if cfg.data.source == "stream":
        by_concept = _lexicon_counts_streaming(cfg, workdir)
    else:
        cfg, corpus, gold, mod, params = _restore(workdir, cfg=cfg)
        alignment = _align_call(cfg, mod, params, corpus)
        segs, mask = segments_from_alignment(alignment, corpus.trg, corpus.src_len)
        host_segs = segments_to_host(segs, mask)
        src = np.asarray(corpus.src)

        by_concept: dict[int, Counter] = defaultdict(Counter)
        for i, utt_segs in enumerate(host_segs):
            for s, e, c in utt_segs:
                word = " ".join(str(int(p)) for p in src[i, s:e])
                by_concept[c][word] += 1

    out = {}
    for c in sorted(by_concept):
        out[str(c)] = [
            {"phones": w, "count": n} for w, n in by_concept[c].most_common(args.top_k)
        ]
    path = Path(args.output or workdir / "lexicon.json")
    path.write_text(json.dumps(out, indent=1))
    for c in sorted(by_concept)[:15]:
        tops = ", ".join(f"[{w}]x{n}" for w, n in by_concept[c].most_common(3))
        print(f"concept {c:4d}: {tops}")
    print(f"wrote {path}")


def cmd_plot(args) -> None:
    from multimodalworddiscovery_tpu.utils.plotting import (
        plot_alignment_matrix,
        plot_segmentation,
    )

    workdir = Path(args.workdir)
    cfg = _load_workdir_config(workdir)
    i = label = args.utterance  # label = GLOBAL index (file/title naming);
    # under streaming i is rebound to the shard-local row for indexing
    if cfg.data.source == "stream":
        # out-of-core: only the shard holding the requested utterance loads
        from multimodalworddiscovery_tpu.data.io import load_alignment_json

        reader, shard0, mod, params = _restore_streaming(cfg, workdir)
        if not 0 <= i < reader.n:
            raise SystemExit(f"utterance {i} out of range (corpus has {reader.n})")
        k = i // reader.shard_size
        corpus = reader.load_shard(k) if k else shard0
        gold = None
        if (reader.directory / "gold.json").exists():
            import types

            gold_full = load_alignment_json(
                reader.directory / "gold.json", reader.n, reader.max_src_len
            )
            lo = (i // reader.shard_size) * reader.shard_size
            gold = types.SimpleNamespace(segments=[
                gold_full.segments[lo + j] if lo + j < reader.n else []
                for j in range(reader.shard_size)
            ])  # indexed by the SHARD-LOCAL row below
        i = i % reader.shard_size
    else:
        cfg, corpus, gold, mod, params = _restore(workdir, cfg=cfg)
    alignment = _align_call(cfg, mod, params, corpus)
    segs, mask = segments_from_alignment(alignment, corpus.trg, corpus.src_len)
    seg_list = segments_to_host(segs, mask)[i]
    sl = int(np.asarray(corpus.src_len)[i])
    out_dir = Path(args.output or workdir / "plots")
    out_dir.mkdir(parents=True, exist_ok=True)

    gold_list = gold.segments[i] if gold is not None else None
    plot_segmentation(
        np.asarray(alignment)[i, :sl],
        seg_list,
        gold_segments=gold_list,
        title=f"utt {label}",
        path=out_dir / f"segmentation_{label}.png",
    )
    if hasattr(mod, "posteriors"):
        post = np.asarray(mod.posteriors(params, corpus))[i, :sl].T
        plot_alignment_matrix(post, title=f"posteriors utt {label}", path=out_dir / f"posteriors_{label}.png")
    if hasattr(mod, "attention_matrix"):
        attn = np.asarray(mod.attention_matrix(params, corpus))[i, :, :sl]
        plot_alignment_matrix(attn, title=f"attention utt {label}", path=out_dir / f"attention_{label}.png")
    print(f"wrote plots to {out_dir}")


def main() -> None:
    # Persistent compilation cache: each CLI invocation is a fresh process;
    # without this every subcommand pays full XLA compile times.
    jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    parser = argparse.ArgumentParser(prog="mwd", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train an aligner")
    p_train.add_argument("--config", default=None, help="python config file")
    p_train.add_argument("--workdir", required=True)
    p_train.add_argument("--fresh", action="store_true", help="ignore existing checkpoints")
    p_train.add_argument("--override", nargs="*", default=[], help="key.path=value overrides")
    p_train.set_defaults(fn=cmd_train)

    p_disc = sub.add_parser("discover", help="audio-only word discovery (segmental k-means)")
    p_disc.add_argument("--config", default=None)
    p_disc.add_argument("--workdir", required=True)
    p_disc.add_argument("--clusters", type=int, default=64)
    p_disc.add_argument("--output", default=None)
    p_disc.add_argument("--override", nargs="*", default=[])
    p_disc.set_defaults(fn=cmd_discover)

    p_ret = sub.add_parser("retrieve", help="cross-modal retrieval rankings + recall@k")
    p_ret.add_argument("--workdir", required=True)
    p_ret.add_argument("--top-k", type=int, default=10)
    p_ret.add_argument("--pool", type=int, default=0,
                       help="candidate-pool size (0 = dense N x N scoring)")
    p_ret.add_argument("--output", default=None)
    p_ret.add_argument("--override", nargs="*", default=[],
                       help="eval-time key.path=value overrides")
    p_ret.set_defaults(fn=cmd_retrieve)

    p_pre = sub.add_parser("preprocess", help="build a corpus dir from public dataset files")
    p_pre.add_argument("--dataset", choices=["flickr8k", "mscoco"], required=True)
    p_pre.add_argument("--captions", required=True, help="Flickr8k.token.txt / captions json")
    p_pre.add_argument("--lexicon", required=True, help="word -> phones dictionary")
    p_pre.add_argument("--concepts", default=None, help="per-image concepts (flickr8k)")
    p_pre.add_argument("--instances", default=None, help="COCO instances json (mscoco)")
    p_pre.add_argument("--output", required=True)
    p_pre.add_argument("--name", default="corpus")
    p_pre.set_defaults(fn=cmd_preprocess)

    p_shard = sub.add_parser(
        "shard",
        help="split a corpus into fixed-shape shards for out-of-core "
             "streaming EM (then train with data.source=stream data.dir=...)",
    )
    p_shard.add_argument("--config", default=None, help="python config file")
    p_shard.add_argument("--output", required=True, help="shard directory")
    p_shard.add_argument("--shard-size", type=int, required=True)
    p_shard.add_argument(
        "--shuffle", type=int, default=None, metavar="SEED",
        help="permute utterances once at write time (recorded in the "
             "manifest).  Recommended for ORDERED corpora feeding streamed "
             "minibatch SGD, which samples within the resident shard",
    )
    p_shard.add_argument(
        "--storage-dtype", default=None, choices=["float32", "float16"],
        help="on-disk dtype for FLOAT fields (frames/region embeddings). "
             "float16 halves disk + H2D per pass (streaming upcasts to "
             "float32 on device before any compute); LOSSY: one f16 "
             "rounding at write time",
    )
    p_shard.add_argument("--override", nargs="*", default=[])
    p_shard.set_defaults(fn=cmd_shard)

    p_exp = sub.add_parser("export", help="export model params as plain .npz")
    p_exp.add_argument("--workdir", required=True)
    p_exp.add_argument("--output", default=None)
    p_exp.set_defaults(fn=cmd_export)

    p_lex = sub.add_parser("lexicon", help="dump the discovered concept->word lexicon")
    p_lex.add_argument("--workdir", required=True)
    p_lex.add_argument("--top-k", type=int, default=5)
    p_lex.add_argument("--output", default=None)
    p_lex.set_defaults(fn=cmd_lexicon)

    p_plot = sub.add_parser("plot", help="plot alignments/segmentations for inspection")
    p_plot.add_argument("--workdir", required=True)
    p_plot.add_argument("--utterance", type=int, default=0)
    p_plot.add_argument("--output", default=None)
    p_plot.set_defaults(fn=cmd_plot)

    for name, fn in (("align", cmd_align), ("segment", cmd_segment), ("evaluate", cmd_evaluate)):
        p = sub.add_parser(name, help=f"{name} with a trained model")
        p.add_argument("--workdir", required=True)
        p.add_argument("--output", default=None)
        p.add_argument("--override", nargs="*", default=[],
                       help="eval-time key.path=value overrides")
        p.set_defaults(fn=fn)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
