"""Config system.

The reference scatters hyperparameters across argparse flags and constructor
defaults (SURVEY.md §5.6).  Here one ``ml_collections.ConfigDict`` describes a
run end to end (data, model, training, eval); config files under ``configs/``
are python modules with a ``get_config()`` returning one.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

from ml_collections import ConfigDict


def base_config() -> ConfigDict:
    cfg = ConfigDict()

    cfg.seed = 0

    cfg.data = ConfigDict()
    cfg.data.source = "synthetic"  # synthetic | disk
    cfg.data.dir = ""
    cfg.data.name = "flickr8k_mini"
    cfg.data.n_utterances = 200
    cfg.data.n_concepts = 40
    cfg.data.n_phones = 48
    cfg.data.min_concepts = 2  # concepts per image (synthetic generator);
    cfg.data.max_concepts = 4  # state space S = 2 * max concepts per image
    cfg.data.continuous = False  # expand phones to acoustic frames
    cfg.data.feat_dim = 16  # frame dim for the continuous variant
    cfg.data.shard_pad_multiple = 1  # pad N to multiple (devices) for sharding

    cfg.model = ConfigDict()
    cfg.model.name = "model1"
    cfg.model.smoothing = 1e-8
    # HMM-specific knobs (unused by model1)
    cfg.model.max_jump = 3
    cfg.model.self_loop_prob = 0.0
    cfg.model.emission = "discrete"  # discrete | gaussian
    cfg.model.n_components = 2  # GMM components per concept (hmm_gaussian)
    # hmm_gaussian seeding: global | diagonal (flat-start) | vq_teacher
    # (k-means codebook -> discrete-HMM teacher -> emission fit; the measured
    # dense-region winner, models/hmm_gaussian.py:init_vq_teacher)
    cfg.model.init = "global"
    # k-means-quantize continuous [N,Ts,D] frames into model.vq_codes ids
    # for the DISCRETE aligners (model1/hmm) — the reference's k-means-
    # softened continuous-SMT mode (SURVEY.md §2 C5).  The codebook persists
    # in the workdir (vq_codebook.npy) so decode/eval re-quantize identically.
    cfg.model.vq_frontend = False
    cfg.model.vq_codes = 64  # vq_teacher / vq_frontend codebook size
    cfg.model.teacher_iters = 10  # vq_teacher discrete-HMM EM iterations
    cfg.model.seed_rounds = 3  # vq_teacher emission-fit rounds
    # deterministic annealing (hmm_gaussian): emission temperature ramps
    # anneal_beta0 -> 1 over the first anneal_iters EM iterations (0 = off)
    cfg.model.anneal_beta0 = 0.25
    cfg.model.anneal_iters = 0
    # fused Pallas E-step for the HMM family: auto = on TPU when the state
    # space is large enough to beat the XLA scan (models/hmm_core.py:estep)
    cfg.model.use_pallas = "auto"  # auto | on | off
    cfg.model.dot_dtype = "float32"  # float32 | bfloat16 kernel MXU inputs
    # teacher-guided attention (DNN-HMM-DNN hybrid): "" | hmm | hmm_gaussian
    # (the Gaussian teacher is the one for continuous/frame corpora)
    cfg.model.guide = ""
    cfg.model.guide_iters = 15
    cfg.model.guide_weight = 1.0
    # neural aligner knobs (attention / grounding / hmm_dnn)
    cfg.model.dim = 128
    cfg.model.learning_rate = 3e-4
    cfg.model.entropy_weight = 0.0
    cfg.model.subsample = 1  # conv-subsampled encoder stride (attention)
    cfg.model.null_threshold = 0.0  # attention alignment NULL cutoff
    cfg.model.hidden = 256  # hmm_dnn emission MLP width
    cfg.model.n_sgd = 4  # hmm_dnn Adam steps per generalized-EM M-step
    # hmm_crf only: learn log_jump/log_p0 by Adam through the marginal
    # (exact CRF moment gradients, models/hmm_crf.py:logmarginal_e2e)
    # instead of the closed-form count M-step
    cfg.model.learn_transitions = False
    cfg.model.margin = 1.0  # grounding ranking-loss margin
    cfg.model.feat_dim = 0

    cfg.train = ConfigDict()
    cfg.train.num_iterations = 20
    cfg.train.checkpoint_every = 10
    cfg.train.data_parallel = False  # shard corpus over all devices
    # multi-host (pod-scale) run: every process calls this CLI with
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set (all
    # auto-discovered on Cloud TPU pods); implies a process-spanning global
    # mesh; each process computes its own corpus slice (parallel/multihost.py)
    cfg.train.distributed = False
    # comma-separated src-length bucket edges ("" = no bucketing); exact
    # bucketed EM for model1/hmm/hmm_gaussian/hmm_dnn (models/bucketed.py)
    cfg.train.bucket_edges = ""
    # minibatch size for the gradient models (attention/grounding);
    # 0 = full-batch.  With data_parallel, must divide by the device count.
    cfg.train.batch_size = 0
    # EM models: scan the E-step over this many corpus chunks inside one jit
    # (additive counts) — activation memory / num_chunks, exact results.
    # 1 = whole corpus at once; raise for corpora whose activations exceed
    # HBM (600k utterances fits at 8 on one v5e chip).
    cfg.train.corpus_chunks = 1
    # also emit TensorBoard scalars to <workdir>/tb (JSONL stays canonical)
    cfg.train.tensorboard = False
    # data.source=stream: shards loaded ahead of compute by the reader
    # thread (out-of-core EM, data/stream.py); 1 = plain double buffering
    cfg.train.stream_prefetch = 1
    # capture a device trace of the whole training loop to <workdir>/profile
    # (open in Perfetto / TensorBoard's profile plugin)
    cfg.train.profile = False

    cfg.eval = ConfigDict()
    cfg.eval.boundary_tolerance = 1
    cfg.eval.iou_threshold = 0.5
    cfg.eval.retrieval = True
    # 0 = dense N x N retrieval scoring; >0 = recall@k over fixed-size
    # candidate pools (the scalable protocol for MSCOCO-sized corpora)
    cfg.eval.retrieval_pool = 0
    # DTW scoring of discovered units (continuous corpora only): within- vs
    # across-cluster coherence + distance to the closest gold unit
    cfg.eval.dtw = True
    cfg.eval.dtw_max_seg_len = 32
    # the all-pairs DTW matrix is O((utts*segs)^2) DPs: score an explicit
    # sample (logged), raise for full-corpus runs on TPU
    cfg.eval.dtw_utterances = 64
    cfg.eval.dtw_segments = 8

    return cfg


def load_config(path: str | Path) -> ConfigDict:
    """Load ``get_config()`` from a python config file."""
    path = Path(path)
    spec = importlib.util.spec_from_file_location(path.stem, path)
    if spec is None or spec.loader is None:
        raise FileNotFoundError(path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_config()


def apply_overrides(cfg: ConfigDict, overrides: list[str]) -> ConfigDict:
    """Apply ``key.path=value`` CLI overrides with type coercion."""
    for ov in overrides:
        key, _, raw = ov.partition("=")
        if not _:
            raise ValueError(f"override must be key=value, got {ov!r}")
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = getattr(node, p)
        old = getattr(node, parts[-1])
        if isinstance(old, bool):
            val = raw.lower() in ("1", "true", "yes")
        elif isinstance(old, int):
            val = int(raw)
        elif isinstance(old, float):
            val = float(raw)
        else:
            val = raw
        setattr(node, parts[-1], val)
    return cfg
