"""Audio-visual grounding baseline (Harwath & Glass style).

Reference counterpart: the reimplemented audio-visual grounding comparison
model (SURVEY.md §2 C9): embed speech and image regions into a shared space,
train with a max-margin ranking loss over matched vs mismatched pairs, and
read alignments off the frame-region similarity matrix.

TPU-first: the speech encoder is a small 1-D conv stack (all MXU), the region
encoder an MLP; one training step scores ALL pairs in the batch at once
(similarity tensor [N, N] from pooled embeddings) — the classic in-batch
contrastive setup instead of the reference's sampled-negative loops.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF
from multimodalworddiscovery_tpu.data.corpus import Corpus


def _l2_normalize(x: jax.Array) -> jax.Array:
    """Gradient-safe L2 normalization.

    ``x / max(||x||, eps)`` has a NaN GRADIENT at x == 0 (sqrt'(0) = inf
    meets the maximum's zero cotangent as 0 * inf) — and exactly-zero rows
    are routine here: zero-padded region slots pass through zero-bias Dense
    layers unchanged, so one padded region NaN-poisons the whole Adam state
    (observed on the detector-proposal pipeline, scripts/image_pipeline.py).
    rsqrt(sum_sq + eps) is finite everywhere in value and gradient."""
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)


class SpeechEncoder(nn.Module):
    dim: int = 128
    vocab: int = 0  # >0 => discrete tokens

    @nn.compact
    def __call__(self, src):
        if self.vocab > 0:
            x = nn.Embed(self.vocab, self.dim)(src)
        else:
            x = nn.Dense(self.dim)(src)
        x = nn.relu(nn.Conv(self.dim, (5,), padding="SAME")(x))
        x = nn.relu(nn.Conv(self.dim, (5,), padding="SAME")(x))
        x = nn.Dense(self.dim)(x)
        return _l2_normalize(x)


class RegionEncoder(nn.Module):
    dim: int = 128
    vocab: int = 0  # >0 => discrete concept ids

    @nn.compact
    def __call__(self, trg):
        if self.vocab > 0:
            y = nn.Embed(self.vocab, self.dim)(trg)
        else:
            y = nn.Dense(self.dim)(nn.relu(nn.Dense(self.dim)(trg)))
        return _l2_normalize(y)


class GroundingModel(nn.Module):
    dim: int = 128
    src_vocab: int = 0
    trg_vocab: int = 0

    @nn.compact
    def __call__(self, src, trg):
        s = SpeechEncoder(self.dim, self.src_vocab, name="speech")(src)
        r = RegionEncoder(self.dim, self.trg_vocab, name="region")(trg)
        return s, r  # [N, Ts, D], [N, Tt, D]


@struct.dataclass
class GroundingParams:
    params: Any
    opt_state: Any
    step: jax.Array
    dim: int = struct.field(pytree_node=False, default=128)
    learning_rate: float = struct.field(pytree_node=False, default=1e-3)
    margin: float = struct.field(pytree_node=False, default=1.0)


def _module(corpus: Corpus, dim: int) -> GroundingModel:
    return GroundingModel(
        dim=dim,
        src_vocab=corpus.src_vocab if corpus.src.ndim == 2 else 0,
        trg_vocab=corpus.trg_vocab if corpus.trg.ndim == 2 else 0,
    )


def init(
    corpus: Corpus,
    dim: int = 128,
    learning_rate: float = 1e-3,
    margin: float = 1.0,
    key=None,
) -> GroundingParams:
    if key is None:
        key = jax.random.PRNGKey(0)
    mod = _module(corpus, dim)
    # parameter shapes never depend on N: init on a 2-utterance slice
    params = jax.jit(mod.init)(key, corpus.src[:2], corpus.trg[:2])
    opt_state = optax.adam(learning_rate).init(params)
    return GroundingParams(
        params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32),
        dim=dim, learning_rate=learning_rate, margin=margin,
    )


def _pair_score(s, r, src_mask, trg_mask):
    """Matchmap score for every (speech i, image j) pair -> [N, N].

    Harwath-style max-over-regions, mean-over-frames similarity.
    NOTE: materializes [N, N, Ts, Tt] — sized for training batches /
    evaluation corpora (N in the hundreds); block the batch upstream for
    larger retrieval sweeps.
    """
    sim = jnp.einsum("itd,jrd->ijtr", s, r)  # [N, N, Ts, Tt]
    sim = jnp.where(trg_mask[None, :, None, :], sim, -1.0)
    best_region = jnp.max(sim, axis=-1)  # [N, N, Ts]
    best_region = jnp.where(src_mask[:, None, :], best_region, 0.0)
    denom = jnp.maximum(jnp.sum(src_mask, axis=1), 1)[:, None]
    return jnp.sum(best_region, axis=-1) / denom  # [N, N]


def _loss_fn(params, mod, corpus: Corpus, margin: float):
    s, r = mod.apply(params, corpus.src, corpus.trg)
    scores = _pair_score(s, r, corpus.src_mask(), corpus.trg_mask())
    pos = jnp.diagonal(scores)  # [N]
    n = scores.shape[0]
    off = ~jnp.eye(n, dtype=bool)
    # max-margin over impostors both directions
    viol_c = jnp.maximum(0.0, margin + scores - pos[:, None])
    viol_i = jnp.maximum(0.0, margin + scores - pos[None, :])
    loss = (jnp.sum(jnp.where(off, viol_c, 0.0)) + jnp.sum(jnp.where(off, viol_i, 0.0))) / (
        2 * n * jnp.maximum(n - 1, 1)
    )
    return loss


def em_step(state: GroundingParams, corpus: Corpus) -> tuple[GroundingParams, dict]:
    mod = _module(corpus, state.dim)
    loss, grads = jax.value_and_grad(_loss_fn)(state.params, mod, corpus, state.margin)
    updates, opt_state = optax.adam(state.learning_rate).update(grads, state.opt_state)
    params = optax.apply_updates(state.params, updates)
    new = GroundingParams(
        params=params, opt_state=opt_state, step=state.step + 1,
        dim=state.dim, learning_rate=state.learning_rate, margin=state.margin,
    )
    return new, {"loglik": -loss, "loss": loss}


def align(state: GroundingParams, corpus: Corpus, null_threshold: float = 0.0) -> jax.Array:
    """Frame -> best-region alignment from the matched pair's matchmap."""
    mod = _module(corpus, state.dim)
    s, r = mod.apply(state.params, corpus.src, corpus.trg)
    sim = jnp.einsum("ntd,nrd->ntr", s, r)  # [N, Ts, Tt]
    sim = jnp.where(corpus.trg_mask()[:, None, :], sim, -jnp.inf)
    best = jnp.argmax(sim, axis=-1).astype(jnp.int32) + 1
    best_v = jnp.max(sim, axis=-1)
    a = jnp.where(best_v >= null_threshold, best, 0)
    return jnp.where(corpus.src_mask(), a, 0)


def retrieval_scores(state: GroundingParams, corpus: Corpus) -> jax.Array:
    mod = _module(corpus, state.dim)
    s, r = mod.apply(state.params, corpus.src, corpus.trg)
    return _pair_score(s, r, corpus.src_mask(), corpus.trg_mask())


def retrieval_scores_pooled(
    state: GroundingParams,
    corpus: Corpus,
    candidates: jax.Array,  # [N, C] indices; col 0 = the true pairing
    batch_size: int = 32,
    direction: str = "c2i",
) -> jax.Array:
    """Pooled matchmap scores -> [N, C]: "c2i" scores caption i against its
    candidate images, "i2c" (annotation) scores image i against its
    candidate captions — same matchmap statistic either way.

    Never materializes [N, N, Ts, Tt] (round-1 weakness): embeddings are
    computed once, then a lax.map over rows scores each against only its
    C-candidate pool — O(N * C * Ts * Tt) in bounded blocks."""
    if direction not in ("c2i", "i2c"):
        raise ValueError(f"direction must be c2i|i2c, got {direction!r}")
    mod = _module(corpus, state.dim)
    s, r = mod.apply(state.params, corpus.src, corpus.trg)  # [N,Ts,D],[N,Tt,D]
    src_mask = corpus.src_mask()
    trg_mask = corpus.trg_mask()

    def one_image(args):
        r_i, tm_i, cand = args  # [Tt, D], [Tt], [C]
        s_c = s[cand]  # [C, Ts, D]
        sm_c = src_mask[cand]  # [C, Ts]
        sim = jnp.einsum("ctd,rd->ctr", s_c, r_i)  # [C, Ts, Tt]
        sim = jnp.where(tm_i[None, None, :], sim, -1.0)
        best_region = jnp.max(sim, axis=-1)  # [C, Ts]
        best_region = jnp.where(sm_c, best_region, 0.0)
        denom = jnp.maximum(jnp.sum(sm_c, axis=-1), 1)  # [C]
        return jnp.sum(best_region, axis=-1) / denom  # [C]

    if direction == "i2c":
        return jax.lax.map(
            one_image, (r, trg_mask, candidates), batch_size=batch_size
        )

    def one_caption(args):
        s_i, sm_i, cand = args  # [Ts, D], [Ts], [C]
        r_c = r[cand]  # [C, Tt, D]
        tm_c = trg_mask[cand]  # [C, Tt]
        sim = jnp.einsum("td,crd->ctr", s_i, r_c)  # [C, Ts, Tt]
        sim = jnp.where(tm_c[:, None, :], sim, -1.0)
        best_region = jnp.max(sim, axis=-1)  # [C, Ts]
        best_region = jnp.where(sm_i[None, :], best_region, 0.0)
        denom = jnp.maximum(jnp.sum(sm_i), 1)
        return jnp.sum(best_region, axis=-1) / denom  # [C]

    return jax.lax.map(
        one_caption, (s, src_mask, candidates), batch_size=batch_size
    )


def train(state: GroundingParams, corpus: Corpus, num_iterations: int):
    def body(st, _):
        st2, stats = em_step(st, corpus)
        return st2, stats["loglik"]

    return jax.lax.scan(body, state, None, length=num_iterations)
