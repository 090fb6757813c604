"""Attention-based neural aligner (seq2seq speech -> image concepts).

Reference counterpart: the NMT-style attention encoder-decoder of the 2019
paper (SURVEY.md §2 C8) — translate the source sequence (phones or frames)
into the image's concept sequence, then read the alignment off the attention
matrix (argmax over decoder attention per source token).

TPU-first redesign: instead of the reference's recurrent encoder/decoder, a
small transformer encoder-decoder (all MXU matmuls, no sequential carry).
Cross-attention weights of the final decoder layer are the alignment matrix.
Training is full-batch AdamW steps under the same functional step API as the
EM aligners (em_step = one gradient step; 'loglik' = -CE * tokens so CLI
monotonicity displays comparably).

Alignment extraction runs teacher-forced on the true concept sequence (the
image's concepts are known at alignment time, as in the reference) and maps
source position i -> argmax_j attention[j, i], with an optional NULL
threshold: positions whose best attention mass is below it align to NULL.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF
from multimodalworddiscovery_tpu.data.corpus import Corpus

BOS = 0  # concept id 0 (NULL/pad) doubles as BOS for the shifted decoder input


class _Attention(nn.Module):
    """Multi-head attention that returns its weights."""

    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, q_in, kv_in, mask):
        h, d = self.heads, self.dim // self.heads
        q = nn.DenseGeneral((h, d), name="q")(q_in)
        k = nn.DenseGeneral((h, d), name="k")(kv_in)
        v = nn.DenseGeneral((h, d), name="v")(kv_in)
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) / jnp.sqrt(d)
        logits = jnp.where(mask[:, None, :, :], logits, NEG_INF)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", weights, v)
        return nn.DenseGeneral(self.dim, axis=(-2, -1), name="o")(out), weights


class _Block(nn.Module):
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, x, mask):
        a, _ = _Attention(self.dim, self.heads, name="self_attn")(
            nn.LayerNorm()(x), nn.LayerNorm()(x), mask
        )
        x = x + a
        y = nn.Dense(4 * self.dim)(nn.LayerNorm()(x))
        x = x + nn.Dense(self.dim)(nn.gelu(y))
        return x


class AttentionAligner(nn.Module):
    """Transformer encoder-decoder; returns (logits, cross-attn weights)."""

    src_vocab: int  # 0 => continuous source features
    trg_vocab: int
    dim: int = 128
    heads: int = 4
    enc_layers: int = 2
    feat_dim: int = 0
    subsample: int = 1  # stride-s conv front end (standard ASR trick for
                        # acoustic frames; attention columns then index
                        # subsampled positions — align() upsamples back)

    @nn.compact
    def __call__(self, src, src_mask, trg_in, trg_mask):
        n, ts = src.shape[:2]
        tt = trg_in.shape[1]

        # --- encoder ---
        if self.src_vocab > 0:
            x = nn.Embed(self.src_vocab, self.dim, name="src_embed")(src)
        else:
            x = nn.Dense(self.dim, name="src_proj")(src)
        if self.subsample > 1:
            x = nn.Conv(
                self.dim, (self.subsample * 2 - 1,), strides=(self.subsample,),
                padding="SAME", name="subsample_conv",
            )(nn.gelu(x))
            # a subsampled position is valid if ANY covered frame is valid
            ts = x.shape[1]
            pad_to = ts * self.subsample
            m = jnp.pad(src_mask, ((0, 0), (0, pad_to - src_mask.shape[1])))
            src_mask = jnp.any(m.reshape(n, ts, self.subsample), axis=-1)
        x = x + self.param(
            "src_pos", nn.initializers.normal(0.02), (1, ts, self.dim)
        )
        enc_mask = (src_mask[:, None, :] & src_mask[:, :, None])
        for i in range(self.enc_layers):
            x = _Block(self.dim, self.heads, name=f"enc_{i}")(x, enc_mask)
        enc = nn.LayerNorm(name="enc_norm")(x)

        # --- decoder ---
        y = nn.Embed(self.trg_vocab, self.dim, name="trg_embed")(trg_in)
        y = y + self.param(
            "trg_pos", nn.initializers.normal(0.02), (1, tt, self.dim)
        )
        causal = jnp.tril(jnp.ones((tt, tt), bool))
        dec_self_mask = causal[None] & trg_mask[:, None, :]
        y = _Block(self.dim, self.heads, name="dec_self")(y, dec_self_mask)
        cross_mask = trg_mask[:, :, None] & src_mask[:, None, :]
        c, attn = _Attention(self.dim, self.heads, name="cross_attn")(
            nn.LayerNorm()(y), enc, cross_mask
        )
        y = y + c
        z = nn.Dense(4 * self.dim)(nn.LayerNorm()(y))
        y = y + nn.Dense(self.dim)(nn.gelu(z))
        logits = nn.Dense(self.trg_vocab, name="out")(nn.LayerNorm()(y))
        # attn: [N, heads, Tt, Ts] -> mean over heads
        return logits, jnp.mean(attn, axis=1)


@struct.dataclass
class AttentionParams:
    params: Any
    opt_state: Any
    step: jax.Array
    dim: int = struct.field(pytree_node=False, default=128)
    learning_rate: float = struct.field(pytree_node=False, default=3e-4)
    # penalty on the entropy of column-normalized cross-attention: pushes each
    # source position to commit to one concept (0 = plain CE, the reference's
    # objective).  Measured on the synthetic corpus it HURTS alignment
    # accuracy (0.476 -> 0.347 as lambda goes 0 -> 1: premature sharpening
    # locks in wrong commitments), so it stays off by default.
    entropy_weight: float = struct.field(pytree_node=False, default=0.0)
    subsample: int = struct.field(pytree_node=False, default=1)


def _module(corpus: Corpus, dim: int = 128, subsample: int = 1) -> AttentionAligner:
    feat_dim = corpus.src.shape[-1] if corpus.src.ndim == 3 else 0
    return AttentionAligner(
        src_vocab=corpus.src_vocab if corpus.src.ndim == 2 else 0,
        trg_vocab=corpus.trg_vocab,
        dim=dim,
        feat_dim=feat_dim,
        subsample=subsample,
    )


def _optimizer(lr: float):
    return optax.adamw(lr, weight_decay=1e-4)


def _inputs(corpus: Corpus):
    trg_in = jnp.pad(corpus.trg[:, :-1], ((0, 0), (1, 0)), constant_values=BOS)
    return corpus.src, corpus.src_mask(), trg_in, corpus.trg_mask()


def init(
    corpus: Corpus,
    dim: int = 128,
    learning_rate: float = 3e-4,
    entropy_weight: float = 0.0,
    subsample: int = 1,
    key=None,
) -> AttentionParams:
    if key is None:
        key = jax.random.PRNGKey(0)
    mod = _module(corpus, dim, subsample)
    # init on a 2-utterance slice: parameter shapes depend on (Ts, Tt, dim),
    # never on N — tracing the full corpus here would materialize [N,h,Ts,Ts]
    # attention logits (3.7 GB at N=40k) just to create parameters
    tiny = jax.tree.map(lambda x: x[:2], corpus)
    src, src_mask, trg_in, trg_mask = _inputs(tiny)
    params = jax.jit(mod.init)(key, src, src_mask, trg_in, trg_mask)
    opt_state = _optimizer(learning_rate).init(params)
    return AttentionParams(
        params=params,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        dim=dim,
        learning_rate=learning_rate,
        entropy_weight=entropy_weight,
        subsample=subsample,
    )


def _subsampled_mask(src_mask: jax.Array, ts_sub: int) -> jax.Array:
    """Frame mask -> subsampled-position mask (any covered frame valid),
    matching the conv front end's convention."""
    n, ts = src_mask.shape
    ss = -(-ts // ts_sub)
    m = jnp.pad(src_mask, ((0, 0), (0, ts_sub * ss - ts)))
    return jnp.any(m.reshape(n, ts_sub, ss), axis=-1)


def _loss_fn(params, mod, src, src_mask, trg_in, trg_mask, trg, entropy_weight=0.0,
             guide=None, guide_weight: float = 1.0):
    logits, attn = mod.apply(params, src, src_mask, trg_in, trg_mask)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, trg[..., None], axis=-1)[..., 0]
    nll = jnp.where(trg_mask, nll, 0.0)
    loss = jnp.sum(nll) / jnp.maximum(jnp.sum(trg_mask), 1)
    if guide is not None:
        # guided attention (DNN-HMM-DNN hybrid spirit): cross-entropy between
        # the decoder's attention rows and a teacher alignment distribution
        # (e.g. a trained HMM's posteriors mapped to target positions).
        # guide arrives at the ATTENTION resolution (em_step pools it when
        # the encoder subsamples).
        sm = (
            src_mask if attn.shape[-1] == src_mask.shape[-1]
            else _subsampled_mask(src_mask, attn.shape[-1])
        )
        valid = trg_mask[:, :, None] & sm[:, None, :]
        ce = -jnp.where(valid, guide * jnp.log(attn + 1e-9), 0.0)
        loss = loss + guide_weight * jnp.sum(ce) / jnp.maximum(jnp.sum(trg_mask), 1)
    if entropy_weight:
        # column-normalized attention over valid decoder rows; entropy per
        # valid source position
        attn = jnp.where(trg_mask[:, :, None], attn, 0.0)
        col = attn / jnp.maximum(jnp.sum(attn, axis=1, keepdims=True), 1e-9)
        ent = -jnp.sum(col * jnp.log(col + 1e-9), axis=1)  # [N, Ts]
        ent = jnp.where(src_mask, ent, 0.0)
        loss = loss + entropy_weight * jnp.sum(ent) / jnp.maximum(jnp.sum(src_mask), 1)
    return loss


def em_step(
    state: AttentionParams,
    corpus: Corpus,
    guide: jax.Array | None = None,
    guide_weight: float = 1.0,
) -> tuple[AttentionParams, dict]:
    """One batched AdamW step (the SGD analogue of an EM iteration) — the
    corpus argument may be the full corpus or a gathered minibatch
    (models/minibatch.py).

    guide: optional [N, Tt, Ts] frame-resolution teacher attention (see
    hmm_guide_matrix).  With a conv-subsampled encoder the guide is pooled
    (mass-summed + row-renormalized) onto the subsampled positions, so the
    teacher recipe composes with the ASR-style stride front end.
    """
    if guide is not None and state.subsample != 1:
        ss = state.subsample
        n, tt, ts = guide.shape
        ts_sub = -(-ts // ss)
        g = jnp.pad(guide, ((0, 0), (0, 0), (0, ts_sub * ss - ts)))
        g = jnp.sum(g.reshape(n, tt, ts_sub, ss), axis=-1)
        guide = g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), 1e-9)
    mod = _module(corpus, state.dim, state.subsample)
    src, src_mask, trg_in, trg_mask = _inputs(corpus)
    loss, grads = jax.value_and_grad(_loss_fn)(
        state.params, mod, src, src_mask, trg_in, trg_mask, corpus.trg,
        state.entropy_weight, guide, guide_weight,
    )
    updates, opt_state = _optimizer(state.learning_rate).update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    new_state = AttentionParams(
        params=params,
        opt_state=opt_state,
        step=state.step + 1,
        dim=state.dim,
        learning_rate=state.learning_rate,
        entropy_weight=state.entropy_weight,
        subsample=state.subsample,
    )
    ntok = jnp.sum(trg_mask)
    return new_state, {"loglik": -loss * ntok, "loss": loss}


def loglik(state: AttentionParams, corpus: Corpus) -> jax.Array:
    mod = _module(corpus, state.dim, state.subsample)
    src, src_mask, trg_in, trg_mask = _inputs(corpus)
    loss = _loss_fn(state.params, mod, src, src_mask, trg_in, trg_mask, corpus.trg)
    return -loss * jnp.sum(trg_mask)


def attention_matrix(state: AttentionParams, corpus: Corpus) -> jax.Array:
    """[N, Tt, Ts] teacher-forced cross-attention weights.

    With subsample > 1 the raw attention indexes subsampled positions; it is
    upsampled (nearest) back to frame resolution here so every consumer sees
    frame-level weights."""
    mod = _module(corpus, state.dim, state.subsample)
    src, src_mask, trg_in, trg_mask = _inputs(corpus)
    _, attn = mod.apply(state.params, src, src_mask, trg_in, trg_mask)
    if state.subsample > 1:
        attn = jnp.repeat(attn, state.subsample, axis=2)[:, :, : corpus.max_src_len]
    return attn


def align(
    state: AttentionParams, corpus: Corpus, null_threshold: float = 0.0
) -> jax.Array:
    """Alignment from attention argmax per source position.

    a_i = argmax_j attn[j, i] + 1; NULL where the winning weight (renormalized
    over valid decoder steps) is below ``null_threshold``.
    """
    attn = attention_matrix(state, corpus)  # [N, Tt, Ts]
    attn = jnp.where(corpus.trg_mask()[:, :, None], attn, 0.0)
    col = attn / jnp.maximum(jnp.sum(attn, axis=1, keepdims=True), 1e-9)
    best = jnp.argmax(col, axis=1).astype(jnp.int32)  # [N, Ts]
    best_w = jnp.max(col, axis=1)
    a = jnp.where(best_w >= null_threshold, best + 1, 0)
    return jnp.where(corpus.src_mask(), a, 0)


def train(
    state: AttentionParams,
    corpus: Corpus,
    num_iterations: int,
    guide: jax.Array | None = None,
    guide_weight: float = 1.0,
) -> tuple[AttentionParams, jax.Array]:
    def body(s, _):
        s2, stats = em_step(s, corpus, guide, guide_weight)
        return s2, stats["loglik"]

    return jax.lax.scan(body, state, None, length=num_iterations)


def hmm_guide_matrix(hmm_params, corpus: Corpus, posteriors_fn=None) -> jax.Array:
    """Teacher attention [N, Tt, Ts] from a trained HMM's state posteriors.

    Maps the HMM gamma [N, Ts, S] onto target positions (real states only;
    NULL mass is dropped and rows renormalized), giving the attention matrix
    a discrete aligner would produce — the supervision signal of the guided
    (DNN-HMM-DNN hybrid style) attention objective.

    posteriors_fn: any HMM-family ``posteriors(params, corpus)`` (defaults to
    the discrete HMM; pass hmm_gaussian.posteriors for acoustic frames).
    """
    if posteriors_fn is None:
        from multimodalworddiscovery_tpu.models import hmm as hmm_mod

        posteriors_fn = hmm_mod.posteriors
    gamma = posteriors_fn(hmm_params, corpus)  # [N, Ts, S]
    tt = corpus.max_trg_len
    real = gamma[..., :tt]  # [N, Ts, Tt] (real states are positions 0..Tt-1)
    guide = jnp.swapaxes(real, 1, 2)  # [N, Tt, Ts]
    denom = jnp.maximum(jnp.sum(guide, axis=2, keepdims=True), 1e-9)
    guide = guide / denom
    valid = corpus.trg_mask()[:, :, None] & corpus.src_mask()[:, None, :]
    return jnp.where(valid, guide, 0.0)
