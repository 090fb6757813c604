"""Out-of-core streaming EM (data/stream.py).

The key property: streamed EM is EXACT — per-iteration counts are the sum of
per-shard counts, so params/loglik match the resident full-batch EM to float
tolerance, for every closed-form model, any shard size, any prefetch depth,
with or without a device mesh.
"""

import json
import sys

import jax
import numpy as np
import pytest

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.data.stream import (
    ShardedCorpusReader,
    stream_expected_counts,
    train_streaming,
    write_shards,
)
from multimodalworddiscovery_tpu.models import hmm, hmm_gaussian, model1


@pytest.fixture(scope="module")
def corpus_gold():
    return make_flickr8k_mini(n_utterances=30, n_concepts=10, n_phones=16, seed=3)


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory, corpus_gold):
    corpus, gold, _ = corpus_gold
    d = tmp_path_factory.mktemp("shards")
    n = write_shards(corpus, d, shard_size=8, gold=gold)
    assert n == 4  # 30 utterances -> 4 shards of 8 (last padded)
    return d


def test_reader_roundtrip(shard_dir, corpus_gold):
    corpus, gold, _ = corpus_gold
    r = ShardedCorpusReader(shard_dir)
    assert (r.num_shards, r.shard_size, r.n) == (4, 8, 30)
    s0 = r.load_shard(0)
    np.testing.assert_array_equal(np.asarray(s0.src), np.asarray(corpus.src[:8]))
    assert s0.src_vocab == corpus.src_vocab
    # last shard padding is zero-length utterances
    s3 = r.load_shard(3)
    assert np.asarray(s3.src_len)[-2:].sum() == 0
    with pytest.raises(IndexError):
        r.load_shard(4)
    # materialize trims back to the true N and restores gold
    full, g2 = r.materialize()
    assert full.n == 30
    np.testing.assert_array_equal(np.asarray(full.src), np.asarray(corpus.src))
    np.testing.assert_array_equal(g2.alignment, gold.alignment)


@pytest.mark.parametrize("mod_name", ["model1", "hmm"])
@pytest.mark.parametrize("prefetch", [1, 3])
def test_streaming_em_exact(shard_dir, corpus_gold, mod_name, prefetch):
    corpus, _, _ = corpus_gold
    mod = {"model1": model1, "hmm": hmm}[mod_name]
    reader = ShardedCorpusReader(shard_dir)
    p0 = mod.init(reader.load_shard(0))

    ps, lls = train_streaming(mod, p0, reader, 3, prefetch=prefetch)
    pr, lls_ref = jax.jit(lambda p, c: mod.train(p, c, 3))(mod.init(corpus), corpus)
    np.testing.assert_allclose(lls, np.asarray(lls_ref), rtol=1e-5)
    leaves_s = jax.tree_util.tree_leaves(ps)
    leaves_r = jax.tree_util.tree_leaves(pr)
    for a, b in zip(leaves_s, leaves_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_streamed_gaussian_init_matches_resident(tmp_path, corpus_gold):
    """init_from_moments(sum of per-shard init_moments) must equal the
    resident init/init_diagonal bit-for-not-quite (same key; only float
    summation order differs)."""
    corpus, gold, _ = corpus_gold
    from multimodalworddiscovery_tpu.data.stream import tree_sum_bounded
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.models import hmm_gaussian

    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=0)
    # large constant offset: a raw one-pass E[x^2]-mean^2 variance would
    # catastrophically cancel in fp32; the shard-0 shift must keep it stable
    fc = fc.replace(src=fc.src + 3000.0)
    write_shards(fc, tmp_path, shard_size=8)  # 30 -> 4 shards, last padded
    reader = ShardedCorpusReader(tmp_path)
    shift = hmm_gaussian.feature_shift(reader.load_shard(0))
    moments = tree_sum_bounded(
        hmm_gaussian.init_moments(reader.load_shard(k), shift)
        for k in range(reader.num_shards)
    )
    key = jax.random.PRNGKey(3)
    for mode, ref_fn in (("global", hmm_gaussian.init),
                         ("diagonal", hmm_gaussian.init_diagonal)):
        got = hmm_gaussian.init_from_moments(
            moments, n_components=2, key=key, mode=mode, shift=shift
        )
        want = ref_fn(fc, n_components=2, key=key)
        # means sit near 3000: compare at fp32 ulp-level RELATIVE tolerance
        np.testing.assert_allclose(
            np.asarray(got.means), np.asarray(want.means), rtol=1e-5,
            atol=1e-2, err_msg=mode,
        )
        # the offset must NOT have destroyed the variances (the raw
        # one-pass formula collapsed them to log(1e-6) = -13.8 here)
        np.testing.assert_allclose(
            np.asarray(got.log_vars), np.asarray(want.log_vars), atol=1e-2
        )
        assert np.all(np.asarray(want.log_vars) > -5), "variance collapsed"


def test_streaming_em_gaussian_exact(tmp_path, corpus_gold):
    corpus, gold, _ = corpus_gold
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames

    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=0)
    write_shards(fc, tmp_path, shard_size=10)
    reader = ShardedCorpusReader(tmp_path)
    key = jax.random.PRNGKey(0)
    p0 = hmm_gaussian.init(fc, key=key)
    ps, lls = train_streaming(hmm_gaussian, p0, reader, 2)
    pr, lls_ref = jax.jit(
        lambda p, c: hmm_gaussian.train(p, c, 2)
    )(hmm_gaussian.init(fc, key=key), fc)
    np.testing.assert_allclose(lls, np.asarray(lls_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ps.means), np.asarray(pr.means), atol=1e-4
    )


@pytest.mark.slow
def test_streaming_segmental_kmeans_exact(tmp_path, corpus_gold):
    """ES-KMeans centroid statistics are additive: streamed EM == resident,
    and the mwd discover stream path runs e2e."""
    corpus, gold, _ = corpus_gold
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.models import segmental_kmeans as skm

    fc, fgold, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.05, seed=1)
    # shard_size=8 does NOT divide n=30: the last shard carries zero-length
    # padding rows, pinning the padding-invariance of expected_counts/discover
    write_shards(fc, tmp_path / "s", shard_size=8, gold=fgold)
    reader = ShardedCorpusReader(tmp_path / "s")
    p0 = skm.init(fc, n_clusters=12, key=jax.random.PRNGKey(0))

    ps, lls = train_streaming(skm, p0, reader, 3)
    pr, lls_ref = skm.train(p0, fc, 3)
    np.testing.assert_allclose(lls, np.asarray(lls_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ps.centroids), np.asarray(pr.centroids), atol=1e-4
    )

    # CLI: streamed discover end-to-end (train + per-shard discover + metrics)
    from multimodalworddiscovery_tpu import cli

    wd = tmp_path / "wd"
    old = sys.argv
    try:
        sys.argv = ["mwd", "discover", "--workdir", str(wd), "--clusters", "12",
                    "--override", "data.source=stream",
                    f"data.dir={tmp_path / 's'}", "train.num_iterations=3"]
        cli.main()
    finally:
        sys.argv = old
    recs = json.loads((wd / "discovered_segments.json").read_text())
    assert len(recs) == fc.n and all(r["segments"] for r in recs[:5])
    m = json.loads((wd / "metrics.json").read_text())
    assert 0.0 <= m["purity"] <= 1.0 and m["boundary"]["f1"] > 0.0


@pytest.mark.slow
def test_streaming_minibatch_gradient_model(tmp_path, shard_dir):
    """Out-of-core minibatch SGD: shards stream, steps sample within the
    resident shard; library API and CLI e2e."""
    from multimodalworddiscovery_tpu.models import attention
    from multimodalworddiscovery_tpu.models.minibatch import (
        train_minibatch_streaming,
    )

    reader = ShardedCorpusReader(shard_dir)
    state = attention.init(reader.load_shard(0), dim=32, key=jax.random.PRNGKey(0))
    state, losses = train_minibatch_streaming(
        attention.em_step, state, reader, batch_size=4, num_steps=6,
        key=jax.random.PRNGKey(1),
    )
    assert len(losses) == 6 and all(np.isfinite(l) for l in losses)

    from multimodalworddiscovery_tpu import cli

    wd = tmp_path / "wd"
    old = sys.argv
    try:
        sys.argv = ["mwd", "train", "--workdir", str(wd),
                    "--override", "data.source=stream",
                    f"data.dir={shard_dir}", "model.name=attention",
                    "model.dim=32", "train.batch_size=4",
                    "train.num_iterations=6", "train.checkpoint_every=6"]
        cli.main()
    finally:
        sys.argv = old
    rows = [json.loads(l) for l in (wd / "train_metrics.jsonl").read_text().splitlines()]
    assert len(rows) == 6 and all(np.isfinite(r["loglik"]) for r in rows)
    assert (wd / "ckpt").exists()


def test_streaming_with_mesh(shard_dir, corpus_gold):
    corpus, _, _ = corpus_gold
    from multimodalworddiscovery_tpu.core.mesh import make_mesh

    mesh = make_mesh()  # 8 virtual CPU devices; shard_size=8 divides evenly
    reader = ShardedCorpusReader(shard_dir)
    p0 = hmm.init(reader.load_shard(0))
    ps, lls = train_streaming(hmm, p0, reader, 2, mesh=mesh)
    pr, lls_ref = jax.jit(lambda p, c: hmm.train(p, c, 2))(hmm.init(corpus), corpus)
    np.testing.assert_allclose(lls, np.asarray(lls_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ps.log_emit), np.asarray(pr.log_emit), atol=1e-4
    )


def test_stream_degenerate_single_utterance(tmp_path):
    """One utterance, one (mostly padding) shard: streamed EM still matches
    resident, and the reader round-trips the degenerate corpus."""
    corpus, _, _ = make_flickr8k_mini(n_utterances=1, n_concepts=5, n_phones=8, seed=0)
    write_shards(corpus, tmp_path, shard_size=4)
    reader = ShardedCorpusReader(tmp_path)
    assert reader.num_shards == 1 and reader.n == 1
    ps, lls = train_streaming(hmm, hmm.init(reader.load_shard(0)), reader, 2)
    pr, lls_ref = jax.jit(lambda p, c: hmm.train(p, c, 2))(hmm.init(corpus), corpus)
    np.testing.assert_allclose(lls, np.asarray(lls_ref), rtol=1e-5)
    full, _ = reader.materialize()
    np.testing.assert_array_equal(np.asarray(full.src), np.asarray(corpus.src))


def test_stream_counts_match_single_call(shard_dir, corpus_gold):
    corpus, _, _ = corpus_gold
    reader = ShardedCorpusReader(shard_dir)
    params = hmm.init(corpus)
    fn = jax.jit(lambda p, c: hmm.expected_counts(p, c))
    counts_s, ll_s = stream_expected_counts(fn, params, reader)
    counts_r, ll_r = fn(params, corpus.pad_to(32))
    np.testing.assert_allclose(float(ll_s), float(ll_r), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(counts_s),
                    jax.tree_util.tree_leaves(counts_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)


@pytest.mark.slow
def test_cli_shard_train_evaluate(tmp_path):
    """mwd shard -> train (data.source=stream) -> align/evaluate e2e."""
    from multimodalworddiscovery_tpu import cli

    shard_dir = tmp_path / "shards"
    wd = tmp_path / "wd"
    old = sys.argv
    try:
        sys.argv = ["mwd", "shard", "--output", str(shard_dir),
                    "--shard-size", "8",
                    "--override", "data.n_utterances=30", "data.n_concepts=10"]
        cli.main()
        assert (shard_dir / "manifest.json").exists()

        sys.argv = ["mwd", "train", "--workdir", str(wd),
                    "--override", "data.source=stream",
                    f"data.dir={shard_dir}", "model.name=hmm",
                    "train.num_iterations=3", "train.checkpoint_every=3"]
        cli.main()
        rows = [json.loads(l) for l in (wd / "train_metrics.jsonl").read_text().splitlines()]
        assert len(rows) == 3
        assert rows[-1]["loglik"] > rows[0]["loglik"]

        sys.argv = ["mwd", "evaluate", "--workdir", str(wd)]
        cli.main()
        metrics = json.loads((wd / "metrics.json").read_text())
        assert metrics["alignment"]["f1"] > 0.5
    finally:
        sys.argv = old

    # streamed evaluation must EXACTLY match the resident metrics computed
    # from the materialized corpus with the same restored params
    from multimodalworddiscovery_tpu.eval.metrics import (
        alignment_prf,
        boundary_prf,
        cluster_purity,
        word_iou,
    )
    from multimodalworddiscovery_tpu.segment import (
        boundaries_from_segments,
        segments_from_alignment,
    )
    from multimodalworddiscovery_tpu.utils.checkpoint import CheckpointManager

    reader = ShardedCorpusReader(shard_dir)
    corpus, gold = reader.materialize()
    params, _ = CheckpointManager(wd / "ckpt").restore(hmm.init(corpus))
    alignment = jax.jit(hmm.align)(params, corpus)
    import jax.numpy as jnp

    ga = jnp.asarray(gold.alignment)
    ps, pm = segments_from_alignment(alignment, corpus.trg, corpus.src_len)
    gs, gm = segments_from_alignment(ga, corpus.trg, corpus.src_len)
    pb = boundaries_from_segments(ps, pm, corpus.max_src_len)
    gb = boundaries_from_segments(gs, gm, corpus.max_src_len)
    expect = {
        "alignment": alignment_prf(alignment, ga, corpus.src_mask()),
        "word_iou": word_iou(ps, pm, gs, gm, 0.5),
        "boundary": boundary_prf(pb, gb, tolerance=1),
        "purity": cluster_purity(ps, pm, gs, gm, corpus.trg_vocab),
    }
    for fam in ("alignment", "word_iou", "boundary"):
        for k, v in expect[fam].items():
            np.testing.assert_allclose(
                metrics[fam][k], float(v), rtol=1e-5, err_msg=f"{fam}.{k}"
            )
    np.testing.assert_allclose(metrics["purity"], float(expect["purity"]), rtol=1e-5)


@pytest.mark.slow
def test_cli_streamed_align_matches_materialized(tmp_path):
    """`mwd align` on a stream workdir decodes shard-by-shard; the JSON must
    equal what a resident decode of the materialized corpus produces."""
    from multimodalworddiscovery_tpu import cli
    from multimodalworddiscovery_tpu.data.io import load_alignment_json

    shard_dir = tmp_path / "shards"
    wd = tmp_path / "wd"
    old = sys.argv
    try:
        sys.argv = ["mwd", "shard", "--output", str(shard_dir),
                    "--shard-size", "8",
                    "--override", "data.n_utterances=20", "data.n_concepts=10"]
        cli.main()
        sys.argv = ["mwd", "train", "--workdir", str(wd),
                    "--override", "data.source=stream",
                    f"data.dir={shard_dir}", "model.name=hmm",
                    "train.num_iterations=3", "train.checkpoint_every=3"]
        cli.main()
        sys.argv = ["mwd", "align", "--workdir", str(wd),
                    "--output", str(tmp_path / "streamed.json")]
        cli.main()
        sys.argv = ["mwd", "segment", "--workdir", str(wd),
                    "--output", str(tmp_path / "streamed_segs.json")]
        cli.main()
    finally:
        sys.argv = old

    reader = ShardedCorpusReader(shard_dir)
    corpus, _ = reader.materialize()
    streamed = load_alignment_json(
        tmp_path / "streamed.json", corpus.n, corpus.max_src_len
    )
    # resident decode with the restored params
    import jax as _jax

    from multimodalworddiscovery_tpu.utils.checkpoint import CheckpointManager

    params, _ = CheckpointManager(wd / "ckpt").restore(hmm.init(corpus))
    resident = np.asarray(_jax.jit(hmm.align)(params, corpus))
    mask = np.asarray(corpus.src_mask())
    np.testing.assert_array_equal(streamed.alignment[mask], resident[mask])

    # streamed segments match the resident segmentation of the same decode
    from multimodalworddiscovery_tpu.segment import (
        segments_from_alignment,
        segments_to_host,
    )

    segs, smask = segments_from_alignment(
        _jax.numpy.asarray(resident), corpus.trg, corpus.src_len
    )
    expected_segs = segments_to_host(segs, smask)
    streamed_segs = load_alignment_json(
        tmp_path / "streamed_segs.json", corpus.n, corpus.max_src_len
    ).segments
    assert streamed_segs == expected_segs


@pytest.mark.slow
def test_streaming_resume(tmp_path, shard_dir):
    """Checkpoint mid-run, retrain: resumes from the saved iteration."""
    from multimodalworddiscovery_tpu import cli

    wd = tmp_path / "wd"
    base = ["mwd", "train", "--workdir", str(wd),
            "--override", "data.source=stream", f"data.dir={shard_dir}",
            "model.name=model1", "train.checkpoint_every=2"]
    old = sys.argv
    try:
        sys.argv = base + ["train.num_iterations=2"]
        cli.main()
        sys.argv = base + ["train.num_iterations=4"]
        cli.main()
        rows = [json.loads(l) for l in (wd / "train_metrics.jsonl").read_text().splitlines()]
        assert [r["step"] for r in rows] == [0, 1, 2, 3]
    finally:
        sys.argv = old


def _run_cli(argv):
    from multimodalworddiscovery_tpu import cli

    old = sys.argv
    try:
        sys.argv = argv
        cli.main()
    finally:
        sys.argv = old


@pytest.mark.slow
def test_streamed_evaluate_dense_retrieval_parity(tmp_path):
    """Single-shard streamed evaluation's dense within-shard retrieval must
    EXACTLY reproduce resident dense N x N recall (same competitor set per
    query), and streamed DTW with a full-coverage reservoir must match the
    resident DTW metrics on the same utterances."""
    shard_dir = tmp_path / "shards"
    wd = tmp_path / "wd"
    _run_cli(["mwd", "shard", "--output", str(shard_dir), "--shard-size", "24",
              "--override", "data.n_utterances=24", "data.n_concepts=10",
              "data.continuous=true", "data.feat_dim=8"])
    _run_cli(["mwd", "train", "--workdir", str(wd),
              "--override", "data.source=stream", f"data.dir={shard_dir}",
              "model.name=hmm_gaussian", "train.num_iterations=3",
              "train.checkpoint_every=3"])
    _run_cli(["mwd", "evaluate", "--workdir", str(wd)])
    metrics = json.loads((wd / "metrics.json").read_text())
    assert "retrieval" in metrics and "dtw" in metrics

    from multimodalworddiscovery_tpu.eval.dtw import (
        cluster_dtw_coherence,
        dtw_to_gold,
    )
    from multimodalworddiscovery_tpu.eval.retrieval import (
        recall_at_k,
        retrieval_scores_hmm_family,
    )
    from multimodalworddiscovery_tpu.segment import segments_from_alignment
    from multimodalworddiscovery_tpu.utils.checkpoint import CheckpointManager

    reader = ShardedCorpusReader(shard_dir)
    corpus, gold = reader.materialize()
    params, _ = CheckpointManager(wd / "ckpt").restore(
        hmm_gaussian.init(corpus, n_components=2)
    )

    # resident dense N x N recall — the streamed within-shard dense pools
    # cover the same competitor set, so recall/median must agree exactly
    dense = recall_at_k(retrieval_scores_hmm_family(hmm_gaussian, params, corpus))
    for key in ("recall@1_c2i", "recall@5_c2i", "median_rank_c2i",
                "recall@1_i2c", "recall@5_i2c", "median_rank_i2c"):
        np.testing.assert_allclose(
            metrics["retrieval"][key], float(dense[key]), atol=1e-7, err_msg=key
        )

    # resident DTW on the full corpus (reservoir covers all 24 utterances)
    import jax.numpy as jnp

    alignment = jax.jit(hmm_gaussian.align)(params, corpus)
    ga = jnp.asarray(gold.alignment)
    ps, pm = segments_from_alignment(alignment, corpus.trg, corpus.src_len)
    gs, gm = segments_from_alignment(ga, corpus.trg, corpus.src_len)
    k_seg = min(ps.shape[1], 8)
    coh = cluster_dtw_coherence(corpus.src, ps[:, :k_seg], pm[:, :k_seg], 32)
    to_gold = dtw_to_gold(
        corpus.src, ps[:, :k_seg], pm[:, :k_seg], gs[:, :k_seg], gm[:, :k_seg], 32
    )
    for key in ("within", "across", "ratio"):
        np.testing.assert_allclose(
            metrics["dtw"][key], float(coh[key]), rtol=1e-4, err_msg=key
        )
    np.testing.assert_allclose(metrics["dtw"]["to_gold"], float(to_gold), rtol=1e-4)


@pytest.mark.slow
def test_streamed_evaluate_pooled_multishard(tmp_path):
    """Multi-shard streamed evaluation with sampled within-shard pools: all
    retrieval + DTW families present, ranks sane, tail rows skipped loudly
    when the last shard is smaller than the pool."""
    shard_dir = tmp_path / "shards"
    wd = tmp_path / "wd"
    _run_cli(["mwd", "shard", "--output", str(shard_dir), "--shard-size", "8",
              "--override", "data.n_utterances=28", "data.n_concepts=10",
              "data.continuous=true", "data.feat_dim=8"])
    _run_cli(["mwd", "train", "--workdir", str(wd),
              "--override", "data.source=stream", f"data.dir={shard_dir}",
              "model.name=hmm_gaussian", "train.num_iterations=2",
              "train.checkpoint_every=2"])
    _run_cli(["mwd", "evaluate", "--workdir", str(wd),
              "--override", "eval.retrieval_pool=6", "eval.dtw_utterances=10"])
    metrics = json.loads((wd / "metrics.json").read_text())
    r = metrics["retrieval"]
    assert r["pool_size"] == 6.0
    for d in ("c2i", "i2c"):
        assert 0.0 <= r[f"recall@1_{d}"] <= r[f"recall@5_{d}"] <= 1.0
        assert 1.0 <= r[f"median_rank_{d}"] <= 6.0
    d = metrics["dtw"]
    assert d["within"] >= 0 and d["across"] > 0 and d["to_gold"] >= 0


@pytest.mark.slow
def test_streamed_retrieval_ordered_shard_bias(tmp_path, capsys):
    """Quantify the within-shard retrieval-pool bias on an UNSHUFFLED,
    deliberately concept-sorted corpus (round-4 VERDICT task 5).  Measured
    mechanism: ordered shards fill each query's pool with near-clones of
    its true pairing — under strict-inequality ranks those rarely beat the
    true pair, while unbiased uniform pools contain genuinely
    higher-scoring competitors (e.g. shorter captions under the
    unnormalized i2c loglik).  The protocol therefore INFLATES recall on
    ordered corpora: i2c recall@1 read +0.04..+0.24 absolute across corpus
    seeds (up to ~2x) with identical params.  Also pins the loud warning
    `mwd retrieve/evaluate` must print on manifests with
    shuffle_seed=None, and its absence on shuffled ones."""
    import jax.numpy as jnp

    from multimodalworddiscovery_tpu.data.corpus import Corpus

    corpus, _, _ = make_flickr8k_mini(
        n_utterances=96, n_concepts=12, n_phones=24, p_filler=0.3, seed=2
    )
    # sort rows by their full (sorted) concept set: contiguous slices
    # (-> shards) share concept sets — the Flickr8k structure (5 captions
    # per image, files grouped by image) the warning is about
    sorted_trg = np.sort(np.asarray(corpus.trg), axis=1)
    order = np.lexsort(sorted_trg.T[::-1])
    take = lambda x: jnp.asarray(np.asarray(x)[order])  # noqa: E731
    ordered = Corpus(
        src=take(corpus.src), src_len=take(corpus.src_len),
        trg=take(corpus.trg), trg_len=take(corpus.trg_len),
        src_vocab=corpus.src_vocab, trg_vocab=corpus.trg_vocab,
    )
    d_ord = tmp_path / "ordered"
    d_shuf = tmp_path / "shuffled"
    write_shards(ordered, d_ord, shard_size=16)
    write_shards(ordered, d_shuf, shard_size=16, shuffle=11)

    # one streamed training run (EM counts are additive -> order-invariant);
    # the SAME params then score both shard layouts
    wd = tmp_path / "wd"
    _run_cli(["mwd", "train", "--workdir", str(wd), "--override",
              "data.source=stream", f"data.dir={d_shuf}",
              "model.name=model1", "train.num_iterations=5",
              "train.checkpoint_every=5"])
    capsys.readouterr()

    _run_cli(["mwd", "retrieve", "--workdir", str(wd),
              "--output", str(tmp_path / "shuf.json")])
    out_shuf = capsys.readouterr().out
    assert "UNSHUFFLED" not in out_shuf  # shuffled manifest: no warning

    _run_cli(["mwd", "retrieve", "--workdir", str(wd),
              "--output", str(tmp_path / "ord.json"),
              "--override", f"data.dir={d_ord}"])
    out_ord = capsys.readouterr().out
    assert "UNSHUFFLED" in out_ord and "--shuffle" in out_ord

    r_shuf = json.loads((tmp_path / "shuf.json").read_text())["recall"]
    r_ord = json.loads((tmp_path / "ord.json").read_text())["recall"]
    # measured bias bound (same params, same pool size 16, same protocol):
    # concept-sorted shards INFLATE i2c recall@1 by >= 0.08 absolute at this
    # seed (probe measured +0.156; 2x headroom against float jitter)
    assert r_ord["recall@1_i2c"] - r_shuf["recall@1_i2c"] >= 0.08, (
        r_shuf, r_ord,
    )


@pytest.mark.slow
def test_streamed_minibatch_shuffle_convergence_parity(tmp_path):
    """De-biased streamed minibatch SGD on an intentionally ORDERED corpus:
    with write_shards(shuffle=seed), streamed training (which samples within
    the resident shard) must converge like resident minibatch SGD.  Without
    the shuffle every steps_per_shard consecutive batches come from one
    contiguous, concept-correlated corpus slice."""
    import jax.numpy as jnp

    from multimodalworddiscovery_tpu.data.corpus import Corpus
    from multimodalworddiscovery_tpu.models import attention
    from multimodalworddiscovery_tpu.models.minibatch import (
        train_minibatch,
        train_minibatch_streaming,
    )

    corpus, _, _ = make_flickr8k_mini(
        n_utterances=96, n_concepts=10, n_phones=16, seed=5
    )
    # sort by the first concept id -> contiguous slices are concept-correlated
    order = np.argsort(np.asarray(corpus.trg)[:, 0], kind="stable")
    take = lambda x: jnp.asarray(np.asarray(x)[order])  # noqa: E731
    ordered = Corpus(
        src=take(corpus.src), src_len=take(corpus.src_len),
        trg=take(corpus.trg), trg_len=take(corpus.trg_len),
        src_vocab=corpus.src_vocab, trg_vocab=corpus.trg_vocab,
    )

    state0 = attention.init(ordered, dim=32, key=jax.random.PRNGKey(0))
    ll0 = float(attention.loglik(state0, ordered))
    n_steps, bs = 72, 8

    res_state, _ = train_minibatch(
        attention.em_step, state0, ordered, bs, n_steps,
        key=jax.random.PRNGKey(1),
    )
    ll_res = float(attention.loglik(res_state, ordered))

    d = tmp_path / "shards"
    write_shards(ordered, d, shard_size=24, shuffle=7)
    reader = ShardedCorpusReader(d)
    assert reader.shuffle_seed == 7
    str_state, _ = train_minibatch_streaming(
        attention.em_step, state0, reader, bs, n_steps,
        key=jax.random.PRNGKey(1),
    )
    ll_str = float(attention.loglik(str_state, ordered))

    # both must have improved materially, and the improvements must match
    gain_res, gain_str = ll_res - ll0, ll_str - ll0
    assert gain_res > 0 and gain_str > 0
    assert abs(gain_str - gain_res) <= 0.2 * abs(gain_res), (ll0, ll_res, ll_str)


def test_write_shards_shuffle_permutes_gold_consistently(tmp_path):
    """shuffle=seed permutes the corpus AND the gold annotations with the
    same permutation, and the manifest records the seed."""
    corpus, gold, _ = make_flickr8k_mini(n_utterances=20, seed=11)
    d = tmp_path / "shards"
    write_shards(corpus, d, shard_size=8, gold=gold, shuffle=3)
    reader = ShardedCorpusReader(d)
    assert reader.shuffle_seed == 3
    shuffled, g2 = reader.materialize()

    perm = np.random.default_rng(3).permutation(20)
    np.testing.assert_array_equal(
        np.asarray(shuffled.src), np.asarray(corpus.src)[perm]
    )
    np.testing.assert_array_equal(g2.alignment, gold.alignment[perm])
    assert g2.segments == [gold.segments[i] for i in perm]


def test_quantize_shards_streaming_roundtrip(tmp_path, corpus_gold):
    """Streamed quantization writes a parallel discrete shard dir: codes in
    range, lengths/targets copied, manifest vocab = n_codes."""
    corpus, gold, _ = corpus_gold
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames

    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=0)
    write_shards(fc, tmp_path / "f", shard_size=8)
    reader = ShardedCorpusReader(tmp_path / "f")
    cb = hmm_gaussian.quantize_shards_streaming(
        reader, tmp_path / "c", n_codes=16, key=jax.random.PRNGKey(4)
    )
    assert cb.shape == (16, 8)
    cr = ShardedCorpusReader(tmp_path / "c")
    assert cr.src_vocab == 16 and cr.num_shards == reader.num_shards
    cc, _ = cr.materialize()
    codes = np.asarray(cc.src)
    assert codes.dtype == np.int32 and codes.min() >= 0 and codes.max() < 16
    np.testing.assert_array_equal(np.asarray(cc.trg), np.asarray(fc.trg))
    np.testing.assert_array_equal(
        np.asarray(cc.src_len), np.asarray(fc.src_len)
    )
    real = codes[np.asarray(fc.src_mask())]
    assert len(np.unique(real)) >= 8


@pytest.mark.slow
def test_streamed_vq_teacher_anneal_matches_resident_recipe(tmp_path):
    """The flagship out-of-core recipe (VERDICT r3 item 2): data.source=stream
    + init=vq_teacher + anneal_iters trains end-to-end through the CLI and
    reaches the RESIDENT recipe's frame accuracy within tolerance on the
    dense-region corpus where flat starts fail."""
    from multimodalworddiscovery_tpu import cli
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.utils.checkpoint import CheckpointManager

    pc, pg, _ = make_flickr8k_mini(
        n_utterances=80, n_concepts=50, min_concepts=8, max_concepts=12,
        seed=11,
    )
    fc, fg, _ = phones_to_frames(pc, pg, feat_dim=16, seed=11)
    wm = np.asarray(fc.src_mask()) & (fg.alignment > 0)

    def acc(p):
        pred = np.asarray(hmm_gaussian.align(p, fc))
        return float((pred == fg.alignment)[wm].mean())

    # resident recipe (the shipped stretch-config protocol)
    key = jax.random.PRNGKey(0)
    pv = hmm_gaussian.init_vq_teacher(
        fc, max_jump=3, key=key, n_codes=32, teacher_iters=8, seed_rounds=2,
        n_components=2,
    )
    pv, _ = jax.jit(
        lambda p: hmm_gaussian.train(p, fc, 8, anneal=(0.25, 4))
    )(pv)
    a_resident = acc(pv)

    # streamed recipe through the CLI (4 shards; same hyperparameters)
    write_shards(fc, tmp_path / "s", shard_size=20, gold=fg)
    wd = tmp_path / "wd"
    old = sys.argv
    try:
        sys.argv = ["mwd", "train", "--workdir", str(wd),
                    "--override", "data.source=stream",
                    f"data.dir={tmp_path / 's'}",
                    "model.name=hmm_gaussian", "model.init=vq_teacher",
                    "model.vq_codes=32", "model.teacher_iters=8",
                    "model.seed_rounds=2", "model.anneal_iters=4",
                    "train.num_iterations=8", "train.checkpoint_every=8"]
        cli.main()
    finally:
        sys.argv = old
    assert (wd / "vq_codes" / "manifest.json").exists()

    ps, _ = CheckpointManager(wd / "ckpt").restore(
        hmm_gaussian.init(fc, n_components=2, max_jump=3)
    )
    a_streamed = acc(ps)
    # both must beat the measured flat-start plateau and agree within
    # tolerance (codebooks differ: resident fits on all frames, streamed on
    # a cross-shard reservoir — same protocol otherwise)
    assert a_streamed > 0.40, (a_streamed, a_resident)
    assert abs(a_streamed - a_resident) < 0.10, (a_streamed, a_resident)


def test_shard_writer_matches_write_shards(tmp_path, corpus_gold):
    """Incremental ShardWriter produces byte-identical shard files and an
    equivalent manifest/gold to the one-shot write_shards — so corpora too
    large to materialize get the exact same on-disk contract."""
    corpus, gold, _ = corpus_gold
    from multimodalworddiscovery_tpu.data.stream import ShardWriter

    write_shards(corpus, tmp_path / "a", shard_size=8, gold=gold)
    with ShardWriter(tmp_path / "b", shard_size=8) as w:
        for lo in range(0, corpus.n, 8):
            hi = min(lo + 8, corpus.n)
            batch = jax.tree.map(lambda x: x[lo:hi], corpus)
            w.append(batch, gold_alignment=gold.alignment[lo:hi])
    ra, rb = ShardedCorpusReader(tmp_path / "a"), ShardedCorpusReader(tmp_path / "b")
    assert (ra.num_shards, ra.shard_size, ra.n) == (rb.num_shards, rb.shard_size, rb.n)
    for k in range(ra.num_shards):
        for f in ("src", "src_len", "trg", "trg_len"):
            np.testing.assert_array_equal(
                np.load(tmp_path / "a" / f"{f}_{k}.npy"),
                np.load(tmp_path / "b" / f"{f}_{k}.npy"),
            )
    ca, ga = ra.materialize()
    cb, gb = rb.materialize()
    np.testing.assert_array_equal(np.asarray(ca.src), np.asarray(cb.src))
    np.testing.assert_array_equal(ga.alignment, gb.alignment)
    # misuse errors: oversized batch, shape drift, gold-sometimes
    with pytest.raises(ValueError, match="shard_size"):
        ShardWriter(tmp_path / "c", shard_size=4).append(corpus)
    w2 = ShardWriter(tmp_path / "d", shard_size=corpus.n)
    w2.append(corpus)
    small = jax.tree.map(lambda x: x[:, :5] if x.ndim > 1 else x, corpus)
    with pytest.raises(ValueError, match="drift"):
        w2.append(small.replace(src_len=np.minimum(np.asarray(small.src_len), 5)))


def test_reservoir_multihost_merge_matches_single_process(tmp_path, corpus_gold):
    """reservoir_frames_multihost (here P=1, the merge degenerate case) is
    EXACTLY the single-process reservoir: same per-shard keyed draws, same
    global top-n, same canonical ascending-key order.  The distributed
    vq_teacher recipe's codebook identity rests on this (the real 2-process
    merge runs in tests/test_multihost.py::test_two_process_streaming_em)."""
    corpus, gold, _ = corpus_gold
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.parallel import multihost

    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, seed=0)
    write_shards(fc, tmp_path / "s", shard_size=8)
    reader = ShardedCorpusReader(tmp_path / "s")
    single = hmm_gaussian._reservoir_frames(reader, n_sample=64, seed=0)
    merged = multihost.reservoir_frames_multihost(reader, n_sample=64, seed=0)
    np.testing.assert_array_equal(single, merged)
    # union-of-subsets selection invariance: merging the two per-shard-subset
    # partial reservoirs by key reproduces the full scan (what the 2-process
    # merge does, checked here without jax.distributed)
    b0, k0 = hmm_gaussian._reservoir_frames(
        reader, 64, seed=0, shards=range(0, reader.num_shards, 2),
        return_keys=True)
    b1, k1 = hmm_gaussian._reservoir_frames(
        reader, 64, seed=0, shards=range(1, reader.num_shards, 2),
        return_keys=True)
    ku = np.concatenate([k0, k1])
    bu = np.concatenate([b0, b1])
    if ku.shape[0] > 64:
        top = np.argpartition(ku, 63)[:64]
        ku, bu = ku[top], bu[top]
    order = np.argsort(ku, kind="stable")
    np.testing.assert_array_equal(single, bu[order])


@pytest.mark.slow
def test_vq_teacher_multihost_single_process_parity(tmp_path, corpus_gold):
    """init_vq_teacher_streaming_multihost on the 8-virtual-device mesh
    (P=1) matches the single-host streamed recipe to float-addition-order
    tolerance: identical codebook by construction, teacher EM / seed passes
    differ only in reduction order."""
    corpus, gold, _ = corpus_gold
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.parallel import multihost

    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=0)
    write_shards(fc, tmp_path / "s", shard_size=8)
    reader = ShardedCorpusReader(tmp_path / "s")
    kw = dict(max_jump=3, n_components=2, key=jax.random.PRNGKey(0),
              n_codes=16, teacher_iters=4, seed_rounds=2)
    ps = hmm_gaussian.init_vq_teacher_streaming(reader, tmp_path / "c1", **kw)
    pm = multihost.init_vq_teacher_streaming_multihost(
        reader, tmp_path / "c2", **kw
    )
    for name in ("means", "log_vars", "log_mix", "log_jump", "log_p0"):
        np.testing.assert_allclose(
            np.asarray(getattr(ps, name)), np.asarray(getattr(pm, name)),
            atol=1e-3, err_msg=name,
        )
    # the two quantized code corpora are identical (same codebook)
    c1 = ShardedCorpusReader(tmp_path / "c1").materialize()[0]
    c2 = ShardedCorpusReader(tmp_path / "c2").materialize()[0]
    np.testing.assert_array_equal(np.asarray(c1.src), np.asarray(c2.src))


def test_streaming_annealed_em_exact(tmp_path, corpus_gold):
    """scale_schedule plumbing: annealed streamed EM is EXACT vs the resident
    annealed train (same beta ramp; counts additive, one compile for the
    whole ramp)."""
    corpus, gold, _ = corpus_gold
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames

    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=0)
    write_shards(fc, tmp_path, shard_size=10)
    reader = ShardedCorpusReader(tmp_path)
    key = jax.random.PRNGKey(0)
    sched = np.concatenate([np.linspace(0.3, 1.0, 3), np.ones(1)])

    p0 = hmm_gaussian.init(fc, key=key)
    ps, lls = train_streaming(
        hmm_gaussian, p0, reader, 4, scale_schedule=sched
    )
    pr, lls_ref = jax.jit(
        lambda p, c: hmm_gaussian.train(p, c, 4, anneal=(0.3, 3))
    )(hmm_gaussian.init(fc, key=key), fc)
    np.testing.assert_allclose(lls, np.asarray(lls_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ps.means), np.asarray(pr.means), atol=1e-4
    )


@pytest.mark.slow
def test_streaming_hmm_dnn_generalized_em(tmp_path, corpus_gold):
    """Streamed hmm_dnn (incremental generalized EM): the closed-form counts
    pool exactly; the per-shard neural updates must converge like the
    resident trainer (parity in decode accuracy, not bit-exactness — the
    resident n_sgd steps descend the POOLED CE)."""
    corpus, gold, _ = corpus_gold
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.models import hmm_dnn

    fc, fg, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=0)
    write_shards(fc, tmp_path / "s", shard_size=10, gold=fg)
    reader = ShardedCorpusReader(tmp_path / "s")
    wm = np.asarray(fc.src_mask()) & (fg.alignment > 0)

    def acc(p):
        pred = np.asarray(jax.jit(hmm_dnn.align)(p, fc))
        return float((pred == fg.alignment)[wm].mean())

    p0 = hmm_dnn.init(fc, hidden=64, key=jax.random.PRNGKey(0))
    pr, lls_ref = jax.jit(lambda p: hmm_dnn.train(p, fc, 5))(p0)
    ps, lls = hmm_dnn.train_streaming(p0, reader, 5)
    assert len(lls) == 5 and lls[-1] > lls[0]  # training signal improves
    a_res, a_str = acc(pr), acc(ps)
    # incremental EM takes num_shards x n_sgd MLP updates per iteration vs
    # the resident n_sgd, so at a fixed iteration budget it can be AHEAD
    # (measured here: 0.55 streamed vs 0.37 resident after 5 iters); the
    # parity requirement is that streaming never trails materially
    assert a_str > 0.5, (a_str, a_res)
    assert a_str >= a_res - 0.05, (a_str, a_res)

    # CLI e2e: train + evaluate out-of-core
    from multimodalworddiscovery_tpu import cli

    wd = tmp_path / "wd"
    old = sys.argv
    try:
        sys.argv = ["mwd", "train", "--workdir", str(wd),
                    "--override", "data.source=stream",
                    f"data.dir={tmp_path / 's'}", "model.name=hmm_dnn",
                    "model.hidden=64", "train.num_iterations=3",
                    "train.checkpoint_every=3"]
        cli.main()
        sys.argv = ["mwd", "evaluate", "--workdir", str(wd)]
        cli.main()
    finally:
        sys.argv = old
    m = json.loads((wd / "metrics.json").read_text())
    assert 0.0 <= m["alignment"]["f1"] <= 1.0 and "retrieval" in m

    # the mesh composition is rejected loudly (chained optimizer state)
    import argparse

    with pytest.raises(SystemExit, match="hmm_dnn"):
        cli.cmd_train(argparse.Namespace(
            config=None, workdir=str(tmp_path / "wd2"), fresh=False,
            override=["data.source=stream", f"data.dir={tmp_path / 's'}",
                      "model.name=hmm_dnn", "train.data_parallel=true"],
        ))


@pytest.mark.slow
def test_streamed_lexicon_retrieve_export_plot(tmp_path):
    """Every remaining CLI payoff command works OUT-OF-CORE: lexicon counts
    per shard (parity vs the resident lexicon), retrieve runs the
    within-shard protocol with GLOBAL ranking indices, export needs no
    corpus, plot loads only the target utterance's shard."""
    shard_dir = tmp_path / "shards"
    wd = tmp_path / "wd"
    _run_cli(["mwd", "shard", "--output", str(shard_dir), "--shard-size", "8",
              "--override", "data.n_utterances=20", "data.n_concepts=10"])
    _run_cli(["mwd", "train", "--workdir", str(wd),
              "--override", "data.source=stream", f"data.dir={shard_dir}",
              "model.name=hmm", "train.num_iterations=3",
              "train.checkpoint_every=3"])

    import argparse

    from multimodalworddiscovery_tpu import cli

    # --- lexicon: streamed counters must equal the resident lexicon ---
    cli.cmd_lexicon(argparse.Namespace(
        workdir=str(wd), top_k=5, output=str(tmp_path / "lex_stream.json")
    ))
    lex_stream = json.loads((tmp_path / "lex_stream.json").read_text())
    assert lex_stream, "empty streamed lexicon"

    # resident reference: decode the materialized corpus with the restored
    # params and recount
    from collections import Counter, defaultdict

    from multimodalworddiscovery_tpu.segment import (
        segments_from_alignment,
        segments_to_host,
    )
    from multimodalworddiscovery_tpu.utils.checkpoint import CheckpointManager

    reader = ShardedCorpusReader(shard_dir)
    corpus, _ = reader.materialize()
    params, _ = CheckpointManager(wd / "ckpt").restore(hmm.init(corpus))
    segs, mask = segments_from_alignment(
        jax.jit(hmm.align)(params, corpus), corpus.trg, corpus.src_len
    )
    src = np.asarray(corpus.src)
    by_c: dict = defaultdict(Counter)
    for i, utt_segs in enumerate(segments_to_host(segs, mask)):
        for s, e, c in utt_segs:
            by_c[c][" ".join(str(int(p)) for p in src[i, s:e])] += 1
    want = {
        str(c): [{"phones": w, "count": n} for w, n in by_c[c].most_common(5)]
        for c in sorted(by_c)
    }
    assert lex_stream == want

    # --- retrieve: streamed within-shard dense protocol, global indices ---
    cli.cmd_retrieve(argparse.Namespace(
        workdir=str(wd), top_k=3, pool=0,
        output=str(tmp_path / "ret_stream.json"),
    ))
    ret = json.loads((tmp_path / "ret_stream.json").read_text())
    assert ret["protocol"] == "dense within-shard"
    assert 1.0 <= ret["recall"]["median_rank_c2i"] <= 8.0
    rows = ret["rankings"]
    assert len(rows) == 20
    # a caption in shard 2 ranks only images of shard 2 (global ids 16..19)
    row = next(r for r in rows if r["caption"] == 17)
    assert all(16 <= j < 20 for j in row["top_images"]), row

    # --- export: params only, no corpus materialization ---
    cli.cmd_export(argparse.Namespace(workdir=str(wd), output=None))
    import numpy as _np

    npz = _np.load(wd / "model.npz")
    assert any("log_emit" in k for k in npz.files), npz.files

    # --- plot: loads only the target utterance's shard ---
    cli.cmd_plot(argparse.Namespace(workdir=str(wd), utterance=17, output=None))
    # named by the GLOBAL index (17 -> shard 2 local row 1 internally)
    assert (wd / "plots" / "segmentation_17.png").exists()

    # pools larger than every shard are rejected upfront, loudly — in BOTH
    # commands (they share _shard_pool/_check_stream_pool)
    with pytest.raises(SystemExit, match="candidate supply"):
        cli.cmd_retrieve(argparse.Namespace(
            workdir=str(wd), top_k=3, pool=32, output=None,
        ))
    with pytest.raises(SystemExit, match="candidate supply"):
        _run_cli(["mwd", "evaluate", "--workdir", str(wd),
                  "--override", "eval.retrieval_pool=32"])


def test_reservoir_frames_uniform_properties(tmp_path, corpus_gold):
    """_reservoir_frames: only REAL (masked) frames, deterministic in the
    seed, and with n_sample >= total it returns exactly the corpus's masked
    frame multiset."""
    corpus, gold, _ = corpus_gold
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames

    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=0)
    write_shards(fc, tmp_path, shard_size=8)
    reader = ShardedCorpusReader(tmp_path)

    all_frames = np.asarray(fc.src)[np.asarray(fc.src_mask())]
    full = hmm_gaussian._reservoir_frames(reader, n_sample=10**6, seed=1)
    assert full.shape == all_frames.shape
    np.testing.assert_allclose(
        np.sort(full.sum(axis=1)), np.sort(all_frames.sum(axis=1)), rtol=1e-6
    )

    sub1 = hmm_gaussian._reservoir_frames(reader, n_sample=100, seed=2)
    sub2 = hmm_gaussian._reservoir_frames(reader, n_sample=100, seed=2)
    sub3 = hmm_gaussian._reservoir_frames(reader, n_sample=100, seed=3)
    assert sub1.shape == (100, 8)
    np.testing.assert_array_equal(sub1, sub2)
    assert not np.array_equal(sub1, sub3)
    # every sampled frame is a real frame of the corpus
    pool = {tuple(np.round(f, 5)) for f in all_frames}
    assert all(tuple(np.round(f, 5)) in pool for f in sub1[:20])


def test_write_shards_shuffle_preserves_multiset(tmp_path, corpus_gold):
    """The shuffle is a permutation: the materialized corpus holds exactly
    the original utterances (sorted comparison)."""
    corpus, _, _ = corpus_gold
    write_shards(corpus, tmp_path, shard_size=8, shuffle=9)
    shuffled, _ = ShardedCorpusReader(tmp_path).materialize()
    a = np.sort(np.asarray(corpus.src).sum(axis=1) * 1000 + np.asarray(corpus.src_len))
    b = np.sort(np.asarray(shuffled.src).sum(axis=1) * 1000 + np.asarray(shuffled.src_len))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(np.asarray(shuffled.src), np.asarray(corpus.src))


@pytest.mark.slow
def test_vq_frontend_streamed_hmm(tmp_path, corpus_gold):
    """Streamed vq_frontend: frame shards quantize ONCE into a workdir code
    shard dir; train/evaluate/align all stream over the codes; decode reuses
    the persisted codebook."""
    corpus, gold, _ = corpus_gold
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames

    fc, fg, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.05, seed=2)
    write_shards(fc, tmp_path / "s", shard_size=8, gold=fg)
    wd = tmp_path / "wd"
    _run_cli(["mwd", "train", "--workdir", str(wd),
              "--override", "data.source=stream", f"data.dir={tmp_path / 's'}",
              "model.name=hmm", "model.vq_frontend=true", "model.vq_codes=24",
              "train.num_iterations=3", "train.checkpoint_every=3"])
    assert (wd / "vq_codebook.npy").exists()
    assert (wd / "vq_frontend_codes" / "manifest.json").exists()

    _run_cli(["mwd", "evaluate", "--workdir", str(wd)])
    m = json.loads((wd / "metrics.json").read_text())
    assert m["alignment"]["f1"] > 0.4, m["alignment"]
    assert "retrieval" in m and "dtw" not in m  # codes are discrete: no DTW

    _run_cli(["mwd", "align", "--workdir", str(wd)])
    recs = json.loads((wd / "alignment.json").read_text())
    assert len(recs) == fc.n

    # stale-artifact guard: a changed code space at decode is rejected
    # (quantizing with a different codebook would silently decode wrong)
    with pytest.raises(SystemExit, match="different corpus/codebook"):
        _run_cli(["mwd", "evaluate", "--workdir", str(wd),
                  "--override", "model.vq_codes=48"])

    # --fresh is the ONE path that refits: new code space, checkpoint
    # discarded, downstream commands see a consistent workdir
    _run_cli(["mwd", "train", "--workdir", str(wd), "--fresh",
              "--override", "data.source=stream", f"data.dir={tmp_path / 's'}",
              "model.name=hmm", "model.vq_frontend=true", "model.vq_codes=16",
              "train.num_iterations=2", "train.checkpoint_every=2"])
    assert np.load(wd / "vq_codebook.npy").shape[0] == 16
    _run_cli(["mwd", "evaluate", "--workdir", str(wd)])
    assert json.loads((wd / "metrics.json").read_text())["alignment"]["f1"] > 0.3

    # streamed gradient models reject the flag BEFORE training (silently
    # ignoring it would leave a workdir whose decode/eval commands fail)
    import argparse

    from multimodalworddiscovery_tpu import cli

    with pytest.raises(SystemExit, match="discrete aligners"):
        cli.cmd_train(argparse.Namespace(
            config=None, workdir=str(tmp_path / "wd2"), fresh=False,
            override=["data.source=stream", f"data.dir={tmp_path / 's'}",
                      "model.name=attention", "model.vq_frontend=true",
                      "train.batch_size=8"],
        ))


def test_float16_storage_shards(tmp_path, corpus_gold):
    """float16 STORAGE shards (halved disk + H2D): load_shard ships the
    compact bytes and upcasts to float32 ON DEVICE, and streamed EM on f16
    shards is EXACTLY resident EM on the f16-rounded corpus — the rounding
    happens once at write time, nowhere else."""
    import jax.numpy as jnp

    corpus, gold, _ = corpus_gold
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames

    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=0)
    write_shards(fc, tmp_path / "f32", shard_size=10)
    write_shards(fc, tmp_path / "f16", shard_size=10, storage_dtype="float16")
    r32 = ShardedCorpusReader(tmp_path / "f32")
    r16 = ShardedCorpusReader(tmp_path / "f16")
    assert r16.storage_dtype == "float16" and r32.storage_dtype is None

    s32, s16 = r32.load_shard(0), r16.load_shard(0)
    assert s16.src.dtype == jnp.float32  # upcast happened (on device)
    np.testing.assert_array_equal(      # exactly the f16 rounding, no more
        np.asarray(s16.src),
        np.asarray(s32.src).astype(np.float16).astype(np.float32),
    )
    assert s16.trg.dtype == s32.trg.dtype  # int fields untouched
    sz32 = (tmp_path / "f32" / "src_0.npy").stat().st_size
    sz16 = (tmp_path / "f16" / "src_0.npy").stat().st_size
    assert sz16 < 0.55 * sz32  # the float field really halved on disk

    rounded = fc.replace(src=jnp.asarray(
        np.asarray(fc.src).astype(np.float16).astype(np.float32)
    ))
    key = jax.random.PRNGKey(0)
    ps, lls = train_streaming(
        hmm_gaussian, hmm_gaussian.init(rounded, key=key), r16, 2
    )
    pr, lls_ref = jax.jit(lambda p, c: hmm_gaussian.train(p, c, 2))(
        hmm_gaussian.init(rounded, key=key), rounded
    )
    np.testing.assert_allclose(lls, np.asarray(lls_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ps.means), np.asarray(pr.means), atol=1e-4
    )

    mat, _ = r16.materialize()  # resident convenience path upcasts too
    assert np.asarray(mat.src).dtype == np.float32


def test_float16_storage_vq_paths(tmp_path, corpus_gold):
    """The raw-field readers that bypass load_shard (frame reservoir, shard
    quantization) handle f16 storage: reservoir comes back float32 with the
    f16-rounded values, and the quantized code shards match the ones from
    the equivalent f32-rounded shard dir."""
    corpus, gold, _ = corpus_gold
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.models.hmm_gaussian import (
        _reservoir_frames,
        quantize_shards_streaming,
    )

    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=0)
    rounded = fc.replace(src=np.asarray(fc.src).astype(np.float16).astype(
        np.float32))
    write_shards(fc, tmp_path / "f16", shard_size=10, storage_dtype="float16")
    write_shards(rounded, tmp_path / "ref", shard_size=10)
    r16 = ShardedCorpusReader(tmp_path / "f16")
    rref = ShardedCorpusReader(tmp_path / "ref")

    b16 = _reservoir_frames(r16, 64, seed=5)
    bref = _reservoir_frames(rref, 64, seed=5)
    assert b16.dtype == np.float32
    np.testing.assert_array_equal(b16, bref)

    cb = quantize_shards_streaming(
        r16, tmp_path / "codes16", n_codes=8, key=jax.random.PRNGKey(1)
    )
    quantize_shards_streaming(
        rref, tmp_path / "codesref", n_codes=8, codebook=cb
    )
    for k in range(r16.num_shards):
        np.testing.assert_array_equal(
            np.load(tmp_path / "codes16" / f"src_{k}.npy"),
            np.load(tmp_path / "codesref" / f"src_{k}.npy"),
        )


def test_shard_writer_float16_matches_write_shards(tmp_path, corpus_gold):
    """ShardWriter(storage_dtype=float16) produces byte-identical shard
    files to write_shards(storage_dtype=float16)."""
    from multimodalworddiscovery_tpu.data.stream import FIELDS, ShardWriter
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames

    corpus, gold, _ = corpus_gold
    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=0)
    write_shards(fc, tmp_path / "a", shard_size=10, storage_dtype="float16")
    with ShardWriter(tmp_path / "b", 10, storage_dtype="float16") as w:
        for lo in range(0, fc.n, 10):
            w.append(jax.tree.map(lambda v: v[lo:lo + 10], fc))
    for k in range(3):
        for f in FIELDS:
            assert (tmp_path / "a" / f"{f}_{k}.npy").read_bytes() == (
                tmp_path / "b" / f"{f}_{k}.npy").read_bytes(), (f, k)
    assert ShardedCorpusReader(tmp_path / "b").storage_dtype == "float16"


def test_float16_storage_multihost_rounds(tmp_path, corpus_gold):
    """The multihost round protocol (streamed_round_corpora, used by pod
    EM and the distributed vq_teacher seeding) upcasts f16-storage global
    arrays on device."""
    import jax.numpy as jnp

    from multimodalworddiscovery_tpu.core.mesh import make_mesh
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.parallel.multihost import (
        streamed_round_corpora,
    )

    corpus, gold, _ = corpus_gold
    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=0)
    write_shards(fc, tmp_path / "s", shard_size=16, storage_dtype="float16")
    reader = ShardedCorpusReader(tmp_path / "s")
    mesh = make_mesh(8)
    for (rc,) in streamed_round_corpora((reader,), mesh):
        assert rc.src.dtype == jnp.float32
        np.testing.assert_array_equal(
            np.asarray(rc.src)[:16],
            np.asarray(fc.src[:16]).astype(np.float16).astype(np.float32),
        )
        break
