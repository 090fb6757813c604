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
