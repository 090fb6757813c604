import argparse
import json
from pathlib import Path

import pytest

from multimodalworddiscovery_tpu import cli


def _ns(**kw):
    return argparse.Namespace(**kw)


def _write_config(tmp_path, body):
    p = tmp_path / "cfg.py"
    p.write_text(body)
    return str(p)


CFG_TMPL = """
from multimodalworddiscovery_tpu.core.config import base_config

def get_config():
    cfg = base_config()
    cfg.model.name = {model!r}
    cfg.data.n_utterances = 40
    cfg.data.continuous = {continuous}
    cfg.data.feat_dim = 8
    cfg.train.num_iterations = 4
    cfg.train.checkpoint_every = 2
    cfg.eval.retrieval = {retrieval}
    return cfg
"""


@pytest.mark.parametrize(
    "model", ["model1", "hmm", "hmm_gaussian", "attention", "hmm_dnn", "hmm_crf"]
)
@pytest.mark.slow
def test_full_cli_pipeline(tmp_path, model, capsys):
    continuous = model in ("hmm_gaussian", "hmm_dnn", "hmm_crf")
    cfg_path = _write_config(
        tmp_path,
        CFG_TMPL.format(
            model=model,
            retrieval=model in ("model1", "hmm_crf"),  # hmm_crf: hmm-family
            continuous=continuous,
        ),
    )
    wd = tmp_path / "run"
    cli.cmd_train(_ns(config=cfg_path, workdir=str(wd), fresh=False, override=[]))
    assert (wd / "config.json").exists()
    assert (wd / "train_metrics.jsonl").exists()

    cli.cmd_align(_ns(workdir=str(wd), output=None))
    recs = json.loads((wd / "alignment.json").read_text())
    assert len(recs) == 40 and "alignment" in recs[0]

    cli.cmd_segment(_ns(workdir=str(wd), output=None))
    segs = json.loads((wd / "segments.json").read_text())
    assert "segments" in segs[0]

    cli.cmd_evaluate(_ns(workdir=str(wd), output=None))
    metrics = json.loads((wd / "metrics.json").read_text())
    assert 0.0 <= metrics["alignment"]["f1"] <= 1.0
    assert "boundary" in metrics and "word_iou" in metrics and "purity" in metrics


def test_train_resumes_from_checkpoint(tmp_path, capsys):
    cfg_path = _write_config(
        tmp_path, CFG_TMPL.format(model="model1", retrieval=False, continuous=False)
    )
    wd = tmp_path / "run"
    cli.cmd_train(_ns(config=cfg_path, workdir=str(wd), fresh=False, override=[]))
    lines1 = (wd / "train_metrics.jsonl").read_text().strip().splitlines()
    assert len(lines1) == 4
    # second invocation resumes at iteration 4 == num_iterations -> no new work
    cli.cmd_train(
        _ns(config=cfg_path, workdir=str(wd), fresh=False,
            override=["train.num_iterations=6"])
    )
    out = capsys.readouterr().out
    assert "resumed from iteration 4" in out
    lines2 = (wd / "train_metrics.jsonl").read_text().strip().splitlines()
    assert len(lines2) == 6  # iterations 4 and 5 appended
    steps = [json.loads(l)["step"] for l in lines2]
    assert steps == [0, 1, 2, 3, 4, 5]


def test_override_types(tmp_path):
    from multimodalworddiscovery_tpu.core.config import apply_overrides, base_config

    cfg = base_config()
    apply_overrides(
        cfg,
        ["train.num_iterations=7", "model.smoothing=0.5", "train.data_parallel=true",
         "model.name=hmm"],
    )
    assert cfg.train.num_iterations == 7
    assert cfg.model.smoothing == 0.5
    assert cfg.train.data_parallel is True
    assert cfg.model.name == "hmm"


def test_cmd_discover(tmp_path, capsys):
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "from multimodalworddiscovery_tpu.core.config import base_config\n"
        "def get_config():\n"
        "    c = base_config()\n"
        "    c.data.n_utterances = 20\n"
        "    c.data.continuous = True\n"
        "    c.data.feat_dim = 8\n"
        "    c.train.num_iterations = 3\n"
        "    return c\n"
    )
    wd = tmp_path / "run"
    cli.cmd_discover(
        _ns(config=str(cfg), workdir=str(wd), clusters=30, output=None, override=[])
    )
    recs = json.loads((wd / "discovered_segments.json").read_text())
    assert len(recs) == 20 and "segments" in recs[0]
    metrics = json.loads((wd / "metrics.json").read_text())
    assert 0 <= metrics["boundary"]["f1"] <= 1


def test_cmd_lexicon(tmp_path, capsys):
    cfg_path = _write_config(
        tmp_path, CFG_TMPL.format(model="hmm", retrieval=False, continuous=False)
    )
    wd = tmp_path / "run"
    cli.cmd_train(_ns(config=cfg_path, workdir=str(wd), fresh=False,
                      override=["train.num_iterations=10"]))
    cli.cmd_lexicon(_ns(workdir=str(wd), top_k=3, output=None))
    lex = json.loads((wd / "lexicon.json").read_text())
    assert len(lex) > 5
    # entries look like phone strings with counts
    first = next(iter(lex.values()))[0]
    assert "phones" in first and first["count"] >= 1
    # with a trained HMM, the dominant entry per concept should repeat
    repeated = sum(1 for v in lex.values() if v and v[0]["count"] >= 2)
    assert repeated > len(lex) // 2


def test_train_bucketed_cli(tmp_path, capsys):
    cfg_path = _write_config(
        tmp_path, CFG_TMPL.format(model="hmm", retrieval=False, continuous=False)
    )
    wd = tmp_path / "run"
    cli.cmd_train(
        _ns(config=cfg_path, workdir=str(wd), fresh=False,
            override=["train.bucket_edges=12"])
    )
    out = capsys.readouterr().out
    assert "bucketed EM (2 buckets)" in out
    # downstream commands work off the bucketed checkpoint
    cli.cmd_evaluate(_ns(workdir=str(wd), output=None))
    metrics = json.loads((wd / "metrics.json").read_text())
    assert metrics["alignment"]["f1"] > 0.5


def test_cmd_export(tmp_path, capsys):
    import numpy as np

    cfg_path = _write_config(
        tmp_path, CFG_TMPL.format(model="hmm", retrieval=False, continuous=False)
    )
    wd = tmp_path / "run"
    cli.cmd_train(_ns(config=cfg_path, workdir=str(wd), fresh=False, override=[]))
    cli.cmd_export(_ns(workdir=str(wd), output=None))
    with np.load(wd / "model.npz") as z:
        keys = list(z.files)
        assert any("log_emit" in k for k in keys), keys
        assert any("log_jump" in k for k in keys), keys


def test_train_from_disk_corpus(tmp_path):
    """disk data.source end-to-end: save a corpus, train + evaluate off it."""
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.data.io import save_corpus

    corpus, gold, _ = make_flickr8k_mini(n_utterances=25, seed=13)
    data_dir = tmp_path / "data"
    save_corpus(corpus, gold, data_dir, "mini")

    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "from multimodalworddiscovery_tpu.core.config import base_config\n"
        "def get_config():\n"
        "    c = base_config()\n"
        "    c.model.name = 'hmm'\n"
        f"    c.data.source = 'disk'\n"
        f"    c.data.dir = {str(data_dir)!r}\n"
        "    c.data.name = 'mini'\n"
        "    c.train.num_iterations = 8\n"
        "    c.eval.retrieval = False\n"
        "    return c\n"
    )
    wd = tmp_path / "run"
    cli.cmd_train(_ns(config=str(cfg), workdir=str(wd), fresh=False, override=[]))
    cli.cmd_evaluate(_ns(workdir=str(wd), output=None))
    metrics = json.loads((wd / "metrics.json").read_text())
    assert metrics["alignment"]["f1"] > 0.6, metrics


@pytest.mark.slow
def test_guided_attention_cli(tmp_path, capsys):
    cfg_path = _write_config(
        tmp_path, CFG_TMPL.format(model="attention", retrieval=False, continuous=False)
    )
    wd = tmp_path / "run"
    cli.cmd_train(
        _ns(config=cfg_path, workdir=str(wd), fresh=False,
            override=["model.guide=hmm", "train.num_iterations=30"])
    )
    out = capsys.readouterr().out
    assert "attention will be guided" in out
    cli.cmd_evaluate(_ns(workdir=str(wd), output=None))


@pytest.mark.slow
def test_cmd_preprocess_flickr8k(tmp_path, capsys):
    (tmp_path / "Flickr8k.token.txt").write_text(
        "1.jpg#0\tA dog chases the ball\n2.jpg#0\tA cat sits on grass\n"
    )
    (tmp_path / "lexicon.txt").write_text(
        "a AH\ndog D AO G\nchases CH EY S\nthe DH AH\nball B AO L\n"
        "cat K AE T\nsits S IH T S\non AA N\ngrass G R AE S\n"
    )
    (tmp_path / "concepts.txt").write_text("1.jpg dog ball\n2.jpg cat grass\n")
    out = tmp_path / "corpus"
    cli.cmd_preprocess(
        _ns(dataset="flickr8k", captions=str(tmp_path / "Flickr8k.token.txt"),
            lexicon=str(tmp_path / "lexicon.txt"),
            concepts=str(tmp_path / "concepts.txt"),
            instances=None, output=str(out), name="f8k")
    )
    assert (out / "f8k_src.txt").exists()
    assert (out / "f8k_gold.json").exists()
    vocab = json.loads((out / "f8k_vocab.json").read_text())
    assert "dog" in vocab["concepts"]

    # ...and the produced directory trains end-to-end
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "from multimodalworddiscovery_tpu.core.config import base_config\n"
        "def get_config():\n"
        "    c = base_config()\n"
        "    c.data.source = 'disk'\n"
        f"    c.data.dir = {str(out)!r}\n"
        "    c.data.name = 'f8k'\n"
        "    c.train.num_iterations = 3\n"
        "    c.eval.retrieval = False\n"
        "    return c\n"
    )
    wd = tmp_path / "run"
    cli.cmd_train(_ns(config=str(cfg), workdir=str(wd), fresh=False, override=[]))
    cli.cmd_evaluate(_ns(workdir=str(wd), output=None))


def test_cmd_retrieve(tmp_path, capsys):
    cfg_path = _write_config(
        tmp_path, CFG_TMPL.format(model="hmm", retrieval=False, continuous=False)
    )
    wd = tmp_path / "run"
    cli.cmd_train(_ns(config=cfg_path, workdir=str(wd), fresh=False,
                      override=["train.num_iterations=10"]))
    cli.cmd_retrieve(_ns(workdir=str(wd), top_k=5, pool=0, output=None))
    rec = json.loads((wd / "retrieval.json").read_text())
    assert "recall@1_c2i" in rec["recall"]
    assert len(rec["rankings"]) == 40
    assert len(rec["rankings"][0]["top_images"]) == 5
    # trained HMM should rank well on this easy corpus
    assert rec["recall"]["recall@5_c2i"] > 0.5, rec["recall"]
    # pooled protocol (the MSCOCO-scale path)
    cli.cmd_retrieve(_ns(workdir=str(wd), top_k=5, pool=8, output=None))
    rec2 = json.loads((wd / "retrieval.json").read_text())
    assert rec2["recall"]["pool_size"] == 8
    assert rec2["recall"]["recall@1_c2i"] >= rec["recall"]["recall@1_c2i"]


def test_train_minibatch_cli(tmp_path, capsys):
    cfg_path = _write_config(
        tmp_path, CFG_TMPL.format(model="attention", retrieval=False, continuous=False)
    )
    wd = tmp_path / "run"
    cli.cmd_train(
        _ns(config=cfg_path, workdir=str(wd), fresh=False,
            override=["train.batch_size=8", "train.num_iterations=6", "model.dim=32"])
    )
    out = capsys.readouterr().out
    assert "minibatch steps (B=8)" in out
    lines = (wd / "train_metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 6
    cli.cmd_align(_ns(workdir=str(wd), output=None))
    assert (wd / "alignment.json").exists()


@pytest.mark.slow
def test_train_guided_attention_data_parallel(tmp_path, capsys):
    """Round-1 excluded guided attention from data_parallel; the guide is now
    computed inside the sharded step, so the combination must train."""
    cfg_path = _write_config(
        tmp_path, CFG_TMPL.format(model="attention", retrieval=False, continuous=False)
    )
    wd = tmp_path / "run"
    cli.cmd_train(
        _ns(config=cfg_path, workdir=str(wd), fresh=False,
            override=["model.guide=hmm", "model.guide_iters=3", "model.dim=32",
                      "train.data_parallel=true", "train.num_iterations=3"])
    )
    out = capsys.readouterr().out
    assert "teacher" in out and "ignores" not in out
    lines = (wd / "train_metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 3


@pytest.mark.slow
def test_train_guided_minibatch_gaussian_teacher(tmp_path, capsys):
    """self_train recipe knobs from config: Gaussian teacher + guided student
    + minibatching, on the continuous corpus."""
    cfg_path = _write_config(
        tmp_path, CFG_TMPL.format(model="attention", retrieval=False, continuous=True)
    )
    wd = tmp_path / "run"
    cli.cmd_train(
        _ns(config=cfg_path, workdir=str(wd), fresh=False,
            override=["model.guide=hmm_gaussian", "model.guide_iters=3",
                      "model.guide_weight=0.5", "train.batch_size=8",
                      "model.dim=32", "train.num_iterations=2"])
    )
    out = capsys.readouterr().out
    assert "hmm_gaussian teacher" in out


def test_train_bucketed_gaussian_cli(tmp_path, capsys):
    cfg_path = _write_config(
        tmp_path, CFG_TMPL.format(model="hmm_gaussian", retrieval=False, continuous=True)
    )
    wd = tmp_path / "run"
    cli.cmd_train(
        _ns(config=cfg_path, workdir=str(wd), fresh=False,
            override=["train.bucket_edges=40"])
    )
    out = capsys.readouterr().out
    assert "bucketed EM (2 buckets)" in out
    # per-iteration checkpointing: checkpoint_every=2 over 4 iters -> steps 1,3
    cli.cmd_align(_ns(workdir=str(wd), output=None))
    assert (wd / "alignment.json").exists()


def test_train_path_misconfig_errors(tmp_path):
    cfg_path = _write_config(
        tmp_path, CFG_TMPL.format(model="attention", retrieval=False, continuous=False)
    )
    with pytest.raises(SystemExit, match="bucket_edges"):
        cli.cmd_train(
            _ns(config=cfg_path, workdir=str(tmp_path / "r1"), fresh=False,
                override=["train.bucket_edges=12"])
        )
    cfg_path2 = _write_config(
        tmp_path, CFG_TMPL.format(model="hmm", retrieval=False, continuous=False)
    )
    with pytest.raises(SystemExit, match="batch_size"):
        cli.cmd_train(
            _ns(config=cfg_path2, workdir=str(tmp_path / "r2"), fresh=False,
                override=["train.batch_size=8"])
        )


def test_use_pallas_config_modes(tmp_path):
    from multimodalworddiscovery_tpu.core.config import base_config

    from multimodalworddiscovery_tpu.data import make_flickr8k_mini

    corpus, _, _ = make_flickr8k_mini(n_utterances=10, seed=0)
    cfg = base_config()
    cfg.model.use_pallas = "on"
    assert cli._resolve_use_pallas(cfg, corpus) is True
    cfg.model.use_pallas = "off"
    assert cli._resolve_use_pallas(cfg, corpus) is False
    cfg.model.use_pallas = "auto"  # tests run on CPU -> scan path
    assert cli._resolve_use_pallas(cfg, corpus) is False
    cfg.model.use_pallas = "bogus"
    with pytest.raises(ValueError, match="use_pallas"):
        cli._resolve_use_pallas(cfg, corpus)


def test_train_corpus_chunks_cli(tmp_path, capsys):
    cfg_path = _write_config(
        tmp_path, CFG_TMPL.format(model="hmm", retrieval=False, continuous=False)
    )
    wd = tmp_path / "run"
    cli.cmd_train(
        _ns(config=cfg_path, workdir=str(wd), fresh=False,
            override=["train.corpus_chunks=4", "train.num_iterations=6"])
    )
    out = capsys.readouterr().out
    assert "scans 4 corpus chunks" in out
    cli.cmd_evaluate(_ns(workdir=str(wd), output=None))
    metrics = json.loads((wd / "metrics.json").read_text())
    assert metrics["alignment"]["f1"] > 0.5
    with pytest.raises(SystemExit, match="corpus_chunks"):
        cli.cmd_train(
            _ns(config=_write_config(
                tmp_path,
                CFG_TMPL.format(model="hmm_dnn", retrieval=False, continuous=True)),
                workdir=str(tmp_path / "r2"), fresh=False,
                override=["train.corpus_chunks=2"])
        )


@pytest.mark.slow
def test_train_gaussian_vq_teacher_annealed(tmp_path, capsys):
    """model.init=vq_teacher + model.anneal_iters drive the productionized
    dense-region recipe end-to-end: seeded init, annealed EM (traced
    temperature, one compile), checkpoint restore via the template init."""
    cfg_path = _write_config(
        tmp_path,
        CFG_TMPL.format(model="hmm_gaussian", retrieval=False, continuous=True),
    )
    wd = tmp_path / "run"
    cli.cmd_train(
        _ns(config=cfg_path, workdir=str(wd), fresh=False,
            override=["model.init=vq_teacher", "model.vq_codes=16",
                      "model.teacher_iters=3", "model.seed_rounds=2",
                      "model.anneal_iters=2", "train.corpus_chunks=2"])
    )
    out = capsys.readouterr().out
    assert "deterministic annealing" in out
    lines = (wd / "train_metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 4
    # decode from the restored checkpoint (init_only template path)
    cli.cmd_align(_ns(workdir=str(wd), output=None))
    recs = json.loads((wd / "alignment.json").read_text())
    assert len(recs) == 40


def test_train_anneal_requires_gaussian(tmp_path):
    cfg_path = _write_config(
        tmp_path, CFG_TMPL.format(model="hmm", retrieval=False, continuous=False)
    )
    with pytest.raises(SystemExit, match="anneal"):
        cli.cmd_train(
            _ns(config=cfg_path, workdir=str(tmp_path / "w"), fresh=False,
                override=["model.anneal_iters=2"])
        )


def test_train_profile_flag(tmp_path):
    """train.profile=true wraps the run in a jax.profiler trace and leaves a
    non-empty <workdir>/profile directory."""
    wd = tmp_path / "run"
    cli.cmd_train(_ns(
        config=None, workdir=str(wd), fresh=False,
        override=["data.n_utterances=16", "model.name=model1",
                  "train.num_iterations=2", "train.profile=true"],
    ))
    prof = wd / "profile"
    assert prof.exists() and any(prof.rglob("*")), "no trace files written"


def test_vq_frontend_model1_on_frames(tmp_path):
    """SURVEY §2 C5's continuous-SMT mode: model.vq_frontend k-means-
    quantizes frames for the discrete aligners; the codebook persists in the
    workdir and decode/eval re-quantize identically.  Without the flag a
    continuous corpus into model1/hmm errors loudly."""
    cfg_path = _write_config(
        tmp_path,
        CFG_TMPL.format(model="model1", retrieval=False, continuous=True),
    )
    wd = tmp_path / "run"
    # continuous + discrete aligner without the flag: loud rejection
    with pytest.raises((SystemExit, ValueError), match="vq_frontend"):
        cli.cmd_train(
            _ns(config=cfg_path, workdir=str(wd), fresh=False, override=[])
        )

    cli.cmd_train(_ns(
        config=cfg_path, workdir=str(wd), fresh=False,
        override=["model.vq_frontend=true", "model.vq_codes=32"],
    ))
    assert (wd / "vq_codebook.npy").exists()

    cli.cmd_evaluate(_ns(workdir=str(wd), output=None, override=[]))
    metrics = json.loads((wd / "metrics.json").read_text())
    # low-noise synthetic frames quantize back to near-phone identity, so
    # the discrete aligner should work about as well as on the phone corpus
    assert metrics["alignment"]["f1"] > 0.4, metrics["alignment"]

    cli.cmd_align(_ns(workdir=str(wd), output=None, override=[]))
    recs = json.loads((wd / "alignment.json").read_text())
    assert len(recs) == 40

    # stale-codebook guard: a changed model.vq_codes at decode is rejected
    with pytest.raises(SystemExit, match="retrain with"):
        cli.cmd_evaluate(_ns(
            workdir=str(wd), output=None, override=["model.vq_codes=48"]
        ))

    # the frontend is for the discrete aligners only
    attn_cfg = tmp_path / "attn_cfg.py"
    attn_cfg.write_text(
        CFG_TMPL.format(model="attention", retrieval=False, continuous=True)
    )
    with pytest.raises(SystemExit, match="discrete aligners"):
        cli.cmd_train(_ns(
            config=str(attn_cfg), workdir=str(tmp_path / "run2"), fresh=False,
            override=["model.vq_frontend=true"],
        ))
