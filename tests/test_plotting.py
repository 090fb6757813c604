import argparse
import json

import numpy as np

from multimodalworddiscovery_tpu import cli
from multimodalworddiscovery_tpu.utils.plotting import (
    plot_alignment_matrix,
    plot_loglik_curve,
    plot_segmentation,
)


def test_plot_functions_write_files(tmp_path):
    rng = np.random.default_rng(0)
    plot_alignment_matrix(rng.random((4, 12)), path=tmp_path / "a.png")
    plot_segmentation(
        rng.integers(0, 3, 12),
        [(0, 4, 1), (4, 9, 2), (9, 12, 3)],
        gold_segments=[(0, 5, 1), (5, 12, 2)],
        path=tmp_path / "s.png",
    )
    plot_loglik_curve([-10, -5, -3, -2.5], path=tmp_path / "l.png")
    for f in ("a.png", "s.png", "l.png"):
        assert (tmp_path / f).stat().st_size > 1000


def test_cli_plot_command(tmp_path):
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "from multimodalworddiscovery_tpu.core.config import base_config\n"
        "def get_config():\n"
        "    c = base_config()\n"
        "    c.data.n_utterances = 12\n"
        "    c.train.num_iterations = 2\n"
        "    return c\n"
    )
    wd = tmp_path / "run"
    ns = argparse.Namespace
    cli.cmd_train(ns(config=str(cfg), workdir=str(wd), fresh=False, override=[]))
    cli.cmd_plot(ns(workdir=str(wd), utterance=1, output=None))
    plots = list((wd / "plots").glob("*.png"))
    assert any("segmentation" in p.name for p in plots)
