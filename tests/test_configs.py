"""Every shipped config file must load and train a couple of iterations
(catches config rot as models/options evolve)."""

import argparse
from pathlib import Path

import pytest

from multimodalworddiscovery_tpu import cli

CONFIG_DIR = Path(__file__).parent.parent / "configs"
CONFIGS = sorted(p.name for p in CONFIG_DIR.glob("*.py"))


@pytest.mark.parametrize("name", CONFIGS)
def test_config_trains(name, tmp_path):
    wd = tmp_path / "run"
    cli.cmd_train(
        argparse.Namespace(
            config=str(CONFIG_DIR / name),
            workdir=str(wd),
            fresh=True,
            override=[
                "data.n_utterances=24",
                "train.num_iterations=2",
                "train.checkpoint_every=2",
                "train.data_parallel=false",
            ],
        )
    )
    assert (wd / "train_metrics.jsonl").exists()


def test_config_list_is_nonempty():
    assert len(CONFIGS) >= 6, CONFIGS
