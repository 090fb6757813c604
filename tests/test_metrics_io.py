"""MetricsWriter: JSONL contract + optional TensorBoard scalars (SURVEY §5.5)."""

import pytest

from multimodalworddiscovery_tpu.core.metrics_io import MetricsWriter


def test_jsonl_roundtrip(tmp_path):
    w = MetricsWriter(tmp_path / "m.jsonl")
    w.write(0, loglik=-1.5, acc=0.5)
    w.write(1, loglik=-1.0)
    recs = w.read_all()
    assert [r["step"] for r in recs] == [0, 1]
    assert recs[0]["loglik"] == -1.5 and recs[0]["acc"] == 0.5


@pytest.mark.slow  # torch.utils.tensorboard import alone is ~20 s on 1 core
def test_tensorboard_scalars_written(tmp_path):
    tb = tmp_path / "tb"
    w = MetricsWriter(tmp_path / "m.jsonl", tensorboard_dir=tb)
    w.write(0, loglik=-2.0, note="non-scalar ignored")
    w.write(1, loglik=-1.0)
    w.close()
    events = list(tb.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0
    # JSONL unaffected
    assert len(w.read_all()) == 2
