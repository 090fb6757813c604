"""BASELINE.json config #2: discrete HMM aligner with forward-backward /
Viterbi on phone transcripts + image concepts (synthetic flickr8k-mini; real
Flickr8k loads via data.source='disk')."""

from multimodalworddiscovery_tpu.core.config import base_config


def get_config():
    cfg = base_config()
    cfg.model.name = "hmm"
    cfg.model.max_jump = 3
    cfg.data.source = "synthetic"
    cfg.data.n_utterances = 200
    cfg.train.num_iterations = 15
    return cfg
