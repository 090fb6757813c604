"""Data layer: corpus pytrees, synthetic corpora, on-disk loaders."""

from multimodalworddiscovery_tpu.data.corpus import Corpus, GoldAnnotations
from multimodalworddiscovery_tpu.data.synthetic import make_flickr8k_mini

__all__ = ["Corpus", "GoldAnnotations", "make_flickr8k_mini"]
