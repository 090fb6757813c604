"""multimodalworddiscovery_tpu — TPU-native multimodal word discovery.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference repo ``lwang114/MultimodalWordDiscovery``: given spoken captions
(phone transcripts or acoustic frames) paired with images (concept labels or
region features), discover word-like units by aligning speech segments to
visual concepts.

Unlike the reference (per-utterance Python loops on one CPU), every trainer
here is a batched, jitted, data-parallel EM / SGD step over a padded corpus
pytree, sharded across TPU chips with ``jax.sharding`` + ``shard_map``.

Subpackages
-----------
core      config, masking, log-semiring helpers, mesh setup, metrics writer
data      corpus pytrees, synthetic flickr8k-mini, on-disk loaders
models    aligners: Model-1 mixture EM, discrete/Gaussian HMM, attention
          seq2seq, segmental k-means/GMM baselines
ops       Pallas TPU kernels (log-semiring matmul, fused MFCC, DTW) + jnp refs
parallel  device-mesh sharding and data-parallel EM
eval      alignment F1, word IoU, boundary P/R/F1, purity, retrieval, DTW
frontend  speech (MFCC/fbank/deltas) and image (VGG16) feature extraction
utils     checkpointing (orbax), logging, plotting
"""

__version__ = "0.1.0"
