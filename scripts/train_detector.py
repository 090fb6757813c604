"""Train the learned region-proposal detector end-to-end and report recall.

The learned half of SURVEY.md §2 C3 ("boxes from dataset annotations and/or
an RCNN detector"): an anchor-based RPN (frontend/detector.py) trained on the
synthetic boxes corpus, with proposals fed through the VGG-style
region-embedding path (frontend/image.py crop_and_resize) — the full
detector -> region-features pipeline with no annotation boxes anywhere.

CPU: python scripts/train_detector.py --cpu --images 64 --steps 300
     (~2.5 min; recall@0.5 ≈ 0.96 train / 0.86 held-out)
TPU: python scripts/train_detector.py            (one process owns the tunnel)
"""

import argparse
import json
import time

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--images", type=int, default=256)
parser.add_argument("--size", type=int, default=64)
parser.add_argument("--steps", type=int, default=400)
parser.add_argument("--lr", type=float, default=1e-3)
parser.add_argument("--proposals", type=int, default=16)
args = parser.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from multimodalworddiscovery_tpu.data.synthetic import make_boxes_mini  # noqa: E402
from multimodalworddiscovery_tpu.frontend import detector, image  # noqa: E402

cfg = detector.DetectorConfig(image_size=args.size)
images, boxes, mask = make_boxes_mini(
    n_images=args.images, image_size=args.size, seed=0
)
t0 = time.time()
mod, variables, hist = detector.train(
    cfg, jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(mask),
    num_steps=args.steps, learning_rate=args.lr, key=jax.random.PRNGKey(0),
)
train_s = time.time() - t0
anchors = jnp.asarray(cfg.anchors())

pb, ps, pk = detector.propose(
    mod, variables, anchors, jnp.asarray(images), k=args.proposals
)
rec_train = detector.detection_recall(np.asarray(pb), np.asarray(pk), boxes, mask)

im2, b2, m2 = make_boxes_mini(n_images=64, image_size=args.size, seed=7)
pb2, ps2, pk2 = detector.propose(
    mod, variables, anchors, jnp.asarray(im2), k=args.proposals
)
rec_held = detector.detection_recall(np.asarray(pb2), np.asarray(pk2), b2, m2)

# proposals -> region embeddings (the C3 -> C2 handoff, annotation-free)
crops = image.crop_and_resize(jnp.asarray(im2[0]), pb2[0], size=32)

print(
    json.dumps(
        {
            "train_seconds": round(train_s, 1),
            "final_loss": round(hist[-1]["loss"], 5),
            "recall_at_0.5_train": round(rec_train, 3),
            "recall_at_0.5_heldout": round(rec_held, 3),
            "kept_per_image": round(float(np.asarray(pk2).sum(1).mean()), 2),
            "region_crops_shape": list(crops.shape),
        }
    )
)
