"""End-to-end IMAGE pipeline: detector proposals -> region crops -> grounding.

The reference's image branch (SURVEY.md §3.4) runs: image -> region boxes ->
crop/resize -> VGG features -> aligner.  This script runs that whole branch
with the LEARNED box source (frontend/detector.py) and no annotation boxes at
alignment time:

  1. render images for a synthetic paired corpus (one colored rectangle per
     concept, data.synthetic.images_for_corpus);
  2. train the RPN detector on a detection split;
  3. propose boxes on every image, crop+resize each proposal
     (frontend/image.crop_and_resize), flatten to region features;
  4. train the audio-visual grounding aligner (models/grounding.py) on
     (phone captions, detected-region features);
  5. evaluate: alignment accuracy via IoU-matching proposals to gold boxes,
     plus caption->image retrieval recall@k.

CPU smoke: python scripts/image_pipeline.py --cpu --utterances 200 \
    --det-steps 150 --align-iters 150
TPU:       python scripts/image_pipeline.py     (one process owns the tunnel)
"""

from __future__ import annotations

import argparse
import json
import time

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--utterances", type=int, default=400)
parser.add_argument("--concepts", type=int, default=12)
parser.add_argument("--size", type=int, default=64)
parser.add_argument("--det-steps", type=int, default=300)
parser.add_argument("--align-iters", type=int, default=300)
parser.add_argument("--proposals", type=int, default=8)
parser.add_argument("--crop", type=int, default=16)
args = parser.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from multimodalworddiscovery_tpu.data import make_flickr8k_mini  # noqa: E402
from multimodalworddiscovery_tpu.data.corpus import Corpus  # noqa: E402
from multimodalworddiscovery_tpu.data.synthetic import images_for_corpus  # noqa: E402
from multimodalworddiscovery_tpu.eval.retrieval import recall_at_k  # noqa: E402
from multimodalworddiscovery_tpu.frontend import detector, image  # noqa: E402
from multimodalworddiscovery_tpu.models import grounding  # noqa: E402
from multimodalworddiscovery_tpu.oracles.numpy_detector import iou_matrix  # noqa: E402

t_all = time.time()

# --- 1. paired corpus + rendered images ---
corpus, gold, _ = make_flickr8k_mini(
    n_utterances=args.utterances, n_concepts=args.concepts,
    min_concepts=2, max_concepts=4, seed=0,
)
images, gt_boxes, gt_mask, gt_pos = images_for_corpus(
    corpus, image_size=args.size, seed=0
)

# --- 2. detector training (supervised on the detection split, as an RCNN
# would be; the ALIGNER below never sees annotation boxes) ---
dcfg = detector.DetectorConfig(image_size=args.size)
mod, variables, hist = detector.train(
    dcfg, jnp.asarray(images), jnp.asarray(gt_boxes), jnp.asarray(gt_mask),
    num_steps=args.det_steps, learning_rate=1e-3, key=jax.random.PRNGKey(0),
)
anchors = jnp.asarray(dcfg.anchors())

# --- 3. proposals -> region features (crop, resize, flatten) ---
pb, ps, pk = detector.propose(
    mod, variables, anchors, jnp.asarray(images), k=args.proposals
)
det_recall = detector.detection_recall(
    np.asarray(pb), np.asarray(pk), gt_boxes, gt_mask
)


@jax.jit
def region_features(imgs, boxes):
    def one(img, bx):
        crops = image.crop_and_resize(img, bx, size=args.crop)
        return crops.reshape(bx.shape[0], -1)

    return jax.vmap(one)(imgs, boxes)


feats = np.asarray(region_features(jnp.asarray(images), pb))  # [N, K, D]
keep = np.asarray(pk)

# compact kept proposals to a prefix (Corpus wants prefix lengths); track
# each slot's original proposal index for the gold mapping below
n, k = keep.shape
feat_dim = feats.shape[-1]
trg_feats = np.zeros((n, k, feat_dim), np.float32)
slot_to_prop = np.full((n, k), -1, np.int32)
trg_len = keep.sum(axis=1).astype(np.int32)
for i in range(n):
    props = np.nonzero(keep[i])[0]
    trg_feats[i, : len(props)] = feats[i, props]
    slot_to_prop[i, : len(props)] = props

region_corpus = Corpus(
    src=corpus.src, src_len=corpus.src_len,
    trg=jnp.asarray(trg_feats), trg_len=jnp.asarray(np.maximum(trg_len, 1)),
    src_vocab=corpus.src_vocab, trg_vocab=0,
)

# --- 4. grounding aligner on detected regions ---
state = grounding.init(region_corpus, dim=64, key=jax.random.PRNGKey(1))
state, lls = jax.jit(
    lambda s: grounding.train(s, region_corpus, args.align_iters)
)(state)
jax.block_until_ready(lls)

# --- 5a. alignment accuracy via IoU-matching proposals to gold boxes ---
# slot (1-based, what grounding.align emits) -> gold trg position (1-based)
slot_to_goldpos = np.zeros((n, k + 1), np.int32)
for i in range(n):
    gm = gt_mask[i].astype(bool)
    if not gm.any():
        continue
    for s_ in range(trg_len[i]):
        p = slot_to_prop[i, s_]
        ious = iou_matrix(np.asarray(pb)[i, p : p + 1], gt_boxes[i][gm])[0]
        j = int(np.argmax(ious))
        if ious[j] >= 0.5:
            slot_to_goldpos[i, s_ + 1] = gt_pos[i][gm][j]

# null_threshold disabled: the IoU-matched metric scores region CHOICE on
# gold-aligned frames only, so routing low-sim frames to NULL only hurts
pred_slots = np.asarray(
    grounding.align(state, region_corpus, null_threshold=-2.0)
)  # [N, Ts]
pred = np.take_along_axis(slot_to_goldpos, pred_slots, axis=1)
mask = np.asarray(corpus.src_mask()) & (gold.alignment > 0)
align_acc = float((pred == gold.alignment)[mask].mean())

# --- 5b. caption -> image retrieval over detected-region features ---
scores = grounding.retrieval_scores(state, region_corpus)
rec = {
    k_: round(float(v), 3)
    for k_, v in recall_at_k(scores, ks=(1, 5, 10)).items()
}

print(
    json.dumps(
        {
            "n": n,
            "detector_recall@0.5": round(det_recall, 3),
            "proposals_per_image": round(float(trg_len.mean()), 2),
            "alignment_acc": round(align_acc, 3),
            **rec,
            "total_seconds": round(time.time() - t_all, 1),
        }
    )
)
