"""Feature-extraction driver (reference preprocessing scripts, SURVEY.md §3.4).

speech: .npz of raw waveforms (keys arr_0..arr_N, float32 [L_i]) ->
        .npz of MFCC/fbank features via the fused Pallas frontend.
image:  .npz of images (arr_i [H, W, 3]) + boxes JSON -> .npz of VGG16
        region embeddings (+ whole-image concept posteriors).

Usage:
  python scripts/extract_features.py speech --input wavs.npz --output feats.npz
  python scripts/extract_features.py image --input imgs.npz --boxes boxes.json \
      --output regions.npz [--weights vgg16_torch.pt]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def cmd_speech(args):
    from multimodalworddiscovery_tpu.frontend.speech import MfccConfig, add_deltas, cmvn
    from multimodalworddiscovery_tpu.ops.mfcc_pallas import extract_pallas

    with np.load(args.input) as z:
        wavs = [z[k].astype(np.float32) for k in sorted(z.files, key=lambda k: int(k.split("_")[-1]))]
    max_len = max(len(w) for w in wavs)
    padded = np.zeros((len(wavs), max_len), np.float32)
    lens = np.zeros((len(wavs),), np.int32)
    for i, w in enumerate(wavs):
        padded[i, : len(w)] = w
        lens[i] = len(w)

    cfg = MfccConfig(n_mfcc=args.n_mfcc, n_mels=args.n_mels)

    def pipeline(w, l):
        f, fl = extract_pallas(w, l, cfg, kind=args.kind, interpret=args.interpret)
        if args.deltas:
            f = add_deltas(f, fl)
        if args.cmvn:
            f = cmvn(f, fl)
        return f, fl

    n = len(wavs)
    if args.batch_size < 0:
        raise SystemExit(f"--batch-size must be >= 0, got {args.batch_size}")
    b = args.batch_size or n
    # process fixed-size batches padded to the GLOBAL max length: device
    # memory is O(batch), and every batch reuses one compiled extraction
    out: dict[str, np.ndarray] = {}
    run = jax.jit(pipeline)
    for lo in range(0, n, b):
        hi = min(lo + b, n)
        wb = np.zeros((b, max_len), np.float32)  # fixed shape incl. tail
        lb = np.zeros((b,), np.int32)
        wb[: hi - lo] = padded[lo:hi]
        lb[: hi - lo] = lens[lo:hi]
        feats, flens = run(jnp.asarray(wb), jnp.asarray(lb))
        feats, flens = np.asarray(feats), np.asarray(flens)
        for i in range(hi - lo):
            out[f"arr_{lo + i}"] = feats[i, : flens[i]]
    np.savez(args.output, **out)
    dim = next(iter(out.values())).shape[-1]
    print(f"wrote {args.output}: {n} utterances, dim {dim}"
          + (f" ({-(-n // b)} batches of {b})" if args.batch_size else ""))


def cmd_image(args):
    from multimodalworddiscovery_tpu.frontend.image import (
        image_concepts,
        init_vgg16,
        load_torch_weights,
        region_embeddings,
    )

    if args.weights:
        mod, params = load_torch_weights(args.weights)
        print(f"loaded torchvision weights from {args.weights}")
    else:
        mod, params = init_vgg16()
        print("WARNING: random-init VGG16 (no --weights given); embeddings are "
              "untrained — use precomputed features for real experiments")

    with np.load(args.input) as z:
        imgs = {k: z[k] for k in z.files}
    boxes = json.loads(open(args.boxes).read()) if args.boxes else {}

    out = {}
    for k, img in imgs.items():
        img_j = jnp.asarray(img.astype(np.float32))
        if k in boxes and boxes[k]:
            emb = region_embeddings(mod, params, img_j, jnp.asarray(boxes[k], jnp.float32))
            out[k] = np.asarray(emb)
        else:
            import jax.image

            resized = jax.image.resize(img_j, (224, 224, 3), "bilinear")
            probs = image_concepts(mod, params, resized[None])
            out[k] = np.asarray(probs)[0]
    np.savez(args.output, **out)
    print(f"wrote {args.output}: {len(out)} images")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("speech")
    s.add_argument("--input", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--kind", choices=["mfcc", "fbank"], default="mfcc")
    s.add_argument("--n-mfcc", type=int, default=13)
    s.add_argument("--n-mels", type=int, default=26)
    s.add_argument("--deltas", action="store_true")
    s.add_argument("--cmvn", action="store_true")
    s.add_argument("--batch-size", type=int, default=0,
                   help="process this many utterances per device dispatch "
                        "(0 = whole corpus at once); bounds device memory "
                        "for corpora whose padded waveforms exceed HBM")
    s.add_argument("--interpret", action="store_true",
                   help="Pallas interpret mode (CPU runs)")
    s.set_defaults(fn=cmd_speech)

    i = sub.add_parser("image")
    i.add_argument("--input", required=True)
    i.add_argument("--boxes", default=None)
    i.add_argument("--output", required=True)
    i.add_argument("--weights", default=None)
    i.set_defaults(fn=cmd_image)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
