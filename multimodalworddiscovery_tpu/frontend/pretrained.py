"""Pretrained embedding frontends for the stretch workload (BASELINE.json
config #5: HuBERT speech + CLIP region embeddings).

This environment has zero network egress, so ``from_pretrained`` can only
load LOCAL checkpoint directories.  These wrappers run the (CPU) torch
models from `transformers` once at preprocessing time and hand the framework
plain feature arrays — the aligners never see torch.  When no checkpoint is
available, callers fall back to the documented precomputed-features contract
(data/io.py .npz archives) or the synthetic stand-ins in configs/.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def checkpoint_available(path: str | Path) -> bool:
    p = Path(path)
    return p.is_dir() and (any(p.glob("*.safetensors")) or any(p.glob("*.bin")))


def extract_hubert(
    wavs: list[np.ndarray], checkpoint_dir: str | Path, layer: int = 9
) -> list[np.ndarray]:
    """Raw 16 kHz waveforms -> per-utterance HuBERT hidden states [T_i, 768].

    Requires a local HuBERT checkpoint directory (config.json + weights).
    """
    import torch
    from transformers import HubertModel

    model = HubertModel.from_pretrained(str(checkpoint_dir))
    model.eval()
    out = []
    with torch.no_grad():
        for w in wavs:
            x = torch.from_numpy(np.asarray(w, np.float32))[None]
            h = model(x, output_hidden_states=True).hidden_states[layer]
            out.append(h[0].numpy())
    return out


def extract_clip_regions(
    image: np.ndarray, boxes: np.ndarray, checkpoint_dir: str | Path
) -> np.ndarray:
    """[H, W, 3] image + [B, 4] normalized boxes -> [B, 512] CLIP embeddings.

    Crops are resized host-side to CLIP's input resolution; requires a local
    CLIP checkpoint directory.
    """
    import torch
    from transformers import CLIPModel, CLIPImageProcessor

    model = CLIPModel.from_pretrained(str(checkpoint_dir))
    proc = CLIPImageProcessor.from_pretrained(str(checkpoint_dir))
    model.eval()
    h, w = image.shape[:2]
    crops = []
    for y1, x1, y2, x2 in np.asarray(boxes, np.float32):
        ys, ye = int(y1 * h), max(int(y2 * h), int(y1 * h) + 1)
        xs, xe = int(x1 * w), max(int(x2 * w), int(x1 * w) + 1)
        crops.append(image[ys:ye, xs:xe])
    inputs = proc(images=crops, return_tensors="pt")
    with torch.no_grad():
        emb = model.get_image_features(**inputs)
    return emb.numpy()
