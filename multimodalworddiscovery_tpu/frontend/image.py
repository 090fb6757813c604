"""Image frontend: VGG16 concept/region features, jitted in Flax.

Reference counterpart: preprocessing scripts that run pretrained VGG16 over
whole images (class posteriors as concept labels; penultimate-layer
embeddings) and over RCNN-style region crops from bounding boxes
(SURVEY.md §2 C2/C3, §3.4).

TPU-first notes:
- Region cropping is a static-shape bilinear sampling grid (RoIAlign-style),
  vmapped over boxes — no dynamic-shape crops.
- Weights: no torchvision/network in this environment.  ``load_torch_weights``
  converts a torchvision VGG16 ``state_dict`` (torch .pt file) when one is
  available on disk; otherwise random init.  The CPU-runnable pipeline config
  uses PRECOMPUTED features (BASELINE.json config #1), so pretrained weights
  are not on the minimum path.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision VGG16 'D' configuration
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16(nn.Module):
    """VGG16-D.  __call__ returns (logits [N, num_classes], fc2 [N, fc_dim])."""

    num_classes: int = 1000
    fc_dim: int = 4096

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        ci = 0
        for v in _CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, name=f"conv_{ci}")(x)
                x = nn.relu(x)
                ci += 1
        # [N, 7, 7, 512] -> flatten in torch's (C, H, W) order so converted
        # fc weights line up
        n = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
        x = nn.relu(nn.Dense(self.fc_dim, name="fc1")(x))
        fc2 = nn.relu(nn.Dense(self.fc_dim, name="fc2")(x))
        logits = nn.Dense(self.num_classes, name="fc3")(fc2)
        return logits, fc2


def init_vgg16(key: jax.Array | None = None, num_classes: int = 1000):
    """Random-init params (weight conversion replaces them when available)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    mod = VGG16(num_classes=num_classes)
    params = mod.init(key, jnp.zeros((1, 224, 224, 3), jnp.float32))
    return mod, params


def load_torch_weights(path: str | Path):
    """Convert a torchvision VGG16 state_dict (.pt/.pth) to flax params.

    torch conv weight [out, in, kh, kw] -> flax [kh, kw, in, out];
    torch linear weight [out, in] -> flax [in, out].  num_classes and the
    fc width are read off the state dict (torchvision: 1000 / 4096).
    Parity with torch's own forward is pinned by
    tests/test_image_frontend.py::test_load_torch_weights_matches_torch.
    """
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    conv_keys = sorted(
        {k.rsplit(".", 1)[0] for k in sd if k.startswith("features")},
        key=lambda s: int(s.split(".")[1]),
    )
    params: dict[str, Any] = {}
    for i, base in enumerate(conv_keys):
        w = sd[f"{base}.weight"].numpy()
        b = sd[f"{base}.bias"].numpy()
        params[f"conv_{i}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    for flax_name, torch_idx in (("fc1", 0), ("fc2", 3), ("fc3", 6)):
        w = sd[f"classifier.{torch_idx}.weight"].numpy()
        b = sd[f"classifier.{torch_idx}.bias"].numpy()
        params[flax_name] = {
            "kernel": jnp.asarray(w.T),
            "bias": jnp.asarray(b),
        }
    mod = VGG16(
        num_classes=sd["classifier.6.weight"].shape[0],
        fc_dim=sd["classifier.0.weight"].shape[0],
    )
    return mod, {"params": params}


def preprocess(images: jax.Array) -> jax.Array:
    """uint8/float [N, H, W, 3] in [0, 255] or [0, 1] -> normalized float32."""
    x = images.astype(jnp.float32)
    x = jnp.where(jnp.max(x) > 2.0, x / 255.0, x)
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def crop_and_resize(
    image: jax.Array, boxes: jax.Array, size: int = 224
) -> jax.Array:
    """RoIAlign-style static-shape crops.

    image: [H, W, C]; boxes: [B, 4] normalized (y1, x1, y2, x2) in [0, 1].
    Returns [B, size, size, C] bilinear samples — one fixed gather pattern
    per box, vmapped, so XLA sees static shapes (no dynamic crops).
    """
    h, w, c = image.shape

    def one(box):
        y1, x1, y2, x2 = box
        ys = y1 + (y2 - y1) * (jnp.arange(size) + 0.5) / size
        xs = x1 + (x2 - x1) * (jnp.arange(size) + 0.5) / size
        yf = jnp.clip(ys * h - 0.5, 0.0, h - 1.0)
        xf = jnp.clip(xs * w - 0.5, 0.0, w - 1.0)
        y0 = jnp.floor(yf).astype(jnp.int32)
        x0 = jnp.floor(xf).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        wy = (yf - y0)[:, None, None]
        wx = (xf - x0)[None, :, None]
        p00 = image[y0][:, x0]
        p01 = image[y0][:, x1i]
        p10 = image[y1i][:, x0]
        p11 = image[y1i][:, x1i]
        top = p00 * (1 - wx) + p01 * wx
        bot = p10 * (1 - wx) + p11 * wx
        return top * (1 - wy) + bot * wy

    return jax.vmap(one)(boxes)


@functools.partial(jax.jit, static_argnames=("mod",))
def image_concepts(mod: VGG16, params, images: jax.Array) -> jax.Array:
    """Whole-image class posteriors (softmax over classes) — the 'concept'
    distribution of the reference's VGG16 classifier path."""
    logits, _ = mod.apply(params, preprocess(images))
    return jax.nn.softmax(logits, axis=-1)


@functools.partial(jax.jit, static_argnames=("mod",))
def region_embeddings(
    mod: VGG16, params, image: jax.Array, boxes: jax.Array
) -> jax.Array:
    """[B, 4] boxes on one image -> [B, 4096] penultimate embeddings."""
    crops = crop_and_resize(preprocess(image), boxes)
    _, fc2 = mod.apply(params, crops)
    return fc2
