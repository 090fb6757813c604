import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalworddiscovery_tpu.frontend.image import (
    VGG16,
    crop_and_resize,
    image_concepts,
    init_vgg16,
    load_torch_weights,
    preprocess,
    region_embeddings,
)


def test_vgg16_shapes():
    # B=1: a full 224x224 VGG16 forward is ~17 s/image on one CPU core and
    # the shape contract is per-row
    mod, params = init_vgg16(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    logits, fc2 = mod.apply(params, x)
    assert logits.shape == (1, 1000)
    assert fc2.shape == (1, 4096)


def test_image_concepts_softmax():
    mod, params = init_vgg16()
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(1, 224, 224, 3)).astype(np.float32)
    probs = np.asarray(image_concepts(mod, params, jnp.asarray(imgs)))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


def test_crop_and_resize_identity():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(64, 64, 3)).astype(np.float32)
    full = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    out = np.asarray(crop_and_resize(jnp.asarray(img), full, size=64))
    # full-image box at same resolution ~= identity (half-pixel centers)
    np.testing.assert_allclose(out[0], img, rtol=1e-4, atol=1e-5)


def test_crop_and_resize_subregion_constant():
    img = np.zeros((32, 32, 3), np.float32)
    img[8:16, 8:16] = 5.0
    boxes = jnp.asarray([[8 / 32, 8 / 32, 16 / 32, 16 / 32]])
    out = np.asarray(crop_and_resize(jnp.asarray(img), boxes, size=8))
    # interior of a constant region stays constant
    np.testing.assert_allclose(out[0, 2:6, 2:6], 5.0, atol=1e-5)


def test_region_embeddings_shape():
    mod, params = init_vgg16()
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(128, 160, 3)).astype(np.float32)
    boxes = jnp.asarray([[0.1, 0.1, 0.6, 0.5], [0.3, 0.2, 0.9, 0.95]])
    emb = region_embeddings(mod, params, jnp.asarray(img), boxes)
    assert emb.shape == (2, 4096)
    assert np.isfinite(np.asarray(emb)).all()


def test_torch_weight_conversion_roundtrip(tmp_path):
    """Build a tiny fake torchvision-style state dict, convert, compare to a
    torch forward pass on the conv stack."""
    torch = pytest.importorskip("torch")
    tnn = torch.nn

    # minimal VGG16-shaped state dict (random weights)
    layers = []
    in_c = 3
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_c, v, 3, padding=1))
            layers.append(tnn.ReLU())
            in_c = v
    features = tnn.Sequential(*layers)
    classifier = tnn.Sequential(
        tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(), tnn.Dropout(),
        tnn.Linear(4096, 4096), tnn.ReLU(), tnn.Dropout(),
        tnn.Linear(4096, 1000),
    )
    model = tnn.Sequential()
    model.add_module("features", features)
    model.add_module("classifier", classifier)
    sd = {f"features.{i}.{p}": t for i, m in enumerate(features) if hasattr(m, "weight")
          for p, t in [("weight", m.weight.data), ("bias", m.bias.data)]}
    for i, m in enumerate(classifier):
        if hasattr(m, "weight"):
            sd[f"classifier.{i}.weight"] = m.weight.data
            sd[f"classifier.{i}.bias"] = m.bias.data
    path = tmp_path / "vgg16.pt"
    torch.save(sd, path)

    mod, params = load_torch_weights(path)
    x = np.random.default_rng(3).normal(size=(1, 32, 32, 3)).astype(np.float32) * 0.1

    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        t_feat = features(tx).numpy()  # [1, 512, 1, 1]
    # compare the conv stacks (fc sizes only line up at 224x224 input, and a
    # 32x32 forward through the fc head would shape-mismatch by design)
    import flax.linen as fnn

    h = jnp.asarray(x)
    ci = 0
    for v in cfg:
        if v == "M":
            h = fnn.max_pool(h, (2, 2), strides=(2, 2))
        else:
            w = params["params"][f"conv_{ci}"]["kernel"]
            b = params["params"][f"conv_{ci}"]["bias"]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + b
            h = jax.nn.relu(h)
            ci += 1
    j_feat = np.transpose(np.asarray(h), (0, 3, 1, 2))
    np.testing.assert_allclose(j_feat, t_feat, rtol=1e-3, atol=1e-4)


def test_load_torch_weights_matches_torch(tmp_path):
    """Full-forward parity vs torch: conv stack + CHW flatten + fc head.

    Uses the real VGG16-D conv layout with a narrow fc head (fc sizes are
    read off the state dict) so the end-to-end check — including the
    flatten-order contract between torch's ``flatten(x, 1)`` over
    [N, 512, h, w] and the flax model's (0, 3, 1, 2) transpose — stays
    cheap.  96x96 input -> [512, 3, 3] features, so a wrong flatten order
    cannot cancel out."""
    torch = pytest.importorskip("torch")
    tnn = torch.nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
           "M", 512, 512, 512, "M"]
    layers = []
    in_c = 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_c, v, 3, padding=1))
            layers.append(tnn.ReLU())
            in_c = v
    features = tnn.Sequential(*layers)
    fc_dim, n_cls = 32, 7
    classifier = tnn.Sequential(
        tnn.Linear(512 * 3 * 3, fc_dim), tnn.ReLU(), tnn.Dropout(),
        tnn.Linear(fc_dim, fc_dim), tnn.ReLU(), tnn.Dropout(),
        tnn.Linear(fc_dim, n_cls),
    )
    sd = {}
    for prefix, seq in (("features", features), ("classifier", classifier)):
        for i, m in enumerate(seq):
            if hasattr(m, "weight"):
                sd[f"{prefix}.{i}.weight"] = m.weight.data
                sd[f"{prefix}.{i}.bias"] = m.bias.data
    path = tmp_path / "vgg16_narrow.pt"
    torch.save(sd, path)

    mod, params = load_torch_weights(path)
    assert mod.fc_dim == fc_dim and mod.num_classes == n_cls

    x = np.random.default_rng(5).normal(size=(2, 96, 96, 3)).astype(np.float32) * 0.1
    features.eval()
    classifier.eval()  # dropout must be a no-op for parity
    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        t_fc2 = classifier[:5](torch.flatten(features(tx), 1))
        t_logits = classifier[5:](t_fc2)
    j_logits, j_fc2 = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_fc2), t_fc2.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(), rtol=1e-3, atol=1e-4)


def test_pretrained_gating(tmp_path):
    from multimodalworddiscovery_tpu.frontend.pretrained import checkpoint_available

    assert not checkpoint_available(tmp_path)          # empty dir
    assert not checkpoint_available(tmp_path / "no")   # missing dir
    (tmp_path / "model.safetensors").write_bytes(b"x")
    assert checkpoint_available(tmp_path)
