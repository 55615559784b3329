"""LPIPS (Learned Perceptual Image Patch Similarity) — native JAX port.

Parity target: the reference vendors lpipsPyTorch (lpipsPyTorch/modules/
lpips.py:8-36, networks.py, utils.py): a frozen VGG16/AlexNet feature trunk,
per-layer unit-normalization over channels, squared feature differences,
frozen 1×1 "lin" convolutions, spatial mean, summed over layers.

This module reimplements that computation with jax.lax convolutions (NCHW,
MXU-friendly) and loads weights from a single ``.npz``:

  - the trunk conv kernels/biases of torchvision's ``vgg16(IMAGENET1K_V1)
    .features`` / ``alexnet(pretrained).features`` (networks.py:88-95,77-84)
  - the v0.1 LinLayers weights from richzhang/PerceptualSimilarity
    (utils.py:11-30)

Weights cannot be fetched in this offline environment; run
``scripts/convert_lpips_weights.py`` once on any machine with torchvision +
network access and drop the npz at ``fourdgs_tpu/assets/lpips_<net>.npz``
(or point ``FOURDGS_LPIPS_WEIGHTS_DIR`` at a directory containing them).
metrics.py then fills the LPIPS columns automatically.

Layer recipe (1-based indices into torchvision ``features``, matching
networks.py target_layers):
  vgg16 : taps after ReLUs 4, 9, 16, 23, 30 → channels 64/128/256/512/512
  alex  : taps after ReLUs 2, 5, 8, 10, 12  → channels 64/192/384/256/256
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

# (out_ch, kernel, stride, pad) per conv; 'M' = 2×2 maxpool stride 2.
# Mirrors torchvision vgg16.features / alexnet.features exactly.
VGG16_ARCH = [
    (64, 3, 1, 1), (64, 3, 1, 1), "M",
    (128, 3, 1, 1), (128, 3, 1, 1), "M",
    (256, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1), "M",
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), "M",
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), "M",
]
# taps: feature list index (0-based, counting convs+relus+pools as in
# torchvision) AFTER which to record the activation
VGG16_TAPS = (3, 8, 15, 22, 29)       # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
VGG16_CHANNELS = (64, 128, 256, 512, 512)

ALEX_ARCH = [
    (64, 11, 4, 2), "M3",
    (192, 5, 1, 2), "M3",
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1), "M3",
]
ALEX_TAPS = (1, 4, 7, 9, 11)
ALEX_CHANNELS = (64, 192, 384, 256, 256)

# BaseNet z-score constants (networks.py:41-44), applied to the raw [0,1]
# input exactly as the reference's vendored net does (it omits upstream
# richzhang's [0,1]→[-1,1] scaling layer; parity = match the reference)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def default_weight_paths(net: str = "vgg") -> list[str]:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = []
    env = os.environ.get("FOURDGS_LPIPS_WEIGHTS_DIR")
    if env:
        paths.append(os.path.join(env, f"lpips_{net}.npz"))
    paths.append(os.path.join(here, "assets", f"lpips_{net}.npz"))
    return paths


def load_weights(net: str = "vgg", path: str | None = None):
    """→ weights dict for :func:`make_lpips` or None if no npz found."""
    candidates = [path] if path else default_weight_paths(net)
    for p in candidates:
        if p and os.path.exists(p):
            data = np.load(p)
            return {k: data[k] for k in data.files}
    return None


def _trunk_layout(net: str):
    if net == "vgg":
        return VGG16_ARCH, VGG16_TAPS, VGG16_CHANNELS
    if net == "alex":
        return ALEX_ARCH, ALEX_TAPS, ALEX_CHANNELS
    raise ValueError(f"net must be 'vgg' or 'alex', got {net!r}")


def make_lpips(weights: dict, net: str = "vgg"):
    """Build the jitted LPIPS distance ``d(x, y) -> scalar``.

    ``x``/``y``: [3,H,W] or [B,3,H,W] float images in [0,1].
    ``weights``: flat dict with conv{i}_w [O,I,kh,kw], conv{i}_b [O] per
    trunk conv (i in definition order) and lin{j}_w [1,C,1,1] per tap.
    """
    import jax
    import jax.numpy as jnp

    arch, taps, channels = _trunk_layout(net)
    n_convs = sum(1 for a in arch if not isinstance(a, str))
    for i in range(n_convs):
        assert f"conv{i}_w" in weights, f"missing conv{i}_w"
    for j in range(len(taps)):
        assert f"lin{j}_w" in weights, f"missing lin{j}_w"
    w = {k: jnp.asarray(v, jnp.float32) for k, v in weights.items()}

    def features(x):
        # x: [B,3,H,W] in [0,1] → z-score directly (networks.py:50-56).
        # NOTE: the reference's vendored lpipsPyTorch applies the richzhang
        # shift/scale constants to the RAW [0,1] input — it omits upstream's
        # [0,1]→[-1,1] scaling layer — and metrics.py feeds [0,1] images.
        # Parity means reproducing that exact computation, so no rescale
        # here (caught by tests/test_lpips_parity.py torch cross-check).
        x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / (
            jnp.asarray(_SCALE)[None, :, None, None]
        )
        feats = []
        conv_i = 0
        feat_idx = 0  # torchvision features-list index
        for a in arch:
            if isinstance(a, str):  # maxpool
                k = 3 if a == "M3" else 2
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, 2, 2),
                    "VALID",
                )
                if feat_idx in taps:
                    raise AssertionError("taps never land on pools")
                feat_idx += 1
            else:
                _, kk, stride, pad = a
                x = jax.lax.conv_general_dilated(
                    x, w[f"conv{conv_i}_w"], (stride, stride),
                    [(pad, pad), (pad, pad)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                )
                x = x + w[f"conv{conv_i}_b"][None, :, None, None]
                conv_i += 1
                feat_idx += 1  # the conv itself
                x = jnp.maximum(x, 0.0)
                if feat_idx in taps:
                    # unit-normalize over channels (utils.py:6-8)
                    norm = jnp.sqrt(
                        jnp.sum(x * x, axis=1, keepdims=True)
                    )
                    feats.append(x / (norm + 1e-10))
                feat_idx += 1  # the relu
                if len(feats) == len(taps):
                    break
        return feats

    @jax.jit
    def distance(x, y):
        if x.ndim == 3:
            x, y = x[None], y[None]
        fx, fy = features(x), features(y)
        total = 0.0
        for j, (a, b) in enumerate(zip(fx, fy)):
            d = (a - b) ** 2
            lin = w[f"lin{j}_w"]  # [1,C,1,1]
            r = jnp.sum(d * lin[0, :, 0, 0][None, :, None, None], axis=1)
            total = total + jnp.mean(r, axis=(1, 2))
        return jnp.mean(total)

    return distance


def random_weights(net: str = "vgg", seed: int = 0) -> dict:
    """Random-init weights in the npz layout — for architecture tests ONLY
    (never a substitute for the pretrained metric)."""
    arch, taps, channels = _trunk_layout(net)
    rng = np.random.default_rng(seed)
    out = {}
    in_ch = 3
    i = 0
    for a in arch:
        if isinstance(a, str):
            continue
        out_ch, k, _, _ = a
        out[f"conv{i}_w"] = rng.normal(
            0, (2.0 / (in_ch * k * k)) ** 0.5, (out_ch, in_ch, k, k)
        ).astype(np.float32)
        out[f"conv{i}_b"] = np.zeros(out_ch, np.float32)
        in_ch = out_ch
        i += 1
    for j, c in enumerate(channels):
        out[f"lin{j}_w"] = np.abs(
            rng.normal(0, 0.1, (1, c, 1, 1))
        ).astype(np.float32)
    return out
