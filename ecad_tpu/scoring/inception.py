"""FID InceptionV3 feature extractor in Flax.

The reference computes FID with clean-fid, whose backbone is the
TF-ported "pt_inception-2015-12-05" InceptionV3 (torchvision topology with
the FID-specific pooling variants: InceptionA/C branch pools are
average-pool with count_include_pad=False, the final InceptionE uses a max
branch pool). Features are the 2048-d pool3 activations.

Weights load from a local pt_inception checkpoint via
`convert_inception_state_dict` (torchvision naming: Conv2d_1a_3x3.conv/bn,
Mixed_5b.branch1x1.conv, …). Structure is parity-tested against an
independent torch mirror in tests/test_inception.py. Preprocessing follows
pytorch-fid/clean-fid: bilinear resize to 299² on [0,1] inputs, then
scale to [-1, 1].
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BN_EPS = 1e-3


class BasicConv(nn.Module):
    """conv (no bias) + batchnorm (eval) + relu."""

    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: tuple[tuple[int, int], tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones_init(), (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros_init(), (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros_init(), (self.features,))
        var = self.param("bn_var", nn.initializers.ones_init(), (self.features,))
        x = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * scale + bias
        return nn.relu(x)


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


def avg_pool_fid(x):
    """3×3 stride-1 avg pool, pad 1, count_include_pad=False."""
    return nn.avg_pool(
        x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
        count_include_pad=False,
    )


def max_pool(x, window=3, stride=2, pad=0):
    return nn.max_pool(
        x, (window, window), strides=(stride, stride), padding=_pad(pad)
    )


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = BasicConv(
            self.pool_features, (1, 1), name="branch_pool"
        )(avg_pool_fid(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, max_pool(x)], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=_pad((0, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=_pad((3, 0)), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=_pad((3, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=_pad((0, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=_pad((3, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=_pad((0, 3)), name="branch7x7dbl_5")(bd)
        bp = BasicConv(192, (1, 1), name="branch_pool")(avg_pool_fid(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=_pad((0, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=_pad((3, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, max_pool(x)], axis=-1)


class InceptionE(nn.Module):
    pool: str  # "avg" (Mixed_7b) or "max" (Mixed_7c, FID variant)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv(384, (1, 3), padding=_pad((0, 1)), name="branch3x3_2a")(b3),
                BasicConv(384, (3, 1), padding=_pad((1, 0)), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv(384, (1, 3), padding=_pad((0, 1)), name="branch3x3dbl_3a")(bd),
                BasicConv(384, (3, 1), padding=_pad((1, 0)), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        if self.pool == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))
        else:
            bp = avg_pool_fid(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Input (B, 299, 299, 3) in [-1, 1] → (B, 2048) pool3 features."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = max_pool(x)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool → (B, 2048)


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------


def convert_inception_state_dict(state: dict) -> dict:
    """torchvision/pt_inception naming → our param tree. Conv weights
    (O,I,kh,kw) → (kh,kw,I,O); batchnorm stats carried as params."""

    def basic(key):
        w = np.asarray(state[f"{key}.conv.weight"])
        return {
            "conv": {"kernel": w.transpose(2, 3, 1, 0)},
            "bn_scale": np.asarray(state[f"{key}.bn.weight"]),
            "bn_bias": np.asarray(state[f"{key}.bn.bias"]),
            "bn_mean": np.asarray(state[f"{key}.bn.running_mean"]),
            "bn_var": np.asarray(state[f"{key}.bn.running_var"]),
        }

    params: dict[str, Any] = {}
    for stem in (
        "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
        "Conv2d_3b_1x1", "Conv2d_4a_3x3",
    ):
        params[stem] = basic(stem)

    def block(name, branches):
        params[name] = {b: basic(f"{name}.{b}") for b in branches}

    a_branches = (
        "branch1x1", "branch5x5_1", "branch5x5_2",
        "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool",
    )
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        block(n, a_branches)
    block("Mixed_6a", ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"))
    c_branches = (
        "branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
        "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
        "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool",
    )
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        block(n, c_branches)
    block(
        "Mixed_7a",
        ("branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
         "branch7x7x3_3", "branch7x7x3_4"),
    )
    e_branches = (
        "branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
        "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
        "branch3x3dbl_3b", "branch_pool",
    )
    block("Mixed_7b", e_branches)
    block("Mixed_7c", e_branches)
    return params


class InceptionFeatureExtractor:
    def __init__(self, params):
        self.params = params
        self.model = InceptionV3FID()
        self._features = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x)
        )

    @classmethod
    def from_weights(cls, checkpoint: Path | str) -> "InceptionFeatureExtractor":
        import torch

        state = torch.load(checkpoint, map_location="cpu", weights_only=True)
        state = {k: v.numpy() for k, v in state.items()}
        return cls(convert_inception_state_dict(state))

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """uint8 (N,H,W,3) → (N, 2048) features (pytorch-fid preprocessing:
        bilinear 299² on [0,1], then 2x−1)."""
        x = jnp.asarray(images, jnp.float32) / 255.0
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), method="bilinear")
        return np.asarray(self._features(self.params, 2.0 * x - 1.0))


def _inception_extractor(images: np.ndarray) -> np.ndarray:
    import os

    ckpt = os.environ.get("ECAD_INCEPTION_CHECKPOINT")
    if not ckpt:
        raise RuntimeError(
            "inception FID features need a local pt_inception checkpoint: "
            "set ECAD_INCEPTION_CHECKPOINT, or use --extractor clip_vision/"
            "pixel_stats"
        )
    global _RESIDENT
    if _RESIDENT is None:
        _RESIDENT = InceptionFeatureExtractor.from_weights(ckpt)
    return _RESIDENT(images)


_RESIDENT = None

from .fid import FeatureExtractorRegistry  # noqa: E402

FeatureExtractorRegistry.register(_inception_extractor, name="inception")
