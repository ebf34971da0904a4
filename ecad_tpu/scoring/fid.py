"""FID: Fréchet distance over pluggable feature extractors, with cached
dataset statistics.

The reference uses clean-fid with precomputed custom stats for mjhq-30k
(ecad/benchmark/compute_fid.py:9-50). Here the protocol is kept — feature
statistics (mu, sigma) cached as .npz keyed by a stats name — while the
feature extractor is a registry entry: "inception" requires a ported
InceptionV3 checkpoint; "clip_vision" reuses the CLIP vision tower; tests
use a weight-free extractor. Statistics computed with different extractors
are incomparable; the stats file records the extractor name and the loader
enforces the match.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import numpy as np

from ..registry import Registry

FeatureExtractor = Callable[[np.ndarray], np.ndarray]  # images → (N, D)

FeatureExtractorRegistry: Registry = Registry("fid_feature_extractor")


@FeatureExtractorRegistry.register(name="pixel_stats")
def pixel_stats_extractor(images: np.ndarray) -> np.ndarray:
    """Weight-free fallback: downsampled pixel features. Only meaningful for
    smoke tests and relative comparisons within one run."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(images, jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], 8, 8, 3), method="linear")
    return np.asarray(x.reshape(x.shape[0], -1))


@FeatureExtractorRegistry.register(name="clip_vision")
def clip_vision_extractor(images: np.ndarray) -> np.ndarray:
    import os

    from .clip_score import CLIPScorer

    model_dir = os.environ.get("ECAD_CLIP_MODEL_DIR")
    if not model_dir:
        raise RuntimeError("set ECAD_CLIP_MODEL_DIR for clip_vision features")
    scorer = CLIPScorer.from_weights(model_dir)
    px = scorer.preprocess(images)
    from .clip_score import CLIPVisionEncoder

    out = CLIPVisionEncoder(scorer.vision_config).apply(
        {"params": scorer.vision_params}, px
    )
    return np.asarray(out)


def compute_statistics(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """FID = |mu1−mu2|² + Tr(S1 + S2 − 2(S1 S2)^½), via eigendecomposition
    of the symmetrized product (no scipy dependency)."""
    diff = mu1 - mu2
    prod = sigma1 @ sigma2
    # sqrtm of (possibly non-symmetric) PSD product via eigvals of the
    # similarity-transformed symmetric form
    eigvals = np.linalg.eigvals(prod)
    covmean_trace = np.sum(np.sqrt(np.maximum(eigvals.real, 0.0)))
    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * covmean_trace
    )


def get_extractor(name: str):
    if name == "inception" and name not in FeatureExtractorRegistry:
        from . import inception  # noqa: F401
    return FeatureExtractorRegistry.get(name)


class FIDStats:
    """Cached (mu, sigma) with the clean-fid custom-stats workflow."""

    def __init__(self, mu, sigma, extractor: str, n: int):
        self.mu = mu
        self.sigma = sigma
        self.extractor = extractor
        self.n = n

    @classmethod
    def from_images(
        cls, images: np.ndarray, extractor: str = "pixel_stats",
        batch_size: int = 256,
    ) -> "FIDStats":
        fn = get_extractor(extractor)
        feats = np.concatenate(
            [
                fn(images[lo : lo + batch_size])
                for lo in range(0, len(images), batch_size)
            ]
        )
        mu, sigma = compute_statistics(feats)
        return cls(mu, sigma, extractor, len(images))

    def save(self, path: Path | str) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path, mu=self.mu, sigma=self.sigma,
            extractor=np.array(self.extractor), n=np.array(self.n),
        )

    @classmethod
    def load(cls, path: Path | str, expect_extractor: Optional[str] = None):
        with np.load(Path(path)) as d:
            stats = cls(
                d["mu"], d["sigma"], str(d["extractor"]), int(d["n"])
            )
        if expect_extractor and stats.extractor != expect_extractor:
            raise ValueError(
                f"stats computed with {stats.extractor!r}, expected "
                f"{expect_extractor!r}"
            )
        return stats


def fid_between(stats_a: FIDStats, stats_b: FIDStats) -> float:
    if stats_a.extractor != stats_b.extractor:
        raise ValueError(
            f"incomparable stats: {stats_a.extractor} vs {stats_b.extractor}"
        )
    return frechet_distance(stats_a.mu, stats_a.sigma, stats_b.mu, stats_b.sigma)
