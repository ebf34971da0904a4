"""Headline benchmark: PixArt-α 256 cached vs uncached images/sec on one chip.

Mirrors the reference's latency protocol (ecad/benchmark/compute_latency.py:
warmup runs then timed sample batches of the full pipeline __call__ — the
20-step denoise PLUS the VAE decode to pixels; the decoder here is a
random-weight, architecture-identical VAE, cost-equal to the real one) on
the paper's flagship schedule `ours_fast` (metrics: 2.135 TMACs vs 5.714
uncached; 84.09 ms vs 165.74 ms on the reference's RTX A6000 → 1.971×
wall-clock). Including the decode makes the cached/uncached ratio directly
comparable to the reference's methodology: the decode is a fixed overhead
both stacks pay. One residual asymmetry: the reference's timed region ends
after device→host transfer + PIL conversion (output_type="pil"), while this
bench syncs a sliced device fetch — host-copy/PIL cost is excluded here, so
*absolute* ms/img is slightly flattered; the cached/uncached *ratio* (the
reported metric) is unaffected since both arms exclude the same tail.

Prints ONE JSON line:
  metric  pixart_alpha_256 cached-vs-uncached wall-clock speedup
  value   our speedup on this chip
  vs_baseline  value / 1.971  (≥1.0 means we extract more real speedup from
               the same schedule than the reference's CUDA stack)
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_SPEEDUP = 165.74 / 84.09  # reference wall-clock speedup for ours_fast
BATCH = 32
WARMUP = 2
SAMPLES = 5

_scalar_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def sync(x) -> float:
    """Force full execution of everything queued before/with x.

    block_until_ready is a no-op on the tunneled TPU backend, so we fetch a
    scalar reduction — the 4-byte transfer completes only after the device
    has drained its (serialized) execution queue."""
    return float(_scalar_sum(x))
# vendored paper artifact (see schedules/README.md)
OURS_FAST = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "schedules/schedules_in_paper/pixart_alpha_256/ours_fast.json",
)


def load_schedule():
    from ecad_tpu.schedules import PixArtCacheSchedule

    return PixArtCacheSchedule.from_json(OURS_FAST)


def sync_image(img) -> None:
    """Force execution via a small sliced fetch (full uint8 images would
    crawl through the tunnel; _scalar_sum casts to f32 internally)."""
    sync(img[:, ::64, ::64, :])


def time_fn(one, sync_out=sync_image, warmup=None, samples=None) -> float:
    """Per-run wall clock via pipelined dispatch: T(k runs) − T(1 run) over
    (k−1) cancels both the host→device RTT and dispatch overhead. `one`
    dispatches one full run and returns its final device output; all
    bench scripts share this scaffold."""
    warmup = WARMUP if warmup is None else warmup
    samples = SAMPLES if samples is None else samples
    for _ in range(warmup):
        sync_out(one())

    def run(k: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = one()
        sync_out(out)
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(2))
    tk = min(run(1 + samples) for _ in range(2))
    return (tk - t1) / samples


def time_pipeline(pipe, params, text, neg, noise, vae) -> float:
    """The timed run is the full image pipeline: denoise loop then VAE
    decode to uint8 pixels, all on-device (the reference times
    pipeline.__call__, which ends at pixels)."""
    fn = pipe.build_denoise_fn(donate=False)

    def one():
        return vae.decode_device(fn(params, noise, text, neg, None, None))

    return time_fn(one)


def main() -> None:
    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.schedules import PixArtCacheSchedule

    from ecad_tpu.models.common import serving_cast

    config = PixArtConfig()
    _, params = init_params(config, 0)
    params = serving_cast(params, config.dtype)  # bf16 serving weights
    pcfg = PixArtPipelineConfig(model=config)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    text = jax.random.normal(
        k1, (BATCH, config.text_len, config.caption_dim)
    ).astype(config.dtype)
    neg = jax.random.normal(
        k2, (BATCH, config.text_len, config.caption_dim)
    ).astype(config.dtype)
    noise = jax.random.normal(
        k3, (BATCH, config.sample_size, config.sample_size, config.in_channels)
    ).astype(config.dtype)

    from ecad_tpu.models.vae import random_decoder_pipeline

    vae = random_decoder_pipeline(latent_channels=config.in_channels)

    uncached = PixArtPipeline(pcfg, params, PixArtCacheSchedule.default())
    t_uncached = time_pipeline(uncached, params, text, neg, noise, vae)

    cached = PixArtPipeline(pcfg, params, load_schedule())
    t_cached = time_pipeline(cached, params, text, neg, noise, vae)

    speedup = t_uncached / t_cached
    print(
        json.dumps(
            {
                "metric": "pixart_alpha_256_ours_fast_wallclock_speedup",
                "value": round(speedup, 4),
                "unit": "x_vs_uncached",
                "vs_baseline": round(speedup / REF_SPEEDUP, 4),
                "detail": {
                    "batch": BATCH,
                    "protocol": "full pipeline: 20-step denoise + VAE"
                    " decode to uint8 pixels (reference methodology)",
                    "uncached_ms_per_image": round(
                        t_uncached / BATCH * 1e3, 3
                    ),
                    "cached_ms_per_image": round(t_cached / BATCH * 1e3, 3),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
