"""Profiler decomposition of the weakest ladder rows (VERDICT r3 item 3,
r4 item 4): PixArt-α 1024² uncached, the same model under the
`ours_fast_256_to_1024` transfer schedule (the lowest-MFU committed row),
and full-width FLUX-12B int8_w 256² — each traced with jax.profiler and
the device time bucketed into attention / projections / VAE / other.

The MFU columns added to the ladder say HOW efficient each row is; this
says WHERE the remaining time goes, so the next kernel target is data,
not guesswork. Buckets are classified from XLA op names + HLO op
metadata in the perfetto trace:

  attention   — Pallas attention custom-calls (rowblock/transposed/
                flash/single-tile kernels) and any fusion whose HLO
                metadata mentions dot_product_attention
  projections — remaining dot/convolution fusions inside the denoise
                module (qkv/out/MLP/adaLN matmuls; for the int8 row this
                includes the quantize/dequant epilogues fused into them)
  vae         — everything in the VAE decode module
  other       — remaining denoise-module time (norms, softmax-free
                elementwise, sampler arithmetic, copies)

Usage: python scripts/bench_profile_breakdown.py
         [pixart1024|pixart1024_cached|flux12b ...]
"""

from __future__ import annotations

import glob
import gzip
import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parent.parent
K = 2  # traced repetitions


def _device_events(trace_dir: str):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace files under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
        and "host" not in str(e.get("args", {}).get("name", "")).lower()
    }
    return [
        e
        for e in events
        if e.get("ph") == "X" and e.get("pid") in device_pids
    ]


_ATTN_HINTS = (
    "rowblock",
    "transposed",
    "flash",
    "attn_kernel",
    "single_tile",
    "dot_product_attention",
    "custom-call",  # pallas kernels surface as custom-calls on TPU
)
_PROJ_HINTS = ("dot", "convolution", "conv")


def _classify(events, vae_module_hint: str = "decode"):
    """Bucket leaf (non-module) device events. Module-level events carry
    run_id args; leaf op events don't — they are the fusions/kernels."""
    buckets = {"attention": 0.0, "projections": 0.0, "vae": 0.0, "other": 0.0}
    unknown: dict[str, float] = {}
    for e in events:
        args = e.get("args", {}) or {}
        if "run_id" in args:  # module-level summary event — skip (double count)
            continue
        name = str(e.get("name", ""))
        meta = " ".join(
            str(v) for k, v in args.items() if isinstance(v, str)
        )
        hay = (name + " " + meta).lower()
        dur = float(e.get("dur", 0.0))
        if vae_module_hint in hay:
            buckets["vae"] += dur
        elif any(h in hay for h in _ATTN_HINTS):
            buckets["attention"] += dur
        elif any(h in hay for h in _PROJ_HINTS):
            buckets["projections"] += dur
        else:
            buckets["other"] += dur
            key = name.split(".")[0]
            unknown[key] = unknown.get(key, 0.0) + dur
    top_other = dict(
        sorted(unknown.items(), key=lambda kv: -kv[1])[:12]
    )
    return buckets, top_other


def _emit(row: str, one, sync) -> None:
    import jax

    sync(one())  # warm
    trace_dir = tempfile.mkdtemp(prefix=f"prof_{row}_")
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(K):
            out = one()
        sync(out)
    events = _device_events(trace_dir)
    buckets, top_other = _classify(events)
    total = sum(buckets.values())
    print(
        json.dumps(
            {
                "metric": f"profile_breakdown_{row}",
                "value": round(total / 1e3 / K, 2),
                "unit": "device_ms_per_run",
                "detail": {
                    "pct": {
                        k: round(100.0 * v / total, 1)
                        for k, v in buckets.items()
                    },
                    "ms_per_run": {
                        k: round(v / 1e3 / K, 2) for k, v in buckets.items()
                    },
                    "top_other_events_ms": {
                        k: round(v / 1e3 / K, 2)
                        for k, v in top_other.items()
                    },
                    "runs_traced": K,
                    "trace_dir": trace_dir,
                },
            }
        ),
        flush=True,
    )


def _pixart1024_impl(cached: bool) -> None:
    import jax
    import jax.numpy as jnp  # noqa: F401

    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.models.common import serving_cast
    from ecad_tpu.models.vae import random_decoder_pipeline
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.schedules import PixArtCacheSchedule

    config = PixArtConfig(sample_size=128, use_additional_conditions=True)
    _, params = init_params(config, 0)
    params = serving_cast(params, config.dtype)
    pcfg = PixArtPipelineConfig(model=config)
    batch = 4
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    text = jax.random.normal(
        k1, (batch, config.text_len, config.caption_dim)
    ).astype(config.dtype)
    neg = jax.random.normal(
        k2, (batch, config.text_len, config.caption_dim)
    ).astype(config.dtype)
    noise = jax.random.normal(
        k3,
        (batch, config.sample_size, config.sample_size, config.in_channels),
    ).astype(config.dtype)
    vae = random_decoder_pipeline(latent_channels=config.in_channels)
    sched = PixArtCacheSchedule.from_json(
        ROOT
        / "schedules/schedules_in_paper/pixart_alpha_256/ours_fast.json"
        if cached
        else ROOT
        / "schedules/alpha_cache_schedules/gen_default_1024x1024"
        / "default_1024x1024.json"
    )
    pipe = PixArtPipeline(pcfg, params, sched)
    fn = pipe.build_denoise_fn(donate=False)

    def one():
        return vae.decode_device(fn(params, noise, text, neg, None, None))

    _emit(
        "pixart_1024_ours_fast_256_to_1024" if cached
        else "pixart_1024_uncached",
        one,
        bench.sync_image,
    )


def pixart1024() -> None:
    _pixart1024_impl(cached=False)


def pixart1024_cached() -> None:
    """The ladder's weakest-MFU row (VERDICT r4 #4): the 256→1024
    transfer schedule `ours_fast_256_to_1024` running the full-size
    PixArt-α at 1024² — 38.9% MFU vs 63.9% uncached in r04. This
    decomposition names where the cached program's time goes."""
    _pixart1024_impl(cached=True)


def flux12b() -> None:
    import jax
    import jax.numpy as jnp

    from ecad_tpu.models.common import random_serving_params
    from ecad_tpu.models.flux import (
        FluxConfig,
        init_flux_params,
        unpack_latents,
    )
    from ecad_tpu.models.vae import random_decoder_pipeline
    from ecad_tpu.pipelines.flux_pipeline import (
        FluxPipeline,
        FluxPipelineConfig,
    )

    config = FluxConfig(quant="int8_w", cache_dtype=jnp.float8_e4m3fn)
    params = random_serving_params(
        jax.eval_shape(lambda: init_flux_params(config, 0)[1])
    )
    pcfg = FluxPipelineConfig(model=config, height=256, width=256)
    batch = 4
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    noise = jax.random.normal(
        k1, (batch, pcfg.image_seq_len, config.in_channels)
    ).astype(config.dtype)
    txt = jax.random.normal(
        k2, (batch, config.text_len, config.joint_dim)
    ).astype(config.dtype)
    pooled = jax.random.normal(k3, (batch, config.pooled_dim)).astype(
        config.dtype
    )
    vae = random_decoder_pipeline(latent_channels=16)
    pipe = FluxPipeline(pcfg, params, None)  # uncached
    gh, gw = pipe.config.grid_hw
    fn = pipe.build_denoise_fn(donate=False)

    def one():
        return vae.decode_device(
            unpack_latents(fn(params, noise, txt, pooled), gh, gw)
        )

    _emit("flux_12b_int8w_256_uncached", one, bench.sync_image)


ROWS = {
    "pixart1024": pixart1024,
    "pixart1024_cached": pixart1024_cached,
    "flux12b": flux12b,
}


def main() -> None:
    rows = sys.argv[1:] or list(ROWS)
    for r in rows:
        ROWS[r]()


if __name__ == "__main__":
    main()
