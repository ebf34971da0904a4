"""dp=8 search-protocol evidence (VERDICT r3 item 8).

`scripts/bench_search_protocol.py` measures the reference's exact
per-candidate evaluation unit (100 prompts × 10 images = 1000 images;
/root/reference/ecad/genetic/train_nsga2_base.py:140-156) on ONE chip and
extrapolates pop-72 generation time to a v5e-8 by dividing by 8. This
script converts that arithmetic into a demonstrated sharding, two ways:

functional — run the full 1000-image candidate eval with the dp-sharded
  batch layout a v5e-8 would use (batch 200 = 25 per chip × 8, five even
  chunks) over a REAL dp=8 mesh of 8 virtual CPU devices, tiny model.
  Checks the chunking / device_put / per-chunk scoring machinery at the
  exact protocol shape — every chip sees the single-chip BATCH=25 shape.

aot — AOT-lower the FULL-SIZE PixArt-α 256 dynamic-mode population
  program (the denoise dominating the protocol) for the real v5e:2x4
  topology at dp=8, batch 200, and print memory_analysis per-chip bytes
  vs the 16 GiB HBM budget.

Usage: python scripts/bench_search_dp8.py {functional|aot|both}
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

GIB = 1024**3
N_PROMPTS = 100
IMAGES_PER_PROMPT = 10
BATCH = 200  # 25 per chip × 8 chips; 1000 images in five even chunks


def _bootstrap_cpu8(stage: str) -> None:
    """Same virtual-8-device bootstrap as scripts/flux_full_width.py."""
    if os.environ.get("ECAD_FW_CHILD"):
        return
    import re
    import subprocess

    env = dict(os.environ)
    env["ECAD_FW_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "",
        env.get("XLA_FLAGS", ""),
    )
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count=8".strip()
    )
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import runpy, sys\n"
        f"sys.argv = [{os.path.abspath(__file__)!r}, {stage!r}]\n"
        f"runpy.run_path({os.path.abspath(__file__)!r}, run_name='__main__')\n"
    )
    raise SystemExit(
        subprocess.run([sys.executable, "-c", code], env=env).returncode
    )


def stage_functional() -> None:
    _bootstrap_cpu8("functional")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecad_tpu.genetic import CandidateEvaluator, EvalConfig
    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.parallel import create_mesh
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.schedules import PixArtCacheSchedule

    assert len(jax.devices()) >= 8, jax.devices()
    mesh = create_mesh(dp=8, devices=jax.devices()[:8])

    config = PixArtConfig.tiny(dtype=jnp.float32)
    _, params = init_params(config, 0)
    pipe = PixArtPipeline(
        PixArtPipelineConfig(model=config, num_inference_steps=20), params
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    text = jax.random.normal(
        k1, (N_PROMPTS, config.text_len, config.caption_dim)
    )
    neg = jax.random.normal(
        k2, (N_PROMPTS, config.text_len, config.caption_dim)
    )
    prompts = [f"p{i}" for i in range(N_PROMPTS)]
    ev = CandidateEvaluator(
        pipe, text, neg, prompts,
        EvalConfig(
            images_per_prompt=IMAGES_PER_PROMPT,
            batch_size=BATCH,
            scorer="mock",
            mode="dynamic",
        ),
        mesh=mesh,
    )
    rng = np.random.default_rng(0)
    sched = PixArtCacheSchedule.from_numpy(
        rng.random(20 * config.num_blocks * 3) < 0.5,
        20, config.num_blocks, name="dp8_functional",
    )
    t0 = time.perf_counter()
    scores, imgs = ev.evaluate_candidate(sched)
    dt = time.perf_counter() - t0
    assert imgs.shape[0] == N_PROMPTS * IMAGES_PER_PROMPT, imgs.shape
    assert len(scores["avg_by_prompt"]) == N_PROMPTS
    print(json.dumps({
        "metric": "search_loop_dp8_functional",
        "value": 1000,
        "unit": "images_per_candidate",
        "detail": {
            "mesh": "dp=8 (8 virtual CPU devices)",
            "batch": BATCH,
            "per_chip_batch": BATCH // 8,
            "chunks": (N_PROMPTS * IMAGES_PER_PROMPT) // BATCH,
            "model": "tiny (functionality; full-size HBM shape via the "
                     "aot stage)",
            "total_score": scores["total_score"],
            "wall_sec_cpu": round(dt, 1),
        },
    }), flush=True)


def stage_aot() -> None:
    """Per-chip HBM of the full-size dp=8 batch-200 population program on
    the real v5e-8 topology (no TPU needed — AOT against a topology
    description; bootstrapped onto the CPU backend so this never holds
    the exclusive single-TPU tunnel)."""
    _bootstrap_cpu8("aot")

    import numpy as np

    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.pipelines.pixart_pipeline import PopulationDenoiser

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x4", chip_config_name="default"
    )
    devs = topo.devices
    assert devs[0].device_kind == "TPU v5 lite", devs[0].device_kind
    mesh = Mesh(np.array(devs[:8]).reshape(8), ("dp",))

    config = PixArtConfig()
    pcfg = PixArtPipelineConfig(model=config, num_inference_steps=20)
    pipe = PixArtPipeline(pcfg, params=None)
    fn = PopulationDenoiser(pipe)._build(with_enc_mask=False)

    def init_fn():
        return init_params(config, 0)[1]

    abstract = jax.eval_shape(init_fn)
    rsh = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("dp"))
    params_avals = jax.tree.map(
        lambda sds: jax.ShapeDtypeStruct(
            sds.shape,
            jnp.bfloat16 if sds.dtype == jnp.float32 else sds.dtype,
            sharding=rsh,
        ),
        nn.meta.unbox(abstract),
    )
    masks = jax.ShapeDtypeStruct((20, config.num_blocks, 3), jnp.bool_,
                                 sharding=rsh)
    noise = jax.ShapeDtypeStruct(
        (BATCH, config.sample_size, config.sample_size, config.in_channels),
        config.dtype, sharding=bsh,
    )
    emb = jax.ShapeDtypeStruct(
        (BATCH, config.text_len, config.caption_dim), config.dtype,
        sharding=bsh,
    )
    with mesh:
        compiled = fn.lower(
            params_avals, masks, noise, emb, emb, None, None
        ).compile()
    ma = compiled.memory_analysis()
    total = (
        ma.argument_size_in_bytes
        + ma.temp_size_in_bytes
        + ma.output_size_in_bytes
    ) / GIB
    print(json.dumps({
        "metric": "search_loop_dp8_hbm_per_chip",
        "value": round(total, 3),
        "unit": "GiB",
        "detail": {
            "mesh": "dp=8 (v5e:2x4 topology, AOT)",
            "program": "full-size PixArt-a 256 dynamic-mode 20-step "
                       "population denoise, batch 200 (25/chip)",
            "argument_GiB": round(ma.argument_size_in_bytes / GIB, 3),
            "temp_GiB": round(ma.temp_size_in_bytes / GIB, 3),
            "output_GiB": round(ma.output_size_in_bytes / GIB, 3),
            "hbm_budget_GiB": 16,
        },
    }), flush=True)


def main() -> None:
    stage = sys.argv[1] if len(sys.argv) > 1 else "both"
    if stage == "both":
        # each stage bootstraps its own CPU child (SystemExit), so "both"
        # drives them as two sequential subprocess invocations
        import subprocess

        for s in ("functional", "aot"):
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), s]
            ).returncode
            if rc:
                raise SystemExit(rc)
        return
    if stage == "functional":
        stage_functional()
    elif stage == "aot":
        stage_aot()
    else:
        raise SystemExit(f"unknown stage {stage!r}")


if __name__ == "__main__":
    main()
