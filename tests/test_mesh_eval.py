"""Mesh-sharded candidate evaluation on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from ecad_tpu.genetic import CandidateEvaluator, EvalConfig
from ecad_tpu.models import PixArtConfig, init_params
from ecad_tpu.parallel import create_mesh, shard_params
from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
from ecad_tpu.schedules import PixArtCacheSchedule

STEPS = 3


def test_dp_sharded_evaluation_matches_single_device():
    config = PixArtConfig.tiny(dtype=jnp.float32)
    _, params = init_params(config, 0)
    pcfg = PixArtPipelineConfig(model=config, num_inference_steps=STEPS)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p = 8  # one prompt per dp shard
    text = jax.random.normal(k1, (p, config.text_len, config.caption_dim))
    neg = jax.random.normal(k2, (p, config.text_len, config.caption_dim))
    prompts = [f"p{i}" for i in range(p)]

    rng = np.random.default_rng(0)
    sched = PixArtCacheSchedule.from_numpy(
        rng.random(STEPS * config.num_blocks * 3) < 0.5, STEPS,
        config.num_blocks,
    )

    plain = CandidateEvaluator(
        PixArtPipeline(pcfg, params), text, neg, prompts, EvalConfig()
    )
    scores_plain, images_plain = plain.evaluate_candidate(sched)

    mesh = create_mesh(dp=8, tp=1)
    sharded_params = shard_params(params, mesh)
    with mesh:
        sharded = CandidateEvaluator(
            PixArtPipeline(pcfg, sharded_params), text, neg, prompts,
            EvalConfig(), mesh=mesh,
        )
        scores_sharded, images_sharded = sharded.evaluate_candidate(sched)

    np.testing.assert_allclose(
        images_plain.astype(np.int32), images_sharded.astype(np.int32),
        atol=1,
    )
    assert scores_plain["total_score"] == scores_sharded["total_score"]


def test_train_cli_mesh_flags_build_sharded_evaluator():
    """--dp/--tp flags produce an evaluator whose params are mesh-sharded
    and whose candidate eval runs (CLI reach for VERDICT r1 item 6)."""
    from ecad_tpu.genetic.train import build_parser, build_evaluator

    args = build_parser().parse_args(
        ["--name", "meshsmoke", "--tiny-model", "--dp", "4", "--tp", "2",
         "--num-inference-steps", str(STEPS), "--num-prompts", "8",
         "--eval-mode", "stepwise"]
    )
    ev = build_evaluator(args, manager=None)
    assert ev.mesh is not None and ev.mesh.shape == {"dp": 4, "tp": 2}
    specs = {
        leaf.sharding.spec
        for leaf in jax.tree.leaves(ev.pipeline.params)
    }
    assert any(
        any(ax == "tp" for ax in spec) for spec in specs
    ), specs  # HEADS/MLP kernels actually partitioned

    rng = np.random.default_rng(0)
    c = ev.pipeline.config.model
    sched = PixArtCacheSchedule.from_numpy(
        rng.random(STEPS * c.num_blocks * 3) < 0.5, STEPS, c.num_blocks
    )
    scores, images = ev.evaluate_candidate(sched)
    assert np.isfinite(scores["total_score"])
    # the train CLI builds score-only evaluators (return_images=False —
    # the search loop never gathers decoded images to the host, and
    # cooperative pod evaluation requires it; genetic/train.py)
    assert images is None

    # the image path still works when asked for explicitly
    ev.config.return_images = True
    _, images = ev.evaluate_candidate(sched)
    assert images.shape[0] == 8


def test_distributed_single_process_noop_and_host_shard(monkeypatch):
    """initialize() is a no-op without pod env vars; host_shard strides by
    process index (single process → identity)."""
    import ecad_tpu.parallel as par

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    par.initialize()  # must not raise or spawn a coordinator
    assert par.host_shard([1, 2, 3]) == [1, 2, 3]
    assert par.is_coordinator()

    # strided split semantics across a simulated 2-process world
    import ecad_tpu.parallel.distributed as dist

    monkeypatch.setattr(dist.jax, "process_index", lambda: 1)
    monkeypatch.setattr(dist.jax, "process_count", lambda: 2)
    assert dist.host_shard(list(range(5))) == [1, 3]
    assert not dist.is_coordinator()
