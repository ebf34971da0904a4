"""train_nsga2 — the ECAD evolutionary-caching optimization loop.

CLI parity with the reference's train_nsga2_single_gpu.py /
train_nsga2_base.py (~20 flags, ask/tell cycle, resumable generations), with
the offline-eval stage running in-process on the resident TPU model instead
of three subprocess invocations per generation (SURVEY.md §3.2). The on-disk
generation artifacts (candidates/cand_*.json, scores dirs, manager config)
keep the reference layout so runs are inspectable/resumable identically.

Usage (mini smoke run, mock scorer, random weights):
  python -m ecad_tpu.genetic.train --name demo --population-size 8 \
      --num-cycles 2 --random-seed-gen-0 --tiny-model
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from .evaluate import CandidateEvaluator, EvalConfig
from .nsga2 import NSGA2
from .population_io import (
    CHECKPOINT_FILENAME,
    FluxPopulationIOManager,
    PixArtPopulationIOManager,
    PopulationIOManager,
)

MANAGERS = {
    "pixart": PixArtPopulationIOManager,
    "flux": FluxPopulationIOManager,
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--name", required=True, help="population name")
    p.add_argument("--model-family", choices=sorted(MANAGERS), default="pixart")
    p.add_argument("--populations-dir", type=Path, default=None)
    p.add_argument("--benchmarks-dir", type=Path, default=None)
    p.add_argument("--population-size", type=int, default=72)
    p.add_argument("--num-inference-steps", type=int, default=20)
    p.add_argument("--min-diff-from-default", type=int, default=1)
    p.add_argument("--maximize-macs", action="store_true")
    p.add_argument(
        "--num-cycles",
        default="1",
        help="number of ask/tell cycles, or 'inf' to run until interrupted",
    )
    p.add_argument("--batch-size", type=int, default=0,
                   help="device batch for candidate eval (0 = all at once)")
    p.add_argument("--images-per-prompt", type=int, default=1)
    p.add_argument("--start-seed", type=int, default=0)
    p.add_argument("--seed-step", type=int, default=1)
    p.add_argument("--scorer", default="mock",
                   help="scorer name (mock | fidelity | image_reward | "
                        "clip). 'fidelity' needs no weights: it scores "
                        "each candidate's final latents against the "
                        "uncached trajectory of the same model "
                        "(latent-space SNR dB — the quantity caching "
                        "degrades; evaluate.py:fidelity_snr_db)")
    p.add_argument("--weights-root", type=Path, default=None,
                   help="root of local HF-layout checkpoints (e.g. "
                        "<root>/PixArt-alpha/PixArt-XL-2-256x256/"
                        "{transformer,text_encoder,vae,...}). Loads REAL "
                        "weights + VAE decode into the eval loop — the "
                        "reference's full search "
                        "(train_nsga2_single_gpu.py:198-232)")
    p.add_argument("--transformer-weights", default=None,
                   help="repo name under --weights-root overriding the "
                        "model family default")
    p.add_argument("--image-reward-dir", type=Path, default=None,
                   help="directory holding ImageReward.pt and a BERT "
                        "tokenizer dir (vocab.txt); required with "
                        "--scorer image_reward unless the "
                        "ECAD_IMAGE_REWARD_* env vars are set")
    p.add_argument("--prompt-file", type=Path, default=None,
                   help="text file of prompts (one per line) encoded with "
                        "the real text encoder when --weights-root is set; "
                        "also supplies the prompt text image_reward scores "
                        "against")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh axis size (0 = derive from "
                        "device count when --tp > 1, else no mesh)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh axis size (heads / MLP "
                        "hidden; FLUX-scale models on v5e need tp>=2, see "
                        "docs/flux_hbm_accounting.md)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel mesh axis size (image/joint "
                        "TOKEN axis — activations and cache pytrees split "
                        "1/sp per chip, attention all-gathers K/V over sp; "
                        "the lever for 1024² cache HBM)")
    p.add_argument("--eval-mode", default="dynamic",
                   choices=["dynamic", "stepwise"],
                   help="candidate-eval execution mode (EvalConfig.mode): "
                        "dynamic = one lax.cond program for the whole "
                        "population; stepwise = memoized per-(step,mask) "
                        "programs")
    p.add_argument("--num-prompts", type=int, default=4,
                   help="number of prompt embeddings (random unless "
                        "--embeddings-dir)")
    p.add_argument("--embeddings-dir", type=Path, default=None,
                   help="directory of saved prompt embeddings (.pt/.npz)")
    p.add_argument("--load-from", type=Path, default=None,
                   help="resume from a generation's manager_config.json")
    p.add_argument("--random-seed-gen-0", action="store_true",
                   help="seed gen 0 randomly without asking (reference asks "
                        "interactively, train_nsga2_base.py:184-252)")
    p.add_argument("--cache-dtype", choices=["float8_e4m3fn"], default=None,
                   help="storage dtype for cached component activations"
                   " (FLUX only; halves cache HBM, docs/quantization.md)")
    p.add_argument("--quant",
                   choices=["int8", "int8_static", "int8_w",
                            "int8_w_static"], default=None,
                   help="serving quantization for the denoiser's block"
                   " projections (ops/quant.py): 'int8' = W8A8 dynamic on"
                   " the double-rate int8 MXU; 'int8_w' also stores"
                   " kernels as int8, halving weight HBM")
    p.add_argument("--tiny-model", action="store_true",
                   help="2-block test model (random weights) for smoke runs")
    p.add_argument("--flux-dim", type=int, default=None,
                   help="width-reduce the FLUX model to this hidden dim "
                        "(e.g. 1536 = the single-chip search model: all 57 "
                        "blocks and the real 3420-gene genome, head_dim 128 "
                        "kept, heads scaled dim/128). Schedule semantics "
                        "are width-independent, so evolved schedules "
                        "transfer to the full-width model — the same "
                        "transfer argument as the reference's 256→1024 "
                        "resolution transfer (SURVEY.md §6)")
    p.add_argument("--flux-heads", type=int, default=None,
                   help="override num_heads with --flux-dim (default "
                        "dim // 128)")
    p.add_argument("--crossover-prob", type=float, default=0.9)
    p.add_argument("--crossover-points", type=int, default=4)
    p.add_argument("--mutation-prob", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--print-not-submit", action="store_true",
                   help="describe the eval work instead of running it")
    return p


def _cache_dtype(args):
    if getattr(args, "cache_dtype", None) is None:
        return None
    import jax.numpy as jnp

    return jnp.dtype(args.cache_dtype)


def initialize_manager(args) -> PopulationIOManager:
    cls = MANAGERS[args.model_family]
    if args.load_from is not None:
        mgr = cls.from_json(args.load_from)
        return mgr
    kwargs = dict(
        name=args.name,
        num_inference_steps=args.num_inference_steps,
        min_diff_from_default=args.min_diff_from_default,
        population_size=args.population_size,
        maximize_macs=args.maximize_macs,
    )
    if args.tiny_model:
        # candidate genomes must match the tiny architectures
        if args.model_family == "flux":
            from ..schedules import FluxCacheSchedule

            kwargs["default_schedule"] = FluxCacheSchedule.default(
                num_inference_steps=args.num_inference_steps,
                num_blocks=2,
                num_single_blocks=3,
                top_level_config={},
            )
        else:
            from ..schedules import PixArtCacheSchedule

            kwargs["default_schedule"] = PixArtCacheSchedule.default(
                num_inference_steps=args.num_inference_steps, num_blocks=2
            )
    if args.populations_dir is not None:
        kwargs["all_populations_dir"] = args.populations_dir
    if args.benchmarks_dir is not None:
        kwargs["all_benchmarks_dir"] = args.benchmarks_dir
    return cls(**kwargs)


def resolve_scorer_weights(args) -> None:
    """Fail loudly at startup — not mid-generation — when a real scorer
    lacks weights (VERDICT r1 item 3). --image-reward-dir populates the
    env vars the scorer registry reads."""
    if args.scorer != "image_reward":
        return
    import os

    if args.image_reward_dir is not None:
        d = Path(args.image_reward_dir)
        ckpt = d / "ImageReward.pt"
        if not ckpt.exists():
            raise SystemExit(f"--image-reward-dir: {ckpt} not found")
        if (d / "vocab.txt").exists():
            tok = d
        else:
            toks = sorted(p.parent for p in d.glob("*/vocab.txt"))
            if not toks:
                raise SystemExit(
                    f"--image-reward-dir: no BERT tokenizer (vocab.txt) "
                    f"under {d}"
                )
            tok = toks[0]
        os.environ["ECAD_IMAGE_REWARD_CHECKPOINT"] = str(ckpt)
        os.environ["ECAD_IMAGE_REWARD_TOKENIZER"] = str(tok)
    if not (
        os.environ.get("ECAD_IMAGE_REWARD_CHECKPOINT")
        and os.environ.get("ECAD_IMAGE_REWARD_TOKENIZER")
    ):
        raise SystemExit(
            "--scorer image_reward needs weights: pass --image-reward-dir "
            "(ImageReward.pt + BERT tokenizer) or set "
            "ECAD_IMAGE_REWARD_CHECKPOINT / ECAD_IMAGE_REWARD_TOKENIZER"
        )
    if args.weights_root is None:
        raise SystemExit(
            "--scorer image_reward without --weights-root would score "
            "latent visualizations, not VAE-decoded images — pass "
            "--weights-root (or use --scorer mock for smoke runs)"
        )


def _encoded_entries(args, generator):
    """Prompt embeddings via the real text encoder (--prompt-file)."""
    prompts = [
        line.strip()
        for line in Path(args.prompt_file).read_text().splitlines()
        if line.strip()
    ]
    entries = generator.encode_prompts(prompts)
    return entries, prompts


def _build_mesh(args):
    """Mesh from --dp/--sp/--tp (None when none is set)."""
    sp = getattr(args, "sp", 1)
    if not args.dp and args.tp <= 1 and sp <= 1:
        return None
    from ..parallel import create_mesh

    return create_mesh(dp=args.dp or None, tp=args.tp, sp=sp)


def _shard_pipeline(pipeline, mesh, init_fn, *init_args):
    """Re-place a pipeline's params onto the mesh per the model's
    partitioning annotations (recovered abstractly for checkpoint-loaded
    raw-array trees)."""
    if mesh is None:
        return pipeline
    from flax import linen as nn

    from ..parallel import abstract_boxed_params, shard_params

    like = abstract_boxed_params(init_fn, *init_args)
    pipeline.params = shard_params(
        nn.meta.unbox(pipeline.params), mesh, like=like
    )
    return pipeline


def build_evaluator(args, manager) -> CandidateEvaluator:
    import jax
    import jax.numpy as jnp

    from ..models import PixArtConfig, init_params
    from ..pipelines import PixArtPipeline, PixArtPipelineConfig

    if args.model_family == "flux":
        return _build_flux_evaluator(args)

    if args.cache_dtype is not None:
        # mirror the inference CLI: ImageGenerator.supports_cache_dtype
        # rejects this for PixArt — fail loudly instead of silently running
        # with bf16 caches
        raise ValueError(
            "--cache-dtype is a FLUX option (models/flux.py); PixArt caches "
            "stay in the model dtype"
        )

    mesh = _build_mesh(args)
    decode_fn = None
    prompt_texts = None
    if args.weights_root is not None:
        from ..image_generators import PixArtAlphaImageGenerator

        gen = PixArtAlphaImageGenerator(
            quant=args.quant,
            start_seed=args.start_seed,
            seed_step=args.seed_step,
            weights_root=args.weights_root,
            num_inference_steps=args.num_inference_steps,
        )
        if args.transformer_weights:
            gen.transformer_weights = args.transformer_weights
        config = gen.model_config()
        pipeline = _shard_pipeline(
            gen.create_diffusion_pipeline(), mesh,
            lambda: init_params(config, 0)[1],
        )
        decode_fn = gen.decode_latents
        if args.prompt_file is not None:
            entries, prompt_texts = _encoded_entries(args, gen)
            text = jnp.stack(
                [jnp.asarray(e["prompt_embeds"]) for e in entries]
            ).astype(config.dtype)
            neg = jnp.stack(
                [jnp.asarray(e["negative_prompt_embeds"]) for e in entries]
            ).astype(config.dtype)
            return CandidateEvaluator(
                pipeline, text, neg, prompt_texts,
                _eval_config(args), decode_fn=decode_fn, mesh=mesh,
            )
    else:
        config = (
            PixArtConfig.tiny(dtype=jnp.float32, quant=args.quant)
            if args.tiny_model
            else PixArtConfig(quant=args.quant)
        )
        _, params = init_params(config, args.seed)
        pcfg = PixArtPipelineConfig(
            model=config, num_inference_steps=args.num_inference_steps
        )
        pipeline = _shard_pipeline(
            PixArtPipeline(pcfg, params), mesh,
            lambda: init_params(config, 0)[1],
        )
        from ..models.common import serving_cast

        # bf16 serving weights (cast after sharding so placement is kept;
        # no-op for the fp32 tiny-model config)
        pipeline.params = serving_cast(pipeline.params, config.dtype)

    if args.embeddings_dir is not None:
        from ..utils.io import load_embedding_dir

        entries = load_embedding_dir(args.embeddings_dir)
        text = jnp.stack([e["prompt_embeds"] for e in entries]).astype(config.dtype)
        neg = jnp.stack(
            [e["negative_prompt_embeds"] for e in entries]
        ).astype(config.dtype)
        prompts = [e["name"] for e in entries]
    else:
        k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed))
        p = args.num_prompts
        text = jax.random.normal(
            k1, (p, config.text_len, config.caption_dim)
        ).astype(config.dtype)
        neg = jax.random.normal(
            k2, (p, config.text_len, config.caption_dim)
        ).astype(config.dtype)
        prompts = [f"prompt_{i}" for i in range(p)]

    return CandidateEvaluator(
        pipeline, text, neg, prompts, _eval_config(args),
        decode_fn=decode_fn, mesh=mesh,
    )


def _eval_config(args) -> EvalConfig:
    return EvalConfig(
        images_per_prompt=args.images_per_prompt,
        start_seed=args.start_seed,
        seed_step=args.seed_step,
        scorer=args.scorer,
        batch_size=args.batch_size,
        mode=args.eval_mode,
        # the search loop consumes scores only — never gather decoded
        # images to the host (also a requirement for cooperative pod
        # evaluation, where per-host gathers of dp-sharded images are
        # not addressable; evaluate.py)
        return_images=False,
    )


def _build_flux_evaluator(args):
    import jax
    import jax.numpy as jnp

    from ..models.flux import FluxConfig, init_flux_params
    from ..pipelines.flux_pipeline import FluxPipeline, FluxPipelineConfig
    from .evaluate import FluxCandidateEvaluator

    mesh = _build_mesh(args)
    decode_fn = None
    if args.weights_root is not None:
        from ..image_generators import FluxImageGenerator

        gen = FluxImageGenerator(
            quant=args.quant,
            cache_dtype=args.cache_dtype,
            start_seed=args.start_seed,
            seed_step=args.seed_step,
            weights_root=args.weights_root,
            num_inference_steps=args.num_inference_steps,
        )
        if args.transformer_weights:
            gen.transformer_weights = args.transformer_weights
        config = gen.model_config()
        pipeline = _shard_pipeline(
            gen.create_diffusion_pipeline(), mesh,
            lambda: init_flux_params(config, 0)[1],
        )
        decode_fn = gen.decode_latents
        if args.prompt_file is not None:
            entries, prompt_texts = _encoded_entries(args, gen)
            text = jnp.stack(
                [jnp.asarray(e["prompt_embeds"]) for e in entries]
            ).astype(config.dtype)
            pooled = jnp.stack(
                [jnp.asarray(e["pooled_prompt_embeds"]) for e in entries]
            ).astype(config.dtype)
            return FluxCandidateEvaluator(
                pipeline, text, pooled, prompt_texts,
                _eval_config(args), decode_fn=decode_fn, mesh=mesh,
            )
    else:
        if args.tiny_model:
            config = FluxConfig.tiny(dtype=jnp.float32, quant=args.quant,
                                     cache_dtype=_cache_dtype(args))
            _, params = init_flux_params(config, args.seed)
        else:
            width = {}
            if args.flux_dim is not None:
                width = dict(
                    dim=args.flux_dim,
                    num_heads=args.flux_heads or args.flux_dim // 128,
                )
            config = FluxConfig(quant=args.quant,
                                cache_dtype=_cache_dtype(args), **width)
            # bf16 serving params straight on device: fp32 init masters
            # are 11.1 GB at dim 1536 and OOM the search's dynamic-mode
            # program alongside the cache set (scripts/bench_flux.py:66-73)
            from ..models.common import random_serving_params

            params = random_serving_params(
                jax.eval_shape(lambda: init_flux_params(config, args.seed)[1]),
                seed=args.seed,
                dtype=config.dtype,
            )
        height = 64 if args.tiny_model else 256
        pcfg = FluxPipelineConfig(
            model=config,
            num_inference_steps=args.num_inference_steps,
            height=height,
            width=height,
        )
        pipeline = _shard_pipeline(
            FluxPipeline(pcfg, params), mesh,
            lambda: init_flux_params(config, 0)[1],
        )
    if args.embeddings_dir is not None:
        import jax.numpy as _jnp

        from ..utils.io import load_embedding_dir

        entries = load_embedding_dir(args.embeddings_dir)
        if not entries or "pooled_prompt_embeds" not in entries[0]:
            raise SystemExit(
                f"no FLUX embeddings (prompt_embeds + pooled_prompt_embeds) "
                f"found in {args.embeddings_dir}"
            )
        text = _jnp.stack(
            [e["prompt_embeds"] for e in entries]
        ).astype(config.dtype)
        pooled = _jnp.stack(
            [e["pooled_prompt_embeds"] for e in entries]
        ).astype(config.dtype)
        prompts = [e["name"] for e in entries]
    else:
        k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed))
        p = args.num_prompts
        text = jax.random.normal(
            k1, (p, config.text_len, config.joint_dim)
        ).astype(config.dtype)
        pooled = jax.random.normal(k2, (p, config.pooled_dim)).astype(
            config.dtype
        )
        prompts = [f"prompt_{i}" for i in range(p)]
    return FluxCandidateEvaluator(
        pipeline, text, pooled, prompts, _eval_config(args),
        decode_fn=decode_fn, mesh=mesh,
    )


def init_gen_0(args, manager: PopulationIOManager, algo: NSGA2) -> None:
    """Load seed candidates from gen_000/candidates if present, else seed
    randomly (train_nsga2_base.py:184-252; interactive y/N replaced by
    --random-seed-gen-0)."""
    seed_dir = manager.candidates_dir(0)
    seeds = manager.load_population_vectors(0)
    if len(seeds):
        print(f"Loaded {len(seeds)} seed candidates from {seed_dir}")
        X0 = algo.initialize(np.array(seeds, dtype=bool))
    else:
        if not args.random_seed_gen_0:
            resp = input(
                f"No gen_000 candidates in {seed_dir}. Random-seed? [y/N] "
            )
            if resp.strip().lower() != "y":
                sys.exit(1)
        X0 = algo.initialize()
    manager.generation_num = max(manager.generation_num, 1)
    from ..parallel import barrier, is_coordinator

    if is_coordinator():
        manager.save_population(X0)
        manager.save_config()
    barrier("gen-0-seeded")


def train_one_cycle(args, manager, algo: NSGA2, evaluator) -> None:
    from ..parallel import barrier, is_coordinator

    gen = manager.generation_num
    if not manager.check_offline_eval():
        if args.print_not_submit:
            print(
                f"[print-not-submit] would evaluate generation "
                f"{manager.generation_num} "
                f"({manager.population_size} candidates × "
                f"{len(evaluator.prompts)} prompts × "
                f"{evaluator.config.images_per_prompt} images)"
            )
            sys.exit(0)
        print(f"Evaluating generation {manager.generation_num}…")
        evaluator.evaluate_generation(manager)
        # multi-host: every process evaluated its candidate shard; wait for
        # all shards (and the coordinator's MACs pass) before checking
        barrier(f"offline-eval-{gen}")
        if not manager.check_offline_eval():
            raise RuntimeError("offline evaluation incomplete after eval run")
    # tell/ask is deterministic (same on-disk X/F/G, same RNG state), so
    # every host computes the identical next population; only the
    # coordinator writes it.
    X, F, G = manager.ask()
    algo.tell(X, F, G)
    next_X = algo.ask()
    manager.generation_num += 1
    if is_coordinator():
        manager.save_population(next_X)
        manager.save_config()
        algo.save(manager.checkpoint_path())
    barrier(f"gen-saved-{gen}")
    print(
        f"Generation {manager.generation_num} saved "
        f"({len(next_X)} candidates). Pareto front size: "
        f"{len(algo.pareto_front()[0])}"
    )


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    resolve_scorer_weights(args)

    from ..parallel import initialize as _init_distributed

    _init_distributed()  # no-op unless pod env vars are set
    manager = initialize_manager(args)

    ckpt = manager.checkpoint_path()
    # probe without generation_dir(): its mkdir side effect would create a
    # bogus gen_-01 dir when starting from a seeded gen_000
    prev_ckpt = (
        manager.population_dir
        / f"gen_{manager.generation_num - 1:03d}"
        / CHECKPOINT_FILENAME
    )
    if ckpt.exists():
        algo = NSGA2.load(ckpt)
        print(f"Resumed algorithm from {ckpt} (gen {algo.n_gen})")
    elif prev_ckpt.exists():
        algo = NSGA2.load(prev_ckpt)
        print(f"Resumed algorithm from {prev_ckpt} (gen {algo.n_gen})")
    else:
        algo = NSGA2(
            n_var=manager.n_var,
            pop_size=manager.population_size,
            crossover_prob=args.crossover_prob,
            crossover_points=args.crossover_points,
            mutation_prob=args.mutation_prob,
            seed=args.seed,
        )
    evaluator = build_evaluator(args, manager)

    if algo.X is None and algo.pending is None:
        init_gen_0(args, manager, algo)

    cycles = float("inf") if args.num_cycles == "inf" else int(args.num_cycles)
    done = 0
    while done < cycles:
        train_one_cycle(args, manager, algo, evaluator)
        done += 1


if __name__ == "__main__":
    main()
