"""In-process candidate evaluation — the offline-eval stage of the ECAD loop.

The reference shells out to three subprocesses per generation
(generate_images.py → score_images.py → compute_macs.py, blocking
subprocess.run; ecad/genetic/train_nsga2_single_gpu.py:131-158,198-232),
reloading the model for every candidate (generate_images.py:13-63). Here the
whole stage runs in-process against ONE resident model:

* compiled step programs are shared across the population via
  SharedModelStepper (distinct (step, mask) patterns compile once),
* the (prompt × image) batch axis shards over the mesh's dp axis,
* MACs come from the analytic model (ecad_tpu.macs) instead of a profiler,
* the on-disk artifact contract (scores.json per candidate dir, metrics in
  candidate JSONs) is preserved for resume parity.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.pixart import schedule_step_masks
from ..pipelines import PixArtPipeline, SharedModelStepper
from ..scoring import aggregate_scores, get_scorer, merge_scores
from .population_io import PopulationIOManager


def latents_to_uint8(latents: jax.Array) -> np.ndarray:
    """Weight-free latent visualization used when no VAE is attached
    (deterministic; NOT a real decode — supply decode_fn for images)."""
    x = np.asarray(latents, dtype=np.float32)
    x = np.clip((x[..., :3] / 4.0 + 0.5), 0, 1)
    return (x * 255).astype(np.uint8)


def _host_values(arr: jax.Array) -> np.ndarray:
    """Device array → host numpy, pod-safe: arrays sharded over a
    cross-process mesh are not fully addressable on any one host, so fetch
    them via process_allgather (fully-replicated result on every host);
    single-process arrays take the direct path."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    # tiled=True: concatenate the per-process shards along axis 0, i.e.
    # reassemble the GLOBAL array (stacking is for host-local values)
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


@jax.jit
def fidelity_snr_db(latents: jax.Array, reference: jax.Array) -> jax.Array:
    """Per-image trajectory fidelity: SNR (dB) of a candidate's final
    latents against the UNCACHED trajectory of the same model on the same
    noise/prompt batch — the quantity caching actually degrades.

    The reference optimizes ImageReward on generated images
    (ecad/genetic/pixart_problem.py:51-62); fidelity is the weight-free
    stand-in quality objective: real (not a hash), computable without
    checkpoints, and monotone in the caching error. Higher is better;
    capped at 200 dB (an exact-match candidate has mse 0)."""
    lat = latents.astype(jnp.float32)
    ref = reference.astype(jnp.float32)
    axes = tuple(range(1, lat.ndim))
    mse = jnp.mean((lat - ref) ** 2, axis=axes)
    power = jnp.mean(ref**2, axis=axes)
    safe_mse = jnp.where(mse > 0, mse, 1.0)
    snr = 10.0 * jnp.log10((power + 1e-20) / safe_mse)
    return jnp.where(mse > 0, jnp.minimum(snr, 200.0), 200.0)


@dataclass
class EvalConfig:
    images_per_prompt: int = 1
    start_seed: int = 0
    seed_step: int = 1
    scorer: str = "mock"
    batch_size: int = 0  # 0 → all (prompts × images) in one device batch
    # "dynamic": ONE lax.cond program for every schedule — no per-candidate
    #   compilation at all; the right choice for evolving populations whose
    #   masks are novel each generation. Measured full-size PixArt on v5e:
    #   one ~5 min compile, then 39.8 ms/img — vs ~20 fresh step-program
    #   compiles per novel candidate in stepwise mode.
    # "stepwise": per-(step, mask) specialized programs, memoized across the
    #   population — slightly faster per image (38.5 ms) when mask patterns
    #   repeat (heuristic families, re-evaluation, serving).
    # Memory note: the dynamic program keeps EVERY component cache alive
    #   (lax.cond cannot DCE them), so its HBM footprint is the worst case
    #   over schedules. PixArt fits easily; FLUX-scale models need the
    #   caches sharded over a mesh (tp/dp) or mode="stepwise", whose
    #   specialized programs only materialize the caches a schedule reuses.
    mode: str = "dynamic"
    # False: skip gathering decoded images to the host — scoring happens
    # per chunk (on device when decode_fn returns device arrays and the
    # scorer accepts them, e.g. ImageRewardScorer), and evaluate_candidate
    # returns (scores, None). The search loop only needs scores; pulling
    # pop × 1000 × 256² uint8 through the host is pure overhead there.
    return_images: bool = True


class CandidateEvaluator:
    """Evaluates every candidate of a generation and writes the score/MACs
    artifacts the NSGA-II loop consumes. PixArt flavor; see
    FluxCandidateEvaluator for the flux stack."""

    def __init__(
        self,
        pipeline: PixArtPipeline,
        text: jax.Array,  # (P, L, cap) prompt embeddings
        neg: jax.Array,  # (P, L, cap) negative embeddings
        prompts: Sequence[str],
        config: EvalConfig | None = None,
        prompt_ids: Optional[Sequence[str]] = None,
        decode_fn: Optional[Callable[[jax.Array], np.ndarray]] = None,
        mesh=None,  # Optional[jax.sharding.Mesh]: dp-shard the work batch
    ) -> None:
        self.pipeline = pipeline
        self.stepper = SharedModelStepper(pipeline)
        from ..pipelines.pixart_pipeline import PopulationDenoiser

        self.dynamic = PopulationDenoiser(pipeline)
        self.text = text
        self.neg = neg
        self.prompts = list(prompts)
        self.prompt_ids = list(prompt_ids) if prompt_ids else None
        self.config = config or EvalConfig()
        self.decode_fn = decode_fn or latents_to_uint8
        self.mesh = mesh

    def _shard(self, *arrays):
        """Place batch-major arrays over the mesh's dp axis (the NSGA-II
        evaluation load is pleasingly parallel along (prompt × image);
        SURVEY.md §5). No-op without a mesh."""
        if self.mesh is None:
            return arrays
        from ..parallel import batch_sharding

        bs = batch_sharding(self.mesh)
        return tuple(jax.device_put(a, bs) for a in arrays)

    def _noise_batch(self) -> tuple[jax.Array, jax.Array, jax.Array, list, list]:
        """Expand prompts × images_per_prompt into one batch with the
        reference's per-image reseeding (seed = start + i·step;
        pixart_image_generator.py:314-393)."""
        c = self.pipeline.config.model
        n_img = self.config.images_per_prompt
        p = len(self.prompts)
        noises, texts, negs, prompts, ids = [], [], [], [], []
        for i in range(n_img):
            seed = self.config.start_seed + i * self.config.seed_step
            key = jax.random.PRNGKey(seed)
            noise = jax.random.normal(
                key, (p, c.sample_size, c.sample_size, c.in_channels)
            ).astype(c.dtype)
            noises.append(noise)
            texts.append(self.text)
            negs.append(self.neg)
            prompts.extend(self.prompts)
            ids.extend(
                self.prompt_ids
                if self.prompt_ids
                else [str(j) for j in range(p)]
            )
        return (
            jnp.concatenate(noises),
            jnp.concatenate(texts),
            jnp.concatenate(negs),
            prompts,
            ids,
        )

    def evaluate_candidate(self, schedule) -> tuple[dict, np.ndarray]:
        """Runs under the evaluator's mesh context (if any) so sharding
        constraints and collectives resolve without the caller managing
        `with mesh:` scopes."""
        if self.mesh is not None:
            with self.mesh:
                return self._evaluate_candidate(schedule)
        return self._evaluate_candidate(schedule)

    def _evaluate_candidate(self, schedule) -> tuple[dict, np.ndarray]:
        if self.config.mode == "dynamic":
            from ..models.pixart import schedule_mask_array

            masks = schedule_mask_array(schedule, self.pipeline.config.model)
            denoise = self.dynamic.denoise
        else:
            masks = self._schedule_masks(schedule)
            denoise = self.stepper.denoise
        return self._eval_with_masks(masks, denoise)

    def _eval_with_masks(self, masks, denoise) -> tuple[dict, np.ndarray]:
        """Chunked denoise → score loop shared by both model flavors.

        scorer == "fidelity" scores in LATENT space against the uncached
        trajectory (no decode unless images were asked for); every other
        scorer sees decoded images — with a device decode_fn + a
        device-capable scorer the whole denoise→decode→score chain stays
        on chip."""
        *arrays, prompts, ids = self._noise_batch()
        fidelity = self.config.scorer == "fidelity"
        if self._mesh_spans_processes() and (
            not fidelity or self.config.return_images
        ):
            raise ValueError(
                "cooperative pod evaluation (mesh spanning processes) "
                "computes device-side scores only: use scorer='fidelity' "
                "and return_images=False (host scorers / image gathers "
                "would need every process to address the full batch)"
            )
        scorer = None if fidelity else get_scorer(self.config.scorer)
        ref = self._reference_latents() if fidelity else None
        bs = self.config.batch_size or len(prompts)
        imgs_all, score_chunks = [], []
        for lo in range(0, len(prompts), bs):
            hi = min(lo + bs, len(prompts))
            sharded = self._shard(*(a[lo:hi] for a in arrays))
            latents = denoise(masks, *sharded)
            if fidelity:
                per_image = _host_values(fidelity_snr_db(latents, ref[lo:hi]))
                score_chunks.append(
                    aggregate_scores(per_image, prompts[lo:hi], ids[lo:hi])
                )
                if not self.config.return_images:
                    continue
            imgs = self._decode(latents)
            if not fidelity:
                score_chunks.append(scorer(imgs, prompts[lo:hi], ids[lo:hi]))
            if self.config.return_images:
                imgs_all.append(np.asarray(imgs))
        scores = merge_scores(score_chunks)
        if not self.config.return_images:
            return scores, None
        return scores, np.concatenate(imgs_all)

    def _decode(self, latents):
        return self.decode_fn(latents)

    def _all_true_masks(self):
        """All-compute masks (the default schedule) in the active eval
        mode's format — the uncached reference trajectory's masks."""
        c = self.pipeline.config.model
        steps = self.pipeline.config.num_inference_steps
        if self.config.mode == "dynamic":
            return np.ones((steps, c.num_blocks, 3), dtype=bool)
        return [tuple(((True,) * 3) for _ in range(c.num_blocks))] * steps

    def _reference_latents(self) -> jax.Array:
        """Final latents of the UNCACHED trajectory for the evaluator's
        (deterministic) noise batch, through the SAME denoise program the
        candidates run — computed once per eval mode and kept on device
        (a population's whole generation shares it)."""
        key = self.config.mode
        if getattr(self, "_ref_latents_key", None) != key:
            masks = self._all_true_masks()
            denoise = (
                self.dynamic.denoise
                if self.config.mode == "dynamic"
                else self.stepper.denoise
            )
            *arrays, prompts, _ids = self._noise_batch()
            bs = self.config.batch_size or len(prompts)
            chunks = []
            for lo in range(0, len(prompts), bs):
                hi = min(lo + bs, len(prompts))
                sharded = self._shard(*(a[lo:hi] for a in arrays))
                chunks.append(denoise(masks, *sharded))
            self._ref_latents = jnp.concatenate(chunks)
            self._ref_latents_key = key
        return self._ref_latents

    def _schedule_masks(self, schedule):
        return schedule_step_masks(schedule, self.pipeline.config.model)

    def _mesh_spans_processes(self) -> bool:
        """True on a DCN×ICI hybrid mesh: the evaluator's mesh covers
        devices of more than one process, so every process must execute
        every candidate's (SPMD) program in lockstep."""
        if self.mesh is None:
            return False
        return (
            len({d.process_index for d in self.mesh.devices.flat}) > 1
        )

    def evaluate_generation(
        self,
        manager: PopulationIOManager,
        generation: Optional[int] = None,
        skip_existing: bool = True,
        verbose: bool = True,
    ) -> dict[int, dict]:
        """Run the full offline-eval stage: per-candidate scores.json +
        analytic MACs written into candidate JSONs.

        Multi-host, two regimes (parallel/distributed.py):
        * work-sharded (no mesh, or a mesh local to each process): each
          process evaluates its `host_shard` of the candidates (strided by
          process index) and writes their scores — the pleasingly-parallel
          tier; with a shared filesystem the per-candidate scores.json
          contract makes the cross-host gather free and
          `check_offline_eval` the barrier.
        * cooperative (DCN×ICI hybrid mesh spanning processes — dp across
          hosts, tp within): all processes run EVERY candidate's SPMD
          program together (the batch axis is what's sharded), and only
          the coordinator writes artifacts."""
        import json

        from ..parallel import host_shard, is_coordinator

        work = list(manager.load_population_schedules(generation))
        cooperative = self._mesh_spans_processes()
        if not cooperative:
            work = host_shard(work)
        write = is_coordinator() if cooperative else True

        results = {}
        t0 = time.perf_counter()
        for idx, sched in work:
            cand_dir = manager.score_dir(generation) / f"cand_{idx:03d}"
            score_file = cand_dir / "scores.json"
            if skip_existing and score_file.exists():
                continue
            scores, _ = self.evaluate_candidate(sched)
            if write:
                cand_dir.mkdir(parents=True, exist_ok=True)
                with score_file.open("w") as f:
                    json.dump(scores, f, indent=4)
            results[idx] = scores
            if verbose:
                dt = time.perf_counter() - t0
                print(
                    f"  cand_{idx:03d}: total_score="
                    f"{scores['total_score']:.4f} ({dt:.1f}s elapsed)"
                )
        if is_coordinator():
            manager.compute_macs_for_generation(generation)
        return results


class FluxCandidateEvaluator(CandidateEvaluator):
    """FLUX flavor: embedded-guidance (no CFG batch), packed latents, and
    the (text, pooled) embedding pair instead of (text, negative)."""

    def __init__(
        self,
        pipeline,  # FluxPipeline
        text: jax.Array,  # (P, L, joint_dim)
        pooled: jax.Array,  # (P, pooled_dim)
        prompts,
        config: EvalConfig | None = None,
        prompt_ids=None,
        decode_fn=None,
        mesh=None,  # Optional[jax.sharding.Mesh]: dp-shard the work batch
    ) -> None:
        from ..pipelines.flux_pipeline import (
            FluxPopulationDenoiser,
            SharedFluxStepper,
        )

        self.pipeline = pipeline
        self.stepper = SharedFluxStepper(pipeline)
        self.dynamic = FluxPopulationDenoiser(pipeline)
        self.text = text
        self.pooled = pooled
        self.prompts = list(prompts)
        self.prompt_ids = list(prompt_ids) if prompt_ids else None
        self.config = config or EvalConfig()
        self.decode_fn = decode_fn or latents_to_uint8
        self.mesh = mesh

    def _schedule_masks(self, schedule):
        from ..models.flux import flux_step_masks

        return flux_step_masks(schedule, self.pipeline.config.model)

    def _noise_batch(self):
        c = self.pipeline.config
        n_img = self.config.images_per_prompt
        p = len(self.prompts)
        noises, texts, pooleds, prompts, ids = [], [], [], [], []
        for i in range(n_img):
            seed = self.config.start_seed + i * self.config.seed_step
            noise = jax.random.normal(
                jax.random.PRNGKey(seed),
                (p, c.image_seq_len, c.model.in_channels),
            ).astype(c.model.dtype)
            noises.append(noise)
            texts.append(self.text)
            pooleds.append(self.pooled)
            prompts.extend(self.prompts)
            ids.extend(
                self.prompt_ids
                if self.prompt_ids
                else [str(j) for j in range(p)]
            )
        return (
            jnp.concatenate(noises),
            jnp.concatenate(texts),
            jnp.concatenate(pooleds),
            prompts,
            ids,
        )

    def _evaluate_candidate(self, schedule):
        if self.config.mode == "dynamic":
            c = self.pipeline.config.model
            n_slots = c.num_blocks + c.num_single_blocks
            masks = np.array(schedule.mask, dtype=bool).reshape(
                schedule.num_inference_steps, n_slots, 3
            ).copy()
            masks[0] = True  # step-0 cache-miss forcing
            denoise = self.dynamic.denoise
        else:
            masks = self._schedule_masks(schedule)
            denoise = self.stepper.denoise
        return self._eval_with_masks(masks, denoise)

    def _decode(self, packed):
        from ..models.flux import unpack_latents

        gh, gw = self.pipeline.config.grid_hw
        return self.decode_fn(unpack_latents(packed, gh, gw))

    def _all_true_masks(self):
        from ..models.flux import full_flux_mask

        c = self.pipeline.config.model
        steps = self.pipeline.config.num_inference_steps
        if self.config.mode == "dynamic":
            n_slots = c.num_blocks + c.num_single_blocks
            return np.ones((steps, n_slots, 3), dtype=bool)
        return [full_flux_mask(c)] * steps
