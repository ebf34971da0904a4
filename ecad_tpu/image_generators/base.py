"""ImageGenerator — the framework's main object-oriented surface.

API parity with the reference ABC (ecad/image_generators/image_generator.py:29:
encode_prompts, encode_and_save_prompts, generate_images,
generate_from_saved_prompts, time_image_generation, generate_images_timed,
create_encoder_pipeline, create_diffusion_pipeline) with TPU-native
internals: no step cursors or callback chains — the schedule specializes
compiled programs (see ecad_tpu.pipelines) — and batched generation instead
of the reference's sequential image-per-prompt loop.

Weights resolve from a local directory tree (`weights_root/<repo-name>/…` in
HF layout); without weights, `random_weights=True` builds the exact
architecture with random parameters (shape/latency/MACs-faithful — the
analogue of the reference's skip_transformer_block_init,
flux_transformer_2d_edited.py:80-88). Without a VAE, images are rendered by
a documented latent visualization rather than a real decode.
"""

from __future__ import annotations

import json
import time
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Any, Optional, Sequence

import numpy as np

from ..schedules.cache_schedule import CacheSchedule
from ..utils.io import load_embedding_dir, save_embedding


class ImageGenerator(ABC):
    # subclass configuration (mirrors the reference's class attributes,
    # e.g. pixart_alpha_image_generator.py:18-20)
    default_transformer_weights: str = ""
    default_pipeline_weights: str = ""
    default_pipeline: str = ""
    num_blocks: int = 28
    default_num_inference_steps: int = 20
    height: int = 256
    width: int = 256
    guidance_scale: float = 4.5

    schedule_cls: type[CacheSchedule] = CacheSchedule
    supports_cache_dtype = False  # FLUX generators opt in

    def __init__(
        self,
        start_seed: int = 0,
        seed_step: int = 1,
        schedule_path: Optional[Path | str] = None,
        weights_root: Optional[Path | str] = None,
        random_weights: bool = False,
        num_inference_steps: Optional[int] = None,
        batch_size: int = 8,
        quant: Optional[str] = None,
        cache_dtype: Optional[str] = None,
    ) -> None:
        self.start_seed = start_seed
        self.seed_step = seed_step
        self.weights_root = Path(weights_root) if weights_root else None
        self.random_weights = random_weights
        self.batch_size = batch_size
        # None | "int8" (W8A8 dynamic quant) | "int8_w" (int8 weight
        # storage): serving quantization for the transformer's block
        # projections (ops/quant.py). Threaded into model_config().
        self.quant = quant
        # None | "float8_e4m3fn": storage dtype for cached component
        # activations (FLUX; models/flux.py _to_cache) — halves cache
        # HBM for the 12B-on-one-chip 1024² path.
        if cache_dtype is not None and not self.supports_cache_dtype:
            raise ValueError(
                "cache_dtype is a FLUX option (models/flux.py); "
                f"{type(self).__name__} stores caches in the compute dtype"
            )
        self.cache_dtype = cache_dtype
        self.num_inference_steps = (
            num_inference_steps or self.default_num_inference_steps
        )
        # "unrolled" (serve one schedule, max fusion) or "stepwise" (share
        # compiled step programs across many schedules, e.g. schedule trees)
        self.execution_mode = "unrolled"

        self.transformer_weights = self.default_transformer_weights
        self.pipeline_weights = self.default_pipeline_weights
        self.pipeline_name = self.default_pipeline
        self.pipeline_kwargs: dict[str, Any] = {}

        self.dit_schedule = None
        self.cache_schedule = self._load_schedule_file(schedule_path)
        self._encoder = None
        self._pipeline = None
        self._params = None  # transformer params, loaded once per generator
        self._vae = None  # VAE decoder pipeline, loaded once per generator
        # build a random-weight VAE so the latency protocol carries the
        # real decode cost even without checkpoints (compute_latency
        # --random-vae)
        self.use_random_vae = False

    def set_schedule(self, schedule_path) -> None:
        """Point a resident generator at a different schedule file, honoring
        everything the schedule JSON can carry (cache/dit schedule, pipeline
        choice, steps, resolution, guidance). Reuses the compiled pipeline
        in place when only the recompute masks changed (compiled step
        programs survive); otherwise rebuilds it around the cached params."""
        old = (
            self.num_inference_steps, self.pipeline_name, self.height,
            self.width, self.guidance_scale, self.transformer_weights,
        )
        self.dit_schedule = None
        self.cache_schedule = self._load_schedule_file(schedule_path)
        pipe = self._pipeline
        new = (
            self.num_inference_steps, self.pipeline_name, self.height,
            self.width, self.guidance_scale, self.transformer_weights,
        )
        if (
            pipe is not None
            and new == old
            and self.dit_schedule is None
            and hasattr(pipe, "set_schedule")
        ):
            try:
                if type(pipe).__name__ == "FluxPipeline":
                    pipe.set_schedule(self.cache_schedule)
                else:
                    pipe.set_schedule(self.cache_schedule, self.dit_schedule)
                return
            except (TypeError, ValueError):
                pass  # incompatible — rebuild below
        self._pipeline = None

    # -- schedule / config resolution -------------------------------------

    def _load_schedule_file(
        self, schedule_path: Optional[Path | str]
    ) -> CacheSchedule:
        """Load the cache schedule (default all-recompute when None) and
        apply its embedded config overrides — the schedule JSON doubles as a
        config carrier (reference image_generator.py:99-191, types.py:38-48)."""
        if schedule_path is None:
            sched = self._default_schedule()
        else:
            # a schedule JSON carries either a cache_schedule or a
            # dit_schedule (topology); the other falls back to defaults
            # (reference image_generator.py:99-151)
            import json as _json

            with open(schedule_path) as f:
                raw = _json.load(f)
            if "dit_schedule" in raw:
                from ..graph import DiTSchedule

                self.dit_schedule = DiTSchedule.from_dict(raw)
                self.num_inference_steps = (
                    self.dit_schedule.num_inference_steps
                )
                sched = self._default_schedule()
                sched.top_level_config = self.dit_schedule.top_level_config
            else:
                sched = self.schedule_cls.from_dict(raw)
                self.num_inference_steps = sched.num_inference_steps
        cfg = sched.top_level_config or {}
        self.transformer_weights = cfg.get(
            "transformer_weights", self.transformer_weights
        )
        self.pipeline_weights = cfg.get(
            "pipeline_weights", self.pipeline_weights
        )
        pipe = cfg.get("pipeline") or {}
        if pipe:
            self.pipeline_name = pipe.get("name", self.pipeline_name)
            self.pipeline_kwargs = pipe.get("kwargs", {})
        self.height = cfg.get("height", self.height)
        self.width = cfg.get("width", self.width)
        if type(self).allow_guidance_override():
            self.guidance_scale = cfg.get("guidance_scale", self.guidance_scale)
        return sched

    @classmethod
    def allow_guidance_override(cls) -> bool:
        # PixArt fixes guidance at 4.5 (reference inference.py:210-215
        # rejects overrides); FLUX allows per-schedule guidance.
        return False

    def _default_schedule(self) -> CacheSchedule:
        return self.schedule_cls.default(
            num_inference_steps=self.num_inference_steps,
            num_blocks=self.num_blocks,
        )

    # -- abstract construction --------------------------------------------

    @abstractmethod
    def create_encoder_pipeline(self):
        """Text-encoder stack (T5 for PixArt; CLIP+T5 for FLUX)."""

    @abstractmethod
    def create_diffusion_pipeline(self):
        """Denoising pipeline specialized to the loaded schedule."""

    @abstractmethod
    def encode_prompts(self, prompts: Sequence[str]) -> list[dict[str, Any]]:
        """Prompt strings → embedding dicts (reference embedding keys)."""

    @abstractmethod
    def _generate_latents(
        self, embeddings: list[dict[str, Any]], seed: int
    ) -> np.ndarray:
        """One batch of final latents for the given embeddings and seed."""

    @abstractmethod
    def decode_latents(self, latents) -> np.ndarray:
        """Latents → (N, H, W, 3) uint8 images (VAE or visualization)."""

    # -- embedding round trip ----------------------------------------------

    def encode_and_save_prompts(
        self,
        prompts: Sequence[str],
        output_dir: Path | str,
        names: Optional[Sequence[str]] = None,
        fmt: str = ".pt",
    ) -> list[Path]:
        output_dir = Path(output_dir)
        embeddings = self.encode_prompts(prompts)
        paths = []
        for i, emb in enumerate(embeddings):
            name = names[i] if names else f"{i:03d}__prompt_seed:{self.start_seed:03}"
            paths.append(save_embedding(output_dir / f"{name}{fmt}", emb))
        return paths

    # -- generation ---------------------------------------------------------

    def generate_images(
        self,
        embeddings: list[dict[str, Any]],
        images_per_prompt: int = 1,
        output_dir: Optional[Path | str] = None,
    ) -> list[np.ndarray]:
        """Generate images_per_prompt images per embedding; seeds follow the
        reference protocol seed_i = start_seed + i·seed_step
        (pixart_image_generator.py:314-393). Saved as
        `<name>__image_seed:NNN.png` under rel_path subdirs."""
        from PIL import Image

        all_images = []
        for i in range(images_per_prompt):
            seed = self.start_seed + i * self.seed_step
            latents = self._generate_latents(embeddings, seed)
            images = self.decode_latents(latents)
            for emb, img in zip(embeddings, images):
                all_images.append(img)
                if output_dir is not None:
                    rel = Path(emb.get("relative_path", f"{emb['name']}.x")).parent
                    out = (
                        Path(output_dir)
                        / rel
                        / f"{emb['name']}__image_seed:{seed:03}.png"
                    )
                    out.parent.mkdir(parents=True, exist_ok=True)
                    Image.fromarray(img).save(out)
        return all_images

    def generate_from_saved_prompts(
        self,
        input_dir: Path | str,
        output_dir: Path | str,
        images_per_prompt: int = 1,
        batch_size: Optional[int] = None,
    ) -> int:
        """Batched driver over an embeddings directory
        (image_generator.py:366-421)."""
        entries = load_embedding_dir(input_dir)
        bs = batch_size or self.batch_size
        count = 0
        for lo in range(0, len(entries), bs):
            batch = entries[lo : lo + bs]
            imgs = self.generate_images(batch, images_per_prompt, output_dir)
            count += len(imgs)
        return count

    # -- timing -------------------------------------------------------------

    def decode_latents_device(self, latents):
        """Latents → uint8 images, kept on device. Default: the weight-free
        latent visualization (latents_to_uint8); subclasses route through
        the VAE when one is available (real or --random-vae)."""
        import jax.numpy as jnp

        x = jnp.clip(
            latents[..., :3].astype(jnp.float32) / 4.0 + 0.5, 0, 1
        )
        return (x * 255).astype(jnp.uint8)

    def generate_images_timed(
        self, embeddings: list[dict[str, Any]], seed: int = 0
    ) -> float:
        """Wall-clock ms for one batch (device-synchronized).

        Matches the reference's timed region (the full pipeline __call__,
        image_generator.py:442-487): denoise AND decode-to-pixels. Sync is
        a 1-pixel slice pull so host-transfer artifacts of this
        environment's device tunnel don't pollute the measurement."""
        t0 = time.perf_counter()
        latents = self._generate_latents(embeddings, seed)
        images = self.decode_latents_device(latents)
        np.asarray(images[:, :1, :1, :1])  # force full execution
        return (time.perf_counter() - t0) * 1e3

    def time_image_generation(
        self,
        input_dir: Path | str,
        warmup_steps: int = 10,
        num_samples: int = 5,
        batch_size: Optional[int] = None,
    ) -> dict[str, Any]:
        """Latency protocol of compute_latency.py:52-85: warmups then timed
        samples, per-image ms; result dict matches metrics.latency."""
        import jax

        entries = load_embedding_dir(input_dir)
        bs = batch_size or self.batch_size
        batch = (entries * ((bs // max(len(entries), 1)) + 1))[:bs]
        warmups = [
            self.generate_images_timed(batch, seed=s) for s in range(warmup_steps)
        ]
        latencies = [
            self.generate_images_timed(batch, seed=s)
            for s in range(num_samples)
        ]
        per_image = [t / len(batch) for t in latencies]
        return {
            "avg": float(np.mean(per_image)),
            "batch_size": len(batch),
            "num_samples": num_samples,
            "warmup_steps": warmup_steps,
            "gpu": str(jax.devices()[0]),
            "warmups": [t / len(batch) for t in warmups],
            "latencies": per_image,
        }

    # -- misc ---------------------------------------------------------------

    def describe(self) -> dict[str, Any]:
        return {
            "class": type(self).__name__,
            "schedule": self.cache_schedule.name,
            "num_inference_steps": self.num_inference_steps,
            "transformer_weights": self.transformer_weights,
            "pipeline": self.pipeline_name,
            "height": self.height,
            "width": self.width,
            "guidance_scale": self.guidance_scale,
            "random_weights": self.random_weights,
            "quant": self.quant,
            "cache_dtype": self.cache_dtype,
        }
