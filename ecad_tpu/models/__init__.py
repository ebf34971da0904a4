from .flux import (
    FluxConfig,
    FluxTransformer,
    flux_step_masks,
    full_flux_mask,
    init_flux_params,
    pack_latents,
    unpack_latents,
)
from .pixart import (
    PixArtConfig,
    PixArtTransformer,
    full_step_mask,
    init_cache,
    init_params,
    schedule_mask_array,
    schedule_step_masks,
)

__all__ = [
    "PixArtConfig",
    "PixArtTransformer",
    "full_step_mask",
    "init_cache",
    "init_params",
    "schedule_step_masks",
    "schedule_mask_array",
    "FluxConfig",
    "FluxTransformer",
    "flux_step_masks",
    "full_flux_mask",
    "init_flux_params",
    "pack_latents",
    "unpack_latents",
]
