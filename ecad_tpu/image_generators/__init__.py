"""Image-generator registry (reference: load_image_generator.py:16-85)."""

from __future__ import annotations

from typing import Any

from ..registry import Registry
from .base import ImageGenerator
from .pixart import (
    PixArtAlphaImageGenerator,
    PixArtImageGenerator,
    PixArtSigmaImageGenerator,
    TinyPixArtImageGenerator,
)

ImageGeneratorRegistry: Registry = Registry("image_generator")
ImageGeneratorRegistry.register(
    PixArtAlphaImageGenerator, name="PixArtAlphaImageGenerator"
)
ImageGeneratorRegistry.register(
    PixArtSigmaImageGenerator, name="PixArtSigmaImageGenerator"
)
ImageGeneratorRegistry.register(
    TinyPixArtImageGenerator, name="TinyPixArtImageGenerator"
)


def get_image_generator_type(name: str) -> type[ImageGenerator]:
    return ImageGeneratorRegistry.get(name)


def get_image_generator_type_from_config(config: dict[str, Any]):
    return get_image_generator_type(config["image_generator"])


from .flux import FluxImageGenerator, TinyFluxImageGenerator

ImageGeneratorRegistry.register(FluxImageGenerator, name="FluxImageGenerator")
ImageGeneratorRegistry.register(
    TinyFluxImageGenerator, name="TinyFluxImageGenerator"
)

__all__ = [
    "ImageGenerator",
    "ImageGeneratorRegistry",
    "PixArtImageGenerator",
    "PixArtAlphaImageGenerator",
    "PixArtSigmaImageGenerator",
    "get_image_generator_type",
    "get_image_generator_type_from_config",
]
