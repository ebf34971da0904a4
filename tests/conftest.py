"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's "no accelerator needed for schedule logic" property
(ecad has no test suite at all; see SURVEY.md §4) while letting us exercise
multi-chip sharding paths without TPU hardware.
"""

import os

# Must be set before jax is used anywhere. The environment pre-registers a
# TPU backend and forces JAX_PLATFORMS onto it, so we must overwrite (not
# setdefault) and re-assert via jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import pathlib

import pytest

# ECAD_REFERENCE_ROOT lets CI simulate the reference being unmounted
REFERENCE_ROOT = pathlib.Path(
    os.environ.get("ECAD_REFERENCE_ROOT", "/root/reference")
)
REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    """Root for golden-file artifacts (schedules/, prompts/ subdirs).

    Prefers the upstream reference checkout for maximum breadth (e.g. the
    full ~1300-file MACs sweep); falls back to the vendored in-repo subset
    (schedules/README.md) so the suite stays green with the reference
    unmounted. Tests parametrized over directories not in the vendored
    subset skip individually."""
    if REFERENCE_ROOT.exists():
        return REFERENCE_ROOT
    return REPO_ROOT
