"""Device mesh and sharding utilities.

The reference has no distributed runtime (SURVEY.md §2.9): multi-GPU use is
manual process sharding over prompt files. Here parallelism is first-class:
a `jax.sharding.Mesh` with axes

* ``dp`` — data parallel over (candidate × prompt × image) work items; the
  NSGA-II evaluation load is pleasingly parallel along this axis, and
* ``tp`` — Megatron-style tensor parallel over attention heads / MLP hidden,
  used for FLUX-scale models (12B) and high-resolution serving,

and logical-axis rules mapping the models' `with_logical_partitioning`
annotations onto the mesh. XLA inserts the (all-reduce over tp) collectives;
they ride ICI by construction since tp is the minor mesh axis.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import (  # noqa: F401  (re-exported)
    EMBED,
    HEADS,
    KV,
    LOGICAL_AXIS_RULES,
    MLP,
    SEQ,
)


def create_mesh(
    dp: int | None = None,
    tp: int = 1,
    devices: Sequence | None = None,
    sp: int = 1,
) -> Mesh:
    """dp × (sp ×) tp device mesh. ``sp`` (sequence parallel — tokens of
    the image/joint stream, logical axis SEQ) is only materialized when
    >1 so dp×tp call sites and their sharding specs are unchanged; tp
    stays minormost so its per-layer all-reduces ride the fastest ICI
    links, with sp's per-attention KV all-gathers next."""
    devs = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devs) // (tp * sp)
    if dp * tp * sp != len(devs):
        raise ValueError(
            f"dp*sp*tp={dp * sp * tp} != {len(devs)} devices"
        )
    if sp == 1:
        return Mesh(np.array(devs).reshape(dp, tp), ("dp", "tp"))
    arr = np.array(devs).reshape(dp, sp, tp)
    return Mesh(arr, ("dp", "sp", "tp"))


def param_shardings(variables_or_params: Any, mesh: Mesh):
    """Derive NamedShardings from the logical-partitioning metadata the
    models attach to their kernels."""
    specs = nn.get_partition_spec(variables_or_params)
    return nn.logical_to_mesh_sharding(specs, mesh, LOGICAL_AXIS_RULES)


def shard_params(params: Any, mesh: Mesh, like: Any = None):
    """Place (possibly boxed) params onto the mesh per their annotations.
    Returns the unboxed, sharded param tree.

    `like` supplies the partitioning metadata when `params` itself is a
    plain array tree (e.g. converted real checkpoints, models/weights.py):
    pass an abstract boxed tree from `abstract_boxed_params`."""
    shardings = param_shardings(like if like is not None else params, mesh)
    unboxed = nn.meta.unbox(params)
    unboxed_shardings = nn.meta.unbox(shardings) if _is_boxed(shardings) else shardings
    return jax.device_put(unboxed, unboxed_shardings)


def abstract_boxed_params(init_fn, *init_args) -> Any:
    """Metadata-only param tree (nn.Partitioned boxes around
    ShapeDtypeStructs) via jax.eval_shape — no weights materialized. Use as
    the `like=` argument of shard_params for checkpoint-loaded params."""
    return jax.eval_shape(init_fn, *init_args)


def _is_boxed(tree: Any) -> bool:
    return any(
        isinstance(x, nn.Partitioned)
        for x in jax.tree.leaves(
            tree, is_leaf=lambda x: isinstance(x, nn.Partitioned)
        )
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp, replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
