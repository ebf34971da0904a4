"""Multi-host (pod) initialization and work partitioning.

The reference's only multi-accelerator story is manual process sharding of
prompt files across GPUs (SURVEY.md §2.9, §5 — assets/docs/datasets.md):
each process is started by hand on a slice of the inputs. Here multi-host
is first-class but deliberately thin, following the standard JAX recipe:

1. every host calls :func:`initialize` (a `jax.distributed.initialize`
   wrapper that no-ops for single-process runs, so the same entry point
   works on a laptop, one chip, or a pod),
2. meshes from :func:`ecad_tpu.parallel.mesh.create_mesh` then span all
   global devices — `dp` rides DCN across hosts and ICI within them, `tp`
   stays intra-host (minor axis) by construction,
3. pleasingly-parallel tiers that shard *work items* rather than arrays
   (population evaluation over candidates, benchmark generation over
   prompt files) use :func:`host_shard` — the in-process equivalent of the
   reference's manual prompt-file splitting.

No further communication machinery is required for parity: the search
loop's only cross-host reduction is the gather of per-candidate scores,
which the on-disk artifact contract (scores.json per candidate) already
provides for free on a shared filesystem.
"""

from __future__ import annotations

import os
from typing import Sequence, TypeVar

import jax

T = TypeVar("T")


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up JAX's multi-host runtime (DCN) when running on more than
    one process; a documented no-op otherwise.

    Arguments default from the standard environment variables
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``)
    so pod launchers need no code changes. On managed TPU pod slices
    (GKE/queued resources) `jax.distributed.initialize()` auto-detects all
    three and this wrapper passes straight through.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else _env_int(
        "JAX_NUM_PROCESSES"
    )
    pid = process_id if process_id is not None else _env_int("JAX_PROCESS_ID")
    if addr is None and nproc in (None, 1):
        return  # single-process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=addr, num_processes=nproc, process_id=pid
    )


def _env_int(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def host_shard(items: Sequence[T]) -> list[T]:
    """This host's slice of a pleasingly-parallel work list (candidates,
    prompt files, megabatches), strided by process index so any length
    divides evenly up to a remainder of one item per host.

    The in-framework replacement for the reference's by-hand prompt-file
    sharding (assets/docs/datasets.md): every process runs the same CLI and
    takes every ``process_count``-th item.
    """
    return list(items[jax.process_index() :: jax.process_count()])


def is_coordinator() -> bool:
    """True on the process that should write shared artifacts (configs,
    checkpoints) when the filesystem is shared."""
    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Block until every process reaches this point (no-op single-process).

    Used by the search loop to sequence sharded offline eval against the
    completeness check and the coordinator's generation writes."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
