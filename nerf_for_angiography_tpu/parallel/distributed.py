"""Multi-host (multi-process) initialization and input sharding.

The reference is single-process, single-GPU (SURVEY.md §2: the only device
selection is ``cuda:0`` at run_nerf_acc.py:23). The TPU-native scale-out
plan (SURVEY.md §5 "distributed backend") is: gradient ``psum`` over ICI
inside a pod slice, **DCN only for the multi-host input pipeline and
checkpoint writes**. This module is the DCN half:

* ``initialize_multihost()`` — one call per process wraps
  ``jax.distributed.initialize``; afterwards ``jax.devices()`` is GLOBAL
  (all hosts' chips) and ``parallel.create_mesh()`` spans the fleet, so
  the existing jit-ed train step needs NO changes — the mean over the
  globally-sharded loss still lowers to one ``psum``, now riding
  ICI-within-slice / DCN-across-slices as the mesh dictates.
* ``shard_process_local()`` — each host feeds ONLY its local slice of the
  global ray batch (the input pipeline never moves rays over DCN;
  ``jax.make_array_from_process_local_data`` assembles the global array
  view from per-host shards).
* ``is_coordinator()`` — gate for host-side artifact writes (checkpoints,
  VTK exports, TensorBoard): exactly one writer, the SURVEY plan's
  "checkpoint writes over DCN" reduced to process-0-writes.

Hardware note: this container has one TPU chip and one host, so multi-host
execution is validated the same way multi-chip is — on CPU.
``tests/test_distributed.py`` spawns 2 real processes (Gloo-backed CPU
collectives) and pins global-device visibility, cross-process gradient
reduction equality against the single-process value, and single-writer
gating.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_multihost",
    "is_coordinator",
    "shard_process_local",
    "process_local_slice",
]


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Join the multi-host fleet. Call once per process, BEFORE any jax op.

    With no arguments, defers to jax's own cluster auto-detection (TPU pod
    environments set everything via metadata; GKE/Slurm via env vars). The
    explicit arguments exist for CPU smoke tests and bare-metal setups —
    they mirror ``jax.distributed.initialize``. Env fallbacks:
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def is_coordinator() -> bool:
    """True on exactly one process — the artifact writer (checkpoints,
    VTK/TensorBoard exports). Single-process runs are trivially it."""
    return jax.process_index() == 0


def process_local_slice(n_global: int) -> slice:
    """The contiguous slice of a leading-axis-sharded global array this
    process is responsible for feeding. Requires the per-process share to
    be equal (pad the batch with ``parallel.pad_to_multiple`` first)."""
    np_ = jax.process_count()
    if n_global % np_:
        raise ValueError(
            f"global batch {n_global} does not divide over {np_} processes"
        )
    per = n_global // np_
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_process_local(tree, mesh: Mesh, axis: str = "data"):
    """Assemble global leading-axis-sharded arrays from PROCESS-LOCAL
    shards: each host passes only its own slice (shape = global/processes
    on the leading axis); no ray data crosses DCN. The single-process case
    degenerates to ``parallel.shard_leading_axis`` exactly.

    Mirrors the reference's host-side pandas batch feed (run_nerf_acc.py:
    277) scaled out: each host samples/loads its own rays.
    """
    sh = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(put, tree)
