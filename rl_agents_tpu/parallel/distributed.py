"""Multi-host (pod-slice) bootstrap and DCN x ICI mesh construction.

The reference scales out by respawning agents in worker *processes* with
pickled configs in and model files on disk as the parameter channel
(reference: trainer/evaluation.py:196-290, scripts/experiments.py:105-106).
The TPU-native replacement is jax's multi-controller runtime: every host
runs the same SPMD program over one global device mesh whose **outer axis
maps to DCN** (the network between hosts) and whose **inner axes map to ICI**
(the links within a slice). Weights live in HBM, replicated across the host
axis and optionally tensor-sharded within a host; the cross-host gradient
reduction is a psum over the host axis inserted by XLA — there is no file
channel and no serialization boundary.

Two entry points:

* :func:`maybe_initialize_distributed` — call once at program start; becomes
  ``jax.distributed.initialize`` when the standard rank env vars announce a
  multi-process run, and a no-op otherwise (single-process tests/bench).
* :func:`make_pod_mesh` — build the (host, *local) mesh. In a real
  multi-process run the host axis enumerates processes (so host-axis
  collectives ride DCN); in single-process testing the same topology is
  emulated by slicing the flat device list into contiguous "virtual hosts",
  which preserves the locality structure a real pod has.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

_DISTRIBUTED_INITIALIZED = False


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize the jax multi-controller runtime iff this is one process of many.

    Reads (argument overrides first, then env):

    - ``JAX_COORDINATOR_ADDRESS`` — ``host:port`` of process 0
    - ``JAX_NUM_PROCESSES`` (or legacy ``JAX_PROCESS_COUNT``) — total processes
    - ``JAX_PROCESS_ID`` — this process's rank

    Returns ``True`` if the distributed runtime is (now or already) up,
    ``False`` for a plain single-process run. Idempotent: safe to call from
    every entry point (CLI, bench, dryrun).

    Replaces the reference's ``multiprocessing.Pool`` worker bootstrap
    (reference: trainer/evaluation.py:248-290 — fresh process, config
    deserialization, model-file load); here process N simply joins the
    collective runtime and runs the same program.
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        raw = os.environ.get("JAX_NUM_PROCESSES") or os.environ.get("JAX_PROCESS_COUNT")
        num_processes = int(raw) if raw else None
    if process_id is None:
        raw = os.environ.get("JAX_PROCESS_ID")
        process_id = int(raw) if raw else None
    if not coordinator_address or not num_processes or num_processes <= 1:
        # No bootstrap env: querying the runtime is safe here — either some
        # outer launcher already initialized it (report True) or this is a
        # plain single-process run. NOTE: do NOT query before the branch
        # below; jax.process_count() initializes the XLA backend, after
        # which jax.distributed.initialize refuses to run.
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        # already initialized by an outer launcher with the same topology
        if jax.process_count() != num_processes:
            raise
    _DISTRIBUTED_INITIALIZED = True
    return True


def make_pod_mesh(axes: Sequence[str] = ("host", "dp"),
                  hosts: Optional[int] = None,
                  local_shape: Optional[Sequence[int]] = None,
                  devices: Optional[Sequence] = None) -> Mesh:
    """Build a DCN x ICI aware mesh: ``axes[0]`` is the host (DCN) axis,
    ``axes[1:]`` partition each host's local devices (ICI).

    - In a multi-process run, ``hosts`` defaults to ``jax.process_count()``
      and devices are ordered process-major, so the leading mesh axis walks
      across hosts and every collective over it rides DCN, while the inner
      axes stay within a host's ICI domain.
    - In a single process (CPU virtual devices, or one real chip), pass
      ``hosts`` explicitly to emulate the topology: the flat device list is
      sliced into ``hosts`` contiguous groups.

    ``local_shape`` gives the per-host shape of ``axes[1:]`` (default: all
    local devices on ``axes[1]``, trailing axes of size 1).
    """
    devices = list(devices if devices is not None else jax.devices())
    # process-major order: the leading axis must enumerate hosts
    devices.sort(key=lambda d: (d.process_index, d.id))
    n_proc = len({d.process_index for d in devices})
    if hosts is None:
        hosts = n_proc
    if n_proc > 1 and hosts != n_proc:
        raise ValueError(f"hosts={hosts} but {n_proc} jax processes are attached")
    if len(devices) % hosts:
        raise ValueError(f"{len(devices)} devices do not divide into {hosts} hosts")
    local = len(devices) // hosts
    n_local_axes = len(axes) - 1
    if local_shape is None:
        local_shape = (local,) + (1,) * (n_local_axes - 1) if n_local_axes else ()
    if int(np.prod(local_shape or (1,))) != local:
        raise ValueError(f"local_shape {tuple(local_shape)} != {local} devices/host")
    shape = (hosts,) + tuple(local_shape)
    return Mesh(np.asarray(devices).reshape(shape), tuple(axes))


def data_axes(mesh: Mesh, model_axes: Sequence[str] = ("tp",)) -> tuple:
    """The mesh axes a data batch shards over: every axis that is not a
    model-parallel axis. For a (host, dp, tp) pod mesh this is
    ('host', 'dp') — the batch spreads across hosts and local chips, and
    gradient reduction psums over both (DCN for host, ICI for dp)."""
    return tuple(a for a in mesh.axis_names if a not in tuple(model_axes))
