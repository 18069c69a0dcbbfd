"""Device mesh + sharding helpers.

The reference scales with DDP/DataParallel over NCCL (train_first.py:49-50,
train_second.py:35-40 — the latter documented broken for DDP). Here
parallelism is declarative: a ('data', 'model') Mesh; batches sharded over
'data' (pure data parallelism riding ICI), and the wide transformer matmuls
(PL-BERT FFN, denoiser mapping/FFN) sharded over 'model' (tensor
parallelism), with XLA inserting the psum/all-gather collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    mp = model_parallel if n % model_parallel == 0 else 1
    arr = np.asarray(devs).reshape(n // mp, mp)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_pspec(path: str, x) -> P:
    """Tensor-parallel layout rule for parameter arrays.

    Wide 2D kernels are sharded over the 'model' axis: column-parallel when
    the output dim is wide, row-parallel when the input dim is wide (the
    Megatron pattern); everything else is replicated. XLA/GSPMD propagates
    and inserts collectives.
    """
    if hasattr(x, "ndim") and x.ndim == 2:
        rows, cols = x.shape
        if cols >= 1024:
            return P(None, "model")
        if rows >= 1024:
            return P("model", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh per param_pspec.

    The rule is shape-based, so it applies unchanged to optimizer moments
    (AdamW mu/nu mirror the param shapes; scalar counts replicate)."""

    def place(path, x):
        spec = param_pspec(jax.tree_util.keystr(path), x)
        # fall back to replication if the axis doesn't divide evenly
        try:
            if spec != P():
                axis = 0 if spec[0] == "model" else 1
                if x.shape[axis] % mesh.shape["model"] != 0:
                    spec = P()
        except Exception:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState on the mesh in-place: params and optimizer moments
    tensor-parallel per param_pspec, auxiliary collections (BN stats,
    spectral-norm u vectors) replicated. This is the whole distribution
    story for the trainers — batches arrive P('data')-sharded, XLA/GSPMD
    inserts the psum grad reductions the reference needed DDP/DataParallel
    for (train_first.py:49-50, train_second.py:35-40)."""
    state.params = shard_params(state.params, mesh)
    state.opt_states = shard_params(state.opt_states, mesh)
    state.extras = jax.device_put(state.extras, replicated(mesh))
    return state


def place_batch(tree, mesh: Optional[Mesh]):
    """Shard per-sample arrays over the 'data' axis (host numpy → device).

    Single-host: a plain sharded device_put. Multi-host (pod slices,
    SURVEY.md §7.1): each process holds only ITS batch shard on the host —
    `jax.make_array_from_process_local_data` assembles the logical global
    array from the per-process pieces without any cross-host gather of the
    raw data (each host feeds its local devices; the GLOBAL batch dim is
    process_count × local batch)."""
    if mesh is None:
        return tree
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def process_shard(n_items: int) -> slice:
    """This process's contiguous slice of a dataset/file list (per-host data
    sharding for multi-host training; every host must see a DIFFERENT slice
    so the global batch is disjoint). Deterministic in process_index, covers
    all items across processes, balanced to ±1."""
    pc, pi = jax.process_count(), jax.process_index()
    base, rem = divmod(n_items, pc)
    start = pi * base + min(pi, rem)
    return slice(start, start + base + (1 if pi < rem else 0))
