"""Device mesh + sharding rules.

The reference's entire parallelism story is single-process
``torch.nn.DataParallel`` (reference: ``visualbert/models/model_wrapper.py:146``)
— replicate the module, scatter the batch, gather losses each step. The
TPU-native equivalent is ONE pjit-compiled program over a
``jax.sharding.Mesh`` with two axes:

  * ``data``  — batch dimension, gradients all-reduced by XLA over ICI.
  * ``model`` — tensor-parallel axis for the encoder matmuls (attention heads
    and FFN hidden dim), unused (size 1) for BERT-base parity runs but wired
    so larger configs TP-shard with no code change.

Weights carry *logical* axis names (flax ``nn.with_partitioning``); the rules
below map logical names to mesh axes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Logical axis name → mesh axis (or None = replicated).
LOGICAL_AXIS_RULES = (
    ("batch", "data"),
    ("embed", None),          # hidden size stays replicated (BERT-base is small)
    ("stack", None),          # fused q/k/v stack axis
    ("heads", "model"),       # attention heads TP-sharded
    ("kv", None),             # per-head dim
    ("mlp", "model"),         # FFN hidden dim TP-sharded
    ("vocab", "model"),       # output vocab projection TP-sharded
    ("visual_in", None),
    ("pos", None),
    ("types", None),
    ("classes", None),
    ("layers", None),         # scan-stacked layer axis
    ("seq", None),            # sequence axis (room for SP later)
)


def create_mesh(
    mesh_shape: Tuple[int, int] = (1, 1),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. mesh_shape=(d, m) must satisfy d*m == n_devices."""
    if devices is None:
        devices = jax.devices()
    d, m = mesh_shape
    n = len(devices)
    if d * m != n:
        # Fall back: put everything on data axis.
        d, m = n, 1
    dev_array = np.asarray(devices).reshape(d, m)
    return Mesh(dev_array, ("data", "model"))


def logical_to_mesh_spec(logical_axes: Tuple[Optional[str], ...]) -> P:
    """Translate a tuple of logical axis names to a PartitionSpec."""
    rules = dict(LOGICAL_AXIS_RULES)
    return P(*[rules.get(a, None) if a is not None else None for a in logical_axes])


def param_partition_spec(params) -> object:
    """PartitionSpec tree for a flax param tree with nn.Partitioned leaves."""

    def spec_of(leaf):
        if isinstance(leaf, nn.Partitioned):
            return logical_to_mesh_spec(leaf.names)
        return P()

    return jax.tree.map(
        spec_of, params, is_leaf=lambda x: isinstance(x, nn.Partitioned)
    )


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh according to its logical metadata."""
    specs = param_partition_spec(params)

    def place(leaf, spec):
        arr = leaf.value if isinstance(leaf, nn.Partitioned) else leaf
        sharded = jax.device_put(arr, NamedSharding(mesh, spec))
        if isinstance(leaf, nn.Partitioned):
            return leaf.replace_boxed(sharded)
        return sharded

    return jax.tree.map(
        place, params, specs, is_leaf=lambda x: isinstance(x, nn.Partitioned)
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P("data"))
