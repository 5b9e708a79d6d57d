"""Fast dropout masks from the on-chip PRNG (reference dropout sites:
pytorch_pretrained_bert/modeling.py:161,279,316 — nn.Dropout on hidden
states).

XLA's stock dropout lowering materializes u32 random bits for every element
(4 bytes/elt), relayouts them (the rng-bit-generator's {2,0,1} layout never
matches the consumer), and compares into a pred array — three HBM round
trips per site, ~0.23 ms at BERT-base bench shapes. This kernel writes the
mask directly from the hardware PRNG — int8 ``{0, 1}`` for ``fast_dropout``
(half the HBM bytes; the 1/keep rescale rides the consumer's fusion
epilogue) or a ``{0, 1/(1-rate)}`` float multiplier via ``dropout_mask`` —
one output write, no intermediate bits. The caller multiplies — XLA fuses
the multiply into the producer matmul's epilogue exactly like its own
select.

Distributional note: the mask bits come from the TPU PRNG (or jax threefry
on the CPU interpret path), not from the caller's jax.random key stream —
dropout only needs i.i.d. Bernoulli noise per site/step, which the
``seed`` scalar (folded from the layer RNG) provides deterministically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def keep_mask(shape, rate: float):
    """Dropout keep-mask from the already-seeded TPU PRNG.

    (A half-cost variant — u32 bitcast to two u16 lanes + 16-bit threshold
    compare — fails to compile on v5e: Mosaic supports no 16-bit vector
    comparisons, signed or unsigned. Full-width u32 compare it is.)

    Canonical copy — the attention and layer-norm kernels import this."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return bits >= threshold


def dropout_keep(seed_scalar, shape, rate: float, interpret: bool):
    """Seeded keep mask. TPU path: hardware PRNG seeded with ``seed_scalar``.
    Interpret path (CPU tests/dryrun): jax threefry — the TPU PRNG
    primitives have no CPU lowering. Same-seed determinism holds on both;
    the bit patterns differ across paths (dropout is distributional)."""
    if interpret:
        key = jax.random.PRNGKey(seed_scalar)
        return jax.random.uniform(key, shape) >= rate
    pltpu.prng_seed(seed_scalar)
    return keep_mask(shape, rate)


def _mask_kernel(seed_ref, o_ref, *, rate, interpret):
    i = pl.program_id(0)
    keep = dropout_keep(seed_ref[0] + i, o_ref.shape, rate, interpret)
    if o_ref.dtype == jnp.int8:
        o_ref[...] = keep.astype(jnp.int8)  # {0,1}; caller rescales
    else:
        o_ref[...] = jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(o_ref.dtype)


def _pick_tile(n_rows: int) -> int:
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if n_rows % t == 0:
            return t
    return n_rows


@functools.partial(jax.jit, static_argnums=(0, 1, 3))
def _mask_impl(shape, rate, seed, dtype):
    # the mask is emitted directly in the caller's shape (a [N, H] → [B, T,
    # H] reshape at T=228 is sublane-misaligned → XLA materializes a copy
    # that costs more than the mask itself); grid over the leading axis.
    if len(shape) == 2:
        n, H = shape
        TILE = _pick_tile(n)
        grid = (n // TILE,)
        block = (TILE, H)
        index = lambda i, *_: (i, 0)
    else:
        b = shape[0]
        grid = (b,)
        block = (1,) + tuple(shape[1:])
        nz = len(shape) - 1
        index = lambda i, *_, _nz=nz: (i,) + (0,) * _nz
    out = pl.pallas_call(
        functools.partial(_mask_kernel, rate=rate, interpret=_interpret()),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[],
            out_specs=pl.BlockSpec(block, index, memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        interpret=_interpret(),
    )(seed)
    return out


def dropout_mask(shape, rate: float, seed, dtype=jnp.bfloat16, mesh=None) -> jax.Array:
    """``{0, 1/(1-rate)}`` multiplier mask of ``shape``.

    seed: int32 scalar or [1] array (fold the site's RNG key into it).
    The mask is constant w.r.t. autodiff (jax treats it as an independent
    input), so ``x * mask`` has exactly nn.Dropout's gradient.

    mesh: a (data, model) ``jax.sharding.Mesh``. Required whenever the
    enclosing jit runs on >1 device: pallas_call has no GSPMD partitioning
    rule, so the kernel is dispatched through ``jax.shard_map`` — leading
    (batch) axis on ``data``, shard-decorrelated seeds, mask replicated
    along ``model`` (every model peer seeds identically). The leading dim
    must divide by the data axis (callers check and fall back).
    """
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        dd = mesh.shape.get("data", 1)
        assert shape[0] % dd == 0, (shape, dd)
        local = (shape[0] // dd,) + tuple(shape[1:])

        def body(seed_l):
            di = jax.lax.axis_index("data").astype(jnp.int32)
            # stride shard seeds apart (same constant family as the flash
            # kernel's shard decorrelation)
            s = (seed_l + di * jnp.int32(1_000_003)) * jnp.int32(65537)
            return _mask_impl(local, float(rate), s, dtype)

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(),),
            out_specs=P("data", *((None,) * (len(shape) - 1))),
            check_vma=False,
        )(seed)
    # scale block seeds apart so adjacent sites never share a bit stream
    return _mask_impl(tuple(shape), float(rate), seed * jnp.int32(65537), dtype)


def fast_dropout(x: jax.Array, rate: float, seed, mesh=None) -> jax.Array:
    """Dropout via a fused mask kernel; gradient-equivalent to nn.Dropout.

    The mask is stored as int8 {0,1} (half the HBM bytes of a bf16
    multiplier; each mask is written once and read by both the forward and
    backward multiply) and rescaled to {0, 1/keep} inside the consumer's
    fusion epilogue. ``mesh`` dispatches the mask kernel through shard_map
    on >1-device meshes (see dropout_mask)."""
    if rate <= 0.0:
        return x
    mask = dropout_mask(x.shape, rate, seed, jnp.int8, mesh=mesh)
    inv = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    m = jax.lax.stop_gradient(mask).astype(x.dtype) * inv
    return x * m
