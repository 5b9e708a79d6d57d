"""Fused residual-add + LayerNorm Pallas kernel.

The reference leans on apex ``FusedLayerNorm`` when available
(``modeling.py:158-162``) — every transformer sublayer ends with
``LayerNorm(x + residual)`` (modeling.py:271-276, 312-318). This kernel
fuses the add, the fp32 statistics and the affine into one VMEM pass, with a
custom VJP whose backward recomputes ``x+res`` from the saved inputs (only
per-row ``mu``/``rstd`` are stored extra).

Falls back to plain XLA math off-TPU (and in interpret mode numerics are
identical by construction: fp32 stats, bf16 in/out).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fwd_kernel(x_ref, r_ref, scale_ref, bias_ref, y_ref, mu_ref, rstd_ref, *, eps):
    s = x_ref[...].astype(jnp.float32) + r_ref[...].astype(jnp.float32)
    mu = jnp.mean(s, axis=-1, keepdims=True)
    d = s - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = d * rstd * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    mu_ref[...] = mu      # [TILE, 1]
    rstd_ref[...] = rstd


def _bwd_kernel(
    x_ref, r_ref, scale_ref, mu_ref, rstd_ref, dy_ref,
    dx_ref, dscale_ref, dbias_ref, *, eps,
):
    i = pl.program_id(0)
    s = x_ref[...].astype(jnp.float32) + r_ref[...].astype(jnp.float32)
    mu = mu_ref[...]      # [TILE, 1]
    rstd = rstd_ref[...]
    xhat = (s - mu) * rstd
    dy = dy_ref[...].astype(jnp.float32)

    dxhat = dy * scale_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    # parameter grads accumulate across the sequential grid
    part_scale = jnp.sum(dy * xhat, axis=0, keepdims=True)  # [1, H]
    part_bias = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dscale_ref[...] = part_scale
        dbias_ref[...] = part_bias

    @pl.when(i > 0)
    def _():
        dscale_ref[...] += part_scale
        dbias_ref[...] += part_bias


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def _pick_tile(n_rows: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if n_rows % t == 0:
            return t
    return n_rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_add_layer_norm(x, res, scale, bias, eps=1e-12):
    y, _, _ = _fwd_impl(x, res, scale, bias, eps)
    return y


def _fwd_impl(x, res, scale, bias, eps):
    orig_shape = x.shape
    H = orig_shape[-1]
    x2 = x.reshape(-1, H)
    r2 = res.reshape(-1, H)
    N = x2.shape[0]
    TILE = _pick_tile(N)
    grid = (N // TILE,)
    row = pl.BlockSpec((TILE, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    y, mu, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[row, row, vec, vec],
        out_specs=[row, stat, stat],
        out_shape=[
            jax.ShapeDtypeStruct((N, H), x.dtype),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(x2, r2, scale, bias)
    return y.reshape(orig_shape), mu, rstd


def _fused_fwd(x, res, scale, bias, eps):
    y, mu, rstd = _fwd_impl(x, res, scale, bias, eps)
    return y, (x, res, scale, mu, rstd)


def _fused_bwd(eps, residuals, dy):
    x, res, scale, mu, rstd = residuals
    orig_shape = x.shape
    H = orig_shape[-1]
    x2 = x.reshape(-1, H)
    r2 = res.reshape(-1, H)
    dy2 = dy.reshape(-1, H)
    N = x2.shape[0]
    TILE = _pick_tile(N)
    grid = (N // TILE,)
    row = pl.BlockSpec((TILE, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dx, dscale, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=grid,
        in_specs=[row, row, vec, stat, stat, row],
        out_specs=[row, acc, acc],
        out_shape=[
            jax.ShapeDtypeStruct((N, H), x.dtype),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(x2, r2, scale, mu, rstd, dy2)
    dx = dx.reshape(orig_shape)
    return dx, dx, dscale[0].astype(scale.dtype), dbias[0].astype(scale.dtype)


fused_add_layer_norm.defvjp(_fused_fwd, _fused_bwd)


def reference_add_layer_norm(x, res, scale, bias, eps=1e-12):
    """XLA fallback with identical numerics."""
    s = (x.astype(jnp.float32) + res.astype(jnp.float32))
    mu = s.mean(-1, keepdims=True)
    d = s - mu
    var = (d * d).mean(-1, keepdims=True)
    y = d * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


# ---- dropout + residual-add + LayerNorm fusion ----
# The sublayer epilogue (reference modeling.py:271-276/312-318 is
# LayerNorm(dropout(sublayer_out) + residual)) in ONE VMEM pass, with the
# dropout mask drawn from the in-kernel PRNG and regenerated in backward.

from visualbert_tpu.ops.dropout import dropout_keep as _dropout_keep


def _dfwd_kernel(seed_ref, x_ref, r_ref, scale_ref, bias_ref,
                 y_ref, mu_ref, rstd_ref, *, eps, rate, interpret=False):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _dropout_keep(seed_ref[0] + i, x.shape, rate, interpret)
        x = jnp.where(keep, x / (1.0 - rate), 0.0)
    s = x + r_ref[...].astype(jnp.float32)
    mu = jnp.mean(s, axis=-1, keepdims=True)
    d = s - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = d * rstd * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    mu_ref[...] = mu
    rstd_ref[...] = rstd


def _dbwd_kernel(seed_ref, x_ref, r_ref, scale_ref, mu_ref, rstd_ref, dy_ref,
                 dx_ref, dres_ref, dscale_ref, dbias_ref, *, eps, rate, interpret=False):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _dropout_keep(seed_ref[0] + i, x.shape, rate, interpret)
        xd = jnp.where(keep, x / (1.0 - rate), 0.0)
    else:
        xd = x
    s = xd + r_ref[...].astype(jnp.float32)
    mu = mu_ref[...]
    rstd = rstd_ref[...]
    xhat = (s - mu) * rstd
    dy = dy_ref[...].astype(jnp.float32)

    dxhat = dy * scale_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    ds = rstd * (dxhat - m1 - xhat * m2)
    dres_ref[...] = ds.astype(dres_ref.dtype)
    if rate > 0.0:
        dx = jnp.where(keep, ds / (1.0 - rate), 0.0)
    else:
        dx = ds
    dx_ref[...] = dx.astype(dx_ref.dtype)

    part_scale = jnp.sum(dy * xhat, axis=0, keepdims=True)
    part_bias = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dscale_ref[...] = part_scale
        dbias_ref[...] = part_bias

    @pl.when(i > 0)
    def _():
        dscale_ref[...] += part_scale
        dbias_ref[...] += part_bias


def _dspecs(N, H, TILE):
    row = pl.BlockSpec((TILE, H), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((1, H), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    return row, vec, stat, acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_dropout_add_layer_norm(x, res, scale, bias, seed, rate, eps=1e-12):
    """LayerNorm(dropout(x) + res); seed: int32 [1]; rate static."""
    return _dfwd_impl(x, res, scale, bias, seed, rate, eps)[0]


def _dfwd_impl(x, res, scale, bias, seed, rate, eps):
    orig_shape = x.shape
    H = orig_shape[-1]
    x2 = x.reshape(-1, H)
    r2 = res.reshape(-1, H)
    N = x2.shape[0]
    TILE = _pick_tile(N)
    row, vec, stat, _ = _dspecs(N, H, TILE)
    y, mu, rstd = pl.pallas_call(
        functools.partial(_dfwd_kernel, eps=eps, rate=rate, interpret=_interpret()),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // TILE,),
            in_specs=[row, row, vec, vec],
            out_specs=[row, stat, stat],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((N, H), x.dtype),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(seed, x2, r2, scale, bias)
    return y.reshape(orig_shape), mu, rstd


def _dfused_fwd(x, res, scale, bias, seed, rate, eps):
    y, mu, rstd = _dfwd_impl(x, res, scale, bias, seed, rate, eps)
    return y, (x, res, scale, seed, mu, rstd)


def _dfused_bwd(rate, eps, residuals, dy):
    x, res, scale, seed, mu, rstd = residuals
    orig_shape = x.shape
    H = orig_shape[-1]
    x2 = x.reshape(-1, H)
    r2 = res.reshape(-1, H)
    dy2 = dy.reshape(-1, H)
    N = x2.shape[0]
    TILE = _pick_tile(N)
    row, vec, stat, acc = _dspecs(N, H, TILE)
    dx, dres, dscale, dbias = pl.pallas_call(
        functools.partial(_dbwd_kernel, eps=eps, rate=rate, interpret=_interpret()),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // TILE,),
            in_specs=[row, row, vec, stat, stat, row],
            out_specs=[row, row, acc, acc],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((N, H), x.dtype),
            jax.ShapeDtypeStruct((N, H), res.dtype),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(seed, x2, r2, scale, mu, rstd, dy2)
    import numpy as _np

    dseed = _np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (dx.reshape(orig_shape), dres.reshape(orig_shape),
            dscale[0].astype(scale.dtype), dbias[0].astype(scale.dtype), dseed)


fused_dropout_add_layer_norm.defvjp(_dfused_fwd, _dfused_bwd)
