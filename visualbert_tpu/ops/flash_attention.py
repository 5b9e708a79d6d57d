"""Fused multi-head attention Pallas kernel (the reference's hot loop —
``BertSelfAttention``, modeling.py:231-261 — rebuilt for the MXU).

VisualBERT sequences are short (text ≤128 + 36..300 regions ⇒ T ≤ ~512), so
ALL heads' K/V for one batch element fit in VMEM and no online-softmax
tiling is needed. The win over the XLA einsum path is memory + fusion:

  * forward fuses  QKᵀ → bias add → fp32 softmax → dropout → PV  in VMEM;
    the [T, T] probability matrices never touch HBM;
  * the custom VJP *recomputes* probabilities (and regenerates the identical
    dropout mask from the same per-(batch, head) PRNG seed) in the backward
    kernel, so nothing but q/k/v/dO is read back — the activation-memory
    profile of flash attention without its complexity at these lengths.

Grid is (B,): one program per batch element, statically unrolled over heads
(fewer, larger DMAs — ~20% faster than a (B, H) grid at BERT-base shapes).
Kernel layout is [B, H, T, D] (the wrapper transposes from the projection's
[B, T, H, D]; XLA fuses those transposes into neighbouring ops). Numerics
match the unfused path: fp32 scores, additive ``(1-mask)·-10000`` bias, fp32
softmax, probabilities cast to bf16 before the PV matmul.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from visualbert_tpu.ops.dropout import dropout_keep as _dropout_keep


LOG2E = 1.4426950408889634


# Heads per group for the packed kernels' VPU stages. Both directions
# generate dropout in groups of this size with group-salted seeds (forward
# and backward MUST regenerate identical masks). 12 = full-H for bert-base:
# fits since the Trainer raised the scoped-VMEM budget to 32 MB (under the
# stock 16 MB, full-H overflows and 6 was the ceiling).
_BWD_GROUP = 12


def _dropout_keep_grouped(seed0, b, n_heads, shape_t, rate, interpret):
    """[H, T, T] keep mask assembled per _BWD_GROUP of heads, matching the
    seeds the grouped backward kernels use."""
    T, TK = shape_t
    parts = []
    for g0 in range(0, n_heads, _BWD_GROUP):
        G = min(_BWD_GROUP, n_heads - g0)
        parts.append(
            _dropout_keep(seed0 + b * n_heads + g0, (G, T, TK), rate, interpret)
        )
    return jnp.concatenate(parts, axis=0)


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    # exp(x) as exp2(x·log2e): exp2 is the VPU's native exponential and the
    # softmax exp is the VPU bottleneck of the forward kernel
    e = jnp.exp2((s - m) * LOG2E)
    # multiply-by-reciprocal beats VPU divide by ~25% at these shapes
    return e * pl.reciprocal(jnp.sum(e, axis=-1, keepdims=True), approx=False)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, rate, n_heads, interpret=False):
    b = pl.program_id(0)
    bias = bias_ref[b]  # [T] fp32 key-side additive mask (full array in VMEM)
    for h in range(n_heads):
        q = q_ref[0, h]  # [T, D]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale + bias[None, :]
        p = _softmax_rows(s)
        if rate > 0.0:
            keep = _dropout_keep(seed_ref[0] + b * n_heads + h, p.shape, rate, interpret)
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
        o = jax.lax.dot_general(
            p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = o.astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
    dq_ref, dk_ref, dv_ref, *, scale, rate, n_heads, interpret=False,
):
    b = pl.program_id(0)
    bias = bias_ref[b]
    for h in range(n_heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale + bias[None, :]
        p = _softmax_rows(s)  # pre-dropout probs, fp32

        if rate > 0.0:
            keep = _dropout_keep(seed_ref[0] + b * n_heads + h, p.shape, rate, interpret)
            p_d = jnp.where(keep, p / (1.0 - rate), 0.0)
        else:
            p_d = p

        # All backward matmuls take bf16 OPERANDS with fp32 accumulation —
        # fp32 operands would run the MXU in its multi-pass fp32 mode (a
        # fraction of bf16 rate) and dominated the backward kernel; bf16
        # operands match the XLA path's einsum-backward numerics.
        # dV = P_dᵀ dO
        dv = jax.lax.dot_general(
            p_d.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dP_d = dO Vᵀ ; undo dropout; softmax backward vs pre-dropout P
        dp_d = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            dp = jnp.where(keep, dp_d / (1.0 - rate), 0.0)
        else:
            dp = dp_d
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _specs(B, T, H, D):
    # arrays are [B, H, T, D]; index maps receive the scalar-prefetch ref as
    # a trailing arg. The [B, T] bias is small — whole array in VMEM.
    qkv = pl.BlockSpec((1, H, T, D), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    bias = pl.BlockSpec(memory_space=pltpu.VMEM)
    return qkv, bias


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash(q, k, v, key_bias, rate, seed):
    return _flash_fwd_impl(q, k, v, key_bias, rate, seed)


def _flash_fwd_impl(q, k, v, key_bias, rate, seed):
    B, H, T, D = q.shape
    qkv_spec, bias_spec = _specs(B, T, H, D)
    scale = 1.0 / (D ** 0.5)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate, n_heads=H, interpret=_interpret()),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=qkv_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(seed, q, k, v, key_bias)
    return out


def _flash_fwd(q, k, v, key_bias, rate, seed):
    out = _flash_fwd_impl(q, k, v, key_bias, rate, seed)
    return out, (q, k, v, key_bias, seed)


def _flash_bwd(rate, residuals, do):
    q, k, v, key_bias, seed = residuals
    B, H, T, D = q.shape
    qkv_spec, bias_spec = _specs(B, T, H, D)
    scale = 1.0 / (D ** 0.5)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate, n_heads=H, interpret=_interpret()),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, qkv_spec],
            out_specs=[qkv_spec, qkv_spec, qkv_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, T, D), v.dtype),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(seed, q, k, v, key_bias, do)
    # bias derives from an integer mask (no grads wanted); seed is int32 →
    # its cotangent type is float0
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, jnp.zeros_like(key_bias), dseed


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Packed-QKV variant: consumes the QKV projection in its MATMUL-NATURAL layout
# [B, T, H·3·D] (one [E, H·3·D] matmul — full-width MXU tiles) and emits
# [B, T, H·D] (which feeds the output projection as a plain [HD, E] matmul).
#
# Why: producing [B, 3, H, T, D] for the heads-major kernel forces XLA into
# 3·H tiny [T, E]×[E, D=64] matmuls (half-empty 128-lane tiles, ~48% MXU) plus
# a ~100 MB relayout copy ("squeeze", ~7.5 ms/step at BERT-base bs=96). Here
# the per-head [T, D] tiles are carved out INSIDE the kernel by static lane
# slices of the VMEM block (cheap), so both neighbouring matmuls run at full
# MXU width. Numerics identical to the heads-major kernel at dropout 0; with
# dropout active the masks differ (this kernel draws bits in _BWD_GROUP-head
# blocks, the heads-major kernel per head — same distribution, different
# streams).
#
# The feature axis is packed HEAD-MAJOR — [h₀(q,k,v), h₁(q,k,v), …], each
# block D wide — so a tensor-parallel split of the feature axis hands every
# shard complete heads, and GSPMD can propagate the kernel's "heads" sharding
# through the reshape. Under a >1-device mesh the pallas_call (which has no
# GSPMD partitioning rule) is wrapped in jax.shard_map over (data, model)
# with per-shard head counts and shard-decorrelated dropout seeds.
# ---------------------------------------------------------------------------


def _packed_fwd_kernel(seed_ref, qkv_ref, bias_ref, qb_ref, o_ref,
                       stats_ref=None, *, scale, rate, n_heads, d,
                       interpret=False):
    # MXU stages (QKᵀ, PV) loop over heads — the per-head [T, D] tiles are
    # static lane slices of the packed VMEM block. VPU stages (softmax,
    # dropout) run ONCE over the STACKED [H, T, T] scores: batching the heads
    # amortizes per-op dispatch, and the 3D stack keeps every head's [T, T]
    # tile sublane-aligned (a 2D [H·T, T] concat at T=228 puts every other
    # head at a 4-sublane offset → Mosaic relayout shifts on each block).
    #
    # Softmax runs in the base-2 domain (t = s·scale·log2e + bias·log2e;
    # p = exp2(t − max t)·recip(Σ)) and the per-row (max, recip-sum) pair is
    # written to ``stats_ref`` [H, T, 2] so the backward regenerates p with
    # one fma + exp2 + mul — no cross-lane max/sum reductions.
    b = pl.program_id(0)
    bias2 = bias_ref[b] * LOG2E  # [T]
    # deferred QKV projection bias: adding it here (instead of in the
    # producing matmul's epilogue) lets the backward kernel emit d_bias
    # directly, erasing XLA's standalone [F] reduce that re-reads the whole
    # dQKV tensor from HBM (ref bias semantics: modeling.py:207-217)
    x = qkv_ref[0] + qb_ref[...][None, :]  # [T, H·3·D]
    T = x.shape[0]
    c1 = scale * LOG2E
    s_all = []
    for h in range(n_heads):
        q = x[:, (3 * h + 0) * d:(3 * h + 1) * d]
        k = x[:, (3 * h + 1) * d:(3 * h + 2) * d]
        s_all.append(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ))
    t = jnp.stack(s_all) * c1 + bias2[None, None, :]  # [H, T, T]
    m2 = jnp.max(t, axis=-1, keepdims=True)
    e = jnp.exp2(t - m2)
    ssum = jnp.sum(e, axis=-1, keepdims=True)
    p = e * pl.reciprocal(ssum, approx=False)
    # single combined stat m2' = m2 + log2(Σe): the backward reconstructs
    # p = exp2(t − m2') with ONE exp2 and no per-element normalize multiply.
    # Layout [H, T] (lanes = T): a [T, H] layout pads its H=12 lanes to 128
    # (10× HBM bloat, ~11 MB/layer each way); the [T, 1]→[T] squeeze here
    # and the [G, T]→[G, T, 1] view in the backward are cheap relayouts.
    if stats_ref is not None:
        m2p = m2 + jnp.log2(ssum)  # [H, T, 1]
        stats_ref[0] = m2p[:, :, 0]
    if rate > 0.0:
        keep = _dropout_keep_grouped(
            seed_ref[0], b, n_heads, (T, p.shape[-1]), rate, interpret
        )
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    p = p.astype(x.dtype)
    for h in range(n_heads):
        v = x[:, (3 * h + 2) * d:(3 * h + 3) * d]
        o = jax.lax.dot_general(
            p[h], v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


def _packed_bwd_kernel(
    seed_ref, qkv_ref, bias_ref, qb_ref, do_ref, o_ref, stats_ref,
    dqkv_ref, db_ref,
    *, scale, rate, n_heads, d, interpret=False
):
    # Same head-batched VPU structure as the forward (see _packed_fwd_kernel).
    # The VPU is this kernel's bottleneck, so the softmax regeneration leans
    # on the forward's saved stats: p = exp2(t − m2)·r is one fma + exp2 +
    # mul per element — no cross-lane max/sum reductions. The delta identity
    # Σₖ dPₖ·Pₖ = row-wise dO·O uses the forward OUTPUT passed in ``o_ref``
    # (no PV recompute matmul), and ·scale is applied to the small [T, D]
    # dq/dk outputs instead of the [G, T, T] ds. All matmuls take bf16
    # operands with fp32 accumulation — fp32 operands would run the MXU in
    # its multi-pass fp32 mode; bf16 matches the XLA einsum-backward path.
    # Heads are processed in groups of _BWD_GROUP (full-H at bert-base under
    # the 32 MB scoped-VMEM budget; see the constant's comment).
    b = pl.program_id(0)
    bias2 = bias_ref[b] * LOG2E
    x = qkv_ref[0] + qb_ref[...][None, :]  # deferred QKV bias (see fwd)
    do_all = do_ref[0]  # [T, H·D]
    o_all = o_ref[0]    # [T, H·D]
    T = x.shape[0]
    c1 = scale * LOG2E
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    for g0 in range(0, n_heads, _BWD_GROUP):
        heads = range(g0, min(g0 + _BWD_GROUP, n_heads))
        G = len(heads)
        s_all = [
            jax.lax.dot_general(
                x[:, (3 * h + 0) * d:(3 * h + 1) * d],
                x[:, (3 * h + 1) * d:(3 * h + 2) * d],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            for h in heads
        ]
        t = jnp.stack(s_all) * c1 + bias2[None, None, :]
        m2p = stats_ref[0, g0:g0 + G][:, :, None]  # [G, T, 1]
        p = jnp.exp2(t - m2p)  # [G, T, T] pre-dropout probs, fp32
        if rate > 0.0:
            keep = _dropout_keep(
                seed_ref[0] + b * n_heads + g0, p.shape, rate, interpret
            )
            p_d16 = jnp.where(keep, p * inv, 0.0).astype(x.dtype)
        else:
            keep = None
            p_d16 = p.astype(x.dtype)

        dp_all = []
        delta_all = []
        for j, h in enumerate(heads):
            v = x[:, (3 * h + 2) * d:(3 * h + 3) * d]
            do = do_all[:, h * d:(h + 1) * d]
            # dV = P_dᵀ dO
            dv = jax.lax.dot_general(
                p_d16[j], do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_ref[0, :, (3 * h + 2) * d:(3 * h + 3) * d] = dv.astype(dqkv_ref.dtype)
            # dP_d = dO Vᵀ
            dp_all.append(jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ))
            # δ = Σₖ dPₖ Pₖ = row-wise dO·O (O is the saved forward output)
            o = o_all[:, h * d:(h + 1) * d].astype(jnp.float32)
            delta_all.append(
                jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)
            )
        dp_d = jnp.stack(dp_all)      # [G, T, T]
        delta = jnp.stack(delta_all)  # [G, T, 1]
        if rate > 0.0:
            dp = jnp.where(keep, dp_d * inv, 0.0)
        else:
            dp = dp_d
        ds = (p * (dp - delta)).astype(x.dtype)  # [G, T, T]; ·scale on dq/dk

        for j, h in enumerate(heads):
            q = x[:, (3 * h + 0) * d:(3 * h + 1) * d]
            k = x[:, (3 * h + 1) * d:(3 * h + 2) * d]
            ds_h = ds[j]
            dq = jax.lax.dot_general(
                ds_h, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dk = jax.lax.dot_general(
                ds_h, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dqkv_ref[0, :, (3 * h + 0) * d:(3 * h + 1) * d] = (dq * scale).astype(dqkv_ref.dtype)
            dqkv_ref[0, :, (3 * h + 1) * d:(3 * h + 2) * d] = (dk * scale).astype(dqkv_ref.dtype)

    # per-batch partial of the QKV-bias gradient: Σ_t dqkv[t, :]. The dqkv
    # block is still resident in VMEM, so this costs one VPU pass — the
    # alternative (XLA reducing the [B, T, F] dqkv after the fact) re-reads
    # ~100 MB/layer from HBM. Final Σ_b happens outside on [B, F].
    db_ref[0, 0] = jnp.sum(dqkv_ref[0].astype(jnp.float32), axis=0)


# --- save-probs variant: the forward additionally writes the pre-dropout
# probability tensor [B, H, T, T] (bf16) to HBM; the backward reads it back
# instead of recomputing QKᵀ + softmax (the exp recompute is the VPU
# bottleneck of the backward kernel). Costs ~2·H·T² bytes/row of HBM; pays
# when the VPU is the constraint, loses when HBM is. Config-gated.

def _packed_fwd_sp_kernel(seed_ref, qkv_ref, bias_ref, o_ref, p_ref,
                          *, scale, rate, n_heads, d, interpret=False):
    # head-batched VPU stages — see _packed_fwd_kernel
    b = pl.program_id(0)
    bias = bias_ref[b]
    x = qkv_ref[0]
    T = x.shape[0]
    s_all = []
    for h in range(n_heads):
        q = x[:, (3 * h + 0) * d:(3 * h + 1) * d]
        k = x[:, (3 * h + 1) * d:(3 * h + 2) * d]
        s_all.append(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ))
    s = jnp.stack(s_all) * scale + bias[None, None, :]
    p = _softmax_rows(s)  # [H, T, T]
    p_ref[0] = p.astype(p_ref.dtype)  # pre-dropout
    if rate > 0.0:
        keep = _dropout_keep_grouped(
            seed_ref[0], b, n_heads, (T, p.shape[-1]), rate, interpret
        )
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    p = p.astype(x.dtype)
    for h in range(n_heads):
        v = x[:, (3 * h + 2) * d:(3 * h + 3) * d]
        o = jax.lax.dot_general(
            p[h], v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


def _packed_bwd_sp_kernel(seed_ref, qkv_ref, p_ref, do_ref, o_ref, dqkv_ref,
                          *, scale, rate, n_heads, d, interpret=False):
    # as _packed_bwd_kernel but reads the saved pre-dropout probs instead of
    # recomputing QKᵀ + softmax; same _BWD_GROUP head grouping + seeding.
    # δ = Σₖ dPₖ·Pₖ comes from the saved forward OUTPUT (row-wise dO·O), not
    # a per-head P·V recompute matmul — same identity the stats kernel uses
    b = pl.program_id(0)
    x = qkv_ref[0]
    do_all = do_ref[0]
    o_all = o_ref[0]
    T = x.shape[0]

    for g0 in range(0, n_heads, _BWD_GROUP):
        heads = range(g0, min(g0 + _BWD_GROUP, n_heads))
        G = len(heads)
        p = p_ref[0, g0:g0 + G].astype(jnp.float32)  # [G, T, T]
        if rate > 0.0:
            keep = _dropout_keep(
                seed_ref[0] + b * n_heads + g0, p.shape, rate, interpret
            )
            p_d = jnp.where(keep, p / (1.0 - rate), 0.0)
        else:
            keep = None
            p_d = p
        p_d16 = p_d.astype(x.dtype)

        dp_all = []
        delta_all = []
        for j, h in enumerate(heads):
            v = x[:, (3 * h + 2) * d:(3 * h + 3) * d]
            do = do_all[:, h * d:(h + 1) * d]
            dv = jax.lax.dot_general(
                p_d16[j], do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_ref[0, :, (3 * h + 2) * d:(3 * h + 3) * d] = dv.astype(dqkv_ref.dtype)
            dp_all.append(jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ))
            o = o_all[:, h * d:(h + 1) * d].astype(jnp.float32)
            delta_all.append(jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True))
        dp_d = jnp.stack(dp_all)
        delta = jnp.stack(delta_all)
        if rate > 0.0:
            dp = jnp.where(keep, dp_d / (1.0 - rate), 0.0)
        else:
            dp = dp_d
        ds = ((p * (dp - delta)) * scale).astype(x.dtype)

        for j, h in enumerate(heads):
            q = x[:, (3 * h + 0) * d:(3 * h + 1) * d]
            k = x[:, (3 * h + 1) * d:(3 * h + 2) * d]
            ds_h = ds[j]
            dq = jax.lax.dot_general(
                ds_h, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dk = jax.lax.dot_general(
                ds_h, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dqkv_ref[0, :, (3 * h + 0) * d:(3 * h + 1) * d] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[0, :, (3 * h + 1) * d:(3 * h + 2) * d] = dk.astype(dqkv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _flash_packed_sp(qkv, key_bias, rate, n_heads, d, seed):
    out, _ = _flash_packed_sp_fwd_impl(qkv, key_bias, rate, n_heads, d, seed)
    return out


def _flash_packed_sp_fwd_impl(qkv, key_bias, rate, n_heads, d, seed):
    B, T, F = qkv.shape
    in_spec = pl.BlockSpec((1, T, F), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, T, F // 3), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, n_heads, T, T), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    scale = 1.0 / (d ** 0.5)
    out, probs = pl.pallas_call(
        functools.partial(
            _packed_fwd_sp_kernel, scale=scale, rate=rate, n_heads=n_heads, d=d,
            interpret=_interpret(),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[in_spec, bias_spec],
            out_specs=[out_spec, p_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, T, F // 3), qkv.dtype),
            jax.ShapeDtypeStruct((B, n_heads, T, T), jnp.bfloat16),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(seed, qkv, key_bias)
    return out, probs


def _flash_packed_sp_fwd(qkv, key_bias, rate, n_heads, d, seed):
    out, probs = _flash_packed_sp_fwd_impl(qkv, key_bias, rate, n_heads, d, seed)
    return out, (qkv, probs, seed, out)


def _flash_packed_sp_bwd(rate, n_heads, d, residuals, do):
    qkv, probs, seed, out = residuals
    B, T, F = qkv.shape
    in_spec = pl.BlockSpec((1, T, F), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((1, T, F // 3), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, n_heads, T, T), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    scale = 1.0 / (d ** 0.5)
    dqkv = pl.pallas_call(
        functools.partial(
            _packed_bwd_sp_kernel, scale=scale, rate=rate, n_heads=n_heads, d=d,
            interpret=_interpret(),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[in_spec, p_spec, do_spec, do_spec],
            out_specs=in_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, F), qkv.dtype),
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(seed, qkv, probs, do, out)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dqkv, jnp.zeros((qkv.shape[0], qkv.shape[1]), jnp.float32), dseed


_flash_packed_sp.defvjp(_flash_packed_sp_fwd, _flash_packed_sp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_packed(qkv, qb, key_bias, rate, n_heads, d, seed):
    # primal (not being differentiated): skip the softmax-stats output —
    # it exists only for the backward's p regeneration
    return _flash_packed_fwd_impl(qkv, qb, key_bias, rate, n_heads, d, seed,
                                  with_stats=False)[0]


def _flash_packed_fwd_impl(qkv, qb, key_bias, rate, n_heads, d, seed,
                           with_stats=True):
    B, T, F = qkv.shape
    in_spec = pl.BlockSpec((1, T, F), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, T, F // 3), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((1, n_heads, T), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    scale = 1.0 / (d ** 0.5)
    if not with_stats:
        out = pl.pallas_call(
            functools.partial(
                _packed_fwd_kernel, scale=scale, rate=rate, n_heads=n_heads,
                d=d, interpret=_interpret(),
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B,),
                in_specs=[in_spec, bias_spec, bias_spec],
                out_specs=out_spec,
            ),
            out_shape=jax.ShapeDtypeStruct((B, T, F // 3), qkv.dtype),
            interpret=_interpret(),
            compiler_params=None if _interpret() else pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
        )(seed, qkv, key_bias, qb)
        return out, None
    return pl.pallas_call(
        functools.partial(
            _packed_fwd_kernel, scale=scale, rate=rate, n_heads=n_heads, d=d,
            interpret=_interpret(),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[in_spec, bias_spec, bias_spec],
            out_specs=[out_spec, stats_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, T, F // 3), qkv.dtype),
            jax.ShapeDtypeStruct((B, n_heads, T), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(seed, qkv, key_bias, qb)


def _flash_packed_fwd(qkv, qb, key_bias, rate, n_heads, d, seed):
    out, stats = _flash_packed_fwd_impl(qkv, qb, key_bias, rate, n_heads, d, seed)
    return out, (qkv, qb, key_bias, seed, out, stats)


def _flash_packed_bwd(rate, n_heads, d, residuals, do):
    qkv, qb, key_bias, seed, out, stats = residuals
    B, T, F = qkv.shape
    in_spec = pl.BlockSpec((1, T, F), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((1, T, F // 3), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((1, n_heads, T), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    # [B, 1, F] with a (1, 1, F) block: the trailing two block dims equal the
    # array dims, which the TPU lowering requires (a flat (1, F) block of a
    # (B, F) array does not satisfy the 8×128 divisibility rule)
    db_spec = pl.BlockSpec((1, 1, F), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
    scale = 1.0 / (d ** 0.5)
    dqkv, db_part = pl.pallas_call(
        functools.partial(
            _packed_bwd_kernel, scale=scale, rate=rate, n_heads=n_heads, d=d,
            interpret=_interpret(),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[in_spec, bias_spec, bias_spec, do_spec, do_spec, stats_spec],
            out_specs=[in_spec, db_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, T, F), qkv.dtype),
            jax.ShapeDtypeStruct((B, 1, F), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(seed, qkv, key_bias, qb, do, out, stats)
    # Σ_b of the per-batch partials; one bf16 round at the end matches the
    # precision class of the XLA reduce this replaces.
    db = jnp.sum(db_part, axis=(0, 1)).astype(qb.dtype)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dqkv, db, jnp.zeros_like(key_bias), dseed


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def flash_attention_packed(
    qkv: jax.Array,
    n_heads: int,
    bias: jax.Array,
    dropout_rate: float = 0.0,
    seed: Optional[jax.Array] = None,
    mesh=None,
    save_probs: bool = False,
    qkv_bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Fused attention over a packed QKV projection.

    qkv: [B, T, H·3·D], laid out head-major [h₀(q,k,v) | h₁(q,k,v) | …]
    (each block D wide) — the natural reshape of a fused [E, H·3·D]
    projection with the (H, 3, D) output axes in that order.
    bias: [B, 1, 1, T] or [B, T] additive key mask (0 valid / -10000 pad).
    qkv_bias: optional [H·3·D] projection bias in the same head-major
    packing, DEFERRED into the kernel: the forward adds it in VMEM and the
    backward emits its gradient directly, so XLA never re-reads the [B,T,F]
    dQKV tensor for the bias reduce. When given, ``qkv`` must be the
    bias-FREE projection output.
    mesh: a (data, model) ``jax.sharding.Mesh``. Required whenever the
    enclosing jit runs on >1 device: pallas_call has no GSPMD partitioning
    rule, so the kernel is dispatched through ``jax.shard_map`` — batch on
    ``data``, whole heads on ``model`` — with shard-decorrelated dropout.
    Returns [B, T, H·D] (heads re-packed on the feature axis).
    """
    B, T, F = qkv.shape
    assert F % (3 * n_heads) == 0, (F, n_heads)
    d = F // (3 * n_heads)
    if bias.ndim == 4:
        key_bias = bias[:, 0, 0, :].astype(jnp.float32)
    else:
        key_bias = bias.astype(jnp.float32)
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    rate = float(dropout_rate)
    if save_probs:
        # the save-probs variant has no deferred-bias kernel — fall back to
        # an eager add (autodiff then produces the bias grad the XLA way)
        if qkv_bias is not None:
            qkv = qkv + qkv_bias
        call = _flash_packed_sp
    else:
        qb = qkv_bias if qkv_bias is not None else jnp.zeros((F,), qkv.dtype)
        call = functools.partial(_flash_packed_qb, qb=qb)

    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        tp = mesh.shape.get("model", 1)
        assert n_heads % tp == 0, (n_heads, tp)
        local_heads = n_heads // tp

        if save_probs:
            def body(qkv_l, bias_l, seed_l):
                di = jax.lax.axis_index("data").astype(jnp.int32)
                mi = jax.lax.axis_index("model").astype(jnp.int32)
                # stride past every (b, h) seed used within a shard
                seed_l = seed_l + di * jnp.int32(1_000_003) + mi * jnp.int32(10_000_019)
                return call(qkv_l, bias_l, rate, local_heads, d, seed_l)

            return jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P("data", None, "model"), P("data", None), P()),
                out_specs=P("data", None, "model"),
                check_vma=False,
            )(qkv, key_bias, seed)

        # qb rides in tiled over the data axis: its cotangent is then a
        # data-sharded [n_data, F] whose Σ over rows is the transpose of the
        # broadcast_to below — XLA inserts the cross-shard reduce itself, so
        # correctness does not hinge on shard_map's replication handling of
        # unmentioned axes (check_vma=False).
        qb_t = jnp.broadcast_to(qb, (mesh.shape.get("data", 1), F))

        def body_qb(qkv_l, qb_l, bias_l, seed_l):
            di = jax.lax.axis_index("data").astype(jnp.int32)
            mi = jax.lax.axis_index("model").astype(jnp.int32)
            seed_l = seed_l + di * jnp.int32(1_000_003) + mi * jnp.int32(10_000_019)
            return _flash_packed(qkv_l, qb_l[0], bias_l, rate, local_heads, d, seed_l)

        return jax.shard_map(
            body_qb,
            mesh=mesh,
            in_specs=(P("data", None, "model"), P("data", "model"),
                      P("data", None), P()),
            out_specs=P("data", None, "model"),
            check_vma=False,
        )(qkv, qb_t, key_bias, seed)

    return call(qkv, key_bias, rate, n_heads, d, seed)


def _flash_packed_qb(qkv, key_bias, rate, n_heads, d, seed, *, qb):
    return _flash_packed(qkv, qb, key_bias, rate, n_heads, d, seed)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    dropout_rate: float = 0.0,
    seed: Optional[jax.Array] = None,
    heads_major: bool = False,
) -> jax.Array:
    """Fused attention.

    q/k/v: [B, T, H, D], or [B, H, T, D] with ``heads_major=True`` (the
    kernel's native layout — no transposes; output keeps the input layout).
    bias: [B, 1, 1, T] or [B, T] additive key mask (0 at valid keys,
    -10000 at padding — the reference's mask form).
    dropout_rate: attention-prob dropout (0 disables; static).
    seed: int32 scalar; required when dropout_rate > 0.
    """
    if heads_major:
        B, H, T, D = q.shape
    else:
        B, T, H, D = q.shape
    if bias.ndim == 4:
        key_bias = bias[:, 0, 0, :].astype(jnp.float32)
    else:
        key_bias = bias.astype(jnp.float32)

    if not heads_major:
        # [B, T, H, D] → [B, H, T, D] for lane-aligned blocks
        q, k, v = (jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v))

    # No T padding needed: each block spans the FULL (T, D) array dims, which
    # satisfies Mosaic's tiling rule for any T; internal [T, T] values are
    # padded by the compiler in-register, so arbitrary lengths (e.g. 228)
    # run at the same speed as 128-aligned ones — measured identical.

    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))

    out = _flash(q, k, v, key_bias, float(dropout_rate), seed)
    if not heads_major:
        out = jnp.transpose(out, (0, 2, 1, 3))
    return out
