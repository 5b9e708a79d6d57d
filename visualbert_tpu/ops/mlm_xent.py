"""Fused masked-LM softmax cross-entropy over the 30522-word tied decoder.

The reference computes MLM loss as ``CrossEntropyLoss(ignore_index=-1)`` over
fp32 logits from the weight-tied decoder matmul
(``visualbert/pytorch_pretrained_bert/modeling.py:404-420,1470-1485``). The
XLA translation of that materializes the fp32 ``[N, vocab]`` logits (and
their cotangent) in HBM — ~280 MB each way per step at bench shapes, several
ms of pure HBM traffic.

This op streams the vocab dimension through VMEM in blocks with an online
logsumexp, so HBM never sees a logits tensor:

  forward:  nll[n]  = lse(x·Eᵀ + b)[n] − (x·Eᵀ + b)[n, label_n]
            argmax[n] (for the exact-match accuracy metric)
  backward: dx, dE, db from blockwise-recomputed ``p = exp(logits − lse)``,
            two kernels with grid orders chosen so each output block stays
            VMEM-resident across its accumulation loop (dx: vocab-inner;
            dE/db: rows-inner).

Numerics match the unfused path: logits are bf16×bf16 → fp32 MXU
accumulation, logsumexp in fp32; backward matmuls take bf16 operands (as XLA
does for the einsum backward). Masking/mean over ``label != -1`` stays in
JAX — the op returns per-row nll.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30  # bias for padded vocab columns: never wins max, exp → 0


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, e_ref, b_ref, lab_ref, nll_ref, lse_ref, am_ref,
                m_sc, l_sc, ll_sc, av_sc, ai_sc, *, vb, n_vb):
    j = pl.program_id(1)  # vocab block (inner)

    @pl.when(j == 0)
    def _():
        m_sc[...] = jnp.full_like(m_sc, -jnp.inf)
        l_sc[...] = jnp.zeros_like(l_sc)
        ll_sc[...] = jnp.zeros_like(ll_sc)
        av_sc[...] = jnp.full_like(av_sc, -jnp.inf)
        ai_sc[...] = jnp.zeros_like(ai_sc)

    x = x_ref[...]                   # [NB, H] bf16
    e = e_ref[...]                   # [VB, H] bf16
    logits = jax.lax.dot_general(
        x, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + b_ref[0][None, :]            # [NB, VB] fp32

    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * vb
    labels = lab_ref[...]            # [NB, 1] int32

    # label logit (each label matches in exactly one block)
    hit = cols == labels
    ll_sc[...] += jnp.sum(jnp.where(hit, logits, 0.0), axis=1, keepdims=True)

    # online logsumexp
    bm = jnp.max(logits, axis=1, keepdims=True)
    m_old = m_sc[...]
    m_new = jnp.maximum(m_old, bm)
    # exp(-inf - -inf) guard: m_old is -inf only when l is 0
    shift = jnp.where(jnp.isfinite(m_old), m_old - m_new, 0.0)
    l_sc[...] = l_sc[...] * jnp.exp(shift) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True
    )
    m_sc[...] = m_new

    # running argmax — first-max semantics via iota select (no argmax
    # lowering in Mosaic)
    big = jnp.int32(2**30)
    bi = jnp.min(jnp.where(logits == bm, cols, big), axis=1, keepdims=True)
    better = bm > av_sc[...]
    ai_sc[...] = jnp.where(better, bi, ai_sc[...])
    av_sc[...] = jnp.where(better, bm, av_sc[...])

    @pl.when(j == n_vb - 1)
    def _():
        lse = m_sc[...] + jnp.log(l_sc[...])
        nll_ref[...] = lse - ll_sc[...]
        lse_ref[...] = lse
        am_ref[...] = ai_sc[...]


def _fwd_impl(x, emb, bias, labels, *, nb, vbk):
    N, H = x.shape
    V = emb.shape[0]
    n_nb = N // nb
    n_vb = V // vbk
    grid = (n_nb, n_vb)
    x_spec = pl.BlockSpec((nb, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((vbk, H), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, vbk), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    lab_spec = pl.BlockSpec((nb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((nb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    nll, lse, am = pl.pallas_call(
        functools.partial(_fwd_kernel, vb=vbk, n_vb=n_vb),
        grid=grid,
        in_specs=[x_spec, e_spec, b_spec, lab_spec],
        out_specs=[row_spec, row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, 1), jnp.float32),
            pltpu.VMEM((nb, 1), jnp.float32),
            pltpu.VMEM((nb, 1), jnp.float32),
            pltpu.VMEM((nb, 1), jnp.float32),
            pltpu.VMEM((nb, 1), jnp.int32),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(x, emb, bias, labels)
    return nll, lse, am


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dx_kernel(x_ref, e_ref, b_ref, lab_ref, lse_ref, g_ref, dx_ref, acc_sc,
               *, vb, n_vb):
    j = pl.program_id(1)  # vocab block (inner) — dx block stays resident

    @pl.when(j == 0)
    def _():
        acc_sc[...] = jnp.zeros_like(acc_sc)

    x = x_ref[...]
    e = e_ref[...]
    logits = jax.lax.dot_general(
        x, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + b_ref[0][None, :]
    p = jnp.exp(logits - lse_ref[...])  # [NB, VB]
    cols = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + j * vb
    dlog = (p - jnp.where(cols == lab_ref[...], 1.0, 0.0)).astype(x.dtype)
    acc_sc[...] += jax.lax.dot_general(
        dlog, e, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == n_vb - 1)
    def _():
        dx_ref[...] = (acc_sc[...] * g_ref[...]).astype(dx_ref.dtype)


def _de_kernel(x_ref, e_ref, b_ref, lab_ref, lse_ref, g_ref, de_ref, db_ref,
               *, vb, n_nb):
    i = pl.program_id(1)  # row block (inner) — dE/db blocks stay resident
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        de_ref[...] = jnp.zeros_like(de_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...]
    e = e_ref[...]
    logits = jax.lax.dot_general(
        x, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + b_ref[0][None, :]
    p = jnp.exp(logits - lse_ref[...])
    cols = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + j * vb
    dlog = (p - jnp.where(cols == lab_ref[...], 1.0, 0.0)) * g_ref[...]
    db_ref[0] += jnp.sum(dlog, axis=0)
    dlog16 = dlog.astype(x.dtype)
    de_ref[...] += jax.lax.dot_general(
        dlog16, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(de_ref.dtype)


def _bwd_impl(x, emb, bias, labels, lse, g, *, nb, vbk_dx, vbk_de):
    N, H = x.shape
    V = emb.shape[0]
    lab_spec = lambda vb: pl.BlockSpec((nb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)

    # dx: grid (rows, vocab-inner)
    grid = (N // nb, V // vbk_dx)
    dx = pl.pallas_call(
        functools.partial(_dx_kernel, vb=vbk_dx, n_vb=V // vbk_dx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vbk_dx, H), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vbk_dx), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            lab_spec(vbk_dx),
            pl.BlockSpec((nb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H), x.dtype),
        scratch_shapes=[pltpu.VMEM((nb, H), jnp.float32)],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(x, emb, bias, labels, lse, g)

    # dE, db: grid (vocab, rows-inner)
    grid = (V // vbk_de, N // nb)
    de, db = pl.pallas_call(
        functools.partial(_de_kernel, vb=vbk_de, n_nb=N // nb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, H), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vbk_de, H), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vbk_de), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((vbk_de, H), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vbk_de), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V, H), jnp.float32),
            jax.ShapeDtypeStruct((1, V), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(x, emb, bias, labels, lse, g)
    return dx, de, db


# ---------------------------------------------------------------------------
# custom-vjp wrapper (padded shapes)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _mlm_nll(x, emb, bias, labels):
    nll, _, am = _mlm_nll_fwd_impl(x, emb, bias, labels)
    return nll, am


def _pick_blocks(N, V, H):
    # Large row blocks: the fwd/dx kernels re-stream the FULL embedding
    # matrix once per row block (V·H·2 bytes ≈ 47 MB at BERT-base), so the
    # row-block count is the dominant HBM cost — nb=256 streamed E 9× per
    # pass (~0.8 ms); nb=768 streams it 3×. Bounded by the fp32 [nb, vbk]
    # logits block + fp32 [nb, H] accumulator in scoped VMEM.
    nb = N
    for cand in (768, 512, 384, 256, 128, 64, 32, 16, 8):
        if cand <= N and N % cand == 0:
            nb = cand
            break
    # forward/dx vocab block: E block ×2 (double buffer) + fp32 logits block
    vbk = min(V, 1280)
    while V % vbk:
        vbk //= 2
    vbk_de = min(V, 1280)
    while V % vbk_de:
        vbk_de //= 2
    return nb, vbk, vbk_de


def _mlm_nll_fwd_impl(x, emb, bias, labels):
    N, H = x.shape
    nb, vbk, _ = _pick_blocks(N, emb.shape[0], H)
    return _fwd_impl(
        x, emb, bias, labels.reshape(N, 1).astype(jnp.int32), nb=nb, vbk=vbk
    )


def _mlm_nll_fwd(x, emb, bias, labels):
    nll, lse, am = _mlm_nll_fwd_impl(x, emb, bias, labels)
    return (nll, am), (x, emb, bias, labels, lse)


def _mlm_nll_bwd(res, cts):
    x, emb, bias, labels, lse = res
    dnll, _ = cts  # argmax is int — no cotangent
    N, H = x.shape
    nb, vbk, vbk_de = _pick_blocks(N, emb.shape[0], H)
    dx, de, db = _bwd_impl(
        x, emb, bias, labels.reshape(N, 1).astype(jnp.int32), lse,
        dnll.reshape(N, 1).astype(jnp.float32),
        nb=nb, vbk_dx=vbk, vbk_de=vbk_de,
    )
    return dx, de.astype(emb.dtype), db[0].astype(bias.dtype), None


_mlm_nll.defvjp(_mlm_nll_fwd, _mlm_nll_bwd)


def supports_mesh(n_rows: int, mesh) -> bool:
    """Whether ``mlm_xent`` can dispatch over ``mesh``: the row count must
    split evenly across all devices (rows shard over data×model). Callers
    use this single predicate to decide the unfused-einsum fallback."""
    return mesh is None or mesh.size == 1 or n_rows % mesh.size == 0


def mlm_xent(x, embedding, bias, labels, mesh=None):
    """Per-row NLL + argmax of the tied-decoder softmax, fused.

    x: [N, H] transformed hidden states (bf16/fp32)
    embedding: [V, H] tied word-embedding table (used as decoder weight)
    bias: [V] fp32 decoder bias
    labels: [N] int32 (-1 entries are computed but masked by the caller)
    mesh: a (data, model) ``jax.sharding.Mesh``. Required whenever the
    enclosing jit runs on >1 device: pallas_call has no GSPMD partitioning
    rule, so the op is dispatched through ``jax.shard_map`` — rows split
    over BOTH mesh axes (the op is batch-parallel; every device takes a
    row slab), embedding/bias replicated into each shard (shard_map's
    transpose psums their cotangents, the same all-reduce the unfused
    einsum path pays for d_embedding). N must divide by mesh.size
    (callers check and fall back to the unfused path).
    Returns (nll [N] fp32, argmax [N] int32).
    """
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        N = x.shape[0]
        assert supports_mesh(N, mesh), (N, mesh.size)
        axes = ("data", "model")
        return jax.shard_map(
            functools.partial(mlm_xent, mesh=None),
            mesh=mesh,
            in_specs=(P(axes, None), P(None, None), P(None), P(axes)),
            out_specs=(P(axes), P(axes)),
            check_vma=False,
        )(x, embedding, bias, labels)
    N, H = x.shape
    V = embedding.shape[0]
    Np = _round_up(max(N, 8), 256) if N > 8 else _round_up(N, 8)
    Vp = _round_up(V, 1280)
    xp = jnp.pad(x, ((0, Np - N), (0, 0)))
    ep = jnp.pad(embedding.astype(x.dtype), ((0, Vp - V), (0, 0)))
    bp = jnp.pad(
        bias.astype(jnp.float32), (0, Vp - V), constant_values=NEG_BIG
    ).reshape(1, Vp)
    lp = jnp.pad(jnp.maximum(labels, 0).astype(jnp.int32), (0, Np - N))
    nll, am = _mlm_nll(xp, ep, bp, lp)
    return nll[:N, 0], am[:N, 0]
