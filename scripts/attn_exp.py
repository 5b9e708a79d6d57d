"""Experimental variants of the packed attention kernel, microbenchmarked
against the production kernel at bench shapes (B=96, T=228, H=12, D=64).

Variants (select by name on argv; default runs all):
  base      — production kernel (ops/flash_attention.py)
  prescale  — fold scale·log2e into the q tile BEFORE the QK matmul, saving
              the [G,T,T] multiply in both fwd and bwd regen
  g6 / g3   — backward head-group size 6 / 3 instead of full-H 12
  nostack   — per-head 2D VPU stages in the backward (no [G,T,T] stacking)

Each variant is numerics-checked against base (rate=0) before timing.
Usage: python scripts/attn_exp.py [variant ...]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

B, T, H, D = 96, 228, 12, 64
F = 3 * H * D
K = 30
LOG2E = 1.4426950408889634


def timeit(fn, *args):
    import jax

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    return best


def make_variant(prescale=False, group=12, nostack=False, bb=1, fdrop=False, nomax=False, tscore=False):
    """Build a (fwd_impl, bwd_impl) pair with the requested tweaks, cloned
    from the production packed kernel (stats-carrying path, deferred bias)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from visualbert_tpu.ops.dropout import dropout_keep as _dropout_keep

    def fwd_kernel(seed_ref, qkv_ref, bias_ref, qb_ref, o_ref, stats_ref,
                   *, scale, rate, n_heads, d):
      for e_i in range(bb):
        b = pl.program_id(0) * bb + e_i
        bias2 = bias_ref[b] * LOG2E
        x = qkv_ref[e_i] + qb_ref[...][None, :]
        c1 = scale * LOG2E
        s_all = []
        for h in range(n_heads):
            q = x[:, (3 * h + 0) * d:(3 * h + 1) * d]
            k = x[:, (3 * h + 1) * d:(3 * h + 2) * d]
            if prescale:
                q = (q.astype(jnp.float32) * c1).astype(x.dtype)
            s_all.append(jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ))
        if prescale:
            t = jnp.stack(s_all) + bias2[None, None, :]
        else:
            t = jnp.stack(s_all) * c1 + bias2[None, None, :]
        if nomax:
            m2 = jnp.zeros_like(t[..., :1])
            e = jnp.exp2(t)
        else:
            m2 = jnp.max(t, axis=-1, keepdims=True)
            e = jnp.exp2(t - m2)
        ssum = jnp.sum(e, axis=-1, keepdims=True)
        p = e * pl.reciprocal(ssum, approx=False)
        m2p = m2 + jnp.log2(ssum)
        stats_ref[e_i] = m2p[:, :, 0]
        if rate > 0.0:
            parts = []
            for g0 in range(0, n_heads, group):
                G = min(group, n_heads - g0)
                parts.append(_dropout_keep(
                    seed_ref[0] + b * n_heads + g0, (G, T, t.shape[-1]), rate, False))
            keep = jnp.concatenate(parts, axis=0)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        p = p.astype(x.dtype)
        for h in range(n_heads):
            v = x[:, (3 * h + 2) * d:(3 * h + 3) * d]
            o = jax.lax.dot_general(
                p[h], v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[e_i, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)

    def bwd_kernel(seed_ref, qkv_ref, bias_ref, qb_ref, do_ref, o_ref, stats_ref,
                   dqkv_ref, db_ref, *, scale, rate, n_heads, d):
      for e_i in range(bb):
        b = pl.program_id(0) * bb + e_i
        bias2 = bias_ref[b] * LOG2E
        x = qkv_ref[e_i] + qb_ref[...][None, :]
        do_all = do_ref[e_i]
        o_all = o_ref[e_i]
        c1 = scale * LOG2E
        inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

        if nostack:
            for h in range(n_heads):
                q = x[:, (3 * h + 0) * d:(3 * h + 1) * d]
                k = x[:, (3 * h + 1) * d:(3 * h + 2) * d]
                v = x[:, (3 * h + 2) * d:(3 * h + 3) * d]
                do = do_all[:, h * d:(h + 1) * d]
                if prescale:
                    qs = (q.astype(jnp.float32) * c1).astype(x.dtype)
                    t = jax.lax.dot_general(
                        qs, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) + bias2[None, :]
                else:
                    t = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * c1 + bias2[None, :]
                m2p = stats_ref[e_i, h][:, None]
                p = jnp.exp2(t - m2p)
                if rate > 0.0:
                    keep = _dropout_keep(
                        seed_ref[0] + b * n_heads + h, (1,) + p.shape, rate, False)[0]
                    p_d16 = jnp.where(keep, p * inv, 0.0).astype(x.dtype)
                else:
                    keep = None
                    p_d16 = p.astype(x.dtype)
                dv = jax.lax.dot_general(
                    p_d16, do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dqkv_ref[e_i, :, (3 * h + 2) * d:(3 * h + 3) * d] = dv.astype(dqkv_ref.dtype)
                dp_d = jax.lax.dot_general(
                    do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
                o_h = o_all[:, h * d:(h + 1) * d].astype(jnp.float32)
                delta = jnp.sum(do.astype(jnp.float32) * o_h, axis=-1, keepdims=True)
                dp = jnp.where(keep, dp_d * inv, 0.0) if rate > 0.0 else dp_d
                ds_h = (p * (dp - delta)).astype(x.dtype)
                dq = jax.lax.dot_general(
                    ds_h, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                dk = jax.lax.dot_general(
                    ds_h, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                dqkv_ref[e_i, :, (3 * h + 0) * d:(3 * h + 1) * d] = (dq * scale).astype(dqkv_ref.dtype)
                dqkv_ref[e_i, :, (3 * h + 1) * d:(3 * h + 2) * d] = (dk * scale).astype(dqkv_ref.dtype)
            continue

        for g0 in range(0, n_heads, group):
            heads = range(g0, min(g0 + group, n_heads))
            G = len(heads)
            s_all = []
            for h in heads:
                q = x[:, (3 * h + 0) * d:(3 * h + 1) * d]
                if prescale:
                    q = (q.astype(jnp.float32) * c1).astype(x.dtype)
                s_all.append(jax.lax.dot_general(
                    q, x[:, (3 * h + 1) * d:(3 * h + 2) * d],
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                ))
            if prescale:
                t = jnp.stack(s_all) + bias2[None, None, :]
            else:
                t = jnp.stack(s_all) * c1 + bias2[None, None, :]
            m2p = stats_ref[e_i, g0:g0 + G][:, :, None]
            p = jnp.exp2(t - m2p)
            if rate > 0.0:
                keep = _dropout_keep(
                    seed_ref[0] + b * n_heads + g0, p.shape, rate, False)
                p_d16 = jnp.where(keep, p * inv, 0.0).astype(x.dtype)
            else:
                keep = None
                p_d16 = p.astype(x.dtype)

            dp_all = []
            delta_all = []
            for j, h in enumerate(heads):
                v = x[:, (3 * h + 2) * d:(3 * h + 3) * d]
                do = do_all[:, h * d:(h + 1) * d]
                dv = jax.lax.dot_general(
                    p_d16[j], do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dqkv_ref[e_i, :, (3 * h + 2) * d:(3 * h + 3) * d] = dv.astype(dqkv_ref.dtype)
                dp_all.append(jax.lax.dot_general(
                    do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                ))
                o = o_all[:, h * d:(h + 1) * d].astype(jnp.float32)
                delta_all.append(
                    jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)
                )
            dp_d = jnp.stack(dp_all)
            delta = jnp.stack(delta_all)
            if rate > 0.0 and fdrop:
                # ds = p_d*dp_d - p*delta  (p_d = keep*inv*p): one fused fma
                # chain instead of a second [G,T,T] where-select pass
                ds = (p_d16.astype(jnp.float32) * dp_d - p * delta).astype(x.dtype)
            else:
                if rate > 0.0:
                    dp = jnp.where(keep, dp_d * inv, 0.0)
                else:
                    dp = dp_d
                ds = (p * (dp - delta)).astype(x.dtype)

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
                dqkv_ref[e_i, :, (3 * h + 0) * d:(3 * h + 1) * d] = (dq * scale).astype(dqkv_ref.dtype)
                dqkv_ref[e_i, :, (3 * h + 1) * d:(3 * h + 2) * d] = (dk * scale).astype(dqkv_ref.dtype)
      db_ref[0, 0] = jnp.sum(
          dqkv_ref[...].astype(jnp.float32).reshape(bb * T, F), axis=0)

    def build(rate):
        in_spec = pl.BlockSpec((bb, T, F), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((bb, T, F // 3), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
        stats_spec = pl.BlockSpec((bb, H, T), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
        bias_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        db_spec = pl.BlockSpec((1, 1, F), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)
        scale = 1.0 / (D ** 0.5)
        NB = B // bb

        def fwd(qkv, qb, key_bias, seed):
            return pl.pallas_call(
                functools.partial(fwd_kernel, scale=scale, rate=rate, n_heads=H, d=D),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(NB,),
                    in_specs=[in_spec, bias_spec, bias_spec],
                    out_specs=[out_spec, stats_spec],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((B, T, F // 3), qkv.dtype),
                    jax.ShapeDtypeStruct((B, H, T), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
            )(seed, qkv, key_bias, qb)

        def bwd(qkv, qb, key_bias, seed, do, out, stats):
            return pl.pallas_call(
                functools.partial(bwd_kernel, scale=scale, rate=rate, n_heads=H, d=D),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(NB,),
                    in_specs=[in_spec, bias_spec, bias_spec, out_spec, out_spec, stats_spec],
                    out_specs=[in_spec, db_spec],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((B, T, F), qkv.dtype),
                    jax.ShapeDtypeStruct((NB, 1, F), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
            )(seed, qkv, key_bias, qb, do, out, stats)

        return fwd, bwd

    return build


VARIANTS = {
    "base": None,  # production kernel
    "prescale": dict(prescale=True),
    "g6": dict(group=6),
    "g3": dict(group=3),
    "nostack": dict(nostack=True),
    "prescale_nostack": dict(prescale=True, nostack=True),
    "bb2": dict(bb=2),
    "bb4": dict(bb=4),
    "bb8": dict(bb=8),
    "bb2_g6": dict(bb=2, group=6),
    "fdrop": dict(fdrop=True),
    "nomax": dict(nomax=True),
    "fdrop_prescale": dict(fdrop=True, prescale=True),
}


def main():
    import jax
    import jax.numpy as jnp

    want = set(sys.argv[1:]) or set(VARIANTS)
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, T, F).astype(np.float32) * 0.3).astype(jnp.bfloat16)
    qb = jnp.asarray(rng.randn(F).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    bias = jnp.zeros((B, T), jnp.float32)
    do = jnp.asarray(rng.randn(B, T, F // 3).astype(np.float32) * 0.01).astype(jnp.bfloat16)
    seed = jnp.zeros((1,), jnp.int32)

    RATE = 0.1
    CO = {"xla_tpu_scoped_vmem_limit_kib": "65536"}

    ref_out = None
    ref_dqkv = None
    for name, kw in VARIANTS.items():
        if name not in want and not (name == "base"):
            continue
        if kw is None:
            from visualbert_tpu.ops.flash_attention import (
                _flash_packed_fwd_impl, _flash_packed_bwd,
                _flash_packed_fwd,
            )

            def fwd0(qkv, qb, key_bias, seed, _rate=0.0):
                return _flash_packed_fwd_impl(qkv, qb, key_bias, _rate, H, D, seed)

            def run_fb(qkv, qb, key_bias, seed, do, _rate):
                out, res = _flash_packed_fwd(qkv, qb, key_bias, _rate, H, D, seed)
                dqkv, db, _, _ = _flash_packed_bwd(_rate, H, D, res, do)
                return out, dqkv, db

            fwd_t, bwd_t = None, None
        else:
            build = make_variant(**kw)
            fwdR, bwdR = build(RATE)
            fwd0_, _bwd0 = build(0.0)

            def fwd0(qkv, qb, key_bias, seed, _f=fwd0_):
                return _f(qkv, qb, key_bias, seed)

            def run_fb(qkv, qb, key_bias, seed, do, _rate, _f=fwdR, _b=bwdR,
                       _f0=fwd0_, _b0=_bwd0):
                f, bwd_ = (_f, _b) if _rate > 0 else (_f0, _b0)
                out, stats = f(qkv, qb, key_bias, seed)
                dqkv, db = bwd_(qkv, qb, key_bias, seed, do, out, stats)
                return out, dqkv, db

        # numerics check at rate 0 vs production
        out0, _ = jax.jit(fwd0, compiler_options=CO)(qkv, qb, bias, seed)
        o, dq, db = jax.jit(functools.partial(run_fb, _rate=0.0), compiler_options=CO)(qkv, qb, bias, seed, do)
        if name == "base":
            ref_out, ref_dqkv = np.asarray(o, np.float32), np.asarray(dq, np.float32)
        else:
            eo = np.max(np.abs(np.asarray(o, np.float32) - ref_out))
            ed = np.max(np.abs(np.asarray(dq, np.float32) - ref_dqkv))
            print(f"{name:18s} max|Δout|={eo:.2e} max|Δdqkv|={ed:.2e}", flush=True)

        # timing at dropout RATE (the production operating point)
        def fwd_loop(qkv):
            def body(c, i):
                if kw is None:
                    from visualbert_tpu.ops.flash_attention import _flash_packed_fwd_impl
                    o, st = _flash_packed_fwd_impl(c, qb, bias, RATE, H, D, seed + i)
                else:
                    o, st = fwdR(c, qb, bias, seed + i)
                return c, o[0, 0, 0]
            return jax.lax.scan(body, qkv, jnp.arange(K))[1]

        def fb_loop(qkv):
            def body(c, i):
                o, dq_, db_ = run_fb(c, qb, bias, seed + i, do, RATE)
                return c, dq_[0, 0, 0]
            return jax.lax.scan(body, qkv, jnp.arange(K))[1]

        ms_f = timeit(jax.jit(fwd_loop, compiler_options=CO), qkv)
        ms_fb = timeit(jax.jit(fb_loop, compiler_options=CO), qkv)
        print(f"{name:18s} fwd {ms_f:7.3f}  fwd+bwd {ms_fb:7.3f}  (bwd ~{ms_fb - ms_f:6.3f}) ms",
              flush=True)


if __name__ == "__main__":
    main()
