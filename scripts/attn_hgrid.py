"""2D (batch, head-group) GRID variant of the packed attention kernels —
the one structural lever the round-3 sweep (attn_exp.py) did not cover.

The production kernels run a (B,) grid with all H heads inside one program;
here heads are split across a second grid dimension (F-axis blocks — the
head-major packing makes each group's q/k/v slice contiguous), so Mosaic
can overlap one group's DMAs with another's compute and each program's
VMEM footprint shrinks by H/hg. Numerics-checked against production at
rate 0 before timing (dropout seeds follow the same (b, group) salting, so
rate>0 draws a different-but-equidistributed mask stream when hg != 12).

Usage: python scripts/attn_hgrid.py [hg ...]   (default: 6 4 2;
hg must keep F/GG a 128-multiple - hg=3 (Fg=576) is not expressible)
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


def make_hgrid(hg):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from visualbert_tpu.ops.dropout import dropout_keep as _dropout_keep

    GG = H // hg          # grid groups
    Fg = F // GG          # per-group qkv width (head-major ⇒ contiguous)
    Og = (F // 3) // GG   # per-group output width

    def fwd_kernel(seed_ref, qkv_ref, bias_ref, qb_ref, o_ref, stats_ref,
                   *, scale, rate):
        b = pl.program_id(0)
        g = pl.program_id(1)
        bias2 = bias_ref[b] * LOG2E
        x = qkv_ref[0] + qb_ref[0][None, :]  # [T, Fg]
        c1 = scale * LOG2E
        s_all = []
        for h in range(hg):
            q = x[:, (3 * h + 0) * D:(3 * h + 1) * D]
            k = x[:, (3 * h + 1) * D:(3 * h + 2) * D]
            s_all.append(jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ))
        t = jnp.stack(s_all) * c1 + bias2[None, None, :]  # [hg, T, T]
        m2 = jnp.max(t, axis=-1, keepdims=True)
        e = jnp.exp2(t - m2)
        ssum = jnp.sum(e, axis=-1, keepdims=True)
        p = e * pl.reciprocal(ssum, approx=False)
        stats_ref[0, 0] = (m2 + jnp.log2(ssum))[:, :, 0]
        if rate > 0.0:
            keep = _dropout_keep(
                seed_ref[0] + b * H + g * hg, (hg, T, T), rate, False
            )
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        p = p.astype(x.dtype)
        for h in range(hg):
            v = x[:, (3 * h + 2) * D:(3 * h + 3) * D]
            o = jax.lax.dot_general(
                p[h], v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, h * D:(h + 1) * D] = o.astype(o_ref.dtype)

    def bwd_kernel(seed_ref, qkv_ref, bias_ref, qb_ref, do_ref, o_ref,
                   stats_ref, dqkv_ref, db_ref, *, scale, rate):
        b = pl.program_id(0)
        g = pl.program_id(1)
        bias2 = bias_ref[b] * LOG2E
        x = qkv_ref[0] + qb_ref[0][None, :]
        do_all = do_ref[0]
        o_all = o_ref[0]
        c1 = scale * LOG2E
        inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

        s_all = [
            jax.lax.dot_general(
                x[:, (3 * h + 0) * D:(3 * h + 1) * D],
                x[:, (3 * h + 1) * D:(3 * h + 2) * D],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            for h in range(hg)
        ]
        t = jnp.stack(s_all) * c1 + bias2[None, None, :]
        m2p = stats_ref[0, 0][:, :, None]  # [hg, T, 1]
        p = jnp.exp2(t - m2p)
        if rate > 0.0:
            keep = _dropout_keep(
                seed_ref[0] + b * H + g * hg, p.shape, rate, False
            )
            p_d16 = jnp.where(keep, p * inv, 0.0).astype(x.dtype)
        else:
            keep = None
            p_d16 = p.astype(x.dtype)

        dp_all, delta_all = [], []
        for h in range(hg):
            v = x[:, (3 * h + 2) * D:(3 * h + 3) * D]
            do = do_all[:, h * D:(h + 1) * D]
            dv = jax.lax.dot_general(
                p_d16[h], do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_ref[0, :, (3 * h + 2) * D:(3 * h + 3) * D] = dv.astype(dqkv_ref.dtype)
            dp_all.append(jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ))
            o = o_all[:, h * D:(h + 1) * D].astype(jnp.float32)
            delta_all.append(
                jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)
            )
        dp_d = jnp.stack(dp_all)
        delta = jnp.stack(delta_all)
        if rate > 0.0:
            dp = jnp.where(keep, dp_d * inv, 0.0)
        else:
            dp = dp_d
        ds = (p * (dp - delta)).astype(x.dtype)

        for h in range(hg):
            q = x[:, (3 * h + 0) * D:(3 * h + 1) * D]
            k = x[:, (3 * h + 1) * D:(3 * h + 2) * D]
            dq = jax.lax.dot_general(
                ds[h], k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dk = jax.lax.dot_general(
                ds[h], q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dqkv_ref[0, :, (3 * h + 0) * D:(3 * h + 1) * D] = (dq * scale).astype(dqkv_ref.dtype)
            dqkv_ref[0, :, (3 * h + 1) * D:(3 * h + 2) * D] = (dk * scale).astype(dqkv_ref.dtype)

        db_ref[0, 0] = jnp.sum(dqkv_ref[0].astype(jnp.float32), axis=0)

    import jax

    in_spec = pl.BlockSpec((1, T, Fg), lambda b, g, *_: (b, 0, g), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, T, Og), lambda b, g, *_: (b, 0, g), memory_space=pltpu.VMEM)
    # stats live as [B, GG, hg, T]: the (1, 1, hg, T) block's trailing two
    # dims EQUAL the array dims, satisfying Mosaic's tiling rule for any hg
    stats_spec = pl.BlockSpec((1, 1, hg, T), lambda b, g, *_: (b, g, 0, 0), memory_space=pltpu.VMEM)
    qb_spec = pl.BlockSpec((1, Fg), lambda b, g, *_: (0, g), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((1, 1, Fg), lambda b, g, *_: (b, 0, g), memory_space=pltpu.VMEM)
    scale = 1.0 / (D ** 0.5)

    def fwd(qkv, qb, key_bias, seed, rate):
        return pl.pallas_call(
            functools.partial(fwd_kernel, scale=scale, rate=rate),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(B, GG),
                in_specs=[in_spec, bias_spec, qb_spec],
                out_specs=[o_spec, stats_spec],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, T, F // 3), qkv.dtype),
                jax.ShapeDtypeStruct((B, GG, hg, T), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
        )(seed, qkv, key_bias, qb.reshape(1, F))

    def bwd(qkv, qb, key_bias, seed, do, out, stats, rate):
        return pl.pallas_call(
            functools.partial(bwd_kernel, scale=scale, rate=rate),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(B, GG),
                in_specs=[in_spec, bias_spec, qb_spec, o_spec, o_spec, stats_spec],
                out_specs=[in_spec, db_spec],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, T, F), qkv.dtype),
                jax.ShapeDtypeStruct((B, 1, F), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
        )(seed, qkv, key_bias, qb.reshape(1, F), do, out, stats)

    return fwd, bwd


def main():
    import jax
    import jax.numpy as jnp

    from visualbert_tpu.ops.flash_attention import (
        _flash_packed_bwd, _flash_packed_fwd, _flash_packed_fwd_impl,
    )
    from visualbert_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    hgs = [int(a) for a in sys.argv[1:]] or [6, 4, 2]
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, T, F).astype(np.float32) * 0.3).astype(jnp.bfloat16)
    qb = jnp.asarray(rng.randn(F).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    bias = jnp.zeros((B, T), jnp.float32)
    do = jnp.asarray(rng.randn(B, T, F // 3).astype(np.float32) * 0.01).astype(jnp.bfloat16)
    seed = jnp.zeros((1,), jnp.int32)
    RATE = 0.1
    CO = {"xla_tpu_scoped_vmem_limit_kib": "32768"}

    # production reference (rate 0 numerics + rate .1 timing)
    def base_fb(qkv, qb, key_bias, seed, do, _rate):
        out, res = _flash_packed_fwd(qkv, qb, key_bias, _rate, H, D, seed)
        dqkv, db, _, _ = _flash_packed_bwd(_rate, H, D, res, do)
        return out, dqkv, db

    o0, dq0, _ = jax.jit(functools.partial(base_fb, _rate=0.0), compiler_options=CO)(
        qkv, qb, bias, seed, do)
    ref_out = np.asarray(o0, np.float32)
    ref_dq = np.asarray(dq0, np.float32)

    def loop(fn):
        def run(qkv):
            def body(c, i):
                outs = fn(qkv, i)
                return c, jax.tree.map(lambda x: x[0, 0], outs)

            return jax.lax.scan(body, 0, jnp.arange(K))

        return jax.jit(run, compiler_options=CO)

    base_fwd = loop(lambda x, i: _flash_packed_fwd_impl(
        x, qb, bias, RATE, H, D, seed + i)[0])
    base_fb_t = loop(lambda x, i: base_fb(x, qb, bias, seed + i, do, RATE)[1])
    print(f"base  : fwd {timeit(base_fwd, qkv):6.2f}  fwd+bwd {timeit(base_fb_t, qkv):6.2f} ms/call")

    for hg in hgs:
        fwd, bwd = make_hgrid(hg)
        # rate-0 numerics vs production
        out, stats = jax.jit(functools.partial(fwd, rate=0.0), compiler_options=CO)(
            qkv, qb, bias, seed)
        dqkv, _db = jax.jit(functools.partial(bwd, rate=0.0), compiler_options=CO)(
            qkv, qb, bias, seed, do, out, stats)
        eo = np.max(np.abs(np.asarray(out, np.float32) - ref_out))
        ed = np.max(np.abs(np.asarray(dqkv, np.float32) - ref_dq))
        v_fwd = loop(lambda x, i, _f=fwd: _f(x, qb, bias, seed + i, rate=RATE)[0])

        def fb(x, i, _f=fwd, _b=bwd):
            out, stats = _f(x, qb, bias, seed + i, rate=RATE)
            return _b(x, qb, bias, seed + i, do, out, stats, rate=RATE)[0]

        v_fb = loop(fb)
        print(
            f"hg={hg:2d} : fwd {timeit(v_fwd, qkv):6.2f}  fwd+bwd {timeit(v_fb, qkv):6.2f} ms/call"
            f"  max|dOut|={eo:.2e} max|d dqkv|={ed:.2e}"
        )


if __name__ == "__main__":
    main()
