"""Microbenchmark the packed attention kernel in isolation at bench shapes.

Times K repeats of fwd and of fwd+bwd via lax.scan (loop-carried so nothing
is hoisted), printing ms/call. Usage: python scripts/attn_micro.py [variants]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

B, T, H, D = 96, 228, 12, 64
F = 3 * H * D
K = 30


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


def main():
    import jax
    import jax.numpy as jnp

    from visualbert_tpu.ops.flash_attention import flash_attention_packed

    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, T, F).astype(np.float32)).astype(jnp.bfloat16)
    bias = jnp.zeros((B, T), jnp.float32)

    # the production step runs under a 32 MB scoped-VMEM budget
    # (Trainer.compiler_options) — time the kernels under the same
    CO = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    which = set(sys.argv[1:])

    def want(n):
        return not which or n in which

    for rate, sp, tag in (
        (0.0, False, "fwd rate0"),
        (0.1, False, "fwd rate.1"),
        (0.0, True, "fwd rate0 sp"),
    ):
        if not want("fwd"):
            break

        def fwd(qkv, _rate=rate, _sp=sp):
            def body(c, i):
                # the seed operand varies with i, so the custom-call is not
                # loop-invariant and can't be hoisted out of the scan
                o = flash_attention_packed(
                    c, H, bias=bias, dropout_rate=_rate,
                    seed=jnp.int32(7) + i, save_probs=_sp,
                )
                return c, o[0, 0, 0]

            return jax.lax.scan(body, qkv, jnp.arange(K))[1]

        ms = timeit(jax.jit(fwd, compiler_options=CO), qkv)
        print(f"{tag:24s} {ms:7.3f} ms/call", flush=True)

    for rate, sp, tag in (
        (0.0, False, "fwd+bwd rate0"),
        (0.1, False, "fwd+bwd rate.1"),
        (0.0, True, "fwd+bwd rate0 sp"),
        (0.1, True, "fwd+bwd rate.1 sp"),
    ):
        if not want("bwd"):
            break

        def step(qkv, _rate=rate, _sp=sp):
            def loss(q, i):
                o = flash_attention_packed(
                    q, H, bias=bias, dropout_rate=_rate,
                    seed=jnp.int32(7) + i, save_probs=_sp,
                )
                return (o.astype(jnp.float32) * 1e-3).sum()

            def body(c, i):
                g = jax.grad(loss)(c, i)
                return c, g[0, 0, 0]

            return jax.lax.scan(body, qkv, jnp.arange(K))[1]

        ms = timeit(jax.jit(step, compiler_options=CO), qkv)
        print(f"{tag:24s} {ms:7.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
