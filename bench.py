"""Benchmark: VisualBERT-base COCO-caption pretraining step throughput on one
TPU chip (the BASELINE.json headline metric — image-text pairs/sec/chip).

Shapes follow the reference COCO pretraining config: 128 text tokens + 100
region features (detectron_fix_100), MLM + sentence-image alignment heads,
full train step (fwd+bwd+BertAdam), dropout active, bf16 compute.

Timing: K=60 train steps are fused into one ``lax.scan`` program (body
unrolled 3x for cross-step scheduling freedom) and synced by fetching the
loss vector, so RPC/dispatch overhead of the remote TPU tunnel is excluded
(block_until_ready is unreliable through the tunnel; at K=10 the ~30 ms
round trip still shaved ~2% off the device step rate).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` divides by an estimated reference throughput of the PyTorch
DataParallel implementation on A100 (fp16, eager, BertAdam): ~230
pairs/s/chip. BASELINE.json's ``published`` is empty — the reference repo
ships no throughput numbers. The estimate's derivation (A100 roofline at
25-35% eager MFU + measured Python/optimizer overheads) and a MEASURED
same-host CPU head-to-head anchor (reference 0.137 vs ours 0.280 pairs/s =
2.04x, scripts/measure_baseline_cpu.py) are documented in BASELINE.md.
"""

import json
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 230.0  # estimated reference A100 throughput (see above)


def synth_batch(batch, tt=128, tv=100, dv=2048, vocab=30522, seed=0, n_pred=24):
    rng = np.random.RandomState(seed)
    lm = np.full((batch, tt), -1, np.int32)
    positions = np.zeros((batch, n_pred), np.int32)
    for i in range(batch):
        pos = rng.choice(np.arange(1, tt), size=n_pred, replace=False)
        positions[i] = np.sort(pos)
        lm[i, pos] = rng.randint(0, vocab, size=n_pred)
    return {
        "mlm_positions": positions,
        "input_ids": rng.randint(0, vocab, size=(batch, tt)).astype(np.int32),
        "token_type_ids": np.zeros((batch, tt), np.int32),
        "input_mask": np.ones((batch, tt), np.int32),
        "visual_embeddings": rng.randn(batch, tv, dv).astype(np.float32),
        "image_mask": np.ones((batch, tv), np.int32),
        "masked_lm_labels": lm,
        "is_random_next": rng.randint(0, 2, size=(batch,)).astype(np.int32),
    }


def time_scan_steps(trainer, state, batch, K=10, repeats=3, seed=1, unroll=1):
    """K train steps fused into ONE scan program, timed end-to-end with the
    loss vector fetched as the sync (the shared harness for all hardware
    benchmarks — the ~30 ms RPC of the remote tunnel must be amortized).
    ``unroll`` duplicates the scan body, giving the scheduler cross-step
    freedom (prefetch/write-back overlap across the step boundary — what a
    double-buffered input pipeline gets in production; +2.4% at unroll=3,
    plateau beyond). Returns (best examples_per_sec, final state)."""
    import jax
    import jax.numpy as jnp

    step_inner = trainer.train_step_fn(nested=True)

    def multi(state, batch, key):
        def body(st, i):
            st, m = step_inner(st, batch, jax.random.fold_in(key, i))
            return st, m["loss"]

        return jax.lax.scan(body, state, jnp.arange(K), unroll=unroll)

    multi = jax.jit(multi, donate_argnums=(0,),
                    compiler_options=trainer.compiler_options())
    sharded = trainer.shard_batch(batch)
    key = jax.random.key(seed, impl="rbg")
    batch_size = len(next(iter(batch.values())))
    state, losses = multi(state, sharded, key)
    np.asarray(losses)  # sync
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, losses = multi(state, sharded, key)
        lv = np.asarray(losses)
        dt = time.perf_counter() - t0
        assert np.all(np.isfinite(lv)), lv
        best = max(best, batch_size * K / dt)
    return best, state


def measure(batch_size, use_flash=True, remat=False, scan_layers=True,
            hidden_act="gelu", K=60, repeats=2, unroll=3, **cfg_overrides):
    import jax
    import jax.numpy as jnp

    from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.parallel.mesh import create_mesh
    from visualbert_tpu.train.trainer import Trainer

    n_chips = len(jax.devices())
    mesh = create_mesh((n_chips, 1))
    cfg = VisualBertConfig.base(
        use_flash_attention=use_flash, remat=remat, scan_layers=scan_layers,
        hidden_act=hidden_act,
        # REQUIRED on >1 chips: the Pallas kernels dispatch via shard_map
        # over this mesh (and the single-device-only paths gate on it)
        mesh=mesh if n_chips > 1 else None,
        **cfg_overrides,
    )
    model = VisualBertForTask(cfg, head_type="pretraining")
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(
            learning_rate=1e-4, schedule="warmup_linear", warmup=0.1, t_total=10000
        ),
        train_config=TrainConfig(),
        mesh=mesh,
    )
    batch = synth_batch(batch_size)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_inner = trainer.train_step_fn(nested=True)

    def multi(state, batch, key):
        def body(st, i):
            st, m = step_inner(st, batch, jax.random.fold_in(key, i))
            return st, m["loss"]

        # unroll: cross-step scheduling freedom (see time_scan_steps)
        return jax.lax.scan(body, state, jnp.arange(K), unroll=unroll)

    multi = jax.jit(multi, donate_argnums=(0,),
                    compiler_options=trainer.compiler_options())
    sharded = trainer.shard_batch(batch)
    key = jax.random.key(1, impl="rbg")  # hardware RNG for dropout masks

    state, losses = multi(state, sharded, key)
    np.asarray(losses)  # sync
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, losses = multi(state, sharded, key)
        lv = np.asarray(losses)
        dt = time.perf_counter() - t0
        assert np.all(np.isfinite(lv)), lv
        best = max(best, batch_size * K / dt / n_chips)
    return best


def measure_eval_qps(batch_size=128, K=20):  # swept: 128 beats 64 (+36%) and 256 (which degrades)
    """Secondary BASELINE metric: VQA2 eval QPS (forward-only, bf16)."""
    import jax
    import jax.numpy as jnp

    from visualbert_tpu.config import VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.train.trainer import unbox

    cfg = VisualBertConfig.base(use_flash_attention=True, scan_layers=False)
    model = VisualBertForTask(cfg, head_type="vqa")
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": rng.randint(0, cfg.vocab_size, size=(batch_size, 128)).astype(np.int32),
        "token_type_ids": np.zeros((batch_size, 128), np.int32),
        "input_mask": np.ones((batch_size, 128), np.int32),
        "visual_embeddings": rng.randn(batch_size, 100, 2048).astype(np.float32),
        "image_mask": np.ones((batch_size, 100), np.int32),
    }
    batch = jax.tree.map(jnp.asarray, batch)
    params = unbox(model.init({"params": jax.random.PRNGKey(0)}, batch)["params"])

    def multi(params, batch):
        def body(_, i):
            out = model.apply({"params": params}, batch, deterministic=True)
            return None, out["logits"][0, 0]

        return jax.lax.scan(body, None, jnp.arange(K))[1]

    multi = jax.jit(multi)
    np.asarray(multi(params, batch))
    t0 = time.perf_counter()
    np.asarray(multi(params, batch))
    dt = time.perf_counter() - t0
    return batch_size * K / dt


TRAIN_FLOPS_PER_PAIR = 1.28e11  # bert-base fwd+bwd at T=228 (see BASELINE.md)
V5E_PEAK_BF16 = 197e12


def main():
    # The remote-TPU tunnel can die (backend init then hangs forever, not
    # erroring). Fail fast with a diagnostic instead of hanging the driver.
    import os
    import threading

    ready = threading.Event()

    def _watchdog():
        if not ready.wait(180):
            print(
                "# TPU backend init did not complete within 180s — axon "
                "tunnel down? aborting bench",
                file=sys.stderr, flush=True,
            )
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    jax.devices()  # blocks on backend init; watchdog guards the hang
    ready.set()

    from visualbert_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # re-runs of an unchanged bench skip the compile

    best = 0.0
    err = None
    # primary: unrolled layers (no scan residual-stacking copies) + fused
    # attention kernel + fused MLM-xent kernel + the reference's erf gelu
    # (modeling.py:56-61) via the fast-erf custom-JVP path — i.e. PARITY
    # numerics, not the tanh approximation; fallbacks: tanh gelu, smaller
    # batch, scanned layers
    for bs, act, scan, fx, fd in (
        (96, "gelu", False, True, True),
        (96, "gelu", False, True, False),
        (96, "gelu", False, False, False),
        (96, "gelu_tanh", False, True, True),
        (64, "gelu", False, False, False),
        (64, "gelu", True, False, False),
    ):
        try:
            v = measure(bs, scan_layers=scan, hidden_act=act, fused_mlm_xent=fx,
                        fast_dropout=fd)
            mfu = v * TRAIN_FLOPS_PER_PAIR / V5E_PEAK_BF16
            print(
                f"# batch={bs} act={act} scan_layers={scan} fused_xent={fx} fast_dropout={fd}: "
                f"{v:.1f} pairs/s/chip (MFU {mfu:.1%} of 197 bf16 TFLOP/s)",
                file=sys.stderr,
            )
            best = max(best, v)
        except Exception as e:
            err = e
            print(f"# batch={bs} act={act} failed: {type(e).__name__}", file=sys.stderr)
        if best > 0:
            break
    if best == 0.0 and err is not None:
        raise err
    try:
        qps = measure_eval_qps()
        print(f"# vqa_eval_qps: {qps:.1f} examples/s/chip", file=sys.stderr)
    except Exception as e:
        print(f"# vqa_eval_qps failed: {type(e).__name__}", file=sys.stderr)
    result = {
        "metric": "visualbert_base_pretrain_throughput",
        "value": round(best, 2),
        "unit": "image-text pairs/sec/chip",
        "vs_baseline": round(best / BASELINE_PAIRS_PER_SEC, 3),
    }
    # End-to-end production-path measurement (VERDICT r3 #2): the real fit
    # loop (Batcher + prefetch + K-step device-stacked dispatch) over
    # distinct batches, with the host/wire/device chain itemized. On this
    # sandbox the ~50 MB/s tunnel binds (a real TPU host's DMA is GB/s);
    # the itemization keys state which link binds. See scripts/e2e_bench.py
    # and BASELINE.md "End-to-end throughput".
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))
        import e2e_bench

        ds = e2e_bench.build_dataset(32 * 96)
        host_rate = e2e_bench.measure_host_only(ds, 96, 0, n_batches=24)
        e2e, n = e2e_bench.measure_e2e(ds, 96, 8, 0)
        binding = min(
            ("host", host_rate), ("device", best), key=lambda t: t[1]
        )[0]
        if e2e < 0.8 * min(host_rate, best):
            # the sandbox tunnel's execute-path input feed (~75 MB/s) binds;
            # host and device are each proven above demand (BASELINE.md
            # "End-to-end throughput")
            binding = "tunnel_execute_feed"
        result.update(
            {
                "e2e_pairs_per_s": round(e2e, 1),
                "e2e_host_assembly_pairs_per_s": round(host_rate, 1),
                "e2e_binding_constraint": binding,
            }
        )
        print(
            f"# e2e fit-loop: {e2e:.1f} pairs/s over {n} steps "
            f"(host {host_rate:.0f}, device {best:.0f}, binding {binding})",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"# e2e bench failed: {type(e).__name__}: {e}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
