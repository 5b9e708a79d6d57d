"""Multi-chip scaling overhead accounting on the virtual CPU mesh.

Real multi-chip hardware is unavailable in this sandbox (one axon v5e), so
this script exercises the FULL multi-chip program — pjit train step over a
(data, model) mesh, gradient all-reduce, per-host batch slicing
(``parallel/distributed.local_batch_slice``) — on 8 virtual CPU devices.

Primary evidence is ANALYTIC, not wall-clock: XLA ``cost_analysis()`` on the
compiled partitioned executables. ``flops`` there is per-device, so
``8 x flops(dp8) / flops(single)`` ~= 1 proves GSPMD partitioned the step
without redundant compute (the small excess is the replicated BertAdam
update + grad-norm reductions, which standard data-parallel runs on every
replica — same as the reference's DataParallel). Wall times are recorded
too, with a caveat: the sandbox host has ONE core, XLA-CPU cross-device
collectives spin-wait at their rendezvous, and 8 device threads contend for
that core, so wall ratios overstate real-hardware overhead.

The Pallas kernels are exercised under sharding by ``dryrun_multichip`` and
the DP≡DP×TP equality tests; here they stay off so the measurement reflects
GSPMD partitioning, not the kernels' slow CPU interpret path.

Writes MULTICHIP_BENCH_r03.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_DEV = 8
GLOBAL_BATCH = 32
K = 6


def main():
    import jax

    if len(jax.devices()) < N_DEV or jax.devices()[0].platform != "cpu":
        from jax.extend.backend import clear_backends

        clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", N_DEV)

    import jax.numpy as jnp

    from bench import synth_batch
    from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.parallel.distributed import local_batch_slice
    from visualbert_tpu.parallel.mesh import create_mesh
    from visualbert_tpu.train.trainer import Trainer

    # mid-size geometry: big enough that partitioning overhead is a small
    # fraction of real work, small enough for CPU
    cfg_kw = dict(
        hidden_size=256, num_hidden_layers=4, num_attention_heads=8,
        intermediate_size=1024, max_position_embeddings=128,
        visual_embedding_dim=512, dtype=jnp.float32,
    )

    def run(mesh_shape):
        mesh = create_mesh(mesh_shape, devices=jax.devices()[: mesh_shape[0] * mesh_shape[1]])
        cfg = VisualBertConfig.base(**cfg_kw)
        model = VisualBertForTask(cfg, head_type="pretraining")
        trainer = Trainer(
            model=model,
            opt_config=OptimizerConfig(
                learning_rate=1e-4, schedule="warmup_linear", warmup=0.1, t_total=1000
            ),
            train_config=TrainConfig(mesh_shape=mesh_shape),
            mesh=mesh,
        )
        # per-host slicing: single-process here, so the slice is the whole
        # batch — but the API path is the one a multi-host launch takes
        start, size = local_batch_slice(GLOBAL_BATCH)
        assert (start, size) == (0, GLOBAL_BATCH)
        batch = synth_batch(size, tt=48, tv=24, dv=512)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step_inner = trainer.train_step_fn(nested=True)

        def multi(state, batch, key):
            def body(st, i):
                st, m = step_inner(st, batch, jax.random.fold_in(key, i))
                return st, m["loss"]

            return jax.lax.scan(body, state, jnp.arange(K))

        multi = jax.jit(multi, donate_argnums=(0,))
        sharded = trainer.shard_batch(batch)
        key = jax.random.key(1, impl="rbg")
        compiled = multi.lower(state, sharded, key).compile()
        cost = compiled.cost_analysis()
        flops = float(cost.get("flops", float("nan")))  # PER-DEVICE flops of K steps
        state, losses = compiled(state, sharded, key)
        np.asarray(losses)  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state, losses = compiled(state, sharded, key)
            lv = np.asarray(losses)
            best = min(best, (time.perf_counter() - t0) / K)
        assert np.all(np.isfinite(lv)), lv
        return best, float(lv[-1]), flops

    results = {}
    t_single, loss_single, f_single = run((1, 1))
    results["single_device_step_s"] = round(t_single, 4)
    t_dp, loss_dp, f_dp = run((8, 1))
    results["dp8_step_s"] = round(t_dp, 4)
    t_dptp, loss_dptp, f_dptp = run((4, 2))
    results["dp4_tp2_step_s"] = round(t_dptp, 4)

    # --- analytic accounting (per-device HLO flops from cost_analysis) ---
    results["flops_single_device"] = f_single
    results["flops_per_device_dp8"] = f_dp
    results["flops_per_device_dp4_tp2"] = f_dptp
    results["dp8_total_vs_single_flops"] = round(8 * f_dp / f_single, 4)
    results["dp4_tp2_total_vs_single_flops"] = round(8 * f_dptp / f_single, 4)
    # expected excess: BertAdam update + grad-norm reductions replicate on
    # every DP replica (standard DP; the all-reduced gradient is identical).
    # ~7.8M params x ~10 flops each x K steps x 7 extra replicas.
    results["losses_close"] = bool(
        abs(loss_dp - loss_single) < 5e-3 and abs(loss_dptp - loss_single) < 5e-3
    )
    results["ok"] = bool(
        results["losses_close"]
        and 0.95 < results["dp8_total_vs_single_flops"] < 1.25
        and 0.95 < results["dp4_tp2_total_vs_single_flops"] < 1.35
    )
    results["note"] = (
        "Primary evidence is analytic: cost_analysis() flops are per-device, "
        "so 8*flops(dp8)/flops(single) ~= 1 proves the partitioned step does "
        "no redundant compute (excess = replicated optimizer/grad-norm, "
        "inherent to DP). Wall ratios on this 1-core host are NOT "
        "hardware-representative: XLA-CPU collectives spin-wait at rendezvous "
        "while 8 device threads contend for one core. Kernels off here; their "
        "sharded dispatch is covered by dryrun_multichip and the DP==DPxTP "
        "equality tests."
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "MULTICHIP_BENCH_r03.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
