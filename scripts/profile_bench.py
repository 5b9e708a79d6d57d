"""Profile one bench train step on the TPU and dump a per-op time breakdown.

Usage: python scripts/profile_bench.py [outdir]
Writes: <outdir>/plugins/profile/... trace, and prints top HLO ops by time.
"""

import glob
import json
import sys
import time

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vb_profile"
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import synth_batch
    from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.parallel.mesh import create_mesh
    from visualbert_tpu.train.trainer import Trainer

    cfg = VisualBertConfig.base(
        use_flash_attention=True, remat=False, scan_layers=False, hidden_act="gelu",
    )
    model = VisualBertForTask(cfg, head_type="pretraining")
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(
            learning_rate=1e-4, schedule="warmup_linear", warmup=0.1, t_total=10000
        ),
        train_config=TrainConfig(),
        mesh=create_mesh((1, 1)),
    )
    K = 6
    batch = synth_batch(96)
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
    t0 = time.time()
    state, losses = multi(state, sharded, key)
    np.asarray(losses)
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    state, losses = multi(state, sharded, key)
    np.asarray(losses)
    dt = time.time() - t0
    print(f"steady: {dt:.3f}s for {K} steps = {96*K/dt:.1f} pairs/s", flush=True)

    jax.profiler.start_trace(outdir)
    state, losses = multi(state, sharded, key)
    np.asarray(losses)
    jax.profiler.stop_trace()

    xplanes = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    print("xplane:", xplanes, flush=True)
    if not xplanes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        for tool in ("framework_op_stats", "op_profile", "hlo_op_stats"):
            try:
                data = raw_to_tool_data.xspace_to_tool_data(xplanes, tool, {})
                blob = data[0] if isinstance(data, tuple) else data
                if isinstance(blob, bytes):
                    blob = blob.decode("utf-8", errors="replace")
                with open(f"{outdir}/{tool}.json", "w") as f:
                    f.write(blob if isinstance(blob, str) else json.dumps(blob))
                print(f"wrote {outdir}/{tool}.json ({len(blob)} bytes)", flush=True)
            except Exception as e:
                print(f"{tool} failed: {type(e).__name__}: {e}", flush=True)
    except Exception as e:
        print("parse failed:", e, flush=True)


if __name__ == "__main__":
    main()
