"""Capture a jax.profiler trace of the bench train step and print the top
HLO ops by self time (via tensorboard_plugin_profile's xplane converter).

Usage: python scripts/profile_step.py [logdir]
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import synth_batch  # noqa: E402

LOGDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jb_trace"
BATCH = int(os.environ.get("PROF_BATCH", 96))
K = int(os.environ.get("PROF_K", 12))
ACT = os.environ.get("PROF_ACT", "gelu")  # bench headline = parity erf gelu
UNROLL = int(os.environ.get("PROF_UNROLL", 3))  # bench scan unroll


def main():
    import jax
    import jax.numpy as jnp

    from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.parallel.mesh import create_mesh
    from visualbert_tpu.train.trainer import Trainer

    cfg = VisualBertConfig.base(
        use_flash_attention=True, scan_layers=False, hidden_act=ACT,
        fused_mlm_xent=True, fast_dropout=True,
    )
    model = VisualBertForTask(cfg, head_type="pretraining")
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(
            learning_rate=1e-4, schedule="warmup_linear", warmup=0.1, t_total=10000
        ),
        train_config=TrainConfig(),
        mesh=create_mesh((len(jax.devices()), 1)),
    )
    batch = synth_batch(BATCH)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_inner = trainer.train_step_fn(nested=True)

    def multi(state, batch, key):
        def body(st, i):
            st, m = step_inner(st, batch, jax.random.fold_in(key, i))
            return st, m["loss"]

        return jax.lax.scan(body, state, jnp.arange(K), unroll=UNROLL)

    # same per-executable XLA options as the bench (32 MB scoped VMEM — the
    # attention bwd kernel needs >16 MB at full-H head grouping)
    multi = jax.jit(multi, donate_argnums=(0,),
                    compiler_options=trainer.compiler_options())
    sharded = trainer.shard_batch(batch)
    key = jax.random.key(1, impl="rbg")
    state, losses = multi(state, sharded, key)
    np.asarray(losses)

    jax.profiler.start_trace(LOGDIR)
    state, losses = multi(state, sharded, key)
    np.asarray(losses)
    jax.profiler.stop_trace()
    with open(os.path.join(LOGDIR, "k_steps.txt"), "w") as f:
        f.write(str(K))  # roofline_report.py reads this to divide per step
    print("trace captured", flush=True)

    report(LOGDIR)


def report(logdir):
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane found under", logdir)
        return
    path = max(paths, key=os.path.getmtime)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([path], "framework_op_stats^", {})
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data.decode() if isinstance(data, bytes) else data)))
    # columns of interest: Type, Operation, #Occurrences, Total self-time (us)
    key_self = next((k for k in rows[0] if "self" in k.lower() and "us" in k.lower()), None)
    if key_self is None:
        print("columns:", list(rows[0]))
        return
    rows.sort(key=lambda r: float(r[key_self] or 0), reverse=True)
    total = sum(float(r[key_self] or 0) for r in rows)
    print(f"total self time: {total/1e3:.1f} ms  (K={K} steps)")
    print(f"{'self ms':>9} {'%':>5} {'occ':>5}  op")
    for r in rows[:45]:
        t = float(r[key_self] or 0)
        name = (r.get("Operation") or r.get("operation") or "?")[:110]
        occ = r.get("#Occurrences") or r.get("occurrences") or "?"
        print(f"{t/1e3:9.2f} {100*t/total:5.1f} {occ:>5}  {name}")


if __name__ == "__main__":
    if os.environ.get("REPORT_ONLY"):
        report(LOGDIR)
    else:
        main()
