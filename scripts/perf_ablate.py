"""Perf ablation harness: times the pretraining train step under different
knob settings to locate where the step time goes, plus decomposed timings
(forward-only, fwd+bwd-no-opt) to separate model cost from optimizer cost.

Usage: python scripts/perf_ablate.py [variant ...]
Variants default to a curated sweep; each prints pairs/s/chip.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import synth_batch  # noqa: E402

BATCH = 96
K = 10


def build(**cfg_overrides):
    import jax

    from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.parallel.mesh import create_mesh
    from visualbert_tpu.train.trainer import Trainer

    base = dict(
        use_flash_attention=True, remat=False, scan_layers=False,
        hidden_act="gelu_tanh",
    )
    base.update(cfg_overrides)
    cfg = VisualBertConfig.base(**base)
    model = VisualBertForTask(cfg, head_type="pretraining")
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(
            learning_rate=1e-4, schedule="warmup_linear", warmup=0.1, t_total=10000
        ),
        train_config=TrainConfig(),
        mesh=create_mesh((len(jax.devices()), 1)),
    )
    return cfg, model, trainer


def time_steps(multi, state, batch, key, repeats=3):
    import jax  # noqa: F401

    state, losses = multi(state, batch, key)
    np.asarray(losses)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, losses = multi(state, batch, key)
        lv = np.asarray(losses)
        dt = time.perf_counter() - t0
        assert np.all(np.isfinite(lv)), lv
        best = max(best, BATCH * K / dt)
    return best, state


def run_train(name, compiler_options=None, **cfg_overrides):
    import jax
    import jax.numpy as jnp

    cfg, model, trainer = build(**cfg_overrides)
    batch = synth_batch(BATCH)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_inner = trainer.train_step_fn(nested=True)

    def multi(state, batch, key):
        def body(st, i):
            st, m = step_inner(st, batch, jax.random.fold_in(key, i))
            return st, m["loss"]

        return jax.lax.scan(body, state, jnp.arange(K))

    if compiler_options is None:
        compiler_options = trainer.compiler_options()
    elif not compiler_options:
        compiler_options = None  # {} = explicitly unset (XLA defaults)
    multi = jax.jit(multi, donate_argnums=(0,), compiler_options=compiler_options)
    sharded = trainer.shard_batch(batch)
    key = jax.random.key(1, impl="rbg")
    v, _ = time_steps(multi, state, sharded, key)
    print(f"{name:40s} {v:8.1f} pairs/s", flush=True)
    return v


def run_fwd_bwd(name, opt=False, deterministic=False, **cfg_overrides):
    """Forward+backward (and optionally SGD-esque no-op update) without the
    full optimizer, to decompose the step."""
    import jax
    import jax.numpy as jnp

    cfg, model, trainer = build(**cfg_overrides)
    batch = synth_batch(BATCH)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    params = state.params
    from visualbert_tpu.train.trainer import unbox

    params = unbox(params)
    batch_j = jax.tree.map(jnp.asarray, batch)

    def loss_fn(p, key):
        rngs = {} if deterministic else {"dropout": key}
        out = model.apply(
            {"params": p}, batch_j, deterministic=deterministic, rngs=rngs
        )
        return out["loss"]

    grad_fn = jax.value_and_grad(loss_fn)

    def multi(params, key):
        def body(p, i):
            l, g = grad_fn(p, jax.random.fold_in(key, i))
            # consume grads so nothing is DCE'd; trivially cheap update
            p = jax.tree.map(lambda a, b: a - 0.0 * b.astype(a.dtype), p, g)
            return p, l

        return jax.lax.scan(body, params, jnp.arange(K))

    multi = jax.jit(multi, donate_argnums=(0,))
    key = jax.random.key(1, impl="rbg")
    params, losses = multi(params, key)
    np.asarray(losses)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        params, losses = multi(params, key)
        np.asarray(losses)
        dt = time.perf_counter() - t0
        best = max(best, BATCH * K / dt)
    print(f"{name:40s} {best:8.1f} pairs/s", flush=True)
    return best


def run_fwd(name, deterministic=True, **cfg_overrides):
    import jax
    import jax.numpy as jnp

    cfg, model, trainer = build(**cfg_overrides)
    batch = synth_batch(BATCH)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    from visualbert_tpu.train.trainer import unbox

    params = unbox(state.params)
    batch_j = jax.tree.map(jnp.asarray, batch)

    def multi(params, key):
        def body(_, i):
            rngs = {} if deterministic else {"dropout": jax.random.fold_in(key, i)}
            out = model.apply(
                {"params": params}, batch_j, deterministic=deterministic, rngs=rngs
            )
            return None, out["loss"]

        return jax.lax.scan(body, None, jnp.arange(K))[1]

    multi = jax.jit(multi)
    key = jax.random.key(1, impl="rbg")
    np.asarray(multi(params, key))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        losses = multi(params, key)
        np.asarray(losses)
        dt = time.perf_counter() - t0
        best = max(best, BATCH * K / dt)
    print(f"{name:40s} {best:8.1f} pairs/s", flush=True)
    return best


if __name__ == "__main__":
    which = set(sys.argv[1:])

    def want(n):
        return not which or n in which

    if want("train_base"):
        run_train("train: flash, no fused-LN")
    if want("train_fln"):
        run_train("train: flash + fused LN", use_fused_layer_norm=True)
    if want("train_saveprobs"):
        run_train("train: flash save_probs", flash_save_probs=True)
    if want("train_xla_attn"):
        run_train("train: XLA attention", use_flash_attention=False)
    if want("fwdbwd"):
        run_fwd_bwd("fwd+bwd (no optimizer), dropout on")
    if want("fwdbwd_det"):
        run_fwd_bwd("fwd+bwd (no optimizer), no dropout", deterministic=True)
    if want("fwd"):
        run_fwd("fwd only, no dropout")
    if want("fwd_drop"):
        run_fwd("fwd only, dropout on", deterministic=False)
    if want("train_noattndrop"):
        run_train(
            "train: attn dropout 0 (hidden on)",
            attention_probs_dropout_prob=0.0, flash_save_probs=True,
        )
    if want("train_erf"):
        run_train("train: erf gelu", hidden_act="gelu", flash_save_probs=True)
    if want("train_fusedxent"):
        run_train("train: fused mlm xent", fused_mlm_xent=True)
    if want("train_fx_erf"):
        run_train("train: fused xent + erf", fused_mlm_xent=True, hidden_act="gelu")
    if want("train_nohid"):
        run_train("train: hidden dropout 0", fused_mlm_xent=True,
                  hidden_dropout_prob=0.0)
    if want("train_nodrop"):
        run_train("train: all dropout 0", fused_mlm_xent=True,
                  hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    if want("train_fx_fln"):
        run_train("train: fused xent + fused LN", fused_mlm_xent=True,
                  use_fused_layer_norm=True)
    if want("train_fastdrop"):
        run_train("train: fast dropout masks", fused_mlm_xent=True,
                  fast_dropout=True)
    if want("train_relu"):
        run_train("train: relu act", fused_mlm_xent=True, hidden_act="relu")
    if want("train_norecomp"):
        run_train("train: ffn_recompute_act off", fused_mlm_xent=True,
                  ffn_recompute_act=False)
    if want("train_128"):
        BATCH = 128
        run_train("train: batch 128", fused_mlm_xent=True)
    if want("train_fd_144"):
        BATCH = 144
        run_train("train: fastdrop batch 144", fused_mlm_xent=True,
                  fast_dropout=True)
        BATCH = 96
    if want("train_fd_192"):
        BATCH = 192
        run_train("train: fastdrop batch 192", fused_mlm_xent=True,
                  fast_dropout=True)
        BATCH = 96
    if want("train_fd_vmem"):
        # current default config (32M scoped vmem comes from Trainer)
        run_train("train: fastdrop vmem32M", fused_mlm_xent=True,
                  fast_dropout=True)
    if want("train_fd_novmem"):
        run_train("train: fastdrop xla-default vmem", fused_mlm_xent=True,
                  fast_dropout=True, compiler_options={})
    if want("train_fd_vmem_sweep"):
        for kib in ("24576", "49152", "65536"):
            run_train(f"train: fastdrop vmem{int(kib)//1024}M", fused_mlm_xent=True,
                      fast_dropout=True,
                      compiler_options={"xla_tpu_scoped_vmem_limit_kib": kib})
    if want("train_fd_fln"):
        run_train("train: fastdrop + fused LN", fused_mlm_xent=True,
                  fast_dropout=True, use_fused_layer_norm=True)
    if want("train_fd_erf"):
        run_train("train: fastdrop + erf gelu", fused_mlm_xent=True,
                  fast_dropout=True, hidden_act="gelu")
    if want("train_fd_lhs"):
        run_train("train: fastdrop + latency-hiding sched", fused_mlm_xent=True,
                  fast_dropout=True,
                  compiler_options={"xla_tpu_scoped_vmem_limit_kib": "32768",
                                    "xla_tpu_enable_latency_hiding_scheduler": "true"})
