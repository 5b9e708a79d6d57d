"""pjit training engine.

The reference trains with single-process ``DataParallel`` — replicate module,
scatter batch, per-GPU losses ``.mean()``-ed on host, apex fp16, grad
accumulation by delayed ``optimizer.step()``
(``visualbert/models/model_wrapper.py:52-98``). Here the whole step — forward,
backward, microbatch accumulation, BertAdam update — is ONE jit-compiled XLA
program over a (data, model) mesh: batch sharded on ``data``, gradient
all-reduce fused by XLA over ICI, TP-sharded weights on ``model`` when the
mesh has one. bf16 activations need no loss scaling (params/moments fp32).

Microbatch accumulation runs as a ``lax.scan`` inside the step so Python
never sees intermediate grads.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visualbert_tpu.config import OptimizerConfig, TrainConfig
from visualbert_tpu.parallel.mesh import logical_to_mesh_spec
from visualbert_tpu.train import optimizer as opt_lib


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def unbox(tree):
    return jax.tree.map(
        lambda x: x.value if isinstance(x, nn.Partitioned) else x,
        tree,
        is_leaf=lambda x: isinstance(x, nn.Partitioned),
    )


def param_specs_from_boxed(tree):
    """PartitionSpec tree (mesh axes) from a boxed (Partitioned) param tree."""
    return jax.tree.map(
        lambda x: logical_to_mesh_spec(x.names) if isinstance(x, nn.Partitioned) else P(),
        tree,
        is_leaf=lambda x: isinstance(x, nn.Partitioned),
    )


def replicated_spec_tree(tree):
    return jax.tree.map(lambda _: P(), tree)


@dataclasses.dataclass
class Trainer:
    """Builds and owns the jitted train/eval steps for one task model.

    ``model.apply`` must accept ``(variables, batch, deterministic, rngs=...)``
    and return a dict with scalar ``loss`` plus metric scalars.
    """

    model: nn.Module
    opt_config: OptimizerConfig
    train_config: TrainConfig
    mesh: Mesh
    extra_loss_fn: Optional[Callable[[Dict], jax.Array]] = None

    def __post_init__(self):
        self.tx = opt_lib.from_config(self.opt_config)
        self._train_step = None
        self._eval_step = None
        self._specs = None

    # ---- init ----

    def init_state(self, rng: jax.Array, example_batch: Dict[str, np.ndarray]) -> TrainState:
        example = jax.tree.map(jnp.asarray, example_batch)

        def init_fn(r):
            variables = self.model.init({"params": r, "dropout": r}, example)
            params = unbox(variables["params"])
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                opt_state=self.tx.init(params),
            )

        boxed = jax.eval_shape(
            lambda r: self.model.init({"params": r, "dropout": r}, example), rng
        )["params"]
        pspecs = param_specs_from_boxed(boxed)
        # opt_state moments mirror the param tree → same specs
        abstract_opt = jax.eval_shape(lambda: self.tx.init(unbox(boxed)))
        opt_specs = _mirror_param_specs(abstract_opt, pspecs)
        state_specs = TrainState(step=P(), params=pspecs, opt_state=opt_specs)
        self._specs = state_specs

        out_shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), state_specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        with self.mesh:
            state = jax.jit(init_fn, out_shardings=out_shardings)(rng)
        return state

    # ---- steps ----

    def _build_loss_fn(self):
        def loss_fn(params, batch, dropout_rng):
            out = self.model.apply(
                {"params": params},
                batch,
                deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            loss = out["loss"]
            if self.extra_loss_fn is not None:
                loss = loss + self.extra_loss_fn(out)
            metrics = {
                k: v for k, v in out.items()
                if isinstance(v, jax.Array) and v.ndim == 0
            }
            metrics["loss"] = loss
            return loss.astype(jnp.float32), metrics

        return loss_fn

    def compiler_options(self):
        """XLA options for the step executables. TPU-only flags are dropped
        on other backends (CPU tests). Measured: scoped-VMEM 32 MB is the
        best setting for the Pallas kernels at BERT-base shapes (sweep in
        scripts/perf_ablate.py train_fd_vmem_sweep)."""
        import jax as _jax

        opts = self.train_config.compiler_options
        if opts is None:
            opts = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
        if _jax.devices()[0].platform != "tpu":
            opts = {k: v for k, v in opts.items() if not k.startswith("xla_tpu_")}
        return opts or None

    def train_step_fn(self, nested: bool = False):
        """The jitted train step. ``nested=True`` omits compiler_options —
        jax forbids them on a jit traced inside another jit (multi_step_fn,
        bench loops); pass it whenever you wrap this step in an outer jit."""
        cache = "_train_step_nested" if nested else "_train_step"
        cached = getattr(self, cache, None)
        if cached is not None:
            return cached
        assert self._specs is not None, "call init_state() before train_step_fn()"

        accum = self.train_config.gradient_accumulation_steps
        loss_fn = self._build_loss_fn()
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(state: TrainState, batch, rng):
            rng = jax.random.fold_in(rng, state.step)

            if accum > 1:
                # batch leaves are [accum, micro, ...]
                def scan_body(carry, micro):
                    grads_acc, metrics_acc, i = carry
                    (_, metrics), grads = grad_fn(
                        state.params, micro, jax.random.fold_in(rng, i)
                    )
                    grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                    metrics_acc = jax.tree.map(jnp.add, metrics_acc, metrics)
                    return (grads_acc, metrics_acc, i + 1), None

                zero_g = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), state.params
                )
                micro0 = jax.tree.map(lambda x: x[0], batch)
                (grads, metrics, _), _ = jax.lax.scan(
                    scan_body,
                    (zero_g, _zero_metrics(grad_fn, state.params, micro0, rng), jnp.int32(0)),
                    batch,
                )
                grads = jax.tree.map(lambda g: g / accum, grads)
                metrics = jax.tree.map(lambda m: m / accum, metrics)
            else:
                (_, metrics), grads = grad_fn(state.params, batch, rng)

            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            if self.train_config.nan_guard:
                # keep the old state when this batch produced a non-finite
                # loss; the step counter still advances so schedules move on
                ok = jnp.isfinite(metrics["loss"])
                new_params = jax.tree.map(
                    lambda new, old: jnp.where(ok, new, old), new_params, state.params
                )
                new_opt = jax.tree.map(
                    lambda new, old: jnp.where(ok, new, old)
                    if hasattr(new, "shape") else new,
                    new_opt, state.opt_state,
                )
                metrics["skipped_nonfinite"] = (~ok).astype(jnp.float32)
            new_state = TrainState(
                step=state.step + 1, params=new_params, opt_state=new_opt
            )
            return new_state, metrics

        data_spec = P("data")
        with self.mesh:
            jitted = jax.jit(
                step,
                in_shardings=(
                    jax.tree.map(
                        lambda s: NamedSharding(self.mesh, s), self._specs,
                        is_leaf=lambda x: isinstance(x, P),
                    ),
                    None,  # batch: let jit use arrays' shardings
                    None,
                ),
                donate_argnums=(0,),
                compiler_options=None if nested else self.compiler_options(),
            )
        setattr(self, cache, jitted)
        return jitted

    def multi_step_fn(self, n_steps: int, unroll: int = 1,
                      device_stack: bool = False):
        """K train steps fused into ONE program via lax.scan over a stacked
        batch [K, B, ...]; returns (state, stacked metrics). Cuts host↔device
        round trips to 1/K — the production inner loop on remote TPUs.
        ``unroll`` duplicates the scan body so the scheduler overlaps step
        i's optimizer write-back with step i+1's prefetches (+2.4% measured
        at unroll=3 on v5e, plateau beyond — BASELINE.md).

        ``device_stack=True`` changes the signature to (state, [K batch
        dicts], rng): each batch is device_put individually (transfers
        overlap preceding compute) and the [K, ...] stack happens ON DEVICE
        inside the jit — the host never materializes the K-batch array.
        Measured on the 1-core bench host the host-side np.stack of the
        K-group was a full extra pass over ~630 MB (~75 ms/step at K=8,
        scripts/e2e_bench.py); device HBM does that copy ~800x faster."""
        inner = self.train_step_fn(nested=True)

        def scan_steps(state, stacked, rng):
            def body(st, batch):
                # the inner step folds rng by state.step, so passing rng
                # through unchanged reproduces the per-step dispatch chain
                # EXACTLY — K-step dispatch is bit-identical to K single
                # dispatches with the same key
                st, metrics = inner(st, batch, rng)
                return st, metrics

            return jax.lax.scan(body, state, stacked, length=n_steps, unroll=unroll)

        if device_stack:
            def multi(state, batches, rng):
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
                return scan_steps(state, stacked, rng)

            # batches are NOT donated: XLA cannot alias buffers feeding the
            # stack (tested — donation emits "not usable" warnings only)
            donate = (0,)
        else:
            multi, donate = scan_steps, (0,)

        with self.mesh:
            return jax.jit(multi, donate_argnums=donate,
                           compiler_options=self.compiler_options())

    def eval_step_fn(self):
        if self._eval_step is not None:
            return self._eval_step

        def step(params, batch):
            return self.model.apply({"params": params}, batch, deterministic=True)

        with self.mesh:
            self._eval_step = jax.jit(step, compiler_options=self.compiler_options())
        return self._eval_step

    def reshard_state(self, state: TrainState) -> TrainState:
        """Re-place a state's leaves onto this trainer's mesh shardings.

        Restored checkpoints (orbax on a different topology, torch imports —
        plain numpy) arrive unsharded; on a TP mesh the eval path would then
        silently run replicated. Explicit device_put restores the intended
        layout (no-op when already placed correctly)."""
        assert self._specs is not None, "call init_state() before reshard_state()"

        def put(x, s):
            if hasattr(x, "shape"):
                return jax.device_put(x, NamedSharding(self.mesh, s))
            return x

        return jax.tree.map(put, state, self._specs)

    # ---- data placement ----

    def shard_batch(self, batch: Dict[str, np.ndarray], stacked: bool = False,
                    lead_axes: Optional[int] = None):
        """stacked=True for [accum, micro, ...] microbatch stacks — the batch
        axis to shard over 'data' is then axis 1. ``lead_axes`` generalizes:
        the number of unsharded leading axes before the batch axis (e.g. 2
        for a [K, accum, micro, ...] multi-step × microbatch stack).

        Single-process: a plain device_put onto the mesh sharding.
        Multi-process (``jax.distributed`` launch): the input arrays are this
        host's SLICE of the global batch (``Batcher(process_shard=...)`` /
        ``parallel.distributed.local_batch_slice``) and the global array is
        assembled with ``jax.make_array_from_process_local_data`` — a
        host-global device_put would fail on non-addressable devices.
        Underscore-prefixed keys are host-side metadata, never device inputs."""
        if lead_axes is None:
            lead_axes = 1 if stacked else 0
        spec = P(*([None] * lead_axes), "data")
        sharding = NamedSharding(self.mesh, spec)
        nproc = jax.process_count()

        def put(x):
            x = np.asarray(x)
            if nproc == 1:
                return jax.device_put(x, sharding)
            global_shape = (
                x.shape[:lead_axes]
                + (x.shape[lead_axes] * nproc,)
                + x.shape[lead_axes + 1:]
            )
            return jax.make_array_from_process_local_data(sharding, x, global_shape)

        return {
            k: put(v) for k, v in batch.items()
            if v is not None and not k.startswith("_")
        }


def _mirror_param_specs(abstract_opt_state, pspecs):
    """Give optimizer-state leaves that mirror a param's shape that param's
    spec; everything else replicated."""
    flat_params = {}
    for path, spec in jax.tree_util.tree_flatten_with_path(pspecs)[0]:
        flat_params[_shape_key(path)] = spec

    def assign(path, leaf):
        # match by trailing path segments (m/v trees share param paths)
        key = _shape_key(path)
        for pkey, spec in flat_params.items():
            if key[-len(pkey):] == pkey:
                return spec
        return P()

    leaves, treedef = jax.tree_util.tree_flatten_with_path(abstract_opt_state)
    specs = [assign(path, leaf) for path, leaf in leaves]
    return jax.tree_util.tree_unflatten(treedef, specs)


def _shape_key(path):
    return tuple(str(p) for p in path)


def _zero_metrics(grad_fn, params, micro, rng):
    metric_shape = jax.eval_shape(lambda p, b: grad_fn(p, b, rng)[0][1], params, micro)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), metric_shape)
