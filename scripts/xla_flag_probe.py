"""Probe which XLA:TPU per-executable compile options this libtpu accepts,
then (optionally) time promising ones on the real bench step.

Phase 1 (default): compile a tiny jit with each candidate option name and
report accepted/rejected — unknown option names raise at compile time, so
this is a cheap existence test.

Usage: python scripts/xla_flag_probe.py            # probe names
       python scripts/xla_flag_probe.py bench      # time accepted ones on the bench step
"""

import sys

import numpy as np

sys.path.insert(0, ".")

# name -> value to try (string form, as compiler_options wants)
CANDIDATES = {
    "xla_tpu_scoped_vmem_limit_kib": "49152",
    "xla_tpu_enable_latency_hiding_scheduler": "true",
    "xla_tpu_aggressive_opt_barrier_removal": "true",
    "xla_tpu_dot_dot_fusion": "true",
    "xla_tpu_dot_dot_fusion_duplicated": "true",
    "xla_tpu_enable_dot_strength_reduction": "false",
    "xla_tpu_rwb_fusion": "false",
    "xla_tpu_enable_multi_level_nested_loop_fusion": "true",
    "xla_tpu_nested_dot_fusion": "true",
    "xla_tpu_enable_aggressive_broadcast_priority_update": "true",
    "xla_tpu_copy_elision_analysis_allowance": "1000000",
    "xla_tpu_licm_size_inflation_ratio": "2.0",
    "xla_tpu_order_dot_after_layout": "true",
    "xla_tpu_memory_bound_loop_optimizer_options": "enabled:true",
    "xla_tpu_perform_spmd_cse_prevention": "false",
    "xla_tpu_vector_load_fusion_window": "2048",
    "xla_tpu_vector_store_fusion_window": "1024",
    "xla_tpu_async_copy_bandwidth_scaling_factor": "1.0",
    "xla_tpu_enable_async_copy_fusion": "true",
    "xla_tpu_reduce_loop_fusion_dup_with_unfusable_user": "true",
    "xla_tpu_use_repeated_instance_for_preferred_prefetch_time": "true",
    "xla_tpu_enforce_prefetch_fifo_order": "true",
    "xla_tpu_prefetch_interval_picker_size_override": "67108864",
    "xla_jf_rematerialization_percent_shared_memory_limit": "100",
    "xla_tpu_allocate_scoped_vmem_at_same_offset": "false",
    "xla_tpu_scavenge_vmem_for_fusions": "true",
    "xla_tpu_enable_vmem_to_vmem_dmas": "true",
    "xla_tpu_msa_inefficient_use_to_copy_ratio": "0.5",
    "xla_tpu_dot_emitter_split_k": "true",
    "xla_latency_hiding_scheduler_rerun": "2",
}


def probe():
    import jax
    import jax.numpy as jnp

    x = jnp.ones((128, 128), jnp.bfloat16)
    accepted, rejected = [], []
    for name, val in CANDIDATES.items():
        try:
            f = jax.jit(lambda a: a @ a, compiler_options={name: val})
            np.asarray(f(x))
            accepted.append(name)
            print(f"ACCEPT {name}={val}", flush=True)
        except Exception as e:
            rejected.append(name)
            msg = str(e).split("\n")[0][:100]
            print(f"reject {name}: {msg}", flush=True)
    print("\naccepted:", accepted)


def bench_flags():
    """Time the real bench step under each accepted flag (singly, on top of
    the production options). Uses K=12/unroll=1 — 5x lighter to trace and
    compile than the headline K=60/unroll=3; relative flag effects carry."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import bench as bench_mod

    base = None
    trials = [
        ("BASE", {}),
        ("vmem48", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ]
    for arg in sys.argv[2:]:
        k, _, v = arg.partition("=")
        trials.append((k, {k: v}))
    from visualbert_tpu.train import trainer as trainer_mod

    for tag, extra in trials:
        orig = trainer_mod.Trainer.compiler_options

        def patched(self, _orig=orig, _extra=extra):
            opts = dict(_orig(self))
            opts.update(_extra)
            return opts

        trainer_mod.Trainer.compiler_options = patched
        try:
            v = bench_mod.measure(96, scan_layers=False, hidden_act="gelu",
                                  fused_mlm_xent=True, fast_dropout=True,
                                  K=12, repeats=3, unroll=1)
            if base is None:
                base = v
            print(f"{tag:12s} {v:8.1f} pairs/s ({v / base * 100 - 100:+.1f}%)", flush=True)
        except Exception as e:
            print(f"{tag:12s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        finally:
            trainer_mod.Trainer.compiler_options = orig


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "bench":
        bench_flags()
    else:
        probe()
