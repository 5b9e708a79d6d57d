"""Training CLI — the reference's ``python train.py -config C -folder F``
(``visualbert/models/train.py:64-87``) equivalent:

    python -m visualbert_tpu.train_cli --config configs/vqa_synth.json \\
        [--folder runs/x] [--task vqa] [--restore ckpt]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description="visualbert_tpu trainer")
    p.add_argument("--config", required=True, help="comment-tolerant JSON config")
    p.add_argument("--folder", default=None, help="output folder override")
    p.add_argument("--task", default=None, help="task override")
    p.add_argument("--restore", default=None, help="checkpoint to restore")
    p.add_argument("--eval_only", action="store_true", help="skip training, eval + dump predictions")
    args = p.parse_args(argv)

    from visualbert_tpu.parallel.distributed import initialize_distributed
    from visualbert_tpu.tasks import registry
    from visualbert_tpu.utils.compile_cache import enable_persistent_cache
    from visualbert_tpu.utils.config_io import load_task_config

    # multi-host launch (TPU pod / JAX_COORDINATOR_ADDRESS env): wire all
    # hosts into one runtime before any backend use; no-op single-host.
    # Every host then runs this same CLI and feeds its slice of each batch
    # (docs/DISTRIBUTED.md).
    initialize_distributed()
    enable_persistent_cache()  # recompiles of unchanged programs = disk read

    cfg = load_task_config(
        args.config,
        overrides={
            "folder": args.folder,
            "task": args.task,
            "restore_checkpoint": args.restore,
            "eval_only": True if args.eval_only else None,
        },
    )
    state, result = registry.run(cfg)
    import math

    best = result.best_metric
    print(json.dumps({
        "task": cfg.task,
        # strict JSON: no Infinity/NaN (tasks without an eval split track
        # no best metric)
        "best_metric": best if math.isfinite(best) else None,
        "best_epoch": result.best_epoch,
        "epochs_run": result.epochs_run,
    }))
    return state, result


if __name__ == "__main__":
    main()
