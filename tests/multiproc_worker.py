"""Worker for tests/test_multiprocess.py — runs the production ``fit`` loop
(synthetic NLVR2, 4-device data mesh) either as ONE process with 4 CPU
devices or as one rank of a 2-process ``jax.distributed`` launch with 2
local devices each, and dumps the per-epoch metric history to JSON.

The single- and multi-process runs execute the SAME global program over the
same global batches (Batcher(process_shard=...) slices per host), so their
histories must match to fp32 tolerance — the TPU-pod analogue of testing
multi-node without a cluster (SURVEY.md §4).

Usage: python tests/multiproc_worker.py <single|multi> <proc_id> <port> \
           <out_json> [ckpt_dir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mode, proc_id, port, out_path = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    ckpt_dir = sys.argv[5] if len(sys.argv) > 5 else None
    n_local = 4 if mode == "single" else 2
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    # share the suite's persistent compile cache: the fit program is
    # identical across runs, and cold XLA-CPU compiles dominate this
    # test's wall time (concurrent writers are safe — atomic renames)
    from visualbert_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache("/tmp/visualbert_test_jax_cache")
    if mode == "multi":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2,
            process_id=proc_id,
        )
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np

    from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
    from visualbert_tpu.data.datasets import nlvr2 as nlvr_ds
    from visualbert_tpu.data.pipeline import Batcher
    from visualbert_tpu.data.tokenization import BertTokenizer
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.parallel.distributed import process_shard
    from visualbert_tpu.parallel.mesh import create_mesh
    from visualbert_tpu.train.loop import fit
    from visualbert_tpu.train.trainer import Trainer

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "?"] + [
        f"w{i}" for i in range(60)
    ]
    tok = BertTokenizer({w: i for i, w in enumerate(words)})
    ann, feats = nlvr_ds.make_synthetic(70, tok, feat_dim=16)
    mk = lambda a: nlvr_ds.NLVR2Dataset(
        a, feats, tok, max_seq_length=12, max_regions_per_image=6
    )
    cfg = VisualBertConfig.tiny(
        vocab_size=len(words), visual_embedding_dim=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = VisualBertForTask(cfg, head_type="nlvr")
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(learning_rate=1e-3, schedule=None, t_total=-1),
        train_config=TrainConfig(num_train_epochs=2, log_every=0),
        mesh=create_mesh((4, 1)),
    )
    shard = process_shard()
    assert (shard is None) == (mode == "single"), (shard, mode)
    # global batch 8; eval split 22 → non-dividing, exercises pad_final +
    # _real_count weighting across hosts
    train_b = Batcher(mk(ann[:48]), 8, seed=0, process_shard=shard)
    eval_b = Batcher(
        mk(ann[48:]), 8, shuffle=False, seed=0, drop_last=False,
        pad_final=True, process_shard=shard,
    )
    example = next(iter(train_b.epoch(0)))
    state = trainer.init_state(jax.random.PRNGKey(0), example)
    state, result = fit(
        trainer, state,
        train_data=lambda e: train_b.epoch(e),
        eval_data=lambda: eval_b.epoch(0),
        checkpoint_dir=ckpt_dir,
    )
    payload = {
        "mode": mode,
        "process": proc_id,
        "history": result.history,
        "final_step": int(jax.device_get(state.step)),
    }
    with open(f"{out_path}.{proc_id}" if mode == "multi" else out_path, "w") as f:
        json.dump(payload, f)
    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
