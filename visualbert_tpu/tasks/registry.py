"""Task drivers: build (model, datasets, evaluator) for each supported task
and run the fit loop — the equivalents of the reference entry points
``visualbert/models/train.py`` (dataset dispatch at train.py:148-191),
``unsupervised_visualbert/src/pretrain/lxmert_pretrain.py`` and
``src/tasks/vqa.py``.

Every task supports ``data: {"synthetic": N}`` for hardware smoke runs and
real-data dicts with file paths (documented per builder).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from visualbert_tpu.data.pipeline import Batcher, prefetch
from visualbert_tpu.data.tokenization import BertTokenizer
from visualbert_tpu.models.visualbert import VisualBertForTask
from visualbert_tpu.parallel.mesh import create_mesh
from visualbert_tpu.train.loop import fit
from visualbert_tpu.train.trainer import Trainer
from visualbert_tpu.utils.config_io import TaskConfig
from visualbert_tpu.utils.logging import add_run_folder, get_logger

log = get_logger(__name__)

TASKS: Dict[str, Callable] = {}


def register(name):
    def deco(fn):
        TASKS[name] = fn
        return fn

    return deco


def _tokenizer(cfg: TaskConfig) -> BertTokenizer:
    vocab_file = cfg.data.get("vocab_file")
    if vocab_file:
        # C++ WordPiece fast path when buildable (byte-exact with the Python
        # tokenizer; transparently falls back per-string on non-ASCII)
        from visualbert_tpu.data.fast_tokenizer import FastBertTokenizer
        from visualbert_tpu.data.tokenization import load_vocab

        return FastBertTokenizer(load_vocab(vocab_file))
    if "synthetic" not in cfg.data:
        # real-data configs must name a vocabulary — training over the toy
        # fallback would silently produce garbage (same philosophy as the
        # answer-table guard in run_unsup_pretrain; the reference always
        # loads a real vocab via from_pretrained, tokenization.py:126)
        raise ValueError(
            "data.vocab_file is required for real-data configs (the "
            "synthetic toy vocabulary is only used when data.synthetic is "
            "set); point it at the bert-base-uncased vocab.txt"
        )
    # synthetic fallback vocabulary
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "?"] + [
        f"w{i}" for i in range(100)
    ]
    return BertTokenizer({w: i for i, w in enumerate(words)})


def _process_shard():
    """(process_index, process_count) under a multi-host launch, else None —
    every Batcher walks the same global schedule and feeds this host's slice
    (SURVEY §2.3 plan: same pjit program, per-host sharded input)."""
    from visualbert_tpu.parallel.distributed import process_shard

    return process_shard()


def _trainer(cfg: TaskConfig, model) -> Trainer:
    return Trainer(
        model=model,
        opt_config=cfg.optimizer,
        train_config=cfg.train,
        mesh=create_mesh(cfg.train.mesh_shape),
    )


def _default_frozen_pooler(cfg: TaskConfig) -> TaskConfig:
    """Pretraining tasks: the reference excludes the pooler from
    optimization (model_wrapper.py:104). Applied only when the config left
    ``optimizer.frozen`` unset (None); an explicit ``[]`` trains everything."""
    if cfg.optimizer.frozen is not None:
        return cfg
    import dataclasses as _dc

    return _dc.replace(
        cfg, optimizer=_dc.replace(cfg.optimizer, frozen=("pooler",))
    )


def _run_fit(cfg: TaskConfig, trainer, train_ds, eval_ds, val_metric="accuracy",
             dump_hook=None, val_metric_higher_is_better=None, out_select=None):
    if val_metric_higher_is_better is None:
        val_metric_higher_is_better = val_metric != "loss"
    shard = _process_shard()
    train_b = Batcher(
        train_ds, cfg.train.train_batch_size, seed=cfg.train.seed,
        num_workers=cfg.train.num_workers, process_shard=shard,
    )
    eval_b = (
        Batcher(
            eval_ds, cfg.train.eval_batch_size, shuffle=False,
            seed=cfg.train.seed, drop_last=False, pad_final=True,
            num_workers=cfg.train.num_workers, process_shard=shard,
        )
        if eval_ds is not None
        else None
    )
    example = next(iter(train_b.epoch(0)))
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed), example)

    if cfg.restore_checkpoint:
        state = _restore(cfg, trainer, state)

    if cfg.eval_only:
        assert eval_b is not None, "eval_only needs an eval split"
        metrics = evaluate(trainer, state, eval_b, dump_hook, cfg.folder,
                           out_select=out_select)
        from visualbert_tpu.train.loop import FitResult

        return state, FitResult(
            best_metric=metrics.get("accuracy", float("nan")),
            best_epoch=-1, epochs_run=0, history=[metrics],
        )

    state, result = fit(
        trainer,
        state,
        train_data=lambda e: prefetch(train_b.epoch(e)),
        eval_data=(lambda: eval_b.epoch(0)) if eval_b else None,
        checkpoint_dir=os.path.join(cfg.folder, "ckpt"),
        val_metric=val_metric,
        val_metric_higher_is_better=val_metric_higher_is_better,
        rng_seed=cfg.train.seed,
    )
    if dump_hook is not None and eval_b is not None:
        evaluate(trainer, state, eval_b, dump_hook, cfg.folder,
                 out_select=out_select)
    return state, result


def evaluate(trainer, state, eval_b, dump_hook, folder,
             out_select=None) -> Dict[str, float]:
    """Run the eval split once; collect scalar metrics and hand every
    (batch, outputs) pair to ``dump_hook`` for prediction files — the
    reference's per-task result dumping (train.py:327-396).

    ``out_select(out) -> dict`` reduces the output tree ON DEVICE before the
    host transfer — tasks whose raw outputs are huge (vqa_advanced's
    [B, T, 30522] logits ≈ 15 MB/example) must shrink them (e.g. argmax)
    here or the collected eval split exhausts host memory."""
    from visualbert_tpu.train.loop import MetricAccumulator

    eval_fn = trainer.eval_step_fn()
    acc = MetricAccumulator()
    collected = []
    nproc = jax.process_count()
    for batch in eval_b.epoch(0):
        out = eval_fn(state.params, trainer.shard_batch(batch))
        if out_select is not None:
            out = out_select(out)
        if nproc > 1:
            # outputs are global (non-addressable) arrays: allgather, then
            # keep this host's rows so (batch, out) pairs stay aligned —
            # each host dumps its own slice of the split (docs/DISTRIBUTED.md)
            from jax.experimental import multihost_utils

            bs_local = len(next(
                v for k, v in batch.items()
                if v is not None and not k.startswith("_")
            ))

            def fetch(a):
                if not hasattr(a, "shape"):
                    return a
                g = np.asarray(multihost_utils.process_allgather(a, tiled=True))
                if g.ndim and g.shape[0] == bs_local * nproc:
                    s = bs_local * jax.process_index()
                    return g[s : s + bs_local]
                return g

            out = jax.tree.map(fetch, out)
        else:
            out = jax.device_get(out)
        # weight by the REAL example count: model scalars are weighted means
        # over non-duplicate rows (example_weight from Batcher pad_final),
        # so Σ(scalar·real)/Σreal is the exact split-level metric.
        # _real_count is the GLOBAL count (per-host slices differ on the tail)
        if "_real_count" in batch:
            bs = float(batch["_real_count"])
        elif "example_weight" in batch:
            bs = float(np.sum(batch["example_weight"]))
        else:
            bs = len(next(iter(batch.values())))
        acc.update(
            {k: v for k, v in out.items() if hasattr(v, "ndim") and v.ndim == 0}, bs
        )
        if dump_hook is not None:
            collected.append((batch, out))
    metrics = acc.means()
    if dump_hook is not None:
        extra = dump_hook(collected, folder)
        if extra:
            metrics.update(extra)
    log.info("eval: %s", {k: round(v, 4) for k, v in metrics.items()})
    return metrics


def _restore(cfg: TaskConfig, trainer, state):
    path = cfg.restore_checkpoint
    if path.endswith((".th", ".pth", ".bin")):
        from visualbert_tpu.tools.import_torch import (
            convert_state_dict, load_torch_file, maybe_special_initialize, merge_into,
        )

        flat = load_torch_file(path)
        loaded = maybe_special_initialize(convert_state_dict(flat, cfg.model))
        params = merge_into(state.params, loaded)
        state = state.replace(params=params)
        log.info("restored torch checkpoint %s", path)
    else:
        from visualbert_tpu.utils.checkpoint import CheckpointManager

        state = CheckpointManager(path).restore(state)
        log.info("restored orbax checkpoint %s", path)
    # restored leaves are host/unsharded — re-place onto the trainer's mesh
    # shardings so TP eval doesn't silently run replicated
    return trainer.reshard_state(state)


# ---- task builders ----


@register("vqa")
def run_vqa(cfg: TaskConfig):
    from visualbert_tpu.data.datasets import vqa as vqa_ds

    tok = _tokenizer(cfg)
    d = cfg.data
    if "synthetic" in d:
        ann, feats, vocab = vqa_ds.make_synthetic(
            int(d["synthetic"]), tok,
            n_answers=int(d.get("n_answers", 16)),
            feat_dim=cfg.model.visual_embedding_dim,
        )
        split = int(len(ann) * 0.8)
        train_ann, eval_ann = ann[:split], ann[split:]
    else:
        # real data: imdb-style json lists + a feature source
        from visualbert_tpu.data.features import H5Features, NpyFolderFeatures

        with open(d["train_annotations"]) as f:
            train_ann = json.load(f)
        with open(d["eval_annotations"]) as f:
            eval_ann = json.load(f)
        feats = (
            H5Features(d["features_h5"])
            if "features_h5" in d
            else NpyFolderFeatures(d["features_dir"])
        )
        vocab = vqa_ds.AnswerVocab.from_file(d["answer_vocab"])

    mk = lambda ann: vqa_ds.VQADataset(
        ann, feats, tok, vocab,
        max_seq_length=int(d.get("max_seq_length", 128)),
        max_regions=int(d.get("max_regions", 100)),
    )
    model = VisualBertForTask(cfg.model, head_type="vqa", num_answers=len(vocab))
    trainer = _trainer(cfg, model)

    def dump(collected, folder):
        # leaderboard json (reference vqa_dataset.py:290-302)
        evaluator = vqa_ds.VQAEvaluator(vocab)
        qids, logits = [], []
        for batch, out in collected:
            qids.extend(int(q) for q in batch["question_id"])
            logits.append(np.asarray(out["logits"], np.float32))
        if logits:
            evaluator.dump(qids, np.concatenate(logits), os.path.join(folder, "vqa_predictions.json"))
        return {}

    return _run_fit(cfg, trainer, mk(train_ann), mk(eval_ann), dump_hook=dump)


@register("vqa_advanced")
def run_vqa_advanced(cfg: TaskConfig):
    """VQA answer-as-MLM: the answer's wordpieces sit in [MASK] slots after
    the question and are predicted by the tied MLM head (reference head
    modeling.py:1527-1554, dataset mode vqa_dataset.py:158-184, dispatch
    train.py:148-191). Eval = masked-token exact match (answer-token
    accuracy) + decoded answer-string dump."""
    from visualbert_tpu.data.datasets import vqa as vqa_ds

    tok = _tokenizer(cfg)
    d = cfg.data
    if "synthetic" in d:
        ann, feats, _ = vqa_ds.make_synthetic(
            int(d["synthetic"]), tok,
            n_answers=int(d.get("n_answers", 8)),
            feat_dim=cfg.model.visual_embedding_dim,
        )
        split = int(len(ann) * 0.8)
        train_ann, eval_ann = ann[:split], ann[split:]
    else:
        from visualbert_tpu.data.features import H5Features, NpyFolderFeatures

        with open(d["train_annotations"]) as f:
            train_ann = json.load(f)
        with open(d["eval_annotations"]) as f:
            eval_ann = json.load(f)
        feats = (
            H5Features(d["features_h5"])
            if "features_h5" in d
            else NpyFolderFeatures(d["features_dir"])
        )
    mk = lambda ann: vqa_ds.VQADataset(
        ann, feats, tok, answer_vocab=None, advanced=True,
        max_seq_length=int(d.get("max_seq_length", 128)),
        max_regions=int(d.get("max_regions", 100)),
    )
    model = VisualBertForTask(cfg.model, head_type="vqa_advanced")
    trainer = _trainer(cfg, model)
    inv_vocab = {v: k for k, v in tok.vocab.items()}

    def select(out):
        # on-device argmax: never ship [B, T, 30522] fp32 logits to host
        out = dict(out)
        out["pred_ids"] = jnp.argmax(out.pop("logits"), axis=-1).astype(jnp.int32)
        return out

    def dump(collected, folder):
        # decode the predicted answer tokens at the [MASK] slots; pred_ids
        # is [B, P] over the GATHERED mlm_positions (the dataset's
        # fixed-budget slot index — pad slots carry label -1 and drop out)
        preds = []
        for batch, out in collected:
            ids = np.asarray(out["pred_ids"])
            labels = np.asarray(batch["masked_lm_labels"])
            positions = np.asarray(batch["mlm_positions"])
            for b in range(len(ids)):
                glabels = labels[b][positions[b]]
                toks = [
                    inv_vocab.get(int(ids[b, j]), "[UNK]")
                    for j in np.flatnonzero(glabels != -1)
                ]
                preds.append({
                    "question_id": int(batch["question_id"][b]),
                    "answer": " ".join(toks).replace(" ##", ""),
                })
        with open(os.path.join(folder, "vqa_advanced_predictions.json"), "w") as f:
            json.dump(preds, f)
        return {}

    return _run_fit(
        cfg, trainer, mk(train_ann), mk(eval_ann),
        val_metric="mlm_accuracy", dump_hook=dump, out_select=select,
    )


@register("coco_pretrain")
def run_coco_pretrain(cfg: TaskConfig):
    from visualbert_tpu.data.datasets import coco as coco_ds

    tok = _tokenizer(cfg)
    d = cfg.data
    if "synthetic" in d:
        ann, feats = coco_ds.make_synthetic(
            int(d["synthetic"]), tok, feat_dim=cfg.model.visual_embedding_dim
        )
    else:
        with open(d["annotations"]) as f:
            ann = json.load(f)
        from visualbert_tpu.data.features import H5Features, NpyFolderFeatures

        feats = (
            H5Features(d["features_h5"])
            if "features_h5" in d
            else NpyFolderFeatures(d["features_dir"])
        )
    ds = coco_ds.CocoCaptionsDataset(
        ann, feats, tok,
        max_seq_length=int(d.get("max_seq_length", 128)),
        max_regions=int(d.get("max_regions", 100)),
        two_sentence=bool(d.get("two_sentence", True)),
    )
    model = VisualBertForTask(cfg.model, head_type="pretraining")
    cfg = _default_frozen_pooler(cfg)
    trainer = _trainer(cfg, model)
    return _run_fit(cfg, trainer, ds, None, val_metric="loss")


@register("vcr_coco_pretrain")
def run_vcr_coco_pretrain(cfg: TaskConfig):
    """COCO-caption MLM + alignment pretraining THROUGH the TPU-resident
    detector (the VCR pipeline's pretraining stage — reference r2c mode,
    coco_dataset.py:235-340, configs/vcr/coco-pre-train.json). Supports the
    reference's ``expand_coco`` train+val-minus-minival expansion
    (coco_dataset.py:422-441)."""
    from visualbert_tpu.data.datasets import coco as coco_ds
    from visualbert_tpu.models.vcr import VisualBertDetectorModel

    tok = _tokenizer(cfg)
    d = cfg.data
    if "synthetic" in d:
        ann, images = coco_ds.make_synthetic_detector(int(d["synthetic"]), tok)
        split = int(len(ann) * 0.8)
        train_ann, eval_ann = ann[:split], ann[split:]
    else:
        with open(d["train_annotations"]) as f:
            train_ann = json.load(f)
        eval_ann = None
        if "eval_annotations" in d:
            with open(d["eval_annotations"]) as f:
                eval_ann = json.load(f)
        if d.get("expand_coco") and eval_ann is not None:
            with open(d["minival_image_ids"]) as f:
                mini = json.load(f)
            train_ann, eval_ann = coco_ds.expand_coco(
                train_ann, eval_ann, mini,
                exclude_minival=bool(d.get("exclude_minival", True)),
            )
        from visualbert_tpu.utils.images import ImageFolderStore

        class_names = None
        if "class_names" in d:
            with open(d["class_names"]) as f:
                class_names = [line.strip() for line in f if line.strip()]
        images = ImageFolderStore(
            d["images_dir"], target=int(d.get("image_size", 768)),
            class_names=class_names,
        )
    mk = lambda ann: coco_ds.CocoDetectorDataset(
        ann, images, tok,
        max_boxes=int(d.get("max_boxes", 20)),
        max_seq_length=int(d.get("max_seq_length", 128)),
        two_sentence=bool(d.get("two_sentence", True)),
    )
    model = VisualBertDetectorModel(
        cfg.model,
        head_type="pretraining",
        final_dim=int(d.get("final_dim", 512)),
        cnn_loss_ratio=float(d.get("cnn_loss_ratio", 0.1)),
        trunk_blocks=tuple(d.get("trunk_blocks", (3, 4, 6))),
        layer4_blocks=int(d.get("layer4_blocks", 3)),
        width_div=int(d.get("width_div", 1)),
    )
    cfg = _default_frozen_pooler(cfg)
    trainer = _trainer(cfg, model)
    return _run_fit(
        cfg, trainer, mk(train_ann),
        mk(eval_ann) if eval_ann else None, val_metric="loss",
    )


@register("nlvr2")
def run_nlvr2(cfg: TaskConfig):
    from visualbert_tpu.data.datasets import nlvr2 as nlvr_ds

    tok = _tokenizer(cfg)
    d = cfg.data
    if "synthetic" in d:
        ann, feats = nlvr_ds.make_synthetic(
            int(d["synthetic"]), tok, feat_dim=cfg.model.visual_embedding_dim
        )
        split = int(len(ann) * 0.8)
        train_ann, eval_ann = ann[:split], ann[split:]
    else:
        def read_jsonl(p):
            with open(p) as f:
                return [json.loads(line) for line in f if line.strip()]

        train_ann = read_jsonl(d["train_annotations"])
        eval_ann = read_jsonl(d["eval_annotations"])
        from visualbert_tpu.data.features import H5Features

        feats = H5Features(d["features_h5"])
    mk = lambda ann: nlvr_ds.NLVR2Dataset(
        ann, feats, tok,
        max_seq_length=int(d.get("max_seq_length", 128)),
        max_regions_per_image=int(d.get("max_regions_per_image", 72)),
    )
    model = VisualBertForTask(cfg.model, head_type="nlvr")
    trainer = _trainer(cfg, model)

    # identifiers are recovered through the example_index field shipped
    # INSIDE each batch (no coupling to eval iteration order; tail-padding
    # duplicates collapse in the dict)
    eval_ids = [a["identifier"] for a in eval_ann]
    labels = {a["identifier"]: int(a["label"]) for a in eval_ann if "label" in a}

    def dump(collected, folder):
        from visualbert_tpu.utils.nlvr2_eval import accuracy, consistency, write_csv_report

        preds = {}
        for batch, out in collected:
            p = np.asarray(out["logits"]).argmax(-1)
            idx = np.asarray(batch["example_index"])
            for j in range(len(p)):
                preds[eval_ids[int(idx[j])]] = int(p[j])
        write_csv_report(os.path.join(folder, "nlvr2_report.csv"), sorted(preds.items()))
        if labels:
            return {
                "official_accuracy": accuracy(preds, labels),
                "consistency": consistency(preds, labels),
            }
        return {}

    return _run_fit(cfg, trainer, mk(train_ann), mk(eval_ann), dump_hook=dump)


@register("flickr")
def run_flickr(cfg: TaskConfig):
    from visualbert_tpu.data.datasets import flickr as flickr_ds

    tok = _tokenizer(cfg)
    d = cfg.data
    if "synthetic" in d:
        ann, feats = flickr_ds.make_synthetic(
            int(d["synthetic"]), tok, feat_dim=cfg.model.visual_embedding_dim
        )
        split = int(len(ann) * 0.8)
        train_ann, eval_ann = ann[:split], ann[split:]
    else:
        with open(d["train_annotations"]) as f:
            train_ann = json.load(f)
        with open(d["eval_annotations"]) as f:
            eval_ann = json.load(f)
        from visualbert_tpu.data.features import H5Features

        feats = H5Features(d["features_h5"])
    mk = lambda ann: flickr_ds.Flickr30kDataset(
        ann, feats, tok,
        max_seq_length=int(d.get("max_seq_length", 128)),
        max_regions=int(d.get("max_regions", 100)),
        max_entities=int(d.get("max_entities", 16)),
    )
    model = VisualBertForTask(cfg.model, head_type="flickr")
    trainer = _trainer(cfg, model)

    def dump(collected, folder):
        # R@1/5/10 over gold-region mass, the paper's grounding metric
        # (reference compute_score_with_logits_flickr, modeling.py:1648-1676)
        hits = {1: 0, 5: 0, 10: 0}
        total = 0
        for batch, out in collected:
            scores = np.asarray(out["logits"], np.float32)   # [B, E, R]
            label = np.asarray(batch["label"], np.float32)
            valid = np.asarray(batch["flickr_position"]) >= 0
            order = np.argsort(-scores, axis=-1)
            for k in hits:
                topk = np.take_along_axis(label, order[..., :k], axis=-1).sum(-1) > 0
                hits[k] += int(topk[valid].sum())
            total += int(valid.sum())
        return {f"recall_at_{k}": hits[k] / max(total, 1) for k in hits}

    return _run_fit(cfg, trainer, mk(train_ann), mk(eval_ann), dump_hook=dump)


@register("flickr_probe")
def run_flickr_probe(cfg: TaskConfig):
    """ACL-2020 attention probing ("What Does BERT with Vision Look At?"):
    restore a checkpoint, run the Flickr30k eval split with per-layer
    attention export, and dump per-layer entity→region grounding accuracy —
    the reference's ``output_attention_weights`` capability
    (modeling.py:1316-1324,1430-1444) as a config-reachable task.

    CLI:  python -m visualbert_tpu.train_cli --config configs/flickr_probe.json \\
              --restore <ckpt>
    Writes ``<folder>/flickr_probe.json`` = {"layer_0": acc, ...} and reports
    the best layer's accuracy as the task metric."""
    from visualbert_tpu.data.datasets import flickr as flickr_ds
    from visualbert_tpu.tasks.probing import (
        entity_region_attention_device,
        grounding_counts_from_era,
    )
    from visualbert_tpu.train.loop import FitResult

    tok = _tokenizer(cfg)
    d = cfg.data
    if "synthetic" in d:
        eval_ann, feats = flickr_ds.make_synthetic(
            int(d["synthetic"]), tok, feat_dim=cfg.model.visual_embedding_dim
        )
    else:
        with open(d["eval_annotations"]) as f:
            eval_ann = json.load(f)
        from visualbert_tpu.data.features import H5Features

        feats = H5Features(d["features_h5"])
    ds = flickr_ds.Flickr30kDataset(
        eval_ann, feats, tok,
        max_seq_length=int(d.get("max_seq_length", 128)),
        max_regions=int(d.get("max_regions", 100)),
        max_entities=int(d.get("max_entities", 16)),
    )
    model = VisualBertForTask(cfg.model, head_type="flickr")
    trainer = _trainer(cfg, model)
    eval_b = Batcher(
        ds, cfg.train.eval_batch_size, shuffle=False, seed=cfg.train.seed,
        drop_last=False, pad_final=True, num_workers=cfg.train.num_workers,
    )
    example = next(iter(eval_b.epoch(0)))
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed), example)
    if cfg.restore_checkpoint:
        state = _restore(cfg, trainer, state)

    text_len = ds.max_seq_length
    n_regions = ds.max_regions

    def probe_step(params, batch):
        out = trainer.model.apply(
            {"params": params}, batch,
            deterministic=True, output_attention_probs=True,
        )
        # gather the entity rows of the text→region block ON DEVICE so only
        # [L, B, H, E, R] crosses the wire, not the full [L, B, H, T, T]
        # attention (~30 MB/example fp32 at production shapes)
        return entity_region_attention_device(
            out["attention_weights"], batch["flickr_position"],
            text_len, n_regions,
        )

    with trainer.mesh:
        probe_fn = jax.jit(probe_step)

    hits, total = None, 0
    for batch in eval_b.epoch(0):
        era = np.asarray(
            jax.device_get(probe_fn(state.params, trainer.shard_batch(batch))),
            np.float32,
        )
        w = batch.get("example_weight")
        h, t = grounding_counts_from_era(
            era, batch["flickr_position"], batch["label"],
            row_mask=None if w is None else w > 0,
        )
        hits = h if hits is None else hits + h
        total += t
    accs = {f"layer_{l}": float(hits[l]) / max(total, 1) for l in range(len(hits))}
    path = os.path.join(cfg.folder, "flickr_probe.json")
    with open(path, "w") as f:
        json.dump({"entities": total, **accs}, f, indent=1)
    log.info("flickr_probe over %d entities → %s: %s", total, path,
             {k: round(v, 4) for k, v in accs.items()})
    return state, FitResult(
        best_metric=max(accs.values()), best_epoch=-1, epochs_run=0,
        history=[accs],
    )


@register("vcr")
def run_vcr(cfg: TaskConfig):
    from visualbert_tpu.data.datasets import vcr as vcr_ds
    from visualbert_tpu.models.vcr import VisualBertDetectorModel

    tok = _tokenizer(cfg)
    d = cfg.data
    if "synthetic" in d:
        ann, images = vcr_ds.make_synthetic(int(d["synthetic"]), tok)
        split = int(len(ann) * 0.8)
        train_ann, eval_ann = ann[:split], ann[split:]
    else:
        with open(d["train_annotations"]) as f:
            train_ann = json.load(f)
        with open(d["eval_annotations"]) as f:
            eval_ann = json.load(f)
        if "images_dir" in d:
            # raw jpg + json metadata (VCR release layout)
            from visualbert_tpu.utils.images import ImageFolderStore

            class_names = None
            if "class_names" in d:
                with open(d["class_names"]) as f:
                    class_names = [line.strip() for line in f if line.strip()]
            images = ImageFolderStore(
                d["images_dir"], target=int(d.get("image_size", 768)),
                class_names=class_names,
            )
        else:
            from visualbert_tpu.data.features import NpyFolderFeatures

            images = NpyFolderFeatures(d["preprocessed_dir"])
    mk = lambda ann: vcr_ds.VCRDataset(
        ann, images, tok,
        max_seq_length=int(d.get("max_seq_length", 128)),
        max_boxes=int(d.get("max_boxes", 20)),
    )
    model = VisualBertDetectorModel(
        cfg.model,
        final_dim=int(d.get("final_dim", 512)),
        cnn_loss_ratio=float(d.get("cnn_loss_ratio", 0.1)),
        trunk_blocks=tuple(d.get("trunk_blocks", (3, 4, 6))),
        layer4_blocks=int(d.get("layer4_blocks", 3)),
        width_div=int(d.get("width_div", 1)),
    )
    trainer = _trainer(cfg, model)

    def dump(collected, folder):
        # per-choice logits for the leaderboard tooling (train.py:352-368)
        logits = [np.asarray(out["logits"], np.float32) for _, out in collected]
        if logits:
            np.save(os.path.join(folder, "vcr_logits.npy"), np.concatenate(logits))
        return {}

    return _run_fit(cfg, trainer, mk(train_ann), mk(eval_ann), dump_hook=dump)


@register("unsup_pretrain")
def run_unsup_pretrain(cfg: TaskConfig):
    from visualbert_tpu.data.datasets import unsup_pretrain as up
    from visualbert_tpu.data.hybrid import HybridBatcher
    from visualbert_tpu.data.symbolic import SymbolicVocab
    from visualbert_tpu.data.text_corpus import PackedCorpus, TextOnlyDataset
    from visualbert_tpu.models.unsupervised import UnsupervisedConfig, UnsupervisedVisualBert

    tok = _tokenizer(cfg)
    d = cfg.data
    if "objects_vocab" in d:
        sym = SymbolicVocab.from_files(d["objects_vocab"], d["attributes_vocab"])
    else:
        sym = SymbolicVocab([f"obj{i}" for i in range(32)], [f"attr{i}" for i in range(8)])

    # QA co-training answer table (reference LXMERTDataset relabeling,
    # lxmert_data.py:105-141): answers arrive as strings in the annotations
    # and map through the normalized AnswerTable; unmapped → -1 (ignored)
    answer_table = None
    num_answers = int(d.get("num_answers", 9500))
    if d.get("answer_table"):
        from visualbert_tpu.data.answer_table import AnswerTable

        answer_table = AnswerTable.from_json(d["answer_table"])
        num_answers = len(answer_table)

    ucfg = UnsupervisedConfig(
        bert=cfg.model,
        visual_feat_dim=cfg.model.visual_embedding_dim,
        obj_id_num=sym.n_obj,
        attr_id_num=sym.n_attr,
        symbolic_vocab_size=sym.size,
        task_qa=bool(d.get("task_qa", False)),
        num_answers=num_answers,
    )
    if "synthetic" in d:
        ann, feats = up.make_synthetic(
            int(d["synthetic"]), tok, sym, feat_dim=cfg.model.visual_embedding_dim,
            answers=int(d.get("synthetic_answers", 0)),
        )
    else:
        from visualbert_tpu.data.features import H5Features

        with open(d["annotations"]) as f:
            ann = json.load(f)
        feats = H5Features(d["features_h5"])
    if answer_table is not None:
        for item in ann:
            a = item.get("ans")
            if isinstance(a, str):
                mapped = answer_table.ans_to_id(a)
                item["ans"] = -1 if mapped is None else int(mapped)
    elif ucfg.task_qa and any(isinstance(it.get("ans"), str) for it in ann):
        # Without a table every string answer coerces to ignore_index=-1 and
        # QA co-training silently becomes a no-op — fail loudly instead.
        raise ValueError(
            "task_qa is enabled and the annotations carry string answers, but "
            "no data.answer_table is configured — every answer would map to "
            "-1 (ignored). Set data.answer_table to the answer-table json "
            "(reference: qa_answer_table.py)."
        )

    ds_kwargs = dict(
        max_seq_length=int(d.get("max_seq_length", 30)),
        n_regions=int(d.get("n_regions", 36)),
    )
    vl = up.UnsupervisedPretrainDataset(
        ann, feats, tok, sym,
        matched_prob=float(d.get("matched_prob", 0.5)),
        **ds_kwargs,
    )
    workers = cfg.train.num_workers
    shard = _process_shard()
    sources = [Batcher(vl, cfg.train.train_batch_size, seed=cfg.train.seed,
                       num_workers=workers, process_shard=shard)]
    ratios = [1.0]
    if d.get("image_only_ratio"):
        # image-only hybrid source: same V&L entries without a text stream
        # (reference image_only_splits, lxmert_pretrain.py:126-139)
        img_ann = ann
        if "image_only_annotations" in d:
            with open(d["image_only_annotations"]) as f:
                img_ann = json.load(f)
        img_only = up.UnsupervisedPretrainDataset(
            img_ann, feats, tok, sym, image_only=True, **ds_kwargs
        )
        sources.append(Batcher(img_only, cfg.train.train_batch_size,
                               seed=cfg.train.seed + 1, num_workers=workers,
                               process_shard=shard))
        ratios.append(float(d["image_only_ratio"]))
    if "text_corpus" in d:
        corpus = PackedCorpus.load(d["text_corpus"])
        txt = TextOnlyDataset(
            corpus, tok,
            max_seq_length=int(d.get("text_seq_length", 64)),
            matched_objective=bool(d.get("text_matched_objective", False)),
        )
        sources.append(Batcher(txt, cfg.train.train_batch_size,
                               seed=cfg.train.seed, num_workers=workers,
                               process_shard=shard))
        ratios.append(float(d.get("text_ratio", 1.0)))
    hybrid = HybridBatcher(sources, ratios, seed=cfg.train.seed)

    # pretrain eval split → per-epoch val loss + best checkpoint, the
    # reference's BEST_EVAL_LOSS loop (lxmert_pretrain.py:379-412)
    eval_data = None
    if "val_annotations" in d or d.get("val_synthetic"):
        if "val_annotations" in d:
            with open(d["val_annotations"]) as f:
                val_ann = json.load(f)
            val_feats = feats
        else:
            val_ann, val_feats = up.make_synthetic(
                int(d["val_synthetic"]), tok, sym,
                feat_dim=cfg.model.visual_embedding_dim, seed=1,
            )
        val = up.UnsupervisedPretrainDataset(
            val_ann, val_feats, tok, sym,
            matched_prob=float(d.get("matched_prob", 0.5)),
            **ds_kwargs,
        )
        val_batcher = Batcher(val, cfg.train.eval_batch_size, seed=cfg.train.seed,
                              num_workers=workers, process_shard=shard)
        eval_data = lambda: prefetch(val_batcher.epoch(0))

    model = UnsupervisedVisualBert(ucfg)
    trainer = _trainer(cfg, model)
    example = next(iter(sources[0].epoch(0)))
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed), example)
    state, result = fit(
        trainer, state,
        train_data=lambda e: prefetch(hybrid.epoch(e)),
        eval_data=eval_data,
        checkpoint_dir=os.path.join(cfg.folder, "ckpt"),
        val_metric="loss",
        val_metric_higher_is_better=False,
        rng_seed=cfg.train.seed,
    )
    return state, result


@register("text_pretrain")
def run_text_pretrain(cfg: TaskConfig):
    """Text-only MLM pretraining over a packed corpus (the reference's
    standalone BERTDataset path, fine_tuning.py:47-270, rebuilt on
    PackedCorpus + whole-word masking)."""
    from visualbert_tpu.data.text_corpus import PackedCorpus, TextOnlyDataset

    tok = _tokenizer(cfg)
    d = cfg.data
    if "synthetic" in d:
        words = [w for w in tok.vocab if not w.startswith("[")]
        import numpy as _np

        rng = _np.random.default_rng(0)
        passages = []
        for _ in range(int(d["synthetic"])):
            w = words[int(rng.integers(len(words)))]
            passages.append([" ".join([w] * 8) for _ in range(2)])
        corpus = PackedCorpus.build(passages, tok)
    else:
        corpus = PackedCorpus.load(d["text_corpus"])
    ds = TextOnlyDataset(corpus, tok, max_seq_length=int(d.get("max_seq_length", 64)))
    model = VisualBertForTask(cfg.model, head_type="pretraining")
    trainer = _trainer(cfg, model)
    return _run_fit(cfg, trainer, ds, None, val_metric="loss")


@register("unsup_vqa")
def run_unsup_vqa(cfg: TaskConfig):
    from visualbert_tpu.data.datasets import unsup_vqa as uv
    from visualbert_tpu.data.symbolic import SymbolicVocab
    from visualbert_tpu.models.unsupervised import UnsupervisedConfig, UnsupervisedVQAModel

    tok = _tokenizer(cfg)
    d = cfg.data
    if "objects_vocab" in d:
        sym = SymbolicVocab.from_files(d["objects_vocab"], d["attributes_vocab"])
    else:
        sym = SymbolicVocab([f"obj{i}" for i in range(32)], [f"attr{i}" for i in range(8)])

    if "synthetic" in d:
        ann, feats, answers = uv.make_synthetic(
            int(d["synthetic"]), tok, sym,
            n_answers=int(d.get("n_answers", 8)),
            feat_dim=cfg.model.visual_embedding_dim,
        )
        split = int(len(ann) * 0.8)
        train_ann, eval_ann = ann[:split], ann[split:]
    else:
        from visualbert_tpu.data.features import H5Features

        with open(d["train_annotations"]) as f:
            train_ann = json.load(f)
        with open(d["eval_annotations"]) as f:
            eval_ann = json.load(f)
        feats = H5Features(d["features_h5"])
        with open(d["answer_list"]) as f:
            answers = json.load(f)

    ucfg = UnsupervisedConfig(
        bert=cfg.model,
        visual_feat_dim=cfg.model.visual_embedding_dim,
        obj_id_num=sym.n_obj, attr_id_num=sym.n_attr,
        symbolic_vocab_size=sym.size, num_answers=len(answers),
    )
    mk = lambda ann: uv.UnsupVQADataset(
        ann, feats, tok, sym, answers,
        max_seq_length=int(d.get("max_seq_length", 20)),
        n_regions=int(d.get("n_regions", 36)),
    )
    model = UnsupervisedVQAModel(ucfg)
    trainer = _trainer(cfg, model)
    return _run_fit(cfg, trainer, mk(train_ann), mk(eval_ann))


def run(cfg: TaskConfig):
    os.makedirs(cfg.folder, exist_ok=True)
    add_run_folder(cfg.folder)
    if cfg.task not in TASKS:
        raise KeyError(f"unknown task {cfg.task}; known: {sorted(TASKS)}")
    # multi-device + Pallas attention: the kernel dispatches via shard_map
    # and needs the mesh at model-construction time (config.py `mesh`)
    d, m = cfg.train.mesh_shape
    if d * m > 1 and cfg.model.use_flash_attention and cfg.model.mesh is None:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, model=cfg.model.replace(mesh=create_mesh(cfg.train.mesh_shape)))
    log.info("running task %s → %s", cfg.task, cfg.folder)
    return TASKS[cfg.task](cfg)
