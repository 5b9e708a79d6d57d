"""Raw-image VCR path: HOST cost end-to-end (VERDICT r4 item 2).

The 158.9 ex/s/chip VCR headline (`scripts/vcr_detector_bench.py`, 512x512,
matmul RoIAlign + s2d stem) is device-only; at that rate the host must decode
+ resize ~159 jpegs/s per chip plus rasterize segmentation masks and assemble 4-choice
text. This script itemizes that host chain on realistic movie-still-sized
jpegs (1280x720, the VCR release ballpark) through the PRODUCTION path —
``ImageFolderStore`` + ``VCRDataset`` + ``Batcher`` — and compares it to the
per-chip and per-host (8-chip) device demand lines.

Levers measured (all shipped defaults unless noted):
  * JPEG draft decode (DCT-scaled 1/2..1/8 for >=2x downscales) vs full
    decode + bilinear resize (``prepare_image(draft=...)``)
  * uint8 wire + in-graph normalize (``device_normalize=True``) vs host fp32
    normalization — 4x wire bytes and one fp32 pass saved per image
  * sequential vs forked shared-memory process workers (``worker_mode``)

Reference anchor: the r2c loader chain
``/root/reference/visualbert/dataloaders/vcr.py:290-316`` (PIL load +
box_utils resize/normalize + segms rasterization in fork workers).

Usage: python scripts/vcr_image_bench.py [--images N] [--target 512]
                                         [--json OUT]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEVICE_EX_PER_S = 158.9  # vcr_detector_bench r05 headline, ex/s/chip @512^2


def build_fixture(folder: str, n_images: int, width=1280, height=720,
                  n_boxes=8, seed=0):
    """VCR-shaped image folder: jpegs with mixed low-frequency content plus
    noise (realistic entropy — pure noise decodes slower than real stills,
    flat color faster), per-image json with boxes/names/segms polygons."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    ann = []
    for i in range(n_images):
        base = (
            127 + 90 * np.sin(xx / (30 + 10 * (i % 5)) + i)[..., None]
            * np.cos(yy / (40 + 5 * (i % 3)))[..., None]
            + rng.normal(0, 12, (height, width, 3))
        )
        img = np.clip(base, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(f"{folder}/img{i}.jpg", quality=90)
        boxes, segms, names = [], [], []
        for b in range(n_boxes):
            x1 = float(rng.uniform(0, width - 200))
            y1 = float(rng.uniform(0, height - 200))
            x2, y2 = x1 + float(rng.uniform(60, 200)), y1 + float(rng.uniform(60, 200))
            boxes.append([x1, y1, x2, y2])
            segms.append([[[x1, y1], [x2, y1], [x2, y2], [x1, y2],
                           [(x1 + x2) / 2, (y1 + y2) / 2]]])
            names.append("person" if b % 2 == 0 else "car")
        with open(f"{folder}/img{i}.json", "w") as f:
            json.dump({"boxes": boxes, "names": names, "segms": segms}, f)
        choices = [["w%d" % (c + 1), [c % n_boxes], "w%d" % (c + 9)]
                   for c in range(4)]
        ann.append({
            "image_id": f"img{i}",
            "question": ["w20", [0], "w21", "w22"],
            "choices": choices,
            "label": i % 4,
            "objects": names,
        })
    return ann


def time_per_image(fn, paths, repeats=2):
    t0 = time.perf_counter()
    n = 0
    for _ in range(repeats):
        for p in paths:
            fn(p)
            n += 1
    return (time.perf_counter() - t0) / n


def itemize(folder, n_images, target):
    """Per-image cost of each stage, seconds."""
    from PIL import Image

    from visualbert_tpu.utils.boxes import make_mask
    from visualbert_tpu.utils.images import normalize_image, prepare_image

    paths = [f"{folder}/img{i}.jpg" for i in range(n_images)]
    out = {}
    out["decode_full"] = time_per_image(
        lambda p: np.asarray(Image.open(p).convert("RGB")), paths)
    out["decode_draft"] = time_per_image(
        lambda p: prepare_image(p, target, normalize=False, draft=True), paths)
    out["prepare_full_norm"] = time_per_image(
        lambda p: prepare_image(p, target, normalize=True, draft=False), paths)
    out["prepare_draft_uint8"] = out["decode_draft"]  # same call
    # normalize alone at target res
    canvas = np.random.RandomState(0).randint(0, 255, (target, target, 3),
                                              np.uint8)
    t0 = time.perf_counter()
    for _ in range(50):
        normalize_image(canvas)
    out["normalize_host_only"] = (time.perf_counter() - t0) / 50
    # mask raster: 8 boxes x 1 polygon
    meta = json.load(open(f"{folder}/img0.json"))
    t0 = time.perf_counter()
    for _ in range(20):
        for polys, box in zip(meta["segms"], meta["boxes"]):
            make_mask([np.asarray(p) for p in polys], np.asarray(box[:4]))
    out["segm_raster_8boxes"] = (time.perf_counter() - t0) / 20
    out["json_meta"] = time_per_image(
        lambda p: json.load(open(p[:-4] + ".json")), paths)
    return {k: round(v * 1e3, 2) for k, v in out.items()}  # ms


def pipeline_rate(ann, folder, target, device_normalize, draft, workers,
                  mode, tok, n_batches=10, batch=8, repeats=3):
    from visualbert_tpu.data.datasets import vcr as vcr_ds
    from visualbert_tpu.data.pipeline import Batcher, prefetch
    from visualbert_tpu.utils.images import ImageFolderStore

    store = ImageFolderStore(folder, target=target,
                             device_normalize=device_normalize, draft=draft)
    ds = vcr_ds.VCRDataset(ann, store, tok, max_seq_length=64, max_boxes=8)
    b = Batcher(ds, batch, seed=0, num_workers=workers, worker_mode=mode)
    try:
        rates = []
        for rep in range(repeats):  # median: noisy shared 1-core host
            it = prefetch(b.epoch(rep), size=2)
            next(it)
            t0 = time.perf_counter()
            n = 0
            for _ in it:
                n += 1
                if n >= n_batches:
                    break
            rates.append(n * batch / (time.perf_counter() - t0))
        return sorted(rates)[len(rates) // 2]
    finally:
        b.close()


def measure_worker_cpu_per_sample(ann, folder, target, tok, workers=2,
                                  n_batches=8, batch=8):
    """CPU-seconds burned per sample INSIDE the fill workers (utime+stime
    from /proc) vs the wall clock. On this sandbox's single shared core,
    wall time for multi-process fills is inflated by co-tenant CPU steal
    whenever >1 of our processes is runnable (measured: workers get ~1/3 of
    the core they'd get single-threaded); worker CPU per sample is the
    number that predicts pod-host scaling, and it matches the sequential
    per-sample cost."""
    import os

    from visualbert_tpu.data.datasets import vcr as vcr_ds
    from visualbert_tpu.data.pipeline import Batcher
    from visualbert_tpu.utils.images import ImageFolderStore

    def ptime(pid):
        f = open(f"/proc/{pid}/stat").read().split()
        return (int(f[13]) + int(f[14])) / os.sysconf("SC_CLK_TCK")

    store = ImageFolderStore(folder, target=target)
    ds = vcr_ds.VCRDataset(ann, store, tok, max_seq_length=64, max_boxes=8)
    b = Batcher(ds, batch, seed=0, num_workers=workers, worker_mode="process")
    try:
        it = b.epoch(0)
        next(it)  # fork + warm
        pids = [p.pid for p in b._procs]
        before = {p: ptime(p) for p in pids}
        t0 = time.perf_counter()
        n = 0
        for _ in it:
            n += 1
            if n >= n_batches:
                break
        wall = time.perf_counter() - t0
        cpu = sum(ptime(p) - before[p] for p in pids)
        n_samples = n * (batch - 1)  # workers fill rows 1..B-1
        return {
            "worker_cpu_ms_per_sample": round(1e3 * cpu / n_samples, 2),
            "wall_ms_per_sample": round(1e3 * wall / (n * batch), 2),
            "our_cpu_share_of_wall": round(cpu / wall, 2),
        }
    finally:
        b.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--target", type=int, default=512)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from visualbert_tpu.data.tokenization import BertTokenizer

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(40)
    ]
    tok = BertTokenizer({w: i for i, w in enumerate(words)})

    folder = tempfile.mkdtemp(prefix="vcr_img_bench_")
    try:
        ann = build_fixture(folder, args.images)
        stages = itemize(folder, min(args.images, 24), args.target)
        print(f"# per-image stages (ms): {stages}", file=sys.stderr)

        table = []
        for label, dn, draft, w, mode in [
            ("host_norm_full_decode_seq", False, False, 0, "thread"),
            ("uint8_draft_seq", True, True, 0, "thread"),
            # PIL releases the GIL inside libjpeg decode, so threads
            # parallelize the dominant stage on a multi-core host
            ("uint8_draft_thread2", True, True, 2, "thread"),
            ("uint8_draft_thread4", True, True, 4, "thread"),
            ("uint8_draft_proc2", True, True, 2, "process"),
            ("uint8_draft_proc4", True, True, 4, "process"),
        ]:
            r = pipeline_rate(ann, folder, args.target, dn, draft, w, mode, tok)
            table.append({"config": label, "examples_per_s": round(r, 1)})
            print(f"# pipeline {label}: {r:.1f} ex/s", file=sys.stderr)

        cpu_acct = measure_worker_cpu_per_sample(ann, folder, args.target, tok)
        print(f"# worker cpu accounting: {cpu_acct}", file=sys.stderr)

        seq_uint8 = next(t for t in table if t["config"] == "uint8_draft_seq")
        out = {
            "target": args.target,
            "process_worker_cpu_accounting": cpu_acct,
            "per_image_stage_ms": stages,
            "pipeline": table,
            "device_demand_ex_per_s_chip": DEVICE_EX_PER_S,
            "device_demand_ex_per_s_host8": DEVICE_EX_PER_S * 8,
            "per_core_ex_per_s": seq_uint8["examples_per_s"],
            "cores_needed_1chip": int(np.ceil(
                DEVICE_EX_PER_S / seq_uint8["examples_per_s"])),
            "cores_needed_8chip_host": int(np.ceil(
                DEVICE_EX_PER_S * 8 / seq_uint8["examples_per_s"])),
            "wire_MB_per_ex_uint8": round(args.target * args.target * 3 / 1e6, 2),
            "wire_MB_per_ex_fp32": round(args.target * args.target * 12 / 1e6, 2),
        }
        print(json.dumps(out))
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(folder, ignore_errors=True)


if __name__ == "__main__":
    main()
