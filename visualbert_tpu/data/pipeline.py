"""Host-side input pipeline: seeded per-example transforms, fixed-shape
batching, background prefetch.

Replaces the reference's torch ``DataLoader`` + AllenNLP batch-max padding
(``vcr.py:457-475``, ``coco_dataset.py:446-460``). Key differences, by
design:

  * **Static shapes**: every example is padded to the task's fixed
    (text_len, n_regions) bucket on the host, so a single compiled program
    serves the whole run — batch-max padding would retrigger XLA compilation
    per shape.
  * **Reproducible randomness**: transforms receive a Generator keyed by
    (seed, epoch, index) — the reference uses process-global ``random`` in
    forked workers, which is irreproducible across worker counts.
  * **Prefetch**: one background thread keeps a bounded queue of ready
    batches while the device runs (the reference relies on worker processes).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Protocol, Sequence

import numpy as np


class IndexedDataset(Protocol):
    def __len__(self) -> int: ...

    def __getitem__(self, args) -> Dict[str, np.ndarray]:
        """args = (index, rng) — rng is a np.random.Generator."""
        ...


def _shm_open(name: str):
    """Attach an existing shared-memory segment without registering it with
    this process's resource tracker (the creator owns unlink; tracked
    attachments in forked workers spam 'leaked shared_memory' warnings)."""
    from multiprocessing import shared_memory

    try:  # Python >= 3.13
        return shared_memory.SharedMemory(name=name, track=False)
    except TypeError:
        # pre-3.13: suppress registration during attach. The forked workers
        # SHARE the parent's tracker process, and its cache is a name-keyed
        # set — an unregister here would erase the parent's own registration
        # and make the parent's later unlink() log a KeyError in the tracker.
        from multiprocessing import resource_tracker

        orig = resource_tracker.register
        resource_tracker.register = lambda *a, **k: None
        try:
            return shared_memory.SharedMemory(name=name)
        finally:
            resource_tracker.register = orig


def _proc_worker_main(dataset, seed, task_q, done_q):
    """One fill worker: receives (epoch, idx, j0, j1, schema, slot_name)
    tasks and writes its span of batch rows straight into the shared-memory
    slot — no pickling of samples back to the parent. Slots are arena-reused
    across batches, so the attachment cache makes re-mapping free."""
    import traceback

    attached = {}  # slot name -> SharedMemory (kept mapped for reuse)
    while True:
        task = task_q.get()
        if task is None:
            return
        epoch, idx, j0, j1, schema, slot_name = task
        try:
            shm = attached.get(slot_name)
            if shm is None:
                shm = attached[slot_name] = _shm_open(slot_name)
            bufs = {
                k: np.ndarray(shape, dtype=dtype, buffer=shm.buf, offset=off)
                for k, (shape, dtype, off) in schema.items()
            }
            keyset = set(schema)
            for j in range(j0, j1):
                i = int(idx[j])
                rng = np.random.default_rng((seed, epoch, i))
                s = dataset[(i, rng)]
                if set(s) != keyset:
                    raise KeyError(
                        f"sample {i} keys {sorted(s)} != batch keys "
                        f"{sorted(keyset)}"
                    )
                for k, v in s.items():
                    bufs[k][j] = v
            del bufs
            done_q.put((j0, j1, None))
        except BaseException:
            done_q.put((j0, j1, traceback.format_exc()))


def default_collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples], axis=0) for k in keys}


class Batcher:
    """Iterate batches of a dataset with per-epoch shuffling.

    ``num_workers > 0`` fetches the samples of each batch through a thread
    pool — bit-identical to the sequential path because every sample's RNG is
    derived from ``(seed, epoch, index)``, never from thread identity (the
    TPU-native replacement for the reference's fork-based DataLoader
    workers; threads suffice because the hot per-sample work — numpy
    copies, the C++ tokenizer — releases the GIL)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        collate: Callable = default_collate,
        pad_final: bool = False,
        num_workers: int = 0,
        worker_mode: str = "thread",
        process_shard: Optional[tuple] = None,
    ):
        """``batch_size`` is always the GLOBAL batch size. On a multi-host
        launch pass ``process_shard=(process_index, process_count)`` (see
        ``parallel.distributed.local_batch_slice``): every host walks the
        SAME global batch schedule — same shuffle, same per-sample
        (seed, epoch, index) RNG keys — but fetches/collates only its own
        contiguous row slice, which ``Trainer.shard_batch`` then assembles
        into the global array with make_array_from_process_local_data. The
        per-host slice is bit-identical to the corresponding rows of the
        single-process batch."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.collate = collate
        self.pad_final = pad_final
        self.num_workers = num_workers
        # "thread": GIL-sharing pool (fine when per-sample work releases the
        # GIL — numpy copies, the C++ tokenizer). "process": forked workers
        # filling rows straight into shared-memory batch buffers — the
        # pod-host path, where one host must assemble for 8 chips and
        # Python-level per-sample work (masking, pair assembly) would
        # otherwise serialize on the GIL. Both are bit-identical to
        # sequential: every sample's RNG is (seed, epoch, index)-derived.
        assert worker_mode in ("thread", "process"), worker_mode
        self.worker_mode = worker_mode
        if worker_mode == "process":
            assert collate is default_collate, (
                "process workers fill shared-memory buffers; custom collate "
                "functions run sample-at-a-time — use worker_mode='thread'"
            )
        if process_shard is not None:
            pi, pn = process_shard
            assert batch_size % pn == 0, (batch_size, pn)
            assert 0 <= pi < pn, process_shard
            # a short non-padded tail batch cannot shard evenly across hosts
            assert drop_last or pad_final, "process_shard needs drop_last or pad_final"
        self.process_shard = process_shard
        self._pool = None
        self._procs = None
        self._free_slots: Dict[int, list] = {}
        self._all_slots: list = []
        self._closed = False

    def _get_pool(self):
        if self._pool is None and self.num_workers > 0 and self.worker_mode == "thread":
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        return self._pool

    def _get_procs(self):
        """Lazily fork the process pool. fork (not spawn/forkserver) so the
        dataset — feature caches included — is inherited copy-on-write with
        no pickling; workers touch only numpy + dataset code, never jax."""
        if self._procs is None:
            import multiprocessing as mp

            ctx = mp.get_context("fork")
            self._task_q = ctx.Queue()
            self._done_q = ctx.Queue()
            self._procs = [
                ctx.Process(
                    target=_proc_worker_main,
                    args=(self.dataset, self.seed, self._task_q, self._done_q),
                    daemon=True,
                )
                for _ in range(self.num_workers)
            ]
            for p in self._procs:
                p.start()
        return self._procs

    def close(self):
        """Stop worker processes/threads (daemonized either way, so this is
        courtesy, not correctness). Terminal: a prefetch thread still pulling
        from a live ``epoch`` generator after close would otherwise allocate
        fresh arena slots that nothing ever unlinks."""
        self._closed = True
        if self._procs is not None:
            for _ in self._procs:
                self._task_q.put(None)
            for p in self._procs:
                p.join(timeout=5)
            self._procs = None
        for shm in self._all_slots:
            try:
                shm.unlink()
            except FileNotFoundError:
                pass
        self._all_slots, self._free_slots = [], {}
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def _acquire_slot(self, nbytes: int):
        """Arena slot reuse: a FRESH shm segment costs ~2ms/MB of kernel
        page-zeroing on first touch (~80ms per 40MB feature batch — measured
        to halve 1-core throughput); a recycled slot's pages are already
        mapped everywhere. Slots return to the free list when every numpy
        view over them has been garbage-collected, so a consumer holding a
        batch can never see it overwritten."""
        from multiprocessing import shared_memory

        if self._closed:
            raise RuntimeError("Batcher is closed")
        free = self._free_slots.setdefault(nbytes, [])
        if free:
            return free.pop()
        shm = shared_memory.SharedMemory(create=True, size=nbytes)
        self._all_slots.append(shm)
        return shm

    def _fill_shared(self, epoch: int, idx, first: Dict[str, np.ndarray]):
        """Process-mode batch assembly: lay every batch key out in ONE
        arena-recycled shared-memory slot, fan contiguous row spans out to
        the forked workers, and return numpy views whose refcounts gate the
        slot's reuse."""
        import weakref

        self._get_procs()
        B = len(idx)
        # dtype OBJECTS, not .str: custom dtypes (ml_dtypes bfloat16 feature
        # caches) round-trip as void through the string form; offsets are
        # 64-byte aligned within the slot
        schema, off = {}, 0
        for k, v in first.items():
            a = np.asarray(v)
            schema[k] = ((B,) + a.shape, a.dtype, off)
            off += -(-(B * a.nbytes) // 64) * 64
        nbytes = max(64, off)
        shm = self._acquire_slot(nbytes)
        bufs = {
            k: np.ndarray(shape, dtype=dtype, buffer=shm.buf, offset=o)
            for k, (shape, dtype, o) in schema.items()
        }
        pending = {"n": len(bufs)}
        free = self._free_slots[nbytes]

        def release(pending=pending, free=free, shm=shm):
            pending["n"] -= 1
            if pending["n"] == 0:
                free.append(shm)

        for arr in bufs.values():
            weakref.finalize(arr, release)
        for k, v in first.items():
            bufs[k][0] = v
        spans = np.array_split(np.arange(1, B), len(self._procs))
        n_tasks = 0
        for span in spans:
            if len(span):
                self._task_q.put(
                    (epoch, np.asarray(idx), int(span[0]), int(span[-1]) + 1,
                     schema, shm.name)
                )
                n_tasks += 1
        errors = []
        for _ in range(n_tasks):
            while True:
                try:
                    _, _, err = self._done_q.get(timeout=60)
                    break
                except queue.Empty:
                    dead = [p for p in self._procs if not p.is_alive()]
                    if dead:
                        raise RuntimeError(
                            f"{len(dead)} batch worker(s) died "
                            f"(exitcodes {[p.exitcode for p in dead]})"
                        )
            if err is not None:
                errors.append(err)
        if errors:
            raise RuntimeError("worker failure:\n" + "\n".join(errors))
        return bufs

    def _fetch(self, epoch: int, i: int):
        rng = np.random.default_rng((self.seed, epoch, int(i)))
        return self.dataset[(int(i), rng)]

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        pool = self._get_pool()
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            n_real = len(idx)
            if len(idx) < self.batch_size:
                if self.drop_last:
                    break
                if self.pad_final:
                    # repeat last indices so shapes stay static; every batch
                    # from a pad_final batcher carries 'example_weight'
                    # (0.0 on the duplicated rows) and metric consumers
                    # weight by it — duplicates never bias eval scalars
                    pad = np.resize(idx, self.batch_size)
                    idx = pad
            weights = None
            if self.pad_final:
                weights = np.zeros(len(idx), np.float32)
                weights[:n_real] = 1.0
            if self.process_shard is not None:
                # this host's contiguous slice of the global batch (the
                # __init__ asserts guarantee len(idx) == batch_size here)
                pi, pn = self.process_shard
                per = self.batch_size // pn
                idx = idx[pi * per : (pi + 1) * per]
                if weights is not None:
                    weights = weights[pi * per : (pi + 1) * per]

            def finish(batch):
                if weights is not None:
                    batch["example_weight"] = weights
                    # GLOBAL real-example count: host-side rollup weight that
                    # stays exact when this host's local real count differs
                    # (tail-pad duplicates land in the last host's slice).
                    # Underscore keys never reach the device (shard_batch).
                    batch["_real_count"] = float(n_real)
                # datasets may expose a batch-level transform that needs
                # cross-example visibility (e.g. in-batch random feature
                # replacement, data/masking.py::in_batch_random_replace);
                # rng keyed off (seed, epoch, start, 1) — the trailing 1
                # disambiguates from per-sample (seed, epoch, index) keys
                transform = getattr(self.dataset, "batch_transform", None)
                if transform is not None:
                    batch = transform(
                        batch, np.random.default_rng((self.seed, epoch, start, 1))
                    )
                return batch

            if (
                self.worker_mode == "process"
                and self.num_workers > 0
                and len(idx) > 1
            ):
                first = self._fetch(epoch, int(idx[0]))
                yield finish(self._fill_shared(epoch, idx, first))
            elif self.collate is default_collate:
                # fill-into-buffer collate: each sample is written straight
                # into the batch arrays (workers parallelize the big
                # visual-feature memcpy, ≈0.8 MB/sample) — np.stack over a
                # sample list was a second serial pass over the whole batch
                # and dominated assembly (~20 ms of a 30 ms batch at bench
                # shapes; far worse on low-bandwidth hosts)
                first = self._fetch(epoch, int(idx[0]))
                bufs = {
                    k: np.empty((len(idx),) + np.shape(v), np.asarray(v).dtype)
                    for k, v in first.items()
                }
                for k, v in first.items():
                    bufs[k][0] = v

                keyset = set(first)

                def fill(j):
                    s = self._fetch(epoch, int(idx[j]))
                    if set(s) != keyset:
                        # conditional keys (e.g. eval-only "label") must be
                        # consistent within a batch — np.empty rows must
                        # never be yielded uninitialized
                        raise KeyError(
                            f"sample {int(idx[j])} keys {sorted(s)} != "
                            f"batch keys {sorted(keyset)}"
                        )
                    for k, v in s.items():
                        bufs[k][j] = v

                if pool is not None:
                    list(pool.map(fill, range(1, len(idx))))
                else:
                    for j in range(1, len(idx)):
                        fill(j)
                yield finish(bufs)
            elif pool is not None:
                samples = list(pool.map(lambda i: self._fetch(epoch, i), idx))
                yield finish(self.collate(samples))
            else:
                samples = [self._fetch(epoch, i) for i in idx]
                yield finish(self.collate(samples))

    def __iter__(self):
        return self.epoch(0)

    def num_batches(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Run `iterator` in a daemon thread, keep `size` items ready."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    END = object()
    err: List[BaseException] = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # surfaced in consumer
            err.append(e)
        finally:
            q.put(END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is END:
            if err:
                raise err[0]
            return
        yield item


def pad_to(arr: np.ndarray, length: int, axis: int = 0, value=0) -> np.ndarray:
    """Pad (or truncate) `arr` to `length` along `axis`."""
    cur = arr.shape[axis]
    if cur == length:
        return arr
    if cur > length:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, length)
        return arr[tuple(sl)]
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, length - cur)
    return np.pad(arr, pad_width, constant_values=value)


def pad_regions(
    feats: np.ndarray, max_regions: int, extra: Optional[Dict[str, np.ndarray]] = None
):
    """Pad region features [n, D] → ([max, D], mask [max]); extra arrays are
    padded along axis 0 with zeros."""
    n = min(feats.shape[0], max_regions)
    # asarray, not astype: fp32 inputs (the common case — H5/npy caches store
    # fp32) must not pay a per-sample copy of the [n, 2048] block. bf16
    # feature caches stay bf16 end-to-end (wire bytes halve; numerics are
    # identical — the encoder casts features to its bf16 compute dtype
    # before the projection either way, models/encoder.py).
    arr = np.asarray(feats)
    if arr.dtype.itemsize != 2:  # anything but a 16-bit float cache → fp32
        arr = np.asarray(arr, np.float32)
    out = pad_to(arr, max_regions, axis=0)
    mask = np.zeros(max_regions, np.int32)
    mask[:n] = 1
    extras = {}
    if extra:
        extras = {k: pad_to(v, max_regions, axis=0) for k, v in extra.items()}
    return out, mask, extras


class SubsetDataset:
    """View of a dataset restricted to an index list."""

    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, args):
        i, rng = args
        return self.dataset[(self.indices[i], rng)]

    @property
    def batch_transform(self):
        return getattr(self.dataset, "batch_transform", None)


def bucket_boundaries_assign(lengths: Sequence[int], boundaries: Sequence[int]):
    """Assign each example to the smallest boundary ≥ its length.
    Returns {boundary: [indices]}; over-long examples go to the last bucket
    (datasets truncate)."""
    out: Dict[int, List[int]] = {b: [] for b in boundaries}
    last = boundaries[-1]
    for i, n in enumerate(lengths):
        for b in boundaries:
            if n <= b:
                out[b].append(i)
                break
        else:
            out[last].append(i)
    return {b: idx for b, idx in out.items() if idx}


def make_bucketed_batchers(
    dataset_factory: Callable[[int], object],
    lengths: Sequence[int],
    boundaries: Sequence[int],
    batch_size: int,
    *,
    seed: int = 0,
    shuffle: bool = True,
):
    """Bucketed padding (SURVEY §7 hard-parts): one fixed shape per bucket —
    a bounded number of compiled programs instead of per-batch-max padding.

    dataset_factory(boundary) builds a dataset padding to that boundary;
    returns a HybridBatcher interleaving single-bucket batches.
    """
    from visualbert_tpu.data.hybrid import HybridBatcher

    assignments = bucket_boundaries_assign(lengths, boundaries)
    batchers = []
    for boundary, indices in sorted(assignments.items()):
        ds = SubsetDataset(dataset_factory(boundary), indices)
        batchers.append(
            Batcher(ds, batch_size, shuffle=shuffle, seed=seed)
        )
    return HybridBatcher(batchers, seed=seed)
