"""Hybrid multi-source batching (reference ``CustomBatchSampler``,
``unsupervised_visualbert/src/lxrt/h5_data.py:26-130``).

Each batch is drawn from a SINGLE source (V&L, image-only, text-only …) so
every source keeps its own static tensor shapes — one compiled program per
source. Sources are interleaved proportionally to their (possibly up/down-
sampled) sizes, deterministically per epoch.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence

import numpy as np

from visualbert_tpu.data.pipeline import Batcher


class HybridBatcher:
    def __init__(
        self,
        batchers: Sequence[Batcher],
        upsample_ratios: Sequence[float] = None,
        seed: int = 0,
    ):
        self.batchers = list(batchers)
        self.upsample_ratios = (
            list(upsample_ratios) if upsample_ratios else [1.0] * len(self.batchers)
        )
        assert len(self.upsample_ratios) == len(self.batchers)
        self.seed = seed

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed, epoch, 7))
        # number of batches each source contributes this epoch
        counts = []
        for b, r in zip(self.batchers, self.upsample_ratios):
            n = int(round(b.num_batches() * r))
            counts.append(max(n, 0))
        # interleave: shuffled deck of source indices
        deck = np.concatenate([
            np.full(c, i, np.int32) for i, c in enumerate(counts)
        ]) if sum(counts) else np.zeros(0, np.int32)
        rng.shuffle(deck)

        iters = []
        for i, b in enumerate(self.batchers):
            def cycle(b=b, i=i):
                # fresh order each wrap when a source is upsampled; the salt
                # keys (source, wrap) into a space disjoint from real epoch
                # numbers (< 2^20), so no reuse collides with a later epoch
                n_src = len(self.batchers)
                wrap = 0
                while True:
                    salt = 0 if wrap == 0 else (1 << 20) + ((epoch * n_src + i) << 10) + wrap
                    yield from b.epoch(epoch if wrap == 0 else salt)
                    wrap += 1
            iters.append(cycle())

        for src in deck:
            yield next(iters[src])

    def num_batches(self) -> int:
        return sum(
            max(int(round(b.num_batches() * r)), 0)
            for b, r in zip(self.batchers, self.upsample_ratios)
        )
