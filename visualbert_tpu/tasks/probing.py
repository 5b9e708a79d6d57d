"""Attention-probing pipeline (ACL 2020 "What Does BERT with Vision Look
At?") — reference: the ``output_attention_weights`` path
(``modeling.py:1316-1324, 1430-1444``) feeding entity→region attention
analysis on Flickr30k.

``entity_region_attention`` reduces raw per-layer attention maps to
entity→region matrices; ``grounding_accuracy_by_layer`` scores the argmax
region of mean-over-heads attention against gold regions — the paper's
headline probe.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def entity_region_attention(
    attn_probs: np.ndarray,       # [L, B, H, T, T]
    flickr_position: np.ndarray,  # [B, E] (-1 pad) — entity token positions
    text_len: int,
    n_regions: int,
) -> np.ndarray:
    """Returns [L, B, H, E, n_regions]: each entity position's attention mass
    over the visual tokens, per layer and head."""
    L, B, H, T, _ = attn_probs.shape
    E = flickr_position.shape[1]
    safe = np.maximum(flickr_position, 0)
    rows = np.take_along_axis(
        attn_probs,
        safe[None, :, None, :, None].repeat(L, 0).repeat(H, 2).repeat(T, 4),
        axis=3,
    )  # [L, B, H, E, T]
    return rows[..., text_len : text_len + n_regions]


def entity_region_attention_device(
    attn_probs, flickr_position, text_len: int, n_regions: int
):
    """jnp version of :func:`entity_region_attention` meant to run INSIDE the
    jitted probe step, so only the [L, B, H, E, R] entity→region block ships
    to host instead of the full [L, B, H, T, T] tensor (~T²/(E·R)-fold fewer
    transfer bytes; ~1 GB per 32-batch at production Flickr shapes).

    Same trick the vqa_advanced head uses to gather [MASK] slots before its
    30522-wide decoder."""
    import jax.numpy as jnp

    safe = jnp.maximum(flickr_position, 0)          # [B, E]
    idx = safe[None, :, None, :, None]              # [1, B, 1, E, 1]
    rows = jnp.take_along_axis(attn_probs, idx, axis=3)  # [L, B, H, E, T]
    return rows[..., text_len : text_len + n_regions]


def grounding_counts_by_layer(
    attn_probs: np.ndarray,
    flickr_position: np.ndarray,
    label: np.ndarray,            # [B, E, n_regions] soft gold distribution
    text_len: int,
    row_mask: np.ndarray = None,  # [B] bool — False drops an example's rows
) -> "tuple[np.ndarray, int]":
    """Per-layer hit counts of argmax(mean-over-heads entity→region
    attention) against regions with positive gold mass. Returns
    (hits [L], n_valid_entities) so batch results accumulate exactly —
    ``row_mask`` excludes tail-pad duplicate examples (example_weight)."""
    n_regions = label.shape[-1]
    era = entity_region_attention(attn_probs, flickr_position, text_len, n_regions)
    return grounding_counts_from_era(era, flickr_position, label, row_mask)


def grounding_counts_from_era(
    era: np.ndarray,              # [L, B, H, E, R] pre-gathered attention
    flickr_position: np.ndarray,  # [B, E]
    label: np.ndarray,            # [B, E, n_regions]
    row_mask: np.ndarray = None,
) -> "tuple[np.ndarray, int]":
    """Counts from an already-gathered entity→region attention block (e.g.
    produced on device by :func:`entity_region_attention_device`)."""
    mean_heads = era.mean(axis=2)  # [L, B, E, R]
    valid = flickr_position >= 0   # [B, E]
    if row_mask is not None:
        valid = valid & np.asarray(row_mask, bool)[:, None]
    hits = np.zeros(era.shape[0], np.int64)
    for l in range(era.shape[0]):
        pred = mean_heads[l].argmax(axis=-1)  # [B, E]
        hit = np.take_along_axis(label, pred[..., None], axis=2)[..., 0] > 0
        hits[l] = int(hit[valid].sum())
    return hits, int(valid.sum())


def grounding_accuracy_by_layer(
    attn_probs: np.ndarray,
    flickr_position: np.ndarray,
    label: np.ndarray,
    text_len: int,
) -> Dict[int, float]:
    """Per-layer accuracy over one batch (see grounding_counts_by_layer)."""
    hits, total = grounding_counts_by_layer(
        attn_probs, flickr_position, label, text_len
    )
    return {l: float(hits[l]) / total if total else 0.0 for l in range(len(hits))}


def extract_attention_maps(model, params, batch, mesh=None):
    """Run the model once with attention export; returns (out dict with
    'attention_weights' [L, B, H, T, T], text_len)."""
    out = model.apply(
        {"params": params}, batch, deterministic=True, output_attention_probs=True
    )
    return jax.device_get(out)
