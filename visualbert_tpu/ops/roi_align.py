"""RoIAlign for TPU.

The reference uses torchvision's CUDA ``ROIAlign((7,7), spatial_scale=1/16,
sampling_ratio=0)`` (``visualbert/utils/detector.py:71-73``). TPU-native
rewrite:

  * **Static shapes**: all N padded boxes per image are aligned ([B, N, ...]
    in/out); invalid boxes produce garbage that downstream masks ignore —
    no ``nonzero()`` compaction (detector.py:115-121), which would be a
    dynamic shape under jit.
  * **Adaptive sampling with a static grid**: torchvision's
    ``sampling_ratio=0`` samples each bin with ``ceil(bin_size)`` bilinear
    taps per axis — a data-dependent count. Here every bin gets a static
    ``max_samples`` × ``max_samples`` lattice whose spacing is computed from
    the per-box adaptive count and whose out-of-count taps carry zero weight,
    so the quadrature matches torchvision exactly for every box with
    ``ceil(bin) <= max_samples`` (larger boxes clamp to ``max_samples`` taps —
    at 1/16 scale that means images beyond ``16·7·max_samples`` px per side).
    A positive ``sampling_ratio`` gives torchvision's fixed-grid behavior.
  * Implementation is XLA gather-based (bilinear taps are data-dependent
    addresses; XLA lowers them to dynamic-gathers). This op runs once per
    image on the VCR path — not the training hot loop — so no hand-written
    kernel is warranted; revisit if a profile ever says otherwise.

Coordinates follow torchvision ``aligned=False`` legacy semantics (no -0.5
pixel offset), matching the version the reference pinned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _bilinear_gather(fm: Array, ys: Array, xs: Array) -> Array:
    """fm: [H, W, C]; ys/xs: [P] fractional coords. Returns [P, C].

    Out-of-range coords clamp to the border (torchvision clamps lo=0 and
    treats y < -1 or y > H as zero; boxes are pre-clipped to the image in
    every reference dataloader, so border-clamp is equivalent here)."""
    H, W, _ = fm.shape
    ys = jnp.clip(ys, 0.0, H - 1.0)
    xs = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy1 = ys - y0.astype(ys.dtype)
    wx1 = xs - x0.astype(xs.dtype)
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    flat = fm.reshape(H * W, -1)

    def take(yi, xi):
        return jnp.take(flat, yi * W + xi, axis=0)  # [P, C]

    out = (
        take(y0, x0) * (wy0 * wx0)[:, None]
        + take(y0, x1) * (wy0 * wx1)[:, None]
        + take(y1, x0) * (wy1 * wx0)[:, None]
        + take(y1, x1) * (wy1 * wx1)[:, None]
    )
    return out


def _grid(boxes: Array, out_size: int, S: int, sampling_ratio: int, scale: float):
    """Per-box sample coordinates + quadrature weights.

    boxes: [N, 4] → ys/xs: [N, out*S] coords along each axis, wy/wx:
    [N, out*S] per-tap weights (0 beyond the adaptive count; each bin's
    weights sum to 1 along the axis)."""
    x1, y1, x2, y2 = [boxes[:, i] * scale for i in range(4)]
    roi_w = jnp.maximum(x2 - x1, 1.0)  # torchvision clamps roi size to >= 1
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    if sampling_ratio > 0:
        n_h = jnp.full_like(bin_h, sampling_ratio)
        n_w = jnp.full_like(bin_w, sampling_ratio)
    else:  # adaptive: ceil(bin) taps per axis (torchvision sampling_ratio=0)
        n_h = jnp.clip(jnp.ceil(bin_h), 1, S)
        n_w = jnp.clip(jnp.ceil(bin_w), 1, S)

    j = jnp.arange(S, dtype=jnp.float32)  # tap index within a bin
    # tap position in bin units: (j + 0.5) / n ; weight 1/n for j < n
    off_h = (j[None, :] + 0.5) / n_h[:, None]          # [N, S]
    off_w = (j[None, :] + 0.5) / n_w[:, None]
    w_h = jnp.where(j[None, :] < n_h[:, None], 1.0 / n_h[:, None], 0.0)
    w_w = jnp.where(j[None, :] < n_w[:, None], 1.0 / n_w[:, None], 0.0)

    i = jnp.arange(out_size, dtype=jnp.float32)        # bin index
    # [N, out, S] absolute coords
    ys = y1[:, None, None] + bin_h[:, None, None] * (i[None, :, None] + off_h[:, None, :])
    xs = x1[:, None, None] + bin_w[:, None, None] * (i[None, :, None] + off_w[:, None, :])
    N = boxes.shape[0]
    return (
        ys.reshape(N, out_size * S),
        xs.reshape(N, out_size * S),
        w_h,  # [N, S]
        w_w,
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def roi_align(
    features: Array,       # [B, H, W, C] (NHWC)
    boxes: Array,          # [B, N, 4] (x1,y1,x2,y2) image pixels
    out_size: int = 7,
    sampling_ratio: int = 0,
    spatial_scale: float = 1.0 / 16,
    max_samples: int = 8,
) -> Array:
    """Returns [B, N, out_size, out_size, C].

    ``sampling_ratio=0`` (default) = torchvision's adaptive quadrature,
    exact for boxes whose bins need ≤ ``max_samples`` taps per axis.
    """
    B, H, W, C = features.shape
    N = boxes.shape[1]
    S = max_samples if sampling_ratio <= 0 else sampling_ratio
    if sampling_ratio <= 0:
        # shape-derived tightening of the static lattice: an in-image RoI is
        # at most (H, W) feature cells, so its adaptive per-axis tap count
        # ceil(roi/out_size) never exceeds ceil(fm_dim/out_size) — gathering
        # the full max_samples lattice would fetch taps whose quadrature
        # weight is provably zero (a 64x reduction in gather traffic when
        # fm << out_size·max_samples, e.g. small eval crops; 2.6x at the
        # VCR-production 512² → 32² fm). Boxes beyond the image (reference
        # dataloaders pre-clip, utils/detector.py) keep exactness up to this
        # bound instead of max_samples.
        S = min(S, max(1, -(-H // out_size), -(-W // out_size)))
    P = out_size * S

    def per_image(fm, bx):
        ys, xs, w_h, w_w = _grid(
            bx.astype(jnp.float32), out_size, S, sampling_ratio, spatial_scale
        )
        # full outer grid per box: [N, P, P]
        ys_full = jnp.broadcast_to(ys[:, :, None], (N, P, P)).reshape(N, P * P)
        xs_full = jnp.broadcast_to(xs[:, None, :], (N, P, P)).reshape(N, P * P)
        samples = jax.vmap(lambda y, x: _bilinear_gather(fm, y, x))(ys_full, xs_full)
        samples = samples.reshape(N, out_size, S, out_size, S, C)
        # weighted quadrature over the S×S taps of each bin
        w = w_h[:, None, :, None, None, None] * w_w[:, None, None, None, :, None]
        return (samples * w.astype(samples.dtype)).sum(axis=(2, 4))

    return jax.vmap(per_image)(features, boxes)
