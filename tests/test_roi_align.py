"""RoIAlign correctness vs a scalar numpy reference (torchvision
aligned=False semantics, fixed sampling_ratio), plus detector smoke test."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from visualbert_tpu.ops.roi_align import roi_align


def numpy_roi_align(fm, boxes, out_size, s, scale):
    """fm: [H, W, C]; boxes: [N, 4]. Scalar-loop reference."""
    H, W, C = fm.shape
    N = boxes.shape[0]
    out = np.zeros((N, out_size, out_size, C), np.float64)

    def bilinear(y, x):
        y = min(max(y, 0.0), H - 1.0)
        x = min(max(x, 0.0), W - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        wy1, wx1 = y - y0, x - x0
        return (
            fm[y0, x0] * (1 - wy1) * (1 - wx1)
            + fm[y0, x1] * (1 - wy1) * wx1
            + fm[y1, x0] * wy1 * (1 - wx1)
            + fm[y1, x1] * wy1 * wx1
        )

    for n in range(N):
        x1, y1, x2, y2 = boxes[n] * scale
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bw, bh = roi_w / out_size, roi_h / out_size
        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(C, np.float64)
                for si in range(s):
                    for sj in range(s):
                        y = y1 + bh * (i + (si + 0.5) / s)
                        x = x1 + bw * (j + (sj + 0.5) / s)
                        acc += bilinear(y, x)
                out[n, i, j] = acc / (s * s)
    return out


def test_roi_align_matches_numpy(rng):
    H, W, C, N = 16, 20, 5, 6
    fm = rng.randn(2, H, W, C).astype(np.float32)
    boxes = np.zeros((2, N, 4), np.float32)
    for b in range(2):
        for n in range(N):
            x1 = rng.uniform(0, W * 16 - 40)
            y1 = rng.uniform(0, H * 16 - 40)
            boxes[b, n] = [x1, y1, x1 + rng.uniform(20, 160), y1 + rng.uniform(20, 160)]

    out = roi_align(jnp.asarray(fm), jnp.asarray(boxes), 7, 2, 1 / 16)
    for b in range(2):
        ref = numpy_roi_align(fm[b], boxes[b], 7, 2, 1 / 16)
        np.testing.assert_allclose(np.asarray(out[b]), ref, atol=1e-4, rtol=1e-4)


def test_roi_align_differentiable(rng):
    fm = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
    boxes = jnp.asarray([[[10.0, 10.0, 100.0, 100.0]]])

    def loss(fm):
        return (roi_align(fm, boxes, 7, 2, 1 / 16) ** 2).sum()

    g = jax.grad(loss)(fm)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


@pytest.mark.slow
def test_detector_forward(rng):
    from visualbert_tpu.models.detector import SimpleDetector

    B, N = 2, 4
    images = jnp.asarray(rng.randn(B, 64, 64, 3), jnp.float32)
    boxes = jnp.asarray(
        np.stack([[[0, 0, 32, 32], [8, 8, 56, 56], [0, 0, 63, 63], [16, 0, 48, 40]]] * B).astype(np.float32)
    )
    box_mask = jnp.ones((B, N), jnp.int32)
    classes = jnp.asarray(rng.randint(0, 81, size=(B, N)).astype(np.int32))
    segms = jnp.asarray(rng.rand(B, N, 14, 14).astype(np.float32))

    det = SimpleDetector(final_dim=64, dtype=jnp.float32)
    variables = det.init(
        {"params": jax.random.PRNGKey(0)}, images, boxes, box_mask, classes, segms
    )
    out = det.apply(variables, images, boxes, box_mask, classes, segms)
    assert out["obj_reps"].shape == (B, N, 64)
    assert out["obj_logits"].shape == (B, N, 81)
    assert np.isfinite(float(out["cnn_regularization_loss"]))
    assert np.isfinite(np.asarray(out["obj_reps"])).all()


def test_matmul_matches_gather(rng):
    """The MXU-contraction formulation is numerically equivalent to the
    dynamic-gather formulation (values and feature gradients), including
    border-clamped boxes and adaptive tap counts."""
    H, W, C, N = 16, 20, 5, 7
    fm = rng.randn(2, H, W, C).astype(np.float32)
    boxes = np.zeros((2, N, 4), np.float32)
    for b in range(2):
        for n in range(N - 1):
            x1 = rng.uniform(-10, W * 16 - 20)  # include out-of-image edges
            y1 = rng.uniform(-10, H * 16 - 20)
            boxes[b, n] = [x1, y1, x1 + rng.uniform(5, 320), y1 + rng.uniform(5, 320)]
        boxes[b, N - 1] = [0, 0, W * 16 - 1, H * 16 - 1]  # full-image box
    for ratio in (0, 2):
        out_m = roi_align(jnp.asarray(fm), jnp.asarray(boxes), 7, ratio, 1 / 16,
                          implementation="matmul")
        out_g = roi_align(jnp.asarray(fm), jnp.asarray(boxes), 7, ratio, 1 / 16,
                          implementation="gather")
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_g),
                                   atol=1e-4, rtol=1e-4)

    def loss(fm, impl):
        return (roi_align(fm, jnp.asarray(boxes), 7, 0, 1 / 16,
                          implementation=impl) ** 2).sum()

    g_m = jax.grad(lambda f: loss(f, "matmul"))(jnp.asarray(fm))
    g_g = jax.grad(lambda f: loss(f, "gather"))(jnp.asarray(fm))
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_g), atol=1e-3, rtol=1e-3)


# ---- adaptive sampling_ratio=0 vs a torch transcription of the torchvision
# CPU kernel (cpu/roi_align_kernel.cpp semantics: per-bin grid =
# ceil(roi_size/pooled_size), average of bilinear taps, aligned=False) -----

torch = pytest.importorskip("torch")


def torch_roi_align(fm_nchw, boxes, out_size, sampling_ratio, scale):
    """Independent torch implementation following torchvision's CPU kernel
    structure: per (box, bin) adaptive grid counts, (iy+.5)/grid offsets,
    average over count — NOT a port of ops/roi_align.py (no static max-grid,
    no masked weights; integer grid counts via math.ceil per box)."""
    import math

    C, H, W = fm_nchw.shape
    outs = []
    for box in boxes:
        x1, y1, x2, y2 = [float(v) * scale for v in box]
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_w = roi_w / out_size
        bin_h = roi_h / out_size
        grid_h = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_h / out_size))
        grid_w = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_w / out_size))
        count = max(grid_h * grid_w, 1)
        out = torch.zeros(C, out_size, out_size)
        for ph in range(out_size):
            for pw in range(out_size):
                acc = torch.zeros(C)
                for iy in range(grid_h):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / grid_h
                    yy = min(max(yy, 0.0), H - 1.0)
                    y0 = int(math.floor(yy))
                    y1i = min(y0 + 1, H - 1)
                    ly = yy - y0
                    for ix in range(grid_w):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / grid_w
                        xx = min(max(xx, 0.0), W - 1.0)
                        x0 = int(math.floor(xx))
                        x1i = min(x0 + 1, W - 1)
                        lx = xx - x0
                        acc += (
                            fm_nchw[:, y0, x0] * (1 - ly) * (1 - lx)
                            + fm_nchw[:, y0, x1i] * (1 - ly) * lx
                            + fm_nchw[:, y1i, x0] * ly * (1 - lx)
                            + fm_nchw[:, y1i, x1i] * ly * lx
                        )
                out[:, ph, pw] = acc / count
        outs.append(out)
    return torch.stack(outs)


def test_adaptive_matches_torch_reference(rng):
    H, W, C, N = 16, 20, 4, 5
    fm = rng.randn(H, W, C).astype(np.float32)
    boxes = np.zeros((N, 4), np.float32)
    for n in range(N):
        x1 = rng.uniform(0, W * 16 - 50)
        y1 = rng.uniform(0, H * 16 - 50)
        # spread of sizes so adaptive grid counts differ per box (1..4 taps)
        boxes[n] = [x1, y1, x1 + rng.uniform(20, 300), y1 + rng.uniform(20, 300)]

    out = roi_align(
        jnp.asarray(fm)[None], jnp.asarray(boxes)[None],
        out_size=7, sampling_ratio=0, spatial_scale=1 / 16, max_samples=8,
    )[0]
    ref = torch_roi_align(
        torch.from_numpy(fm.transpose(2, 0, 1)), boxes, 7, 0, 1 / 16
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_fixed_ratio_matches_torch_reference(rng):
    H, W, C, N = 12, 14, 3, 4
    fm = rng.randn(H, W, C).astype(np.float32)
    boxes = np.array(
        [[5, 7, 100, 90], [0, 0, 40, 40], [30, 50, 200, 180], [16, 16, 17, 17]],
        np.float32,
    )
    out = roi_align(
        jnp.asarray(fm)[None], jnp.asarray(boxes)[None],
        out_size=7, sampling_ratio=2, spatial_scale=1 / 16,
    )[0]
    ref = torch_roi_align(
        torch.from_numpy(fm.transpose(2, 0, 1)), boxes, 7, 2, 1 / 16
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)
