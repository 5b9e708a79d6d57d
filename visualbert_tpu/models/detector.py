"""TPU-resident detector: Flax ResNet50 trunk + RoIAlign + per-box head.

Rebuild of the reference ``SimpleDetector`` (``visualbert/utils/detector.py:
48-144``) used by the VCR end-to-end path:

  * ResNet50 through layer3 with the tf-faster-rcnn stride surgery — layers
    2/3 carry the stride on conv1 instead of conv2, layer4 is stride 1
    (detector.py:30-45) → output stride 16, 1024 channels.
  * RoIAlign 7×7 at 1/16 scale (here ``ops/roi_align.py``; static shapes,
    all padded boxes aligned — no nonzero() compaction).
  * Optional segmentation-mask injection: conv(2-strided 3×3) of the 14×14
    soft mask added to the first 32 RoI channels (detector.py:122-125).
  * layer4 + global average pool per box → 2048-d (detector.py:126-127).
  * 81-way auxiliary classifier → ``cnn_regularization_loss``
    (detector.py:128-131), masked CE over valid boxes.
  * class-embedding concat + dropout + linear + ReLU → ``final_dim``
    (detector.py:92-96,133-136).

TPU-first: NHWC layout, bf16 conv compute, BatchNorm in inference mode with
frozen stats (the reference freezes detector BN during training —
``model_wrapper.py:223-232``).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from visualbert_tpu.ops.roi_align import roi_align

Array = jax.Array


class FrozenBatchNorm(nn.Module):
    """BatchNorm with stored (non-updating) statistics — matches the frozen
    detector BN; scale/bias/mean/var are importable from torchvision."""

    features: int
    dtype: Any = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        mean = self.param("mean", nn.initializers.zeros_init(), (self.features,))
        var = self.param("var", nn.initializers.ones_init(), (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x.astype(jnp.float32) * inv + (bias - mean * inv)).astype(self.dtype)


class Bottleneck(nn.Module):
    """ResNet bottleneck with configurable stride placement (the surgery puts
    stride on conv1 for layers 2+)."""

    features: int          # bottleneck width (out = 4x)
    stride: int = 1
    stride_on_conv1: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        conv = functools.partial(nn.Conv, use_bias=False, dtype=self.dtype)
        s1 = (self.stride, self.stride) if self.stride_on_conv1 else (1, 1)
        s2 = (1, 1) if self.stride_on_conv1 else (self.stride, self.stride)

        residual = x
        y = conv(self.features, (1, 1), strides=s1, name="conv1")(x)
        y = FrozenBatchNorm(self.features, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), strides=s2, padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = FrozenBatchNorm(self.features, self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = FrozenBatchNorm(self.features * 4, self.dtype, name="bn3")(y)

        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = conv(
                self.features * 4, (1, 1), strides=(self.stride, self.stride),
                name="downsample_conv",
            )(x)
            residual = FrozenBatchNorm(self.features * 4, self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetStage(nn.Module):
    features: int
    blocks: int
    stride: int
    stride_on_conv1: bool
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.blocks):
            x = Bottleneck(
                self.features,
                stride=self.stride if i == 0 else 1,
                stride_on_conv1=self.stride_on_conv1 and i == 0,
                dtype=self.dtype,
                name=f"block{i}",
            )(x)
        return x


def space_to_depth(x: Array) -> Array:
    """[B, H, W, C] → [B, H/2, W/2, 4C]; channel index = (p·2 + q)·C + c for
    source pixel (2u+p, 2v+q)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def _s2d_tap(du: int, p: int) -> int:
    """7-tap index k covered by s2d kernel row ``du`` at phase ``p``:
    x[2o + k - 3] = X[o + (du - 2), p] ⇒ k = 2·du + p − 1 (−1 = outside)."""
    k = 2 * du + p - 1
    return k if 0 <= k <= 6 else -1


def s2d_stem_mask(cin: int, cout: int) -> "np.ndarray":
    """{0,1} mask over the [4, 4, 4·cin, cout] s2d stem kernel: 1 exactly on
    slots that correspond to a real 7×7 tap. Masking in the forward pass
    keeps the phantom slots (and their GRADIENTS) at zero, so training in
    the s2d parameterization stays exactly the 147-dof 7×7 problem and the
    export back to torch layout is always lossless."""
    import numpy as np

    m = np.zeros((4, 4, 4 * cin, cout), np.float32)
    for du in range(4):
        for p in range(2):
            if _s2d_tap(du, p) < 0:
                continue
            for dv in range(4):
                for q in range(2):
                    if _s2d_tap(dv, q) < 0:
                        continue
                    ch = (p * 2 + q) * cin
                    m[du, dv, ch : ch + cin] = 1.0
    return m


def stem_7x7_to_s2d(w7: "np.ndarray") -> "np.ndarray":
    """[7, 7, cin, O] → [4, 4, 4·cin, O] exact rearrangement (import
    direction; unused slots zero). Inverse: :func:`stem_s2d_to_7x7`."""
    import numpy as np

    kh, kw, cin, out = w7.shape
    assert (kh, kw) == (7, 7), w7.shape
    w4 = np.zeros((4, 4, 4 * cin, out), w7.dtype)
    for du in range(4):
        for p in range(2):
            k = _s2d_tap(du, p)
            if k < 0:
                continue
            for dv in range(4):
                for q in range(2):
                    l = _s2d_tap(dv, q)
                    if l < 0:
                        continue
                    ch = (p * 2 + q) * cin
                    w4[du, dv, ch : ch + cin] = w7[k, l]
    return w4


def stem_s2d_to_7x7(w4: "np.ndarray") -> "np.ndarray":
    """[4, 4, 4·cin, O] → [7, 7, cin, O] (export direction)."""
    import numpy as np

    _, _, cin4, out = w4.shape
    cin = cin4 // 4
    w7 = np.zeros((7, 7, cin, out), w4.dtype)
    for du in range(4):
        for p in range(2):
            k = _s2d_tap(du, p)
            if k < 0:
                continue
            for dv in range(4):
                for q in range(2):
                    l = _s2d_tap(dv, q)
                    if l < 0:
                        continue
                    ch = (p * 2 + q) * cin
                    w7[k, l] = w4[du, dv, ch : ch + cin]
    return w7


class ResNet50Trunk(nn.Module):
    """conv1 .. layer3 (output stride 16, 1024ch).

    ``blocks`` sets the bottleneck count per stage — (3, 4, 6) is resnet50
    (the reference's only backbone, detector.py:31); other depths (e.g.
    resnet101's (3, 4, 23), or (1, 1, 1) for fast tests) reuse the same
    parameter layout per block.

    ``s2d_stem`` (default on) replaces the 7×7-stride-2 stem conv with the
    exact space-to-depth equivalent: a 4×4-stride-1 conv over the 2×2-s2d
    input. Same math (masked phantom slots keep it a 147-dof problem; see
    ``s2d_stem_mask``), but MXU-shaped: 12 input channels instead of 3 (¼
    the lane padding waste) and a stride-1 schedule. The torch import/export
    converters rearrange the kernel losslessly in both directions."""

    dtype: Any = jnp.bfloat16
    blocks: tuple = (3, 4, 6)
    # channel divisor for tests: 1 = exact resnet50 widths (64/128/256 →
    # 1024ch out); >1 scales every stage down (same layout, 1/div² FLOPs)
    width_div: int = 1
    s2d_stem: bool = True

    @nn.compact
    def __call__(self, images: Array) -> Array:  # [B, H, W, 3] → [B, H/16, W/16, 1024/div]
        d = self.width_div
        if self.s2d_stem:
            B, H, W, C = images.shape
            assert H % 2 == 0 and W % 2 == 0, (
                f"s2d stem needs even image dims, got {images.shape}; pad the "
                "canvas or set s2d_stem=False"
            )
            # u-domain pad (2, 1) ≡ the 7×7 conv's symmetric pad 3 (the extra
            # left column is a masked phantom tap)
            x = nn.Conv(
                64 // d, (4, 4), strides=(1, 1), padding=[(2, 1), (2, 1)],
                use_bias=False, dtype=self.dtype,
                mask=s2d_stem_mask(C, 64 // d), name="conv1",
            )(space_to_depth(images.astype(self.dtype)))
        else:
            x = nn.Conv(64 // d, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype, name="conv1")(images.astype(self.dtype))
        x = FrozenBatchNorm(64 // d, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = ResNetStage(64 // d, self.blocks[0], 1, False, self.dtype, name="layer1")(x)
        x = ResNetStage(128 // d, self.blocks[1], 2, True, self.dtype, name="layer2")(x)
        x = ResNetStage(256 // d, self.blocks[2], 2, True, self.dtype, name="layer3")(x)
        return x


class ResNet50Layer4(nn.Module):
    """layer4 with stride 1 (post-RoI head)."""

    dtype: Any = jnp.bfloat16
    blocks: int = 3
    width_div: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:  # [N, 7, 7, 1024/div] → [N, 7, 7, 2048/div]
        return ResNetStage(512 // self.width_div, self.blocks, 1, True,
                           self.dtype, name="layer4")(x)


class SimpleDetector(nn.Module):
    """Full detector producing per-box object representations."""

    final_dim: int = 512
    semantic: bool = True
    num_classes: int = 81
    mask_dims: int = 32
    dtype: Any = jnp.bfloat16
    dropout_rate: float = 0.1
    # backbone depth: ((layer1, layer2, layer3), layer4) bottleneck counts;
    # default = resnet50 (the reference backbone)
    trunk_blocks: tuple = (3, 4, 6)
    layer4_blocks: int = 3
    # channel divisor (tests only; 1 = exact resnet50 widths)
    width_div: int = 1

    @nn.compact
    def __call__(
        self,
        images: Array,                 # [B, H, W, 3] fp32 normalized OR uint8
        boxes: Array,                  # [B, N, 4] (x1,y1,x2,y2) pixels
        box_mask: Array,               # [B, N] {0,1}
        classes: Optional[Array] = None,  # [B, N] int
        segms: Optional[Array] = None,    # [B, N, 14, 14] soft masks
        deterministic: bool = True,
        image_hw: Optional[Array] = None,  # [B, 2] content (h, w) in canvas
    ):
        B, N = boxes.shape[:2]
        if images.dtype == jnp.uint8:
            # uint8 wire format (4× fewer host->device bytes than fp32):
            # ImageNet normalization moves in-graph, and the square padding
            # is re-zeroed from the content extent so the canvas matches the
            # host-normalized layout (zeros outside content, exactly like
            # the reference's post-normalize zero pad, box_utils.py:56-63)
            from visualbert_tpu.utils.images import IMAGENET_MEAN, IMAGENET_STD

            images = (
                images.astype(jnp.float32) / 255.0 - jnp.asarray(IMAGENET_MEAN)
            ) / jnp.asarray(IMAGENET_STD)
            if image_hw is not None:
                H, W = images.shape[1], images.shape[2]
                in_h = jnp.arange(H)[None, :] < image_hw[:, :1]      # [B, H]
                in_w = jnp.arange(W)[None, :] < image_hw[:, 1:2]     # [B, W]
                images = images * (
                    in_h[:, :, None] & in_w[:, None, :]
                )[..., None].astype(images.dtype)
        fm = ResNet50Trunk(self.dtype, self.trunk_blocks, self.width_div,
                           name="backbone")(images)
        # enforce the in-image assumption roi_align's exactness bound relies
        # on (reference dataloaders assert it, dataloaders/vcr.py:375-380):
        # clip boxes to the image so every RoI fits the feature map
        img_h, img_w = images.shape[1], images.shape[2]
        lim = jnp.asarray([img_w - 1, img_h - 1, img_w - 1, img_h - 1],
                          dtype=boxes.dtype)
        boxes = jnp.clip(boxes, 0, lim)
        # sampling_ratio=0 = torchvision's adaptive quadrature (detector.py:71-73)
        roi = roi_align(fm, boxes, out_size=7, sampling_ratio=0, spatial_scale=1 / 16)
        roi = roi.reshape(B * N, 7, 7, fm.shape[-1])

        if self.semantic and segms is not None:
            m = segms.reshape(B * N, 14, 14, 1).astype(self.dtype) - 0.5
            m = nn.Conv(self.mask_dims, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name="mask_upsample")(m)
            roi = roi.at[..., : self.mask_dims].add(m)

        post = ResNet50Layer4(self.dtype, self.layer4_blocks, self.width_div,
                              name="after_roi_align")(roi)
        post = post.mean(axis=(1, 2))  # [B*N, 2048] global average pool

        obj_logits = nn.Dense(self.num_classes, dtype=self.dtype,
                              name="regularizing_predictor")(post).astype(jnp.float32)

        out = {
            "obj_reps_raw": post.reshape(B, N, -1),
            "obj_logits": obj_logits.reshape(B, N, -1),
        }
        feats = post
        if self.semantic and classes is not None:
            emb = nn.Embed(self.num_classes, 128, dtype=self.dtype,
                           name="object_embed")(classes.reshape(B * N))
            feats = jnp.concatenate([post, emb], axis=-1)
            # masked CE over valid boxes (detector.py:128-131)
            labels = classes.reshape(-1)
            ce = -jnp.take_along_axis(
                jax.nn.log_softmax(obj_logits, axis=-1), labels[:, None], axis=-1
            )[:, 0]
            valid = box_mask.reshape(-1).astype(jnp.float32)
            out["cnn_regularization_loss"] = (ce * valid).sum() / jnp.maximum(valid.sum(), 1.0)

        feats = nn.Dropout(self.dropout_rate)(feats, deterministic=deterministic)
        reps = nn.relu(
            nn.Dense(self.final_dim, dtype=self.dtype, name="obj_downsample")(feats)
        )
        out["obj_reps"] = reps.reshape(B, N, self.final_dim)
        return out
