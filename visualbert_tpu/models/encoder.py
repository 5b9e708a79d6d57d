"""TPU-native VisualBERT encoder in Flax.

Semantics match the reference single-stream model
(``visualbert/pytorch_pretrained_bert/modeling.py``):

  * embeddings = word + position + token-type; visual tokens = projected
    region features + visual position + visual token-type, concatenated after
    the text tokens, then a single shared LayerNorm (modeling.py:1198-1257).
  * 12 post-LN transformer layers (modeling.py:322-371).
  * additive attention mask ``(1 - m) * -10000`` (modeling.py:1286-1294).
  * pooler = tanh(dense(first token)) (modeling.py:374-386).

TPU-first design choices (no analogue in the reference):
  * parameters are fp32, activations bf16; LayerNorm and softmax run fp32.
  * the layer stack is a single ``nn.scan`` (one traced layer → fast compile,
    weights stacked on a leading ``layers`` axis) unless per-layer attention
    probabilities are requested, in which case the loop is unrolled.
  * every weight carries logical axis names so the same program TP-shards
    over a (data, model) mesh via pjit — vs. the reference's DataParallel
    replicate/scatter/gather (model_wrapper.py:146).
  * optional Pallas fused attention (ops/flash_attention.py) and
    rematerialization for memory.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from visualbert_tpu.config import VisualBertConfig

Array = jax.Array

NEG_INF = -10000.0  # reference mask value (modeling.py:1294) — not true -inf


def mask_to_bias(mask: Array, dtype=jnp.float32) -> Array:
    """[B, T] {0,1} mask → additive [B, 1, 1, T] bias with -10000 at pads."""
    bias = (1.0 - mask.astype(jnp.float32)) * NEG_INF
    return bias[:, None, None, :].astype(dtype)


def truncated_normal_init(stddev: float):
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


@jax.custom_jvp
def _gelu_erf_fast(x):
    """erf-GELU with erf from the Abramowitz–Stegun 7.1.26 rational-exp
    approximation: |erf error| ≤ 1.5e-7 absolute (GELU error ≤ 2.2e-7 exact,
    ≤ 1e-6 after fp32 rounding) — below one bf16 ulp of any activation of
    magnitude > 5e-4, so
    under bf16 compute this is numerically indistinguishable from the exact
    erf the reference uses (modeling.py:56-61) while costing ~1 exp2 + 8
    fma on the VPU instead of XLA's branchy erf expansion.

    The custom derivative rule below matters as much as the forward: with
    ``ffn_recompute_act`` the FFN backward recomputes gelu'(x) inside the
    db1/dpreact fusion, and autodiffing the forward chain costs ~2x the ops
    of the analytic gelu'(x) = Phi(x) + x*phi(x) — the phi term reuses the
    SAME exp(-x²/2) the A&S erf already computes (measured: the FFN
    backward fusion was 1.30 ms/layer via autodiff vs 0.57 for tanh)."""
    return _gelu_erf_fast_both(x)[0]


def _gelu_erf_fast_both(x):
    xf = x.astype(jnp.float32)
    z = jnp.abs(xf) * 0.7071067811865476          # |x| / sqrt(2)
    t = 1.0 / (1.0 + 0.3275911 * z)
    p = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    # exp(-z²) = exp(-x²/2), base-2 form — exp2 is the VPU's hw primitive
    E = jnp.exp2(z * z * -1.4426950408889634)
    erf = jnp.sign(xf) * (1.0 - p * E)
    Phi = 0.5 * (1.0 + erf)                       # Φ(x), normal CDF
    val = (xf * Phi).astype(x.dtype)
    # gelu'(x) = Φ(x) + x·φ(x);  φ(x) = exp(-x²/2)/√(2π), E reused
    grad = Phi + xf * E * 0.3989422804014327
    return val, grad


@_gelu_erf_fast.defjvp
def _gelu_erf_fast_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    val, grad = _gelu_erf_fast_both(x)
    return val, (grad * dx.astype(jnp.float32)).astype(x.dtype)


@jax.custom_vjp
def _gelu_erf_fast_saved(x):
    """Same forward as :func:`_gelu_erf_fast`, but the VJP residual is the
    ANALYTIC gelu'(x) computed in forward (named ``ffn_dact`` for the remat
    policy), so under ``ffn_save_dact`` the backward is one multiply with no
    erf-chain recompute. Identical numerics to the recompute path: both
    evaluate grad via `_gelu_erf_fast_both` in fp32 and round once."""
    return _gelu_erf_fast_both(x)[0]


def _gelu_erf_fast_saved_fwd(x):
    from jax.ad_checkpoint import checkpoint_name

    val, grad = _gelu_erf_fast_both(x)
    return val, checkpoint_name(grad.astype(x.dtype), "ffn_dact")


def _gelu_erf_fast_saved_bwd(dact, g):
    return ((dact.astype(jnp.float32) * g.astype(jnp.float32)).astype(g.dtype),)


_gelu_erf_fast_saved.defvjp(_gelu_erf_fast_saved_fwd, _gelu_erf_fast_saved_bwd)


def activation(name: str, dtype=None):
    """Reference ACT2FN (modeling.py:56-69): exact-erf gelu, relu, swish;
    plus tanh-approx gelu as a TPU-speed option. Under bf16 compute,
    "gelu" uses the sub-bf16-ulp-accurate fast erf (_gelu_erf_fast);
    fp32 compute (golden-parity/eval configs) keeps XLA's exact erf."""
    if name == "gelu" and dtype == jnp.bfloat16:
        return _gelu_erf_fast
    return {
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "gelu_erf_fast": _gelu_erf_fast,
        "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
        "relu": jax.nn.relu,
        "swish": jax.nn.swish,
    }[name]


def fast_dropout_or_none(module: nn.Module, x: Array, rate: float,
                         cfg: VisualBertConfig):
    """Apply the Pallas mask-kernel dropout when it applies, else None (the
    caller falls back to nn.Dropout). One home for the guard: on >1-device
    meshes the kernel is dispatched through shard_map (batch on ``data``),
    which needs the leading dim to divide over the data axis — otherwise
    fall back."""
    if rate <= 0.0 or not cfg.fast_dropout:
        return None
    mesh = cfg.mesh
    if mesh is not None and mesh.size > 1:
        if x.shape[0] % mesh.shape.get("data", 1) != 0:
            return None
    from visualbert_tpu.ops.dropout import fast_dropout

    seed = jax.random.randint(
        module.make_rng("dropout"), (1,), 0, 2**31 - 1, dtype=jnp.int32
    )
    return fast_dropout(x, rate, seed, mesh=mesh)


class FusedQKV(nn.Module):
    """Single fused QKV projection — one [H, 3·H] matmul instead of three
    (better MXU utilization). ``packed=True`` emits the matmul-natural
    [B, T, 3·H·D] (full-width MXU tiles; the packed Pallas kernel carves the
    heads out in VMEM); ``heads_major=True`` emits [B, 3, H, T, D] (legacy
    kernel layout); default emits [B, T, 3, H, D]."""

    config: VisualBertConfig
    heads_major: bool = False
    packed: bool = False
    defer_bias: bool = False  # packed only: return (out_no_bias, bias[F])

    @nn.compact
    def __call__(self, hidden: Array):
        cfg = self.config
        kernel = self.param(
            "kernel",
            nn.with_partitioning(
                truncated_normal_init(cfg.initializer_range),
                ("embed", "stack", "heads", "kv"),
            ),
            (cfg.hidden_size, 3, cfg.num_attention_heads, cfg.head_dim),
            cfg.param_dtype,
        )
        bias = self.param(
            "bias",
            nn.with_partitioning(
                nn.initializers.zeros_init(), ("stack", "heads", "kv")
            ),
            (3, cfg.num_attention_heads, cfg.head_dim),
            cfg.param_dtype,
        )
        kernel = kernel.astype(cfg.dtype)
        bias = bias.astype(cfg.dtype)
        if self.packed:
            F = 3 * cfg.num_attention_heads * cfg.head_dim
            # head-major packing [h, (q,k,v), d] — a TP split of the feature
            # axis hands each shard complete heads
            out = hidden @ kernel.transpose(0, 2, 1, 3).reshape(cfg.hidden_size, F)
            packed_bias = bias.transpose(1, 0, 2).reshape(F)
            if self.defer_bias:
                return out, packed_bias
            return out + packed_bias
        if self.heads_major:
            out = jnp.einsum("bte,eshd->bshtd", hidden, kernel)
            return out + bias[None, :, :, None, :]
        out = jnp.einsum("bte,eshd->btshd", hidden, kernel)
        return out + bias


class OutProj(nn.Module):
    """Attention output projection, layout-aware (consumes [B,T,H·D] packed
    from the packed kernel, [B,H,T,D] from the legacy fused kernel, or
    [B,T,H,D] from the einsum path — all without transposes). Param
    names/shapes match the previous DenseGeneral ("out"/kernel,bias)."""

    config: VisualBertConfig
    heads_major: bool = False
    packed: bool = False

    @nn.compact
    def __call__(self, ctx: Array) -> Array:
        cfg = self.config
        kernel = self.param(
            "kernel",
            nn.with_partitioning(
                truncated_normal_init(cfg.initializer_range), ("heads", "kv", "embed")
            ),
            (cfg.num_attention_heads, cfg.head_dim, cfg.hidden_size),
            cfg.param_dtype,
        )
        bias = self.param(
            "bias",
            nn.with_partitioning(nn.initializers.zeros_init(), ("embed",)),
            (cfg.hidden_size,),
            cfg.param_dtype,
        )
        if self.packed:
            hd = cfg.num_attention_heads * cfg.head_dim
            out = ctx @ kernel.astype(cfg.dtype).reshape(hd, cfg.hidden_size)
            return out + bias.astype(cfg.dtype)
        eq = "bhtd,hde->bte" if self.heads_major else "bthd,hde->bte"
        return jnp.einsum(eq, ctx, kernel.astype(cfg.dtype)) + bias.astype(cfg.dtype)


class SelfAttention(nn.Module):
    """Multi-head self-attention (reference: modeling.py:207-261).

    QKV is one fused projection whose head axis is a real weight axis the
    mesh rules can TP-shard.
    """

    config: VisualBertConfig

    @nn.compact
    def __call__(
        self,
        hidden: Array,
        attn_bias: Array,
        deterministic: bool = True,
        output_probs: bool = False,
    ):
        cfg = self.config
        init = truncated_normal_init(cfg.initializer_range)
        use_kernel = cfg.use_flash_attention and not output_probs
        use_packed = use_kernel and cfg.packed_qkv

        qkv = FusedQKV(
            cfg, heads_major=use_kernel and not use_packed, packed=use_packed,
            defer_bias=use_packed, name="qkv",
        )(hidden)
        qkv_bias = None
        if use_packed:
            qkv, qkv_bias = qkv  # bias deferred into the kernel (d_bias fused)
        if use_kernel:
            rate = 0.0 if deterministic else cfg.attention_probs_dropout_prob
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32
                )
            probs = None
            if use_packed:
                from visualbert_tpu.ops.flash_attention import flash_attention_packed

                ctx = flash_attention_packed(
                    qkv, cfg.num_attention_heads, bias=attn_bias,
                    dropout_rate=rate, seed=seed, mesh=cfg.mesh,
                    save_probs=cfg.flash_save_probs, qkv_bias=qkv_bias,
                )  # [B, T, H·D]
            else:
                from visualbert_tpu.ops.flash_attention import flash_attention

                q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # [B, H, T, D]
                ctx = flash_attention(
                    q, k, v, bias=attn_bias, dropout_rate=rate, seed=seed,
                    heads_major=True,
                )  # [B, H, T, D]
        else:
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, T, H, D]
            scale = 1.0 / jnp.sqrt(jnp.asarray(cfg.head_dim, jnp.float32))
            # scores in fp32 for a numerically faithful softmax
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            )
            scores = scores * scale + attn_bias.astype(jnp.float32)
            probs = jax.nn.softmax(scores, axis=-1)
            probs_cast = probs.astype(cfg.dtype)
            probs_cast = nn.Dropout(rate=cfg.attention_probs_dropout_prob)(
                probs_cast, deterministic=deterministic
            )
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs_cast, v)  # [B, T, H, D]

        out = OutProj(
            cfg, heads_major=use_kernel and not use_packed, packed=use_packed,
            name="out",
        )(ctx)
        return (out, probs) if output_probs else (out, None)


class ResidualNorm(nn.Module):
    """``LayerNorm(dropout(x) + residual)`` — the sublayer epilogue
    (reference modeling.py:271-276/312-318 + apex FusedLayerNorm,
    modeling.py:158-162). With ``use_fused_layer_norm`` the whole epilogue
    (PRNG dropout, add, fp32 stats, affine) runs as ONE Pallas VMEM pass
    with a recompute VJP; otherwise identical two-pass fp32 XLA math."""

    config: VisualBertConfig

    @nn.compact
    def __call__(self, x: Array, res: Array, deterministic: bool = True) -> Array:
        cfg = self.config
        scale = self.param(
            "scale", nn.initializers.ones_init(), (cfg.hidden_size,), cfg.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (cfg.hidden_size,), cfg.param_dtype
        )
        rate = 0.0 if deterministic else cfg.hidden_dropout_prob
        from visualbert_tpu.ops.layer_norm import (
            fused_add_layer_norm,
            fused_dropout_add_layer_norm,
            reference_add_layer_norm,
        )

        if cfg.use_fused_layer_norm:
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, 2**31 - 1, dtype=jnp.int32
                )
                return fused_dropout_add_layer_norm(
                    x, res, scale, bias, seed, rate, cfg.layer_norm_eps
                )
            return fused_add_layer_norm(x, res, scale, bias, cfg.layer_norm_eps)
        if rate > 0.0:
            y = fast_dropout_or_none(self, x, rate, cfg)
            if y is not None:
                x = y
            else:
                x = nn.Dropout(rate=cfg.hidden_dropout_prob)(x, deterministic=False)
        return reference_add_layer_norm(x, res, scale, bias, cfg.layer_norm_eps)


def _ffn_save_dact_active(cfg: VisualBertConfig) -> bool:
    """ffn_save_dact applies only where the fast-erf gelu would run (its
    saved-dact twin shares the same forward/derivative math bit-for-bit)."""
    return bool(cfg.ffn_save_dact) and (
        cfg.hidden_act == "gelu_erf_fast"
        or (cfg.hidden_act == "gelu" and cfg.dtype == jnp.bfloat16)
    )


def _ffn_body(mdl: "TransformerLayer", hidden: Array) -> Array:
    """FFN sublayer (reference modeling.py:295-319). Split out so it can be
    wrapped in nn.remat with a save-only-preactivation policy: without it XLA
    materializes BOTH the pre-gelu and post-gelu [N, intermediate] arrays to
    HBM in the forward pass (the backward needs pre-act for gelu' and
    post-act for dW2) — the extra write/read makes the intermediate matmul
    ~2× slower than roofline. With the policy only the pre-activation is
    saved and gelu is recomputed in the backward (elementwise, fuses into
    the dW2 read)."""
    cfg = mdl.config
    init = truncated_normal_init(cfg.initializer_range)
    h = nn.Dense(
        cfg.intermediate_size,
        dtype=cfg.dtype,
        param_dtype=cfg.param_dtype,
        kernel_init=nn.with_partitioning(init, ("embed", "mlp")),
        bias_init=nn.with_partitioning(nn.initializers.zeros_init(), ("mlp",)),
        name="intermediate",
    )(hidden)
    from jax.ad_checkpoint import checkpoint_name

    if _ffn_save_dact_active(cfg):
        # ffn_save_dact: save post-act + analytic gelu' (named inside the
        # custom VJP) — the backward never touches the pre-activation, so
        # it isn't saved and the erf chain isn't replayed.
        h = checkpoint_name(_gelu_erf_fast_saved(h), "ffn_act")
    else:
        h = checkpoint_name(h, "ffn_preact")
        # default: exact (erf) gelu — reference modeling.py:56-61
        h = activation(cfg.hidden_act, cfg.dtype)(h)
    return nn.Dense(
        cfg.hidden_size,
        dtype=cfg.dtype,
        param_dtype=cfg.param_dtype,
        kernel_init=nn.with_partitioning(init, ("mlp", "embed")),
        bias_init=nn.with_partitioning(nn.initializers.zeros_init(), ("embed",)),
        name="output",
    )(h)


class TransformerLayer(nn.Module):
    """Post-LN BERT layer: attn → add&norm → FFN(gelu) → add&norm
    (reference: modeling.py:322-342)."""

    config: VisualBertConfig

    @nn.compact
    def __call__(
        self,
        hidden: Array,
        attn_bias: Array,
        deterministic: bool = True,
        output_probs: bool = False,
    ):
        cfg = self.config

        attn_out, probs = SelfAttention(cfg, name="attention")(
            hidden, attn_bias, deterministic, output_probs
        )
        # dropout is fused into the ResidualNorm epilogue
        hidden = ResidualNorm(cfg, name="attention_norm")(
            attn_out, hidden, deterministic=deterministic
        )

        if cfg.ffn_recompute_act and not cfg.remat:
            saved = (("ffn_act", "ffn_dact") if _ffn_save_dact_active(cfg)
                     else ("ffn_preact",))
            ffn_fn = nn.remat(
                _ffn_body,
                policy=jax.checkpoint_policies.save_only_these_names(*saved),
                prevent_cse=False,
            )
        else:  # whole-layer remat already recomputes everything
            ffn_fn = _ffn_body
        ffn = ffn_fn(self, hidden)
        hidden = ResidualNorm(cfg, name="output_norm")(
            ffn, hidden, deterministic=deterministic
        )
        return hidden, probs


class TransformerEncoder(nn.Module):
    """Layer stack (reference: modeling.py:344-371).

    Scanned (stacked weights, single trace) by default; unrolled when
    attention probabilities are requested.
    """

    config: VisualBertConfig

    @nn.compact
    def __call__(
        self,
        hidden: Array,
        attn_bias: Array,
        deterministic: bool = True,
        output_probs: bool = False,
    ) -> Tuple[Array, Optional[Array]]:
        cfg = self.config
        collect = output_probs or cfg.output_attention_weights

        if not cfg.scan_layers:
            # unrolled: per-layer param subtrees (layer_0..layer_{L-1});
            # convert stacked checkpoints with tools/params.unstack_layers
            all_probs = []
            for i in range(cfg.num_hidden_layers):
                hidden, probs = TransformerLayer(cfg, name=f"layer_{i}")(
                    hidden, attn_bias, deterministic, collect
                )
                if collect:
                    all_probs.append(probs)
            return hidden, (jnp.stack(all_probs, axis=0) if collect else None)

        layer_cls = TransformerLayer
        if cfg.remat and not collect:
            # flax remat counts the module itself as args[0] — the two bool
            # flags are args[3] and args[4]
            layer_cls = nn.remat(
                TransformerLayer,
                static_argnums=(3, 4),
                prevent_cse=False,
            )

        def body(layer, carry, _):
            h, bias = carry
            h, probs = layer(h, bias, deterministic, collect)
            return (h, bias), probs

        stack = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.num_hidden_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )
        (hidden, _), probs = stack(layer_cls(cfg, name="layers"), (hidden, attn_bias), None)
        # probs: [L, B, H, T, T] fp32 when collected, else None
        return hidden, probs


class VisualBertEmbeddings(nn.Module):
    """Joint text+visual embeddings (reference: modeling.py:1169-1257).

    Text: word + learned position + token-type.
    Visual: linear projection of region features + token-type(visual) +
    position, where position is either a constant row (index 0 of the *visual*
    position table) or, when ``image_text_alignment`` is given, the average of
    the *text* position embeddings of the aligned words plus that constant row
    (modeling.py:1223-1245). Output = LayerNorm(concat[text ; visual]).
    """

    config: VisualBertConfig

    def setup(self):
        cfg = self.config
        init = truncated_normal_init(cfg.initializer_range)
        embed = functools.partial(
            nn.Embed,
            features=cfg.hidden_size,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
        )
        self.word_embeddings = embed(
            num_embeddings=cfg.vocab_size,
            embedding_init=nn.with_partitioning(init, ("vocab", "embed")),
            name="word_embeddings",
        )
        self.position_embeddings = embed(
            num_embeddings=cfg.max_position_embeddings,
            embedding_init=nn.with_partitioning(init, ("pos", "embed")),
            name="position_embeddings",
        )
        self.token_type_embeddings = embed(
            num_embeddings=cfg.type_vocab_size,
            embedding_init=nn.with_partitioning(init, ("types", "embed")),
            name="token_type_embeddings",
        )
        # Visual-stream tables; initialized by copying the text tables when
        # importing reference checkpoints (modeling.py:1191-1196
        # ``special_intialize``).
        self.token_type_embeddings_visual = embed(
            num_embeddings=cfg.type_vocab_size,
            embedding_init=nn.with_partitioning(init, ("types", "embed")),
            name="token_type_embeddings_visual",
        )
        self.position_embeddings_visual = embed(
            num_embeddings=cfg.max_position_embeddings,
            embedding_init=nn.with_partitioning(init, ("pos", "embed")),
            name="position_embeddings_visual",
        )
        self.projection = nn.Dense(
            cfg.hidden_size,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=nn.with_partitioning(
                truncated_normal_init(cfg.initializer_range), ("visual_in", "embed")
            ),
            bias_init=nn.with_partitioning(nn.initializers.zeros_init(), ("embed",)),
            name="projection",
        )
        self.norm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps,
            dtype=jnp.float32,
            param_dtype=cfg.param_dtype,
            name="norm",
        )
        self.dropout = nn.Dropout(rate=cfg.hidden_dropout_prob)

    def __call__(
        self,
        input_ids: Array,                      # [B, Tt] int32
        token_type_ids: Optional[Array] = None,  # [B, Tt] int32
        visual_embeddings: Optional[Array] = None,      # [B, Tv, Dv]
        visual_token_type_ids: Optional[Array] = None,  # [B, Tv] int32
        image_text_alignment: Optional[Array] = None,   # [B, Tv, A] int32, -1 pad
        deterministic: bool = True,
    ) -> Array:
        cfg = self.config
        B, Tt = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        positions = jnp.arange(Tt, dtype=jnp.int32)[None, :]
        text = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(positions)
            + self.token_type_embeddings(token_type_ids)
        )

        if visual_embeddings is not None:
            Tv = visual_embeddings.shape[1]
            vis = self.projection(visual_embeddings.astype(cfg.dtype))
            if visual_token_type_ids is None:
                visual_token_type_ids = jnp.zeros((B, Tv), jnp.int32)
            vis = vis + self.token_type_embeddings_visual(visual_token_type_ids)

            # constant visual position row (index 0) — modeling.py:1244-1247
            vis_pos0 = self.position_embeddings_visual(jnp.zeros((B, Tv), jnp.int32))
            if image_text_alignment is not None:
                # average text-position embeddings over aligned word slots,
                # -1 is padding (modeling.py:1223-1239)
                align_mask = (image_text_alignment != -1).astype(jnp.float32)
                safe_idx = jnp.maximum(image_text_alignment, 0)
                pos = self.position_embeddings(safe_idx)  # [B, Tv, A, H]
                pos = pos.astype(jnp.float32) * align_mask[..., None]
                denom = jnp.maximum(align_mask.sum(axis=2), 1.0)  # avoid /0
                aligned_pos = pos.sum(axis=2) / denom[..., None]
                vis = vis + aligned_pos.astype(cfg.dtype) + vis_pos0
            else:
                vis = vis + vis_pos0

            text = jnp.concatenate([text, vis], axis=1)

        out = self.norm(text).astype(cfg.dtype)
        if not deterministic:
            y = fast_dropout_or_none(self, out, cfg.hidden_dropout_prob, cfg)
            if y is not None:
                return y
        return self.dropout(out, deterministic=deterministic)


class Pooler(nn.Module):
    """tanh(dense(first token)) — reference modeling.py:374-386."""

    config: VisualBertConfig

    @nn.compact
    def __call__(self, hidden: Array) -> Array:
        cfg = self.config
        x = nn.Dense(
            cfg.hidden_size,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=nn.with_partitioning(
                truncated_normal_init(cfg.initializer_range), ("embed", "embed_out")
            ),
            name="dense",
        )(hidden[:, 0])
        return jnp.tanh(x)


class VisualBertModel(nn.Module):
    """Embeddings + encoder + pooler (reference ``BertVisualModel``,
    modeling.py:1260-1333), including the ``bypass_transformer`` split path
    (text through the full stack alone, then one extra joint layer —
    modeling.py:1299-1314)."""

    config: VisualBertConfig

    def setup(self):
        cfg = self.config
        self.embeddings = VisualBertEmbeddings(cfg, name="embeddings")
        self.encoder = TransformerEncoder(cfg, name="encoder")
        self.pooler = Pooler(cfg, name="pooler")
        if cfg.bypass_transformer:
            self.additional_layer = TransformerLayer(cfg, name="additional_layer")

    def __call__(
        self,
        input_ids: Array,
        token_type_ids: Optional[Array] = None,
        attention_mask: Optional[Array] = None,   # [B, Tt(+Tv)] {0,1}
        visual_embeddings: Optional[Array] = None,
        visual_token_type_ids: Optional[Array] = None,
        image_text_alignment: Optional[Array] = None,
        deterministic: bool = True,
        output_attention_probs: bool = False,
    ):
        cfg = self.config
        B, Tt = input_ids.shape
        Tv = 0 if visual_embeddings is None else visual_embeddings.shape[1]
        if attention_mask is None:
            attention_mask = jnp.ones((B, Tt + Tv), jnp.int32)

        hidden = self.embeddings(
            input_ids,
            token_type_ids,
            visual_embeddings,
            visual_token_type_ids,
            image_text_alignment,
            deterministic=deterministic,
        )
        attn_bias = mask_to_bias(attention_mask, dtype=jnp.float32)

        if cfg.bypass_transformer and visual_embeddings is not None:
            text_hidden = hidden[:, :Tt]
            vis_hidden = hidden[:, Tt:]
            text_bias = attn_bias[..., :Tt]
            text_out, _ = self.encoder(text_hidden, text_bias, deterministic)
            joint = jnp.concatenate([text_out, vis_hidden], axis=1)
            seq_out, _ = self.additional_layer(joint, attn_bias, deterministic)
            return seq_out, self.pooler(seq_out), None

        seq_out, probs = self.encoder(
            hidden, attn_bias, deterministic, output_probs=output_attention_probs
        )
        return seq_out, self.pooler(seq_out), probs
