"""Coverage for smaller paths: export unrolled layout, prefetch error
propagation, Batcher pad_final, StepTimer, screen_features, ConcatFeatures,
truncate_front, logging tee."""

import time

import numpy as np
import pytest

from visualbert_tpu.data.features import ChunkFeatures, ConcatFeatures, screen_features
from visualbert_tpu.data.masking import truncate_front
from visualbert_tpu.data.pipeline import Batcher, prefetch
from visualbert_tpu.utils.profiling import StepTimer


def test_screen_features():
    feats = np.arange(10)[:, None].astype(np.float32)
    conf = np.array([0.9, 0.1, 0.5, 0.05, 0.8, 0.3, 0.15, 0.25, 0.6, 0.01])
    out, oc = screen_features(feats, conf, threshold=0.2, max_cap=4)
    # sorted by confidence desc, conf >= 0.2, capped at 4
    assert list(out[:, 0]) == [0, 4, 8, 2]
    assert (oc >= 0.2).all()
    # min_count kicks in when nothing passes
    out2, oc2 = screen_features(feats, conf * 0.01, threshold=0.2, max_cap=4, min_count=2)
    assert out2.shape[0] == 2
    # no confidences → plain cap
    out3, oc3 = screen_features(feats, None, max_cap=3)
    assert out3.shape[0] == 3 and oc3 is None


def test_concat_features():
    a = ChunkFeatures({"x": {"features": np.ones((2, 3))}})
    b = ChunkFeatures({"y": {"features": np.zeros((2, 3))}})
    c = ConcatFeatures([a, b])
    assert "x" in c and "y" in c and "z" not in c
    assert c.get("y")["features"].sum() == 0
    with pytest.raises(KeyError):
        c.get("z")


def test_truncate_front():
    assert truncate_front(list("abcdef"), 3) == list("def")
    assert truncate_front(list("ab"), 3) == list("ab")


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen(), size=1)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_batcher_pad_final():
    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, args):
            i, _ = args
            return {"x": np.int64(i)}

    b = Batcher(DS(), 4, shuffle=False, drop_last=False, pad_final=True)
    batches = list(b.epoch(0))
    assert len(batches) == 3
    assert all(len(batch["x"]) == 4 for batch in batches)
    # final batch padded by repeating its own indices
    assert set(batches[2]["x"][:2]) == {8, 9}


def test_step_timer():
    t = StepTimer(reset_every=100)
    for _ in range(3):
        t.step(8)
        time.sleep(0.01)
    assert t.sec_per_step > 0
    assert t.examples_per_sec > 0


def test_export_unrolled_layout(rng):
    """export_state_dict handles the unrolled (layer_i) param layout too."""
    import jax
    import jax.numpy as jnp

    from visualbert_tpu.config import VisualBertConfig
    from visualbert_tpu.models.encoder import VisualBertModel
    from visualbert_tpu.tools.export_torch import export_state_dict
    from visualbert_tpu.tools.params import unstack_layers
    from visualbert_tpu.train.trainer import unbox

    cfg = VisualBertConfig.tiny(visual_embedding_dim=8)
    model = VisualBertModel(cfg)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, 6)), jnp.int32)
    vis = jnp.asarray(rng.randn(1, 3, 8), jnp.float32)
    params = unbox(model.init(jax.random.PRNGKey(0), ids, None, None, vis, None, None)["params"])

    sd_stacked = export_state_dict({"bert": params}, cfg)
    sd_unrolled = export_state_dict({"bert": unstack_layers(params)}, cfg)
    assert set(sd_stacked) == set(sd_unrolled)
    for k in sd_stacked:
        np.testing.assert_array_equal(sd_stacked[k], sd_unrolled[k])


def test_run_folder_tee(tmp_path):
    from visualbert_tpu.utils.logging import add_run_folder, get_logger

    path = add_run_folder(str(tmp_path))
    log = get_logger("visualbert_tpu.test")
    log.info("hello-tee")
    import logging

    for h in logging.getLogger("visualbert_tpu").handlers:
        h.flush()
    assert "hello-tee" in open(path).read()
    # second run gets a new file
    path2 = add_run_folder(str(tmp_path))
    assert path2 != path


def test_gelu_erf_fast_accuracy():
    """The A&S-7.1.26 fast erf-GELU (used automatically under bf16 compute)
    must stay within 2e-6 absolute of the exact-erf GELU (2.2e-7 in exact
    arithmetic + fp32 rounding of the chain) — below one bf16 ulp of any
    activation of magnitude > 5e-4."""
    import math

    import jax
    import jax.numpy as jnp

    from visualbert_tpu.models.encoder import _gelu_erf_fast, activation

    x64 = np.concatenate(
        [np.linspace(-30, 30, 50001), np.linspace(-2, 2, 50001)]
    )
    exact = 0.5 * x64 * (1.0 + np.vectorize(math.erf)(x64 / np.sqrt(2.0)))
    fast = np.asarray(_gelu_erf_fast(jnp.asarray(x64, jnp.float32)), np.float64)
    assert np.abs(fast - exact).max() < 2e-6

    # dtype dispatch: bf16 → fast path, fp32 → exact erf
    assert activation("gelu", jnp.bfloat16) is _gelu_erf_fast
    assert activation("gelu", jnp.float32) is not _gelu_erf_fast

    # under bf16 rounding the two paths agree to within one bf16 step
    # (~0.01% of points flip the last bit at a rounding boundary); in the
    # deep negative tail outputs are absolutely tiny (<2e-6)
    xb = jnp.asarray(x64, jnp.bfloat16)
    a = np.asarray(_gelu_erf_fast(xb).astype(jnp.float32), np.float64)
    b = np.asarray(
        jax.nn.gelu(xb.astype(jnp.float32), approximate=False).astype(jnp.bfloat16)
        .astype(jnp.float32),
        np.float64,
    )
    ulp = np.abs(b) * 2.0**-8
    assert (np.abs(a - b) <= np.maximum(2 * ulp, 2e-6)).all()


def test_gelu_erf_fast_gradient_accuracy():
    """The analytic custom-JVP (gelu'(x) = Phi(x) + x*phi(x), reusing the
    A&S exp term) must match the autodiff gradient of the exact-erf GELU to
    fp32-chain tolerance — it is what the FFN backward recompute fuses."""
    import jax
    import jax.numpy as jnp

    from visualbert_tpu.models.encoder import _gelu_erf_fast

    x = jnp.asarray(
        np.concatenate([np.linspace(-12, 12, 20001), np.linspace(-2, 2, 20001)]),
        jnp.float32,
    )
    g_fast = np.asarray(jax.vmap(jax.grad(_gelu_erf_fast))(x), np.float64)
    g_exact = np.asarray(
        jax.vmap(jax.grad(lambda v: jax.nn.gelu(v, approximate=False)))(x), np.float64
    )
    assert np.abs(g_fast - g_exact).max() < 4e-6

    # VJP path too (flax uses vjp): cotangent scaling flows through
    val, vjp = jax.vjp(_gelu_erf_fast, x)
    (gv,) = vjp(jnp.full_like(x, 2.0))
    np.testing.assert_allclose(np.asarray(gv), 2.0 * g_fast, rtol=1e-6, atol=1e-6)


def test_compile_cache_first_caller_wins(monkeypatch):
    # conftest already pointed this process at the test cache dir; a later
    # in-process caller (e.g. train_cli.main under test_cli) must NOT
    # re-point it — jax's cache singleton ignores dir changes after first
    # use, so honoring the original keeps config and reality equal
    from visualbert_tpu.utils.compile_cache import enable_persistent_cache

    assert enable_persistent_cache("/tmp/somewhere_else") == (
        "/tmp/visualbert_test_jax_cache"
    )
    # explicit opt-out still honored
    monkeypatch.setenv("VISUALBERT_JAX_CACHE", "0")
    assert enable_persistent_cache() is None


def test_real_data_config_requires_vocab_file():
    """A real-data config (no data.synthetic) without data.vocab_file must
    fail loudly instead of silently training over the 106-word toy vocabulary
    (same philosophy as run_unsup_pretrain's answer-table guard; the
    reference always loads a real vocab, tokenization.py:126)."""
    from visualbert_tpu.tasks.registry import _tokenizer
    from visualbert_tpu.utils.config_io import parse_task_config

    cfg = parse_task_config({
        "task": "vqa",
        "folder": "/tmp/never-created",
        "data": {"annotations": "/nonexistent/train.json"},
        "model": {"vocab_size": 512, "hidden_size": 32,
                  "num_hidden_layers": 1, "num_attention_heads": 2,
                  "intermediate_size": 64},
        "optimizer": {"learning_rate": 1e-4},
        "train": {"train_batch_size": 2},
    })
    with pytest.raises(ValueError, match="vocab_file is required"):
        _tokenizer(cfg)

    # synthetic configs keep the toy-vocabulary fallback
    cfg_syn = parse_task_config({
        "task": "vqa",
        "folder": "/tmp/never-created",
        "data": {"synthetic": 4},
        "model": {"vocab_size": 512, "hidden_size": 32,
                  "num_hidden_layers": 1, "num_attention_heads": 2,
                  "intermediate_size": 64},
        "optimizer": {"learning_rate": 1e-4},
        "train": {"train_batch_size": 2},
    })
    assert _tokenizer(cfg_syn) is not None


class _ToyDataset:
    """Deterministic per-(index, rng) samples for worker-equivalence tests."""

    def __init__(self, n=25, feat=64):
        self.n, self.feat = n, feat

    def __len__(self):
        return self.n

    def __getitem__(self, args):
        import ml_dtypes

        i, rng = args
        return {
            "x": rng.normal(size=(self.feat,)).astype(np.float32),
            # custom-dtype coverage: bf16 feature caches must survive the
            # shared-memory schema round-trip
            "f": rng.normal(size=(self.feat,)).astype(ml_dtypes.bfloat16),
            "idx": np.int32(i),
        }


class _BrokenDataset(_ToyDataset):
    def __getitem__(self, args):
        i, rng = args
        if i == 7:
            raise ValueError("boom at 7")
        return super().__getitem__(args)


def test_process_workers_bit_identical():
    """worker_mode='process' (forked shared-memory fill, the pod-host
    assembly path) must yield batches bit-identical to the sequential
    Batcher — sample RNG is (seed, epoch, index)-derived, never
    worker-derived. Covers pad_final tails too."""
    ds = _ToyDataset()
    seq = Batcher(ds, 8, seed=3, drop_last=False, pad_final=True)
    par = Batcher(ds, 8, seed=3, drop_last=False, pad_final=True,
                  num_workers=3, worker_mode="process")
    try:
        # hold EVERY process-mode batch before comparing: arena slots must
        # not be recycled (and overwritten) while a consumer still holds
        # views — the refcount gate, not luck, guarantees it
        held = list(par.epoch(1))
        for a, b in zip(seq.epoch(1), held, strict=True):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    finally:
        par.close()


def test_process_workers_propagate_errors():
    par = Batcher(_BrokenDataset(), 8, seed=0, num_workers=2,
                  worker_mode="process")
    try:
        with pytest.raises(RuntimeError, match="boom at 7"):
            for _ in par.epoch(0):
                pass
    finally:
        par.close()


def test_ffn_save_dact_bit_equal_grads():
    """ffn_save_dact (save post-act + analytic gelu' instead of the
    pre-activation; BASELINE.md round-5 lever table) must be a pure
    scheduling change: loss AND every gradient bit-equal to the default
    recompute path — both evaluate gelu' via _gelu_erf_fast_both in fp32
    and round once."""
    import jax
    import jax.numpy as jnp

    from visualbert_tpu.config import VisualBertConfig
    from visualbert_tpu.models.encoder import TransformerLayer

    def run(save_dact):
        cfg = VisualBertConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=16, visual_embedding_dim=8,
            dtype="bfloat16", hidden_act="gelu",
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            ffn_save_dact=save_dact,
        )
        layer = TransformerLayer(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32), jnp.bfloat16)
        bias = jnp.zeros((2, 1, 1, 8), jnp.bfloat16)
        v = layer.init(jax.random.PRNGKey(1), x, bias, True)

        def loss(p, xx):
            out, _ = layer.apply({"params": p}, xx, bias, True)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.value_and_grad(loss, argnums=(0, 1))(v["params"], x)

    (l0, g0), (l1, g1) = run(False), run(True)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1), strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batcher_close_is_terminal():
    """close() unlinks the shm arena, so a straggling producer (e.g. a
    prefetch thread still pulling from a live epoch generator) must get a
    loud error instead of silently allocating slots nothing will unlink."""
    ds = _ToyDataset()
    par = Batcher(ds, 8, seed=0, num_workers=2, worker_mode="process")
    it = par.epoch(0)
    next(it)
    par.close()
    with pytest.raises(RuntimeError, match="closed"):
        for _ in it:
            pass
