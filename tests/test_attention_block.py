"""Fused attention-block kernel vs the unfused module path (interpret mode).

The kernel fuses LN1 + QKV projection + attention + out-projection +
residual; values AND gradients must match the composition of
LayerNormFp32 / MultiHeadAttention that defines the reference numerics
(`/root/reference/clip/model.py:169-190`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flyp_tpu.ops.attention_block import attention_block


def _params(D, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        ln_scale=jnp.asarray(1.0 + 0.1 * rng.standard_normal(D), jnp.float32),
        ln_bias=jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32),
        wqkv=jnp.asarray(rng.standard_normal((3, D, D)) * D ** -0.5, jnp.float32),
        bqkv=jnp.asarray(0.1 * rng.standard_normal((3, D)), jnp.float32),
        wout=jnp.asarray(rng.standard_normal((D, D)) * D ** -0.5, jnp.float32),
        bout=jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32),
    )


def _reference(x, p, heads, causal):
    """Unfused math: fp32 LN + fused-QKV attention + out proj + residual."""
    from flyp_tpu.ops.attention import xla_attention

    B, L, D = x.shape
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * p["ln_scale"] + p["ln_bias"]).astype(x.dtype)
    qkv = jnp.einsum("bld,tde->blte", y, p["wqkv"].astype(x.dtype)) + p["bqkv"].astype(x.dtype)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    hd = D // heads
    o = xla_attention(
        q.reshape(B, L, heads, hd), k.reshape(B, L, heads, hd), v.reshape(B, L, heads, hd), causal
    ).reshape(B, L, D)
    return x + jnp.einsum("bld,de->ble", o, p["wout"].astype(x.dtype)) + p["bout"].astype(x.dtype)


@pytest.mark.parametrize("causal,L", [(False, 13), (True, 13), (False, 16)])
def test_attention_block_matches_unfused(causal, L):
    B, D, H = 3, 128, 2
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    p = _params(D)

    ref = _reference(x, p, H, causal)
    out = attention_block(x, p["ln_scale"], p["ln_bias"], p["wqkv"], p["bqkv"], p["wout"], p["bout"], H, causal, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_attention_block_grads_match_unfused():
    B, L, D, H = 2, 13, 128, 2
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    p = _params(D)
    keys = sorted(p)

    def loss_fused(x, *args):
        pp = dict(zip(keys, args))
        out = attention_block(x, pp["ln_scale"], pp["ln_bias"], pp["wqkv"], pp["bqkv"], pp["wout"], pp["bout"], H, False, True)
        return jnp.sum(out ** 2)

    def loss_ref(x, *args):
        pp = dict(zip(keys, args))
        return jnp.sum(_reference(x, pp, H, False) ** 2)

    args = [p[k] for k in keys]
    g_fused = jax.grad(loss_fused, argnums=tuple(range(len(args) + 1)))(x, *args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(len(args) + 1)))(x, *args)
    for name, a, b in zip(["x"] + keys, g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=name)


def test_attention_block_partitioned_over_mesh():
    """Batch-sharded (and feature-sharded) inputs run the kernel per shard;
    weight grads are psum-reduced."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    B, L, D, H = 8, 13, 128, 2
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    p = _params(D)
    keys = sorted(p)
    args = [p[k] for k in keys]

    def loss(x, *a):
        pp = dict(zip(keys, a))
        out = attention_block(x, pp["ln_scale"], pp["ln_bias"], pp["wqkv"], pp["bqkv"], pp["wout"], pp["bout"], H, False, True)
        return jnp.sum(out ** 2)

    grads_1dev = jax.grad(loss, argnums=tuple(range(len(args) + 1)))(x, *args)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("model", "data"))
    x_s = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    args_s = [jax.device_put(a, NamedSharding(mesh, P(*([None] * a.ndim)))) for a in args]
    # Sharding a need-replication dim (the contraction rows) must be
    # gathered, not fail.
    args_s[keys.index("wqkv")] = jax.device_put(p["wqkv"], NamedSharding(mesh, P(None, "model", None)))

    grads_mesh = jax.jit(jax.grad(loss, argnums=tuple(range(len(args) + 1))))(x_s, *args_s)
    for name, a, b in zip(["x"] + keys, grads_mesh, grads_1dev):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("causal", [False, True])
def test_attention_block_head_sharded_tp(causal):
    """Head-group tensor parallelism: with the [3, D, D] QKV kernel's last
    axis sharded over the model axis, the kernel executes per shard on its
    local head group — the compiled HLO contains NO all-gather of the
    weight — and values+grads equal the single-device run."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    B, L, D, H = 8, 13, 128, 2
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    p = _params(D)
    keys = sorted(p)
    args = [p[k] for k in keys]

    def loss(x, *a):
        pp = dict(zip(keys, a))
        out = attention_block(x, pp["ln_scale"], pp["ln_bias"], pp["wqkv"], pp["bqkv"], pp["wout"], pp["bout"], H, causal, True)
        return jnp.sum(out ** 2)

    out_1dev = _reference(x, p, H, causal)
    grads_1dev = jax.grad(loss, argnums=tuple(range(len(args) + 1)))(x, *args)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("model", "data"))
    x_s = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    tp_specs = {
        "wqkv": P(None, None, "model"),
        "bqkv": P(None, "model"),
        "wout": P("model", None),
    }
    args_s = [
        jax.device_put(a, NamedSharding(mesh, tp_specs.get(k, P(*([None] * a.ndim)))))
        for k, a in zip(keys, args)
    ]

    def fwd(x, *a):
        pp = dict(zip(keys, a))
        return attention_block(x, pp["ln_scale"], pp["ln_bias"], pp["wqkv"], pp["bqkv"], pp["wout"], pp["bout"], H, causal, True)

    out_tp = jax.jit(fwd)(x_s, *args_s)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_1dev), atol=2e-5, rtol=2e-5)

    grad_fn = jax.jit(jax.grad(loss, argnums=tuple(range(len(args) + 1))))
    # The weight must never be all-gathered.  Shape-spelling blacklists are
    # fragile (GSPMD can emit the gather with a new leading dim, flattened,
    # or reshaped), so forbid ANY all-gather whose output holds at least the
    # full weight's element count — every legitimate collective here
    # (biases, [B, Lp, D] activations) is far smaller.
    import re

    hlo = grad_fn.lower(x_s, *args_s).compile().as_text()
    shape_re = re.compile(r"=\s*\(?\s*\w+\[([\d,]*)\]")
    for line in hlo.splitlines():
        if "all-gather" not in line:
            continue
        m = shape_re.search(line)
        if not m:
            continue  # e.g. all-gather-done consuming a tuple
        dims = [int(d) for d in m.group(1).split(",") if d]
        n = int(np.prod(dims)) if dims else 1
        assert n < 3 * D * D, f"full-weight-sized all-gather in TP HLO: {line.strip()}"

    grads_tp = grad_fn(x_s, *args_s)
    for name, a, b in zip(["x"] + keys, grads_tp, grads_1dev):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3, err_msg=name)
    # dWqkv comes back still head-sharded, like the weight itself.
    assert grads_tp[keys.index("wqkv") + 1].sharding.spec == P(None, None, "model")


def test_model_with_pallas_block_impl_matches_xla(monkeypatch):
    """Whole tiny-CLIP forward + grads agree between impl=xla and the fused
    block kernel (param trees are interchangeable by construction)."""
    import dataclasses

    from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
    from flyp_tpu.ops.attention import _default_impl
    from flyp_tpu.ops.losses import clip_loss

    cfg = MODEL_CONFIGS["ViT-B/16"]
    cfg = dataclasses.replace(
        cfg,
        embed_dim=32,
        vision=dataclasses.replace(cfg.vision, image_size=32, patch_size=16, width=128, layers=2, heads=2),
        text=dataclasses.replace(cfg.text, context_length=16, vocab_size=256, width=128, heads=2, layers=2),
    )
    model = CLIPModel(cfg)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    tokens = np.zeros((4, 16), dtype=np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = 30
    tokens[:, 2] = 255
    tokens = jnp.asarray(tokens)

    def mean_loss(params):
        img_f, txt_f, scale = model.apply({"params": params}, images, tokens)
        return jnp.mean(clip_loss(img_f, txt_f, scale))

    monkeypatch.setenv("FLYP_ATTENTION_IMPL", "xla")
    _default_impl.cache_clear()
    params = init_clip_params(model, 0)
    l_ref, g_ref = jax.value_and_grad(mean_loss)(params)

    monkeypatch.setenv("FLYP_ATTENTION_IMPL", "pallas_block")
    _default_impl.cache_clear()
    try:
        params2 = init_clip_params(model, 0)
        # identical param trees: same init regardless of impl
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        l_fused, g_fused = jax.value_and_grad(mean_loss)(params)
        np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g_fused), jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3)
    finally:
        _default_impl.cache_clear()


def test_remat_policy_preserves_fused_kernel_grads(monkeypatch):
    """remat=True uses a save_only_these_names policy pinning the fused
    kernel's residuals (no Pallas-forward re-run in backward); loss and
    grads must match the remat=False model exactly."""
    import dataclasses

    from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
    from flyp_tpu.ops.attention import _default_impl
    from flyp_tpu.ops.losses import clip_loss

    cfg = MODEL_CONFIGS["ViT-B/16"]
    cfg = dataclasses.replace(
        cfg,
        embed_dim=32,
        vision=dataclasses.replace(cfg.vision, image_size=32, patch_size=16, width=128, layers=2, heads=2),
        text=dataclasses.replace(cfg.text, context_length=16, vocab_size=256, width=128, heads=2, layers=2),
    )
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    tokens = np.zeros((4, 16), dtype=np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = 40
    tokens[:, 2] = 255
    tokens = jnp.asarray(tokens)

    def loss_fn(model):
        def f(params):
            img_f, txt_f, scale = model.apply({"params": params}, images, tokens, train=True)
            return jnp.mean(clip_loss(img_f, txt_f, scale))

        return f

    monkeypatch.setenv("FLYP_ATTENTION_IMPL", "pallas_block")
    _default_impl.cache_clear()
    try:
        base = CLIPModel(cfg, remat=False)
        remat = CLIPModel(cfg, remat=True)
        params = init_clip_params(base, 0)
        l0, g0 = jax.value_and_grad(loss_fn(base))(params)
        l1, g1 = jax.value_and_grad(loss_fn(remat))(params)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
    finally:
        _default_impl.cache_clear()


def test_mlp_block_matches_unfused():
    """mlp_block values + grads vs the module math (LN fp32 + QuickGELU)."""
    from flyp_tpu.ops.mlp_block import mlp_block

    B, L, D = 2, 13, 128
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    p = dict(
        ln_scale=jnp.asarray(1.0 + 0.1 * rng.standard_normal(D), jnp.float32),
        ln_bias=jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32),
        fc_kernel=jnp.asarray(rng.standard_normal((D, 4 * D)) * (2 * D) ** -0.5, jnp.float32),
        fc_bias=jnp.asarray(0.1 * rng.standard_normal(4 * D), jnp.float32),
        proj_kernel=jnp.asarray(rng.standard_normal((4 * D, D)) * D ** -0.5, jnp.float32),
        proj_bias=jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32),
    )
    keys = sorted(p)

    def ref(x, *args):
        pp = dict(zip(keys, args))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * pp["ln_scale"] + pp["ln_bias"]).astype(x.dtype)
        h = jnp.einsum("bld,dh->blh", y, pp["fc_kernel"]) + pp["fc_bias"]
        h = h * jax.nn.sigmoid(1.702 * h)
        return x + jnp.einsum("blh,hd->bld", h, pp["proj_kernel"]) + pp["proj_bias"]

    def fused(x, *args):
        pp = dict(zip(keys, args))
        return mlp_block(x, pp["ln_scale"], pp["ln_bias"], pp["fc_kernel"], pp["fc_bias"],
                         pp["proj_kernel"], pp["proj_bias"], True)

    args = [p[k] for k in keys]
    np.testing.assert_allclose(
        np.asarray(fused(x, *args)), np.asarray(ref(x, *args)), atol=2e-5, rtol=2e-5
    )

    g_f = jax.grad(lambda *a: jnp.sum(fused(*a) ** 2), argnums=tuple(range(len(args) + 1)))(x, *args)
    g_r = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=tuple(range(len(args) + 1)))(x, *args)
    for name, a, b in zip(["x"] + keys, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=name)


def test_inference_variant_matches_train_variant():
    """attention_block_inference: same forward values, same gradients (its
    backward regenerates the residuals with one recompute)."""
    from flyp_tpu.ops.attention_block import attention_block_inference

    B, L, D, H = 3, 13, 128, 2
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    p = _params(D)
    keys = sorted(p)
    args = [p[k] for k in keys]

    def run(fn, x, *a):
        pp = dict(zip(keys, a))
        return fn(x, pp["ln_scale"], pp["ln_bias"], pp["wqkv"], pp["bqkv"], pp["wout"], pp["bout"], H, False, True)

    out_t = run(attention_block, x, *args)
    out_i = run(attention_block_inference, x, *args)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_t), atol=1e-6, rtol=1e-6)

    g_t = jax.grad(lambda *a: jnp.sum(run(attention_block, *a) ** 2), argnums=tuple(range(len(args) + 1)))(x, *args)
    g_i = jax.grad(lambda *a: jnp.sum(run(attention_block_inference, *a) ** 2), argnums=tuple(range(len(args) + 1)))(x, *args)
    for name, a, b in zip(["x"] + keys, g_i, g_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5, err_msg=name)


def test_mlp_block_partitioned_over_mesh():
    """Batch-sharded inputs compile and run the fused MLP block per shard
    with grads matching single-device.  Regression: the head-group-TP
    change added a batch_flags argument to _force_shardings but missed
    mlp_block's partition/infer callbacks, so every sharded compile of
    pallas_block_mlp died with a TypeError inside GSPMD."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from flyp_tpu.ops.mlp_block import mlp_block

    B, L, D = 8, 13, 128
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    p = dict(
        ln_scale=jnp.asarray(1.0 + 0.1 * rng.standard_normal(D), jnp.float32),
        ln_bias=jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32),
        fc_kernel=jnp.asarray(rng.standard_normal((D, 4 * D)) * (2 * D) ** -0.5, jnp.float32),
        fc_bias=jnp.asarray(0.1 * rng.standard_normal(4 * D), jnp.float32),
        proj_kernel=jnp.asarray(rng.standard_normal((4 * D, D)) * D ** -0.5, jnp.float32),
        proj_bias=jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32),
    )
    keys = sorted(p)
    args = [p[k] for k in keys]

    def loss(x, *a):
        pp = dict(zip(keys, a))
        out = mlp_block(x, pp["ln_scale"], pp["ln_bias"], pp["fc_kernel"], pp["fc_bias"],
                        pp["proj_kernel"], pp["proj_bias"], True)
        return jnp.sum(out ** 2)

    grads_1dev = jax.grad(loss, argnums=tuple(range(len(args) + 1)))(x, *args)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("model", "data"))
    x_s = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    args_s = [jax.device_put(a, NamedSharding(mesh, P(*([None] * a.ndim)))) for a in args]
    grads_mesh = jax.jit(jax.grad(loss, argnums=tuple(range(len(args) + 1))))(x_s, *args_s)
    for name, a, b in zip(["x"] + keys, grads_mesh, grads_1dev):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3, err_msg=name)


def test_attention_block_exact_lp_matches_padded(monkeypatch):
    """Lp == L (no 16-row pad; legal per Mosaic's block-dims-equal-array-dims
    rule) must match the padded kernel — forward and grads.  Guards the
    exact-Lp execution path `tools/lp_experiment.py` times on-chip."""
    import flyp_tpu.ops.attention_block as ab

    B, L, D, H = 3, 50, 128, 2
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    p = _params(D)
    keys = sorted(p)
    args = [p[k] for k in keys]

    def loss(x, *a):
        pp = dict(zip(keys, a))
        out = attention_block(x, pp["ln_scale"], pp["ln_bias"], pp["wqkv"], pp["bqkv"], pp["wout"], pp["bout"], H, False, True)
        return jnp.sum(out ** 2)

    g_pad = jax.grad(loss, argnums=tuple(range(len(args) + 1)))(x, *args)
    out_pad = attention_block(x, p["ln_scale"], p["ln_bias"], p["wqkv"], p["bqkv"], p["wout"], p["bout"], H, False, True)

    monkeypatch.setattr(ab, "_pad_len", lambda L, dtype: L)
    g_exact = jax.grad(loss, argnums=tuple(range(len(args) + 1)))(x, *args)
    out_exact = attention_block(x, p["ln_scale"], p["ln_bias"], p["wqkv"], p["bqkv"], p["wout"], p["bout"], H, False, True)

    np.testing.assert_allclose(np.asarray(out_exact), np.asarray(out_pad), atol=2e-5, rtol=2e-5)
    for name, a, b in zip(["x"] + keys, g_exact, g_pad):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=name)
