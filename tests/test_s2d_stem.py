"""Space-to-depth RN50 stem: numerical identity with the reference stem.

The s2d stem (`flyp_tpu/models/resnet.py::fold_conv_weight`) is an
execution-layout rewrite of `/root/reference/clip/model.py:99-110` — the
three low-channel stem convs run on 2x2-folded operands with weights folded
inside the forward.  These tests pin the contract: identical param tree,
identical outputs, identical gradients, identical BN running-stat updates.

"Identical" = up to float32 reassociation: the folded conv sums the same
multiplies in a different order, and BN's rsqrt amplifies the last-ulp
difference through the tower (measured ~3e-5 abs on the embedding, ~3e-4
rel on gradients for the tiny tower here).  The single-conv fold itself is
exact to 1e-5 (test_fold_conv_weight_direct).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flyp_tpu.models.configs import VisionConfig
from flyp_tpu.models.resnet import ModifiedResNet, fold_conv_weight, space_to_depth


def tiny_cfg(stem_impl: str) -> VisionConfig:
    return VisionConfig(
        image_size=32,
        width=16,
        patch_size=None,
        layers=0,
        heads=8,
        resnet_layers=(1, 1, 1, 1),
        stem_impl=stem_impl,
    )


def build(stem_impl: str, seed: int = 0):
    model = ModifiedResNet(tiny_cfg(stem_impl), embed_dim=32)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x)
    return model, variables, x


def test_param_tree_identical():
    _, ref_vars, _ = build("reference")
    _, s2d_vars, _ = build("s2d")
    ref_flat = jax.tree_util.tree_leaves_with_path(ref_vars)
    s2d_flat = jax.tree_util.tree_leaves_with_path(s2d_vars)
    assert [(jax.tree_util.keystr(p), v.shape) for p, v in ref_flat] == [
        (jax.tree_util.keystr(p), v.shape) for p, v in s2d_flat
    ]
    # Same module-path param names -> same flax RNG fold -> bitwise-equal init.
    for (_, a), (_, b) in zip(ref_flat, s2d_flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_and_batch_stats_equivalence():
    ref_model, variables, x = build("reference")
    s2d_model = ModifiedResNet(tiny_cfg("s2d"), embed_dim=32)

    ref_out, ref_mut = ref_model.apply(variables, x, train=True, mutable=["batch_stats"])
    s2d_out, s2d_mut = s2d_model.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(s2d_out), np.asarray(ref_out), atol=1e-4, rtol=1e-4)

    ref_stats = jax.tree_util.tree_leaves_with_path(ref_mut["batch_stats"])
    s2d_stats = jax.tree_util.tree_leaves_with_path(s2d_mut["batch_stats"])
    for (pa, a), (pb, b) in zip(ref_stats, s2d_stats):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(pa))

    # Eval mode (running averages) must agree too.
    ref_eval = ref_model.apply(variables, x, train=False)
    s2d_eval = s2d_model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(s2d_eval), np.asarray(ref_eval), atol=1e-4, rtol=1e-4)


def test_gradient_equivalence():
    ref_model, variables, x = build("reference")
    s2d_model = ModifiedResNet(tiny_cfg("s2d"), embed_dim=32)
    params, stats = variables["params"], variables["batch_stats"]

    def loss(params, model):
        out, _ = model.apply({"params": params, "batch_stats": stats}, x, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss)(params, ref_model)
    g_s2d = jax.grad(loss)(params, s2d_model)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref), jax.tree_util.tree_leaves_with_path(g_s2d)
    ):
        a, b = np.asarray(a), np.asarray(b)
        # Tensor-scale atol: BN scale/bias grads mix O(300) and O(1)
        # elements; the small ones lose relative precision to cancellation,
        # not to any fold error.
        np.testing.assert_allclose(b, a, atol=1e-3 * (np.abs(a).max() + 1.0), rtol=1e-3,
                                   err_msg=jax.tree_util.keystr(pa))


@pytest.mark.parametrize("fi,fo,stride,kernel", [(4, 2, 2, 3), (2, 2, 1, 3)])
def test_fold_conv_weight_direct(fi, fo, stride, kernel):
    """The folded conv on folded operands == the original conv, directly."""
    rng = np.random.default_rng(0)
    cin, cout, H = 3, 5, 16
    w = jnp.asarray(rng.standard_normal((kernel, kernel, cin, cout)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, H, H, cin)), jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=[(kernel // 2,) * 2] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    wf, pad = fold_conv_weight(w, fi, fo, stride)
    out = jax.lax.conv_general_dilated(
        space_to_depth(x, fi), wf, window_strides=(1, 1), padding=(pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # Unfold the output (channel index (a*fo+b)*cout + o) and compare.
    B, Hf, Wf, F = out.shape
    out = out.reshape(B, Hf, Wf, fo, fo, cout).transpose(0, 1, 3, 2, 4, 5).reshape(B, Hf * fo, Wf * fo, cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    # Every original multiply appears exactly once: total weight mass matches.
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(wf))), fo * fo * float(jnp.sum(jnp.abs(w))), rtol=1e-6)
