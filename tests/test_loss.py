"""ClipLoss parity and multi-device global-batch correctness."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flyp_tpu.ops import clip_loss
from tests import ref_loader


def make_features(b=16, d=32, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((b, d)).astype(np.float32)
    txt = rng.standard_normal((b, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    labels = rng.integers(0, 5, b)
    return img, txt, labels


# ---------------------------------------------------------------- reference


@pytest.mark.skipif(not ref_loader.available(), reason="reference tree not mounted")
class TestReferenceParity:
    @classmethod
    def setup_class(cls):
        torch = pytest.importorskip("torch")
        cls.torch = torch
        cls.ref_loss = ref_loader.load_ref_module("clip/loss.py", "ref_clip_loss")

    def _ref(self, img, txt, scale, labels=None, **kw):
        t = self.torch
        crit = self.ref_loss.ClipLoss()
        out = crit(
            t.from_numpy(img), t.from_numpy(txt), t.tensor(scale),
            ground_labels=None if labels is None else t.from_numpy(labels),
            **kw,
        )
        return out.detach().numpy()

    def test_default_per_item(self):
        img, txt, _ = make_features()
        ours = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.float32(50.0))
        ref = self._ref(img, txt, 50.0)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)

    def test_ignore_variant(self):
        img, txt, labels = make_features()
        ours = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.float32(20.0), jnp.asarray(labels), ignore=True)
        ref = self._ref(img, txt, 20.0, labels, ignore=True)
        np.testing.assert_allclose(float(ours), float(ref), atol=1e-5, rtol=1e-5)

    def test_google_sup_variant(self):
        img, txt, labels = make_features()
        ours = clip_loss(
            jnp.asarray(img), jnp.asarray(txt), jnp.float32(20.0), jnp.asarray(labels), google_sup_loss=True
        )
        ref = self._ref(img, txt, 20.0, labels, google_sup_loss=True)
        np.testing.assert_allclose(float(ours), float(ref), atol=1e-5, rtol=1e-5)

    def test_soft_label_variant(self):
        img, txt, labels = make_features()
        ours = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.float32(20.0), jnp.asarray(labels))
        ref = self._ref(img, txt, 20.0, labels)
        np.testing.assert_allclose(float(ours), float(ref), atol=1e-5, rtol=1e-5)


# ------------------------------------------------------------- multi-device


def test_sharded_loss_equals_single_device():
    """all-gather loss on an 8-way mesh == single-device loss on the global batch."""
    n_dev = len(jax.devices())
    assert n_dev == 8, f"conftest should provide 8 CPU devices, got {n_dev}"
    img, txt, _ = make_features(b=32, d=16)

    single = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.float32(30.0))

    mesh = Mesh(np.array(jax.devices()), ("data",))
    shard_fn = jax.shard_map(
        functools.partial(clip_loss, axis_name="data"),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P()),
        out_specs=P(),  # full global per-item vector, replicated
        check_vma=False,
    )
    sharded = shard_fn(jnp.asarray(img), jnp.asarray(txt), jnp.float32(30.0))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5, rtol=1e-5)


def test_sharded_local_loss_rows():
    img, txt, _ = make_features(b=32, d=16)
    single = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.float32(30.0))

    mesh = Mesh(np.array(jax.devices()), ("data",))
    shard_fn = jax.shard_map(
        functools.partial(clip_loss, axis_name="data", local_loss=True),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P()),
        out_specs=P("data"),  # each shard contributes its local rows
        check_vma=False,
    )
    sharded = shard_fn(jnp.asarray(img), jnp.asarray(txt), jnp.float32(30.0))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5, rtol=1e-5)


def test_sharded_gradients_flow_to_both_towers():
    """Gradients through the explicit all_gather match single-device grads.

    The correct shard_map training recipe is the local-rows pattern: each
    device sums the per-item losses of *its own* rows and divides by the
    global batch.  Summed over devices that is the global mean; shard_map AD
    routes cross-device cotangents through the all_gather transpose
    (reduce-scatter), so each device's local-feature gradient is exact — the
    differentiable analogue of the reference's rank-splice hack
    (`clip/loss.py:62-67`), with no hack needed.
    """
    b_global = 16
    img, txt, _ = make_features(b=b_global, d=8)
    scale = jnp.float32(10.0)

    def mean_loss(i, t):
        return jnp.mean(clip_loss(i, t, scale))

    gi_single, gt_single = jax.grad(mean_loss, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(txt))

    mesh = Mesh(np.array(jax.devices()), ("data",))

    def device_loss(i, t):
        per_item = clip_loss(i, t, scale, axis_name="data", local_loss=True)
        return jnp.sum(per_item) / b_global

    shard_fn = jax.shard_map(
        jax.grad(device_loss, argnums=(0, 1)),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    gi_shard, gt_shard = shard_fn(jnp.asarray(img), jnp.asarray(txt))
    np.testing.assert_allclose(np.asarray(gi_shard), np.asarray(gi_single), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gt_shard), np.asarray(gt_single), atol=1e-5, rtol=1e-4)


def test_pjit_global_math_matches():
    """The GSPMD path: global math + batch-sharded inputs == single device."""
    img, txt, _ = make_features(b=32, d=16)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    img_s = jax.device_put(jnp.asarray(img), sharding)
    txt_s = jax.device_put(jnp.asarray(txt), sharding)

    f = jax.jit(lambda i, t: clip_loss(i, t, jnp.float32(30.0)))
    out = f(img_s, txt_s)
    single = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.float32(30.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(single), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("variant", ["ignore", "google", "soft"])
def test_sharded_supervised_variants_match_single_device(variant):
    """The supervised variants under shard_map (incl. with local_loss=True,
    which they ignore — they need the full pairwise label matrix) return the
    single-device scalar, replicated.  Regression: rectangular
    [B_local, B_global] logits crashed the equal/eye construction."""
    img, txt, labels = make_features(b=32, d=16)
    kwargs = dict(
        ignore=(variant == "ignore"),
        google_sup_loss=(variant == "google"),
    )
    single = clip_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.float32(20.0), jnp.asarray(labels), **kwargs
    )

    mesh = Mesh(np.array(jax.devices()), ("data",))
    for local_loss in (False, True):
        shard_fn = jax.shard_map(
            functools.partial(clip_loss, axis_name="data", local_loss=local_loss, **kwargs),
            mesh=mesh,
            in_specs=(P("data"), P("data"), P(), P("data")),
            out_specs=P(),  # scalar, identical on every shard
            check_vma=False,
        )
        sharded = shard_fn(
            jnp.asarray(img), jnp.asarray(txt), jnp.float32(20.0), jnp.asarray(labels)
        )
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5, rtol=1e-5)
