"""Numerics parity: flyp_tpu CLIP vs the reference torch implementation.

A randomly-initialized reference model's state dict is converted through
``flyp_tpu.models.convert`` and both sides are evaluated on identical inputs.
This is the "per-module activation diffing" gate from SURVEY.md §7 without
needing pretrained checkpoints (no network egress in this environment).
"""

import numpy as np
import pytest

from tests import ref_loader

torch = pytest.importorskip("torch")

if not ref_loader.available():  # pragma: no cover
    pytest.skip("reference tree not mounted", allow_module_level=True)

import jax
import jax.numpy as jnp

from flyp_tpu.models import CLIPModel, convert
from flyp_tpu.models.configs import CLIPConfig

ref_model = ref_loader.load_ref_module("clip/model.py", "ref_clip_model")


def make_pair(vision_layers, vision_width, patch, resolution=32, embed=64, ctx=16, vocab=512, twidth=128, theads=2, tlayers=2):
    # twidth/theads must satisfy heads == width//64: sniff_config derives the
    # head count that way, exactly as `build_model` does (`clip/model.py:427`).
    torch.manual_seed(0)
    ref = ref_model.CLIP(
        embed_dim=embed,
        image_resolution=resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=patch,
        context_length=ctx,
        vocab_size=vocab,
        transformer_width=twidth,
        transformer_heads=theads,
        transformer_layers=tlayers,
    ).eval().float()
    state = {k: v for k, v in ref.state_dict().items()}
    params, batch_stats, cfg = convert.convert_clip_state_dict(state)
    ours = CLIPModel(cfg)
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    return ref, ours, variables, cfg


def rand_inputs(cfg: CLIPConfig, batch=3, seed=1):
    rng = np.random.default_rng(seed)
    imgs = rng.standard_normal((batch, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    # Tokens: SOT-ish, a few ids, then the max id acting as EOT, zero padding.
    toks = np.zeros((batch, cfg.text.context_length), dtype=np.int64)
    for i in range(batch):
        n = int(rng.integers(3, cfg.text.context_length - 1))
        toks[i, :n] = rng.integers(1, cfg.text.vocab_size - 1, n)
        toks[i, n] = cfg.text.vocab_size - 1  # highest id = pooling position
    return imgs, toks


@pytest.mark.parametrize("vision", [("vit", 2, 64, 16)])
def test_encode_parity_vit(vision):
    _, layers, width, patch = vision
    ref, ours, variables, cfg = make_pair(layers, width, patch)
    imgs, toks = rand_inputs(cfg)

    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(imgs)).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(toks)).numpy()
        ref_if, ref_tf, ref_scale = ref(torch.from_numpy(imgs), torch.from_numpy(toks))
        ref_if, ref_tf, ref_scale = ref_if.numpy(), ref_tf.numpy(), float(ref_scale)

    imgs_nhwc = jnp.asarray(imgs.transpose(0, 2, 3, 1))
    toks_j = jnp.asarray(toks.astype(np.int32))
    our_img = ours.apply(variables, imgs_nhwc, method="encode_image")
    our_txt = ours.apply(variables, toks_j, method="encode_text")
    our_if, our_tf, our_scale = ours.apply(variables, imgs_nhwc, toks_j)

    np.testing.assert_allclose(np.asarray(our_img), ref_img, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(our_txt), ref_txt, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(our_if), ref_if, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(our_tf), ref_tf, atol=2e-4, rtol=2e-4)
    assert abs(float(our_scale) - ref_scale) < 1e-3


def test_encode_parity_resnet():
    ref, ours, variables, cfg = make_pair(vision_layers=(1, 1, 1, 1), vision_width=16, patch=None)
    imgs, toks = rand_inputs(cfg)

    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(imgs)).numpy()

    our_img = ours.apply(variables, jnp.asarray(imgs.transpose(0, 2, 3, 1)), method="encode_image")
    np.testing.assert_allclose(np.asarray(our_img), ref_img, atol=3e-4, rtol=3e-4)


def test_sniff_config_matches_reference_shapes():
    ref, _, _, cfg = make_pair(2, 64, 16)
    assert cfg.vision.layers == 2
    assert cfg.vision.width == 64
    assert cfg.vision.patch_size == 16
    assert cfg.vision.image_size == 32
    assert cfg.text.layers == 2
    assert cfg.embed_dim == 64


def test_encode_parity_vit_b16_full_size():
    """Full-size ViT-B/16 (width 768, 12 layers, 224px, vocab 49408): catches
    conversion/numerics bugs that toy configs cannot (head-count sniffing at
    width 768, 12-layer drift accumulation)."""
    ref, ours, variables, cfg = make_pair(
        vision_layers=12, vision_width=768, patch=16, resolution=224,
        embed=512, ctx=77, vocab=49408, twidth=512, theads=8, tlayers=12,
    )
    assert cfg.vision.heads == 12 and cfg.text.heads == 8
    imgs, toks = rand_inputs(cfg, batch=2)

    with torch.no_grad():
        ref_if, ref_tf, ref_scale = ref(torch.from_numpy(imgs), torch.from_numpy(toks))
        ref_if, ref_tf, ref_scale = ref_if.numpy(), ref_tf.numpy(), float(ref_scale)

    our_if, our_tf, our_scale = ours.apply(
        variables, jnp.asarray(imgs.transpose(0, 2, 3, 1)), jnp.asarray(toks.astype(np.int32))
    )
    # Normalized features; 12 layers of fp32 accumulation warrant a slightly
    # looser tolerance than the 2-layer toys.
    np.testing.assert_allclose(np.asarray(our_if), ref_if, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(our_tf), ref_tf, atol=1e-3, rtol=1e-3)
    assert abs(float(our_scale) - ref_scale) < 1e-3


def test_open_clip_layout_checkpoint_conversion(tmp_path):
    """open_clip training checkpoints wrap the weights as
    {"state_dict": {"module.<key>": ...}} — the loader must unwrap them."""
    ref, _, _, cfg = make_pair(2, 64, 16)
    wrapped = {
        "epoch": 3,
        "name": "ViT-tiny-test",
        "state_dict": {f"module.{k}": v for k, v in ref.state_dict().items()},
    }
    path = tmp_path / "open_clip_ckpt.pt"
    torch.save(wrapped, path)

    state = convert.load_torch_checkpoint(str(path))
    params, batch_stats, sniffed = convert.convert_clip_state_dict(state)
    assert sniffed.vision.width == 64 and sniffed.text.layers == 2

    ours = CLIPModel(sniffed)
    imgs, toks = rand_inputs(sniffed, batch=2)
    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(imgs)).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(toks)).numpy()
    our_img = ours.apply({"params": params}, jnp.asarray(imgs.transpose(0, 2, 3, 1)), method="encode_image")
    our_txt = ours.apply({"params": params}, jnp.asarray(toks.astype(np.int32)), method="encode_text")
    np.testing.assert_allclose(np.asarray(our_img), ref_img, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(our_txt), ref_txt, atol=2e-4, rtol=2e-4)


def test_torchscript_archive_checkpoint_conversion(tmp_path):
    """OpenAI distributes CLIP as TorchScript archives (`clip/clip.py:124`);
    load_torch_checkpoint must read those too, not just state dicts."""
    ref, _, _, cfg = make_pair(2, 64, 16)
    imgs0, toks0 = rand_inputs(cfg, batch=1)
    with torch.no_grad():
        traced = torch.jit.trace(ref, (torch.from_numpy(imgs0), torch.from_numpy(toks0)))
    path = tmp_path / "jit_archive.pt"
    torch.jit.save(traced, str(path))

    state = convert.load_torch_checkpoint(str(path))
    params, batch_stats, sniffed = convert.convert_clip_state_dict(state)
    assert sniffed.vision.width == 64 and sniffed.embed_dim == 64

    ours = CLIPModel(sniffed)
    imgs, toks = rand_inputs(sniffed, batch=2)
    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(imgs)).numpy()
    our_img = ours.apply({"params": params}, jnp.asarray(imgs.transpose(0, 2, 3, 1)), method="encode_image")
    np.testing.assert_allclose(np.asarray(our_img), ref_img, atol=2e-4, rtol=2e-4)


def test_activation_crosscheck_per_block(tmp_path):
    """The validate_checkpoint cross-check localizes diffs per block."""
    ref, _, _, cfg = make_pair(2, 64, 16)
    path = tmp_path / "ckpt.pt"
    torch.save(ref.state_dict(), str(path))

    from flyp_tpu.tools.validate_checkpoint import activation_crosscheck

    diff = activation_crosscheck(str(path))
    assert diff < 5e-4


@pytest.mark.parametrize("tower", ["vit", "rn"])
def test_training_trajectory_parity(tower):
    """Full FLYP training-step parity: N steps of the reference's exact
    update (`src/models/flyp_loss.py:493-500` — CLIP forward, per-item
    ClipLoss, mean, torch AdamW on ALL params incl. LN scales and
    logit_scale) against flyp_tpu's jitted train step on the same
    converted weights and batches.  Catches anything activation-level
    parity can't: gradient flow, optimizer math, weight-decay masking.

    LR is held flat (warmup 0, long horizon) because the reference calls
    `scheduler(step)` AFTER `optimizer.step()` (`flyp_loss.py:500,511`) —
    step 0 runs at the un-warmed base lr and step i at schedule(i-1); see
    docs/PARITY.md divergence 8."""
    from flyp_tpu.training.train_state import create_train_state, make_optimizer
    from flyp_tpu.training.train_step import make_train_step

    if tower == "vit":
        ref, ours, variables, cfg = make_pair(2, 64, 16)
    else:
        # ResNet: additionally pins BatchNorm TRAIN-mode behavior (batch
        # statistics in the forward) and running-stats momentum parity
        # (torch momentum 0.1 == flax momentum 0.9).
        ref, ours, variables, cfg = make_pair(vision_layers=(1, 1, 1, 1), vision_width=16, patch=None)
    loss_mod = ref_loader.load_ref_module("clip/loss.py", "ref_clip_loss")
    clip_loss_fn = loss_mod.ClipLoss(
        local_loss=False, gather_with_grad=False, cache_labels=True,
        rank=0, world_size=1, use_horovod=False,
    )
    lr, wd, steps = 1e-3, 0.1, 3
    imgs, toks = rand_inputs(cfg, batch=8)

    # Snapshot with REAL copies first: the converted tree shares storage
    # with the torch tensors (opt_t.step() mutates those in place), and
    # jnp.asarray may zero-copy alias numpy buffers on CPU.
    copy_tree = lambda t: jax.tree_util.tree_map(lambda a: jnp.array(np.array(a, copy=True)), t)
    params0 = copy_tree(variables["params"])
    stats0 = copy_tree(variables["batch_stats"]) if "batch_stats" in variables else None

    ref = ref.train()
    opt_t = torch.optim.AdamW(ref.parameters(), lr=lr, weight_decay=wd)
    imgs_t, toks_t = torch.from_numpy(imgs), torch.from_numpy(toks)
    ref_losses = []
    for _ in range(steps):
        opt_t.zero_grad()
        f_img, f_txt, scale = ref(imgs_t, toks_t)
        per_item = clip_loss_fn(f_img, f_txt, scale)
        loss = per_item.mean()
        loss.backward()
        opt_t.step()
        ref_losses.append(float(loss))

    opt_j = make_optimizer(lambda step: lr, weight_decay=wd)
    state = create_train_state(params0, opt_j, stats0)
    step_fn = make_train_step(ours, opt_j, donate=False)
    imgs_j = jnp.asarray(imgs.transpose(0, 2, 3, 1))
    toks_j = jnp.asarray(toks.astype(np.int32))
    our_losses = []
    for _ in range(steps):
        state, metrics = step_fn(state, imgs_j, toks_j)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-4, atol=5e-4)

    # Final params: convert the UPDATED torch state dict and diff trees.
    ref_params, ref_stats, _ = convert.convert_clip_state_dict(
        {k: v.detach().clone() for k, v in ref.state_dict().items()}
    )
    if stats0 is not None:
        # BN running statistics after 3 train steps: catches a momentum
        # convention mismatch (torch 0.1 vs flax 0.9) outright.
        for (path, ours_s), (_, ref_s) in zip(
            jax.tree_util.tree_leaves_with_path(state.batch_stats),
            jax.tree_util.tree_leaves_with_path(ref_stats),
        ):
            # Tolerance tracks the allowed param drift: stats are means of
            # activations computed from params that may themselves differ by
            # ~1e-4 after 3 Adam steps.  A momentum/bias-correction mismatch
            # shows up ~100x larger (rel ~5e-2 by step 3).
            np.testing.assert_allclose(
                np.asarray(ours_s), np.asarray(ref_s), rtol=1e-3, atol=2e-4,
                err_msg=f"running stat diverged: {jax.tree_util.keystr(path)}",
            )
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
    flat_ours = dict(jax.tree_util.tree_leaves_with_path(state.params))
    assert len(flat_ref) == len(flat_ours)
    for path, leaf in flat_ref:
        ours_leaf, ref_leaf = np.asarray(flat_ours[path]), np.asarray(leaf)
        if jax.tree_util.keystr(path).endswith("['k_proj']['bias']"):
            # Same K-bias degeneracy as qkv_bias below, in the ResNet
            # attention pool's separate k projection: skip entirely.
            continue
        if jax.tree_util.keystr(path).endswith("['qkv_bias']"):
            # The K-projection bias has an EXACTLY-zero gradient (a constant
            # added to every key shifts each score row uniformly; softmax is
            # invariant), so Adam normalizes fp32 roundoff into +-lr-sized
            # noise updates on both frameworks independently.  Skip the K
            # slice; q/v biases compare tightly below.
            ours_leaf, ref_leaf = ours_leaf[[0, 2]], ref_leaf[[0, 2]]
        # atol 2e-4 with <=0.1% element outliers (bounded at 1e-3 abs):
        # Adam's normalizer (m/sqrt(v)) amplifies fp32 noise on
        # near-zero-grad elements to ~lr-sized diffs after 3 steps; real
        # divergence (wrong wd mask, broken grad flow) violates on whole
        # tensors, orders of magnitude larger, AND in the loss trajectory.
        close = np.isclose(ours_leaf, ref_leaf, rtol=5e-3, atol=2e-4)
        n_bad = int(close.size - close.sum())
        max_abs = float(np.max(np.abs(ours_leaf - ref_leaf))) if ours_leaf.size else 0.0
        assert n_bad <= max(1, close.size // 1000) and max_abs < 5 * lr, (
            f"param diverged after {steps} steps: {jax.tree_util.keystr(path)} "
            f"({n_bad}/{close.size} elements off, max abs {max_abs:.2e})"
        )
