"""End-to-end learning signal: FLYP training must actually learn.

A tiny CLIP trained on a synthetic corpus where image color correlates with
the caption class should beat chance by a wide margin after a few hundred
steps, with the zero-shot head rebuilt from the *fine-tuned text tower* —
this exercises the full FLYP mechanism (contrastive alignment of both
towers + prompt-head classification) and would catch sign/label/pooling
bugs that shape tests cannot.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flyp_tpu.evaluation import Classifier, get_zeroshot_classifier
from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
from flyp_tpu.templates import get_template
from flyp_tpu.tokenizer import tokenize
from flyp_tpu.training import create_train_state, make_optimizer, make_train_step, warmup_cosine_lr

CLASSNAMES = ["red thing", "green thing", "blue thing"]


def tiny_model():
    cfg = MODEL_CONFIGS["ViT-B/16"]
    cfg = dataclasses.replace(
        cfg,
        embed_dim=32,
        vision=dataclasses.replace(cfg.vision, image_size=32, patch_size=8, width=64, layers=2, heads=1),
        text=dataclasses.replace(cfg.text, width=64, heads=1, layers=2),
    )
    return CLIPModel(cfg)


def make_batch(rng, b=24):
    labels = rng.integers(0, 3, b)
    images = rng.standard_normal((b, 32, 32, 3)).astype(np.float32) * 0.3
    for i, l in enumerate(labels):
        images[i, :, :, l] += 2.0  # class-colored channel
    captions = [f"a photo of a {CLASSNAMES[l]}." for l in labels]
    return images, tokenize(captions), labels


def test_flyp_training_learns():
    model = tiny_model()
    params = init_clip_params(model, 0)
    opt = make_optimizer(warmup_cosine_lr(3e-4, 10, 300), weight_decay=0.0)
    state = create_train_state(params, opt)
    step_fn = make_train_step(model, opt, donate=False)

    rng = np.random.default_rng(0)
    first_loss = None
    for i in range(120):
        images, tokens, _ = make_batch(rng)
        state, metrics = step_fn(state, jnp.asarray(images), jnp.asarray(tokens))
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    # With 3 distinct captions in a batch of 24, InfoNCE's floor is the
    # duplicate-group entropy ln(24/3) ~= 2.08; converging near it (from
    # ~ln(24) ~= 3.18 at init) demonstrates real alignment.
    floor = float(np.log(24 / 3))
    assert final_loss < floor + 0.4, (first_loss, final_loss, floor)
    assert final_loss < first_loss - 0.8, (first_loss, final_loss)

    # Zero-shot head from the fine-tuned text tower classifies held-out images.
    variables = {"params": jax.device_get(state.params)}
    head = get_zeroshot_classifier(model, variables, CLASSNAMES, get_template("simple_template"))
    clf = Classifier(model, variables, head, batch_size=24)

    test_rng = np.random.default_rng(123)
    images, _, labels = make_batch(test_rng, b=24)
    acc = float((clf.predict_logits(images).argmax(axis=1) == labels).mean())
    assert acc >= 0.75, f"zero-shot accuracy after training only {acc} (chance 0.33)"
