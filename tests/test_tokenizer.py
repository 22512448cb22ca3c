"""Tokenizer parity tests.

Golden ids were produced by the published OpenAI CLIP tokenizer; the live
cross-check against the reference implementation under ``/root/reference``
runs only when that tree is mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

from flyp_tpu.tokenizer import ClipTokenizer, get_tokenizer, tokenize

REFERENCE = "/root/reference"

SAMPLES = [
    "a photo of a cat.",
    "a bad photo of a {}.",
    "A photo of a wild Cebus capucinus in the wild.",
    "itap of a dog!",
    "the quick brown fox jumps over the lazy dog 0123456789",
    "satellite photo of an airport, a type of land use",
    "graffiti of a golden retriever",
    "   spaces\tand\nnewlines   ",
    "hyphen-ated and under_scored words, don't you think?",
    "ünïcödé çharacters and emoji 🐕 too",
]


def test_vocab_size():
    tok = get_tokenizer()
    assert tok.vocab_size == 49408
    assert tok.sot_token == 49406
    assert tok.eot_token == 49407


def test_known_golden_ids():
    # "a photo of a cat." under the published CLIP BPE.
    ids = get_tokenizer().encode("a photo of a cat.")
    assert ids == [320, 1125, 539, 320, 2368, 269]


def test_tokenize_shape_and_padding():
    arr = tokenize(["hello world", "a"])
    assert arr.shape == (2, 77)
    assert arr.dtype == np.int32
    tok = get_tokenizer()
    assert arr[0, 0] == tok.sot_token
    # EOT is the max id in each row => argmax finds the EOT position.
    assert arr[0, arr[0].argmax()] == tok.eot_token
    assert (arr[0, arr[0].argmax() + 1 :] == 0).all()


def test_truncation():
    long_text = "dog " * 200
    arr = tokenize(long_text, context_length=77)
    assert arr.shape == (1, 77)
    assert (arr != 0).all()


def test_decode_roundtrip():
    # decode() renders each end-of-word marker as a space (upstream behavior),
    # so punctuation becomes space-separated; words themselves round-trip.
    tok = get_tokenizer()
    assert tok.decode(tok.encode("hello world")).strip() == "hello world"
    assert tok.decode(tok.encode("a photo of a cat.")).strip() == "a photo of a cat ."


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference tree not mounted")
def test_against_reference_tokenizer():
    # The reference imports ftfy unconditionally; stub it when absent so the
    # comparison isolates the BPE machinery (both sides then clean with a
    # pass-through, which is exact for ASCII prompts).
    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401
        except ImportError:
            stub = types.ModuleType("ftfy")
            stub.fix_text = lambda t: t
            sys.modules["ftfy"] = stub

    sys.path.insert(0, REFERENCE)
    try:
        from clip.tokenizer import SimpleTokenizer as RefTokenizer
    finally:
        sys.path.pop(0)

    ref = RefTokenizer()
    ours = ClipTokenizer()
    for text in SAMPLES:
        assert ours.encode(text) == ref.encode(text), text


def test_shrink_context_buckets_and_exactness():
    """shrink_context slices to the bucketed max-EOT length, and the causal
    text tower produces BIT-IDENTICAL features on the shrunk batch (positions
    after the pooled EOT cannot influence it)."""
    import dataclasses

    import jax.numpy as jnp

    from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
    from flyp_tpu.tokenizer import shrink_context, tokenize

    # Helper semantics.
    t = tokenize(["a photo of a dog.", "a photo of a cat."])
    assert t.shape == (2, 77)
    s = shrink_context(t)
    assert s.shape[1] == 16 and np.array_equal(s, t[:, :16])
    # 3-D (multi-caption stacks) and already-short batches pass through.
    assert shrink_context(t.reshape(2, 1, 77)).shape == (2, 1, 77)
    assert shrink_context(s).shape == s.shape
    # A stray duplicate EOT after the first one is sliced off — pooling uses
    # the FIRST argmax, so this is still exact.
    t2 = t.copy()
    t2[0, 76] = 49407
    assert shrink_context(t2).shape == (2, 16)
    # A row whose FIRST EOT sits at the end prevents shrinking.
    t3 = t.copy()
    t3[0] = 0
    t3[0, 0] = 49406
    t3[0, 1:76] = 320
    t3[0, 76] = 49407
    assert shrink_context(t3).shape == (2, 77)

    # Exactness through a real (tiny) text tower.
    cfg = MODEL_CONFIGS["ViT-B/16"]
    cfg = dataclasses.replace(
        cfg,
        embed_dim=32,
        vision=dataclasses.replace(cfg.vision, image_size=32, patch_size=16, width=64, layers=1, heads=1),
        text=dataclasses.replace(cfg.text, width=64, heads=2, layers=2),
    )
    model = CLIPModel(cfg)
    params = init_clip_params(model, 0)
    full = model.apply({"params": params}, jnp.asarray(t), method="encode_text")
    shrunk = model.apply({"params": params}, jnp.asarray(s), method="encode_text")
    np.testing.assert_array_equal(np.asarray(full), np.asarray(shrunk))
