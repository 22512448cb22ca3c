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
