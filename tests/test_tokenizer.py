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


# Raw caption -> expected token ids, generated once from real ftfy semantics
# (ftfy.fix_text's default pipeline: mojibake repair, auto HTML unescape,
# C1/ligature/width fixes, quote uncurling, control-char removal, NFC) and
# hardcoded so cleaning parity never depends on an identity stub.  The BPE
# layer itself is pinned separately by the live reference cross-check below.
# Ref: /root/reference/clip/tokenizer.py:50-60,129-131.
FTFY_GOLDEN = [
    # single-encoded cp1252 mojibake of a curly quote -> "doesn't"
    ("The Mona Lisa doesnâ€™t have eyebrows.",
     [518, 19143, 7424, 2503, 713, 720, 19923, 269]),
    # double-encoded mojibake (two repair passes)
    ("doesnÃ¢â‚¬â„¢t", [2503, 713]),
    # latin-1-read UTF-8 accents (the classic ftfy example)
    ("l'humanitÃ© en marche", [331, 262, 3175, 529, 4166, 576, 36173]),
    ("Ã¼ber cool", [6522, 1516, 2077]),
    # mojibake of a non-Latin symbol (U+2714)
    ("âœ” no problems", [13749, 871, 4671]),
    # decomposed accent -> NFC
    ("café terrace at night", [15304, 13820, 536, 930]),
    # curly quotes uncurled to ASCII
    ("“Fancy” isn’t plain", [257, 6733, 257, 2923, 713, 10709]),
    # HTML entities (ftfy auto-unescape + the double html.unescape)
    ("fish &amp; chips &lt;fresh&gt;", [2759, 261, 8855, 283, 2975, 285]),
    ("R&amp;amp;D &#112;rogram", [337, 261, 323, 2737]),
    # latin ligatures expanded
    ("ﬁnancial beneﬁts", [4930, 5465]),
    # fullwidth forms -> ASCII
    ("Ｆｕｌｌｗｉｄｔｈ ５０％",
     [9407, 23571, 276, 271, 260]),
    # control chars + ANSI terminal escapes removed
    ("a\x00photo \x1b[1mof\x1b[0m a dog", [21758, 531, 539, 320, 1929]),
    # unicode whitespace (NBSP) collapses like ASCII whitespace
    ("good\xa0morning friend", [886, 1119, 1625]),
    # clean accented text is left alone (repair never fires on valid text)
    ("à la carte", [21259, 1210, 44949]),
]


def test_ftfy_golden_fixtures():
    tok = get_tokenizer()
    for raw, ids in FTFY_GOLDEN:
        assert tok.encode(raw) == ids, raw


def test_ftfy_golden_fixtures_fallback(monkeypatch):
    """The goldens must hold on the dependency-free FALLBACK cleaner too.

    ftfy is a declared dependency, so in an installed environment
    test_ftfy_golden_fixtures exercises real ftfy and would let a fallback
    regression pass silently; this leg forces the fallback path (the one a
    ftfy-less deploy and this CI container actually run)."""
    from flyp_tpu.tokenizer import cleaning

    monkeypatch.setattr(cleaning, "HAVE_FTFY", False)
    tok = get_tokenizer()
    for raw, ids in FTFY_GOLDEN:
        assert tok.encode(raw) == ids, raw


def test_cleaning_idempotent():
    # The full cleaning stage (fix_text + double html.unescape + whitespace
    # collapse, as the reference composes it) is a fixed point on its own
    # output.  fix_text alone is NOT idempotent on nested HTML entities —
    # neither is real ftfy — which is exactly why the reference unescapes
    # twice more afterwards (/root/reference/clip/tokenizer.py:50-53).
    from flyp_tpu.tokenizer.bpe import _clean_text
    from flyp_tpu.tokenizer.cleaning import _fix_text_fallback

    for raw, _ in FTFY_GOLDEN:
        once = _clean_text(raw)
        assert _clean_text(once) == once, raw
    # Clean natural text is untouched by the repair passes.
    for s in ["naïve résumé", "à la carte", "a photo of a dog."]:
        assert _fix_text_fallback(s) == s


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference tree not mounted")
def test_against_reference_tokenizer():
    # The reference imports ftfy unconditionally.  When ftfy is absent, stub
    # it with OUR fallback cleaner so both sides run the SAME cleaning and
    # the comparison pins the BPE machinery on the full caption domain
    # (non-ASCII included); cleaning fidelity itself is pinned by the
    # hardcoded FTFY_GOLDEN fixtures above.
    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401
        except ImportError:
            from flyp_tpu.tokenizer.cleaning import _fix_text_fallback

            stub = types.ModuleType("ftfy")
            stub.fix_text = _fix_text_fallback
            sys.modules["ftfy"] = stub

    sys.path.insert(0, REFERENCE)
    try:
        from clip.tokenizer import SimpleTokenizer as RefTokenizer
    finally:
        sys.path.pop(0)

    ref = RefTokenizer()
    ours = ClipTokenizer()
    for text in SAMPLES + [raw for raw, _ in FTFY_GOLDEN]:
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
