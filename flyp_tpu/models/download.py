"""SHA-pinned pretrained-checkpoint acquisition.

Re-expresses the reference's downloader (`/root/reference/clip/clip.py:20-64`):
each OpenAI CLIP release URL carries its own sha256 as a path segment; the
file is cached under ``~/.cache/flyp_tpu`` (or an explicit ``cache_dir``),
re-verified on every call, and re-downloaded when the cached copy's digest
drifts.  Improvements over upstream: the download lands in a temp file and
is renamed into place only after the digest checks out, so an interrupted
transfer can never poison the cache.

This environment has no network egress, so the downloader is opt-in
(``--download_pretrained``); everything here is unit-testable against
``file://`` fixtures.
"""

from __future__ import annotations

import hashlib
import logging
import os
import tempfile
import urllib.request
from typing import List, Optional

logger = logging.getLogger("flyp_tpu")

#: Public OpenAI CLIP release URLs (the sha256 is the second-to-last path
#: segment).  Same pins as `/root/reference/clip/clip.py:20-29`.
MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "ViT-L/14@336px": "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",
    # Beyond the reference's snapshot (its clip.py predates the RN50x64
    # release); pin from the public openai/CLIP repo.  SHA-verified on
    # download like the rest — a stale pin fails loudly, never silently.
    "RN50x64": "https://openaipublic.azureedge.net/clip/models/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt",
}

#: open_clip LAION-400M (e31) releases — the dash-spelled models of the
#: reference (`/root/reference/src/models/modeling.py:13-22` loads
#: ``pretrained='laion400m_e31'``).  The filename's trailing hex segment is
#: the torch.hub-style sha256 prefix, verified on download like the OpenAI
#: pins (a full digest is recorded in the cache on first successful fetch).
OPEN_CLIP_MODELS = {
    "ViT-B-32": "https://github.com/mlfoundations/open_clip/releases/download/v0.2-weights/vit_b_32-quickgelu-laion400m_e31-d867053b.pt",
    "ViT-B-16": "https://github.com/mlfoundations/open_clip/releases/download/v0.2-weights/vit_b_16-laion400m_e31-00efa78f.pt",
    "ViT-L-14": "https://github.com/mlfoundations/open_clip/releases/download/v0.2-weights/vit_l_14-laion400m_e31-69988bb6.pt",
}

_DEFAULT_CACHE = os.path.join(os.path.expanduser("~"), ".cache", "flyp_tpu")


def available_models() -> List[str]:
    return list(MODELS)


def _expected_digest(url: str) -> str:
    """Digest pin embedded in the URL: OpenAI releases carry the full sha256
    as the second-to-last path segment; open_clip / torch.hub releases embed
    a sha256 prefix as the filename's trailing ``-<hex>`` segment."""
    segment = url.split("/")[-2]
    if len(segment) == 64 and all(c in "0123456789abcdef" for c in segment):
        return segment
    stem = os.path.basename(url).rsplit(".", 1)[0]
    suffix = stem.rsplit("-", 1)[-1]
    if len(suffix) >= 8 and all(c in "0123456789abcdef" for c in suffix):
        return suffix
    raise ValueError(f"no sha256 pin recognizable in {url!r}; pass expected_sha256")


def _sha256(path: str) -> str:
    digest = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            digest.update(chunk)
    return digest.hexdigest()


def download_url(url: str, cache_dir: Optional[str] = None, expected_sha256: Optional[str] = None) -> str:
    """Fetch ``url`` into the cache, verifying its sha256.

    The expected digest defaults to the URL's second-to-last path segment
    (the OpenAI release convention).  Returns the cached file path.
    """
    cache_dir = cache_dir or _DEFAULT_CACHE
    os.makedirs(cache_dir, exist_ok=True)
    expected = expected_sha256 or _expected_digest(url)
    target = os.path.join(cache_dir, os.path.basename(url))
    # Prefix pins (open_clip's 8-hex torch.hub convention) are upgraded to a
    # full digest recorded in a sidecar on first successful verification, so
    # cached files are always re-checked against all 256 bits.
    sidecar = target + ".sha256"

    def _record(digest: str) -> None:
        if len(expected) < 64:
            # tmp+rename: a crash mid-write must not leave a truncated
            # sidecar (an empty "expected digest" would match everything).
            fd, tmp_side = tempfile.mkstemp(dir=cache_dir, suffix=".sha256.part")
            with os.fdopen(fd, "w") as f:
                f.write(digest)
            os.replace(tmp_side, sidecar)

    def _read_sidecar() -> Optional[str]:
        if not os.path.isfile(sidecar):
            return None
        with open(sidecar) as f:
            recorded = f.read().strip()
        # A valid sidecar is a full sha256 that still agrees with the
        # caller's pin; anything else (truncated write, stale pin) is
        # ignored and refreshed — never trusted as a weaker check.
        if len(recorded) == 64 and all(c in "0123456789abcdef" for c in recorded) and recorded.startswith(expected):
            return recorded
        return None

    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")
    if os.path.isfile(target):
        recorded = _read_sidecar() if len(expected) < 64 else expected
        full_expected = recorded if recorded is not None else expected
        digest = _sha256(target)
        if digest == full_expected or (len(full_expected) < 64 and digest.startswith(full_expected)):
            if recorded is None:
                _record(digest)  # first verification (or refresh of an invalid sidecar)
            return target
        logger.warning("%s exists but its sha256 does not match; re-downloading", target)

    with urllib.request.urlopen(url) as source:
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".part")
        try:
            with os.fdopen(fd, "wb") as out:
                total = int(source.info().get("Content-Length") or 0)
                done = 0
                while True:
                    buf = source.read(1 << 20)
                    if not buf:
                        break
                    out.write(buf)
                    done += len(buf)
                    if total and done % (64 << 20) < (1 << 20):
                        logger.info("downloading %s: %d/%d MiB", os.path.basename(url), done >> 20, total >> 20)
            actual = _sha256(tmp)
            if not actual.startswith(expected):
                raise RuntimeError(f"downloaded {url} but sha256 {actual} != expected {expected}")
            os.replace(tmp, target)
            _record(actual)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return target


def download_model(name: str, cache_dir: Optional[str] = None) -> str:
    """Download a named CLIP checkpoint; returns the local ``.pt`` path.

    Slash-spelled names resolve to the OpenAI releases; dash-spelled names
    (``ViT-B-16``) resolve to the open_clip LAION-400M e31 releases, matching
    the reference's spelling convention
    (`/root/reference/src/models/modeling.py:13-22`).  Both are sha-pinned;
    ``models/convert.py`` understands either checkpoint layout.
    """
    if name in MODELS:
        return download_url(MODELS[name], cache_dir)
    if name in OPEN_CLIP_MODELS:
        return download_url(OPEN_CLIP_MODELS[name], cache_dir)
    from flyp_tpu.models.configs import resolve_model_name

    key, source = resolve_model_name(name)
    if source != "openai":
        raise ValueError(
            f"{name!r} selects {source} weights, which have no pinned URL; "
            "download the open_clip checkpoint manually and pass it via --clip_load"
        )
    return download_url(MODELS[key], cache_dir)
