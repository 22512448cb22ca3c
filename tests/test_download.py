"""Downloader unit tests against local file:// fixtures (no egress).

Behavior spec: `/root/reference/clip/clip.py:32-64` — sha256 pinned in the
URL path, cache reuse on digest match, re-download on drift, hard failure
on a bad transfer.
"""

import hashlib
import os

import pytest

from flyp_tpu.models import download


def _fixture(tmp_path, payload: bytes, name="RN50.pt"):
    sha = hashlib.sha256(payload).hexdigest()
    src_dir = tmp_path / "srv" / sha
    src_dir.mkdir(parents=True)
    src = src_dir / name
    src.write_bytes(payload)
    return f"file://{src}", sha, src


def test_download_verifies_and_caches(tmp_path):
    url, sha, src = _fixture(tmp_path, b"model-weights-v1")
    cache = tmp_path / "cache"

    got = download.download_url(url, cache_dir=str(cache))
    assert os.path.dirname(got) == str(cache)
    assert open(got, "rb").read() == b"model-weights-v1"

    # Second call must serve the cache: delete the source, call again.
    src.unlink()
    assert download.download_url(url, cache_dir=str(cache)) == got
    # No stray .part temp files left behind.
    assert not [f for f in os.listdir(cache) if f.endswith(".part")]


def test_download_redownloads_corrupted_cache(tmp_path):
    url, sha, _ = _fixture(tmp_path, b"good-bytes")
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "RN50.pt").write_bytes(b"corrupted")

    got = download.download_url(url, cache_dir=str(cache))
    assert open(got, "rb").read() == b"good-bytes"


def test_download_rejects_sha_mismatch(tmp_path):
    url, sha, src = _fixture(tmp_path, b"payload")
    # Serve different bytes than the sha in the URL path promises.
    src.write_bytes(b"tampered")
    with pytest.raises(RuntimeError, match="sha256"):
        download.download_url(url, cache_dir=str(tmp_path / "cache"))
    # The failed transfer must not have been installed into the cache.
    assert not (tmp_path / "cache" / "RN50.pt").exists()


def test_download_model_name_routing(tmp_path, monkeypatch):
    assert set(download.available_models()) == set(download.MODELS)
    # Slash-spelled names resolve to pinned URLs.
    url, sha, _ = _fixture(tmp_path, b"vit-b-16-weights", name="ViT-B-16.pt")
    monkeypatch.setitem(download.MODELS, "ViT-B/16", url)
    got = download.download_model("ViT-B/16", cache_dir=str(tmp_path / "cache"))
    assert os.path.basename(got) == "ViT-B-16.pt"


def _hub_fixture(tmp_path, payload: bytes, stem: str):
    """torch.hub-style release: the sha256 PREFIX rides in the filename."""
    prefix = hashlib.sha256(payload).hexdigest()[:8]
    src_dir = tmp_path / "srv" / "v0.2-weights"
    src_dir.mkdir(parents=True, exist_ok=True)
    src = src_dir / f"{stem}-{prefix}.pt"
    src.write_bytes(payload)
    return f"file://{src}", src


def test_download_model_open_clip_laion400m(tmp_path, monkeypatch):
    """Dash-spelled names resolve to the pinned open_clip LAION-400M e31
    releases (`/root/reference/src/models/modeling.py:13-22`), verified via
    the torch.hub filename sha-prefix convention."""
    assert set(download.OPEN_CLIP_MODELS) == {"ViT-B-32", "ViT-B-16", "ViT-L-14"}
    for name, url in download.OPEN_CLIP_MODELS.items():
        assert "laion400m_e31" in url
        # Every pin carries a recognizable digest.
        assert len(download._expected_digest(url)) >= 8

    url, src = _hub_fixture(tmp_path, b"laion-weights", "vit_b_16-laion400m_e31")
    monkeypatch.setitem(download.OPEN_CLIP_MODELS, "ViT-B-16", url)
    got = download.download_model("ViT-B-16", cache_dir=str(tmp_path / "cache"))
    assert open(got, "rb").read() == b"laion-weights"
    # Cache hit on re-call, even with the source gone.
    src.unlink()
    assert download.download_model("ViT-B-16", cache_dir=str(tmp_path / "cache")) == got

    # Tampered payload fails the prefix check and is not installed.
    url2, src2 = _hub_fixture(tmp_path, b"real-l14", "vit_l_14-laion400m_e31")
    src2.write_bytes(b"tampered-l14")
    monkeypatch.setitem(download.OPEN_CLIP_MODELS, "ViT-L-14", url2)
    with pytest.raises(RuntimeError, match="sha256"):
        download.download_model("ViT-L-14", cache_dir=str(tmp_path / "cache2"))
    assert not (tmp_path / "cache2" / os.path.basename(url2)).exists()


def test_prefix_pin_upgrades_to_full_digest_sidecar(tmp_path, monkeypatch):
    """open_clip's 8-hex prefix pin is upgraded on first fetch: the full
    sha256 lands in a `.sha256` sidecar and later cache hits verify against
    all 256 bits (a substituted cache file matching only the 32-bit prefix
    must be rejected)."""
    payload = b"laion-b32-weights"
    url, src = _hub_fixture(tmp_path, payload, "vit_b_32-quickgelu-laion400m_e31")
    cache = tmp_path / "cache"

    got = download.download_url(url, cache_dir=str(cache))
    sidecar = got + ".sha256"
    true_digest = hashlib.sha256(payload).hexdigest()
    assert open(sidecar).read().strip() == true_digest

    import pathlib

    # An invalid sidecar (truncated write, stale pin, garbage) must never
    # weaken verification: it is ignored, the prefix pin still applies, and
    # the sidecar is refreshed to the real digest.
    for bad in ("", "deadbeef", hashlib.sha256(b"other").hexdigest()):
        pathlib.Path(sidecar).write_text(bad)
        got2 = download.download_url(url, cache_dir=str(cache))
        assert open(got2, "rb").read() == payload
        assert open(sidecar).read().strip() == true_digest

    # A cached file that fails the full recorded digest is re-downloaded
    # (content drift the 32-bit prefix alone might miss; here the drifted
    # bytes also fail the prefix, which is the detectable analog).
    pathlib.Path(got).write_bytes(b"drifted-bytes")
    src.write_bytes(payload)  # restore the source for the re-fetch
    got3 = download.download_url(url, cache_dir=str(cache))
    assert open(got3, "rb").read() == payload
    assert open(sidecar).read().strip() == true_digest

    # Full-digest pins (OpenAI convention) never need a sidecar.
    url4, sha4, _ = _fixture(tmp_path, b"openai-weights")
    got4 = download.download_url(url4, cache_dir=str(cache))
    assert not os.path.exists(got4 + ".sha256")
