"""Object-store loader hook: scheme routing, custom opener registry, and
the load_image / video-localize integration (TCSLoader analogue,
dataset.py:220-266)."""

import io
import os

import numpy as np
import pytest

from v2pe_tpu.data import object_store
from v2pe_tpu.data.datasets import load_image


def _png_bytes(color=(200, 30, 30), size=(20, 10)):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", size, color).save(buf, format="PNG")
    return buf.getvalue()


def test_local_paths_bypass_registry(tmp_path):
    p = tmp_path / "x.png"
    p.write_bytes(_png_bytes())
    assert not object_store.is_remote(str(p))
    img = load_image(str(p))
    assert img.size == (20, 10)
    assert object_store.localize(str(p)) == str(p)
    # file:// scheme also resolves locally
    assert object_store.fetch_bytes("file://" + str(p)) == p.read_bytes()


def test_custom_opener_registry():
    blobs = {"gs://bucket/a/img.png": _png_bytes((10, 200, 10))}
    object_store.register_opener("gs", lambda url: blobs[url])
    try:
        assert object_store.is_remote("gs://bucket/a/img.png")
        img = load_image("gs://bucket/a/img.png")
        assert np.asarray(img)[0, 0, 1] == 200  # green blob round-trips
        # localize writes remote bytes to a real temp file
        local = object_store.localize("gs://bucket/a/img.png")
        assert os.path.exists(local) and local.endswith(".png")
        os.unlink(local)
    finally:
        object_store._OPENERS.pop("gs", None)


def test_unknown_scheme_raises():
    with pytest.raises(ValueError, match="no opener registered"):
        object_store.fetch_bytes("weird://x/y")


def test_missing_gcs_client_message():
    try:
        import google.cloud.storage  # noqa: F401
        pytest.skip("google-cloud-storage installed")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="google-cloud-storage"):
        object_store.fetch_bytes("gs://bucket/blob")
