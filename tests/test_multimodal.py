"""E6 multimodal decode dispatch (VERDICT r2 #7): the optional-Pillow
path must produce real dimensions where the lib exists, and the
deterministic stub must answer everywhere else — same dict shape on
both paths, so the Spark plumbing is identical."""

import pytest

from dynamodb_zero_etl_s3tables_spark.operators import llm_multimodal as M

SF_DIR = "/root/testdata/sf0.001"


def _tiny_png() -> bytes:
    """A 3x2 PNG built with Pillow (only called when Pillow exists)."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (3, 2)).save(buf, format="PNG")
    return buf.getvalue()


def test_decode_dispatch_either_path():
    # Stub path: bytes no codec accepts -> deterministic fake, labeled
    garbage = b"definitely not an image payload"
    out = M.decode_payload(garbage)
    assert out == M.decode_stub(garbage)
    assert out["codec"] == "stub" and out["ok"]

    # Real path: only where Pillow is importable
    if M.HAS_PIL:
        img = M.decode_payload(_tiny_png())
        assert (img["width"], img["height"]) == (3, 2)
        assert img["codec"] == "pil" and img["n_frames"] == 1
    else:
        assert M.decode_payload(b"\x89PNG\r\n\x1a\n")["codec"] == "stub"


def test_stub_shape_matches_featurizer_schema():
    # every field the featurizer projects must exist on both paths
    d = M.decode_stub(b"xyz")
    for f in ("width", "height", "n_frames", "ok", "codec"):
        assert f in d


def test_e06b_featurize_rides_stub_payloads(spark):
    # synthesized payloads are UTF-8 text -> stub path with or without
    # Pillow; the registered oracle replays exactly this arithmetic
    rows = M.e06b_media_featurize(spark, SF_DIR).limit(5).collect()
    assert rows
    for r in rows:
        n = r.payload_bytes
        assert r.width == 16 + (n % 64)
        assert r.height == 16 + ((n // 64) % 64)
        assert r.n_frames == 1 + (n % 7)
