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


def test_e06b_featurize_parses_real_headers(spark):
    # payloads carry genuine PNG/BMP/GIF/WAV/JPEG/WebP headers; the
    # featurizer must recover the synthesized dimensions FROM THE
    # BYTES — including JPEG/WebP WITHOUT Pillow (r7, E6 closed)
    rows = M.e06b_media_featurize(spark, SF_DIR).limit(30).collect()
    assert rows
    kinds = {0: "png", 1: "bmp", 2: "gif", 3: "wav", 4: "jpeg", 5: "webp"}
    assert {r.codec for r in rows} >= {"jpeg", "webp"}
    for r in rows:
        d = r.doc_id
        assert r.codec == kinds[d % 6]
        if r.codec == "wav":
            assert r.width == 8000 + 100 * (d % 5)
            assert r.height == 1 + d % 2
            assert r.n_frames == 100 + d % 50
        else:
            assert r.width == 16 + d % 101
            assert r.height == 16 + d % 67
            assert r.n_frames == 1


# -- parse_media_header: one test per magic type (VERDICT r5 #3) -------------

def test_parse_png_header():
    hdr = M.synth_media_header(0, 12345)
    got = M.parse_media_header(hdr + b"trailing body bytes")
    assert got == {"width": 16 + 12345 % 101, "height": 16 + 12345 % 67,
                   "n_frames": 1, "ok": True, "codec": "png"}
    assert len(hdr) == 33


def test_parse_bmp_header_including_topdown():
    import struct

    hdr = M.synth_media_header(1, 7)
    got = M.parse_media_header(hdr + b"pixels")
    assert (got["codec"], got["width"], got["height"]) == ("bmp", 23, 23)
    assert len(hdr) == 54
    # top-down DIB: negative height stored, magnitude reported
    neg = bytearray(hdr)
    neg[22:26] = struct.pack("<i", -23)
    assert M.parse_media_header(bytes(neg))["height"] == 23


def test_parse_gif_header():
    hdr = M.synth_media_header(2, 42)
    got = M.parse_media_header(hdr)
    assert got == {"width": 16 + 42 % 101, "height": 16 + 42 % 67,
                   "n_frames": 1, "ok": True, "codec": "gif"}
    assert len(hdr) == 13


def test_parse_wav_header_chunk_walk():
    hdr = M.synth_media_header(3, 103)
    got = M.parse_media_header(hdr + b"samples and other noise")
    assert got == {"width": 8000 + 100 * (103 % 5), "height": 1 + 103 % 2,
                   "n_frames": 100 + 103 % 50, "ok": True, "codec": "wav"}
    assert len(hdr) == 44


def test_parse_jpeg_sof_marker_walk():
    """JPEG dims without Pillow (VERDICT r6 #1): SOI -> segment walk
    -> SOFn frame header, big-endian height then width."""
    import struct

    hdr = M.synth_media_header(4, 12345)
    assert len(hdr) == 39
    got = M.parse_media_header(hdr + b"entropy-coded body bytes \xff\xd9")
    assert got == {"width": 16 + 12345 % 101, "height": 16 + 12345 % 67,
                   "n_frames": 1, "ok": True, "codec": "jpeg"}

    # progressive (SOF2) and extra APPn/COM segments before the frame
    app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    sof2 = (b"\xff\xc2" + struct.pack(">H", 11) + bytes([8])
            + struct.pack(">HH", 480, 640) + bytes([1, 1, 0x11, 0]))
    got = M.parse_media_header(b"\xff\xd8" + app1 + com + sof2)
    assert (got["codec"], got["width"], got["height"]) == ("jpeg", 640, 480)

    # DHT (C4) is NOT a frame header and must be skipped, not parsed
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x01\x02"
    got = M.parse_media_header(b"\xff\xd8" + dht + sof2)
    assert (got["width"], got["height"]) == (640, 480)

    # SOS before any SOF -> dims unavailable -> None (stub downstream)
    sos = b"\xff\xda" + struct.pack(">H", 3) + b"\x00"
    assert M.parse_media_header(b"\xff\xd8" + app1 + sos) is None
    # truncated mid-segment -> None
    assert M.parse_media_header(b"\xff\xd8\xff\xc0\x00") is None


def test_parse_webp_all_three_chunk_forms():
    import struct

    hdr = M.synth_media_header(5, 77)
    assert len(hdr) == 30
    got = M.parse_media_header(hdr + b"vp8 frame data")
    assert got == {"width": 16 + 77 % 101, "height": 16 + 77 % 67,
                   "n_frames": 1, "ok": True, "codec": "webp"}

    def riff(chunk: bytes) -> bytes:
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    # VP8L lossless: 0x2F signature then packed (w-1 | (h-1)<<14)
    bits = (640 - 1) | ((480 - 1) << 14)
    vp8l = b"\x2f" + struct.pack("<I", bits)
    got = M.parse_media_header(riff(b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l))
    assert (got["codec"], got["width"], got["height"]) == ("webp", 640, 480)

    # VP8X extended: 24-bit canvas dims minus one
    vp8x = bytes([0x10]) + b"\x00\x00\x00" + (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
    got = M.parse_media_header(riff(b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x))
    assert (got["width"], got["height"]) == (640, 480)

    # lossy chunk without the 9D 01 2A start code -> None
    bad = b"\x00\x00\x00\xff\xff\xff\x00\x00\x00\x00"
    assert M.parse_media_header(riff(b"VP8 " + struct.pack("<I", len(bad)) + bad)) is None


def test_parse_rejects_truncated_and_garbage():
    assert M.parse_media_header(b"") is None
    assert M.parse_media_header(b"\x89PNG\r\n\x1a\n") is None  # magic only
    assert M.parse_media_header(b"BMx") is None
    assert M.parse_media_header(b"RIFF\x00\x00\x00\x00AVI ") is None
    assert M.parse_media_header(b"plain text payload") is None
    # and decode_payload degrades to the stub on every one of them
    for b in (b"", b"BMx", b"plain text payload"):
        assert M.decode_payload(b)["codec"] == "stub"


def test_parse_wav_body_containing_chunk_id_words():
    """Regression (caught by the sf0.1 sweep): the chunk walk must
    STOP at the terminal `data` chunk — trailing body bytes that
    happen to spell 'data' or 'fmt ' must never be parsed as chunks."""
    hdr = M.synth_media_header(3, 4150)
    body = b"the data slow small filter customer fmt data data " * 8
    got = M.parse_media_header(hdr + body)
    assert got["n_frames"] == 100 + 4150 % 50
    assert got == M.parse_media_header(hdr)  # body never inspected


def test_parse_bmp_core_header_refused():
    """BITMAPCOREHEADER (12-byte DIB header, u16 dims) stores fields
    at different offsets — parsing it with the INFOHEADER layout
    would return garbage i32 dims, so the parser must return None
    (fall through to Pillow / the stub) instead (r10 review)."""
    import struct

    from dynamodb_zero_etl_s3tables_spark.operators import llm_multimodal as M

    core = (
        b"BM" + struct.pack("<IHHI", 26, 0, 0, 26)
        + struct.pack("<IHHHH", 12, 320, 200, 1, 24)  # CORE: u16 dims
    )
    assert M.parse_media_header(core + b"px") is None
    # the INFOHEADER fixture still parses (guard keys on header size)
    info = M.synth_media_header(1, 7)
    assert M.parse_media_header(info)["codec"] == "bmp"
