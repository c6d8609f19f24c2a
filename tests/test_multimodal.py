"""Pure-numpy BMP/PPM codec (llm/multimodal.py — VERDICT r9 ask #4).

The driver keys cover the encoder's own output (width 16, top-down
BMP, no row padding); these tests feed the decoder hand-built
payloads exercising the paths the fixtures never produce: non-4-
aligned BMP widths (row padding must be excluded from pixel sums),
bottom-up BMPs (positive biHeight), multi-digit PPM dims, and the
compressed-codec / unknown-magic refusals.
"""

import struct

import numpy as np
import pandas as pd
import pytest

from delta_lake_play_spark.llm import multimodal as mm


def _bmp(width: int, height: int, pix_rows: list[bytes], top_down: bool) -> bytes:
    """24-bit BMP with explicit per-row pixel bytes (caller pads)."""
    rowsize = ((width * 3 + 3) // 4) * 4
    assert all(len(r) == rowsize for r in pix_rows) and len(pix_rows) == height
    pix = b"".join(pix_rows)
    h = -height if top_down else height
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
        + pix
    )


def _decode(payloads: list[bytes]) -> pd.DataFrame:
    pdf = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
    return next(iter(mm.decode_batches(iter([pdf]))))


def test_bmp_row_padding_excluded_from_pixel_sum():
    """Width 5 → 15 pixel bytes + 1 pad byte per row; the pad bytes
    (set to 0xFF to be loud) must NOT appear in pixel_sum."""
    rows = [bytes([1] * 15) + b"\xff", bytes([2] * 15) + b"\xff"]
    out = _decode([_bmp(5, 2, rows, top_down=True)])
    assert out.loc[0, "width"] == 5 and out.loc[0, "height"] == 2
    assert out.loc[0, "pixel_sum"] == 15 * 1 + 15 * 2


def test_bmp_bottom_up_height_normalized():
    """Positive biHeight (bottom-up storage) decodes with the same
    positive height and the same order-independent pixel sum."""
    rows = [bytes([7] * 12), bytes([9] * 12)]  # width 4 → 12 B, 4-aligned
    td = _decode([_bmp(4, 2, rows, top_down=True)])
    bu = _decode([_bmp(4, 2, rows[::-1], top_down=False)])
    assert td.loc[0, "height"] == bu.loc[0, "height"] == 2
    assert td.loc[0, "pixel_sum"] == bu.loc[0, "pixel_sum"] == 12 * 7 + 12 * 9


def test_ppm_multi_digit_dims_and_255_height():
    """PPM header parse must anchor tokens positionally — a height
    equal to the maxval literal ('255') must not confuse the
    header-length computation."""
    w, h = 2, 255
    pix = bytes(range(256)) * ((w * 3 * h) // 256) + bytes(range((w * 3 * h) % 256))
    payload = f"P6\n{w} {h}\n255\n".encode() + pix
    out = _decode([payload])
    assert out.loc[0, "width"] == w and out.loc[0, "height"] == h
    assert out.loc[0, "pixel_sum"] == int(np.frombuffer(pix, np.uint8).sum())


def test_mixed_formats_one_batch():
    rows = [bytes([3] * 12)]
    bmp = _bmp(4, 1, rows, top_down=True)
    ppm = b"P6\n1 1\n255\n\x05\x06\x07"
    out = _decode([bmp, ppm])
    assert list(out["fmt"]) == ["bmp", "ppm"]
    assert list(out["pixel_sum"]) == [36, 18]


def test_compressed_magic_routes_to_stub():
    with pytest.raises(NotImplementedError, match="compressed"):
        _decode([b"\xff\xd8\xff\xe0fakejpeg"])


def test_unknown_magic_raises_loudly():
    with pytest.raises(ValueError, match="undecodable"):
        _decode([b"GIF89a..."])


def test_resize_matches_reference_nearest_neighbor():
    """4×4 thumbnail sum equals a straightforward per-pixel reference
    loop (distinct byte values per pixel so mis-indexing shows)."""
    w, h = 16, 6
    pix = bytes((i * 7 + 3) % 251 for i in range(w * 3 * h))
    pdf = pd.DataFrame(
        {"doc_id": [1], "payload": [f"P6\n{w} {h}\n255\n".encode() + pix]}
    )
    out = next(iter(mm.resize_batches(iter([pdf]))))
    expect = 0
    for r in range(4):
        for c in range(4):
            base = ((r * h) // 4) * w * 3 + ((c * w) // 4) * 3
            expect += sum(pix[base : base + 3])
    assert out.loc[0, "thumb_pixel_sum"] == expect
    assert out.loc[0, "thumb_w"] == out.loc[0, "thumb_h"] == 4


def test_resize_flips_bottom_up_bmp_rows():
    """A bottom-up BMP (positive biHeight) and its top-down twin hold
    the same IMAGE, stored in opposite row order — the thumbnail must
    sample identical image pixels for both (self-review r10: the
    top-down-only map silently read row h-1-r)."""
    w, h = 4, 6
    img_rows = [bytes([(10 * r + c) for c in range(w * 3)]) for r in range(h)]
    td = _bmp(w, h, img_rows, top_down=True)
    bu = _bmp(w, h, img_rows[::-1], top_down=False)  # same image
    pdf = pd.DataFrame({"doc_id": [0, 2], "payload": [td, bu]})
    out = next(iter(mm.resize_batches(iter([pdf]))))
    assert out.loc[0, "thumb_pixel_sum"] == out.loc[1, "thumb_pixel_sum"]
    expect = 0
    for r in range(4):
        for c in range(4):
            base = ((r * h) // 4) * w * 3 + ((c * w) // 4) * 3
            expect += sum(b"".join(img_rows)[base : base + 3])
    assert out.loc[0, "thumb_pixel_sum"] == expect


def test_resize_honors_bmp_pixel_offset():
    """bfOffBits > 54 (V4/V5 headers, palettes): resize must start at
    the declared pixel offset, exactly like decode (self-review r10:
    it hardcoded 54 and summed header bytes as pixels)."""
    w, h = 4, 2
    rows = [bytes([5] * 12), bytes([9] * 12)]
    base = _bmp(w, h, rows, top_down=True)
    # splice 16 bytes of 0xEE gap between header and pixels, bump
    # bfOffBits (byte 10) and bfSize accordingly
    gap = b"\xee" * 16
    moved = bytearray(base[:54] + gap + base[54:])
    moved[10:14] = (54 + 16).to_bytes(4, "little")
    moved[2:6] = len(moved).to_bytes(4, "little")
    pdf = pd.DataFrame({"doc_id": [0], "payload": [bytes(moved)]})
    dec = next(iter(mm.decode_batches(iter([pdf]))))
    assert dec.loc[0, "pixel_sum"] == 12 * 5 + 12 * 9
    out = next(iter(mm.resize_batches(iter([pdf]))))
    ref = next(
        iter(
            mm.resize_batches(
                iter([pd.DataFrame({"doc_id": [0], "payload": [base]})])
            )
        )
    )
    assert out.loc[0, "thumb_pixel_sum"] == ref.loc[0, "thumb_pixel_sum"]


def test_truncated_image_raises_not_neighbor_read():
    """A header claiming more pixel rows than the payload carries must
    raise, not silently read the NEXT document's bytes out of the
    batch's concatenated buffer (self-review r10)."""
    lying = b"P6\n4 1000\n255\n" + bytes([1] * 12)
    victim = b"P6\n4 1\n255\n" + bytes([200] * 12)
    pdf = pd.DataFrame({"doc_id": [0, 1], "payload": [lying, victim]})
    with pytest.raises(ValueError, match="truncated"):
        list(mm.decode_batches(iter([pdf])))
    with pytest.raises(ValueError, match="truncated"):
        list(mm.resize_batches(iter([pdf])))


def test_bmp_rejects_negative_or_tiny_bfoffbits():
    """ADVICE r10: a negative bfOffBits (signed _le32 read) or one
    pointing inside the header yields a negative/overlapping pixel
    segment that passes the upper-bound containment check — it must
    raise, never gather a neighbor's bytes."""
    base = bytearray(_bmp(4, 1, [bytes([1] * 12)], top_down=True))
    for off in (0xFFFFFFF0, 0, 10, 53):  # negative-as-signed, in-header
        bad = bytearray(base)
        bad[10:14] = off.to_bytes(4, "little")
        with pytest.raises(ValueError, match="bfOffBits"):
            _decode([bytes(bad)])
        with pytest.raises(ValueError, match="bfOffBits"):
            list(
                mm.resize_batches(
                    iter([pd.DataFrame({"doc_id": [0], "payload": [bytes(bad)]})])
                )
            )


def test_bmp_rejects_palettized_bit_depths():
    """ADVICE r10: bpp 1/4 gives depth = bpp//8 = 0 and rowsize 0 —
    the payload passes containment and 'decodes' to pixel_sum 0
    instead of raising. 8/16-bit are likewise unsupported."""
    base = bytearray(_bmp(4, 1, [bytes([1] * 12)], top_down=True))
    for bpp in (1, 4, 8, 16):
        bad = bytearray(base)
        bad[28:30] = bpp.to_bytes(2, "little")
        with pytest.raises(ValueError, match="bit depth"):
            _decode([bytes(bad)])
    ok = bytearray(base)
    ok[28:30] = (32).to_bytes(2, "little")  # 32-bit stays accepted
    ok[18:22] = (3).to_bytes(4, "little")  # 3 px * 4 B = 12 B row
    assert _decode([bytes(ok)]).loc[0, "depth"] == 4


def test_huge_dimension_header_cannot_wrap_containment():
    """Self-review r11: biWidth/biHeight near 2^31 make
    rowsize*height wrap mod 2^64 to a NEGATIVE int64, which would
    pass the `> lens` containment check and let resize gather far
    outside the payload — the check must compute overflow-safely and
    report the image as truncated."""
    base = bytearray(_bmp(4, 1, [bytes([1] * 12)], top_down=True))
    base[28:30] = (32).to_bytes(2, "little")  # bpp 32 (depth 4)
    base[18:22] = (0x7FFFFFFF).to_bytes(4, "little")  # biWidth
    base[22:26] = (0x7FFFFFFF).to_bytes(4, "little")  # biHeight
    pdf = pd.DataFrame({"doc_id": [0], "payload": [bytes(base)]})
    with pytest.raises(ValueError, match="truncated"):
        list(mm.decode_batches(iter([pdf])))
    with pytest.raises(ValueError, match="truncated"):
        list(mm.resize_batches(iter([pdf])))


def test_zero_dimension_headers_raise_in_decode_and_resize():
    """ADVICE r10: width/height 0 declares 0 pixel bytes (passes
    containment) but the 4x4 thumbnail gather still reads pix_off+2
    and, bottom-up, wraps via height-1-src_r = -1 — both stages must
    refuse degenerate dims (the real encoder emits height >= 1)."""
    zh = bytearray(_bmp(4, 1, [bytes([1] * 12)], top_down=False))
    zh[22:26] = (0).to_bytes(4, "little")  # biHeight = 0, bottom-up
    zw = b"P6\n0 3\n255\n"  # PPM width 0
    for bad in (bytes(zh), zw):
        pdf = pd.DataFrame({"doc_id": [0], "payload": [bad]})
        with pytest.raises(ValueError, match="degenerate"):
            list(mm.decode_batches(iter([pdf])))
        with pytest.raises(ValueError, match="degenerate"):
            list(mm.resize_batches(iter([pdf])))


def test_fixture_documents_text_is_ascii_only():
    """ADVICE r10: llm_multimodal_decode's DuckDB oracle equates
    pixel_sum = sum(ascii(code unit)) and n = octet_length(encode),
    which only holds for pure-ASCII text. Guard the fixture CONTRACT
    here so a regenerated fixture with multi-byte chars fails loudly
    as a contract break, not as a mysterious codec hash mismatch."""
    import os

    import pyarrow.parquet as pq

    from tests.conftest import SF_DIR

    checked = 0
    # the configured suite fixture FIRST (honors SPARK_GRAFT_TEST_SF_DIR
    # — self-review r11), plus the two driver fixtures when present
    dirs = dict.fromkeys((SF_DIR, "/root/testdata/sf0.001", "/root/testdata/sf0.01"))
    for sf_dir in dirs:
        path = os.path.join(sf_dir, "documents.parquet")
        if not os.path.exists(path):
            continue
        texts = pq.read_table(path, columns=["text"]).column("text")
        for chunk in texts.chunks:
            for t in chunk.to_pylist():
                assert t is None or t.isascii(), (
                    f"non-ASCII documents.text in {path}: {t[:80]!r}"
                )
        checked += 1
    assert checked, "no documents.parquet fixture found to check"


def test_encoder_emits_valid_images_roundtrip():
    texts = [b"hello world" * 7, b"x", b"a" * 48, b"q" * 49, b""]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "payload": texts})
    enc = next(iter(mm.encode_image_batches(iter([pdf]))))
    dec = next(iter(mm.decode_batches(iter([enc]))))
    for t, (_, row) in zip(texts, dec.iterrows()):
        exp_h = max(1, -(-len(t) // 48))
        assert row["width"] == 16 and row["height"] == exp_h
        assert row["pixel_sum"] == sum(t)
        assert row["fmt"] == ("bmp" if row["doc_id"] % 2 == 0 else "ppm")


# --- property-based roundtrip (hypothesis) ---------------------------------

hypothesis = pytest.importorskip("hypothesis")  # SKIP visibly if absent
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    payloads=st.lists(
        st.binary(min_size=0, max_size=400), min_size=1, max_size=8
    ),
    start_id=st.integers(min_value=0, max_value=10_000),
)
def test_property_encode_decode_roundtrip(payloads, start_id):
    """For ANY byte payloads: encode → decode recovers exact
    dimensions and the payload byte sum; the thumbnail sum equals
    an independent per-pixel reference loop. Exercises both
    formats (doc_id parity), empty payloads, and row-boundary
    sizes the example tests can't enumerate."""
    ids = list(range(start_id, start_id + len(payloads)))
    pdf = pd.DataFrame({"doc_id": ids, "payload": payloads})
    enc = next(iter(mm.encode_image_batches(iter([pdf]))))
    dec = next(iter(mm.decode_batches(iter([enc]))))
    res = next(iter(mm.resize_batches(iter([enc]))))
    for p, (_, d), (_, r) in zip(payloads, dec.iterrows(), res.iterrows()):
        h = max(1, -(-len(p) // 48))
        assert d["width"] == 16 and d["height"] == h and d["depth"] == 3
        assert d["fmt"] == ("bmp" if d["doc_id"] % 2 == 0 else "ppm")
        assert d["pixel_sum"] == sum(p)
        pix = p + b"\0" * (h * 48 - len(p))
        expect = 0
        for rr in range(4):
            for cc in range(4):
                base = ((rr * h) // 4) * 48 + ((cc * 16) // 4) * 3
                expect += sum(pix[base : base + 3])
        assert r["thumb_pixel_sum"] == expect


def _dhash(payloads: list[bytes]) -> pd.DataFrame:
    pdf = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
    return next(iter(mm.dhash_batches(iter([pdf]))))


def test_dhash_brightness_invariance():
    """dHash keys on gradient SIGNS: adding a constant to every pixel
    byte (no clipping) must not change the fingerprint, while
    reversing the gradient must."""
    rng = np.random.default_rng(7)
    base = rng.integers(20, 120, size=(8, 16 * 3), dtype=np.uint8)
    rows = [bytes(r) for r in base]
    brighter = [bytes((np.frombuffer(r, np.uint8) + 100).astype(np.uint8)) for r in rows]
    p1 = _bmp(16, 8, rows, top_down=True)
    p2 = _bmp(16, 8, brighter, top_down=True)
    p3 = _bmp(16, 8, rows[::-1], top_down=True)  # vertical flip
    out = _dhash([p1, p2, p3])
    assert out.loc[0, "dhash"] == out.loc[1, "dhash"]
    assert out.loc[0, "dhash"] != out.loc[2, "dhash"]
    assert 0 <= out["dhash"].max() < (1 << 24)


def test_dhash_bottom_up_matches_top_down():
    """The same image stored bottom-up (positive biHeight, reversed
    row order) must produce the identical fingerprint."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, size=(8, 16 * 3), dtype=np.uint8)
    rows = [bytes(r) for r in base]
    td = _bmp(16, 8, rows, top_down=True)
    bu = _bmp(16, 8, rows[::-1], top_down=False)
    out = _dhash([td, bu])
    assert out.loc[0, "dhash"] == out.loc[1, "dhash"]


def _audio(payloads: list[bytes]) -> pd.DataFrame:
    pdf = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
    return next(iter(mm.audio_energy_batches(iter([pdf]))))


def test_audio_energy_signed_samples_and_odd_tail():
    """int16 LE decoding: 0x8000 = -32768, 0xFFFF = -1; a trailing
    odd byte is truncated, empty payloads yield zero frames."""
    p = struct.pack("<4h", 100, -100, -32768, -1) + b"\x7f"  # odd tail byte
    out = _audio([p, b""])
    assert int(out.loc[0, "n_samples"]) == 4
    assert int(out.loc[0, "n_frames"]) == 1
    assert int(out.loc[0, "total_abs_energy"]) == 100 + 100 + 32768 + 1
    assert int(out.loc[0, "peak_frame_energy"]) == 32969  # one frame: == total
    assert int(out.loc[1, "n_samples"]) == 0
    assert int(out.loc[1, "n_frames"]) == 0
    assert int(out.loc[1, "total_abs_energy"]) == 0
    assert int(out.loc[1, "peak_frame_energy"]) == 0


def test_audio_energy_peak_is_per_frame_max():
    """Two full frames with different energies: peak = the louder
    frame, total = their sum (frame boundary at 256 samples)."""
    quiet = struct.pack("<256h", *([1] * 256))
    loud = struct.pack("<256h", *([-10] * 256))
    out = _audio([quiet + loud])
    assert int(out.loc[0, "n_frames"]) == 2
    assert int(out.loc[0, "total_abs_energy"]) == 256 + 2560
    assert int(out.loc[0, "peak_frame_energy"]) == 2560
