"""Deletion-vector codec (`table/dv_codec.py`) — byte-level pins.

No external Delta client is installable here, so beyond round-trips
these tests re-parse the writer's bytes with an INDEPENDENT struct
reader implemented inline from the public specs (ZeroMQ spec 32 for
Z85, RoaringFormatSpec for the 32-bit bitmaps, delta PROTOCOL.md for
the RoaringBitmapArray portable layout and the DV file framing) —
a drifting writer cannot hide behind its own reader.
"""

import random
import struct
import zlib

from delta_lake_play_spark.table.dv_codec import (
    deserialize_rba,
    dv_file_rel_path,
    inline_dv_spec,
    read_dv_spec,
    serialize_rba,
    write_dv_file,
    z85_decode,
    z85_encode,
)

HELLO = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])


def test_z85_spec_vector():
    """The ZeroMQ spec-32 reference vector."""
    assert z85_encode(HELLO) == "HelloWorld"
    assert z85_decode("HelloWorld") == HELLO


def test_z85_padding_trims_by_length():
    for n in range(1, 9):
        data = bytes(range(1, n + 1))
        assert z85_decode(z85_encode(data), n) == data


def test_rba_round_trips_all_container_kinds():
    random.seed(11)
    cases = [
        [],
        [0],
        [5, 9, 12],
        list(range(100, 5000)),                       # bitmap container
        sorted(random.sample(range(200_000), 9000)),  # many 16-bit chunks
        [3, (1 << 32) + 7, (1 << 33) + 1],            # multiple 64-bit buckets
        sorted(random.sample(range(1 << 20), 70_000)),
    ]
    for c in cases:
        assert deserialize_rba(serialize_rba(c)) == sorted(set(c))


def test_rba_portable_layout_independent_parse():
    """Re-parse the serialized bytes from the spec text alone."""
    values = [1, 2, 70_000, (1 << 32) + 5]
    data = serialize_rba(values)
    magic, n_bitmaps = struct.unpack_from("<IQ", data, 0)
    assert magic == 1681511377
    assert n_bitmaps == 2                      # buckets 0 and 1
    pos = 12
    got = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<I", data, pos)
        pos += 4
        cookie, n_containers = struct.unpack_from("<II", data, pos)
        assert cookie == 12346                 # no-run form
        pos += 8
        heads = [
            struct.unpack_from("<HH", data, pos + 4 * i)
            for i in range(n_containers)
        ]
        pos += 4 * n_containers
        offsets = struct.unpack_from(f"<{n_containers}I", data, pos)
        pos += 4 * n_containers
        # offsets are relative to the bitmap's own start (right after
        # this bucket's 4-byte key)
        start = pos - (8 + 4 * n_containers + 4 * n_containers)
        for (ckey, card_m1), off in zip(heads, offsets):
            card = card_m1 + 1
            assert card <= 4096                # all array containers here
            vals = struct.unpack_from(f"<{card}H", data, start + off)
            got.extend((key << 32) | (ckey << 16) | v for v in vals)
        pos = start + offsets[-1] + 2 * (heads[-1][1] + 1)
    assert sorted(got) == values


def test_dv_file_framing_and_checksum(tmp_path):
    """DV file: version byte 1, then [size BE][bitmap][crc32 BE] at
    ``offset`` — parsed here without the module's reader."""
    positions = [4, 9, 1_000_000]
    spec = write_dv_file(str(tmp_path), positions, "fp-frame")
    rel = dv_file_rel_path(spec)
    blob = (tmp_path / rel).read_bytes()
    assert blob[0] == 1
    off = spec["offset"]
    (size,) = struct.unpack_from(">i", blob, off)
    assert size == spec["sizeInBytes"]
    data = blob[off + 4 : off + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
    assert crc == (zlib.crc32(data) & 0xFFFFFFFF)
    assert deserialize_rba(data) == positions
    assert spec["cardinality"] == 3
    # idempotent: same fingerprint reuses the identical file + spec
    assert write_dv_file(str(tmp_path), positions, "fp-frame") == spec


def test_inline_and_file_specs_agree(tmp_path):
    positions = sorted(random.Random(3).sample(range(50_000), 1200))
    inline = inline_dv_spec(positions)
    filed = write_dv_file(str(tmp_path), positions, "fp-agree")
    assert read_dv_spec(str(tmp_path), inline) == positions
    assert read_dv_spec(str(tmp_path), filed) == positions


def test_corrupt_checksum_refused(tmp_path):
    import pytest

    spec = write_dv_file(str(tmp_path), [1, 2, 3], "fp-corrupt")
    p = tmp_path / dv_file_rel_path(spec)
    blob = bytearray(p.read_bytes())
    blob[7] ^= 0xFF  # flip a bitmap byte
    p.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        read_dv_spec(str(tmp_path), spec)


# ------------------------------------------------ property-based pins

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.integers(0, 1 << 17),            # dense low chunks
                st.integers(0, (1 << 33) + 9),      # multi-bucket spread
            ),
            max_size=3000,
        )
    )
    def test_rba_round_trip_property(positions):
        """Any 64-bit position set round-trips through the portable
        serialization — array/bitmap container selection, chunk
        splits, and bucket keys are all exercised by shrinkage."""
        assert deserialize_rba(serialize_rba(positions)) == sorted(
            set(positions)
        )

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=257))
    def test_z85_round_trip_property(data):
        assert z85_decode(z85_encode(data), len(data)) == data

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.integers(0, 1 << 20), min_size=0, max_size=500),
        st.text(
            alphabet="abcdef0123456789", min_size=1, max_size=12
        ),
    )
    def test_dv_spec_round_trip_property(positions, fp):
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            spec = write_dv_file(d, positions, fp)
            assert read_dv_spec(d, spec) == sorted(set(positions))
            assert read_dv_spec(d, inline_dv_spec(positions)) == sorted(
                set(positions)
            )
