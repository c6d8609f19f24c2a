"""Delta deletion-vector codec: RoaringBitmapArray + Z85 + DV files.

Implements the open protocol's Deletion Vector format (PROTOCOL.md
"Deletion Vectors"; reference storage story `spark_project.py:36` is
delta-core, whose DVs this mirrors) in pure Python:

- **RoaringBitmapArray, "portable" serialization**: 4-byte LE magic
  ``1681511377``, 8-byte LE bitmap count, then per non-empty 32-bit
  bucket (sorted, ascending): 4-byte LE key (the position's high 32
  bits) + a standard-format 32-bit Roaring bitmap. The 32-bit bitmap
  uses the public RoaringFormatSpec: cookie ``12346`` (no run
  containers — this writer never emits runs) + container count,
  ``(key, cardinality-1)`` descriptive headers, offset headers, then
  array containers (sorted uint16 LE, cardinality ≤ 4096) or bitmap
  containers (8192 bytes / 1024 uint64 LE words). The reader also
  accepts cookie ``12347`` (run-container form) for foreign files.
- **Z85**: the ZeroMQ ascii85 variant Delta uses for the
  ``pathOrInlineDv`` field — 4 input bytes per 5 output chars.
  Arbitrary-length payloads are zero-padded to a multiple of 4 on
  encode; decoders trim via the action's ``sizeInBytes``.
- **DV files** (`storageType "u"`): ``deletion_vector_<uuid>.bin``
  under the table root — 1-byte format version ``1``, then per DV at
  ``offset``: 4-byte BE data length, the serialized bitmap, 4-byte BE
  CRC-32 of the bitmap bytes (delta-spark's DeletionVectorStore
  layout; Java DataOutputStream writes big-endian).

No external Delta client is installable in this environment, so
byte-level parity is pinned by round-trip tests plus an independent
struct-level re-parse in tests/test_dv_codec.py; the module's own
reader shares no state with its writer beyond these documented
layouts.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

_RBA_MAGIC = 1681511377
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_ARRAY_MAX = 4096
_NO_OFFSET_THRESHOLD = 4

# --------------------------------------------------------------------- Z85

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """Z85 (ZeroMQ spec 32). Zero-pads to a multiple of 4; callers
    that encode arbitrary payloads must record the true byte length
    (Delta stores it in ``sizeInBytes``)."""
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    out = []
    for i in range(0, len(data), 4):
        (word,) = struct.unpack(">I", data[i : i + 4])
        block = []
        for _ in range(5):
            word, rem = divmod(word, 85)
            block.append(_Z85_ALPHABET[rem])
        out.extend(reversed(block))
    return "".join(out)


def z85_decode(text: str, length: int | None = None) -> bytes:
    """Inverse of :func:`z85_encode`; ``length`` trims the padding."""
    if len(text) % 5:
        raise ValueError(f"z85 input length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i : i + 5]:
            word = word * 85 + _Z85_DECODE[c]
        out += struct.pack(">I", word)
    return bytes(out[:length] if length is not None else out)


# ------------------------------------------------- 32-bit Roaring bitmap


def _serialize_roaring32(values: list[int]) -> bytes:
    """Standard-format serialization of one 32-bit Roaring bitmap
    (values must be sorted, unique, < 2^32)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    head = struct.pack("<II", _COOKIE_NO_RUN, n)
    headers = b"".join(
        struct.pack("<HH", k, len(containers[k]) - 1) for k in keys
    )
    # container payloads + offset header (offsets are from the START
    # of the serialized bitmap)
    payloads = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_MAX:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            payloads.append(struct.pack("<1024Q", *words))
    base = len(head) + len(headers) + 4 * n
    offsets = []
    pos = base
    for p in payloads:
        offsets.append(pos)
        pos += len(p)
    return (
        head
        + headers
        + struct.pack(f"<{n}I", *offsets)
        + b"".join(payloads)
    )


def _deserialize_roaring32(data: bytes, base: int) -> tuple[list[int], int]:
    """Parse one 32-bit Roaring bitmap at ``base``; returns (values,
    bytes consumed). Accepts both cookies."""
    (cookie32,) = struct.unpack_from("<I", data, base)
    cookie = cookie32 & 0xFFFF
    pos = base + 4
    run_flags = b""
    if cookie == _COOKIE_RUN:
        n = (cookie32 >> 16) + 1
        nflag = (n + 7) // 8
        run_flags = data[pos : pos + nflag]
        pos += nflag
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", data, pos)
        pos += 4
    else:
        raise ValueError(f"bad roaring cookie {cookie} at {base}")
    heads = [struct.unpack_from("<HH", data, pos + 4 * i) for i in range(n)]
    pos += 4 * n
    if cookie == _COOKIE_NO_RUN or n >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n  # offset header (recomputed below from order)
    values: list[int] = []
    for i, (key, card_m1) in enumerate(heads):
        card = card_m1 + 1
        is_run = bool(run_flags and (run_flags[i // 8] >> (i % 8)) & 1)
        hi = key << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(n_runs):
                start, len_m1 = struct.unpack_from("<HH", data, pos)
                pos += 4
                values.extend(hi | v for v in range(start, start + len_m1 + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            values.extend(hi | v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", data, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(hi | (wi << 6) | b.bit_length() - 1)
                    w ^= b
    return values, pos - base


# --------------------------------------------- 64-bit RoaringBitmapArray


def serialize_rba(positions: list[int]) -> bytes:
    """Portable-format RoaringBitmapArray over sorted/unique 64-bit
    row positions."""
    positions = sorted(set(int(p) for p in positions))
    if positions and positions[0] < 0:
        raise ValueError("negative row position")
    buckets: dict[int, list[int]] = {}
    for p in positions:
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = [struct.pack("<IQ", _RBA_MAGIC, len(buckets))]
    for key in sorted(buckets):
        out.append(struct.pack("<I", key))
        out.append(_serialize_roaring32(buckets[key]))
    return b"".join(out)


def deserialize_rba(data: bytes) -> list[int]:
    magic, n = struct.unpack_from("<IQ", data, 0)
    if magic != _RBA_MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    values: list[int] = []
    for _ in range(n):
        (key,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals, used = _deserialize_roaring32(data, pos)
        pos += used
        hi = key << 32
        values.extend(hi | v for v in vals)
    return values


# ------------------------------------------------------------- DV files

_DV_FILE_VERSION = 1


def _dv_uuid_for(fingerprint: str) -> _uuid.UUID:
    """Deterministic UUID per DV state so re-syncs are idempotent
    (first ``os.link`` wins, identical name+content) — any UUID is
    spec-legal; delta-spark happens to draw random ones."""
    import hashlib

    return _uuid.UUID(bytes=hashlib.sha256(fingerprint.encode()).digest()[:16])


def write_dv_file(
    table_path: str, positions: list[int], fingerprint: str
) -> dict:
    """Write (or reuse) ``deletion_vector_<uuid>.bin`` for this DV
    state and return the add action's ``deletionVector`` spec."""
    data = serialize_rba(positions)
    u = _dv_uuid_for(fingerprint)
    name = f"deletion_vector_{u}.bin"
    path = os.path.join(table_path, name)
    if not os.path.exists(path):
        blob = (
            struct.pack("B", _DV_FILE_VERSION)
            + struct.pack(">i", len(data))
            + data
            + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        )
        tmp = os.path.join(table_path, f".tmp-dv-{_uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(blob)
        try:
            os.link(tmp, path)
        except FileExistsError:
            pass  # concurrent syncer wrote identical content first
        finally:
            os.unlink(tmp)
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(u.bytes),
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": len(positions),
    }


def inline_dv_spec(positions: list[int]) -> dict:
    """``storageType "i"`` spec: the serialized bitmap rides in the
    action itself — the right form for tiny DVs (no extra file I/O
    per read at scale)."""
    data = serialize_rba(positions)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data),
        "sizeInBytes": len(data),
        "cardinality": len(positions),
    }


def dv_file_rel_path(spec: dict) -> str | None:
    """Table-root-relative path of a ``"u"`` DV file (None for other
    storage types). The z85 payload is ``<optional prefix><uuid>``:
    everything past the final 20 chars is a directory prefix."""
    if spec.get("storageType") != "u":
        return None
    enc = spec["pathOrInlineDv"]
    prefix, uuid_part = enc[:-20], enc[-20:]
    u = _uuid.UUID(bytes=z85_decode(uuid_part, 16))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(prefix, name) if prefix else name


def read_dv_spec(table_path: str, spec: dict) -> list[int]:
    """Masked row positions for any ``deletionVector`` spec."""
    st = spec.get("storageType")
    if st == "i":
        return deserialize_rba(
            z85_decode(spec["pathOrInlineDv"], spec.get("sizeInBytes"))
        )
    if st in ("u", "p"):
        path = (
            spec["pathOrInlineDv"]
            if st == "p"
            else os.path.join(table_path, dv_file_rel_path(spec))
        )
        with open(path, "rb") as fh:
            blob = fh.read()
        if blob[0] != _DV_FILE_VERSION:
            raise ValueError(f"unsupported DV file version {blob[0]}")
        off = int(spec["offset"])
        (size,) = struct.unpack_from(">i", blob, off)
        data = blob[off + 4 : off + 4 + size]
        (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
        if crc != (zlib.crc32(data) & 0xFFFFFFFF):
            raise ValueError("DV checksum mismatch")
        return deserialize_rba(data)
    raise ValueError(f"unknown DV storageType {st!r}")
