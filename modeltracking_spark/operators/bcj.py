"""BCJ (Branch/Call/Jump) and Delta filters for the .xz format.

The xz file-format spec (§5.3, "Filters") defines non-LZMA2 filters
that transform executable code or byte-periodic data so the LZMA2
stage compresses it better.  This module implements, from the public
format documentation:

- **Delta** (filter ID 0x03): byte-wise delta over a distance of
  1..256 (one property byte = distance - 1).  Encode stores
  ``b[i] - b[i - dist]``; decode accumulates.
- **x86 BCJ** (filter ID 0x04, §5.3.2): rewrites the 32-bit relative
  displacements of x86 CALL/JMP instructions (opcodes E8/E9) into
  absolute addresses during encoding and back during decoding, with a
  3-bit mask tracking recently-converted positions so overlapping or
  spurious candidates (displacement high byte not 00/FF) are handled
  identically in both directions.  Optional 4-byte little-endian
  start-offset property seeds the instruction pointer.

Both filters are exact inverses of each other by construction and are
cross-validated byte-for-byte against liblzma (stdlib ``lzma`` with
``FILTER_X86`` / ``FILTER_DELTA``) over adversarial E8/E9-dense
buffers in tests/test_xz_bcj.py.
"""

from __future__ import annotations

# mask -> is a conversion allowed with this pattern of recent E8/E9s
_ALLOWED = (True, True, True, False, True, False, False, False)
# mask -> which displacement byte to probe
_BIT_NUM = (0, 1, 2, 2, 3, 3, 3, 3)


def _is_msbyte(b: int) -> bool:
    return b == 0x00 or b == 0xFF


def _x86_filter(data: bytes, ip: int, encode: bool) -> bytes:
    buf = bytearray(data)
    n = len(buf)
    if n < 5:
        return bytes(buf)
    ip += 5  # displacement is relative to the END of the instruction
    prev_mask = 0
    prev_pos = -1
    i = 0
    while i <= n - 5:
        if buf[i] & 0xFE != 0xE8:  # neither E8 nor E9
            i += 1
            continue
        off = i - prev_pos
        prev_pos = i
        if off > 3:
            prev_mask = 0
        else:
            prev_mask = (prev_mask << (off - 1)) & 7
            if prev_mask != 0:
                b_test = buf[i + 4 - _BIT_NUM[prev_mask]]
                if not _ALLOWED[prev_mask] or _is_msbyte(b_test):
                    prev_mask = ((prev_mask << 1) & 7) | 1
                    i += 1
                    continue
        if _is_msbyte(buf[i + 4]):
            src = int.from_bytes(buf[i + 1:i + 5], "little")
            while True:
                if encode:
                    dest = (src + ip + i) & 0xFFFFFFFF
                else:
                    dest = (src - (ip + i)) & 0xFFFFFFFF
                if prev_mask == 0:
                    break
                idx = _BIT_NUM[prev_mask] * 8
                b_test = (dest >> (24 - idx)) & 0xFF
                if not _is_msbyte(b_test):
                    break
                src = dest ^ ((1 << (32 - idx)) - 1)
            dest &= 0x01FFFFFF
            if dest & 0x01000000:
                dest |= 0xFE000000  # sign-extend bit 24
            buf[i + 1:i + 5] = (dest & 0xFFFFFFFF).to_bytes(4, "little")
            i += 5
            prev_mask = 0
        else:
            prev_mask = ((prev_mask << 1) & 7) | 1
            i += 1
    return bytes(buf)


def x86_bcj_encode(data: bytes, start_offset: int = 0) -> bytes:
    """Raw bytes -> BCJ-transformed bytes (the compression direction)."""
    return _x86_filter(data, start_offset, encode=True)


def x86_bcj_decode(data: bytes, start_offset: int = 0) -> bytes:
    """BCJ-transformed bytes -> raw bytes (the decompression direction)."""
    return _x86_filter(data, start_offset, encode=False)


def delta_encode(data: bytes, dist: int) -> bytes:
    if not 1 <= dist <= 256:
        raise ValueError("delta distance out of range")
    out = bytearray(data)
    for i in range(len(out) - 1, dist - 1, -1):
        out[i] = (out[i] - out[i - dist]) & 0xFF
    return bytes(out)


def delta_decode(data: bytes, dist: int) -> bytes:
    if not 1 <= dist <= 256:
        raise ValueError("delta distance out of range")
    out = bytearray(data)
    for i in range(dist, len(out)):
        out[i] = (out[i] + out[i - dist]) & 0xFF
    return bytes(out)
