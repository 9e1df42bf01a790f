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

Round 11 (VERDICT r10 item 6) adds the spec's remaining branch-filter
family — **PowerPC** (0x05), **IA-64** (0x06), **ARM** (0x07),
**ARM-Thumb** (0x08), **SPARC** (0x09), and **ARM64** (0x0A, BL +
ADRP) — each a position-dependent relative↔absolute branch-address
rewrite at that architecture's instruction alignment, implemented from
the public xz file-format spec §5.3.2.

**RISC-V** (0x0B, 2-byte alignment) closes the family.  The spec
registers only the ID and alignment; the transform semantics were
derived black-box against liblzma 5.8.2 (single-instruction probes of
every branch condition through ``xz --format=raw --riscv`` with the
LZMA2 layer stripped by this repo's own from-spec decoder — the same
raw-dump methodology as the ORC timestamp conventions).  It rewrites
two shapes: JAL with a link register (rd ∈ {x1, x5}), whose 21-bit
relative offset becomes a byte-reversed absolute half-address; and
AUIPC paired with any rs1-matching 12-bit-immediate instruction,
packed into an ``rd=x2``-marked word plus the 32-bit absolute address
big-endian.  Real x2-AUIPCs that would alias the pair marker are
escaped into a third 8-byte form whose trigger is exactly "the
reconstructed AUIPC would alias the marker again" — which is what
makes all three rewrites mutually invertible.

All filters are exact inverses of each other by construction and are
cross-validated byte-for-byte against liblzma (stdlib ``lzma`` with
``FILTER_X86`` / ``FILTER_DELTA`` / ``FILTER_ARM`` /
``FILTER_ARMTHUMB`` / ``FILTER_POWERPC`` / ``FILTER_SPARC`` /
``FILTER_IA64``; the xz CLI's ``--arm64`` for ARM64, which stdlib
3.11 does not expose) over adversarial opcode-dense buffers in
tests/test_xz_bcj.py.
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


def _arm64_filter(data: bytes, ip: int, encode: bool) -> bytes:
    """ARM64 branch filter (xz filter ID 0x0A, spec §5.3.2): converts
    the 26-bit immediate of BL (opcode 100101) between relative and
    absolute word addresses, and the 21-bit ADRP page immediate when
    it is within ±512 MiB (bits 20:18 of the stored value are sign
    replicas by construction, so the decode-side range check always
    re-accepts what encode produced — the invertibility hinge)."""
    buf = bytearray(data)
    n = len(buf)
    for i in range(0, n - 3, 4):
        pc = (ip + i) & 0xFFFFFFFF
        instr = int.from_bytes(buf[i:i + 4], "little")
        if (instr >> 26) == 0x25:  # BL
            src = instr & 0x03FFFFFF
            delta = pc >> 2
            if not encode:
                delta = -delta
            instr = 0x94000000 | ((src + delta) & 0x03FFFFFF)
        elif (instr & 0x9F000000) == 0x90000000:  # ADRP
            src = ((instr >> 29) & 3) | ((instr >> 3) & 0x001FFFFC)
            if (src + 0x00020000) & 0x001C0000:
                continue  # outside ±512 MiB: left untouched
            instr &= 0x9000001F
            delta = pc >> 12
            if not encode:
                delta = -delta
            dest = (src + delta) & 0xFFFFFFFF
            instr |= (dest & 3) << 29
            instr |= (dest & 0x0003FFFC) << 3
            instr |= (-(dest & 0x00020000)) & 0x00E00000
        else:
            continue
        buf[i:i + 4] = instr.to_bytes(4, "little")
    return bytes(buf)


def _arm_filter(data: bytes, ip: int, encode: bool) -> bytes:
    """ARM (AArch32) BL filter (ID 0x07): 24-bit word immediate of the
    0xEB-opcode branch, pc bias +8 (the architectural prefetch)."""
    buf = bytearray(data)
    for i in range(0, len(buf) - 3, 4):
        if buf[i + 3] == 0xEB:
            src = ((buf[i + 2] << 16) | (buf[i + 1] << 8) | buf[i]) << 2
            pc = (ip + i + 8) & 0xFFFFFFFF
            dest = ((src + pc) if encode else (src - pc)) & 0xFFFFFFFF
            dest >>= 2
            buf[i] = dest & 0xFF
            buf[i + 1] = (dest >> 8) & 0xFF
            buf[i + 2] = (dest >> 16) & 0xFF
    return bytes(buf)


def _armthumb_filter(data: bytes, ip: int, encode: bool) -> bytes:
    """ARM-Thumb BL filter (ID 0x08): the 22-bit halfword immediate
    split across a 0xF0/0xF8 instruction pair, pc bias +4; a converted
    pair advances 4 bytes (both halves consumed)."""
    buf = bytearray(data)
    n = len(buf)
    i = 0
    while i + 4 <= n:
        if (buf[i + 1] & 0xF8) == 0xF0 and (buf[i + 3] & 0xF8) == 0xF8:
            src = (((buf[i + 1] & 7) << 19) | (buf[i] << 11)
                   | ((buf[i + 3] & 7) << 8) | buf[i + 2]) << 1
            pc = (ip + i + 4) & 0xFFFFFFFF
            dest = ((src + pc) if encode else (src - pc)) & 0xFFFFFFFF
            dest >>= 1
            buf[i + 1] = 0xF0 | ((dest >> 19) & 7)
            buf[i] = (dest >> 11) & 0xFF
            buf[i + 3] = 0xF8 | ((dest >> 8) & 7)
            buf[i + 2] = dest & 0xFF
            i += 2
        i += 2
    return bytes(buf)


def _ppc_filter(data: bytes, ip: int, encode: bool) -> bytes:
    """PowerPC bl filter (ID 0x05): big-endian `b` with AA=0/LK=1
    (opcode bits 0x48...01), 24-bit word displacement in bits 25:2."""
    buf = bytearray(data)
    for i in range(0, len(buf) - 3, 4):
        if (buf[i] & 0xFC) == 0x48 and (buf[i + 3] & 3) == 1:
            src = (((buf[i] & 3) << 24) | (buf[i + 1] << 16)
                   | (buf[i + 2] << 8) | (buf[i + 3] & 0xFC))
            pc = (ip + i) & 0xFFFFFFFF
            dest = ((src + pc) if encode else (src - pc)) & 0xFFFFFFFF
            buf[i] = 0x48 | ((dest >> 24) & 3)
            buf[i + 1] = (dest >> 16) & 0xFF
            buf[i + 2] = (dest >> 8) & 0xFF
            buf[i + 3] = (buf[i + 3] & 3) | (dest & 0xFC)
    return bytes(buf)


def _sparc_filter(data: bytes, ip: int, encode: bool) -> bytes:
    """SPARC call filter (ID 0x09): the two call shapes (0x40 with
    clear top displacement bits, 0x7F with set ones); the stored word
    re-packs bit 22 as a sign so both shapes regenerate on decode."""
    buf = bytearray(data)
    for i in range(0, len(buf) - 3, 4):
        if ((buf[i] == 0x40 and (buf[i + 1] & 0xC0) == 0)
                or (buf[i] == 0x7F and (buf[i + 1] & 0xC0) == 0xC0)):
            src = (int.from_bytes(buf[i:i + 4], "big") << 2) & 0xFFFFFFFF
            pc = (ip + i) & 0xFFFFFFFF
            dest = ((src + pc) if encode else (src - pc)) & 0xFFFFFFFF
            dest >>= 2
            dest = ((0x40000000 - (dest & 0x400000))
                    | 0x40000000 | (dest & 0x3FFFFF)) & 0xFFFFFFFF
            buf[i:i + 4] = dest.to_bytes(4, "big")
    return bytes(buf)


#: IA-64 template -> 3-bit mask of slots holding a branch instruction
_IA64_BRANCH_TABLE = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 6, 6, 0, 0, 7, 7, 4, 4, 0, 0, 4, 4, 0, 0,
)


def _ia64_filter(data: bytes, ip: int, encode: bool) -> bytes:
    """IA-64 branch filter (ID 0x06): 16-byte bundles; for each slot
    the template marks as a branch, the 41-bit instruction is
    extracted at its bit offset and, when it is a long-branch opcode
    (major op 5 with zero low qualifier), the 21-bit (sign, imm20)
    bundle-address immediate is converted."""
    buf = bytearray(data)
    for i in range(0, len(buf) - 15, 16):
        mask = _IA64_BRANCH_TABLE[buf[i] & 0x1F]
        for slot in range(3):
            if not (mask >> slot) & 1:
                continue
            bit_pos = 5 + slot * 41
            byte_pos = bit_pos >> 3
            bit_res = bit_pos & 7
            instr = int.from_bytes(buf[i + byte_pos:i + byte_pos + 6],
                                   "little")
            norm = instr >> bit_res
            if ((norm >> 37) & 0xF) != 5 or ((norm >> 9) & 0x7) != 0:
                continue
            src = ((norm >> 13) & 0xFFFFF) | (((norm >> 36) & 1) << 20)
            src <<= 4
            pc = (ip + i) & 0xFFFFFFFF
            dest = ((src + pc) if encode else (src - pc)) & 0xFFFFFFFF
            dest >>= 4
            norm &= ~(0x8FFFFF << 13)
            norm |= (dest & 0xFFFFF) << 13
            norm |= (dest & 0x100000) << 16  # sign bit -> bit 36
            instr &= (1 << bit_res) - 1
            instr |= norm << bit_res
            buf[i + byte_pos:i + byte_pos + 6] = \
                instr.to_bytes(6, "little")
    return bytes(buf)


def _riscv_filter(data: bytes, ip: int, encode: bool) -> bytes:
    """RISC-V branch filter (ID 0x0B): three mutually-inverse 8-byte
    rewrites scanned at 2-byte alignment (the C extension makes 16-bit
    instruction slots possible, so every even offset is a candidate).

    - **JAL** (byte0 == 0xEF, rd ∈ {x1, x5} — the ABI link registers,
      checked as ``(byte1 & 0x0D) == 0``): the scrambled J-type 21-bit
      offset becomes an absolute half-address stored byte-reversed
      (high nibble in byte1, middle in byte2, low in byte3), which
      lines up the compressible constant bytes.
    - **AUIPC pair** (opcode 0x17, rd ∉ {x0, x2}, next word's rs1
      field == rd and its lowest two bits == 3 — i.e. the follower is
      a 32-bit instruction, so the packed form re-triggers on decode):
      the pair collapses to ``inst2_low20 << 12 | 0x117`` (an x2-rd
      marker) plus the combined 32-bit absolute address big-endian.
    - **AUIPC escape**: a real x2-AUIPC whose bits alias the pair
      marker (``(w1 >> 12) & 3 == 3`` and ``w1 >> 27 ∉ {0, 2}``) is
      spread over both words — follower's top 20 bits into word1, its
      low 12 plus the AUIPC immediate into word2 — with the immediate's
      top five bits duplicated into the rd slot.  The decode trigger
      (rd == follower[19:15], rd ∉ {0, 2}, follower & 3 == 3) is
      precisely "the reconstructed AUIPC would alias the marker
      again", which makes escape and pair mutually exclusive and both
      invertible.

    Scan advances (each pinned against liblzma with phantom-candidate
    probes): a converted JAL consumes 4, a converted pair/escape 8; a
    JAL whose rd fails advances 2; an AUIPC candidate that fails
    before the second word is needed (rd == x0, or rd == x2 without
    the marker-alias bits) advances 4, while one that fails after
    reading it (rs1/low-2-bit mismatch) advances 6 — the follower's
    own first half is skipped as a candidate.  The scan stops 8 bytes
    before the end (even a bare JAL in the last 6 bytes stays
    unconverted).  All arithmetic is mod 2^32; pc = start_offset + i.
    """
    buf = bytearray(data)
    n = len(buf)
    i = 0
    while i + 8 <= n:
        b0 = buf[i]
        if b0 == 0xEF:
            b1 = buf[i + 1]
            if b1 & 0x0D:
                i += 2
                continue
            b2 = buf[i + 2]
            b3 = buf[i + 3]
            pc = ip + i
            if encode:
                off = (((b3 >> 7) << 20) | ((b3 & 0x7F) << 4)
                       | ((b2 >> 5) << 1) | (((b2 >> 4) & 1) << 11)
                       | ((b2 & 0x0F) << 16) | ((b1 >> 4) << 12))
                half = ((pc + off) >> 1) & 0xFFFFF
                buf[i + 1] = (b1 & 0x0F) | ((half >> 12) & 0xF0)
                buf[i + 2] = (half >> 8) & 0xFF
                buf[i + 3] = half & 0xFF
            else:
                half = ((b1 >> 4) << 16) | (b2 << 8) | b3
                off = ((half << 1) - pc) & 0x1FFFFF
                buf[i + 1] = (b1 & 0x0F) | ((off >> 8) & 0xF0)
                buf[i + 2] = ((((off >> 1) & 7) << 5)
                              | (((off >> 11) & 1) << 4)
                              | ((off >> 16) & 0x0F))
                buf[i + 3] = (((off >> 20) & 1) << 7) | ((off >> 4) & 0x7F)
            i += 4
            continue
        if (b0 & 0x7F) != 0x17:
            i += 2
            continue
        w1 = int.from_bytes(buf[i:i + 4], "little")
        rd = (w1 >> 7) & 0x1F
        pc = ip + i
        if encode:
            w2 = int.from_bytes(buf[i + 4:i + 8], "little")
            if (rd not in (0, 2) and ((w2 >> 15) & 0x1F) == rd
                    and (w2 & 3) == 3):
                imm12 = w2 >> 20
                if imm12 >= 0x800:
                    imm12 -= 0x1000
                addr = (pc + (w1 & 0xFFFFF000) + imm12) & 0xFFFFFFFF
                nw1 = ((w2 & 0xFFFFF) << 12) | 0x117
                buf[i:i + 4] = nw1.to_bytes(4, "little")
                buf[i + 4:i + 8] = addr.to_bytes(4, "big")
                i += 8
                continue
            if (rd == 2 and ((w1 >> 12) & 3) == 3
                    and (w1 >> 27) not in (0, 2)):
                hi = w1 >> 12
                nw1 = (w2 & 0xFFFFF000) | ((hi >> 15) << 7) | 0x17
                nw2 = ((w2 & 0xFFF) << 20) | hi
                buf[i:i + 4] = nw1.to_bytes(4, "little")
                buf[i + 4:i + 8] = nw2.to_bytes(4, "little")
                i += 8
                continue
            i += 4 if rd in (0, 2) else 6
        else:
            if rd == 0:
                i += 4
            elif rd == 2:
                if ((w1 >> 12) & 3) == 3 and (w1 >> 27) not in (0, 2):
                    addr = int.from_bytes(buf[i + 4:i + 8], "big")
                    rel = (addr - pc) & 0xFFFFFFFF
                    hi = ((rel + 0x800) >> 12) & 0xFFFFF
                    nw1 = (hi << 12) | ((w1 >> 27) << 7) | 0x17
                    nw2 = ((rel & 0xFFF) << 20) | (w1 >> 12)
                    buf[i:i + 4] = nw1.to_bytes(4, "little")
                    buf[i + 4:i + 8] = nw2.to_bytes(4, "little")
                    i += 8
                else:
                    i += 4
            else:
                w2 = int.from_bytes(buf[i + 4:i + 8], "little")
                if ((w2 >> 15) & 0x1F) == rd and (w2 & 3) == 3:
                    nw1 = ((w2 & 0xFFFFF) << 12) | 0x117
                    nw2 = (w1 & 0xFFFFF000) | ((w2 >> 20) & 0xFFF)
                    buf[i:i + 4] = nw1.to_bytes(4, "little")
                    buf[i + 4:i + 8] = nw2.to_bytes(4, "little")
                    i += 8
                else:
                    i += 6
    return bytes(buf)


#: xz filter ID -> (transform, start-offset alignment).
BRANCH_FILTERS = {
    0x05: (_ppc_filter, 4),
    0x06: (_ia64_filter, 16),
    0x07: (_arm_filter, 4),
    0x08: (_armthumb_filter, 2),
    0x09: (_sparc_filter, 4),
    0x0A: (_arm64_filter, 4),
    0x0B: (_riscv_filter, 2),
}


def branch_bcj_encode(fid: int, data: bytes, start_offset: int = 0
                      ) -> bytes:
    fn, _align = BRANCH_FILTERS[fid]
    return fn(data, start_offset, encode=True)


def branch_bcj_decode(fid: int, data: bytes, start_offset: int = 0
                      ) -> bytes:
    fn, _align = BRANCH_FILTERS[fid]
    return fn(data, start_offset, encode=False)


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
