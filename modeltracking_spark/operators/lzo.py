"""From-spec LZO1X block decompressor (round 15 — the ORC legacy LZO
codec, the last plug-in-class reject in the ORC codec family).

Implemented from the PUBLIC format description — the LZO1X compressed
data format as documented in the Linux kernel's
``Documentation/staging/lzo.rst`` (instruction encoding, state machine,
stream termination) — NOT from any LZO library source.  ORC's LZO
arm (CompressionKind LZO = 3) frames these raw LZO1X blocks with the
standard ORC 3-byte chunk headers; the reference encoder in the wild
is aircompressor's pure-Java LZO, which is what Spark's own ORC writer
ships — every fixture here is Spark-written, so the decoder is
validated against the reference implementation's bytes.

Instruction summary (first-byte dispatch, then a state machine where
``state`` ∈ 0..4 is the number of trailing literals the previous
instruction promised):

- first byte 0..17: initial state 0 instruction
- first byte 18..21: literal run of (b − 17) bytes, state = b − 17
- first byte > 21: literal run of (b − 17) bytes, state = 4
- 0000xxxx, state 0: long literal run (x == 0 extends by 255-runs)
- 0000xxxx, state 1..3: 2-byte match, distance = (x >> 2) + (H << 2) + 1
- 0000xxxx, state 4: 3-byte match, distance = (x >> 2) + (H << 2) + 2049
- 0001xxxx: match with distance 16384 + ((x & 8) << 11) + (LE16 >> 2),
  length 2 + (x & 7) (0 extends); distance == 16384 terminates
- 001xxxxx: match, length 2 + (x & 31) (0 extends),
  distance 1 + (LE16 >> 2)
- 01xxxxxx / 1xxxxxxx: short matches with the distance split across
  the opcode and one following byte
- every match instruction's low 2 bits of its final byte are the next
  ``state`` (0..3 trailing literals copied verbatim)

Malformed input (overrunning lengths, distances before the window
start, missing terminator) raises ``ValueError`` — never an internal
IndexError (house corruption-fuzz contract).
"""

from __future__ import annotations


def lzo1x_decompress(src: bytes, max_out: int | None = None) -> bytes:
    """Decompress one raw LZO1X block (no lzop container, no checksums
    — the ORC/aircompressor block shape).  ``max_out`` bounds the
    output (ORC chunks are at most the stripe's compression block
    size) so corrupt lengths cannot balloon memory."""
    n = len(src)
    if n < 3:
        raise ValueError("LZO1X block too short")
    out = bytearray()
    cap = max_out if max_out is not None else 1 << 26

    def need(i, k=1):
        if i + k > n:
            raise ValueError("truncated LZO1X stream")

    def take_len(i, base):
        """255-run length extension: zero bytes add 255 each, the
        terminating nonzero byte adds itself; returns (length, i)."""
        ln = 0
        while True:
            need(i)
            b = src[i]
            i += 1
            if b == 0:
                ln += 255
                if ln > cap:
                    raise ValueError("LZO1X length run exceeds block")
            else:
                return ln + base + b, i

    def copy_match(dist, length):
        pos = len(out) - dist
        if pos < 0:
            raise ValueError(
                f"LZO1X match distance {dist} before window start")
        if len(out) + length > cap:
            raise ValueError("LZO1X output exceeds declared size")
        # overlapping copies are byte-serial by design (RLE-style)
        for _ in range(length):
            out.append(out[pos])
            pos += 1

    def copy_lit(i, length):
        need(i, length)
        if len(out) + length > cap:
            raise ValueError("LZO1X output exceeds declared size")
        out.extend(src[i:i + length])
        return i + length

    i = 0
    state = 0
    b0 = src[0]
    if b0 > 17:
        i = 1
        ln = b0 - 17
        i = copy_lit(i, ln)
        state = 4 if ln >= 4 else ln

    while True:
        need(i)
        inst = src[i]
        i += 1
        if inst < 16:
            if state == 0:
                # long literal run
                if inst == 0:
                    ln, i = take_len(i, 15 + 3)
                else:
                    ln = inst + 3
                i = copy_lit(i, ln)
                state = 4
                continue
            need(i)
            h = src[i]
            i += 1
            if state < 4:
                # 2-byte match, near distance
                copy_match((inst >> 2) + (h << 2) + 1, 2)
            else:
                # 3-byte match, mid distance
                copy_match((inst >> 2) + (h << 2) + 2049, 3)
            state = inst & 3
        elif inst < 32:
            if (inst & 7) == 0:
                ln, i = take_len(i, 7 + 2)
            else:
                ln = (inst & 7) + 2
            need(i, 2)
            d = src[i] | (src[i + 1] << 8)
            i += 2
            dist = 16384 + ((inst & 8) << 11) + (d >> 2)
            if dist == 16384:
                # end-of-stream marker (the 0x11 0x00 0x00 tail)
                if i != n:
                    raise ValueError(
                        f"{n - i} trailing bytes after LZO1X "
                        "terminator")
                return bytes(out)
            copy_match(dist, ln)
            state = d & 3
        elif inst < 64:
            if (inst & 31) == 0:
                ln, i = take_len(i, 31 + 2)
            else:
                ln = (inst & 31) + 2
            need(i, 2)
            d = src[i] | (src[i + 1] << 8)
            i += 2
            copy_match(1 + (d >> 2), ln)
            state = d & 3
        else:
            if inst < 128:
                ln = 3 + ((inst >> 5) & 1)
            else:
                ln = 5 + ((inst >> 5) & 3)
            need(i)
            copy_match(((inst >> 2) & 7) + (src[i] << 3) + 1, ln)
            i += 1
            state = inst & 3
        if state:
            i = copy_lit(i, state)
            # a 1..3-literal tail keeps state semantics for the NEXT
            # 0000xxxx instruction (it stays a match, not a run)
            state = min(state, 3)
