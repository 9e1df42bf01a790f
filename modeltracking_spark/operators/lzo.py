"""From-spec LZO1X block codec (round 15 — the ORC legacy LZO
CompressionKind; the decompressor landed first, the round-15
continuation added :func:`lzo1x_compress`, making the ORC codec
matrix symmetric).

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


def lzo1x_compress(data: bytes) -> bytes:
    """Compress one raw LZO1X block (round-15 continuation — the
    ENCODE direction, making the ORC codec matrix symmetric).

    Emitted instruction subset, all from the same public format
    description the decoder above implements: an initial literal run
    (first-byte forms 18..255, or the state-0 long-run extension),
    M3 matches (``001xxxxx`` + LE16 — distance 1..16384, length >= 4
    with 255-run extensions, the next 0..3 literals in the low 2 bits
    of the distance word), explicit literal-run instructions for
    >= 4-byte gaps, and the 0x11 0x00 0x00 terminator.  Every decoder
    that implements the spec accepts this subset; matches are found
    with a greedy 4-byte rolling hash over a 16 KiB window, so runs
    and repeated passages genuinely shrink.  Round-trips through
    :func:`lzo1x_decompress`, aircompressor (Spark's JVM ORC reader)
    and pyarrow.orc in the test batteries."""
    n = len(data)
    if n == 0:
        return b"\x11\x00\x00"

    # --- tokenize: (literal span, match) pairs ------------------
    tokens: list = []  # (lit_lo, lit_hi, dist, mlen); dist 0 = none
    table: dict = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = int.from_bytes(data[i:i + 4], "little")
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j <= 16384 and \
                data[j:j + 4] == data[i:i + 4]:
            mlen = 4
            jm = j + 4
            im = i + 4
            while im < n and data[jm] == data[im]:
                mlen += 1
                jm += 1
                im += 1
            tokens.append((lit_start, i, i - j, mlen))
            # index the covered positions so later repeats still hit
            stop = min(i + mlen, n - 3)
            for p in range(i + 1, stop):
                table[int.from_bytes(data[p:p + 4], "little")] = p
            i += mlen
            lit_start = i
        else:
            i += 1
    tokens.append((lit_start, n, 0, 0))  # tail literals (may be empty)

    # --- serialize ------------------------------------------------
    out = bytearray()

    def run_len_ext(rem: int):
        while rem > 255:
            out.append(0)
            rem -= 255
        out.append(rem)

    def emit_literals(lo: int, hi: int, first: bool):
        t = hi - lo
        if t == 0:
            return
        if first:
            if t <= 238:
                out.append(17 + t)
            else:
                out.append(0)
                run_len_ext(t - 18)
        else:
            # only reached at state 0 (the preceding match consumed
            # no trailing literals) with t >= 4
            if t <= 18:
                out.append(t - 3)
            else:
                out.append(0)
                run_len_ext(t - 18)
        out.extend(data[lo:hi])

    first = True
    k = 0
    consumed = 0  # literals of the CURRENT token already emitted
    while k < len(tokens):
        lo, hi, dist, mlen = tokens[k]
        emit_literals(lo + consumed, hi, first and lo == 0)
        first = False
        consumed = 0
        if dist == 0:
            break
        # trailing literals that can ride this match's state bits
        nlo, nhi = tokens[k + 1][0], tokens[k + 1][1]
        s = nhi - nlo
        if s > 3:
            s = 0
        rem = mlen - 2
        if rem <= 31:
            out.append(0x20 | rem)
        else:
            out.append(0x20)
            run_len_ext(rem - 31)
        d = ((dist - 1) << 2) | s
        out.append(d & 0xFF)
        out.append(d >> 8)
        if s:
            out.extend(data[nlo:nlo + s])
            consumed = s
        k += 1
    out += b"\x11\x00\x00"
    return bytes(out)
