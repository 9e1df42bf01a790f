"""From-spec Punycode (RFC 3492) + IDNA hostname normalization — the
internationalized-domain layer a web-curation URL canonicalizer needs
(``xn--`` labels are how every IDN reaches a crawl; comparing or
deduplicating URLs without decoding them misses homograph families).

RFC 3492 specifies the full algorithm (generalized variable-length
integers with bias adaptation, basic-codepoint segregation, the
bootstring parameters base=36 tmin=1 tmax=26 skew=38 damp=700) and
ships its OWN sample strings (Section 7.1: Arabic, Chinese, Czech,
Hebrew, Japanese, ...). Both directions are implemented from the
spec; tests pin the RFC samples AND cross-validate against Python's
built-in ``punycode`` codec — an independent implementation — over
random Unicode labels.

Malformed labels raise descriptive ``ValueError`` (invalid digits,
overflow per the RFC's guard, out-of-range code points).
"""

from __future__ import annotations

_BASE = 36
_TMIN = 1
_TMAX = 26
_SKEW = 38
_DAMP = 700
_INITIAL_BIAS = 72
_INITIAL_N = 128
_MAXINT = (1 << 32) - 1


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + (((_BASE - _TMIN + 1) * delta) // (delta + _SKEW))


def _digit_char(d: int) -> str:
    return chr(d + 22 + 75 * (d < 26))  # 0..25 -> a..z, 26..35 -> 0..9


def _char_digit(c: str) -> int:
    cp = ord(c)
    if 0x30 <= cp <= 0x39:
        return cp - 22
    if 0x41 <= cp <= 0x5A:
        return cp - 0x41
    if 0x61 <= cp <= 0x7A:
        return cp - 0x61
    raise ValueError(f"invalid punycode digit {c!r}")


def punycode_encode(label: str) -> str:
    """Unicode label -> punycode (RFC 3492 6.3), WITHOUT the xn--
    prefix."""
    basic = [c for c in label if ord(c) < 128]
    out = list(basic)
    h = b = len(basic)
    if b:
        out.append("-")
    n = _INITIAL_N
    delta = 0
    bias = _INITIAL_BIAS
    first = True
    cps = [ord(c) for c in label]
    while h < len(cps):
        m = min(cp for cp in cps if cp >= n)
        if (m - n) * (h + 1) > _MAXINT - delta:
            raise ValueError("punycode overflow")
        delta += (m - n) * (h + 1)
        n = m
        for cp in cps:
            if cp < n:
                delta += 1
                if delta > _MAXINT:
                    raise ValueError("punycode overflow")
            if cp == n:
                q = delta
                k = _BASE
                while True:
                    t = (_TMIN if k <= bias
                         else _TMAX if k >= bias + _TMAX else k - bias)
                    if q < t:
                        break
                    out.append(_digit_char(t + (q - t) % (_BASE - t)))
                    q = (q - t) // (_BASE - t)
                    k += _BASE
                out.append(_digit_char(q))
                bias = _adapt(delta, h + 1, first)
                first = False
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def punycode_decode(text: str) -> str:
    """Punycode (no xn-- prefix) -> Unicode label (RFC 3492 6.2)."""
    pos = text.rfind("-")
    if pos > 0:
        output = [ord(c) for c in text[:pos]]
        if any(cp >= 128 for cp in output):
            raise ValueError("non-basic code point before delimiter")
        rest = text[pos + 1:]
    else:
        output = []
        rest = text[1:] if pos == 0 else text
    n = _INITIAL_N
    i = 0
    bias = _INITIAL_BIAS
    first = True
    j = 0
    while j < len(rest):
        oldi = i
        w = 1
        k = _BASE
        while True:
            if j >= len(rest):
                raise ValueError("truncated punycode variable integer")
            digit = _char_digit(rest[j])
            j += 1
            if digit > (_MAXINT - i) // w:
                raise ValueError("punycode overflow")
            i += digit * w
            t = (_TMIN if k <= bias
                 else _TMAX if k >= bias + _TMAX else k - bias)
            if digit < t:
                break
            if w > _MAXINT // (_BASE - t):
                raise ValueError("punycode overflow")
            w *= _BASE - t
            k += _BASE
        bias = _adapt(i - oldi, len(output) + 1, first)
        first = False
        if i // (len(output) + 1) > _MAXINT - n:
            raise ValueError("punycode overflow")
        n += i // (len(output) + 1)
        i %= len(output) + 1
        if n > 0x10FFFF or 0xD800 <= n <= 0xDFFF:
            raise ValueError("punycode decodes outside Unicode")
        output.insert(i, n)
        i += 1
    return "".join(chr(cp) for cp in output)


def idna_decode_host(host: str) -> str:
    """Hostname with xn-- labels -> display form: each ACE label
    punycode-decoded, others lowercased — the comparison form a URL
    deduplicator keys on."""
    labels = []
    for label in host.split("."):
        low = label.lower()
        if low.startswith("xn--"):
            labels.append(punycode_decode(low[4:]))
        else:
            labels.append(low)
    return ".".join(labels)


def idna_encode_host(host: str) -> str:
    """Hostname (possibly Unicode labels) -> ACE form with xn--
    prefixes on non-ASCII labels."""
    labels = []
    for label in host.split("."):
        low = label.lower()
        if all(ord(c) < 128 for c in low):
            labels.append(low)
        else:
            labels.append("xn--" + punycode_encode(low))
    return ".".join(labels)
