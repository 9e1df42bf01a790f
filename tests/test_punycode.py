"""From-spec Punycode (RFC 3492): the RFC's own Section 7.1 sample
strings pinned both directions, cross-validation against Python's
independent built-in punycode codec over random Unicode labels, IDNA
host helpers, and loud malformed rejects."""

import random

import pytest

from modeltracking_spark.operators.punycode import (
    idna_decode_host,
    idna_encode_host,
    punycode_decode,
    punycode_encode,
)

# RFC 3492 Section 7.1 sample strings (subset; case-insensitive digits)
_SAMPLES = {
    "egbpdaj6bu4bxfgehfvwxn": "ليهمابتكلموشعربي؟",          # (A) Arabic
    "ihqwcrb4cv8a8dqg056pqjye": "他们为什么不说中文",          # (B) Chinese
    "Proprostnemluvesky-uyb24dma41a": "Pročprostěnemluvíčesky",  # (D)
    "n8jok5ay5dzabd5bym9f0cm5685rrjetr6pdxa":
        "なぜみんな日本語を話してくれないのか",                    # (F) Japanese
    "TisaohkhngthchnitingVit-kjcr8268qyxafd2f1b9g":
        "TạisaohọkhôngthểchỉnóitiếngViệt",                    # (K) Vietnamese
    "3B-ww4c5e180e575a65lsy2b": "3年B組金八先生",              # (L)
    "MajiKoi5-783gue6qz075azm5e": "MajiでKoiする5秒前",        # (P)
    "-> $1.00 <--": "-> $1.00 <-",                            # (S)
}


@pytest.mark.parametrize("enc,uni", sorted(_SAMPLES.items()))
def test_rfc_section_7_1_samples(enc, uni):
    assert punycode_decode(enc) == uni
    assert punycode_encode(uni).lower() == enc.lower()
    # arbiter: the stdlib codec agrees with the RFC string
    assert uni.encode("punycode").decode().lower() == enc.lower()


def test_cross_validation_vs_stdlib_codec():
    rng = random.Random(3)
    pools = ["abcxyz", "äöüß", "水漢字語", "прив", "😀🎉", "ñé", "-0"]
    for _ in range(400):
        n = rng.randrange(1, 24)
        s = "".join(rng.choice(rng.choice(pools)) for _ in range(n))
        mine = punycode_encode(s)
        std = s.encode("punycode").decode("ascii")
        assert mine.lower() == std.lower(), s
        assert punycode_decode(std) == s
        assert punycode_decode(mine) == s


def test_idna_host_helpers():
    assert idna_encode_host("Bücher.Example.COM") \
        == "xn--bcher-kva.example.com"
    assert idna_decode_host("xn--bcher-kva.example.com") \
        == "bücher.example.com"
    assert idna_encode_host("plain.example.org") == "plain.example.org"
    h = "中文.пример.example"
    assert idna_decode_host(idna_encode_host(h)) == h


def test_rejects():
    with pytest.raises(ValueError, match="digit"):
        punycode_decode("abc-ü")  # non-digit in the encoded tail
    with pytest.raises(ValueError, match="overflow"):
        punycode_decode("abc-999999999")
    with pytest.raises(ValueError, match="truncated"):
        punycode_decode("abc-z")  # continuation digit with no successor
    with pytest.raises(ValueError, match="non-basic"):
        punycode_decode("ü-abc")
    with pytest.raises(ValueError, match="overflow|outside"):
        punycode_decode("99999999z")
