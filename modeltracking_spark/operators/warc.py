"""WARC 1.0 container reader/writer — the Common Crawl interchange
format (ISO 28500 / the public warc-specifications: a WARC file is a
sequence of records, each ``WARC/1.0`` + CRLF header block +
Content-Length-framed body + CRLF CRLF; crawl archives compress ONE
record per gzip member so readers can split on member boundaries
without decoding the world).

The reader walks gzip members with the from-spec RFC 1952 decoder
(``operators/inflate.py:gzip_members``), parses each record's header
block (case-insensitive field names, exact Content-Length framing,
mandatory-field checks), and yields typed rows.  The writer builds
spec-shaped records for fixtures — but fixture COMPRESSION is stdlib
``gzip`` (an independent encoder), so every roundtrip cross-validates
the two gzip implementations member-by-member on top of the WARC
framing itself.

Malformed records raise descriptive ``ValueError`` (the codec-tier
discipline): bad version line, missing mandatory fields, short bodies,
missing record terminators.
"""

from __future__ import annotations

from modeltracking_spark.operators.kernel import widen_for_kernel

_CRLF = b"\r\n"


def warc_record_bytes(
    record_type: str,
    record_id: str,
    date: str,
    body: bytes,
    target_uri: str | None = None,
    content_type: str = "text/plain",
    extra: dict[str, str] | None = None,
) -> bytes:
    """One uncompressed WARC/1.0 record (header block + body + the
    two-CRLF record terminator), fields per the spec's §5 required
    set: WARC-Type, WARC-Record-ID, WARC-Date, Content-Length."""
    fields = [
        ("WARC-Type", record_type),
        ("WARC-Record-ID", f"<urn:uuid:{record_id}>"),
        ("WARC-Date", date),
    ]
    if target_uri is not None:
        fields.append(("WARC-Target-URI", target_uri))
    fields.append(("Content-Type", content_type))
    for k, v in (extra or {}).items():
        fields.append((k, v))
    fields.append(("Content-Length", str(len(body))))
    head = b"WARC/1.0" + _CRLF + b"".join(
        f"{k}: {v}".encode("utf-8") + _CRLF for k, v in fields
    ) + _CRLF
    return head + body + _CRLF + _CRLF


def parse_warc_record(data: bytes, start: int = 0) -> tuple[dict, int]:
    """Parse one record at ``start`` -> (record dict, end offset).
    The dict carries lower-cased header fields plus ``body``."""
    if data[start:start + 8] != b"WARC/1.0":
        raise ValueError("bad WARC version line")
    head_end = data.find(_CRLF + _CRLF, start)
    if head_end < 0:
        raise ValueError("unterminated WARC header block")
    headers: dict[str, str] = {}
    for line in data[start:head_end].split(_CRLF)[1:]:
        if b":" not in line:
            raise ValueError("malformed WARC header line")
        k, v = line.split(b":", 1)
        headers[k.decode("utf-8").strip().lower()] = (
            v.decode("utf-8").strip()
        )
    for req in ("warc-type", "warc-record-id", "warc-date",
                "content-length"):
        if req not in headers:
            raise ValueError(f"WARC record missing {req}")
    n = int(headers["content-length"])
    if n < 0:
        raise ValueError("negative WARC Content-Length")
    body_start = head_end + 4
    if body_start + n + 4 > len(data):
        raise ValueError("WARC body shorter than Content-Length")
    body = data[body_start:body_start + n]
    if data[body_start + n:body_start + n + 4] != _CRLF + _CRLF:
        raise ValueError("missing WARC record terminator")
    rec = dict(headers)
    rec["body"] = body
    return rec, body_start + n + 4


def parse_warc(data: bytes) -> list[dict]:
    """All records of an UNCOMPRESSED WARC byte string, in order."""
    out = []
    pos = 0
    while pos < len(data):
        rec, pos = parse_warc_record(data, pos)
        out.append(rec)
    return out


def parse_warc_gz(data: bytes) -> list[dict]:
    """Records of a record-per-gzip-member WARC (the crawl-archive
    layout): each member must decode to WHOLE records (one or more);
    member boundaries come from the from-spec RFC 1952 walk."""
    from modeltracking_spark.operators.inflate import gzip_members

    out = []
    for payload, _s, _e in gzip_members(data):
        out.extend(parse_warc(payload))
    return out


def warc_scan_stats(df, payload_col: str = "payload",
                    id_col: str = "doc_id"):
    """Per-row WARC.gz scan kernel: each row's payload (a mini crawl
    archive: a warcinfo record + response records, one gzip member
    per record, stdlib-gzip-compressed) is split and parsed by the
    from-spec reader inside ONE Arrow mapInPandas kernel. Output:
    (id, n_records, n_members, response_len, body_md5, uri_ok) — the
    oracle replays the body formula md5 and lengths in SQL, so the
    whole member-split + header-parse + Content-Length framing loop
    is attested row by row. Narrow map (widened when under-split)."""
    import hashlib

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from modeltracking_spark.operators.inflate import gzip_members

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_records", LongType()),
            StructField("n_members", LongType()),
            StructField("response_len", LongType()),
            StructField("body_md5", StringType()),
            StructField("uri_ok", BooleanType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, nrecs, nmems, rlens, md5s, uoks = [], [], [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                n_members = sum(1 for _ in gzip_members(raw))
                recs = parse_warc_gz(raw)
                responses = [
                    r for r in recs if r["warc-type"] == "response"
                ]
                if len(responses) != 1:
                    raise ValueError(
                        f"fixture doc {did}: {len(responses)} responses"
                    )
                resp = responses[0]
                ids.append(int(did))
                nrecs.append(len(recs))
                nmems.append(n_members)
                rlens.append(len(resp["body"]))
                md5s.append(hashlib.md5(resp["body"]).hexdigest())
                uoks.append(
                    resp.get("warc-target-uri")
                    == f"http://corpus.example/doc/{int(did)}"
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_records": nrecs,
                    "n_members": nmems,
                    "response_len": rlens,
                    "body_md5": md5s,
                    "uri_ok": uoks,
                }
            )

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        kernel, schema
    )


def build_warc_gz_fixture(doc_id: int, text: str) -> bytes:
    """Deterministic mini crawl archive for one doc: a warcinfo record,
    a request record, and THE response record carrying the text — one
    stdlib-gzip member each (the independent encoder side of the
    roundtrip; member splitting is exercised by construction)."""
    import gzip as _gzip

    date = "2024-01-01T00:00:00Z"
    info = warc_record_bytes(
        "warcinfo", f"info-{doc_id}", date,
        b"software: modeltracking-spark fixture\r\n",
        content_type="application/warc-fields",
    )
    req = warc_record_bytes(
        "request", f"req-{doc_id}", date,
        f"GET /doc/{doc_id} HTTP/1.1\r\n".encode(),
        target_uri=f"http://corpus.example/doc/{doc_id}",
        content_type="application/http;msgtype=request",
    )
    resp = warc_record_bytes(
        "response", f"resp-{doc_id}", date,
        text.encode("utf-8"),
        target_uri=f"http://corpus.example/doc/{doc_id}",
    )
    return b"".join(
        _gzip.compress(r, 6, mtime=0) for r in (info, req, resp)
    )
