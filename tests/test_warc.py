"""WARC container source (reference A1 — the last coverage gap).

Goldens mirror the reference reader's column semantics
(workload/minhash_dedupe.py:49-75): WARC-Record-ID, WARC-Type,
WARC-Identified-Payload-Type filtering, HTTP-header strip, block explode.
"""

import gzip

import pyarrow as pa

from daft_minhash_dedupe_ray.sources.warc import (
    parse_warc_bytes,
    preprocess_common_crawl_warc,
    read_warc,
)


def _record(rid: str, body: bytes, warc_type: str = "response", ptype: str | None = "text/html"):
    hdrs = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
        b"WARC-Target-URI: http://example.com/" + rid.encode(),
    ]
    if ptype is not None:
        hdrs.append(b"WARC-Identified-Payload-Type: " + ptype.encode())
    hdrs.append(b"Content-Length: " + str(len(body)).encode())
    return b"\r\n".join(hdrs) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _html_body(text: str) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><body><p>" + text.encode() + b"</p></body></html>"
    )


def test_parse_warc_bytes_fields_and_gzip():
    raw = (
        _record("aaa", _html_body("hello one"))
        + _record("bbb", b"GET / HTTP/1.1\r\n\r\n", warc_type="request", ptype=None)
        + _record("ccc", _html_body("hello three"))
    )
    for blob in (raw, gzip.compress(raw)):
        t = parse_warc_bytes(blob, path="seg-0.warc")
        assert t.num_rows == 3
        assert t["warc_record_id"].to_pylist() == [
            "<urn:uuid:aaa>",
            "<urn:uuid:bbb>",
            "<urn:uuid:ccc>",
        ]
        assert t["warc_type"].to_pylist() == ["response", "request", "response"]
        assert t["payload_type"].to_pylist() == ["text/html", "", "text/html"]
        assert t["target_uri"].to_pylist()[0] == "http://example.com/aaa"
        assert t["warc_content"][0].as_py() == _html_body("hello one")
        assert t["path"].to_pylist() == ["seg-0.warc"] * 3

    # per-record gzip members (the Common Crawl layout)
    members = b"".join(
        gzip.compress(_record(r, _html_body(f"text {r}"))) for r in ("x", "y")
    )
    t = parse_warc_bytes(members)
    assert t.num_rows == 2 and t["warc_record_id"].to_pylist() == [
        "<urn:uuid:x>",
        "<urn:uuid:y>",
    ]


def test_parse_warc_torn_tail_and_lf_only():
    raw = _record("ok", _html_body("fine"))
    torn = raw + b"WARC/1.0\r\nWARC-Record-ID: <urn:uuid:torn>\r\nContent-Length: 9999\r\n\r\nshort"
    t = parse_warc_bytes(torn)
    assert t["warc_record_id"].to_pylist() == ["<urn:uuid:ok>"]

    # LF-only record built natively (so Content-Length matches its body)
    body = b"<html><body><p>fine</p></body></html>"
    lf = (
        b"WARC/1.0\nWARC-Type: response\nWARC-Record-ID: <urn:uuid:lf>\n"
        + b"Content-Length: %d\n\n" % len(body)
        + body
        + b"\n\n"
    )
    t2 = parse_warc_bytes(lf)
    assert t2.num_rows == 1 and t2["warc_record_id"].to_pylist() == ["<urn:uuid:lf>"]
    assert t2["warc_content"][0].as_py() == body


def test_read_warc_end_to_end(ray_session, tmp_path):
    f1 = tmp_path / "seg-0.warc.gz"
    f1.write_bytes(
        gzip.compress(
            _record("r1", _html_body("alpha block"))
            + _record("r2", b"not html", ptype="application/pdf")
        )
    )
    f2 = tmp_path / "seg-1.warc"
    f2.write_bytes(_record("r3", _html_body("beta block")))

    ds = read_warc([str(f1), str(f2)])
    assert ds.count() == 3

    out = preprocess_common_crawl_warc([str(f1), str(f2)]).to_pandas()
    # only the two text/html records survive; one <p> block each
    assert sorted(out["block_text"]) == ["alpha block", "beta block"]
    assert sorted(out["block_id"]) == ["<urn:uuid:r1>-0", "<urn:uuid:r3>-0"]
    assert set(out.columns) == {"warc_record_id", "block_id", "block_idx", "block_text"}

    # reference arg surface: limit + renamed index/content columns
    out2 = preprocess_common_crawl_warc(
        [str(f2)], limit=10, index_col="doc_id", content_col="text"
    ).to_pandas()
    assert list(out2["doc_id"]) == ["<urn:uuid:r3>-0"]
    assert list(out2["text"]) == ["beta block"]


def test_parse_warc_lf_headers_with_crlf_body():
    """Review finding r5: LF-delimited WARC headers whose BODY is a normal
    HTTP response (contains CRLFCRLF) must not mis-delimit the header at
    the body's CRLFCRLF — the earlier blank line wins."""
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><body><p>one</p></body></html>"
    )

    def lf_rec(rid: str) -> bytes:
        return (
            b"WARC/1.0\nWARC-Type: response\n"
            + b"WARC-Record-ID: <urn:uuid:%s>\n" % rid.encode()
            + b"WARC-Identified-Payload-Type: text/html\n"
            + b"Content-Length: %d\n\n" % len(body)
            + body
            + b"\n\n"
        )

    t = parse_warc_bytes(lf_rec("a") + lf_rec("b"))
    assert t["warc_record_id"].to_pylist() == ["<urn:uuid:a>", "<urn:uuid:b>"]
    assert t["warc_content"].to_pylist() == [body, body]


def test_preprocess_survives_invalid_utf8(ray_session, tmp_path):
    """Review finding r5: real crawl payloads carry non-UTF-8 pages; the
    chain must lossy-decode (U+FFFD) instead of dying on the cast."""
    latin = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><body><p>caf\xe9 latin</p></body></html>"  # 0xe9: invalid UTF-8
    )
    f = tmp_path / "seg.warc"
    f.write_bytes(_record("bad", latin) + _record("good", _html_body("clean text")))
    out = preprocess_common_crawl_warc([str(f)]).to_pandas()
    texts = sorted(out["block_text"])
    assert "clean text" in texts
    assert any("caf� latin" == t for t in texts)  # replacement char, row kept
