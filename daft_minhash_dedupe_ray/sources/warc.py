"""WARC container source (reference A1: ``daft.read_warc``,
``workload/minhash_dedupe.py:52`` — the Common Crawl front door).

Ray-Data-native shape: ``ray.data.read_binary_files`` supplies one task per
WARC file (Common Crawl segments are ~1 GB each — the natural unit of
parallelism; a 100 TB crawl is ~100k files and the streaming executor
pipelines read -> parse -> extract with backpressure), and the parser is a
stateless ``map_batches`` stage over the file bytes.  Gzip members are
handled transparently (Common Crawl ``.warc.gz`` concatenates one gzip
member per record; ``gzip.decompress`` consumes multi-member streams).

Record layout parsed (ISO 28500): ``WARC/<ver>CRLF`` header lines until a
blank line, ``Content-Length`` governs the body span, records separated by
CRLFCRLF.  Exposed columns mirror the reference's reader:

    warc_record_id : string  (``WARC-Record-ID`` header, <urn:uuid:...>)
    warc_type      : string  (``WARC-Type``: response / request / metadata ...)
    payload_type   : string  (``WARC-Identified-Payload-Type``, '' if absent)
    content_type   : string  (``Content-Type`` header, '' if absent)
    target_uri     : string  (``WARC-Target-URI``, '' if absent)
    warc_content   : binary  (the raw record body, HTTP headers included)
    path           : string  (source file)

``read_warc(paths)`` -> Dataset of records; compose with
``functions.ingest.preprocess_crawl_text(..., payload_type_col=
"payload_type")`` for the reference's full B1-B8 chain
(``preprocess_common_crawl_warc`` below does exactly that).
"""

from __future__ import annotations

import gzip

import pyarrow as pa

_RECORD_SCHEMA = pa.schema(
    [
        ("warc_record_id", pa.string()),
        ("warc_type", pa.string()),
        ("payload_type", pa.string()),
        ("content_type", pa.string()),
        ("target_uri", pa.string()),
        ("warc_content", pa.binary()),
        ("path", pa.string()),
    ]
)


def parse_warc_bytes(data: bytes, path: str = "") -> pa.Table:
    """One WARC file's bytes -> record table.  Tolerates gzip (single or
    concatenated members), LF-only line endings, and truncated tails (a
    torn final record is dropped, matching lenient crawler readers)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    ids, types, ptypes, ctypes, uris, bodies = [], [], [], [], [], []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        # header block ends at the FIRST blank line of either style: an
        # LF-delimited record whose body is an HTTP response contains
        # CRLFCRLF further in, so "CRLF first, LF as fallback" would
        # mis-delimit the header and swallow the next record
        e_crlf = data.find(b"\r\n\r\n", start)
        e_lf = data.find(b"\n\n", start)
        if e_crlf < 0 and e_lf < 0:
            break
        if e_lf < 0 or (0 <= e_crlf <= e_lf):
            hdr_end, sep = e_crlf, 4
        else:
            hdr_end, sep = e_lf, 2
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].splitlines()[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                    "latin-1", "replace"
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            # no Content-Length: scan to the next record header (lenient)
            nxt = data.find(b"WARC/", hdr_end + sep)
            length = (nxt if nxt >= 0 else n) - (hdr_end + sep)
        body_start = hdr_end + sep
        body_end = body_start + length
        if body_end > n:
            break  # torn tail
        ids.append(headers.get("warc-record-id", ""))
        types.append(headers.get("warc-type", ""))
        ptypes.append(headers.get("warc-identified-payload-type", ""))
        ctypes.append(headers.get("content-type", ""))
        uris.append(headers.get("warc-target-uri", ""))
        bodies.append(data[body_start:body_end])
        pos = body_end
    return pa.table(
        {
            "warc_record_id": pa.array(ids, pa.string()),
            "warc_type": pa.array(types, pa.string()),
            "payload_type": pa.array(ptypes, pa.string()),
            "content_type": pa.array(ctypes, pa.string()),
            "target_uri": pa.array(uris, pa.string()),
            "warc_content": pa.array(bodies, pa.binary()),
            "path": pa.array([path] * len(ids), pa.string()),
        }
    )


def _parse_batch(batch: pa.Table) -> pa.Table:
    tabs = [
        parse_warc_bytes(
            batch["bytes"][i].as_py(), path=str(batch["path"][i].as_py() or "")
        )
        for i in range(len(batch))
    ]
    if not tabs:
        return _RECORD_SCHEMA.empty_table()
    return pa.concat_tables(tabs)


def read_warc(paths, filesystem=None):
    """WARC file paths (or a directory) -> Dataset of WARC records.  One
    read task per file; the parse rides the same task via a fused
    ``map_batches`` (no extra exchange)."""
    import ray.data as rd

    from .io import resolve_filesystem

    if isinstance(paths, str):
        filesystem, paths = resolve_filesystem(paths, filesystem)
    ds = rd.read_binary_files(paths, include_paths=True, filesystem=filesystem)
    return ds.map_batches(_parse_batch, batch_format="pyarrow")


def preprocess_common_crawl_warc(
    paths,
    limit: int | None = None,
    index_col: str = "block_id",
    content_col: str = "block_text",
    filesystem=None,
):
    """The reference's ``preprocess_common_crawl_html`` end to end
    (``workload/minhash_dedupe.py:49-75``): read WARC -> keep ``text/html``
    identified payloads -> strip HTTP headers -> extract text blocks ->
    explode with ``block_id = record_id + "-" + idx``.  Returns a Dataset of
    ``(warc_record_id, block_id, block_idx, block_text)`` renamed to the
    requested index/content columns."""
    from ..functions.ingest import preprocess_crawl_text

    ds = read_warc(paths, filesystem=filesystem)
    if limit is not None:
        ds = ds.limit(limit)
    out = preprocess_crawl_text(
        ds,
        record_col="warc_record_id",
        payload_col="warc_content",
        payload_type_col="payload_type",
        strip_headers=True,
    )
    if index_col != "block_id" or content_col != "block_text":
        out = out.map_batches(
            lambda b: b.rename_columns(
                [
                    {"block_id": index_col, "block_text": content_col}.get(c, c)
                    for c in b.column_names
                ]
            ),
            batch_format="pyarrow",
        )
    return out
