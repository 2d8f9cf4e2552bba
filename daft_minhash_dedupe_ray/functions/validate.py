"""Per-row invariant verification between two image+caption tables.

The north-star brief pins a per-row invariant for any payload-touching
pipeline: decoded pixels must match the source at PSNR >= 40 dB (allclose
for lossless codecs) and captions must be byte-equal.  The reference repo
checks its invariants driver-side per run; here the check is itself a
distributed operator — a keyed cogroup exchange (``stages/util
.raw_cogroup_exchange``) that decodes both sides partition-locally and
emits one verdict row per id, so a 10^12-row audit streams like any other
stage and never lands on the driver.

Parity design: the per-row error is reported as the EXACT integer
sum-of-squared-differences ``sse`` (int64) plus ``n_px``, and the
``psnr_ok`` verdict is an exact integer cross-multiplication —
``psnr >= T  <=>  255^2 * n_px >= sse * 10^(T/10)`` — computed on integers
whenever ``10^(T/10)`` is integral (T=40 -> 10000), so a SQL oracle decoding
the same blobs reproduces every verdict bit-for-bit (CLAUDE.md: prefer
integer cross-mult over float compare in any kernel an oracle must
reproduce).  The float ``psnr_db`` column is informational only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.util import raw_cogroup_exchange
from .multimodal import _SUPPORTED, decode_image

REPORT_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("n_px", pa.int64()),
        ("sse", pa.int64()),
        ("caption_equal", pa.bool_()),
        ("psnr_ok", pa.bool_()),
        ("psnr_db", pa.float64()),
    ]
)


def _decode_or_none(blob, fmt):
    if fmt not in _SUPPORTED or blob is None:
        return None
    try:
        return decode_image(blob, fmt)
    except Exception:
        return None


def _verdict_partition(
    left: pa.Table | None,
    right: pa.Table | None,
    threshold_db: float,
    how: str = "outer",
) -> pa.Table | None:
    """One cogrouped partition: left = reference rows, right = output rows.
    With ``how="outer"`` ids missing on either side are reported as failing
    rows (sse = -1), never silently dropped; ``how="inner"`` audits only the
    matched ids (the survivor-audit mode: a dedupe legitimately drops
    rows)."""
    # exact-integer threshold when 10^(T/10) is integral (e.g. T=40 -> 10000)
    thr = 10.0 ** (threshold_db / 10.0)
    thr_int = int(round(thr)) if abs(thr - round(thr)) < 1e-9 else None

    def _index(t):
        if t is None:
            return {}, set(), {}
        pos: dict = {}
        for j, v in enumerate(t["image_id"].to_pylist()):
            pos.setdefault(v, []).append(j)
        idx = {v: js[0] for v, js in pos.items()}
        dup = {v for v, js in pos.items() if len(js) > 1}
        return idx, dup, pos

    li, dup_l, pos_l = _index(left)
    ri, dup_r, _ = _index(right)
    ids = sorted(set(li) & set(ri) if how == "inner" else set(li) | set(ri))
    if not ids:
        return None
    n_px = np.zeros(len(ids), np.int64)
    sse = np.full(len(ids), -1, np.int64)
    cap_eq = np.zeros(len(ids), bool)
    ok = np.zeros(len(ids), bool)

    def _cols(t):
        if t is None:
            return [], [], []
        return (
            t["bytes"].to_pylist(),
            t["fmt"].to_pylist(),
            t["caption"].to_pylist(),
        )

    lb, lf, lc = _cols(left)
    rb, rf, rc = _cols(right)
    if how == "inner" and dup_l:
        # survivor audits: an input-side re-send of the same id with
        # byte-identical payload+caption is an input property, not a
        # pipeline defect — audit it against one occurrence.  Divergent
        # content under one id stays failing (ambiguous reference), and
        # OUTPUT-side duplicates always fail (duplicate-row inflation).
        j0 = {v: pos_l[v][0] for v in dup_l}
        dup_l = {
            v
            for v in dup_l
            if any(
                (lb[j], lf[j], lc[j]) != (lb[j0[v]], lf[j0[v]], lc[j0[v]])
                for j in pos_l[v][1:]
            )
        }
    # an id appearing twice on a side is otherwise itself a corruption
    # (duplicate-row inflation) — reported as failing
    dup_ids = dup_l | dup_r
    for k, i in enumerate(ids):
        if i in dup_ids or i not in li or i not in ri:
            continue  # duplicated / missing: sse stays -1, verdicts False
        a, b = li[i], ri[i]
        cap_eq[k] = lc[a] == rc[b]
        pa_, pb_ = _decode_or_none(lb[a], lf[a]), _decode_or_none(rb[b], rf[b])
        if pa_ is None and pb_ is None:
            # opaque payloads (unsupported codec): exact-bytes fallback
            if lb[a] == rb[b]:
                sse[k], ok[k] = 0, True
            continue
        if pa_ is None or pb_ is None or pa_.shape != pb_.shape:
            continue
        d = pa_.astype(np.int64).ravel() - pb_.astype(np.int64).ravel()
        n_px[k] = d.size
        sse[k] = int(np.dot(d, d))
        if sse[k] == 0:
            ok[k] = True
        elif thr_int is not None:
            ok[k] = 65025 * n_px[k] >= sse[k] * thr_int
        else:
            ok[k] = 65025.0 * n_px[k] >= sse[k] * thr
    with np.errstate(divide="ignore"):
        db = 10.0 * np.log10(65025.0 * np.maximum(n_px, 1) / np.maximum(sse, 1))
    db = np.where(sse > 0, db, np.nan)  # lossless / failed rows: no finite PSNR
    return pa.table(
        {
            "image_id": pa.array(ids),
            "n_px": pa.array(n_px),
            "sse": pa.array(sse),
            "caption_equal": pa.array(cap_eq),
            "psnr_ok": pa.array(ok),
            "psnr_db": pa.array(db, pa.float64()),
        }
    )


def verify_row_invariants(
    ref_ds,
    out_ds,
    id_col: str = "image_id",
    threshold_db: float = 40.0,
    num_partitions: int = 32,
    how: str = "outer",
    caption_col: str = "caption",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
):
    """Distributed per-row invariant audit of ``out_ds`` against ``ref_ds``.

    Returns a Dataset with one row per audited id:
    ``(image_id, n_px, sse, caption_equal, psnr_ok, psnr_db)``.  ``sse`` is
    the exact integer sum of squared pixel differences (-1 when the row is
    missing on a side, duplicated within a side, fails decode, or changed
    shape — all of which also fail ``psnr_ok``).  ``how="outer"`` (default)
    reports unmatched ids as failures; ``how="inner"`` audits only matched
    ids (survivor audits, where a dedupe legitimately dropped rows).  The
    content column is ``caption_col`` (pass the table's actual text column —
    auditing a column the table doesn't have passes vacuously); tables
    without a ``bytes_col`` payload degrade to content-equality-only.  At
    scale, size ``num_partitions`` so a partition's decoded payloads fit
    one worker's heap (~rows/1M for 32px thumbs).
    """
    import functools as _ft

    assert how in ("outer", "inner")
    _s = ref_ds.schema()
    id_type = _s.types[_s.names.index(id_col)]
    schema = pa.schema([("image_id", id_type)] + list(REPORT_SCHEMA)[1:])
    rename = {id_col: "image_id", bytes_col: "bytes", fmt_col: "fmt", caption_col: "caption"}

    def _null_col(b: pa.Table, name: str, typ) -> pa.Table:
        return b.append_column(name, pa.nulls(len(b), typ))

    def _proj(ds):
        have = ds.schema().names
        cols = [c for c in (id_col, bytes_col, fmt_col, caption_col) if c in have]
        ds = ds.select_columns(cols)

        def _norm(b: pa.Table) -> pa.Table:
            b = b.rename_columns([rename.get(c, c) for c in b.column_names])
            for name, typ in (
                ("bytes", pa.binary()),
                ("fmt", pa.string()),
                ("caption", pa.string()),
            ):
                if name not in b.column_names:
                    b = _null_col(b, name, typ)
            return b

        return ds.map_batches(_norm, batch_format="pyarrow")

    fn = _ft.partial(_verdict_partition, threshold_db=threshold_db, how=how)
    return raw_cogroup_exchange(
        _proj(ref_ds),
        _proj(out_ds),
        ["image_id"],
        ["image_id"],
        fn,
        schema,
        num_partitions,
    )


def row_invariant_report(rep_ds, sample_failures: int = 10) -> dict:
    """Aggregate a :func:`verify_row_invariants` dataset into the run-level
    summary the CLI prints (mirrors the reference's per-run ``[VALIDATION]``
    habit).  Streams: per-batch partial counts, O(sample) driver state."""
    totals = {"rows": 0, "psnr_fail": 0, "caption_fail": 0}
    failed: list[str] = []
    for b in rep_ds.iter_batches(batch_format="pyarrow"):
        bad = ~(
            b["psnr_ok"].to_numpy(zero_copy_only=False)
            & b["caption_equal"].to_numpy(zero_copy_only=False)
        )
        totals["rows"] += len(b)
        totals["psnr_fail"] += int((~b["psnr_ok"].to_numpy(zero_copy_only=False)).sum())
        totals["caption_fail"] += int(
            (~b["caption_equal"].to_numpy(zero_copy_only=False)).sum()
        )
        if bad.any() and len(failed) < sample_failures:
            ids = b["image_id"].to_pylist()
            failed.extend(i for i, m in zip(ids, bad) if m)
    totals["passed"] = totals["psnr_fail"] == 0 and totals["caption_fail"] == 0
    totals["failed_sample"] = failed[:sample_failures]
    return totals
