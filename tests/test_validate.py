"""Per-row invariant verifier (functions/validate.py): distributed PSNR +
caption-equality audit, the RequantizeStage lossy proxy, and bit-exact
DuckDB oracle parity for the registered query."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import daft_minhash_dedupe_ray.sql_oracle as so
from daft_minhash_dedupe_ray.functions.multimodal import RequantizeStage
from daft_minhash_dedupe_ray.functions.validate import (
    row_invariant_report,
    verify_row_invariants,
)
from daft_minhash_dedupe_ray.synth import cached_table_path, ppm_decode, psnr


def _ds(path):
    import ray.data as rd

    return rd.read_parquet(path)


def test_requantize_psnr_above_40db(ray_session):
    """bits=2 masking keeps every image above the 40 dB bar but below
    lossless — the fixture actually exercises the lossy branch."""
    path = cached_table_path(60, seed=7, with_images=True)
    lossy = _ds(path).map_batches(
        RequantizeStage(bits=2), batch_size=32, batch_format="pyarrow"
    )
    rep = verify_row_invariants(_ds(path), lossy, num_partitions=4).to_pandas()
    assert len(rep) == 60
    assert rep["psnr_ok"].all() and rep["caption_equal"].all()
    assert (rep["sse"] > 0).any()  # genuinely lossy
    # float psnr column agrees with the exact-integer verdict where finite
    fin = rep[rep["sse"] > 0]
    assert (fin["psnr_db"] >= 40.0).all()


def test_identical_tables_are_lossless(ray_session):
    path = cached_table_path(40, seed=9, with_images=True)
    rep = verify_row_invariants(_ds(path), _ds(path), num_partitions=4).to_pandas()
    assert (rep["sse"] == 0).all() and rep["psnr_ok"].all()
    assert rep["psnr_db"].isna().all()  # lossless rows report no finite PSNR


def test_tampered_rows_flagged(ray_session):
    """A zeroed payload and an edited caption must each fail their clause;
    a dropped row must fail both (missing on one side)."""
    import ray.data as rd

    path = cached_table_path(40, seed=11, with_images=True)
    t = pq.read_table(path)
    ids = t["image_id"].to_pylist()
    blobs = t["bytes"].to_pylist()
    caps = t["caption"].to_pylist()
    px = ppm_decode(blobs[0])
    blobs[0] = blobs[0][: len(blobs[0]) - px.size] + b"\x00" * px.size  # wreck pixels
    caps[1] = (caps[1] or "") + " TAMPERED"
    tampered = (
        t.set_column(t.column_names.index("bytes"), "bytes", pa.array(blobs, pa.binary()))
        .set_column(t.column_names.index("caption"), "caption", pa.array(caps))
        .slice(0, len(t) - 1)  # drop the last row entirely
    )
    rep = (
        verify_row_invariants(_ds(path), rd.from_arrow(tampered), num_partitions=4)
        .to_pandas()
        .set_index("image_id")
    )
    assert not rep.loc[ids[0], "psnr_ok"] and rep.loc[ids[0], "sse"] > 0
    assert not rep.loc[ids[1], "caption_equal"] and rep.loc[ids[1], "psnr_ok"]
    assert not rep.loc[ids[-1], "psnr_ok"] and rep.loc[ids[-1], "sse"] == -1
    summary = row_invariant_report(
        verify_row_invariants(_ds(path), rd.from_arrow(tampered), num_partitions=4)
    )
    assert not summary["passed"]
    assert summary["psnr_fail"] == 2 and summary["caption_fail"] >= 2
    assert ids[0] in summary["failed_sample"] or ids[1] in summary["failed_sample"]


def test_inner_mode_audits_survivors_only(ray_session):
    """how='inner' skips ids missing on a side — the dedupe-survivor audit:
    the same dropped-rows fixture that fails outer passes inner."""
    import ray.data as rd

    path = cached_table_path(40, seed=13, with_images=True)
    t = pq.read_table(path)
    survivors = rd.from_arrow(t.slice(0, 25))
    outer = row_invariant_report(
        verify_row_invariants(_ds(path), survivors, num_partitions=4)
    )
    inner = row_invariant_report(
        verify_row_invariants(_ds(path), survivors, num_partitions=4, how="inner")
    )
    assert not outer["passed"] and outer["rows"] == 40
    assert inner["passed"] and inner["rows"] == 25


def test_caption_only_tables_degrade_gracefully(ray_session):
    """No bytes payload: the audit reduces to caption equality (opaque
    payloads compare equal when both absent)."""
    import ray.data as rd

    t = pa.table({"doc_id": ["a", "b"], "caption": ["x", "y"]})
    t2 = pa.table({"doc_id": ["a", "b"], "caption": ["x", "EDITED"]})
    rep = (
        verify_row_invariants(
            rd.from_arrow(t), rd.from_arrow(t2), id_col="doc_id", num_partitions=2
        )
        .to_pandas()
        .set_index("image_id")
    )
    assert rep.loc["a", "psnr_ok"] and rep.loc["a", "caption_equal"]
    assert rep.loc["b", "psnr_ok"] and not rep.loc["b", "caption_equal"]


def test_cli_audit_rows_flag(ray_session, tmp_path, capsys):
    """--audit-rows reads the saved output back and audits it against the
    input; a clean dedupe run passes."""
    import json
    import os

    from daft_minhash_dedupe_ray.cli import main
    from daft_minhash_dedupe_ray.synth import generate_table

    inp = str(tmp_path / "in.parquet")
    pq.write_table(generate_table(300, seed=5, with_images=True), inp)
    out_dir = str(tmp_path / "out")
    rc = main(
        [
            "--input", inp, "--output", out_dir,
            "--num-perm", "64", "--bands", "8", "--rows", "8",
            "--num-actors", "2", "--chunk-size", "100",
            "--num-partitions", "4", "--audit-rows",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    audit = report["row_invariants"]
    assert audit["passed"] and audit["rows"] == report["rows_after"]
    assert os.path.exists(os.path.join(out_dir, "_SUCCESS"))


def test_integer_crossmult_matches_float_psnr():
    """psnr >= 40  <=>  65025*n >= sse*10000, across the boundary."""
    rng = np.random.default_rng(3)
    for _ in range(200):
        n = int(rng.integers(1, 4000))
        sse = int(rng.integers(0, max(1, int(65025 * n / 10000 * 2))))
        if sse == 0:
            continue
        exact = 65025 * n >= sse * 10000
        assert exact == (10.0 * np.log10(65025.0 * n / sse) >= 40.0 - 1e-12)


def test_sql_image_invariants_bit_exact(ray_session):
    """The DuckDB oracle's analytic SSE ((p & 3)^2 summed) must match the
    engine's decode-both-and-diff SSE row for row, verdicts included."""
    path = cached_table_path(120, seed=7, with_images=True)
    lossy = _ds(path).map_batches(
        RequantizeStage(bits=2), batch_size=32, batch_format="pyarrow"
    )
    eng = (
        verify_row_invariants(_ds(path), lossy, num_partitions=4)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    ora = con.sql(so.image_invariants_sql(path, bits=2)).df()
    assert len(eng) == len(ora)
    for col in ("image_id", "n_px", "sse", "caption_equal", "psnr_ok"):
        assert (
            eng[col].to_numpy() == ora[col].to_numpy()
        ).all(), f"column {col} mismatch"


def test_duplicated_ids_flagged(ray_session):
    """An id appearing twice on a side (duplicate-row inflation) fails the
    audit instead of silently auditing whichever copy enumerates last."""
    import ray.data as rd

    t = pa.table({"image_id": ["a", "b"], "caption": ["x", "y"]})
    t_dup = pa.table({"image_id": ["a", "b", "b"], "caption": ["x", "y", "y"]})
    rep = (
        verify_row_invariants(
            rd.from_arrow(t), rd.from_arrow(t_dup), num_partitions=2, how="inner"
        )
        .to_pandas()
        .set_index("image_id")
    )
    assert rep.loc["a", "psnr_ok"]
    assert not rep.loc["b", "psnr_ok"] and rep.loc["b", "sse"] == -1


def test_custom_content_column_is_compared(ray_session):
    """caption_col maps the table's actual text column into the audit — a
    corrupted 'text' column must FAIL (it used to pass vacuously because
    only a literal 'caption' column was compared)."""
    import ray.data as rd

    t = pa.table({"doc_id": ["a", "b"], "text": ["hello", "world"]})
    t_bad = pa.table({"doc_id": ["a", "b"], "text": ["hello", "CORRUPTED"]})
    rep = (
        verify_row_invariants(
            rd.from_arrow(t),
            rd.from_arrow(t_bad),
            id_col="doc_id",
            caption_col="text",
            num_partitions=2,
        )
        .to_pandas()
        .set_index("image_id")
    )
    assert rep.loc["a", "caption_equal"]
    assert not rep.loc["b", "caption_equal"]


def test_cli_audit_uses_content_col(ray_session, tmp_path, capsys):
    """--audit-rows with --content-col text (a table with NO 'caption'
    column) audits the real column — it used to pass vacuously against
    all-null synthetic caption columns."""
    import json

    from daft_minhash_dedupe_ray.cli import main
    from daft_minhash_dedupe_ray.synth import generate_table

    t = generate_table(200, seed=3, with_images=False)
    t = t.rename_columns(
        ["text" if c == "caption" else c for c in t.column_names]
    )
    inp = str(tmp_path / "in.parquet")
    pq.write_table(t, inp)
    out_dir = str(tmp_path / "out")
    rc = main(
        ["--input", inp, "--output", out_dir, "--num-perm", "64", "--bands", "8",
         "--rows", "8", "--num-actors", "2", "--num-partitions", "4",
         "--index-col", "image_id", "--content-col", "text", "--phash-col", "",
         "--audit-rows"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["row_invariants"]["passed"]
    assert report["row_invariants"]["rows"] == report["rows_after"]


def test_inner_mode_tolerates_identical_input_resends(ray_session):
    """Round-3 advice: in survivor audits (how='inner', the CLI
    --audit-rows path) an INPUT-side re-send of the same id with
    byte-identical content is an input property, not a pipeline defect —
    it must audit cleanly; divergent content under one id stays failing."""
    import ray.data as rd

    left = pa.table(
        {
            "image_id": ["a", "a", "b", "c", "c"],
            "caption": ["x", "x", "y", "z1", "z2"],
        }
    )
    right = pa.table({"image_id": ["a", "b", "c"], "caption": ["x", "y", "z1"]})
    rep = (
        verify_row_invariants(
            rd.from_arrow(left), rd.from_arrow(right), num_partitions=2, how="inner"
        )
        .to_pandas()
        .set_index("image_id")
    )
    assert rep.loc["a", "psnr_ok"] and rep.loc["a", "caption_equal"]
    assert rep.loc["b", "psnr_ok"]
    # 'c' has two DIFFERENT captions on the input side: ambiguous reference
    assert not rep.loc["c", "psnr_ok"] and rep.loc["c", "sse"] == -1
    # outer mode still charges any duplicate
    rep_o = (
        verify_row_invariants(
            rd.from_arrow(left), rd.from_arrow(right), num_partitions=2, how="outer"
        )
        .to_pandas()
        .set_index("image_id")
    )
    assert not rep_o.loc["a", "psnr_ok"]
