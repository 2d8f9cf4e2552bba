"""Cluster job entry point — the ``ray job submit`` surface of the engine.

On a real cluster (north_rule: fixed-size multi-node, N and 4N nodes)::

    ray job submit --working-dir . -- python -m daft_minhash_dedupe_ray.cli \
        --input s3://bucket/images.lance --output s3://bucket/deduped \
        --num-perm 128 --bands 16 --rows 8 --checkpoint-dir s3://bucket/ckpt

Locally the same command runs against ``ray.init(address="local")``.  The
module never owns a Ray session that already exists: ``ray job submit``
(and the round driver) initialise Ray before this runs, so ``ray.init`` is
guarded.  Reference lifecycle being reproduced: the canonical ``__main__``
run (workload/minhash_dedupe.py:676-771) — read → dedupe → partitioned
save → one-line run report.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="daft_minhash_dedupe_ray",
        description="MinHash+pHash near-duplicate dedupe over image+caption tables",
    )
    p.add_argument("--input", required=True, help="input table (.lance dir or parquet file/dir)")
    p.add_argument("--output", required=True, help="output dir (partitioned snappy parquet)")
    p.add_argument("--index-col", default="image_id")
    p.add_argument("--content-col", default="caption")
    p.add_argument("--phash-col", default="phash", help="'' disables the image side")
    p.add_argument("--num-perm", type=int, default=64)
    p.add_argument("--ngram-size", type=int, default=5)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--bands", type=int, default=None)
    p.add_argument("--rows", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--min-length", type=int, default=0)
    p.add_argument("--substring-pass", action="store_true")
    p.add_argument("--num-salts", type=int, default=1)
    p.add_argument("--num-partitions", type=int, default=None)
    p.add_argument("--num-actors", type=int, default=8, help="union-find pool size (one shard per node is a good default)")
    p.add_argument("--checkpoint-dir", default=None, help="enable per-stage checkpoint-resume under this dir")
    p.add_argument("--modular", action="store_true", help="use the modular stage path instead of the fused throughput path")
    p.add_argument("--limit", type=int, default=None, help="row limit at ingest (reference A1)")
    p.add_argument("--chunk-size", type=int, default=200_000, help="target rows per output partition")
    p.add_argument(
        "--mode",
        choices=["dedupe", "spans", "ingest"],
        default="dedupe",
        help="dedupe: document-level near-dup removal (default); "
        "spans: ExactSubstr span-level removal (cut every cross-doc "
        "duplicated span >= --span-min-len chars, keep the smallest-id copy); "
        "ingest: treat --input as one wave of a continuous-ingest corpus "
        "rooted at --output (dedupe vs persisted indexes, append survivors, "
        "absorb in place, commit a log line; resumable across crashes)",
    )
    p.add_argument("--span-min-len", type=int, default=50, help="minimum duplicated-span length (chars) in --mode spans")
    p.add_argument(
        "--validate",
        action="store_true",
        help="after the run, recompute the candidate edge stream and check "
        "cluster parity against the sequential union-find oracle (the "
        "reference's per-run igraph validation); prints [VALIDATION] "
        "PASSED/FAILED and adds a 'validation' report field",
    )
    p.add_argument(
        "--validate-max-edges",
        type=int,
        default=5_000_000,
        help="skip (and report) validation above this many candidate edges",
    )
    p.add_argument(
        "--estimate-recall",
        type=int,
        default=0,
        metavar="K",
        help="after the run, estimate dup-pair recall against the exact "
        "Jaccard truth by shingle-bucket sampling at rate 1/K "
        "(Horvitz-Thompson weighted; K=1 = exact over all true pairs); "
        "prints [RECALL] and adds a 'recall' report field — the bounded "
        "at-scale form of the north-star recall>=0.99 acceptance check",
    )
    p.add_argument(
        "--estimate-precision",
        type=int,
        default=0,
        metavar="K",
        help="after the run, sample whole clusters at rate 1/K and report "
        "exact-Jaccard pair purity within them (the precision complement "
        "of --estimate-recall); prints [PURITY] and adds a 'precision' "
        "report field",
    )
    p.add_argument(
        "--audit-rows",
        action="store_true",
        help="after the save, read the OUTPUT back and audit every surviving "
        "row against the input per the north-rule per-row invariant "
        "(decoded-pixel PSNR >= --audit-threshold-db, caption byte-equality; "
        "payload-less tables degrade to caption equality); prints "
        "[ROW-INVARIANTS] PASSED/FAILED and adds a 'row_invariants' report "
        "field — checks the full path including the partitioned save",
    )
    p.add_argument("--audit-threshold-db", type=float, default=40.0)
    p.add_argument(
        "--span-scope",
        choices=["cross_doc", "any"],
        default="cross_doc",
        help="cross_doc: cut spans duplicated across documents only; "
        "any: also cut within-document repeats (keeper = first occurrence)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .config import DedupeConfig
    from .pipelines.dedupe import MinHashDedupePipeline
    from .sources.io import partitioned_save, read_table

    cfg = DedupeConfig(
        index_col=args.index_col,
        content_col=args.content_col,
        phash_col=args.phash_col or None,
        num_perm=args.num_perm,
        ngram_size=args.ngram_size,
        threshold=args.threshold,
        bands=args.bands,
        rows=args.rows,
        seed=args.seed,
        min_length=args.min_length,
        substring_pass=args.substring_pass,
        num_salts=args.num_salts,
        num_partitions=args.num_partitions,
    )
    cfg.resolved_bands_rows()  # fail fast on an invalid (bands, rows, num_perm)

    t0 = time.perf_counter()
    ds = read_table(args.input)
    if args.limit:
        ds = ds.limit(args.limit)

    if args.mode == "ingest":
        from .pipelines.ingest import IngestCorpus, _wave_dir

        for flag in (
            "validate",
            "estimate_recall",
            "estimate_precision",
            "checkpoint_dir",
            "modular",
        ):
            if getattr(args, flag):
                print(
                    f"[WARN] --{flag.replace('_', '-')} is not supported in "
                    "--mode ingest and was ignored",
                    file=sys.stderr,
                )
        ic = IngestCorpus(args.output, cfg, chunk_size=args.chunk_size)
        entry = ic.ingest(ds, num_actors=args.num_actors)
        entry["mode"] = "ingest"
        if args.audit_rows and entry["rows_kept"] > 0:
            from .functions.validate import row_invariant_report, verify_row_invariants

            audit = row_invariant_report(
                verify_row_invariants(
                    ds,
                    read_table(_wave_dir(args.output, entry["wave"])),
                    id_col=args.index_col,
                    caption_col=args.content_col,
                    threshold_db=args.audit_threshold_db,
                    # size from the LARGER side: the reference carries the
                    # whole wave even when a dup-heavy wave kept few rows
                    num_partitions=args.num_partitions
                    or max(1, min(64, max(entry["rows_in"], entry["rows_kept"]) // 100_000 + 1)),
                    how="inner",  # the wave dir holds only this wave's survivors
                )
            )
            entry["row_invariants"] = audit
            print(
                f"[ROW-INVARIANTS] {'PASSED' if audit['passed'] else 'FAILED'} "
                f"({audit['rows']} rows audited)",
                file=sys.stderr,
            )
        entry["wall_seconds"] = round(time.perf_counter() - t0, 2)
        print(json.dumps(entry))
        return 0 if entry.get("row_invariants", {}).get("passed", True) else 1

    if args.mode == "spans":
        from .functions.span_dedupe import remove_dup_spans

        out = remove_dup_spans(
            ds.select_columns([args.index_col, args.content_col]),
            min_len=args.span_min_len,
            id_col=args.index_col,
            text_col=args.content_col,
            num_partitions=args.num_partitions or 64,
            scope=args.span_scope,
        )
        manifest = partitioned_save(out, args.output, chunk_size=args.chunk_size)
        report = {
            "mode": "spans",
            "rows": manifest["rows"],
            "output": args.output,
            "output_partitions": manifest["target_partitions"],
            "wall_seconds": round(time.perf_counter() - t0, 2),
        }
        print(json.dumps(report))
        return 0

    pipe = MinHashDedupePipeline(cfg)
    if args.checkpoint_dir and args.modular:
        out, assign = pipe.run_with_checkpoints(ds, args.checkpoint_dir, num_actors=args.num_actors)
        rows_before, rows_after = ds.count(), out.count()
        report = {
            "rows_before": rows_before,
            "rows_after": rows_after,
            "pct_kept": round(100.0 * rows_after / max(1, rows_before), 2),
        }
    elif args.checkpoint_dir:
        # fused path with the assignments checkpoint: a rerun under the same
        # config restores the converged clusters and recomputes only the merge
        out, assign, rep = pipe.run_fused(
            ds,
            num_actors=args.num_actors,
            materialize_output=False,
            ckpt_root=args.checkpoint_dir,
        )
        report = {
            "rows_before": rep.rows_before,
            "rows_after": rep.rows_after,
            "n_components": rep.n_components,
            "pct_kept": round(rep.pct_kept, 2),
            "phase_walls": {k: round(v, 2) for k, v in (rep.phase_walls or {}).items()},
        }
    elif args.modular:
        out, assign, rep = pipe.run_with_report(ds, num_actors=args.num_actors)
        report = {
            "rows_before": rep.rows_before,
            "rows_after": rep.rows_after,
            "n_components": rep.n_components,
            "pct_kept": round(rep.pct_kept, 2),
        }
    else:
        out, assign, rep = pipe.run_fused(ds, num_actors=args.num_actors, materialize_output=False)
        report = {
            "rows_before": rep.rows_before,
            "rows_after": rep.rows_after,
            "n_components": rep.n_components,
            "pct_kept": round(rep.pct_kept, 2),
            "phase_walls": {k: round(v, 2) for k, v in (rep.phase_walls or {}).items()},
        }

    if args.validate:
        from .pipelines.dedupe import validate_clusters

        edges = pipe.edges(pipe.prep(ds))
        v = validate_clusters(edges, assign, max_edges=args.validate_max_edges)
        report["validation"] = v
        status = (
            "PASSED" if v.get("passed") else ("SKIPPED" if not v["validated"] else "FAILED")
        )
        print(f"[VALIDATION] {status}", file=sys.stderr)
        if v["validated"] and not v["passed"]:
            print(json.dumps(report))
            return 1

    if args.estimate_recall:
        from .functions.recall import estimate_pair_recall

        r = estimate_pair_recall(
            pipe.prep(ds), assign, cfg, k_buckets=args.estimate_recall
        )
        report["recall"] = r
        rec = r.get("recall")
        print(
            f"[RECALL] {'n/a (no sampled pairs)' if rec is None else f'{rec:.4f}'}"
            f" over {r['n_sampled_pairs']} sampled true pairs (K={r['k_buckets']})",
            file=sys.stderr,
        )

    if args.estimate_precision:
        from .functions.recall import estimate_cluster_precision

        pr = estimate_cluster_precision(
            pipe.prep(ds), assign, cfg, k_clusters=args.estimate_precision
        )
        report["precision"] = pr
        pp = pr.get("pair_purity")
        print(
            f"[PURITY] {'n/a (no sampled clusters)' if pp is None else f'{pp:.4f}'}"
            f" over {pr['n_sampled_clusters']} sampled clusters (K={pr['k_clusters']})",
            file=sys.stderr,
        )

    manifest = partitioned_save(out, args.output, chunk_size=args.chunk_size)
    report["output"] = args.output
    report["output_partitions"] = manifest["target_partitions"]

    if args.audit_rows:
        from .functions.validate import row_invariant_report, verify_row_invariants

        # size the exchange from the LARGER side (the reference carries
        # rows_before even when the dedupe kept few rows); near-empty tasks
        # dominate tiny runs at a fixed 64 — see the CC-loop sizing note
        n_audit = max(
            report.get("rows_before") or 0, report.get("rows_after") or manifest["rows"]
        )
        parts = args.num_partitions or max(1, min(64, n_audit // 100_000 + 1))
        audit = row_invariant_report(
            verify_row_invariants(
                ds,
                read_table(args.output),
                id_col=args.index_col,
                caption_col=args.content_col,
                threshold_db=args.audit_threshold_db,
                num_partitions=parts,
                how="inner",  # a dedupe legitimately drops rows
            )
        )
        report["row_invariants"] = audit
        print(
            f"[ROW-INVARIANTS] {'PASSED' if audit['passed'] else 'FAILED'} "
            f"({audit['rows']} rows audited)",
            file=sys.stderr,
        )
        if not audit["passed"]:
            report["wall_seconds"] = round(time.perf_counter() - t0, 2)
            print(json.dumps(report))
            return 1

    report["wall_seconds"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
