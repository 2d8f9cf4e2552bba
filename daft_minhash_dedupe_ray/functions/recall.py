"""Per-run dup-pair recall estimation by shingle-bucket sampling.

The north-star acceptance metric is dup-pair recall >= 0.99 against the
exact Jaccard oracle at the configured shingle/signature config
(BASELINE.json).  The exact oracle (``oracle.oracle_dup_pairs``) is O(n^2)
and test-only; at corpus scale a run needs a bounded, distributed ESTIMATE
of the same quantity.  This module provides it:

1. **Sample shingle buckets, not documents.**  Uniform doc sampling at rate
   p observes a true pair only with probability p^2 — useless at scale.
   Instead, a shingle value ``sh`` is "sampled" when
   ``splitmix64(sh ^ mix(seed)) % k_buckets == 0``.  Every true pair
   (Jaccard >= t > 0) shares at least one shingle, so it is observed with
   probability ``1 - (1 - 1/K)^I`` where ``I`` is the pair's shingle
   intersection size — large and computable.
2. **Exact verification inside sampled buckets.**  Docs emit one row per
   sampled shingle carrying their full distinct-shingle-hash set; a
   partition-granular exchange co-locates each bucket, and every in-bucket
   pair gets an exact Jaccard from the two sorted sets (vectorless numpy
   set intersection — groups are tiny; a ``max_group`` cap skips
   boilerplate mega-buckets and reports how many).
3. **Horvitz-Thompson weighting.**  Each distinct true pair contributes
   weight ``w = 1 / (1 - (1 - 1/K)^I)`` — the inverse of its inclusion
   probability — so the weighted same-cluster fraction is an unbiased
   estimate of recall over the full true-pair population.

Caption side only, by design: the pHash side's banding guarantees recall
1.0 for Hamming < phash_bands by pigeonhole (no sampling needed — it is a
theorem, not a probability).  Jaccard here is over 32-bit shingle hashes
(like the MinHash itself), not raw token tuples; the collision bias is
negligible for an estimator.

Scale shape: the sampled volume is ~``rows * E[|S|] / K`` bucket rows, each
carrying one doc's shingle set — K tunes the cost; one keyed exchange; the
verified pair set is small and the assignment lookup filters (broadcast
endpoint set) rather than shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..config import DedupeConfig
from ..hashing import shingle_hashes, splitmix64
from ..stages.signature import node_ids_for
from ..text import normalize_array

_U64 = np.uint64

_BUCKET_SCHEMA = pa.schema(
    [
        ("bucket", pa.uint64()),
        ("node", pa.uint64()),
        ("sset", pa.list_(pa.uint64())),
    ]
)

_PAIR_SCHEMA = pa.schema(
    [
        ("u", pa.uint64()),
        ("v", pa.uint64()),
        ("isect", pa.int64()),
        ("skipped_group", pa.int64()),  # 0 for pair rows; group size for skip markers
    ]
)


def _emit_sampled(batch: pa.Table, cfg: DedupeConfig, k_buckets: int, seed: int) -> pa.Table:
    """One row per (sampled shingle, doc), carrying the doc's full distinct
    shingle set.  This pass runs over the WHOLE corpus, so it is fully
    vectorised: one (row, shingle) lexsort dedupes per-doc sets, one hash
    pass picks the sampled occurrences, and the per-emission set copies are
    a single segment gather into an Arrow ListArray."""
    from ..hashing import _segment_aranges

    nodes = node_ids_for(batch, cfg)
    norm = normalize_array(batch[cfg.content_col], cfg.normalize)
    flat, offsets = shingle_hashes(norm, cfg.ngram_size, cfg.min_length)
    n = len(nodes)
    if len(flat) == 0:
        return _BUCKET_SCHEMA.empty_table()
    row_id = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    order = np.lexsort((flat, row_id))
    r_s, f_s = row_id[order], flat[order]
    keep = np.r_[True, (r_s[1:] != r_s[:-1]) | (f_s[1:] != f_s[:-1])]
    r_u, f_u = r_s[keep], f_s[keep]  # distinct shingles per row, row-major
    mix = splitmix64(np.array([seed], dtype=np.uint64))[0]
    samp = splitmix64(f_u ^ mix) % _U64(k_buckets) == 0
    if not samp.any():
        return _BUCKET_SCHEMA.empty_table()
    cnt = np.bincount(r_u, minlength=n).astype(np.int64)
    uoffs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cnt, out=uoffs[1:])
    em = np.flatnonzero(samp)
    em_row, em_bucket = r_u[em], f_u[em]
    lens = cnt[em_row]  # >= 1 by construction (the sampled shingle is in the set)
    gidx = np.repeat(uoffs[em_row], lens) + _segment_aranges(lens)
    loffs = np.zeros(len(em_row) + 1, dtype=np.int64)
    np.cumsum(lens, out=loffs[1:])
    sset = pa.ListArray.from_arrays(
        pa.array(loffs, pa.int32()), pa.array(f_u[gidx], pa.uint64())
    )
    return pa.table(
        {
            "bucket": pa.array(em_bucket, pa.uint64()),
            "node": pa.array(nodes[em_row], pa.uint64()),
            "sset": sset,
        }
    )


def _verify_buckets(t: pa.Table, threshold: float, max_group: int) -> pa.Table:
    if len(t) == 0:
        return _PAIR_SCHEMA.empty_table()
    bucket = t["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
    node = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(bucket, kind="stable")
    bucket, node = bucket[order], node[order]
    sets = t["sset"].combine_chunks().take(pa.array(order))
    starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
    ends = np.r_[starts[1:], len(bucket)]
    u_o, v_o, i_o, sk_o = [], [], [], []
    for s, e in zip(starts, ends):
        g = e - s
        if g < 2:
            continue
        if g > max_group:
            u_o.append(0)
            v_o.append(0)
            i_o.append(0)
            sk_o.append(int(g))
            continue
        gsets = [
            np.asarray(sets[int(s + i)].as_py(), dtype=np.uint64) for i in range(g)
        ]
        gnodes = node[s:e]
        for a in range(g):
            for b in range(a + 1, g):
                if gnodes[a] == gnodes[b]:
                    continue
                isect = len(np.intersect1d(gsets[a], gsets[b], assume_unique=True))
                union = len(gsets[a]) + len(gsets[b]) - isect
                if union and isect / union >= threshold:
                    u, v = sorted((int(gnodes[a]), int(gnodes[b])))
                    u_o.append(u)
                    v_o.append(v)
                    i_o.append(isect)
                    sk_o.append(0)
    return pa.table(
        {
            "u": pa.array(u_o, pa.uint64()),
            "v": pa.array(v_o, pa.uint64()),
            "isect": pa.array(i_o, pa.int64()),
            "skipped_group": pa.array(sk_o, pa.int64()),
        }
    )


def _reps_for_endpoints(assignments, endpoints: np.ndarray) -> dict[int, int]:
    """{node: rep} for the (small) sampled endpoint set: broadcast the sorted
    endpoint array, filter assignment batches to matches, collect the hits."""
    ep_ref = ray.put(np.sort(endpoints))

    def _filter(b: pa.Table) -> pa.Table:
        eps = ray.get(ep_ref) if isinstance(ep_ref, ray.ObjectRef) else ep_ref
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        m = np.isin(u, eps, kind="sort")
        return b.filter(pa.array(m))

    hits = assignments.map_batches(_filter, batch_format="pyarrow").to_pandas()
    if len(hits) == 0 or "u" not in hits.columns:  # empty blocks drop columns
        return {}
    # numpy->python int via .tolist() keeps u64 values positive (a
    # .astype(int) would wrap >=2^63 into negative int64 keys)
    return dict(
        zip(
            hits["u"].to_numpy(dtype=np.uint64).tolist(),
            hits["rep"].to_numpy(dtype=np.uint64).tolist(),
        )
    )


@ray.remote
def _sampled_members_remote(k_clusters: int, seed: int, *tables):
    """Collect (u, rep) rows of clusters whose rep hash-samples in — runs as
    a task so full assignment blocks never land on the driver; returns
    (u_sorted, rep_aligned) for broadcast."""
    mix = splitmix64(np.array([seed ^ 0x5A5A], dtype=np.uint64))[0]
    us, rs = [], []
    for t in tables:
        if t is None or len(t) == 0:
            continue
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        r = t["rep"].to_numpy(zero_copy_only=False).astype(np.uint64)
        m = splitmix64(r ^ mix) % _U64(k_clusters) == 0
        us.append(u[m])
        rs.append(r[m])
    if not us:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint64)
    u = np.concatenate(us)
    r = np.concatenate(rs)
    o = np.argsort(u, kind="stable")
    return u[o], r[o]


_MEMBER_SCHEMA = pa.schema(
    [("rep", pa.uint64()), ("node", pa.uint64()), ("sset", pa.list_(pa.uint64()))]
)

_PURITY_SCHEMA = pa.schema(
    [
        ("rep", pa.uint64()),
        ("n_members", pa.int64()),
        ("n_pairs", pa.int64()),
        ("n_true", pa.int64()),
        ("truncated", pa.int64()),
    ]
)


def _emit_members(batch: pa.Table, cfg: DedupeConfig, mem_ref) -> pa.Table:
    u_sorted, rep_aligned = ray.get(mem_ref) if isinstance(mem_ref, ray.ObjectRef) else mem_ref
    if len(u_sorted) == 0:
        return _MEMBER_SCHEMA.empty_table()
    nodes = node_ids_for(batch, cfg)
    pos = np.searchsorted(u_sorted, nodes)
    pos_c = np.minimum(pos, len(u_sorted) - 1)
    hit = u_sorted[pos_c] == nodes
    if not hit.any():
        return _MEMBER_SCHEMA.empty_table()
    idx = np.flatnonzero(hit)
    norm = normalize_array(batch[cfg.content_col], cfg.normalize)
    flat, offsets = shingle_hashes(norm, cfg.ngram_size, cfg.min_length)
    reps, nds, ssets = [], [], []
    for d in idx:
        reps.append(int(rep_aligned[pos_c[d]]))
        nds.append(int(nodes[d]))
        ssets.append(np.unique(flat[offsets[d] : offsets[d + 1]]).tolist())
    return pa.table(
        {
            "rep": pa.array(reps, pa.uint64()),
            "node": pa.array(nds, pa.uint64()),
            "sset": pa.array(ssets, pa.list_(pa.uint64())),
        }
    )


def _purity_partition(t: pa.Table, threshold: float, max_pairs: int) -> pa.Table:
    if len(t) == 0:
        return _PURITY_SCHEMA.empty_table()
    rep = t["rep"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(rep, kind="stable")
    rep = rep[order]
    sets = t["sset"].combine_chunks().take(pa.array(order))
    starts = np.flatnonzero(np.r_[True, rep[1:] != rep[:-1]])
    ends = np.r_[starts[1:], len(rep)]
    rows = {k: [] for k in ("rep", "n_members", "n_pairs", "n_true", "truncated")}
    for s, e in zip(starts, ends):
        g = int(e - s)
        gsets = [np.asarray(sets[int(s + i)].as_py(), dtype=np.uint64) for i in range(g)]
        n_pairs = n_true = 0
        truncated = 0
        for a in range(g):
            if n_pairs >= max_pairs:
                truncated = 1
                break
            for b in range(a + 1, g):
                if n_pairs >= max_pairs:
                    truncated = 1
                    break
                isect = len(np.intersect1d(gsets[a], gsets[b], assume_unique=True))
                union = len(gsets[a]) + len(gsets[b]) - isect
                n_pairs += 1
                if union and isect / union >= threshold:
                    n_true += 1
        rows["rep"].append(int(rep[s]))
        rows["n_members"].append(g)
        rows["n_pairs"].append(n_pairs)
        rows["n_true"].append(n_true)
        rows["truncated"].append(truncated)
    return pa.table(
        {
            "rep": pa.array(rows["rep"], pa.uint64()),
            "n_members": pa.array(rows["n_members"], pa.int64()),
            "n_pairs": pa.array(rows["n_pairs"], pa.int64()),
            "n_true": pa.array(rows["n_true"], pa.int64()),
            "truncated": pa.array(rows["truncated"], pa.int64()),
        }
    )


# sampled-member broadcast above this raises (pick a bigger K instead)
MEMBER_BROADCAST_LIMIT = 20_000_000

# driver-side sampled-pair collection above this raises (pick a bigger K)
PAIR_COLLECT_LIMIT = 5_000_000


def estimate_cluster_precision(
    ds,
    assignments,
    cfg: DedupeConfig,
    *,
    k_clusters: int = 16,
    seed: int = 0xEC0,
    max_pairs_per_cluster: int = 2000,
    num_partitions: int = 32,
) -> dict:
    """Cluster PURITY (the precision complement of ``estimate_pair_recall``):
    sample whole clusters at rate 1/``k_clusters`` by representative hash,
    gather the sampled members' shingle sets in one corpus pass (broadcast
    sorted member array — size-guarded; raise K for bigger corpora), and
    exact-Jaccard every within-cluster pair (capped per cluster).  Because
    merging is transitive, within-cluster pairs below threshold are not
    necessarily WRONG — they measure how far transitive closure strays from
    the pairwise-similar core (the reference merges the same way), so this
    reports pair purity + exact-duplicate-free cluster fraction rather than
    calling them errors."""
    import functools

    mem_ref = _sampled_members_remote.remote(
        k_clusters, seed, *assignments.to_arrow_refs()
    )
    u_sorted, rep_aligned = ray.get(mem_ref)
    if len(u_sorted) > MEMBER_BROADCAST_LIMIT:
        raise ValueError(
            f"{len(u_sorted)} sampled members exceed MEMBER_BROADCAST_LIMIT; "
            f"raise k_clusters (got {k_clusters})"
        )
    report = {
        "k_clusters": int(k_clusters),
        "n_sampled_members": int(len(u_sorted)),
        "n_sampled_clusters": int(len(np.unique(rep_aligned))),
        "threshold": float(cfg.threshold),
    }
    if len(u_sorted) == 0:
        report.update({"pair_purity": None, "mean_cluster_purity": None})
        return report
    pack_ref = ray.put((u_sorted, rep_aligned))
    members = ds.map_batches(
        functools.partial(_emit_members, cfg=cfg, mem_ref=pack_ref),
        batch_format="pyarrow",
    )
    from ..stages.util import partition_groupby

    purity = partition_groupby(
        members,
        ["rep"],
        functools.partial(
            _purity_partition, threshold=cfg.threshold, max_pairs=max_pairs_per_cluster
        ),
        _PURITY_SCHEMA,
        num_partitions=num_partitions,
    ).to_pandas()
    purity = purity[purity["n_pairs"] > 0]
    if len(purity) == 0:
        report.update({"pair_purity": None, "mean_cluster_purity": None})
        return report
    report["pair_purity"] = float(purity["n_true"].sum() / purity["n_pairs"].sum())
    report["mean_cluster_purity"] = float(
        (purity["n_true"] / purity["n_pairs"]).mean()
    )
    report["n_truncated_clusters"] = int(purity["truncated"].sum())
    return report


def estimate_pair_recall(
    ds,
    assignments,
    cfg: DedupeConfig,
    *,
    k_buckets: int = 64,
    seed: int = 0xEC0,
    max_group: int = 256,
    num_partitions: int = 32,
) -> dict:
    """Sampled dup-pair recall of ``assignments`` (u, rep) against the exact
    Jaccard truth on ``ds``, as a report dict.  ``k_buckets=1`` samples every
    shingle — the estimate becomes the exact recall (weights all 1)."""
    from ..stages.util import partition_groupby
    import functools

    sampled = ds.map_batches(
        functools.partial(_emit_sampled, cfg=cfg, k_buckets=k_buckets, seed=seed),
        batch_format="pyarrow",
    )
    pairs_ds = partition_groupby(
        sampled,
        ["bucket"],
        functools.partial(_verify_buckets, threshold=cfg.threshold, max_group=max_group),
        _PAIR_SCHEMA,
        num_partitions=num_partitions,
    )
    # sampled pairs + skip markers: small by construction, but K must scale
    # with the corpus — collect incrementally and fail loudly instead of
    # OOMing the driver when it doesn't
    import pandas as pd

    chunks, n_rows = [], 0
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        chunks.append(b.to_pandas())
        n_rows += len(b)
        if n_rows > PAIR_COLLECT_LIMIT:
            raise ValueError(
                f">{PAIR_COLLECT_LIMIT} sampled pairs; raise k_buckets "
                f"(got {k_buckets})"
            )
    pdf = (
        pd.concat(chunks, ignore_index=True)
        if chunks
        else _PAIR_SCHEMA.empty_table().to_pandas()
    )
    skipped = pdf[pdf["skipped_group"] > 0]
    pairs = pdf[pdf["skipped_group"] == 0]
    # the same pair surfaces once per sampled shared shingle; keep max isect
    # (isect is pair-intrinsic — dedupe is just row dedupe)
    if len(pairs):
        pairs = (
            pairs.groupby(["u", "v"], as_index=False)
            .agg(isect=("isect", "max"))
            .reset_index(drop=True)
        )
    n_pairs = int(len(pairs))
    report = {
        "k_buckets": int(k_buckets),
        "n_sampled_pairs": n_pairs,
        "n_skipped_groups": int(len(skipped)),
        "max_skipped_group": int(skipped["skipped_group"].max()) if len(skipped) else 0,
        "threshold": float(cfg.threshold),
    }
    if n_pairs == 0:
        report.update({"recall": None, "recall_unweighted": None})
        return report
    endpoints = np.unique(
        np.concatenate(
            [pairs["u"].to_numpy(dtype=np.uint64), pairs["v"].to_numpy(dtype=np.uint64)]
        )
    )
    rep_of = _reps_for_endpoints(assignments, endpoints)
    u = pairs["u"].to_numpy(dtype=np.uint64).tolist()
    v = pairs["v"].to_numpy(dtype=np.uint64).tolist()
    same = np.array(
        [rep_of.get(a, a) == rep_of.get(b, b) for a, b in zip(u, v)], dtype=bool
    )
    isect = pairs["isect"].to_numpy(dtype=np.float64)
    w = 1.0 / (1.0 - (1.0 - 1.0 / k_buckets) ** isect)
    report["recall"] = float((w * same).sum() / w.sum())
    report["recall_unweighted"] = float(same.mean())
    return report
