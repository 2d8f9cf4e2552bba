"""Unit oracles for the round-2 relational additions: running-window
aggregate, as-of/range-join aggregate, exact distributed quantiles, and the
string-key hash-partition path they introduced.

Oracles are brute-force python/pandas on small fixtures (the SQL hash-match
gate at sf0.01 is scripts/check_correctness.py); fixtures interleave the
time dimension so the as-of predicate actually filters (in the testdata all
orders predate all events, which would leave the <= branch untested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from daft_minhash_dedupe_ray.stages.util import partition_groupby


def _events_table(n=400, n_users=7, seed=1):
    rng = np.random.RandomState(seed)
    ts = rng.randint(0, 1_000_000, n).astype(np.int64)
    return pa.table(
        {
            "user_id": pa.array(rng.randint(0, n_users, n).astype(np.int64)),
            "ts_us": pa.array(ts),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "value": pa.array(np.round(rng.rand(n) * 100, 2)),
        }
    )


def test_events_running_matches_pandas(ray_session, tmp_path, monkeypatch):
    import ray.data as rd

    from daft_minhash_dedupe_ray.pipelines import relational as R

    t = _events_table()
    # write a mini events.parquet with the production schema
    import pyarrow.parquet as pq

    prod = pa.table(
        {
            "event_id": t["event_id"],
            "ts": t["ts_us"].cast(pa.timestamp("us")),
            "user_id": t["user_id"],
            "event_type": pa.array(["x"] * len(t)),
            "value": t["value"],
        }
    )
    pq.write_table(prod, tmp_path / "events.parquet")
    out = R.events_running(str(tmp_path)).to_pandas()

    df = t.to_pandas().sort_values(["user_id", "ts_us", "event_id"])
    df["seq"] = df.groupby("user_id").cumcount() + 1
    df["running_value"] = df.groupby("user_id")["value"].cumsum().round(2)
    want = df.sort_values("event_id")[["event_id", "seq", "running_value"]].reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_events_prior_spend_interleaved_dates(ray_session, tmp_path):
    """Orders interleave with event times, so some orders are in the future
    of some events — the as-of cut must exclude them."""
    import pyarrow.parquet as pq

    from daft_minhash_dedupe_ray.pipelines import relational as R

    rng = np.random.RandomState(7)
    n_ev, n_ord, n_users = 300, 500, 9
    ev_ts = rng.randint(0, 1_000_000, n_ev).astype(np.int64)
    ev_user = rng.randint(0, n_users, n_ev).astype(np.int64)
    od_date = rng.randint(0, 1_000_000, n_ord).astype(np.int64)
    od_cust = rng.randint(0, n_users + 2, n_ord).astype(np.int64)  # some custs eventless
    od_price = np.round(rng.rand(n_ord) * 1000, 2)

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
                "ts": pa.array(ev_ts).cast(pa.timestamp("us")),
                "user_id": pa.array(ev_user),
            }
        ),
        tmp_path / "events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(od_cust),
                "o_orderdate": pa.array(od_date).cast(pa.timestamp("us")),
                "o_totalprice": pa.array(od_price),
            }
        ),
        tmp_path / "orders.parquet",
    )
    out = R.events_prior_spend(str(tmp_path)).to_pandas()

    for i in rng.choice(n_ev, 40, replace=False):
        m = (od_cust == ev_user[i]) & (od_date <= ev_ts[i])
        row = out[out.event_id == i].iloc[0]
        assert row.n_prior_orders == int(m.sum())
        assert abs(row.prior_spend - round(float(od_price[m].sum()), 2)) < 1e-6
        if m.sum():
            assert int(row.asof_us) == int(od_date[m].max())
        else:
            assert pd.isna(row.asof_us)


def test_value_quantiles_matches_numpy(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from daft_minhash_dedupe_ray.pipelines import relational as R

    rng = np.random.RandomState(3)
    n = 1000
    types = np.array(["a", "b", "c"])[rng.randint(0, 3, n)]
    vals = np.round(rng.rand(n) * 50, 3)
    pq.write_table(
        pa.table({"event_type": pa.array(types), "value": pa.array(vals)}),
        tmp_path / "events.parquet",
    )
    out = R.value_quantiles(str(tmp_path)).to_pandas().set_index("event_type")
    for t in "abc":
        seg = vals[types == t]
        assert abs(out.loc[t, "p50"] - round(float(np.quantile(seg, 0.5)), 6)) < 1e-9
        assert abs(out.loc[t, "p90"] - round(float(np.quantile(seg, 0.9)), 6)) < 1e-9
        assert out.loc[t, "n"] == len(seg)


def test_top_tokens_matches_bruteforce(ray_session):
    import collections

    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.textops import top_tokens

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, rng.randint(0, 12)).tolist()) for _ in range(300)
    ] + ["", "   "]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(5)
    out = top_tokens(ds, k=10).to_pandas()

    cnt = collections.Counter(tok for t in texts for tok in t.split())
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["token"], out["n"]))
    assert [(t, int(n)) for t, n in got] == want


def test_top_orders_per_segment_boundary_ties(ray_session, tmp_path):
    """Equal prices at the k boundary must resolve by orderkey exactly as
    ROW_NUMBER does, including when the tied rows sit in different input
    batches (exercises the local-top-k combiner's superset property)."""
    import pyarrow.parquet as pq

    from daft_minhash_dedupe_ray.pipelines import relational as R

    n = 200
    seg_names = np.array(["A", "B"])
    cust = np.arange(20, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(cust),
                "c_mktsegment": pa.array(seg_names[cust % 2]),
            }
        ),
        tmp_path / "customer.parquet",
    )
    # every order in segment A has the SAME price -> pure orderkey tie-break
    rng = np.random.RandomState(5)
    ck = rng.randint(0, 20, n).astype(np.int64)
    price = np.where(ck % 2 == 0, 100.0, np.round(rng.rand(n) * 100, 2))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(ck),
                "o_totalprice": pa.array(price),
            }
        ),
        tmp_path / "orders.parquet",
    )
    out = R.top_orders_per_segment(str(tmp_path), k=3).to_pandas()

    df = pd.DataFrame(
        {"seg": seg_names[ck % 2], "okey": np.arange(n), "price": price}
    ).sort_values(["seg", "price", "okey"], ascending=[True, False, True])
    want = df.groupby("seg").head(3)
    for seg in ("A", "B"):
        got_keys = out[out.c_mktsegment == seg].sort_values("rnk")["o_orderkey"].tolist()
        want_keys = want[want.seg == seg]["okey"].tolist()
        assert got_keys == want_keys, seg


def test_partition_groupby_string_keys_colocate(ray_session):
    """Same string key across different input blocks must land in one
    partition (the kernel sees each key exactly once globally)."""
    import ray.data as rd

    keys = [f"k{i % 17}" for i in range(200)]
    t1 = pa.table({"k": pa.array(keys[:100]), "x": pa.array(np.arange(100, dtype=np.int64))})
    t2 = pa.table({"k": pa.array(keys[100:]), "x": pa.array(np.arange(100, 200, dtype=np.int64))})
    ds = rd.from_arrow([t1, t2]).repartition(4)
    schema = pa.schema([("k", pa.string()), ("n", pa.int64()), ("s", pa.int64())])

    def kernel(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return schema.empty_table()
        df = b.to_pandas().groupby("k", as_index=False).agg(n=("x", "size"), s=("x", "sum"))
        return pa.Table.from_pandas(df, preserve_index=False).cast(schema)

    out = partition_groupby(ds, ["k"], kernel, schema, num_partitions=8).to_pandas()
    # one output row per key (keys never split across partitions)
    assert len(out) == 17
    want = pd.DataFrame({"k": keys, "x": np.arange(200)}).groupby("k", as_index=False).agg(
        n=("x", "size"), s=("x", "sum")
    )
    merged = out.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        merged, want.sort_values("k").reset_index(drop=True), check_dtype=False
    )


def _write_tpch_mini(tmp_path, seed=11):
    """customer/nation/orders mini fixture with FK gaps in both directions:
    some customers have no orders (anti-join hits) and some order custkeys
    are absent from customer (inner-join drops)."""
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    n_cust, n_nat, n_ord = 120, 5, 400
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
    cust = pa.table(
        {
            "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
            "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
            "c_nationkey": pa.array(rng.randint(0, n_nat, n_cust).astype(np.int32)),
            "c_acctbal": pa.array(np.round(rng.rand(n_cust) * 1000, 2)),
            "c_mktsegment": pa.array(segs[rng.randint(0, 5, n_cust)]),
        }
    )
    nat = pa.table(
        {
            "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int32)),
            "n_name": pa.array([f"NATION_{i}" for i in range(n_nat)]),
            "n_regionkey": pa.array(np.zeros(n_nat, dtype=np.int32)),
        }
    )
    # order custkeys in [1, n_cust+20]: keys > n_cust miss customer
    ok = rng.randint(1, n_cust + 21, n_ord).astype(np.int64)
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(1, n_ord + 1, dtype=np.int64)),
            "o_custkey": pa.array(ok),
            "o_orderstatus": pa.array(["O"] * n_ord),
            "o_totalprice": pa.array(np.round(rng.rand(n_ord) * 500, 2)),
            "o_orderdate": pa.array(
                rng.randint(0, 10**9, n_ord).astype(np.int64), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
        }
    )
    pq.write_table(cust, tmp_path / "customer.parquet")
    pq.write_table(nat, tmp_path / "nation.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")
    return cust.to_pandas(), nat.to_pandas(), orders.to_pandas()


def test_customers_without_orders_anti_join(ray_session, tmp_path):
    from daft_minhash_dedupe_ray.pipelines import relational as R

    cust, _, orders = _write_tpch_mini(tmp_path)
    out = R.customers_without_orders(str(tmp_path), min_price=250.0).to_pandas()

    have = set(orders.loc[orders["o_totalprice"] > 250.0, "o_custkey"])
    miss = cust[~cust["c_custkey"].isin(have)]
    assert len(miss) > 0  # fixture actually exercises the anti side
    want = (
        miss.groupby("c_mktsegment", as_index=False)
        .size()
        .rename(columns={"size": "n_customers"})
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_revenue_by_nation_three_way_join(ray_session, tmp_path):
    from daft_minhash_dedupe_ray.pipelines import relational as R

    cust, nat, orders = _write_tpch_mini(tmp_path)
    out = R.revenue_by_nation(str(tmp_path)).to_pandas()

    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    assert len(j) < len(orders)  # inner join actually drops FK-less orders
    want = (
        j.groupby("n_name", as_index=False)
        .agg(revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size"))
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    want["revenue"] = want["revenue"].round(2)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_events_terminal_parquet_sinks_match_table_forms(ray_session, tmp_path):
    """VERDICT r4 item 7: the write_parquet terminal variants produce the
    same rows as the oracle-gate table forms, without the result transiting
    the driver."""
    import pyarrow.parquet as pq
    import glob

    from daft_minhash_dedupe_ray.pipelines import relational as R

    t = _events_table(n=300, n_users=5, seed=4)
    prod = pa.table(
        {
            "event_id": t["event_id"],
            "ts": t["ts_us"].cast(pa.timestamp("us")),
            "user_id": t["user_id"],
            "event_type": pa.array(["x"] * len(t)),
            "value": t["value"],
        }
    )
    pq.write_table(prod, tmp_path / "events.parquet")
    # orders table for the prior-spend query
    rng = np.random.RandomState(9)
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(120, dtype=np.int64)),
            "o_custkey": pa.array(rng.randint(0, 5, 120).astype(np.int64)),
            "o_orderdate": pa.array(
                rng.randint(0, 1_000_000, 120).astype(np.int64)
            ).cast(pa.timestamp("us")),
            "o_totalprice": pa.array(np.round(rng.rand(120) * 1000, 2)),
        }
    )
    pq.write_table(orders, tmp_path / "orders.parquet")

    for table_fn, sink_fn, name in [
        (R.events_running, R.events_running_to_parquet, "running"),
        (R.events_prior_spend, R.events_prior_spend_to_parquet, "prior"),
    ]:
        want = table_fn(str(tmp_path)).to_pandas()
        out_dir = str(tmp_path / f"sink_{name}")
        sink_fn(str(tmp_path), out_dir)
        files = glob.glob(out_dir + "/*.parquet")
        assert files, "sink wrote no parquet"
        got = (
            pa.concat_tables([pq.read_table(f) for f in files])
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_events_hopping_window_semantics(ray_session, tmp_path):
    """Hopping windows: every event lands in exactly size/hop windows; each
    containing window satisfies start <= t < start+size with start on the
    hop grid; counts conserve (sum n == 4 x events)."""
    import pyarrow.parquet as pq

    from daft_minhash_dedupe_ray.pipelines import relational as R

    secs = [0, 899, 900, 3599, 3600, 7201, 86400]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(secs), dtype=np.int64)),
            "ts": pa.array(np.array(secs, dtype=np.int64) * 1_000_000).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array(np.zeros(len(secs), dtype=np.int64)),
            "event_type": pa.array(["a"] * len(secs)),
            "value": pa.array(np.ones(len(secs))),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = R.events_hopping(str(tmp_path)).to_pandas()
    assert out["n"].sum() == 4 * len(secs)  # each event in exactly 4 windows
    for ws, n in zip(out["window_start"], out["n"]):
        assert ws % 900 == 0  # hop grid
        covered = [s_ for s_ in secs if ws <= s_ < ws + 3600]
        assert n == len(covered)
    # spot: the t=3600 event's four containing windows are 900-spaced
    w36 = sorted(ws for ws, _ in zip(out["window_start"], out["n"]) if ws <= 3600 < ws + 3600)
    assert w36 == [900, 1800, 2700, 3600]
