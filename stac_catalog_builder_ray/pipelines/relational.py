"""Relational operator suite over the driver's TPC-H-ish parquet tables.

Each function takes ``sf_dir`` and returns a Dataset / DataFrame / Arrow
table; ``__ray_entry__.oracle_sql`` carries the matching DuckDB SQL.  These
exercise the generic operator surface of SURVEY.md §2 (filters M19,
projections M11-M17, joins J1-J3, aggregates A1-A6, dedup O5, sort/top-k
O1-O3, union O6, windows §2.8) on neutral data so the driver can
hash-compare against SQL.

Column names are chosen to match the oracle SQL exactly (the driver sorts
columns by name before hashing).  Float aggregates that SUM many doubles are
rounded to 2 decimals ON BOTH SIDES (summation order differs between
engines); per-row float arithmetic is left exact (IEEE-identical).

Scale notes (100 TB discipline): every read passes ``columns=``; joins
declare which side is broadcast vs hash-partitioned; aggregates that can
pre-combine per batch do so.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _t(sf_dir: str, name: str, columns: Optional[list] = None):
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def cluster_partitions(per_cpu: float = 0.5, floor: int = 8) -> int:
    """Shuffle/join partition count scaled to the cluster instead of a
    hardcoded constant (a fixed 16 caps reduce parallelism on big clusters
    and over-fragments small ones)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(floor, int(per_cpu * cpus))


def _round2(tbl: pa.Table, cols) -> pa.Table:
    from ..functions.rounding import round_half_away

    for c in cols:
        vals = round_half_away(tbl[c].to_numpy(zero_copy_only=False), 2)
        tbl = tbl.set_column(tbl.schema.get_field_index(c), c, pa.array(vals))
    return tbl


# --- scans / filters / projections ------------------------------------------


def q_filter_project(sf_dir: str):
    """Vectorized filter + computed projection (per-row float math is exact
    in both engines)."""
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"])

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_quantity"], 45.0))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "l_linenumber": t["l_linenumber"], "revenue": rev}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_string_ops(sf_dir: str):
    """String projections (M11/M12 href building + M1 regex extract)."""
    ds = _t(sf_dir, "part", ["p_partkey", "p_name", "p_brand"])

    def fn(t: pa.Table) -> pa.Table:
        href = pc.binary_join_element_wise(
            pa.array(["s3://bucket/parts/"] * t.num_rows),
            pc.cast(t["p_partkey"], pa.string()),
            pa.array([".dat"] * t.num_rows),
            pa.array([""] * t.num_rows),
        )
        brand_num = pc.struct_field(pc.extract_regex(t["p_brand"], r"Brand#(?P<num>\d+)"), "num")
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "href": href,
                "name_upper": pc.utf8_upper(t["p_name"]),
                "brand_num": pc.cast(brand_num, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_month_end(sf_dir: str):
    """Period-end semantics (M2/M7: monthly end = last day 23:59:59)."""
    from ..functions.datetimes import period_end

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def fn(t: pa.Table) -> pa.Table:
        starts = t["o_orderdate"].to_numpy(zero_copy_only=False).astype("M8[us]")
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "month_end": pa.array(period_end(starts, "monthly"), pa.timestamp("us")),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --- aggregates -------------------------------------------------------------


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filter -> groupby -> multi-aggregate (A1/A6)."""
    ds = _t(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        """Per-batch partial aggregation (the A-series combiner pattern):
        600k input rows reduce to ~6 partial rows per batch BEFORE any
        shuffle.  Money is per-row-rounded integer cents: int sums are EXACT
        under any partial-aggregation order, so Ray and DuckDB agree
        bit-for-bit."""
        from ..functions.rounding import round_half_away

        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us"))))
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas(),
                "l_linestatus": t["l_linestatus"].to_pandas(),
                "qty": t["l_quantity"].to_numpy(zero_copy_only=False),
                "base_cents": round_half_away(ext * 100.0).astype(np.int64),
                "disc_cents": round_half_away(ext * (1.0 - disc) * 100.0).astype(np.int64),
            }
        )
        p = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty=("qty", "sum"),
                sum_base_price_cents=("base_cents", "sum"),
                sum_disc_price_cents=("disc_cents", "sum"),
                count_order=("qty", "size"),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(p, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
            Sum("sum_disc_price_cents", alias_name="sum_disc_price_cents"),
            Sum("count_order", alias_name="count_order"),
        )
    )
    from ..functions.rounding import round_half_away

    pdf = out.to_pandas()
    pdf["sum_base_price_cents"] = pdf["sum_base_price_cents"].astype("int64")
    pdf["sum_disc_price_cents"] = pdf["sum_disc_price_cents"].astype("int64")
    pdf["count_order"] = pdf["count_order"].astype("int64")
    # avg from exact partial sums (sum of integral-valued doubles is exact)
    pdf["avg_qty"] = round_half_away(pdf["sum_qty"].to_numpy() / pdf["count_order"].to_numpy(), 2)
    return pdf


def q_minmax_by_year(sf_dir: str):
    """Extent-union analog (A1/A2): min/max are exact, no float-sum issues."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_year": pc.year(t["o_orderdate"]),
                "o_totalprice": t["o_totalprice"],
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Min("o_totalprice", alias_name="min_price"),
            Max("o_totalprice", alias_name="max_price"),
            Count(alias_name="n_orders"),
        )
    )


def q_count_by_type(sf_dir: str):
    """Pre-aggregated counts: partial value_counts per batch, tiny final
    groupby over partials (the A-series partial+final pattern)."""
    ds = _t(sf_dir, "events", ["event_type"])

    def partial(t: pa.Table) -> pa.Table:
        vc = t["event_type"].combine_chunks().value_counts()
        return pa.table({"event_type": vc.field("values"), "n": vc.field("counts")})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"))
    )


def q_duplicate_ids(sf_dir: str):
    """A5: duplicate detection — (user_id, event_type) pairs seen > 5 times."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])
    out = ds.groupby(["user_id", "event_type"]).aggregate(Count(alias_name="n"))
    return out.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 5)), batch_format="pyarrow"
    )


# --- joins ------------------------------------------------------------------


def q_join_broadcast(sf_dir: str):
    """J1: small side (customer) broadcast via ray.put, probed per batch —
    no shuffle."""
    cust = (
        _t(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
        .to_pandas()
    )
    cust = cust[cust["c_mktsegment"] == "BUILDING"]
    ref = ray.put(cust.set_index("c_custkey")[["c_name"]])

    class Probe:
        def __init__(self):
            self.cust = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            j = df.merge(self.cust, left_on="o_custkey", right_index=True, how="inner")
            return pa.Table.from_pandas(
                j[["o_orderkey", "o_custkey", "o_totalprice", "c_name"]], preserve_index=False
            )

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return orders.map_batches(Probe, batch_format="pyarrow", concurrency=(1, 4))


def q_join_hash(sf_dir: str):
    """Large-large hash join: Ray's partitioned ``Dataset.join`` (lineitem x
    orders on orderkey), then a grouped aggregate."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        cents = round_half_away(ext * (1.0 - disc) * 100.0).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_cents": pa.array(cents)})

    li = li.map_batches(rev, batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def oyear(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_year": pc.year(t["o_orderdate"]),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    orders = orders.map_batches(oyear, batch_format="pyarrow")
    joined = li.join(
        orders, join_type="inner", num_partitions=cluster_partitions(),
        on=("l_orderkey",), right_on=("o_orderkey",)
    )
    out = joined.groupby(["o_year", "o_orderpriority"]).aggregate(
        Sum("rev_cents", alias_name="revenue_cents"), Count(alias_name="n_lines")
    )
    pdf = out.to_pandas()
    pdf["revenue_cents"] = pdf["revenue_cents"].astype("int64")
    return pdf


def q_anti_join(sf_dir: str):
    """J2/M20 anti-join as a PARTITIONED left-outer join: distinct probe
    keys stay distributed, join against the build side, keep rows with no
    match (null marker).  Scale-safe for any key cardinality — round 1
    broadcast the key set, which only worked because the filter made it
    small."""

    def pred(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["o_totalprice"], 300000.0))
        return pa.table({"o_custkey": t["o_custkey"],
                         "_hit": pa.array(np.ones(t.num_rows, dtype=np.int8))})

    keys = (
        _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(pred, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Max("_hit", alias_name="_hit"))
    )
    out = _t(sf_dir, "customer", ["c_custkey", "c_name"]).join(
        keys,
        join_type="left_outer",
        num_partitions=cluster_partitions(),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def keep_unmatched(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["_hit"]))

    return out.map_batches(keep_unmatched, batch_format="pyarrow").select_columns(
        ["c_custkey", "c_name"]
    )


def q_semi_join(sf_dir: str):
    """J3 semi-join as a PARTITIONED join: the probe side's distinct keys
    stay distributed (grouped, never collected to the driver) and hash-join
    against the build side — scale-safe for any key cardinality (round 1
    broadcast the full distinct l_partkey set, which only worked because
    TPC-H part keys are small)."""
    keys = (
        _t(sf_dir, "lineitem", ["l_partkey"])
        .groupby("l_partkey")
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    out = _t(sf_dir, "part", ["p_partkey", "p_name"]).join(
        keys,
        join_type="inner",
        num_partitions=cluster_partitions(),
        on=("p_partkey",),
        right_on=("l_partkey",),
    )
    return out.select_columns(["p_partkey", "p_name"])


# --- dedup / sort / top-k / union ------------------------------------------


def q_dedup_first(sf_dir: str):
    """O5 exact dedup keep-first: hash-partition on the key, per-group first
    by (ts, event_id) — no global state (vs the reference's driver-side
    ``set``, terracatalog.py:517-519)."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid * 2654435761) % 64))

    def first_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per bucket of many (user, type) groups
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"], kind="stable")
        g = g.drop_duplicates(subset=["user_id", "event_type"], keep="first")
        g = g[["user_id", "event_type", "event_id", "ts"]]
        return g.rename(columns={"event_id": "first_event_id", "ts": "first_ts"})

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(16)
        .groupby("bucket")
        .map_groups(first_in_bucket, batch_format="pandas")
    )


def q_top_orders(sf_dir: str):
    """O1-O3 sort + limit with deterministic tie-break."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def q_union_names(sf_dir: str):
    """O6 union of two sources with provenance tag."""
    r = _t(sf_dir, "region", ["r_name"]).map_batches(
        lambda t: pa.table({"name": t["r_name"], "src": pa.array(["region"] * t.num_rows)}),
        batch_format="pyarrow",
    )
    n = _t(sf_dir, "nation", ["n_name"]).map_batches(
        lambda t: pa.table({"name": t["n_name"], "src": pa.array(["nation"] * t.num_rows)}),
        batch_format="pyarrow",
    )
    return r.union(n)


# --- windows (streaming-shaped, §2.8) ---------------------------------------


def q_running_sum(sf_dir: str):
    """Per-user running sum over the ordered event log (ordering assumption:
    (ts, event_id) defines the stream order within a user partition).

    BUCKETED: one shuffle on crc-mixed ``user_id % 64``, then a single
    vectorized pandas grouped-cumsum per bucket — not one Python call per
    user (the same 10-100x lesson as item assembly)."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid * 2654435761) % 64))

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.rounding import round_half_away

        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        v4 = round_half_away(g["value"].to_numpy() * 10000.0).astype("int64")
        g["running_value_e4"] = (
            pd.Series(v4, index=g.index).groupby(g["user_id"], sort=False).cumsum()
        )
        return g[["event_id", "user_id", "running_value_e4"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(16)
        .groupby("bucket")
        .map_groups(run_bucket, batch_format="pandas")
    )


def q_hourly_window(sf_dir: str):
    """Tumbling 1-hour event-time window per user: window start + count +
    sum (windows as groupby over floored event time)."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        v4 = round_half_away(t["value"].to_numpy(zero_copy_only=False) * 10000.0).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "window_start": pc.floor_temporal(t["ts"], unit="hour"),
                "value_e4": pa.array(v4),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        .aggregate(Sum("value_e4", alias_name="sum_value_e4"), Count(alias_name="n_events"))
    )
    pdf = out.to_pandas()
    pdf["sum_value_e4"] = pdf["sum_value_e4"].astype("int64")
    return pdf


# --- json / explode (M16 flatten-JSON; §2.7 json fns) -----------------------


def q_json_extract(sf_dir: str):
    """Flatten the events.props JSON column (engine twin of the reference's
    product-JSON flatten, terracatalog.py:623-698): extract $.k as an int."""
    ds = _t(sf_dir, "events", ["event_id", "props"])

    def fn(t: pa.Table) -> pa.Table:
        import json as _json

        ks = np.fromiter(
            (_json.loads(p or "{}").get("k", -1) for p in t["props"].to_pylist()),
            dtype=np.int64,
            count=t.num_rows,
        )
        return pa.table({"event_id": t["event_id"], "k": pa.array(ks)})

    return ds.map_batches(fn, batch_format="pyarrow")


def q_word_freq(sf_dir: str):
    """Word-frequency explode over documents (flat_map + pre-aggregated
    count): partial value_counts per batch, tiny final groupby."""
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.lower().str.split().explode().dropna()
        vc = s.value_counts()
        return pa.table({"word": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                         "n": pa.array(vc.to_numpy())})

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )


# --- composite joins / sessionization / skew (round-1 additions) ------------


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: 3-way join (broadcast dimension + partitioned hash
    join) -> grouped exact-cents revenue, top 10 by (revenue desc, key)."""
    from ..functions.rounding import round_half_away

    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    keys = pa.array(sorted(set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])))
    ref = ray.put(keys)

    class KeepBuilding:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["o_custkey"], value_set=self.keys))

    orders = (
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(KeepBuilding, batch_format="pyarrow", concurrency=(1, 2))
        .map_batches(
            lambda t: pa.table({"o_orderkey": t["o_orderkey"]}),
            batch_format="pyarrow",
        )
    )

    def rev(t: pa.Table) -> pa.Table:
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        cents = round_half_away(ext * (1.0 - disc) * 100.0).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_cents": pa.array(cents)})

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        rev, batch_format="pyarrow"
    )
    joined = li.join(orders, join_type="inner", num_partitions=cluster_partitions(),
                     on=("l_orderkey",), right_on=("o_orderkey",))
    out = joined.groupby("l_orderkey").aggregate(Sum("rev_cents", alias_name="revenue_cents"))
    pdf = out.to_pandas()
    pdf["revenue_cents"] = pdf["revenue_cents"].astype("int64")
    pdf = pdf.sort_values(["revenue_cents", "l_orderkey"], ascending=[False, True]).head(10)
    return pdf.reset_index(drop=True)


def q_sessionize(sf_dir: str):
    """Session windows (streaming §2.8): per user, a new session starts when
    the gap to the previous event exceeds 30 minutes; emits per-session
    (user_id, session_start, n_events, duration_sec).  Ordering assumption:
    (ts, event_id) defines stream order within a user partition."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        # bucketed: many users per group, vectorized inside
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = g["user_id"] != g["user_id"].shift(1)
        gap = g["ts"].diff().dt.total_seconds()
        new_session = new_user | (gap > 1800.0)
        sid = new_session.cumsum()
        agg = g.groupby(sid, sort=False).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "first"),
            session_end=("ts", "last"),
            n_events=("event_id", "size"),
        )
        # exact integer microseconds (timestamps are timestamp[us]); SQL
        # date_diff('second') counts boundary crossings, not elapsed time
        agg["duration_us"] = (
            agg["session_end"].astype("datetime64[us]").astype("int64")
            - agg["session_start"].astype("datetime64[us]").astype("int64")
        )
        return agg[["user_id", "session_start", "n_events", "duration_us"]]

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid * 2654435761) % 32))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(16)
        .groupby("bucket")
        .map_groups(sessions, batch_format="pandas")
    )


def q_salted_agg(sf_dir: str):
    """Skew-aware aggregation end-to-end: detect hot event_type keys, salt
    them, aggregate per salted key, merge salt partials — must equal a plain
    GROUP BY (the oracle).  Demonstrates state/skew.py correctness."""
    from ..functions.rounding import round_half_away
    from ..state.skew import add_salted_key, detect_hot_keys

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def to_e4(t: pa.Table) -> pa.Table:
        v4 = round_half_away(t["value"].to_numpy(zero_copy_only=False) * 10000.0).astype(np.int64)
        return pa.table({"event_type": t["event_type"], "value_e4": pa.array(v4)})

    ds = ds.map_batches(to_e4, batch_format="pyarrow")
    hot = detect_hot_keys(ds, "event_type", threshold=100)
    salted = add_salted_key(ds, "event_type", hot)
    per_salt = salted.groupby("salted_key").aggregate(
        Sum("value_e4", alias_name="sum_value_e4"), Count(alias_name="n")
    )

    def merge(t: pa.Table) -> pa.Table:
        keys = [k.rsplit("#", 1)[0] for k in t["salted_key"].to_pylist()]
        return pa.table(
            {"event_type": pa.array(keys), "sum_value_e4": t["sum_value_e4"], "n": t["n"]}
        )

    out = (
        per_salt.map_batches(merge, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("sum_value_e4", alias_name="sum_value_e4"), Sum("n", alias_name="n"))
    )
    pdf = out.to_pandas()
    pdf["sum_value_e4"] = pdf["sum_value_e4"].astype("int64")
    pdf["n"] = pdf["n"].astype("int64")
    return pdf


def asof_join_bucketed(left, right, by: str, on: str,
                       direction: str = "backward", num_buckets: int = None):
    """Generic AS-OF join — an operator Ray Data lacks (SURVEY.md §2.8
    "custom operators"): for every left row, the single right row with the
    greatest ``on`` <= left ``on`` (direction='backward') sharing the same
    ``by`` key; inner semantics (left rows with no match are dropped),
    matching DuckDB's ``ASOF JOIN``.

    Composition: tag sides -> ONE shuffle on ``hash(by) % num_buckets`` ->
    per-bucket vectorized ``pd.merge_asof`` (sort within bucket).
    Partitioning assumption (documented per the task brief): all rows of
    one ``by`` key land in the same bucket, so the per-bucket merge is
    exact; bucket count bounds reducer fan-in at any corpus size.

    ``left`` / ``right`` are Datasets whose non-key columns are disjoint
    (rename upstream if not); right's ``on`` is re-emitted as
    ``{on}_right`` so callers keep the matched timestamp."""
    if num_buckets is None:
        num_buckets = max(64, cluster_partitions(per_cpu=2.0))
    l_cols = [c for c in left.schema().names if c not in (by, on)]
    r_cols = [c for c in right.schema().names if c not in (by, on)]

    def tag(side: int, other_cols, keep_cols):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {by: t[by], on: t[on],
                    "_side": pa.array(np.full(n, side, dtype=np.int8))}
            uid = t[by].to_numpy(zero_copy_only=False)
            cols["_bucket"] = pa.array((uid * 2654435761) % num_buckets)
            for c in keep_cols:
                cols[c] = t[c]
            for c in other_cols:  # null-fill the other side's columns
                cols[c] = pa.nulls(n)
            if side == 1:
                cols[f"{on}_right"] = t[on]
            else:
                cols[f"{on}_right"] = pa.nulls(n, pa.timestamp("us"))
            return pa.table(cols)

        return fn

    lt = left.map_batches(tag(0, r_cols, l_cols), batch_format="pyarrow")
    rt = right.map_batches(tag(1, l_cols, r_cols), batch_format="pyarrow")

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][[by, on] + l_cols].sort_values(on, kind="stable")
        rg = g[g["_side"] == 1][[by, on, f"{on}_right"] + r_cols].sort_values(on, kind="stable")
        if len(lg) == 0 or len(rg) == 0:
            return pd.DataFrame(columns=[by, on] + l_cols + [f"{on}_right"] + r_cols)
        m = pd.merge_asof(lg, rg, on=on, by=by, direction=direction,
                          allow_exact_matches=True)
        m = m.dropna(subset=[f"{on}_right"])  # inner semantics
        return m[[by, on] + l_cols + [f"{on}_right"] + r_cols]

    return lt.union(rt).groupby("_bucket").map_groups(merge_bucket, batch_format="pandas")


def q_asof_join(sf_dir: str):
    """AS-OF join over the event log: for every 'view' event, the latest
    'click' (ts, value) of the same user at or before it.  The right side
    is pre-aggregated to one row per (user_id, ts) so ties are
    deterministic on both engines."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts", "value"])

    views = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "view")).select(
            ["event_id", "user_id", "ts"]),
        batch_format="pyarrow",
    )
    clicks = (
        ds.map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "click")).select(
                ["user_id", "ts", "value"]),
            batch_format="pyarrow",
        )
        .groupby(["user_id", "ts"])
        .aggregate(Max("value", alias_name="click_value"))
    )
    out = asof_join_bucketed(views, clicks, by="user_id", on="ts")
    return out.map_batches(
        # event_id comes back float64 (the tag stage null-fills the other
        # side's columns, so pandas promotes int64 + NaN) — cast back
        lambda t: pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                            "user_id": t["user_id"],
                            "ts": t["ts"], "click_ts": t["ts_right"],
                            "click_value": t["click_value"]}),
        batch_format="pyarrow",
    )


SQL_ASOF_JOIN = (
    "WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'), "
    "c AS (SELECT user_id, ts, max(value) AS click_value FROM events "
    "WHERE event_type = 'click' GROUP BY 1, 2) "
    "SELECT v.event_id, v.user_id, v.ts, c.ts AS click_ts, c.click_value "
    "FROM v ASOF JOIN c ON v.user_id = c.user_id AND v.ts >= c.ts"
)


def grouped_topk(ds, group_cols, order_col: str, k: int,
                 tie_cols=None, descending: bool = True):
    """Per-group top-k — the A-series combiner pattern applied to ranking:
    each batch keeps at most k rows per group BEFORE the shuffle (so the
    exchange moves O(groups x k) rows per batch, never the corpus), then a
    final per-group top-k.  Deterministic under ties via ``tie_cols``."""
    group_cols = list(group_cols)
    tie_cols = list(tie_cols or [])
    sort_cols = [order_col] + tie_cols
    ascending = [not descending] + [True] * len(tie_cols)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(sort_cols, ascending=ascending, kind="stable")
        return pa.Table.from_pandas(df.groupby(group_cols, sort=False).head(k),
                                    preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=ascending, kind="stable")
        return g.groupby(group_cols, sort=False).head(k)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_cols)
        .map_groups(final, batch_format="pandas")
    )


def q_topk_per_group(sf_dir: str):
    """Per-segment top-3 orders by totalprice (deterministic o_orderkey
    tie-break) — the windowed-rank shape (ROW_NUMBER() OVER) as a
    combine-then-reduce top-k, no global sort."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    ref = ray.put(cust.set_index("c_custkey")["c_mktsegment"])

    class Seg:
        def __init__(self):
            self.seg = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df["c_mktsegment"] = df["o_custkey"].map(self.seg)
            return pa.Table.from_pandas(
                df[["c_mktsegment", "o_orderkey", "o_totalprice"]], preserve_index=False)

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    tagged = orders.map_batches(Seg, batch_format="pyarrow", concurrency=(1, 4))
    return grouped_topk(tagged, ["c_mktsegment"], "o_totalprice", k=3,
                        tie_cols=["o_orderkey"])


SQL_TOPK_PER_GROUP = (
    "SELECT c_mktsegment, o_orderkey, o_totalprice FROM ("
    "SELECT c_mktsegment, o_orderkey, o_totalprice, "
    "ROW_NUMBER() OVER (PARTITION BY c_mktsegment "
    "ORDER BY o_totalprice DESC, o_orderkey) AS rn "
    "FROM orders JOIN customer ON o_custkey = c_custkey) WHERE rn <= 3"
)


def q_grouped_quantiles(sf_dir: str):
    """Discrete quantiles per group over a BOUNDED-cardinality value column
    (l_quantity has <= 50 distinct values): per-batch value_counts partials
    -> one tiny groupby-sum -> quantile from cumulative counts.  Exact at
    any scale with O(groups x distinct-values) shuffle — never a sort of
    the corpus.  Matches DuckDB's ``quantile_disc`` (value at 1-based rank
    ceil(q * n))."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"l_returnflag": t["l_returnflag"].to_pandas(),
                           "l_quantity": t["l_quantity"].to_numpy(zero_copy_only=False)})
        p = df.value_counts(["l_returnflag", "l_quantity"]).reset_index(name="n")
        return pa.Table.from_pandas(p, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_quantity"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("l_quantity", kind="stable")
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        vals = g["l_quantity"].to_numpy()
        out = {"l_returnflag": [g["l_returnflag"].iloc[0]], "n": [total]}
        for q, name in ((0.5, "p50"), (0.9, "p90")):
            rank = int(np.ceil(q * total))
            out[name] = [float(vals[np.searchsorted(cum, rank)])]
        return pd.DataFrame(out)

    out = counts.groupby("l_returnflag").map_groups(quantiles, batch_format="pandas")
    pdf = out.to_pandas()
    pdf["n"] = pdf["n"].astype("int64")
    return pdf[["l_returnflag", "p50", "p90", "n"]]


SQL_GROUPED_QUANTILES = (
    "SELECT l_returnflag, quantile_disc(l_quantity, 0.5) AS p50, "
    "quantile_disc(l_quantity, 0.9) AS p90, COUNT(*) AS n "
    "FROM lineitem GROUP BY l_returnflag"
)


# --- KMV distinct-count sketch (the brief's "novel sketch" custom op) -------

_KMV_P = (1 << 61) - 1  # Mersenne prime; all intermediates fit int64
_KMV_A = 2654435761
_KMV_A2 = 2245908103
_KMV_B = 1013904223


def _kmv_hash(x: np.ndarray) -> np.ndarray:
    """Two multiplicative rounds mod the Mersenne prime P = 2^61-1,
    int64-safe (and therefore BIGINT-safe for the SQL twin): round 1
    (x*A+B) doesn't wrap for small ids, so round 2 multiplies by a 32-bit
    constant using the split identity t*2^30 ≡ (t & (2^31-1))*2^30 +
    (t >> 31) (mod P, because 2^61 ≡ 1) — every product stays < 2^63."""
    h1 = (x.astype(np.int64) * _KMV_A + _KMV_B) % _KMV_P
    lo = h1 & ((1 << 30) - 1)
    hi = h1 >> 30
    term1 = (lo * _KMV_A2) % _KMV_P
    t = (hi * _KMV_A2) % _KMV_P
    term2 = (((t & ((1 << 31) - 1)) << 30) + (t >> 31)) % _KMV_P
    return (term1 + term2) % _KMV_P


def _kmv_hash_wide(x: np.ndarray) -> np.ndarray:
    """_kmv_hash for FULL-DOMAIN inputs x < P (the plain round-1 multiply
    x*A only stays in int64 for small ids): round 1 uses the same split
    identity round 2 does — x = x_hi*2^30 + x_lo, and t*2^30 ≡
    (t & (2^31-1))*2^30 + (t >> 31) (mod P, since 2^61 ≡ 1) — so every
    product stays < 2^63 and the BIGINT SQL twin is exact."""
    x = x.astype(np.int64) % _KMV_P
    x_lo = x & ((1 << 30) - 1)
    x_hi = x >> 30
    t = (x_hi * _KMV_A) % _KMV_P
    part = (((t & ((1 << 31) - 1)) << 30) + (t >> 31)) % _KMV_P
    h1 = ((x_lo * _KMV_A) % _KMV_P + part + _KMV_B) % _KMV_P
    lo = h1 & ((1 << 30) - 1)
    hi = h1 >> 30
    term1 = (lo * _KMV_A2) % _KMV_P
    t2 = (hi * _KMV_A2) % _KMV_P
    term2 = (((t2 & ((1 << 31) - 1)) << 30) + (t2 >> 31)) % _KMV_P
    return (term1 + term2) % _KMV_P


def kmv_partial(values: np.ndarray, k: int) -> np.ndarray:
    """k smallest DISTINCT deterministic hashes of ``values`` — the
    mergeable KMV (k-minimum-values) sketch partial.  Bounded state: k
    int64s per group regardless of input size; merging = union + re-take
    k smallest (associative + commutative + idempotent)."""
    hv = np.unique(_kmv_hash(values))  # sorted distinct
    return hv[:k]


def kmv_estimate(mins: np.ndarray, k: int) -> int:
    """<k hashes -> exact distinct count; else the KMV estimator
    floor((k-1) * P / h_k) (Bar-Yossef et al. 2002), integer division so
    the SQL twin reproduces it bit-for-bit."""
    if len(mins) < k:
        return int(len(mins))
    return ((k - 1) * _KMV_P) // int(mins[k - 1])


def q_distinct_sketch(sf_dir: str):
    """Approximate distinct users per event type via a mergeable KMV
    sketch: per-batch partials (k smallest distinct hashes) -> per-group
    merge -> estimator.  The shuffle moves <= k int64s per (batch, group)
    — never the id universe — and the whole computation is DETERMINISTIC,
    so the DuckDB oracle reproduces the sketch itself (same hash, same
    rank-k selection, same integer division), not just a tolerance band.
    k=256 -> ~6% relative error (1/sqrt(k)); exact below k distinct."""
    K = 256
    ds = _t(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "user_id": t["user_id"].to_numpy(zero_copy_only=False)})
        rows = [(et, hv) for et, g in df.groupby("event_type", sort=False)
                for hv in kmv_partial(g["user_id"].to_numpy(), K)]
        return pa.table({"event_type": pa.array([r[0] for r in rows]),
                         "hv": pa.array(np.array([r[1] for r in rows], dtype=np.int64))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        mins = np.unique(g["hv"].to_numpy())[:K]
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "approx_distinct_users": [kmv_estimate(mins, K)]})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
    )
    pdf = out.to_pandas()
    pdf["approx_distinct_users"] = pdf["approx_distinct_users"].astype("int64")
    return pdf


SQL_DISTINCT_SKETCH = (
    # the SAME deterministic sketch in SQL: hash (two mod-P rounds via the
    # Mersenne split, BIGINT-safe), rank-k distinct minimum, integer-
    # division estimator — byte-identical to the Ray side
    f"WITH h1 AS (SELECT DISTINCT event_type, "
    f"(user_id * {_KMV_A} + {_KMV_B}) % {_KMV_P} AS h FROM events), "
    f"t AS (SELECT event_type, ((h % 1073741824) * {_KMV_A2}) % {_KMV_P} AS term1, "
    f"(((h // 1073741824) * {_KMV_A2}) % {_KMV_P}) AS tt FROM h1), "
    f"h AS (SELECT DISTINCT event_type, "
    f"(term1 + ((tt % 2147483648) * 1073741824 + tt // 2147483648) % {_KMV_P}) % {_KMV_P} AS hv FROM t), "
    "r AS (SELECT event_type, hv, "
    "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn, "
    "COUNT(*) OVER (PARTITION BY event_type) AS nd FROM h) "
    f"SELECT event_type, CAST(CASE WHEN nd < 256 THEN nd "
    f"ELSE (255::HUGEINT * {_KMV_P}) // hv END AS BIGINT) AS approx_distinct_users "
    "FROM r WHERE rn = CASE WHEN nd < 256 THEN nd ELSE 256 END"
)


def interval_join_bucketed(points, intervals, t_col: str, id_col: str,
                           t0_col: str, t1_col: str,
                           bucket_us: int = 3_600_000_000):
    """Generic INTERVAL (range) join — another operator Ray Data lacks:
    match every point row to every interval with ``t0 <= t < t1``, with NO
    equi-key.  Composition: the time axis is cut into fixed buckets;
    intervals REPLICATE to each bucket they overlap (flat_map — an
    interval costs ceil(span/bucket) rows), points hash to one bucket,
    one shuffle on bucket, then a vectorized within-bucket band filter.
    Partitioning assumption (documented): bucket width is chosen so that
    per-bucket point x interval products stay small; replication factor =
    mean interval span / bucket width."""
    import pyarrow.compute as _pc

    def pt(t: pa.Table) -> pa.Table:
        ts = t[t_col].to_numpy(zero_copy_only=False).astype("M8[us]").astype("int64")
        return pa.table({"_bucket": pa.array(ts // bucket_us),
                         t_col: t[t_col],
                         "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                         id_col: pa.nulls(t.num_rows, pa.int64()),
                         t0_col: pa.nulls(t.num_rows, pa.timestamp("us")),
                         t1_col: pa.nulls(t.num_rows, pa.timestamp("us"))})

    def iv(t: pa.Table) -> pa.Table:
        t0 = t[t0_col].to_numpy(zero_copy_only=False).astype("M8[us]").astype("int64")
        t1 = t[t1_col].to_numpy(zero_copy_only=False).astype("M8[us]").astype("int64")
        b0 = t0 // bucket_us
        b1 = np.maximum((t1 - 1) // bucket_us, b0)  # t1 exclusive
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows), reps)
        offs = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps)
        tb = t.take(pa.array(idx))
        return pa.table({"_bucket": pa.array(b0[idx] + offs),
                         t_col: pa.nulls(len(idx), pa.timestamp("us")),
                         "_side": pa.array(np.ones(len(idx), dtype=np.int8)),
                         id_col: tb[id_col],
                         t0_col: tb[t0_col],
                         t1_col: tb[t1_col]})

    both = points.map_batches(pt, batch_format="pyarrow").union(
        intervals.map_batches(iv, batch_format="pyarrow"))

    def match(g: pd.DataFrame, p_chunk: int = 8192) -> pd.DataFrame:
        p = g[g["_side"] == 0]
        w = g[g["_side"] == 1]
        if len(p) == 0 or len(w) == 0:
            return pd.DataFrame(columns=[t_col, id_col])
        t0 = w[t0_col].to_numpy().astype("M8[us]").astype("int64")[None, :]
        t1 = w[t1_col].to_numpy().astype("M8[us]").astype("int64")[None, :]
        wids = w[id_col].to_numpy()
        pts_all = p[t_col].to_numpy()
        outs = []
        # chunk the point axis so a hot bucket's point x interval matrix
        # stays bounded (skew safety, same q_chunk lesson as knn_join)
        for s0 in range(0, len(p), p_chunk):
            pts = pts_all[s0:s0 + p_chunk]
            ts = pts.astype("M8[us]").astype("int64")[:, None]
            pi, wi = np.nonzero((ts >= t0) & (ts < t1))
            outs.append(pd.DataFrame({t_col: pts[pi], id_col: wids[wi]}))
        return pd.concat(outs, ignore_index=True)

    return both.groupby("_bucket").map_groups(match, batch_format="pandas")


def q_interval_join(sf_dir: str):
    """Windows = the top-20 events by (value desc, event_id) opening a
    1-hour window each; count events inside every window (no equi-key —
    a pure range join)."""
    ds = _t(sf_dir, "events", ["event_id", "ts", "value"])
    top = ds.sort(["value", "event_id"], descending=[True, False]).limit(20)

    def mk_win(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("M8[us]")
        return pa.table({"window_id": t["event_id"],
                         "t0": pa.array(ts, pa.timestamp("us")),
                         "t1": pa.array(ts + np.timedelta64(1, "h"), pa.timestamp("us"))})

    windows = top.map_batches(mk_win, batch_format="pyarrow")
    points = _t(sf_dir, "events", ["ts"])
    joined = interval_join_bucketed(points, windows, t_col="ts",
                                    id_col="window_id", t0_col="t0", t1_col="t1")
    out = joined.groupby("window_id").aggregate(Count(alias_name="n_events"))
    pdf = out.to_pandas()
    pdf["window_id"] = pdf["window_id"].astype("int64")
    pdf["n_events"] = pdf["n_events"].astype("int64")
    return pdf


SQL_INTERVAL_JOIN = (
    "WITH w AS (SELECT event_id AS window_id, ts AS t0, "
    "ts + INTERVAL 1 HOUR AS t1 FROM events "
    "ORDER BY value DESC, event_id LIMIT 20) "
    "SELECT w.window_id, COUNT(*) AS n_events FROM w "
    "JOIN events e ON e.ts >= w.t0 AND e.ts < w.t1 GROUP BY 1"
)


# --- frame windows / pivot / grouping sets / set ops / sampling (round 3) ----


def q_moving_avg(sf_dir: str):
    """Frame-window aggregates per user over the ordered event log: a
    4-row moving sum (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) and a
    lag-delta (value - previous value, 0 for the first row).  Same bucketed
    execution as ``q_running_sum``: ONE shuffle on a crc-mixed user bucket,
    then one vectorized pandas rolling/shift pass per bucket — never a
    Python call per user, never a global sort.  Values are per-row-rounded
    integer e4 so partial order can't perturb the result."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid * 2654435761) % 64))

    def win_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.rounding import round_half_away

        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        v4 = pd.Series(
            round_half_away(g["value"].to_numpy() * 10000.0).astype("int64"),
            index=g.index,
        )
        grp = v4.groupby(g["user_id"], sort=False)
        g["moving_sum4_e4"] = grp.rolling(4, min_periods=1).sum().reset_index(
            level=0, drop=True).astype("int64")
        g["delta_e4"] = (v4 - grp.shift(1).fillna(v4)).astype("int64")
        return g[["event_id", "user_id", "moving_sum4_e4", "delta_e4"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(16)
        .groupby("bucket")
        .map_groups(win_bucket, batch_format="pandas")
    )


SQL_MOVING_AVG = (
    "WITH v AS (SELECT event_id, user_id, ts, "
    "CAST(ROUND(value * 10000, 0) AS BIGINT) AS v4 FROM events) "
    "SELECT event_id, user_id, "
    "CAST(SUM(v4) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_sum4_e4, "
    "CAST(v4 - COALESCE(lag(v4) OVER (PARTITION BY user_id ORDER BY ts, event_id), v4) "
    "AS BIGINT) AS delta_e4 FROM v"
)


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_events(sf_dir: str):
    """PIVOT: event_type fanned out into one count column per type, one row
    per user.  Per-batch partial crosstab (rows reduce to <= users-per-batch
    BEFORE the shuffle), then a Sum-per-column groupby — the wide shuffle
    moves k int64s per (user, batch), never the event rows."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(zero_copy_only=False),
                           "event_type": t["event_type"].to_pandas()})
        ct = pd.crosstab(df["user_id"], df["event_type"])
        out = {"user_id": ct.index.to_numpy()}
        for ty in _PIVOT_TYPES:
            col = ct[ty].to_numpy() if ty in ct.columns else np.zeros(len(ct), dtype=np.int64)
            out[f"n_{ty}"] = col.astype(np.int64)
        return pa.table(out)

    aggs = [Sum(f"n_{ty}", alias_name=f"n_{ty}") for ty in _PIVOT_TYPES]
    out = ds.map_batches(partial, batch_format="pyarrow").groupby("user_id").aggregate(*aggs)
    pdf = out.to_pandas()
    for ty in _PIVOT_TYPES:
        pdf[f"n_{ty}"] = pdf[f"n_{ty}"].astype("int64")
    return pdf


SQL_PIVOT_EVENTS = (
    "SELECT user_id, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{ty}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{ty}"
        for ty in _PIVOT_TYPES
    )
    + " FROM events GROUP BY user_id"
)


def q_rollup_counts(sf_dir: str):
    """GROUPING SETS / ROLLUP: per-event_type counts + exact-cents value sum
    PLUS the grand-total row, in one pass.  The partial combiner emits BOTH
    grouping levels per batch (per-type rows and an '__all__' row), so the
    rollup costs one tiny groupby — no second scan for the total."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        df = pd.DataFrame({"event_type": t["event_type"].to_pandas()})
        df["v4"] = round_half_away(
            t["value"].to_numpy(zero_copy_only=False) * 10000.0).astype("int64")
        g = df.groupby("event_type", sort=False)["v4"].agg(["sum", "size"]).reset_index()
        rows_type = pa.table({"event_type": pa.array(g["event_type"], pa.string()),
                              "sum_value_e4": pa.array(g["sum"].to_numpy()),
                              "n": pa.array(g["size"].to_numpy().astype(np.int64))})
        rows_all = pa.table({"event_type": pa.array(["__all__"]),
                             "sum_value_e4": pa.array([int(df["v4"].sum())]),
                             "n": pa.array([len(df)])})
        return pa.concat_tables([rows_type, rows_all])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("sum_value_e4", alias_name="sum_value_e4"), Sum("n", alias_name="n"))
    )
    pdf = out.to_pandas()
    pdf["sum_value_e4"] = pdf["sum_value_e4"].astype("int64")
    pdf["n"] = pdf["n"].astype("int64")
    return pdf


SQL_ROLLUP_COUNTS = (
    "SELECT COALESCE(event_type, '__all__') AS event_type, "
    "CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_value_e4, "
    "COUNT(*) AS n FROM events "
    "GROUP BY GROUPING SETS ((event_type), ())"
)


def q_intersect_except(sf_dir: str):
    """Distributed INTERSECT/EXCEPT as ONE bitmask aggregation: customers
    with an open ('O') order INTERSECT customers with a filled ('F') order
    EXCEPT customers owning any order > 400000.  Each batch reduces to one
    3-bit membership mask per customer (bitwise-OR partials via Max), so
    the set algebra costs a single small shuffle — not three distincts plus
    two joins."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                           "st": t["o_orderstatus"].to_pandas(),
                           "tp": t["o_totalprice"].to_numpy(zero_copy_only=False)})
        df["m"] = ((df["st"] == "O").to_numpy().astype(np.int64)
                   | ((df["st"] == "F").to_numpy().astype(np.int64) << 1)
                   | ((df["tp"] > 400000.0).astype(np.int64).to_numpy() << 2))
        g = df.groupby("o_custkey", sort=False)["m"].agg(
            lambda s: int(np.bitwise_or.reduce(s.to_numpy())))
        return pa.table({"o_custkey": pa.array(g.index.to_numpy()),
                         "m": pa.array(g.to_numpy(dtype=np.int64))})

    # bitwise-OR of masks == Max per bit only when partials already OR their
    # bits together; after the per-batch OR above, a per-bit OR across
    # partials is NOT Max(m) — finish with a tiny map_groups OR instead.
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = int(np.bitwise_or.reduce(g["m"].to_numpy()))
        return pd.DataFrame({"o_custkey": [g["o_custkey"].iloc[0]], "m": [m]})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(merge, batch_format="pandas")
    )

    def keep(t: pa.Table) -> pa.Table:
        m = t["m"].to_numpy(zero_copy_only=False)
        mask = (m & 1).astype(bool) & (m & 2).astype(bool) & ~(m & 4).astype(bool)
        return pa.table({"o_custkey": pa.array(t["o_custkey"].to_numpy(
            zero_copy_only=False)[mask])})

    return out.map_batches(keep, batch_format="pyarrow")


SQL_INTERSECT_EXCEPT = (
    "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' "
    "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
    "EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 400000"
)


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: ~10% of events per event_type
    stratum, selected by the engine's Mersenne-mod multiplicative hash of
    event_id (``_kmv_hash`` — the same hash the KMV sketch uses), so the
    sample is reproducible on any cluster size / partition layout and the
    SQL oracle reproduces the exact row set.  Embarrassingly parallel: a
    vectorized per-batch mask, no shuffle at all."""
    ds = _t(sf_dir, "events", ["event_id", "event_type", "user_id"])

    def pick(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        mask = (_kmv_hash(ids) % 10) == 0
        return t.filter(pa.array(mask))

    return ds.map_batches(pick, batch_format="pyarrow")


SQL_STRATIFIED_SAMPLE = (
    f"WITH h1 AS (SELECT event_id, event_type, user_id, "
    f"(event_id * {_KMV_A} + {_KMV_B}) % {_KMV_P} AS h FROM events), "
    f"t AS (SELECT *, ((h % 1073741824) * {_KMV_A2}) % {_KMV_P} AS term1, "
    f"(((h // 1073741824) * {_KMV_A2}) % {_KMV_P}) AS tt FROM h1) "
    "SELECT event_id, event_type, user_id FROM t WHERE "
    f"((term1 + ((tt % 2147483648) * 1073741824 + tt // 2147483648) % {_KMV_P}) % {_KMV_P}) "
    "% 10 = 0"
)


def q_split_assign(sf_dir: str):
    """Train/val/test split assignment (90/5/5) by deterministic hash of
    doc_id — the standard training-data-pipeline split that must be stable
    across reruns, resumes and cluster sizes.  Pure per-batch projection."""
    ds = _t(sf_dir, "documents", ["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        b = _kmv_hash(ids) % 100
        split = np.where(b < 90, "train", np.where(b < 95, "val", "test"))
        return pa.table({"doc_id": t["doc_id"], "split": pa.array(split, pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow")


SQL_SPLIT_ASSIGN = (
    f"WITH h1 AS (SELECT doc_id, (doc_id * {_KMV_A} + {_KMV_B}) % {_KMV_P} AS h "
    "FROM documents), "
    f"t AS (SELECT doc_id, ((h % 1073741824) * {_KMV_A2}) % {_KMV_P} AS term1, "
    f"(((h // 1073741824) * {_KMV_A2}) % {_KMV_P}) AS tt FROM h1), "
    f"b AS (SELECT doc_id, ((term1 + ((tt % 2147483648) * 1073741824 + tt // 2147483648) "
    f"% {_KMV_P}) % {_KMV_P}) % 100 AS bkt FROM t) "
    "SELECT doc_id, CASE WHEN bkt < 90 THEN 'train' WHEN bkt < 95 THEN 'val' "
    "ELSE 'test' END AS split FROM b"
)


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — correlated aggregate as a self-join: revenue from
    lineitems whose quantity is below HALF their part's average quantity,
    grouped by brand.  The correlated subquery becomes (1) a partial-then-
    global per-part aggregate (two int64s per part cross the shuffle, never
    the lineitems), (2) one partitioned join of the fact table against that
    small aggregate on the SAME key, (3) a broadcast part->brand lookup.
    The threshold test is integer arithmetic (2*qty*cnt < sum_qty — qty is
    integral) and money is per-row integer cents, so the DuckDB twin
    matches bit-for-bit under any aggregation order."""
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def qty_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
            "qty": t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        p = df.groupby("l_partkey", sort=False).agg(
            sq=("qty", "sum"), c=("qty", "size")).reset_index()
        return pa.Table.from_pandas(p, preserve_index=False)

    per_part = (
        li.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("sq", alias_name="sum_qty"), Sum("c", alias_name="cnt"))
    )

    def cents(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_partkey": t["l_partkey"],
            "qty": pa.array(t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)),
            "cents": pa.array(round_half_away(ext * 100.0).astype(np.int64)),
        })

    joined = li.map_batches(cents, batch_format="pyarrow").join(
        per_part, join_type="inner", num_partitions=cluster_partitions(),
        on=("l_partkey",),
    )

    def small(t: pa.Table) -> pa.Table:
        qty = t["qty"].to_numpy(zero_copy_only=False)
        sq = t["sum_qty"].to_numpy(zero_copy_only=False)
        c = t["cnt"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(2 * qty * c < sq)).select(["l_partkey", "cents"])

    # brand lookup: part is O(#parts) — broadcast once, map-side merge
    part = _t(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brand_ref = ray.put(dict(zip(part["p_partkey"], part["p_brand"])))

    def add_brand(t: pa.Table) -> pa.Table:
        lut = ray.get(brand_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        brands = pd.Series(pk).map(lut).to_numpy()
        return pa.table({"brand": pa.array(brands), "cents": t["cents"]})

    out = (
        joined.map_batches(small, batch_format="pyarrow")
        .map_batches(add_brand, batch_format="pyarrow")
        .groupby("brand")
        .aggregate(Sum("cents", alias_name="revenue_cents"), Count(alias_name="n_small"))
    )
    pdf = out.to_pandas()
    pdf["revenue_cents"] = pdf["revenue_cents"].astype("int64")
    pdf["n_small"] = pdf["n_small"].astype("int64")
    return pdf


SQL_SMALL_QTY_REVENUE = (
    "WITH agg AS (SELECT l_partkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, "
    "COUNT(*) AS cnt FROM lineitem GROUP BY 1) "
    "SELECT p.p_brand AS brand, "
    "CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents, "
    "COUNT(*) AS n_small "
    "FROM lineitem l JOIN agg a ON l.l_partkey = a.l_partkey "
    "JOIN part p ON p.p_partkey = l.l_partkey "
    "WHERE 2 * CAST(l.l_quantity AS BIGINT) * a.cnt < a.sum_qty "
    "GROUP BY 1"
)


# --- Bloom-filter semi-join (the 100 TB probe-pruning path) -----------------

_BLOOM_BITS = 1 << 20  # 128 KiB bitmap; ~0.3% fp at 1e5 keys / k=2


def _bloom_positions(keys: np.ndarray, salt: int) -> np.ndarray:
    """Bit positions for one hash round — any mix works here: the filter
    only PRUNES; false positives are removed by the exact join after it,
    so this hash needs no SQL twin (contrast _kmv_hash)."""
    h = _kmv_hash(keys * np.int64(2 * salt + 1) + np.int64(salt))
    return (h % _BLOOM_BITS).astype(np.int64)


def _bloom_build(keys_ds, key_col: str, fan_in: int = 8):
    """Distributed Bloom build: one fixed-size partial bitmap per batch,
    TWO-LEVEL OR-merge — partial bitmaps combine inside ``fan_in``
    repartitioned blocks first, so the driver reads ``fan_in`` 128 KiB
    bitmaps instead of #batches of them (OR is associative/commutative, so
    the merge shape can't change the result)."""
    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        for salt in (1, 2):
            pos = _bloom_positions(k, salt)
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pa.table({"bitmap": pa.array([bits.tobytes()], pa.binary())})

    def or_block(t: pa.Table) -> pa.Table:
        bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
        for buf in t["bitmap"]:
            bits |= np.frombuffer(buf.as_py(), dtype=np.uint8)
        return pa.table({"bitmap": pa.array([bits.tobytes()], pa.binary())})

    level1 = (keys_ds.map_batches(partial, batch_format="pyarrow")
              .repartition(fan_in)
              .map_batches(or_block, batch_format="pyarrow", batch_size=None))
    merged = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for row in level1.iter_rows():
        merged |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return merged


def q_semi_join_bloom(sf_dir: str):
    """J3 semi-join, Bloom-pruned: revenue cents + line count per URGENT
    order.  The urgent-orderkey Bloom bitmap (fixed 128 KiB regardless of
    key count) broadcasts once via ``ray.put``; the fact table drops
    non-matching rows MAP-SIDE before the shuffle, then the exact
    partitioned join removes the ~0.3% false positives — so the result is
    EXACT (false negatives are impossible by construction) while the join
    shuffle carries only the pre-filtered survivors.  Oracle: the plain
    semi-join SQL; the bitmap is invisible to correctness."""
    urgent = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(["o_orderkey"])

    urgent = urgent.map_batches(pick, batch_format="pyarrow")
    bitmap_ref = ray.put(_bloom_build(urgent, "o_orderkey"))

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

    def probe(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        bits = ray.get(bitmap_ref)
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.ones(len(k), dtype=bool)
        for salt in (1, 2):
            pos = _bloom_positions(k, salt)
            keep &= (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        t = t.filter(pa.array(keep))
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "cents": pa.array(round_half_away(ext * 100.0).astype(np.int64))})

    survivors = li.map_batches(probe, batch_format="pyarrow")
    exact = survivors.join(urgent, join_type="inner",
                           num_partitions=cluster_partitions(),
                           on=("l_orderkey",), right_on=("o_orderkey",))
    out = exact.groupby("l_orderkey").aggregate(
        Sum("cents", alias_name="revenue_cents"), Count(alias_name="n_lines"))
    pdf = out.to_pandas()
    pdf["revenue_cents"] = pdf["revenue_cents"].astype("int64")
    pdf["n_lines"] = pdf["n_lines"].astype("int64")
    return pdf


SQL_SEMI_JOIN_BLOOM = (
    "SELECT l.l_orderkey, "
    "CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents, "
    "COUNT(*) AS n_lines "
    "FROM lineitem l WHERE l.l_orderkey IN "
    "(SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') "
    "GROUP BY 1"
)


def q_skew_join(sf_dir: str):
    """Skew-aware large-large join (the hot-key hybrid): measure per-key
    frequency, route keys hotter than 5x the mean through a BROADCAST side
    join (only the hot keys' dim rows ship — not the dim table), and the
    long cold tail through the normal partitioned hash join; union, then
    aggregate.  Without the split, one reducer owns the hot key's entire
    row set (the derived key here funnels every first lineitem of an order
    onto supplier 0 — ~15x the mean).  The salted-agg cousin
    (`q_salted_agg`) handles skewed AGGREGATION; this handles the skewed
    JOIN, where salting alone can't help because the dim row must follow
    the key.  Output is identical to the plain join (oracle-checked)."""
    fact = _t(sf_dir, "lineitem", ["l_suppkey", "l_linenumber", "l_extendedprice"])

    def keyed(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        ln = t["l_linenumber"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = np.where(ln == 1, 0, sk)
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(k),
                         "cents": pa.array(round_half_away(ext * 100.0).astype(np.int64))})

    fact = fact.map_batches(keyed, batch_format="pyarrow")

    # 1. hot-key census: per-batch partial counts -> tiny per-key table
    def count_partial(t: pa.Table) -> pa.Table:
        k, n = np.unique(t["k"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"k": pa.array(k), "n": pa.array(n.astype(np.int64))})

    counts = (
        fact.map_batches(count_partial, batch_format="pyarrow")
        .groupby("k").aggregate(Sum("n", alias_name="n")).to_pandas()
    )
    hot = set(counts.loc[counts["n"] > 5 * counts["n"].mean(), "k"].astype(int))

    dim = _t(sf_dir, "supplier", ["s_suppkey", "s_name"])
    if hot:
        # 2. ship ONLY the hot keys' dim rows to every worker
        hot_arr = pa.array(sorted(hot), pa.int64())
        hot_rows = dim.map_batches(
            lambda t: t.filter(pc.is_in(t["s_suppkey"], value_set=hot_arr)),
            batch_format="pyarrow").to_pandas()
        hot_lut_ref = ray.put(dict(zip(hot_rows["s_suppkey"], hot_rows["s_name"])))

        def hot_side(t: pa.Table) -> pa.Table:
            lut = ray.get(hot_lut_ref)
            t = t.filter(pc.is_in(t["k"], value_set=hot_arr))
            names = pd.Series(t["k"].to_numpy(zero_copy_only=False)).map(lut).to_numpy()
            return pa.table({"s_name": pa.array(names, pa.string()), "cents": t["cents"]})

        def cold_side(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(t["k"], value_set=hot_arr)))

        hot_joined = fact.map_batches(hot_side, batch_format="pyarrow")
        cold = fact.map_batches(cold_side, batch_format="pyarrow")
    else:
        hot_joined = None  # no skew detected: plain partitioned join
        cold = fact
    cold_joined = (
        cold.join(dim, join_type="inner", num_partitions=cluster_partitions(),
                  on=("k",), right_on=("s_suppkey",))
        .select_columns(["s_name", "cents"])
    )
    both = hot_joined.union(cold_joined) if hot_joined is not None else cold_joined
    out = both.groupby("s_name").aggregate(
        Sum("cents", alias_name="revenue_cents"), Count(alias_name="n_lines"))
    pdf = out.to_pandas()
    pdf["revenue_cents"] = pdf["revenue_cents"].astype("int64")
    pdf["n_lines"] = pdf["n_lines"].astype("int64")
    return pdf


SQL_SKEW_JOIN = (
    "WITH f AS (SELECT CASE WHEN l_linenumber = 1 THEN 0 ELSE l_suppkey END AS k, "
    "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents FROM lineitem) "
    "SELECT s.s_name, CAST(SUM(f.cents) AS BIGINT) AS revenue_cents, COUNT(*) AS n_lines "
    "FROM f JOIN supplier s ON f.k = s.s_suppkey GROUP BY 1"
)


# --- table profiler (data-validation stats report) --------------------------

_PROFILE_NUM = {  # column -> int64 encoder (exact, SQL-mirrorable)
    "event_id": lambda t: t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64),
    "user_id": lambda t: t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64),
    "value_e4": lambda t: None,  # filled in _profile_encoders (needs rounding)
    "ts_us": lambda t: t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64),
}
_PROFILE_STR = ("event_type", "props")


def _profile_encoders():
    from ..functions.rounding import round_half_away

    enc = dict(_PROFILE_NUM)
    enc["value_e4"] = lambda t: round_half_away(
        t["value"].to_numpy(zero_copy_only=False) * 10000.0).astype(np.int64)
    return enc


def q_profile_events(sf_dir: str):
    """Table PROFILER — the one-pass data-validation report every ingest
    pipeline runs before training: per column, row count, null count,
    min/max, and EXACT distinct count, in long format.

    Shape: one streaming pass emits per-batch per-column partial stat rows
    (7 small rows per batch) AND distinct-value rows bucketed by an int
    hash of (col, value) — so the only shuffle carries the batch-distinct
    (col, value) pairs on int keys (the string-keyed aggregate pathology
    measured elsewhere never engages), and per-bucket distinct counting is
    one vectorized drop_duplicates.  At 100 TB swap the exact distinct leg
    for the KMV sketch (`q_distinct_sketch`) — same partial shape, bounded
    k-int64 state.  Numeric min/max are computed in int64 (value as e4
    cents, ts as epoch micros) and stringified only in the final 6-row
    result, so engine/SQL agreement is bit-exact."""
    from ray.data.aggregate import Max, Min, Sum

    cols = ["event_id", "user_id", "value", "ts", "event_type", "props"]
    ds = _t(sf_dir, "events", cols)
    enc = _profile_encoders()

    def stat_partial(t: pa.Table) -> pa.Table:
        rows = []
        for col, f in enc.items():
            v = f(t)
            rows.append((col, len(v), 0, int(v.min()), int(v.max()), None, None))
        for col in _PROFILE_STR:
            s = t[col].to_pandas()
            nn = int(s.isna().sum())
            sv = s.dropna()
            rows.append((col, len(s), nn,
                         None, None,
                         sv.min() if len(sv) else None,
                         sv.max() if len(sv) else None))
        return pa.table({
            "col": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "n_null": pa.array([r[2] for r in rows], pa.int64()),
            "min_num": pa.array([r[3] for r in rows], pa.int64()),
            "max_num": pa.array([r[4] for r in rows], pa.int64()),
            "min_str": pa.array([r[5] for r in rows], pa.string()),
            "max_str": pa.array([r[6] for r in rows], pa.string()),
        })

    stats = (
        ds.map_batches(stat_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(Sum("n", alias_name="n"), Sum("n_null", alias_name="n_null"),
                   Min("min_num", alias_name="min_num"), Max("max_num", alias_name="max_num"),
                   Min("min_str", alias_name="min_str"), Max("max_str", alias_name="max_str"))
        .to_pandas()
    )

    def distinct_partial(t: pa.Table) -> pa.Table:
        out_c, out_v = [], []
        for col, f in enc.items():
            u = np.unique(f(t))
            out_c.append(np.full(len(u), col, dtype=object))
            out_v.append(u.astype(str).astype(object))
        for col in _PROFILE_STR:
            u = t[col].to_pandas().dropna().unique()
            out_c.append(np.full(len(u), col, dtype=object))
            out_v.append(u.astype(object))
        c = np.concatenate(out_c)
        v = np.concatenate(out_v)
        key = pd.util.hash_pandas_object(pd.Series(c + "\x1f" + v), index=False).to_numpy()
        return pa.table({"col": pa.array(c, pa.string()), "val": pa.array(v, pa.string()),
                         "bucket": pa.array((key % np.uint64(64)).astype(np.int64))})

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["col", "val"]).groupby("col", sort=False).size()
        return pd.DataFrame({"col": d.index.to_numpy(dtype=object),
                             "nd": d.to_numpy().astype(np.int64)})

    nd = (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("bucket").map_groups(count_bucket, batch_format="pandas")
        .groupby("col").aggregate(Sum("nd", alias_name="n_distinct"))
        .to_pandas()
    )

    out = stats.merge(nd, on="col", how="left")
    num_mask = out["min_str"].isna()
    out["min_v"] = np.where(num_mask, out["min_num"].astype("Int64").astype(str), out["min_str"])
    out["max_v"] = np.where(num_mask, out["max_num"].astype("Int64").astype(str), out["max_str"])
    out["n"] = out["n"].astype("int64")
    out["n_null"] = out["n_null"].astype("int64")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out[["col", "n", "n_null", "min_v", "max_v", "n_distinct"]] \
        .sort_values("col").reset_index(drop=True)


def _profile_sql_leg(col: str, expr: str, is_num: bool) -> str:
    mm = (f"CAST(MIN({expr}) AS VARCHAR) AS min_v, CAST(MAX({expr}) AS VARCHAR) AS max_v"
          if is_num else f"MIN({expr}) AS min_v, MAX({expr}) AS max_v")
    return (f"SELECT '{col}' AS col, COUNT(*) AS n, "
            f"CAST(SUM(CASE WHEN {expr} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
            f"{mm}, COUNT(DISTINCT {expr}) AS n_distinct FROM events")


SQL_PROFILE_EVENTS = " UNION ALL ".join([
    _profile_sql_leg("event_id", "event_id", True),
    _profile_sql_leg("user_id", "user_id", True),
    _profile_sql_leg("value_e4", "CAST(ROUND(value * 10000, 0) AS BIGINT)", True),
    _profile_sql_leg("ts_us", "epoch_us(ts)", True),
    _profile_sql_leg("event_type", "event_type", False),
    _profile_sql_leg("props", "props", False),
])


def q_snapshot_diff(sf_dir: str):
    """Catalog SNAPSHOT DIFF (the incremental-refresh operator: what
    changed between two catalog states?): FULL OUTER join on the item key,
    row status = added / removed / changed / same, aggregated to counts per
    status x order-year.  The two snapshots derive deterministically from
    orders (A drops o_orderkey % 97 == 0, B drops % 89 == 0 and bumps
    o_totalprice by 1 cent where % 13 == 0), so the twin is plain SQL.
    Completes the join-family coverage: the full-outer path exercises
    null-side handling on BOTH sides of Ray's hash join."""
    base = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

    def snap_a(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = k % 97 != 0
        t = t.filter(pa.array(keep))
        cents = round_half_away(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"key_a": t["o_orderkey"],
                         "year_a": pc.year(t["o_orderdate"]),
                         "cents_a": pa.array(cents)})

    def snap_b(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = k % 89 != 0
        t = t.filter(pa.array(keep))
        k = k[keep]
        cents = round_half_away(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        cents = cents + (k % 13 == 0)
        return pa.table({"key_b": t["o_orderkey"],
                         "year_b": pc.year(t["o_orderdate"]),
                         "cents_b": pa.array(cents)})

    a = base.map_batches(snap_a, batch_format="pyarrow")
    b = base.map_batches(snap_b, batch_format="pyarrow")
    j = a.join(b, join_type="full_outer", num_partitions=cluster_partitions(),
               on=("key_a",), right_on=("key_b",))

    def status(t: pa.Table) -> pa.Table:
        # Ray's full_outer COALESCES the key into the left name (key_a);
        # side presence is read off the null masks of the value columns
        # (int columns null-fill to float NaN — cents < 2^53, so the float
        # equality below is still exact)
        ca = t["cents_a"].to_numpy(zero_copy_only=False)
        cb = t["cents_b"].to_numpy(zero_copy_only=False)
        ya = t["year_a"].to_numpy(zero_copy_only=False)
        yb = t["year_b"].to_numpy(zero_copy_only=False)
        a_null = pd.isna(ca)
        b_null = pd.isna(cb)
        st = np.where(a_null, "added",
                      np.where(b_null, "removed",
                               np.where(ca == cb, "same", "changed")))
        year = np.where(a_null, yb, ya)
        return pa.table({"status": pa.array(st, pa.string()),
                         "o_year": pa.array(pd.array(year).astype("int64"))})

    out = (
        j.map_batches(status, batch_format="pyarrow")
        .groupby(["status", "o_year"])
        .aggregate(Count(alias_name="n"))
    )
    pdf = out.to_pandas()
    pdf["n"] = pdf["n"].astype("int64")
    return pdf


SQL_SNAPSHOT_DIFF = (
    "WITH a AS (SELECT o_orderkey AS k, year(o_orderdate) AS y, "
    "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c FROM orders WHERE o_orderkey % 97 <> 0), "
    "b AS (SELECT o_orderkey AS k, year(o_orderdate) AS y, "
    "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) + CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END AS c "
    "FROM orders WHERE o_orderkey % 89 <> 0) "
    "SELECT CASE WHEN a.k IS NULL THEN 'added' WHEN b.k IS NULL THEN 'removed' "
    "WHEN a.c = b.c THEN 'same' ELSE 'changed' END AS status, "
    "COALESCE(a.y, b.y) AS o_year, COUNT(*) AS n "
    "FROM a FULL OUTER JOIN b ON a.k = b.k GROUP BY 1, 2"
)


COOCCUR_WINDOW_US = 600 * 1_000_000  # 10 minutes


def q_cooccur_join(sf_dir: str):
    """Stream-stream WINDOW JOIN: pairs of events by the SAME user within
    10 minutes (the session co-occurrence primitive behind "users who did
    X then Y").  Equi-key (user) + band predicate (|Δt| <= w), aggregated
    to counts per ordered (type_a, type_b) pair.

    Shape: events hash once on a crc-mixed user bucket (one shuffle); per
    bucket, a vectorized sort + sliding-window two-pointer emits pairs —
    per-user work is O(events x avg window occupancy), never the per-user
    cartesian.  Skew note: a single hyperactive user bounds a reducer at
    occupancy x its events; salt by (user, day) if that ever dominates."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def bucketize(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((u * np.uint64(2654435761)) % np.uint64(64)).astype(np.int64)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table({"bucket": pa.array(b), "user_id": t["user_id"],
                         "event_id": t["event_id"], "event_type": t["event_type"],
                         "ts_us": pa.array(ts)})

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        et = g["event_type"].to_numpy()
        eid = g["event_id"].to_numpy()
        n = len(g)
        # monotone (user, ts) key: dense user rank x (span + W + 1) + rel-ts
        # keeps users > W apart so one searchsorted bounds every window
        # without crossing a user boundary; max key ~ users x span fits
        # int64 comfortably (a raw user_id << shift would not)
        _, inv = np.unique(u, return_inverse=True)
        rel = ts - ts.min()
        stride = np.int64(rel.max()) + COOCCUR_WINDOW_US + 1
        key = inv.astype(np.int64) * stride + rel
        j_hi = np.searchsorted(key, key + COOCCUR_WINDOW_US, side="right")
        cnt = j_hi - np.arange(n) - 1
        total = int(cnt.sum())
        if total == 0:
            return pd.DataFrame({"type_a": pd.Series([], dtype=object),
                                 "type_b": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        i = np.repeat(np.arange(n), cnt)
        j = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt) + i + 1
        ok = (u[i] == u[j]) & (eid[i] != eid[j])
        i, j = i[ok], j[ok]
        out = pd.DataFrame({"type_a": et[i], "type_b": et[j]})
        vc = out.value_counts(["type_a", "type_b"]).reset_index(name="n")
        vc["n"] = vc["n"].astype(np.int64)
        return vc

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n"))
    )
    pdf = out.to_pandas()
    pdf["n"] = pdf["n"].astype("int64")
    return pdf


SQL_COOCCUR_JOIN = (
    "WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events) "
    "SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n "
    "FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id <> b.event_id "
    "AND b.t >= a.t AND b.t - a.t <= 600000000 "
    "AND (b.t > a.t OR (b.t = a.t AND b.event_id > a.event_id)) "
    "GROUP BY 1, 2"
)


_FK_RELATIONS = [
    # (name, fact table, fact key, dim table, dim key)
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
]


def q_fk_integrity(sf_dir: str):
    """REFERENTIAL-INTEGRITY report across the star schema's four FK
    relations: per relation, fact rowcount and orphan count (fact keys
    with no dim row).  Each leg is the engine's partitioned anti-join
    shape on DISTINCT fact keys (the orphan check never shuffles fact
    rows — distinct keys join against the dim key column), then orphan
    fact rows are counted by a broadcast membership test only when
    orphans exist (zero on healthy data, so the second pass is free)."""
    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import _compact_nonempty

    def one_relation(rel):
        import pyarrow.parquet as _pq

        name, fact, fkey, dim, dkey = rel
        f = _prebuilt[name]  # constructed serially: Dataset construction
        # does schema inference whose lazy fsspec-http import is NOT
        # thread-safe (partial module -> uncaught ImportError in Ray)
        n_rows = f.count()
        dim_rows = _pq.ParquetFile(os.path.join(sf_dir, f"{dim}.parquet")).metadata.num_rows
        if dim_rows <= 5_000_000:
            # ADAPTIVE: a dim this small broadcasts as one key array and the
            # orphan count is a vectorized map-side is_in over fact batches —
            # no distinct-key shuffle, no join (measured: the 4 partitioned
            # joins dominated the report, 31-41 s at 8 cpus -> ~3 s)
            dk = ray.put(_prebuilt_dim[name].to_pandas()[dkey].to_numpy())

            def orphan_batch(t: pa.Table, k=fkey) -> pa.Table:
                keys = pa.array(np.asarray(ray.get(dk)))
                miss = pc.invert(pc.is_in(t[k], value_set=keys))
                return pa.table({"o": pa.array([int(pc.sum(pc.cast(miss, pa.int64())).as_py() or 0)], pa.int64())})

            agg = f.map_batches(orphan_batch, batch_format="pyarrow").aggregate(Sum("o"))
            return (name, int(n_rows), int(agg["sum(o)"] or 0))
        # distinct fact keys + their row counts: the orphan check never
        # shuffles fact ROWS, only the distinct-key table
        fact_keys = _compact_nonempty(
            f.groupby(fkey).aggregate(Count(alias_name="n")).materialize(),
            pa.schema([(fkey, pa.int64()), ("n", pa.int64())]))
        # Ray's outer join drops/coalesces the key columns, so presence is
        # carried by an explicit dim-side marker instead of the dim key
        dim_marked = _prebuilt_dim[name].map_batches(
            lambda t, k=dkey: pa.table({k: t[k], "present": pa.array(
                np.ones(t.num_rows, dtype=np.int8))}),
            batch_format="pyarrow")
        joined = fact_keys.join(dim_marked, join_type="left_outer",
                                num_partitions=cluster_partitions(),
                                on=(fkey,), right_on=(dkey,))

        def orphan_partial(t: pa.Table) -> pa.Table:
            pres = t["present"].to_numpy(zero_copy_only=False)
            n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"o": pa.array([int(n[pd.isna(pres)].sum())], pa.int64())})

        agg = joined.map_batches(orphan_partial, batch_format="pyarrow") \
            .aggregate(Sum("o"))
        return (name, int(n_rows), int(agg["sum(o)"] or 0))

    # the four relations are independent pipelines — drive the BLOCKING
    # aggregates from four threads so their stages interleave on the
    # cluster instead of running head-to-tail (measured 41 s -> 8.6 s at
    # 8 cpus); dataset construction stays serial (see one_relation note)
    _prebuilt = {rel[0]: _t(sf_dir, rel[1], [rel[2]]) for rel in _FK_RELATIONS}
    _prebuilt_dim = {rel[0]: _t(sf_dir, rel[3], [rel[4]]) for rel in _FK_RELATIONS}
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(_FK_RELATIONS)) as ex:
        results = list(ex.map(one_relation, _FK_RELATIONS))
    return pd.DataFrame(results, columns=["relation", "n_rows", "n_orphans"]) \
        .sort_values("relation").reset_index(drop=True)


SQL_FK_INTEGRITY = " UNION ALL ".join(
    f"SELECT '{name}' AS relation, COUNT(*) AS n_rows, "
    f"CAST(SUM(CASE WHEN d.{dkey} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans "
    f"FROM {fact} f LEFT JOIN {dim} d ON f.{fkey} = d.{dkey}"
    for name, fact, fkey, dim, dkey in [
        ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ])


def q_global_rank(sf_dir: str):
    """GLOBAL RANK over events.value (ties share the min rank — SQL RANK())
    computed WITHOUT a global sort: values quantize to e4 ints, hash into
    256 fixed VALUE-RANGE bins, pass 1 counts per bin (tiny aggregate),
    the driver prefix-sums bin offsets, pass 2 ranks each bin locally
    (sort + first-index-of-equal) and adds its offset.  Same two-pass
    offset pattern as `q_seq_pack` but keyed by value range instead of id
    range — together they cover the ordered-analytics family (cumsum,
    rank, ntile) with one reusable discipline."""
    from ray.data.aggregate import Sum

    ds = _t(sf_dir, "events", ["event_id", "value"])

    def quantize(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        v4 = round_half_away(t["value"].to_numpy(zero_copy_only=False) * 10000.0).astype(np.int64)
        return pa.table({"event_id": t["event_id"], "v4": pa.array(v4)})

    q = ds.map_batches(quantize, batch_format="pyarrow").materialize()

    # bin edges from the global min/max (one cheap aggregate over partials)
    def minmax(t: pa.Table) -> pa.Table:
        v = t["v4"].to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(v.min())], pa.int64()),
                         "hi": pa.array([int(v.max())], pa.int64())})

    from ray.data.aggregate import Max, Min

    mm = q.map_batches(minmax, batch_format="pyarrow").aggregate(Min("lo"), Max("hi"))
    lo, hi = int(mm["min(lo)"]), int(mm["max(hi)"])
    n_bins = 256
    width = max(1, (hi - lo) // n_bins + 1)

    def binify(t: pa.Table) -> pa.Table:
        v = t["v4"].to_numpy(zero_copy_only=False)
        return t.append_column("bin", pa.array((v - lo) // width))

    binned = q.map_batches(binify, batch_format="pyarrow").materialize()
    counts = binned.groupby("bin").aggregate(Count(alias_name="n")).to_pandas()
    counts = counts.sort_values("bin").reset_index(drop=True)
    offs = dict(zip(counts["bin"].astype(int),
                    np.concatenate([[0], np.cumsum(counts["n"].to_numpy())[:-1]]).astype(np.int64)))
    offs_ref = ray.put(offs)

    def rank_bin(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offs_ref)[int(g["bin"].iloc[0])]
        v = g["v4"].to_numpy()
        order = np.argsort(v, kind="stable")
        sv = v[order]
        # RANK(): position of the FIRST equal value, 1-based + bin offset
        first = np.searchsorted(sv, sv, side="left")
        rnk = np.empty(len(v), dtype=np.int64)
        rnk[order] = off + first + 1
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(), "v4": v, "rnk": rnk})

    out = binned.groupby("bin").map_groups(rank_bin, batch_format="pandas").to_pandas()
    out["rnk"] = out["rnk"].astype("int64")
    out["v4"] = out["v4"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)[["event_id", "v4", "rnk"]]


SQL_GLOBAL_RANK = (
    "SELECT event_id, CAST(ROUND(value * 10000, 0) AS BIGINT) AS v4, "
    "RANK() OVER (ORDER BY CAST(ROUND(value * 10000, 0) AS BIGINT)) AS rnk "
    "FROM events"
)


# --- CDC merge-apply (upsert + delete, last-writer-wins) ---------------------


def q_merge_apply(sf_dir: str):
    """CDC MERGE-APPLY: apply a keyed changelog to a base snapshot with
    last-writer-wins + delete semantics — the write half of incremental
    catalog refresh (``q_snapshot_diff`` is the read half; reference analog
    = create_or_update + bulk upsert, /root/reference/stacbuilder/stacapi/
    endpoints.py:416-441).

    base      = customer: (custkey, acctbal cents)
    changelog = orders as change records sequenced by (o_orderdate,
                o_orderkey); key = o_custkey, except o_orderkey % 11 == 0
                rows target key o_custkey + 100000 (entities NOT in base →
                the insert branch); keys with o_custkey % 7 == 0 emit no
                changes (untouched base rows → the base branch); op =
                DELETE when status 'F' and o_orderkey % 10 == 0, else
                UPSERT carrying totalprice cents.
    result    = base overlaid with the LAST change per key: upserts replace
                (or insert), deletes remove the key even if it is in base.

    Scale shape: a per-batch last-wins COMBINER prunes the changelog to one
    row per key per batch BEFORE the shuffle (the pre-aggregation discipline
    applied to CDC — at 100 TB the changelog is the big side and arrives
    heavily key-skewed toward hot entities); the final per-key last-wins is
    one vectorized pass per crc bucket; the base overlay is one partitioned
    full-outer join on the key (both null sides exercised: inserts have no
    base row, untouched base rows have no change)."""
    ch = _t(sf_dir, "orders",
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"])

    def partial_last(t: pa.Table) -> pd.DataFrame:
        from ..functions.rounding import round_half_away

        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "custkey": np.where(ok % 11 == 0, ck + 100000, ck),
            "okey": ok,
            "date_us": t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64),
            "st": t["o_orderstatus"].to_pandas(),
            "cents": round_half_away(
                t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64),
        })
        df = df[df["custkey"].to_numpy() % 7 != 0]
        df = df.sort_values(["custkey", "date_us", "okey"], kind="stable")
        df = df.drop_duplicates(subset=["custkey"], keep="last")
        df["op"] = np.where((df["st"].to_numpy() == "F") & (df["okey"].to_numpy() % 10 == 0),
                            "D", "U")
        u = df["custkey"].to_numpy().astype(np.uint64)
        df["bucket"] = ((u * np.uint64(2654435761)) % np.uint64(64)).astype(np.int64)
        return df[["bucket", "custkey", "okey", "date_us", "op", "cents"]]

    def final_last(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["custkey", "date_us", "okey"], kind="stable")
        g = g.drop_duplicates(subset=["custkey"], keep="last")
        return g[["custkey", "op", "cents"]].rename(columns={"cents": "ch_cents"})

    last = (
        ch.map_batches(partial_last, batch_format="pyarrow")
        .repartition(cluster_partitions())
        .groupby("bucket")
        .map_groups(final_last, batch_format="pandas")
    )

    def base_prep(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        cents = round_half_away(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"base_key": t["c_custkey"], "base_cents": pa.array(cents)})

    base = _t(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        base_prep, batch_format="pyarrow")
    j = base.join(last, join_type="full_outer", num_partitions=cluster_partitions(),
                  on=("base_key",), right_on=("custkey",))

    def merge(t: pa.Table) -> pa.Table:
        # full_outer coalesces the key into base_key; change-side presence is
        # the op null mask (cents null-fill to NaN; cents < 2^53 so exact)
        op = t["op"].to_pandas()
        bc = t["base_cents"].to_numpy(zero_copy_only=False)
        cc = t["ch_cents"].to_numpy(zero_copy_only=False)
        no_change = op.isna().to_numpy()
        keep = no_change | (op.to_numpy() != "D")
        val = np.where(no_change, bc, cc)[keep]
        src = np.where(no_change, "base", "upsert")[keep]
        key = t["base_key"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({"custkey": pa.array(key.astype(np.int64)),
                         "val_cents": pa.array(val.astype(np.int64)),
                         "src": pa.array(src, pa.string())})

    return j.map_batches(merge, batch_format="pyarrow")


SQL_MERGE_APPLY = (
    "WITH ch0 AS (SELECT CASE WHEN o_orderkey % 11 = 0 THEN o_custkey + 100000 "
    "ELSE o_custkey END AS custkey, o_orderkey, o_orderstatus, o_totalprice, o_orderdate "
    "FROM orders), "
    "ch AS (SELECT custkey, "
    "CASE WHEN o_orderstatus = 'F' AND o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op, "
    "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents, "
    "row_number() OVER (PARTITION BY custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn "
    "FROM ch0 WHERE custkey % 7 <> 0), "
    "lw AS (SELECT custkey, op, cents FROM ch WHERE rn = 1), "
    "base AS (SELECT c_custkey AS custkey, CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents "
    "FROM customer) "
    "SELECT COALESCE(l.custkey, b.custkey) AS custkey, "
    "CASE WHEN l.custkey IS NULL THEN b.cents ELSE l.cents END AS val_cents, "
    "CASE WHEN l.custkey IS NULL THEN 'base' ELSE 'upsert' END AS src "
    "FROM base b FULL OUTER JOIN lw l ON b.custkey = l.custkey "
    "WHERE l.op IS NULL OR l.op <> 'D'"
)


# --- Count-Min sketch (mergeable approximate counts) -------------------------

_CM_W = 1024
_CM_ROWS = ((2654435761, 1013904223), (2246822519, 2038074743), (3266489917, 1597334677))


def _cm_bucket(x: np.ndarray, a: int, b: int) -> np.ndarray:
    """Single-round multiplicative hash mod the Mersenne prime, folded to
    the sketch width.  int64-safe for ids < ~2^31 (the testdata range); for
    wider keys pre-fold with ``_kmv_hash`` first (same identity the KMV
    sketch documents) — the single round keeps the SQL twin one line."""
    return ((x.astype(np.int64) * a + b) % _KMV_P) % _CM_W


def q_cm_counts(sf_dir: str):
    """COUNT-MIN SKETCH: mergeable approximate per-key counts.  Per batch,
    each of d=3 hash rows bincounts into w=1024 buckets (bounded d x w int64
    state per batch, regardless of input size); partials merge by plain
    addition, so the sketch is order-independent and DETERMINISTIC — the
    DuckDB twin reproduces the sketch itself (bucket sums + LEAST over
    rows), not a tolerance band.  est_n >= n always (one-sided error).

    The exact side (per-user counts) rides the same pass and serves as the
    accuracy report; at 100 TB you keep ONLY the sketch — 24 KiB of state
    summarizes any number of rows, and sketches from disjoint shards merge
    by '+' (the same partial-aggregate discipline as pricing_summary, with
    bounded instead of per-key state)."""
    ds = _t(sf_dir, "events", ["user_id"])

    def sketch_partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        js, bs, cs = [], [], []
        for j, (a, b) in enumerate(_CM_ROWS):
            cnt = np.bincount(_cm_bucket(u, a, b), minlength=_CM_W)
            occ = np.nonzero(cnt)[0]
            js.append(np.full(len(occ), j, dtype=np.int64))
            bs.append(occ.astype(np.int64))
            cs.append(cnt[occ].astype(np.int64))
        return pa.table({"j": pa.array(np.concatenate(js)),
                         "b": pa.array(np.concatenate(bs)),
                         "c": pa.array(np.concatenate(cs))})

    sk = (
        ds.map_batches(sketch_partial, batch_format="pyarrow")
        .groupby(["j", "b"]).aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    mat = np.zeros((len(_CM_ROWS), _CM_W), dtype=np.int64)
    mat[sk["j"].to_numpy(), sk["b"].to_numpy()] = sk["c"].to_numpy()
    mat_ref = ray.put(mat)

    exact = ds.groupby("user_id").aggregate(Count(alias_name="n"))

    def estimate(t: pa.Table) -> pa.Table:
        m = ray.get(mat_ref)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        est = np.min(
            np.stack([m[j, _cm_bucket(u, a, b)] for j, (a, b) in enumerate(_CM_ROWS)]),
            axis=0)
        return pa.table({"user_id": t["user_id"],
                         "n": pc.cast(t["n"], pa.int64()),
                         "est_n": pa.array(est)})

    return exact.map_batches(estimate, batch_format="pyarrow")


def _cm_bucket_sql(col: str, a: int, b: int) -> str:
    return f"((({col}) * {a} + {b}) % {_KMV_P}) % {_CM_W}"


SQL_CM_COUNTS = (
    "WITH bk AS (SELECT user_id, "
    + ", ".join(f"{_cm_bucket_sql('user_id', a, b)} AS b{j}"
                for j, (a, b) in enumerate(_CM_ROWS))
    + " FROM events), "
    + ", ".join(f"s{j} AS (SELECT b{j} AS b, COUNT(*) AS c FROM bk GROUP BY 1)"
                for j in range(len(_CM_ROWS)))
    + ", u AS (SELECT user_id, COUNT(*) AS n, MIN(b0) AS b0, MIN(b1) AS b1, MIN(b2) AS b2 "
    "FROM bk GROUP BY user_id) "
    "SELECT u.user_id, u.n, LEAST(s0.c, s1.c, s2.c) AS est_n "
    "FROM u JOIN s0 ON u.b0 = s0.b JOIN s1 ON u.b1 = s1.b JOIN s2 ON u.b2 = s2.b"
)


# --- ordered string aggregation + stream throttle dedup ----------------------


def q_user_journey(sf_dir: str):
    """Ordered STRING_AGG per key: each user's event-type sequence in
    (ts, event_id) order joined with '>' — the sequence-construction step
    of behavioral / session training data.  One crc-bucket shuffle, then a
    single pandas pass per bucket; concat output is inherently per-group,
    but the sort and grouping are vectorized and each reducer holds only
    its bucket."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid * 2654435761) % 64))

    def journey(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        agg = g.groupby("user_id", sort=False)["event_type"].agg([
            (">".join, ">".join), ("n_events", "size")])
        agg.columns = ["journey", "n_events"]
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg.reset_index()

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(cluster_partitions())
        .groupby("bucket")
        .map_groups(journey, batch_format="pandas")
    )


SQL_USER_JOURNEY = (
    "SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id) AS journey, "
    "COUNT(*) AS n_events FROM events GROUP BY user_id"
)


THROTTLE_US = 600 * 1_000_000  # 10 minutes


def q_throttle_dedup(sf_dir: str):
    """Stream THROTTLE-DEDUP: drop an event when the previous event of the
    same (user_id, event_type) lies within 10 minutes — the at-most-once-
    per-window rule of alerting / impression-dedup pipelines.  Lag-based
    semantics (each event compares to its immediate predecessor, kept or
    not), which is the SQL-exact variant; one crc-bucket shuffle + one
    vectorized shift pass per bucket."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid * 2654435761) % 64))

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same = (g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]) & (
            g["event_type"].to_numpy()[1:] == g["event_type"].to_numpy()[:-1])
        close = (ts[1:] - ts[:-1]) <= THROTTLE_US
        drop = np.concatenate([[False], same & close])
        return g.loc[~drop, ["event_id", "user_id", "event_type", "ts"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(cluster_partitions())
        .groupby("bucket")
        .map_groups(keep, batch_format="pandas")
    )


SQL_THROTTLE_DEDUP = (
    "SELECT event_id, user_id, event_type, ts FROM ("
    "SELECT event_id, user_id, event_type, ts, "
    "lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_ts "
    "FROM events) WHERE prev_ts IS NULL "
    "OR date_diff('microsecond', prev_ts, ts) > 600000000"
)


def q_trajectory_len(sf_dir: str):
    """Per-user TRAJECTORY LENGTH over the ordered event stream (movement
    analytics over the same derived points the spatial suite uses): steps
    between consecutive events in (ts, event_id) order, each step's planar
    distance quantized to e6 integers BEFORE the sum (the money-cents
    discipline — float SUM order differs between engines, per-row sqrt is
    IEEE-identical).  One crc user-bucket shuffle + one vectorized diff
    pass per bucket."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_cols(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        lon = (eid % 3600) / 10.0 - 180.0 + 0.05
        lat = ((eid * 7) % 1800) / 10.0 - 90.0 + 0.05
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "ts": t["ts"], "lon": pa.array(lon), "lat": pa.array(lat),
                         "bucket": pa.array((uid * 2654435761) % 64)})

    def path(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.rounding import round_half_away

        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        same = np.concatenate([[False], u[1:] == u[:-1]])
        step = np.sqrt(np.diff(lon, prepend=lon[:1]) ** 2
                       + np.diff(lat, prepend=lat[:1]) ** 2)
        e6 = np.where(same, round_half_away(step * 1e6), 0).astype(np.int64)
        out = pd.DataFrame({"user_id": u, "e6": e6, "s": same.astype(np.int64)})
        agg = out.groupby("user_id", sort=False).agg(
            path_e6=("e6", "sum"), n_steps=("s", "sum"))
        return agg.reset_index()

    return (
        ds.map_batches(add_cols, batch_format="pyarrow")
        .repartition(cluster_partitions())
        .groupby("bucket")
        .map_groups(path, batch_format="pandas")
    )


SQL_TRAJECTORY_LEN = (
    "WITH pts AS (SELECT user_id, ts, event_id, "
    "((event_id % 3600) / 10.0 - 180.0 + 0.05) AS lon, "
    "(((event_id * 7) % 1800) / 10.0 - 90.0 + 0.05) AS lat FROM events), "
    "steps AS (SELECT user_id, "
    "lag(lon) OVER w AS plon, lag(lat) OVER w AS plat, lon, lat FROM pts "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
    "SELECT user_id, "
    "CAST(COALESCE(SUM(CAST(ROUND(sqrt((lon - plon) * (lon - plon) + (lat - plat) * (lat - plat)) "
    "* 1000000, 0) AS BIGINT)), 0) AS BIGINT) AS path_e6, "
    "COUNT(plon) AS n_steps FROM steps GROUP BY user_id"
)


def q_traj_simplify(sf_dir: str):
    """Per-user TRAJECTORY SIMPLIFICATION (Douglas-Peucker, eps = 15 deg):
    the movement-analytics compaction step — each user's (ts, event_id)-
    ordered polyline is reduced to the vertices that matter at the given
    tolerance, reported as per-user (n_points, n_kept, kept_id_sum).

    CONTRACT — rows-only BY DESIGN, like minhash/simhash: Douglas-Peucker
    is a data-dependent recursive split (each kept vertex re-anchors the
    chord for both sub-ranges), which has no bounded-depth SQL expression —
    a recursive CTE cannot carry the per-(user, segment) float tolerance
    state without re-deriving the full split tree per row.  Ground truth is
    therefore an independently-coded recursive DP in
    tests/test_operators.py::TestTrajSimplify plus the golden pin in
    tests/test_rows_only_golden.py (hash 6f89cad318afbe67, 15 rows at
    sf0.001) — the same contract the sketch operators document.

    Scale shape: one crc user-bucket shuffle, then per-bucket vectorized
    grouping; DP itself is O(n log n) typical per trajectory and
    trajectories are bounded per user (the same partitioning assumption
    trajectory_len documents: one user's track fits in a group)."""
    from ..geo.simplify import douglas_peucker_mask

    EPS = 15.0
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_cols(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        lon = (eid % 3600) / 10.0 - 180.0 + 0.05
        lat = ((eid * 7) % 1800) / 10.0 - 90.0 + 0.05
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "ts": t["ts"], "lon": pa.array(lon), "lat": pa.array(lat),
                         "bucket": pa.array((uid * 2654435761) % 64)})

    def simplify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        eid = g["event_id"].to_numpy().astype(np.int64)
        bounds = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1], [True]]))
        rows = []
        for a, b in zip(bounds[:-1], bounds[1:]):
            m = douglas_peucker_mask(lon[a:b], lat[a:b], EPS)
            rows.append((u[a], b - a, int(m.sum()), int(eid[a:b][m].sum())))
        return pd.DataFrame(rows, columns=["user_id", "n_points", "n_kept",
                                           "kept_id_sum"])

    return (
        ds.map_batches(add_cols, batch_format="pyarrow")
        .repartition(cluster_partitions())
        .groupby("bucket")
        .map_groups(simplify, batch_format="pandas")
    )


PAGERANK_ITERS = 10
PAGERANK_SCALE = 10**12


def q_pagerank(sf_dir: str):
    """Distributed PAGERANK (power iteration) over a deterministic
    2-out graph derived from events (node = event_id, edges
    src -> (src^2+7) % N and src -> (src^3+3) % N — NONLINEAR maps, an
    affine map mod N is a bijection and would make every indegree 2 and
    the ranks uniform): the canonical
    ITERATIVE graph algorithm expressed as K rounds of
    map_batches(partial contributions) -> groupby(dst).sum.

    Integer-exact power iteration (so the unrolled SQL twin is bit-equal):
    r0 = SCALE // N for every node; each round
    r = (15 * r0_unit) // 100 + (85 * sum(r_prev(src) // outdeg)) // 100
    — all int64, order-independent sums, no float drift.

    Scale shape: the edge table materializes ONCE and streams through every
    round; per-batch contributions pre-aggregate by dst (dense per-batch
    vector here — the sparse (dst, c) partial swap is the >1e8-node path),
    one bounded groupby per round; the driver holds only the O(N) rank
    vector, broadcast via ray.put each round (the partitioned rank-join
    swap applies when ranks outgrow a node's memory)."""
    import ray
    from ray.data.aggregate import Sum

    ds = _t(sf_dir, "events", ["event_id"])
    n_nodes = ds.count()
    scale_n = PAGERANK_SCALE // n_nodes
    base = (15 * scale_n) // 100

    def mk_edges(t: pa.Table) -> pa.Table:
        src = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d1 = (src * src + 7) % n_nodes
        d2 = (src * src * src + 3) % n_nodes
        return pa.table({"src": pa.array(np.concatenate([src, src])),
                         "dst": pa.array(np.concatenate([d1, d2]))})

    # coalesce: the edge table re-executes every round — dozens of tiny read
    # blocks would mean dozens of per-round tasks each allocating an O(N)
    # dense partial; ~1 block per 2 cpus keeps the per-round task count (and
    # the number of dense partials summed) proportional to the cluster
    edges = (ds.map_batches(mk_edges, batch_format="pyarrow")
             .repartition(max(4, cluster_partitions() // 2)).materialize())

    # two reduce strategies, identical results (exact int sums, order-free):
    # - dense: each block emits ONE row holding its dense contribution
    #   vector; the driver sums ~#blocks vectors.  Strictly faster while the
    #   O(N) vector fits comfortably in memory (no per-round shuffle).
    # - sparse: per-batch (dst, c) partials -> groupby sum.  The >DENSE_LIMIT
    #   path where rank vectors outgrow single-node aggregation.
    DENSE_LIMIT = 1 << 22
    ranks = np.full(n_nodes, scale_n, dtype=np.int64)
    for _ in range(PAGERANK_ITERS):
        ref = ray.put(ranks)

        if n_nodes <= DENSE_LIMIT:
            def contrib_dense(t: pa.Table, _ref=ref) -> pa.Table:
                r = ray.get(_ref)
                src = t["src"].to_numpy(zero_copy_only=False)
                dst = t["dst"].to_numpy(zero_copy_only=False)
                part = np.zeros(len(r), np.int64)
                np.add.at(part, dst, r[src] // 2)  # outdeg == 2
                return pa.table({"part": pa.array([part.tobytes()], pa.binary())})

            blobs = (edges.map_batches(contrib_dense, batch_format="pyarrow",
                                       batch_size=None).to_pandas()["part"])
            total = np.zeros(n_nodes, np.int64)
            for b in blobs:
                total += np.frombuffer(b, dtype=np.int64)
            ranks = np.full(n_nodes, base, dtype=np.int64) + (85 * total) // 100
        else:
            def contrib(t: pa.Table, _ref=ref) -> pa.Table:
                r = ray.get(_ref)
                src = t["src"].to_numpy(zero_copy_only=False)
                dst = t["dst"].to_numpy(zero_copy_only=False)
                part = np.zeros(len(r), np.int64)
                np.add.at(part, dst, r[src] // 2)
                nz = np.flatnonzero(part)
                return pa.table({"dst": pa.array(nz), "c": pa.array(part[nz])})

            agg = (edges.map_batches(contrib, batch_format="pyarrow")
                   .groupby("dst").aggregate(Sum("c", alias_name="c")).to_pandas())
            ranks = np.full(n_nodes, base, dtype=np.int64)
            ranks[agg["dst"].to_numpy(dtype=np.int64)] += (
                85 * agg["c"].to_numpy(dtype=np.int64)) // 100

    return pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                         "rank": ranks})


def pagerank_sql() -> str:
    """Unrolled K-stage twin of q_pagerank (fixed iteration count, so no
    recursive aggregation is needed)."""
    nn = "(SELECT COUNT(*) FROM events)"
    sql = [
        f"WITH nodes AS (SELECT event_id AS node FROM events), ",
        f"edges AS (SELECT event_id AS src, (event_id * event_id + 7) % {nn} AS dst FROM events "
        f"UNION ALL SELECT event_id, (event_id * event_id * event_id + 3) % {nn} FROM events), ",
        f"r0 AS (SELECT node, {PAGERANK_SCALE} // {nn} AS rank FROM nodes)",
    ]
    for k in range(1, PAGERANK_ITERS + 1):
        sql.append(
            f", r{k} AS (SELECT n.node, CAST((15 * ({PAGERANK_SCALE} // {nn})) // 100 "
            f"+ COALESCE((85 * s.c) // 100, 0) AS BIGINT) AS rank FROM nodes n "
            f"LEFT JOIN (SELECT e.dst AS node, CAST(SUM(r.rank // 2) AS BIGINT) AS c "
            f"FROM edges e JOIN r{k - 1} r ON e.src = r.node GROUP BY 1) s "
            f"ON n.node = s.node)"
        )
    sql.append(f" SELECT node, rank FROM r{PAGERANK_ITERS}")
    return "".join(sql)


def q_traj_hull(sf_dir: str):
    """Per-user trajectory CONVEX HULL statistics (the coverage-footprint
    aggregate of movement analytics): distinct points per user -> integer
    monotone-chain hull -> exact lattice shoelace area.

    INTEGER-EXACT end to end: the derived lon/lat are exact multiples of
    0.05, so scaling by 20 makes every coordinate an int64 lattice point —
    hull turns and areas are integer cross products, bit-stable on any
    platform/partitioning.  Oracle-checked (``SQL_TRAJ_HULL``: chord-witness
    vertex test + window-ordered shoelace) plus an independent
    gift-wrapping oracle in tests/test_operators.py::TestTrajHull.  Same
    one-bucket-shuffle shape as the other per-user trajectory ops."""
    from ..geo.simplify import convex_hull_int, polygon_area2_int

    ds = _t(sf_dir, "events", ["event_id", "user_id"])

    def add_cols(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        # lon20 = lon * 20 exactly (lon = (eid % 3600)/10 - 180 + 0.05)
        lon20 = (eid % 3600) * 2 - 3600 + 1
        lat20 = ((eid * 7) % 1800) * 2 - 1800 + 1
        return pa.table({"user_id": t["user_id"],
                         "x": pa.array(lon20), "y": pa.array(lat20),
                         "bucket": pa.array((uid * 2654435761) % 64)})

    def hull(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for u, gg in g.groupby("user_id", sort=False):
            pts = gg[["x", "y"]].drop_duplicates()
            x = pts["x"].to_numpy(dtype=np.int64)
            y = pts["y"].to_numpy(dtype=np.int64)
            h = convex_hull_int(x, y)
            rows.append((u, len(x), len(h),
                         abs(polygon_area2_int(x[h], y[h]))))
        return pd.DataFrame(rows, columns=["user_id", "n_distinct_pts",
                                           "hull_vertices", "hull_area2"])

    return (
        ds.map_batches(add_cols, batch_format="pyarrow")
        .repartition(cluster_partitions())
        .groupby("bucket")
        .map_groups(hull, batch_format="pandas")
    )


# SQL twin of q_traj_hull.  Strict (collinear-excluding) convex-hull
# vertices via the chord-witness characterization: a per-x y-extreme point
# p is an upper-hull vertex iff NO chord (a, b) of other upper-extreme
# points spans p's x with p on or below it (integer cross products, exact);
# lower hull symmetric.  Vertex count = |upper ∪ lower|; area = shoelace
# over the ring ordered lower-asc-x then upper-only-desc-x (the monotone-
# chain boundary order), cyclic closure via LEAD + FIRST_VALUE.  Verified
# identical to the engine's Andrew-monotone-chain output (and to the
# independent gift-wrapping oracle) at sf0.001/sf0.01.
SQL_TRAJ_HULL = (
    "WITH p AS (SELECT DISTINCT user_id, "
    "CAST((event_id % 3600)*2 - 3600 + 1 AS BIGINT) AS x, "
    "CAST(((event_id*7) % 1800)*2 - 1800 + 1 AS BIGINT) AS y FROM events), "
    "u AS (SELECT user_id, x, MAX(y) AS y FROM p GROUP BY 1, 2), "
    "l AS (SELECT user_id, x, MIN(y) AS y FROM p GROUP BY 1, 2), "
    "uv AS (SELECT * FROM u p WHERE NOT EXISTS ("
    "SELECT 1 FROM u a, u b "
    "WHERE a.user_id = p.user_id AND b.user_id = p.user_id "
    "AND a.x < p.x AND b.x >= p.x AND a.x < b.x "
    "AND NOT (b.x = p.x AND b.y = p.y) "
    "AND (b.x - a.x)*(p.y - a.y) - (b.y - a.y)*(p.x - a.x) <= 0)), "
    "lv AS (SELECT * FROM l p WHERE NOT EXISTS ("
    "SELECT 1 FROM l a, l b "
    "WHERE a.user_id = p.user_id AND b.user_id = p.user_id "
    "AND a.x < p.x AND b.x >= p.x AND a.x < b.x "
    "AND NOT (b.x = p.x AND b.y = p.y) "
    "AND (b.x - a.x)*(p.y - a.y) - (b.y - a.y)*(p.x - a.x) >= 0)), "
    "poly AS (SELECT user_id, x, y, 0 AS half FROM lv "
    "UNION ALL SELECT u2.user_id, u2.x, u2.y, 1 FROM uv u2 "
    "WHERE NOT EXISTS (SELECT 1 FROM lv WHERE lv.user_id = u2.user_id "
    "AND lv.x = u2.x AND lv.y = u2.y)), "
    "seq AS (SELECT user_id, x, y, ROW_NUMBER() OVER (PARTITION BY user_id "
    "ORDER BY half, CASE WHEN half = 0 THEN x ELSE -x END) AS rn FROM poly), "
    "ring AS (SELECT user_id, x, y, "
    "COALESCE(LEAD(x) OVER w, FIRST_VALUE(x) OVER w) AS xn, "
    "COALESCE(LEAD(y) OVER w, FIRST_VALUE(y) OVER w) AS yn "
    "FROM seq WINDOW w AS (PARTITION BY user_id ORDER BY rn "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)), "
    "np_ AS (SELECT user_id, COUNT(*) AS n_distinct_pts FROM p GROUP BY 1), "
    "hull AS (SELECT user_id, COUNT(*) AS hull_vertices, "
    "ABS(SUM(x*yn - xn*y)) AS hull_area2 FROM ring GROUP BY 1) "
    "SELECT n.user_id, n.n_distinct_pts, "
    "CAST(h.hull_vertices AS BIGINT) AS hull_vertices, "
    "CAST(h.hull_area2 AS BIGINT) AS hull_area2 "
    "FROM np_ n JOIN hull h USING (user_id)"
)


def q_group_regression(sf_dir: str):
    """GROUPED LEAST-SQUARES REGRESSION (per event_type trend of value over
    time — the per-segment drift/trend statistic of monitoring pipelines):
    slope of y (value, e4 ints) on x (days since epoch) per group.

    Distributed EXACTLY: each batch emits integer partial sums
    (n, Sx, Sy, Sxy, Sxx) — all bounded int64 by construction (x ~ 2e4
    days, y ~ e4-scaled) — one tiny groupby sums them, and only the final
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) is computed in arbitrary-
    precision Python ints (the cross terms exceed int64; DuckDB's HUGEINT
    aggregate does the same) before ONE exact-integer-ratio float divide —
    so the result is bit-stable under any partial-aggregation order."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def partials(t: pa.Table) -> pa.Table:
        x = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // 86_400_000_000).astype(np.int64)
        y = round_half_away(t["value"].to_numpy(zero_copy_only=False) * 1e4
                            ).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "n": 1, "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        agg = df.groupby("event_type", sort=False).sum().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx")).to_pandas())
    rows = []
    for r in agg.itertuples():
        n, sx, sy, sxy, sxx = (int(r.n), int(r.sx), int(r.sy), int(r.sxy),
                               int(r.sxx))
        num = n * sxy - sx * sy       # Python bignum: exceeds int64
        den = n * sxx - sx * sx
        rows.append((r.event_type, n, float(num) / float(den)))
    return pd.DataFrame(rows, columns=["event_type", "n", "slope"])


SQL_GROUP_REGRESSION = (
    "WITH b AS (SELECT event_type, "
    "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS x, "
    "CAST(ROUND(value * 10000, 0) AS BIGINT) AS y FROM events) "
    "SELECT event_type, COUNT(*) AS n, "
    "CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE) / "
    "CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE) AS slope "
    "FROM b GROUP BY 1"
)


def q_er_join(sf_dir: str):
    """ENTITY-RESOLUTION blocked similarity self-join (record linkage):
    candidate pairs are generated only WITHIN a blocking key (first 16
    chars of c_name — the standard blocking that makes fuzzy matching
    tractable at scale: O(sum block^2) instead of O(n^2)), then scored
    with exact Levenshtein and kept at distance <= 1.

    Shape: one crc block-bucket shuffle; per bucket a vectorized
    upper-triangle pair expansion + the batched DP kernel
    (``stages.text.levenshtein_batch`` — one numpy DP per length
    combination, not one Python table per pair).  The blocking-key size
    bounds reducer memory; skewed blocks would salt exactly like the other
    bucketed reducers."""
    import zlib as _z

    from ..stages.text import levenshtein_batch

    ds = _t(sf_dir, "customer", ["c_custkey", "c_name"])

    def add_block(t: pa.Table) -> pa.Table:
        names = t["c_name"].to_pylist()
        blk = [n[:16] for n in names]
        b = np.fromiter((_z.crc32(k.encode()) % 64 for k in blk),
                        dtype=np.int64, count=len(blk))
        return pa.table({"c_custkey": t["c_custkey"], "c_name": t["c_name"],
                         "blk": pa.array(blk, pa.string()),
                         "bucket": pa.array(b)})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, gg in g.groupby("blk", sort=False):
            gg = gg.sort_values("c_custkey", kind="stable")
            keys = gg["c_custkey"].to_numpy(dtype=np.int64)
            names = gg["c_name"].tolist()
            m = len(keys)
            if m < 2:
                continue
            iu, ju = np.triu_indices(m, k=1)
            dist = levenshtein_batch([names[i] for i in iu],
                                     [names[j] for j in ju])
            hit = dist <= 1
            out.append(pd.DataFrame({
                "custkey_a": keys[iu[hit]], "custkey_b": keys[ju[hit]],
                "dist": dist[hit]}))
        if not out:
            return pd.DataFrame({"custkey_a": pd.Series(dtype="int64"),
                                 "custkey_b": pd.Series(dtype="int64"),
                                 "dist": pd.Series(dtype="int64")})
        return pd.concat(out, ignore_index=True)

    return (ds.map_batches(add_block, batch_format="pyarrow")
            .repartition(cluster_partitions())
            .groupby("bucket").map_groups(pairs, batch_format="pandas"))


SQL_ER_JOIN = (
    "WITH b AS (SELECT c_custkey, c_name, substr(c_name, 1, 16) AS blk FROM customer) "
    "SELECT a.c_custkey AS custkey_a, b2.c_custkey AS custkey_b, "
    "CAST(levenshtein(a.c_name, b2.c_name) AS BIGINT) AS dist "
    "FROM b a JOIN b b2 ON a.blk = b2.blk AND a.c_custkey < b2.c_custkey "
    "WHERE levenshtein(a.c_name, b2.c_name) <= 1"
)


def q_outlier_trim(sf_dir: str):
    """Percentile OUTLIER TRIMMING per group (the winsorization flag pass
    of feature hygiene) with EXACT distributed quantiles over a
    high-cardinality value column — the classic two-phase algorithm, never
    a sort of the corpus:

    1. per-group (n, min, max) aggregate;
    2. per-(group, 256-range-bin) counts -> the driver locates, for each
       of p05/p95, the bin holding rank ceil(q*n) and the rank within it
       (O(groups x 256) driver state);
    3. ONE more pass gathers only the values inside target bins (~n/256
       rows per group) -> exact discrete quantile (DuckDB quantile_disc
       semantics: 1-based rank ceil(q*n));
    4. a final vectorized pass flags rows strictly outside [p05, p95].

    Everything integer (value e4), so the SQL twin hashes bit-identically."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..functions.rounding import round_half_away

    B = 256
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def to_e4(t: pa.Table) -> pa.Table:
        e4 = round_half_away(t["value"].to_numpy(zero_copy_only=False) * 1e4
                             ).astype(np.int64)
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"], "e4": pa.array(e4)})

    v = ds.map_batches(to_e4, batch_format="pyarrow").materialize()
    stats = (v.groupby("event_type")
             .aggregate(Count(alias_name="n"), Min("e4", alias_name="mn"),
                        Max("e4", alias_name="mx")).to_pandas())
    srow = {r.event_type: (int(r.n), int(r.mn), int(r.mx))
            for r in stats.itertuples()}

    def bin_of(et_arr, e4_arr):
        mn = np.array([srow[e][1] for e in et_arr], dtype=np.int64)
        mx = np.array([srow[e][2] for e in et_arr], dtype=np.int64)
        return (e4_arr - mn) * B // (mx - mn + 1)

    def binned(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pylist()
        e4 = t["e4"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "bin": bin_of(et, e4)})
        p = df.value_counts(["event_type", "bin"]).reset_index(name="n")
        return pa.Table.from_pandas(p, preserve_index=False)

    counts = (v.map_batches(binned, batch_format="pyarrow")
              .groupby(["event_type", "bin"]).aggregate(Sum("n", alias_name="n"))
              .to_pandas())

    # driver: locate the bin + within-bin rank for each target quantile
    targets: dict = {}
    for et, g in counts.groupby("event_type"):
        g = g.sort_values("bin")
        cum = g["n"].astype(np.int64).cumsum().to_numpy()
        bins = g["bin"].to_numpy(dtype=np.int64)
        n = srow[et][0]
        for q in (0.05, 0.95):
            rank = int(np.ceil(q * n))
            i = int(np.searchsorted(cum, rank))
            before = int(cum[i - 1]) if i > 0 else 0
            targets.setdefault(et, []).append((q, int(bins[i]), rank - before))
    tbins = {(et, b) for et, lst in targets.items() for _, b, _ in lst}

    def gather(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pylist()
        e4 = t["e4"].to_numpy(zero_copy_only=False)
        bn = bin_of(et, e4)
        keep = np.fromiter(((e, b) in tbins for e, b in zip(et, bn)),
                           dtype=bool, count=len(et))
        return pa.table({"event_type": pa.array([e for e, k in zip(et, keep) if k],
                                                pa.string()),
                         "bin": pa.array(bn[keep]), "e4": pa.array(e4[keep])})

    got = v.map_batches(gather, batch_format="pyarrow").to_pandas()
    thr: dict = {}
    for et, lst in targets.items():
        qs = {}
        for q, b, rib in lst:
            vals = np.sort(got[(got["event_type"] == et) & (got["bin"] == b)]
                           ["e4"].to_numpy(dtype=np.int64))
            qs[q] = int(vals[rib - 1])
        thr[et] = (qs[0.05], qs[0.95])

    def flag(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pylist()
        e4 = t["e4"].to_numpy(zero_copy_only=False)
        lo = np.array([thr[e][0] for e in et], dtype=np.int64)
        hi = np.array([thr[e][1] for e in et], dtype=np.int64)
        m = (e4 < lo) | (e4 > hi)
        tail = np.where(e4 < lo, "low", "high")
        return pa.table({"event_id": t["event_id"].filter(pa.array(m)),
                         "event_type": pa.array(np.array(et, dtype=object)[m],
                                                pa.string()),
                         "value_e4": pa.array(e4[m]),
                         "tail": pa.array(tail[m], pa.string())})

    return v.map_batches(flag, batch_format="pyarrow")


SQL_OUTLIER_TRIM = (
    "WITH v AS (SELECT event_id, event_type, "
    "CAST(ROUND(value * 10000, 0) AS BIGINT) AS e4 FROM events), "
    "q AS (SELECT event_type, quantile_disc(e4, 0.05) AS p05, "
    "quantile_disc(e4, 0.95) AS p95 FROM v GROUP BY 1) "
    "SELECT v.event_id, v.event_type, v.e4 AS value_e4, "
    "CASE WHEN v.e4 < q.p05 THEN 'low' ELSE 'high' END AS tail "
    "FROM v JOIN q USING (event_type) WHERE v.e4 < q.p05 OR v.e4 > q.p95"
)


def q_event_transitions(sf_dir: str):
    """Markov TRANSITION COUNTS over the per-user event stream (the
    sequence-statistics aggregate behind session modeling): consecutive
    (prev_type -> next_type) pairs in (ts, event_id) order per user,
    counted corpus-wide.  One crc user-bucket shuffle, one vectorized
    shift pass per bucket emitting tiny (pair, n) partials, one
    O(|types|^2) groupby."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid * 2654435761) % 64))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = np.concatenate([[False], u[1:] == u[:-1]])
        prev = np.roll(et, 1)
        df = pd.DataFrame({"prev_type": prev[same], "next_type": et[same]})
        p = df.value_counts(["prev_type", "next_type"]).reset_index(name="n")
        return p

    from ray.data.aggregate import Sum

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .repartition(cluster_partitions())
           .groupby("bucket").map_groups(pairs, batch_format="pandas")
           .groupby(["prev_type", "next_type"]).aggregate(Sum("n", alias_name="n")))
    pdf = out.to_pandas()
    pdf["n"] = pdf["n"].astype("int64")
    return pdf


SQL_EVENT_TRANSITIONS = (
    "WITH s AS (SELECT user_id, event_type, "
    "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type "
    "FROM events) "
    "SELECT prev_type, event_type AS next_type, COUNT(*) AS n FROM s "
    "WHERE prev_type IS NOT NULL GROUP BY 1, 2"
)


def q_time_weighted_avg(sf_dir: str):
    """TIME-WEIGHTED AVERAGE per user (the TSDB/metering aggregate: each
    value holds until the next observation): sum(v_e4 * dt_sec) /
    sum(dt_sec) over consecutive events per user.

    Integer-exact: dt in whole seconds (microsecond floor division),
    v_e4 e4-quantized; per-user numerator/denominator fold as int64 sums
    (bounded: years-of-seconds x e4 values x events stays < 2^63) and the
    single final divide is an exact-integer ratio, so the HUGEINT SQL twin
    hashes identically.  Same one-bucket-shuffle trajectory shape."""
    from ..functions.rounding import round_half_away

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_cols(t: pa.Table) -> pa.Table:
        e4 = round_half_away(t["value"].to_numpy(zero_copy_only=False) * 1e4
                             ).astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "ts": t["ts"], "e4": pa.array(e4),
                         "bucket": pa.array((uid * 2654435761) % 64)})

    def twa(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        ts_us = g["ts"].astype("int64").to_numpy()
        e4 = g["e4"].to_numpy()
        same = np.concatenate([u[1:] == u[:-1], [False]])  # row has a NEXT
        dt_s = np.concatenate([(ts_us[1:] - ts_us[:-1]) // 1_000_000, [0]])
        num = np.where(same, e4 * dt_s, 0)
        den = np.where(same, dt_s, 0)
        df = pd.DataFrame({"user_id": u, "num": num, "den": den})
        agg = df.groupby("user_id", sort=False).agg(
            num=("num", "sum"), den=("den", "sum")).reset_index()
        agg = agg[agg["den"] > 0]
        return pd.DataFrame({
            "user_id": agg["user_id"].to_numpy(dtype=np.int64),
            "twa": agg["num"].to_numpy(dtype=np.float64)
            / agg["den"].to_numpy(dtype=np.float64),
        })

    return (ds.map_batches(add_cols, batch_format="pyarrow")
            .repartition(cluster_partitions())
            .groupby("bucket").map_groups(twa, batch_format="pandas"))


SQL_TIME_WEIGHTED_AVG = (
    "WITH s AS (SELECT user_id, CAST(ROUND(value * 10000, 0) AS BIGINT) AS e4, "
    "(LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "- epoch_us(ts)) // 1000000 AS dt_s FROM events) "
    "SELECT user_id, CAST(SUM(e4 * dt_s) AS DOUBLE) / CAST(SUM(dt_s) AS DOUBLE) AS twa "
    "FROM s WHERE dt_s IS NOT NULL GROUP BY user_id HAVING SUM(dt_s) > 0"
)


FUNNEL_STAGES = ("view", "click", "purchase")
FUNNEL_WINDOW_US = 86_400_000_000  # 24 h conversion window per stage


def q_funnel(sf_dir: str):
    """FUNNEL CONVERSION per user (product-analytics staple): how far each
    user progresses through view -> click -> purchase in strict event-time
    order (stage k+1 must occur STRICTLY after the earliest completion of
    stage k and within the 24 h conversion window).  Emits (user_id, stages, t1_us, t2_us, t3_us) with NULL-free
    int64 columns (-1 = stage not reached) so the SQL twin hashes exactly.

    One crc user-bucket shuffle; per bucket the three stage times compute
    as vectorized grouped mins over masked frames — no per-user Python
    loop."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid * 2654435761) % 64))

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("int64")
        g = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                          "event_type": g["event_type"].to_numpy(),
                          "ts": ts.to_numpy()})
        users = np.unique(g["user_id"].to_numpy())
        out = pd.DataFrame({"user_id": users}).set_index("user_id")
        prev = None
        for i, stage in enumerate(FUNNEL_STAGES, start=1):
            m = g["event_type"].to_numpy() == stage
            sub = g[m]
            if prev is not None:
                lim = out[f"t{i - 1}_us"].reindex(sub["user_id"]).to_numpy()
                ok = (sub["ts"].to_numpy() > lim) & (
                    sub["ts"].to_numpy() <= lim + FUNNEL_WINDOW_US)
                sub = sub[ok]
            t = sub.groupby("user_id")["ts"].min()
            out[f"t{i}_us"] = t.reindex(users).fillna(-1).astype(np.int64)
            prev = stage
        out["stages"] = (out[["t1_us", "t2_us", "t3_us"]].to_numpy() >= 0).sum(
            axis=1).astype(np.int64)
        return out.reset_index()[["user_id", "stages", "t1_us", "t2_us", "t3_us"]]

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .repartition(cluster_partitions())
            .groupby("bucket").map_groups(funnel, batch_format="pandas"))


SQL_FUNNEL = (
    "WITH u AS (SELECT DISTINCT user_id FROM events), "
    "s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events "
    "WHERE event_type = 'view' GROUP BY 1), "
    "s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2 FROM events e "
    "JOIN s1 ON e.user_id = s1.user_id AND epoch_us(e.ts) > s1.t1 "
    f"AND epoch_us(e.ts) <= s1.t1 + {FUNNEL_WINDOW_US} "
    "WHERE e.event_type = 'click' GROUP BY 1), "
    "s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3 FROM events e "
    "JOIN s2 ON e.user_id = s2.user_id AND epoch_us(e.ts) > s2.t2 "
    f"AND epoch_us(e.ts) <= s2.t2 + {FUNNEL_WINDOW_US} "
    "WHERE e.event_type = 'purchase' GROUP BY 1) "
    "SELECT u.user_id, "
    "CAST(CASE WHEN s1.user_id IS NULL THEN 0 ELSE 1 END "
    "+ CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END "
    "+ CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stages, "
    "COALESCE(s1.t1, -1) AS t1_us, COALESCE(s2.t2, -1) AS t2_us, "
    "COALESCE(s3.t3, -1) AS t3_us "
    "FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) "
    "LEFT JOIN s3 USING (user_id)"
)


SLIDING_WINDOW_US = 3_600_000_000  # trailing 1 h


def q_sliding_count(sf_dir: str):
    """SLIDING-WINDOW COUNT per event (the rate-limiting / burst-detection
    primitive, distinct from the tumbling ``hourly_window``): for every
    event, how many events the same user produced in the trailing hour
    INCLUSIVE of the event's own timestamp peers (SQL RANGE-frame peer
    semantics: all rows with equal ts count together).

    One crc user-bucket shuffle; per bucket each user's sorted timestamp
    array answers every window with two vectorized ``searchsorted`` calls
    — O(n log n) per user, no per-event loop, never a cross join."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid * 2654435761) % 64))

    def windowed(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        ts = g["ts"].astype("int64").to_numpy()
        out = np.empty(len(g), np.int64)
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        ends = np.concatenate([starts[1:], [len(g)]])
        for a, b in zip(starts, ends):
            seg = ts[a:b]
            hi = np.searchsorted(seg, seg, side="right")
            lo = np.searchsorted(seg, seg - SLIDING_WINDOW_US, side="left")
            out[a:b] = hi - lo
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(dtype=np.int64),
                             "user_id": u.astype(np.int64),
                             "n_trailing": out})

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .repartition(cluster_partitions())
            .groupby("bucket").map_groups(windowed, batch_format="pandas"))


SQL_SLIDING_COUNT = (
    "SELECT event_id, user_id, CAST(COUNT(*) OVER (PARTITION BY user_id "
    "ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
    "AS BIGINT) AS n_trailing FROM events"
)


HLL_BUCKETS = 64
HLL_W = 55  # value width: the kmv hash is < 2^61; the TOP 6 bits select the
# bucket (the hash's low bits are visibly structured for small consecutive
# ids — measured 15/64 distinct low-bit buckets vs 63/64 high-bit), the low
# 55 bits are the rank value
HLL_SHIFT = 1 << 55


def q_hll_registers(sf_dir: str):
    """HYPERLOGLOG registers per group (the mergeable distinct-count sketch
    of the round-4 roadmap, landed early): per event_type, 64 max-rank
    registers over kmv-hashed user ids.  The KMV discipline applies — the
    sketch is DETERMINISTIC (same hash both engines), so the DuckDB twin
    reproduces the registers bit-for-bit rather than a tolerance band; the
    estimate's error bound is asserted separately in tests.

    Scale shape: per-batch partials reduce to <= groups x 64 rows before
    ONE bounded groupby-Max — registers merge associatively (max), the
    textbook distributed-sketch property."""
    from ray.data.aggregate import Max

    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    pow2 = 2 ** np.arange(HLL_W + 1, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        h = _kmv_hash(t["user_id"].to_numpy(zero_copy_only=False))
        b = h // HLL_SHIFT
        w = h % HLL_SHIFT
        bitlen = np.searchsorted(pow2, w, side="right")  # exact, no float log
        rank = np.where(w > 0, HLL_W - bitlen + 1, HLL_W + 1).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "bucket": b, "rank": rank})
        p = df.groupby(["event_type", "bucket"], sort=False)["rank"].max()
        return pa.Table.from_pandas(p.reset_index(name="register"),
                                    preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["event_type", "bucket"])
           .aggregate(Max("register", alias_name="register")))
    pdf = out.to_pandas()
    pdf["bucket"] = pdf["bucket"].astype("int64")
    pdf["register"] = pdf["register"].astype("int64")
    return pdf


def hll_registers_sql() -> str:
    A, A2, B, P = _KMV_A, _KMV_A2, _KMV_B, _KMV_P
    return (
        f"WITH h1 AS (SELECT event_type, (user_id * {A} + {B}) % {P} AS h FROM events), "
        f"hh AS (SELECT event_type, ((h % 1073741824) * {A2}) % {P} AS term1, "
        f"((h // 1073741824) * {A2}) % {P} AS tt FROM h1), "
        f"hx AS (SELECT event_type, ((term1 + ((tt % 2147483648) * 1073741824 "
        f"+ tt // 2147483648) % {P}) % {P}) AS h FROM hh), "
        f"r AS (SELECT event_type, h // {HLL_SHIFT} AS bucket, "
        f"CASE WHEN h % {HLL_SHIFT} = 0 THEN {HLL_W + 1} "
        f"ELSE {HLL_W} - length(bin(h % {HLL_SHIFT})) + 1 END AS rank FROM hx) "
        "SELECT event_type, bucket, CAST(MAX(rank) AS BIGINT) AS register "
        "FROM r GROUP BY 1, 2"
    )


COPURCHASE_MIN_SUPPORT = 3


def q_copurchase(sf_dir: str):
    """MARKET-BASKET pair mining over lineitem (the co-occurrence /
    association-rule primitive of recommender pipelines): for every part
    pair bought together in >= 3 orders, support and integer-exact
    confidence (n_pair * 1e4 // n_a, the P(b|a) direction with a < b).

    Scale shape: baskets are BOUNDED (TPC-H orders hold <= 7 lines), so
    the per-order pair explode is O(lines^2) with a tiny constant — one
    crc order-bucket shuffle colocates each basket, segments batch by
    BASKET SIZE so the triangle expansion is one reshape + fancy-index per
    size class (no per-order loop), then one groupby over distinct pairs.
    Item supports reuse the same colocated groups (global (order, part)
    dedup is free there); the item map is broadcast into the confidence
    column (items dwarf pairs, the join is map-side)."""
    from ray.data.aggregate import Sum

    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def add_bucket(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((ok * 2654435761) % 64))

    bucketed = (ds.map_batches(add_bucket, batch_format="pyarrow")
                .repartition(cluster_partitions()).groupby("bucket"))

    def pair_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = (g[["l_orderkey", "l_partkey"]].drop_duplicates()
             .sort_values(["l_orderkey", "l_partkey"], kind="stable"))
        ok = g["l_orderkey"].to_numpy()
        pk = g["l_partkey"].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(np.concatenate([[True], ok[1:] != ok[:-1]]))
        sizes = np.diff(np.concatenate([starts, [len(g)]]))
        pa_, pb_ = [], []
        for m in np.unique(sizes):           # <= 7 size classes, not orders
            if m < 2:
                continue
            seg_starts = starts[sizes == m]
            # (k, m) matrix of the baskets of size m
            mat = pk[(seg_starts[:, None] + np.arange(m)[None, :])]
            iu, ju = np.triu_indices(int(m), k=1)
            pa_.append(mat[:, iu].ravel())
            pb_.append(mat[:, ju].ravel())
        if not pa_:
            return pd.DataFrame({"part_a": pd.Series(dtype="int64"),
                                 "part_b": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        df = pd.DataFrame({"part_a": np.concatenate(pa_),
                           "part_b": np.concatenate(pb_)})
        p = df.value_counts(["part_a", "part_b"]).reset_index(name="n")
        # ONE int64 shuffle key (a << 32 | b; part keys < 2^31 by schema):
        # Ray's multi-column hash aggregate measured 17x slower than the
        # packed single-key groupby on this pair table (70 s vs 4 s)
        p["key"] = (p["part_a"].to_numpy(dtype=np.int64) << 32) | \
            p["part_b"].to_numpy(dtype=np.int64)
        return p[["key", "n"]]

    # map_groups emits PANDAS blocks; Ray's hash aggregate over them
    # measured 25x slower than over arrow blocks (56 s vs 2.2 s on this
    # pair table) — convert + coalesce before the shuffle
    pairs = (bucketed.map_groups(pair_partial, batch_format="pandas")
             .map_batches(lambda t: t, batch_format="pyarrow")
             .repartition(cluster_partitions())
             .groupby("key").aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    pairs = pairs[pairs["n"].astype(np.int64) >= COPURCHASE_MIN_SUPPORT].copy()
    key = pairs["key"].to_numpy(dtype=np.int64)
    pairs["part_a"] = key >> 32
    pairs["part_b"] = key & ((1 << 32) - 1)

    def item_partial(g: pd.DataFrame) -> pd.DataFrame:
        # orders are colocated here, so this dedup is globally correct
        df = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        return df.value_counts(["l_partkey"]).reset_index(name="n")

    items = (bucketed.map_groups(item_partial, batch_format="pandas")
             .map_batches(lambda t: t, batch_format="pyarrow")
             .repartition(cluster_partitions())
             .groupby("l_partkey").aggregate(Sum("n", alias_name="n_item"))
             .to_pandas())
    supp = dict(zip(items["l_partkey"].astype(np.int64),
                    items["n_item"].astype(np.int64)))

    na = pairs["part_a"].astype(np.int64).map(supp).to_numpy(dtype=np.int64)
    out = pd.DataFrame({
        "part_a": pairs["part_a"].astype("int64").to_numpy(),
        "part_b": pairs["part_b"].astype("int64").to_numpy(),
        "n_pair": pairs["n"].astype("int64").to_numpy(),
        "conf_ab_e4": pairs["n"].astype(np.int64).to_numpy() * 10_000 // na,
    })
    return out.sort_values(["part_a", "part_b"]).reset_index(drop=True)


SQL_COPURCHASE = (
    "WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
    "p AS (SELECT a.l_partkey AS part_a, c.l_partkey AS part_b, COUNT(*) AS n_pair "
    "FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey "
    f"GROUP BY 1, 2 HAVING COUNT(*) >= {COPURCHASE_MIN_SUPPORT}), "
    "s AS (SELECT l_partkey AS part, COUNT(*) AS n_item FROM b GROUP BY 1) "
    "SELECT p.part_a, p.part_b, p.n_pair, "
    "CAST(p.n_pair * 10000 // s.n_item AS BIGINT) AS conf_ab_e4 "
    "FROM p JOIN s ON p.part_a = s.part"
)


def q_table_digest(sf_dir: str):
    """ORDER-INDEPENDENT TABLE DIGEST (the anti-entropy / replica-
    verification primitive: compare two copies of a 100 TB table without
    moving either): every row folds to one kmv hash of a canonical integer
    encoding, and the table digest is the SUM of row hashes mod P — an
    abelian fold, so ANY partitioning/order yields the same digest, and a
    single changed row changes it.

    One streaming pass per table, one mod-P partial row per batch, a
    driver bignum fold at the end.  Digesting orders (key+cents), lineitem
    (key+line+qty) and events (id+user)."""
    from ..functions.rounding import round_half_away

    def digest(name: str, make_vals) -> tuple:
        ds = _t(sf_dir, name, make_vals.__annotations__["cols"])

        def partial(t: pa.Table) -> pa.Table:
            v = make_vals(t)
            h = _kmv_hash_wide(v)
            # h.sum() over one batch can exceed int64 — fold in Python ints
            return pa.table({"s": pa.array([int(sum(int(x) for x in h) % _KMV_P)]),
                             "n": pa.array([len(h)])})

        # one tiny row per batch; the cross-batch fold happens mod P in
        # Python bignums (a Ray Sum would overflow int64 — the SQL twin's
        # HUGEINT SUM % P is the same fold)
        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        return int(parts["n"].sum()), int(sum(int(x) for x in parts["s"]) % _KMV_P)

    def orders_vals(t: pa.Table) -> np.ndarray:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = round_half_away(t["o_totalprice"].to_numpy(zero_copy_only=False)
                            * 100).astype(np.int64)
        return (k * 1_000_003 + c) % _KMV_P
    orders_vals.__annotations__["cols"] = ["o_orderkey", "o_totalprice"]

    def lineitem_vals(t: pa.Table) -> np.ndarray:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = t["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        return (k * 1_000_003 + ln * 1009 + q) % _KMV_P
    lineitem_vals.__annotations__["cols"] = ["l_orderkey", "l_linenumber",
                                             "l_quantity"]

    def events_vals(t: pa.Table) -> np.ndarray:
        e = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return (e * 1_000_003 + u) % _KMV_P
    events_vals.__annotations__["cols"] = ["event_id", "user_id"]

    rows = []
    for name, fn in (("orders", orders_vals), ("lineitem", lineitem_vals),
                     ("events", events_vals)):
        n, d = digest(name, fn)
        rows.append((name, n, d))
    return pd.DataFrame(rows, columns=["table_name", "n_rows", "digest"])


def table_digest_sql() -> str:
    A, A2, B, P = _KMV_A, _KMV_A2, _KMV_B, _KMV_P

    def kmv_sum(expr: str, src: str) -> str:
        return (
            f"(WITH v AS (SELECT ({expr}) % {P} AS x FROM {src}), "
            f"r1 AS (SELECT ((x >> 30) * {A}) % {P} AS t, x % 1073741824 AS xlo FROM v), "
            f"h1 AS (SELECT ((xlo * {A}) % {P} "
            f"+ ((t % 2147483648) * 1073741824 + (t >> 31)) % {P} + {B}) % {P} AS h FROM r1), "
            f"hh AS (SELECT ((h % 1073741824) * {A2}) % {P} AS term1, "
            f"((h // 1073741824) * {A2}) % {P} AS tt FROM h1) "
            f"SELECT CAST(SUM(((term1 + ((tt % 2147483648) * 1073741824 "
            f"+ (tt >> 31)) % {P}) % {P})) % {P} AS BIGINT) FROM hh)"
        )

    oc = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
    return (
        f"SELECT 'orders' AS table_name, (SELECT COUNT(*) FROM orders) AS n_rows, "
        f"{kmv_sum(f'o_orderkey * 1000003 + {oc}', 'orders')} AS digest "
        f"UNION ALL SELECT 'lineitem', (SELECT COUNT(*) FROM lineitem), "
        f"{kmv_sum('l_orderkey * 1000003 + l_linenumber * 1009 + CAST(l_quantity AS BIGINT)', 'lineitem')} "
        f"UNION ALL SELECT 'events', (SELECT COUNT(*) FROM events), "
        f"{kmv_sum('event_id * 1000003 + user_id', 'events')}"
    )


def q_weighted_sample(sf_dir: str):
    """WEIGHT-PROPORTIONAL sampling (the importance-sampling step of
    training-data curation: keep probability proportional to a per-row
    weight, here the event value): keep iff
    ``kmv_hash(event_id) % max_e4 < value_e4`` — P(keep) = value / max,
    deterministic on any cluster size, integer-exact, so the SQL twin
    reproduces the exact row set.

    One tiny MAX aggregate, then an embarrassingly-parallel vectorized
    mask; no shuffle."""
    from ray.data.aggregate import Max

    from ..functions.rounding import round_half_away

    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def to_e4(t: pa.Table) -> pa.Table:
        e4 = round_half_away(t["value"].to_numpy(zero_copy_only=False) * 1e4
                             ).astype(np.int64)
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"], "value_e4": pa.array(e4)})

    v = ds.map_batches(to_e4, batch_format="pyarrow").materialize()
    max_e4 = int(v.aggregate(Max("value_e4"))["max(value_e4)"])

    def pick(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        e4 = t["value_e4"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_kmv_hash(ids) % max_e4 < e4))

    return v.map_batches(pick, batch_format="pyarrow")


def weighted_sample_sql() -> str:
    A, A2, B, P = _KMV_A, _KMV_A2, _KMV_B, _KMV_P
    return (
        "WITH v AS (SELECT event_id, event_type, "
        "CAST(ROUND(value * 10000, 0) AS BIGINT) AS value_e4 FROM events), "
        "mx AS (SELECT MAX(value_e4) AS m FROM v), "
        f"h1 AS (SELECT event_id, event_type, value_e4, "
        f"(event_id * {A} + {B}) % {P} AS h FROM v), "
        f"hh AS (SELECT event_id, event_type, value_e4, "
        f"((h % 1073741824) * {A2}) % {P} AS term1, "
        f"((h // 1073741824) * {A2}) % {P} AS tt FROM h1) "
        f"SELECT event_id, event_type, value_e4 FROM hh, mx WHERE "
        f"((term1 + ((tt % 2147483648) * 1073741824 + tt // 2147483648) % {P}) % {P}) "
        f"% mx.m < value_e4"
    )


# --- cube / gap-fill / edit-distance blocking --------------------------------


def q_cube_counts(sf_dir: str):
    """GROUP BY CUBE(event_type, year) — all four grouping sets in ONE
    pass: the per-batch combiner emits only base (type, year) partials (a
    handful of rows per batch), one tiny packed-string-key groupby reduces
    them, and the three coarser levels derive from the reduced base on the
    driver (bounded by #types x #years, not the corpus).  'ALL' labels
    mark the rolled-up dimensions."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pandas()
        y = t["ts"].to_pandas().dt.year.astype(str)
        key = et.str.cat(y, sep="|")
        vc = key.value_counts()
        return pa.table({"key": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                         "n": pa.array(vc.to_numpy().astype(np.int64))})

    base = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("key").aggregate(Sum("n", alias_name="n")).to_pandas())
    parts = base["key"].str.rsplit("|", n=1, expand=True)
    b = pd.DataFrame({"event_type_s": parts[0], "year_s": parts[1],
                      "n": base["n"].astype("int64")})
    by_type = (b.groupby("event_type_s", as_index=False)["n"].sum()
               .assign(year_s="ALL"))
    by_year = (b.groupby("year_s", as_index=False)["n"].sum()
               .assign(event_type_s="ALL"))
    grand = pd.DataFrame({"event_type_s": ["ALL"], "year_s": ["ALL"],
                          "n": [int(b["n"].sum())]})
    out = pd.concat([b, by_type, by_year, grand], ignore_index=True)
    return out[["event_type_s", "year_s", "n"]].astype({"n": "int64"})


SQL_CUBE_COUNTS = (
    "WITH b AS (SELECT event_type, year(ts) AS y, COUNT(*) AS n "
    "FROM events GROUP BY 1, 2) "
    "SELECT COALESCE(event_type, 'ALL') AS event_type_s, "
    "COALESCE(CAST(y AS VARCHAR), 'ALL') AS year_s, "
    "CAST(SUM(n) AS BIGINT) AS n FROM b GROUP BY CUBE(event_type, y)"
)


def q_gap_fill(sf_dir: str):
    """Time-series GAP FILL / hourly resample: per event_type, the event
    count in EVERY hour between the global min and max hour — missing
    buckets become explicit zeros (the densification step before any
    windowed/forecast model).  Counts partial-combine per batch on a packed
    (type, hour-index) key; the dense (type x hour) frame is built
    driver-side from the tiny global [min, max] range (bounded by the time
    SPAN and type cardinality, not the corpus) and left-merged."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_pandas()
        hr = (ts.astype("int64") // 3_600_000_000).astype("int64")  # us -> h
        key = t["event_type"].to_pandas().str.cat(hr.astype(str), sep="|")
        vc = key.value_counts()
        return pa.table({"key": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                         "n": pa.array(vc.to_numpy().astype(np.int64))})

    base = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("key").aggregate(Sum("n", alias_name="n")).to_pandas())
    parts = base["key"].str.rsplit("|", n=1, expand=True)
    b = pd.DataFrame({"event_type": parts[0],
                      "h": parts[1].astype("int64"),
                      "n": base["n"].astype("int64")})
    hours = np.arange(b["h"].min(), b["h"].max() + 1, dtype=np.int64)
    types = np.sort(b["event_type"].unique())
    grid = pd.MultiIndex.from_product([types, hours],
                                      names=["event_type", "h"]).to_frame(index=False)
    out = grid.merge(b, on=["event_type", "h"], how="left").fillna({"n": 0})
    out["hour_ts"] = pd.to_datetime(out["h"] * 3600, unit="s")
    return out[["event_type", "hour_ts", "n"]].astype({"n": "int64"})


SQL_GAP_FILL = (
    "WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr FROM events), "
    "c AS (SELECT event_type, hr, COUNT(*) AS n FROM h GROUP BY 1, 2), "
    "series AS (SELECT unnest(generate_series((SELECT MIN(hr) FROM h), "
    "(SELECT MAX(hr) FROM h), INTERVAL 1 HOUR)) AS hr), "
    "types AS (SELECT DISTINCT event_type FROM events) "
    "SELECT t.event_type, s.hr AS hour_ts, CAST(COALESCE(c.n, 0) AS BIGINT) AS n "
    "FROM series s CROSS JOIN types t "
    "LEFT JOIN c ON c.event_type = t.event_type AND c.hr = s.hr"
)


def q_edit1_join(sf_dir: str):
    """Fuzzy-duplicate self-join at edit distance ≤ 1 via FastSS DELETION
    NEIGHBORHOODS — the ER blocking that replaces the oracle's O(n²)
    Levenshtein cross join: every name emits itself plus its len(name)
    single-deletion variants as block keys; names sharing a key are
    CANDIDATES only (a shared deletion does NOT imply distance ≤ 1 —
    'abcd' and 'acdd' both delete to 'acd' at distance 2), so pairs are
    VERIFIED: equal lengths ⟺ hamming ≤ 1 (vectorized byte compare),
    off-by-one lengths ⟺ one-gap subsequence (rare; small loop).
    Insertion pairs can share several keys, so verified pairs dedup
    through one packed-int64-key groupby.  Candidate volume is
    O(n · len · alphabet) vs the oracle's n² Levenshteins.
    -> (a_key, b_key) customer-key pairs."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])

    def expand(t: pa.Table) -> pa.Table:
        keys = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = t["c_name"].to_pylist()
        vkeys, cks, nms = [], [], []
        for ck, nm in zip(keys, names):  # short strings; key GENERATION has
            vkeys.append(nm)             # no vectorized kernel (like crc32)
            cks.append(ck)
            nms.append(nm)
            for i in range(len(nm)):
                vkeys.append(nm[:i] + nm[i + 1:])
                cks.append(ck)
                nms.append(nm)
        return pa.table({"vkey": pa.array(vkeys, pa.string()),
                         "ck": pa.array(np.array(cks, np.int64)),
                         "nm": pa.array(nms, pa.string())})

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        # pandas C-speed self-merge on the block key -> candidate pairs
        m = g.merge(g, on="vkey", suffixes=("_a", "_b"))
        m = m[m["ck_a"] < m["ck_b"]]
        if m.empty:
            return pd.DataFrame({"a_key": pd.Series(dtype="int64"),
                                 "b_key": pd.Series(dtype="int64")})
        la = m["nm_a"].str.len().to_numpy()
        lb = m["nm_b"].str.len().to_numpy()
        ok = np.zeros(len(m), dtype=bool)
        same = la == lb
        if same.any():
            # hamming <= 1, vectorized: equal-length pair blocks compared as
            # fixed-width unicode matrices
            sa = m["nm_a"].to_numpy()[same]
            sb = m["nm_b"].to_numpy()[same]
            okk = np.zeros(len(sa), dtype=bool)
            for ln in np.unique(la[same]):
                sel = la[same] == ln
                aa = np.frombuffer("".join(sa[sel]).encode("utf-32-le"),
                                   dtype=np.uint32).reshape(-1, ln)
                bb = np.frombuffer("".join(sb[sel]).encode("utf-32-le"),
                                   dtype=np.uint32).reshape(-1, ln)
                okk[sel] = (aa != bb).sum(axis=1) <= 1
            ok[same] = okk
        diff = ~same & (np.abs(la - lb) == 1)
        if diff.any():
            for idx in np.nonzero(diff)[0]:  # rare: off-by-one lengths
                s, l = m["nm_a"].iat[idx], m["nm_b"].iat[idx]
                if len(s) > len(l):
                    s, l = l, s
                i = 0
                while i < len(s) and s[i] == l[i]:
                    i += 1
                ok[idx] = s[i:] == l[i + 1:]
        out = m.loc[ok, ["ck_a", "ck_b"]].drop_duplicates()
        return out.rename(columns={"ck_a": "a_key", "ck_b": "b_key"}) \
            .astype({"a_key": "int64", "b_key": "int64"})

    def add_vbucket(t: pa.Table) -> pa.Table:
        # C-level fixed-key siphash (same kernel the salted sink uses) — a
        # per-variant Python crc32 loop here was ~40% of the sf0.1 wall
        v = np.asarray(t["vkey"].to_pylist(), dtype=object)
        b = (pd.util.hash_array(v) % 256).astype(np.int64)
        return t.append_column("vb", pa.array(b))

    cand = (cust.map_batches(expand, batch_format="pyarrow")
            .map_batches(add_vbucket, batch_format="pyarrow")
            .groupby("vb").map_groups(candidates, batch_format="pandas"))

    # global dedup (insertion pairs can surface in several vkey buckets):
    # packed-key groupby, then unpack — custkeys fit 32 bits at any sf here
    def pack(t: pa.Table) -> pa.Table:
        a = t["a_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pk": pa.array((a << np.int64(32)) | b)})

    uniq = (cand.map_batches(pack, batch_format="pyarrow")
            .groupby("pk").aggregate(Count(alias_name="_c")).to_pandas())
    if uniq.empty:
        return pd.DataFrame({"a_key": pd.Series(dtype="int64"),
                             "b_key": pd.Series(dtype="int64")})
    pk = uniq["pk"].to_numpy(dtype=np.int64)
    return pd.DataFrame({"a_key": pk >> np.int64(32),
                         "b_key": pk & np.int64((1 << 32) - 1)})


SQL_EDIT1_JOIN = (
    "SELECT a.c_custkey AS a_key, b.c_custkey AS b_key FROM customer a "
    "JOIN customer b ON a.c_custkey < b.c_custkey "
    "AND levenshtein(a.c_name, b.c_name) <= 1"
)


def q_day_gaps(sf_dir: str):
    """Activity ISLANDS & GAPS: for each user, the runs of calendar days
    with NO events between two active days — the classic sequence-gap
    window pattern (lag + diff > 1), distributed.  Day index is the exact
    integer ``epoch_us // 86_400_000_000`` on both sides.

    Scale shape: per-batch distinct (user, day) partials collapse through
    one packed-int64-key groupby (distinct active days ≪ events); the gap
    scan is a user-bucketed shuffle with a vectorized groupby-shift inside
    each bucket.  -> (user_id, gap_start_day, gap_end_day)."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])
    US_DAY = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = t["ts"].to_pandas().astype("int64").to_numpy() // US_DAY
        pk = np.unique((uid << np.int64(22)) | day)  # day index < 2^22 (~11k yrs)
        return pa.table({"pk": pa.array(pk)})

    distinct = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("pk").aggregate(Count(alias_name="_c")))

    def unpack(t: pa.Table) -> pa.Table:
        pk = t["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = pk >> np.int64(22)
        return pa.table({"user_id": pa.array(uid),
                         "day": pa.array(pk & np.int64((1 << 22) - 1)),
                         "ub": pa.array(uid % 64)})

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day"], kind="stable")
        pd_day = g.groupby("user_id", sort=False)["day"].shift(1)
        keep = (g["day"] - pd_day) > 1
        out = pd.DataFrame({
            "user_id": g.loc[keep, "user_id"].to_numpy(dtype=np.int64),
            "gap_start_day": (pd_day[keep] + 1).to_numpy(dtype=np.int64),
            "gap_end_day": g.loc[keep, "day"].to_numpy(dtype=np.int64) - 1,
        })
        return out

    out = (distinct.map_batches(unpack, batch_format="pyarrow")
           .groupby("ub").map_groups(gaps, batch_format="pandas")).to_pandas()
    if "user_id" not in out.columns:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in ("user_id", "gap_start_day", "gap_end_day")})
    return out.astype({c: "int64" for c in out.columns})


SQL_DAY_GAPS = (
    "WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day "
    "FROM events), "
    "l AS (SELECT user_id, day, LAG(day) OVER "
    "(PARTITION BY user_id ORDER BY day) AS pd FROM d) "
    "SELECT user_id, pd + 1 AS gap_start_day, day - 1 AS gap_end_day "
    "FROM l WHERE pd IS NOT NULL AND day - pd > 1"
)


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape — top-20 customers by returned-item revenue: filter
    lineitem to l_returnflag = 'R', exact-cents revenue partials per order
    key inside map_batches, ONE partitioned int-key join to orders for the
    customer key, a custkey groupby, driver-side top-20 (ties broken on
    custkey), and a 20-key broadcast filter against customer for the name —
    the big tables shuffle once each, the customer table never does."""
    from ..functions.rounding import round_half_away

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.equal(t["l_returnflag"], "R")
        t = t.filter(m)
        rev = round_half_away(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100.0
        ).astype(np.int64)
        df = pd.DataFrame({"k": t["l_orderkey"].to_numpy(zero_copy_only=False),
                           "rev": rev})
        g = df.groupby("k", sort=False)["rev"].sum().reset_index()
        return pa.table({"l_orderkey": pa.array(g["k"].to_numpy(np.int64)),
                         "rev": pa.array(g["rev"].to_numpy(np.int64))})

    rev = li.map_batches(partial, batch_format="pyarrow")
    j = rev.join(orders, join_type="inner", num_partitions=cluster_partitions(),
                 on=("l_orderkey",), right_on=("o_orderkey",))
    by_cust = (j.map_batches(lambda t: pa.table({"o_custkey": t["o_custkey"],
                                                 "rev": t["rev"]}),
                             batch_format="pyarrow")
               .groupby("o_custkey").aggregate(Sum("rev", alias_name="rev"))
               .to_pandas())
    top = (by_cust.sort_values(["rev", "o_custkey"],
                               ascending=[False, True], kind="stable")
           .head(20))
    keys = set(top["o_custkey"].astype(np.int64))
    cust = (_t(sf_dir, "customer", ["c_custkey", "c_name"])
            .map_batches(lambda t: t.filter(
                pc.is_in(t["c_custkey"],
                         value_set=pa.array(sorted(keys), pa.int64()))),
                batch_format="pyarrow").to_pandas())
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["revenue_cents"] = out["rev"].astype("int64")
    return out[["c_custkey", "c_name", "revenue_cents"]] \
        .astype({"c_custkey": "int64"}).reset_index(drop=True)


SQL_RETURNED_REVENUE = (
    "SELECT c_custkey, c_name, revenue_cents FROM ("
    "SELECT c_custkey, c_name, "
    "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) "
    "AS BIGINT) AS revenue_cents "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "WHERE l_returnflag = 'R' GROUP BY 1, 2) "
    "ORDER BY revenue_cents DESC, c_custkey LIMIT 20"
)


def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per event type: a tiny first pass
    broadcasts the type -> index dict (type cardinality is bounded), the
    distinct (type, user) pairs collapse through one packed-int64-key
    groupby, and per-type counts partial-combine — the exact twin of the
    HLL sketch entry, for when approximate is not acceptable."""
    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    types = sorted(ds.groupby("event_type").aggregate(Count(alias_name="_c"))
                   .to_pandas()["event_type"])
    tidx = {s: i for i, s in enumerate(types)}
    import ray as _ray

    tref = _ray.put(tidx)

    def partial(t: pa.Table) -> pa.Table:
        lut = _ray.get(tref)
        ti = t["event_type"].to_pandas().map(lut).to_numpy(dtype=np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pk": pa.array(np.unique((ti << np.int64(48)) | uid))})

    distinct = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("pk").aggregate(Count(alias_name="_c")))

    def count_partial(t: pa.Table) -> pa.Table:
        ti = t["pk"].to_numpy(zero_copy_only=False).astype(np.int64) >> np.int64(48)
        u, c = np.unique(ti, return_counts=True)
        return pa.table({"ti": pa.array(u), "n": pa.array(c.astype(np.int64))})

    counts = (distinct.map_batches(count_partial, batch_format="pyarrow")
              .groupby("ti").aggregate(Sum("n", alias_name="n_users"))
              .to_pandas())
    counts["event_type"] = counts["ti"].map({v: k for k, v in tidx.items()})
    counts["n_users"] = counts["n_users"].astype("int64")
    return counts[["event_type", "n_users"]]


SQL_DISTINCT_USERS = (
    "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
    "FROM events GROUP BY 1"
)


def q_percent_rank(sf_dir: str):
    """PERCENT_RANK within groups, integer-exact: per event_type, rank each
    row by value (RANK ties) and emit ``pr_e6 = (rank-1)*1e6 // (n-1)``
    (0 for singleton groups) — the normalized-score transform feature
    pipelines apply before mixing heterogeneous signals.  Groups are
    type-bounded, so a per-type vectorized pandas rank is the right shape
    (for unbounded groups use global_rank's two-phase counting rank)."""
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        r = g["value"].rank(method="min").astype(np.int64)
        n = len(g)
        pr = ((r - 1) * 1_000_000 // (n - 1)) if n > 1 else pd.Series(0, index=g.index)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(dtype=np.int64),
                             "event_type": g["event_type"],
                             "pr_e6": pr.to_numpy(dtype=np.int64)})

    out = ds.groupby("event_type").map_groups(ranks, batch_format="pandas").to_pandas()
    if "event_id" not in out.columns:
        return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                             "event_type": pd.Series(dtype=object),
                             "pr_e6": pd.Series(dtype="int64")})
    return out.astype({"event_id": "int64", "pr_e6": "int64"})


SQL_PERCENT_RANK = (
    "SELECT event_id, event_type, "
    "CAST(COALESCE((RANK() OVER (PARTITION BY event_type ORDER BY value) - 1) "
    "* 1000000 // NULLIF(COUNT(*) OVER (PARTITION BY event_type) - 1, 0), 0) "
    "AS BIGINT) AS pr_e6 FROM events"
)


def q_run_lengths(sf_dir: str):
    """RUN-LENGTH ENCODING of each user's event-type stream (islands of
    consecutive equal types, ordered by ts with event_id tie-break) — the
    gaps-and-islands pattern feature stores use for streak/session-phase
    features.  One user-bucketed shuffle; inside each bucket the change
    flags and run ids come from vectorized groupby-shift + cumsum.
    -> (user_id, run_id, event_type, run_len)."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def add_ub(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("ub", pa.array(uid % 64))

    def rle(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        by = g.groupby("user_id", sort=False)
        chg = (g["event_type"] != by["event_type"].shift(1)).astype(np.int64)
        run = chg.groupby(g["user_id"], sort=False).cumsum()
        out = (pd.DataFrame({"user_id": g["user_id"], "run_id": run,
                             "event_type": g["event_type"]})
               .groupby(["user_id", "run_id", "event_type"], sort=False)
               .size().reset_index(name="run_len"))
        return out.astype({"user_id": "int64", "run_id": "int64",
                           "run_len": "int64"})

    out = (ds.map_batches(add_ub, batch_format="pyarrow")
           .groupby("ub").map_groups(rle, batch_format="pandas")).to_pandas()
    if "user_id" not in out.columns:
        return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                             "run_id": pd.Series(dtype="int64"),
                             "event_type": pd.Series(dtype=object),
                             "run_len": pd.Series(dtype="int64")})
    return out.astype({"user_id": "int64", "run_id": "int64",
                       "run_len": "int64"})


SQL_RUN_LENGTHS = (
    "WITH w AS (SELECT user_id, ts, event_id, event_type, "
    "CASE WHEN LAG(event_type) OVER u IS DISTINCT FROM event_type "
    "THEN 1 ELSE 0 END AS chg "
    "FROM events WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "r AS (SELECT user_id, event_type, "
    "CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS BIGINT) AS run_id FROM w) "
    "SELECT user_id, run_id, event_type, "
    "CAST(COUNT(*) AS BIGINT) AS run_len FROM r GROUP BY 1, 2, 3"
)


def q_source_overlap(sf_dir: str):
    """Pairwise vocabulary OVERLAP COEFFICIENT between document sources
    (|A∩B| / min(|A|,|B|), e6 integer-exact) — the corpus-mixing diagnostic
    run before blending sources into a training mixture.  Distinct
    (source, word) pairs partial-dedupe per batch, per-source sizes are one
    tiny groupby, the intersection counts come from ONE word-keyed
    self-join (pairs shuffle, vocab never gathers), and the final division
    happens on the (sources²)-bounded pair table."""
    from ray.data.aggregate import Count as _Count

    docs = _t(sf_dir, "documents", ["source", "text"])

    def distinct_words(t: pa.Table) -> pa.Table:
        s = t["source"].to_pandas()
        w = t["text"].to_pandas().fillna("").str.lower().str.strip().str.split()
        df = pd.DataFrame({"source": s.repeat(w.str.len().fillna(0).astype(int)),
                           "word": w.explode().dropna()})
        df = df.drop_duplicates()
        return pa.table({"source": pa.array(df["source"], pa.string()),
                         "word": pa.array(df["word"], pa.string())})

    from ..stages.dedup import _compact_nonempty

    sw = (docs.map_batches(distinct_words, batch_format="pyarrow")
          .groupby(["source", "word"]).aggregate(_Count(alias_name="_c")))
    sw = _compact_nonempty(
        sw.materialize(),
        fallback_schema=pa.schema([("source", pa.string()),
                                   ("word", pa.string()),
                                   ("_c", pa.int64())]))
    sizes = (sw.groupby("source").aggregate(_Count(alias_name="n"))
             .to_pandas().set_index("source")["n"].astype(np.int64))
    pairs = (sw.join(sw, join_type="inner", num_partitions=cluster_partitions(),
                     on=("word",), right_on=("word",), right_suffix="_b")
             .map_batches(lambda t: t.filter(
                 pc.less(t["source"], t["source_b"]))
                 .select(["source", "source_b"]), batch_format="pyarrow"))
    inter = (pairs.map_batches(
        lambda t: pa.table({"k": pc.binary_join_element_wise(
            t["source"], t["source_b"], "|")}), batch_format="pyarrow")
        .groupby("k").aggregate(_Count(alias_name="inter")).to_pandas())
    parts = inter["k"].str.split("|", expand=True)
    a, b = parts[0], parts[1]
    na = sizes.loc[a].to_numpy()
    nb = sizes.loc[b].to_numpy()
    ov = inter["inter"].to_numpy(dtype=np.int64) * 1_000_000 // np.minimum(na, nb)
    return pd.DataFrame({"src_a": a.to_numpy(), "src_b": b.to_numpy(),
                         "overlap_e6": ov}).sort_values(["src_a", "src_b"]) \
        .reset_index(drop=True)


SQL_SOURCE_OVERLAP = (
    "WITH sw AS (SELECT DISTINCT source, unnest(regexp_split_to_array("
    "lower(trim(text)), '\\s+')) AS word FROM documents WHERE trim(text) <> ''), "
    "sz AS (SELECT source, COUNT(*) AS n FROM sw GROUP BY 1), "
    "i AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter "
    "FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source "
    "GROUP BY 1, 2) "
    "SELECT i.src_a, i.src_b, "
    "CAST(i.inter * 1000000 // LEAST(x.n, y.n) AS BIGINT) AS overlap_e6 "
    "FROM i JOIN sz x ON x.source = i.src_a JOIN sz y ON y.source = i.src_b"
)


def q_quantile_sketch(sf_dir: str):
    """Mergeable QUANTILE-SKETCH estimates of l_extendedprice (rows-only:
    the sketch's compaction history is partition-dependent, so exact values
    can't have a SQL twin — the ERROR BOUND is the contract, asserted
    against exact quantiles in tests/test_operators.py::TestQuantileSketch):
    per-batch MRL sketches tree-merge (Bloom-build shape) and answer
    p1/p25/p50/p75/p99 in O(capacity * log n) memory per task — the
    fixed-memory path when grouped_quantiles' exact two-phase co-location
    is too wide.  Output includes the sketch's analytic rank-error bound so
    downstream consumers can see the guarantee next to the estimate."""
    from ..stages.quantile import sketch_quantiles

    li = _t(sf_dir, "lineitem", ["l_extendedprice"])
    qs = (0.01, 0.25, 0.50, 0.75, 0.99)
    est, sk = sketch_quantiles(li, "l_extendedprice", qs, capacity=256)
    return pd.DataFrame({
        "quantile_e2": [int(round(q * 100)) for q in qs],
        "est_cents": [int(round(est[q] * 100)) for q in qs],
        "rank_err_bound": [sk.rank_error_bound()] * len(qs),
        "n": [sk.n] * len(qs),
    })


# --- round-4 late additions: grouped statistics / histograms ----------------


def q_corr_by_group(sf_dir: str):
    """GROUPED PEARSON CORRELATION (quantity vs extendedprice per return
    flag) computed EXACTLY in the distributed setting: per-batch integer
    partial sums (n, Sx, Sy, Sxy, Sxx, Syy) over int-rounded inputs — all
    bounded int64 by construction (x <= 50, y <= ~1e5) — folded by one tiny
    groupby, with the final correlation assembled from Python bignums (the
    cross terms exceed int64; DuckDB's HUGEINT SUM does the same) so the
    result is bit-stable under any partial-aggregation order.  The same
    six-sums shape is how corr/covariance matrices are computed over 100 TB
    without a second pass."""
    from ray.data.aggregate import Sum as _Sum

    import math

    from ..functions.rounding import round_half_away

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partials(t: pa.Table) -> pa.Table:
        x = round_half_away(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        y = round_half_away(t["l_extendedprice"].to_numpy(zero_copy_only=False)).astype(np.int64)
        df = pd.DataFrame({"l_returnflag": t["l_returnflag"].to_pandas(),
                           "n": 1, "sx": x, "sy": y,
                           "sxy": x * y, "sxx": x * x, "syy": y * y})
        agg = df.groupby("l_returnflag", sort=False).sum().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("l_returnflag")
           .aggregate(_Sum("n", alias_name="n"), _Sum("sx", alias_name="sx"),
                      _Sum("sy", alias_name="sy"), _Sum("sxy", alias_name="sxy"),
                      _Sum("sxx", alias_name="sxx"), _Sum("syy", alias_name="syy"))
           .to_pandas())
    rows = []
    for r in agg.itertuples():
        n, sx, sy = int(r.n), int(r.sx), int(r.sy)
        sxy, sxx, syy = int(r.sxy), int(r.sxx), int(r.syy)
        num = n * sxy - sx * sy
        den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
        # math.sqrt is IEEE sqrt like SQL SQRT; pow(x, 0.5) is not (see
        # q_standardize_by_group) — only the harness's 6-decimal rounding
        # masked the difference here
        corr = float(num) / math.sqrt(float(den2))
        rows.append((r.l_returnflag, n, corr))
    return pd.DataFrame(rows, columns=["l_returnflag", "n", "corr"])


SQL_CORR_BY_GROUP = (
    "WITH b AS (SELECT l_returnflag, "
    "CAST(ROUND(l_quantity, 0) AS BIGINT) AS x, "
    "CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS y FROM lineitem) "
    "SELECT l_returnflag, COUNT(*) AS n, "
    "CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE) / "
    "SQRT(CAST((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) * "
    "(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y)) AS DOUBLE)) AS corr "
    "FROM b GROUP BY 1"
)


def q_grouped_mode(sf_dir: str):
    """GROUPED MODE with deterministic tie-break (most frequent nation per
    market segment; ties -> smallest nationkey), fully distributed via the
    PACKED-ARGMAX trick: after the exact (segment, nation) counts, each
    candidate is encoded as ``count * 1000 + (999 - nationkey)`` so a single
    int64 MAX aggregate picks (max count, then min key) — no per-group sort,
    no map_groups, and the second aggregate is as shuffle-cheap as a SUM.
    The pack is safe while count < 2^53/1000 and key < 1000 (both hold by
    construction; asserted)."""
    from ray.data.aggregate import Max as _Max, Sum as _Sum

    ds = _t(sf_dir, "customer", ["c_mktsegment", "c_nationkey"])

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"c_mktsegment": t["c_mktsegment"].to_pandas(),
                           "c_nationkey": t["c_nationkey"].to_pandas().astype("int64"),
                           "n": 1})
        agg = df.groupby(["c_mktsegment", "c_nationkey"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    counts = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["c_mktsegment", "c_nationkey"])
              .aggregate(_Sum("n", alias_name="n")))

    def pack(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        assert k.size == 0 or (k.max() < 1000 and n.max() < (1 << 53) // 1000)
        return pa.table({"c_mktsegment": t["c_mktsegment"],
                         "score": pa.array(n * 1000 + (999 - k))})

    best = (counts.map_batches(pack, batch_format="pyarrow")
            .groupby("c_mktsegment")
            .aggregate(_Max("score", alias_name="score"))
            .to_pandas())
    score = best["score"].astype("int64")
    best["mode_nationkey"] = 999 - (score % 1000)
    best["mode_count"] = score // 1000
    return best[["c_mktsegment", "mode_nationkey", "mode_count"]]


SQL_GROUPED_MODE = (
    "WITH c AS (SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS nk, "
    "COUNT(*) AS n FROM customer GROUP BY 1, 2), "
    "s AS (SELECT c_mktsegment, MAX(n * 1000 + (999 - nk)) AS score FROM c GROUP BY 1) "
    "SELECT c_mktsegment, 999 - (score % 1000) AS mode_nationkey, "
    "score // 1000 AS mode_count FROM s"
)


HISTOGRAM_WIDTH_CENTS = 2_500_000  # fixed equi-width bucket: $25k in cents


def q_histogram(sf_dir: str):
    """EQUI-WIDTH HISTOGRAM of order totals: fixed $25k buckets over exact
    cents (fixed bounds need no global min/max pre-pass — the zero-extra-
    pass histogram used for dashboards over 100 TB).  Per-batch bincount
    partials (each batch emits at most n_buckets rows), one tiny groupby
    Sum; empty buckets are absent on both sides by construction."""
    from ray.data.aggregate import Sum as _Sum

    from ..functions.rounding import round_half_away

    ds = _t(sf_dir, "orders", ["o_totalprice"])

    def partials(t: pa.Table) -> pa.Table:
        cents = round_half_away(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        bucket = cents // HISTOGRAM_WIDTH_CENTS
        vc = pd.Series(bucket).value_counts()
        return pa.table({"bucket": pa.array(vc.index.to_numpy(np.int64)),
                         "n_orders": pa.array(vc.to_numpy(np.int64))})

    out = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("bucket")
           .aggregate(_Sum("n_orders", alias_name="n_orders"))
           .to_pandas())
    out["n_orders"] = out["n_orders"].astype("int64")
    out["lo_cents"] = out["bucket"].astype("int64") * HISTOGRAM_WIDTH_CENTS
    return out[["bucket", "lo_cents", "n_orders"]]


SQL_HISTOGRAM = (
    "WITH b AS (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) // 2500000 "
    "AS bucket FROM orders) "
    "SELECT bucket, bucket * 2500000 AS lo_cents, COUNT(*) AS n_orders "
    "FROM b GROUP BY 1"
)


def q_entropy_by_group(sf_dir: str):
    """SHANNON ENTROPY of the event-type distribution per user cohort
    (user_id % 16) — the class-balance / diversity diagnostic of training-
    data audits.  Distribution counts are EXACT integers from one partial-
    count pass + tiny groupby; the entropy itself is computed from those
    exact counts on the (cohort x type)-sized result (bounded by the type
    domain, not the corpus), summing -p*log2(p) in deterministic type
    order."""
    from ray.data.aggregate import Sum as _Sum

    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"cohort": (t["user_id"].to_numpy(zero_copy_only=False) % 16),
                           "event_type": t["event_type"].to_pandas(), "n": 1})
        agg = df.groupby(["cohort", "event_type"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    counts = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["cohort", "event_type"])
              .aggregate(_Sum("n", alias_name="n"))
              .to_pandas())
    counts["n"] = counts["n"].astype("int64")
    rows = []
    for cohort, g in counts.sort_values(["cohort", "event_type"]).groupby("cohort"):
        tot = int(g["n"].sum())
        p = g["n"].to_numpy(np.float64) / tot
        rows.append((int(cohort), tot, float(-(p * np.log2(p)).sum())))
    return pd.DataFrame(rows, columns=["cohort", "n_events", "entropy_bits"])


SQL_ENTROPY_BY_GROUP = (
    "WITH c AS (SELECT user_id % 16 AS cohort, event_type, COUNT(*) AS n "
    "FROM events GROUP BY 1, 2), "
    "t AS (SELECT cohort, SUM(n) AS tot FROM c GROUP BY 1) "
    "SELECT c.cohort, CAST(t.tot AS BIGINT) AS n_events, "
    "SUM(-(CAST(c.n AS DOUBLE) / t.tot) * LOG2(CAST(c.n AS DOUBLE) / t.tot)) "
    "AS entropy_bits FROM c JOIN t ON c.cohort = t.cohort GROUP BY 1, 2"
)


def q_new_users_daily(sf_dir: str):
    """CUMULATIVE-DISTINCT-USERS-BY-DAY (the growth curve every events
    pipeline reports) WITHOUT a running count(distinct) window: first-seen
    day per user via one groupby MIN (the only corpus-sized shuffle), then
    per-day new-user counts, then a running sum over the day-count result —
    which is bounded by the DATE DOMAIN (~10^3 rows for years of data), so
    the cumulative pass is a driver-side cumsum over a tiny frame, not a
    window over the corpus."""
    from ray.data.aggregate import Min as _Min, Sum as _Sum

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def day_part(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        return pa.table({"user_id": t["user_id"], "day": day})

    first = (ds.map_batches(day_part, batch_format="pyarrow")
             .groupby("user_id")
             .aggregate(_Min("day", alias_name="day")))

    def count_part(t: pa.Table) -> pa.Table:
        vc = t["day"].to_pandas().value_counts()
        return pa.table({"day": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                         "new_users": pa.array(vc.to_numpy(np.int64))})

    daily = (first.map_batches(count_part, batch_format="pyarrow")
             .groupby("day")
             .aggregate(_Sum("new_users", alias_name="new_users"))
             .to_pandas())
    daily["new_users"] = daily["new_users"].astype("int64")
    daily = daily.sort_values("day", kind="stable").reset_index(drop=True)
    daily["cum_users"] = daily["new_users"].cumsum()
    return daily[["day", "new_users", "cum_users"]]


SQL_NEW_USERS_DAILY = (
    "WITH f AS (SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS day "
    "FROM events GROUP BY 1), "
    "c AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY 1) "
    "SELECT day, new_users, "
    "CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users FROM c"
)


def q_retention(sf_dir: str, driver_user_limit: int = 20_000_000):
    """COHORT RETENTION curve (the product-analytics archetype: users
    cohorted by FIRST-ACTIVITY day, counted on each later active day):
    -> (cohort_day, k_days, n_users) where ``n_users`` is the number of
    the cohort's users active exactly ``k_days`` after their first day.

    Scale shape: ONE distinct-(user, day) pass (per-batch dedupe
    partials, the only corpus-sized shuffle; rows out are bounded by
    users × active-days, not events); cohorts are a groupby-MIN over
    that table; the cohort lookup AUTO-ROUTES — <= ``driver_user_limit``
    users ships as sorted arrays (vectorized searchsorted, the dbscan
    pattern), above it a partitioned join on user_id; the final fold is
    a groupby over the (date-domain × horizon)-bounded curve table.  All
    arithmetic is integer epoch-days — hash-exact vs SQL."""
    import ray
    from ray.data.aggregate import Count as _Count, Min as _Min

    ds = _t(sf_dir, "events", ["user_id", "ts"])
    US_PER_DAY = 86_400_000_000

    def pair_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
             // US_PER_DAY)
        p = pd.DataFrame({"user_id": u, "day_i": d}).drop_duplicates()
        return pa.table({"user_id": pa.array(p["user_id"].to_numpy(np.int64)),
                         "day_i": pa.array(p["day_i"].to_numpy(np.int64))})

    ud = (ds.map_batches(pair_part, batch_format="pyarrow")
          .groupby(["user_id", "day_i"])
          .aggregate(_Count(alias_name="_n"))
          .select_columns(["user_id", "day_i"])
          .materialize())
    cohort = (ud.groupby("user_id")
              .aggregate(_Min("day_i", alias_name="cohort_i"))
              .materialize())
    n_users_total = cohort.count()
    empty = pd.DataFrame({"cohort_day": pd.Series(dtype=object),
                          "k_days": pd.Series(dtype="int64"),
                          "n_users": pd.Series(dtype="int64")})
    if n_users_total == 0:
        return empty

    if n_users_total <= driver_user_limit:
        cp = cohort.to_pandas()
        order = np.argsort(cp["user_id"].to_numpy(np.int64), kind="stable")
        keys = cp["user_id"].to_numpy(np.int64)[order]
        vals = cp["cohort_i"].to_numpy(np.int64)[order]
        ref = ray.put((keys, vals))

        def curve_part(t: pa.Table) -> pa.Table:
            k, v = ray.get(ref)
            u = t["user_id"].to_numpy(zero_copy_only=False)
            d = t["day_i"].to_numpy(zero_copy_only=False)
            ci = v[np.searchsorted(k, u)]  # every user has a cohort row
            p = (pd.DataFrame({"cohort_i": ci, "k_days": d - ci})
                 .value_counts().reset_index(name="n"))
            return pa.table({
                "cohort_i": pa.array(p["cohort_i"].to_numpy(np.int64)),
                "k_days": pa.array(p["k_days"].to_numpy(np.int64)),
                "n": pa.array(p["n"].to_numpy(np.int64))})

        curve_src = ud.map_batches(curve_part, batch_format="pyarrow")
    else:
        joined = ud.join(cohort, join_type="inner", on=("user_id",),
                         num_partitions=cluster_partitions())

        def curve_join(t: pa.Table) -> pa.Table:
            d = t["day_i"].to_numpy(zero_copy_only=False)
            ci = t["cohort_i"].to_numpy(zero_copy_only=False)
            p = (pd.DataFrame({"cohort_i": ci, "k_days": d - ci})
                 .value_counts().reset_index(name="n"))
            return pa.table({
                "cohort_i": pa.array(p["cohort_i"].to_numpy(np.int64)),
                "k_days": pa.array(p["k_days"].to_numpy(np.int64)),
                "n": pa.array(p["n"].to_numpy(np.int64))})

        curve_src = joined.map_batches(curve_join, batch_format="pyarrow")

    out = (curve_src.groupby(["cohort_i", "k_days"])
           .aggregate(Sum("n", alias_name="n_users"))
           .to_pandas())
    if "cohort_i" not in out.columns or not len(out):
        return empty
    out["cohort_day"] = pd.to_datetime(
        out["cohort_i"].to_numpy(np.int64), unit="D").strftime("%Y-%m-%d")
    out["n_users"] = out["n_users"].astype("int64")
    return (out.astype({"k_days": "int64"})
            [["cohort_day", "k_days", "n_users"]]
            .sort_values(["cohort_day", "k_days"], kind="stable")
            .reset_index(drop=True))


SQL_RETENTION = (
    "WITH ud AS (SELECT DISTINCT user_id, "
    "CAST(date_trunc('day', ts) AS DATE) AS day FROM events), "
    "c AS (SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY 1) "
    "SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day, "
    "CAST(ud.day - c.cohort_day AS BIGINT) AS k_days, COUNT(*) AS n_users "
    "FROM ud JOIN c ON ud.user_id = c.user_id GROUP BY 1, 2"
)


def _skyline_2d(df: pd.DataFrame) -> pd.DataFrame:
    """Exact 2D skyline (maximize ``price_cents``, minimize ``p_size``) in
    O(n log n): collapse to unique (price, size) points, sort price desc,
    keep a point iff its size beats the prefix-min over STRICTLY greater
    prices and it is the min size within its own price group (identical
    duplicate points never dominate each other — strictness is required in
    at least one dimension)."""
    u = (df.groupby(["price_cents", "p_size"], sort=False)
         .size().reset_index(name="_c"))
    u = u.sort_values(["price_cents", "p_size"],
                      ascending=[False, True], kind="stable").reset_index(drop=True)
    grp_min = u.groupby("price_cents")["p_size"].transform("min")
    is_new_price = u["price_cents"] != u["price_cents"].shift(1)
    # prefix min of size over all STRICTLY-greater price groups
    run_min = u["p_size"].cummin().shift(1)
    prev_price_min = run_min.where(is_new_price).ffill()
    keep = (u["p_size"] == grp_min) & (
        prev_price_min.isna() | (u["p_size"] < prev_price_min)
    )
    kept = u[keep]
    return df.merge(kept[["price_cents", "p_size"]], on=["price_cents", "p_size"])


def q_skyline(sf_dir: str):
    """SKYLINE / PARETO-FRONTIER query (parts that are not dominated on
    (retail price max, size min) — the multi-objective shortlist operator)
    via the classic TWO-PHASE distributed algorithm: each batch computes its
    LOCAL skyline (the global skyline is always a subset of the union of
    local skylines, so non-frontier rows are pruned before they ever move),
    then one final pass over the tiny union.  Prices are compared in exact
    integer cents; ties on both dimensions are genuine co-frontier points
    and all are returned."""
    from ..functions.rounding import round_half_away

    ds = _t(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])

    def local(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "p_partkey": t["p_partkey"].to_numpy(zero_copy_only=False),
            "price_cents": round_half_away(
                t["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64),
            "p_size": t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        return pa.Table.from_pandas(_skyline_2d(df), preserve_index=False)

    union = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    out = _skyline_2d(union).sort_values("p_partkey", kind="stable")
    return out[["p_partkey", "price_cents", "p_size"]].reset_index(drop=True)


SQL_SKYLINE = (
    "WITH b AS (SELECT p_partkey, CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) "
    "AS price_cents, CAST(p_size AS BIGINT) AS p_size FROM part), "
    "u AS (SELECT price_cents, p_size FROM b GROUP BY 1, 2), "
    "m AS (SELECT price_cents, p_size, "
    "MIN(p_size) OVER (PARTITION BY price_cents) AS grp_min, "
    "MIN(p_size) OVER (ORDER BY price_cents DESC "
    "RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min FROM u) "
    "SELECT b.p_partkey, b.price_cents, b.p_size FROM b "
    "JOIN m ON b.price_cents = m.price_cents AND b.p_size = m.p_size "
    "WHERE m.p_size = m.grp_min AND (m.prev_min IS NULL OR m.p_size < m.prev_min)"
)


def q_mutual_information(sf_dir: str):
    """MUTUAL INFORMATION between event type and day-of-week (the
    feature-vs-feature dependence audit of training-data QA) from ONE
    partial-count pass: exact (type, dow) cell counts via per-batch
    value_counts + tiny groupby, marginals and the MI sum computed from
    those exact integers on the (|types| x 7)-sized result.  Single scalar
    output row keeps the contract trivially comparable."""
    from ray.data.aggregate import Sum as _Sum

    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def partials(t: pa.Table) -> pa.Table:
        dow = pc.day_of_week(t["ts"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "dow": dow.astype(np.int64), "n": 1})
        agg = df.groupby(["event_type", "dow"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    cells = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby(["event_type", "dow"])
             .aggregate(_Sum("n", alias_name="n"))
             .to_pandas())
    cells["n"] = cells["n"].astype("int64")
    total = int(cells["n"].sum())
    nx = cells.groupby("event_type")["n"].sum()
    ny = cells.groupby("dow")["n"].sum()
    cells = cells.sort_values(["event_type", "dow"], kind="stable")
    pxy = cells["n"].to_numpy(np.float64) / total
    px = cells["event_type"].map(nx).to_numpy(np.float64) / total
    py = cells["dow"].map(ny).to_numpy(np.float64) / total
    mi = float((pxy * np.log2(pxy / (px * py))).sum())
    return pd.DataFrame({"n_events": [total], "mi_bits": [mi]})


SQL_MUTUAL_INFORMATION = (
    "WITH c AS (SELECT event_type, dayofweek(ts) AS dow, COUNT(*) AS n "
    "FROM events GROUP BY 1, 2), "
    "x AS (SELECT event_type, SUM(n) AS nx FROM c GROUP BY 1), "
    "y AS (SELECT dow, SUM(n) AS ny FROM c GROUP BY 1), "
    "t AS (SELECT SUM(n) AS tot FROM c) "
    "SELECT CAST(t.tot AS BIGINT) AS n_events, "
    "SUM((CAST(c.n AS DOUBLE) / t.tot) * LOG2((CAST(c.n AS DOUBLE) * t.tot) / "
    "(x.nx * y.ny))) AS mi_bits "
    "FROM c JOIN x USING (event_type) JOIN y USING (dow) CROSS JOIN t "
    "GROUP BY 1"
)


def _mad_cont_median(vals: np.ndarray, ns: np.ndarray) -> float:
    """Continuous median (DuckDB ``median`` on DOUBLE: mean of the two
    middle order statistics for even n) from a (value, count) table."""
    order = np.argsort(vals, kind="stable")
    vals, ns = vals[order], ns[order]
    cum = ns.cumsum()
    total = int(cum[-1])
    if total % 2 == 1:
        return float(vals[np.searchsorted(cum, (total + 1) // 2)])
    lo = float(vals[np.searchsorted(cum, total // 2)])
    hi = float(vals[np.searchsorted(cum, total // 2 + 1)])
    return (lo + hi) / 2.0


def _mad_from_group_counts(v: np.ndarray, n: np.ndarray):
    """(med, mad, n) from one group's (value, count) distribution.  The
    deviation distribution |x - med| is a REGROUPING of the same counts
    table — MAD costs no second corpus pass."""
    med = _mad_cont_median(v, n)
    dev = np.abs(v - med)
    # regroup: equal deviations from both sides of the median merge
    dd = pd.DataFrame({"d": dev, "n": n}).groupby("d")["n"].sum()
    mad = _mad_cont_median(dd.index.to_numpy(np.float64),
                           dd.to_numpy(np.int64))
    return med, mad, int(n.sum())


def q_mad_by_group(sf_dir: str, driver_state_limit: int = 100_000):
    """MEDIAN ABSOLUTE DEVIATION per group (the robust dispersion statistic
    outlier pipelines prefer over stddev) computed EXACTLY from ONE
    counts pass: per-batch value_counts + a tiny groupby give the full
    per-group distribution, and median + MAD both fall out of cumulative
    counts (see :func:`_mad_from_group_counts`).  All arithmetic on the
    half-sums is exact in binary doubles (small ints and halves), so both
    engines hash identically.

    AUTO-ROUTED on the counts-table size (round-4 directive: the old
    version assumed a bounded value domain and ``to_pandas()``-ed the full
    counts table — on a continuous 100 TB column the counts table IS the
    column).  The (group, value) counts Dataset is materialized
    DISTRIBUTED and its exact row count (cheaper and tighter than a KMV
    estimate — the table is already built) picks the route:

    - <= ``driver_state_limit`` distinct (group, value) pairs: gather the
      counts table to the driver and fold per group (lowest constant).
    - above: per-group ``map_groups`` computes (med, mad, n) ON WORKERS
      from the distributed counts; the driver only sees O(groups) result
      rows.  Bit-identical math (same helper), equality-tested by a
      forced-route test at sf0.001.

    For a truly continuous domain (counts ~ corpus) the exact answer
    fundamentally needs the distribution; the documented approximate path
    is the MRL ``QuantileSketch`` (``q_quantile_sketch``), with its
    analytic rank-error bound, over x and |x - med|."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"l_returnflag": t["l_returnflag"].to_pandas(),
                           "l_quantity": t["l_quantity"].to_numpy(zero_copy_only=False)})
        p = df.value_counts(["l_returnflag", "l_quantity"]).reset_index(name="n")
        return pa.Table.from_pandas(p, preserve_index=False)

    counts_ds = (ds.map_batches(partial, batch_format="pyarrow")
                 .groupby(["l_returnflag", "l_quantity"])
                 .aggregate(Sum("n", alias_name="n"))
                 .materialize())
    n_distinct = counts_ds.count()

    if n_distinct <= driver_state_limit:
        counts = counts_ds.to_pandas()
        counts["n"] = counts["n"].astype("int64")
        rows = []
        for flag, g in counts.groupby("l_returnflag"):
            med, mad, n = _mad_from_group_counts(
                g["l_quantity"].to_numpy(np.float64),
                g["n"].to_numpy(np.int64))
            rows.append((flag, med, mad, n))
        return pd.DataFrame(rows, columns=["l_returnflag", "med", "mad", "n"])

    def group_mad(g: pd.DataFrame) -> pd.DataFrame:
        med, mad, n = _mad_from_group_counts(
            g["l_quantity"].to_numpy(np.float64),
            g["n"].to_numpy(np.int64))
        return pd.DataFrame({"l_returnflag": [g["l_returnflag"].iloc[0]],
                             "med": [med], "mad": [mad], "n": [n]})

    out = (counts_ds.groupby("l_returnflag")
           .map_groups(group_mad, batch_format="pandas")
           .to_pandas())
    out["n"] = out["n"].astype("int64")
    return (out.sort_values("l_returnflag", kind="stable")
            .reset_index(drop=True)[["l_returnflag", "med", "mad", "n"]])


SQL_MAD_BY_GROUP = (
    "SELECT l_returnflag, median(l_quantity) AS med, mad(l_quantity) AS mad, "
    "COUNT(*) AS n FROM lineitem GROUP BY 1"
)


def q_standardize_by_group(sf_dir: str):
    """GROUPED Z-SCORE STANDARDIZATION (the feature-normalization step of
    ML preprocessing) as the canonical TWO-PASS broadcast shape: pass 1
    computes per-group (n, Sx, Sxx) as exact int64 partials (one tiny
    groupby); the per-group mean and sample-stddev are then derived ONCE
    from exact integers (identical doubles in both engines, vs the
    engine-specific float accumulation of builtin STDDEV) and broadcast
    into pass 2, which emits z = (x - mean) / std per row.  No sort, no
    second shuffle — group stats ride along as a tiny dict."""
    from ray.data.aggregate import Sum as _Sum

    from ..functions.rounding import round_half_away

    cols = ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"]
    ds = _t(sf_dir, "lineitem", cols)

    def partials(t: pa.Table) -> pa.Table:
        x = round_half_away(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        df = pd.DataFrame({"l_returnflag": t["l_returnflag"].to_pandas(),
                           "n": 1, "sx": x, "sxx": x * x})
        agg = df.groupby("l_returnflag", sort=False).sum().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    stats = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("l_returnflag")
             .aggregate(_Sum("n", alias_name="n"), _Sum("sx", alias_name="sx"),
                        _Sum("sxx", alias_name="sxx"))
             .to_pandas())
    mean = {}
    std = {}
    for r in stats.itertuples():
        n, sx, sxx = int(r.n), int(r.sx), int(r.sxx)
        mean[r.l_returnflag] = sx / n
        # sample variance from exact integer sums (n*Sxx - Sx^2 is a
        # Python bignum, same as DuckDB HUGEINT); math.sqrt is IEEE sqrt
        # like SQL SQRT (pow(x, 0.5) is not)
        import math

        std[r.l_returnflag] = math.sqrt(float(n * sxx - sx * sx) / (n * (n - 1)))

    def transform(t: pa.Table) -> pa.Table:
        x = round_half_away(t["l_quantity"].to_numpy(zero_copy_only=False))
        flags = t["l_returnflag"].to_pandas()
        m = flags.map(mean).to_numpy(np.float64)
        s = flags.map(std).to_numpy(np.float64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_linenumber": t["l_linenumber"],
                         "z": pa.array((x - m) / s)})

    return ds.map_batches(transform, batch_format="pyarrow")


SQL_STANDARDIZE_BY_GROUP = (
    "WITH b AS (SELECT l_orderkey, l_linenumber, l_returnflag, "
    "CAST(ROUND(l_quantity, 0) AS BIGINT) AS x FROM lineitem), "
    "s AS (SELECT l_returnflag, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx "
    "FROM b GROUP BY 1), "
    "st AS (SELECT l_returnflag, CAST(sx AS DOUBLE) / n AS mean, "
    "SQRT(CAST(n * sxx - sx * sx AS DOUBLE) / (n * (n - 1))) AS std FROM s) "
    "SELECT b.l_orderkey, b.l_linenumber, "
    "(CAST(b.x AS DOUBLE) - st.mean) / st.std AS z "
    "FROM b JOIN st USING (l_returnflag)"
)


def q_string_agg(sf_dir: str):
    """GROUPED ORDERED STRING AGGREGATION (SQL ``string_agg(x, ',' ORDER BY
    x)``): nations per region, sorted and comma-joined.  The deterministic
    ORDER BY inside the aggregate is what makes this hashable cross-engine;
    per-batch partial lists concat under a bounded groupby (group count =
    region domain), sorted once per group at the end.  For corpus-sized
    groups this operator is a design smell (unbounded row) — bounded
    domains only, which the region/nation tables are."""
    from ray.data.aggregate import Sum as _Sum

    nat = _t(sf_dir, "nation", ["n_regionkey", "n_name"])
    reg = _t(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"n_regionkey": t["n_regionkey"].to_pandas(),
                           "names": t["n_name"].to_pandas()})
        agg = (df.groupby("n_regionkey")["names"]
               .apply(lambda s: ",".join(s)).reset_index())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = nat.map_batches(partial, batch_format="pyarrow").to_pandas()
    # final: merge partial strings per group, then a single sort+join of the
    # bounded name list (the ORDER BY inside the aggregate)
    rows = []
    for rk, g in parts.groupby("n_regionkey"):
        names = sorted(",".join(g["names"]).split(","))
        rows.append((int(rk), ",".join(names), len(names)))
    out = pd.DataFrame(rows, columns=["r_regionkey", "nations", "n_nations"])
    out = out.merge(reg, on="r_regionkey")
    return out[["r_regionkey", "r_name", "nations", "n_nations"]]


SQL_STRING_AGG = (
    "SELECT n.n_regionkey AS r_regionkey, r.r_name, "
    "string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations, "
    "COUNT(*) AS n_nations "
    "FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey "
    "GROUP BY 1, 2"
)


def q_drawdown(sf_dir: str):
    """PER-USER RUNNING-MAX DRAWDOWN over the ordered event stream (the
    peak-to-current gap of monitoring/financial pipelines: how far below
    its high-water mark each observation sits).  Same bucketed shape as
    ``running_sum``: one shuffle on mixed ``user_id % 64``, one vectorized
    grouped-cummax per bucket, exact int64 e4-scaled values so the
    subtraction is order-stable."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid * 2654435761) % 64))

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.rounding import round_half_away

        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        v4 = round_half_away(g["value"].to_numpy() * 10000.0).astype("int64")
        s = pd.Series(v4, index=g.index)
        peak = s.groupby(g["user_id"], sort=False).cummax()
        g["peak_e4"] = peak
        g["drawdown_e4"] = peak - s
        return g[["event_id", "user_id", "peak_e4", "drawdown_e4"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(16)
        .groupby("bucket")
        .map_groups(run_bucket, batch_format="pandas")
    )


SQL_DRAWDOWN = (
    "WITH b AS (SELECT event_id, user_id, ts, "
    "CAST(ROUND(value * 10000, 0) AS BIGINT) AS v4 FROM events) "
    "SELECT event_id, user_id, "
    "MAX(v4) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_e4, "
    "MAX(v4) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - v4 AS drawdown_e4 "
    "FROM b"
)


def q_ohlc(sf_dir: str):
    """OHLC RESAMPLING (the time-series candle aggregate every metering /
    market-data pipeline ships: per (series, day) the OPENING value, HIGH,
    LOW, CLOSING value, tick count and volume) over ``events`` keyed by
    (event_type, day).

    The open/close are ARG-MIN / ARG-MAX selections over the event-time
    order (ts, event_id) — an aggregate Ray Data's built-ins lack.  Shape:
    per-batch pandas sort + grouped first/last produce ONE partial row per
    (series, day) per batch carrying the (ts, event_id) witnesses of its
    local open/close plus min/max/count/sum; partials hash on ``day_i % 64``
    buckets (date-domain keys — no skew) and each bucket reduces
    VECTORIZED (two sorts + drop_duplicates — no per-group Python).  The
    shuffle moves O(series x days x batches) partial rows, never the
    corpus; values fold as e4 integers (money-cents discipline), so the
    DuckDB ordered-aggregate twin (FIRST/LAST ... ORDER BY) hashes
    bit-identically."""
    from ..functions.rounding import round_half_away

    ds = _t(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "day": pc.strftime(t["ts"], format="%Y-%m-%d").to_pandas(),
            # normalize the unit BEFORE the int cast: parquet ships us, but
            # in-memory pandas sources arrive as ns — a mixed unit would
            # split one (series, day) group across day_i buckets
            "ts_us": pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                             pa.int64()).to_numpy(zero_copy_only=False),
            "event_id": t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            "e4": round_half_away(
                t["value"].to_numpy(zero_copy_only=False) * 1e4).astype(np.int64),
        })
        df = df.sort_values(["ts_us", "event_id"], kind="stable")
        g = df.groupby(["event_type", "day"], sort=False)
        agg = g.agg(o_ts=("ts_us", "first"), o_eid=("event_id", "first"),
                    o_e4=("e4", "first"), c_ts=("ts_us", "last"),
                    c_eid=("event_id", "last"), c_e4=("e4", "last"),
                    hi=("e4", "max"), lo=("e4", "min"),
                    n=("e4", "size"), s=("e4", "sum")).reset_index()
        day_i = agg["o_ts"].to_numpy(np.int64) // 86_400_000_000
        agg["gb"] = day_i % 64
        return pa.Table.from_pandas(agg, preserve_index=False)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        keys = ["event_type", "day"]
        opens = (g.sort_values(["o_ts", "o_eid"], kind="stable")
                 .drop_duplicates(keys)[keys + ["o_e4"]])
        closes = (g.sort_values(["c_ts", "c_eid"], kind="stable")
                  .drop_duplicates(keys, keep="last")[keys + ["c_e4"]])
        rest = (g.groupby(keys, sort=False)
                .agg(high_e4=("hi", "max"), low_e4=("lo", "min"),
                     n_trades=("n", "sum"), vol_e4=("s", "sum")).reset_index())
        out = rest.merge(opens, on=keys).merge(closes, on=keys)
        out = out.rename(columns={"o_e4": "open_e4", "c_e4": "close_e4"})
        return out[["event_type", "day", "open_e4", "high_e4", "low_e4",
                    "close_e4", "n_trades", "vol_e4"]]

    out = (ds.map_batches(part, batch_format="pyarrow")
           .groupby("gb").map_groups(reduce_bucket, batch_format="pandas")
           .to_pandas())
    for c in ("open_e4", "high_e4", "low_e4", "close_e4", "n_trades", "vol_e4"):
        out[c] = out[c].astype("int64")
    return (out.sort_values(["event_type", "day"], kind="stable")
            .reset_index(drop=True))


SQL_OHLC = (
    "WITH b AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, ts, "
    "event_id, CAST(ROUND(value * 10000, 0) AS BIGINT) AS e4 FROM events) "
    "SELECT event_type, day, "
    "FIRST(e4 ORDER BY ts, event_id) AS open_e4, "
    "MAX(e4) AS high_e4, MIN(e4) AS low_e4, "
    "LAST(e4 ORDER BY ts, event_id) AS close_e4, "
    "COUNT(*) AS n_trades, CAST(SUM(e4) AS BIGINT) AS vol_e4 "
    "FROM b GROUP BY 1, 2"
)


def q_target_encode(sf_dir: str):
    """LEAVE-ONE-OUT TARGET ENCODING (the ML-feature-prep operator for
    high-signal categoricals: each row's category becomes the mean target
    of the OTHER rows in its category, the standard leakage guard) —
    orders encoded by o_orderpriority against the o_totalprice target.

    Scale shape: one tiny per-category aggregate (per-batch (sum_e4, n)
    partials → groupby bounded by the category domain), the resulting
    dict BROADCAST into a single stateless map pass — the corpus is
    touched twice, never shuffled.  Integer-exact numerator (e4 money
    cents; |sum| < 2^53 so the final double conversion is lossless at
    any tested sf — the 100 TB path keeps per-category sums as int64 and
    emits numerator/denominator columns instead of the divide), single
    IEEE divide mirrored by the SQL twin; singleton categories are
    excluded in both engines (no 0/0)."""
    from ray.data.aggregate import Sum as _Sum

    from ..functions.rounding import round_half_away

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        e4 = round_half_away(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 1e4).astype(np.int64)
        g = (pd.DataFrame({"k": t["o_orderpriority"].to_pandas(), "e4": e4})
             .groupby("k", sort=False)["e4"].agg(["sum", "size"]).reset_index())
        return pa.table({"o_orderpriority": pa.array(g["k"], pa.string()),
                         "s_e4": pa.array(g["sum"].to_numpy(np.int64)),
                         "c": pa.array(g["size"].to_numpy(np.int64))})

    stats = (ds.map_batches(part, batch_format="pyarrow")
             .groupby("o_orderpriority")
             .aggregate(_Sum("s_e4", alias_name="s_e4"),
                        _Sum("c", alias_name="c"))
             .to_pandas())
    s_lut = {k: int(s) for k, s, c in zip(stats["o_orderpriority"],
                                          stats["s_e4"], stats["c"]) if c > 1}
    c_lut = {k: int(c) for k, c in zip(stats["o_orderpriority"], stats["c"])
             if c > 1}

    def encode(t: pa.Table) -> pa.Table:
        keys = t["o_orderpriority"].to_pandas()
        e4 = round_half_away(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 1e4).astype(np.int64)
        # Series.map with a dict is a C-level lookup — no per-row Python
        s = keys.map(s_lut).fillna(0).to_numpy(np.int64)
        c = keys.map(c_lut).fillna(0).to_numpy(np.int64)
        keep = c > 1
        loo = (s[keep] - e4[keep]).astype(np.float64) / (c[keep] - 1).astype(np.float64)
        return pa.table({
            "o_orderkey": pc.filter(t["o_orderkey"], pa.array(keep)),
            "o_orderpriority": pc.filter(t["o_orderpriority"], pa.array(keep)),
            "loo_mean_e4": pa.array(loo)})

    out = ds.map_batches(encode, batch_format="pyarrow").to_pandas()
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    return out.sort_values("o_orderkey", kind="stable").reset_index(drop=True)


SQL_TARGET_ENCODE = (
    "WITH s AS (SELECT o_orderpriority, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000, 0) AS BIGINT)) AS BIGINT) AS se4, "
    "COUNT(*) AS c FROM orders GROUP BY 1) "
    "SELECT o.o_orderkey, o.o_orderpriority, "
    "CAST(s.se4 - CAST(ROUND(o.o_totalprice * 10000, 0) AS BIGINT) AS DOUBLE) "
    "/ CAST(s.c - 1 AS DOUBLE) AS loo_mean_e4 "
    "FROM orders o JOIN s USING (o_orderpriority) WHERE s.c > 1"
)


def q_ntile(sf_dir: str):
    """DISTRIBUTED NTILE (equal-frequency quantile binning — the ML
    discretization / per-decile-reporting operator) over events.value,
    k = 10, WITHOUT a global sort: the same two-pass value-range-bin +
    driver-prefix-offset discipline as `q_global_rank`, but the second
    pass assigns each row its global ROW NUMBER over (v4, event_id) and
    converts it to a tile with SQL NTILE's exact uneven-split rule (the
    first n % k tiles get one extra row).  The shuffle is the 256-bin
    hash; driver state is the 256-row bin-count table."""
    from ray.data.aggregate import Max, Min, Sum  # noqa: F401

    from ..functions.rounding import round_half_away

    K = 10
    ds = _t(sf_dir, "events", ["event_id", "value"])

    def quantize(t: pa.Table) -> pa.Table:
        v4 = round_half_away(
            t["value"].to_numpy(zero_copy_only=False) * 10000.0).astype(np.int64)
        return pa.table({"event_id": t["event_id"], "v4": pa.array(v4)})

    q = ds.map_batches(quantize, batch_format="pyarrow").materialize()

    def minmax(t: pa.Table) -> pa.Table:
        v = t["v4"].to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(v.min())], pa.int64()),
                         "hi": pa.array([int(v.max())], pa.int64())})

    mm = q.map_batches(minmax, batch_format="pyarrow").aggregate(
        Min("lo"), Max("hi"))
    lo, hi = int(mm["min(lo)"]), int(mm["max(hi)"])
    width = max(1, (hi - lo) // 256 + 1)

    def binify(t: pa.Table) -> pa.Table:
        v = t["v4"].to_numpy(zero_copy_only=False)
        return t.append_column("bin", pa.array((v - lo) // width))

    binned = q.map_batches(binify, batch_format="pyarrow").materialize()
    counts = (binned.groupby("bin").aggregate(Count(alias_name="n"))
              .to_pandas().sort_values("bin").reset_index(drop=True))
    n_total = int(counts["n"].sum())
    offs = dict(zip(
        counts["bin"].astype(int),
        np.concatenate([[0], np.cumsum(counts["n"].to_numpy())[:-1]])
        .astype(np.int64)))
    offs_ref = ray.put(offs)

    def tile_bin(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offs_ref)[int(g["bin"].iloc[0])]
        v = g["v4"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, v))
        rn = np.empty(len(v), dtype=np.int64)
        rn[order] = off + np.arange(len(v), dtype=np.int64) + 1
        return pd.DataFrame({"event_id": eid, "v4": v,
                             "tile": _ntile_of(rn, n_total, K)})

    out = (binned.groupby("bin").map_groups(tile_bin, batch_format="pandas")
           .to_pandas())
    out["tile"] = out["tile"].astype("int64")
    out["v4"] = out["v4"].astype("int64")
    return (out.sort_values("event_id").reset_index(drop=True)
            [["event_id", "v4", "tile"]])


SQL_NTILE = (
    "SELECT event_id, CAST(ROUND(value * 10000, 0) AS BIGINT) AS v4, "
    "CAST(NTILE(10) OVER (ORDER BY CAST(ROUND(value * 10000, 0) AS BIGINT), "
    "event_id) AS BIGINT) AS tile FROM events"
)


def q_wmedian(sf_dir: str):
    """WEIGHTED MEDIAN per group (the robust weighted-aggregation primitive
    of metering / importance-weighted reporting): smallest value whose
    cumulative weight reaches half the group total, weights derived
    deterministically as (event_id % 10) + 1.

    Same two-phase exact-quantile discipline as `q_outlier_trim` — but
    over WEIGHTS, which rules out rank arithmetic on counts alone:
    1. per-(group, 256-range-bin) WEIGHT sums (one corpus pass, partials
       bounded by groups x bins);
    2. the driver cumulates bin weights per group, finds the bin where
       2*cum first reaches the total and the weight mass below it
       (O(groups x 256) state);
    3. one more pass gathers only rows in target bins (~n/256 per group)
       -> exact weighted median inside the bin.
    Everything integer, so the SQL window twin hashes bit-identically."""
    from ray.data.aggregate import Max, Min, Sum

    from ..functions.rounding import round_half_away

    B = 256
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def to_e4(t: pa.Table) -> pa.Table:
        e4 = round_half_away(t["value"].to_numpy(zero_copy_only=False) * 1e4
                             ).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"event_type": t["event_type"], "e4": pa.array(e4),
                         "w": pa.array(eid % 10 + 1)})

    v = ds.map_batches(to_e4, batch_format="pyarrow").materialize()
    mm = (v.groupby("event_type")
          .aggregate(Min("e4", alias_name="mn"), Max("e4", alias_name="mx"))
          .to_pandas())
    lim = {r.event_type: (int(r.mn), int(r.mx)) for r in mm.itertuples()}

    def bin_of(et_arr, e4_arr):
        mn = np.array([lim[e][0] for e in et_arr], dtype=np.int64)
        mx = np.array([lim[e][1] for e in et_arr], dtype=np.int64)
        return (e4_arr - mn) * B // (mx - mn + 1)

    def binned(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pylist()
        e4 = t["e4"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        p = (pd.DataFrame({"event_type": et, "bin": bin_of(et, e4), "w": w})
             .groupby(["event_type", "bin"], sort=False)["w"].sum()
             .reset_index())
        return pa.Table.from_pandas(p, preserve_index=False)

    wb = (v.map_batches(binned, batch_format="pyarrow")
          .groupby(["event_type", "bin"]).aggregate(Sum("w", alias_name="w"))
          .to_pandas())

    target: dict = {}
    totals: dict = {}
    for et, g in wb.groupby("event_type"):
        g = g.sort_values("bin")
        ws = g["w"].astype(np.int64).to_numpy()
        cum = ws.cumsum()
        tot = int(cum[-1])
        totals[et] = tot
        hit = int(np.argmax(2 * cum >= tot))
        target[et] = (int(g["bin"].to_numpy()[hit]),
                      int(cum[hit - 1]) if hit else 0)

    def gather(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pylist()
        e4 = t["e4"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        b = bin_of(et, e4)
        tb = np.array([target[e][0] for e in et], dtype=np.int64)
        keep = b == tb
        return pa.table({"event_type": pa.array(
            np.array(et, dtype=object)[keep], pa.string()),
            "e4": pa.array(e4[keep]), "w": pa.array(w[keep])})

    inbin = v.map_batches(gather, batch_format="pyarrow").to_pandas()
    rows = []
    for et, g in inbin.groupby("event_type"):
        g = g.sort_values("e4", kind="stable")
        per_v = g.groupby("e4", sort=True)["w"].sum()
        cum = target[et][1] + per_v.cumsum().to_numpy()
        tot = totals[et]
        pos = int(np.argmax(2 * cum >= tot))
        rows.append((et, int(per_v.index[pos]), tot))
    out = pd.DataFrame(rows, columns=["event_type", "wmedian_v4", "w_total"])
    out["wmedian_v4"] = out["wmedian_v4"].astype("int64")
    out["w_total"] = out["w_total"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_WMEDIAN = (
    "WITH b AS (SELECT event_type, "
    "CAST(ROUND(value * 10000, 0) AS BIGINT) AS v4, "
    "(event_id % 10) + 1 AS w FROM events), "
    "g AS (SELECT event_type, v4, CAST(SUM(w) AS BIGINT) AS cw "
    "FROM b GROUP BY 1, 2), "
    "c AS (SELECT event_type, v4, "
    "SUM(cw) OVER (PARTITION BY event_type ORDER BY v4) AS cum, "
    "SUM(cw) OVER (PARTITION BY event_type) AS tot FROM g) "
    "SELECT event_type, CAST(MIN(CASE WHEN 2 * cum >= tot THEN v4 END) "
    "AS BIGINT) AS wmedian_v4, CAST(MAX(tot) AS BIGINT) AS w_total "
    "FROM c GROUP BY 1"
)


def q_scd2(sf_dir: str):
    """SCD TYPE-2 INTERVAL BUILD (the warehouse dimension-versioning
    operator: a keyed changelog becomes validity intervals
    [valid_from, valid_to) with an is_current flag — reference analog: the
    catalog's item-version snapshots).  Per user, each event opens a
    version closed by the user's next event; the open tail gets the -1
    sentinel (SQL COALESCE twin).

    Scale shape: ONE user-bucketed shuffle (`user_id % 64`), per-bucket
    vectorized groupby-shift (the od_matrix LEAD discipline) — no row
    loops, no window over the corpus.  All int64 (epoch-us), hash-exact
    vs the LEAD twin."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_cols(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                        pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "ts_us": pa.array(ts_us),
                         "ub": pa.array(uid % 64)})

    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        nxt = g.groupby("user_id", sort=False)["ts_us"].shift(-1)
        out = pd.DataFrame({
            "user_id": g["user_id"].to_numpy(np.int64),
            "event_id": g["event_id"].to_numpy(np.int64),
            "valid_from_us": g["ts_us"].to_numpy(np.int64),
            "valid_to_us": nxt.fillna(-1).to_numpy(np.int64),
        })
        out["is_current"] = (out["valid_to_us"] == -1).astype(np.int64)
        return out

    out = (ds.map_batches(add_cols, batch_format="pyarrow")
           .groupby("ub").map_groups(intervals, batch_format="pandas")
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return (out.sort_values("event_id", kind="stable")
            .reset_index(drop=True)
            [["user_id", "event_id", "valid_from_us", "valid_to_us",
              "is_current"]])


SQL_SCD2 = (
    "SELECT user_id, event_id, "
    "CAST(epoch_us(ts) AS BIGINT) AS valid_from_us, "
    "COALESCE(LEAD(CAST(epoch_us(ts) AS BIGINT)) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id), -1) AS valid_to_us, "
    "CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "IS NULL THEN 1 ELSE 0 END AS is_current "
    "FROM events"
)


def q_dod_growth(sf_dir: str):
    """DAY-OVER-DAY GROWTH per series (the reporting rollup every events
    warehouse ships: daily count + e4 value sum per type, with
    previous-day deltas and the growth ratio): only days with a
    predecessor emit (no NULL semantics to mirror).

    Scale shape: the corpus reduces in ONE pass to a (type x day)
    aggregate — date-domain-bounded like `new_users_daily` — and the LAG
    runs as a vectorized shift over that tiny frame on the driver.
    Counts/sums integer; the growth ratio is a single matched IEEE
    divide."""
    from ray.data.aggregate import Sum as _Sum

    from ..functions.rounding import round_half_away

    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def part(t: pa.Table) -> pa.Table:
        e4 = round_half_away(
            t["value"].to_numpy(zero_copy_only=False) * 1e4).astype(np.int64)
        g = (pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "day": pc.strftime(t["ts"], format="%Y-%m-%d")
                           .to_pandas(), "e4": e4})
             .groupby(["event_type", "day"], sort=False)["e4"]
             .agg(["size", "sum"]).reset_index())
        return pa.table({"event_type": pa.array(g["event_type"], pa.string()),
                         "day": pa.array(g["day"], pa.string()),
                         "n": pa.array(g["size"].to_numpy(np.int64)),
                         "s_e4": pa.array(g["sum"].to_numpy(np.int64))})

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby(["event_type", "day"])
           .aggregate(_Sum("n", alias_name="n"),
                      _Sum("s_e4", alias_name="s_e4"))
           .to_pandas())         # (types x days) rows — date-domain bounded
    agg = agg.sort_values(["event_type", "day"]).reset_index(drop=True)
    for c in ("n", "s_e4"):
        agg[c] = agg[c].astype("int64")
    by = agg.groupby("event_type", sort=False)
    agg["n_prev"] = by["n"].shift(1)
    agg["s_prev"] = by["s_e4"].shift(1)
    agg = agg[agg["n_prev"].notna()].copy()
    agg["n_prev"] = agg["n_prev"].astype("int64")
    agg["d_n"] = (agg["n"] - agg["n_prev"]).astype("int64")
    agg["d_s_e4"] = (agg["s_e4"] - agg["s_prev"].astype("int64")).astype("int64")
    agg["growth"] = agg["n"].to_numpy(np.float64) \
        / agg["n_prev"].to_numpy(np.float64)
    return (agg[["event_type", "day", "n", "n_prev", "d_n", "d_s_e4",
                 "growth"]].reset_index(drop=True))


SQL_DOD_GROWTH = (
    "WITH m AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
    "COUNT(*) AS n, "
    "CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) AS BIGINT) AS s_e4 "
    "FROM events GROUP BY 1, 2), "
    "w AS (SELECT event_type, day, n, s_e4, "
    "LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS n_prev, "
    "LAG(s_e4) OVER (PARTITION BY event_type ORDER BY day) AS s_prev "
    "FROM m) "
    "SELECT event_type, day, n, n_prev, n - n_prev AS d_n, "
    "s_e4 - s_prev AS d_s_e4, "
    "CAST(n AS DOUBLE) / CAST(n_prev AS DOUBLE) AS growth "
    "FROM w WHERE n_prev IS NOT NULL"
)


def q_interarrival_hist(sf_dir: str):
    """INTER-ARRIVAL-TIME HISTOGRAM per series (the traffic-modeling /
    burstiness profile of an event stream): gaps between a user's
    consecutive events of the same type, bucketed in 10-minute steps
    capped at 24 h (integer-pure — no float log buckets), counted per
    (event_type, bucket).

    Scale shape: ONE user-bucketed shuffle colocates each (user, type)
    series; gaps come from a vectorized two-level groupby-shift; each
    reducer emits value_counts PARTIALS bounded by types x 145 buckets,
    and the final groupby folds those tiny rows.  Hash-exact vs the LAG
    twin."""
    from ray.data.aggregate import Sum as _Sum

    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def add_cols(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                        pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "event_type": t["event_type"],
                         "ts_us": pa.array(ts_us),
                         "ub": pa.array(uid % 64)})

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts_us", "event_id"],
                          kind="stable")
        prev = g.groupby(["user_id", "event_type"], sort=False)["ts_us"].shift(1)
        m = prev.notna()
        if not m.any():
            return pd.DataFrame({"event_type": pd.Series(dtype=object),
                                 "bucket": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        gap_s = ((g.loc[m, "ts_us"].to_numpy(np.int64)
                  - prev[m].to_numpy(np.int64)) // 1_000_000)
        bucket = np.minimum(gap_s // 600, 144)
        p = (pd.DataFrame({"event_type": g.loc[m, "event_type"].to_numpy(),
                           "bucket": bucket})
             .value_counts(["event_type", "bucket"]).reset_index(name="n"))
        return p.astype({"bucket": "int64", "n": "int64"})

    out = (ds.map_batches(add_cols, batch_format="pyarrow")
           .groupby("ub").map_groups(gaps, batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow")
           .groupby(["event_type", "bucket"])
           .aggregate(_Sum("n", alias_name="n"))
           .to_pandas())
    out["bucket"] = out["bucket"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["event_type", "bucket"], kind="stable")
            .reset_index(drop=True))


SQL_INTERARRIVAL_HIST = (
    "WITH w AS (SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
    "LAG(CAST(epoch_us(ts) AS BIGINT)) OVER "
    "(PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_us "
    "FROM events) "
    "SELECT event_type, "
    "LEAST((ts_us - prev_us) // 1000000 // 600, 144) AS bucket, "
    "COUNT(*) AS n FROM w WHERE prev_us IS NOT NULL GROUP BY 1, 2"
)


def _ntile_of(rn: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE bucket from 1-based row numbers (first n % k tiles get one
    extra row) — shared by `q_ntile` (distributed) and `q_rfm` (driver fold
    over the customer dimension)."""
    r, small = n % k, n // k
    big = small + 1
    cut = r * big
    return np.where(rn <= cut, (rn - 1) // big + 1,
                    r + (rn - cut - 1) // max(small, 1) + 1).astype(np.int64)


def q_rfm(sf_dir: str):
    """RFM SEGMENTATION (the classic customer-value model: Recency /
    Frequency / Monetary quintiles combined into a 3-digit segment code)
    over orders.

    Scale shape: the corpus reduces in ONE pass to a per-customer
    (last_order_day, n_orders, cents) aggregate — the only corpus-sized
    shuffle; the three quintile assignments then run as vectorized
    NTILE folds over the customer DIMENSION on the driver (bounded by
    customers, not orders; above driver scale the same assignment runs
    through `q_ntile`'s distributed bin+offset discipline, same rule via
    the shared `_ntile_of`).  All keys integer; ties break exactly like
    the SQL twin's ORDER BY (metric, customer)."""
    from ray.data.aggregate import Count as _Count, Max as _Max, Sum as _Sum

    from ..functions.rounding import round_half_away

    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        day = (pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                       pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        cents = round_half_away(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"o_custkey": t["o_custkey"],
                         "day_i": pa.array(day),
                         "cents": pa.array(cents)})

    cust = (ds.map_batches(part, batch_format="pyarrow")
            .groupby("o_custkey")
            .aggregate(_Max("day_i", alias_name="last_day"),
                       _Count(alias_name="n_orders"),
                       _Sum("cents", alias_name="cents"))
            .to_pandas())        # customer DIMENSION — driver-bounded
    for c in cust.columns:
        cust[c] = cust[c].astype("int64")
    n, k = len(cust), 5
    ck = cust["o_custkey"].to_numpy(np.int64)

    def tile(metric: np.ndarray, desc: bool) -> np.ndarray:
        order = np.lexsort((ck, -metric if desc else metric))
        rn = np.empty(n, dtype=np.int64)
        rn[order] = np.arange(n, dtype=np.int64) + 1
        return _ntile_of(rn, n, k)

    # R: more recent (larger last_day) = better = tile 1 -> rank DESC
    cust["r"] = tile(cust["last_day"].to_numpy(np.int64), desc=True)
    cust["f"] = tile(cust["n_orders"].to_numpy(np.int64), desc=True)
    cust["m"] = tile(cust["cents"].to_numpy(np.int64), desc=True)
    cust["segment"] = (cust["r"] * 100 + cust["f"] * 10 + cust["m"]).astype("int64")
    out = cust[["o_custkey", "last_day", "n_orders", "cents", "r", "f", "m",
                "segment"]]
    return out.sort_values("o_custkey").reset_index(drop=True)


SQL_RFM = (
    "WITH c AS (SELECT o_custkey, "
    "MAX(CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000) AS last_day, "
    "COUNT(*) AS n_orders, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) "
    "AS cents FROM orders GROUP BY 1), "
    "t AS (SELECT o_custkey, last_day, n_orders, cents, "
    "CAST(NTILE(5) OVER (ORDER BY last_day DESC, o_custkey) AS BIGINT) AS r, "
    "CAST(NTILE(5) OVER (ORDER BY n_orders DESC, o_custkey) AS BIGINT) AS f, "
    "CAST(NTILE(5) OVER (ORDER BY cents DESC, o_custkey) AS BIGINT) AS m "
    "FROM c) "
    "SELECT o_custkey, last_day, n_orders, cents, r, f, m, "
    "r * 100 + f * 10 + m AS segment FROM t"
)


def q_kmv_setops(sf_dir: str):
    """KMV SKETCH SET OPERATIONS (the theta-sketch workflow of audience
    analytics: distinct users of slice A, slice B, their UNION and their
    INTERSECTION — all from mergeable bounded sketches, never the id
    universe).  Slices: users active in the first half of the month (day
    <= 15) vs the second half.

    Scale shape: one corpus pass emits per-batch per-slice KMV partials
    (<= K int64s each); one tiny groupby merges per slice; the driver
    folds two 256-int sketches — union sketch = K smallest of the merged
    sketches (the KMV closure property), intersection via the standard
    rho * est_union estimator with the exact-below-K branch.  Everything
    integer and DETERMINISTIC (same two-round Mersenne hash as
    `q_distinct_sketch`), so the DuckDB twin reproduces the sketches —
    and therefore every estimate — bit-for-bit."""
    from ray.data.aggregate import Min as _Min  # noqa: F401

    K = 256
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.day(t["ts"]).to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_s, out_h = [], []
        for sl, mask in (("a", day <= 15), ("b", day > 15)):
            if mask.any():
                hv = kmv_partial(uid[mask], K)
                out_s.extend([sl] * len(hv))
                out_h.append(hv)
        if not out_h:
            return pa.table({"slice": pa.array([], pa.string()),
                             "hv": pa.array([], pa.int64())})
        return pa.table({"slice": pa.array(out_s, pa.string()),
                         "hv": pa.array(np.concatenate(out_h))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        mins = np.unique(g["hv"].to_numpy())[:K]
        return pd.DataFrame({"slice": [g["slice"].iloc[0]] * len(mins),
                             "hv": mins})

    sk = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby("slice").map_groups(merge, batch_format="pandas")
          .to_pandas())          # <= 2K rows by construction
    sa = np.sort(sk.loc[sk["slice"] == "a", "hv"].to_numpy(np.int64))
    sb = np.sort(sk.loc[sk["slice"] == "b", "hv"].to_numpy(np.int64))
    est_a = kmv_estimate(sa, K)
    est_b = kmv_estimate(sb, K)
    un = np.unique(np.concatenate([sa, sb]))[:K]
    est_u = kmv_estimate(un, K)
    both = np.intersect1d(sa, sb)
    n_common = int(np.isin(un, both).sum())
    est_i = n_common if len(un) < K else n_common * est_u // K
    return pd.DataFrame({
        "est_a": pd.Series([est_a], dtype="int64"),
        "est_b": pd.Series([est_b], dtype="int64"),
        "est_union": pd.Series([est_u], dtype="int64"),
        "est_inter": pd.Series([int(est_i)], dtype="int64"),
        "n_common_sketch": pd.Series([n_common], dtype="int64")})


def _kmv_user_sketch_sql(name: str, pred: str, k: int) -> str:
    """CTE chain computing the top-k KMV sketch of DISTINCT user hashes
    over ``events WHERE pred`` — mirrors kmv_partial(_kmv_hash(uid), k)."""
    return (
        f"{name}0 AS (SELECT DISTINCT (user_id * {_KMV_A} + {_KMV_B}) % {_KMV_P} AS h "
        f"FROM events WHERE {pred}), "
        f"{name}1 AS (SELECT ((h % 1073741824) * {_KMV_A2}) % {_KMV_P} AS t1, "
        f"((h // 1073741824) * {_KMV_A2}) % {_KMV_P} AS tt FROM {name}0), "
        f"{name}2 AS (SELECT DISTINCT (t1 + ((tt % 2147483648) * 1073741824 "
        f"+ tt // 2147483648) % {_KMV_P}) % {_KMV_P} AS hv FROM {name}1), "
        f"{name}r AS (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn FROM {name}2), "
        f"{name} AS (SELECT hv, rn FROM {name}r WHERE rn <= {k})"
    )


def kmv_setops_sql() -> str:
    K = 256

    def est(name: str) -> str:
        return (
            f"CASE WHEN (SELECT COUNT(*) FROM {name}) < {K} "
            f"THEN (SELECT COUNT(*) FROM {name}) "
            f"ELSE ({K - 1} * CAST({_KMV_P} AS HUGEINT)) "
            f"// (SELECT hv FROM {name} WHERE rn = {K}) END"
        )

    return (
        "WITH "
        + _kmv_user_sketch_sql("sa", "day(ts) <= 15", K) + ", "
        + _kmv_user_sketch_sql("sb", "day(ts) > 15", K) + ", "
        "u0 AS (SELECT hv FROM sa UNION SELECT hv FROM sb), "
        "ru AS (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn FROM u0), "
        f"su AS (SELECT hv, rn FROM ru WHERE rn <= {K}), "
        "nc AS (SELECT COUNT(*) AS n_common FROM su "
        "WHERE hv IN (SELECT hv FROM sa) AND hv IN (SELECT hv FROM sb)) "
        f"SELECT CAST({est('sa')} AS BIGINT) AS est_a, "
        f"CAST({est('sb')} AS BIGINT) AS est_b, "
        f"CAST({est('su')} AS BIGINT) AS est_union, "
        f"CAST(CASE WHEN (SELECT COUNT(*) FROM su) < {K} "
        f"THEN (SELECT n_common FROM nc) "
        f"ELSE ((SELECT n_common FROM nc) * {est('su')}) // {K} END AS BIGINT) "
        "AS est_inter, "
        "(SELECT n_common FROM nc) AS n_common_sketch"
    )


def q_late_arrivals(sf_dir: str):
    """LATE-DATA ACCOUNTING (the watermark audit of a streaming ingest:
    how many rows arrived more than 1 h behind the stream's high-water
    mark?) — ingest order is event_id order (the deterministic arrival
    log); the high-water mark is the RUNNING MAX event time over that
    order, and a row is late when it lags the watermark of the rows
    before it by over an hour.

    Scale shape: the `q_seq_pack` global-prefix discipline applied to MAX
    instead of SUM — contiguous event_id ranges partition the log, a tiny
    per-range (range, max_ts) table prefix-folds on the driver
    (O(#ranges)), and one more pass combines the broadcast range-prefix
    watermark with a vectorized within-range running max.  No global
    sort, no window over the corpus.  Output: per (event_type) the late
    and on-time counts plus the max lateness — hash-exact vs the window
    twin."""
    from ray.data.aggregate import Max as _Max, Sum as _Sum

    RANGE = 4096          # event_id span per log segment
    US_H = 3_600_000_000

    ds = _t(sf_dir, "events", ["event_id", "event_type", "ts"])

    def seg(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                        pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"event_id": pa.array(eid),
                         "event_type": t["event_type"],
                         "ts_us": pa.array(ts_us),
                         "rng": pa.array(eid // RANGE)})

    segged = ds.map_batches(seg, batch_format="pyarrow").materialize()
    rmax = (segged.groupby("rng").aggregate(_Max("ts_us", alias_name="mx"))
            .to_pandas().sort_values("rng").reset_index(drop=True))
    # driver prefix fold over O(#ranges) rows: watermark BEFORE each range
    mx = rmax["mx"].astype("int64").to_numpy()
    # -1 = "no watermark yet" (epoch-us timestamps are positive): the
    # lateness subtraction stays tiny-negative and clips to 0 — an
    # int64-min sentinel would UNDERFLOW wm - ts into a huge positive
    prefix = np.concatenate([[-1], np.maximum.accumulate(mx)[:-1]])
    pre = dict(zip(rmax["rng"].astype(int), prefix.astype(np.int64)))
    pre_ref = ray.put(pre)

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="stable")
        wm_in = np.maximum.accumulate(g["ts_us"].to_numpy(np.int64))
        # watermark seen BEFORE each row = max(range prefix, running max of
        # prior rows in this range)
        base = ray.get(pre_ref)[int(g["rng"].iloc[0])]
        wm_before = np.concatenate([[base],
                                    np.maximum(wm_in[:-1], base)])
        late_us = wm_before - g["ts_us"].to_numpy(np.int64)
        late = late_us > US_H
        out = pd.DataFrame({"event_type": g["event_type"].to_numpy(),
                            "late": late.astype(np.int64),
                            "late_us": np.maximum(late_us, 0)})
        p = (out.groupby("event_type", sort=False)
             .agg(n_late=("late", "sum"),
                  n_ontime=("late", lambda s: int((1 - s).sum())),
                  max_late_us=("late_us", "max")).reset_index())
        return p.astype({"n_late": "int64", "n_ontime": "int64",
                         "max_late_us": "int64"})

    out = (segged.groupby("rng").map_groups(flag, batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(_Sum("n_late", alias_name="n_late"),
                      _Sum("n_ontime", alias_name="n_ontime"),
                      _Max("max_late_us", alias_name="max_late_us"))
           .to_pandas())
    for c in ("n_late", "n_ontime", "max_late_us"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_LATE_ARRIVALS = (
    "WITH o AS (SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
    "MAX(CAST(epoch_us(ts) AS BIGINT)) OVER (ORDER BY event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm FROM events), "
    "f AS (SELECT event_type, "
    "CASE WHEN wm IS NOT NULL AND wm - ts_us > 3600000000 THEN 1 ELSE 0 END "
    "AS late, "
    "CASE WHEN wm IS NULL THEN 0 ELSE GREATEST(wm - ts_us, 0) END AS late_us "
    "FROM o) "
    "SELECT event_type, CAST(SUM(late) AS BIGINT) AS n_late, "
    "CAST(SUM(1 - late) AS BIGINT) AS n_ontime, "
    "CAST(MAX(late_us) AS BIGINT) AS max_late_us "
    "FROM f GROUP BY 1"
)


def q_seasonal_residuals(sf_dir: str):
    """SEASONAL-BASELINE ANOMALY FLAGS (the ops-analytics seasonal-naive
    detector: a row is anomalous when its value deviates > 3 sigma from
    its series' hour-of-day baseline) over (event_type, hour-of-day)
    cells.

    Integer-pure z-test WITHOUT square roots in the hot path: z^2 > 9
    rewrites as (n*v - s)^2 > 9*(n*sxx - s^2); the engine precomputes per
    cell the integer threshold r = isqrt(9*(n*sxx - s^2)) in python
    bignum (cells are domain-bounded: types x 24) and each row then
    needs only the int64 comparison |n*v - s| > r — exactly equivalent
    to the HUGEINT square the SQL twin evaluates per row, since for
    integers |d| > isqrt(T) iff d^2 > T.

    Scale shape: one pass of per-cell (n, s, sxx) partials -> tiny
    groupby -> broadcast thresholds -> one stateless flag pass.  Output:
    the flagged rows only."""
    import math

    from ray.data.aggregate import Sum as _Sum

    from ..functions.rounding import round_half_away

    ds = _t(sf_dir, "events", ["event_id", "event_type", "ts", "value"])

    def moments(t: pa.Table) -> pa.Table:
        e4 = round_half_away(
            t["value"].to_numpy(zero_copy_only=False) * 1e4).astype(np.int64)
        hod = pc.hour(t["ts"]).to_numpy(zero_copy_only=False).astype(np.int64)
        g = (pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "hod": hod, "e4": e4, "sq": e4 * e4})
             .groupby(["event_type", "hod"], sort=False)
             .agg(n=("e4", "size"), s=("e4", "sum"), sxx=("sq", "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (ds.map_batches(moments, batch_format="pyarrow")
             .groupby(["event_type", "hod"])
             .aggregate(_Sum("n", alias_name="n"), _Sum("s", alias_name="s"),
                        _Sum("sxx", alias_name="sxx"))
             .to_pandas())
    thr = cells[["event_type", "hod"]].copy()
    thr["n"] = cells["n"].astype("int64")
    thr["s"] = cells["s"].astype("int64")
    thr["r"] = [math.isqrt(9 * (int(n) * int(sxx) - int(s) * int(s)))
                for n, s, sxx in zip(cells["n"], cells["s"], cells["sxx"])]
    thr["hod"] = thr["hod"].astype("int64")
    thr_ref = ray.put(thr)

    def flag(t: pa.Table) -> pa.Table:
        tf = ray.get(thr_ref)
        e4 = round_half_away(
            t["value"].to_numpy(zero_copy_only=False) * 1e4).astype(np.int64)
        hod = pc.hour(t["ts"]).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "hod": hod, "e4": e4,
                           "i": np.arange(len(e4))})
        # C-level merge against the broadcast (types x 24) threshold frame
        j = df.merge(tf, on=["event_type", "hod"], how="left", sort=False)
        j = j.sort_values("i", kind="stable")
        n = j["n"].to_numpy(np.int64)
        s = j["s"].to_numpy(np.int64)
        r = j["r"].to_numpy(np.int64)
        d = n * e4 - s
        keep = np.abs(d) > r
        return pa.table({
            "event_id": pc.filter(t["event_id"], pa.array(keep)),
            "event_type": pc.filter(t["event_type"], pa.array(keep)),
            "hod": pa.array(hod[keep]),
            "v_e4": pa.array(e4[keep]),
            "d": pa.array(d[keep])})

    out = ds.map_batches(flag, batch_format="pyarrow").to_pandas()
    for c in ("event_id", "hod", "v_e4", "d"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


SQL_SEASONAL_RESIDUALS = (
    "WITH b AS (SELECT event_id, event_type, hour(ts) AS hod, "
    "CAST(ROUND(value * 10000, 0) AS BIGINT) AS v FROM events), "
    "c AS (SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v * v) AS BIGINT) AS sxx "
    "FROM b GROUP BY 1, 2) "
    "SELECT b.event_id, b.event_type, b.hod, b.v AS v_e4, "
    "c.n * b.v - c.s AS d FROM b JOIN c USING (event_type, hod) "
    "WHERE CAST(c.n * b.v - c.s AS HUGEINT) * (c.n * b.v - c.s) "
    "> 9 * (CAST(c.n AS HUGEINT) * c.sxx - CAST(c.s AS HUGEINT) * c.s)"
)


PEAK_SPAN_US = 600_000_000       # each event holds a 10-min session open
PEAK_BUCKET_US = 3_600_000_000   # sweep buckets: 1 h of boundary stream


def q_peak_concurrency(sf_dir: str):
    """PEAK CONCURRENCY (the interval-stabbing / sweep-line classic of
    capacity planning: the maximum number of simultaneously-open 10-min
    sessions per series, and the FIRST instant it is reached).

    Scale shape: each event emits two boundary rows (+1 at ts, -1 at
    ts+10min, vectorized); the boundary stream shuffles ONCE into
    (series, hour-bucket) groups; each group runs a vectorized local
    sweep (sort + cumsum, with SQL RANGE-frame tie semantics: equal
    (t, d) rows all take their group's closing sum) and emits ONE partial
    row (net delta, local max, first t at max); the driver prefix-folds
    the O(series x hours) partial table — the `q_seq_pack` offset
    discipline applied per group.  No global sort, no window over the
    corpus.  Hash-exact vs the window twin (ties included)."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def boundaries(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                        pa.int64()).to_numpy(zero_copy_only=False)
        et = t["event_type"].to_pandas().to_numpy()
        tt = np.concatenate([ts_us, ts_us + PEAK_SPAN_US])
        dd = np.concatenate([np.ones(len(ts_us), np.int64),
                             -np.ones(len(ts_us), np.int64)])
        ee = np.concatenate([et, et])
        return pa.table({"event_type": pa.array(ee, pa.string()),
                         "t": pa.array(tt), "d": pa.array(dd),
                         "tb": pa.array(tt // PEAK_BUCKET_US)})

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, gg in g.groupby("event_type", sort=False):
            gg = gg.sort_values(["t", "d"], kind="stable")
            cum = gg["d"].to_numpy(np.int64).cumsum()
            # SQL RANGE frame: equal (t, d) peers all take the tie group's
            # CLOSING cumsum ("last", not "max" — they differ on -1 runs)
            key = gg["t"].to_numpy(np.int64) * 2 + (gg["d"].to_numpy() > 0)
            last = pd.Series(cum).groupby(key, sort=False).transform("last") \
                .to_numpy(np.int64)
            mx = int(last.max())
            t_at = int(gg["t"].to_numpy(np.int64)[last == mx].min())
            out.append((et, int(g["tb"].iloc[0]), int(cum[-1]), mx, t_at))
        return pd.DataFrame(out, columns=["event_type", "tb", "net",
                                          "local_max", "t_at_max"])

    parts = (ds.map_batches(boundaries, batch_format="pyarrow")
             .groupby("tb").map_groups(sweep, batch_format="pandas")
             .to_pandas())       # O(series x hour-buckets) rows
    rows = []
    for et, g in parts.groupby("event_type"):
        g = g.sort_values("tb").reset_index(drop=True)
        offs = np.concatenate([[0], g["net"].to_numpy(np.int64).cumsum()[:-1]])
        cand = offs + g["local_max"].to_numpy(np.int64)
        peak = int(cand.max())
        t_peak = int(g["t_at_max"].to_numpy(np.int64)[cand == peak].min())
        rows.append((et, peak, t_peak))
    out = pd.DataFrame(rows, columns=["event_type", "peak", "peak_ts_us"])
    out["peak"] = out["peak"].astype("int64")
    out["peak_ts_us"] = out["peak_ts_us"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_PEAK_CONCURRENCY = (
    f"WITH b AS (SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS t, "
    "1 AS d FROM events UNION ALL SELECT event_type, "
    f"CAST(epoch_us(ts) AS BIGINT) + {PEAK_SPAN_US}, -1 FROM events), "
    "c AS (SELECT event_type, t, "
    "CAST(SUM(d) OVER (PARTITION BY event_type ORDER BY t, d) AS BIGINT) "
    "AS cum FROM b), "
    "m AS (SELECT event_type, MAX(cum) AS peak FROM c GROUP BY 1) "
    "SELECT c.event_type, m.peak, CAST(MIN(c.t) AS BIGINT) AS peak_ts_us "
    "FROM c JOIN m USING (event_type) WHERE c.cum = m.peak GROUP BY 1, 2"
)


SAMPLE_N_PER_GROUP = 20


def q_grouped_sample_n(sf_dir: str):
    """EXACT-n PER-STRATUM SAMPLING (the eval-set construction primitive:
    exactly n rows per group, uniform, DETERMINISTIC and cluster-size
    invariant — `stratified_sample` is rate-based and cannot promise
    exact counts): the n=20 events per type with the smallest
    (kmv_hash(event_id), event_id) — a uniform draw because the hash is
    uniform, reproducible because it is a pure function of the row.

    Scale shape: the `grouped_topk` combiner discipline on the hash
    order — every batch prunes to its local n per group, so the shuffle
    moves O(groups x n x batches) candidate rows, never the corpus.
    Hash-exact vs the ROW_NUMBER twin."""
    from ray.data.aggregate import Count as _Count  # noqa: F401

    ds = _t(sf_dir, "events", ["event_id", "event_type"])

    def prune(t: pa.Table) -> pa.Table:
        h = _kmv_hash(t["event_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "event_id": t["event_id"].to_numpy(
                               zero_copy_only=False).astype(np.int64),
                           "h": h})
        df = (df.sort_values(["h", "event_id"], kind="stable")
              .groupby("event_type", sort=False).head(SAMPLE_N_PER_GROUP))
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["h", "event_id"], kind="stable")
             .head(SAMPLE_N_PER_GROUP))
        return g[["event_type", "event_id", "h"]]

    out = (ds.map_batches(prune, batch_format="pyarrow")
           .groupby("event_type").map_groups(final, batch_format="pandas")
           .to_pandas())
    out["event_id"] = out["event_id"].astype("int64")
    out["h"] = out["h"].astype("int64")
    return (out.sort_values(["event_type", "h", "event_id"], kind="stable")
            .reset_index(drop=True))


def grouped_sample_n_sql() -> str:
    return (
        f"WITH h1 AS (SELECT event_type, event_id, "
        f"(event_id * {_KMV_A} + {_KMV_B}) % {_KMV_P} AS h0 FROM events), "
        f"t AS (SELECT event_type, event_id, "
        f"((h0 % 1073741824) * {_KMV_A2}) % {_KMV_P} AS t1, "
        f"((h0 // 1073741824) * {_KMV_A2}) % {_KMV_P} AS tt FROM h1), "
        f"hh AS (SELECT event_type, event_id, (t1 + ((tt % 2147483648) * "
        f"1073741824 + tt // 2147483648) % {_KMV_P}) % {_KMV_P} AS h FROM t), "
        "r AS (SELECT event_type, event_id, h, ROW_NUMBER() OVER "
        "(PARTITION BY event_type ORDER BY h, event_id) AS rn FROM hh) "
        "SELECT event_type, event_id, h FROM r "
        f"WHERE rn <= {SAMPLE_N_PER_GROUP}"
    )


def q_gini(sf_dir: str):
    """GINI COEFFICIENT per segment (the inequality statistic of revenue
    concentration reporting: 0 = all orders equal, ->1 = one order holds
    all value) over order totals, grouped by o_orderpriority:

        G = sum_rn (2*rn - n - 1) * x_(rn)  /  (n * sum x)

    with rn the ROW_NUMBER in (cents, orderkey) order within the group —
    computed WITHOUT a global sort by the `q_global_rank` / `q_ntile`
    two-pass discipline applied PER GROUP: per-(group, 256-value-bin)
    counts -> driver prefix offsets (O(groups x 256) state) -> each bin
    sorts locally and emits ONE integer partial of the rank-weighted sum
    (int64 at tested scales; the HUGEINT twin and a bignum driver fold
    are the documented swap).  One float divide at the end, mirrored by
    the twin."""
    from ray.data.aggregate import Count as _Count, Max as _Max, \
        Min as _Min, Sum as _Sum

    from ..functions.rounding import round_half_away

    B = 256
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority",
                               "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = round_half_away(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "grp": t["o_orderpriority"], "x": pa.array(c)})

    v = ds.map_batches(cents, batch_format="pyarrow").materialize()
    stats = (v.groupby("grp")
             .aggregate(_Count(alias_name="n"), _Sum("x", alias_name="sx"),
                        _Min("x", alias_name="mn"), _Max("x", alias_name="mx"))
             .to_pandas())
    srow = {r.grp: (int(r.n), int(r.sx), int(r.mn), int(r.mx))
            for r in stats.itertuples()}

    def bin_of(grps, x):
        mn = np.array([srow[g][2] for g in grps], dtype=np.int64)
        mx = np.array([srow[g][3] for g in grps], dtype=np.int64)
        return (x - mn) * B // (mx - mn + 1)

    def binify(t: pa.Table) -> pa.Table:
        grps = t["grp"].to_pylist()
        x = t["x"].to_numpy(zero_copy_only=False)
        return t.append_column("bin", pa.array(bin_of(grps, x)))

    binned = v.map_batches(binify, batch_format="pyarrow").materialize()
    counts = (binned.groupby(["grp", "bin"])
              .aggregate(_Count(alias_name="c")).to_pandas())
    offs = {}
    for g, gg in counts.groupby("grp"):
        gg = gg.sort_values("bin")
        cum = np.concatenate([[0], gg["c"].to_numpy(np.int64).cumsum()[:-1]])
        for b, o in zip(gg["bin"].astype(int), cum):
            offs[(g, int(b))] = int(o)
    offs_ref = ray.put(offs)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        # one partial per (grp, bin): local (x, id) sort + offset ranks
        out = []
        for (grp, b), gg in g.groupby(["grp", "bin"], sort=False):
            off = ray.get(offs_ref)[(grp, int(b))]
            gg = gg.sort_values(["x", "o_orderkey"], kind="stable")
            x = gg["x"].to_numpy(np.int64)
            rn = off + np.arange(len(x), dtype=np.int64) + 1
            out.append((grp, int((2 * rn * x).sum()), int(x.sum()),
                        len(x)))
        return pd.DataFrame(out, columns=["grp", "s2rx", "sxl", "cl"])

    parts = (binned.groupby(["grp", "bin"])
             .map_groups(partial, batch_format="pandas")
             .to_pandas())
    rows = []
    for g, gg in parts.groupby("grp"):
        n, sx, _, _ = srow[g]
        num = int(gg["s2rx"].sum()) - (n + 1) * sx
        gini = float(num) / float(n * sx)
        rows.append((g, n, sx, gini))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "n", "sum_cents",
                                      "gini"])
    out["n"] = out["n"].astype("int64")
    out["sum_cents"] = out["sum_cents"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_GINI = (
    "WITH b AS (SELECT o_orderpriority, o_orderkey, "
    "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS x FROM orders), "
    "r AS (SELECT o_orderpriority, x, CAST(ROW_NUMBER() OVER "
    "(PARTITION BY o_orderpriority ORDER BY x, o_orderkey) AS BIGINT) "
    "AS rn FROM b), "
    "a AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(x) AS BIGINT) AS sx, "
    "SUM(CAST(2 * rn AS HUGEINT) * x) AS s2rx FROM r GROUP BY 1) "
    "SELECT o_orderpriority, n, sx AS sum_cents, "
    "CAST(s2rx - CAST(n + 1 AS HUGEINT) * sx AS DOUBLE) "
    "/ CAST(CAST(n AS HUGEINT) * sx AS DOUBLE) AS gini FROM a"
)
