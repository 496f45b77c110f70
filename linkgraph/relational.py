"""Relational/ETL pipelines over the TPC-H-style testdata tables —
oracle-checked exercises of the wide relational primitives (SURVEY.md
§2.4: projection/filter at the read, distributed join, groupby-aggregate
with combiner pushdown, distributed sort/top-k).

Scale shapes:

  pricing_summary   pruned-column read + row filter -> ONE hash
                    groupby-aggregate (Ray pushes partial aggregation
                    into the map side); avgs derived from sums/counts
                    in a tiny post-transform.  No join.
  top_orders        the one genuinely big-big join (lineitem x orders)
                    as a hash Dataset.join; the customer side is a
                    FILTERED BROADCAST membership (ray.put the passing
                    custkeys once; lookup inside map_batches) — never a
                    second shuffle; distributed sort + limit for top-k.
  nation_revenue    star-schema joins done the 100-TB way: every
                    dimension (customer, supplier, nation, region) is
                    broadcast as a numpy lookup once via ray.put and the
                    fact table streams through a single vectorized
                    map_batches; only lineitem x orders shuffles.

All float aggregate columns are rounded on both sides (driver value-hash
convention, see pipelines.py docstring).
"""

from __future__ import annotations

from .io import read_parquet_clean

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _ts(date_str: str):
    """UTC-naive microsecond timestamp scalar for filter pushdown."""
    import datetime as dt

    return dt.datetime.fromisoformat(date_str)


# --------------------------------------------------------- pricing summary

Q1_CUTOFF = "1998-09-02"


def pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: one filtered groupby-aggregate over lineitem."""
    import os

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .runtime import tune_context
    tune_context()

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = _ts(Q1_CUTOFF)

    def pre(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["l_shipdate"], pa.scalar(cutoff)))
        disc = pc.multiply(b["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "l_quantity": b["l_quantity"],
            "l_extendedprice": b["l_extendedprice"],
            "disc_price": disc,
        })

    agg = (li.map_batches(pre, batch_format="pyarrow")
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                        Sum("l_extendedprice", alias_name="sum_base"),
                        Sum("disc_price", alias_name="sum_disc"),
                        Count(alias_name="n_rows")))

    def post(b: pa.Table) -> pa.Table:
        n = pc.cast(b["n_rows"], pa.float64())
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty": pc.round(b["sum_qty"], 6),
            "sum_base": pc.round(b["sum_base"], 6),
            "sum_disc": pc.round(b["sum_disc"], 6),
            "avg_qty": pc.round(pc.divide(b["sum_qty"], n), 6),
            "n_rows": pc.cast(b["n_rows"], pa.int64()),
        })

    return agg.map_batches(post, batch_format="pyarrow")


PRICING_SUMMARY_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 6) AS sum_qty,
           round(sum(l_extendedprice), 6) AS sum_base,
           round(sum(l_extendedprice * (1.0 - l_discount)), 6) AS sum_disc,
           round(sum(l_quantity) / count(*), 6) AS avg_qty,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------- top orders

Q3_SEGMENT = "BUILDING"
Q3_ORDER_CUTOFF = "1999-01-01"
Q3_TOPK = 10


def top_orders(sf_dir: str, num_partitions: int = 8):
    """TPC-H Q3 shape: revenue of unshipped BUILDING-segment orders.

    customer is pre-filtered and BROADCAST as a membership array (small
    side, ray.put once — the scale rule for dimension joins); the only
    shuffle join is lineitem x orders; top-k via distributed sort+limit.
    """
    import os

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .runtime import tune_context
    tune_context()

    cust = read_parquet_clean(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(
        expr=f"c_mktsegment == '{Q3_SEGMENT}'").select_columns(
        ["c_custkey"]).to_pandas()["c_custkey"].to_numpy()
    keys_ref = ray.put(np.sort(keys))
    cutoff = _ts(Q3_ORDER_CUTOFF)

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def keep_building(b: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        b = b.filter(pc.less(b["o_orderdate"], pa.scalar(cutoff)))
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, ck)
        pos_c = np.minimum(pos, len(ks) - 1)
        b = b.filter(pa.array(ks[pos_c] == ck))
        return pa.table({
            "l_orderkey": b["o_orderkey"],
            "o_orderdate_us": pc.cast(b["o_orderdate"], pa.int64()),
        })

    ord_f = orders.map_batches(keep_building,
                               batch_format="pyarrow").materialize()

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])

    def li_pre(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["l_shipdate"], pa.scalar(cutoff)))
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"], "rev": rev})

    li_f = li.map_batches(li_pre, batch_format="pyarrow")
    joined = li_f.join(ord_f, join_type="inner",
                       num_partitions=num_partitions, on=("l_orderkey",))
    rev = (joined.groupby(["l_orderkey", "o_orderdate_us"])
                 .aggregate(Sum("rev", alias_name="revenue")))

    def post(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "o_orderdate_us": b["o_orderdate_us"],
            "revenue": pc.round(b["revenue"], 6),
        })

    return (rev.map_batches(post, batch_format="pyarrow")
               .sort(["revenue", "l_orderkey"], descending=[True, False])
               .limit(Q3_TOPK))


TOP_ORDERS_SQL = f"""
    SELECT l_orderkey,
           CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us,
           round(sum(l_extendedprice * (1.0 - l_discount)), 6) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = '{Q3_SEGMENT}'
      AND o_orderdate < TIMESTAMP '{Q3_ORDER_CUTOFF}'
      AND l_shipdate > TIMESTAMP '{Q3_ORDER_CUTOFF}'
    GROUP BY l_orderkey, o_orderdate_us
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT {Q3_TOPK}
"""


# ------------------------------------------------- per-customer order rank

ORDER_RANK_TOPN = 3


def top_orders_per_customer(sf_dir: str, n: int = ORDER_RANK_TOPN):
    """Windowed relational query (SQL `row_number() OVER (PARTITION BY
    ...)`): the top-n orders per customer by (totalprice desc, orderkey
    asc).  Ray Data has no window operator; the scale shape is a
    map-side per-block prune (each block keeps its local per-customer
    top-n — at most n * n_custs_in_block rows survive) followed by ONE
    groupby(custkey).map_groups exact cut that re-ranks each customer's
    <= n * n_blocks candidates.  No sort of the full table, no driver
    materialization."""
    import os

    import pandas as pd

    from .runtime import tune_context

    tune_context()
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def _cut(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                              ascending=[True, False, True],
                              kind="mergesort")
        out = pdf.groupby("o_custkey", sort=False).head(n).copy()
        out["rnk"] = out.groupby("o_custkey", sort=False).cumcount() + 1
        return out

    def local_prune(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            _cut(b.to_pandas()).drop(columns=["rnk"]),
            preserve_index=False).replace_schema_metadata(None)

    cand = orders.map_batches(local_prune, batch_format="pyarrow")
    ranked = cand.groupby("o_custkey").map_groups(
        _cut, batch_format="pandas")
    return ranked.map_batches(
        lambda b: b.select(["o_custkey", "o_orderkey", "o_totalprice",
                            "rnk"]).set_column(
            3, "rnk", pc.cast(b["rnk"], pa.int64())),
        batch_format="pyarrow")


TOP_ORDERS_PER_CUSTOMER_SQL = f"""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC)
                 AS rnk
          FROM orders)
    WHERE rnk <= {ORDER_RANK_TOPN}
"""


# --------------------------------------------------------- nation revenue

Q5_REGION = "ASIA"


def nation_revenue(sf_dir: str, num_partitions: int = 8):
    """TPC-H Q5 shape: revenue by supplier nation within one region,
    where the customer and supplier share the nation.

    Every dimension is a broadcast numpy lookup (ray.put once); the fact
    side is ONE lineitem x orders hash join and ONE vectorized
    map_batches; final aggregate is a tiny nation-keyed groupby.
    """
    import os

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .runtime import tune_context
    tune_context()

    def _pdf(name, cols):
        return read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"),
                               columns=cols).to_pandas()

    nation = _pdf("nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _pdf("region", ["r_regionkey", "r_name"])
    supplier = _pdf("supplier", ["s_suppkey", "s_nationkey"])
    customer = _pdf("customer", ["c_custkey", "c_nationkey"])

    ok_region = set(region[region["r_name"] == Q5_REGION]["r_regionkey"])
    nat_in_region = nation[nation["n_regionkey"].isin(ok_region)]
    # dense lookup arrays: key -> nationkey (-1 = absent)
    sup_lu = np.full(int(supplier["s_suppkey"].max()) + 1, -1, np.int64)
    sup_lu[supplier["s_suppkey"].to_numpy()] = \
        supplier["s_nationkey"].to_numpy()
    cust_lu = np.full(int(customer["c_custkey"].max()) + 1, -1, np.int64)
    cust_lu[customer["c_custkey"].to_numpy()] = \
        customer["c_nationkey"].to_numpy()
    names = dict(zip(nat_in_region["n_nationkey"].astype(int),
                     nat_in_region["n_name"]))
    lu_ref = ray.put((sup_lu, cust_lu, names))

    orders = read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey"])
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def li_pre(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"], "rev": rev})

    ord_k = orders.map_batches(
        lambda b: pa.table({"l_orderkey": b["o_orderkey"],
                            "o_custkey": b["o_custkey"]}),
        batch_format="pyarrow")
    joined = li.map_batches(li_pre, batch_format="pyarrow") \
               .join(ord_k, join_type="inner",
                     num_partitions=num_partitions, on=("l_orderkey",))

    def to_nation(b: pa.Table) -> pa.Table:
        sup_l, cust_l, nm = ray.get(lu_ref)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        sn = sup_l[sk]
        cn = cust_l[ck]
        keep = (sn == cn) & np.isin(sn, list(nm))
        rev = b["rev"].to_numpy(zero_copy_only=False)[keep]
        labels = [nm[int(x)] for x in sn[keep]]
        return pa.table({"n_name": pa.array(labels, pa.string()),
                         "rev": pa.array(rev, pa.float64())})

    agg = (joined.map_batches(to_nation, batch_format="pyarrow")
                 .groupby("n_name")
                 .aggregate(Sum("rev", alias_name="revenue")))
    return agg.map_batches(
        lambda b: pa.table({"n_name": b["n_name"],
                            "revenue": pc.round(b["revenue"], 6)}),
        batch_format="pyarrow")


NATION_REVENUE_SQL = f"""
    SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 6)
           AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey AND r_name = '{Q5_REGION}'
    GROUP BY n_name
"""


Q18_MIN_QTY = 250


def large_orders(sf_dir: str, num_partitions: int = 8):
    """TPC-H Q18-like large-volume orders: per-order quantity sums with
    combiner pushdown, a HAVING-style filter, then ONE hash join against
    the orders table for the customer key — the aggregate-then-semi-join
    shape (the filtered aggregate is tiny, so the join's build side
    stays small at any scale)."""
    import os

    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .runtime import tune_context
    tune_context()

    li = read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=["l_orderkey", "l_quantity"])
    qty = (li.groupby("l_orderkey")
             .aggregate(Sum("l_quantity", alias_name="qty")))
    big = qty.map_batches(
        lambda b: b.filter(pc.greater_equal(b["qty"],
                                            pa.scalar(float(Q18_MIN_QTY)))),
        batch_format="pyarrow")
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    ord_k = orders.map_batches(
        lambda b: pa.table({"l_orderkey": b["o_orderkey"],
                            "o_custkey": b["o_custkey"],
                            "o_totalprice": b["o_totalprice"]}),
        batch_format="pyarrow")
    j = big.join(ord_k, join_type="inner", num_partitions=num_partitions,
                 on=("l_orderkey",))
    return j.map_batches(
        lambda b: pa.table({
            "o_orderkey": b["l_orderkey"],
            "o_custkey": b["o_custkey"],
            "qty": pc.round(b["qty"], 6),
            "o_totalprice": pc.round(b["o_totalprice"], 6)}),
        batch_format="pyarrow")


LARGE_ORDERS_SQL = f"""
    SELECT o_orderkey, o_custkey, round(q.qty, 6) AS qty,
           round(o_totalprice, 6) AS o_totalprice
    FROM (SELECT l_orderkey, sum(l_quantity) AS qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) >= {Q18_MIN_QTY}) q
    JOIN orders ON o_orderkey = q.l_orderkey
"""


# ------------------------------------------------- Q4-like priority count

Q4_START, Q4_END = "1996-01-01", "1996-04-01"
Q4_QTY = 45.0


def order_priority_count(sf_dir: str):
    """TPC-H Q4 shape: orders of one quarter having at least one
    large-quantity lineitem (EXISTS — joins.semi_join, size-gated
    broadcast / bucket membership), counted per o_orderpriority.
    Bounded output domain -> map-side partial counts + driver merge."""
    import os

    from .io import read_parquet_clean
    from .joins import semi_join
    from .runtime import tune_context
    tune_context()

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    lo, hi = _ts(Q4_START), _ts(Q4_END)

    def window(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                    pc.less(b["o_orderdate"], pa.scalar(hi)))
        return b.filter(m).select(["o_orderkey", "o_orderpriority"])

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"])

    def big(b: pa.Table) -> pa.Table:
        k = b.filter(pc.greater(b["l_quantity"], pa.scalar(Q4_QTY)))
        return pa.table({"o_orderkey": k["l_orderkey"]})

    windowed = orders.map_batches(window, batch_format="pyarrow")
    keys = li.map_batches(big, batch_format="pyarrow")
    kept = semi_join(windowed, keys, "o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(b["o_orderpriority"].to_numpy(
            zero_copy_only=False), return_counts=True)
        return pa.table({"o_orderpriority": pa.array(u, pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    parts = kept.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({
            "o_orderpriority": pd.Series([], dtype=str),
            "n_orders": pd.Series([], dtype=np.int64)})
    out = parts.groupby("o_orderpriority", sort=True)["n"].sum() \
               .rename("n_orders").reset_index()
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out


ORDER_PRIORITY_SQL = f"""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{Q4_START}'
      AND o_orderdate < TIMESTAMP '{Q4_END}'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_quantity > {Q4_QTY})
    GROUP BY 1
"""


# --------------------------------------------- Q12-like priority buckets

Q12_START, Q12_END = "1996-01-01", "1997-01-01"
HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def shipmode_priority_buckets(sf_dir: str):
    """TPC-H Q12 shape: one year of lineitems joined to their orders
    (joins.attach_by_key — the small orders side broadcast under the
    cap), CASE-bucketed high/low order-priority line counts per
    l_returnflag.  Bounded domain -> map-side partials + driver merge."""
    import os

    from .io import read_parquet_clean
    from .joins import attach_by_key
    from .runtime import tune_context
    tune_context()

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"])

    def to_map(b: pa.Table) -> pa.Table:
        pr = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        high = np.isin(pr, np.array(HIGH_PRIORITIES)).astype(np.int64)
        return pa.table({"o_orderkey": pc.cast(b["o_orderkey"],
                                               pa.int64()),
                         "is_high": pa.array(high)})

    omap = orders.map_batches(to_map, batch_format="pyarrow")
    lo, hi = _ts(Q12_START), _ts(Q12_END)
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_shipdate"])

    def window(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
                    pc.less(b["l_shipdate"], pa.scalar(hi)))
        return b.filter(m).select(["l_orderkey", "l_returnflag"])

    probe = li.map_batches(window, batch_format="pyarrow")
    joined = attach_by_key(probe, omap, ["l_orderkey"], "o_orderkey",
                           "is_high")

    def partial(b: pa.Table) -> pa.Table:
        rf = b["l_returnflag"].to_numpy(zero_copy_only=False)
        ih = b["is_high_l_orderkey"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"rf": rf, "ih": ih})
        g = df.groupby(["rf", "ih"], sort=False).size() \
              .rename("n").reset_index()
        return pa.table({"rf": pa.array(g["rf"], pa.string()),
                         "ih": pa.array(g["ih"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    parts = joined.map_batches(partial, batch_format="pyarrow") \
                  .to_pandas()
    flags = sorted(parts["rf"].unique()) if len(parts) else []
    rows = []
    for f in flags:
        sub = parts[parts["rf"] == f]
        rows.append((f,
                     int(sub.loc[sub["ih"] == 1, "n"].sum()),
                     int(sub.loc[sub["ih"] == 0, "n"].sum())))
    return pd.DataFrame(rows, columns=["l_returnflag",
                                       "high_line_count",
                                       "low_line_count"]) \
        .astype({"high_line_count": np.int64,
                 "low_line_count": np.int64})


SHIPMODE_PRIORITY_SQL = f"""
    SELECT l_returnflag,
           count(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           count(*) FILTER (o_orderpriority NOT IN ('1-URGENT',
                                                    '2-HIGH'))
             AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '{Q12_START}'
      AND l_shipdate < TIMESTAMP '{Q12_END}'
    GROUP BY 1
"""


# -------------------------------------------- Q10-like returned revenue

Q10_START, Q10_END = "1996-01-01", "1996-07-01"
Q10_TOPK = 20


def returned_revenue_topk(sf_dir: str, num_partitions: int = 8):
    """TPC-H Q10 shape: revenue lost to returned items per customer —
    lineitems with l_returnflag = 'R' joined to a half-year order
    window, ONE groupby(custkey) revenue sum, a hash join for the
    customer attributes, then the top-20 customers by rounded revenue
    (desc, custkey asc — rounding BEFORE ranking on both sides so the
    cut is on identical doubles)."""
    import os

    from .runtime import tune_context
    tune_context()

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"])

    def ret(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"], "rev": rev})

    lo, hi = _ts(Q10_START), _ts(Q10_END)
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def window(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                    pc.less(b["o_orderdate"], pa.scalar(hi)))
        k = b.filter(m)
        return pa.table({"l_orderkey": k["o_orderkey"],
                         "o_custkey": k["o_custkey"]})

    from ray.data.aggregate import Sum

    j = li.map_batches(ret, batch_format="pyarrow").join(
        orders.map_batches(window, batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",))
    per_cust = j.groupby("o_custkey").aggregate(
        Sum("rev", alias_name="revenue"))
    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal"])
    ck = cust.map_batches(
        lambda b: pa.table({"o_custkey": b["c_custkey"],
                            "c_name": b["c_name"],
                            "c_acctbal": b["c_acctbal"]}),
        batch_format="pyarrow")
    out = per_cust.join(ck, join_type="inner",
                        num_partitions=num_partitions,
                        on=("o_custkey",))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(b["o_custkey"], pa.int64()),
            "c_name": b["c_name"],
            "revenue": pc.round(b["revenue"], 6),
            "c_acctbal": pc.round(b["c_acctbal"], 6)})

    return out.map_batches(finish, batch_format="pyarrow") \
        .sort(["revenue", "c_custkey"], descending=[True, False]) \
        .limit(Q10_TOPK)


RETURNED_REVENUE_SQL = f"""
    WITH cr AS (
      SELECT o.o_custkey,
             sum(l.l_extendedprice * (1.0 - l.l_discount)) AS revenue
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '{Q10_START}'
        AND o.o_orderdate < TIMESTAMP '{Q10_END}'
      GROUP BY o.o_custkey)
    SELECT c.c_custkey, c.c_name, round(cr.revenue, 6) AS revenue,
           round(c.c_acctbal, 6) AS c_acctbal
    FROM cr JOIN customer c ON c.c_custkey = cr.o_custkey
    ORDER BY round(cr.revenue, 6) DESC, c.c_custkey
    LIMIT {Q10_TOPK}
"""


# ---------------------------------------------------------------------------
# TPC-H Q14-like: promo revenue share per ship-month
# ---------------------------------------------------------------------------

Q14_YEAR = 1996


def promo_share_by_month(sf_dir: str):
    """Promo-type revenue share per ship month of one year (Q14 shape:
    100 * promo_rev / total_rev).  The part dimension becomes ONE
    broadcast dense bool lookup (p_partkey -> is_promo, ray.put once);
    the fact scan is a single column-pruned map_batches emitting
    12-bucket partial sums, merged on the driver — no fact-side shuffle
    at all (sum-only aggregate, CLAUDE.md map-side-partials rule)."""
    import os

    import ray

    part = read_parquet_clean(os.path.join(sf_dir, "part.parquet"),
                              columns=["p_partkey", "p_type"]).to_pandas()
    promo_lu = np.zeros(int(part["p_partkey"].max()) + 1, bool)
    promo_lu[part.loc[part["p_type"] == "PROMO",
                      "p_partkey"].to_numpy()] = True
    lu_ref = ray.put(promo_lu)

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        yr = pc.year(b["l_shipdate"]).to_numpy(zero_copy_only=False)
        keep = yr == Q14_YEAR
        if not keep.any():
            return pa.table({"month": pa.array([], pa.int64()),
                             "promo": pa.array([], pa.float64()),
                             "total": pa.array([], pa.float64())})
        mo = pc.month(b["l_shipdate"]).to_numpy(
            zero_copy_only=False)[keep].astype(np.int64)
        rev = (b["l_extendedprice"].to_numpy(zero_copy_only=False)
               * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
               )[keep]
        lu = ray.get(lu_ref)
        is_promo = lu[b["l_partkey"].to_numpy(
            zero_copy_only=False)[keep]]
        tot = np.bincount(mo, weights=rev, minlength=13)
        pro = np.bincount(mo[is_promo], weights=rev[is_promo],
                          minlength=13)
        seen = np.flatnonzero(tot > 0)
        return pa.table({"month": pa.array(seen.astype(np.int64)),
                         "promo": pa.array(pro[seen]),
                         "total": pa.array(tot[seen])})

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:  # empty Datasets lose their schema (CLAUDE.md)
        return pd.DataFrame({
            "month": pd.Series([], dtype=np.int64),
            "promo_share": pd.Series([], dtype=np.float64),
            "revenue": pd.Series([], dtype=np.float64)})
    agg = parts.groupby("month", sort=True).agg(
        promo=("promo", "sum"), total=("total", "sum")).reset_index()
    agg["promo_share"] = np.round(
        100.0 * agg["promo"].to_numpy() / agg["total"].to_numpy(), 6)
    agg["revenue"] = np.round(agg["total"].to_numpy(), 6)
    agg["month"] = agg["month"].astype(np.int64)
    return agg[["month", "promo_share", "revenue"]]


PROMO_SHARE_SQL = f"""
    SELECT month(l_shipdate)::BIGINT AS month,
           round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1.0 - l_discount)
                 ELSE 0.0 END) /
                 sum(l_extendedprice * (1.0 - l_discount)), 6)
               AS promo_share,
           round(sum(l_extendedprice * (1.0 - l_discount)), 6)
               AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE year(l_shipdate) = {Q14_YEAR}
    GROUP BY month ORDER BY month
"""


# ---------------------------------------------------------------------------
# TPC-H Q7-like: volume shipping between a nation pair, per ship year
# ---------------------------------------------------------------------------

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"


def volume_shipping(sf_dir: str, num_partitions: int = 8):
    """Revenue flowing between two nations (supplier side vs customer
    side, both directions) per ship year — the Q7 shape.  Dimensions
    (supplier/customer -> nationkey) are ONE broadcast lookup pair (the
    nation_revenue pattern); the only fact-side exchange is the
    lineitem x orders hash join; the (supp_nation, cust_nation, year)
    aggregate domain is <= 2 * n_years, map-side partials + driver
    merge."""
    import os

    import ray

    from .runtime import tune_context
    tune_context()

    def _pdf(name, cols):
        return read_parquet_clean(
            os.path.join(sf_dir, f"{name}.parquet"),
            columns=cols).to_pandas()

    nation = _pdf("nation", ["n_nationkey", "n_name"])
    supplier = _pdf("supplier", ["s_suppkey", "s_nationkey"])
    customer = _pdf("customer", ["c_custkey", "c_nationkey"])
    keys = {n: int(k) for k, n in zip(nation["n_nationkey"],
                                      nation["n_name"])}
    ka, kb = keys[Q7_NATION_A], keys[Q7_NATION_B]
    names = {ka: Q7_NATION_A, kb: Q7_NATION_B}
    sup_lu = np.full(int(supplier["s_suppkey"].max()) + 1, -1, np.int64)
    sup_lu[supplier["s_suppkey"].to_numpy()] = \
        supplier["s_nationkey"].to_numpy()
    cust_lu = np.full(int(customer["c_custkey"].max()) + 1, -1, np.int64)
    cust_lu[customer["c_custkey"].to_numpy()] = \
        customer["c_nationkey"].to_numpy()
    lu_ref = ray.put((sup_lu, cust_lu))

    orders = read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                                columns=["o_orderkey", "o_custkey"])
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"])

    def li_pre(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"], "rev": rev,
                         "yr": pc.cast(pc.year(b["l_shipdate"]),
                                       pa.int64())})

    ord_k = orders.map_batches(
        lambda b: pa.table({"l_orderkey": b["o_orderkey"],
                            "o_custkey": b["o_custkey"]}),
        batch_format="pyarrow")
    joined = li.map_batches(li_pre, batch_format="pyarrow") \
               .join(ord_k, join_type="inner",
                     num_partitions=num_partitions, on=("l_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        sup_l, cust_l = ray.get(lu_ref)
        sn = sup_l[b["l_suppkey"].to_numpy(zero_copy_only=False)]
        cn = cust_l[b["o_custkey"].to_numpy(zero_copy_only=False)]
        keep = ((sn == ka) & (cn == kb)) | ((sn == kb) & (cn == ka))
        if not keep.any():
            return pa.table({
                "supp_nation": pa.array([], pa.string()),
                "cust_nation": pa.array([], pa.string()),
                "l_year": pa.array([], pa.int64()),
                "rev": pa.array([], pa.float64())})
        sn, cn = sn[keep], cn[keep]
        yr = b["yr"].to_numpy(zero_copy_only=False)[keep]
        rev = b["rev"].to_numpy(zero_copy_only=False)[keep]
        pdf = pd.DataFrame({
            "supp_nation": [names[int(x)] for x in sn],
            "cust_nation": [names[int(x)] for x in cn],
            "l_year": yr, "rev": rev})
        agg = pdf.groupby(["supp_nation", "cust_nation", "l_year"],
                          sort=False)["rev"].sum().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = joined.map_batches(partial,
                               batch_format="pyarrow").to_pandas()
    if len(parts) == 0:  # empty Datasets lose their schema (CLAUDE.md)
        return pd.DataFrame({
            "supp_nation": pd.Series([], dtype=object),
            "cust_nation": pd.Series([], dtype=object),
            "l_year": pd.Series([], dtype=np.int64),
            "revenue": pd.Series([], dtype=np.float64)})
    out = parts.groupby(["supp_nation", "cust_nation", "l_year"],
                        sort=True)["rev"].sum().reset_index()
    out["revenue"] = np.round(out["rev"].to_numpy(), 6)
    out["l_year"] = out["l_year"].astype(np.int64)
    return out[["supp_nation", "cust_nation", "l_year", "revenue"]] \
        .reset_index(drop=True)


VOLUME_SHIPPING_SQL = f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate)::BIGINT AS l_year,
           round(sum(l_extendedprice * (1.0 - l_discount)), 6)
               AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE (sn.n_name = '{Q7_NATION_A}' AND cn.n_name = '{Q7_NATION_B}')
       OR (sn.n_name = '{Q7_NATION_B}' AND cn.n_name = '{Q7_NATION_A}')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q8-like: target-nation market share within one region, per year
# ---------------------------------------------------------------------------

Q8_NATION = "NATION_3"
Q8_REGION = "ASIA"


def market_share(sf_dir: str, num_partitions: int = 8):
    """Share of revenue supplied by one nation among orders whose
    customer sits in one region, per order year (the Q8 shape).
    Broadcast lookups (supplier -> nation, customer -> in-region),
    one lineitem x orders hash join carrying o_orderdate, year-bounded
    map-side partials."""
    import os

    import ray

    from .runtime import tune_context
    tune_context()

    def _pdf(name, cols):
        return read_parquet_clean(
            os.path.join(sf_dir, f"{name}.parquet"),
            columns=cols).to_pandas()

    nation = _pdf("nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _pdf("region", ["r_regionkey", "r_name"])
    supplier = _pdf("supplier", ["s_suppkey", "s_nationkey"])
    customer = _pdf("customer", ["c_custkey", "c_nationkey"])
    tgt = int(nation.loc[nation["n_name"] == Q8_NATION,
                         "n_nationkey"].iloc[0])
    rkeys = set(region.loc[region["r_name"] == Q8_REGION,
                           "r_regionkey"])
    in_region = set(nation.loc[nation["n_regionkey"].isin(rkeys),
                               "n_nationkey"].astype(int))
    sup_lu = np.full(int(supplier["s_suppkey"].max()) + 1, -1, np.int64)
    sup_lu[supplier["s_suppkey"].to_numpy()] = \
        supplier["s_nationkey"].to_numpy()
    cust_ok = np.zeros(int(customer["c_custkey"].max()) + 1, bool)
    cust_ok[customer.loc[customer["c_nationkey"].isin(in_region),
                         "c_custkey"].to_numpy()] = True
    lu_ref = ray.put((sup_lu, cust_ok))

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def li_pre(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"], "rev": rev})

    ord_k = orders.map_batches(
        lambda b: pa.table({"l_orderkey": b["o_orderkey"],
                            "o_custkey": b["o_custkey"],
                            "o_year": pc.cast(pc.year(b["o_orderdate"]),
                                              pa.int64())}),
        batch_format="pyarrow")
    joined = li.map_batches(li_pre, batch_format="pyarrow") \
               .join(ord_k, join_type="inner",
                     num_partitions=num_partitions, on=("l_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        sup_l, c_ok = ray.get(lu_ref)
        keep = c_ok[b["o_custkey"].to_numpy(zero_copy_only=False)]
        if not keep.any():
            return pa.table({"o_year": pa.array([], pa.int64()),
                             "tgt": pa.array([], pa.float64()),
                             "total": pa.array([], pa.float64())})
        yr = b["o_year"].to_numpy(zero_copy_only=False)[keep]
        rev = b["rev"].to_numpy(zero_copy_only=False)[keep]
        is_tgt = sup_l[b["l_suppkey"].to_numpy(
            zero_copy_only=False)[keep]] == tgt
        uy = np.unique(yr)
        pos = np.searchsorted(uy, yr)
        tot = np.bincount(pos, weights=rev, minlength=len(uy))
        tg = np.bincount(pos[is_tgt], weights=rev[is_tgt],
                         minlength=len(uy))
        return pa.table({"o_year": pa.array(uy.astype(np.int64)),
                         "tgt": pa.array(tg), "total": pa.array(tot)})

    parts = joined.map_batches(partial,
                               batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({
            "o_year": pd.Series([], dtype=np.int64),
            "mkt_share": pd.Series([], dtype=np.float64)})
    agg = parts.groupby("o_year", sort=True).agg(
        tgt=("tgt", "sum"), total=("total", "sum")).reset_index()
    agg["mkt_share"] = np.round(
        agg["tgt"].to_numpy() / agg["total"].to_numpy(), 6)
    agg["o_year"] = agg["o_year"].astype(np.int64)
    return agg[["o_year", "mkt_share"]]


MARKET_SHARE_SQL = f"""
    SELECT year(o_orderdate)::BIGINT AS o_year,
           round(sum(CASE WHEN sn.n_name = '{Q8_NATION}'
                 THEN l_extendedprice * (1.0 - l_discount)
                 ELSE 0.0 END) /
                 sum(l_extendedprice * (1.0 - l_discount)), 6)
               AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region    ON r_regionkey = cn.n_regionkey
    WHERE r_name = '{Q8_REGION}'
    GROUP BY o_year ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q19-like: discounted revenue under OR-of-ANDs predicates
# ---------------------------------------------------------------------------

Q19_BRANDS = ("Brand#1", "Brand#2", "Brand#3")
Q19_QTY = (5, 15, 25)     # per-branch minimum quantity
Q19_SPAN = 10


def discounted_revenue(sf_dir: str):
    """Q19 shape: one fact scan under an OR of (brand, quantity-range)
    branches.  The part dimension broadcasts as a dense brand-code
    lookup (ray.put once); the predicate evaluates vectorized per
    batch; the result is ONE global sum from map-side partials — no
    shuffle at all."""
    import os

    import ray

    part = read_parquet_clean(os.path.join(sf_dir, "part.parquet"),
                              columns=["p_partkey", "p_brand"]).to_pandas()
    code = np.full(int(part["p_partkey"].max()) + 1, -1, np.int64)
    for j, b in enumerate(Q19_BRANDS):
        code[part.loc[part["p_brand"] == b, "p_partkey"]
             .to_numpy()] = j
    cref = ray.put(code)

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        br = c[b["l_partkey"].to_numpy(zero_copy_only=False)]
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(br), bool)
        for j, q0 in enumerate(Q19_QTY):
            keep |= (br == j) & (qty >= q0) & (qty <= q0 + Q19_SPAN)
        rev = (b["l_extendedprice"].to_numpy(zero_copy_only=False)
               * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
               )[keep]
        return pa.table({"rev": pa.array([float(rev.sum())]),
                         "n": pa.array([int(keep.sum())], pa.int64())})

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "revenue": [round(float(parts["rev"].sum()), 6)],
        "n_items": np.array([int(parts["n"].sum())], np.int64)})


DISCOUNTED_REVENUE_SQL = f"""
    SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 6)
               AS revenue,
           count(*)::BIGINT AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE {" OR ".join(
        f"(p_brand = '{b}' AND l_quantity >= {q} "
        f"AND l_quantity <= {q + Q19_SPAN})"
        for b, q in zip(Q19_BRANDS, Q19_QTY))}
"""


# ---------------------------------------------------------------------------
# TPC-H Q13-like: customer order-count distribution (LEFT-join shape)
# ---------------------------------------------------------------------------

def order_count_distribution(sf_dir: str):
    """Q13 shape: customer LEFT JOIN orders -> orders per customer
    (zero preserved) -> distribution of those counts.

    100-TB plan: per-customer counting is a FINE-key aggregate (custkey
    domain ~ rows/10), so it shuffles on ~rows/200k coarse hash buckets
    (algos/triangles.TARGET_ROWS_PER_BUCKET rule — Ray 2.49's per-key
    hash aggregate measured 25x slower) and a vectorized np.unique
    kernel runs per bucket.  Each bucket emits only its LOCAL
    (c_count, n_customers) HISTOGRAM — bounded by max orders/customer,
    tens of rows — so the merge is a tiny driver reduce.  The LEFT
    zero-bin never materializes the customer table: it is
    n_customers - n_customers_with_orders (parquet-metadata count minus
    a sum the histograms already carry)."""
    import os

    from .algos.triangles import n_buckets_for
    from .runtime import tune_context

    tune_context()
    ords = read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                              columns=["o_custkey"])
    nb = n_buckets_for(ords.count())

    def salt(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(31)
        return pa.table({"k": b["o_custkey"],
                         "kb": (h % np.uint64(nb)).astype(np.int64)})

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        _, per_cust = np.unique(g["k"].to_numpy(), return_counts=True)
        c, n = np.unique(per_cust, return_counts=True)
        return pd.DataFrame({"c_count": c.astype(np.int64),
                             "n": n.astype(np.int64)})

    parts = (ords.map_batches(salt, batch_format="pyarrow")
             .groupby("kb").map_groups(bucket_hist, batch_format="pandas")
             .to_pandas())
    n_cust = read_parquet_clean(os.path.join(sf_dir, "customer.parquet"),
                                columns=["c_custkey"]).count()
    hist = parts.groupby("c_count", as_index=False)["n"].sum()
    zero = int(n_cust) - int(hist["n"].sum())
    if zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "n": [zero]})],
            ignore_index=True)
    hist = hist.rename(columns={"n": "custdist"})
    return (hist[["c_count", "custdist"]].astype(np.int64)
            .sort_values(["custdist", "c_count"], ascending=[False, False])
            .reset_index(drop=True))


ORDER_COUNT_DIST_SQL = """
    SELECT c_count, count(*)::BIGINT AS custdist
    FROM (SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# TPC-H Q15-like: top revenue supplier over a shipdate window
# ---------------------------------------------------------------------------

Q15_START = "1996-01-01"
Q15_END = "1996-04-01"     # exclusive, 3 months


def top_supplier(sf_dir: str):
    """Q15 shape: revenue per supplier inside a shipdate window, then
    the supplier(s) achieving the max.

    100-TB plan: the supplier dimension is BOUNDED (like nation), so
    per-supplier revenue is a dense np.bincount partial per batch —
    map-side combine to a vector of len(suppliers), merged on the
    driver; no shuffle at all.  Revenue in EXACT integer price-units
    (cents x (100 - discount_pct)) so the max-equality filter cannot
    be perturbed by float summation order; floats only at the end."""
    import os

    import ray

    supp = read_parquet_clean(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"]).to_pandas()
    n_supp = int(supp["s_suppkey"].max()) + 1

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])
    t0, t1 = _ts(Q15_START), _ts(Q15_END)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(t0)),
            pc.less(b["l_shipdate"], pa.scalar(t1))))
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        p = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = b["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        dpct = np.floor(d * 100 + 0.5).astype(np.int64)
        units = cents * (100 - dpct)
        acc = np.bincount(sk, weights=units.astype(np.float64),
                          minlength=n_supp)
        # bincount returns float64; revenue-units stay < 2^53 per
        # BATCH (≈4e7 rows x 1e9 units needs per-batch rows < 9e6 —
        # Ray's default block split keeps batches far below that)
        return pa.table({"sk": np.arange(n_supp, dtype=np.int64),
                         "units": acc.astype(np.int64)})

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    units = parts.groupby("sk")["units"].sum()
    best = units[units == units.max()]
    out = supp[supp["s_suppkey"].isin(best.index)].copy()
    out["total_revenue"] = [
        round(int(best[k]) / 10000.0, 6) for k in out["s_suppkey"]]
    return out[["s_suppkey", "s_name", "total_revenue"]].reset_index(
        drop=True).sort_values("s_suppkey").reset_index(drop=True)


TOP_SUPPLIER_SQL = f"""
    WITH rev AS (
      SELECT l_suppkey AS s_suppkey,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                 AS units
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
        AND l_shipdate < TIMESTAMP '{Q15_END}'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           round(units / 10000.0, 6) AS total_revenue
    FROM rev JOIN supplier s USING (s_suppkey)
    WHERE units = (SELECT max(units) FROM rev)
    ORDER BY s.s_suppkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q17-like: small-quantity-order revenue (per-part avg join-back)
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#1"
Q17_MAX_SIZE = 15


def small_quantity_revenue(sf_dir: str):
    """Q17 shape: for parts of one brand/size class, sum the revenue of
    lineitems whose quantity is below 20% of that part's average
    quantity (avg over ALL its lineitems), divided by 7.

    100-TB plan: two fact scans, no shuffle.  Pass 1 accumulates
    per-selected-part (sum_qty, n) via dense bincount partials (the
    brand/size-filtered part subset is the SMALL side, broadcast as a
    partkey->slot code array via ray.put).  Pass 2 re-streams lineitem
    and keeps rows with qty * 5 * n < sum_qty — the avg comparison
    done in EXACT integers (quantities are integral), so both sides
    agree bit-for-bit.  Revenue summed in exact cents."""
    import os

    import ray

    part = read_parquet_clean(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    sel = part.loc[(part["p_brand"] == Q17_BRAND)
                   & (part["p_size"] <= Q17_MAX_SIZE), "p_partkey"]
    sel = np.sort(sel.to_numpy(np.int64))
    code = np.full(int(part["p_partkey"].max()) + 2, -1, np.int64)
    code[sel] = np.arange(len(sel))
    cref = ray.put(code)

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]

    def pass1(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        slot = c[np.minimum(b["l_partkey"].to_numpy(zero_copy_only=False),
                            len(c) - 1)]
        hit = slot >= 0
        q = b["l_quantity"].to_numpy(zero_copy_only=False)[hit]
        s = slot[hit]
        sq = np.bincount(s, weights=q, minlength=len(sel))
        n = np.bincount(s, minlength=len(sel))
        return pa.table({"slot": np.arange(len(sel), dtype=np.int64),
                         "sq": sq.astype(np.int64),
                         "n": n.astype(np.int64)})

    li = read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=li_cols)
    agg = li.map_batches(pass1, batch_format="pyarrow").to_pandas()
    agg = agg.groupby("slot")[["sq", "n"]].sum()
    sq = agg["sq"].reindex(range(len(sel)), fill_value=0).to_numpy()
    n = agg["n"].reindex(range(len(sel)), fill_value=0).to_numpy()
    sqr, nr = ray.put(sq), ray.put(n)

    def pass2(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        slot = c[np.minimum(b["l_partkey"].to_numpy(zero_copy_only=False),
                            len(c) - 1)]
        hit = slot >= 0
        s = slot[hit]
        q = b["l_quantity"].to_numpy(
            zero_copy_only=False)[hit].astype(np.int64)
        p = b["l_extendedprice"].to_numpy(zero_copy_only=False)[hit]
        keep = q * 5 * ray.get(nr)[s] < ray.get(sqr)[s]
        cents = np.floor(p[keep] * 100 + 0.5).astype(np.int64)
        return pa.table({"cents": pa.array([int(cents.sum())]),
                         "cnt": pa.array([int(keep.sum())], pa.int64())})

    li2 = read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=li_cols)
    parts = li2.map_batches(pass2, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "avg_yearly": [round(int(parts["cents"].sum()) / 100.0 / 7.0, 6)],
        "n_items": np.array([int(parts["cnt"].sum())], np.int64)})


SMALL_QTY_REVENUE_SQL = f"""
    WITH sel AS (SELECT p_partkey FROM part
                 WHERE p_brand = '{Q17_BRAND}'
                   AND p_size <= {Q17_MAX_SIZE}),
    ag AS (SELECT l_partkey,
                  sum(CAST(l_quantity AS BIGINT)) AS sq,
                  count(*)::BIGINT AS n
           FROM lineitem JOIN sel ON p_partkey = l_partkey
           GROUP BY l_partkey)
    SELECT round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 / 100.0 / 7.0, 6) AS avg_yearly,
           count(*)::BIGINT AS n_items
    FROM lineitem JOIN ag ON ag.l_partkey = lineitem.l_partkey
    WHERE CAST(l_quantity AS BIGINT) * 5 * n < sq
"""


# ---------------------------------------------------------------------------
# TPC-H Q11-like: part value concentration (share-of-total HAVING)
# ---------------------------------------------------------------------------

PART_SHARE_DEN = 5000   # keep parts whose value exceeds total/5000


def part_value_concentration(sf_dir: str):
    """Q11 shape (sans partsupp): per-part inventory value
    sum(price_cents * quantity) with a scalar-subquery threshold —
    keep parts above 1/PART_SHARE_DEN of the grand total.

    100-TB plan: the per-part aggregate is a fine-key reduce, so it
    shuffles on coarse hash buckets with an in-bucket bincount-style
    kernel; the grand total folds from the per-part Dataset via
    map-side partials into one exact Python int; the threshold filter
    streams with the broadcast total.  All comparisons in exact
    integers (units * DEN vs total; int64-safe while a part's value
    stays under 2^63/DEN ~ 1.8e15 units — far above any real part)."""
    import os

    import ray

    from .algos.triangles import n_buckets_for
    from .runtime import tune_context

    tune_context()
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"])
    nb = n_buckets_for(li.count())

    def pre(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        cents = np.floor(b["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        qty = b["l_quantity"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            h = pk.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(31)
        return pa.table({"pk": pa.array(pk),
                         "units": pa.array(cents * qty),
                         "kb": pa.array((h % np.uint64(nb))
                                        .astype(np.int64))})

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        pk = g["pk"].to_numpy(np.int64)
        un = g["units"].to_numpy(np.int64)
        order = np.argsort(pk, kind="mergesort")
        pk, un = pk[order], un[order]
        starts = np.flatnonzero(np.concatenate([[True],
                                                pk[1:] != pk[:-1]]))
        sums = np.add.reduceat(un, starts)
        return pd.DataFrame({"pk": pk[starts], "units": sums})

    per_part = (li.map_batches(pre, batch_format="pyarrow")
                .groupby("kb").map_groups(agg, batch_format="pandas")
                .materialize())
    total = int(per_part.map_batches(
        lambda b: pa.table({"t": pa.array(
            [int(b["units"].to_numpy(zero_copy_only=False).sum())],
            pa.int64())}), batch_format="pyarrow").to_pandas()["t"].sum())
    tref = ray.put(total)

    def keep(b: pa.Table) -> pa.Table:
        un = b["units"].to_numpy(zero_copy_only=False)
        mask = un * PART_SHARE_DEN > ray.get(tref)
        t = b.filter(mask)
        return pa.table({
            "p_partkey": t["pk"],
            "value": pc.round(pc.divide(pc.cast(t["units"],
                                                pa.float64()), 100.0),
                              ndigits=6)})

    return per_part.map_batches(keep, batch_format="pyarrow")


PART_CONCENTRATION_SQL = f"""
    WITH v AS (SELECT l_partkey,
                      sum(CAST(floor(l_extendedprice * 100 + 0.5)
                               AS HUGEINT)
                          * CAST(l_quantity AS HUGEINT)) AS units
               FROM lineitem GROUP BY l_partkey),
    t AS (SELECT sum(units) AS total FROM v)
    SELECT l_partkey AS p_partkey,
           round(units / 100.0, 6) AS value
    FROM v, t WHERE units * {PART_SHARE_DEN} > total
"""


# --------------------------------------------------- Q21-like waiting list

WAITING_TOP_K = 10


def waiting_suppliers(sf_dir: str):
    """Q21 shape: suppliers who were the SOLE last shipper of a
    multi-supplier finished order — the correlated EXISTS (another
    supplier participated) + NOT EXISTS (nobody else shipped at the
    order's final date) pair, reformulated as per-order aggregates:
    nsupp >= 2 AND exactly one distinct supplier at max(l_shipdate).
    (The testdata has no commit/receipt dates, so "kept waiting" =
    shipped last; the join structure is Q21's.)

    100-TB plan: semi-filter lineitem on finished orders (joins.
    semi_join — gated broadcast / bucket-shuffle), ONE coarse-bucket
    shuffle keyed l_orderkey with a vectorized per-order kernel, then
    per-supplier partial counts merged on a second coarse key (numwait
    rows are bounded by |supplier|).  Timestamps compared as int64 us.
    """
    import os

    from .algos.triangles import n_buckets_for
    from .joins import semi_join
    from .runtime import tune_context

    tune_context()
    ords = read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                              columns=["o_orderkey", "o_orderstatus"])
    fkeys = ords.map_batches(
        lambda b: pa.table({"l_orderkey": b.filter(
            pc.equal(b["o_orderstatus"], "F"))["o_orderkey"]}),
        batch_format="pyarrow")
    li = read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=["l_orderkey", "l_suppkey",
                                     "l_shipdate"])
    li = semi_join(li, fkeys, key="l_orderkey").materialize()
    nb = n_buckets_for(li.count())

    def tag(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "ok": pa.array(ok),
            "sk": pa.array(b["l_suppkey"].to_numpy(zero_copy_only=False)
                           .astype(np.int64)),
            "dt": b["l_shipdate"].cast(pa.int64()),
            "ob": pa.array((ok % nb).astype(np.int64))})

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        ok = g["ok"].to_numpy(np.int64)
        sk = g["sk"].to_numpy(np.int64)
        dt = g["dt"].to_numpy(np.int64)
        o = np.lexsort((sk, ok))
        ok, sk, dt = ok[o], sk[o], dt[o]
        new_o = np.ones(len(ok), dtype=bool)
        new_o[1:] = ok[1:] != ok[:-1]
        oid = np.cumsum(new_o) - 1              # dense order index
        n_orders = oid[-1] + 1 if len(ok) else 0
        mx = np.full(n_orders, np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, oid, dt)
        new_s = new_o | (np.concatenate([[True], sk[1:] != sk[:-1]]))
        nsupp = np.bincount(oid[new_s], minlength=n_orders)
        at_max = dt == mx[oid]
        # a supplier may hit the max on a non-first row: distinct again
        lo, ls = ok[at_max], sk[at_max]
        o2 = np.lexsort((ls, lo))
        lo, ls = lo[o2], ls[o2]
        d = np.ones(len(lo), dtype=bool)
        d[1:] = (lo[1:] != lo[:-1]) | (ls[1:] != ls[:-1])
        lo, ls = lo[d], ls[d]
        oid2 = np.searchsorted(ok[new_o], lo)
        nlast = np.bincount(oid2, minlength=n_orders)
        blamed_rows = (nlast[oid2] == 1) & (nsupp[oid2] >= 2)
        bl = ls[blamed_rows]
        u, c = np.unique(bl, return_counts=True)
        return pd.DataFrame({"sk": u, "cnt": c.astype(np.int64)})

    parts = (li.map_batches(tag, batch_format="pyarrow")
             .groupby("ob").map_groups(per_order, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pd.DataFrame({"s_name": pd.Series([], dtype=object),
                             "numwait": pd.Series([], dtype="int64")})
    counts = parts.groupby("sk", as_index=False)["cnt"].sum()
    sup = read_parquet_clean(os.path.join(sf_dir, "supplier.parquet"),
                             columns=["s_suppkey", "s_name"]).to_pandas()
    out = counts.merge(sup, left_on="sk", right_on="s_suppkey")
    out = out.rename(columns={"cnt": "numwait"})[["s_name", "numwait"]]
    return (out.sort_values(["numwait", "s_name"],
                            ascending=[False, True], kind="mergesort")
            .head(WAITING_TOP_K).reset_index(drop=True))


WAITING_SUPPLIERS_SQL = f"""
    WITH li AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                     WHERE o_orderstatus = 'F')),
    st AS (SELECT l_orderkey, max(l_shipdate) AS mx,
                  count(DISTINCT l_suppkey) AS nsupp
           FROM li GROUP BY 1),
    lastsup AS (SELECT DISTINCT li.l_orderkey, li.l_suppkey
                FROM li JOIN st ON st.l_orderkey = li.l_orderkey
                WHERE li.l_shipdate = st.mx AND st.nsupp >= 2),
    sole AS (SELECT l_orderkey, min(l_suppkey) AS sk
             FROM lastsup GROUP BY 1 HAVING count(*) = 1)
    SELECT s.s_name, count(*)::BIGINT AS numwait
    FROM sole JOIN supplier s ON s.s_suppkey = sole.sk
    GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT {WAITING_TOP_K}
"""


GLOBAL_SALES_NATIONS = (1, 3, 7, 11, 13, 17, 21)


def global_sales_opportunity(sf_dir: str):
    """Q22 shape: customers in a fixed nation set whose account balance
    beats the average POSITIVE balance of that set and who placed no
    orders, grouped by nation.  (The testdata customer table has no
    phone column, so the Q22 country-code prefix becomes the nationkey
    set; and since every testdata customer has orders, "no orders"
    becomes "no URGENT order" — the subquery-threshold + NOT EXISTS
    structure is Q22's.)

    100-TB plan: customers pruned at the read to 3 columns and
    filtered map-side; the positive-balance average is ONE exact
    integer-cents (sum, count) partial pass — the threshold compare is
    the integer cross-multiply cents*n > tot, so no float ulp can flip
    a boundary row; the no-urgent-order test is the gated anti-join
    over the filtered small projection of orders; the nation grouping is
    map-side partials over a catalog-bounded domain.
    """
    import os

    from .joins import anti_join
    from .runtime import tune_context

    tune_context()
    nset = np.array(GLOBAL_SALES_NATIONS, np.int64)
    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def pre(b: pa.Table) -> pa.Table:
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = np.isin(nk, nset)
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)[m]
        return pa.table({
            "c_custkey": pa.array(
                b["c_custkey"].to_numpy(zero_copy_only=False)
                .astype(np.int64)[m]),
            "c_nationkey": pa.array(nk[m]),
            "cents": pa.array(np.floor(bal * 100 + 0.5)
                              .astype(np.int64))})

    sel = cust.map_batches(pre, batch_format="pyarrow").materialize()

    def stat_part(b: pa.Table) -> pa.Table:
        c = b["cents"].to_numpy(zero_copy_only=False)
        p = c[c > 0]
        return pa.table({"tot": pa.array([int(p.sum())], pa.int64()),
                         "n": pa.array([len(p)], pa.int64())})

    st = sel.map_batches(stat_part, batch_format="pyarrow").to_pandas()
    tot, n = int(st["tot"].sum()), int(st["n"].sum())

    def above(b: pa.Table) -> pa.Table:
        c = b["cents"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(c * n > tot))

    rich = sel.map_batches(above, batch_format="pyarrow")
    okeys = read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                               columns=["o_custkey", "o_orderpriority"])
    okeys = okeys.map_batches(
        lambda b: pa.table({"c_custkey": b.filter(pc.equal(
            b["o_orderpriority"], "1-URGENT"))["o_custkey"]}),
        batch_format="pyarrow")
    noord = anti_join(rich, okeys, key="c_custkey")

    def grp_part(b: pa.Table) -> pa.Table:
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False)
        c = b["cents"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(nk, return_inverse=True)
        return pa.table({
            "nk": pa.array(u.astype(np.int64)),
            "cnt": pa.array(np.bincount(inv).astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=c)
                          .astype(np.int64))})

    parts = noord.map_batches(grp_part, batch_format="pyarrow") \
        .to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"c_nationkey": pd.Series([], dtype="int64"),
                             "numcust": pd.Series([], dtype="int64"),
                             "totacctbal": pd.Series([], dtype="float64")})
    g = parts.groupby("nk", sort=True, as_index=False).sum()
    return pd.DataFrame({"c_nationkey": g["nk"].astype("int64"),
                         "numcust": g["cnt"].astype("int64"),
                         "totacctbal": (g["s"] / 100.0).round(2)})


GLOBAL_SALES_SQL = f"""
    WITH sel AS (SELECT c_custkey, c_nationkey,
                        CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                            AS cents
                 FROM customer
                 WHERE c_nationkey IN {GLOBAL_SALES_NATIONS}),
    st AS (SELECT sum(cents) AS tot, count(*) AS n
           FROM sel WHERE cents > 0),
    q AS (SELECT sel.* FROM sel, st
          WHERE sel.cents * st.n > st.tot
            AND NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = sel.c_custkey
                              AND o.o_orderpriority = '1-URGENT'))
    SELECT c_nationkey, count(*)::BIGINT AS numcust,
           round(sum(cents) / 100.0, 2) AS totacctbal
    FROM q GROUP BY c_nationkey ORDER BY c_nationkey
"""


MIN_COST_SIZES = (3, 7, 11, 23)
MIN_COST_TOP_K = 20


def min_cost_supplier(sf_dir: str):
    """Q2 shape: for each part in a size class, the supplier(s) offering
    the MINIMUM cost (min lineitem extendedprice for that part), output
    sorted by supplier account balance like Q2.  (The testdata has no
    partsupp table, so supply cost = min observed lineitem price; the
    groupwise-argmin + join-back structure is Q2's.)

    100-TB plan: lineitem pruned to 3 columns, semi-filtered on the
    catalog-bounded part-size key set (gated semi_join); costs as exact
    integer cents; ONE coarse-bucket shuffle keyed l_partkey with a
    vectorized per-part argmin kernel (each part lives in exactly one
    bucket, so in-bucket minima are global); the argmin rows are
    catalog-bounded (<= distinct parts), so the supplier/nation joins
    and final sort run on the driver."""
    import os

    from .algos.triangles import n_buckets_for
    from .joins import semi_join
    from .runtime import tune_context

    tune_context()
    part = read_parquet_clean(os.path.join(sf_dir, "part.parquet"),
                              columns=["p_partkey", "p_size"])
    sizes = np.array(MIN_COST_SIZES, np.int64)

    def pf(b: pa.Table) -> pa.Table:
        ps = b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"l_partkey": b["p_partkey"].take(
            pa.array(np.flatnonzero(np.isin(ps, sizes))))})

    pkeys = part.map_batches(pf, batch_format="pyarrow")
    li = read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=["l_partkey", "l_suppkey",
                                     "l_extendedprice"])
    li = semi_join(li, pkeys, key="l_partkey").materialize()
    nb = n_buckets_for(li.count())

    def tag(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "pk": pa.array(pk),
            "sk": pa.array(b["l_suppkey"].to_numpy(zero_copy_only=False)
                           .astype(np.int64)),
            "cents": pa.array(np.floor(price * 100 + 0.5)
                              .astype(np.int64)),
            "pb": pa.array((pk % nb).astype(np.int64))})

    def argmin_rows(g: pd.DataFrame) -> pd.DataFrame:
        pk = g["pk"].to_numpy(np.int64)
        sk = g["sk"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        o = np.lexsort((sk, c, pk))
        pk, sk, c = pk[o], sk[o], c[o]
        new_p = np.ones(len(pk), bool)
        new_p[1:] = pk[1:] != pk[:-1]
        mc = c[new_p][np.cumsum(new_p) - 1]     # per-row part minimum
        m = c == mc
        pk, sk, c = pk[m], sk[m], c[m]
        d = np.ones(len(pk), bool)              # distinct (part, supp)
        d[1:] = (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])
        return pd.DataFrame({"pk": pk[d], "sk": sk[d], "cents": c[d]})

    am = (li.map_batches(tag, batch_format="pyarrow")
          .groupby("pb").map_groups(argmin_rows, batch_format="pandas")
          .to_pandas())
    sup = read_parquet_clean(os.path.join(sf_dir, "supplier.parquet"),
                             columns=["s_suppkey", "s_name",
                                      "s_nationkey", "s_acctbal"]) \
        .to_pandas()
    nat = read_parquet_clean(os.path.join(sf_dir, "nation.parquet"),
                             columns=["n_nationkey", "n_name"]) \
        .to_pandas()
    if len(am) == 0:
        return pd.DataFrame({"s_acctbal": pd.Series([], dtype="float64"),
                             "s_name": pd.Series([], dtype=object),
                             "n_name": pd.Series([], dtype=object),
                             "p_partkey": pd.Series([], dtype="int64"),
                             "min_cost": pd.Series([], dtype="float64")})
    out = am.merge(sup, left_on="sk", right_on="s_suppkey") \
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    out["s_acctbal"] = out["s_acctbal"].round(2)
    out["min_cost"] = (out["cents"] / 100.0).round(2)
    out = out.rename(columns={"pk": "p_partkey"})
    out = out[["s_acctbal", "s_name", "n_name", "p_partkey", "min_cost"]]
    return (out.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True], kind="mergesort")
        .head(MIN_COST_TOP_K).reset_index(drop=True))


MIN_COST_SQL = f"""
    WITH pf AS (SELECT p_partkey FROM part
                WHERE p_size IN {MIN_COST_SIZES}),
    c AS (SELECT l_partkey, l_suppkey,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                     AS cents
          FROM lineitem JOIN pf ON pf.p_partkey = l_partkey),
    mn AS (SELECT l_partkey, min(cents) AS mc FROM c GROUP BY 1),
    am AS (SELECT DISTINCT c.l_partkey, c.l_suppkey, c.cents
           FROM c JOIN mn ON mn.l_partkey = c.l_partkey
                         AND mn.mc = c.cents)
    SELECT round(s.s_acctbal, 2) AS s_acctbal, s.s_name, n.n_name,
           am.l_partkey AS p_partkey,
           round(am.cents / 100.0, 2) AS min_cost
    FROM am JOIN supplier s ON s.s_suppkey = am.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT {MIN_COST_TOP_K}
"""


# ---------------------------------------------------------------------------
# TPC-H Q20-like: correlated-threshold semi-join — suppliers that
# DOMINATE a part (their shipped quantity exceeds DOMINANT_MULT x the
# part's mean per-supplier quantity), counted per supplier.
# ---------------------------------------------------------------------------

DOMINANT_MULT = 3


def dominant_suppliers(sf_dir: str):
    """Q20 shape (nested aggregate as a correlated threshold + semi-join
    into the supplier dimension, adapted to the available columns —
    there is no partsupp table): for each (part, supplier), the shipped
    quantity q must beat DOMINANT_MULT times the part's mean
    per-supplier quantity — q * n_suppliers > MULT * total — and the
    report is (s_name, n_dominated) per qualifying supplier.

    Scale shape: in-batch (part, supp, q) combiner partials, ONE coarse
    part-bucket groupby (a part's rows all land in one bucket, so the
    per-part total/supplier-count and the threshold test are exact
    in-kernel), per-bucket per-supplier dominated counts, then a
    driver fold over the bounded supplier dimension.  Quantities are
    exact int64 — the comparison is float-proof."""
    import os

    from .algos.triangles import n_buckets_for

    li = read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=["l_partkey", "l_suppkey",
                                     "l_quantity"]).materialize()
    nb = n_buckets_for(li.count())

    def partial(b: pa.Table) -> pa.Table:
        f = pd.DataFrame({
            "p": b["l_partkey"].to_numpy(zero_copy_only=False)
                .astype(np.int64),
            "s": b["l_suppkey"].to_numpy(zero_copy_only=False)
                .astype(np.int64),
            "q": b["l_quantity"].to_numpy(zero_copy_only=False)
                .astype(np.int64)}) \
            .groupby(["p", "s"], sort=False)["q"].sum().reset_index()
        return pa.table({"p": pa.array(f["p"].to_numpy(np.int64)),
                         "s": pa.array(f["s"].to_numpy(np.int64)),
                         "q": pa.array(f["q"].to_numpy(np.int64)),
                         "pb": pa.array(f["p"].to_numpy(np.int64) % nb)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        ps = g.groupby(["p", "s"], sort=False)["q"].sum().reset_index()
        tot = ps.groupby("p", sort=False)["q"] \
                .agg(["sum", "size"]).rename(
                    columns={"sum": "tq", "size": "ns"})
        m = ps.merge(tot, left_on="p", right_index=True)
        dom = m[m["q"] * m["ns"] > DOMINANT_MULT * m["tq"]]
        out = dom.groupby("s", sort=False).size().rename("nd") \
                 .reset_index()
        return out.astype(np.int64)

    parts = li.map_batches(partial, batch_format="pyarrow") \
              .groupby("pb").map_groups(kern, batch_format="pandas") \
              .to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"s_name": pd.Series([], dtype="object"),
                             "n_dominated": pd.Series([],
                                                      dtype="int64")})
    agg = parts.groupby("s", sort=True)["nd"].sum().reset_index()
    supp = read_parquet_clean(os.path.join(sf_dir, "supplier.parquet"),
                              columns=["s_suppkey", "s_name"]) \
        .to_pandas()  # bounded dimension: broadcast side
    out = agg.merge(supp, left_on="s", right_on="s_suppkey")
    out["n_dominated"] = out["nd"].astype(np.int64)
    return out[["s_name", "n_dominated"]] \
        .sort_values("s_name", kind="mergesort").reset_index(drop=True)


DOMINANT_SUPPLIERS_SQL = f"""
    WITH pq AS (SELECT l_partkey, l_suppkey,
                       sum(l_quantity)::BIGINT AS q
                FROM lineitem GROUP BY 1, 2),
    tot AS (SELECT l_partkey, sum(q) AS tq, count(*) AS ns
            FROM pq GROUP BY 1),
    dom AS (SELECT pq.l_suppkey, count(*)::BIGINT AS n_dominated
            FROM pq JOIN tot USING (l_partkey)
            WHERE pq.q * tot.ns > {DOMINANT_MULT} * tot.tq
            GROUP BY 1)
    SELECT s.s_name, dom.n_dominated
    FROM dom JOIN supplier s ON s.s_suppkey = dom.l_suppkey
    ORDER BY s.s_name
"""


# ---------------------------------------------------------------------------
# TPC-H Q9-like: profit per supplier nation and order year
# ---------------------------------------------------------------------------

Q9_NAME_TOKEN = "widget"


def nation_profit(sf_dir: str, num_partitions: int = 8):
    """Q9 shape (this star schema has no partsupp table, so profit =
    discounted revenue — the supplycost term is dropped, documented):
    per (supplier nation, order year) profit of lineitems whose part
    name contains Q9_NAME_TOKEN.

    100-TB plan: part is the dimension side -> selected-partkey boolean
    broadcast; supplier -> nationkey and the bounded nation-name map
    broadcast the same way; lineitem is pruned by the part filter
    BEFORE the only fact exchange (the lineitem x orders hash join);
    the (nation, year) aggregate domain is bounded -> exact-cents
    map-side partials + driver merge (reference answers whole-graph
    aggregates with the same partial/combine shape,
    core/graph.hpp:1406)."""
    import os

    import ray

    from .runtime import tune_context
    tune_context()

    part = read_parquet_clean(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name"]).to_pandas()
    sel = part.loc[part["p_name"].str.contains(Q9_NAME_TOKEN,
                                               regex=False),
                   "p_partkey"].to_numpy(np.int64)
    keep_lu = np.zeros(int(part["p_partkey"].max()) + 2, bool)
    keep_lu[sel] = True

    nation = read_parquet_clean(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"]).to_pandas()
    names = {int(k): n for k, n in zip(nation["n_nationkey"],
                                       nation["n_name"])}
    supplier = read_parquet_clean(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup_lu = np.full(int(supplier["s_suppkey"].max()) + 1, -1, np.int64)
    sup_lu[supplier["s_suppkey"].to_numpy()] = \
        supplier["s_nationkey"].to_numpy()
    lu_ref = ray.put((keep_lu, sup_lu))

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])

    def li_pre(b: pa.Table) -> pa.Table:
        keep_l, _ = ray.get(lu_ref)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        hit = keep_l[np.minimum(pk, len(keep_l) - 1)]
        p = b["l_extendedprice"].to_numpy(zero_copy_only=False)[hit]
        d = b["l_discount"].to_numpy(zero_copy_only=False)[hit]
        cents = np.floor(p * (1.0 - d) * 100 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": pa.array(
                b["l_orderkey"].to_numpy(zero_copy_only=False)[hit]),
            "l_suppkey": pa.array(
                b["l_suppkey"].to_numpy(zero_copy_only=False)[hit]),
            "cents": pa.array(cents)})

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"])
    ord_k = orders.map_batches(
        lambda b: pa.table({
            "l_orderkey": b["o_orderkey"],
            "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64())}),
        batch_format="pyarrow")
    joined = li.map_batches(li_pre, batch_format="pyarrow") \
               .join(ord_k, join_type="inner",
                     num_partitions=num_partitions, on=("l_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        _, sup_l = ray.get(lu_ref)
        nat = sup_l[b["l_suppkey"].to_numpy(zero_copy_only=False)]
        df = pd.DataFrame({
            "nat": nat,
            "o_year": b["o_year"].to_numpy(zero_copy_only=False),
            "cents": b["cents"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["nat", "o_year"], sort=False)["cents"].sum() \
              .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = joined.map_batches(partial,
                               batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({
            "nation": pd.Series([], dtype=object),
            "o_year": pd.Series([], dtype=np.int64),
            "profit": pd.Series([], dtype=np.float64)})
    out = parts.groupby(["nat", "o_year"], sort=True)["cents"].sum() \
               .reset_index()
    out["nation"] = [names[int(x)] for x in out["nat"]]
    out["profit"] = np.round(
        out["cents"].to_numpy(np.int64) / 100.0, 6)
    out["o_year"] = out["o_year"].astype(np.int64)
    return out[["nation", "o_year", "profit"]] \
        .sort_values(["nation", "o_year"], kind="mergesort") \
        .reset_index(drop=True)


NATION_PROFIT_SQL = f"""
    SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
           round(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                * 100 + 0.5) AS BIGINT)) / 100.0, 6)
               AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN part     ON p_partkey = l_partkey
    WHERE p_name LIKE '%{Q9_NAME_TOKEN}%'
    GROUP BY 1, 2
    ORDER BY nation, o_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q16-like: distinct suppliers per (brand, type, size) class
# ---------------------------------------------------------------------------

Q16_EXCL_BRAND = "Brand#13"
Q16_SIZES = (3, 9, 14, 19, 23, 36, 45, 49)
Q16_PAIR_BUCKET_ROWS = 200_000


def supplier_part_counts(sf_dir: str):
    """Q16 shape (lineitem stands in for partsupp): count DISTINCT
    suppliers per (p_brand, p_type, p_size) over parts not of the
    excluded brand with size in the Q16_SIZES set.

    100-TB plan: the filtered part catalog is the dimension side — a
    partkey -> dense-group-id code array broadcast once; the fact scan
    emits per-batch pre-deduped (gid, suppkey) pairs; global distinct
    happens in ONE coarse hash-bucket groupby (never a per-pair key
    groupby — CLAUDE.md's 25x rule) with a vectorized in-bucket
    drop_duplicates + bincount kernel; the per-gid counts fold on the
    driver over the bounded group domain."""
    import os

    import ray

    from .runtime import tune_context
    tune_context()

    part = read_parquet_clean(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"]) \
        .to_pandas()
    sel = part[(part["p_brand"] != Q16_EXCL_BRAND)
               & part["p_size"].isin(Q16_SIZES)].copy()
    groups = sel[["p_brand", "p_type", "p_size"]].drop_duplicates() \
        .sort_values(["p_brand", "p_type", "p_size"]) \
        .reset_index(drop=True)
    gkey = {t: i for i, t in enumerate(
        zip(groups["p_brand"], groups["p_type"], groups["p_size"]))}
    gid = np.array([gkey[t] for t in zip(sel["p_brand"], sel["p_type"],
                                         sel["p_size"])], np.int64)
    code = np.full(int(part["p_partkey"].max()) + 2, -1, np.int64)
    code[sel["p_partkey"].to_numpy(np.int64)] = gid
    cref = ray.put(code)
    n_groups = len(groups)

    li = read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=["l_partkey", "l_suppkey"])
    n_li = li.count()
    nb = int(max(8, min(4096, n_li // Q16_PAIR_BUCKET_ROWS)))

    def pre(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        g = c[np.minimum(pk, len(c) - 1)]
        hit = g >= 0
        df = pd.DataFrame({
            "gid": g[hit],
            "sk": b["l_suppkey"].to_numpy(
                zero_copy_only=False)[hit]}).drop_duplicates()
        bucket = (df["gid"].to_numpy(np.uint64) * np.uint64(0x9E3779B9)
                  + df["sk"].to_numpy(np.uint64)) % np.uint64(nb)
        df["bucket"] = bucket.astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["gid", "sk"]].drop_duplicates()
        cnt = np.bincount(d["gid"].to_numpy(np.int64),
                          minlength=n_groups)
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame({"gid": nz.astype(np.int64),
                             "n": cnt[nz].astype(np.int64)})

    parts = li.map_batches(pre, batch_format="pyarrow") \
              .groupby("bucket").map_groups(per_bucket) \
              .to_pandas()
    cnt = np.zeros(n_groups, np.int64)
    if len(parts):
        np.add.at(cnt, parts["gid"].to_numpy(np.int64),
                  parts["n"].to_numpy(np.int64))
    out = groups.copy()
    out["supplier_cnt"] = cnt
    out = out[out["supplier_cnt"] > 0]
    out["p_size"] = out["p_size"].astype(np.int64)
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
        kind="mergesort").reset_index(drop=True)


SUPPLIER_PART_COUNTS_SQL = f"""
    WITH sel AS (SELECT p_partkey, p_brand, p_type,
                        p_size::BIGINT AS p_size
                 FROM part
                 WHERE p_brand <> '{Q16_EXCL_BRAND}'
                   AND p_size IN {Q16_SIZES}),
    pairs AS (SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
              FROM lineitem JOIN sel ON p_partkey = l_partkey)
    SELECT p_brand, p_type, p_size, count(*)::BIGINT AS supplier_cnt
    FROM pairs GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Market-basket co-purchase pairs (association mining over orders)
# ---------------------------------------------------------------------------

COPURCHASE_K = 20
COPURCHASE_PAIR_CHUNK = 4_000_000


def copurchase_pairs(sf_dir: str, k: int = COPURCHASE_K):
    """Top-k part pairs by the number of orders containing BOTH —
    the classic market-basket co-occurrence mining shape.

    100-TB plan: ONE coarse orderkey-bucket co-location shuffle (after
    per-batch (order, part) pre-dedup), vectorized within-order pair
    generation per bucket (segment arithmetic, orders are small so the
    per-order pair blowup is bounded by max-basket^2), per-bucket pair
    partials, then ONE pair-bucket count merge that keeps only its own
    top-k under the total order (count DESC, part_a, part_b) — the
    partial-top-k pattern: the global top-k is a driver fold over
    n_buckets * k rows, never a global pair table."""
    import os

    from .runtime import tune_context
    tune_context()

    li = read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=["l_orderkey", "l_partkey"])
    n_li = li.count()
    ob_n = max(8, min(4096, n_li // 200_000 + 8))
    pb_n = max(8, min(4096, n_li // 100_000 + 8))

    def pre(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o": b["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "p": b["l_partkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64)}).drop_duplicates()
        df["ob"] = df["o"].to_numpy(np.int64) % ob_n
        return pa.Table.from_pandas(df, preserve_index=False)

    def order_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["o", "p"]].drop_duplicates()
        o = d["o"].to_numpy(np.int64)
        p = d["p"].to_numpy(np.int64)
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        starts = np.flatnonzero(np.concatenate([[True], o[1:] != o[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(o)]]))
        seg = np.repeat(np.arange(len(starts)), lens)
        pos = np.arange(len(o)) - starts[seg]
        reps = lens[seg] - pos - 1
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "cnt": np.empty(0, np.int64),
                                 "pb": np.empty(0, np.int64)})
        i_idx = np.repeat(np.arange(len(o)), reps)
        csum = np.cumsum(reps) - reps
        j_idx = i_idx + 1 + (np.arange(total) - csum[i_idx])
        key = (p[i_idx] << 32) | p[j_idx]       # p sorted per order: a<b
        u, c = np.unique(key, return_counts=True)
        a = (u >> 32).astype(np.int64)
        b_ = (u & 0xFFFFFFFF).astype(np.int64)
        with np.errstate(over="ignore"):
            h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) \
                ^ b_.astype(np.uint64)
            h ^= h >> np.uint64(31)
        return pd.DataFrame({"a": a, "b": b_, "cnt": c.astype(np.int64),
                             "pb": (h % np.uint64(pb_n))
                             .astype(np.int64)})

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["a", "b"], sort=False)["cnt"].sum().reset_index()
        m = m.sort_values(["cnt", "a", "b"],
                          ascending=[False, True, True],
                          kind="mergesort").head(k)
        return m

    parts = (li.map_batches(pre, batch_format="pyarrow")
             .groupby("ob").map_groups(order_pairs,
                                       batch_format="pandas")
             .groupby("pb").map_groups(topk_bucket,
                                       batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pd.DataFrame({"part_a": pd.Series([], dtype=np.int64),
                             "part_b": pd.Series([], dtype=np.int64),
                             "n_orders": pd.Series([], dtype=np.int64)})
    out = parts.sort_values(["cnt", "a", "b"],
                            ascending=[False, True, True],
                            kind="mergesort").head(k)
    return pd.DataFrame({"part_a": out["a"].to_numpy(np.int64),
                         "part_b": out["b"].to_numpy(np.int64),
                         "n_orders": out["cnt"].to_numpy(np.int64)})


COPURCHASE_SQL = f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 count(*)::BIGINT AS n_orders
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2)
    SELECT part_a, part_b, n_orders FROM p
    ORDER BY n_orders DESC, part_a, part_b LIMIT {COPURCHASE_K}
"""


# ---------------------------------------------------------------------------
# Data-quality audit: FK orphans, key uniqueness, domain checks
# ---------------------------------------------------------------------------

def _distinct_key_map(ds, col: str, approx_rows: int):
    """(key, flag=1) map of distinct values: per-batch unique partials,
    ONE coarse key-bucket dedup — never a per-key hash aggregate."""
    nb = max(8, min(4096, approx_rows // 200_000 + 8))

    def partial(b: pa.Table) -> pa.Table:
        v = np.unique(b[col].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({"v": pa.array(v),
                         "kb": pa.array((v % nb).astype(np.int64))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["v"].to_numpy(np.int64))
        return pd.DataFrame({"v": u,
                             "flag": np.ones(len(u), np.int64)})

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("kb").map_groups(merge, batch_format="pandas") \
             .materialize()


def _orphan_count(probe_ds, col: str, key_map) -> int:
    """Rows of probe whose `col` has no row in the (v, flag) map —
    a distributed anti-join via the gated lookup attach, folded to a
    single count with per-batch partials."""
    from .joins import attach_by_key

    flagged = attach_by_key(probe_ds, key_map, [col], "v", "flag",
                            missing="fill:0")
    missing = flagged.map_batches(
        lambda b, c=col: pa.table({"n": pa.array(
            [int((b[f"flag_{c}"].to_numpy(zero_copy_only=False)
                  == 0).sum())], pa.int64())}),
        batch_format="pyarrow")
    return int(missing.sum("n") or 0)


def quality_audit(sf_dir: str):
    """Star-schema data-quality audit, one row per check:
    FK orphans (lineitem -> orders/part/supplier, orders -> customer),
    childless orders (no lineitem), duplicate (l_orderkey,
    l_linenumber) primary keys, and non-positive quantity/price domain
    violations.  Every check is a distributed anti-join (gated lookup
    attach) or a coarse-bucket distinct kernel + count partials; the
    driver only ever folds per-check scalars."""
    import os

    from .runtime import tune_context
    tune_context()

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice"]).materialize()
    orders = read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                                columns=["o_orderkey", "o_custkey"]) \
        .materialize()
    n_li, n_ord = li.count(), orders.count()

    ord_keys = _distinct_key_map(orders, "o_orderkey", n_ord)
    cust_keys = _distinct_key_map(
        read_parquet_clean(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey"]), "c_custkey", n_ord)
    part_keys = _distinct_key_map(
        read_parquet_clean(os.path.join(sf_dir, "part.parquet"),
                           columns=["p_partkey"]), "p_partkey", n_li)
    supp_keys = _distinct_key_map(
        read_parquet_clean(os.path.join(sf_dir, "supplier.parquet"),
                           columns=["s_suppkey"]), "s_suppkey", n_li)
    li_ord_keys = _distinct_key_map(li, "l_orderkey", n_li)

    checks = [
        ("lineitem_orphan_orderkey",
         _orphan_count(li, "l_orderkey", ord_keys)),
        ("lineitem_orphan_partkey",
         _orphan_count(li, "l_partkey", part_keys)),
        ("lineitem_orphan_suppkey",
         _orphan_count(li, "l_suppkey", supp_keys)),
        ("orders_orphan_custkey",
         _orphan_count(orders, "o_custkey", cust_keys)),
        ("orders_childless",
         _orphan_count(orders, "o_orderkey", li_ord_keys)),
    ]

    # duplicate (l_orderkey, l_linenumber) PKs: total rows minus the
    # distinct pair count (per-batch pre-dedup + coarse pair-bucket
    # distinct partials, CLAUDE.md's 25x rule)
    nb = max(8, min(4096, n_li // 200_000 + 8))

    def pk_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o": b["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "l": b["l_linenumber"].to_numpy(zero_copy_only=False)
            .astype(np.int64)}).drop_duplicates()
        df["pb"] = ((df["o"].to_numpy(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15))
                    ^ df["l"].to_numpy(np.uint64)) \
            % np.uint64(nb)
        df["pb"] = df["pb"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def pk_merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(len(
            g[["o", "l"]].drop_duplicates()))]})

    n_distinct = int(li.map_batches(pk_partial, batch_format="pyarrow")
                     .groupby("pb").map_groups(pk_merge,
                                               batch_format="pandas")
                     .sum("n") or 0)
    checks.append(("lineitem_duplicate_pk", n_li - n_distinct))

    def domain_partial(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        p = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array(
            [int(((q <= 0) | (p <= 0)).sum())], pa.int64())})

    checks.append(("lineitem_nonpositive_qty_price",
                   int(li.map_batches(domain_partial,
                                      batch_format="pyarrow")
                       .sum("n") or 0)))

    out = pd.DataFrame({"check_name": [c for c, _ in checks],
                        "n_bad": np.array([n for _, n in checks],
                                          np.int64)})
    return out.sort_values("check_name").reset_index(drop=True)


QUALITY_AUDIT_SQL = """
    SELECT check_name, n_bad FROM (
      SELECT 'lineitem_orphan_orderkey' AS check_name, count(*)::BIGINT AS n_bad
      FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'lineitem_orphan_partkey', count(*)::BIGINT
      FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
      UNION ALL
      SELECT 'lineitem_orphan_suppkey', count(*)::BIGINT
      FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
      UNION ALL
      SELECT 'orders_orphan_custkey', count(*)::BIGINT
      FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'orders_childless', count(*)::BIGINT
      FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      UNION ALL
      SELECT 'lineitem_duplicate_pk',
             (count(*) - count(DISTINCT (l_orderkey, l_linenumber)))
               ::BIGINT
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_nonpositive_qty_price', count(*)::BIGINT
      FROM lineitem WHERE l_quantity <= 0 OR l_extendedprice <= 0
    ) ORDER BY check_name
"""
