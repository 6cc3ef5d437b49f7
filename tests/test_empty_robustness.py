"""Empty-tables harness (round 7): every oracle-paired registry query
runs against ZERO-ROW versions of all ten tables, Spark vs its DuckDB
oracle, value-compared. This is the "partition with no data / day with
no events" scenario every 100 TB pipeline hits constantly — a date
predicate that matches nothing, a tenant with no rows — and it is the
regime where driver-side scalar pulls (`first()[0]`, `collect()[0]`,
codebook builds) crash instead of degrading.

The r7 sweep found 27 divergences; the fixes it drove, all pinned here:

- k-means/IVF/PQ/PCA family (12 queries): centroid/codebook collection
  returned an empty list and the downstream compilers crashed — VOID-
  typed `array()` breaking analysis (`_centroid_sim_structs` now pins
  ARRAY<STRUCT<cs,neg_cid>>), `books[0]` IndexError, `first()[0]`
  TypeError. Each builder now returns a typed empty result.
- PageRank (3 queries): `1.0 / n_nodes` ZeroDivisionError on the
  driver -> typed empty (node, pr) frame.
- triangle_count: `int(None)` on the empty-degree SUM -> the SQL
  answer (0 triangles, NULL wedges, NULL clustering).
- kw5k pair: the phrase builder asserted on an empty vocabulary ->
  EXISTS over zero phrases is simply false.
- count-shaped sums (srm / welch / reconciliation / leakage): Spark
  sum(when) over empty is NULL where the oracles' count(*) FILTER is 0
  -> count_if; and every ratio with a degenerable divisor is
  try_divide, because Spark ANSI `/` raises on zero where DuckDB float
  division yields NULL.

One documented ENGINE DIVERGENCE (not fixed, pinned below): Spark's
rollup/cube/grouping-sets over empty input emit ZERO rows, while the
SQL standard (and DuckDB) emit the global `()` grouping-set row —
see `test_grouping_sets_on_empty_input_divergence`.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from social_and_media_data_ingestion_spark.plans.queries import registry

# Whole-registry sweep: minutes per test, deselected by default (see
# pytest.ini). Run with -m "slow or not slow" after any closure edit
# and before round close.
pytestmark = pytest.mark.slow

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Spark grouping-sets over empty input: 0 rows; standard SQL: the ()
# grand-total row. Pinned as a divergence below, excluded from the
# value sweep.
GROUPING_SETS_ON_EMPTY = [
    "agg_rollup_revenue",
    "agg_cube_revenue",
    "agg_grouping_sets",
    "events_time_bucket_rollup",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("empty_sf")
    src = "/root/testdata/sf0.001"
    for tab in TABLES:
        spark.read.parquet(f"{src}/{tab}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(str(tmp / f"{tab}.parquet"))
    return str(tmp)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive stringification with a UNIFORM null spelling:
    Spark hands a NULL boolean to pandas as None, DuckDB as NaN —
    astype(str) would read that engine-irrelevant repr gap as a
    divergence."""

    def cell(v):
        if isinstance(v, (list, tuple, dict, set, bytes, bytearray)):
            return str(v)
        if hasattr(v, "tolist") and getattr(v, "ndim", 0):  # np array cell
            return str(list(v))
        return "NULL" if pd.isna(v) else str(v)

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else f"{v:.6f}")
        else:
            df[c] = s.map(cell)
    # .map on an EMPTY series preserves the original dtype (tz-aware
    # Spark vs naive DuckDB timestamps would fail .equals on dtype
    # alone); astype(str) is identity on the stringified values and
    # forces a uniform object dtype on zero-row frames
    df = df.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def test_every_query_agrees_on_empty_tables(spark, empty_sf_dir):
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM "
            f"read_parquet('{empty_sf_dir}/{tab}.parquet/*.parquet')"
        )
    reg = registry()
    names = [
        n
        for n, qd in reg.items()
        if qd.oracle is not None and n not in GROUPING_SETS_ON_EMPTY
    ]
    assert len(names) >= 245  # the sweep is the whole registry
    bad = []
    for name in names:
        qd = reg[name]
        try:
            got = qd.spark(spark, empty_sf_dir).toPandas()
            want = con.execute(qd.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001 - collect, report all
            bad.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        if sorted(got.columns) != sorted(want.columns):
            bad.append(f"{name}: schema {sorted(got.columns)} vs "
                       f"{sorted(want.columns)}")
            continue
        gs, ws = _canon(got), _canon(want)
        if len(gs) != len(ws):
            bad.append(f"{name}: rows {len(gs)} vs {len(ws)}")
        elif not gs.equals(ws):
            bad.append(f"{name}: value divergence")
    assert not bad, "\n".join(bad)


@pytest.fixture(scope="module")
def onerow_sf_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("onerow_sf")
    src = "/root/testdata/sf0.001"
    for tab in TABLES:
        spark.read.parquet(f"{src}/{tab}.parquet").limit(1).write.mode(
            "overwrite"
        ).parquet(str(tmp / f"{tab}.parquet"))
    return str(tmp)


def test_every_query_agrees_on_one_row_tables(spark, onerow_sf_dir):
    """n=1 is the other degenerate cardinality: sample-variance /(n-1)
    divisors, OLS over one x value, rank tests with an absent group,
    MAD 0 under a single observation. The r7 sweep found 8 ANSI
    DIVIDE_BY_ZERO job-killers here (trend slope, ANOVA F,
    Mann-Whitney sigma, Kruskal-Wallis H, KS ECDFs, Spearman rho,
    CUPED theta, MAD z) — all now try_divide, yielding the oracle's
    NULL. Note the one-row tables are NOT referentially consistent
    (the single lineitem's orderkey need not match the single order) —
    both engines see the same parquet, so joins just go empty
    identically."""
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM "
            f"read_parquet('{onerow_sf_dir}/{tab}.parquet/*.parquet')"
        )
    reg = registry()
    names = [n for n, qd in reg.items() if qd.oracle is not None]
    assert len(names) >= 250
    bad = []
    for name in names:
        qd = reg[name]
        try:
            got = qd.spark(spark, onerow_sf_dir).toPandas()
            want = con.execute(qd.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        if sorted(got.columns) != sorted(want.columns):
            bad.append(f"{name}: schema {sorted(got.columns)} vs "
                       f"{sorted(want.columns)}")
            continue
        gs, ws = _canon(got), _canon(want)
        if len(gs) != len(ws):
            bad.append(f"{name}: rows {len(gs)} vs {len(ws)}")
        elif not gs.equals(ws):
            bad.append(f"{name}: value divergence")
    assert not bad, "\n".join(bad)


def test_grouping_sets_on_empty_input_divergence(spark, empty_sf_dir):
    """Documented divergence, pinned so a Spark behavior change gets
    noticed: over EMPTY input Spark's rollup/cube/grouping-sets emit 0
    rows, while standard SQL (DuckDB, Postgres) emits the global ()
    grouping-set row — a global aggregate over no rows is still one
    row. Consumers needing the standard row on possibly-empty input
    should union a `groupBy().agg(...)` global fallback; our registry
    documents the Spark semantics instead (the grand-total row of an
    empty day is all-NULL noise downstream)."""
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM "
            f"read_parquet('{empty_sf_dir}/{tab}.parquet/*.parquet')"
        )
    reg = registry()
    for name in GROUPING_SETS_ON_EMPTY:
        qd = reg[name]
        assert qd.spark(spark, empty_sf_dir).count() == 0  # Spark: no rows
        assert len(con.execute(qd.oracle).fetchdf()) == 1  # SQL: () row


@pytest.fixture(scope="module")
def dup_relational_dir(spark, tmp_path_factory):
    """sf0.001 with duplicated orders rows (one replay + one double
    replay) and duplicated lineitem rows — at-least-once ingestion for
    the relational tables."""
    import pandas as pd

    tmp = tmp_path_factory.mktemp("dup_rel")
    src = "/root/testdata/sf0.001"
    for tab in TABLES:
        pdf = spark.read.parquet(f"{src}/{tab}.parquet").toPandas()
        if tab == "orders":
            pdf = pd.concat([pdf, pdf.iloc[[1, 2, 2]]], ignore_index=True)
        if tab == "lineitem":
            pdf = pd.concat([pdf, pdf.iloc[[0, 5]]], ignore_index=True)
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            str(tmp / f"{tab}.parquet")
        )
    return str(tmp)


def test_every_orders_lineitem_query_agrees_on_duplicate_rows(
    spark, dup_relational_dir
):
    """Duplicate relational rows with NO exception list: every
    orders/lineitem-touching query must agree cross-engine. The r7
    probe found 4 divergers, all the same root cause — summing DOUBLES
    then rounding, where duplicated rows (or just partial-sum order)
    land the sum on a rounding boundary: TPC-H Q1, Q9, ABC-Pareto, and
    RFM flipped last cents RUN-TO-RUN on identical input. All four now
    quantize-then-sum (exact per-row decimal-scale integers, wide
    accumulation, floor(x·10^dp+0.5) once at the end — round() itself
    diverges cross-engine on exact halves, which exact sums actually
    hit). This sweep pins the whole family deterministic."""
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM "
            f"read_parquet('{dup_relational_dir}/{tab}.parquet/*.parquet')"
        )
    reg = registry()
    import re as _re

    names = [
        n
        for n, qd in reg.items()
        if qd.oracle is not None
        and (
            _re.search(r"\border(s)?\b", qd.oracle.lower())
            or _re.search(r"\blineitem\b", qd.oracle.lower())
        )
    ]
    assert len(names) >= 130
    bad = []
    for name in names:
        qd = reg[name]
        try:
            got = qd.spark(spark, dup_relational_dir).toPandas()
            want = con.execute(qd.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        if sorted(got.columns) != sorted(want.columns):
            bad.append(f"{name}: schema mismatch")
            continue
        gs, ws = _canon(got), _canon(want)
        if len(gs) != len(ws):
            bad.append(f"{name}: rows {len(gs)} vs {len(ws)}")
        elif not gs.equals(ws):
            bad.append(f"{name}: value divergence")
    assert not bad, "\n".join(bad)
