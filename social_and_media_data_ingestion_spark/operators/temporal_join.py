"""Distributed temporal joins: as-of join and bounded time-band join.

Spark has no native AS OF / range-band join; the naive spelling — an
inequality theta-join — compiles to BroadcastNestedLoopJoin (O(n·m),
and a driver OOM when neither side is broadcastable). Both operators
here are re-expressed as ONE equi-shuffle plus window/filter logic, the
shape that survives a 1000-executor 100 TB run:

- `asof_join`: tag probe and reference rows, union them, and carry the
  latest reference values forward (or next backward) with an
  ignorenulls `last()` over a (keys, time) window. Exactly one shuffle
  keyed on the join keys; no theta-join anywhere in the plan.
- `time_band_join`: quantize event time into `band`-wide buckets, join
  probes (exploded to the 3 covering buckets) against references (one
  bucket each) on the bucket id, and post-filter |Δt| ≤ band. Each
  qualifying (probe, ref) pair is produced EXACTLY once — a reference
  row lives in a single bucket — so no dedup pass is needed.

Skew note: both shuffles key on user-supplied columns (plus the time
bucket for the band join). A pathologically hot key/bucket is handled
by AQE skew-join splitting (enabled in session.py); the band join's
bucket key further spreads a hot entity across time.

Reference parity: the reference's scripts do per-entity "latest state"
lookups row-at-a-time in pandas (tweet_download.py keeps a per-user
max-id high-watermark, reddit_subm_extraction.py joins submissions to
the latest matching dim row); these operators are the distributed
generalization of that access pattern.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PROBE = "__asof_is_probe"
_T = "__asof_t"
_REF_T = "__asof_ref_t"
_TIE = "__asof_tie"
_PAYLOAD_T = "__asof_payload_t"  # matched-ref ts field inside the carry struct


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    on: Sequence[str],
    probe_ts: str,
    ref_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    ref_tiebreak: str | None = None,
    how: str = "left",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For every probe row, attach `value_cols` from the reference row
    with the greatest `ref_ts` <= `probe_ts` (direction='backward'),
    the least `ref_ts` >= `probe_ts` ('forward'), or whichever of the
    two is closer in time ('nearest', backward wins exact-distance
    ties), matching on the `on` keys — pandas `merge_asof` / DuckDB
    `ASOF JOIN` semantics. `allow_exact_matches=False` makes the time
    comparison strict (pandas parity), excluding equal-instant refs.

    `tolerance_seconds` nulls the match when |probe_ts - matched ref_ts|
    exceeds it (in seconds for timestamp axes; in the column's own units
    for numeric ordering axes — versions, offsets, sequence numbers).
    `ref_tiebreak` names a
    reference column that deterministically breaks ties between
    reference rows sharing (keys, ts): the row with the LARGEST
    tiebreak value wins; without it, equal-ts reference rows give a
    partition-order-dependent result (pre-dedup the reference instead).
    `how` is 'left' (unmatched probes keep NULL values) or 'inner'.

    Plan shape: union -> single Exchange on `on` -> window ('nearest'
    adds a second sort over the SAME partitioning, not a second
    shuffle). No BroadcastNestedLoopJoin, no cartesian product.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    on = list(on)
    value_cols = list(value_cols)
    clash = set(value_cols) & set(probe.columns)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} collide with probe columns — "
            "rename one side before joining"
        )
    ref_types = dict(ref.dtypes)
    probe_out = [c for c in probe.columns]

    tie = (
        F.col(ref_tiebreak).cast("double")
        if ref_tiebreak is not None
        else F.lit(0.0)
    )
    ref_side = ref.select(
        *[F.col(k) for k in on],
        F.col(ref_ts).alias(_T),
        F.lit(0).alias(_PROBE),
        tie.alias(_TIE),
        *[F.col(v) for v in value_cols],
    )
    probe_side = probe.select(
        *[F.col(c) for c in probe.columns],
        F.col(probe_ts).alias(_T),
        F.lit(1).alias(_PROBE),
        F.lit(0.0).alias(_TIE),
        *[F.lit(None).cast(ref_types[v]).alias(v) for v in value_cols],
    )
    unioned = probe_side.unionByName(ref_side, allowMissingColumns=True)

    # Backward: latest ref at or before the probe -> ascending time,
    # references BEFORE probes at equal instants so equality matches
    # (AFTER probes when matches must be strict). Forward is the mirror
    # image on descending time. 'nearest' evaluates both windows — same
    # partitioning, so Catalyst plans one Exchange and two sorts.
    is_ref = F.col(_PROBE) == 0
    probe_order = F.col(_PROBE).asc() if allow_exact_matches else F.col(_PROBE).desc()

    def _carry(df: DataFrame, asc: bool, suffix: str) -> DataFrame:
        order = [
            F.col(_T).asc() if asc else F.col(_T).desc(),
            probe_order,
            F.col(_TIE).asc(),  # last() sees the largest tiebreak latest
        ]
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # carry the whole matched-ref row as ONE struct: the struct is
        # non-NULL for every ref row even when a value column is NULL,
        # so last(ignorenulls) keeps matched-row identity and carried
        # values in lockstep. (r13 differential fuzz: the previous
        # per-column last(ignorenulls) SKIPPED a matched ref whose
        # value was NULL and silently leaked an OLDER ref's value while
        # matched_ts reported the newer row.)
        payload = F.when(
            is_ref,
            F.struct(
                F.col(_T).alias(_PAYLOAD_T), *[F.col(v) for v in value_cols]
            ),
        )
        c = F.last(payload, ignorenulls=True).over(w)
        return df.select(
            *df.columns,
            *[c[v].alias(f"__c{suffix}_{v}") for v in value_cols],
            c[_PAYLOAD_T].alias(f"{_REF_T}{suffix}"),
        )

    # gap arithmetic: exact integer microseconds for timestamps, plain
    # numeric difference for numeric ordering axes (versions, offsets)
    ts_is_time = "timestamp" in dict(probe.dtypes)[probe_ts]

    def _num(c):
        return F.unix_micros(F.col(c)) if ts_is_time else F.col(c).cast("double")

    def _tol_lit():
        return F.lit(
            int(tolerance_seconds * 1_000_000) if ts_is_time else tolerance_seconds
        )

    def _within_tol(ref_t_col: str):
        if tolerance_seconds is None:
            return F.col(ref_t_col).isNotNull()
        # coalesce: a NULL ref time must read as "no match" (false), not
        # SQL NULL, or the nearest-side selection below mis-branches
        return F.coalesce(
            F.abs(_num(_T) - _num(ref_t_col)) <= _tol_lit(),
            F.lit(False),
        )

    if direction in ("backward", "forward"):
        carried = _carry(unioned, asc=direction == "backward", suffix="")
        out = carried.filter(F.col(_PROBE) == 1)
        ok = _within_tol(_REF_T)
        out = out.select(
            *probe_out,
            F.when(ok, F.col(_REF_T)).alias(_REF_T),
            *[F.when(ok, F.col(f"__c_{v}")).alias(f"__c_{v}") for v in value_cols],
        )
    else:  # nearest
        carried = _carry(_carry(unioned, asc=True, suffix="_b"), asc=False, suffix="_f")
        out = carried.filter(F.col(_PROBE) == 1)
        ok_b = _within_tol(f"{_REF_T}_b")
        ok_f = _within_tol(f"{_REF_T}_f")
        gap_b = F.abs(_num(_T) - _num(f"{_REF_T}_b"))
        gap_f = F.abs(_num(_T) - _num(f"{_REF_T}_f"))
        # backward wins exact-distance ties (pandas 'nearest' behavior)
        use_b = ok_b & (~ok_f | (gap_b <= gap_f))
        use_f = ok_f & ~use_b
        out = out.select(
            *probe_out,
            F.when(use_b, F.col(f"{_REF_T}_b"))
            .when(use_f, F.col(f"{_REF_T}_f"))
            .alias(_REF_T),
            *[
                F.when(use_b, F.col(f"__c_b_{v}"))
                .when(use_f, F.col(f"__c_f_{v}"))
                .alias(f"__c_{v}")
                for v in value_cols
            ],
        )
    if how == "inner":
        out = out.filter(F.col(_REF_T).isNotNull())
    return out.select(
        *probe_out,
        F.col(_REF_T).alias("matched_ts"),
        *[F.col(f"__c_{v}").alias(v) for v in value_cols],
    )


def time_band_join(
    probe: DataFrame,
    ref: DataFrame,
    probe_ts: str,
    ref_ts: str,
    band_seconds: float,
    on: Sequence[str] = (),
    probe_prefix: str = "p_",
    ref_prefix: str = "r_",
) -> DataFrame:
    """All (probe, ref) pairs with |probe_ts - ref_ts| <= band_seconds
    (inclusive), optionally also matching on equality keys `on`.

    Scale spelling: both sides bucket time at `band_seconds` width; a
    probe can only band-match references in its own or the two adjacent
    buckets, so the probe side explodes to those 3 bucket ids and the
    join is a plain equi-join on (bucket, *on) — hash-partitionable,
    AQE-skew-splittable, never a nested-loop. Each pair appears exactly
    once because a reference row occupies a single bucket.

    Output columns are prefixed (`p_`/`r_`) to keep self-joins legal.
    Time comparison is exact integer microseconds for timestamp axes;
    numeric ordering axes (versions, offsets) compare in their own
    units, with `band_seconds` read as a plain band width.
    """
    if band_seconds <= 0:
        raise ValueError(f"band_seconds must be > 0, got {band_seconds!r}")
    ts_is_time = "timestamp" in dict(probe.dtypes)[probe_ts]
    band_us = int(band_seconds * 1_000_000) if ts_is_time else band_seconds
    on = list(on)

    def bucketed(df: DataFrame, ts: str, prefix: str, explode: bool) -> DataFrame:
        us = (
            F.unix_micros(F.col(ts))
            if ts_is_time
            else F.col(ts).cast("double")
        )
        b = F.floor(us / F.lit(band_us))
        cols = [F.col(c).alias(f"{prefix}{c}") for c in df.columns]
        keys = [F.col(k).alias(f"__k_{k}") for k in on]
        if explode:
            bucket = F.explode(F.array(b - 1, b, b + 1)).alias("__bucket")
        else:
            bucket = b.alias("__bucket")
        return df.select(*cols, *keys, us.alias(f"{prefix}__us"), bucket)

    p = bucketed(probe, probe_ts, probe_prefix, explode=True)
    r = bucketed(ref, ref_ts, ref_prefix, explode=False)
    cond = [p["__bucket"] == r["__bucket"]] + [
        p[f"__k_{k}"] == r[f"__k_{k}"] for k in on
    ]
    joined = p.join(r, cond, "inner").filter(
        F.abs(F.col(f"{probe_prefix}__us") - F.col(f"{ref_prefix}__us"))
        <= F.lit(band_us)
    )
    keep = [f"{probe_prefix}{c}" for c in probe.columns] + [
        f"{ref_prefix}{c}" for c in ref.columns
    ]
    return joined.select(*keep)
