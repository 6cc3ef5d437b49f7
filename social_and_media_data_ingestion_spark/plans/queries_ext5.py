"""Registry extension 5 — round-4 third batch: time-series diagnostics
(autocorrelation, seasonal-baseline anomalies, Theil-Sen robust trend),
distributed model training as aggregation (multinomial Naive Bayes),
entity-resolution blocking/linkage, the feature-hashing trick, k-core
graph peeling, shingle-containment near-superset detection, and a
distributed Pareto-skyline.

These extend the LLM-training-data-pipeline layer (SURVEY §2 "beyond
reference" operators) into the model-prep / data-diagnostics territory a
100 TB corpus pipeline needs: ACF and seasonal baselines are the stock
health checks on event streams; Theil-Sen is the robust (outlier-proof)
trend estimator; Naive Bayes is the classic "training = one groupBy"
distributed learner (and the template for any count-based model); ER
blocking is how record linkage avoids n²; feature hashing is the
fixed-width featurizer that needs no vocabulary broadcast; k-core is the
standard graph-cleaning peel; containment catches near-SUPERSET dups
that symmetric Jaccard misses; the skyline is multi-objective top-k.

Scale notes (per query, also in SCALE.md):
- autocorrelation: the raw table reduces to one row per day in a single
  combiner-friendly hash-agg; everything after (lag join, moment sums)
  runs on the tiny daily frame. Pearson terms come from INTEGER
  sufficient statistics (counts), so distributed partial-sum order
  cannot move the result; the only doubles are two correctly-rounded
  sqrts and one division — bit-identical on any engine.
- seasonal anomaly: same one-pass reduction to (day, hour) cells; the
  (dow, hour) baseline is a second tiny agg. dow is computed as
  datediff-mod-7 (pure integer) — no locale/week-origin dependence.
- Theil-Sen: pairwise slopes are quadratic IN DAYS PER GROUP, not in
  rows — the raw scan reduces to (type, day) counts first, so 100 TB of
  events still yields only ~365² pairs per type per year. The median is
  position-picked (floor/ceil of n/2), not interpolated, so both
  engines select the identical element values.
- Naive Bayes: training IS one hash-agg over (class, token) — the model
  frame is vocab × classes, broadcast to score. Scoring sums per-token
  log-likelihoods after rounding each to 6 dp and SORTING (both engines
  left-fold the identical operand sequence → bit-identical argmax
  input). Unknown test tokens get the Laplace floor, computed in-row.
- ER linkage: pairs are generated between DISTINCT normalized names
  (hash-agg first), inside blocks keyed on the name's last token — the
  candidate count is bounded by name-vocabulary² per block, independent
  of row count. Levenshtein runs only on candidates.
- feature hashing: explode → two combiner-friendly hash-aggs keyed on
  (doc, bucket) then doc. The 64-bucket space is a plan constant — no
  vocabulary pass, no dictionary broadcast: the whole point of the
  hashing trick at 100 TB.
- k-core: each peel round is one degree hash-agg + one semi-join; the
  edge set only shrinks. Fixed 3 rounds here; a cluster run loops until
  fixpoint with the same bounded per-round cost (and would checkpoint
  every ~5 rounds like operators/dedup connected components).
- containment: candidate pairs come from the SAME bounded LSH-band
  machinery as dedup_minhash_lsh_pairs (one shuffle, hot-bucket guard);
  containment adds only per-pair set arithmetic on candidates.
- skyline: the scan first reduces to one row per distinct price (the
  skyline is invariant to that reduction), then a DISTRIBUTED exclusive
  prefix-min (range-partition + O(partitions) offsets,
  operators/scale.global_running_min) replaces the single-task
  Window.orderBy funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from social_and_media_data_ingestion_spark.operators.dedup import _polyhash, _tokens
from social_and_media_data_ingestion_spark.plans.queries import q
from social_and_media_data_ingestion_spark.plans.tables import (
    t,
    vectors,
)

# anchor date for integer day indices (differences are what matter; the
# anchor just has to precede any data)
_EPOCH = "2000-01-01"


def _r(col, dp: int):
    """floor(x*10^dp + 0.5)/10^dp — the repo's cross-engine rounding
    (half-away-from-zero on both engines, unlike round()).

    Magnitude-safe (r12 numeric-extremes probe): Spark's floor(double)
    returns LONG, which SATURATES at ±2^63 — a 1e18-cent prediction
    silently rounded to 9.2e16 while DuckDB's double-native floor kept
    the value. Past 2^62 the +0.5-and-floor is an arithmetic identity
    anyway (double spacing there is >= 1024, so x*10^dp is already an
    integer and +0.5 cannot change it), so the guard reproduces
    DuckDB's double path bit-for-bit: (x*10^dp + 0.5)/10^dp with no
    floor. NaN/Inf take the identity branch too instead of wrapping
    through a garbage LONG."""
    m = 10.0**dp
    v = col * m + F.lit(0.5)
    return (
        F.when(F.abs(v) < F.lit(float(2**62)), F.floor(v) / F.lit(m))
        .otherwise(v / F.lit(m))
    )


# =============================================================================
# Time series — autocorrelation function of the daily event-count series
# at lags 1..7. The Pearson terms are integer sufficient statistics
# (n, Σx, Σy, Σxy, Σx², Σy² — all BIGINT-exact), so the only floating
# point is sqrt+divide at the very end.
# =============================================================================
@q(
    "events_autocorrelation",
    f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '{_EPOCH}', ts::DATE)::BIGINT AS d,
             count(*)::BIGINT AS c
      FROM events GROUP BY 1
    ),
    lags AS (SELECT unnest(range(1, 8))::BIGINT AS lag),
    pairs AS (
      SELECT l.lag, a.c AS x, b.c AS y
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.d = a.d + l.lag
    ),
    stats AS (
      SELECT lag, count(*)::BIGINT AS n,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * y)::BIGINT AS sxy,
             sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
      FROM pairs GROUP BY 1
    )
    SELECT lag, n,
           CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
                THEN 0.0
                ELSE floor((n * sxy - sx * sy)
                           / (sqrt((n * sxx - sx * sx)::DOUBLE)
                              * sqrt((n * syy - sy * sy)::DOUBLE))
                           * 1000000 + 0.5) / 1000000
           END AS acf
    FROM stats
    """,
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.count("*").alias("c"))
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = daily.select(F.col("d"), F.col("c").alias("x"))
    b = daily.select(F.col("d").alias("d2"), F.col("c").alias("y"))
    pairs = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("d2") == F.col("d") + F.col("lag"))
    )
    s = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return s.select(
        "lag",
        "n",
        F.when((dx <= 0) | (dy <= 0), F.lit(0.0))
        .otherwise(
            _r(num / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))), 6)
        )
        .alias("acf"),
    )


# =============================================================================
# Time series — seasonal (day-of-week × hour) baseline and z-score
# anomalies over hourly event counts. dow is datediff(day, epoch) % 7 —
# pure integer, no locale/week-origin trap. Baseline mean/std come from
# integer sums; the z comparison is the identical IEEE expression on
# both engines.
# =============================================================================
@q(
    "events_seasonal_anomaly",
    f"""
    WITH cells AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS day,
             date_diff('day', DATE '{_EPOCH}', ts::DATE)::BIGINT % 7 AS dow,
             extract(hour FROM ts)::BIGINT AS hour,
             count(*)::BIGINT AS c
      FROM events GROUP BY 1, 2, 3
    ),
    base AS (
      SELECT dow, hour, count(*)::BIGINT AS n,
             sum(c)::BIGINT AS s, sum(c * c)::BIGINT AS ss
      FROM cells GROUP BY 1, 2
    )
    SELECT day, hour, c,
           floor(s / n::DOUBLE * 1000000 + 0.5) / 1000000 AS expected,
           floor((c - s / n::DOUBLE)
                 / sqrt((ss - s * s / n::DOUBLE) / n) * 1000000 + 0.5)
           / 1000000 AS z
    FROM cells JOIN base USING (dow, hour)
    WHERE n >= 3 AND (ss - s * s / n::DOUBLE) / n > 0
      AND abs((c - s / n::DOUBLE) / sqrt((ss - s * s / n::DOUBLE) / n)) >= 1.5
    """,
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        (
            F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date")).cast("long") % 7
        ).alias("dow"),
        F.hour("ts").cast("long").alias("hour"),
    ).agg(F.count("*").alias("c"))
    base = cells.groupBy("dow", "hour").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    j = cells.join(F.broadcast(base), ["dow", "hour"])
    mean = F.col("s") / F.col("n").cast("double")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n").cast("double")) / F.col(
        "n"
    )
    z = (F.col("c") - mean) / F.sqrt(var)
    return (
        j.filter((F.col("n") >= 3) & (var > 0) & (F.abs(z) >= 1.5))
        .select("day", "hour", "c", _r(mean, 6).alias("expected"), _r(z, 6).alias("z"))
    )


# =============================================================================
# Robust statistics — Theil-Sen trend (median of pairwise slopes) of the
# per-type daily count series. Quadratic in DAYS per type (the raw scan
# reduces to (type, day) first), never in events. The median picks the
# element(s) at floor/ceil positions — no interpolation formula to
# disagree on.
# =============================================================================
@q(
    "stats_theil_sen_trend",
    f"""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '{_EPOCH}', ts::DATE)::BIGINT AS d,
             count(*)::BIGINT AS c
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.event_type,
             (b.c - a.c) / (b.d - a.d)::DOUBLE AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.d > a.d
    ),
    ranked AS (
      SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
             count(*) OVER (PARTITION BY event_type) AS k
      FROM slopes
    )
    SELECT event_type, max(k)::BIGINT AS n_pairs,
           floor(avg(slope) * 1000000 + 0.5) / 1000000 AS ts_slope
    FROM ranked
    WHERE rn = (k + 1) // 2 OR rn = k // 2 + 1
    GROUP BY event_type
    """,
)
def stats_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.count("*").alias("c"))
    a = daily.select("event_type", F.col("d").alias("d1"), F.col("c").alias("c1"))
    b = daily.select("event_type", F.col("d").alias("d2"), F.col("c").alias("c2"))
    slopes = a.join(b, "event_type").filter(F.col("d2") > F.col("d1")).select(
        "event_type",
        ((F.col("c2") - F.col("c1")) / (F.col("d2") - F.col("d1")).cast("double")).alias(
            "slope"
        ),
    )
    w = Window.partitionBy("event_type").orderBy("slope")
    wk = Window.partitionBy("event_type")
    ranked = slopes.withColumn("rn", F.row_number().over(w)).withColumn(
        "k", F.count("*").over(wk)
    )
    # integer median positions — floor-divide explicitly: plain `/` on
    # longs is DOUBLE division in Spark, and `rn == (k+1)/2` silently
    # never matches the lower-middle position when k is even
    lo = F.floor((F.col("k") + 1) / 2).cast("long")
    hi = F.floor(F.col("k") / 2).cast("long") + 1
    mid = ranked.filter((F.col("rn") == lo) | (F.col("rn") == hi))
    return mid.groupBy("event_type").agg(
        F.max("k").cast("long").alias("n_pairs"),
        _r(F.avg("slope"), 6).alias("ts_slope"),
    )


# =============================================================================
# Feature hashing (the "hashing trick") — fixed-width 64-bucket token
# count features per document, NO vocabulary pass or dictionary
# broadcast (that is the point of the trick at 100 TB). Bucket = the
# cross-engine polynomial hash mod 64. Output is per-doc feature-vector
# diagnostics (nnz, L2, argmax bucket) — all scalars.
# =============================================================================
_FH_BUCKETS = 64


@q(
    "text_feature_hashing",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)),
                                                           '\\s+'),
                                        x -> x <> '')) AS token
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id,
             list_reduce(list_transform(string_split(token, ''),
                                        x -> ascii(x)::BIGINT),
                         (acc, x) -> (acc * 31 + x) % 1000000007)
             % {_FH_BUCKETS} AS bucket,
             count(*)::BIGINT AS cnt
      FROM toks GROUP BY 1, 2
    ),
    ranked AS (
      SELECT doc_id, bucket, cnt,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, bucket) AS rk
      FROM bucketed
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_nonzero,
           floor(sqrt(sum(cnt * cnt)::DOUBLE) * 1000000 + 0.5) / 1000000
             AS l2_norm,
           max(CASE WHEN rk = 1 THEN bucket END)::BIGINT AS top_bucket,
           max(CASE WHEN rk = 1 THEN cnt END)::BIGINT AS top_count
    FROM ranked GROUP BY doc_id
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens("text")).alias("token"))
    bucketed = toks.groupBy(
        "doc_id", (_polyhash(F.col("token")) % _FH_BUCKETS).alias("bucket")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("bucket"))
    ranked = bucketed.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_nonzero"),
        _r(F.sqrt(F.sum(F.col("cnt") * F.col("cnt")).cast("double")), 6).alias(
            "l2_norm"
        ),
        F.max(F.when(F.col("rk") == 1, F.col("bucket"))).cast("bigint").alias(
            "top_bucket"
        ),
        F.max(F.when(F.col("rk") == 1, F.col("cnt"))).cast("bigint").alias(
            "top_count"
        ),
    )


# =============================================================================
# Distributed ML — multinomial Naive Bayes with Laplace smoothing:
# TRAIN on even doc_id blocks (doc_id//20 parity, so every class lands
# in both splits) (training = ONE hash-agg over (class, token) — the
# template for every count-based model at 100 TB), SCORE the odd
# blocks, report per-class accuracy. Cross-engine determinism of the
# log-likelihood sum: each per-token lp is quantized ONCE to a scaled
# integer floor(ln(p)*1e6 + 0.5) and summed as BIGINTs — integer
# addition is associative/commutative, so the argmax input is
# bit-identical across engines REGARDLESS of summation order, with no
# sorted-fold (the previous spelling collect_list'ed + array_sort'ed
# doubles per (doc, class) purely to pin float addition order — a
# corpus-scale list shuffle replaced here by an 8-byte partial-
# combinable sum).
# =============================================================================
_NB_TOKS = (
    r"list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"
)


@q(
    "ml_naive_bayes_source",
    f"""
    WITH train AS (
      SELECT doc_id, source, {_NB_TOKS} AS toks
      FROM documents WHERE (doc_id // 20) % 2 = 0
    ),
    test AS (
      SELECT doc_id, source AS actual, {_NB_TOKS} AS toks
      FROM documents WHERE (doc_id // 20) % 2 = 1
    ),
    tr_tok AS (SELECT source, unnest(toks) AS token FROM train),
    model AS (
      SELECT source, token, count(*)::BIGINT AS cnt FROM tr_tok GROUP BY 1, 2
    ),
    totals AS (SELECT source, sum(cnt)::BIGINT AS tot FROM model GROUP BY 1),
    vocab AS (SELECT count(DISTINCT token)::BIGINT AS v FROM model),
    ndocs AS (SELECT count(*)::BIGINT AS n FROM train),
    priors AS (SELECT source, count(*)::BIGINT AS nd FROM train GROUP BY 1),
    classes AS (
      SELECT t.source, t.tot, v.v,
             floor(ln(p.nd / n.n::DOUBLE) * 1000000 + 0.5)::BIGINT AS lpp_i,
             floor(ln(1.0 / (t.tot + v.v)::DOUBLE) * 1000000 + 0.5)::BIGINT
               AS lpd_i
      FROM totals t JOIN priors p USING (source), vocab v, ndocs n
    ),
    model_lp AS (
      SELECT m.source, m.token,
             floor(ln((m.cnt + 1) / (c.tot + c.v)::DOUBLE)
                   * 1000000 + 0.5)::BIGINT AS lp_i
      FROM model m JOIN classes c USING (source)
    ),
    tt AS (SELECT doc_id, unnest(toks) AS token FROM test),
    seen AS (
      SELECT tt.doc_id, ml.source,
             sum(ml.lp_i)::BIGINT AS s_seen, count(*)::BIGINT AS n_seen
      FROM tt JOIN model_lp ml USING (token) GROUP BY 1, 2
    ),
    doc_toks AS (
      SELECT doc_id, actual, len(toks)::BIGINT AS n_toks
      FROM test WHERE len(toks) > 0
    ),
    scores AS (
      SELECT d.doc_id, d.actual, c.source,
             coalesce(s.s_seen, 0)
               + (d.n_toks - coalesce(s.n_seen, 0)) * c.lpd_i
               + c.lpp_i AS s
      FROM doc_toks d CROSS JOIN classes c
      LEFT JOIN seen s ON s.doc_id = d.doc_id AND s.source = c.source
    ),
    pred AS (
      SELECT doc_id, actual, source AS predicted,
             row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, source)
               AS rk
      FROM scores
    )
    SELECT actual AS source, count(*)::BIGINT AS n_test,
           sum(CASE WHEN predicted = actual THEN 1 ELSE 0 END)::BIGINT
             AS n_correct,
           floor(sum(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE * 1000000 + 0.5) / 1000000 AS accuracy
    FROM pred WHERE rk = 1 GROUP BY 1
    """,
)
def ml_naive_bayes_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", _tokens("text").alias("toks")
    )
    train = docs.filter(F.expr("doc_id div 20") % 2 == 0)
    # Tokenize the TEST corpus exactly once too (round-9 verdict item 2:
    # it was scanned+tokenized twice — the token explode for scoring and
    # the size() grid each ran their own corpus pass). The pinned frame
    # is exactly the three columns both consumers need; lazy pin, so a
    # plan-only caller still executes no job at construction.
    test = (
        docs.filter(F.expr("doc_id div 20") % 2 == 1)
        .withColumnRenamed("source", "actual")
        .localCheckpoint(eager=False)
    )
    tr_tok = train.select("source", F.explode("toks").alias("token"))
    # Tokenize the TRAIN corpus exactly once: the (class, token) count
    # frame is pinned (|classes| x |vocab| rows — bounded by the
    # vocabulary, never by the corpus), and totals/vocab are derived
    # from it by exact integer re-aggregation instead of each running
    # their own scan+tokenize+explode pass over the documents (3
    # corpus passes -> 1; priors/ndocs never tokenize at all — column
    # pruning drops `toks` since they only read doc_id/source).
    model = (
        tr_tok.groupBy("source", "token")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    totals = model.groupBy("source").agg(F.sum("cnt").alias("tot"))
    vocab = model.select("token").distinct().agg(F.count("*").alias("v"))
    # the train rowcount is the SUM of the per-class priors — derived
    # from the |classes|-row frame instead of its own (column-pruned,
    # but at 100 TB still full) pass over the train corpus. The priors
    # frame must be PINNED for the saving to be real: unpinned, the
    # ndocs aggregate re-derives priors' whole lineage and re-scans
    # train anyway (caught by the PLANS.md scan count going 4 -> 5
    # exchanges instead of 4 -> 3 scans on the first attempt).
    priors = (
        train.groupBy("source")
        .agg(F.count("*").alias("nd"))
        .localCheckpoint(eager=False)
    )
    ndocs = priors.agg(F.sum("nd").alias("n"))
    def _lpi(ratio):
        # floor(ln(p) * 1e6 + 0.5) as BIGINT — ONE quantization of each
        # log-probability; all downstream arithmetic is exact integers
        return F.floor(F.log(ratio) * 1000000 + F.lit(0.5)).cast("long")

    classes = (
        # broadcast hint: the pinned priors frame has no stats, so the
        # static planner would SMJ this |classes|-row join (r7 gotcha)
        totals.join(F.broadcast(priors), "source")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "source",
            "tot",
            "v",
            _lpi(F.col("nd") / F.col("n").cast("double")).alias("lpp_i"),
            _lpi(
                F.lit(1.0) / (F.col("tot") + F.col("v")).cast("double")
            ).alias("lpd_i"),
        )
    )
    # Scoring WITHOUT the |classes|x token-stream expansion: the exploded
    # test-token stream joins the broadcast model on `token` ALONE, so a
    # (token, class) row exists only where the class actually saw the
    # token — shuffled volume is |token-class hits|, not
    # |tokens| x |classes|. Tokens a class never saw all contribute the
    # SAME per-class integer constant lpd_i = floor(ln(1/(tot+v))*1e6
    # + 0.5); the per-(doc, class) score is s_seen + n_unseen * lpd_i +
    # lpp_i — exact BIGINT arithmetic, so the rebuild equals the dense
    # formulation identically with NO per-pair list/sort machinery (the
    # `seen` shuffle carries two longs per (doc, class), not an lp
    # array). The dense frame that remains is only |test docs| x
    # |classes| (the correction grid), never token-scaled.
    model_lp = (
        model.join(F.broadcast(classes.select("source", "tot", "v")), "source")
        .select(
            "source",
            "token",
            _lpi(
                (F.col("cnt") + 1)
                / (F.col("tot") + F.col("v")).cast("double")
            ).alias("lp_i"),
        )
    )
    classes_full = classes.select("source", "lpp_i", "lpd_i")
    tt = test.select("doc_id", F.explode("toks").alias("token"))
    seen = (
        tt.join(F.broadcast(model_lp), "token")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("lp_i").alias("s_seen"),
            F.count("*").alias("n_seen"),
        )
    )
    grid = (
        test.filter(F.size("toks") > 0)
        .select("doc_id", "actual", F.size("toks").cast("long").alias("n_toks"))
        .crossJoin(F.broadcast(classes_full))
    )
    # shuffled-hash, not sort-merge: both sides are doc-scale so neither
    # broadcasts, but the join needs no sort — `seen` arrives already
    # hash-partitioned on (doc_id, source) from its groupBy, so only the
    # grid side shuffles and the build side is the sparse hit frame
    scores = (
        grid.join(seen.hint("shuffle_hash"), ["doc_id", "source"], "left")
        .select(
            "doc_id",
            "actual",
            "source",
            (
                F.coalesce(F.col("s_seen"), F.lit(0))
                + (F.col("n_toks") - F.coalesce(F.col("n_seen"), F.lit(0)))
                * F.col("lpd_i")
                + F.col("lpp_i")
            ).alias("s"),
        )
    )
    # Argmax as ONE partial-combinable aggregate (min_by over the
    # (-s, source) struct key == the oracle's row_number() ORDER BY
    # s DESC, source ASC pick): the row_number window spelling cost a
    # full sort-shuffle of the |docs| x |classes| grid; min_by combines
    # map-side so the exchange carries one row per (partition, doc).
    # s is a BIGINT sum of scaled log-probabilities, so negation and
    # comparison are exact.
    pred = scores.groupBy("doc_id").agg(
        F.min_by(
            F.struct(
                F.col("source").alias("predicted"), F.col("actual")
            ),
            F.struct((-F.col("s")).alias("ns"), F.col("source")),
        ).alias("m")
    ).select(
        F.col("m.predicted").alias("predicted"),
        F.col("m.actual").alias("actual"),
    )
    correct = F.sum(
        F.when(F.col("predicted") == F.col("actual"), 1).otherwise(0)
    )
    return pred.groupBy(F.col("actual").alias("source")).agg(
        F.count("*").alias("n_test"),
        correct.cast("bigint").alias("n_correct"),
        _r(correct / F.count("*").cast("double"), 6).alias("accuracy"),
    )


# =============================================================================
# Entity resolution — blocked record linkage over part names: hash-agg
# to DISTINCT normalized names first (the candidate space is the name
# VOCABULARY, not the row count), block on the name's last token, pair
# within blocks, and keep Levenshtein <= 3 matches with their supports.
# =============================================================================
@q(
    "er_blocked_name_linkage",
    """
    WITH names AS (
      SELECT p_name, split_part(p_name, ' ', 2) AS noun,
             count(*)::BIGINT AS support
      FROM part GROUP BY 1, 2
    )
    SELECT a.p_name AS name1, b.p_name AS name2, a.noun,
           levenshtein(a.p_name, b.p_name)::BIGINT AS lev,
           a.support AS support1, b.support AS support2
    FROM names a JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def er_blocked_name_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    names = part.groupBy(
        # F.get + coalesce-to-'' for single-token names: DuckDB's
        # split_part(name, ' ', 2) yields '' there, while getItem(1)
        # THROWS INVALID_ARRAY_INDEX under ANSI mode (Spark 4 default)
        # and would return NULL (silently dropping the row from the
        # block equi-join) under non-ANSI — F.get returns NULL
        # out-of-bounds in either mode, and '' keeps both engines
        # pairing such names inside the same empty-noun block
        # (pinned by test_er_linkage_single_token_name_blocks_as_empty)
        "p_name",
        F.coalesce(F.get(F.split("p_name", " "), 1), F.lit("")).alias("noun"),
    ).agg(F.count("*").alias("support"))
    a = names.select(
        F.col("p_name").alias("name1"),
        "noun",
        F.col("support").alias("support1"),
    )
    b = names.select(
        F.col("p_name").alias("name2"),
        F.col("noun").alias("noun2"),
        F.col("support").alias("support2"),
    )
    pairs = a.join(
        b,
        (F.col("noun") == F.col("noun2")) & (F.col("name1") < F.col("name2")),
    )
    # threshold form: Spark's banded DP costs O(len*k) instead of
    # O(len^2) and early-outs on a length gap > k — the verify step's
    # cost on hostile-length names drops from quadratic to linear
    # (returns -1 when the distance exceeds the bound; for kept rows
    # the value IS the distance, so the output column is unchanged)
    lev = F.levenshtein("name1", "name2", 3)
    return pairs.filter(lev >= 0).select(
        "name1",
        "name2",
        "noun",
        lev.cast("bigint").alias("lev"),
        "support1",
        "support2",
    )


# =============================================================================
# Entity resolution — PHONETIC blocking (round-6 verdict item 4). The
# blocking key is a Soundex-style consonant-class code: first letter +
# the run-collapsed consonant-class digits of the rest, truncated to 4
# chars. Spark's soundex() has no DuckDB twin, so the code is spelled as
# the SAME explicit lower/strip -> translate -> per-digit run-collapse
# chain in both engines (the oracle-safe route; RE2 on the DuckDB side
# has no pattern backrefs, hence six literal '<d>+' collapses instead
# of '(\\d)\\1+'). Phonetic blocks are coarser than exact-token blocks:
# 'old widget' / 'old gear' / 'old gizmo' share o432, so spelling-level
# noise in any token still lands candidate pairs in one block.
# =============================================================================
_PHONETIC_CLASSES = ("bfpvcgjkqsxzdtlmnrhwyaeiou", "111122222222334556")


def _phonetic_key(col) -> "F.Column":
    """Consonant-class blocking key of a name (Spark side; every step
    mirrors `_sql_phonetic_key` exactly). Whole-stage-codegen native
    string ops — the key is computed in-row with no shuffle."""
    base = F.regexp_replace(F.lower(col), "[^a-z]", "")
    digits = F.translate(
        base.substr(F.lit(2), F.length(base)), *_PHONETIC_CLASSES
    )
    for d in "123456":
        digits = F.regexp_replace(digits, d + "+", d)
    return F.concat(base.substr(1, 1), digits.substr(1, 3))


def _sql_phonetic_key(expr: str) -> str:
    """DuckDB spelling of `_phonetic_key` over an expression."""
    frm, to = _PHONETIC_CLASSES
    collapsed = f"translate(substr(base,2), '{frm}', '{to}')"
    for d in "123456":
        collapsed = f"regexp_replace({collapsed}, '{d}+', '{d}')"
    return (
        f"(SELECT substr(base,1,1) || substr({collapsed}, 1, 3) FROM "
        f"(SELECT regexp_replace(lower({expr}), '[^a-z]', '', 'g') AS base))"
    )


@q(
    "er_phonetic_blocked_pairs",
    f"""
    WITH names AS (
      SELECT p_name, count(*)::BIGINT AS support FROM part GROUP BY 1
    ), keyed AS (
      SELECT p_name, support, {_sql_phonetic_key("p_name")} AS pkey
      FROM names
    )
    SELECT a.p_name AS name1, b.p_name AS name2, a.pkey,
           levenshtein(a.p_name, b.p_name)::BIGINT AS lev,
           round(1.0 - levenshtein(a.p_name, b.p_name)::DOUBLE
                 / greatest(length(a.p_name), length(b.p_name)), 6) AS sim,
           a.support AS support1, b.support AS support2
    FROM keyed a JOIN keyed b ON a.pkey = b.pkey AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def er_phonetic_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic-blocked linkage: DISTINCT names (vocabulary-scale, never
    row-scale) -> in-row phonetic key -> self equi-join ON THE KEY (one
    hash shuffle on pkey; no cross-block pair is ever materialized —
    pinned by test_er_phonetic_block_join_is_equi) -> Levenshtein
    verify + normalized similarity on survivors only. At 100 TB the
    candidate space is (sum over blocks of n_b^2), which
    er_phonetic_block_audit profiles; the verify cost never touches the
    corpus again."""
    part = t(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").alias("support"))
    keyed = names.select(
        "p_name", "support", _phonetic_key(F.col("p_name")).alias("pkey")
    )
    a = keyed.select(
        F.col("p_name").alias("name1"),
        "pkey",
        F.col("support").alias("support1"),
    )
    b = keyed.select(
        F.col("p_name").alias("name2"),
        F.col("pkey").alias("pkey2"),
        F.col("support").alias("support2"),
    )
    # threshold form: banded O(len*k) DP, -1 past the bound (value
    # preserved for kept rows — see er_blocked_name_linkage)
    lev = F.levenshtein("name1", "name2", 4)
    return (
        a.join(
            b,
            (F.col("pkey") == F.col("pkey2"))
            & (F.col("name1") < F.col("name2")),
        )
        .filter(lev >= 0)
        .select(
            "name1",
            "name2",
            "pkey",
            lev.cast("bigint").alias("lev"),
            F.round(
                1.0
                - lev.cast("double")
                / F.greatest(F.length("name1"), F.length("name2")),
                6,
            ).alias("sim"),
            "support1",
            "support2",
        )
    )


@q(
    "er_phonetic_block_audit",
    f"""
    WITH names AS (
      SELECT p_name, count(*)::BIGINT AS support FROM part GROUP BY 1
    ), keyed AS (
      SELECT p_name, support, {_sql_phonetic_key("p_name")} AS pkey
      FROM names
    )
    SELECT pkey,
           count(*)::BIGINT AS block_size,
           (count(*) * (count(*) - 1) / 2)::BIGINT AS candidate_pairs,
           sum(support)::BIGINT AS total_support,
           min(p_name) AS sample_name
    FROM keyed GROUP BY 1
    ORDER BY block_size DESC, pkey
    """,
)
def er_phonetic_block_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality audit — the number every ER pipeline needs
    BEFORE running linkage at scale: per-block candidate-pair counts
    (sum n_b*(n_b-1)/2 is the exact join output size of
    er_phonetic_blocked_pairs' equi-join, i.e. the verify workload) and
    the support mass per block, so a skewed hot block is visible as a
    number instead of a straggler task. One hash-agg on the key."""
    part = t(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").alias("support"))
    keyed = names.select(
        "p_name", "support", _phonetic_key(F.col("p_name")).alias("pkey")
    )
    n = F.count("*")
    return (
        keyed.groupBy("pkey")
        .agg(
            n.cast("bigint").alias("block_size"),
            (n * (n - F.lit(1)) / F.lit(2)).cast("bigint").alias(
                "candidate_pairs"
            ),
            F.sum("support").cast("bigint").alias("total_support"),
            F.min("p_name").alias("sample_name"),
        )
        .orderBy(F.desc("block_size"), "pkey")
    )


@q(
    "er_entity_clusters",
    f"""
    WITH RECURSIVE names AS (
      SELECT p_name, count(*)::BIGINT AS support FROM part GROUP BY 1
    ), keyed AS (
      SELECT p_name, support, {_sql_phonetic_key("p_name")} AS pkey
      FROM names
    ), pairs AS (
      SELECT a.p_name AS n1, b.p_name AS n2
      FROM keyed a JOIN keyed b ON a.pkey = b.pkey AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 4
    ), edges AS (
      SELECT n1, n2 FROM pairs UNION SELECT n2, n1 FROM pairs
    ), reach AS (
      SELECT n1 AS node, n2 AS r FROM edges
      UNION
      SELECT rc.node, e.n2 FROM reach rc JOIN edges e ON rc.r = e.n1
      WHERE e.n2 <> rc.node
    ), labels AS (
      SELECT node, least(node, min(r)) AS cluster FROM reach GROUP BY node
    ), assigned AS (
      SELECT k.p_name, k.support,
             coalesce(l.cluster, k.p_name) AS entity_id
      FROM keyed k LEFT JOIN labels l ON k.p_name = l.node
    )
    SELECT entity_id,
           count(*)::BIGINT AS n_members,
           sum(support)::BIGINT AS total_support
    FROM assigned GROUP BY 1
    """,
)
def er_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: phonetic-blocked fuzzy pairs ->
    connected components -> one canonical ENTITY per component (its
    lexicographic-min member name), with member count and support mass.
    The transitive step is what pair queries can't express: 'red
    widget'~'rad widget' and 'rad widget'~'rod widget' merge all three
    even when the ends are > the edit threshold apart. Spark side runs
    min-label propagation over the (vocabulary-scale) pair graph with
    STRING node ids — connected_components keeps non-numeric id types
    native (a long cast would NULL them); singleton names (no fuzzy
    partner) stay their own entity via the left join + coalesce. The
    DuckDB oracle computes the identical fixpoint as a recursive-CTE
    transitive closure — tractable because the closure runs on the
    pruned pair graph, never the corpus."""
    part = t(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").alias("support"))
    keyed = names.select(
        "p_name", "support", _phonetic_key(F.col("p_name")).alias("pkey")
    )
    a = keyed.select(F.col("p_name").alias("name1"), "pkey")
    b = keyed.select(
        F.col("p_name").alias("name2"), F.col("pkey").alias("pkey2")
    )
    pairs = a.join(
        b,
        (F.col("pkey") == F.col("pkey2")) & (F.col("name1") < F.col("name2")),
    ).filter(F.levenshtein("name1", "name2", 4) >= 0)
    from social_and_media_data_ingestion_spark.operators.dedup import (
        connected_components,
    )

    cc = connected_components(
        pairs.select("name1", "name2"), src="name1", dst="name2"
    )
    # shuffled-hash, not sort-merge: the label frame is a pinned
    # ExistingRDD scan with no stats, so the static planner would pick
    # an SMJ and AQE never revisits it — the hint keeps the join
    # sort-free without assuming the label side broadcasts (on an
    # adversarial corpus every name can have a fuzzy partner, making
    # it vocabulary-scale)
    assigned = names.join(
        cc.hint("shuffle_hash"), names.p_name == cc.id, "left"
    ).select(
        F.coalesce("cluster_id", "p_name").alias("entity_id"), "support"
    )
    return assigned.groupBy("entity_id").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sum("support").cast("bigint").alias("total_support"),
    )


@q(
    "er_blocking_recall_audit",
    f"""
    WITH names AS (
      SELECT DISTINCT p_name FROM part
    ), keyed AS (
      SELECT p_name, {_sql_phonetic_key("p_name")} AS pkey,
             split_part(p_name, ' ', 2) AS noun
      FROM names
    ), ap AS (
      SELECT (a.pkey = b.pkey AND a.pkey <> '')::INTEGER AS same_pk,
             (a.noun = b.noun AND a.noun <> '')::INTEGER AS same_noun,
             (levenshtein(a.p_name, b.p_name) <= 4)::INTEGER AS is_match
      FROM keyed a JOIN keyed b ON a.p_name < b.p_name
    ), s AS (
      SELECT 'phonetic' AS strategy, same_pk AS cand, is_match FROM ap
      UNION ALL
      SELECT 'last_token', same_noun, is_match FROM ap
      UNION ALL
      SELECT 'union', greatest(same_pk, same_noun), is_match FROM ap
    )
    SELECT strategy,
           count(*)::BIGINT AS n_possible_pairs,
           sum(cand)::BIGINT AS n_candidate_pairs,
           sum(is_match)::BIGINT AS n_true_matches,
           sum(cand * is_match)::BIGINT AS n_caught,
           CASE WHEN sum(is_match) = 0 THEN NULL
                ELSE round(sum(cand * is_match)::DOUBLE
                           / sum(is_match), 6) END AS pair_completeness,
           round(1.0 - sum(cand)::DOUBLE / count(*), 6)
             AS reduction_ratio
    FROM s GROUP BY 1
    """,
)
def er_blocking_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking EVALUATION — per strategy, the two numbers that justify
    (or condemn) a blocking key before running linkage at scale: pair
    completeness (fraction of true fuzzy matches landing in a shared
    block — blocking RECALL; a miss is silent data loss) and reduction
    ratio (fraction of the all-pairs space eliminated — the point of
    blocking). Three strategies side by side: the phonetic key of the
    full name, the last-token key (er_blocked_name_linkage's pass),
    and their UNION — because single-key blocking under-recalls by
    construction (the phonetic pass catches vowel/spelling variants,
    completeness 0.07 alone on this vocabulary; the token pass catches
    same-noun pairs, and the union is the standard multi-pass answer).
    Ground truth is the full quadratic pair space over DISTINCT names,
    which makes this an explicit AUDIT in the dedup_minhash_calibration
    mold: run it on a name sample to tune keys, never on an unbounded
    vocabulary — the production linkage paths stay candidates-only.
    One broadcast all-pairs join; the pair stream triples through the
    strategy explode but partial-aggregates map-side onto 3 keys."""
    part = t(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    keyed = names.select(
        "p_name",
        _phonetic_key(F.col("p_name")).alias("pkey"),
        F.coalesce(F.get(F.split("p_name", " "), 1), F.lit("")).alias("noun"),
    )
    a = keyed.select(
        F.col("p_name").alias("n1"),
        F.col("pkey").alias("k1"),
        F.col("noun").alias("t1"),
    )
    b = keyed.select(
        F.col("p_name").alias("n2"),
        F.col("pkey").alias("k2"),
        F.col("noun").alias("t2"),
    )
    # ''-key guard, mirroring the production paths: er_union_blocked
    # _linkage and er_resolution_pipeline DROP '' blocks (a name with no
    # second token / no consonants is unblockable in that pass), so the
    # audit must not count ''=='' as a candidate either — otherwise its
    # reconciliation invariant (union n_caught == linkage row count)
    # silently breaks on any vocabulary with two single-token or
    # letterless names within the lev bound.
    same_pk = ((F.col("k1") == F.col("k2")) & (F.col("k1") != "")).cast("int")
    same_noun = ((F.col("t1") == F.col("t2")) & (F.col("t1") != "")).cast("int")
    ap = a.join(F.broadcast(b), F.col("n1") < F.col("n2")).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("phonetic").alias("strategy"),
                    same_pk.alias("cand"),
                ),
                F.struct(
                    F.lit("last_token").alias("strategy"),
                    same_noun.alias("cand"),
                ),
                F.struct(
                    F.lit("union").alias("strategy"),
                    F.greatest(same_pk, same_noun).alias("cand"),
                ),
            )
        ).alias("s"),
        # threshold form matters MOST here: the audit is the one
        # deliberate all-pairs instrument, so every pair pays the DP
        (F.levenshtein("n1", "n2", 4) >= 0).cast("int").alias("is_match"),
    )
    caught = F.sum(F.col("s.cand") * F.col("is_match"))
    true_m = F.sum("is_match")
    cand = F.sum("s.cand")
    return ap.groupBy(F.col("s.strategy").alias("strategy")).agg(
        F.count("*").cast("bigint").alias("n_possible_pairs"),
        cand.cast("bigint").alias("n_candidate_pairs"),
        true_m.cast("bigint").alias("n_true_matches"),
        caught.cast("bigint").alias("n_caught"),
        F.when(true_m == 0, F.lit(None).cast("double"))
        .otherwise(F.round(caught.cast("double") / true_m, 6))
        .alias("pair_completeness"),
        F.round(F.lit(1.0) - cand.cast("double") / F.count("*"), 6).alias(
            "reduction_ratio"
        ),
    )


@q(
    "er_union_blocked_linkage",
    f"""
    WITH names AS (
      SELECT p_name, count(*)::BIGINT AS support FROM part GROUP BY 1
    ), keyed AS (
      SELECT p_name, support, {_sql_phonetic_key("p_name")} AS pkey,
             split_part(p_name, ' ', 2) AS noun
      FROM names
    ), blocks AS (
      SELECT * FROM (
        SELECT p_name, support, 'p' AS pass, pkey AS bkey FROM keyed
        UNION ALL
        SELECT p_name, support, 't', noun FROM keyed
      ) WHERE bkey <> ''
    ), passes AS (
      SELECT a.p_name AS name1, b.p_name AS name2,
             a.support AS support1, b.support AS support2,
             (a.pass = 'p')::INTEGER AS vp, (a.pass = 't')::INTEGER AS vt
      FROM blocks a JOIN blocks b
        ON a.pass = b.pass AND a.bkey = b.bkey AND a.p_name < b.p_name
    ), cand AS (
      SELECT name1, name2,
             min(support1) AS support1, min(support2) AS support2,
             max(vp)::BIGINT AS via_phonetic, max(vt)::BIGINT AS via_token
      FROM passes GROUP BY 1, 2
    )
    SELECT name1, name2,
           levenshtein(name1, name2)::BIGINT AS lev,
           round(1.0 - levenshtein(name1, name2)::DOUBLE
                 / greatest(length(name1), length(name2)), 6) AS sim,
           via_phonetic, via_token, support1, support2
    FROM cand
    WHERE levenshtein(name1, name2) <= 4
    """,
)
def er_union_blocked_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass (UNION-blocked) production linkage — the cure the
    blocking-recall audit quantified: single-key blocking under-recalls
    by construction (on this vocabulary phonetic alone catches 0.07 of
    true fuzzy matches, last-token 0.62, their union 0.69 —
    er_blocking_recall_audit), so candidates come from the UNION of the
    phonetic-key and last-token-key blocks. Spelled as ONE composite-key
    equi-join: each distinct name emits a (pass, block-key) row per
    blocking pass via an in-row explode, and candidates form through a
    single self equi-join on (pass, bkey) — one shuffle covers every
    pass, no cross-block pair ever materializes, and adding a third
    blocking pass is one more array element, not another join. Pairs
    caught by both passes are deduplicated by a hash-agg with max()
    keeping per-pass provenance (via_phonetic/via_token). The query
    declares the Levenshtein verify above that dedup, and Catalyst
    proves it only references the grouping keys and PUSHES it below the
    aggregate into the join's residual condition — the plan you want at
    100 TB: candidates failing the verify are pruned before the
    pair-dedup shuffle ever sees them, and the only cost is one extra
    in-row lev evaluation per ADDITIONAL pass that blocks an
    already-matched pair (bounded by the pass count, never by the
    corpus). Pinned by test_er_union_linkage_plan: the verify rides the
    equi join as a residual filter, never a join key, and never a
    cartesian. The audit's `union` row and this path reconcile by
    construction: its n_caught equals this query's row count (pinned by
    test_er_union_linkage_matches_recall_audit)."""
    part = t(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").alias("support"))
    keyed = names.select(
        "p_name",
        "support",
        _phonetic_key(F.col("p_name")).alias("pkey"),
        F.coalesce(F.get(F.split("p_name", " "), 1), F.lit("")).alias("noun"),
    )
    blocks = keyed.select(
        "p_name",
        "support",
        F.explode(
            F.array(
                F.struct(
                    F.lit("p").alias("pass"), F.col("pkey").alias("bkey")
                ),
                F.struct(
                    F.lit("t").alias("pass"), F.col("noun").alias("bkey")
                ),
            )
        ).alias("bb"),
    ).select("p_name", "support", "bb.pass", "bb.bkey")
    # ''-block guard (same invariant as LSH's bucket != ''): a name with
    # no second token — or an all-vowel name whose phonetic key is empty
    # — must NOT participate in that pass. Without this every
    # unblockable name lands in one shared '' block whose pair expansion
    # is quadratic in the unblockable count: the garbage hot bucket.
    # Filtered AFTER the explode (generator output), mirrored in the
    # oracle's blocks CTE, so both engines drop the same rows.
    blocks = blocks.filter(F.col("bkey") != "")
    a = blocks.select(
        F.col("p_name").alias("name1"),
        F.col("support").alias("support1"),
        "pass",
        "bkey",
    )
    b = blocks.select(
        F.col("p_name").alias("name2"),
        F.col("support").alias("support2"),
        F.col("pass").alias("pass2"),
        F.col("bkey").alias("bkey2"),
    )
    passes = a.join(
        b,
        (F.col("pass") == F.col("pass2"))
        & (F.col("bkey") == F.col("bkey2"))
        & (F.col("name1") < F.col("name2")),
    ).select(
        "name1",
        "name2",
        "support1",
        "support2",
        (F.col("pass") == "p").cast("int").alias("vp"),
        (F.col("pass") == "t").cast("int").alias("vt"),
    )
    cand = passes.groupBy("name1", "name2").agg(
        F.min("support1").alias("support1"),
        F.min("support2").alias("support2"),
        F.max("vp").cast("bigint").alias("via_phonetic"),
        F.max("vt").cast("bigint").alias("via_token"),
    )
    # threshold form: banded O(len*k) DP, -1 past the bound (value
    # preserved for kept rows — see er_blocked_name_linkage)
    lev = F.levenshtein("name1", "name2", 4)
    return cand.filter(lev >= 0).select(
        "name1",
        "name2",
        lev.cast("bigint").alias("lev"),
        F.round(
            1.0
            - lev.cast("double")
            / F.greatest(F.length("name1"), F.length("name2")),
            6,
        ).alias("sim"),
        "via_phonetic",
        "via_token",
        "support1",
        "support2",
    )


@q(
    "er_resolution_pipeline",
    f"""
    WITH RECURSIVE names AS (
      SELECT p_name, count(*)::BIGINT AS support FROM part GROUP BY 1
    ), keyed AS (
      SELECT p_name, support, {_sql_phonetic_key("p_name")} AS pkey,
             split_part(p_name, ' ', 2) AS noun
      FROM names
    ), blocks AS (
      SELECT * FROM (
        SELECT p_name, 'p' AS pass, pkey AS bkey FROM keyed
        UNION ALL
        SELECT p_name, 't', noun FROM keyed
      ) WHERE bkey <> ''
    ), pairs AS (
      SELECT DISTINCT a.p_name AS n1, b.p_name AS n2
      FROM blocks a JOIN blocks b
        ON a.pass = b.pass AND a.bkey = b.bkey AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 4
    ), edges AS (
      SELECT n1, n2 FROM pairs UNION SELECT n2, n1 FROM pairs
    ), reach AS (
      SELECT n1 AS node, n2 AS r FROM edges
      UNION
      SELECT rc.node, e.n2 FROM reach rc JOIN edges e ON rc.r = e.n1
      WHERE e.n2 <> rc.node
    ), labels AS (
      SELECT node, least(node, min(r)) AS cluster FROM reach GROUP BY node
    ), assigned AS (
      SELECT k.p_name, k.support,
             coalesce(l.cluster, k.p_name) AS entity_id
      FROM keyed k LEFT JOIN labels l ON k.p_name = l.node
    ), members AS (
      SELECT entity_id, count(*)::BIGINT AS n_members,
             sum(support)::BIGINT AS total_support
      FROM assigned GROUP BY 1
    ), pstats AS (
      SELECT a.entity_id, count(*)::BIGINT AS n_pairs,
             max(levenshtein(p.n1, p.n2))::BIGINT AS max_lev
      FROM pairs p JOIN assigned a ON p.n1 = a.p_name
      GROUP BY 1
    )
    SELECT m.entity_id, m.n_members, m.total_support,
           coalesce(s.n_pairs, 0)::BIGINT AS n_pairs, s.max_lev
    FROM members m LEFT JOIN pstats s ON m.entity_id = s.entity_id
    """,
)
def er_resolution_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION entity-resolution pipeline end-to-end under one
    oracle — the `corpus_full_curation` pattern applied to ER: multi-
    pass UNION blocking (phonetic + last-token composite-key explode,
    ''-blocks guarded out, one self equi-join covers every pass — the
    er_union_blocked_linkage candidate machinery) -> Levenshtein verify
    in the join residual -> pair dedup -> transitive closure via
    min-label connected components (string node ids stay native) ->
    one report row per ENTITY: member count, support mass, verified
    intra-entity pair count, and max intra-pair edit distance (a
    diameter proxy — chains merge members farther apart than the edit
    threshold, and max_lev shows how close a cluster sails to that).
    Singleton names stay their own entity (left join + coalesce) with
    n_pairs 0 and NULL max_lev. vs er_entity_clusters: that query
    clusters the PHONETIC pass alone (completeness 0.07 on this
    vocabulary per er_blocking_recall_audit); this one clusters the
    union candidates (0.69) — the recall the audit says production
    needs. Scale shape: the pair frame is lazily pinned (it feeds the
    CC loop AND the pair-stats agg; unpinned, the blocking self-join
    would run twice), CC pins its doubled edge set internally and its
    label output is consumed by both the assignment join and the pair
    stats — all joins against pinned no-stats frames carry the
    shuffle_hash hint (static planner would pick SMJ, AQE never
    revisits pinned segments). The DuckDB oracle computes the identical
    fixpoint as a recursive-CTE closure over the same union-blocked
    pair graph."""
    part = t(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").alias("support"))
    keyed = names.select(
        "p_name",
        "support",
        _phonetic_key(F.col("p_name")).alias("pkey"),
        F.coalesce(F.get(F.split("p_name", " "), 1), F.lit("")).alias("noun"),
    )
    blocks = (
        keyed.select(
            "p_name",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("p").alias("pass"), F.col("pkey").alias("bkey")
                    ),
                    F.struct(
                        F.lit("t").alias("pass"), F.col("noun").alias("bkey")
                    ),
                )
            ).alias("bb"),
        )
        .select("p_name", "bb.pass", "bb.bkey")
        # ''-block guard: unblockable names (no second token / letterless
        # phonetic base) never band — the same garbage-hot-bucket
        # invariant as er_union_blocked_linkage and the LSH operator
        .filter(F.col("bkey") != "")
    )
    a = blocks.select(F.col("p_name").alias("name1"), "pass", "bkey")
    b = blocks.select(
        F.col("p_name").alias("name2"),
        F.col("pass").alias("pass2"),
        F.col("bkey").alias("bkey2"),
    )
    pairs = (
        a.join(
            b,
            (F.col("pass") == F.col("pass2"))
            & (F.col("bkey") == F.col("bkey2"))
            & (F.col("name1") < F.col("name2")),
        )
        # declared above the dedup, pushed into the join residual by
        # Catalyst (references only the would-be grouping keys): failed
        # candidates die before the pair-dedup shuffle
        .filter(F.levenshtein("name1", "name2", 4) >= 0)
        .select("name1", "name2")
        .distinct()
    ).localCheckpoint(eager=False)
    from social_and_media_data_ingestion_spark.operators.dedup import (
        connected_components,
    )

    cc = connected_components(pairs, src="name1", dst="name2")
    assigned = names.join(
        cc.hint("shuffle_hash"), names.p_name == cc.id, "left"
    ).select(
        F.coalesce("cluster_id", "p_name").alias("entity_id"), "support"
    )
    members = assigned.groupBy("entity_id").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sum("support").cast("bigint").alias("total_support"),
    )
    pstats = (
        pairs.join(cc.hint("shuffle_hash"), pairs.name1 == cc.id)
        .groupBy(F.col("cluster_id").alias("pair_entity"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs_raw"),
            F.max(F.levenshtein("name1", "name2", 4))
            .cast("bigint")
            .alias("max_lev"),
        )
    )
    # shuffle_hash: both sides are aggregates whose inputs are pinned
    # no-stats frames, so the static planner would SMJ (two sorts) a
    # join that is already co-partitioned by its grouping keys
    return members.join(
        pstats.hint("shuffle_hash"),
        members.entity_id == pstats.pair_entity,
        "left",
    ).select(
        "entity_id",
        "n_members",
        "total_support",
        F.coalesce("n_pairs_raw", F.lit(0)).cast("bigint").alias("n_pairs"),
        "max_lev",
    )


# =============================================================================
# Curation — shingle-CONTAINMENT near-superset pairs. Containment
# C(A,B) = |S(A)∩S(B)|/|S(A)| is asymmetric: a short document embedded
# verbatim in a long one scores high containment but LOW Jaccard, so
# symmetric near-dedup misses it (the classic excerpt/boilerplate leak).
# Candidates come from the inverted shingle index (share >= 1 shingle),
# never a cross join.
# =============================================================================
_CONT_SHINGLES = (
    "CASE WHEN len(toks) >= 3 THEN "
    "list_transform(range(len(toks) - 2), "
    "i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3])) "
    "ELSE [] END"
)


@q(
    "dedup_shingle_containment",
    f"""
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    sh0 AS (
      SELECT DISTINCT doc_id AS id, unnest({_CONT_SHINGLES}) AS shingle
      FROM docs
    ),
    -- hot-shingle guard (mirrors max_df=256 in containment_pairs):
    -- shingles in > 256 documents are dropped before the self-join
    -- and from the size denominators
    rare AS (
      SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 256
    ),
    sh AS (SELECT id, shingle FROM sh0 WHERE shingle IN (SELECT shingle FROM rare)),
    sizes AS (SELECT id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor(i / sa.sz::DOUBLE * 1000000 + 0.5) / 1000000
             AS containment_ab,
           floor(i / sb.sz::DOUBLE * 1000000 + 0.5) / 1000000
             AS containment_ba,
           floor(i / (sa.sz + sb.sz - i)::DOUBLE * 1000000 + 0.5) / 1000000
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE greatest(i / sa.sz::DOUBLE, i / sb.sz::DOUBLE) >= 0.5
    """,
)
def dedup_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_and_media_data_ingestion_spark.operators.dedup import containment_pairs

    docs = t(spark, sf_dir, "documents")
    pairs = containment_pairs(docs, "doc_id", "text", n=3, threshold=0.5, max_df=256)
    return pairs.select(
        "id_a",
        "id_b",
        _r(F.col("containment_ab"), 6).alias("containment_ab"),
        _r(F.col("containment_ba"), 6).alias("containment_ba"),
        _r(F.col("jaccard"), 6).alias("jaccard"),
    )


# =============================================================================
# Graph — iterative k-core peeling (k=5, 3 rounds) of the supplier
# strong-partner graph (same bounded top-3 k-NN edge builder as
# graph_triangle_suppliers). k-core is the standard graph-cleaning step
# before community/embedding work: nodes outside the core are leaves
# and near-leaves whose removal cascades. Oracle: 3 unrolled CTE peels.
# =============================================================================
_KCORE_EDGES = """
    p AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    pairs AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*)::BIGINT AS n
      FROM p a JOIN p b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
      GROUP BY 1, 2
    ),
    knn AS (
      SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY n DESC, v) AS rk
      FROM pairs
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM knn WHERE rk <= 3
    )
"""


def _kcore_round_sql(r: int, k: int) -> str:
    prev = f"e{r - 1}"
    return f"""
    d{r} AS MATERIALIZED (
      SELECT n, count(*)::BIGINT AS d
      FROM (SELECT a AS n FROM {prev} UNION ALL SELECT b AS n FROM {prev})
      GROUP BY 1
    ),
    k{r} AS MATERIALIZED (SELECT n FROM d{r} WHERE d >= {k}),
    e{r} AS MATERIALIZED (
      SELECT a, b FROM {prev}
      WHERE a IN (SELECT n FROM k{r}) AND b IN (SELECT n FROM k{r})
    )
"""


_KCORE_K = 5
_KCORE_ROUNDS = 3


@q(
    "graph_kcore_suppliers",
    "WITH "
    + _KCORE_EDGES
    + ","
    + ",".join(_kcore_round_sql(r, _KCORE_K) for r in range(1, _KCORE_ROUNDS + 1))
    + "\n    "
    + "\n    UNION ALL ".join(
        f"SELECT {r}::BIGINT AS round,"
        f" (SELECT count(*) FROM k{r})::BIGINT AS n_nodes,"
        f" (SELECT count(*) FROM e{r})::BIGINT AS n_edges"
        for r in range(1, _KCORE_ROUNDS + 1)
    ),
)
def graph_kcore_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_and_media_data_ingestion_spark.operators.graph import kcore_peel

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("v"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("u").orderBy(F.desc("n"), F.asc("v"))
    edges = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    return kcore_peel(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


# =============================================================================
# Multi-objective top-k — the (price, size) Pareto SKYLINE of parts:
# every (price, min-size-at-price) point no other point beats on both
# axes. The scan first reduces to one row per distinct price (skyline-
# invariant), then membership is a DISTRIBUTED exclusive prefix-min
# over price order (operators/scale.global_running_min — range
# partition + O(partitions) offsets), replacing both the naive O(n²)
# dominance join and the single-task Window.orderBy funnel. Oracle:
# the naive NOT EXISTS dominance test.
# =============================================================================
@q(
    "part_price_skyline",
    """
    WITH ps AS (
      SELECT p_retailprice, p_size, count(*)::BIGINT AS cnt
      FROM part GROUP BY 1, 2
    ),
    red AS (
      SELECT p_retailprice, min(p_size) AS min_size FROM ps GROUP BY 1
    ),
    redc AS (
      SELECT r.p_retailprice, r.min_size::BIGINT AS min_size,
             ps.cnt AS n_parts
      FROM red r JOIN ps
        ON ps.p_retailprice = r.p_retailprice AND ps.p_size = r.min_size
    )
    SELECT p_retailprice, min_size, n_parts
    FROM redc a
    WHERE NOT EXISTS (
      SELECT 1 FROM redc b
      WHERE b.p_retailprice < a.p_retailprice AND b.min_size <= a.min_size
    )
    """,
)
def part_price_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_and_media_data_ingestion_spark.operators.scale import (
        global_running_min,
    )

    part = t(spark, sf_dir, "part")
    ps = part.groupBy("p_retailprice", "p_size").agg(F.count("*").alias("cnt"))
    red = (
        ps.groupBy("p_retailprice")
        .agg(F.min(F.struct(F.col("p_size"), F.col("cnt"))).alias("m"))
        .select(
            "p_retailprice",
            F.col("m.p_size").cast("bigint").alias("min_size"),
            F.col("m.cnt").alias("n_parts"),
        )
    )
    ranked = global_running_min(
        red,
        order_by=["p_retailprice"],
        value_col="min_size",
        out_col="strict_min",
        exclusive=True,
    )
    return ranked.filter(
        F.col("strict_min").isNull() | (F.col("min_size") < F.col("strict_min"))
    ).select("p_retailprice", "min_size", "n_parts")


# =============================================================================
# Sequence mining — top-20 most frequent 3-step event paths per the
# user clickstream (the "what do users do next" primitive behind
# sequential-pattern mining). ONE shuffle on user_id; the two leads are
# partition-local; global top-20 rides TakeOrderedAndProject with a
# full deterministic tie-break.
# =============================================================================
@q(
    "events_trigram_paths",
    """
    WITH seq AS (
      -- time-semantics contract (r13 fuzz): step order over
      -- unknown-time rows is ill-defined; excluded on both engines
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events WHERE ts IS NOT NULL
    )
    SELECT e1, e2, e3, count(*)::BIGINT AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    -- NULLS LAST on the tie-break (a NULL e1/e2 is a real path step
    -- from a NULL event_type; Spark's ASC default would rank it first)
    ORDER BY n DESC, e1 NULLS LAST, e2 NULLS LAST, e3 NULLS LAST LIMIT 20
    """,
)
def events_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.desc("n"),
            F.asc_nulls_last("e1"),
            F.asc_nulls_last("e2"),
            F.asc_nulls_last("e3"),
        )
        .limit(20)
    )


# =============================================================================
# Routing — rendezvous (highest-random-weight) hashing of doc_ids over
# 8 shards: shard(key) = argmax_s h_s(key). The property that matters
# at scale: adding/removing a shard only moves the keys whose argmax
# changed (~1/n of them) — unlike mod-N, which reshuffles everything.
# Entirely in-row (weight array + argmax), then one tiny per-shard agg.
# =============================================================================
_RDV_P = 2147483647
_RDV_AB = [
    (1103, 12345),
    (97, 1013904223),
    (48271, 16807),
    (69621, 104729),
    (31337, 271828),
    (75321, 654321),
    (65539, 998244353),
    (22695477, 1),
]


@q(
    "sample_rendezvous_shards",
    f"""
    WITH w AS (
      SELECT doc_id,
             [{", ".join(f"(({a} * (((doc_id % {_RDV_P}) * 2654435761 + 104729) % {_RDV_P}) + {b}) % {_RDV_P})" for a, b in _RDV_AB)}]
               AS hs
      FROM documents
    ),
    assigned AS (
      SELECT doc_id,
             (list_position(hs, list_aggregate(hs, 'max')) - 1)::BIGINT
               AS shard
      FROM w
    )
    SELECT shard, count(*)::BIGINT AS n_docs,
           min(doc_id)::BIGINT AS min_doc, max(doc_id)::BIGINT AS max_doc
    FROM assigned GROUP BY 1
    """,
)
def sample_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    mixed = ((F.col("doc_id") % _RDV_P) * F.lit(2654435761) + 104729) % _RDV_P
    hs = F.array(
        *[((F.lit(a) * mixed + F.lit(b)) % _RDV_P) for a, b in _RDV_AB]
    )
    assigned = docs.select(
        "doc_id",
        (F.array_position(hs, F.array_max(hs)) - 1).cast("bigint").alias("shard"),
    )
    return assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.max("doc_id").cast("bigint").alias("max_doc"),
    )


# =============================================================================
# Drift monitoring — Population Stability Index of the event `value`
# distribution, first half of the time range vs second, per event_type
# (the stock "did my feature distribution move" gate before retraining).
# Fixed-width integer bins (no quantile boundaries to disagree on),
# Laplace-smoothed proportions, and the 10-term PSI sum left-folds a
# SORTED rounded term list so partial-sum order cannot move the result.
# =============================================================================
_PSI_BIN_W = 50
_PSI_NBINS = 10


@q(
    "ml_drift_psi",
    f"""
    WITH bounds AS (
      SELECT min(ts) AS t0, max(ts) AS t1 FROM events
    ),
    binned AS (
      SELECT event_type,
             CASE WHEN epoch_us(e.ts) < (epoch_us(b.t0) + epoch_us(b.t1)) // 2
                  THEN 0 ELSE 1 END AS half,
             -- clamp in DOUBLE before the BIGINT cast: at value=±1e308
             -- floor(value/W) is ±2e306 and DuckDB's ::BIGINT raises
             -- ConversionException (r12 inf probe); negatives belong in
             -- bin 0 anyway. Spark twin uses the identical expression.
             floor(greatest(least(value / {_PSI_BIN_W},
                                  {_PSI_NBINS - 1}.0), 0.0))::BIGINT
               AS bin
      FROM events e, bounds b
    ),
    cells AS (
      SELECT event_type, half, bin, count(*)::BIGINT AS c
      FROM binned GROUP BY 1, 2, 3
    ),
    grid AS (
      SELECT event_type, bin.bin
      FROM (SELECT DISTINCT event_type FROM cells) et,
           (SELECT unnest(range({_PSI_NBINS}))::BIGINT AS bin) bin
    ),
    wide AS (
      SELECT g.event_type, g.bin,
             coalesce(a.c, 0) AS ca, coalesce(b.c, 0) AS cb
      FROM grid g
      -- IS NOT DISTINCT FROM: a NULL event_type is a real group
      -- (groupBy keeps it); plain = would zero its cells here and
      -- DROP it entirely at the terms USING-join below, while Spark's
      -- window-partitioned total kept the row (r7 null harness)
      LEFT JOIN cells a ON a.event_type IS NOT DISTINCT FROM g.event_type
                        AND a.bin = g.bin AND a.half = 0
      LEFT JOIN cells b ON b.event_type IS NOT DISTINCT FROM g.event_type
                        AND b.bin = g.bin AND b.half = 1
    ),
    tot AS (
      SELECT event_type, sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb
      FROM wide GROUP BY 1
    ),
    terms AS (
      SELECT w.event_type, t.na, t.nb,
             floor(((w.ca + 1) / (t.na + {_PSI_NBINS})::DOUBLE
                    - (w.cb + 1) / (t.nb + {_PSI_NBINS})::DOUBLE)
                   * ln(((w.ca + 1) / (t.na + {_PSI_NBINS})::DOUBLE)
                        / ((w.cb + 1) / (t.nb + {_PSI_NBINS})::DOUBLE))
                   * 100000000 + 0.5) / 100000000 AS term
      FROM wide w JOIN tot t ON w.event_type IS NOT DISTINCT FROM t.event_type
    )
    SELECT event_type, max(na)::BIGINT AS n_first_half,
           max(nb)::BIGINT AS n_second_half,
           floor(list_reduce(list_sort(list(term)), (x, y) -> x + y)
                 * 1000000 + 0.5) / 1000000 AS psi
    FROM terms GROUP BY 1
    """,
)
def ml_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.unix_micros(F.min("ts")).alias("u0"),
        F.unix_micros(F.max("ts")).alias("u1"),
    )
    half = F.when(
        F.unix_micros("ts")
        < F.floor((F.col("u0") + F.col("u1")) / 2).cast("long"),
        0,
    ).otherwise(1)
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        half.alias("half"),
        # clamp in DOUBLE before floor/cast (mirrors the oracle): keeps
        # ±inf / ±1e308 quotients from ever reaching an integer overflow
        # (r12 inf probe crashed the oracle's unclamped ::BIGINT); NaN
        # sorts greater than 9.0 on both engines -> bin 9, NULL is
        # skipped by least/greatest on both engines -> bin 9 (unchanged
        # from the pre-clamp behavior)
        F.floor(
            F.greatest(
                F.least(
                    F.col("value") / _PSI_BIN_W,
                    F.lit(float(_PSI_NBINS - 1)),
                ),
                F.lit(0.0),
            )
        )
        .cast("bigint")
        .alias("bin"),
    )
    # pin the cell table (lazily; |types|×2×10 rows): it feeds THREE
    # consumers (the grid's distinct types + both half slices) and
    # unpinned each re-ran the bin pass — with the bounds pass that was
    # 5 full events reads at 100 TB; now it's the inherent two (global
    # min/max, then bin+count)
    cells = (
        binned.groupBy("event_type", "half", "bin")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    et = cells.select("event_type").distinct()
    bins = F.broadcast(
        cells.sparkSession.range(_PSI_NBINS).select(F.col("id").alias("bin"))
    )
    grid = et.crossJoin(bins)
    # eqNullSafe on the type: a NULL event_type is a real group and its
    # cells must land on the grid — a name-based join key would zero
    # them (r7 null-riddled events harness; oracle mirrors with
    # IS NOT DISTINCT FROM)
    a = cells.filter(F.col("half") == 0).select(
        F.col("event_type").alias("a_et"), F.col("bin").alias("a_bin"),
        F.col("c").alias("ca"),
    )
    b = cells.filter(F.col("half") == 1).select(
        F.col("event_type").alias("b_et"), F.col("bin").alias("b_bin"),
        F.col("c").alias("cb"),
    )
    wide = (
        grid.join(
            a,
            F.col("event_type").eqNullSafe(F.col("a_et"))
            & (F.col("bin") == F.col("a_bin")),
            "left",
        )
        .join(
            b,
            F.col("event_type").eqNullSafe(F.col("b_et"))
            & (F.col("bin") == F.col("b_bin")),
            "left",
        )
        .select(
            "event_type",
            "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    wt = Window.partitionBy("event_type")
    tot = wide.withColumn("na", F.sum("ca").over(wt)).withColumn(
        "nb", F.sum("cb").over(wt)
    )
    pa = (F.col("ca") + 1) / (F.col("na") + _PSI_NBINS).cast("double")
    pb = (F.col("cb") + 1) / (F.col("nb") + _PSI_NBINS).cast("double")
    terms = tot.select(
        "event_type",
        "na",
        "nb",
        _r((pa - pb) * F.log(pa / pb), 8).alias("term"),
    )
    return terms.groupBy("event_type").agg(
        F.max("na").cast("bigint").alias("n_first_half"),
        F.max("nb").cast("bigint").alias("n_second_half"),
        _r(
            F.aggregate(
                F.array_sort(F.collect_list("term")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("psi"),
    )


# =============================================================================
# ANN dimensioning — recall@5 of cosine top-k computed on the FIRST 16
# DIMS of each embedding vs the full-dimension exact answer (the
# "matryoshka"/truncation audit: how much retrieval quality survives a
# 4× cheaper index?). Same broadcast-queries × corpus-scan posture as
# sim_cosine_topk; the truncation is an in-row slice.
# =============================================================================
_TRUNC_DIMS = 16


def _cos_topk_sql(slice_expr: str) -> str:
    qe = slice_expr.format(v="qe")
    ce = slice_expr.format(v="ce")
    return f"""
      SELECT qid AS query_id, nid AS neighbor_id,
             list_sum(list_transform(range(len({qe})),
                                     i -> {qe}[i+1]::DOUBLE * {ce}[i+1]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(len({qe})),
                                             i -> {qe}[i+1]::DOUBLE * {qe}[i+1]::DOUBLE)))
                * sqrt(list_sum(list_transform(range(len({ce})),
                                               i -> {ce}[i+1]::DOUBLE * {ce}[i+1]::DOUBLE))))
               AS cos
      FROM (SELECT vec_id AS nid, embedding AS ce FROM valid_embeddings) c,
           (SELECT vec_id AS qid, embedding AS qe FROM valid_embeddings
            WHERE vec_id < 10) q
      WHERE nid <> qid
    """


@q(
    "emb_truncation_recall",
    f"""
    WITH valid_embeddings AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0 AND len(list_filter(embedding, x -> x <> 0)) > 0),
    fs AS ({_cos_topk_sql("{v}")}),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM fs) WHERE rank <= 5
    ),
    ts AS ({_cos_topk_sql(f"{{v}}[1:{_TRUNC_DIMS}]")}),
    approx AS (
      SELECT query_id, neighbor_id, 1 AS hit FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM ts) WHERE rank <= 5
    )
    SELECT e.query_id, count(a.hit)::BIGINT AS n_hit,
           count(a.hit) / 5.0 AS recall_at_5
    FROM exact e
    LEFT JOIN approx a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY 1
    """,
)
def emb_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_and_media_data_ingestion_spark.operators import similarity as SIM

    emb = vectors(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = SIM.cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    trunc = emb.select(
        "vec_id", F.slice("embedding", 1, _TRUNC_DIMS).alias("embedding")
    )
    approx = SIM.cosine_topk(
        trunc, trunc.filter(F.col("vec_id") < 10), k=5
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    return (
        exact.join(F.broadcast(approx), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hit"),
            (F.count("hit").cast("double") / 5).alias("recall_at_5"),
        )
    )


# =============================================================================
# Markov analysis — approximate stationary distribution of the user
# event-type transition chain: 4 synchronous power-iteration rounds
# from a uniform start over the SAME rounded transition matrix as
# events_transition_matrix. Every v·P component left-folds a SORTED
# 8-dp-rounded term list, so both engines iterate bit-identically. The
# state frame is |event types| rows — all iteration joins are
# broadcast-tiny; the only real shuffle is the one transition count.
# =============================================================================
_MKV_ITERS = 4


def _markov_oracle() -> str:
    body = """
    WITH seq AS (
      SELECT event_type AS s,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS t
      FROM events
    ),
    cnt AS MATERIALIZED (
      SELECT s, t, count(*)::BIGINT AS n FROM seq WHERE t IS NOT NULL
      GROUP BY 1, 2
    ),
    p AS MATERIALIZED (
      SELECT s, t,
             floor(n / sum(n) OVER (PARTITION BY s) * 10000 + 0.5) / 10000
               AS p
      FROM cnt
    ),
    states AS MATERIALIZED (
      SELECT s AS state FROM cnt UNION SELECT t FROM cnt
    ),
    nstates AS (SELECT count(*)::BIGINT AS k FROM states),
    v0 AS (
      SELECT state, 1.0 / k AS v FROM states, nstates
    )"""
    for i in range(1, _MKV_ITERS + 1):
        body += f""",
    t{i} AS (
      SELECT p.t AS state,
             floor(v.v * p.p * 100000000 + 0.5) / 100000000 AS term
      FROM v{i - 1} v JOIN p ON p.s = v.state
    ),
    v{i} AS (
      SELECT s.state,
             coalesce(floor(x.v * 100000000 + 0.5) / 100000000, 0.0) AS v
      FROM states s LEFT JOIN (
        SELECT state, list_reduce(list_sort(list(term)), (a, b) -> a + b)
          AS v
        FROM t{i} GROUP BY 1
      ) x USING (state)
    )"""
    body += f"""
    SELECT state AS event_type,
           floor(v * 1000000 + 0.5) / 1000000 AS stationary
    FROM v{_MKV_ITERS}
    """
    return body


@q("events_markov_stationary", _markov_oracle())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("s"), F.lead("event_type").over(w).alias("t")
    )
    cnt = (
        seq.filter(F.col("t").isNotNull())
        .groupBy("s", "t")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    ws = Window.partitionBy("s")
    p = cnt.select(
        "s",
        "t",
        (F.floor(F.col("n") / F.sum("n").over(ws) * 10000 + F.lit(0.5)) / 10000).alias(
            "p"
        ),
    )
    states = (
        cnt.select(F.col("s").alias("state"))
        .union(cnt.select(F.col("t").alias("state")))
        .distinct()
    )
    k = states.agg(F.count("*").alias("k"))
    v = states.crossJoin(F.broadcast(k)).select(
        "state", (F.lit(1.0) / F.col("k")).alias("v")
    )
    for _ in range(_MKV_ITERS):
        terms = F.broadcast(v).join(p, v.state == p.s).select(
            F.col("t").alias("state"), _r(F.col("v") * F.col("p"), 8).alias("term")
        )
        summed = terms.groupBy("state").agg(
            F.aggregate(
                F.array_sort(F.collect_list("term")),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("v")
        )
        v = states.join(F.broadcast(summed), "state", "left").select(
            "state", F.coalesce(_r(F.col("v"), 8), F.lit(0.0)).alias("v")
        )
    return v.select(F.col("state").alias("event_type"), _r(F.col("v"), 6).alias("stationary"))


# =============================================================================
# Graph traversal — 3-hop BFS reachability from seed suppliers over the
# bounded k-NN partner graph: per hop, the frontier expands via ONE
# semi-join against the edge list and merges into the visited set
# (union + distinct); visited is localCheckpoint-ed per hop so hop h+1
# never replays hops 1..h. Oracle: unrolled MATERIALIZED CTE hops.
# =============================================================================
_BFS_SEEDS = (1, 2)
_BFS_HOPS = 3


def _bfs_oracle() -> str:
    body = (
        "WITH "
        + _KCORE_EDGES
        + f""",
    seeds AS (
      SELECT unnest([{", ".join(str(s) for s in _BFS_SEEDS)}])::BIGINT AS n
    ),
    r0 AS MATERIALIZED (SELECT n FROM seeds)"""
    )
    for h in range(1, _BFS_HOPS + 1):
        body += f""",
    f{h} AS MATERIALIZED (
      SELECT e.b AS n FROM e0 e JOIN r{h - 1} r ON e.a = r.n
      UNION
      SELECT e.a AS n FROM e0 e JOIN r{h - 1} r ON e.b = r.n
    ),
    r{h} AS MATERIALIZED (
      SELECT n FROM r{h - 1} UNION SELECT n FROM f{h}
    )"""
    body += "\n    " + "\n    UNION ALL ".join(
        f"SELECT {h}::BIGINT AS hop,"
        f" (SELECT count(*) FROM r{h})::BIGINT AS n_reached"
        for h in range(1, _BFS_HOPS + 1)
    )
    return body


@q("graph_bfs_reachability", _bfs_oracle())
def graph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("v"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("u").orderBy(F.desc("n"), F.asc("v"))
    edges = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    spark_ = edges.sparkSession
    reached = spark_.createDataFrame(
        [(int(s),) for s in _BFS_SEEDS], "n bigint"
    )
    stats = []
    for h in range(1, _BFS_HOPS + 1):
        fwd = edges.join(
            reached.select(F.col("n").alias("a")), "a", "left_semi"
        ).select(F.col("b").alias("n"))
        bwd = edges.join(
            reached.select(F.col("n").alias("b")), "b", "left_semi"
        ).select(F.col("a").alias("n"))
        reached = (
            reached.union(fwd).union(bwd).distinct().localCheckpoint(eager=False)
        )
        stats.append((h, reached.count()))
    return spark_.createDataFrame(stats, "hop bigint, n_reached bigint")


# =============================================================================
# Forecast backtest — fit OLS daily-revenue trend on the FIRST 70% of
# the date range, predict each holdout day, report per-day absolute
# error (the walk-forward evaluation you run before trusting a trend).
# Every sufficient statistic is an exact integer (cents × day index),
# so the fitted line is the identical rational on both engines; output
# is per-row arithmetic — no float summation ordering anywhere.
# =============================================================================
@q(
    "orders_forecast_backtest",
    """
    WITH bounds AS (
      SELECT min(o_orderdate) AS d0,
             date_diff('day', min(o_orderdate), max(o_orderdate))::BIGINT
               AS span
      FROM orders
    ),
    daily AS MATERIALIZED (
      SELECT date_diff('day', b.d0, o.o_orderdate)::BIGINT AS x,
             sum(floor(o.o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS y,
             max(b.span * 7 // 10) AS split
      FROM orders o, bounds b
      GROUP BY 1
    ),
    train AS (
      -- sy/sxy in HUGEINT (Spark: decimal(38,0)): the r12 numeric-
      -- extremes probe crashed the int64 forms at 1e12-dollar rows;
      -- per-day y itself stays BIGINT (it is the actual_cents output
      -- and a single day's revenue fitting int64 is the documented
      -- quantization domain)
      SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
             sum(y) AS sy, sum(x::HUGEINT * y) AS sxy,
             sum(x * x)::BIGINT AS sxx
      FROM daily WHERE x < split
    )
    SELECT d.x AS day_idx, d.y AS actual_cents,
           floor((t.sy / t.n::DOUBLE
                  + (t.n * t.sxy - t.sx * t.sy)::DOUBLE
                    / (t.n * t.sxx - t.sx * t.sx)
                    * (d.x - t.sx / t.n::DOUBLE)) * 100 + 0.5) / 100
             AS predicted_cents,
           floor(abs(d.y - (t.sy / t.n::DOUBLE
                  + (t.n * t.sxy - t.sx * t.sy)::DOUBLE
                    / (t.n * t.sxx - t.sx * t.sx)
                    * (d.x - t.sx / t.n::DOUBLE))) * 100 + 0.5) / 100
             AS abs_err_cents
    FROM daily d, train t
    WHERE d.x >= d.split
    """,
)
def orders_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_orderdate").alias("d0"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
        .cast("bigint")
        .alias("span"),
    )
    daily = (
        orders.crossJoin(F.broadcast(bounds))
        .select(
            F.datediff("o_orderdate", "d0").cast("bigint").alias("x"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
            F.floor(F.col("span") * 7 / 10).cast("bigint").alias(
                "split_raw"
            ),
        )
        .groupBy("x")
        .agg(
            F.sum("cents").alias("y"),
            F.max(
                F.floor(F.col("split_raw"))
            ).cast("bigint").alias("split"),
        )
        .localCheckpoint(eager=False)
    )
    tr = daily.filter(F.col("x") < F.col("split")).agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        # decimal widening: the 128-bit twin of the oracle's HUGEINT
        # sums (see the oracle's train comment)
        F.sum(F.col("y").cast("decimal(19,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    j = daily.filter(F.col("x") >= F.col("split")).crossJoin(F.broadcast(tr))
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    pred = F.col("sy") / F.col("n").cast("double") + slope * (
        F.col("x") - F.col("sx") / F.col("n").cast("double")
    )
    return j.select(
        F.col("x").alias("day_idx"),
        F.col("y").alias("actual_cents"),
        _r(pred, 2).alias("predicted_cents"),
        _r(F.abs(F.col("y") - pred), 2).alias("abs_err_cents"),
    )


# =============================================================================
# Concentration — Gini coefficient of supplier revenue (the inequality
# companion to the HHI query): G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
# revenues sorted ascending. Revenue fixed to integer cents per row
# BEFORE summing, the rank comes from the DISTRIBUTED global row-number
# (operators/scale.global_row_number — no single-task sort), and the
# (rank, suppkey) tie-break makes Σ(i·xᵢ) well-defined under ties.
# =============================================================================
@q(
    "supplier_revenue_gini",
    """
    WITH rev AS (
      -- 128-bit end-to-end (r13 fuzz seed 2015, the abc_pareto
      -- precedent): per-supplier and corpus cents sums overflow int64
      -- at in-domain 2^53-dollar prices, and i*cents overflowed
      -- DuckDB's INT64 multiply — totals report as double DOLLARS
      SELECT l_suppkey,
             sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                 ::HUGEINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, l_suppkey)::BIGINT AS i
      FROM rev
    )
    SELECT count(*)::BIGINT AS n_suppliers,
           (sum(cents))::DOUBLE / 100 AS total_revenue,
           floor((2.0 * sum(i::HUGEINT * cents) / (count(*) * sum(cents))
                  - (count(*) + 1)::DOUBLE / count(*)) * 1000000 + 0.5)
           / 1000000 AS gini
    FROM ranked
    """,
)
def supplier_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_and_media_data_ingestion_spark.operators.scale import (
        global_row_number,
    )

    li = t(spark, sf_dir, "lineitem")
    # 128-bit end-to-end (oracle header comment): per-row cents fit
    # int64, every sum rides decimal — decimal(20)·sum→decimal(30) per
    # supplier, i as decimal(8) keeps the i·cents product inside
    # decimal(38) at any supplier count
    rev = (
        li.select(
            "l_suppkey",
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + F.lit(0.5)
            )
            .cast("bigint")
            .cast("decimal(20,0)")
            .alias("cents"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("cents").alias("cents"))
    )
    ranked = global_row_number(rev, ["cents", "l_suppkey"], out_col="i")
    s_ix = F.sum(F.col("i").cast("decimal(8,0)") * F.col("cents"))
    return ranked.agg(
        F.count("*").alias("n_suppliers"),
        (F.sum("cents").cast("double") / 100).alias("total_revenue"),
        _r(
            F.lit(2.0)
            * s_ix.cast("double")
            / (
                F.count("*").cast("decimal(8,0)") * F.sum("cents")
            ).cast("double")
            - (F.count("*") + 1).cast("double") / F.count("*"),
            6,
        ).alias("gini"),
    )


# =============================================================================
# Warehouse reconciliation — orders header total vs lineitem detail
# rollup: the cross-table consistency gate every nightly load runs.
# Per-order deltas are exact integer cents (floored per ROW before the
# sum, so distributed partial-sum order is irrelevant); the report is
# one partial-aggregable pass over the joined reduction.
# =============================================================================
@q(
    "dq_reconciliation_orders",
    """
    WITH detail AS (
      SELECT l_orderkey,
             sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT
               AS line_cents
      FROM lineitem GROUP BY 1
    ),
    joined AS (
      SELECT o.o_orderkey,
             floor(o.o_totalprice * 100 + 0.5)::BIGINT AS header_cents,
             d.line_cents
      FROM orders o LEFT JOIN detail d ON d.l_orderkey = o.o_orderkey
    )
    SELECT count(*)::BIGINT AS n_orders,
           count(*) FILTER (line_cents IS NULL)::BIGINT AS n_headerless_of_lines,
           count(*) FILTER (line_cents IS NOT NULL
                            AND abs(header_cents - line_cents)
                                > header_cents / 100)::BIGINT
             AS n_mismatch_gt_1pct,
           max(CASE WHEN line_cents IS NOT NULL
                    THEN abs(header_cents - line_cents) END)::BIGINT
             AS max_abs_delta_cents
    FROM joined
    """,
)
def dq_reconciliation_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    detail = (
        li.select(
            "l_orderkey",
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("cents").alias("line_cents"))
    )
    joined = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("header_cents"),
    ).join(detail, orders.o_orderkey == detail.l_orderkey, "left")
    delta = F.abs(F.col("header_cents") - F.col("line_cents"))
    # count_if for the two filtered counts: COUNT semantics return 0 on
    # an empty join where sum(when) returns NULL — the oracle's
    # count(*) FILTER shape (r7 empty-tables probe)
    return joined.agg(
        F.count("*").alias("n_orders"),
        F.count_if(F.col("line_cents").isNull()).alias("n_headerless_of_lines"),
        F.count_if(
            F.col("line_cents").isNotNull()
            & (delta > F.col("header_cents") / F.lit(100).cast("long"))
        ).alias("n_mismatch_gt_1pct"),
        F.max(F.when(F.col("line_cents").isNotNull(), delta))
        .cast("bigint")
        .alias("max_abs_delta_cents"),
    )


# =============================================================================
# §2.7 extension — URL decomposition scalars: host / path / query
# params via Spark's parse_url against a regexp-spelled DuckDB oracle.
# The URL is synthesized deterministically per doc (the corpus has no
# raw URLs), mirroring the reference's URL handling surface
# (is_image_url / strip-URL, parser_media_articles.py:83) with the
# EXTRACTION direction. Pure map plan.
# =============================================================================
@q(
    "scalar_url_components",
    """
    SELECT doc_id,
           regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]src=([^&#]*)', 1) AS src_param,
           regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page_param
    FROM (
      -- text-derived segments are reduced to URL-safe characters before
      -- synthesis (r13 fuzz: a lang with spaces/unicode/NULs builds an
      -- invalid URL that ANSI-crashes java.net.URI — this query's
      -- contract is URL DECOMPOSITION, so the builder percent-free
      -- sanitizes like any URL-emitting app would)
      SELECT doc_id,
             'https://media' || (doc_id % 7) || '.example.org/articles/'
               || regexp_replace(lang, '[^A-Za-z0-9._~-]', '', 'g')
               || '/' || doc_id || '?src='
               || regexp_replace(source, '[^A-Za-z0-9._~-]', '', 'g')
               || '&page=' || (doc_id % 5) AS url
      FROM documents
    )
    """,
)
def scalar_url_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")

    def safe(c):
        return F.regexp_replace(F.col(c), r"[^A-Za-z0-9._~-]", "")

    url = F.concat(
        F.lit("https://media"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.org/articles/"),
        safe("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?src="),
        safe("source"),
        F.lit("&page="),
        (F.col("doc_id") % 5).cast("string"),
    )
    u = docs.select("doc_id", url.alias("url"))
    # try_parse_url: belt over the sanitize — an unparseable URL yields
    # NULL components, never a job-killing ANSI error
    return u.select(
        "doc_id",
        F.try_parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.try_parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.try_parse_url(F.col("url"), F.lit("QUERY"), F.lit("src")).alias(
            "src_param"
        ),
        F.try_parse_url(F.col("url"), F.lit("QUERY"), F.lit("page")).alias(
            "page_param"
        ),
    )


# =============================================================================
# Training-data mixing — per-source sampling allocation for a fixed
# token budget: eligible tokens = total × unique-fingerprint fraction
# (exact-dup discount), weights proportional to eligible mass, and the
# allocation floor-divides INTEGERS so both engines hand out identical
# token counts (the "data mixture" step that turns corpus stats into a
# training sampling plan). One hash-agg per source + a 1-row broadcast
# of the corpus total.
# =============================================================================
_MIX_BUDGET = 100_000


@q(
    "corpus_mixture_weights",
    f"""
    WITH per_src AS (
      SELECT source, count(*)::BIGINT AS n_docs,
             sum(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> x <> '')))::BIGINT AS total_tokens,
             count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                               'g')))::BIGINT AS n_unique
      FROM documents GROUP BY 1
    ),
    elig AS (
      SELECT source, n_docs, total_tokens, n_unique,
             total_tokens * n_unique // n_docs AS eligible_tokens
      FROM per_src
    ),
    tot AS (SELECT sum(eligible_tokens)::BIGINT AS sum_elig FROM elig)
    SELECT e.source, e.n_docs, e.total_tokens, e.n_unique, e.eligible_tokens,
           floor(e.eligible_tokens / t.sum_elig::DOUBLE * 1000000 + 0.5)
             / 1000000 AS weight,
           least(e.eligible_tokens,
                 {_MIX_BUDGET} * e.eligible_tokens // t.sum_elig)::BIGINT
             AS alloc_tokens
    FROM elig e, tot t
    """,
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_and_media_data_ingestion_spark.operators.dedup import (
        normalized_fingerprint,
    )

    docs = t(spark, sf_dir, "documents").select(
        "source",
        F.size(_tokens("text")).cast("bigint").alias("n_toks"),
        normalized_fingerprint("text").alias("fp"),
    )
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.countDistinct("fp").alias("n_unique"),
    )
    # exact integer floor-division (`div`), NOT double `/` + cast: once
    # the numerator exceeds 2^53 (the regime this operator targets),
    # double rounding can land on the wrong side of an integer boundary
    # while the DuckDB `//` oracle stays exact — `div` matches it at any
    # magnitude (same idiom as the doc_id split in ml_naive_bayes_source)
    elig = per_src.withColumn(
        "eligible_tokens",
        F.expr("total_tokens * n_unique div n_docs").cast("bigint"),
    )
    tot = elig.agg(F.sum("eligible_tokens").alias("sum_elig"))
    j = elig.crossJoin(F.broadcast(tot))
    return j.select(
        "source",
        "n_docs",
        "total_tokens",
        "n_unique",
        "eligible_tokens",
        _r(F.col("eligible_tokens") / F.col("sum_elig").cast("double"), 6).alias(
            "weight"
        ),
        F.least(
            F.col("eligible_tokens"),
            F.expr(f"{_MIX_BUDGET} * eligible_tokens div sum_elig"),
        )
        .cast("bigint")
        .alias("alloc_tokens"),
    )


# =============================================================================
# Stateful streaming — per-user spend alerting: a cumulative INTEGER
# cents total lives in applyInPandasWithState state; each crossing of
# another $2000 multiple emits one (user, alert_level) row. Values are
# non-negative, so the emitted set depends only on each user's FINAL
# total — invariant to micro-batch splits (pinned by
# tests/test_stateful.py) — and the batch oracle is
# generate-levels-per-user. State is one int64 per key.
# =============================================================================
_ALERT_T_CENTS = 200_000


@q(
    "stream_threshold_alerts",
    f"""
    WITH per_user AS (
      SELECT user_id,
             sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1
    ),
    lv AS (
      SELECT user_id, cents // {_ALERT_T_CENTS} AS n_levels FROM per_user
    )
    SELECT user_id, unnest(range(1, n_levels + 1))::BIGINT AS alert_level
    FROM lv WHERE n_levels >= 1
    """,
)
def stream_threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from social_and_media_data_ingestion_spark.plans.tables import events_stream
    from social_and_media_data_ingestion_spark.streaming.pipeline import (
        run_to_memory,
    )
    from social_and_media_data_ingestion_spark.streaming.stateful import (
        threshold_alerts,
    )

    ev = events_stream(spark, sf_dir)
    alerts = threshold_alerts(ev, "user_id", "value", _ALERT_T_CENTS)
    name = f"stream_alerts_{uuid.uuid4().hex[:8]}"
    query = run_to_memory(alerts, name, output_mode="append")
    query.stop()
    return spark.sql(f"SELECT user_id, alert_level FROM {name}")


# =============================================================================
# Model evaluation — confusion matrix of the stopword-hit language-ID
# heuristic against the labeled lang column (the audit that tells you
# WHERE the cheap classifier fails before you trust it to route a
# 100 TB corpus). One map-side prediction + one hash-agg.
# =============================================================================
def _langid_confusion_oracle() -> str:
    from social_and_media_data_ingestion_spark.plans.queries import _lang_hits_sql

    return f"""
    WITH h AS (
      SELECT lang,
             {_lang_hits_sql("en")} AS h_en,
             {_lang_hits_sql("de")} AS h_de,
             {_lang_hits_sql("es")} AS h_es,
             {_lang_hits_sql("fr")} AS h_fr
      FROM documents
    ),
    pred AS (
      SELECT lang,
             CASE WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'unk'
                  WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
                  WHEN h_de = greatest(h_en, h_de, h_es, h_fr) THEN 'de'
                  WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
                  ELSE 'fr' END AS lang_pred
      FROM h
    )
    SELECT lang, lang_pred, count(*)::BIGINT AS n
    FROM pred GROUP BY 1, 2
    """


@q("text_langid_confusion", _langid_confusion_oracle())
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_and_media_data_ingestion_spark.operators import text_analysis as TA

    docs = t(spark, sf_dir, "documents")
    pred = docs.select("lang", TA.language_id("text").alias("lang_pred"))
    return pred.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))


# =============================================================================
# Curation — shingle NOVELTY: per document, the fraction of its distinct
# word-3-grams whose FIRST occurrence (min doc_id) is this document —
# the cheap memorization/redundancy proxy used to rank documents for
# dedup-aware sampling (a doc that introduces nothing new scores 0).
# Distributed shape: one shuffle keyed on the shingle (min-combine),
# join back, one per-doc agg — no pairwise anything.
# =============================================================================
@q(
    "text_shingle_novelty",
    f"""
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, unnest({_CONT_SHINGLES}) AS shingle FROM docs
    ),
    first_seen AS (
      SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1
    )
    SELECT s.doc_id,
           count(*)::BIGINT AS n_shingles,
           sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)::BIGINT
             AS n_novel,
           floor(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE * 1000000 + 0.5) / 1000000 AS novelty
    FROM sh s JOIN first_seen f USING (shingle)
    GROUP BY 1
    """,
)
def text_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_and_media_data_ingestion_spark.operators.dedup import word_shingles

    docs = t(spark, sf_dir, "documents")
    # r14 opt round (guide §2.3 "aggregate before you shuffle"): the old
    # spelling joined the exploded (doc, shingle) stream BACK onto its
    # own per-shingle min — the full shingle stream crossed a second
    # exchange (and the explode subtree executed twice: once under the
    # aggregate, once as the join probe). The join-back is unnecessary:
    #   n_novel(doc)   = how many shingles have first_doc = doc — a
    #                    COUNT over the (shingle -> min doc) aggregate,
    #                    i.e. doc-grain rows, never the stream again;
    #   n_shingles(doc)= a COUNT over the distinct stream — partial
    #                    aggregation reduces it to doc-grain partials
    #                    map-side, so its exchange carries docs-scale
    #                    rows, not the stream. (NOT row-local array
    #                    math: duplicate doc_id rows must union their
    #                    shingle sets to one output row — the r14 fuzz
    #                    caught a row-local spelling emitting one row
    #                    per INPUT row, 39 vs 35 on the dup-PK mix.)
    # Both aggregates partially combine map-side, so what they exchange
    # is doc-grain (or shingle-grain partial-min) rows, never the raw
    # stream — the join-back shipped the FULL stream. The shared
    # distinct subtree stays UNPINNED and computes once per consumer: a
    # localCheckpoint pin measured SLOWER (1.06 vs 0.74 s — the pinned
    # frame reports UnknownPartitioning, so both consumers re-exchange
    # the whole stream, plus the block-store write), and at 100 TB a
    # corpus-scale pinned stream is an executor-storage liability the
    # two combined aggregates don't justify. Same rows, hash-identical
    # (oracle at 3 SFs; dup-PK fuzz); measured 1.03 -> 0.74 s
    # same-session.
    sh = word_shingles(docs, "doc_id", "text", n=3).withColumnRenamed(
        "id", "doc_id"
    )
    novel = (
        sh.groupBy("shingle")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_novel"))
    )
    n_sh = sh.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_shingles")
    )
    nov = F.coalesce(F.col("n_novel"), F.lit(0).cast("bigint"))
    return n_sh.join(novel, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        nov.alias("n_novel"),
        _r(nov / F.col("n_shingles").cast("double"), 6).alias("novelty"),
    )


# =============================================================================
# Statistical testing — one-way ANOVA of order-line price across return
# flags (does the group mean differ more than chance?). Per-group
# sufficient statistics (n, Σx, Σx²) are exact integers in WHOLE
# dollars, with the squared terms held in 128-bit integers (Spark
# decimal(38,0) / DuckDB HUGEINT — r12 numeric-extremes probe: a
# single 1e12-dollar row made the int64 square an ANSI crash, and one
# absurd row must never kill a cluster job; 128-bit keeps the sums
# EXACT to ~1e38 and both engines cast the same exact integer to
# double). The only order-sensitive float reduce — Σ_g (Σx_g)²/n_g —
# left-folds the SORTED per-group terms so both engines compute the
# identical F.
# =============================================================================
@q(
    "lineitem_anova_returnflag",
    """
    WITH g AS (
      -- observed values only (r13 off-rotation fuzz, seed 1016): a
      -- NULL price is not an observation, and an ALL-NULL group must
      -- vanish from the stats on BOTH engines (Spark's collect_list
      -- drops the group's NULL term while DuckDB's list() keeps it
      -- and poisons the reduce)
      SELECT l_returnflag, count(*)::BIGINT AS n,
             sum(floor(l_extendedprice)::HUGEINT) AS s,
             sum(floor(l_extendedprice)::HUGEINT
                 * floor(l_extendedprice)::BIGINT) AS ss
      FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
    ),
    agg AS (
      SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nn,
             sum(s) AS stot, sum(ss) AS sstot,
             list_reduce(list_sort(list(s::DOUBLE * s / n)), (a, b) -> a + b)
               AS sum_sq_over_n
      FROM g
    )
    SELECT k, nn AS n_rows,
           floor(((sum_sq_over_n - stot::DOUBLE * stot / nn) / (k - 1))
                 / ((sstot - sum_sq_over_n) / (nn - k)) * 10000 + 0.5)
           / 10000 AS f_stat,
           floor((sum_sq_over_n - stot::DOUBLE * stot / nn)
                 / (sstot - stot::DOUBLE * stot / nn) * 1000000 + 0.5)
           / 1000000 AS eta_squared
    FROM agg
    """,
)
def lineitem_anova_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # observed values only — see the oracle's g-CTE comment
    g = li.where(F.col("l_extendedprice").isNotNull()).select(
        "l_returnflag",
        # decimal(19,0) factors -> decimal(38,0) products/sums: the
        # 128-bit twin of the oracle's HUGEINT (see header comment)
        F.floor("l_extendedprice").cast("decimal(19,0)").alias("d"),
    ).groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("d").alias("s"),
        F.sum(F.col("d") * F.col("d")).alias("ss"),
    )
    term = F.col("s").cast("double") * F.col("s") / F.col("n")
    agg = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("stot"),
        F.sum("ss").alias("sstot"),
        F.aggregate(
            F.array_sort(F.collect_list(term)),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("sum_sq_over_n"),
    )
    ssb = F.col("sum_sq_over_n") - F.col("stot").cast("double") * F.col(
        "stot"
    ) / F.col("nn")
    ssw = F.col("sstot") - F.col("sum_sq_over_n")
    sst = F.col("sstot") - F.col("stot").cast("double") * F.col("stot") / F.col("nn")
    # try_divide throughout: k=1 (one group) or nn=k (one row per
    # group) leaves the F undefined, and a zero total variance leaves
    # eta² undefined — NULL like the oracle's x/0, not a Spark ANSI
    # crash (r7 one-row probe)
    return agg.select(
        "k",
        F.col("nn").alias("n_rows"),
        _r(
            F.try_divide(
                F.try_divide(ssb, F.col("k") - 1),
                F.try_divide(ssw, F.col("nn") - F.col("k")),
            ),
            4,
        ).alias("f_stat"),
        _r(F.try_divide(ssb, sst), 6).alias("eta_squared"),
    )


# =============================================================================
# Statistical testing — Mann-Whitney U (two-sample rank test) of whole-
# dollar line price between linestatus groups, with EXACT tie handling:
# average ranks come from the per-distinct-value reduction (count +
# group count per value) and a DISTRIBUTED prefix sum over value order
# (operators/scale.global_running_sum) — never a row-level global sort.
# Every rank is a multiple of 0.5 and every term a dyadic rational, so
# the rank-sum is EXACT in doubles in any summation order; the tie
# correction Σ(t³−t) is a plain integer aggregate.
# =============================================================================
@q(
    "stats_mann_whitney_status",
    """
    WITH base AS (
      -- observed values only (r13 fuzz): a NULL price is not a rank
      -- observation, and a NULL-x group would rank FIRST on Spark's
      -- prefix sum but LAST on DuckDB's window, shifting every rank
      SELECT l_linestatus AS grp, floor(l_extendedprice)::BIGINT AS x
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    per_v AS (
      SELECT x, count(*)::BIGINT AS cnt,
             count(*) FILTER (grp = 'F')::BIGINT AS n1v
      FROM base GROUP BY 1
    ),
    ranked AS (
      SELECT x, cnt, n1v,
             sum(cnt) OVER (ORDER BY x
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)::BIGINT AS cum
      FROM per_v
    ),
    agg AS (
      SELECT sum(n1v)::BIGINT AS n1, sum(cnt - n1v)::BIGINT AS n2,
             sum(cnt)::BIGINT AS nn,
             sum(n1v * ((cum - cnt) + (cnt + 1) / 2.0)) AS r1,
             sum(cnt * cnt * cnt - cnt)::BIGINT AS tie
      FROM ranked
    )
    SELECT n1, n2,
           r1 - n1 * (n1 + 1) / 2.0 AS u1,
           n1::DOUBLE * n2 - (r1 - n1 * (n1 + 1) / 2.0) AS u2,
           floor((r1 - n1 * (n1 + 1) / 2.0 - n1::DOUBLE * n2 / 2)
                 / sqrt(n1::DOUBLE * n2 / 12
                        * ((nn + 1) - tie::DOUBLE / (nn * (nn - 1))))
                 * 1000000 + 0.5) / 1000000 AS z
    FROM agg
    """,
)
def stats_mann_whitney_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_and_media_data_ingestion_spark.operators.scale import (
        global_running_sum,
    )

    li = t(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_extendedprice").isNotNull()).select(
        F.col("l_linestatus").alias("grp"),
        F.floor("l_extendedprice").cast("bigint").alias("x"),
    )
    per_v = base.groupBy("x").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("grp") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("n1v"),
    )
    ranked = global_running_sum(per_v, ["x"], "cnt", out_col="cum")
    avg_rank = (F.col("cum") - F.col("cnt")) + (F.col("cnt") + 1) / F.lit(2.0)
    agg = ranked.agg(
        F.sum("n1v").alias("n1"),
        F.sum(F.col("cnt") - F.col("n1v")).alias("n2"),
        F.sum("cnt").alias("nn"),
        F.sum(F.col("n1v") * avg_rank).alias("r1"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tie"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / F.lit(2.0)
    # try_divide on the tie term (nn=1 -> nn(nn-1)=0) and on z itself
    # (an empty group -> sigma=0): NULL like the oracle's x/0, not a
    # Spark ANSI crash (r7 one-row probe)
    sigma = F.sqrt(
        F.col("n1").cast("double")
        * F.col("n2")
        / 12
        * (
            (F.col("nn") + 1)
            - F.try_divide(
                F.col("tie").cast("double"),
                F.col("nn") * (F.col("nn") - 1),
            )
        )
    )
    return agg.select(
        "n1",
        "n2",
        u1.alias("u1"),
        (F.col("n1").cast("double") * F.col("n2") - u1).alias("u2"),
        _r(
            F.try_divide(
                u1 - F.col("n1").cast("double") * F.col("n2") / 2, sigma
            ),
            6,
        ).alias("z"),
    )


# =============================================================================
# Statistical testing — Kruskal-Wallis H (k-sample rank test) of whole-
# dollar line price across the three return flags: the non-parametric
# ANOVA, on the SAME distributed-rank machinery as Mann-Whitney
# (per-distinct-value reduction + distributed prefix sum; dyadic-exact
# rank sums). The three per-group rank sums land in EXPLICIT columns,
# so the Σ R_g²/n_g combination is a fixed expression — no float
# reduce order anywhere; tie correction is a plain integer aggregate.
# =============================================================================
@q(
    "stats_kruskal_wallis_returnflag",
    """
    WITH base AS (
      -- observed values only (r13 fuzz; see stats_mann_whitney_status)
      SELECT l_returnflag AS grp, floor(l_extendedprice)::BIGINT AS x
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    per_v AS (
      SELECT x, count(*)::BIGINT AS cnt,
             count(*) FILTER (grp = 'A')::BIGINT AS na,
             count(*) FILTER (grp = 'N')::BIGINT AS nn_,
             count(*) FILTER (grp = 'R')::BIGINT AS nr
      FROM base GROUP BY 1
    ),
    ranked AS (
      SELECT x, cnt, na, nn_, nr,
             sum(cnt) OVER (ORDER BY x
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)::BIGINT AS cum
      FROM per_v
    ),
    agg AS (
      SELECT sum(cnt)::BIGINT AS n,
             sum(na)::BIGINT AS n_a, sum(nn_)::BIGINT AS n_n,
             sum(nr)::BIGINT AS n_r,
             sum(na * ((cum - cnt) + (cnt + 1) / 2.0)) AS ra,
             sum(nn_ * ((cum - cnt) + (cnt + 1) / 2.0)) AS rn,
             sum(nr * ((cum - cnt) + (cnt + 1) / 2.0)) AS rr,
             sum(cnt * cnt * cnt - cnt)::BIGINT AS tie
      FROM ranked
    )
    SELECT n, n_a, n_n, n_r,
           floor((12.0 / (n::DOUBLE * (n + 1))
                  * (ra * ra / n_a + rn * rn / n_n + rr * rr / n_r)
                  - 3.0 * (n + 1))
                 / (1.0 - tie::DOUBLE / (n::DOUBLE * n * n - n))
                 * 1000000 + 0.5) / 1000000 AS h_stat
    FROM agg
    """,
)
def stats_kruskal_wallis_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_and_media_data_ingestion_spark.operators.scale import (
        global_running_sum,
    )

    li = t(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_extendedprice").isNotNull()).select(
        F.col("l_returnflag").alias("grp"),
        F.floor("l_extendedprice").cast("bigint").alias("x"),
    )

    def _cnt(flag):
        return F.sum(F.when(F.col("grp") == flag, 1).otherwise(0)).cast(
            "bigint"
        )

    per_v = base.groupBy("x").agg(
        F.count("*").alias("cnt"),
        _cnt("A").alias("na"),
        _cnt("N").alias("nn_"),
        _cnt("R").alias("nr"),
    )
    ranked = global_running_sum(per_v, ["x"], "cnt", out_col="cum")
    avg_rank = (F.col("cum") - F.col("cnt")) + (F.col("cnt") + 1) / F.lit(2.0)
    agg = ranked.agg(
        F.sum("cnt").alias("n"),
        F.sum("na").alias("n_a"),
        F.sum("nn_").alias("n_n"),
        F.sum("nr").alias("n_r"),
        F.sum(F.col("na") * avg_rank).alias("ra"),
        F.sum(F.col("nn_") * avg_rank).alias("rn"),
        F.sum(F.col("nr") * avg_rank).alias("rr"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tie"),
    )
    n = F.col("n")
    # try_divide on every degenerable ratio: an absent flag group
    # (R_g²/0), n=1 (tie correction /(n³−n)=0), or all-tied data
    # (corr=0) leave H undefined — NULL like the oracle's x/0, not a
    # Spark ANSI crash (r7 one-row probe)
    h0 = (
        F.lit(12.0)
        / (n.cast("double") * (n + 1))
        * (
            F.try_divide(F.col("ra") * F.col("ra"), F.col("n_a"))
            + F.try_divide(F.col("rn") * F.col("rn"), F.col("n_n"))
            + F.try_divide(F.col("rr") * F.col("rr"), F.col("n_r"))
        )
        - F.lit(3.0) * (n + 1)
    )
    corr = F.lit(1.0) - F.try_divide(
        F.col("tie").cast("double"), n.cast("double") * n * n - n
    )
    return agg.select(
        "n",
        "n_a",
        "n_n",
        "n_r",
        _r(F.try_divide(h0, corr), 6).alias("h_stat"),
    )


# =============================================================================
# Statistical testing — two-sample Kolmogorov-Smirnov D between the
# linestatus groups' whole-dollar price distributions: D = max over
# values of |ECDF_1 − ECDF_2|. Both empirical CDFs come from ONE shared
# distributed prefix-sum pass (operators/scale.global_running_sums —
# the multi-column variant range-partitions and checkpoints ONCE for
# both groups' cumulative counts); the max is order-free, and each
# ECDF value is an exact integer ratio evaluated identically on both
# engines.
# =============================================================================
@q(
    "stats_ks_two_sample",
    """
    WITH base AS (
      -- observed values only (r13 fuzz; see stats_mann_whitney_status)
      SELECT l_linestatus AS grp, floor(l_extendedprice)::BIGINT AS x
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    per_v AS (
      SELECT x,
             count(*) FILTER (grp = 'F')::BIGINT AS c1,
             count(*) FILTER (grp <> 'F')::BIGINT AS c2
      FROM base GROUP BY 1
    ),
    ranked AS (
      SELECT x,
             sum(c1) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)::BIGINT AS c1_cum,
             sum(c2) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)::BIGINT AS c2_cum
      FROM per_v
    ),
    tot AS (
      SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2 FROM per_v
    )
    SELECT t.n1, t.n2,
           floor(max(abs(r.c1_cum / t.n1::DOUBLE - r.c2_cum / t.n2::DOUBLE))
                 * 1000000 + 0.5) / 1000000 AS d_stat,
           floor(max(abs(r.c1_cum / t.n1::DOUBLE - r.c2_cum / t.n2::DOUBLE))
                 * sqrt(t.n1::DOUBLE * t.n2 / (t.n1 + t.n2))
                 * 1000000 + 0.5) / 1000000 AS ks_lambda
    FROM ranked r, tot t
    GROUP BY t.n1, t.n2
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_and_media_data_ingestion_spark.operators.scale import (
        global_running_sums,
    )

    li = t(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_extendedprice").isNotNull()).select(
        F.col("l_linestatus").alias("grp"),
        F.floor("l_extendedprice").cast("bigint").alias("x"),
    )
    per_v = base.groupBy("x").agg(
        F.sum(F.when(F.col("grp") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("grp") != "F", 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    ranked = global_running_sums(per_v, ["x"], ["c1", "c2"])
    tot = per_v.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    j = ranked.crossJoin(F.broadcast(tot))
    # try_divide: an absent group (n=0) has no ECDF — D is NULL like
    # the oracle's x/0, not a Spark ANSI crash (r7 one-row probe)
    gap = F.abs(
        F.try_divide(F.col("c1_cum"), F.col("n1").cast("double"))
        - F.try_divide(F.col("c2_cum"), F.col("n2").cast("double"))
    )
    return j.groupBy("n1", "n2").agg(
        _r(F.max(gap), 6).alias("d_stat"),
        _r(
            F.max(gap)
            * F.sqrt(
                F.col("n1").cast("double")
                * F.col("n2")
                / (F.col("n1") + F.col("n2"))
            ),
            6,
        ).alias("ks_lambda"),
    )


# =============================================================================
# Statistical testing — Spearman rank correlation between line quantity
# and whole-dollar price, EXACT under ties and distribution: average
# ranks are DOUBLED to integers (2·avg_rank is always integral), so
# every sufficient statistic — n, ΣR₁, ΣR₂, ΣR₁R₂, ΣR₁², ΣR₂² — is an
# exact BIGINT and partial-sum order cannot move ρ. Each variable's
# rank comes from its own per-distinct-value reduction + distributed
# prefix sum; rows join their ranks back by value (two hash joins
# against value-cardinality-sized frames).
# =============================================================================
def _ks_rank_cte(col: str, alias: str) -> str:
    return f"""
    {alias}_v AS (
      SELECT {col} AS v, count(*)::BIGINT AS cnt FROM base GROUP BY 1
    ),
    {alias}_r AS (
      SELECT v,
             2 * (sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) - cnt)
             + cnt + 1 AS r2
      FROM {alias}_v
    )"""


@q(
    "stats_spearman_qty_price",
    f"""
    WITH base AS (
      -- floor on BOTH engines (r13 fuzz seed 1015): a bare ::BIGINT of
      -- a double ROUNDS half-away in DuckDB while Spark's cast
      -- TRUNCATES — a -42.5 quantity landed in different rank groups.
      -- Observed pairs only (wave-2 rank-stats convention): a NULL rank
      -- group sorts FIRST on Spark's prefix sum and LAST on DuckDB's
      -- window, shifting every Spark rank by its count
      SELECT floor(l_quantity)::BIGINT AS q,
             floor(l_extendedprice)::BIGINT AS p
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    {_ks_rank_cte("q", "qq")},
    {_ks_rank_cte("p", "pp")},
    joined AS (
      SELECT qq_r.r2 AS r1, pp_r.r2 AS r2
      FROM base b
      JOIN qq_r ON qq_r.v = b.q
      JOIN pp_r ON pp_r.v = b.p
    ),
    s AS (
      SELECT count(*)::BIGINT AS n,
             sum(r1)::BIGINT AS s1, sum(r2)::BIGINT AS s2,
             sum(r1 * r2)::BIGINT AS s12,
             sum(r1 * r1)::BIGINT AS s11, sum(r2 * r2)::BIGINT AS s22
      FROM joined
    )
    SELECT n,
           floor((n::DOUBLE * s12 - s1::DOUBLE * s2)
                 / (sqrt(n::DOUBLE * s11 - s1::DOUBLE * s1)
                    * sqrt(n::DOUBLE * s22 - s2::DOUBLE * s2))
                 * 1000000 + 0.5) / 1000000 AS spearman_rho
    FROM s
    """,
)
def stats_spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_and_media_data_ingestion_spark.operators.scale import (
        global_running_sum,
    )

    li = t(spark, sf_dir, "lineitem")
    base = li.filter(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    ).select(
        F.floor("l_quantity").cast("bigint").alias("q"),
        F.floor("l_extendedprice").cast("bigint").alias("p"),
    )

    def ranks(col):
        per_v = base.groupBy(F.col(col).alias("v")).agg(
            F.count("*").alias("cnt")
        )
        ranked = global_running_sum(per_v, ["v"], "cnt", out_col="cum")
        return ranked.select(
            "v",
            (
                2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1
            )
            .cast("bigint")
            .alias("r2"),
        )
    rq = ranks("q").withColumnRenamed("r2", "r1").withColumnRenamed("v", "q")
    rp = ranks("p").withColumnRenamed("v", "p")
    joined = base.join(F.broadcast(rq), "q").join(rp, "p").select("r1", "r2")
    s = joined.agg(
        F.count("*").alias("n"),
        F.sum("r1").alias("s1"),
        F.sum("r2").alias("s2"),
        F.sum(F.col("r1") * F.col("r2")).alias("s12"),
        F.sum(F.col("r1") * F.col("r1")).alias("s11"),
        F.sum(F.col("r2") * F.col("r2")).alias("s22"),
    )
    # products in DOUBLE: the int64 forms overflow at cluster row
    # counts (n·Σr₁r₂ ~ 1e23); identical IEEE ops on both engines keep
    # the hash deterministic
    nd = F.col("n").cast("double")
    num = nd * F.col("s12") - F.col("s1").cast("double") * F.col("s2")
    d1 = nd * F.col("s11") - F.col("s1").cast("double") * F.col("s1")
    d2 = nd * F.col("s22") - F.col("s2").cast("double") * F.col("s2")
    # try_divide: n=1 or a constant variable has zero rank variance —
    # rho is NULL like the oracle's x/0, not a Spark ANSI crash (r7
    # one-row probe)
    return s.select(
        "n",
        _r(F.try_divide(num, F.sqrt(d1) * F.sqrt(d2)), 6).alias(
            "spearman_rho"
        ),
    )


# =============================================================================
# Experimentation — Wilson 95% score interval for a per-type proportion
# (the CI you put on a conversion rate; unlike the normal interval it
# behaves at small n and extreme p). Counts are exact integers from ONE
# combiner-friendly pass; the interval is a fixed closed-form double
# expression evaluated identically on both engines.
# =============================================================================
_WILSON_Z = 1.96


@q(
    "events_conversion_wilson",
    f"""
    WITH c AS (
      SELECT event_type, count(*)::BIGINT AS n,
             count(*) FILTER (value > 250.0)::BIGINT AS k
      FROM events GROUP BY 1
    )
    SELECT event_type, n, k,
           floor(k / n::DOUBLE * 1000000 + 0.5) / 1000000 AS p_hat,
           floor((k / n::DOUBLE + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
                  - {_WILSON_Z} * sqrt(k / n::DOUBLE * (1 - k / n::DOUBLE) / n
                                       + {_WILSON_Z} * {_WILSON_Z}
                                         / (4.0 * n * n)))
                 / (1 + {_WILSON_Z} * {_WILSON_Z} / n) * 1000000 + 0.5)
           / 1000000 AS wilson_lo,
           floor((k / n::DOUBLE + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
                  + {_WILSON_Z} * sqrt(k / n::DOUBLE * (1 - k / n::DOUBLE) / n
                                       + {_WILSON_Z} * {_WILSON_Z}
                                         / (4.0 * n * n)))
                 / (1 + {_WILSON_Z} * {_WILSON_Z} / n) * 1000000 + 0.5)
           / 1000000 AS wilson_hi
    FROM c
    """,
)
def events_conversion_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("value") > 250.0, 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    z = F.lit(_WILSON_Z)
    nd = F.col("n").cast("double")
    p = F.col("k") / nd
    half = z * F.sqrt(p * (1 - p) / F.col("n") + z * z / (4.0 * nd * nd))
    center = p + z * z / (2 * F.col("n"))
    denom = 1 + z * z / F.col("n")
    return c.select(
        "event_type",
        "n",
        "k",
        _r(p, 6).alias("p_hat"),
        _r((center - half) / denom, 6).alias("wilson_lo"),
        _r((center + half) / denom, 6).alias("wilson_hi"),
    )


# =============================================================================
# Experimentation — CUPED variance reduction: θ = cov(Y, X)/var(X) with
# X = each customer's PRE-period spend and Y = POST-period spend (split
# at the integer epoch midpoint of the order range), and the achievable
# variance reduction ρ² = cov²/(var X · var Y). Per-customer spends are
# exact integer whole dollars held in 128-bit integers (Spark
# decimal(38,0) / DuckDB HUGEINT — r12 numeric-extremes probe: the
# int64 moment products x·y, x², y² were an ANSI crash at 1e12-dollar
# spends, and one absurd row must never kill a cluster job; 128-bit
# keeps every sufficient statistic EXACT to ~1e38); the final moment
# combinations evaluate in DOUBLE — identical IEEE expressions on both
# engines from the same exact integers.
# =============================================================================
@q(
    "orders_cuped_theta",
    """
    WITH bounds AS (
      SELECT (epoch_us(min(o_orderdate)) + epoch_us(max(o_orderdate))) // 2
               AS mid
      FROM orders
    ),
    per_c AS (
      SELECT o_custkey,
             sum(CASE WHEN epoch_us(o.o_orderdate) < b.mid
                      THEN floor(o.o_totalprice)::HUGEINT ELSE 0 END)
               AS x,
             sum(CASE WHEN epoch_us(o.o_orderdate) >= b.mid
                      THEN floor(o.o_totalprice)::HUGEINT ELSE 0 END)
               AS y
      FROM orders o, bounds b
      GROUP BY 1
    ),
    s AS (
      SELECT count(*)::BIGINT AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
      FROM per_c
    )
    SELECT n,
           floor((n::DOUBLE * sxy - sx::DOUBLE * sy)
                 / (n::DOUBLE * sxx - sx::DOUBLE * sx)
                 * 1000000 + 0.5) / 1000000 AS theta,
           floor((n::DOUBLE * sxy - sx::DOUBLE * sy)
                 * (n::DOUBLE * sxy - sx::DOUBLE * sy)
                 / ((n::DOUBLE * sxx - sx::DOUBLE * sx)
                    * (n::DOUBLE * syy - sy::DOUBLE * sy))
                 * 1000000 + 0.5) / 1000000 AS var_reduction
    FROM s
    """,
)
def orders_cuped_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.floor(
            (
                F.unix_micros(F.min(F.col("o_orderdate").cast("timestamp")))
                + F.unix_micros(F.max(F.col("o_orderdate").cast("timestamp")))
            )
            / 2
        )
        .cast("long")
        .alias("mid")
    )
    # decimal(19,0) dollars -> decimal(38,0) moment products: the
    # 128-bit twin of the oracle's HUGEINT (see header comment)
    dollars = F.floor("o_totalprice").cast("decimal(19,0)")
    per_c = (
        orders.crossJoin(F.broadcast(bounds))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(F.unix_micros(F.col("o_orderdate").cast("timestamp")) < F.col("mid"), dollars)
                .otherwise(F.lit(0).cast("decimal(19,0)"))
            )
            .alias("x"),
            F.sum(
                F.when(F.unix_micros(F.col("o_orderdate").cast("timestamp")) >= F.col("mid"), dollars)
                .otherwise(F.lit(0).cast("decimal(19,0)"))
            )
            .alias("y"),
        )
    )
    s = per_c.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    # try_divide: one customer (or zero pre/post variance) leaves the
    # CUPED adjustment undefined — NULL like the oracle's x/0, not a
    # Spark ANSI crash (r7 one-row probe)
    return s.select(
        "n",
        _r(F.try_divide(cov, vx), 6).alias("theta"),
        _r(F.try_divide(cov * cov, vx * vy), 6).alias("var_reduction"),
    )


# =============================================================================
# Experimentation — Sample Ratio Mismatch check: users assigned to two
# arms by the deterministic Knuth-mixed hash (the same family as
# rendezvous routing), then a one-dof chi-square of observed arm counts
# against the designed 50/50. SRM is the first gate every experiment
# readout runs; counts are exact integers from one hash-agg.
# =============================================================================
@q(
    "events_srm_check",
    f"""
    WITH arms AS (
      SELECT ((user_id % {_RDV_P}) * 2654435761 + 104729) % {_RDV_P} % 2
               AS arm
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    c AS (
      SELECT count(*)::BIGINT AS n,
             count(*) FILTER (arm = 0)::BIGINT AS arm0,
             count(*) FILTER (arm = 1)::BIGINT AS arm1
      FROM arms
    )
    SELECT n, arm0, arm1,
           floor(((arm0 - n / 2.0) * (arm0 - n / 2.0)
                  + (arm1 - n / 2.0) * (arm1 - n / 2.0)) / (n / 2.0)
                 * 1000000 + 0.5) / 1000000 AS chi2,
           ((arm0 - n / 2.0) * (arm0 - n / 2.0)
            + (arm1 - n / 2.0) * (arm1 - n / 2.0)) / (n / 2.0) > 3.841
             AS srm_flag
    FROM c
    """,
)
def events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    arms = ev.select("user_id").distinct().select(
        (
            ((F.col("user_id") % _RDV_P) * F.lit(2654435761) + 104729)
            % _RDV_P
            % 2
        ).alias("arm")
    )
    # count_if, not sum(when): COUNT semantics give 0 on an empty arm
    # frame where SUM gives NULL — the oracle's count(*) FILTER shape
    # (r7 empty-tables probe)
    c = arms.agg(
        F.count("*").alias("n"),
        F.count_if(F.col("arm") == 0).alias("arm0"),
        F.count_if(F.col("arm") == 1).alias("arm1"),
    )
    half = F.col("n") / F.lit(2.0)
    # try_divide: n=0 -> half=0 -> chi2 NULL, matching DuckDB where
    # float division by zero yields NULL (not IEEE inf/nan)
    chi2 = F.try_divide(
        (F.col("arm0") - half) * (F.col("arm0") - half)
        + (F.col("arm1") - half) * (F.col("arm1") - half),
        half,
    )
    return c.select(
        "n", "arm0", "arm1",
        _r(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_flag"),
    )


# =============================================================================
# Experimentation — Welch two-sample t of whole-dollar order totals
# between the hash-split arms (the A/B readout itself, with unequal-
# variance degrees of freedom). Sufficient statistics are exact
# integers per arm in EXPLICIT columns, so every double expression is
# fixed-order; Welch-Satterthwaite df included.
# =============================================================================
@q(
    "orders_ab_welch_ttest",
    f"""
    WITH base AS (
      SELECT ((o_custkey % {_RDV_P}) * 2654435761 + 104729) % {_RDV_P} % 2
               AS arm,
             floor(o_totalprice)::BIGINT AS d
      FROM orders
    ),
    s AS (
      -- s/ss in HUGEINT (Spark: decimal(38,0)): the r12 numeric-
      -- extremes probe crashed the int64 square d*d at 1e12-dollar
      -- rows — 128-bit keeps the arm statistics exact to ~1e38
      SELECT count(*) FILTER (arm = 0)::BIGINT AS n0,
             count(*) FILTER (arm = 1)::BIGINT AS n1,
             sum(d::HUGEINT) FILTER (arm = 0) AS s0,
             sum(d::HUGEINT) FILTER (arm = 1) AS s1,
             sum(d::HUGEINT * d) FILTER (arm = 0) AS ss0,
             sum(d::HUGEINT * d) FILTER (arm = 1) AS ss1
      FROM base
    )
    SELECT n0, n1,
           floor((s0 / n0::DOUBLE - s1 / n1::DOUBLE)
                 / sqrt((ss0 - s0::DOUBLE * s0 / n0) / (n0 - 1) / n0
                        + (ss1 - s1::DOUBLE * s1 / n1) / (n1 - 1) / n1)
                 * 1000000 + 0.5) / 1000000 AS t_stat,
           floor(((ss0 - s0::DOUBLE * s0 / n0) / (n0 - 1) / n0
                  + (ss1 - s1::DOUBLE * s1 / n1) / (n1 - 1) / n1)
                 * ((ss0 - s0::DOUBLE * s0 / n0) / (n0 - 1) / n0
                    + (ss1 - s1::DOUBLE * s1 / n1) / (n1 - 1) / n1)
                 / (((ss0 - s0::DOUBLE * s0 / n0) / (n0 - 1) / n0)
                    * ((ss0 - s0::DOUBLE * s0 / n0) / (n0 - 1) / n0)
                    / (n0 - 1)
                    + ((ss1 - s1::DOUBLE * s1 / n1) / (n1 - 1) / n1)
                      * ((ss1 - s1::DOUBLE * s1 / n1) / (n1 - 1) / n1)
                      / (n1 - 1))
                 * 10000 + 0.5) / 10000 AS welch_df
    FROM s
    """,
)
def orders_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    base = orders.select(
        (
            ((F.col("o_custkey") % _RDV_P) * F.lit(2654435761) + 104729)
            % _RDV_P
            % 2
        ).alias("arm"),
        # decimal(19,0) dollars -> decimal(38,0) squares/sums: the
        # 128-bit twin of the oracle's HUGEINT (see oracle comment)
        F.floor("o_totalprice").cast("decimal(19,0)").alias("d"),
    )

    def _f(expr, arm):
        return F.sum(
            F.when(F.col("arm") == arm, expr).otherwise(
                F.lit(0).cast("decimal(19,0)")
            )
        )

    # count_if (COUNT semantics: 0 on empty) for the arm sizes, and
    # try_divide on every ratio whose divisor can degenerate (n=0 arm,
    # n=1 arm, zero-variance arm): Spark ANSI `/` raises on a zero
    # divisor where DuckDB float division yields NULL, so the NULL
    # spelling must be explicit on the Spark side (r7 empty-tables
    # probe).
    s = base.agg(
        F.count_if(F.col("arm") == 0).alias("n0"),
        F.count_if(F.col("arm") == 1).alias("n1"),
        _f(F.col("d"), 0).alias("s0"),
        _f(F.col("d"), 1).alias("s1"),
        _f(F.col("d") * F.col("d"), 0).alias("ss0"),
        _f(F.col("d") * F.col("d"), 1).alias("ss1"),
    )
    se0 = F.try_divide(
        F.try_divide(
            F.col("ss0")
            - F.try_divide(F.col("s0").cast("double") * F.col("s0"), F.col("n0")),
            F.col("n0") - 1,
        ),
        F.col("n0"),
    )
    se1 = F.try_divide(
        F.try_divide(
            F.col("ss1")
            - F.try_divide(F.col("s1").cast("double") * F.col("s1"), F.col("n1")),
            F.col("n1") - 1,
        ),
        F.col("n1"),
    )
    mean_diff = F.try_divide(
        F.col("s0"), F.col("n0").cast("double")
    ) - F.try_divide(F.col("s1"), F.col("n1").cast("double"))
    df = F.try_divide(
        (se0 + se1) * (se0 + se1),
        F.try_divide(se0 * se0, F.col("n0") - 1)
        + F.try_divide(se1 * se1, F.col("n1") - 1),
    )
    return s.select(
        "n0",
        "n1",
        _r(F.try_divide(mean_diff, F.sqrt(se0 + se1)), 6).alias("t_stat"),
        _r(df, 4).alias("welch_df"),
    )


# =============================================================================
# Product analytics — the full weekly cohort retention MATRIX: cohort =
# each user's first activity week, one row per (cohort, week-offset)
# with the fraction of the cohort active that week. Two hash-aggs (user
# firsts, then cohort cells) + a broadcast of cohort sizes; weeks are
# integer datediff-div-7 so there is no locale/week-origin dependence.
# =============================================================================
@q(
    "events_retention_matrix",
    f"""
    WITH uw AS (
      SELECT DISTINCT user_id,
             -- floor division, not //: DuckDB's // truncates toward
             -- zero, so pre-1970 (negative-day) weeks were off by one
             -- vs Spark's floor (r7 extreme-timestamps probe)
             CAST(floor(date_diff('day', DATE '{_EPOCH}', ts::DATE) / 7.0) AS BIGINT) AS week
      FROM events
    ),
    firsts AS (
      SELECT user_id, min(week) AS cohort FROM uw GROUP BY 1
    ),
    cohort_sizes AS (
      SELECT cohort, count(*)::BIGINT AS n_users FROM firsts GROUP BY 1
    ),
    cells AS (
      SELECT f.cohort, (uw.week - f.cohort)::BIGINT AS week_offset,
             count(*)::BIGINT AS n_active
      FROM uw JOIN firsts f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT c.cohort::BIGINT AS cohort_week, c.week_offset, c.n_active,
           s.n_users AS cohort_size,
           floor(c.n_active / s.n_users::DOUBLE * 1000000 + 0.5) / 1000000
             AS retention
    FROM cells c JOIN cohort_sizes s USING (cohort)
    """,
)
def events_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # pin the distinct (user, week) frame (lazily): it feeds both the
    # cohort derivation and the cell join, and unpinned each consumer
    # re-scanned events (3 full reads at 100 TB). The pin is the
    # already-shuffled distinct output — bounded by |users|×|weeks|,
    # the same frame the shuffle materializes anyway (round 11).
    uw = (
        ev.select(
            "user_id",
            F.floor(
                F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date")) / 7
            )
            .cast("long")
            .alias("week"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    firsts = uw.groupBy("user_id").agg(F.min("week").alias("cohort"))
    sizes = firsts.groupBy("cohort").agg(F.count("*").alias("n_users"))
    # shuffle_hash: both sides now scan the pinned ExistingRDD with no
    # stats, and the static planner would otherwise sort-merge (the
    # er_resolution_pipeline precedent)
    cells = (
        uw.join(firsts.hint("shuffle_hash"), "user_id")
        .groupBy(
            "cohort", (F.col("week") - F.col("cohort")).alias("week_offset")
        )
        .agg(F.count("*").alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort").select(
        F.col("cohort").alias("cohort_week"),
        "week_offset",
        "n_active",
        F.col("n_users").alias("cohort_size"),
        _r(F.col("n_active") / F.col("n_users").cast("double"), 6).alias(
            "retention"
        ),
    )


# =============================================================================
# Product analytics — DAU/WAU stickiness per calendar week: mean daily
# active users over the week divided by the week's distinct actives
# (the "how often do weekly users show up" engagement ratio). Distinct
# counts are exact; both engines evaluate the same integer ratio.
# =============================================================================
@q(
    "events_stickiness_weekly",
    f"""
    WITH d AS (
      SELECT DISTINCT date_diff('day', DATE '{_EPOCH}', ts::DATE) AS day,
             -- floor division (see events_retention_matrix note)
             CAST(floor(date_diff('day', DATE '{_EPOCH}', ts::DATE) / 7.0) AS BIGINT) AS week,
             user_id
      FROM events
    ),
    dau AS (
      SELECT week, day, count(*)::BIGINT AS dau FROM d GROUP BY 1, 2
    ),
    wau AS (
      SELECT week, count(DISTINCT user_id)::BIGINT AS wau FROM d GROUP BY 1
    ),
    avg_dau AS (
      SELECT week, sum(dau)::BIGINT AS dau_sum, count(*)::BIGINT AS n_days
      FROM dau GROUP BY 1
    )
    SELECT a.week::BIGINT AS week, a.dau_sum, a.n_days, w.wau,
           floor(a.dau_sum / a.n_days::DOUBLE / w.wau * 1000000 + 0.5)
             / 1000000 AS stickiness
    FROM avg_dau a JOIN wau w USING (week)
    """,
)
def events_stickiness_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date"))
    # pin the distinct (day, week, user) frame (lazily): DAU and WAU
    # both consume it, and unpinned each re-scanned events (round-11
    # scan sharing; the pin is the distinct's own shuffle output,
    # bounded by |users|×|days|)
    d = (
        ev.select(
            day.alias("day"),
            F.floor(day / 7).cast("long").alias("week"),
            "user_id",
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    dau = d.groupBy("week", "day").agg(F.count("*").alias("dau"))
    wau = d.groupBy("week").agg(F.countDistinct("user_id").alias("wau"))
    avg_dau = dau.groupBy("week").agg(
        F.sum("dau").alias("dau_sum"), F.count("*").alias("n_days")
    )
    return avg_dau.join(F.broadcast(wau), "week").select(
        "week",
        "dau_sum",
        "n_days",
        "wau",
        _r(
            F.col("dau_sum") / F.col("n_days").cast("double") / F.col("wau"), 6
        ).alias("stickiness"),
    )


# =============================================================================
# Multimodal — native header-dimension sniff (r10): payloads are
# synthesized with GENUINE PNG/JPEG/BMP headers whose dimensions derive
# from doc_id (JPEG's SOF sits at a doc_id-dependent variable offset
# behind APP0 padding; odd-id BMPs store top-down with a negative
# height), then parsed BLIND on the Spark side by sniff_image_dims —
# pure JVM expressions, a bounded aggregate() marker walk for JPEG.
# The oracle never parses: it recomputes the dimensions from the
# construction arithmetic, so agreement proves the byte-level walk
# recovers exactly what was encoded. Corrupt classes (garbage magic,
# truncated JPEG) and NULL ids must yield NULL dims in both engines.
# =============================================================================
@q(
    "multimodal_image_dim_sniff",
    """
    SELECT doc_id,
           CASE WHEN doc_id IS NULL OR doc_id % 7 IN (0, 3) THEN NULL
                WHEN doc_id % 11 = 7 THEN 'tiff'
                WHEN doc_id % 5 = 0 THEN 'png'
                WHEN doc_id % 5 = 1 THEN 'jpeg'
                WHEN doc_id % 5 = 2 THEN 'gif'
                WHEN doc_id % 5 = 3 THEN 'webp'
                ELSE 'bmp' END AS dim_format,
           (CASE WHEN doc_id IS NULL OR doc_id % 7 IN (0, 3) THEN NULL
                 ELSE doc_id % 640 + 1 END)::INTEGER AS width,
           (CASE WHEN doc_id IS NULL OR doc_id % 7 IN (0, 3) THEN NULL
                 ELSE doc_id % 480 + 1 END)::INTEGER AS height
    FROM documents
    """,
)
def multimodal_image_dim_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct

    from social_and_media_data_ingestion_spark.operators import multimodal as MM

    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    w = (did % 640 + 1).cast("bigint")
    h = (did % 480 + 1).cast("bigint")
    pad = (did % 13).cast("int")

    def be(col, nbytes):  # big-endian fixed-width binary from an int
        return F.unhex(F.lpad(F.hex(col), 2 * nbytes, "0"))

    def le4(col):  # little-endian int32: byte-reverse the BE hex
        hx = F.lpad(F.hex(col), 8, "0")
        return F.unhex(
            F.concat(
                hx.substr(7, 2), hx.substr(5, 2), hx.substr(3, 2), hx.substr(1, 2)
            )
        )

    png = F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"),
        be(w, 4),
        be(h, 4),
        F.lit(b"\x08\x06\x00\x00\x00"),
    )
    jpeg = F.concat(
        F.lit(b"\xff\xd8\xff\xe0"),
        be(pad + 7, 2),  # APP0 length: 2 (len) + 5 (JFIF\0) + pad
        F.lit(b"JFIF\x00"),
        F.lit(bytes(16)).substr(F.lit(1), pad),  # variable-length pad
        F.lit(b"\xff\xdb" + struct.pack(">H", 5) + b"\x01\x02\x03"),
        F.lit(b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"),
        be(h, 2),
        be(w, 2),
        F.lit(b"\x03"),
    )
    def le2(col):  # little-endian uint16 (GIF logical screen descriptor)
        hx = F.lpad(F.hex(col), 4, "0")
        return F.unhex(F.concat(hx.substr(3, 2), hx.substr(1, 2)))

    gif = F.concat(
        F.lit(b"GIF89a"), le2(w), le2(h), F.lit(b"\x00\x00\x00")
    )

    def le3(col):  # little-endian 24-bit (VP8X canvas fields)
        hx = F.lpad(F.hex(col), 6, "0")
        return F.unhex(F.concat(hx.substr(5, 2), hx.substr(3, 2), hx.substr(1, 2)))

    # the webp class rotates through ALL THREE first-chunk layouts so
    # the scale run exercises each parse path, not just one
    wp_hdr = b"RIFF" + struct.pack("<I", 0) + b"WEBP"
    vp8x = F.concat(
        F.lit(wp_hdr + b"VP8X" + struct.pack("<I", 10) + b"\x00\x00\x00\x00"),
        le3(w - 1),
        le3(h - 1),
    )
    vp8 = F.concat(
        F.lit(wp_hdr + b"VP8 " + struct.pack("<I", 10) + b"\x00\x00\x00\x9d\x01\x2a"),
        le2(w),
        le2(h),
    )
    vp8l = F.concat(
        F.lit(wp_hdr + b"VP8L" + struct.pack("<I", 5) + b"\x2f"),
        le4((w - 1) + (h - 1) * 16384),
    )
    variant = F.expr("doc_id div 5") % 3
    webp = (
        F.when(variant == 0, vp8x).when(variant == 1, vp8).otherwise(vp8l)
    )
    # half the BMP class stores top-down: height field = two's-complement
    # negative (the other half keeps bottom-up, so BOTH row orders parse)
    h_enc = F.when(did % 8 == 3, F.lit(4294967296).cast("bigint") - h).otherwise(h)
    bmp = F.concat(
        F.lit(b"BM" + struct.pack("<IHHI", 70, 0, 0, 54) + struct.pack("<I", 40)),
        le4(w),
        le4(h_enc),
        F.lit(struct.pack("<HHIIiiII", 1, 24, 0, 16, 2835, 2835, 0, 0)),
    )
    # TIFF class (r11): IFD0 at a did-dependent offset (junk pad between
    # header and IFD, so the dynamic-offset read is load-bearing), four
    # ascending-tag entries with width as SHORT or LONG by did%3, both
    # byte orders by did%2 — the blind IFD walk must reproduce the
    # construction arithmetic across every variant
    pad13 = (did % 13).cast("bigint")
    w_short = did % 3 == 0

    def tiff_of(le: bool):
        if le:
            pk = lambda fmt, *v: struct.pack("<" + fmt, *v)  # noqa: E731
            n2, n4 = le2, le4
        else:
            pk = lambda fmt, *v: struct.pack(">" + fmt, *v)  # noqa: E731
            n2, n4 = (lambda c: be(c, 2)), (lambda c: be(c, 4))
        magic = b"II*\x00" if le else b"MM\x00*"
        entry_w = F.when(
            w_short, F.concat(F.lit(pk("HHI", 256, 3, 1)), n2(w), F.lit(b"\x00\x00"))
        ).otherwise(F.concat(F.lit(pk("HHI", 256, 4, 1)), n4(w)))
        return F.concat(
            F.lit(magic),
            n4(pad13 + 8),
            F.lit(bytes(16)).substr(F.lit(1), pad13.cast("int")),
            F.lit(pk("H", 4)),
            F.lit(pk("HHI", 254, 4, 1) + pk("I", 0)),
            entry_w,
            F.concat(F.lit(pk("HHI", 257, 4, 1)), n4(h)),
            F.lit(pk("HHI", 259, 3, 1) + pk("H", 1) + b"\x00\x00"),
            F.lit(pk("I", 0)),
        )

    tiff = F.when(did % 2 == 0, tiff_of(True)).otherwise(tiff_of(False))
    payload = (
        F.when(did % 7 == 0, F.lit(b"\x00\x01"))  # garbage magic
        .when(did % 7 == 3, F.lit(b"\xff\xd8\xff\xe0\x00"))  # truncated JPEG
        .when(did % 11 == 7, tiff)
        .when(did % 5 == 0, png)
        .when(did % 5 == 1, jpeg)
        .when(did % 5 == 2, gif)
        .when(did % 5 == 3, webp)
        .otherwise(bmp)
    )
    media = docs.select("doc_id", payload.alias("payload"))
    return MM.sniff_image_dims(media).select(
        "doc_id", "dim_format", "width", "height"
    )


# =============================================================================
# Multimodal — REAL pixel decode through the Python path (r10): the dim
# sniff above proves the native header walk; this proves the stdlib
# RASTER decode. Payloads are genuine uncompressed 24-bit BMPs built
# natively (doc_id-derived geometry exercising every stride-padding
# class, raster = a known arithmetic byte sequence in bottom-up storage
# order), decoded FOR REAL by decode_bmp inside image_pixel_stats
# (mapInPandas). Because the raster is arithmetic, the per-channel
# means have CLOSED FORMS — the oracle computes those, so agreement
# proves the byte-level decode (BGR order, stride skip, row flip)
# against an engine that never parses a byte. Every doc_id % 5 == 0
# payload truncates after the header: a NULL-stats row, not a failure.
# =============================================================================
@q(
    "multimodal_image_pixel_stats",
    """
    WITH m AS (
      SELECT doc_id,
             doc_id % 4 + 1 AS w,
             doc_id % 3 + 1 AS h,
             ((doc_id % 4 + 1) * 3 + 3) // 4 * 4 AS stride
      FROM documents
    ), s AS (
      SELECT doc_id, w, h,
             CASE WHEN doc_id IS NULL OR doc_id % 5 = 0 THEN NULL
                  WHEN doc_id % 2 = 0
                    THEN stride * (h - 1) / 2.0 + 3 * (w - 1) / 2.0
                  ELSE 3.0 * (w * h - 1) / 2.0 END AS base,
             CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END AS rofs
      FROM m
    )
    SELECT doc_id AS media_id,
           (CASE WHEN base IS NULL THEN NULL ELSE w END)::INTEGER AS width,
           (CASE WHEN base IS NULL THEN NULL ELSE h END)::INTEGER AS height,
           base + rofs AS mean_r,
           base + 1 AS mean_g,
           base + (2 - rofs) AS mean_b,
           CASE WHEN doc_id IS NULL THEN 'null_payload'
                WHEN doc_id % 5 = 0 THEN 'corrupt'
                ELSE 'ok' END AS status
    FROM s
    """,
)
def multimodal_image_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct

    from social_and_media_data_ingestion_spark.operators import multimodal as MM

    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    w = (did % 4 + 1).cast("bigint")
    h = (did % 3 + 1).cast("bigint")
    stride = (F.floor((w * 3 + 3) / 4) * 4).cast("bigint")

    def le4(col):
        hx = F.lpad(F.hex(col), 8, "0")
        return F.unhex(
            F.concat(
                hx.substr(7, 2), hx.substr(5, 2), hx.substr(3, 2), hx.substr(1, 2)
            )
        )

    header = F.concat(
        F.lit(b"BM" + struct.pack("<IHHI", 0, 0, 0, 54) + struct.pack("<I", 40)),
        le4(w),
        le4(h),
        F.lit(struct.pack("<HHIIiiII", 1, 24, 0, 0, 2835, 2835, 0, 0)),
    )
    # raster: the first N bytes of 0,1,2,...,63 (max 36 needed) —
    # storage byte i has VALUE i, which is what gives the closed forms
    pool = F.lit(bytes(range(64)))
    bmp = F.concat(header, pool.substr(F.lit(1), (stride * h).cast("int")))
    # PPM class (r10 second half): exercises decode_ppm at scale — an
    # ASCII header built natively, raster RGB-interleaved with NO
    # stride padding (the closed form differs from BMP's in both the
    # stride term and the channel offsets: PPM stores RGB, BMP BGR)
    ppm = F.concat(
        F.lit(b"P6\n"),
        F.encode(w.cast("string"), "utf-8"),
        F.lit(b" "),
        F.encode(h.cast("string"), "utf-8"),
        F.lit(b"\n255\n"),
        pool.substr(F.lit(1), (w * h * 3).cast("int")),
    )
    payload = (
        F.when(did % 5 == 0, header)  # truncated: header, no raster
        .when(did % 2 == 0, bmp)
        .otherwise(ppm)
    )
    media = docs.select(did.alias("media_id"), payload.alias("payload"))
    return MM.image_pixel_stats(media)


# =============================================================================
# Multimodal — REAL PNG pixel decode (r11): decode_png inflates IDAT
# with stdlib zlib and inverts filters 0-4; this query proves that
# path AT SCALE the same way the BMP/PPM query proves decode_bmp.
# Payloads are spec-shaped PNGs synthesized NATIVELY in Spark SQL: the
# IDAT zlib stream uses a STORED (uncompressed) deflate block, whose
# framing (78 01 | 01 | LEN | ~LEN | raw scanlines) is exact bytes a
# SQL expression can emit — no deflate needed, while decode_png runs
# the very same inflate it runs on real files (chunk CRCs and adler32
# are zeros; the decoder is deliberately lenient about both). Rows
# rotate through three filter encodings — None, Up (consecutive
# arithmetic rows differ by a CONSTANT stride, so the encoded row is
# one repeated byte), Sub (within-row deltas are the constant 1 after
# the first pixel) — and all three decode to the SAME arithmetic
# raster (byte i = i), so the per-channel means have one closed form
# the oracle computes without parsing a byte: agreement proves the
# stored-block inflate AND the Up/Sub defilter arithmetic. r13 adds a
# 4-bit PALETTE class (doc_id%7==2): all pixels are index doc_id%16,
# a packed byte holds the index in both nibbles, and the means are
# EXACTLY the PLTE entry — proving palette resolution + sub-byte
# unpacking at scale. doc_id%7==3 rows carry a lossless-JPEG SOF3
# prefix (status='needs_codec' — baseline JPEG decodes for real since
# r12, progressive since r13), doc_id%5==0 rows a stored block that
# declares more scanline bytes than it ships (status='corrupt'),
# NULL ids a NULL payload.
# =============================================================================
@q(
    "multimodal_png_pixel_stats",
    """
    WITH m AS (
      SELECT doc_id,
             doc_id % 4 + 1 AS w,
             doc_id % 3 + 1 AS h,
             doc_id % 16 AS v
      FROM documents
    ), s AS (
      SELECT doc_id, w, h, v,
             CASE WHEN doc_id IS NULL THEN 'null_payload'
                  WHEN doc_id % 7 = 3 THEN 'needs_codec'
                  WHEN doc_id % 5 = 0 THEN 'corrupt'
                  WHEN doc_id % 7 = 2 THEN 'pal'
                  ELSE 'rgb' END AS cls
      FROM m
    )
    SELECT doc_id AS media_id,
           (CASE WHEN cls IN ('rgb', 'pal') THEN w END)::INTEGER AS width,
           (CASE WHEN cls IN ('rgb', 'pal') THEN h END)::INTEGER AS height,
           CASE WHEN cls = 'rgb' THEN 3.0 * (w * h - 1) / 2.0
                WHEN cls = 'pal' THEN ((v * 5) % 256)::DOUBLE
                END AS mean_r,
           CASE WHEN cls = 'rgb' THEN 3.0 * (w * h - 1) / 2.0 + 1
                WHEN cls = 'pal' THEN ((v * 7 + 1) % 256)::DOUBLE
                END AS mean_g,
           CASE WHEN cls = 'rgb' THEN 3.0 * (w * h - 1) / 2.0 + 2
                WHEN cls = 'pal' THEN ((v * 11 + 2) % 256)::DOUBLE
                END AS mean_b,
           CASE WHEN cls IN ('rgb', 'pal') THEN 'ok' ELSE cls END AS status
    FROM s
    """,
)
def multimodal_png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct

    from social_and_media_data_ingestion_spark.operators import multimodal as MM

    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    w = (did % 4 + 1).cast("int")
    h = (did % 3 + 1).cast("int")

    def be32(col):
        return F.unhex(F.lpad(F.hex(col), 8, "0"))

    def le16(col):
        hx = F.lpad(F.hex(col), 4, "0")
        return F.unhex(F.concat(hx.substr(3, 2), hx.substr(1, 2)))

    base = (
        docs.select("doc_id")
        .withColumn("_w", w)
        .withColumn("_h", h)
        .withColumn("_stride", w * 3)
        # filter class decorrelated from _h (which is doc_id % 3):
        # 0 = all rows filter None, 1 = Up after row 0, 2 = Sub
        .withColumn("_fc", (F.expr("doc_id div 7") % 3).cast("int"))
        .withColumn("_pool", F.lit(bytes(range(64))))
    )
    # per-row scanline encodings (decoded raster byte i has VALUE i):
    #  None: 00 | pool[r*stride .. +stride)
    #  Up  : 02 | the constant byte `stride` repeated (row deltas)
    #  Sub : 01 | 3 raw first-pixel bytes | 03 repeated (in-row deltas)
    scanlines = F.expr(
        """aggregate(
      sequence(0, _h - 1), cast(X'' as binary),
      (acc, r) -> concat(acc, CASE
        WHEN _fc = 2 THEN concat(X'01',
          unhex(lpad(hex(r * _stride), 2, '0')),
          unhex(lpad(hex(r * _stride + 1), 2, '0')),
          unhex(lpad(hex(r * _stride + 2), 2, '0')),
          unhex(repeat('03', _stride - 3)))
        WHEN _fc = 1 AND r > 0 THEN concat(X'02',
          unhex(repeat(lpad(hex(_stride), 2, '0'), _stride)))
        ELSE concat(X'00', substring(_pool, r * _stride + 1, _stride))
      END))"""
    )
    n_stored = (F.col("_stride") + 1) * F.col("_h")
    # zlib header + ONE final stored deflate block + 4 adler bytes the
    # decoder deliberately does not verify
    zstream = F.concat(
        F.lit(b"\x78\x01\x01"),
        le16(n_stored),
        le16(F.lit(65535) - n_stored),
        F.col("_scan"),
        F.lit(b"\x00\x00\x00\x00"),
    )
    # same framing but the stored block declares n_stored bytes and
    # ships none -> inflate yields a short raster -> status='corrupt'
    ztrunc = F.concat(
        F.lit(b"\x78\x01\x01"), le16(n_stored), le16(F.lit(65535) - n_stored)
    )

    def chunk(tag: bytes, payload):
        return F.concat(
            be32(F.length(payload)),
            F.lit(tag),
            payload,
            F.lit(b"\x00\x00\x00\x00"),  # CRC unverified by design
        )

    ihdr_payload = F.concat(
        be32(F.col("_w").cast("bigint")),
        be32(F.col("_h").cast("bigint")),
        F.lit(b"\x08\x02\x00\x00\x00"),  # 8-bit, RGB, non-interlaced
    )
    sig = F.lit(b"\x89PNG\r\n\x1a\n")
    iend = F.lit(struct.pack(">I", 0) + b"IEND" + b"\x00\x00\x00\x00")
    png = F.concat(
        sig, chunk(b"IHDR", ihdr_payload), chunk(b"IDAT", zstream), iend
    )
    png_trunc = F.concat(
        sig, chunk(b"IHDR", ihdr_payload), chunk(b"IDAT", ztrunc), iend
    )
    # r13: 4-bit PALETTE class (%7==2) — every pixel is index v =
    # doc_id%16, so a packed byte is v*17 (v in both nibbles), each
    # row is filter-None + that byte repeated, and the means are
    # EXACTLY the PLTE entry: proves PLTE resolution + sub-byte
    # unpacking at scale with a zero-arithmetic oracle
    v = (did % 16).cast("int")
    plte_tab = bytes(
        c for i in range(16)
        for c in ((i * 5) % 256, (i * 7 + 1) % 256, (i * 11 + 2) % 256)
    )
    pstride = F.expr("(_w + 1) div 2").cast("int")
    pal_scan = F.unhex(
        F.repeat(
            F.concat(
                F.lit("00"),
                F.repeat(F.lpad(F.hex(v * 17), 2, "0"), pstride),
            ),
            F.col("_h"),
        )
    )
    n_pal = (pstride + 1) * F.col("_h")
    z_pal = F.concat(
        F.lit(b"\x78\x01\x01"), le16(n_pal), le16(F.lit(65535) - n_pal),
        pal_scan, F.lit(b"\x00\x00\x00\x00"),
    )
    ihdr_pal = F.concat(
        be32(F.col("_w").cast("bigint")),
        be32(F.col("_h").cast("bigint")),
        F.lit(b"\x04\x03\x00\x00\x00"),  # 4-bit, palette
    )
    png_pal = F.concat(
        sig, chunk(b"IHDR", ihdr_pal), chunk(b"PLTE", F.lit(plte_tab)),
        chunk(b"IDAT", z_pal), iend,
    )
    # lossless-JPEG (SOF3) prefix: baseline decodes for real since
    # r12 and progressive since r13, so the needs_codec class must be
    # a frame type that GENUINELY needs a codec — decode_jpeg raises
    # NotImplementedError on the 0xffc3 marker
    jpeg = F.lit(b"\xff\xd8\xff\xc3")
    payload = (
        F.when(did % 7 == 3, jpeg)
        .when(did % 5 == 0, png_trunc)
        .when(did % 7 == 2, png_pal)
        .otherwise(png)
    )
    media = base.withColumn("_scan", scanlines).select(
        did.alias("media_id"), payload.alias("payload")
    )
    return MM.image_pixel_stats(media)


# =============================================================================
# Multimodal — REAL GIF pixel decode (r11): GIF's only compression is
# LZW, and LZW is ~40 lines of pure Python, so decode_gif is the
# codec-one-further step after zlib-PNG — container struct-parse,
# sub-block unwrap, variable-width LSB-first code stream, palette
# lookup. Payloads are spec-shaped GIF89a files synthesized NATIVELY
# in Spark SQL: with min-code-size 7 the code width is 8 bits, so a
# clear-then-literals stream is exact bytes a SQL expression can emit
# (code i = byte i), while decode_gif runs the very same LZW loop it
# runs on real files. The global color table maps index i ->
# (i, i+1, i+2), and the main class emits pixel index i at position i,
# so the channel means have the closed form (w*h-1)/2 + channel. Two
# fixed-geometry classes force the LZW paths the literal stream never
# takes: doc_id%7==5 is a 6x1 frame whose stream replays dictionary
# code 130 twice (a plain dict hit, split across TWO sub-blocks so
# reassembly is load-bearing); doc_id%7==1 is a 3x1 frame whose stream
# emits code 130 BEFORE the decoder defines it (the KwKwK case).
# doc_id%7==3 rows carry a lossless-JPEG SOF3 prefix
# (status='needs_codec' — baseline JPEG decodes for real since r12,
# progressive since r13; interlaced GIFs also decode for real since
# r13, proven by the test-side sentinel-row roundtrips — channel
# means are permutation-invariant, so the oracle cannot see them),
# doc_id%5==0 rows declare a 10-byte sub-block and ship none
# (status='corrupt'), NULL ids a NULL payload.
# =============================================================================
@q(
    "multimodal_gif_pixel_stats",
    """
    WITH m AS (
      SELECT doc_id,
             doc_id % 4 + 1 AS w,
             doc_id % 3 + 1 AS h
      FROM documents
    ), c AS (
      SELECT doc_id,
             CASE WHEN doc_id IS NULL THEN 'null_payload'
                  WHEN doc_id % 7 = 3 THEN 'needs_codec'
                  WHEN doc_id % 5 = 0 THEN 'corrupt'
                  ELSE 'ok' END AS status,
             CASE WHEN doc_id % 7 = 5 THEN 6
                  WHEN doc_id % 7 = 1 THEN 3
                  ELSE w END AS w2,
             CASE WHEN doc_id % 7 IN (5, 1) THEN 1 ELSE h END AS h2,
             CASE WHEN doc_id % 7 = 5 THEN 1.5::DOUBLE
                  WHEN doc_id % 7 = 1 THEN 3.0::DOUBLE
                  ELSE (w * h - 1) / 2.0 END AS mr
      FROM m
    )
    SELECT doc_id AS media_id,
           (CASE WHEN status = 'ok' THEN w2 END)::INTEGER AS width,
           (CASE WHEN status = 'ok' THEN h2 END)::INTEGER AS height,
           CASE WHEN status = 'ok' THEN mr END AS mean_r,
           CASE WHEN status = 'ok' THEN mr + 1 END AS mean_g,
           CASE WHEN status = 'ok' THEN mr + 2 END AS mean_b,
           status
    FROM c
    """,
)
def multimodal_gif_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct

    from social_and_media_data_ingestion_spark.operators import multimodal as MM

    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    w = (did % 4 + 1).cast("int")
    h = (did % 3 + 1).cast("int")
    wh = (w * h).cast("int")

    def le16(col):
        hx = F.lpad(F.hex(col), 4, "0")
        return F.unhex(F.concat(hx.substr(3, 2), hx.substr(1, 2)))

    def u8(col):
        return F.unhex(F.lpad(F.hex(col), 2, "0"))

    # 128-entry global color table: index i -> (i, i+1, i+2)
    gct = bytes(v for i in range(128) for v in (i, i + 1, i + 2))
    # logical screen: GCT flag set, size field 6 (128 entries)
    hdr = F.concat(
        F.lit(b"GIF89a"), le16(w), le16(h), F.lit(b"\xf6\x00\x00" + gct)
    )
    # image descriptor at (0,0), no LCT, no interlace; then mcs=7
    desc = F.concat(
        F.lit(b"\x2c\x00\x00\x00\x00"), le16(w), le16(h), F.lit(b"\x00\x07")
    )
    pool = F.lit(bytes(range(64)))
    # ONE sub-block: clear(0x80) + literal codes 0..wh-1 + end(0x81),
    # each one byte because the code width stays 8 bits (the table
    # never reaches 256 entries for wh <= 12)
    gif_main = F.concat(
        hdr,
        desc,
        u8(wh + 2),
        F.lit(b"\x80"),
        pool.substr(F.lit(1), wh),
        F.lit(b"\x81"),
        F.lit(b"\x00\x3b"),
    )
    # declares a 10-byte sub-block and ships none -> 'corrupt'
    gif_trunc = F.concat(hdr, desc, F.lit(b"\x0a"))

    def const_gif(cw: int, ch: int, stream: bytes, split: list[int]) -> bytes:
        p = bytearray(b"GIF89a")
        p += struct.pack("<HHBBB", cw, ch, 0xF6, 0, 0)
        p += gct
        p += b"\x2c" + struct.pack("<HHHHB", 0, 0, cw, ch, 0)
        p += b"\x07"
        i = 0
        for n in split:
            p += bytes([n]) + stream[i : i + n]
            i += n
        p += b"\x00\x3b"
        return bytes(p)

    # pixels 1,2,1,2,1,2 -> codes [clear,1,2,130,130,end]: code 130 is
    # a PLAIN dictionary hit replayed twice; stream split 4+2 so the
    # sub-block reassembly is load-bearing for the hash match
    gif_dict = F.lit(const_gif(6, 1, bytes([0x80, 1, 2, 0x82, 0x82, 0x81]), [4, 2]))
    # pixels 3,3,3 -> codes [clear,3,130,end]: 130 arrives one step
    # BEFORE the decoder defines it (the KwKwK case)
    gif_kwkwk = F.lit(const_gif(3, 1, bytes([0x80, 3, 0x82, 0x81]), [4]))
    # lossless-JPEG (SOF3) prefix: baseline decodes for real since
    # r12 and progressive since r13, so the needs_codec class must be
    # a frame type that GENUINELY needs a codec — decode_jpeg raises
    # NotImplementedError on the 0xffc3 marker
    jpeg = F.lit(b"\xff\xd8\xff\xc3")
    payload = (
        F.when(did % 7 == 3, jpeg)
        .when(did % 5 == 0, gif_trunc)
        .when(did % 7 == 5, gif_dict)
        .when(did % 7 == 1, gif_kwkwk)
        .otherwise(gif_main)
    )
    media = docs.select(did.alias("media_id"), payload.alias("payload"))
    return MM.image_pixel_stats(media)


# =============================================================================
# Multimodal — REAL baseline-JPEG pixel decode (r12): decode_jpeg runs
# Huffman entropy decode + dequant + sparse IDCT + YCbCr->RGB; this
# query proves that path AT SCALE the PNG/GIF way. Payloads are
# spec-shaped SOF0 JPEGs synthesized NATIVELY in Spark SQL using
# custom-but-legal Huffman tables chosen so every coded block is
# byte-aligned: the DC table maps category 0 to the 2-bit code '00'
# and category 6 to the 4-bit '0100', the AC table maps EOB to the
# 6-bit '000000', so a cat-6 block is exactly 2 bytes (never 0xFF —
# no stuffing) and a cat-0 block is the single byte 0x00. With quant
# table all 8s, a DC-only block IDCTs to the flat value 128+V (the
# dequantized coefficient 8V divided by 8), so the channel means have
# closed forms the oracle computes without parsing a byte: gray
# 128+vy; color floor-rounded JFIF YCbCr->RGB of (128+vy, 128+vcb,
# 128+vcr). FOUR real-decode classes: 4:4:4 color up to 2x2 MCUs
# (multi-MCU scan walk: later MCUs are all-cat-0 diffs), grayscale
# (%7==5), 4:2:0 single-MCU (%7==1: four Y blocks + subsampled
# chroma, exercising the hmax/vmax upsampling), and — r13 —
# PROGRESSIVE SOF2 single-MCU color (%7==3): a single DC scan against
# a second DC table whose cat-6 code is the 2-bit '00', so each
# component's scan byte IS its 6 extra bits; this drives the
# coefficient-store path (_jpeg_store_scan/_jpeg_finish_store) end to
# end with the same closed-form means as the 4:4:4 class. doc_id%5==0
# rows declare a 2-MCU geometry but ship one MCU (premature EOI
# inside the entropy stream -> status='corrupt'), doc_id%11==7 rows
# carry a lossless SOF3 prefix (the honest 'needs_codec' class now
# that progressive decodes), NULL ids a NULL payload.
# The AC/run-length/restart/refinement surface the flat fixtures
# cannot reach is pinned by the test-side encoder roundtrips
# (test_multimodal.py: baseline, progressive spectral/successive-
# approximation, sequential multi-scan).
# =============================================================================
@q(
    "multimodal_jpeg_pixel_stats",
    """
    WITH m AS (
      SELECT doc_id,
             32 + doc_id % 32 AS vy,
             -(32 + doc_id % 16) AS vcb,
             -(32 + (doc_id // 16) % 16) AS vcr
      FROM documents
    ), c AS (
      SELECT doc_id, vy, vcb, vcr,
             CASE WHEN doc_id IS NULL THEN 'null_payload'
                  WHEN doc_id % 7 = 3 THEN 'ok'
                  WHEN doc_id % 5 = 0 THEN 'corrupt'
                  WHEN doc_id % 11 = 7 THEN 'needs_codec'
                  ELSE 'ok' END AS status,
             doc_id % 7 = 5 AS is_gray,
             CASE WHEN doc_id % 7 IN (5, 3) THEN doc_id % 8 + 1
                  WHEN doc_id % 7 = 1 THEN doc_id % 16 + 1
                  ELSE doc_id % 9 + 1 END AS w2,
             CASE WHEN doc_id % 7 IN (5, 3) THEN (doc_id // 8) % 8 + 1
                  WHEN doc_id % 7 = 1 THEN (doc_id // 16) % 16 + 1
                  ELSE doc_id % 11 + 1 END AS h2
      FROM m
    )
    SELECT doc_id AS media_id,
           (CASE WHEN status = 'ok' THEN w2 END)::INTEGER AS width,
           (CASE WHEN status = 'ok' THEN h2 END)::INTEGER AS height,
           CASE WHEN status <> 'ok' THEN NULL
                WHEN is_gray THEN (128 + vy)::DOUBLE
                ELSE FLOOR(128 + vy + 1.402 * vcr + 0.5) END AS mean_r,
           CASE WHEN status <> 'ok' THEN NULL
                WHEN is_gray THEN (128 + vy)::DOUBLE
                ELSE FLOOR((128 + vy) - 0.344136 * vcb - 0.714136 * vcr
                           + 0.5) END AS mean_g,
           CASE WHEN status <> 'ok' THEN NULL
                WHEN is_gray THEN (128 + vy)::DOUBLE
                ELSE FLOOR(128 + vy + 1.772 * vcb + 0.5) END AS mean_b,
           status
    FROM c
    """,
)
def multimodal_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct

    from social_and_media_data_ingestion_spark.operators import multimodal as MM

    docs = t(spark, sf_dir, "documents")
    # This query's cost is the Python-side Huffman+IDCT decode inside
    # image_pixel_stats' mapInPandas (~1.2 s single-threaded for the
    # sf0.1 fixture, measured r13 opt round), and documents at the bench
    # SFs is ONE parquet row group = one scan split, so the whole decode
    # would run serially on one core (guide §2.5: unsplittable input ->
    # repartition right after the read). Shuffle ONLY doc_id (8 bytes/
    # row) BEFORE the payload synthesis so the synthesized JPEG bytes
    # never cross the exchange (guide §2.3); skipped when the scan
    # already parallelizes (a real multi-file image corpus).
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.select("doc_id").repartition(par)
    did = F.col("doc_id")
    vy = (did % 32 + 32).cast("int")  # DC category 6, positive
    e_cb = (31 - did % 16).cast("int")  # extra bits of vcb = -(32+d%16)
    e_cr = (31 - (F.expr("doc_id div 16") % 16)).cast("int")

    def be2(col):
        return F.unhex(F.lpad(F.hex(col), 4, "0"))

    def cat6(e):
        # '0100' + 6 extra bits + '000000' EOB = 2 exact bytes
        return F.concat(
            F.unhex(F.lpad(F.hex((e / 4).cast("int") + 64), 2, "0")),
            F.unhex(F.lpad(F.hex((e % 4) * 64), 2, "0")),
        )

    # fixed table segments: quant all 8s; DC {cat0->'00', cat6->'0100'};
    # AC {EOB->'000000'}
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([8] * 64)
    dht = (
        b"\xff\xc4" + struct.pack(">H", 21) + b"\x00"
        + bytes([0, 1, 0, 1] + [0] * 12) + bytes([0x00, 0x06])
        + b"\xff\xc4" + struct.pack(">H", 20) + b"\x10"
        + bytes([0, 0, 0, 0, 0, 1] + [0] * 10) + bytes([0x00])
    )
    # second DC table (id 1) for the progressive class: ONE 2-bit code
    # ('00') mapping category 6, so a DC-scan block is the single byte
    # 0b00eeeeee — the 6 extra bits verbatim
    dht_dc1 = (
        b"\xff\xc4" + struct.pack(">H", 20) + b"\x01"
        + bytes([0, 1] + [0] * 14) + bytes([0x06])
    )
    head = F.lit(b"\xff\xd8" + dqt + dht)
    head_prog = F.lit(b"\xff\xd8" + dqt + dht + dht_dc1)
    sos3 = b"\xff\xda\x00\x0c\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00"
    sos1 = b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
    # progressive DC scan: Td=1 per component, Ss=Se=0, Ah=Al=0
    sos_p = b"\xff\xda\x00\x0c\x03\x01\x10\x02\x10\x03\x10\x00\x00\x00"
    eoi = F.lit(b"\xff\xd9")

    def sof(ncomp: int, y_samp: int, w, h, marker: bytes = b"\xc0"):
        if ncomp == 1:
            return F.concat(
                F.lit(b"\xff" + marker + b"\x00\x0b\x08"), be2(h), be2(w),
                F.lit(b"\x01\x01\x11\x00"),
            )
        return F.concat(
            F.lit(b"\xff" + marker + b"\x00\x11\x08"), be2(h), be2(w),
            F.lit(bytes([3, 1, y_samp, 0, 2, 0x11, 0, 3, 0x11, 0])),
        )

    mcu1 = F.concat(cat6(vy), cat6(e_cb), cat6(e_cr))
    # 4:4:4 color up to 2x2 MCUs; MCUs after the first are 3 cat-0
    # blocks = 3 zero bytes each (flat image: all later DC diffs 0)
    w3 = (did % 9 + 1).cast("int")
    h3 = (did % 11 + 1).cast("int")
    n_mcu = F.ceil(w3 / 8) * F.ceil(h3 / 8)
    color = F.concat(
        head, sof(3, 0x11, w3, h3), F.lit(sos3), mcu1,
        F.lit(bytes(9)).substr(F.lit(1), (3 * (n_mcu - 1)).cast("int")),
        eoi,
    )
    # grayscale single MCU
    wg = (did % 8 + 1).cast("int")
    hg = (F.expr("doc_id div 8") % 8 + 1).cast("int")
    gray = F.concat(head, sof(1, 0x11, wg, hg), F.lit(sos1), cat6(vy), eoi)
    # 4:2:0 single MCU: Y1 cat-6 + Y2..Y4 cat-0 + chroma
    w4 = (did % 16 + 1).cast("int")
    h4 = (F.expr("doc_id div 16") % 16 + 1).cast("int")
    j420 = F.concat(
        head, sof(3, 0x22, w4, h4), F.lit(sos3),
        cat6(vy), F.lit(bytes(3)), cat6(e_cb), cat6(e_cr), eoi,
    )
    # corrupt: declares 16x8 (2 MCUs) but ships one -> premature EOI
    trunc = F.concat(
        head, sof(3, 0x11, F.lit(16), F.lit(8)), F.lit(sos3), mcu1, eoi
    )
    # r13: REAL progressive SOF2, single-MCU 4:4:4 — one DC scan whose
    # three bytes are each component's 6 extra bits against table 1
    def byte1(e):
        return F.unhex(F.lpad(F.hex(e.cast("int")), 2, "0"))

    prog = F.concat(
        head_prog, sof(3, 0x11, wg, hg, marker=b"\xc2"), F.lit(sos_p),
        byte1(vy), byte1(e_cb), byte1(e_cr), eoi,
    )
    # needs_codec: lossless SOF3 prefix (progressive decodes now)
    lossless = F.lit(b"\xff\xd8\xff\xc3")
    payload = (
        F.when(did % 7 == 3, prog)
        .when(did % 5 == 0, trunc)
        .when(did % 11 == 7, lossless)
        .when(did % 7 == 5, gray)
        .when(did % 7 == 1, j420)
        .otherwise(color)
    )
    media = docs.select(did.alias("media_id"), payload.alias("payload"))
    return MM.image_pixel_stats(media)


# =============================================================================
# Embedding ingestion gate — non-finite components (r10): the vector
# analog of events_nonfinite_audit, closing the finite-inputs contract
# for the 25-query vector family. The r10 probe (NaN/Inf components
# injected into otherwise-valid vectors) showed 18/25 vector queries
# agree cross-engine even on non-finite input, but 7 legitimately
# violate the contract (quantize/int8 paths: Spark floor(NaN) wraps to
# LONG_MAX garbage where DuckDB refuses the cast; variance overflows;
# PQ/MRR ranking under NaN ordering) — so non-finite vectors must be
# caught at INGESTION, by this audit, not papered over with a per-query
# filter every plan would pay for at 100 TB. Per-label counts over the
# RAW table: vectors containing any NaN / any Inf, clean vectors, and
# total offending components. All native higher-order functions — one
# scan, partial-aggregated map-side.
# =============================================================================
@q(
    "emb_nonfinite_audit",
    """
    WITH e AS (
      SELECT label,
             embedding IS NULL AS is_null_vec,
             coalesce(len(list_filter(embedding, x -> isnan(x))), 0)
               AS nan_comps,
             coalesce(len(list_filter(embedding, x -> isinf(x))), 0)
               AS inf_comps
      FROM embeddings
    )
    SELECT label,
           count(*)::BIGINT AS n_vectors,
           count(*) FILTER (WHERE is_null_vec)::BIGINT AS n_null_vec,
           count(*) FILTER (WHERE nan_comps > 0)::BIGINT AS n_with_nan,
           count(*) FILTER (WHERE inf_comps > 0)::BIGINT AS n_with_inf,
           count(*) FILTER (WHERE NOT is_null_vec AND nan_comps = 0
                              AND inf_comps = 0)::BIGINT AS n_clean,
           sum(nan_comps)::BIGINT AS nan_components,
           sum(inf_comps)::BIGINT AS inf_components
    FROM e GROUP BY 1
    """,
)
def emb_nonfinite_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    inf = F.lit(float("inf"))
    nan_comps = F.coalesce(
        F.size(F.filter("embedding", lambda x: F.isnan(x))), F.lit(0)
    )
    inf_comps = F.coalesce(
        F.size(F.filter("embedding", lambda x: (x == inf) | (x == -inf))),
        F.lit(0),
    )
    is_null_vec = F.col("embedding").isNull()
    classified = e.select(
        "label",
        is_null_vec.alias("is_null_vec"),
        nan_comps.alias("nan_comps"),
        inf_comps.alias("inf_comps"),
    )
    return classified.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.count_if(F.col("is_null_vec")).cast("bigint").alias("n_null_vec"),
        F.count_if(F.col("nan_comps") > 0).cast("bigint").alias("n_with_nan"),
        F.count_if(F.col("inf_comps") > 0).cast("bigint").alias("n_with_inf"),
        F.count_if(
            ~F.col("is_null_vec")
            & (F.col("nan_comps") == 0)
            & (F.col("inf_comps") == 0)
        )
        .cast("bigint")
        .alias("n_clean"),
        F.sum("nan_comps").cast("bigint").alias("nan_components"),
        F.sum("inf_comps").cast("bigint").alias("inf_components"),
    )
