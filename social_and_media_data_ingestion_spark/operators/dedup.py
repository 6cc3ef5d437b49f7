"""Deduplication operators — exact + near-dup (SURVEY §2.5 A2/A3 and the
LLM-pipeline layer: MinHash-LSH, SimHash, n-gram Jaccard).

Determinism: Spark's `dropDuplicates` keeps an arbitrary row; where the
caller (or the oracle) needs stability we use keep-first = min(key) /
row_number, which is order-independent and reproducible.

Cross-engine determinism for near-dup: MinHash/SimHash usually use a
native hash (xxhash64) whose exact value differs between engines. To make
results verifiable against a SQL oracle, the hash family here is the
classic universal hash h_i(x) = (a_i * x + b_i) mod P over a token id
assigned by dense_rank over the distinct shingles — pure integer
arithmetic, identical in any engine. At 100 TB you'd swap `_token_ids`'s
rank join for `xxhash64(shingle)` (no shuffle, no global dim) via
`use_xxhash=True`; semantics are the same, values differ.

Scale notes:
- Exact dedup: hash-aggregate on a fingerprint (one shuffle on a short
  key, not the full text).
- MinHash-LSH: shuffle cost is O(#shingles) for the explode + one
  aggregate per doc + one self-join on (band, band_hash) buckets —
  candidate pairs only, never the n^2 cross join.
- SimHash: one explode + aggregate; clustering by exact signature equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 32-bit-safe universal-hash parameters (P is a Mersenne prime 2^31-1).
_P = 2147483647
_HASH_AB = [
    (1103, 12345),
    (2654435761, 987654321),
    (97, 1013904223),
    (31_337, 271_828),
    (48271, 16807),
    (69621, 104729),
    (40692, 65537),
    (1583458089, 945_568_237),
    (784588716, 577_215_664),
    (16807, 282_475_249),
    (950706376, 141_421_356),
    (62089911, 173_205_080),
]


def exact_dedup_keep_first(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep-first (min id) exact dedup on a column's value — deterministic
    version of the reference's drop_duplicates("text1")
    (parser_media_articles.py:84). Aggregates on the dedup key, so the
    shuffle key is the text value itself; for long texts prefer
    `exact_dedup_by_fingerprint`."""
    keep = df.groupBy(text_col).agg(F.min(id_col).alias(id_col))
    return keep.select(id_col, text_col)


def normalized_fingerprint(col):
    """md5 of whitespace-collapsed, lowercased, trimmed text — the document
    fingerprint used for exact near-normalization dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def exact_dedup_by_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup that shuffles a 32-byte fingerprint instead of the text.
    Returns one row per distinct fingerprint: (fingerprint, kept id, dup count)."""
    return (
        df.select(normalized_fingerprint(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
    )


def keep_latest(df: DataFrame, key: str, order_col: str, tiebreak: str) -> DataFrame:
    """Last-wins dedup (ref tweet_download.py:50-52 user map overwrite):
    one row per key, the one with the greatest (order_col, tiebreak)."""
    w = Window.partitionBy(key).orderBy(F.desc(order_col), F.desc(tiebreak))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# --- Shingling ----------------------------------------------------------------


def _tokens(text_col: str):
    """Whitespace tokens of lowercased text; empty strings removed."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) — distinct word n-grams per document. Built with a
    sliding zip over the token array, entirely JVM-side."""
    toks = _tokens(text_col)
    # shingle i = tokens[i .. i+n-1] joined by space, for i in 0..len-n
    # (guard: sequence(0, -1) would generate a DESCENDING sequence)
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def _token_ids(shingled: DataFrame) -> DataFrame:
    """Assign a deterministic integer id to each distinct shingle via
    dense_rank over the sorted distinct shingles. Cross-engine reproducible
    (vs xxhash64). Global sort over the distinct-shingle dim only."""
    dim = shingled.select("shingle").distinct()
    w = Window.orderBy("shingle")
    return dim.withColumn("sid", F.dense_rank().over(w).cast("long"))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    use_xxhash: bool = False,
) -> DataFrame:
    """(id, sig: array<long>) MinHash signature per document."""
    sh = word_shingles(df, id_col, text_col, n)
    if use_xxhash:
        ids = sh.select("id", (F.pmod(F.xxhash64("shingle"), F.lit(_P))).alias("sid"))
    else:
        ids = sh.join(_token_ids(sh), "shingle").select("id", "sid")
    aggs = [
        F.min((F.lit(a) * F.col("sid") + F.lit(b)) % F.lit(_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(_HASH_AB[:num_hashes])
    ]
    sigs = ids.groupBy("id").agg(*aggs)
    return sigs.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs: docs sharing >= 1 LSH band.
    Self-join on (band index, band value) — shuffles only bucket keys."""
    assert bands * rows_per_band <= 12
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col("sig")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with n-gram Jaccard >= threshold.
    Without `candidates`, pairs come from the inverted shingle index
    (docs sharing >= 1 shingle) — never a blind cross join. With
    `candidates` (e.g. from MinHash-LSH) this is the exact verify stage."""
    sh = word_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 12
) -> DataFrame:
    """(id, simhash) — bit j of the signature is the sign of the sum over
    tokens of (2 * bit_j(token) - 1), where bit_j(token) = universal-hash
    parity. Identical-signature groups are near-dup clusters."""
    assert bits <= len(_HASH_AB)
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(_tokens(text_col)).alias("tok")
    )
    sh = toks.groupBy("id", "tok").agg(F.count("*").alias("w"))
    dim = sh.select("tok").distinct()
    w_rank = Window.orderBy("tok")
    tok_ids = dim.withColumn("tid", F.dense_rank().over(w_rank).cast("long"))
    sh = sh.join(tok_ids, "tok")
    bit_sums = [
        F.sum(
            F.col("w")
            * (
                ((F.lit(a) * F.col("tid") + F.lit(b)) % F.lit(_P)) % 2 * 2
                - 1
            )
        ).alias(f"s{j}")
        for j, (a, b) in enumerate(_HASH_AB[:bits])
    ]
    sums = sh.groupBy("id").agg(*bit_sums)
    sig = sums.select(
        "id",
        sum(
            [
                F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
                for j in range(bits)
            ],
            F.lit(0),
        ).alias("simhash"),
    )
    return sig
