"""Text-analysis operators for the LLM-training-data layer.

All pure column expressions (WholeStageCodegen, no Python boundary):
language ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "sur"],
}

# BPE-ish tokenization: word pieces, numbers, or single non-space symbols.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    toks = F.filter(F.split(F.trim(_c(col)), r"\s+"), lambda t: t != "")
    return F.size(toks)


def bpe_ish_token_count(col: Column | str) -> Column:
    """Regex-piece token count — a cheap proxy for BPE token budgets."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 0))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of tokens that are stopwords of `lang`."""
    toks = F.split(F.lower(_c(col)), r"\s+")
    sw = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(sw)))


def language_id(col: Column | str, default: str = "unk") -> Column:
    """Argmax over per-language stopword hit counts; `default` when no
    language scores > 0. Deterministic tie-break: language list order."""
    langs = list(STOPWORDS)
    hits = [stopword_hits(col, lg) for lg in langs]
    best = F.greatest(*hits)
    expr = F.lit(default)
    for lg, h in reversed(list(zip(langs, hits))):
        expr = F.when((best > 0) & (h == best), F.lit(lg)).otherwise(expr)
    return expr


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    n = F.length(c)
    punct = n - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    n = ws_token_count(col)
    return F.when(
        n > 0, stopword_hits(col, lang).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Heuristic quality in [0, 1]: rewards reasonable length and stopword
    density, penalizes punctuation soup. The standard cheap pre-filter in
    web-scale corpus cleaning."""
    c = _c(col)
    n_tok = ws_token_count(c).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw_score = F.least(stopword_ratio(c, "en") * 5.0, F.lit(1.0))
    p_penalty = F.least(punct_ratio(c) * 2.0, F.lit(1.0))
    return F.round(
        (len_score * 0.4 + sw_score * 0.4 + (1.0 - p_penalty) * 0.2), 6
    )


def rolling_fingerprint(col: Column | str, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over characters of the normalized text —
    a cheap integer document fingerprint (vs md5's 128-bit hex). Pure
    integer arithmetic -> identical in any engine."""
    norm = F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " ")
    chars = F.split(norm, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def md5_fingerprint(col: Column | str) -> Column:
    """md5 of normalized text (lower/trim/collapse-ws)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " "))


def profile_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One call attaching the whole text-analysis column family."""
    return (
        df.withColumn("n_tokens_ws", ws_token_count(text_col))
        .withColumn("n_tokens_bpe", bpe_ish_token_count(text_col))
        .withColumn("lang_pred", language_id(text_col))
        .withColumn("punct_ratio", F.round(punct_ratio(text_col), 6))
        .withColumn("quality", quality_score(text_col))
        .withColumn("fingerprint", md5_fingerprint(text_col))
    )
