"""Property-based cross-engine contracts for the round-7 additions.

The phonetic blocking key's whole correctness story is "the SAME
explicit chain in both engines" (Spark soundex() has no DuckDB twin) —
so the property under test IS Spark(key) == DuckDB(key), on generated
strings far nastier than part names: mixed case, digits, punctuation,
accented Latin (stripped by the [^a-z] normalize), and empty-ish
inputs. sniff_format is checked against an independent pure-Python
model of the magic-number spec on arbitrary byte payloads.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from social_and_media_data_ingestion_spark.operators import multimodal as MM
from social_and_media_data_ingestion_spark.plans.queries_ext5 import (
    _phonetic_key,
    _sql_phonetic_key,
)

from pyspark.sql import functions as F


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Lu", "Nd", "Zs", "Po"),
                max_codepoint=0x24F,
            ),
            max_size=30,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_property_phonetic_key_cross_engine(spark, names):
    names = list(set(names))
    df = spark.createDataFrame([(n,) for n in names], ["n"])
    got = {
        r.n: r.k for r in df.select("n", _phonetic_key(F.col("n")).alias("k")).collect()
    }
    con = duckdb.connect()
    for n in names:
        want = con.execute(
            f"SELECT {_sql_phonetic_key('?')}", [n]
        ).fetchone()[0]
        assert got[n] == want, f"{n!r}: spark={got[n]!r} duckdb={want!r}"


def _model_sniff(payload: bytes) -> str:
    """Independent pure-Python model of the magic-number spec."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/x-wav"
    for sig, mime in MM.MAGIC_MIMES:
        if payload[: len(sig) // 2] == bytes.fromhex(sig):
            return mime
    return MM.UNKNOWN_MIME


_MAGICS = [
    b"",
    b"\xff\xd8\xff",
    b"\x89PNG",
    b"GIF87a",
    b"GIF89a",
    b"RIFF",
    b"RIFF\x00\x00\x00\x00WAVE",
    b"RIFF\x00\x00\x00\x00AVI ",
]


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(_MAGICS),  # bias toward near-miss prefixes
            st.binary(max_size=16),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_property_sniff_matches_model(spark, parts):
    payloads = [prefix + tail for prefix, tail in parts]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        ["media_id", "payload"],
    )
    got = {r.media_id: r.detected_mime for r in MM.sniff_format(df).collect()}
    assert got == {i: _model_sniff(p) for i, p in enumerate(payloads)}
