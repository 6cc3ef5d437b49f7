"""Compute the driver-evidence ledger for PRIORITY_HEAD rotation.

The driver samples the FIRST 50 registry entries per round
(CORRECTNESS_r{N}.json). This tool unions all CORRECTNESS files in the
repo root and prints:
  - cumulative driver-sampled queries (and any whose LATEST status is red)
  - registry queries never driver-sampled (head candidates for next round)

Usage: python tools/next_head.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def registry_names() -> list[str]:
    """Parse @q("name", ...) registrations statically (no Spark needed)."""
    names: list[str] = []
    for fn in sorted(
        glob.glob(
            os.path.join(
                ROOT, "social_and_media_data_ingestion_spark", "plans", "queries*.py"
            )
        )
    ):
        with open(fn) as f:
            names += re.findall(r'@q\(\s*"([a-z0-9_]+)"', f.read())
    return list(dict.fromkeys(names))


def main() -> None:
    names = registry_names()
    sampled: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                ok = (
                    bool(row.get("hash_match"))
                    or (
                        row.get("err") is None
                        and row.get("rows_match") is not False
                    )
                    # oracle-less rows-only path (err="no_oracle" with a
                    # NON-ZERO spark row count) is the strongest evidence
                    # such a query can ever have; a zero-row result proves
                    # nothing and re-enters the rotation (r7 ADVICE)
                    or (
                        row.get("err") == "no_oracle"
                        and (row.get("spark_rows") or 0) > 0
                    )
                )
                sampled[name] = ok  # later rounds overwrite: latest status wins
    never = [n for n in names if n not in sampled]
    red = sorted(n for n, ok in sampled.items() if not ok)
    print(f"registry: {len(names)}")
    print(f"driver-sampled (cumulative): {len(sampled)}")
    print(f"red on latest status: {red if red else 'none'}")
    print(f"never sampled: {len(never)}")
    for n in never:
        print(f"  {n}")


if __name__ == "__main__":
    main()
