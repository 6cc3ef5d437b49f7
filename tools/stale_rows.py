"""Driver-row freshness ledger (round-5 verdict item 6).

A driver row (CORRECTNESS_r{N}.json) is EVIDENCE for a query only while
the code under the query is unchanged; once the implementing file is
touched, the row is stale and the query belongs in the next
PRIORITY_HEAD rotation. This tool compares, per registry query:

  newest driver row   = commit date of the newest CORRECTNESS_r*.json
                        whose row for the query is green
  newest code change  = max commit date over the query's implementing
                        file set: the plans/queries*.py module that
                        registers it PLUS every engine module whose
                        imported names the query FUNCTION actually
                        references (AST walk, with transitive closure
                        over same-module helper functions — so a
                        dedup.py edit stales the dedup-family queries,
                        not every query in the module)

and prints the stale set (code newer than evidence) and the
never-sampled set. Uncommitted edits to an implementing file also mark
its queries stale. Exit code is 0 unless --fail is passed and a stale
or never-sampled query exists.

Usage: python tools/stale_rows.py [--fail]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "social_and_media_data_ingestion_spark"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()


def _commit_ts(path: str) -> int:
    out = _git("log", "-1", "--format=%ct", "--", path)
    return int(out) if out else 0


def _dirty_files() -> set[str]:
    out = _git("status", "--porcelain")
    return {line[3:].split(" -> ")[-1] for line in out.splitlines() if line}


def _mod_file(mod: str) -> str | None:
    """Dotted module path inside PKG -> repo-relative file, if it exists."""
    cand = os.path.join(PKG, *mod.split(".")) + ".py"
    if os.path.exists(os.path.join(ROOT, cand)):
        return cand
    init = os.path.join(PKG, *mod.split("."), "__init__.py")
    if os.path.exists(os.path.join(ROOT, init)):
        return init
    return None


def _imports_of(node: "ast.AST") -> dict[str, str]:
    """bound name -> repo-relative engine file, for PKG imports under node."""
    import ast

    bound: dict[str, str] = {}
    for n in ast.walk(node):
        if isinstance(n, ast.ImportFrom) and n.module and n.module.startswith(PKG):
            mod = n.module[len(PKG) + 1 :] if n.module != PKG else ""
            for alias in n.names:
                # `from PKG.operators.dedup import _tokens` -> dedup.py;
                # `from PKG.operators import dedup` -> operators/dedup.py
                f = _mod_file(f"{mod}.{alias.name}" if mod else alias.name) or (
                    _mod_file(mod) if mod else None
                )
                if f:
                    bound[alias.asname or alias.name] = f
        elif isinstance(n, ast.Import):
            for alias in n.names:
                if alias.name.startswith(PKG + "."):
                    f = _mod_file(alias.name[len(PKG) + 1 :])
                    if f:
                        bound[(alias.asname or alias.name).split(".")[0]] = f
    return bound


def _module_files() -> dict[str, list[str]]:
    """query name -> implementing file set (repo-relative): the
    registering module plus every engine file whose imported names the
    query function references, closed transitively over same-module
    helper functions."""
    import ast

    out: dict[str, list[str]] = {}
    for fn in sorted(glob.glob(os.path.join(ROOT, PKG, "plans", "queries*.py"))):
        rel = os.path.relpath(fn, ROOT)
        tree = ast.parse(open(fn).read())
        mod_imports = _imports_of(tree)  # includes function-local imports
        funcs = {
            n.name: n for n in tree.body if isinstance(n, ast.FunctionDef)
        }
        refs: dict[str, set[str]] = {}  # func -> referenced bare names
        for name, node in funcs.items():
            refs[name] = {
                x.id for x in ast.walk(node) if isinstance(x, ast.Name)
            }

        def deps_of(fname: str, seen: set[str]) -> set[str]:
            files: set[str] = set()
            for r in refs.get(fname, ()):
                # `q` is the pure registration decorator (defined in
                # plans/queries.py next to PRIORITY_HEAD): counting it
                # as a dependency would stale the ENTIRE registry on
                # every head-rotation edit. It never affects results.
                if r == "q":
                    continue
                if r in mod_imports:
                    files.add(mod_imports[r])
                elif r in funcs and r not in seen:
                    seen.add(r)
                    files |= deps_of(r, seen)
            return files

        for name, node in funcs.items():
            qname = None
            for dec in node.decorator_list:
                if (
                    isinstance(dec, ast.Call)
                    and getattr(dec.func, "id", "") == "q"
                    and dec.args
                    and isinstance(dec.args[0], ast.Constant)
                ):
                    qname = dec.args[0].value
            if qname:
                out[qname] = sorted({rel} | deps_of(name, {name}))
    return out


def main() -> None:
    rows: dict[str, int] = {}  # query -> newest green driver-row commit ts
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        ts = _commit_ts(os.path.relpath(path, ROOT))
        with open(path) as f:
            for name, row in json.load(f).items():
                ok = bool(row.get("hash_match")) or (
                    row.get("err") is None and row.get("rows_match") is not False
                )
                if ok:
                    rows[name] = max(rows.get(name, 0), ts)

    dirty = _dirty_files()
    file_ts: dict[str, int] = {}
    stale: list[tuple[str, str]] = []
    never: list[str] = []
    qfiles = _module_files()
    for qname, files in sorted(qfiles.items()):
        if qname not in rows:
            never.append(qname)
            continue
        for f in files:
            if f not in file_ts:
                file_ts[f] = _commit_ts(f)
            if f in dirty or file_ts[f] > rows[qname]:
                stale.append((qname, f))
                break

    print(f"registry: {len(qfiles)}")
    print(f"with driver evidence: {len(rows) - len(set(rows) - set(qfiles))}")
    print(f"never sampled: {len(never)}")
    for n in never:
        print(f"  NEVER {n}")
    print(f"stale (code newer than newest driver row): {len(stale)}")
    for n, f in stale:
        print(f"  STALE {n}  ({f})")
    if "--fail" in sys.argv and (stale or never):
        sys.exit(1)


if __name__ == "__main__":
    main()
