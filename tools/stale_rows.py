"""Driver-row freshness ledger (round-5 verdict item 6, rewritten r7).

A driver row (CORRECTNESS_r{N}.json) is EVIDENCE for a query only while
the code under the query is unchanged. Round 6 showed that file-commit-
date granularity over-reports staleness ~10x (a PRIORITY_HEAD edit
staled all 59 queries.py queries; an untracked artifact conferred no
freshness at all). This rewrite compares CONTENT, not dates:

  For each query we compute a closure hash: sha256 over the
  ast.unparse'd source of the @q-decorated function (decorators
  included, so the DuckDB oracle SQL is in the hash), plus every
  top-level object it references transitively — same-module helpers
  and constants, and cross-module engine objects resolved through the
  package's imports (an unresolvable or module-level import pulls in
  the whole engine file). ast.unparse normalizes comments away, so
  comment-only edits never stale anything.

  The hash is computed twice: once from the working tree (current),
  and once from the git snapshot at the commit that last touched each
  CORRECTNESS_r*.json (the code the driver actually ran). An
  UNTRACKED artifact is evidence for the working tree itself. A query
  is FRESH if any green driver row's snapshot hash equals the current
  hash; STALE if it has green rows but none match; NEVER if it has no
  green row at all.

  Green = hash_match, or rows-only success (err is None and rows not
  mismatched), or the oracle-less rows-only path the driver records as
  err == "no_oracle" with a row count (round-6 ADVICE item 1).

Usage: python tools/stale_rows.py [--fail]
Exit code 0 unless --fail is passed and a stale/never query exists.
"""

from __future__ import annotations

import ast
import glob
import hashlib
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "social_and_media_data_ingestion_spark"
WORKTREE = "WORKTREE"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, capture_output=True, text=True
    ).stdout


def _artifact_commit(path: str) -> str:
    """Commit that last touched the artifact; WORKTREE if untracked OR
    tracked-but-dirty (round-7 ADVICE: a locally-modified artifact holds
    evidence produced by the working tree, not by the old snapshot)."""
    if _git("status", "--porcelain", "--", path).strip():
        return WORKTREE
    out = _git("log", "-1", "--format=%H", "--", path).strip()
    return out if out else WORKTREE


class Snapshot:
    """Reads repo files either from the working tree or from a commit."""

    def __init__(self, ref: str):
        self.ref = ref
        self._src: dict[str, str | None] = {}
        self._mods: dict[str, "_ModuleIndex | None"] = {}

    def source(self, rel: str) -> str | None:
        if rel not in self._src:
            if self.ref == WORKTREE:
                p = os.path.join(ROOT, rel)
                self._src[rel] = open(p).read() if os.path.exists(p) else None
            else:
                r = subprocess.run(
                    ["git", "show", f"{self.ref}:{rel}"],
                    cwd=ROOT,
                    capture_output=True,
                    text=True,
                )
                self._src[rel] = r.stdout if r.returncode == 0 else None
        return self._src[rel]

    def module(self, rel: str) -> "_ModuleIndex | None":
        if rel not in self._mods:
            src = self.source(rel)
            try:
                self._mods[rel] = _ModuleIndex(rel, src) if src else None
            except SyntaxError:
                self._mods[rel] = None
        return self._mods[rel]

    def plans_files(self) -> list[str]:
        if self.ref == WORKTREE:
            pat = os.path.join(ROOT, PKG, "plans", "queries*.py")
            return sorted(os.path.relpath(f, ROOT) for f in glob.glob(pat))
        out = _git("ls-tree", "-r", "--name-only", self.ref, f"{PKG}/plans")
        return sorted(
            f
            for f in out.splitlines()
            if os.path.basename(f).startswith("queries")
            and f.endswith(".py")
        )


def _mod_file(mod: str) -> str | None:
    """Dotted path inside PKG -> repo-relative file (working-tree layout;
    module layout is stable across the rounds we ledger)."""
    cand = os.path.join(PKG, *mod.split(".")) + ".py"
    if os.path.exists(os.path.join(ROOT, cand)):
        return cand
    init = os.path.join(PKG, *mod.split("."), "__init__.py")
    if os.path.exists(os.path.join(ROOT, init)):
        return init
    return None


class _ModuleIndex:
    """Top-level namespace of one module: defs/constants + PKG imports."""

    def __init__(self, rel: str, src: str):
        self.rel = rel
        self.tree = ast.parse(src)
        self.tops: dict[str, ast.AST] = {}
        #: bound name -> ("mod", file) | ("obj", file, objname)
        self.imports: dict[str, tuple] = {}
        for n in self.tree.body:
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                self.tops[n.name] = n
            elif isinstance(n, (ast.Assign, ast.AnnAssign)):
                targets = n.targets if isinstance(n, ast.Assign) else [n.target]
                for t in targets:
                    for x in ast.walk(t):
                        if isinstance(x, ast.Name):
                            self.tops[x.id] = n
        # imports anywhere in the file (function-local ones included)
        for n in ast.walk(self.tree):
            if isinstance(n, ast.ImportFrom) and n.module and n.module.startswith(PKG):
                mod = n.module[len(PKG) + 1 :] if n.module != PKG else ""
                for alias in n.names:
                    sub = _mod_file(f"{mod}.{alias.name}" if mod else alias.name)
                    bound = alias.asname or alias.name
                    if sub:  # `from PKG.operators import dedup`
                        self.imports[bound] = ("mod", sub)
                    else:
                        f = _mod_file(mod) if mod else None
                        if f:  # `from PKG.operators.dedup import _tokens`
                            self.imports[bound] = ("obj", f, alias.name)
            elif isinstance(n, ast.Import):
                for alias in n.names:
                    if alias.name.startswith(PKG + "."):
                        f = _mod_file(alias.name[len(PKG) + 1 :])
                        if f:
                            self.imports[
                                (alias.asname or alias.name).split(".")[0]
                            ] = ("mod", f)

    def refs(self, node: ast.AST) -> set[str]:
        return {x.id for x in ast.walk(node) if isinstance(x, ast.Name)}

    def attr_refs(self, node: ast.AST) -> dict[str, set[str] | None]:
        """For each referenced bare name: the set of attributes accessed
        on it — or None if the name is ever used NOT as `name.attr`
        (passed around, subscripted, called directly), in which case a
        module binding must fall back to whole-file hashing."""
        out: dict[str, set[str] | None] = {}
        attr_value_ids = set()
        for x in ast.walk(node):
            if isinstance(x, ast.Attribute) and isinstance(x.value, ast.Name):
                attr_value_ids.add(id(x.value))
                if out.get(x.value.id, set()) is not None:
                    out.setdefault(x.value.id, set()).add(x.attr)
        for x in ast.walk(node):
            if isinstance(x, ast.Name) and id(x) not in attr_value_ids:
                out[x.id] = None
        return out


def _closure_units(
    snap: Snapshot, rel: str, name: str, units: dict[tuple, ast.AST | None]
) -> None:
    """Collect (file, objname) -> node units reachable from rel:name.
    (file, "*") with node None means 'whole module'."""
    key = (rel, name)
    if key in units:
        return
    mod = snap.module(rel)
    if mod is None or name not in mod.tops:
        # unresolvable inside the module -> be conservative, whole file
        units[(rel, "*")] = None
        return
    node = mod.tops[name]
    units[key] = node
    for r, attrs in mod.attr_refs(node).items():
        if r == name:
            continue
        if r in mod.tops:
            _closure_units(snap, rel, r, units)
        elif r in mod.imports:
            b = mod.imports[r]
            if b[0] == "mod":
                # `import PKG.x as m` / `from PKG import x as m`: when
                # every use is `m.attr`, hash only the referenced
                # objects — an edit to an UNRELATED function in the
                # same engine module must not stale this query
                if attrs is not None:
                    for a in sorted(attrs):
                        _closure_units(snap, b[1], a, units)
                else:
                    units[(b[1], "*")] = None
            else:
                _closure_units(snap, b[1], b[2], units)


def closure_hashes(snap: Snapshot) -> dict[str, str]:
    """query name -> closure content hash, for every @q registration
    visible in this snapshot. Unhashable queries are omitted."""
    out: dict[str, str] = {}
    for rel in snap.plans_files():
        mod = snap.module(rel)
        if mod is None:
            continue
        for fname, node in mod.tops.items():
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            qname = None
            for dec in node.decorator_list:
                if (
                    isinstance(dec, ast.Call)
                    and getattr(dec.func, "id", "") == "q"
                    and dec.args
                    and isinstance(dec.args[0], ast.Constant)
                ):
                    qname = dec.args[0].value
            if not qname:
                continue
            units: dict[tuple, ast.AST | None] = {}
            try:
                _closure_units(snap, rel, fname, units)
                parts = []
                for (f, n) in sorted(units):
                    if n == "*":
                        m = snap.module(f)
                        body = ast.unparse(m.tree) if m else ""
                    else:
                        body = ast.unparse(units[(f, n)])
                    parts.append(f"{f}::{n}::{body}")
                out[qname] = hashlib.sha256(
                    "\n".join(parts).encode()
                ).hexdigest()
            except Exception:
                continue
    return out


def _green(row: dict) -> bool:
    if row.get("hash_match"):
        return True
    if row.get("err") is None and row.get("rows_match") is not False:
        return True
    # oracle-less rows-only path: driver records err="no_oracle" with a
    # spark row count; that IS the strongest evidence such a query can
    # ever have (round-6 ADVICE item 1) — but a ZERO-row result proves
    # nothing (round-7 ADVICE: a silently-empty query must not count as
    # verified; it re-enters the rotation instead)
    if row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0:
        return True
    return False


def ledger() -> dict:
    """Compute the freshness ledger for the working tree. Returns
    {"current": {query: hash}, "evidence": {query: set-of-hashes},
    "newest_round": {query: int}, "stale": [query...] (oldest-evidence
    first), "never": [query...]}. Shared by the CLI below and by the
    suite's arming test (round-8 verdict item 1): pytest asserts every
    stale/never row is scheduled in the driver-sampled head, so
    staleness can never silently accumulate between rounds."""
    current = closure_hashes(Snapshot(WORKTREE))

    # evidence: query -> set of snapshot hashes with a green driver row;
    # newest_round: query -> highest round number carrying a green row
    # (the row's AGE — head rotation drains oldest-evidence first)
    evidence: dict[str, set[str]] = {}
    newest_round: dict[str, int] = {}
    snap_hash_cache: dict[str, dict[str, str]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rel = os.path.relpath(path, ROOT)
        ref = _artifact_commit(rel)
        if ref not in snap_hash_cache:
            snap_hash_cache[ref] = (
                current if ref == WORKTREE else closure_hashes(Snapshot(ref))
            )
        hashes = snap_hash_cache[ref]
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")])
        with open(path) as f:
            for name, row in json.load(f).items():
                if _green(row) and name in hashes:
                    evidence.setdefault(name, set()).add(hashes[name])
                    newest_round[name] = max(newest_round.get(name, 0), rnd)

    stale: list[str] = []
    never: list[str] = []
    for qname in sorted(current):
        if qname not in evidence:
            never.append(qname)
        elif current[qname] not in evidence[qname]:
            stale.append(qname)
    # oldest newest-green-round first, then name, so `head -n` of the
    # STALE block IS the rotation queue
    stale.sort(key=lambda n: (newest_round[n], n))
    return {
        "current": current,
        "evidence": evidence,
        "newest_round": newest_round,
        "stale": stale,
        "never": never,
    }


def main() -> None:
    led = ledger()
    current, evidence = led["current"], led["evidence"]
    stale, never, newest_round = led["stale"], led["never"], led["newest_round"]

    print(f"registry: {len(current)}")
    print(f"with driver evidence: {len(evidence)}")
    print(f"never sampled: {len(never)}")
    for n in never:
        print(f"  NEVER {n}")
    print(f"stale (code changed since newest green driver row): {len(stale)}")
    for n in stale:
        print(f"  STALE r{newest_round[n]} {n}")
    if "--fail" in sys.argv and (stale or never):
        sys.exit(1)


if __name__ == "__main__":
    main()
