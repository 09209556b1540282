"""Ever-driver-verified union report (VERDICT r8 #8).

The driver hashes only the first 50 alphabetical registry keys per
round, and the alias window rotates each round, so "which canonical
keys have EVER carried the hard driver signal" otherwise requires git
archaeology across CORRECTNESS_r*.json and the aliases.py history.
This script does that archaeology once, deterministically:

  * for each committed CORRECTNESS_rNN.json, find the commit that
    introduced it and read jsmr_spark/queries/aliases.py AT THAT
    COMMIT (the alias map the driver saw that round);
  * map each green a0_ alias back to its canonical key through that
    round's _ALIASED tuple (same stripping rule as register_alias);
  * union across rounds, split hash-green vs rows-only.

Usage: python tools/union_report.py           -> summary + counts
       python tools/union_report.py --missing -> never-verified keys
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], capture_output=True, text=True, check=True
    ).stdout


def _aliases_at(commit: str) -> dict[str, str]:
    """a0_name -> canonical key, from aliases.py as of `commit`."""
    try:
        src = _git("show", f"{commit}:jsmr_spark/queries/aliases.py")
    except subprocess.CalledProcessError:
        return {}
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and any(
            isinstance(t, ast.Name) and t.id == "_ALIASED" for t in node.targets
        ):
            canon = list(ast.literal_eval(node.value))
            out = {}
            for c in canon:
                short = c[2:] if c.startswith("q_") else c
                out[f"a0_{short}"] = c
            return out
    return {}


def _invert_alias(key: str, canon: set[str]) -> str:
    """Resolve an a0_ alias to its canonical key by inverting the naming
    rule (register_alias strips a leading ``q_`` before prefixing
    ``a0_``), independent of any commit.

    This is the fallback for CORRECTNESS files with no introducing
    commit (the judge runs before the driver's round-close commit, so
    the newest round's file is untracked at audit time — VERDICT r9 #2:
    the old code returned {} and silently dropped the whole round).
    The inversion is exact because every alias ever registered uses the
    same derivation; a canonical key renamed out of the registry fails
    to invert, but such a key would be excluded by the `& canon`
    intersection anyway.
    """
    if not key.startswith("a0_"):
        return key
    short = key[3:]
    for cand in (f"q_{short}", short):
        if cand in canon:
            return cand
    return key


def main() -> int:
    from jsmr_spark.registry import canonical_specs

    canon_set = set(canonical_specs())
    hash_green: set[str] = set()
    rows_only: set[str] = set()
    per_round: list[tuple[int, int, int]] = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        # commit that introduced this round's file = the alias map the
        # driver ran against
        commit = _git(
            "log", "--diff-filter=A", "--format=%H", "-1", "--",
            os.path.basename(path),
        ).strip()
        amap = _aliases_at(commit) if commit else {}
        data = json.load(open(path))
        n_green = n_rows = 0
        for key, res in data.items():
            canonical = amap.get(key) or _invert_alias(key, canon_set)
            if res.get("hash_match") is True:
                hash_green.add(canonical)
                n_green += 1
            elif res.get("err") == "no_oracle" and res.get("spark_rows", 0) >= 0:
                rows_only.add(canonical)
                n_rows += 1
        per_round.append((rnd, n_green, n_rows))

    canon = canon_set
    union = (hash_green | rows_only) & canon
    print("round  hash-green  rows-only")
    for rnd, g, r in per_round:
        print(f"r{rnd:<5} {g:<11} {r}")
    # a key can be rows-only in one round and hash-green in a later one;
    # count it once, under the stronger signal
    print(
        f"\never-driver-verified union: {len(union)}/{len(canon)} canonical "
        f"({len(hash_green & canon)} hash-green, "
        f"{len((rows_only - hash_green) & canon)} rows-only)"
    )
    missing = sorted(canon - union)
    print(f"never-driver-verified: {len(missing)}")
    if "--missing" in sys.argv:
        for k in missing:
            print(f"  {k}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
