"""Print a fresh key -> file:line anchor table for every canonical
registry entry, via inspect.getsourcelines on the REGISTERED function
object — never by copying a previous round's table (the round-10
lesson: line numbers drift every round as files grow, and a copied
table produced dozens of stale anchors).

Usage:
    python tools/anchors.py            # markdown table, all keys
    python tools/anchors.py k1 k2 ...  # only those keys

Output columns: key | file:line | docstring first line. Paths are
repo-relative. Aliases are skipped (same fn object as their canonical).
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from jsmr_spark.registry import canonical_specs

    specs = canonical_specs()
    keys = sys.argv[1:] or sorted(specs)
    print("| key | file:line | summary |")
    print("|---|---|---|")
    for k in keys:
        spec = specs.get(k)
        if spec is None:
            print(f"| {k} | UNKNOWN KEY | |")
            continue
        fn = inspect.unwrap(spec.fn)
        try:
            _, line = inspect.getsourcelines(fn)
            path = os.path.relpath(inspect.getsourcefile(fn), REPO)
            anchor = f"{path}:{line}"
        except (TypeError, OSError):
            anchor = "<builtin>"
        doc = (inspect.getdoc(fn) or "").split("\n", 1)[0][:90]
        print(f"| {k} | {anchor} | {doc} |")


if __name__ == "__main__":
    main()
