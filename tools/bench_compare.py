"""Diff two bench JSON records (BENCH_r{N}.json or bench.py stdout):
per-query deltas on the shared subset, plus scaled-pass ratios.

Usage: python tools/bench_compare.py OLD.json NEW.json
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # driver-recorded BENCH_r{N}.json wraps the bench line under "tail" or
    # stores the parsed line; accept both shapes
    if "queries" not in d:
        for k in ("json", "line", "parsed"):
            if isinstance(d.get(k), dict) and "queries" in d[k]:
                return d[k]
        raise SystemExit(f"{path}: no 'queries' key — not a bench record")
    return d


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    rows = [(name, oq[name], nq[name], nq[name] / oq[name] if oq[name] else float("inf"))
            for name in shared]
    print(f"shared {len(shared)} queries: old {sum(oq[n] for n in shared):.3f}s "
          f"-> new {sum(nq[n] for n in shared):.3f}s")
    print(f"{'query':42s} {'old':>7s} {'new':>7s} {'ratio':>6s}")
    for name, o, n, r in sorted(rows, key=lambda t: t[3]):
        print(f"{name:42s} {o:7.3f} {n:7.3f} {r:6.2f}")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print(f"new-only: {', '.join(only_new)}")
    for d, tag in ((old, "old"), (new, "new")):
        sc = d.get("scaled")
        if isinstance(sc, dict) and "value" in sc:
            print(f"{tag} scaled pass (x{sc.get('factor')}): {sc['value']}s")


if __name__ == "__main__":
    main()
