"""Regenerate the per-query table in docs/BENCH_COMPARE.md.

Reads every BENCH_r*.json at the repo root (driver format: the bench's
one-line JSON is embedded in the "tail" field) plus optional local
bench outputs passed as arguments (raw bench.py stdout files, one JSON
line each), and rewrites everything below the TABLE:AUTOGEN marker.

Usage:  python tools/bench_compare.py [label=path/to/bench_out.json ...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(ROOT, "docs", "BENCH_COMPARE.md")
MARKER = "<!-- TABLE:AUTOGEN (tools/bench_compare.py rewrites below) -->"
FLAG_RATIO = 1.5


def _queries_from_blob(text: str) -> dict[str, float]:
    """Pull the {"queries": {...}} object out of a bench stdout blob."""
    start = text.find('"queries"')
    if start == -1:
        return {}
    qs = text[text.find("{", start):]
    depth = 0
    for i, ch in enumerate(qs):
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return json.loads(qs[: i + 1])
    return {}


def load_driver_rounds() -> dict[str, dict[str, float]]:
    rounds = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        label = re.search(r"BENCH_(r\d+)", path).group(1)
        tail = json.load(open(path)).get("tail", "")
        qmap = _queries_from_blob(tail)
        if qmap:
            rounds[label] = qmap
    return rounds


def main(argv: list[str]) -> None:
    rounds = load_driver_rounds()
    for arg in argv:
        label, _, path = arg.partition("=")
        rounds[label] = _queries_from_blob(open(path).read())

    labels = list(rounds)
    names = sorted(set().union(*[set(q) for q in rounds.values()]))
    lines = [MARKER, ""]
    header = "| query | " + " | ".join(labels) + " | flag |"
    lines += [header, "|---" * (len(labels) + 2) + "|"]
    for n in names:
        vals = [rounds[lb].get(n) for lb in labels]
        flag = ""
        seen = [v for v in vals if v is not None]
        if len(seen) >= 2 and seen[-2] and seen[-1] / seen[-2] > FLAG_RATIO:
            flag = f"&uarr;{seen[-1] / seen[-2]:.1f}x"
        elif len(seen) >= 2 and seen[-1] and seen[-2] / seen[-1] > FLAG_RATIO:
            flag = f"&darr;{seen[-2] / seen[-1]:.1f}x"
        cells = " | ".join("" if v is None else f"{v:.2f}" for v in vals)
        lines.append(f"| {n} | {cells} | {flag} |")
    totals = " | ".join(f"{sum(v for v in rounds[lb].values()):.1f}" for lb in labels)
    lines += ["", f"| **total** | {totals} | |"]

    doc = open(DOC).read()
    open(DOC, "w").write(doc[: doc.index(MARKER)] + "\n".join(lines) + "\n")
    print(f"wrote {len(names)} query rows, columns: {labels}")


if __name__ == "__main__":
    main(sys.argv[1:])
