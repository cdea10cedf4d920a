#!/usr/bin/env python
"""Append a round-over-round per-query delta table to BENCH.md.

Usage: python scripts/bench_delta.py PREV.json CURR.json [--note "..."]

PREV/CURR are headline bench JSON lines (the ``{"metric":
"headline_queries_total_wall", "queries": {...}}`` shape the driver
records as BENCH_r{N}.json). The bench query set is FROZEN across rounds
so these deltas are meaningful; protocol changes must be called out via
--note, not hidden.
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path: str) -> dict:
    """Accept either a raw headline JSON line or the driver's BENCH_r{N}
    wrapper ({"n", "rc", "tail": "<console output>", "parsed": {...}})."""
    with open(path) as f:
        text = f.read().strip()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        return json.loads(text.splitlines()[-1])
    if "queries" in d:
        return d
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]
    lines = [
        ln for ln in d.get("tail", "").replace("\r", "\n").splitlines()
        if '"metric"' in ln
    ]
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("curr")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    prev, curr = load(args.prev), load(args.curr)
    pq, cq = prev["queries"], curr["queries"]
    names = [n for n in cq if n in pq] + [n for n in cq if n not in pq]

    rows = []
    for n in names:
        c = cq[n]
        p = pq.get(n)
        if p:
            pct = (c - p) / p * 100.0
            rows.append(f"| {n} | {p:.3f} | {c:.3f} | {pct:+.1f}% |")
        else:
            rows.append(f"| {n} | — | {c:.3f} | new |")
    total_p, total_c = prev["value"], curr["value"]
    rows.append(
        f"| **total** | **{total_p:.3f}** | **{total_c:.3f}** | "
        f"**{(total_c - total_p) / total_p * 100.0:+.1f}%** |"
    )

    section = (
        "\n## Headline per-query delta vs previous round "
        f"(sf={curr.get('sf')}, cores={curr.get('cores')})\n\n"
        + (f"{args.note}\n\n" if args.note else "")
        + "| query | prev s | curr s | delta |\n|---|---|---|---|\n"
        + "\n".join(rows)
        + "\n"
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(section)
    print(section)


if __name__ == "__main__":
    main()
