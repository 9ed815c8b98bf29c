#!/usr/bin/env python3
"""Per-query bench regression gate: compare two BENCH_r*.json files.

The driver records one ``BENCH_r{N}.json`` per round; a plan regression
(an AQE flip, a lost broadcast, a new shuffle) shows up as one query's
time jumping while the rest hold. This script catches that BEFORE the
driver runs: compare the current bench output against the previous
round's committed artifact and alarm on any query slower than
``THRESHOLD``x its old time (default 1.3, above the n=3 harness's noise
band — observed round-over-round noise is ~±10%).

Usage:
    python scripts/bench_check.py                    # newest two BENCH_r*.json
    python scripts/bench_check.py OLD.json NEW.json  # explicit pair
    python scripts/bench_check.py --threshold 1.5 OLD.json NEW.json

Exit code 1 if any shared query regressed past the threshold (CI-style).
New queries (no old number) and removed queries are reported, never fatal.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

THRESHOLD = 1.3


def _load(path: Path) -> dict[str, float]:
    rec = json.loads(path.read_text())
    # driver artifacts wrap the bench line in {"parsed": {...}}; bench.py
    # itself emits the flat {"queries": {...}} line
    # `or rec` also covers {"parsed": null} (the truncated-r4 artifact)
    parsed = rec.get("parsed") or rec
    if "queries" not in parsed:
        raise SystemExit(f"{path}: no usable bench record (parsed=null and no flat line)")
    return parsed["queries"]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("files", nargs="*", help="OLD.json NEW.json (default: newest two BENCH_r*.json)")
    ap.add_argument("--threshold", type=float, default=THRESHOLD)
    args = ap.parse_args(argv)

    root = Path(__file__).resolve().parent.parent
    if len(args.files) == 2:
        old_p, new_p = Path(args.files[0]), Path(args.files[1])
    elif not args.files:
        rounds = sorted(
            root.glob("BENCH_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
        )
        if len(rounds) < 2:
            print("need at least two BENCH_r*.json files", file=sys.stderr)
            return 2
        old_p, new_p = rounds[-2], rounds[-1]
    else:
        ap.error("pass exactly two files or none")

    old, new = _load(old_p), _load(new_p)
    shared = sorted(set(old) & set(new))
    regressed = []
    print(f"{old_p.name} -> {new_p.name}  (threshold {args.threshold}x)")
    for k in shared:
        ratio = new[k] / old[k] if old[k] else float("inf")
        flag = " <-- REGRESSED" if ratio > args.threshold else ""
        if flag:
            regressed.append(k)
        print(f"  {k:45s} {old[k]:7.3f}s -> {new[k]:7.3f}s  {ratio:5.2f}x{flag}")
    for k in sorted(set(new) - set(old)):
        print(f"  {k:45s}    (new) -> {new[k]:7.3f}s")
    for k in sorted(set(old) - set(new)):
        print(f"  {k:45s} {old[k]:7.3f}s -> (removed)")

    tot_old = sum(old[k] for k in shared)
    tot_new = sum(new[k] for k in shared)
    print(f"  shared total: {tot_old:.2f}s -> {tot_new:.2f}s ({tot_new / tot_old:.2f}x)")
    if regressed:
        print(f"REGRESSIONS ({len(regressed)}): {regressed}", file=sys.stderr)
        return 1
    print("OK: no query regressed past threshold")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
