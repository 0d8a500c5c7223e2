"""Canonical bench recording: run `bench.py` N times back-to-back on an
otherwise-idle host, merge per-query by MIN, and write the artifact — the
round-10 judge's finding #3 made this the recording protocol (a single
draw on a noisy shared host must not be the record; SCALE_BENCH.md
documents the per-query noise band that motivates it).

    python tools/bench_record.py --out BENCH_r11.json [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_run() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    ).stdout
    # bench prints ONE JSON line last
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    runs = []
    for i in range(args.runs):
        r = one_run()
        print(
            f"run {chr(65 + i)}: total {r['value']}s over "
            f"{len(r['queries'])} queries",
            file=sys.stderr,
        )
        runs.append(r)

    queries = {
        q: round(min(r["queries"][q] for r in runs), 3)
        for q in runs[0]["queries"]
    }
    from bench import COMMON16

    merged = dict(runs[0])
    merged["queries"] = queries
    merged["value"] = round(sum(queries.values()), 3)
    merged["common16_total"] = round(
        sum(queries[q] for q in COMMON16 if q in queries), 3
    )
    merged["stat"] = f"min-of-{args.runs}-isolated-runs(x min-of-2 in-process)"
    merged["run_totals"] = [r["value"] for r in runs]
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(merged, f, indent=0)
        f.write("\n")
    print(f"wrote {args.out}: total {merged['value']}s", file=sys.stderr)


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
