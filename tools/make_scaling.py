"""Build the SCALING.md ratio table from two bench.py JSON outputs.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py > /tmp/b001.json
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1  python bench.py > /tmp/b01.json
    python tools/make_scaling.py /tmp/b001.json /tmp/b01.json

Prints the summary line and writes the markdown table to stdout; paste
into SCALING.md. Run both benches on an idle machine (see BASELINE.md's
ambient-load notes) or the ratios are noise.
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def load(path: str) -> dict:
    text = open(path).read()
    m = re.search(r'\{"metric".*\}', text)
    return json.loads(m.group(0))


def main() -> None:
    small, big = load(sys.argv[1]), load(sys.argv[2])
    qs, qb = small["queries"], big["queries"]
    rows = [
        (n, qs[n], qb[n], qb[n] / qs[n])
        for n in sorted(set(qs) & set(qb), key=lambda n: -(qb[n] / qs[n] if qs[n] else 0))
        if qs[n] > 0
    ]
    ratios = sorted(r[3] for r in rows)
    print(
        f"workloads={len(rows)} median={statistics.median(ratios):.2f} "
        f"p90={ratios[int(len(ratios) * 0.9)]:.2f} worst={ratios[-1]:.2f}",
        file=sys.stderr,
    )
    print("| query | sf0.01 s | sf0.1 s | ratio (10x data) |\n|---|---|---|---|")
    for n, a, b, r in rows:
        print(f"| {n} | {a} | {b} | {r:.2f}x |")


if __name__ == "__main__":
    main()
