#!/usr/bin/env python3
"""Driver-row union report: which registered queries have a green
driver CORRECTNESS row in ANY round, which are stale, which never ran.

The driver grades exactly the first 50 queries per round
(registry.GRADING_ORDER allocates that budget); this report is the
bookkeeping that rotation decisions are made from — run it at the start
of a round to write the next GRADING_ORDER.

Usage: python tools/union_report.py [repo_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> None:
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    sys.path.insert(0, repo)
    from elric_rs_spark import registry

    registry.load_all()

    status: dict[str, tuple[int, str]] = {}  # query -> (round, verdict)
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for name, row in json.load(open(path)).items():
            if row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                verdict = "rows-only"
            elif row.get("err"):
                verdict = "ERR"
            elif row.get("hash_match"):
                verdict = "PASS"
            else:
                verdict = "FAIL"
            # latest round wins
            status[name] = (rnd, verdict)

    never, stale, current = [], [], []
    latest = max((r for r, _ in status.values()), default=0)
    for q in registry.QUERIES:
        if q not in status:
            never.append(q)
        elif status[q][0] < latest:
            stale.append((q, *status[q]))
        else:
            current.append((q, *status[q]))

    bad = [(q, r, v) for q, (r, v) in status.items() if v in ("ERR", "FAIL")]
    print(f"registered: {len(registry.QUERIES)}  "
          f"oracle-backed: {len(registry.ORACLES)}")
    print(f"graded in some round: {len(status)}  never graded: {len(never)}")
    print(f"latest round: r{latest}  current-round rows: {len(current)}")
    if bad:
        print("\nERR/FAIL rows (latest per query):")
        for q, r, v in sorted(bad):
            print(f"  r{r} {v:4s} {q}")
    if never:
        print("\nnever graded (rotation candidates, registration order):")
        for q in never:
            mark = "oracle" if q in registry.ORACLES else "rows-only"
            print(f"  {q} [{mark}]")
    if stale:
        by_round: dict[int, int] = {}
        for _, r, _ in stale:
            by_round[r] = by_round.get(r, 0) + 1
        print("\nstale rows by last-graded round: "
              + ", ".join(f"r{r}: {n}" for r, n in sorted(by_round.items())))


if __name__ == "__main__":
    main()
