"""Per-query decade-ratio report: run the bench suite at two scales in
one JVM-per-scale chain and print wall ratios sorted worst-first.

This is the measurement loop that caught round 5's two quadratic bugs
(q_dedup_embed_lsh_portable 86x/decade from fixed-width LSH banding,
q_dedup_semantic 25x/decade from a per-dim pair-join re-shuffle): a
query whose ratio is far above its family's band is growing
super-linearly and will not survive 100x. Family bands measured at the
sf0.1 -> sf1 decade (BASELINE.md round-5 section): scan/join/agg
1.1-2x, windowed/temporal 2-4x, corpus-proportional dedup/text
(gram/signature shuffles) 3-8x.

Usage: python tools/decade.py [small_dir] [big_dir] [q1,q2,...]
Defaults: /root/testdata/sf0.1 .scratch/sf1  (generate the latter with
tools/gen_sf.py). The optional third arg restricts the run to a
comma-separated registry subset (SPARK_GRAFT_QUERIES pass-through) —
used for the third-scale-point runs (e.g. sf1 -> sf3) where only the
corpus-proportional family is worth the wall-clock. For non-10x steps
the summary also reports the per-decade-equivalent ratio
(ratio ** (1/log10(step))) so the family bands stay comparable.
One JSON summary line at the end.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import tempfile
import time


def run_bench(sf_dir: str, queries: str | None = None) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    if queries:
        env["SPARK_GRAFT_QUERIES"] = queries
    with tempfile.NamedTemporaryFile(mode="w+", suffix=".json") as out:
        subprocess.run(
            [sys.executable, "bench.py"],
            stdout=out,
            stderr=subprocess.DEVNULL,
            env=env,
            check=True,
        )
        out.seek(0)
        return json.loads(out.read().strip().splitlines()[-1])


def run_bench_isolated(sf_dir: str, queries: str, settle: int = 15) -> dict:
    """One fresh bench.py JVM PER QUERY, with a settle pause between.

    The round-7 sf3 hunt measured the same query at 73.4 s inside a
    15-query shared-JVM suite vs 10.6 s in a fresh JVM (same code, same
    scale, same warmup, idle box): a long single-JVM suite at the big
    scale accumulates heap/GC state that inflates heavy slots and FAKES
    super-linear decade ratios. Shared-JVM mode stays the cheap default
    for triage; confirm any SUPERLINEAR flag with --isolate before
    treating it as a plan bug (q_join_bloom's 2^16 saturation was real
    and survived isolation; three other flags that round did not)."""
    qlist = [s.strip() for s in queries.split(",") if s.strip()]
    if not qlist:
        raise SystemExit("--isolate requires an explicit query list")
    merged: dict = {}
    for i, q in enumerate(qlist):
        if i:  # settle BETWEEN queries only — not after the last one
            time.sleep(settle)
        r = run_bench(sf_dir, q)
        merged.setdefault("queries", {}).update(r["queries"])
        for k in ("metric", "unit", "sf"):
            merged[k] = r[k]
    merged["value"] = round(sum(merged["queries"].values()), 3)
    return merged


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--isolate"]
    isolate = "--isolate" in sys.argv[1:]
    small = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    big = args[1] if len(args) > 1 else ".scratch/sf1"
    queries = args[2] if len(args) > 2 else None
    if isolate:
        if not queries:
            raise SystemExit("--isolate requires an explicit query list")
        a = run_bench_isolated(small, queries)
        b = run_bench_isolated(big, queries)
    else:
        a = run_bench(small, queries)
        b = run_bench(big, queries)
    # decade-normalization exponent from the sf tags (e.g. sf1->sf3 is a
    # 3x step: per-decade-equiv = ratio ** (1/log10(3)) ~= ratio**2.1)
    try:
        step = float(b["sf"]) / float(a["sf"])
        exp = 1.0 / math.log10(step) if step > 1 else 1.0
    except (KeyError, ValueError, ZeroDivisionError):
        exp = 1.0
    qa, qb = a["queries"], b["queries"]
    rows = sorted(
        ((qb[k] / max(qa[k], 0.01), k, qa[k], qb[k]) for k in qb if k in qa),
        reverse=True,
    )
    for ratio, name, sa, sb in rows:
        dec = ratio ** exp
        flag = " <-- SUPERLINEAR?" if dec > 10 else ""
        print(
            f"{name:32s} {sa:7.2f}s -> {sb:8.2f}s  x{ratio:5.1f}"
            f"  (/decade x{dec:5.1f}){flag}"
        )
    print(
        json.dumps(
            {
                "metric": "decade_ratio",
                "small": small,
                "big": big,
                "small_total": a["value"],
                "big_total": b["value"],
                "ratio": round(b["value"] / max(a["value"], 0.01), 2),
                "decade_exp": round(exp, 3),
                "worst": [
                    {"query": n, "ratio": round(r, 1), "per_decade": round(r**exp, 1)}
                    for r, n, _, _ in rows[:5]
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
