#!/usr/bin/env python3
"""Full-inventory 10x scaling regression fence (VERDICT r11 ask #6).

Usage:
  python3 tools/scale_fence.py <current.json> [prior.json]

<current.json> is the one-line JSON emitted by
`SPARK_GRAFT_SCALE_FULL=1 runMain graft.tools.ScaleBench`.

Flags two classes of problem:
  - ABS: ratio > ABS_BAND (12.0) — super-linear growth for 10x data in
    a query that should be in the linear class (fixed-slice queries sit
    near 1; known quadratic-by-fixture queries are listed in
    KNOWN_QUADRATIC with their SCALE.md rationale and a wider band).
  - REG: ratio grew > REG_FACTOR (1.5x) vs the prior round's ratio for
    the same query (only when the prior file is given and the query has
    a meaningful baseline: prior ratio >= 0.5 and current time >= MIN_S
    — sub-tenth-second rows are box noise, not signal).

Exit code 1 if any flag fires, else 0. The current file becomes the
next round's prior — keep it checked in as SCALE_FULL.json.
"""
import json
import sys

ABS_BAND = 12.0
REG_FACTOR = 1.5
MIN_S = 0.15  # ignore regressions below this absolute time at 10x

# Queries whose 10x runtime ratio is quadratic BY FIXTURE CONSTRUCTION
# (probe/pair sets scale with the corpus), each with the documented
# scale path in SCALE.md. They still must not regress vs prior rounds.
KNOWN_QUADRATIC = {
    "n_bitext_mining", "n_decontam_semantic",
    "n_quality_kendall",
    "n_bitext_mining_ann", "n_decontam_semantic_ann", "n_label_noise_ann",
    "n_hard_negatives", "n_cosine_topk_bruteforce",
    # round 15: n_ann_pq / n_label_noise / n_record_linkage /
    # n_knn_join_topk left this set — their workloads are now FIXED
    # (200-probe / 2000-record batch, the n_mmr_rerank precedent) and
    # they sit in the linear band of the 100x fence.
}


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {q["q"]: q for q in d["queries"]}


def main():
    cur = load(sys.argv[1])
    prior = load(sys.argv[2]) if len(sys.argv) > 2 else {}
    flags = []
    for q, row in sorted(cur.items()):
        ratio = row["ratio"]
        if ratio > ABS_BAND and q not in KNOWN_QUADRATIC:
            flags.append(f"ABS  {q}: ratio {ratio:.2f} > {ABS_BAND} "
                         f"(a={row['a']}s b={row['b']}s)")
        p = prior.get(q)
        if (p and p["ratio"] >= 0.5 and row["b"] >= MIN_S
                and ratio > REG_FACTOR * p["ratio"]):
            flags.append(f"REG  {q}: ratio {p['ratio']:.2f} -> {ratio:.2f} "
                         f"(>{REG_FACTOR}x prior; b={row['b']}s)")
    n = len(cur)
    print(f"scale fence: {n} queries swept, {len(flags)} flagged")
    for f in flags:
        print(f)
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
