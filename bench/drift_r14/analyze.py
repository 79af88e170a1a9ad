#!/usr/bin/env python3
"""Analyze the interleaved r14-vs-r12 bench drift experiment."""
import json, sys, glob

def load(side):
    runs = []
    for p in sorted(glob.glob(f"/tmp/drift_r14/full_*{side}.json")):
        with open(p) as f:
            runs.append(json.load(f))
    return runs

A = load("A")  # r14 HEAD
B = load("B")  # r12 code

def min_of(runs, q):
    vals = [r["queries"][q] for r in runs if q in r.get("queries", {})]
    return min(vals) if vals else None

carried = ["q1_pricing_summary", "c_join_inner_5way", "c_join_asof", "d_cube",
           "e_rank_family", "j_sessionization", "a_partitioned_glob_scan",
           "h_string_fns", "n_dedup_exact_hash", "n_dedup_minhash_lsh",
           "n_dedup_ngram_jaccard", "n_cosine_topk_bruteforce"]

r13 = {"q1_pricing_summary":1.733,"c_join_inner_5way":1.185,"c_join_asof":0.749,
       "d_cube":1.265,"e_rank_family":0.290,"j_sessionization":0.402,
       "a_partitioned_glob_scan":0.217,"h_string_fns":0.250,"n_dedup_exact_hash":0.267,
       "n_dedup_minhash_lsh":0.860,"n_dedup_ngram_jaccard":0.444,
       "n_cosine_topk_bruteforce":0.345}
r12 = {"q1_pricing_summary":1.305,"c_join_inner_5way":0.963,"c_join_asof":0.661,
       "d_cube":1.057,"e_rank_family":0.407,"j_sessionization":0.340,
       "a_partitioned_glob_scan":0.199,"h_string_fns":0.190,"n_dedup_exact_hash":0.199,
       "n_dedup_minhash_lsh":0.617,"n_dedup_ngram_jaccard":0.134,
       "n_cosine_topk_bruteforce":0.288}

print(f"runs: A(r14)={len(A)} B(r12)={len(B)}")
for r in A: print(f"  A load {r['loadavg_start']:.1f}->{r['loadavg_end']:.1f} total {r['total']}")
for r in B: print(f"  B load {r['loadavg_start']:.1f}->{r['loadavg_end']:.1f} total {r['total']}")

print(f"\n{'query':28s} {'r12art':>7s} {'r13art':>7s} {'B=r12now':>8s} {'A=r14now':>8s} {'A/B':>5s} {'A/r12art':>8s}")
for q in carried:
    a, b = min_of(A, q), min_of(B, q)
    if a is None or b is None: continue
    print(f"{q:28s} {r12[q]:7.3f} {r13[q]:7.3f} {b:8.3f} {a:8.3f} {a/b:5.2f} {a/r12[q]:8.2f}")

# full-inventory comparison on common queries
common = set(A[0]["queries"]) & set(B[0]["queries"]) if A and B else set()
rows = []
for q in common:
    a, b = min_of(A, q), min_of(B, q)
    if b and b > 0.05:
        rows.append((a/b, q, a, b))
rows.sort(reverse=True)
import statistics
ratios = [r[0] for r in rows]
if ratios:
    print(f"\ncommon queries >50ms: {len(ratios)}, median A/B {statistics.median(ratios):.3f}, "
          f"mean {statistics.mean(ratios):.3f}")
    print("worst 12 (r14 slower than r12 code, same box+session):")
    for r, q, a, b in rows[:12]:
        print(f"  {q:32s} A={a:.3f} B={b:.3f} ratio={r:.2f}")
    print("best 5:")
    for r, q, a, b in rows[-5:]:
        print(f"  {q:32s} A={a:.3f} B={b:.3f} ratio={r:.2f}")

tot_a = sum(min_of(A, q) for q in A[0]["queries"])
print(f"\nA (r14) min-of-3 full-inventory total: {tot_a:.1f}s over {len(A[0]['queries'])} queries"
      f" = {tot_a/len(A[0]['queries']):.3f} s/query")
tot_b = sum(min_of(B, q) for q in B[0]["queries"])
print(f"B (r12) min-of-3 full-inventory total: {tot_b:.1f}s over {len(B[0]['queries'])} queries"
      f" = {tot_b/len(B[0]['queries']):.3f} s/query")
