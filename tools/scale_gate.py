#!/usr/bin/env python3
"""Scale-slope gate (r11 VERDICT item 1): read target/scale_check.json
(written by graft.ScaleCheck over sf0.1 vs the ScaleGen sf1 corpus) and
gate every row's warm-time slope:

  linear rows:     t(sf1)/t(sf0.1) <= 12   (10x data; ~linear with
                                            per-stage constant
                                            amortization headroom)
  quadratic rows:  <= 130                  (the exact all-pairs
                                            yardsticks are O(n^2) BY
                                            DESIGN: 10x docs = 100x
                                            pairs, +30% headroom)

Rows whose sf0.1 warm time is under 0.3 s use max(a_warm, 0.3) as the
slope base — a 0.05 s -> 0.7 s move is fixed-overhead amortization
(job scheduling, artifact memo hits), not an algorithmic slope.

Also regenerates SCALE.md with the full table. Exit 1 on any gate
failure or failed sf1 run.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
LINEAR_MAX = 12.0
QUAD_MAX = 130.0
MIN_BASE = 0.3


def pctl_section():
    """Exact-vs-approx percentile cost table (target/pctl_swap.json,
    written by graft.PctlSwapCheck) — empty when the tool hasn't run."""
    path = os.path.join(HERE, "..", "target", "pctl_swap.json")
    try:
        rows = json.load(open(path))
    except (OSError, ValueError):
        return []
    out = [
        "",
        "## Percentile swap at scale (exact two-pass rank vs"
        " approx_percentile sketch)",
        "",
        "The documented 100 TB swap (`spark.graft.percentileMode=approx`,",
        "Q.exactPercentiles) measured on the sf1 corpus — output",
        "tolerance is PercentileSwapSpec's gate, this table is COST.",
        "Warm = min of two steady-state runs per mode.",
        "",
        "| query | exact warm s | approx warm s | speedup |",
        "|---|---|---|---|",
    ]
    for r in rows:
        out.append(
            f"| {r['q']} | {r['exact_warm']:.2f} | {r['approx_warm']:.2f} "
            f"| {r['speedup_warm']:.1f}× |")
    return out


def ann_section():
    """ANN quality at 10x data (target/ann_quality.json, recorded from
    the checked rows' own outputs via graft.ShowQ) — empty when the
    measurement hasn't been taken. Kept as an artifact so regenerating
    SCALE.md never silently drops the quality evidence (r14)."""
    path = os.path.join(HERE, "..", "target", "ann_quality.json")
    try:
        d = json.load(open(path))
    except (OSError, ValueError):
        return []
    out = [
        "",
        "## ANN quality at scale (r14 — recall measured, not just"
        " runtime slope)",
        "",
        "The \"ANN carries it at scale\" claim has a measured QUALITY",
        "point at 10× data, recorded from the checked rows' own outputs",
        "(`runMain graft.ShowQ <dir> h_ann_recall h_ann_mrr_ndcg`):",
        "",
        "| metric (checked row) | sf0.1 (2k vecs) | sf1 (20k vecs) |",
        "|---|---|---|",
    ]
    for r in d["rows"]:
        out.append(f"| {r['metric']} | {r['a']} | {r['b']} |")
    out += [""] + d.get("note", [])
    return out


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "..", "target", "scale_check.json")
    rows = json.load(open(path))
    bad = []
    lines = []
    for r in rows:
        quad = r.get("quadratic", False)
        cap = QUAD_MAX if quad else LINEAR_MAX
        if r["b_warm"] < 0:
            bad.append((r["q"], "sf1 run FAILED"))
            verdict = "FAIL(run)"
            slope = float("nan")
        else:
            base = max(r["a_warm"], MIN_BASE)
            slope = r["b_warm"] / base
            if slope > cap:
                bad.append((r["q"], f"slope {slope:.1f}x > {cap:.0f}x"))
                verdict = "FAIL"
            else:
                verdict = "ok"
        lines.append(
            f"| {r['q']} | {r['a_cold']:.2f} | {r['a_warm']:.2f} "
            f"| {r['b_cold']:.2f} | {r['b_warm']:.2f} "
            f"| {slope:.1f}x | {'O(n²) yardstick' if quad else 'linear'} "
            f"| {verdict} |")

    md = [
        "# SCALE — empirical scale-slope evidence (r13)",
        "",
        "`graft.ScaleGen` derives an sf1 corpus (10× the sf0.1 bench",
        "scale: 6M lineitem / 1.5M orders / 1M events / 50k documents /",
        "20k embeddings; FK-consistent key-replica offsets, per-replica",
        "word mutation so text replicas are NOT near-duplicates, ±0.5%",
        "embedding perturbation). `graft.ScaleCheck` runs the heaviest",
        "checked rows at both scales in one session (cold = first run",
        "incl. that SF's memoized artifact builds, warm = steady state)",
        "and `tools/scale_gate.py` enforces near-linear warm slopes:",
        f"≤{LINEAR_MAX:.0f}× for linear rows, ≤{QUAD_MAX:.0f}× for the",
        "documented exact-all-pairs yardsticks, slope base floored at",
        f"{MIN_BASE} s (fixed-overhead amortization is not a slope).",
        "",
        "",
        "The docMasks dedup family (h_minhash_lsh_dedup /",
        "h_dedup_clusters / h_cluster_size_hist /",
        "h_dedup_method_agreement) joined this table in r13: docMasks is",
        "width-adaptive — the sf1 corpus's 89-token vocabulary routes to",
        "array<long> masks (one scalar width probe; the r12 fail-loud",
        "64-token guard is gone), so the bounded-vocab rows are",
        "scale-continuous alongside the always-open-vocab paths",
        "(h_exact_dedup / h_line_dedup / h_minhash_widevocab).",
        "",
        "| query | sf0.1 cold | sf0.1 warm | sf1 cold | sf1 warm "
        "| warm slope | class | gate |",
        "|---|---|---|---|---|---|---|---|",
    ] + lines + [
        "",
        f"Gate: {'PASS — every row inside its slope cap' if not bad else 'FAIL: ' + '; '.join(f'{q} ({why})' for q, why in bad)}",
    ] + ann_section() + pctl_section() + [
        "",
        "Reproduce: `runMain graft.ScaleGen` (writes /tmp/graft-sf1),",
        "`runMain graft.ScaleCheck`, `python3 tools/scale_gate.py`;",
        "percentile table: `runMain graft.PctlSwapCheck /tmp/graft-sf1`.",
    ]
    out = os.path.join(HERE, "..", "SCALE.md")
    with open(out, "w") as f:
        f.write("\n".join(md) + "\n")
    for q, why in bad:
        print(f"FAIL {q}: {why}")
    print(f"== scale gate: {len(rows) - len(bad)}/{len(rows)} rows pass; "
          f"SCALE.md written ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
