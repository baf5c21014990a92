#!/usr/bin/env python3
"""Scale-efficiency report from a complete BENCHFULL.json.

A single complete graft.Bench run times every catalog query at 1x
(main pass), the full catalog at 5x, and the value-ordered headliners
at 10x — same JVM, same box, same session, so the ratios are clean of
cross-run load noise. This script turns those three points into the
per-query scaling curve the 100 TB claims rest on:

    eff(N) = t(Nx) / (N * t(1x))

eff < 1   sub-linear cost growth: the 1x time is dominated by fixed
          overhead (planning, JVM, small-input constants) that does NOT
          replicate with the data — the shape you want.
eff ~ 1   linear: cost tracks data volume; fine for scans/shuffles.
eff > THR super-linear: the query does more than proportional work as
          data grows (quadratic candidate blowup, skewed shuffle,
          broadcast past its ceiling, iterative rounds growing with N) —
          exactly the class of defect the small-SF oracle can never see.

Default is REPORT-ONLY (exit 0): two catalog queries are super-linear by
construction, not by defect — the geo radius join's true OUTPUT grows
with the square of point density, and the replica generator densifies a
fixed 10^6 x 10^6 coordinate domain (see PLANS.md "Scale-efficiency
curve"). With --gate, exit 1 if any query outside --expected exceeds THR
(default 1.5 — generous: the unified pool is shared across the run and
sort-heavy shapes pay n log n, so mild super-linearity is noise; a true
quadratic shows up as eff >= N/2, far above any threshold here).

Usage: tools/scalecurve.py [BENCHFULL.json] [--threshold 1.5] [--md out.md]
                           [--gate] [--expected geo_grid_join,geo_knn_ranked]
"""
import argparse
import json
import sys


def load(path):
    with open(path) as fh:
        return json.load(fh)


def curve(doc, threshold):
    main = doc.get("queries") or {}
    scaled = doc.get("scaled") or {}
    rows = []
    points = []
    if scaled.get("queries"):
        points.append((int(scaled.get("copies", 10)), scaled["queries"]))
    full = scaled.get("full") or {}
    if full.get("queries"):
        points.append((int(full.get("copies", 5)), full["queries"]))
    points.sort()
    for name in sorted(main):
        t1 = main[name]
        if not t1:
            continue
        row = {"query": name, "t1": t1, "effs": {}}
        for copies, qs in points:
            if name in qs:
                row["effs"][copies] = qs[name] / (copies * t1)
        if row["effs"]:
            row["worst"] = max(row["effs"].values())
            rows.append(row)
    rows.sort(key=lambda r: -r["worst"])
    flagged = [r for r in rows if r["worst"] > threshold]
    return rows, flagged, [c for c, _ in points]


def render(rows, flagged, copies_list, threshold, src):
    n = len(rows)
    sub = sum(1 for r in rows if r["worst"] <= 1.0)
    lin = sum(1 for r in rows if 1.0 < r["worst"] <= threshold)
    out = []
    out.append(f"# Scale-efficiency report — {src}")
    out.append("")
    out.append(f"eff(N) = t(Nx) / (N * t(1x)); one bench run, same JVM/box.")
    out.append(f"Points: {', '.join(f'{c}x' for c in copies_list)}. "
               f"Queries with a scale point: {n}.")
    out.append(f"Sub-linear (worst eff <= 1.0): {sub}  |  "
               f"linear band (<= {threshold}): {lin}  |  "
               f"super-linear (> {threshold}): {len(flagged)}")
    out.append("")
    header = "| query | t(1x) s |" + "".join(
        f" eff({c}x) |" for c in copies_list) + " worst |"
    sep = "|---|---|" + "---|" * len(copies_list) + "---|"
    out.append("Worst 15 (highest eff first — the scale-risk watchlist):")
    out.append("")
    out.append(header)
    out.append(sep)
    for r in rows[:15]:
        cells = "".join(
            f" {r['effs'][c]:.2f} |" if c in r["effs"] else " — |"
            for c in copies_list)
        out.append(f"| {r['query']} | {r['t1']:.2f} |{cells} {r['worst']:.2f} |")
    if flagged:
        out.append("")
        out.append(f"FLAGGED super-linear (> {threshold}): "
                   + ", ".join(r["query"] for r in flagged))
    return "\n".join(out) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact", nargs="?", default="BENCHFULL.json")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--md", help="also write the report to this file")
    ap.add_argument("--gate", action="store_true",
                    help="exit 1 on unexpected super-linear queries")
    ap.add_argument("--expected",
                    default="geo_grid_join,geo_knn_ranked",
                    help="comma list of known-super-linear-by-construction "
                         "queries (quadratic OUTPUT under replica "
                         "densification — PLANS.md)")
    args = ap.parse_args()
    doc = load(args.artifact)
    if doc.get("skipped"):
        print(f"[scalecurve] warning: artifact has skipped passes "
              f"({len(doc['skipped'])}) — curve may be incomplete",
              file=sys.stderr)
    rows, flagged, copies_list = curve(doc, args.threshold)
    if not rows:
        print("[scalecurve] no scaled points in artifact", file=sys.stderr)
        return 1
    report = render(rows, flagged, copies_list, args.threshold, args.artifact)
    print(report)
    if args.md:
        with open(args.md, "w") as fh:
            fh.write(report)
    expected = {q for q in args.expected.split(",") if q}
    unexpected = [r["query"] for r in flagged if r["query"] not in expected]
    if unexpected:
        print(f"[scalecurve] UNEXPECTED super-linear: {', '.join(unexpected)}",
              file=sys.stderr)
    return 1 if (args.gate and unexpected) else 0


if __name__ == "__main__":
    sys.exit(main())
