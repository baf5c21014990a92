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


def points_of(doc, tag=""):
    """(label, copies, per-query sec, same-session 1x medians) per scale
    pass in one artifact. eff always divides by the artifact's OWN main
    pass — mixing denominators across runs would reintroduce the load
    noise the same-session design removes."""
    main = doc.get("queries") or {}
    scaled = doc.get("scaled") or {}
    out = []
    if scaled.get("queries"):
        c = int(scaled.get("copies", 10))
        out.append((f"{c}x{tag}", c, scaled["queries"], main))
    full = scaled.get("full") or {}
    if full.get("queries"):
        c = int(full.get("copies", 5))
        out.append((f"{c}x{tag}", c, full["queries"], main))
    return out


def curve(points, threshold):
    rows = {}
    for label, copies, qs, main in points:
        for name, sec in qs.items():
            t1 = main.get(name)
            if not t1:
                continue
            row = rows.setdefault(name, {"query": name, "t1": t1,
                                         "effs": {}, "copies": {},
                                         "t1s": {}})
            row["effs"][label] = sec / (copies * t1)
            row["copies"][label] = copies
            # per-point denominator: in merged multi-artifact reports each
            # artifact carries its own same-JVM 1x median, and they drift
            # with box load (and code changes between runs) — displaying
            # only the first artifact's t1 beside effs that divided by a
            # different one misreads as arithmetic error
            row["t1s"][label] = t1
    out = []
    for row in rows.values():
        row["worst"] = max(row["effs"].values())
        # Super-linearity is an ASYMPTOTIC claim, so the gate judges each
        # query at its largest measured scale: a one-run stall at a small
        # point inflates `worst` (seen: a 0.4 s query catching a 17 s
        # sample in the single-run 5x pass while its 10x/20x effs sat at
        # 0.25/0.20), but a genuinely super-linear query is super-linear
        # at its largest N — where the quadratic term dominates most.
        # Among multiple merged points at the SAME largest copies (two
        # artifacts can each carry a 20x point), gate on the MAX eff —
        # explicit and conservative: a later artifact can never silently
        # shadow an earlier run's higher statistic (pre-r15 the tiebreak
        # was lexicographic on label, so '20x (2)' always beat '20x').
        max_copies = max(row["copies"].values())
        row["asym"] = max(e for l, e in row["effs"].items()
                          if row["copies"][l] == max_copies)
        out.append(row)
    out.sort(key=lambda r: -r["worst"])
    flagged = [r for r in out if r["asym"] > threshold]
    return out, flagged


def render(rows, flagged, labels, threshold, src):
    n = len(rows)
    sub = sum(1 for r in rows if r["worst"] <= 1.0)
    lin = sum(1 for r in rows if 1.0 < r["worst"] <= threshold)
    out = []
    out.append(f"# Scale-efficiency report — {src}")
    out.append("")
    out.append("eff(N) = t(Nx) / (N * t(1x)); each point divides by its own "
               "run's same-JVM 1x pass. The t(1x) column shows that "
               "per-artifact denominator as a range when merged artifacts "
               "disagree (each artifact re-times 1x on its own box state).")
    out.append(f"Points: {', '.join(labels)}. "
               f"Queries with a scale point: {n}.")
    out.append(f"Sub-linear (worst eff <= 1.0): {sub}  |  "
               f"linear band (<= {threshold}): {lin}  |  "
               f"super-linear at the largest measured scale "
               f"(asym eff > {threshold}): {len(flagged)}")
    out.append("")
    header = "| query | t(1x) s |" + "".join(
        f" eff({l}) |" for l in labels) + " worst | asym |"
    sep = "|---|---|" + "---|" * len(labels) + "---|---|"
    out.append("Worst 15 (highest any-point eff first; `asym` = eff at the "
               "largest measured scale, the gated statistic):")
    out.append("")
    out.append(header)
    out.append(sep)
    for r in rows[:15]:
        cells = "".join(
            f" {r['effs'][l]:.2f} |" if l in r["effs"] else " — |"
            for l in labels)
        t1s = sorted(set(r.get("t1s", {}).values()) or {r["t1"]})
        t1txt = (f"{t1s[0]:.2f}" if len(t1s) == 1
                 else f"{t1s[0]:.2f}–{t1s[-1]:.2f}")
        out.append(f"| {r['query']} | {t1txt} |{cells} "
                   f"{r['worst']:.2f} | {r['asym']:.2f} |")
    if flagged:
        out.append("")
        out.append(f"FLAGGED super-linear at largest scale (> {threshold}): "
                   + ", ".join(r["query"] for r in flagged))
    return "\n".join(out) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifacts", nargs="*", default=["BENCHFULL.json"],
                    help="one or more complete bench artifacts; points from "
                         "later files get a ' (2)', ' (3)'... suffix when "
                         "their copies collide with an earlier file's")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--md", help="also write the report to this file")
    ap.add_argument("--gate", action="store_true",
                    help="exit 1 on unexpected super-linear queries")
    ap.add_argument("--expected",
                    default="geo_grid_join,geo_knn_ranked,geo_knn_adaptive,"
                            "dd_semdedup",
                    help="comma list of known-super-linear-by-construction "
                         "queries (quadratic candidates/OUTPUT under replica "
                         "densification — PLANS.md; the geo three carry "
                         "MEASURED 20x points across multiple quiet "
                         "sessions: grid 1.63-3.54, knn_ranked 2.75-3.41, "
                         "knn_adaptive 1.68-2.60 — the adaptive twin's "
                         "bounded heap flattens the window form's curve and "
                         "its residual is the scan-side distance tests; "
                         "sub-second 1x denominators make eff noisier than "
                         "the wall gap. dd_semdedup (added r16, surfaced by "
                         "the quiet 10x denominators: eff 1.63 at 10x) "
                         "carries the fixed-k pairwise term n^2/2k by "
                         "construction — the catalog pins k=8 for the "
                         "oracle, so replica growth densifies clusters "
                         "quadratically; the 100 TB path is SemDeDup's own "
                         "recipe, k scaling with the corpus, measured by "
                         "ScaleStress.semdedupStress (pairs and wall time "
                         "~1/k) and pinned in ScaleStressSpec)")
    args = ap.parse_args()
    points = []
    seen = {}
    for i, path in enumerate(args.artifacts):
        doc = load(path)
        if doc.get("skipped"):
            print(f"[scalecurve] warning: {path} has skipped passes "
                  f"({len(doc['skipped'])}) — curve may be incomplete",
                  file=sys.stderr)
        for label, copies, qs, main in points_of(doc):
            seen[copies] = seen.get(copies, 0) + 1
            if seen[copies] > 1:
                label = f"{label} ({seen[copies]})"
            points.append((label, copies, qs, main))
    points.sort(key=lambda p: (p[1], p[0]))
    rows, flagged = curve(points, args.threshold)
    if not rows:
        print("[scalecurve] no scaled points in artifacts", file=sys.stderr)
        return 1
    labels = [p[0] for p in points]
    report = render(rows, flagged, labels, args.threshold,
                    ", ".join(args.artifacts))
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
