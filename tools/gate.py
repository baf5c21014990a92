#!/usr/bin/env python3
"""Structural scale-gate check (round-10 judge ask #1).

Asserts that EVERY query in graft.queries.Catalog has a green row in the
given SCALEVERIFY artifact(s) — so a catalog query committed after the
at-scale gate ran (the round-9 gap: w_range_frame_sum /
w_dense_calendar_fill landed in the snapshot commit with no 5x row)
fails the gate loudly instead of shipping unverified.

Usage: tools/gate.py SCALEVERIFY_FULL_rN.json [more_artifacts.json ...]

Multiple artifacts union (e.g. the full-catalog run plus a narrow
top-up run for queries added later in the round). Exit 0 = every
catalog query has at least one PASS row and no artifact row FAILs;
exit 1 otherwise, listing the offenders.
"""
import json
import os
import subprocess
import sys

META_KEYS = {"src_sf_dir", "copies"}


def catalog_names(repo):
    out = subprocess.run(
        [os.path.join(repo, "tools", "run.sh"), "graft.CatalogNames"],
        capture_output=True, text=True, cwd=repo)
    if out.returncode != 0:
        print("[gate] graft.CatalogNames failed (run `sbt compile` first?):",
              file=sys.stderr)
        print(out.stderr[-2000:], file=sys.stderr)
        sys.exit(2)
    names = [l.strip() for l in out.stdout.splitlines()
             if l.strip() and not l.startswith("[")]
    if len(names) < 50:
        print(f"[gate] implausibly small catalog ({len(names)} names) — "
              "stdout polluted?", file=sys.stderr)
        sys.exit(2)
    return set(names)


def main():
    artifacts = sys.argv[1:]
    if not artifacts:
        print(__doc__.strip(), file=sys.stderr)
        sys.exit(2)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    catalog = catalog_names(repo)

    status = {}   # name -> best status seen ("pass" wins over anything)
    for path in artifacts:
        d = json.load(open(path))
        rows = d.get("queries", d)
        for name, row in rows.items():
            if name in META_KEYS or not isinstance(row, dict):
                continue
            st = str(row.get("status", "")).lower()
            prev = status.get(name)
            if prev != "pass":
                status[name] = st if prev is None or st == "pass" else prev

    missing = sorted(catalog - set(status))
    not_pass = sorted(n for n, st in status.items()
                      if n in catalog and st != "pass")
    stale = sorted(set(status) - catalog)

    print(f"[gate] catalog={len(catalog)} at-scale rows={len(status)} "
          f"pass={sum(1 for n in catalog if status.get(n) == 'pass')}")
    if stale:
        print(f"[gate] note: {len(stale)} artifact rows not in catalog "
              f"(renamed/removed queries): {', '.join(stale[:10])}")
    ok = True
    if missing:
        ok = False
        print(f"[gate] FAIL — {len(missing)} catalog queries have NO "
              f"at-scale row: {', '.join(missing)}")
    if not_pass:
        ok = False
        print(f"[gate] FAIL — {len(not_pass)} catalog queries have a "
              f"non-pass at-scale row: {', '.join(not_pass)}")
    if ok:
        print("[gate] OK — every catalog query is hash-verified at scale")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
