#!/usr/bin/env python
"""Bench-claims lint (the round-6 verdict's task-1c): SCALE.md's quoted
per-query bench numbers must agree with the latest bench artifact within a
stated tolerance — the same doc-vs-driver-signal contract check_claims.py
enforces for oracle rows, applied to wall-clock claims.

SCALE.md carries a machine-readable claims block:

    <!-- BENCH_CLAIMS sf=0.1 tolerance=1.5 -->
    | query | claimed_sec |
    |---|---|
    | q25b_dag_over_bronze | 3.91 |
    <!-- /BENCH_CLAIMS -->

Usage:
    python tools/check_bench_claims.py target/bench_full.json
    python tools/check_bench_claims.py BENCH_r07.json

The artifact may be a Bench stdout/bench_full.json object (has "queries")
or a driver BENCH_r*.json wrapper (digs into "parsed" or regex-scavenges
"tail"). A claimed query missing from the artifact fails; a ratio outside
[1/tol, tol] fails. If the artifact carries a calibration block whose
drift_x exceeds 1.5, mismatches are reported as WARN only — the artifact
itself says the box was drifting, so it cannot convict a claim.

Exit 0 = claims match the signal; exit 1 = a claim the signal contradicts.
"""
import json
import re
import sys


def load_queries(path):
    art = json.load(open(path))
    cal = None
    if isinstance(art, dict) and "queries" in art:
        return {k: float(v) for k, v in art["queries"].items()}, art.get("calibration")
    if isinstance(art, dict) and isinstance(art.get("parsed"), dict) \
            and "queries" in art["parsed"]:
        p = art["parsed"]
        return {k: float(v) for k, v in p["queries"].items()}, p.get("calibration")
    if isinstance(art, dict) and "tail" in art:
        qs = {k: float(v)
              for k, v in re.findall(r'"(q[0-9][^"]*)":([0-9.]+)', art["tail"])}
        m = re.search(r'"drift_x":([0-9.]+)', art["tail"])
        return qs, ({"drift_x": float(m.group(1))} if m else None)
    raise SystemExit(f"unrecognized artifact shape: {path}")


def main(artifact_path):
    queries, cal = load_queries(artifact_path)
    doc = open("SCALE.md").read()
    m = re.search(
        r"<!-- BENCH_CLAIMS sf=([0-9.]+) tolerance=([0-9.]+) -->(.*?)<!-- /BENCH_CLAIMS -->",
        doc, re.S)
    if not m:
        print("SCALE.md has no BENCH_CLAIMS block — nothing to lint")
        return 0
    tol = float(m.group(2))
    claims = re.findall(r"\|\s*(q[0-9][\w]*)\s*\|\s*([0-9.]+)\s*\|", m.group(3))
    if not claims:
        print("BENCH_CLAIMS block present but empty — nothing to lint")
        return 0
    drifting = bool(cal) and float(cal.get("drift_x", 1.0)) > 1.5
    bad = []
    for name, claimed in claims:
        claimed = float(claimed)
        if name not in queries:
            bad.append((name, claimed, None))
            continue
        actual = queries[name]
        if actual <= 0:  # negative = the query errored in this run
            bad.append((name, claimed, actual))
            continue
        ratio = actual / claimed
        if ratio > tol or ratio < 1.0 / tol:
            bad.append((name, claimed, actual))
    if bad:
        level = "WARN (artifact drift_x > 1.5 — box was drifting)" if drifting \
            else "FAIL"
        print(f"{level}: SCALE.md bench claims vs {artifact_path} "
              f"(tolerance {tol}x):")
        for name, claimed, actual in bad:
            shown = "MISSING" if actual is None else f"{actual:.2f}s"
            print(f"  {name}: claimed {claimed:.2f}s, artifact {shown}")
        if not drifting:
            return 1
    print(f"checked {len(claims)} bench claims against {artifact_path}: "
          f"{len(claims) - len(bad)} within {tol}x"
          + (f", {len(bad)} flagged under drift" if bad else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "target/bench_full.json"))
