#!/usr/bin/env python
"""Round-8 claims pinning helper: given two back-to-back local bench
artifacts (the A/B reproducibility pair) and the last official driver
artifact, propose a BENCH_CLAIMS block that

  1. pins claimed_sec = geomean(A, B) per query with the A/B-pooled
     calibration medians as cal_ref / shufcal_ref;
  2. KEEPS only queries whose claim would also pass the lint against the
     driver artifact after normalization (predicted driver ratio within
     the margin), and whose A/B spread is itself inside the margin —
     a claim that only reproduces on one box or one run is not a claim;
  3. prints the dropped candidates with the reason, so SCALE.md can name
     them instead of silently shrinking the table.

Usage:
    python tools/pin_bench_claims.py runA.json runB.json BENCH_r07.json
"""
import json
import math
import sys

sys.path.insert(0, "tools")
from check_bench_claims import load_queries, load_floors, _cal_median  # noqa: E402

MARGIN = 1.35          # inner margin inside the lint's 1.5x band

# Round-13 (verdict task 2): the candidate set is no longer a curated
# list — the coverage ratchet in check_bench_claims.py makes every timed
# non-volatile bench entry need a pin or a dated UNPINNED declaration, so
# the pinner proposes a claim for EVERY query in run A's artifact minus
# its volatile set. Queries the A/B pair cannot pin (spread, driver veto)
# are printed with reasons and belong in SCALE.md's BENCH_UNPINNED block.


def candidates_of(a_path):
    art = json.load(open(a_path))
    vol = set(art.get("volatile") or [])
    return sorted(set(art.get("queries") or {}) - vol)

# Evidence-widened pins (round 12, verdict task 1): queries whose DRIVER
# readings repeatedly sit above the local A/B geomean because of box
# phases the probes under-represent. The pin is the geomean of (local
# floor geomean, driver floor / end-position factor) — see SCALE.md's
# round-12 reconciliation note — and a fresh A/B pair must not SHRINK it
# back into the band edge the driver already contradicted. The low side
# stays safe: the lint's floor substitution + per-position band keep a
# fast local run inside tolerance down to pin/1.5 at factor 1.0.
#
# An override is EVIDENCE ABOUT SPECIFIC CODE, not a floor forever: it is
# removed in the same round the pinned plan changes with a named
# mechanism. Round-12 second half removed q155_triangles (fused
# intersection kernel — the wedge rows the old pin measured no longer
# materialize) and q165_random_walks (fused broadcast walker replaced the
# per-step joins); their fresh pins come from the close pair like any
# other row. q156_kcore is untouched code and keeps its pooled pin.
OVERRIDES = {
    "q156_kcore": 1.75,
}

# Rows whose PLAN changed this round with a named mechanism (SCALE.md):
# the last driver artifact measured code that no longer exists, so the
# driver-prediction veto is evidence about the WRONG plan for them — they
# pin from the A/B pair alone (exactly the q63ta precedent: a row absent
# from the driver artifact pins without a prediction). The set is
# emptied when the round's driver artifact lands.
CHANGED_THIS_ROUND = {
    # round-14: the |users| regime gate routes q182's 200-user shape to
    # the join plan (Cooccur.recommendAuto minFusedUsers — verdict task
    # 4); its r13 pin measured the fused route that shape no longer runs.
    # q183 is new this round (the forced-fused twin).
    "q182_topk_fused", "q183_topk_fused_subset",
}
# (The round-13 set — the CSR-sweep and serving-flip rows — emptied per
# protocol; note the r13 driver artifact carried no per-query signal at
# all (rc 124, startup-log tail), so the prediction veto against it is
# vacuous for every row regardless.)


def geomean(xs):
    return math.exp(sum(math.log(x) for x in xs) / len(xs))


def main(*paths):
    """Legs = paths[:-1] (2 or more back-to-back full-suite runs), driver
    artifact = paths[-1]. Round-14 extension: with THREE legs the claim
    for each query is the geomean of its two CLOSEST legs (the same
    spread rule applied to the best pair) — one phase-struck leg per row
    no longer drops it, while a row noisy across ALL legs still drops.
    The rule is uniform per row (always the closest pair), the probe refs
    pool over every leg, and the claims lint still validates the final
    table against each artifact independently."""
    # ADVICE r14: enforce arity — with one leg + a driver artifact
    # (2 paths) the closest-pair rule degenerates and every query
    # silently dropped as "absent/errored in all but one local run"
    # instead of failing fast on the malformed invocation.
    if len(paths) < 3:
        sys.exit("usage: pin_bench_claims.py LEG_A LEG_B [LEG_C ...] "
                 "DRIVER_ARTIFACT — need at least two local legs plus "
                 f"the driver artifact, got {len(paths)} path(s)")
    leg_paths, driver_path = list(paths[:-1]), paths[-1]
    legs = []
    cal_meds, shuf_meds = [], []
    for p in leg_paths:
        ql, call, shufl, _ = load_queries(p)
        # round-11 (SURVEY §8 floor protocol): pin from each run's
        # EFFECTIVE wall min(median, floor) — the statistic the lint
        # adjudicates. A query that warms downward across reps would
        # otherwise get a median pin the lint later convicts LOW against
        # its own floor.
        for q, fl in load_floors(p).items():
            if q in ql and 0 < fl < ql[q]:
                ql[q] = fl
        legs.append(ql)
        if _cal_median(call):
            cal_meds.append(_cal_median(call))
        if _cal_median(shufl):
            shuf_meds.append(_cal_median(shufl))
    qd, cald, shufd, _ = load_queries(driver_path)
    for q, fl in load_floors(driver_path).items():
        if q in qd and 0 < fl < qd[q]:
            qd[q] = fl
    cal_ref = geomean(cal_meds)
    shuf_ref = geomean(shuf_meds) if shuf_meds else None
    # predicted normalization factor a FUTURE driver run would apply,
    # estimated from the r7 driver artifact's cpu probe (it has no
    # shuffle probe yet)
    d_cal = _cal_median(cald)
    factor_d = (d_cal / cal_ref) if d_cal else 1.0
    # round-13: a driver artifact whose own probes drifted > 1.5x measured
    # a box changing speed mid-run — its per-query medians cannot veto a
    # clean A/B pair (the r12 artifact drifted 11x/27x; its first-half
    # medians are 14x contention, not code)
    def drift_of(block):
        if not isinstance(block, dict):
            return None
        pts = [block.get(p) for p in ("start", "mid", "end")]
        pts = [p for p in pts if p and p > 0]
        return (max(pts) / min(pts)) if pts else None
    d_drifts = [d for d in (drift_of(cald), drift_of(shufd)) if d]
    driver_vetoes = not any(d > 1.5 for d in d_drifts)
    if not driver_vetoes:
        print(f"# driver artifact drifted {max(d_drifts):.1f}x in-run — "
              f"prediction veto disabled, pins come from the A/B pair")
    kept, dropped = [], []
    for q in candidates_of(leg_paths[0]):
        walls = [l[q] for l in legs if q in l and l[q] > 0]
        if len(walls) < 2:
            dropped.append((q, "absent/errored in all but one local run"))
            continue
        # closest pair among the legs (with 2 legs this IS the pair)
        walls.sort()
        best = min(((walls[i + 1] / walls[i], walls[i], walls[i + 1])
                    for i in range(len(walls) - 1)), key=lambda t: t[0])
        spread, a, b = best
        if spread > MARGIN and q not in OVERRIDES:
            # an OVERRIDES row is pinned from pooled multi-run evidence,
            # not this pair — one noisy leg must not silently drop it
            dropped.append(
                (q, f"closest-pair spread {spread:.2f}x > {MARGIN} "
                    f"(walls {', '.join(f'{w:.2f}' for w in walls)})"))
            continue
        claim = max(geomean([a, b]), OVERRIDES.get(q, 0.0))
        if (driver_vetoes and q in qd and qd[q] > 0 and q not in OVERRIDES
                and q not in CHANGED_THIS_ROUND):
            # OVERRIDES rows already pooled the driver signal into their
            # pin (driver floor / end-position factor — SCALE.md round-12
            # note); this single-median-factor prediction is stricter than
            # the lint's per-position band and must not re-drop them
            pred = qd[q] / (claim * factor_d)
            if pred > MARGIN or pred < 1 / MARGIN:
                dropped.append((q, f"driver ratio {pred:.2f}x after "
                                   f"factor {factor_d:.2f}"))
                continue
        kept.append((q, claim))
    print(f"<!-- BENCH_CLAIMS sf=0.1 tolerance=1.5 "
          f"cal_ref={cal_ref:.2f}"
          + (f" shufcal_ref={shuf_ref:.2f}" if shuf_ref else "")
          + " -->")
    print("| query | claimed_sec |")
    print("|---|---|")
    for q, c in kept:
        print(f"| {q} | {c:.2f} |")
    print("<!-- /BENCH_CLAIMS -->")
    print()
    print(f"# kept {len(kept)}, dropped {len(dropped)} "
          f"(factor vs r07 driver: {factor_d:.2f}):")
    for q, why in dropped:
        print(f"#   {q}: {why}")
    skipped = [q for q, _ in kept if q in CHANGED_THIS_ROUND and q in qd]
    if skipped:
        print("# driver prediction skipped (plan changed this round): "
              + ", ".join(skipped))


if __name__ == "__main__":
    main(*sys.argv[1:])
