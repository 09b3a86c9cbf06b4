#!/usr/bin/env python
"""Bench-claims lint (round-6 verdict task-1c; normalization added per the
round-7 verdict task 1): SCALE.md's quoted per-query bench numbers must
agree with the latest bench artifact within a stated tolerance — the same
doc-vs-driver-signal contract check_claims.py enforces for oracle rows,
applied to wall-clock claims.

SCALE.md carries a machine-readable claims block:

    <!-- BENCH_CLAIMS sf=0.1 tolerance=1.5 cal_ref=0.54 shufcal_ref=1.80 -->
    | query | claimed_sec |
    |---|---|
    | q25b_dag_over_bronze | 3.91 |
    <!-- /BENCH_CLAIMS -->

`cal_ref` / `shufcal_ref` are the pinning run's calibration medians (the
CPU probe and the shuffle probe, Bench.scala). When the artifact under
test carries its own calibration block(s), claims are NORMALIZED by the
box-speed factor. Round-12 (verdict task 1): the factor is no longer one
number — the probes are timed at suite START / MID / END, and a run
whose box drifts mid-suite (r11: cpu 0.43 -> 0.56 -> 0.58, drift 1.36x)
was adjudicating mid-suite queries against the run-start speed. The lint
now computes a PER-POSITION factor

    factor_p = geomean over available probes of (probe_p / ref),  p in
               {start, mid, end}, each clamped to [0.5, 2.5]

and a claim passes the tolerance band if it passes for ANY factor inside
the run's observed [min_p, max_p] band — the box speed when the query
ran is somewhere in that band (the compact artifact does not record
where in the suite each query sat), so the claim gets the band's benefit
of the doubt, bounded by what the run's own probes recorded. A box that
runs the probes 2x slower still reads 2x claims instead of convicting
untouched code (the round-7 failure); a claim outside tolerance at EVERY
recorded box speed still fails. Refs absent or artifact calibration
absent -> factor 1.0 (the old strict behavior).

Usage:
    python tools/check_bench_claims.py target/bench_full.json
    python tools/check_bench_claims.py BENCH_r07.json

The artifact may be a Bench stdout/bench_full.json object (has "queries")
or a driver BENCH_r*.json wrapper (digs into "parsed" or regex-scavenges
"tail"). A claimed query missing from the artifact fails; a normalized
ratio outside [1/tol, tol] at every band factor fails. If either probe's
in-run drift_x exceeds 1.5, mismatches are reported as WARN only — the
artifact itself says the box was drifting DURING the run, so it cannot
convict a claim — EXCEPT (round-10, verdict task 4) when the RAW ratio
exceeds RAW_HARD (2.0x) in either direction: a gap that large is a
regression (or a stale claim) no observed probe drift explains, so it
fails even on a drifting box.

Round-12 advice: the floor (min of reps) substitutes into the tolerance
band AND the RAW_HARD check as before, but the UNADJUSTED MEDIAN now has
its own hard bound MED_HARD (4.0x): a median that far past the claim
fails even when one fast rep left an in-band floor — a sometimes-slow
regression (intermittent spill) shows in the median, while box phases
observed so far spread intra-run reps at most 1.8x on byte-identical
code (r11 q155: floor 11.38 vs median 20.39) on top of raw gaps <= 3.2x,
so 4.0 sits above every honest artifact and below a sustained 4x+
regression.

Round-13 (verdict task 2 — the hole round 12 fell through): a bench
entry with no pin used to be INVISIBLE to this lint, so the two new
fused-serve rows shipped unpinned and read 35x in the driver artifact
with no red gate. The lint now also enforces COVERAGE against any
full-shape artifact (one that carries the complete queries map +
volatile list, i.e. bench_full.json / the committed local artifacts):
every timed query must be (a) pinned in BENCH_CLAIMS, (b) listed in the
artifact's `volatile` set (fit walls breathe by design and are excluded
from core_total), or (c) declared in SCALE.md's BENCH_UNPINNED block

    <!-- BENCH_UNPINNED round=13 -->
    | query | round_added | reason |
    |---|---|---|
    | q182_topk_fused | 13 | new this round, awaiting A/B pair |
    <!-- /BENCH_UNPINNED -->

with ONE round of grace: an entry whose round_added is more than one
round behind the block's `round` attribute fails — ship it pinned or
explain why it left the suite. Deleting a pin without adding an
UNPINNED row turns the lint red on the next full-shape artifact.
Tail-shaped artifacts (driver wrappers, truncated stdout) skip the
coverage check — they don't carry the full query list.

Exit 0 = claims match the signal; exit 1 = a claim the signal contradicts.
"""
import json
import math
import re
import sys

# Raw-ratio bound that convicts regardless of probe drift: chosen above
# every honest raw ratio observed in r7-r9 artifacts (max 1.66 under the
# worst recorded mid-run drift) and below the smallest real regression
# the drift hatch previously waved through. Applies to the adjudicated
# wall (floor when the artifact recorded one).
RAW_HARD = 2.0
# Raw bound on the UNADJUSTED median (round-12 advice): the floor cannot
# exempt a query from this one — see the docstring for the sizing.
MED_HARD = 4.0


def _median(xs):
    xs = sorted(x for x in xs if x is not None and x > 0)
    if not xs:
        return None
    return xs[len(xs) // 2]


def _cal_median(block):
    if not isinstance(block, dict):
        return None
    return _median([block.get("start"), block.get("mid"), block.get("end")])


def load_queries(path):
    """-> (queries, cpu_cal_block, shuffle_cal_block, shape)

    shape is "full" (the artifact carries the complete queries map — a
    missing claim is a typo'd name and fails) or "tail" (a truncated
    stdout scavenge — the compact line only carries the most expensive
    queries up to a char budget, so absence is NOT contradiction and a
    missing claim is reported unchecked, not failed)."""
    art = json.load(open(path))
    if isinstance(art, dict) and "queries" in art and "tail" not in art:
        # the compact stdout line itself (saved to a file) carries only
        # the most expensive queries up to the char budget and says so
        # via "omitted" — treat it like a tail scavenge, where absence of
        # a cheap query is not contradiction
        shape = "tail" if art.get("omitted") else "full"
        return ({k: float(v) for k, v in art["queries"].items()},
                art.get("calibration"), art.get("shuffle_cal"), shape)
    if isinstance(art, dict) and isinstance(art.get("parsed"), dict) \
            and "queries" in art["parsed"]:
        p = art["parsed"]
        # a parsed driver wrapper is still the compact stdout line —
        # cheap queries live under "omitted", so treat it as tail-shaped
        return ({k: float(v) for k, v in p["queries"].items()},
                p.get("calibration"), p.get("shuffle_cal"), "tail")
    if isinstance(art, dict) and "tail" in art:
        qs = {k: float(v)
              for k, v in re.findall(r'"(q[0-9][^"]*)":([0-9.]+)', art["tail"])}

        def scavenge(name):
            # LAST occurrence: Bench streams cumulative records as the
            # suite runs (round 14), so earlier matches are partial
            ms = re.findall(r'"%s":\{([^}]*)\}' % name, art["tail"])
            if not ms:
                return None
            kv = dict(re.findall(r'"(\w+)":(-?[0-9.]+)', ms[-1]))
            return {k: float(v) for k, v in kv.items()}
        return qs, scavenge("calibration"), scavenge("shuffle_cal"), "tail"
    raise SystemExit(f"unrecognized artifact shape: {path}")


def load_floors(path):
    """Per-query FLOOR (min of timed reps) when the artifact carries it
    (round-11: Bench emits `qfloor` in both the compact stdout line —
    keys prefixed `~` to stay invisible to the flat median scavenge —
    and bench_full.json). Claims are pinned from A/B floors, so the
    floor, not a single pass's median, is the like-for-like statistic:
    an isolated query whose one noisy rep inflates the median still
    shows its steady-state wall in the floor. Missing -> {} (the old
    median-only adjudication)."""
    art = json.load(open(path))
    if isinstance(art, dict) and isinstance(art.get("qfloor"), dict):
        return {k.lstrip("~"): float(v) for k, v in art["qfloor"].items()}
    if isinstance(art, dict) and isinstance(art.get("rep_times"), dict):
        out = {}
        for k, ts in art["rep_times"].items():
            good = [t for t in ts if isinstance(t, (int, float)) and t > 0]
            if good:
                out[k] = min(good)
        return out
    blobs = []
    if isinstance(art, dict) and isinstance(art.get("parsed"), dict) \
            and isinstance(art["parsed"].get("qfloor"), dict):
        return {k.lstrip("~"): float(v)
                for k, v in art["parsed"]["qfloor"].items()}
    if isinstance(art, dict) and "tail" in art:
        blobs.append(art["tail"])
    floors = {}
    for blob in blobs:
        floors.update({k: float(v) for k, v in
                       re.findall(r'"~(q[0-9][^"]*)":([0-9.]+)', blob)})
    return floors


def load_points(path):
    """Round-13 probe GRID: Bench times the calibration pair ~every eighth
    of the suite (cal_points/shuf_points in the full artifact). The r13
    close showed why three points are not enough: leg C's box phase sat
    between the mid and end probes, read drift 1.07, and convicted
    untouched code. When the grid is present the tolerance band spans
    every grid point, so any phase longer than a grid interval is inside
    the artifact's own band. Returns (cal_pts, shuf_pts) or (None, None)."""
    art = json.load(open(path))

    def pick(obj):
        # full artifact carries cal_points/shuf_points; the compact stdout
        # line (and the driver wrapper parsed from it) carries cal_pts/
        # shuf_pts — same grid, shorter keys for the tail char budget
        for ck, sk in (("cal_points", "shuf_points"), ("cal_pts", "shuf_pts")):
            c, s = obj.get(ck), obj.get(sk)
            if isinstance(c, list) and isinstance(s, list) and c and s:
                return c, s
        return None
    if isinstance(art, dict):
        got = pick(art)
        if got:
            return got
        if isinstance(art.get("parsed"), dict):
            got = pick(art["parsed"])
            if got:
                return got
        if isinstance(art.get("tail"), str):
            def scavenge(key):
                # LAST occurrence: Bench streams the cumulative grid at
                # every probe point (round 14) — the final match is the
                # most complete one the kill left in the tail
                ms = re.findall(r'"%s":\[([0-9.,\-]*)\]' % key, art["tail"])
                ms = [m for m in ms if m]
                if not ms:
                    return None
                return [float(x) for x in ms[-1].split(",")]
            for ck, sk in (("cal_points", "shuf_points"),
                           ("cal_pts", "shuf_pts")):
                c, s = scavenge(ck), scavenge(sk)
                if c and s:
                    return c, s
    return None, None


def load_volatile(path):
    """The artifact's `volatile` list (fit-heavy entries excluded from
    core_total) — present in full-shape artifacts only."""
    art = json.load(open(path))
    if isinstance(art, dict) and isinstance(art.get("volatile"), list):
        return set(art["volatile"])
    return None


def check_coverage(queries, volatile, pinned, doc, artifact_path):
    """Round-13 ratchet (see module docstring): every timed query in a
    full-shape artifact must be pinned, volatile, or declared UNPINNED
    within the one-round grace window. Returns a list of failures."""
    m = re.search(
        r"<!-- BENCH_UNPINNED round=(\d+)\s*-->(.*?)<!-- /BENCH_UNPINNED -->",
        doc, re.S)
    current_round = int(m.group(1)) if m else None
    unpinned = {}
    if m:
        for name, rnd in re.findall(
                r"\|\s*(q[0-9][\w]*)\s*\|\s*(\d+)\s*\|", m.group(2)):
            unpinned[name] = int(rnd)
    failures = []
    for name in sorted(queries):
        if name in pinned or name in volatile:
            continue
        if name in unpinned:
            if current_round is not None \
                    and current_round - unpinned[name] > 1:
                failures.append(
                    f"{name}: UNPINNED since round {unpinned[name]} — grace "
                    f"expired at round {current_round} (pin it from an A/B "
                    f"pair or document why it left the suite)")
            continue
        failures.append(
            f"{name}: timed bench entry with neither a BENCH_CLAIMS pin nor "
            f"a BENCH_UNPINNED declaration (the round-12 q52f/q182 hole)")
    # stale UNPINNED rows for queries that no longer exist are noise, not
    # failures — but report them so the block gets pruned
    stale = [n for n in unpinned if n not in queries and n not in pinned]
    if stale:
        print(f"note: BENCH_UNPINNED rows absent from {artifact_path} "
              f"(prune when intentional): " + ", ".join(sorted(stale)))
    return failures


def main(artifact_path):
    queries, cal, shuf, shape = load_queries(artifact_path)
    floors = load_floors(artifact_path)
    doc = open("SCALE.md").read()
    m = re.search(
        r"<!-- BENCH_CLAIMS sf=([0-9.]+) tolerance=([0-9.]+)([^>]*)-->(.*?)<!-- /BENCH_CLAIMS -->",
        doc, re.S)
    if not m:
        # round-15 hardening: commit 70f29c5 deleted ONLY the opening
        # marker, leaving the close marker + pin table behind — and the
        # lint silently adjudicated nothing for a full round. An orphaned
        # close marker (or a pin-table header with no open marker) means
        # the block was damaged, not absent: fail loudly.
        if "<!-- /BENCH_CLAIMS -->" in doc:
            print("FAIL: SCALE.md has a /BENCH_CLAIMS close marker but no "
                  "opening <!-- BENCH_CLAIMS ... --> marker — the block was "
                  "damaged (opening line deleted?), refusing to no-op")
            return 1
        if re.search(r"\|\s*query\s*\|\s*claimed_sec\s*\|", doc):
            print("FAIL: SCALE.md has a '| query | claimed_sec |' pin-table "
                  "header but no BENCH_CLAIMS opening marker — the block was "
                  "damaged, refusing to no-op")
            return 1
        print("SCALE.md has no BENCH_CLAIMS block — nothing to lint")
        return 0
    tol = float(m.group(2))
    attrs = dict(re.findall(r"(\w+)=([0-9.]+)", m.group(3)))
    claims = re.findall(r"\|\s*(q[0-9][\w]*)\s*\|\s*([0-9.]+)\s*\|", m.group(4))
    if not claims:
        print("BENCH_CLAIMS block present but empty — nothing to lint")
        return 0

    # coverage ratchet (round-13): full-shape artifacts carry the complete
    # timed-query list — every entry must be pinned, volatile, or declared
    # UNPINNED within grace. Not drift-excusable: coverage is a property
    # of the doc, not of the box.
    coverage_failures = []
    if shape == "full":
        volatile = load_volatile(artifact_path)
        if volatile is not None:
            coverage_failures = check_coverage(
                queries, volatile, {n for n, _ in claims}, doc, artifact_path)

    # box-speed normalization: one factor PER PROBE POSITION (round-12,
    # verdict task 1) — geomean of the probes' start readings, of their
    # mid readings, of their end readings — plus the old median factor
    # for display. Clamp per factor, tightened 4.0 -> 2.5 in round 8:
    # with tolerance 1.5 a 4.0 clamp let a real regression of up to 6x
    # pass on a box whose probes read slow; 2.5 bounds the worst
    # pass-through at 3.75x while covering every probe factor observed
    # so far (0.54-2.6 across r7/r8 artifacts).
    def _clamp(f):
        return min(2.5, max(0.5, f))

    def _pos_factor(pos):
        rs = []
        if "cal_ref" in attrs and isinstance(cal, dict) and \
                (cal.get(pos) or 0) > 0:
            rs.append(cal[pos] / float(attrs["cal_ref"]))
        if "shufcal_ref" in attrs and isinstance(shuf, dict) and \
                (shuf.get(pos) or 0) > 0:
            rs.append(shuf[pos] / float(attrs["shufcal_ref"]))
        if not rs:
            return None
        return _clamp(math.exp(sum(math.log(r) for r in rs) / len(rs)))

    ratios = []
    cal_med, shuf_med = _cal_median(cal), _cal_median(shuf)
    if "cal_ref" in attrs and cal_med:
        ratios.append(cal_med / float(attrs["cal_ref"]))
    if "shufcal_ref" in attrs and shuf_med:
        ratios.append(shuf_med / float(attrs["shufcal_ref"]))
    factor = 1.0
    if ratios:
        factor = _clamp(
            math.exp(sum(math.log(r) for r in ratios) / len(ratios)))
    # band: prefer the probe GRID (round 13 — every grid point is a
    # recorded box speed); fall back to the legacy start/mid/end factors
    cal_pts, shuf_pts = load_points(artifact_path)
    band = []
    if cal_pts and shuf_pts and "cal_ref" in attrs and "shufcal_ref" in attrs:
        for cp, sp in zip(cal_pts, shuf_pts):
            rs = []
            if cp and cp > 0:
                rs.append(cp / float(attrs["cal_ref"]))
            if sp and sp > 0:
                rs.append(sp / float(attrs["shufcal_ref"]))
            if rs:
                band.append(_clamp(
                    math.exp(sum(math.log(r) for r in rs) / len(rs))))
    grid_banded = bool(band)
    if not band:
        band = [f for f in (_pos_factor(p) for p in ("start", "mid", "end"))
                if f is not None] or [factor]
    f_min, f_max = min(band), max(band)
    # Hard-bound normalization (round 13): RAW_HARD/MED_HARD exist because
    # the probe normalization could not be trusted BETWEEN probe points —
    # a grid artifact removes that doubt (a point every ~1/8 suite), so on
    # grid artifacts the hard bounds read raw / max(1, f_max): a box whose
    # own grid recorded a 2.25x phase does not convict a 2.1x floor on
    # untouched code (r13 leg E, q159), while a genuine many-x regression
    # still lands past the scaled bound. Legacy 3-point artifacts keep the
    # strict raw bounds — their probes may have missed the phase, but a
    # bound that scales with an unmeasured factor would be no bound.
    hard_scale = max(1.0, f_max) if grid_banded else 1.0

    def drift_of(block):
        if not isinstance(block, dict):
            return None
        return block.get("drift_x")
    drifts = [d for d in (drift_of(cal), drift_of(shuf)) if d]
    drifting = any(d > 1.5 for d in drifts)

    bad = []
    hard_bad = []  # raw ratio outside [1/RAW_HARD, RAW_HARD]: fails even under drift
    unchecked = []
    for name, claimed in claims:
        claimed = float(claimed)
        if name not in queries:
            if shape == "tail":
                unchecked.append(name)  # truncated artifact: no signal
            else:
                bad.append((name, claimed, None))
            continue
        actual = queries[name]
        if actual <= 0:  # negative = the query errored in this run
            bad.append((name, claimed, actual))
            hard_bad.append(name)
            continue
        # the UNADJUSTED median's own hard bound (round-12 advice): a
        # floor cannot exempt a sustained 4x+ gap (scaled by the grid's
        # recorded band max on grid artifacts — see hard_scale above)
        raw_med = actual / claimed / hard_scale
        if raw_med > MED_HARD or raw_med < 1.0 / MED_HARD:
            bad.append((name, claimed, actual))
            hard_bad.append(name)
            continue
        # floor-aware adjudication: claims are pinned from A/B run floors,
        # so a floor the artifact itself recorded is the comparable wall
        if name in floors and 0 < floors[name] < actual:
            actual = floors[name]
        # pass if the claim is in band at ANY box speed the run's probes
        # recorded (the per-position band; see the docstring)
        lo = actual / (claimed * f_max)
        hi = actual / (claimed * f_min)
        if lo > tol or hi < 1.0 / tol:
            bad.append((name, claimed, actual))
            raw = actual / claimed / hard_scale
            if raw > RAW_HARD or raw < 1.0 / RAW_HARD:
                hard_bad.append(name)
    norm = (f" (box factor {factor:.2f}, per-position band "
            f"[{f_min:.2f}, {f_max:.2f}] from probes"
            f" cpu={cal_med if cal_med else '-'}"
            f" shuffle={shuf_med if shuf_med else '-'})") if ratios else ""
    if bad:
        level = "WARN (artifact drift_x > 1.5 — box was drifting)" if drifting \
            else "FAIL"
        print(f"{level}: SCALE.md bench claims vs {artifact_path} "
              f"(tolerance {tol}x{norm}):")
        for name, claimed, actual in bad:
            if actual is None:
                print(f"  {name}: claimed {claimed:.2f}s "
                      f"(normalized {claimed * factor:.2f}s), artifact MISSING")
            else:
                # raw ratio printed alongside (round-8 advice): large gaps
                # stay visible even when normalization absorbs part of them
                print(f"  {name}: claimed {claimed:.2f}s "
                      f"(normalized {claimed * factor:.2f}s), artifact "
                      f"{actual:.2f}s (raw {actual / claimed:.2f}x, "
                      f"normalized {actual / (claimed * factor):.2f}x)")
        if drifting and hard_bad:
            print(f"FAIL anyway: raw ratio past the {RAW_HARD}x hard bound "
                  f"(drift cannot explain it): " + ", ".join(hard_bad))
        if not drifting or hard_bad:
            return 1
    if unchecked:
        print(f"note: {len(unchecked)} claims absent from the truncated "
              f"artifact (below its char budget — not contradicted): "
              + ", ".join(unchecked))
    if coverage_failures:
        print(f"FAIL: {len(coverage_failures)} bench entries escape "
              f"adjudication (pin, mark volatile, or declare UNPINNED):")
        for f in coverage_failures:
            print(f"  {f}")
        return 1
    print(f"checked {len(claims) - len(unchecked)} bench claims against "
          f"{artifact_path}{norm}: "
          f"{len(claims) - len(unchecked) - len(bad)} within {tol}x"
          + (f", {len(bad)} flagged under drift" if bad else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "target/bench_full.json"))
