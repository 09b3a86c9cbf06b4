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
box-speed factor

    factor = geomean over available probes of (artifact_median / ref)

clamped to [0.5, 4.0], and the check becomes
actual / (claimed * factor) within [1/tol, tol] — a box that runs the
constant probes 2x slower reads 2x claims instead of convicting
untouched code (the round-7 failure: claims pinned on an exclusive box
read 1.5-4.4x off on the driver's contended one, and the CPU probe alone
— drift_x 1.19 — could not explain a gap concentrated in shuffle-heavy
queries; hence the second, shuffle-shaped probe). Refs absent or
artifact calibration absent -> factor 1.0 (the old strict behavior).

Usage:
    python tools/check_bench_claims.py target/bench_full.json
    python tools/check_bench_claims.py BENCH_r07.json

The artifact may be a Bench stdout/bench_full.json object (has "queries")
or a driver BENCH_r*.json wrapper (digs into "parsed" or regex-scavenges
"tail"). A claimed query missing from the artifact fails; a normalized
ratio outside [1/tol, tol] fails. If either probe's in-run drift_x
exceeds 1.5, mismatches are reported as WARN only — the artifact itself
says the box was drifting DURING the run, so it cannot convict a claim —
EXCEPT (round-10, verdict task 4) when the RAW ratio exceeds RAW_HARD
(2.0x) in either direction: a gap that large is a regression (or a stale
claim) no observed probe drift explains, so it fails even on a drifting
box. The drift escape hatch can no longer hide a real 2x+ regression.

Exit 0 = claims match the signal; exit 1 = a claim the signal contradicts.
"""
import json
import math
import re
import sys

# Raw-ratio bound that convicts regardless of probe drift: chosen above
# every honest raw ratio observed in r7-r9 artifacts (max 1.66 under the
# worst recorded mid-run drift) and below the smallest real regression
# the drift hatch previously waved through.
RAW_HARD = 2.0


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
            m = re.search(r'"%s":\{([^}]*)\}' % name, art["tail"])
            if not m:
                return None
            kv = dict(re.findall(r'"(\w+)":(-?[0-9.]+)', m.group(1)))
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


def main(artifact_path):
    queries, cal, shuf, shape = load_queries(artifact_path)
    floors = load_floors(artifact_path)
    doc = open("SCALE.md").read()
    m = re.search(
        r"<!-- BENCH_CLAIMS sf=([0-9.]+) tolerance=([0-9.]+)([^>]*)-->(.*?)<!-- /BENCH_CLAIMS -->",
        doc, re.S)
    if not m:
        print("SCALE.md has no BENCH_CLAIMS block — nothing to lint")
        return 0
    tol = float(m.group(2))
    attrs = dict(re.findall(r"(\w+)=([0-9.]+)", m.group(3)))
    claims = re.findall(r"\|\s*(q[0-9][\w]*)\s*\|\s*([0-9.]+)\s*\|", m.group(4))
    if not claims:
        print("BENCH_CLAIMS block present but empty — nothing to lint")
        return 0

    # box-speed normalization factor from the constant probes
    ratios = []
    cal_med, shuf_med = _cal_median(cal), _cal_median(shuf)
    if "cal_ref" in attrs and cal_med:
        ratios.append(cal_med / float(attrs["cal_ref"]))
    if "shufcal_ref" in attrs and shuf_med:
        ratios.append(shuf_med / float(attrs["shufcal_ref"]))
    factor = 1.0
    if ratios:
        factor = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
        # clamp tightened 4.0 -> 2.5 (round-8 advice): with tolerance 1.5
        # a 4.0 clamp let a real regression of up to 6x pass on a box
        # whose probes read slow; 2.5 bounds the worst pass-through at
        # 3.75x while still covering every probe factor observed so far
        # (0.54-2.6 across r7/r8 artifacts)
        factor = min(2.5, max(0.5, factor))

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
        # floor-aware adjudication: claims are pinned from A/B run floors,
        # so a floor the artifact itself recorded is the comparable wall
        if name in floors and 0 < floors[name] < actual:
            actual = floors[name]
        ratio = actual / (claimed * factor)
        if ratio > tol or ratio < 1.0 / tol:
            bad.append((name, claimed, actual))
            raw = actual / claimed
            if raw > RAW_HARD or raw < 1.0 / RAW_HARD:
                hard_bad.append(name)
    norm = (f" (box factor {factor:.2f} from probes"
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
    print(f"checked {len(claims) - len(unchecked)} bench claims against "
          f"{artifact_path}{norm}: "
          f"{len(claims) - len(unchecked) - len(bad)} within {tol}x"
          + (f", {len(bad)} flagged under drift" if bad else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "target/bench_full.json"))
