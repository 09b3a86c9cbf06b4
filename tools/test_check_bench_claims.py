#!/usr/bin/env python
"""Synthetic-artifact tests for check_bench_claims.py (round-10 verdict
task 4): pins the lint's four regimes — in-band pass, out-of-band fail,
the drift WARN escape for modest raw gaps, and the new RAW_HARD gate that
fails a 2x+ raw regression even on a drifting box.

Run from the repo root:  python tools/test_check_bench_claims.py
Exit 0 = all cases behave; exit 1 = the lint regressed.
"""
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LINT = os.path.join(REPO, "tools", "check_bench_claims.py")

SCALE_TMPL = """# SCALE (synthetic)
<!-- BENCH_CLAIMS sf=0.1 tolerance=1.5 cal_ref=1.0 shufcal_ref=1.0 -->
| query | claimed_sec |
|---|---|
| q01_test | 10.0 |
<!-- /BENCH_CLAIMS -->
"""


def run_case(name, actual, drift, expect_exit, expect_substr=None,
             floor=None, probes=None):
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "SCALE.md"), "w") as f:
            f.write(SCALE_TMPL)
        # default probes read exactly the reference medians -> factor 1.0,
        # so the normalized ratio IS the raw ratio and each case isolates
        # one gate; pass probes=(start, mid, end) to exercise the
        # per-position band
        s, m, e = probes if probes else (1.0, 1.0, 1.0)
        art = {
            "queries": {"q01_test": actual},
            "calibration": {"start": s, "mid": m, "end": e,
                            "drift_x": drift},
            "shuffle_cal": {"start": s, "mid": m, "end": e,
                            "drift_x": drift},
        }
        if floor is not None:
            art["qfloor"] = {"~q01_test": floor}
        apath = os.path.join(d, "bench.json")
        with open(apath, "w") as f:
            json.dump(art, f)
        p = subprocess.run([sys.executable, LINT, apath], cwd=d,
                           capture_output=True, text=True)
        out = p.stdout + p.stderr
        ok = p.returncode == expect_exit and \
            (expect_substr is None or expect_substr in out)
        status = "ok  " if ok else "FAIL"
        print(f"{status} {name}: exit {p.returncode} (want {expect_exit})")
        if not ok:
            print("  --- lint output ---")
            print("  " + out.replace("\n", "\n  "))
        return ok


def run_grid_case(name, actual, cal_points, expect_exit):
    """Round-13 probe grid: a phase recorded at a mid-grid point (invisible
    to start/mid/end) must widen the band; a gap past even the slowest
    grid point must still fail."""
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "SCALE.md"), "w") as f:
            f.write(SCALE_TMPL)
        art = {
            "queries": {"q01_test": actual},
            "calibration": {"start": cal_points[0],
                            "mid": cal_points[len(cal_points) // 2],
                            "end": cal_points[-1], "drift_x": 1.0},
            "shuffle_cal": {"start": cal_points[0],
                            "mid": cal_points[len(cal_points) // 2],
                            "end": cal_points[-1], "drift_x": 1.0},
            "cal_points": cal_points,
            "shuf_points": cal_points,
        }
        apath = os.path.join(d, "bench.json")
        with open(apath, "w") as f:
            json.dump(art, f)
        p = subprocess.run([sys.executable, LINT, apath], cwd=d,
                           capture_output=True, text=True)
        ok = p.returncode == expect_exit
        status = "ok  " if ok else "FAIL"
        print(f"{status} {name}: exit {p.returncode} (want {expect_exit})")
        if not ok:
            print("  " + (p.stdout + p.stderr).replace("\n", "\n  "))
        return ok


def run_coverage_case(name, extra_doc, expect_exit, volatile=None,
                      expect_substr=None):
    """Round-13 ratchet: artifact carries the full query map + volatile
    list; q01_test is pinned, q02_new is not — its fate depends on the
    BENCH_UNPINNED block in extra_doc."""
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "SCALE.md"), "w") as f:
            f.write(SCALE_TMPL + extra_doc)
        art = {
            "queries": {"q01_test": 10.0, "q02_new": 5.0},
            "volatile": volatile or [],
            "calibration": {"start": 1.0, "mid": 1.0, "end": 1.0,
                            "drift_x": 1.0},
            "shuffle_cal": {"start": 1.0, "mid": 1.0, "end": 1.0,
                            "drift_x": 1.0},
        }
        apath = os.path.join(d, "bench.json")
        with open(apath, "w") as f:
            json.dump(art, f)
        p = subprocess.run([sys.executable, LINT, apath], cwd=d,
                           capture_output=True, text=True)
        out = p.stdout + p.stderr
        ok = p.returncode == expect_exit and \
            (expect_substr is None or expect_substr in out)
        status = "ok  " if ok else "FAIL"
        print(f"{status} {name}: exit {p.returncode} (want {expect_exit})")
        if not ok:
            print("  --- lint output ---")
            print("  " + out.replace("\n", "\n  "))
        return ok


UNPINNED_TMPL = """
<!-- BENCH_UNPINNED round=13 -->
| query | round_added | reason |
|---|---|---|
| q02_new | %d | synthetic |
<!-- /BENCH_UNPINNED -->
"""


def run_tail_case(name, tail, expect_exit, expect_substr=None):
    """Round-14: a driver wrapper whose run was KILLED mid-suite — no
    final compact line, only Bench's streamed per-query / probe-grid
    records in the 2000-char tail. The scavenge must still adjudicate."""
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "SCALE.md"), "w") as f:
            f.write(SCALE_TMPL)
        apath = os.path.join(d, "bench.json")
        with open(apath, "w") as f:
            json.dump({"n": 14, "rc": 124, "tail": tail}, f)
        p = subprocess.run([sys.executable, LINT, apath], cwd=d,
                           capture_output=True, text=True)
        out = p.stdout + p.stderr
        ok = p.returncode == expect_exit and \
            (expect_substr is None or expect_substr in out)
        status = "ok  " if ok else "FAIL"
        print(f"{status} {name}: exit {p.returncode} (want {expect_exit})")
        if not ok:
            print("  --- lint output ---")
            print("  " + out.replace("\n", "\n  "))
        return ok


# what a timed-out round-14 driver tail looks like: stage markers gone
# off the top, a cumulative probe-grid line, then per-query streamed
# records (one truncated at the front, as the 2000-char window cuts
# mid-line), no final compact line
STREAMED_TAIL_IN_BAND = (
    '_other":0.4\n'
    '{"cal_pts":[1.00,1.05],"shuf_pts":[1.00,1.10],"done":24,'
    '"gauges":{"ann_recall_at10":0.813}}\n'
    '{"q01_test":11.000,"~q01_test":10.400}\n'
    '{"q09_other":0.512}\n')
STREAMED_TAIL_REGRESSED = (
    '{"cal_pts":[1.00,1.05],"shuf_pts":[1.00,1.10],"done":24,'
    '"gauges":{"ann_recall_at10":0.813}}\n'
    '{"q01_test":25.000}\n')


def run_doc_case(name, doc, expect_exit, expect_substr=None):
    """Round-15 (verdict task 1): a damaged BENCH_CLAIMS block — the
    opening marker deleted but the close marker / pin table left behind
    (the 70f29c5 failure) — must FAIL loudly, never no-op to exit 0.
    A doc with genuinely no block still no-ops."""
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "SCALE.md"), "w") as f:
            f.write(doc)
        art = {
            "queries": {"q01_test": 10.0},
            "calibration": {"start": 1.0, "mid": 1.0, "end": 1.0,
                            "drift_x": 1.0},
            "shuffle_cal": {"start": 1.0, "mid": 1.0, "end": 1.0,
                            "drift_x": 1.0},
        }
        apath = os.path.join(d, "bench.json")
        with open(apath, "w") as f:
            json.dump(art, f)
        p = subprocess.run([sys.executable, LINT, apath], cwd=d,
                           capture_output=True, text=True)
        out = p.stdout + p.stderr
        ok = p.returncode == expect_exit and \
            (expect_substr is None or expect_substr in out)
        status = "ok  " if ok else "FAIL"
        print(f"{status} {name}: exit {p.returncode} (want {expect_exit})")
        if not ok:
            print("  --- lint output ---")
            print("  " + out.replace("\n", "\n  "))
        return ok


def main():
    results = [
        # claim 10.0s, artifact 11.0s, calm box: within 1.5x -> pass
        run_case("in-band, no drift", 11.0, 1.0, 0),
        # artifact 18.0s (1.8x), calm box: normalized check convicts
        run_case("out-of-band, no drift", 18.0, 1.0, 1, "FAIL"),
        # artifact 16.0s (1.6x) but the box drifted 1.7x mid-run: the
        # artifact cannot convict -> WARN, exit 0 (the q99 regime)
        run_case("modest gap under drift -> WARN", 16.0, 1.7, 0, "WARN"),
        # artifact 25.0s (2.5x raw) on the same drifting box: past
        # RAW_HARD, drift is no alibi -> exit 1 (the round-10 gate)
        run_case("2x+ raw gap under drift -> still FAIL", 25.0, 1.7, 1,
                 "hard bound"),
        # artifact errored (negative sentinel) under drift: hard fail
        run_case("errored query under drift -> FAIL", -1.0, 1.7, 1),
        # round-11: median 25.0s (2.5x raw) but the run's own floor
        # (min-of-reps) reads 10.5s -> one noisy rep inflated the
        # median; the floor-aware check passes
        run_case("noisy median, in-band floor -> pass", 25.0, 1.0, 0,
                 floor=10.5),
        # floor present but ALSO out of band (real regression): fail
        run_case("out-of-band floor -> still FAIL", 30.0, 1.0, 1, "FAIL",
                 floor=22.0),
        # round-12 (verdict task 1): the box drifted 1.4x mid-run
        # (below the WARN hatch) and the query read 16.5s — 1.65x the
        # run-START speed but within 1.5x of the MID/END speed the
        # probes recorded; the per-position band passes it (the r11
        # q155/q156/q165 regime)
        run_case("mid-run slowdown inside the probe band -> pass",
                 16.5, 1.4, 0, probes=(1.0, 1.4, 1.4)),
        # same probes, 25.0s (2.5x raw, outside even the end-position
        # band's 1.5x): still convicted
        run_case("gap past the probe band -> FAIL", 25.0, 1.4, 1, "FAIL",
                 probes=(1.0, 1.4, 1.4)),
        # round-12 advice: an in-band floor (one fast rep) no longer
        # exempts a median past MED_HARD (4x) — the sometimes-slow
        # regression regime
        run_case("4x+ median with an in-band floor -> FAIL", 45.0, 1.0, 1,
                 "FAIL", floor=10.5),
        # round-13 coverage ratchet: a timed entry with neither a pin nor
        # an UNPINNED declaration fails on a full-shape artifact (the
        # r12 q52f/q182 hole)
        run_coverage_case("unpinned entry, no declaration -> FAIL",
                          "", 1, expect_substr="escape adjudication"),
        # declared UNPINNED this round: one round of grace
        run_coverage_case("UNPINNED declared this round -> pass",
                          UNPINNED_TMPL % 13, 0),
        # declared in the previous round: still inside grace
        run_coverage_case("UNPINNED one round old -> pass (grace)",
                          UNPINNED_TMPL % 12, 0),
        # two rounds old: grace expired
        run_coverage_case("UNPINNED two rounds old -> FAIL",
                          UNPINNED_TMPL % 11, 1, expect_substr="grace"),
        # volatile entries are exempt by design (fit walls breathe)
        run_coverage_case("volatile entry -> exempt",
                          "", 0, volatile=["q02_new"]),
        # round-13 probe grid: a 1.9x phase recorded ONLY at a mid-grid
        # point (start/mid/end all read 1.0 — the r13 leg-C blind spot)
        # widens the band and the 18s reading (1.8x) passes
        run_grid_case("mid-grid phase widens the band -> pass",
                      18.0, [1.0, 1.0, 1.9, 1.0, 1.0], 0),
        # the same grid cannot excuse a gap past its slowest point x tol
        run_grid_case("gap past the whole grid -> FAIL",
                      30.0, [1.0, 1.0, 1.9, 1.0, 1.0], 1),
        # round-14: a mid-suite kill leaves only streamed records in the
        # tail — the claim adjudicates from them (floor 10.4 in band,
        # probe grid scavenged from the cumulative line)
        run_tail_case("killed run, streamed records in band -> pass",
                      STREAMED_TAIL_IN_BAND, 0),
        # same kill shape, but the streamed wall reads 2.5x: convicted
        # from the partial tail alone (the signal BENCH_r13.json lacked)
        run_tail_case("killed run, streamed regression -> FAIL",
                      STREAMED_TAIL_REGRESSED, 1, "FAIL"),
        # round-15 (verdict task 1): the 70f29c5 failure mode — opening
        # marker deleted, close marker + table body left behind. The lint
        # must refuse to no-op.
        run_doc_case("orphaned close marker -> FAIL",
                     SCALE_TMPL.replace(
                         "<!-- BENCH_CLAIMS sf=0.1 tolerance=1.5 "
                         "cal_ref=1.0 shufcal_ref=1.0 -->\n", ""),
                     1, "damaged"),
        # pin-table header present without either marker: also damaged
        run_doc_case("headless pin table -> FAIL",
                     "# SCALE\n| query | claimed_sec |\n|---|---|\n"
                     "| q01_test | 10.0 |\n", 1, "damaged"),
        # genuinely no block at all: the no-op path survives
        run_doc_case("no block at all -> no-op pass",
                     "# SCALE\nno pins yet\n", 0, "nothing to lint"),
    ]
    if all(results):
        print(f"all {len(results)} lint cases behave")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
