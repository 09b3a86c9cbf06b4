#!/usr/bin/env python
"""Claims-vs-CORRECTNESS lint (SURVEY round checklist item 2): every
`oracle qNN` claim in SURVEY.md must be backed by a green row in the given
CORRECTNESS artifact (or the local check_oracle run), and every query the
engine declares must have some artifact row at all. Usage:

    python tools/check_claims.py CORRECTNESS_r05.json
    python tools/check_claims.py <any file with {"qNN_name": {...}} rows>

Exit 0 = no drift; exit 1 = a doc claim the driver's signal contradicts.
"""
import json
import re
import sys


def main(artifact_path):
    art = json.load(open(artifact_path))
    green = set()
    red = set()
    for name, row in art.items():
        m = re.match(r"(q\d+)", name)
        if not m:
            continue
        ok = bool(row.get("rows_match")) and bool(row.get("schema_match")) \
            and bool(row.get("hash_match")) and not row.get("err")
        (green if ok else red).add(m.group(1))

    survey = open("SURVEY.md").read()
    claimed = set(re.findall(r"oracle (q\d+)", survey))

    bad = sorted(claimed - green)
    unknown = sorted(c for c in bad if c not in red)
    failed = sorted(c for c in bad if c in red)
    # inverse direction: a query the driver verified green that SURVEY
    # never mentions — new operators must not land undocumented.
    # SURVEY cites both single queries (q32) and ranges (q31-q35).
    mentioned = set()
    for a, b in re.findall(r"\bq(\d+)-q(\d+)", survey):
        mentioned.update(f"q{n:02d}" for n in range(int(a), int(b) + 1))
    undocumented = sorted(q for q in green | red
                          if q not in mentioned
                          and not re.search(rf"\b{q}(?![0-9])", survey))

    if failed:
        print("OVERCLAIM: SURVEY.md says 'oracle qNN' but the artifact is RED:")
        for q in failed:
            print(f"  {q}")
    if unknown:
        print("UNKNOWN: SURVEY.md claims these but the artifact has no row "
              "(renamed? never shipped?):")
        for q in unknown:
            print(f"  {q}")
    if undocumented:
        print("UNDOCUMENTED: the driver artifact has these rows but SURVEY.md "
              "never mentions them (add a §8 row):")
        for q in undocumented:
            print(f"  {q}")
    if not bad and not undocumented:
        print(f"ok: {len(claimed)} SURVEY oracle claims all green in "
              f"{artifact_path} ({len(green)} green rows, all documented)")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
