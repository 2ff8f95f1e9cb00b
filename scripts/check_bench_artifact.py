#!/usr/bin/env python3
"""Refuse a mislabeled bench artifact (VERDICT r7 item 8).

bench.py OVERWRITES bench_full.json on every run, including quick
sf0.01 measurement runs — in round 7 one of those was nearly committed
as the round's sf0.1 artifact (its corpus-bound timings were ~4x too
fast). Run this before committing bench_full.json:

    python3 scripts/check_bench_artifact.py [--expect-sf 0.1]

Exits non-zero if the artifact's "sf" / "sf_dir" disagree with the
expected scale factor, if provenance fields are missing, or if the
"sf" field contradicts the "sf_dir" it claims to have read.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--expect-sf", default="0.1")
    ap.add_argument(
        "--path", default=os.path.join(REPO, "bench_full.json")
    )
    args = ap.parse_args()
    with open(args.path) as f:
        out = json.load(f)
    errs = []
    for field in ("generated_by", "run_id", "sf", "sf_dir", "cpus"):
        if field not in out:
            errs.append(f"missing provenance field {field!r}")
    sf_dir = str(out.get("sf_dir", ""))
    dir_sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    if str(out.get("sf")) != dir_sf:
        errs.append(
            f'"sf"={out.get("sf")!r} contradicts sf_dir={sf_dir!r}'
        )
    if str(out.get("sf")) != args.expect_sf:
        errs.append(
            f'artifact is sf={out.get("sf")!r}, expected sf={args.expect_sf}'
            " — this looks like a measurement run, not the round artifact"
        )
    # VERDICT r10 item 5: the driver records only a ~2000-char stdout
    # tail; the printed line must parse as JSON and leave real headroom
    # (<1,500 chars) so adding bench keys can never truncate the
    # recorded artifact again.
    line = out.get("stdout_line")
    if line is None:
        errs.append('missing "stdout_line" (bench.py records the printed line)')
    else:
        if len(line) >= 1500:
            errs.append(
                f"stdout line is {len(line)} chars — the driver tail "
                "cliff is ~2000 and the budget is <1500"
            )
        try:
            parsed = json.loads(line)
            for field in ("metric", "value", "unit", "sf", "queries"):
                if field not in parsed:
                    errs.append(f"stdout line missing {field!r}")
        except json.JSONDecodeError as exc:
            errs.append(f"stdout line is not valid JSON: {exc}")
    if errs:
        for e in errs:
            print(f"BENCH ARTIFACT REJECTED: {e}", file=sys.stderr)
        return 1
    print(
        f"bench artifact ok: sf={out['sf']} cpus={out['cpus']} "
        f"run_id={out['run_id']} value={out.get('value')}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
