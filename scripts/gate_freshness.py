"""Per-query driver-verification freshness: parse every committed
CORRECTNESS_r{N}.json and report, for each registry query, the latest
round the driver checked it and with what result.  This is the input
the gate ordering in plans/registry.py should be rebuilt from each
round: never-checked and oldest-checked queries belong in the prime
slots (the r06 verdict's item #1 was exactly this rotation slipping).

Usage:
    python scripts/gate_freshness.py            # full table
    python scripts/gate_freshness.py --stale 2  # older than 2 rounds back
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_history(repo: str) -> tuple[dict[str, tuple[int, str]], int]:
    """{query: (last_round, status)} and the latest round seen.

    status: 'green' (rows+schema+hash ok), 'rows_only' (no_oracle),
    'FAIL' (any mismatch recorded in its latest check).
    """
    latest: dict[str, tuple[int, str]] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                status = "rows_only"
            elif (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                status = "green"
            else:
                status = "FAIL"
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, status)
    return latest, max_round


def main() -> None:
    stale_cut = None
    if "--stale" in sys.argv:
        stale_cut = int(sys.argv[sys.argv.index("--stale") + 1])

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest, max_round = load_history(repo)

    import __spark_entry__ as entrymod

    qs = list(entrymod.queries())
    oracled = set(entrymod.oracle_sql())

    # implementation drift vs the committed snapshot (r07 ADVICE): a
    # query whose code changed after its last driver check is
    # effectively UNVERIFIED whatever its last-check round says — sort
    # those first so they land in the prime gate slots.
    changed: set[str] = set()
    suspect: dict[str, str] = {}  # name -> NEW / UNHASHABLE
    try:
        from impl_snapshot import SNAPSHOT, fingerprints

        snap = json.load(open(SNAPSHOT))
        cur = fingerprints()
        for n, v in cur.items():
            # snapshot-missing and 'unhashable' fingerprints are NOT
            # "unchanged" (r08 ADVICE): a new query, or one whose
            # source became un-inspectable, has no verified snapshot —
            # flag it into the prime slots explicitly
            if n not in snap:
                suspect[n] = "NEW"
            elif v == "unhashable":
                suspect[n] = "UNHASHABLE"
            elif snap[n] != v:
                changed.add(n)
    except Exception:
        pass

    rows = []
    for name in qs:
        rnd, status = latest.get(name, (0, "NEVER"))
        eff = 0 if (name in changed or name in suspect) else rnd
        rows.append((eff, rnd, name, status, name in oracled))
    rows.sort()

    shown = 0
    for eff, rnd, name, status, has_oracle in rows:
        if stale_cut is not None and eff > max_round - stale_cut:
            continue
        tag = "oracled" if has_oracle else "rows-only-decl"
        drift = (
            "  CHANGED-since-snapshot"
            if name in changed
            else f"  {suspect[name]}-fingerprint" if name in suspect else ""
        )
        print(f"r{rnd:02d}  {status:9s}  {tag:14s}  {name}{drift}")
        shown += 1
    print(
        f"# {shown} shown / {len(qs)} queries; latest driver round r{max_round}",
        file=sys.stderr,
    )
    fails = [n for _, r, n, s, _ in rows if s == "FAIL"]
    if fails:
        print(f"# FAILING latest check: {fails}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
