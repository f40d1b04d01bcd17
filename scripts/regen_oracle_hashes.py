#!/usr/bin/env python3
"""Regenerate tests/oracle_hashes.json from the current oracle_sql().

GRADE-WINDOW HYGIENE (the round-9 t03 lesson, codified in round 10):
an oracle string is half of a correctness comparison — editing it
silently re-defines what a past "green" meant.  The rotation invariant
therefore covers ORACLE-side edits: a changed oracle must be graded
the same round, exactly like changed engine code.

tests/test_entry_oracle.py::test_sitting_out_oracles_are_frozen pins
every sitting-out entry's oracle text to the hash recorded here, so an
oracle edit to a sitting-out query fails CI.  Run this script ONLY in
the same change that (a) edits a GRADED entry's oracle, or (b) adds /
removes contract entries — never to silence the freeze test for a
sit-out.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as em  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "oracle_hashes.json")


def oracle_hash(sql: str) -> str:
    return hashlib.sha256(sql.encode("utf-8")).hexdigest()[:16]


def main() -> None:
    hashes = {name: oracle_hash(sql) for name, sql in sorted(em.oracle_sql().items())}
    with open(OUT, "w") as f:
        json.dump(hashes, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(hashes)} oracle hashes to {os.path.normpath(OUT)}")


if __name__ == "__main__":
    main()
