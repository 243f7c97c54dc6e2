"""Triage the reconstructed official suite against the Python core.

Runs every non-skipped case through the walker (the parity oracle) and
prints mismatches so each can be adjudicated: either the reconstruction
is wrong about the official expectation, the case needs an exception,
or it is a real engine bug.

Usage: python tools/triage_suite.py [draft7|draft2019-09] [file.json ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from valico_spark.compiler.pyvalidator import DRAFT7, DRAFT2019, Scope
from valico_spark.sources import official_suite
from valico_spark.sources.metaschema import DRAFT7_META

VERSIONS = {"draft7": DRAFT7, "draft2019-09": DRAFT2019}


def main() -> int:
    versions = [a for a in sys.argv[1:] if a in VERSIONS] or list(VERSIONS)
    only = {a for a in sys.argv[1:] if a.endswith(".json")}
    bad = 0
    for ver in versions:
        total = 0
        for row in official_suite.load(ver):
            fname, gdesc, schema, cdesc, data, valid = row
            if only and fname not in only:
                continue
            total += 1
            scope = Scope(version=VERSIONS[ver])
            try:
                # mod.rs compiles the draft-07 meta-schema into every
                # scope (both suites) before the group schema
                scope.compile(DRAFT7_META, ban_unknown=True)
                sid = scope.compile(schema)
                got = scope.validate(sid, data).is_valid()
            except Exception as exc:  # noqa: BLE001 — triage wants it all
                print(f"[ERR ] {ver} {fname} :: {gdesc} :: {cdesc}: "
                      f"{type(exc).__name__}: {exc}")
                bad += 1
                continue
            if got != valid:
                print(f"[FAIL] {ver} {fname} :: {gdesc} :: {cdesc}: "
                      f"expected {valid}, walker says {got}")
                bad += 1
        print(f"{ver}: {total} cases checked")
    print(f"{bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
