"""Materialize the golden parquet fixtures (north_star: the reference's
error-path/error-code corpus "reproduced as golden parquet fixtures").

One row per conformance-corpus case with the FULL expected violation
rows (code, title, path, detail, states) as produced by the
reference-parity walker. The parquet is committed; tests regenerate
verdicts from source and diff against it, so any semantic drift in the
walker or either column compiler trips the gate.

Regenerate (only when corpus semantics intentionally change):
    python tools/make_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from valico_spark.compiler.pyvalidator import DRAFT2019, DRAFT7, Scope
from valico_spark.sources.conformance import corpus

VERSIONS = {"draft7": DRAFT7, "draft2019-09": DRAFT2019}
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "violation_rows.parquet")


def main() -> None:
    rows = []
    for group, version, schema_json, data_json, expected in corpus():
        scope = Scope(version=VERSIONS[version])
        sid = scope.compile(json.loads(schema_json))
        state = scope.validate(sid, json.loads(data_json))
        assert state.is_valid() == expected, (group, data_json)
        viols = sorted(
            ({"code": e.code, "title": e.title, "path": e.path,
              "detail": e.detail, "states": e.states}
             for e in state.errors),
            key=lambda v: (v["code"], v["path"], v["detail"] or "",
                           v["states"] or ""))
        rows.append({
            "grp": group, "version": version, "schema_json": schema_json,
            "data_json": data_json, "valid": state.is_valid(),
            "violations": viols,
        })
    viol_type = pa.list_(pa.struct([
        ("code", pa.string()), ("title", pa.string()),
        ("path", pa.string()), ("detail", pa.string()),
        ("states", pa.string())]))
    table = pa.table({
        "grp": pa.array([r["grp"] for r in rows], pa.string()),
        "version": pa.array([r["version"] for r in rows], pa.string()),
        "schema_json": pa.array([r["schema_json"] for r in rows],
                                pa.string()),
        "data_json": pa.array([r["data_json"] for r in rows], pa.string()),
        "valid": pa.array([r["valid"] for r in rows], pa.bool_()),
        "violations": pa.array([r["violations"] for r in rows], viol_type),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {len(rows)} golden rows -> {OUT}")


if __name__ == "__main__":
    main()
