"""Conformance fixture-table run (SURVEY.md §5 mirror).

Evaluates the whole corpus through the pure-Python core (fast, every
case) AND as ONE Spark job per draft via the Arrow fallback path — the
fixture-table execution style the reference's suite runner uses, lifted
to a DataFrame.
"""

import json

import pytest

from valico_spark.compiler.pyvalidator import DRAFT2019, DRAFT7, Scope
from valico_spark.sources.conformance import CASES, corpus

VERSIONS = {"draft7": DRAFT7, "draft2019-09": DRAFT2019}


def test_corpus_python_core():
    failures = []
    for group, version, schema, tests in CASES:
        scope = Scope(version=VERSIONS[version])
        sid = scope.compile(schema)
        for data, expected in tests:
            got = scope.validate(sid, data).is_valid()
            if got != expected:
                failures.append((group, version, data, expected, got))
    assert not failures, failures


@pytest.mark.parametrize("version", ["draft7", "draft2019-09"])
def test_corpus_spark_fixture_table(spark, version):
    """One mapInPandas job over the whole per-draft fixture table; each
    row re-compiles nothing (schema cache keyed per case on executors)."""
    rows = [r for r in corpus() if r[1] == version]
    df = spark.createDataFrame(
        rows, "grp string, ver string, schema_json string, "
              "data_json string, expected boolean")

    ver_num = VERSIONS[version]

    def run(batches):
        import pandas as pd
        scopes = {}
        for pdf in batches:
            got = []
            for sj, dj in zip(pdf["schema_json"], pdf["data_json"]):
                if sj not in scopes:
                    sc = Scope(version=ver_num)
                    scopes[sj] = (sc, sc.compile(json.loads(sj)))
                sc, sid = scopes[sj]
                got.append(sc.validate(sid, json.loads(dj)).is_valid())
            pdf = pdf.copy()
            pdf["got"] = got
            yield pdf

    out = df.repartition(4).mapInPandas(
        run, df.schema.simpleString()[7:-1] + ", got boolean").collect()
    bad = [(r["grp"], r["data_json"], r["expected"], r["got"])
           for r in out if r["expected"] != r["got"]]
    assert not bad, bad


GOLDEN_VIOLATIONS = [
    # (schema, data, [(code, title, path, detail-or-None)])
    ({"type": "integer"}, "x",
     [("wrong_type", "Type of the value is wrong", "",
       "The value must be integer")]),
    ({"properties": {"a": {"type": "integer"}}}, {"a": "x"},
     [("wrong_type", "Type of the value is wrong", "/a",
       "The value must be integer")]),
    ({"required": ["a", "b"]}, {},
     [("required", "This property is required", "/a", None),
      ("required", "This property is required", "/b", None)]),
    ({"properties": {"a": {}}, "additionalProperties": False},
     {"a": 1, "x": 2},
     [("properties", "Property conditions are not met", "",
       "Additional property 'x' is not allowed")]),
    ({"items": [{}], "additionalItems": False}, [1, 2],
     [("items", "Items condition is not met", "",
       "Additional items are not allowed")]),
    ({"exclusiveMaximum": 5}, 5,
     [("maximum", "Maximum condition is not met", "", None)]),
    ({"enum": ["a"]}, "b",
     [("enum", "Enum conditions are not met", "", None)]),
    ({"contains": {"minimum": 5}, "minContains": 2}, [5, 1],
     [("min_contains/max_contains", "Contains minimum/maximum is not met",
       "", None)]),
    ({"format": "date"}, "nope",
     [("format", "Format is wrong", "", "Malformed date")]),
    ({"propertyNames": {"maxLength": 1}}, {"ab": 1},
     [("max_length", "MaxLength condition is not met", "/[ab]", None)]),
]


@pytest.mark.parametrize("version", [DRAFT2019])
def test_golden_violation_rows(version):
    for schema, data, expected in GOLDEN_VIOLATIONS:
        scope = Scope(version=version)
        sid = scope.compile(schema)
        state = scope.validate(sid, data)
        got = sorted((e.code, e.title, e.path, e.detail)
                     for e in state.errors)
        assert got == sorted(expected), (schema, data, got)
