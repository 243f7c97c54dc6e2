"""DSL over DataFrames: the Arrow path (full semantics incl. mutation)
and the typed cast stage."""

import json

from pyspark.sql import functions as F

from valico_spark.operators.dsl_process import (
    coerce_columns, process_json_column,
)


class TestProcessJsonColumn:
    def test_coercion_and_defaults(self, spark):
        def _build(p):
            # defined inline so cloudpickle ships it by value (the tests
            # package is not importable on executors)
            from valico_spark.compiler import dsl

            p.req_typed("a", dsl.i64())
            p.opt_typed("b", dsl.boolean())
            p.opt("c", lambda q: q.default_(7))

        df = spark.createDataFrame(
            [(1, '{"a": "5", "b": "true"}'),
             (2, '{"a": 1.9}'),
             (3, '{"b": "true"}'),
             (4, '{"a": "oops"}')],
            ["id", "doc"])
        out = {r["id"]: r for r in
               process_json_column(df, "doc", _build).collect()}
        assert json.loads(out[1]["processed"]) == {"a": 5, "b": True,
                                                   "c": 7}
        assert json.loads(out[2]["processed"]) == {"a": 1, "c": 7}
        assert not out[3]["valid"]
        assert [v["code"] for v in out[3]["violations"]] == ["required"]
        assert not out[4]["valid"]
        assert [v["code"] for v in out[4]["violations"]] == ["wrong_type"]
        assert out[4]["violations"][0]["path"] == "/a"


class TestCoerceColumns:
    def test_typed_cast_stage_matches_walker_semantics(self, spark):
        from valico_spark.compiler import dsl as d

        rows = [("1", "true", ""), ("+42", "false", None),
                ("1.5", "TRUE", "x"), ("nope", "1", "")]
        df = spark.createDataFrame(rows, ["i", "b", "n"])
        out = coerce_columns(df, {"i": "i64", "b": "boolean", "n": "null"})
        got = out.select("i", "b", "n", "coerce_violations").collect()

        for (si, sb, sn), row in zip(rows, got):
            # walker expectations
            def walk(coercer, v):
                if v is None:
                    return None, False
                try:
                    r = coercer.coerce(v, "/x")
                    if r is d.NULL_SENTINEL:
                        return None, False
                    return (v if r is None else r), False
                except d.CoerceError:
                    return None, True
            ei, fi = walk(d.i64(), si)
            eb, fb = walk(d.boolean(), sb)
            en, fn = walk(d.null(), sn)
            assert row["i"] == ei, (si, row["i"], ei)
            assert row["b"] == eb, (sb, row["b"], eb)
            assert row["n"] == en
            n_fail = sum([fi, fb, fn])
            assert len(row["coerce_violations"]) == n_fail, (
                rows, row["coerce_violations"])

    def test_violation_shape(self, spark):
        df = spark.createDataFrame([("zz",)], ["i"])
        out = coerce_columns(df, {"i": "i64"}).collect()[0]
        v = out["coerce_violations"][0]
        assert v["code"] == "wrong_type"
        assert v["title"] == "Type of the value is wrong"
        assert v["path"] == "/i"
        assert "i64" in v["detail"]


class TestSchemaBuilder:
    def test_builder_produces_canonical_ruleset(self):
        from valico_spark.compiler.builder import schema
        from valico_spark.compiler.pyvalidator import validate_json

        ruleset = schema(lambda s: (
            s.object(),
            s.required(["doc_id"]),
            s.properties(lambda p: (
                p.insert("doc_id", lambda d: (d.string(),
                                              d.pattern("^p[0-9]+$"))),
                p.insert("n", lambda d: (d.integer(), d.minimum(0))),
            )),
        ))
        assert ruleset == {
            "type": "object", "required": ["doc_id"],
            "properties": {
                "doc_id": {"type": "string", "pattern": "^p[0-9]+$"},
                "n": {"type": "integer", "minimum": 0}}}
        assert validate_json(ruleset, {"doc_id": "p1", "n": 2}).is_valid()
        assert not validate_json(ruleset, {"n": -1}).is_valid()


class TestEncodedArrayTyped:
    def test_encoded_array_i64(self, spark):
        from valico_spark.operators.dsl_process import coerce_columns

        df = spark.createDataFrame(
            [("1,2,3",), ("4,x,6",), (None,), ("",)], "xs string")
        out = coerce_columns(df, {"xs": ("encoded_array", ",", "i64")})
        rows = out.collect()
        by = {tuple(r["xs"]) if r["xs"] is not None else None:
              r["coerce_violations"] for r in rows}
        assert (1, 2, 3) in by and not by[(1, 2, 3)]
        assert (4, None, 6) in by
        v = by[(4, None, 6)]
        assert len(v) == 1 and v[0]["code"] == "wrong_type"
        assert v[0]["path"] == "/xs/1"
        assert None in by and not by[None]  # NULL input passes through

    def test_encoded_array_matches_walker_paths(self, spark):
        """Per-element error paths match the reference's
        {path}/{idx} contract (dsl coercers.rs:292-302)."""
        from valico_spark.compiler import dsl
        from valico_spark.operators.dsl_process import coerce_columns

        coercer = dsl.encoded_array_of(",", dsl.i64())
        try:
            coercer.coerce("4,x,6", "/xs")
            raise AssertionError("walker should have raised")
        except dsl.CoerceError as e:
            walker_paths = [v.path for v in e.errors]
        df = spark.createDataFrame([("4,x,6",)], "xs string")
        out = coerce_columns(df, {"xs": ("encoded_array", ",", "i64")})
        got_paths = [v["path"]
                     for v in out.collect()[0]["coerce_violations"]]
        assert got_paths == walker_paths
