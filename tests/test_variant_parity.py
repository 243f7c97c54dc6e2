"""Variant (dynamic-JSON) column compiler vs reference-parity walker.

Same core property as test_column_parity, for the VARIANT plan: the
vectorized JVM expression over ``parse_json`` must agree with the Python
walker document-by-document — same verdicts, same (code, path, detail)
multisets — across a seeded fuzz corpus of schemas and documents that
exercises runtime type dispatch (the part typed columns can't reach:
per-row type surprises, JSON null vs missing, mixed arrays)."""

import json
import random

import pytest
from pyspark.sql import functions as F

from valico_spark.compiler.columns import UnsupportedRule
from valico_spark.compiler.pyvalidator import Scope
from valico_spark.operators.validate import validate_json_column


def _oracle(docs, ruleset):
    scope = Scope()
    sid = scope.compile(ruleset)
    out = []
    for doc in docs:
        state = scope.validate(sid, None if doc is None else json.loads(doc))
        out.append((state.is_valid(),
                    sorted((e.code, e.path, e.detail or "", e.states or "")
                           for e in state.errors)))
    return out


def _check(spark, docs, ruleset, force=True):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               "i long, j string")
    v = validate_json_column(df, "j", ruleset,
                             mode="variant" if force else "auto")
    got = v.orderBy("i").collect()
    exp = _oracle(docs, ruleset)
    for row, (exp_valid, exp_errs) in zip(got, exp):
        got_errs = sorted((e["code"], e["path"], e["detail"] or "",
                           e["states"] or "")
                          for e in row["violations"])
        assert row["valid"] == exp_valid, \
            f"verdict mismatch: {docs[row['i']]!r}\n got {got_errs}\n exp {exp_errs}"
        assert got_errs == exp_errs, \
            f"violations mismatch: {docs[row['i']]!r}\n got {got_errs}\n exp {exp_errs}"


MIXED_DOCS = [
    None, "null", "5", "5.0", "5.5", '"abc"', "true", "[]", "{}",
    '{"k": 5}', '{"k": 5.0}', '{"k": 5.5}', '{"k": "x"}', '{"k": null}',
    '{"k": true}', '{"k": [1, 2]}', '{"k": {"a": 1}}',
    '{"k": 101, "extra": 1}', '{"k": -3}', '{"k": 0}', '{"k": 100}',
    '{"other": "y"}', '{"k": 1e2}', '{"k": 2.000001}',
]


class TestEventsShape:
    RULESET = {"type": "object", "required": ["k"],
               "properties": {"k": {"type": "integer",
                                    "minimum": 0, "maximum": 100}}}

    def test_parity(self, spark):
        _check(spark, MIXED_DOCS, self.RULESET)


class TestKeywords:
    def test_string_keywords(self, spark):
        rs = {"properties": {"s": {"type": "string", "minLength": 2,
                                   "maxLength": 4, "pattern": "^a"}}}
        docs = ['{"s": "a"}', '{"s": "ab"}', '{"s": "abcde"}',
                '{"s": "xbc"}', '{"s": 5}', '{"s": null}', '{}',
                '{"s": "aé☃"}']
        _check(spark, docs, rs)

    def test_enum_const(self, spark):
        rs = {"properties": {"e": {"enum": ["a", 1, 2.5, True, None]},
                             "c": {"const": 3}}}
        docs = ['{"e": "a"}', '{"e": 1}', '{"e": 1.0}', '{"e": 2.5}',
                '{"e": true}', '{"e": false}', '{"e": null}', '{"e": "b"}',
                '{"c": 3}', '{"c": 3.0}', '{"c": 4}', '{"c": "3"}']
        _check(spark, docs, rs)

    def test_numeric_keywords(self, spark):
        rs = {"properties": {"n": {"exclusiveMinimum": 0,
                                   "exclusiveMaximum": 10,
                                   "multipleOf": 0.5}}}
        docs = ['{"n": 0}', '{"n": 0.5}', '{"n": 5}', '{"n": 9.5}',
                '{"n": 10}', '{"n": 3.3}', '{"n": "x"}', '{"n": 2}']
        _check(spark, docs, rs)

    def test_object_shape(self, spark):
        rs = {"type": "object", "required": ["a"],
              "minProperties": 1, "maxProperties": 3,
              "properties": {"a": {"type": "number"}},
              "patternProperties": {"^x_": {"type": "string"}},
              "additionalProperties": False}
        docs = ['{}', '{"a": 1}', '{"a": "s"}', '{"a": 1, "x_b": "ok"}',
                '{"a": 1, "x_b": 2}', '{"a": 1, "zz": 1}',
                '{"a": 1, "b": 2, "c": 3, "d": 4}', '[1]', '"s"']
        _check(spark, docs, rs)

    def test_additional_properties_schema(self, spark):
        rs = {"properties": {"a": {"type": "integer"}},
              "additionalProperties": {"type": "string"}}
        docs = ['{"a": 1, "b": "ok"}', '{"a": 1, "b": 2}',
                '{"b": "x", "c": []}', '{}']
        _check(spark, docs, rs)

    def test_arrays(self, spark):
        rs = {"properties": {"xs": {
            "type": "array", "minItems": 1, "maxItems": 4,
            "items": {"type": "integer", "minimum": 0},
            "contains": {"type": "integer", "minimum": 5}}}}
        docs = ['{"xs": []}', '{"xs": [1]}', '{"xs": [5]}',
                '{"xs": [1, 2, 3, 4, 5]}', '{"xs": [1, "a"]}',
                '{"xs": [-1, 7]}', '{"xs": 3}', '{"xs": [1.0, 6.0]}']
        _check(spark, docs, rs)

    def test_positional_items(self, spark):
        rs = {"properties": {"t": {
            "items": [{"type": "string"}, {"type": "integer"}],
            "additionalItems": False}}}
        docs = ['{"t": ["a", 1]}', '{"t": ["a"]}', '{"t": [1, "a"]}',
                '{"t": ["a", 1, 2]}', '{"t": []}']
        _check(spark, docs, rs)

    def test_combinators(self, spark):
        rs = {"properties": {"v": {
            "anyOf": [{"type": "integer"}, {"type": "string",
                                            "minLength": 3}],
            "not": {"const": 13}}},
            "if": {"required": ["v"]},
            "then": {"required": ["w"]}}
        docs = ['{"v": 5, "w": 1}', '{"v": 5}', '{"v": "abc", "w": 1}',
                '{"v": "ab", "w": 1}', '{"v": 13, "w": 1}',
                '{"v": 2.5, "w": 1}', '{}']
        _check(spark, docs, rs)

    def test_one_of_and_ref(self, spark):
        rs = {"definitions": {"pos": {"type": "number",
                                      "exclusiveMinimum": 0}},
              "properties": {"p": {"$ref": "#/definitions/pos"},
                             "q": {"oneOf": [{"type": "integer"},
                                             {"minimum": 10}]}}}
        docs = ['{"p": 1}', '{"p": -1}', '{"p": "x"}',
                '{"q": 5}', '{"q": 10.5}', '{"q": 12}', '{"q": 9.5}']
        _check(spark, docs, rs)

    def test_nested_states_byte_parity(self, spark):
        """any_of containing one_of: the nested states payload (a JSON
        string embedded inside the outer states) must be byte-equal
        between walker and column plan at every nesting depth."""
        rs = {"properties": {"v": {
            "anyOf": [{"type": "string"},
                      {"oneOf": [{"type": "integer", "minimum": 10},
                                 {"type": "number", "maximum": 1}]}]}}}
        docs = ['{"v": "ok"}', '{"v": 5}', '{"v": 0.5}', '{"v": 15}',
                '{"v": true}', '{"v": 0}', '{"v": [1]}']
        _check(spark, docs, rs)

    def test_dependencies(self, spark):
        rs = {"dependencies": {"a": ["b"],
                               "c": {"required": ["d"]}}}
        docs = ['{}', '{"a": 1}', '{"a": 1, "b": 1}', '{"c": 1}',
                '{"c": 1, "d": 1}', '{"b": 1}']
        _check(spark, docs, rs)


class TestUnsupportedFallsBack:
    def test_unique_items_raises_then_auto_falls_back(self, spark):
        rs = {"properties": {"xs": {"uniqueItems": True}}}
        df = spark.createDataFrame([('{"xs": [1, 1]}',)], "j string")
        with pytest.raises(UnsupportedRule):
            validate_json_column(df, "j", rs, mode="variant")
        out = validate_json_column(df, "j", rs, mode="auto").collect()
        assert out[0]["valid"] is False


def _rand_doc(rnd: random.Random):
    def val(depth=0):
        kinds = ["int", "float", "str", "bool", "null"]
        if depth < 2:
            kinds += ["obj", "arr"]
        k = rnd.choice(kinds)
        if k == "int":
            return rnd.randint(-20, 120)
        if k == "float":
            return round(rnd.uniform(-5, 110), rnd.randint(0, 2))
        if k == "str":
            return "".join(rnd.choice("abxyz_ ") for _ in
                           range(rnd.randint(0, 6)))
        if k == "bool":
            return rnd.random() < 0.5
        if k == "null":
            return None
        if k == "arr":
            return [val(depth + 1) for _ in range(rnd.randint(0, 4))]
        return {kk: val(depth + 1)
                for kk in rnd.sample(["k", "s", "n", "x_a", "zz"],
                                     rnd.randint(0, 4))}
    return json.dumps(val())


FUZZ_RULESET = {
    "type": "object",
    "required": ["k"],
    "properties": {
        "k": {"type": ["integer", "string"], "minimum": 0, "maximum": 100,
              "minLength": 1, "maxLength": 5},
        "s": {"anyOf": [{"type": "string", "pattern": "a"},
                        {"type": "number", "multipleOf": 2}]},
        "n": {"type": "number", "exclusiveMaximum": 50},
    },
    "patternProperties": {"^x_": {"type": ["array", "null"],
                                  "items": {"type": "integer"},
                                  "maxItems": 3}},
    "additionalProperties": {"type": ["object", "boolean"],
                             "minProperties": 1},
}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_variant_vs_walker(spark, seed):
    rnd = random.Random(seed)
    docs = [_rand_doc(rnd) for _ in range(300)]
    _check(spark, docs, FUZZ_RULESET)


FUZZ_UNIQUE_RULESET = {
    "type": "object",
    "properties": {
        "k": {"uniqueItems": True, "maxItems": 4},
        "s": {"type": ["array", "integer"], "uniqueItems": True},
    },
    "patternProperties": {"^x_": {"uniqueItems": True,
                                  "minItems": 1}},
}


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_fuzz_unique_items_variant_vs_walker(spark, seed):
    """Random docs (scalar AND composite array elements) through the
    auto path: scalar arrays stay compiled, composite ones reroute via
    the runtime marker — violation rows byte-equal to the walker either
    way."""
    rnd = random.Random(seed)
    docs = [_rand_doc(rnd) for _ in range(300)]
    _check(spark, docs, FUZZ_UNIQUE_RULESET, force=False)


class TestCompositeAndNames:
    def test_composite_enum_const(self, spark):
        rs = {"properties": {
            "e": {"enum": [[1, 2], {"a": 1}, "x", 5]},
            "c": {"const": {"a": [1.5, None]}}}}
        docs = ['{"e": [1, 2]}', '{"e": [1.0, 2]}', '{"e": [2, 1]}',
                '{"e": {"a": 1}}', '{"e": {"a": 1.0}}',
                '{"e": {"a": 1, "b": 2}}', '{"e": 5}', '{"e": 5.0}',
                '{"c": {"a": [1.5, null]}}', '{"c": {"a": [1.5]}}',
                '{"c": {"a": [1.5, null], "b": 1}}']
        _check(spark, docs, rs)

    def test_property_names(self, spark):
        rs = {"propertyNames": {"maxLength": 3, "pattern": "^[a-z]"}}
        docs = ['{"ab": 1, "cde": 2}', '{"abcd": 1}', '{"Xab": 1}',
                '{}', '[1]', '{"a": 1, "toolong": 2}']
        _check(spark, docs, rs)

    def test_content_media(self, spark):
        rs = {"properties": {
            "b": {"contentEncoding": "base64"},
            "j": {"contentMediaType": "application/json"},
            "bj": {"contentEncoding": "base64",
                   "contentMediaType": "application/json"}}}
        docs = ['{"b": "aGVsbG8="}', '{"b": "not*b64"}',
                '{"j": "{\\"a\\":1}"}', '{"j": "{"}', '{"j": 5}',
                '{"bj": "eyJhIjogMX0="}', '{"bj": "aGVsbG8="}']
        _check(spark, docs, rs)


class TestUnevaluatedVariant:
    def test_unevaluated_properties(self, spark):
        rs = {"properties": {"a": {"type": "integer"}},
              "patternProperties": {"^x_": {"type": "string"}},
              "anyOf": [{"properties": {"b": {"type": "integer"}},
                         "required": ["b"]},
                        {"properties": {"c": {"type": "string"}},
                         "required": ["c"]}],
              "unevaluatedProperties": False}
        docs = ['{"a": 1, "b": 2}', '{"a": 1, "b": 2, "z": 3}',
                '{"a": 1, "c": "s", "x_k": "v"}', '{"a": 1}',
                '{"b": 2, "c": "s", "d": 4}', '{"a": "bad", "b": 2}',
                '{"b": "bad", "c": "s"}', '[1]', '{}']
        _check(spark, docs, rs, force=True)

    def test_unevaluated_properties_schema_and_ifthen(self, spark):
        rs = {"if": {"required": ["mode"],
                     "properties": {"mode": {"const": "x"}}},
              "then": {"properties": {"xval": {"type": "integer"}}},
              "else": {"properties": {"yval": {"type": "integer"}}},
              "properties": {"mode": {"type": "string"}},
              "unevaluatedProperties": {"type": "boolean"}}
        docs = ['{"mode": "x", "xval": 1}', '{"mode": "x", "yval": 1}',
                '{"mode": "y", "yval": 1}', '{"mode": "y", "xval": true}',
                '{"mode": "x", "extra": true}',
                '{"mode": "x", "extra": 3}', '{}']
        _check(spark, docs, rs, force=True)

    def test_unevaluated_items(self, spark):
        rs = {"properties": {"t": {
            "items": [{"type": "string"}],
            "anyOf": [{"items": [True, {"type": "integer"}]},
                      {"items": [True, True, {"type": "boolean"}]}],
            "unevaluatedItems": False}}}
        docs = ['{"t": ["a"]}', '{"t": ["a", 1]}', '{"t": ["a", 1, 2]}',
                '{"t": ["a", "b", true]}', '{"t": ["a", 1, true]}',
                '{"t": []}', '{"t": ["a", true, true, 4]}']
        _check(spark, docs, rs, force=True)

    def test_unevaluated_with_recursion_falls_back(self, spark):
        rs = {"properties": {"n": {"$ref": "#"}},
              "unevaluatedProperties": False}
        docs = ['{"n": {}}', '{"n": {"z": 1}}', '{"z": 1}']
        # auto mode must still produce walker-correct answers
        _check(spark, docs, rs, force=False)


@pytest.mark.parametrize("seed", [5, 19])
def test_fuzz_unevaluated_variant_vs_walker(spark, seed):
    """The struct-target unevaluated fuzz grammar, replayed over raw JSON
    through the variant plan."""
    from test_unevaluated_static import FIELDS, gen_root

    rnd = random.Random(seed)

    def gen_doc():
        doc = {}
        for k in FIELDS:
            if rnd.random() < 0.6:
                doc[k] = rnd.choice([0, 1, 5, "a", "ab", 1.5, True, None])
        if rnd.random() < 0.2:
            doc["zz"] = rnd.choice([1, "z"])
        return json.dumps(doc)

    checked = 0
    for _ in range(25):
        rs = gen_root(rnd)
        docs = [gen_doc() for _ in range(60)]
        try:
            _check(spark, docs, rs, force=True)
        except UnsupportedRule:
            continue
        checked += 1
    assert checked >= 15, checked


class TestUniqueItemsVariant:
    RS = {"properties": {"xs": {"uniqueItems": True}}}

    def test_scalar_arrays_compile_serde_strict(self, spark):
        docs = [
            '{"xs": [1, 2, 3]}',          # unique ints
            '{"xs": [1, 1]}',             # dup ints
            '{"xs": [1, 1.0]}',           # serde-strict: int != float
            '{"xs": [1.0, 1.00]}',        # same f64 twice -> dup
            '{"xs": [1.0, 1.5]}',
            '{"xs": [true, 1]}',          # bool != number
            '{"xs": [true, false, true]}',
            '{"xs": ["1", 1]}',           # string != number
            '{"xs": ["a", "a"]}',
            '{"xs": [null, null]}',
            '{"xs": [0.0, -0.0]}',        # rust f64 ==: -0.0 is a dup
            '{"xs": [-0.0e0, 0.0]}',      # DOUBLE-typed negative zero
            '{"xs": [-0.0e0, 0.0e0]}',    # both exponent-form zeros
            '{"xs": [1e2, 100.0]}',       # same f64 via different forms
            '{"xs": [1e2, 100]}',         # float vs int distinct
            '{"xs": []}', '{"xs": 7}', '{}',
        ]
        # auto mode: all-scalar arrays stay on the column plan; verdicts
        # and violation rows must equal the walker byte-for-byte
        _check(spark, docs, self.RS, force=False)

    def test_composites_reroute_and_match_walker(self, spark):
        docs = [
            '{"xs": [[1], [1.0]]}',       # nested strict: NOT dup
            '{"xs": [[1], [1]]}',         # dup arrays
            '{"xs": [{"a": 1}, {"a": 2}]}',
            '{"xs": [{"a": 1}, {"a": 1}]}',
            '{"xs": [{}, [1], true, null, 1]}',
            '{"xs": [18446744073709551615, 18446744073709551615]}',
        ]
        _check(spark, docs, self.RS, force=False)

    def test_marker_fires_only_beyond_depth_budget(self, spark):
        """Scalar AND shallow-composite arrays must NOT reroute: the
        plan's marker fires only for elements nested deeper than
        ``_UNIQUE_DEPTH`` levels or ambiguous big decimals."""
        from valico_spark.compiler.variantcolumns import (
            compile_json_ruleset, has_walker_marker,
        )

        df = spark.createDataFrame(
            [('{"xs": [1, 2, 1.0, "a", true, null]}',),
             ('{"xs": [{"o": 1}]}',),              # flat object: compiled
             ('{"xs": [{"o": [{"p": 1}]}]}',),     # depth 3: compiled
             ('{"xs": [{"o": [{"p": [1]}]}]}',),   # depth 4: residual
             ('{"xs": [9300000000000000000]}',)],  # >i64 decimal: residual
            "j string")
        viol, comp = compile_json_ruleset(self.RS, F.col("j"),
                                          residual_marker=True)
        assert comp.used_marker
        rows = df.select(has_walker_marker(viol).alias("m")).collect()
        assert [r.m for r in rows] == [False, False, False, True, True]


def test_unique_items_array_of_scalar_elements(spark):
    """Round-3 walker-residual shrink: array-of-SCALARS elements compile
    on the variant plan (length-prefix framed member keys, order
    sensitive, serde Number variants distinct); objects and nested
    composites still reroute."""
    import json

    from pyspark.sql import functions as F

    from valico_spark.compiler.pyvalidator import DRAFT7, Scope
    from valico_spark.compiler.variantcolumns import (
        compile_json_ruleset, has_walker_marker,
    )

    compiled = [
        ([[1, 2], [1, 2]], False), ([[1, 2], [2, 1]], True),
        ([[1], [1.0]], True), ([["a,b"], ["a", "b"]], True),
        ([["a", "b"], ["a", "b"]], False), ([[], []], False),
        ([[None], [None]], False), ([[True], [1]], True),
        ([1, 2, [1, 2], "x"], True),
        # round-4 shrink: composites up to _UNIQUE_DEPTH levels compile
        ([{"a": 1}, {"a": 1}], False), ([[[1]], [1]], True),
        ([{"a": 1, "b": 2}, {"b": 2, "a": 1}], False),  # key order
        ([{"a": 1}, {"a": 1.0}], True),                 # int != float
        ([{"a": [{"b": 1}]}, {"a": [{"b": 1}]}], False),
        ([{"a": [{"b": 1}]}, {"a": [{"b": 2}]}], True),
        ([{}, {}], False), ([{}, []], True),
    ]
    residual = [[{"a": [{"b": [1]}]}, 1],      # depth 4 composite
                [[[[[1]]]], [1]]]              # 5-deep array chain

    viol, _ = compile_json_ruleset({"uniqueItems": True}, F.col("j"),
                                   version=DRAFT7, residual_marker=True)
    docs = [d for d, _ in compiled] + residual
    df = spark.createDataFrame([(json.dumps(d),) for d in docs], "j string")
    rows = df.select("j", (F.size(viol) == 0).alias("ok"),
                     has_walker_marker(viol).alias("marked")).collect()
    sc = Scope(version=DRAFT7)
    sid = sc.compile({"uniqueItems": True})
    for r, d in zip(rows, docs):
        exp = dict((json.dumps(x), v) for x, v in compiled).get(r["j"])
        wv = sc.validate(sid, json.loads(r["j"])).is_valid()
        if exp is not None:
            assert not r["marked"] and r["ok"] == exp == wv, (d, r)
        else:
            assert r["marked"], (d, "expected walker residual")
