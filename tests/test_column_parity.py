"""Column compiler vs reference-parity walker: identical verdicts and
violation rows on the synthetic interleaved-docs table.

This is the engine's core correctness property: the vectorized JVM plan
(compiler.columns) must agree with the reference-semantics oracle
(compiler.pyvalidator) document-by-document — same valid flags, same
(code, path, detail) multisets.
"""

import json

from pyspark.sql import functions as F

from valico_spark.compiler.pyvalidator import Scope
from valico_spark.operators.validate import (
    validate_dataframe, validate_json_column, violation_rows,
)
from valico_spark.rulesets import DOCS_RULESET, MEDIA_RULESET


def _oracle_results(rows_json, ruleset):
    scope = Scope()
    sid = scope.compile(ruleset)
    out = []
    for doc in rows_json:
        state = scope.validate(sid, json.loads(doc))
        out.append((state.is_valid(),
                    sorted((e.code, e.path, e.detail or "", e.states or "")
                           for e in state.errors)))
    return out


def _check_parity(df, ruleset, id_col):
    validated = validate_dataframe(df, ruleset, mode="columns")
    got = (validated
           .select(id_col, "valid", "violations",
                   F.to_json(F.struct(*df.columns)).alias("doc_json"))
           .collect())
    docs_json = [r["doc_json"] for r in got]
    expected = _oracle_results(docs_json, ruleset)
    n_invalid = 0
    for row, (exp_valid, exp_errs) in zip(got, expected):
        assert row["valid"] == exp_valid, (
            f"verdict mismatch for {row[id_col]}: {row['doc_json'][:200]}")
        got_errs = sorted((v["code"], v["path"], v["detail"] or "",
                           v["states"] or "")
                          for v in row["violations"])
        assert got_errs == exp_errs, (
            f"violations mismatch for {row[id_col]}:\n got {got_errs}\n "
            f"exp {exp_errs}\n doc {row['doc_json'][:300]}")
        n_invalid += 0 if exp_valid else 1
    # the seeded generator must actually produce both outcomes
    assert n_invalid > 0
    assert n_invalid < len(got)


def test_docs_ruleset_parity(docs_df):
    _check_parity(docs_df, DOCS_RULESET, "doc_id")


def test_media_ruleset_parity(media_df):
    _check_parity(media_df, MEDIA_RULESET, "media_ref")


def test_arrow_path_agrees_with_column_path(docs_df):
    cols = validate_dataframe(docs_df, DOCS_RULESET, mode="columns")
    arrow = validate_dataframe(docs_df, DOCS_RULESET, mode="arrow")
    a = {r["doc_id"]: r["valid"] for r in
         cols.select("doc_id", "valid").collect()}
    b = {r["doc_id"]: r["valid"] for r in
         arrow.select("doc_id", "valid").collect()}
    assert a == b


def test_violation_rows_shape(docs_df):
    validated = validate_dataframe(docs_df, DOCS_RULESET, mode="columns")
    rows = violation_rows(validated, ["doc_id"])
    assert rows.columns == ["doc_id", "code", "title", "path", "detail"]
    sample = rows.limit(5).collect()
    assert all(r["code"] for r in sample)


def test_json_column_validation(spark):
    df = spark.createDataFrame(
        [("a", '{"x": 1}'), ("b", '{"x": "nope"}'), ("c", '{}')],
        ["id", "doc"])
    ruleset = {"type": "object", "required": ["x"],
               "properties": {"x": {"type": "integer"}}}
    out = {r["id"]: (r["valid"], [v["code"] for v in r["violations"]])
           for r in validate_json_column(df, "doc", ruleset).collect()}
    assert out["a"] == (True, [])
    assert out["b"] == (False, ["wrong_type"])
    assert out["c"] == (False, ["required"])


def test_column_plan_is_wholestage(docs_df):
    """The static plan must be pure project (no shuffle, no python UDF)."""
    validated = validate_dataframe(docs_df, DOCS_RULESET, mode="columns")
    plan = validated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_count_compiler_matches_array_compiler(docs_df, media_df):
    from valico_spark.operators.validate import validation_counts
    from valico_spark.rulesets import DOCS_RULESET, MEDIA_RULESET

    from valico_spark.compiler.columns import compile_ruleset
    from valico_spark.compiler.counts import compile_violation_count

    for df, rs in ((docs_df, DOCS_RULESET), (media_df, MEDIA_RULESET)):
        arr = compile_ruleset(rs, df.schema)
        cnt = compile_violation_count(rs, df.schema)
        bad = df.select(F.size(arr).cast("long").alias("n"),
                        cnt.alias("n2")) \
                .where(F.col("n") != F.col("n2")).count()
        assert bad == 0


def test_count_compiler_fuzz(spark):
    import random

    from test_fuzz_parity import ROW_TYPE, gen_row, gen_ruleset
    from valico_spark.compiler.columns import (
        UnsupportedRule, compile_ruleset,
    )
    from valico_spark.compiler.counts import compile_violation_count
    from pyspark.sql import types as T

    rnd = random.Random(99)
    rows = [gen_row(rnd, i) for i in range(80)]
    df = spark.createDataFrame(rows, ROW_TYPE)
    schema = T.StructType([f for f in ROW_TYPE.fields if f.name != "id"])
    checked = 0
    for _ in range(25):
        ruleset = gen_ruleset(rnd)
        try:
            arr = compile_ruleset(ruleset, schema)
            cnt = compile_violation_count(ruleset, schema)
        except UnsupportedRule:
            continue
        bad = df.select(F.size(arr).cast("long").alias("n"),
                        cnt.alias("n2")) \
                .where(F.col("n") != F.col("n2")).count()
        assert bad == 0, ruleset
        checked += 1
    assert checked >= 15
