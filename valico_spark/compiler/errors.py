"""Violation-row vocabulary — the golden output contract.

Codes and fixed title strings reproduce the reference exactly:
JSON-Schema codes from ``/root/reference/src/json_schema/errors.rs:11-237``,
DSL codes from ``/root/reference/src/json_dsl/errors.rs:10-68``; the
serialized shape ``{code, title, path[, detail]}`` from
``/root/reference/src/common/error.rs:88-121``.

Note the reference quirks we must preserve:
* ``exclusiveMaximum``/``exclusiveMinimum`` report code ``maximum`` /
  ``minimum`` (``validators/maxmin.rs:49-52,99-102``).
* ``minContains``/``maxContains`` share one code string
  ``"min_contains/max_contains"`` (``errors.rs:195``).
* the DSL ``wrong_value`` title contains the reference's typo
  "mailformed" (``json_dsl/errors.rs:28``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# code -> fixed title (JSON Schema side, errors.rs)
SCHEMA_TITLES: dict[str, str] = {
    "wrong_type": "Type of the value is wrong",
    "multiple_of": "Wrong number of the value",
    "maximum": "Maximum condition is not met",
    "minimum": "Minimum condition is not met",
    "max_length": "MaxLength condition is not met",
    "min_length": "MinLength condition is not met",
    "pattern": "Pattern condition is not met",
    "max_items": "MaxItems condition is not met",
    "min_items": "MinItems condition is not met",
    "unique_items": "UniqueItems condition is not met",
    "items": "Items condition is not met",
    "max_properties": "MaxProperties condition is not met",
    "min_properties": "MinProperties condition is not met",
    "required": "This property is required",
    "properties": "Property conditions are not met",
    "enum": "Enum conditions are not met",
    "any_of": "AnyOf conditions are not met",
    "one_of": "OneOf conditions are not met",
    "const": "Const condition is not met",
    "contains": "Contains condition is not met",
    "min_contains/max_contains": "Contains minimum/maximum is not met",
    "not": "Not condition is not met",
    "default": "Application of defaults did not converge",
    "format": "Format is wrong",
    "unevaluated": "Unevaluated condition is not met",
}

# code -> fixed title (DSL side, json_dsl/errors.rs)
DSL_TITLES: dict[str, str] = {
    "required": "This field is required",
    "wrong_type": "Type of the value is wrong",
    "wrong_value": "The value is wrong or mailformed",
    "mutually_exclusive": "The values are mutually exclusive",
    "exactly_one": "Exacly one of the values must be present",
    "at_least_one": "At least one of the values must be present",
}


@dataclass(frozen=True)
class Violation:
    """One serialized error row (common/error.rs:88-121).

    ``states`` carries the nested sub-state payload of ``any_of``/``one_of``
    errors (errors.rs:148-172) serialized to a JSON string, and the
    ``params`` list of the DSL exclusivity errors (json_dsl/errors.rs:38-68).
    """

    code: str
    title: str
    path: str
    detail: str | None = None
    states: str | None = None

    def as_dict(self) -> dict:
        d = {"code": self.code, "title": self.title, "path": self.path}
        if self.detail is not None:
            d["detail"] = self.detail
        if self.states is not None:
            d["states"] = self.states
        return d


def schema_violation(code: str, path: str, detail: str | None = None,
                     states: str | None = None) -> Violation:
    return Violation(code, SCHEMA_TITLES[code], path, detail, states)


def dsl_violation(code: str, path: str, detail: str | None = None,
                  states: str | None = None) -> Violation:
    return Violation(code, DSL_TITLES[code], path, detail, states)


# Spark-side schema of one violation row; a document's violations column is
# ArrayType(VIOLATION_TYPE).
VIOLATION_TYPE = T.StructType([
    T.StructField("code", T.StringType(), False),
    T.StructField("title", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("detail", T.StringType(), True),
    T.StructField("states", T.StringType(), True),
])

VIOLATIONS_ARRAY_TYPE = T.ArrayType(VIOLATION_TYPE, False)
