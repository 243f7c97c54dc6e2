"""Violation-count compiler: ruleset → Column<long> (# of violations).

Same keyword semantics as ``compiler.columns`` but emits pure integer
arithmetic — no violation-struct/array construction — for the hot
verdict paths (``valid = count == 0``, ``n_violations = count``). On the
flagship docs ruleset this halves the per-row work of verdict-only scans:
the array compiler builds (and concats) struct arrays that a following
``size(...)`` immediately discards; Catalyst does not simplify that away.

Count parity with the array compiler is asserted in tests (the count of
emitted violation rows per keyword is part of the reference contract —
e.g. ``required`` emits one row PER missing key, validators/required.rs).
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from valico_spark.compiler.columns import (
    ColumnCompiler, Target, UnsupportedRule, _is_float, _is_numeric,
    spark_json_types,
)
from valico_spark.compiler.pyvalidator import DRAFT2019, EPSILON, is_number

ZERO = F.lit(0).cast("long")
ONE = F.lit(1).cast("long")


def _b2c(cond: Column) -> Column:
    """violated-condition boolean -> count contribution."""
    return F.when(cond, ONE).otherwise(ZERO)


class CountCompiler(ColumnCompiler):
    """Subclasses the array compiler, overriding the emitters to produce
    Column<long> counts; the `_node` driver and keyword dispatch logic is
    shared, so semantics stay in one place."""

    # -- helpers shadowing the array builders -----------------------------
    @staticmethod
    def _empty() -> Column:
        return ZERO

    def _concat_counts(self, parts: list[Column]) -> Column:
        parts = [p for p in parts if p is not None]
        if not parts:
            return ZERO
        out = parts[0]
        for p in parts[1:]:
            out = out + p
        return out

    # The parent class composes everything via `_node`, which calls the
    # per-keyword emitters and merges with `_concat`. We reuse `_node` by
    # monkey-level overriding of the module-level helpers is fragile;
    # instead re-dispatch here with count semantics.
    def _node(self, schema: Any, target: Target, depth: int) -> Column:
        if depth > self._MAX_REF_DEPTH:
            raise UnsupportedRule("recursive $ref beyond inlining depth")
        if schema is True:
            schema = {}
        elif schema is False:
            schema = {"not": {}}
        if not isinstance(schema, dict):
            raise UnsupportedRule("schema must be an object or boolean")
        if "$ref" in schema and self.version < DRAFT2019:
            return self._node(self._resolve_ref(schema["$ref"]), target,
                              depth + 1)
        s, t, d = schema, target, depth
        parts: list[Column] = []
        if "$ref" in s:
            parts.append(self._node(self._resolve_ref(s["$ref"]), t, d + 1))
        if "type" in s:
            parts.append(self._c_type(s["type"], t))
        if "enum" in s:
            parts.append(self._c_enum(s["enum"], t))
        if "const" in s:
            parts.append(self._c_const(s["const"], t))
        for kw, op in (("minimum", "min"), ("maximum", "max"),
                       ("exclusiveMinimum", "emin"),
                       ("exclusiveMaximum", "emax")):
            if kw in s:
                parts.append(self._c_bound(s[kw], op, t))
        if "multipleOf" in s:
            parts.append(self._c_multiple_of(s["multipleOf"], t))
        if "minLength" in s:
            parts.append(self._c_length(s["minLength"], False, t))
        if "maxLength" in s:
            parts.append(self._c_length(s["maxLength"], True, t))
        if "pattern" in s:
            parts.append(self._c_pattern(s["pattern"], t))
        if "format" in s:
            parts.append(self._c_format(s["format"], t))
        if "required" in s:
            parts.append(self._c_required(s["required"], t))
        if "properties" in s or "additionalProperties" in s \
                or "patternProperties" in s:
            parts.append(self._c_properties(s, t, d))
        if "propertyNames" in s:
            parts.append(self._c_property_names(s["propertyNames"], t, d))
        if "minProperties" in s:
            parts.append(self._c_props_count(s["minProperties"], False, t))
        if "maxProperties" in s:
            parts.append(self._c_props_count(s["maxProperties"], True, t))
        if "dependencies" in s or "dependentRequired" in s \
                or "dependentSchemas" in s:
            parts.append(self._c_dependencies(s, t, d))
        if "items" in s or "additionalItems" in s:
            parts.append(self._c_items(s, t, d))
        if "minItems" in s:
            parts.append(self._c_items_count(s["minItems"], False, t))
        if "maxItems" in s:
            parts.append(self._c_items_count(s["maxItems"], True, t))
        if "uniqueItems" in s and s["uniqueItems"] is True:
            parts.append(self._c_unique_items(t))
        if "contains" in s:
            parts.append(self._c_contains(s, t, d))
        if "allOf" in s:
            parts.append(self._concat_counts(
                [self._node(x, t, d + 1) for x in s["allOf"]]))
        if "anyOf" in s:
            parts.append(_b2c(~self._any_ok(s["anyOf"], t, d)))
        if "oneOf" in s:
            parts.append(_b2c(self._one_count(s["oneOf"], t, d) != 1))
        if "not" in s:
            parts.append(_b2c(self._node(s["not"], t, d + 1) == 0))
        if "if" in s:
            then_c = (self._node(s["then"], t, d + 1)
                      if "then" in s else ZERO)
            else_c = (self._node(s["else"], t, d + 1)
                      if "else" in s else ZERO)
            parts.append(F.when(self._node(s["if"], t, d + 1) == 0,
                                then_c).otherwise(else_c))
        if "unevaluatedProperties" in s or "unevaluatedItems" in s:
            if self.version >= DRAFT2019:
                raise UnsupportedRule("unevaluated* needs the walker")
        if "contentEncoding" in s or "contentMediaType" in s:
            parts.append(F.size(self._content_media(s, t)).cast("long"))
        return self._concat_counts(parts)

    def _any_ok(self, subs, t, d) -> Column:
        ok = None
        for sub in subs:
            c = self._node(sub, t, d + 1) == 0
            ok = c if ok is None else (ok | c)
        return ok

    def _one_count(self, subs, t, d) -> Column:
        cnt = None
        for sub in subs:
            c = _b2c(self._node(sub, t, d + 1) == 0)
            cnt = c if cnt is None else (cnt + c)
        return cnt

    # -- leaf emitters -----------------------------------------------------
    def _c_type(self, ty, t):
        return F.size(self._type(ty, t)).cast("long")

    def _c_enum(self, values, t):
        return F.size(self._enum(values, t)).cast("long")

    def _c_const(self, value, t):
        return F.size(self._const(value, t)).cast("long")

    def _c_bound(self, m, op, t):
        if not is_number(m):
            raise UnsupportedRule("bound must be a number")
        if not _is_numeric(t.dtype) and t.dtype is not None:
            return ZERO
        c = t.col.cast("double")
        ok = {"min": c >= F.lit(float(m)), "emin": c > F.lit(float(m)),
              "max": c <= F.lit(float(m)), "emax": c < F.lit(float(m))}[op]
        return _b2c(t.col.isNotNull() & ~ok)

    def _c_multiple_of(self, k, t):
        return F.size(self._multiple_of(k, t)).cast("long")

    def _c_length(self, n, is_max, t):
        if not isinstance(t.dtype, T.StringType) and t.dtype is not None:
            return ZERO
        ln = F.length(t.col)
        ok = ln <= F.lit(int(n)) if is_max else ln >= F.lit(int(n))
        return _b2c(t.col.isNotNull() & ~ok)

    def _c_pattern(self, p, t):
        if not isinstance(p, str):
            raise UnsupportedRule("pattern must be a string")
        if not isinstance(t.dtype, T.StringType) and t.dtype is not None:
            return ZERO
        from valico_spark.compiler.columns import unicode_pattern
        return _b2c(t.col.isNotNull() & ~t.col.rlike(unicode_pattern(p)))

    def _c_format(self, name, t):
        return F.size(self._format(name, t)).cast("long")

    def _c_required(self, keys, t):
        if not isinstance(keys, list):
            raise UnsupportedRule("required must be an array")
        if isinstance(t.dtype, T.StructType):
            fields = {f.name for f in t.dtype.fields}
            parts = []
            for k in keys:
                present = (t.col.getField(k).isNotNull() if k in fields
                           else F.lit(False))
                parts.append(_b2c(t.col.isNotNull() & ~present))
            return self._concat_counts(parts)
        if isinstance(t.dtype, T.MapType):
            parts = [_b2c(t.col.isNotNull()
                          & ~F.map_contains_key(t.col, F.lit(k)))
                     for k in keys]
            return self._concat_counts(parts)
        if t.dtype is None:
            raise UnsupportedRule("required on untyped target")
        return ZERO

    def _c_properties(self, s, t, depth):
        props = s.get("properties", {})
        additional = s.get("additionalProperties")
        if isinstance(t.dtype, T.StructType):
            if s.get("patternProperties"):
                raise UnsupportedRule("patternProperties on struct")
            fields = {f.name: f for f in t.dtype.fields}
            parts = []
            for key, sub in props.items():
                f_ = fields.get(key)
                if f_ is None:
                    continue
                child = t.child(t.col.getField(key), f_.dataType,
                                F.lit(""))
                parts.append(F.when(
                    t.col.isNotNull() & child.col.isNotNull(),
                    self._node(sub, child, depth + 1)).otherwise(ZERO))
            if additional is False:
                for key, f_ in fields.items():
                    if key not in props:
                        parts.append(_b2c(
                            t.col.isNotNull()
                            & t.col.getField(key).isNotNull()))
            elif isinstance(additional, dict):
                for key, f_ in fields.items():
                    if key not in props:
                        child = t.child(t.col.getField(key), f_.dataType,
                                        F.lit(""))
                        parts.append(F.when(
                            t.col.isNotNull() & child.col.isNotNull(),
                            self._node(additional, child, depth + 1)
                        ).otherwise(ZERO))
            return self._concat_counts(parts)
        if isinstance(t.dtype, T.MapType):
            return F.size(self._properties_map(s, t, depth)).cast("long")
        if t.dtype is None:
            raise UnsupportedRule("properties on untyped target")
        return ZERO

    def _c_property_names(self, sub, t, depth):
        return F.size(self._property_names(sub, t, depth)).cast("long")

    def _c_props_count(self, n, is_max, t):
        return F.size(self._props_count(n, is_max, t)).cast("long")

    def _c_dependencies(self, s, t, depth):
        return F.size(self._dependencies(s, t, depth)).cast("long")

    def _c_items(self, s, t, depth):
        if not isinstance(t.dtype, T.ArrayType):
            if t.dtype is None:
                raise UnsupportedRule("items on untyped target")
            return ZERO
        etype = t.dtype.elementType
        items = s.get("items")
        additional = s.get("additionalItems")
        parts = []
        if isinstance(items, (dict, bool)):
            def per_elem(x: Column) -> Column:
                child = Target(x, etype, F.lit(""))
                return self._node(items, child, depth + 1)
            total = F.aggregate(t.col, ZERO,
                                lambda acc, x: acc + per_elem(x))
            parts.append(F.when(t.col.isNotNull(), total).otherwise(ZERO))
        elif isinstance(items, list):
            for idx, sub in enumerate(items):
                child = Target(F.element_at(t.col, idx + 1), etype,
                               F.lit(""))
                parts.append(F.when(
                    t.col.isNotNull() & (F.size(t.col) > idx),
                    self._node(sub, child, depth + 1)).otherwise(ZERO))
            if additional is False:
                parts.append(_b2c(t.col.isNotNull()
                                  & (F.size(t.col) > len(items))))
            elif isinstance(additional, dict):
                def per_extra(x: Column) -> Column:
                    child = Target(x, etype, F.lit(""))
                    return self._node(additional, child, depth + 1)
                tail = F.slice(t.col, len(items) + 1,
                               F.greatest(F.size(t.col) - len(items),
                                          F.lit(0)))
                parts.append(F.when(
                    t.col.isNotNull() & (F.size(t.col) > len(items)),
                    F.aggregate(tail, ZERO, lambda a, x: a + per_extra(x))
                ).otherwise(ZERO))
        return self._concat_counts(parts)

    def _c_items_count(self, n, is_max, t):
        if not isinstance(t.dtype, T.ArrayType):
            if t.dtype is None:
                raise UnsupportedRule("min/maxItems on untyped target")
            return ZERO
        sz = F.size(t.col)
        ok = sz <= F.lit(int(n)) if is_max else sz >= F.lit(int(n))
        return _b2c(t.col.isNotNull() & ~ok)

    def _c_unique_items(self, t):
        if not isinstance(t.dtype, T.ArrayType):
            if t.dtype is None:
                raise UnsupportedRule("uniqueItems on untyped target")
            return ZERO
        ok = F.size(F.array_distinct(t.col)) == F.size(t.col)
        return _b2c(t.col.isNotNull() & ~ok)

    def _c_contains(self, s, t, depth):
        if not isinstance(t.dtype, T.ArrayType):
            if t.dtype is None:
                raise UnsupportedRule("contains on untyped target")
            return ZERO
        sub = s["contains"]
        min_c = s.get("minContains") if self.version >= DRAFT2019 else None
        max_c = s.get("maxContains") if self.version >= DRAFT2019 else None
        etype = t.dtype.elementType

        def ok_elem(x: Column) -> Column:
            return self._node(sub, Target(x, etype, F.lit("")),
                              depth + 1) == 0

        parts = []
        if min_c is None and max_c is None:
            parts.append(_b2c(t.col.isNotNull()
                              & ~F.exists(t.col, ok_elem)))
        else:
            matched = F.size(F.filter(t.col, ok_elem))
            if min_c != 0:
                parts.append(_b2c(t.col.isNotNull() & (matched == 0)))
            if max_c is not None:
                parts.append(_b2c(t.col.isNotNull()
                                  & (matched > F.lit(int(max_c)))))
            if min_c is not None:
                parts.append(_b2c(t.col.isNotNull()
                                  & (matched < F.lit(int(min_c)))))
        return self._concat_counts(parts)


def compile_violation_count(schema: Any, spark_schema: T.StructType,
                            version: int = 7) -> Column:
    root_col = F.struct(*[F.col(f.name).alias(f.name)
                          for f in spark_schema.fields])
    target = Target(col=root_col, dtype=spark_schema, path=F.lit(""))
    return CountCompiler(version=version, root_schema=schema
                         ).compile(schema, target)
