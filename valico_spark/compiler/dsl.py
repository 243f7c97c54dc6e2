"""Grape-style parameter DSL: coercion + validation with mutation.

Reference-parity reimplementation of the reference's second engine
(``/root/reference/src/json_dsl/``): a ``Builder`` declares required/
optional params with coercers, nested builders, validators, defaults, and
exclusivity constraints; ``process`` walks a document, COERCES it
in place (the mutated document is part of the output contract), then
validates. Ordering contract (README.md:230-241): coerce → nest → param
validators → attached schema; defaults injected only if still valid;
builder-level schema validates the mutated value.

Two execution surfaces:
* ``Builder.process(value)`` — the exact walker (oracle + Arrow fallback
  via ``process_dataframe_json``);
* ``dsl_cast_stage`` — the Spark fast path: coercers compile to
  ``try_cast``-style derived columns, validators to predicate columns
  (see ``operators.validate`` for the violations contract).
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable

from valico_spark.compiler.errors import Violation, dsl_violation
from valico_spark.compiler.pyvalidator import (
    ValidationState, deep_eq_strict, end_anchor_pattern, Scope,
)

I64_MIN, I64_MAX = -(1 << 63), (1 << 63) - 1

# distinguishes "coerced to JSON null" from "no change" (None)
NULL_SENTINEL = object()
U64_MAX = (1 << 64) - 1

_INT_RE = re.compile(r"[+-]?[0-9]+")
_UINT_RE = re.compile(r"\+?[0-9]+")
_F64_RE = re.compile(
    r"[+-]?(inf(inity)?|nan|([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?)",
    re.IGNORECASE)


class CoerceError(Exception):
    def __init__(self, errors: list[Violation]):
        self.errors = errors


def _wrong_type(path: str, detail: str) -> Violation:
    return dsl_violation("wrong_type", path, detail)


# Coercers return None (value already right type) or the new value;
# raise CoerceError on failure. (coercers.rs:22-330)

class Coercer:
    def coerce(self, val: Any, path: str):
        raise NotImplementedError


class StringCoercer(Coercer):
    def coerce(self, val, path):
        if isinstance(val, str):
            return None
        if isinstance(val, (int, float)) and not isinstance(val, bool):
            # serde to_string of the number (decimal repr)
            if isinstance(val, float):
                return repr(val) if not val.is_integer() or math.isinf(val) \
                    or math.isnan(val) else f"{val:.1f}"
            return str(val)
        raise CoerceError([_wrong_type(path,
                                       "Can't coerce value to string")])


class I64Coercer(Coercer):
    def coerce(self, val, path):
        if isinstance(val, bool):
            raise CoerceError([_wrong_type(path,
                                           "Can't coerce object value to i64")])
        if isinstance(val, int):
            if val <= I64_MAX:
                return None  # i64 (or u64 fitting i64 repr change is a no-op)
            return val - (1 << 64) if val - (1 << 64) >= I64_MIN else I64_MIN
        if isinstance(val, float):
            # Rust `as i64`: truncate toward zero, saturating, NaN→0
            if math.isnan(val):
                return 0
            return max(I64_MIN, min(I64_MAX, int(val)))
        if isinstance(val, str):
            if _INT_RE.fullmatch(val):
                n = int(val)
                if I64_MIN <= n <= I64_MAX:
                    return n
            raise CoerceError([_wrong_type(
                path, "Can't coerce string value to i64")])
        raise CoerceError([_wrong_type(path,
                                       "Can't coerce object value to i64")])


class U64Coercer(Coercer):
    def coerce(self, val, path):
        if isinstance(val, bool):
            raise CoerceError([_wrong_type(path,
                                           "Can't coerce object value to u64")])
        if isinstance(val, int):
            if val >= 0:
                return None
            return val % (1 << 64)  # Rust `as u64` wraps
        if isinstance(val, float):
            if math.isnan(val) or val < 0:
                return 0
            return min(U64_MAX, int(val))
        if isinstance(val, str):
            if _UINT_RE.fullmatch(val):
                n = int(val.lstrip("+"))
                if n <= U64_MAX:
                    return n
            raise CoerceError([_wrong_type(
                path, "Can't coerce string value to u64")])
        raise CoerceError([_wrong_type(path,
                                       "Can't coerce object value to u64")])


class F64Coercer(Coercer):
    def coerce(self, val, path):
        if isinstance(val, bool):
            raise CoerceError([_wrong_type(path,
                                           "Can't coerce object value to f64")])
        if isinstance(val, float):
            return None
        if isinstance(val, int):
            return float(val)
        if isinstance(val, str):
            if _F64_RE.fullmatch(val):
                return float(val)
            raise CoerceError([_wrong_type(
                path, "Can't coerce string value to f64")])
        raise CoerceError([_wrong_type(path,
                                       "Can't coerce object value to f64")])


class BooleanCoercer(Coercer):
    def coerce(self, val, path):
        if isinstance(val, bool):
            return None
        if isinstance(val, str):
            if val == "true":
                return True
            if val == "false":
                return False
            raise CoerceError([_wrong_type(
                path, "Can't coerce this string value to boolean. Correct "
                      "values are 'true' and 'false'")])
        raise CoerceError([_wrong_type(path,
                                       "Can't coerce object to boolean")])


class NullCoercer(Coercer):
    def coerce(self, val, path):
        if val is None:
            return None
        if isinstance(val, str):
            if val == "":
                return NULL_SENTINEL
            raise CoerceError([_wrong_type(
                path, "Can't coerce this string value to null. Correct "
                      "value is only empty string")])
        raise CoerceError([_wrong_type(path, "Can't coerce object to null")])


class ObjectCoercer(Coercer):
    def coerce(self, val, path):
        if isinstance(val, dict):
            return None
        raise CoerceError([_wrong_type(
            path, "Can't coerce non-object value to the object type")])


class ArrayCoercer(Coercer):
    def __init__(self, sub_coercer: Coercer | None = None,
                 separator: str | None = None):
        self.sub = sub_coercer
        self.separator = separator

    def _coerce_array(self, arr: list, path: str) -> None:
        if self.sub is None:
            return
        errors: list[Violation] = []
        for i in range(len(arr)):
            item_path = f"{path}/{i}"
            try:
                new = self.sub.coerce(arr[i], item_path)
                if new is not None:
                    arr[i] = None if new is NULL_SENTINEL else new
            except CoerceError as e:
                errors.extend(e.errors)
        if errors:
            raise CoerceError(errors)

    def coerce(self, val, path):
        if isinstance(val, list):
            arr = list(val)
            self._coerce_array(arr, path)
            return arr
        if isinstance(val, str) and self.separator is not None:
            arr = [s for s in val.split(self.separator)]
            self._coerce_array(arr, path)
            return arr
        raise CoerceError([_wrong_type(path, "Can't coerce object to array")])


def string() -> Coercer: return StringCoercer()
def i64() -> Coercer: return I64Coercer()
def u64() -> Coercer: return U64Coercer()
def f64() -> Coercer: return F64Coercer()
def boolean() -> Coercer: return BooleanCoercer()
def null() -> Coercer: return NullCoercer()
def object_() -> Coercer: return ObjectCoercer()
def array() -> Coercer: return ArrayCoercer()
def array_of(sub: Coercer) -> Coercer: return ArrayCoercer(sub_coercer=sub)
def encoded_array(sep: str) -> Coercer: return ArrayCoercer(separator=sep)


def encoded_array_of(sep: str, sub: Coercer) -> Coercer:
    return ArrayCoercer(sub_coercer=sub, separator=sep)


# -- param/builder validators (json_dsl/validators/) ------------------------

class AllowedValues:
    def __init__(self, values: list):
        self.values = values

    def validate(self, val, path) -> list[Violation]:
        if any(deep_eq_strict(val, v) for v in self.values):
            return []
        return [dsl_violation("wrong_value", path,
                              "Value is not among allowed list")]


class RejectedValues:
    def __init__(self, values: list):
        self.values = values

    def validate(self, val, path) -> list[Violation]:
        if any(deep_eq_strict(val, v) for v in self.values):
            return [dsl_violation("wrong_value", path,
                                  "Value is among reject list")]
        return []


class RegexValidator:
    def __init__(self, pattern: str):
        # the reference's DSL regex is the Rust regex crate (end-of-text
        # $, regex.rs:9) — same trailing-newline delta as json_schema
        self.regex = re.compile(end_anchor_pattern(pattern, "\\Z"))

    def validate(self, val, path) -> list[Violation]:
        if not isinstance(val, str):
            return [_wrong_type(path, "The value must be a string")]
        if self.regex.search(val):
            return []
        return [dsl_violation("wrong_value", path,
                              "Value is not matched by required pattern")]


class FunctionValidator:
    """validate_with — the reference's arbitrary-closure extension point
    (builder.rs:120-125)."""

    def __init__(self, fn: Callable[[Any, str], list[Violation] | None]):
        self.fn = fn

    def validate(self, val, path) -> list[Violation]:
        return self.fn(val, path) or []


class _PresenceValidator:
    kind = ""
    code = ""

    def __init__(self, params: list[str]):
        self.params = params

    def _matched(self, obj: dict) -> list[str]:
        return [p for p in self.params if p in obj]


class MutuallyExclusive(_PresenceValidator):
    def validate(self, val, path) -> list[Violation]:
        if not isinstance(val, dict):
            return [_wrong_type(path, "The value must be an object")]
        matched = self._matched(val)
        if len(matched) <= 1:
            return []
        return [dsl_violation("mutually_exclusive", path,
                              "Fields are mutually exclusive")]


class ExactlyOneOf(_PresenceValidator):
    def validate(self, val, path) -> list[Violation]:
        if not isinstance(val, dict):
            return [_wrong_type(path, "The value must be an object")]
        n = len(self._matched(val))
        if n == 1:
            return []
        detail = ("Exactly one is allowed at one time" if n > 1
                  else "Exactly one must be present")
        return [dsl_violation("exactly_one", path, detail)]


class AtLeastOneOf(_PresenceValidator):
    def validate(self, val, path) -> list[Violation]:
        if not isinstance(val, dict):
            return [_wrong_type(path, "The value must be an object")]
        if self._matched(val):
            return []
        return [dsl_violation("at_least_one", path,
                              "At least one must be present")]


# -- Param / Builder --------------------------------------------------------

class Param:
    def __init__(self, name: str):
        self.name = name
        self.coercer: Coercer | None = None
        self.nest: Builder | None = None
        self.allow_null = False
        self.validators: list = []
        self.default = None
        self.has_default = False
        self.schema: Any = None  # attached JSON Schema dict

    # builder-style setters (param.rs:83-147)
    def coerce(self, coercer: Coercer):
        self.coercer = coercer
        return self

    def nest_with(self, build: "Callable[[Builder], None]"):
        b = Builder()
        build(b)
        self.nest = b
        return self

    def allow_null_(self):
        self.allow_null = True
        return self

    def regex(self, pattern: str):
        self.validators.append(RegexValidator(pattern))
        return self

    def allow_values(self, values: list):
        self.validators.append(AllowedValues(values))
        return self

    def reject_values(self, values: list):
        self.validators.append(RejectedValues(values))
        return self

    def validate_with(self, fn):
        self.validators.append(FunctionValidator(fn))
        return self

    def default_(self, value):
        self.default = value
        self.has_default = True
        return self

    def schema_(self, schema_dict):
        self.schema = schema_dict
        return self

    # param.rs:140-194
    def process(self, val, path, scope: Scope | None,
                schema_id: str | None):
        """Returns (new_value_or_None, ValidationState)."""
        state = ValidationState()
        if val is None and self.allow_null:
            return None, state
        new_value = None
        cur = val
        if self.coercer is not None:
            try:
                coerced = self.coercer.coerce(cur, path)
                if coerced is not None:
                    new_value = (NULL_SENTINEL if coerced is NULL_SENTINEL
                                 else coerced)
                    cur = None if coerced is NULL_SENTINEL else coerced
            except CoerceError as e:
                state.errors.extend(e.errors)
                return None, state
        if self.nest is not None:
            nest_state, mutated = self.nest.process_nest(cur, path, scope)
            if mutated is not None:
                cur = mutated
                new_value = mutated
            state.append(nest_state)
        for v in self.validators:
            state.errors.extend(v.validate(cur, path))
        if schema_id is not None and scope is not None:
            schema = scope.resolve(schema_id)
            if schema is not None:
                sub = schema.validate_in(cur, path, scope)
                from valico_spark.compiler.pyvalidator import NO_REPL
                if sub.is_valid() and sub.replacement is not NO_REPL:
                    cur = sub.replacement
                    new_value = cur
                    sub.replacement = NO_REPL
                state.append(sub)
            else:
                state.missing.append(schema_id)
        return new_value, state


class Builder:
    """json_dsl/builder.rs — declares params and processes documents."""

    def __init__(self):
        self.requires: list[Param] = []
        self.optional: list[Param] = []
        self.validators: list = []
        self.schema: Any = None
        self._scope: Scope | None = None
        self._schema_ids: dict[int, str] = {}
        self._builder_schema_id: str | None = None

    @classmethod
    def build(cls, fn: "Callable[[Builder], None]") -> "Builder":
        b = cls()
        fn(b)
        return b

    # declaration API (builder.rs:54-140)
    def req_defined(self, name):
        self.requires.append(Param(name))

    def req_typed(self, name, coercer):
        self.requires.append(Param(name).coerce(coercer))

    def req_nested(self, name, coercer, nest_fn):
        p = Param(name).coerce(coercer)
        p.nest_with(nest_fn)
        self.requires.append(p)

    def req(self, name, fn):
        p = Param(name)
        fn(p)
        self.requires.append(p)

    def opt_defined(self, name):
        self.optional.append(Param(name))

    def opt_typed(self, name, coercer):
        self.optional.append(Param(name).coerce(coercer))

    def opt_nested(self, name, coercer, nest_fn):
        p = Param(name).coerce(coercer)
        p.nest_with(nest_fn)
        self.optional.append(p)

    def opt(self, name, fn):
        p = Param(name)
        fn(p)
        self.optional.append(p)

    def mutually_exclusive(self, params):
        self.validators.append(MutuallyExclusive(list(params)))

    def exactly_one_of(self, params):
        self.validators.append(ExactlyOneOf(list(params)))

    def at_least_one_of(self, params):
        self.validators.append(AtLeastOneOf(list(params)))

    def validate_with(self, fn):
        self.validators.append(FunctionValidator(fn))

    def schema_(self, schema_dict):
        self.schema = schema_dict

    # builder.rs:146-177
    def build_schemes(self, scope: Scope) -> None:
        self._scope = scope
        for p in self.requires + self.optional:
            if p.schema is not None:
                self._schema_ids[id(p)] = scope.compile(p.schema,
                                                        ban_unknown=True)
            if p.nest is not None:
                p.nest.build_schemes(scope)
        if self.schema is not None:
            self._builder_schema_id = scope.compile(self.schema,
                                                    ban_unknown=True)

    def _ensure_scope(self) -> Scope | None:
        if self._scope is None and (
                self.schema is not None
                or any(p.schema is not None
                       for p in self.requires + self.optional)):
            self.build_schemes(Scope())
        return self._scope

    # builder.rs:179-235
    def process(self, val: Any) -> tuple[ValidationState, Any]:
        """Returns (state, processed_value) — processed_value is the
        coerced/defaulted document (the golden-output contract of
        tests/dsl/helpers.rs:50-60)."""
        scope = self._ensure_scope()
        state, mutated = self.process_nest(val, "", scope)
        return state, (mutated if mutated is not None else val)

    def process_nest(self, val, path, scope):
        state = ValidationState()
        result = None
        if isinstance(val, list):
            arr = list(val)
            changed = False
            for idx, item in enumerate(arr):
                item_path = f"{path}/{idx}"
                if isinstance(item, dict):
                    sub_state, mutated = self._process_object(
                        item, item_path, scope)
                    if mutated is not None:
                        arr[idx] = mutated
                        changed = True
                    state.append(sub_state)
                else:
                    state.errors.append(_wrong_type(
                        item_path, "List value is not and object"))
            if changed:
                result = arr
        elif isinstance(val, dict):
            sub_state, result = self._process_object(val, path, scope)
            state.append(sub_state)
        else:
            state.errors.append(_wrong_type(
                path, "Value is not an object or an array"))

        spath = path if path else "/"
        if self._builder_schema_id is not None and scope is not None:
            schema = scope.resolve(self._builder_schema_id)
            target = result if result is not None else val
            if schema is not None:
                state.append(schema.validate_in(target, spath, scope))
            else:
                state.missing.append(self._builder_schema_id)
        return state, result

    def _process_object(self, val: dict, path: str, scope):
        state = ValidationState()
        obj = dict(val)
        for required, params in ((True, self.requires),
                                 (False, self.optional)):
            for p in params:
                param_path = f"{path}/{p.name}"
                if p.name in obj:
                    new_val, sub = p.process(obj[p.name], param_path, scope,
                                             self._schema_ids.get(id(p)))
                    if new_val is not None:
                        obj[p.name] = (None if new_val is NULL_SENTINEL
                                       else new_val)
                    state.append(sub)
                elif required:
                    state.errors.append(
                        dsl_violation("required", param_path))

        spath = path if path else "/"
        for v in self.validators:
            state.errors.extend(v.validate(obj, spath))

        if state.is_valid():
            for p in self.optional:
                if p.name not in obj and p.has_default:
                    obj[p.name] = p.default

        return state, (obj if obj != val else None)
