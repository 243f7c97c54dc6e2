"""Programmatic schema construction — the reference's entry point C.

``src/json_schema/builder.rs`` offers a typed DSL that just assembles the
schema JSON and feeds the normal compile path; this is the Python
equivalent. The JSON ruleset stays the canonical input — this is sugar.

    from valico_spark.compiler.builder import schema
    ruleset = schema(lambda s: (
        s.object(),
        s.properties(lambda p: (
            p.insert("doc_id", lambda d: (d.string(),
                                          d.pattern("^p[0-9]+$"))),
            p.insert("spans", lambda d: (d.array(), d.min_items(1))),
        )),
        s.required(["doc_id", "spans"]),
    ))
"""

from __future__ import annotations

from typing import Any, Callable


class SchemaBuilder:
    def __init__(self):
        self._s: dict[str, Any] = {}

    # types (builder.rs:120-147)
    def string(self): self._s["type"] = "string"
    def number(self): self._s["type"] = "number"
    def integer(self): self._s["type"] = "integer"
    def boolean(self): self._s["type"] = "boolean"
    def array(self): self._s["type"] = "array"
    def object(self): self._s["type"] = "object"
    def null(self): self._s["type"] = "null"
    def type_of(self, types): self._s["type"] = types

    # metadata
    def id_(self, url: str): self._s["$id"] = url
    def ref(self, url: str): self._s["$ref"] = url
    def schema(self, url: str): self._s["$schema"] = url
    def desc(self, text: str): self._s["description"] = text
    def title(self, text: str): self._s["title"] = text
    def default(self, value): self._s["default"] = value

    # numeric (builder.rs:149-171)
    def maximum(self, v): self._s["maximum"] = v
    def minimum(self, v): self._s["minimum"] = v
    def exclusive_maximum(self, v): self._s["exclusiveMaximum"] = v
    def exclusive_minimum(self, v): self._s["exclusiveMinimum"] = v
    def multiple_of(self, v): self._s["multipleOf"] = v

    # string
    def max_length(self, v): self._s["maxLength"] = v
    def min_length(self, v): self._s["minLength"] = v
    def pattern(self, v): self._s["pattern"] = v
    def format(self, v): self._s["format"] = v
    def content_encoding(self, v): self._s["contentEncoding"] = v
    def content_media_type(self, v): self._s["contentMediaType"] = v

    # array
    def max_items(self, v): self._s["maxItems"] = v
    def min_items(self, v): self._s["minItems"] = v
    def unique_items(self, v=True): self._s["uniqueItems"] = v

    def items_schema(self, build: "Callable[[SchemaBuilder], Any]"):
        self._s["items"] = schema(build)

    def items_array(self, builds):
        self._s["items"] = [schema(b) for b in builds]

    def contains(self, build):
        self._s["contains"] = schema(build)

    # object
    def max_properties(self, v): self._s["maxProperties"] = v
    def min_properties(self, v): self._s["minProperties"] = v
    def required(self, keys): self._s["required"] = list(keys)

    def properties(self, build: "Callable[[PropertiesBuilder], Any]"):
        p = PropertiesBuilder()
        build(p)
        self._s.setdefault("properties", {}).update(p._props)

    def pattern_properties(self, build):
        p = PropertiesBuilder()
        build(p)
        self._s.setdefault("patternProperties", {}).update(p._props)

    def additional_properties(self, allowed_or_build):
        if isinstance(allowed_or_build, bool):
            self._s["additionalProperties"] = allowed_or_build
        else:
            self._s["additionalProperties"] = schema(allowed_or_build)

    def property_names(self, build):
        self._s["propertyNames"] = schema(build)

    def dependencies(self, deps: dict):
        self._s["dependencies"] = deps

    # values
    def enum(self, values): self._s["enum"] = list(values)
    def const(self, value): self._s["const"] = value

    # combinators
    def all_of(self, builds): self._s["allOf"] = [schema(b) for b in builds]
    def any_of(self, builds): self._s["anyOf"] = [schema(b) for b in builds]
    def one_of(self, builds): self._s["oneOf"] = [schema(b) for b in builds]
    def not_(self, build): self._s["not"] = schema(build)

    def if_then_else(self, if_b, then_b=None, else_b=None):
        self._s["if"] = schema(if_b)
        if then_b is not None:
            self._s["then"] = schema(then_b)
        if else_b is not None:
            self._s["else"] = schema(else_b)

    def custom(self, key: str, value): self._s[key] = value

    def into_json(self) -> dict:
        return self._s


class PropertiesBuilder:
    def __init__(self):
        self._props: dict[str, Any] = {}

    def insert(self, name: str, build: "Callable[[SchemaBuilder], Any]"):
        self._props[name] = schema(build)


def schema(build: "Callable[[SchemaBuilder], Any]") -> dict:
    b = SchemaBuilder()
    build(b)
    return b.into_json()
