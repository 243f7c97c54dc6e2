"""Canonical rulesets used by tests, the entrypoint, and the bench.

These are ordinary valico-dialect JSON Schemas — the engine's input
language. DOCS_RULESET covers the interleaved-docs input table
(BASELINE.json input_hint); MEDIA_RULESET the referential target;
ORDERS/LINEITEM rulesets audit the TPC-H-ish tables.
"""

DOCS_RULESET = {
    "type": "object",
    "required": ["doc_id", "spans"],
    "properties": {
        "doc_id": {
            "type": "string",
            "pattern": "^p[0-9]{2}-[0-9]{10}$",
            "minLength": 14,
            "maxLength": 14,
        },
        "spans": {
            "type": "array",
            "minItems": 1,
            "maxItems": 1000,
            "items": {
                "type": "object",
                "required": ["kind", "offset"],
                "properties": {
                    "kind": {"enum": ["text", "image", "audio", "ref"]},
                    "text": {"type": "string", "maxLength": 10000},
                    "media_ref": {"type": "string",
                                  "pattern": "^m[0-9]{8}$"},
                    "offset": {"type": "integer", "minimum": 0,
                               "maximum": 1000000000},
                },
            },
        },
    },
}

MEDIA_RULESET = {
    "type": "object",
    "required": ["media_ref", "media_type", "size_bytes", "checksum"],
    "properties": {
        "media_ref": {"type": "string", "pattern": "^m[0-9]{8}$"},
        "media_type": {"enum": ["image", "audio"]},
        "size_bytes": {"type": "integer", "minimum": 0,
                       "maximum": 100000000},
        "checksum": {"type": "string", "pattern": "^[0-9a-f]{64}$"},
    },
}

ORDERS_RULESET = {
    "type": "object",
    "required": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    "properties": {
        "o_orderstatus": {"enum": ["O", "F", "P"]},
        "o_totalprice": {"type": "number", "exclusiveMinimum": 0,
                         "maximum": 1000000},
        "o_orderpriority": {"type": "string",
                            "pattern": "^[1-5]-[A-Z ]+$"},
    },
}

LINEITEM_RULESET = {
    "type": "object",
    "required": ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"],
    "properties": {
        "l_quantity": {"type": "number", "minimum": 1, "maximum": 50},
        "l_discount": {"type": "number", "minimum": 0, "maximum": 0.11},
        "l_tax": {"type": "number", "minimum": 0, "maximum": 0.09},
        "l_returnflag": {"enum": ["A", "N", "R"]},
        "l_linestatus": {"enum": ["O", "F"]},
        "l_linenumber": {"type": "integer", "minimum": 1, "maximum": 7},
    },
}
