"""URL / JSON-pointer identity helpers for schema addressing.

Mirrors the reference's URL-based schema identity scheme
(``/root/reference/src/json_schema/helpers.rs:8-122``): every schema node is
addressed by ``<base-url>#/<json-pointer>``; anchors (draft 2019-09) are
non-slash fragments kept attached to the base.
"""

from __future__ import annotations

import itertools
import urllib.parse

# Let urljoin understand our generated scheme.
for _lst in (urllib.parse.uses_relative, urllib.parse.uses_netloc,
             urllib.parse.uses_fragment):
    if "json-schema" not in _lst:
        _lst.append("json-schema")

_gen_counter = itertools.count()


def generate_id() -> str:
    """Deterministic stand-in for helpers.rs:8-11 (uuid-based there; the id
    only needs to be unique within one compiler run)."""
    return f"json-schema://gen-{next(_gen_counter):08x}/"


# percent-encode set from helpers.rs:14-27 (CONTROLS + space " # < > %)
_QUERY_SET = set(chr(c) for c in range(0x21)) | {'"', "#", "<", ">", "%", "\x7f"}


def encode(segment: str) -> str:
    """JSON-pointer token escape + percent-encoding (helpers.rs:14-27)."""
    s = segment.replace("~", "~0").replace("/", "~1")
    out = []
    for ch in s:
        if ch in _QUERY_SET:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
        else:
            out.append(ch)
    return "".join(out)


def connect(parts: list[str]) -> str:
    return "/".join(encode(p) for p in parts)


def url_join(base: str, ref: str) -> str:
    """RFC-3986 join of ``ref`` against ``base`` (url crate's base_url join)."""
    return urllib.parse.urljoin(base, ref)


def split_fragment(url: str) -> tuple[str, str | None]:
    """Fragments stay percent-ENCODED, like the Rust url crate's
    ``Url::fragment()`` — tree keys are stored encoded (``encode``), so
    resolution compares encoded-to-encoded. Unquoting here broke lookups
    for keys containing percent-encoded characters (e.g. newlines)."""
    if "#" in url:
        base, frag = url.split("#", 1)
        return base, frag
    return url, None


def alter_fragment_path(url: str, new_fragment: str) -> str:
    """helpers.rs:68-94 — replace/extend the fragment with a pointer path."""
    normalized = new_fragment[1:] if new_fragment.startswith("/") else new_fragment
    base, frag = split_fragment(url)
    if frag:
        if not frag.startswith("/"):
            # anchor fragment: keep anchor head, append pointer
            head = frag.split("/", 1)[0]
            result = "#" + head + "/" + normalized
        else:
            result = "/" + normalized
    else:
        result = "/" + normalized
    return base + "#" + result


def serialize_schema_path(url: str) -> tuple[str, str | None]:
    """helpers.rs:96-122 — split a schema URL into (registry key, pointer).

    Anchor fragments (not starting with '/') stay in the registry key:
    ``http://x#anchor/ptr`` -> (``http://x#anchor``, ``/ptr``).
    """
    base, frag = split_fragment(url)
    if frag:
        if not frag.startswith("/"):
            parts = frag.split("/")
            key = base + "#" + parts[0]
            pointer = "/" + "/".join(parts[1:]) if len(parts) > 1 else None
            return key, pointer
        return base, frag
    return base, None
