"""Format checkers — pure-Python reproductions of the reference's 18
built-in formats (``/root/reference/src/json_schema/validators/formats.rs``).

Each checker takes the string value and returns ``None`` when valid or an
error-detail string (exactly the reference's detail text) when invalid.
Non-string values are skipped by the caller (nonstrict semantics).

Reference quirks preserved deliberately:
* ``time`` — chrono ``%H:%M:%S%.f`` with **no timezone support**
  (formats.rs:286-307); a valid RFC-3339 time with an offset fails.
* ``uri-template`` — the reference's constructor never fails, so every
  string is valid (formats.rs:380-396).
* ``relative-json-pointer`` — the reference parses it with the *absolute*
  JSON-pointer parser (formats.rs:263-284), so true relative pointers like
  ``"1/foo"`` are rejected; we reproduce that.
* ``uuid`` — accepts hyphenated, simple (un-hyphenated), ``urn:uuid:`` and
  braced forms, like the uuid crate (keywords/format.rs:466-477).
* ``email``/``hostname`` — the reference uses a Public-Suffix-List parser
  (formats.rs:69-113); we approximate with an RFC-5321/RFC-1123 syntax
  check requiring a dotted domain with an alphabetic TLD. Golden fixtures
  pin only cases where the two agree.
"""

from __future__ import annotations

import base64
import binascii
import ipaddress
import json
import re
import urllib.parse

MALFORMED_DATE = "Malformed date"
MALFORMED_DATE_LEN = "Malformed Date"  # capital D for the length branch, formats.rs:33


def check_date(s: str) -> str | None:
    # chrono NaiveDate %Y-%m-%d, then len == 10 (formats.rs:15-44)
    m = re.fullmatch(r"(\d{4})-(\d{1,2})-(\d{1,2})", s)
    if not m:
        return MALFORMED_DATE
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if not (1 <= mo <= 12):
        return MALFORMED_DATE
    if not (1 <= d <= _days_in_month(y, mo)):
        return MALFORMED_DATE
    if len(s) != 10:
        return MALFORMED_DATE_LEN
    return None


def _days_in_month(y: int, m: int) -> int:
    if m == 2:
        leap = (y % 4 == 0 and y % 100 != 0) or y % 400 == 0
        return 29 if leap else 28
    return [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31][m - 1]


_DT_RE = re.compile(
    r"(\d{4})-(\d{2})-(\d{2})[Tt ](\d{2}):(\d{2}):(\d{2})(\.\d+)?"
    r"([Zz]|[+-]\d{2}:\d{2})"
)


def check_date_time(s: str) -> str | None:
    # chrono DateTime::parse_from_rfc3339 (formats.rs:46-67)
    m = _DT_RE.fullmatch(s)
    if not m:
        return "Malformed date time"
    y, mo, d, h, mi, sec = (int(m.group(i)) for i in range(1, 7))
    if not (1 <= mo <= 12 and 1 <= d <= _days_in_month(y, mo)):
        return "Malformed date time"
    # chrono accepts leap second 60 (maps to 59.999... + nanos)
    if not (h <= 23 and mi <= 59 and sec <= 60):
        return "Malformed date time"
    off = m.group(8)
    if off not in ("Z", "z"):
        oh, om = int(off[1:3]), int(off[4:6])
        if oh > 23 or om > 59:
            return "Malformed date time"
    return None


_TIME_RE = re.compile(r"(\d{2}):(\d{2}):(\d{2})(\.\d+)?")


def check_time(s: str) -> str | None:
    # chrono NaiveTime %H:%M:%S%.f — NO timezone (formats.rs:286-307)
    m = _TIME_RE.fullmatch(s)
    if not m:
        return "Malformed time"
    h, mi, sec = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if not (h <= 23 and mi <= 59 and sec <= 60):
        return "Malformed time"
    return None


_EMAIL_LOCAL = re.compile(r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~.-]+")
_HOST_LABEL = re.compile(r"(?!-)[A-Za-z0-9-]{1,63}(?<!-)")


def _domain_ok(domain: str) -> bool:
    if len(domain) > 253:
        return False
    labels = domain.split(".")
    if len(labels) < 2:  # PSL parse needs a known suffix -> dotted name
        return False
    if not all(_HOST_LABEL.fullmatch(l) for l in labels):
        return False
    return bool(re.fullmatch(r"[A-Za-z]{2,}", labels[-1]))


def check_email(s: str) -> str | None:
    # addr crate PSL email parse (formats.rs:69-90), approximated
    if s.count("@") != 1:
        return "Malformed email address"
    local, domain = s.split("@")
    if not local or len(local) > 64 or not _EMAIL_LOCAL.fullmatch(local):
        return "Malformed email address"
    if local.startswith(".") or local.endswith(".") or ".." in local:
        return "Malformed email address"
    if not _domain_ok(domain):
        return "Malformed email address"
    return None


def check_hostname(s: str) -> str | None:
    # addr crate PSL domain parse (formats.rs:92-113), approximated
    if not _domain_ok(s):
        return "Malformed hostname"
    return None


# IDN variants: addr's List.parse_email_address / parse_domain_name
# accept UTF-8 labels (RFC 6531 local parts, IDNA domains) with the
# 63-byte limit applied to the PUNYCODE form of each label.
_IDN_LABEL = re.compile(r"(?!-)(?:[^\W_]|-){1,63}(?<!-)", re.UNICODE)


def _idn_label_len_ok(label: str) -> bool:
    if label.isascii():
        return len(label) <= 63
    try:
        return len("xn--" + label.lower().encode("punycode").decode()) <= 63
    except UnicodeError:
        return False


def _idn_domain_ok(domain: str) -> bool:
    if len(domain.encode("utf-8")) > 253:
        return False
    labels = domain.split(".")
    if len(labels) < 2:
        return False
    if not all(_IDN_LABEL.fullmatch(l) and _idn_label_len_ok(l)
               for l in labels):
        return False
    last = labels[-1]
    return (not last.isascii()) or bool(re.fullmatch(r"[A-Za-z]{2,}", last))


def check_idn_hostname(s: str) -> str | None:
    if not _idn_domain_ok(s):
        return "Malformed hostname"
    return None


def check_idn_email(s: str) -> str | None:
    if s.count("@") != 1:
        return "Malformed email address"
    local, domain = s.split("@")
    ascii_part = "".join(c for c in local if c.isascii())
    if (not local or len(local.encode("utf-8")) > 64
            or (ascii_part and not _EMAIL_LOCAL.fullmatch(ascii_part))):
        return "Malformed email address"
    if local.startswith(".") or local.endswith(".") or ".." in local:
        return "Malformed email address"
    if not _idn_domain_ok(domain):
        return "Malformed email address"
    return None


def check_ipv4(s: str) -> str | None:
    # std::net::Ipv4Addr (formats.rs:115-136): rejects leading zeros, like
    # python ipaddress
    try:
        ipaddress.IPv4Address(s)
        return None
    except ValueError:
        return "Malformed IP address"


def check_ipv6(s: str) -> str | None:
    try:
        if "%" in s:  # std::net accepts no zone id in Ipv6Addr::from_str
            return "Malformed IP address"
        ipaddress.IPv6Address(s)
        return None
    except ValueError:
        return "Malformed IP address"


_SCHEME_RE = re.compile(r"[A-Za-z][A-Za-z0-9+.-]*")
_SPECIAL_SCHEMES = {"http", "https", "ws", "wss", "ftp", "file"}


def _parse_absolute_url(s: str) -> str | None:
    """Approximates url::Url::parse (WHATWG): absolute URL with a scheme;
    special schemes require a non-empty host."""
    if any(c in s for c in " \t\n\r"):
        return "relative URL without a base" if ":" not in s else "invalid characters"
    if ":" not in s:
        return "relative URL without a base"
    scheme, rest = s.split(":", 1)
    if not _SCHEME_RE.fullmatch(scheme):
        return "relative URL without a base"
    if scheme.lower() in _SPECIAL_SCHEMES:
        if not rest.startswith("//"):
            return "invalid special URL"
        authority = rest[2:].split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
        host = authority.rsplit("@", 1)[-1]
        if host.startswith("[") :
            if "]" not in host:
                return "invalid IPv6 address"
            inner = host[1:host.index("]")]
            if check_ipv6(inner) is not None:
                return "invalid IPv6 address"
        else:
            host_only = host.rsplit(":", 1)[0] if re.search(r":\d*$", host) else host
            if not host_only:
                return "empty host"
            # a ':' left after port-stripping means a bare IPv6 / bad
            # port — the url crate rejects both (host ends at ':')
            if any(c in host_only for c in "#/?@[]:"):
                return "invalid host"
    return None


def check_uri(s: str) -> str | None:
    err = _parse_absolute_url(s)
    return f"Malformed URI: {err}" if err else None


def check_iri(s: str) -> str | None:
    err = _parse_absolute_url(s)
    return f"Malformed IRI: {err}" if err else None


def _check_reference(s: str, label: str) -> str | None:
    # base.join(s) against http://example.com/ — almost everything passes
    # (formats.rs:184-207)
    if any(c in s for c in "\t\n\r"):
        s = re.sub(r"[\t\n\r]", "", s)
    if "\\" in s.split("#", 1)[0].split("?", 1)[0] and not s.startswith("//"):
        pass  # WHATWG treats \ as / in special URLs; still joins fine
    try:
        urllib.parse.urljoin("http://example.com/", s)
    except ValueError:
        return f"Malformed {label}: join failed"
    # the url crate fails joining when an explicit port is non-numeric
    m = re.match(r"^//[^/?#]*$", s)
    if m and re.search(r":[^0-9\]/]", s.rsplit("@", 1)[-1]):
        return f"Malformed {label}: invalid port"
    return None


def check_uri_reference(s: str) -> str | None:
    return _check_reference(s, "URI reference")


def check_iri_reference(s: str) -> str | None:
    return _check_reference(s, "IRI reference")


def check_uri_template(_s: str) -> str | None:
    # uritemplate::UriTemplate::new never fails (formats.rs:380-396)
    return None


_JSON_POINTER_RE = re.compile(r"(/([^/~]|~[01])*)*")


def check_json_pointer(s: str) -> str | None:
    if _JSON_POINTER_RE.fullmatch(s):
        return None
    return "Malformed JSON pointer"


def check_relative_json_pointer(s: str) -> str | None:
    # reference quirk: same absolute-pointer parser (formats.rs:263-284)
    if _JSON_POINTER_RE.fullmatch(s):
        return None
    return "Malformed relative JSON pointer"


def check_regex(s: str) -> str | None:
    # fancy_regex compile with \/ -> / preprocessing (formats.rs:232-261)
    s = s.replace(r"\/", "/")
    try:
        re.compile(s)
        return None
    except re.error as er:
        return f"Malformed regex - {er}"


_UUID_HEX = "[0-9a-fA-F]"
_UUID_RE = re.compile(
    rf"(urn:uuid:)?({_UUID_HEX}{{8}}-{_UUID_HEX}{{4}}-{_UUID_HEX}{{4}}-"
    rf"{_UUID_HEX}{{4}}-{_UUID_HEX}{{12}}|{_UUID_HEX}{{32}})"
)


def check_uuid(s: str) -> str | None:
    # uuid crate: hyphenated / simple / urn / braced (formats.rs:309-330)
    inner = s
    if inner.startswith("{") and inner.endswith("}"):
        inner = inner[1:-1]
    if _UUID_RE.fullmatch(inner):
        return None
    return "Malformed UUID: invalid format"


def decode_base64_utf8(s: str) -> tuple[str | None, str | None]:
    """contentEncoding: base64 — strict STANDARD alphabet decode then UTF-8
    check (keywords/content_media.rs:52-63). Returns (decoded, error)."""
    try:
        raw = base64.b64decode(s, validate=True)
    except (binascii.Error, ValueError):
        # the reference's detail is the Rust base64 crate's dynamic
        # message ("Invalid byte 42, offset 3..."); Python's binascii
        # wording differs per failure mode, so both engines normalize to
        # a stable prefix the column plans can reproduce exactly
        return None, "Invalid byte"
    try:
        return raw.decode("utf-8"), None
    except UnicodeDecodeError:
        return None, "Invalid UTF-8"


def json_parses(s: str) -> bool:
    """contentMediaType: application/json (keywords/content_media.rs:22-26)."""
    try:
        json.loads(s)
        return True
    except ValueError:
        return False


# registry: format name -> checker (keywords/format.rs:9-142); unknown
# format names are ignored by the compiler (keywords/format.rs:172-175)
FORMAT_CHECKERS = {
    "date": check_date,
    "date-time": check_date_time,
    "time": check_time,
    "email": check_email,
    "idn-email": check_idn_email,
    "hostname": check_hostname,
    "idn-hostname": check_idn_hostname,
    "ipv4": check_ipv4,
    "ipv6": check_ipv6,
    "uri": check_uri,
    "iri": check_iri,
    "uri-reference": check_uri_reference,
    "iri-reference": check_iri_reference,
    "uri-template": check_uri_template,
    "json-pointer": check_json_pointer,
    "relative-json-pointer": check_relative_json_pointer,
    "regex": check_regex,
    "uuid": check_uuid,
}
