"""String format / pattern detectors.

Reference: Annotations object at
/root/reference/src/main/scala/com.snowplowanalytics/schemaguru/generators/SchemaGenerator.scala:152-222.
Priority chain (first match wins): uuid -> date-time (len > 10) -> ipv4/ipv6
-> uri; pattern chain: base64 (with quantity/length suppression guard).

Two surfaces:
- scalar ``suggest_*(s) -> Optional[str]`` used inside per-document recursion;
- vectorized ``detect_format_series(pd.Series) -> pd.Series`` for flat string
  columns (pandas str ops, Arrow-batched — no per-row Python UDFs).
"""

from __future__ import annotations

import ipaddress
import re
from datetime import datetime
from typing import Optional

# Strict RFC-4122 textual layout. The reference uses java.util.UUID.fromString
# (SchemaGenerator.scala:169-176), which tolerates short hex groups; we use the
# canonical 8-4-4-4-12 form, which covers every vector the reference tests
# (StringFormatAnnotationSpec.scala:33,45) and is what real UUIDs look like.
UUID_RE = re.compile(
    r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)

IPV4_RE = re.compile(
    r"^(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
    r"(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}$"
)

# commons-validator UrlValidator default schemes are http/https/ftp
# (SchemaGenerator.scala:185-189). Authority must look like a host with a TLD,
# an IPv4, or localhost.
URL_RE = re.compile(
    r"^(?:https?|ftp)://"
    r"(?:[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?\.)+[A-Za-z]{2,}"
    r"|^(?:https?|ftp)://localhost"
    r"|^(?:https?|ftp)://(?:\d{1,3}\.){3}\d{1,3}"
)
URL_FULL_RE = re.compile(
    r"^(?:https?|ftp)://"
    r"(?:(?:[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?\.)+[A-Za-z]{2,}|localhost|(?:\d{1,3}\.){3}\d{1,3})"
    r"(?::\d{1,5})?"
    r"(?:[/?#][^\s]*)?$"
)

# Verbatim from SchemaGenerator.scala:195.
BASE64_PATTERN = (
    "^([A-Za-z0-9+/]{4})*([A-Za-z0-9+/]{4}|[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{2}==)$"
)
BASE64_RE = re.compile(BASE64_PATTERN)

ISO_BASIC_RE = re.compile(r"^\d{4}-\d{2}-\d{2}([T ].*)?$")


def suggest_uuid(s: str) -> Optional[str]:
    """SchemaGenerator.scala:169-176. O(1) length/dash prefilter — the
    regex only accepts the canonical 36-char layout."""
    if len(s) != 36 or s[8] != "-" or s[13] != "-":
        return None
    return "uuid" if UUID_RE.match(s) else None


def suggest_time(s: str) -> Optional[str]:
    """ISO-8601 date-time, only for strings longer than 10 chars — the
    truncation guard excluding bare dates (SchemaGenerator.scala:158-167).
    Slicing prefilter equivalent to the YYYY-MM-DD[T ] shape check."""
    if len(s) <= 10:
        return None
    if (s[4] != "-" or s[7] != "-" or s[10] not in "T "
            or not s[:4].isdigit() or not s[5:7].isdigit()
            or not s[8:10].isdigit()):
        return None
    try:
        datetime.fromisoformat(s.replace("Z", "+00:00"))
        return "date-time"
    except ValueError:
        return None


def suggest_ip(s: str) -> Optional[str]:
    """ipv4 then ipv6 (SchemaGenerator.scala:178-183)."""
    n = len(s)
    if 7 <= n <= 15 and s[0].isdigit() and s.count(".") == 3 \
            and IPV4_RE.match(s):
        return "ipv4"
    if ":" in s and "/" not in s and s.count(":") >= 2:
        # same prefilter as the fused chain (suggest_format): valid
        # IPv6 literals have >= 2 colons and no slash
        try:
            ipaddress.IPv6Address(s)
            return "ipv6"
        except ValueError:
            return None
    return None


_URL_PREFIXES = ("http://", "https://", "ftp://")


def suggest_url(s: str) -> Optional[str]:
    """SchemaGenerator.scala:185-189. Scheme prefilter before regex."""
    if not s.startswith(_URL_PREFIXES):
        return None
    return "uri" if URL_FULL_RE.match(s) else None


FORMAT_SUGGESTIONS = (suggest_uuid, suggest_time, suggest_ip, suggest_url)


def suggest_format(s: str) -> Optional[str]:
    """First-match priority chain uuid -> date-time -> ip -> url
    (SchemaGenerator.scala:202-222). Fused single function: the O(1)
    prefilters of the four detectors run inline — per-string call
    overhead matters; this sits inside the per-document hot loop.
    Semantics identical to chaining FORMAT_SUGGESTIONS (pinned by
    tests/test_core_formats.py)."""
    n = len(s)
    if n == 36 and s[8] == "-" and s[13] == "-" and UUID_RE.match(s):
        return "uuid"
    if (n > 10 and s[4] == "-" and s[7] == "-" and s[10] in "T "
            and s[:4].isdigit() and s[5:7].isdigit() and s[8:10].isdigit()):
        try:
            datetime.fromisoformat(s.replace("Z", "+00:00"))
            return "date-time"
        except ValueError:
            pass
    if 7 <= n <= 15 and s[0].isdigit() and s.count(".") == 3 \
            and IPV4_RE.match(s):
        return "ipv4"
    if ":" in s and "/" not in s and s.count(":") >= 2:
        # prefilter: a valid IPv6 literal has >= 2 colons and never a
        # slash — URLs and timestamps skip the (expensive) parse+raise
        try:
            ipaddress.IPv6Address(s)
            return "ipv6"
        except ValueError:
            pass
        # note: a string with ':' can still be a URL; fall through
    if s.startswith(_URL_PREFIXES) and URL_FULL_RE.match(s):
        return "uri"
    return None


def suggest_base64(s: str, quantity: Optional[int]) -> Optional[str]:
    """Base64 pattern with the small-instance-set suppression: when the
    total quantity is known and < 10 AND the string is shorter than 32
    chars, no suggestion (SchemaGenerator.scala:191-200). Every match of
    the pattern has length % 4 == 0 and >= 4 — O(1) prefilter."""
    n = len(s)
    if quantity is not None and quantity < 10 and n < 32:
        return None
    if n < 4 or n % 4 != 0:
        return None
    return BASE64_PATTERN if BASE64_RE.match(s) else None


def detect_format_series(values):
    """Vectorized format detection over a pandas Series of strings.

    Same precedence as ``suggest_format`` but computed with pandas str
    kernels — for use in Arrow-batched UDFs over flat string columns.
    Returns a Series of {'uuid','date-time','ipv4','ipv6','uri', None}.
    """
    import numpy as np
    import pandas as pd

    s = values.astype("string")
    is_uuid = s.str.match(UUID_RE.pattern, na=False)
    longish = s.str.len().fillna(0) > 10
    iso_shape = s.str.match(
        r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2})?(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$",
        na=False,
    )
    # pd.to_datetime validates the calendar (month 13 etc.)
    parsed = pd.to_datetime(
        s.where(iso_shape & longish), errors="coerce", utc=True, format="ISO8601"
    )
    is_dt = parsed.notna() & longish
    # fromisoformat accepts ISO forms the fast regex doesn't (hour-only
    # '2020-01-01T01', compact '...T010203', comma fractions) — route
    # regex MISSES that still carry the date prefix through the scalar
    # detector so the two surfaces stay exactly equivalent. Rare by
    # construction: only date-prefixed strings that fail the common
    # shape pay the per-element call.
    exotic = longish & ~iso_shape & s.str.match(
        r"^\d{4}-\d{2}-\d{2}[T ]", na=False)
    if exotic.any():
        extra = s[exotic].apply(
            lambda x: suggest_time(x) == "date-time")
        is_dt = is_dt | extra.reindex(s.index, fill_value=False)
    is_ip4 = s.str.match(IPV4_RE.pattern, na=False)
    is_ip6 = s.str.contains(":", na=False) & s.apply(
        lambda x: isinstance(x, str) and suggest_ip(x) == "ipv6"
    )
    is_uri = s.str.match(URL_FULL_RE.pattern, na=False)
    out = np.select(
        [is_uuid, is_dt, is_ip4, is_ip6, is_uri],
        ["uuid", "date-time", "ipv4", "ipv6", "uri"],
        default=None,
    )
    return pd.Series(out, index=values.index, dtype="object")
