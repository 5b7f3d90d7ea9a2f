"""MQTT topic-filter matching, compiled to a native Column regex.

Semantics match the reference matcher (reference: internal/router/
router.go:422-448, duplicated internal/mqtt/mqtt.go:123-154), pinned by
the 10-case truth table in internal/router/router_test.go:9-36:

- ``filter == topic`` always matches (even when the filter contains
  wildcard characters used literally, e.g. filter ``a/#/b`` matches
  topic ``a/#/b`` via the equality fast path).
- ``#`` alone matches every topic.
- ``+`` matches exactly one level, which may be empty (``ruuvi/+/data``
  matches ``ruuvi//data``) but must exist (``ruuvi/+`` does not match
  ``ruuvi``).
- a trailing ``/#`` matches the parent level itself and any number of
  deeper levels (``ruuvi/#`` matches ``ruuvi`` and ``ruuvi/a/b``).
- ``#`` anywhere but the last segment never matches structurally (only
  the literal-equality fast path can match such a filter).

The filter is compiled ONCE (driver side, plan-construction time) to an
anchored regex, so the per-row work is a single JVM-side ``rlike`` —
whole-stage-codegen friendly, no Python UDF, and Catalyst can push it
into the scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_META = re.compile(r"[.^$*+?{}\[\]\\|()]")


def _esc(segment: str) -> str:
    return _META.sub(lambda m: "\\" + m.group(0), segment)


def topic_filter_to_regex(filt: str) -> str:
    """Compile an MQTT topic filter to an anchored regex string.

    The same regex string is valid for Spark ``rlike`` and DuckDB
    ``regexp_matches`` (both RE2-ish dialects; only basic classes used).
    """
    if filt == "#":
        return "^.*$"
    segs = filt.split("/")
    # '#' at a non-final position structurally never matches; the Go code
    # still matches the literal topic via the equality fast path.
    if "#" in segs[:-1]:
        return "^" + _esc(filt) + "$"
    parts: list[str] = []
    for i, s in enumerate(segs):
        if s == "#":  # guaranteed last here
            # trailing '#' also matches the parent itself: drop the
            # preceding '/' into the optional group.
            prev = "/".join(parts)
            return "^" + prev + "(/.*)?$"
        parts.append("[^/]*" if s == "+" else _esc(s))
    return "^" + "/".join(parts) + "$"


def topic_matches(filt: str, topic: Column | str) -> Column:
    """Native Column predicate: does ``topic`` match MQTT filter ``filt``."""
    col = F.col(topic) if isinstance(topic, str) else topic
    # equality fast path ORed in so literal-wildcard filters behave like
    # the reference (router.go:423).
    return (col == F.lit(filt)) | col.rlike(topic_filter_to_regex(filt))


def topic_matches_py(filt: str, topic: str) -> bool:
    """Plan-time / test helper with identical semantics."""
    if filt == topic:
        return True
    return re.match(topic_filter_to_regex(filt), topic) is not None
