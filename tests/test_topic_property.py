"""Property-based conformance: the compiled-regex matcher must agree
with a direct port of the reference's segment-walk algorithm
(reference: internal/router/router.go:422-448) on ALL inputs, not just
the curated truth table — the upgrade over the reference's test
strategy (SURVEY §5: no property-based testing there)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hermod_spark.functions.topic import topic_matches_py


def go_topic_matches(filt: str, topic: str) -> bool:
    """Line-by-line port of the Go matcher — the independent oracle."""
    if filt == topic or filt == "#":
        return True
    fs = filt.split("/")
    ts = topic.split("/")
    for i in range(len(fs)):
        if i >= len(ts):
            return fs[i] == "#" and i == len(fs) - 1
        if fs[i] == "#":
            return i == len(fs) - 1
        if fs[i] == "+":
            continue
        if fs[i] != ts[i]:
            return False
    return len(ts) == len(fs)


# Segments drawn from a small alphabet plus wildcard/empty/metachar
# segments so collisions and tricky shapes are common.
segment = st.sampled_from(["a", "b", "ab", "", "+", "#", "a.b", "a+b", "x*"])
path = st.lists(segment, min_size=1, max_size=5).map("/".join)


@settings(max_examples=2000, deadline=None)
@given(filt=path, topic=path)
def test_matches_go_semantics(filt, topic):
    assert topic_matches_py(filt, topic) == go_topic_matches(filt, topic), (
        filt,
        topic,
    )


@settings(max_examples=500, deadline=None)
@given(topic=path)
def test_hash_matches_everything(topic):
    assert topic_matches_py("#", topic)


@settings(max_examples=500, deadline=None)
@given(filt=path)
def test_filter_matches_itself(filt):
    # equality fast path (router.go:423) — even wildcard-literal filters
    assert topic_matches_py(filt, filt)
