"""hermod_spark.state meta-swap hygiene (ADVICE r13 items).

- write_meta must sweep ALL stale ``.old-<meta>-*`` asides after a
  successful swap, not just its own pid's: a crash after swap-in but
  before aside-delete leaves an aside from another pid that would
  otherwise never be collected and could shadow a later genuine
  crashed swap.
- read_meta's crashed-swap recovery message must point at the NEWEST
  aside (by modification time) when several coexist.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from hermod_spark import state as S


def _names(root):
    return set(os.listdir(root))


def test_write_meta_sweeps_foreign_stale_asides(spark, tmp_path):
    root = str(tmp_path / "st")
    S.write_meta(spark, root, "_m.json", {"v": 1})
    # simulate a crashed prior writer from ANOTHER pid: swap-in done,
    # aside delete never ran
    stale = os.path.join(root, ".old-_m.json-99999")
    with open(stale, "w") as f:
        f.write(json.dumps({"v": 0}))
    assert ".old-_m.json-99999" in _names(root)
    S.write_meta(spark, root, "_m.json", {"v": 2})
    left = {n for n in _names(root) if n.startswith(".old-_m.json-")}
    assert left == set(), f"stale asides not swept: {left}"
    got = S.read_meta(spark, root, "_m.json", "test", {})
    assert got == {"v": 2}


def test_read_meta_recovery_points_at_newest_aside(spark, tmp_path):
    root = str(tmp_path / "st2")
    os.makedirs(root)
    old1 = os.path.join(root, ".old-_m.json-11111")
    old2 = os.path.join(root, ".old-_m.json-22222")
    with open(old1, "w") as f:
        f.write(json.dumps({"v": "ancient"}))
    with open(old2, "w") as f:
        f.write(json.dumps({"v": "latest"}))
    now = time.time()
    os.utime(old1, (now - 1000, now - 1000))
    os.utime(old2, (now, now))
    with pytest.raises(IOError, match="22222"):
        S.read_meta(spark, root, "_m.json", "test", {})
    # and the other order, to pin mtime (not name) as the tiebreak
    os.utime(old1, (now + 10, now + 10))
    with pytest.raises(IOError, match="11111"):
        S.read_meta(spark, root, "_m.json", "test", {})
