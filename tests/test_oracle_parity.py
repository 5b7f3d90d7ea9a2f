"""In-suite oracle parity gate: every oracle-backed ``queries()`` entry
must hash-match its DuckDB SQL at smoke scale. The driver runs the same
comparison at sf0.01; this catches parity regressions in CI-time."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

import __spark_entry__ as E
from check_correctness import compare_query, duckdb_connection

from conftest import SF_SMOKE

ORACLES = E.oracle_sql()
QUERIES = E.queries()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, con, name):
    problems = compare_query(spark, con, QUERIES[name], ORACLES[name], SF_SMOKE)
    assert not problems, problems
