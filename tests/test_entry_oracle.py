"""The correctness gate, locally: run queries() entries on Spark and
their oracle_sql() on DuckDB at sf0.01 and require exact equality
(driver-mimic; see oracle_compare.py).

Default scope (VERDICT r14 #1): the FIRST ~60 rows of queries() —
priority order, i.e. a strict superset of the driver's ~50-row
correctness window, and it rotates round-over-round exactly as the
window does (scripts/rotate_priority.py maintains the order). The full
298-row sweep ran 25-30 min by itself, which pushed the whole suite
past the driver's verify budget (r14 shipped with tests_ok=false on a
timeout, not a failure). Set HDK_FULL_ORACLE=1 for the full sweep
(scripts/vanilla_gate.py also covers all 298 out-of-band; run it at
least once per round)."""

import os

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_CORRECT
from tests.oracle_compare import assert_frames_match

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

_FULL = os.environ.get("HDK_FULL_ORACLE") == "1"
_DEFAULT_WINDOW = 60
_CHECKED = sorted(QUERIES) if _FULL else sorted(
    list(QUERIES)[:_DEFAULT_WINDOW])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


@pytest.mark.parametrize("name", _CHECKED)
def test_query_against_oracle(name, spark, duck):
    q = QUERIES[name]
    spark_df = q(spark, SF_CORRECT)
    if name not in ORACLES:
        # rows-only contract for non-SQL-expressible ops
        assert spark_df.count() >= 0
        return
    rel = duck.sql(ORACLES[name])
    assert_frames_match(spark_df, rel, name)


def test_no_duplicate_contract_row_registrations():
    """A repeated SPARK_IMPLS[...] / ORACLES[...] key would silently
    overwrite an earlier contract row (the dict cousin of the
    shadowed-def regression) — fail loudly instead."""
    import collections
    import pathlib
    import re

    src = (pathlib.Path(__file__).parents[1]
           / "hdk_spark" / "entry_queries.py").read_text()
    for reg in ("SPARK_IMPLS", "ORACLES"):
        keys = re.findall(rf'{reg}\["([^"]+)"\]\s*=', src)
        dupes = [k for k, c in collections.Counter(keys).items() if c > 1]
        assert not dupes, f"duplicate {reg} registrations: {dupes}"
