"""Module-integrity checks over the public API surface.

Round-9 verdict found two ``__all__`` lists with missing commas
("frequent_items"  "cms_build" silently concatenates into the bogus
name "frequent_itemscms_build", so ``from module import *`` raises
AttributeError). These tests walk every module under ``hdk_spark``
and pin that each ``__all__`` entry actually resolves, so the defect
class cannot recur.
"""

from __future__ import annotations

import importlib
import pkgutil

import pytest

import hdk_spark


def _iter_modules():
    yield "hdk_spark", hdk_spark
    for pkg in (hdk_spark,):
        for info in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
            yield info.name, importlib.import_module(info.name)


_MODULES = dict(_iter_modules())


@pytest.mark.parametrize("modname", sorted(_MODULES))
def test_all_entries_resolve(modname):
    mod = _MODULES[modname]
    exported = getattr(mod, "__all__", None)
    if exported is None:
        pytest.skip(f"{modname} defines no __all__")
    assert isinstance(exported, (list, tuple)), f"{modname}.__all__ wrong type"
    for name in exported:
        # A concatenated pair (missing comma) shows up as one long
        # name that hasattr cannot resolve.
        assert hasattr(mod, name), (
            f"{modname}.__all__ lists {name!r} which does not resolve — "
            "likely a missing comma concatenating two adjacent entries"
        )
    assert len(set(exported)) == len(exported), f"{modname}.__all__ has dupes"


@pytest.mark.parametrize("modname", sorted(_MODULES))
def test_star_import_works(modname):
    mod = _MODULES[modname]
    if getattr(mod, "__all__", None) is None:
        pytest.skip(f"{modname} defines no __all__")
    ns: dict = {}
    exec(f"from {modname} import *", ns)  # noqa: S102 - test-only
    for name in mod.__all__:
        assert name in ns, f"star-import of {modname} dropped {name}"


def test_priority_window_covers_every_contract_row():
    """The r9 operational miss, made structurally impossible: every
    queries() entry must appear in _PRIORITY exactly once (a row
    absent from the committed list would never rotate into the
    driver's ~50-row check window), every _PRIORITY name must still
    resolve to a live query (no ghosts after a rename), and the list
    must be duplicate-free (a dupe eats a window slot)."""
    import __spark_entry__ as entry

    names = set(entry.queries())
    prio = entry._PRIORITY
    assert len(set(prio)) == len(prio), "duplicate _PRIORITY entries"
    missing = names - set(prio)
    assert not missing, f"contract rows absent from _PRIORITY: {missing}"
    ghosts = set(prio) - names
    assert not ghosts, f"_PRIORITY names with no live query: {ghosts}"


def test_readme_query_count_matches_registry():
    """The README's 'exposes N named queries' claim is regenerated
    from len(queries()) — this pins it so the count cannot drift
    (VERDICT r9 doc-staleness item, made structural)."""
    import pathlib
    import re

    import __spark_entry__ as entry

    readme = (pathlib.Path(__file__).parents[1] / "README.md").read_text()
    m = re.search(r"exposes (\d+) named queries", readme)
    assert m, "README lost the query-count sentence"
    assert int(m.group(1)) == len(entry.queries()), (
        "README query count drifted — run: python -c \"import "
        "__spark_entry__ as e; print(len(e.queries()))\" and update"
    )
