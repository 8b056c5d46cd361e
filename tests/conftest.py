from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ml_feature_store_enterprise_grade_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

#: Default test tier (VERDICT r13 item 6): the full suite is ~30 min,
#: which overruns the verify driver's pytest window, so nodeids listed
#: in tests/slow_tests.json carry the ``slow`` marker and are
#: DESELECTED unless the caller opts in.  The manifest trims the
#: oracle-parity sweep to the driver's 50-query window plus the
#: cheapest query per operator module (every family stays covered; a
#: NEWLY registered query is not in the manifest and therefore runs by
#: default), and sheds only individually-measured >3 s tests
#: elsewhere.  Opt-ins: SPARK_GRAFT_FULL_TESTS=1, or any explicit -m
#: expression (e.g. ``-m "slow or not slow"``).  Regenerate the
#: manifest from a ``pytest tests/ -q --durations=0`` run using the
#: criteria in its _comment field.
_SLOW_MANIFEST = os.path.join(os.path.dirname(__file__), "slow_tests.json")


def _slow_nodeids() -> frozenset[str]:
    try:
        with open(_SLOW_MANIFEST) as fh:
            return frozenset(json.load(fh)["slow"])
    except OSError:
        return frozenset()


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1":
        return
    if config.option.markexpr:
        return  # an explicit -m expression takes full control
    slow = _slow_nodeids()
    keep, drop = [], []
    for item in items:
        (drop if item.nodeid in slow else keep).append(item)
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = keep


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    s.stop()
