"""walk_mass: integer diffusion semantics on a hand-built graph."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from covertree_spark.operators.graph_metrics import walk_mass  # noqa: E402


@pytest.mark.usefixtures("spark")
def test_walk_mass_hand_graph(spark):
    # path graph 0-1-2 plus isolated 3; degrees: 1, 2, 1, 0
    edges = spark.createDataFrame(
        [(0, 1), (1, 2)], "src bigint, dst bigint"
    )
    nodes = spark.createDataFrame([(0,), (1,), (2,), (3,)], "id bigint")
    # round 1: m(0)=m(2)=1000//2=500, m(1)=1000+1000=2000, m(3)=0
    got = {
        r.id: r.mass
        for r in walk_mass(edges, nodes, rounds=1, init=1000).collect()
    }
    assert got == {0: 500, 1: 2000, 2: 500, 3: 0}
    # round 2: m(0)=m(2)=2000//2=1000, m(1)=500+500=1000
    got2 = {
        r.id: r.mass
        for r in walk_mass(edges, nodes, rounds=2, init=1000).collect()
    }
    assert got2 == {0: 1000, 1: 1000, 2: 1000, 3: 0}
    # duplicate/reversed input edges must not change the symmetrized set
    noisy = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (1, 2), (2, 2)], "src bigint, dst bigint"
    )
    got3 = {
        r.id: r.mass
        for r in walk_mass(noisy, nodes, rounds=1, init=1000).collect()
    }
    assert got3 == got
