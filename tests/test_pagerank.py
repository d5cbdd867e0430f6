"""Fixed-point integer PageRank (operators/graph.pagerank).

The oracle artifact hash-checks sim_pagerank_centrality end to end
against DuckDB; these tests pin the arithmetic on a hand-computed graph
so a convention drift (floor-div direction, damping order, teleport
base) fails with readable numbers instead of a hash mismatch.
"""

from data_pipeline_agent_spark.operators.graph import PR_UNIT, pagerank

# N=3: base = PR_UNIT // 3, teleport = (15 * base) // 100
BASE = PR_UNIT // 3
TELEPORT = (15 * BASE) // 100


def _run(spark, edges, nodes, iters):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    return {
        r["node"]: r["pr_u"]
        for r in pagerank(e, n, n_nodes=len(nodes), iters=iters).collect()
    }


def test_one_iteration_hand_computed(spark):
    # 1->2, 2->1, 2->3: deg(1)=1, deg(2)=2
    got = _run(spark, [(1, 2), (2, 1), (2, 3)], [1, 2, 3], iters=1)
    half = BASE // 2
    assert got[1] == TELEPORT + (85 * half) // 100
    assert got[2] == TELEPORT + (85 * BASE) // 100
    assert got[3] == TELEPORT + (85 * half) // 100


def test_isolated_node_gets_teleport_only(spark):
    got = _run(spark, [(1, 2)], [1, 2, 3], iters=3)
    # 1 and 3 never receive an edge -> pure teleport; 2 accumulates
    assert got[1] == got[3] == TELEPORT
    assert got[2] > TELEPORT


def test_mass_is_bounded_and_deterministic(spark):
    edges = [(i, (i + 1) % 5) for i in range(5)] + [(0, 2), (3, 1)]
    a = _run(spark, edges, list(range(5)), iters=3)
    b = _run(spark, edges, list(range(5)), iters=3)
    assert a == b  # integer arithmetic: run-to-run identical
    # total mass can only shrink (floor division + dropped dangling)
    assert sum(a.values()) <= PR_UNIT // 5 * 5
    assert all(v >= (15 * (PR_UNIT // 5)) // 100 for v in a.values())
