"""Unit tests for integer-exact PageRank."""


def test_pagerank_cycle_is_uniform(spark):
    from dlt_spark.dataops.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], ["src", "dst"]
    )
    out = pagerank(edges, iters=5).collect()
    ranks = {r["id"]: r["rank_nano"] for r in out}
    # a 3-cycle is rank-symmetric and the integer update is a fixed
    # point: base + (17 * init) // 20 == init for init = 1e9 // 3
    assert len(set(ranks.values())) == 1
    assert ranks[1] == 333333333


def test_pagerank_star_center_dominates(spark):
    from pyspark.sql import functions as F

    from dlt_spark.dataops.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (4, 9), (9, 1)], ["src", "dst"]
    )
    ranks = {r["id"]: r["rank_nano"] for r in pagerank(edges, iters=3).collect()}
    assert ranks[9] == max(ranks.values())
    assert ranks[9] > 3 * ranks[2]  # spokes 2..4 get only the base term
    # node 1 receives the center's whole rank: second place
    assert ranks[1] > ranks[2]


def test_pagerank_partitioning_invariant(spark):
    from dlt_spark.dataops.graph import pagerank

    rows = [(i, (i * 7 + 3) % 50) for i in range(300) if i != (i * 7 + 3) % 50]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    a = sorted(map(tuple, pagerank(edges, iters=3).collect()))
    b = sorted(
        map(tuple, pagerank(edges.repartition(13, "dst"), iters=3).collect())
    )
    assert a == b


def test_pagerank_checkpoint_matches_plain(spark):
    from dlt_spark.dataops.graph import pagerank

    rows = [(i % 20, (i * 3 + 1) % 20) for i in range(100) if i % 20 != (i * 3 + 1) % 20]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    plain = sorted(map(tuple, pagerank(edges, iters=4).collect()))
    ckpt = sorted(
        map(tuple, pagerank(edges, iters=4, checkpoint_every=2).collect())
    )
    assert plain == ckpt


def test_triangle_count_known_graphs(spark):
    from dlt_spark.dataops.graph import triangle_count

    # K4: 4 triangles, 6 edges, plus a pendant node (no new triangles)
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b] + [(3, 9)]
    df = spark.createDataFrame(k4, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == 4
    assert row["n_edges"] == 7 and row["n_nodes"] == 5

    # duplicate / reversed / self-loop edges canonicalize away
    noisy = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)], "src long, dst long"
    )
    row = triangle_count(noisy).collect()[0]
    assert row["n_triangles"] == 1 and row["n_edges"] == 3

    # star graph: all edges point INTO the hub under degree ordering,
    # so zero oriented wedges — the skew guard working as designed
    star = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    row = triangle_count(star).collect()[0]
    assert row["n_triangles"] == 0 and row["n_wedges"] == 0


def test_hits_authority_orders_by_indegree_structure(spark):
    from dlt_spark.dataops.graph import hits

    # hub 0 links to {1,2,3}; hub 9 links to {1}; authority 1 has the
    # most in-links from the strongest hub set
    edges = [(0, 1), (0, 2), (0, 3), (9, 1), (8, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["id"]: r for r in hits(df, iters=3).collect()}
    assert out[1]["authority_nano"] > out[2]["authority_nano"] > 0
    assert out[2]["authority_nano"] == out[3]["authority_nano"]
    assert out[0]["hub_nano"] > out[9]["hub_nano"]
    # pure hubs have zero authority, pure authorities zero hub
    assert out[0]["authority_nano"] == 0 and out[1]["hub_nano"] == 0
    # L1 mass conserved up to integer-division remainders
    assert sum(r["authority_nano"] for r in out.values()) <= 10**9


def test_triangle_count_matches_bruteforce_random_graphs(spark):
    """Seeded Erdős–Rényi graphs: the oriented-wedge count must equal a
    brute-force itertools enumeration."""
    import itertools
    import random

    from dlt_spark.dataops.graph import triangle_count

    for seed, n, p in [(1, 12, 0.3), (2, 15, 0.5), (3, 10, 0.8)]:
        rnd = random.Random(seed)
        edges = [(a, b) for a in range(n) for b in range(a + 1, n) if rnd.random() < p]
        adj = set(edges)
        expected = sum(
            1
            for x, y, z in itertools.combinations(range(n), 3)
            if (x, y) in adj and (y, z) in adj and (x, z) in adj
        )
        df = spark.createDataFrame(edges, "src long, dst long")
        row = triangle_count(df).collect()[0]
        assert row["n_triangles"] == expected, (seed, expected, row)
        assert row["n_edges"] == len(edges)


def test_clustering_coefficient_known_values(spark):
    from dlt_spark.dataops.graph import clustering_coefficient

    # triangle 1-2-3 plus pendant 4 on node 1
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4)], "src long, dst long"
    )
    out = {r["id"]: r for r in clustering_coefficient(df).collect()}
    # node 1: deg 3, 1 triangle -> 2*1/(3*2) = 1/3
    assert out[1]["degree"] == 3 and out[1]["triangles"] == 1
    assert out[1]["coefficient_nano"] == 333_333_333
    # nodes 2,3: deg 2, 1 triangle -> coefficient 1.0
    assert out[2]["coefficient_nano"] == out[3]["coefficient_nano"] == 1_000_000_000
    # pendant: deg 1 -> 0
    assert out[4]["triangles"] == 0 and out[4]["coefficient_nano"] == 0


def test_clustering_coefficient_zero_triangle_node_is_zero_and_hits_iter0(spark):
    from dlt_spark.dataops.graph import clustering_coefficient, hits

    # path graph: node 2 has degree 2 and no triangles -> coefficient 0
    path = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {r["id"]: r for r in clustering_coefficient(path).collect()}
    assert out[2]["coefficient_nano"] == 0 and out[2]["triangles"] == 0

    # hits iters=0 returns the uniform start, same contract as pagerank
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    rows = hits(df, iters=0).collect()
    assert len(rows) == 3
    assert {r["authority_nano"] for r in rows} == {333333333}


def test_wedge_cap_not_binding_matches_exact(spark):
    """With a cap no center exceeds, the capped path must reproduce the
    exact output (plus approx=False everywhere)."""
    import random

    from dlt_spark.dataops.graph import clustering_coefficient, triangle_count

    rnd = random.Random(7)
    edges = [(a, b) for a in range(14) for b in range(a + 1, 14) if rnd.random() < 0.4]
    df = spark.createDataFrame(edges, "src long, dst long")
    exact = {r["id"]: r for r in clustering_coefficient(df).collect()}
    capped = {
        r["id"]: r
        for r in clustering_coefficient(df, max_wedges_per_node=10_000).collect()
    }
    assert set(exact) == set(capped)
    for i in exact:
        assert not capped[i]["approx"]
        for c in ("degree", "triangles", "coefficient_nano"):
            assert exact[i][c] == capped[i][c], (i, c)

    t_exact = triangle_count(df).collect()[0]
    t_capped = triangle_count(df, max_wedges_per_node=10_000).collect()[0]
    assert tuple(t_exact) == tuple(t_capped)


def test_wedge_cap_complete_graph_estimates_exactly(spark):
    """On K_n every sampled wedge closes, so the weight-scaled estimate
    recovers the true counts up to integer rounding — and the affected
    nodes are flagged."""
    from dlt_spark.dataops.graph import (
        _wedge_cap_k,
        clustering_coefficient,
        triangle_count,
    )

    n = 12
    edges = [(a, b) for a in range(n) for b in range(a + 1, n) if True]
    df = spark.createDataFrame(edges, "src long, dst long")
    cap = 10  # k = 5, C(5,2) = 10
    assert _wedge_cap_k(cap) == 5

    t = triangle_count(df, max_wedges_per_node=cap).collect()[0]
    true_tri = n * (n - 1) * (n - 2) // 6  # C(12,3) = 220
    assert t["n_wedges"] == sum(
        d * (d - 1) // 2 for d in range(n)
    )  # oriented out-degrees 0..n-1, EXACT despite the cap
    assert abs(t["n_triangles"] - true_tri) <= 1  # rounding only

    out = {r["id"]: r for r in clustering_coefficient(df, max_wedges_per_node=cap).collect()}
    for i in range(n):
        assert out[i]["degree"] == n - 1
        # per-node credits carry sampling variance (clamped at 1.0) but
        # stay in the right ballpark
        assert 400_000_000 <= out[i]["coefficient_nano"] <= 1_000_000_000
        assert out[i]["triangles"] > 0
        assert out[i]["approx"]  # K_n: every node touches sampled wedges
    # the global triangle mass (3 corner credits per triangle) is
    # conserved by the weight scaling, up to per-node rounding
    assert abs(sum(r["triangles"] for r in out.values()) - 3 * true_tri) <= n


def test_wedge_cap_flags_only_affected_nodes(spark):
    """A dense hub community plus a disconnected exact triangle: the
    triangle's nodes stay exact and unflagged under a binding cap."""
    from dlt_spark.dataops.graph import clustering_coefficient

    k8 = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    tri = [(100, 101), (101, 102), (102, 100)]
    df = spark.createDataFrame(k8 + tri, "src long, dst long")
    out = {
        r["id"]: r
        for r in clustering_coefficient(df, max_wedges_per_node=3).collect()
    }
    for i in (100, 101, 102):
        assert not out[i]["approx"]
        assert out[i]["triangles"] == 1
        assert out[i]["coefficient_nano"] == 1_000_000_000
    assert any(out[i]["approx"] for i in range(8))


def test_wedge_cap_deterministic(spark):
    """Hash-ranked sampling: two runs (different partitioning) give
    bit-identical results."""
    import random

    from dlt_spark.dataops.graph import clustering_coefficient

    rnd = random.Random(11)
    edges = [(a, b) for a in range(30) for b in range(a + 1, 30) if rnd.random() < 0.5]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(tuple(r) for r in clustering_coefficient(df, max_wedges_per_node=6).collect())
    b = sorted(
        tuple(r)
        for r in clustering_coefficient(
            df.repartition(7, "src"), max_wedges_per_node=6
        ).collect()
    )
    assert a == b


def test_label_propagation_spreads_and_clamps(spark):
    from dlt_spark.dataops.graph import label_propagation

    # chain A-B-C-D with seed at A; separate pair E-F with seed 'y' at E;
    # isolated node G stays NULL
    labels = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None), (4, None), (5, "y"), (6, None), (7, None)],
        "id long, label string",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "src long, dst long"
    )
    out = {r["id"]: r for r in label_propagation(labels, edges, iters=3).collect()}
    assert out[2]["label"] == "x" and out[3]["label"] == "x" and out[4]["label"] == "x"
    assert out[6]["label"] == "y"
    assert out[7]["label"] is None
    assert out[1]["is_seed"] and not out[2]["is_seed"]
    # majority + tie-break: node with neighbors labeled x,x,y -> x;
    # with x,y (tie) -> smaller label
    labels2 = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (9, None), (10, None)], "id long, label string"
    )
    edges2 = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (1, 10), (3, 10)], "src long, dst long"
    )
    out2 = {r["id"]: r for r in label_propagation(labels2, edges2, iters=1).collect()}
    assert out2[9]["label"] == "x"
    assert out2[10]["label"] == "x"  # tie x/y -> smallest label


def test_k_core_known_graph(spark):
    """Path a-b-c-d plus triangle e-f-g sharing node d (d-e edge):
    with k=2 the path endpoints peel round 1, the next layer round 2,
    the triangle survives."""
    from dlt_spark.dataops.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 5)],
        ["src", "dst"],
    )
    out = {r["id"]: r["removed_round"] for r in k_core(edges, k=2, rounds=4).collect()}
    # 1 has deg 1 -> round 1; then 2 -> round 2; then 3 -> round 3;
    # then 4 -> round 4; triangle 5-6-7 survives (deg 2 each)
    assert out == {1: 1, 2: 2, 3: 3, 4: 4, 5: 0, 6: 0, 7: 0}


def test_k_core_whole_graph_survives(spark):
    from dlt_spark.dataops.graph import k_core

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    out = {r["id"]: r["removed_round"] for r in k_core(edges, k=2, rounds=3).collect()}
    assert out == {1: 0, 2: 0, 3: 0}


def test_k_core_rejects_bad_params(spark):
    import pytest

    from dlt_spark.dataops.graph import k_core

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        k_core(edges, k=0)
    with pytest.raises(ValueError):
        k_core(edges, rounds=0)


def test_degree_assortativity_star_is_negative(spark):
    """A star is maximally disassortative: r = -1."""
    from dlt_spark.dataops.graph import degree_assortativity

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], ["src", "dst"]
    )
    row = degree_assortativity(edges).collect()[0]
    assert row["m_edges"] == 10  # 5 undirected edges, both directions
    assert abs(row["r_assort"] + 1.0) < 1e-9


def test_degree_assortativity_regular_graph_degenerate(spark):
    """In a regular graph every degree is equal -> zero variance ->
    NULL (0/0), not a crash."""
    from dlt_spark.dataops.graph import degree_assortativity

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    row = degree_assortativity(edges).collect()[0]
    assert row["m_edges"] == 6
    assert row["r_assort"] is None


def test_degree_assortativity_selfloops_only_is_empty_graph(spark):
    """Self-loop-only input symmetrizes to an EMPTY edge list: the
    degree-moment path (r10: m/sx/sx2 from the degree table) must still
    report m_edges = 0 and a NULL coefficient, matching the old
    edge-count behavior bit for bit."""
    from dlt_spark.dataops.graph import degree_assortativity

    edges = spark.createDataFrame([(1, 1), (2, 2)], ["src", "dst"])
    row = degree_assortativity(edges).collect()[0]
    assert row["m_edges"] == 0
    assert row["r_assort"] is None


def test_k_core_matches_bruteforce_random_graphs(spark):
    """Synchronous-peel brute force in plain Python vs the DataFrame
    implementation on seeded random graphs."""
    import random
    from collections import defaultdict

    from dlt_spark.dataops.graph import k_core

    for seed, k in [(7, 2), (21, 3), (99, 2)]:
        rng = random.Random(seed)
        n = 30
        edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(70)}
        edges = [(a, b) for a, b in edges if a != b]
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        alive = set(adj)
        expect = {}
        for r in range(1, 5):
            out = {u for u in alive if len(adj[u] & alive) < k}
            for u in out:
                expect[u] = r
            alive -= out
        for u in alive:
            expect[u] = 0
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            r["id"]: r["removed_round"]
            for r in k_core(df, k=k, rounds=4).collect()
        }
        assert got == expect, f"seed={seed} k={k}"


def test_link_prediction_matches_bruteforce(spark):
    """RA scores on a small random graph vs a pure-Python common-neighbor
    scan; includes the capped path staying a valid estimate shape."""
    import itertools
    import random

    from dlt_spark.dataops.graph import link_prediction

    rng = random.Random(5)
    nodes = list(range(12))
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(30)}
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["x"], r["y"]): (r["n_common"], r["ra_score_q6"])
        for r in link_prediction(df, topk=1000).collect()
    }

    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    eset = set(edges)
    want = {}
    for x, y in itertools.combinations(nodes, 2):
        if (x, y) in eset:
            continue
        common = adj[x] & adj[y]
        if not common:
            continue
        want[(x, y)] = (
            len(common),
            sum(1_000_000 // len(adj[z]) for z in common),
        )
    assert got == want

    capped = link_prediction(df, topk=1000, max_wedges_per_node=3).collect()
    assert all(r["ra_score_q6"] > 0 for r in capped)
    assert {(r["x"], r["y"]) for r in capped} <= set(want)


def test_pack_gate_fallback_matches_packed(spark):
    """ADVICE r10: the packed single-long pair key is gated on ids being
    non-negative 31-bit integers; ids offset out of range must take the
    exact two-column fallback and produce identical results modulo the
    offset — exercising BOTH branches of _closing_probe/link_prediction."""
    import random

    from pyspark.sql import functions as F

    from dlt_spark.dataops.graph import (
        clustering_coefficient,
        link_prediction,
        triangle_count,
    )

    rng = random.Random(11)
    nodes = list(range(15))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(40)})
    df = spark.createDataFrame(edges, "src long, dst long")
    # negative offset -> pack gate rejects (lo < 0); 2^31 offset -> gate
    # rejects (hi > _PACK_MAX).  Both must equal the packed run.
    for off in (-1_000_000, 1 << 31):
        shifted = df.select(
            (F.col("src") + off).alias("src"), (F.col("dst") + off).alias("dst")
        )
        tc = triangle_count(df).collect()[0]
        tc_s = triangle_count(shifted).collect()[0]
        assert tuple(tc) == tuple(tc_s)

        cc = {r["id"]: (r["degree"], r["triangles"], r["coefficient_nano"])
              for r in clustering_coefficient(df).collect()}
        cc_s = {r["id"] - off: (r["degree"], r["triangles"], r["coefficient_nano"])
                for r in clustering_coefficient(shifted).collect()}
        assert cc == cc_s

        lp = [(r["x"], r["y"], r["n_common"], r["ra_score_q6"])
              for r in link_prediction(df, topk=1000).collect()]
        lp_s = [(r["x"] - off, r["y"] - off, r["n_common"], r["ra_score_q6"])
                for r in link_prediction(shifted, topk=1000).collect()]
        assert sorted(lp) == sorted(lp_s)
