"""Connected components / dedup clustering."""

from __future__ import annotations

from iowa_liquor_sales_spark.operators.graph import connected_components, dedup_clusters


def test_components_chain_and_clique(spark):
    # Chain 1-2-3-4, clique {10,11,12}, isolated pair (20,21).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    got = {
        (r["node"], r["component"]) for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_components_long_path_converges(spark):
    # Path of 12 nodes: needs several propagation rounds (diameter 11,
    # but min-label reaches everything in ceil(log) + linear rounds).
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    comp = connected_components(edges)
    assert comp.filter("component <> 0").count() == 0
    assert comp.count() == n


def test_dedup_clusters_keeper(spark):
    pairs = spark.createDataFrame([(7, 3), (3, 9)], ["doc_a", "doc_b"])
    got = {
        (r["doc_id"], r["cluster_id"], r["is_keeper"])
        for r in dedup_clusters(pairs).collect()
    }
    assert got == {(3, 3, True), (7, 3, False), (9, 3, False)}


def test_pagerank_cycle_is_uniform(spark):
    from iowa_liquor_sales_spark.operators.graph import pagerank_e12

    # Directed 4-cycle: perfect symmetry -> every node same rank, and
    # with outdeg 1 everywhere no mass floors away: total stays 4e12.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], ["src", "dst"]
    )
    rows = pagerank_e12(edges, iters=3).collect()
    ranks = {r["node"]: r["rank_e12"] for r in rows}
    assert len(set(ranks.values())) == 1
    assert sum(ranks.values()) == 4 * 10**12


def test_pagerank_hub_ranks_highest_and_is_partition_invariant(spark):
    from iowa_liquor_sales_spark.operators.graph import pagerank_e12

    # Star: leaves 1..6 all point at hub 0, hub points back at leaf 1.
    edges = [(i, 0) for i in range(1, 7)] + [(0, 1)]
    e1 = spark.createDataFrame(edges, ["src", "dst"])
    e2 = e1.repartition(13)
    r1 = {r["node"]: r["rank_e12"] for r in pagerank_e12(e1, iters=3).collect()}
    r2 = {r["node"]: r["rank_e12"] for r in pagerank_e12(e2, iters=3).collect()}
    assert r1 == r2  # integer grid -> partitioning-independent bits
    assert r1[0] == max(r1.values())
    assert r1[1] > r1[2]  # leaf 1 gets the hub's backflow


def test_cluster_size_histogram(spark):
    from iowa_liquor_sales_spark.operators.graph import cluster_size_histogram

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3), (5, 3), (6, 6)],
        ["doc_id", "cluster_id"],
    )
    got = {r["cluster_size"]: r for r in cluster_size_histogram(clusters).collect()}
    assert got[2]["n_clusters"] == 1 and got[2]["n_docs"] == 2
    assert got[3]["n_clusters"] == 1 and got[3]["n_docs"] == 3
    assert got[1]["n_clusters"] == 1 and got[1]["n_docs"] == 1


def test_triangle_count_known_graph(spark):
    from iowa_liquor_sales_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} has 4 triangles; plus a pendant edge (4,5) adds none.
    # Duplicate and reversed edges must not inflate the count.
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (3, 4), (4, 5), (5, 5)],
        ["src", "dst"],
    )
    assert triangle_count(edges).first()["n_triangles"] == 4


def test_kcore_peels_pendants_and_keeps_clique(spark):
    from iowa_liquor_sales_spark.operators.graph import kcore

    # K4 on {1,2,3,4} (every vertex degree 3) with pendant chains hanging
    # off: 4-5, 5-6. At k=2 the chain peels over two rounds (6 first,
    # then 5), the clique survives with its internal degrees intact.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        ["src", "dst"],
    )
    got = {r["v"]: r["deg"] for r in kcore(edges, k=2, rounds=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # k above the max degree empties the graph.
    assert kcore(edges, k=5, rounds=2).count() == 0


def test_bfs_hops_chain(spark):
    from iowa_liquor_sales_spark.operators.graph import bfs_hops

    # Path 0-1-2-3-4-5 plus a disconnected pair (10, 11): 3 rounds reach
    # hop 3; vertices 4, 5 and the island stay unreached (absent).
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["src", "dst"]
    )
    got = {r["v"]: r["hops"] for r in bfs_hops(edges, source=0, rounds=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    # More rounds reach further; reversed edges don't change distances.
    got5 = {r["v"]: r["hops"] for r in bfs_hops(edges, source=0, rounds=5).collect()}
    assert got5 == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5}


def test_adamic_adar_scores_and_exclusions(spark):
    import math

    from iowa_liquor_sales_spark.operators.graph import adamic_adar

    # Square 1-2-3-4-1: diagonals (1,3) and (2,4) each share two
    # degree-2 common neighbors; adjacent pairs are excluded.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
    )
    out = {(r["u"], r["v"]): r for r in adamic_adar(edges).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    term = int(round(1e9 / math.log(2.0)))
    for pair in ((1, 3), (2, 4)):
        assert out[pair]["common"] == 2
        assert out[pair]["aa_scaled"] == 2 * term


def test_adamic_adar_max_deg_drops_hub_middles(spark):
    from iowa_liquor_sales_spark.operators.graph import adamic_adar

    # Star around hub 0 (degree 4) plus a path 1-9-2. Pair (3, 4)'s ONLY
    # common neighbor is the hub, so max_deg=3 erases it; pair (1, 2)
    # survives through middle 9 (degree 2) but loses the hub wedge.
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (1, 9), (9, 2)], ["src", "dst"]
    )
    uncapped = {(r["u"], r["v"]): r for r in adamic_adar(edges).collect()}
    capped = {(r["u"], r["v"]): r for r in
              adamic_adar(edges, max_deg=3).collect()}
    assert (3, 4) in uncapped and (3, 4) not in capped
    assert uncapped[(1, 2)]["common"] == 2
    assert capped[(1, 2)]["common"] == 1


def test_markov_attribution_gateway_channel(spark):
    from datetime import datetime

    from iowa_liquor_sales_spark.operators.graph import (
        markov_removal_attribution,
    )

    # Every conversion flows through 'click' (view->click->purchase);
    # removing it must zero the reach; removing 'view' also kills all
    # journeys here (every journey starts with view). Effects ordered
    # and nonnegative, full reach > 0.
    rows = []
    eid = 0
    for u in range(6):
        t0 = datetime(2024, 1, 1, u)
        for i, et in enumerate(["view", "click", "purchase"]):
            rows.append((eid, datetime(2024, 1, 1, u, i), u, et))
            eid += 1
    # one non-converting user: view only
    rows.append((eid, datetime(2024, 1, 2), 99, "view"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    out = {r["channel"]: r for r in
           markov_removal_attribution(df).collect()}
    assert set(out) == {"view", "click"}
    full = out["click"]["reach_full_ppm"]
    assert full > 0
    for c in out.values():
        assert c["reach_full_ppm"] == full
        assert 0 <= c["reach_removed_ppm"] <= full
        assert c["effect_ppm"] == full - c["reach_removed_ppm"]
    assert out["click"]["reach_removed_ppm"] == 0
    assert out["view"]["reach_removed_ppm"] == 0


def test_clustering_coefficient_clique_and_path(spark):
    from iowa_liquor_sales_spark.operators.graph import (
        clustering_coefficient,
    )

    # K4 {1,2,3,4}: every vertex has coeff 1 (all neighbor pairs
    # connected); path vertex 5 hanging off 4: 4's coeff drops, 5 has
    # deg 1 and is absent.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        ["src", "dst"],
    )
    out = {r["v"]: r for r in clustering_coefficient(edges).collect()}
    assert 5 not in out
    for v in (1, 2, 3):
        assert out[v]["deg"] == 3
        assert out[v]["n_triangles"] == 3
        assert out[v]["coeff_ppm"] == 1_000_000
    # vertex 4: deg 4, neighbor pairs = 6, closed = 3 -> 0.5
    assert out[4]["deg"] == 4 and out[4]["n_triangles"] == 3
    assert out[4]["coeff_ppm"] == 500_000


def test_personalized_pagerank_mass_stays_near_seeds(spark):
    from iowa_liquor_sales_spark.operators.graph import (
        pagerank_personalized_e12,
    )

    # Two disconnected components: a weighted triangle {1,2,3} seeded at
    # node 1, and an unreachable pair {10, 11}. All teleport + walk mass
    # must stay in the seeded component; the heavier edge 1->2 (w=3)
    # must out-rank 1->3 (w=1) after one hop.
    edges = spark.createDataFrame(
        [
            (1, 2, 3), (2, 1, 3), (1, 3, 1), (3, 1, 1),
            (2, 3, 1), (3, 2, 1),
            (10, 11, 5), (11, 10, 5),
        ],
        ["src", "dst", "w"],
    )
    out = {
        r["node"]: r["rank_e12"]
        for r in pagerank_personalized_e12(edges, [1], iters=3).collect()
    }
    assert out[10] == 0 and out[11] == 0  # no teleport, no inflow
    assert out[2] > out[3] > 0  # the heavy edge carries more seed mass
    # teleport floor: the seed always keeps at least 0.15e12
    assert out[1] >= 15 * 10**10


def test_neighbor_jaccard_matches_bruteforce(spark):
    from iowa_liquor_sales_spark.operators.graph import neighbor_jaccard

    # bowtie + tail: neighborhoods overlap differently per pair
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (3, 5), (5, 6)]
    out = {
        (r["u"], r["v"]): (r["common"], r["jaccard_ppm"])
        for r in neighbor_jaccard(
            spark.createDataFrame(edges, ["src", "dst"])
        ).collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    eset = {tuple(sorted(e)) for e in edges}
    want = {}
    for u in adj:
        for v in adj:
            if u < v and (u, v) not in eset:
                common = len(adj[u] & adj[v])
                if common >= 1:
                    union = len(adj[u] | adj[v])
                    want[(u, v)] = (common, common * 1_000_000 // union)
    assert out == want


def test_ktruss_matches_sequential_peeling(spark):
    from iowa_liquor_sales_spark.operators.graph import ktruss_converged

    import itertools
    import random

    rng = random.Random(37)
    nodes = list(range(18))
    edges = {
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.3
    }
    # plant a clique so a 4-truss exists
    for a, b in itertools.combinations([1, 3, 5, 7, 9], 2):
        edges.add((a, b))
    got = {
        (r["lo"], r["hi"]): r["support"]
        for r in ktruss_converged(
            spark.createDataFrame(sorted(edges), ["src", "dst"]), k=4
        ).collect()
    }

    # sequential reference: peel support < k-2 until stable
    def support(es):
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {(a, b): len(adj[a] & adj[b]) for a, b in es}

    es = set(edges)
    while True:
        sup = support(es)
        drop = {e for e, s in sup.items() if s < 2}
        if not drop:
            break
        es -= drop
    assert got == support(es)
    # every survivor meets the bound
    assert all(s >= 2 for s in got.values())


def test_betweenness_sample_matches_grid_brandes(spark):
    from iowa_liquor_sales_spark.operators.graph import betweenness_sample

    import itertools
    import random

    rng = random.Random(47)
    nodes = list(range(14))
    edges = sorted(
        {
            (a, b)
            for a, b in itertools.combinations(nodes, 2)
            if rng.random() < 0.25
        }
        | {(0, 1), (1, 2), (2, 3)}  # guarantee connectivity spine
    )
    sources = [0, 1, 2, 3]
    got = {
        r["v"]: r["betweenness_e9"]
        for r in betweenness_sample(
            spark.createDataFrame(edges, ["src", "dst"]),
            sources,
            max_depth=6,
        ).collect()
    }

    # python Brandes with the SAME 1e-9 integer-grid recurrence
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for s in sources:
        dist, sigma = {s: 0}, {s: 1}
        frontier, order = [s], [[s]]
        while frontier:
            nxt = {}
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in dist:
                        nxt[w] = nxt.get(w, 0) + sigma[u]
            for w, sg in nxt.items():
                dist[w] = len(order)
                sigma[w] = sg
            if not nxt:
                break
            order.append(sorted(nxt))
            frontier = list(nxt)
        delta = {v: 0 for v in dist}
        for lvl in range(len(order) - 2, -1, -1):
            for v in order[lvl]:
                t = 0
                for w in adj.get(v, ()):
                    if dist.get(w) == lvl + 1:
                        t += (
                            sigma[v] * (1_000_000_000 + delta[w])
                        ) // sigma[w]
                delta[v] = t
                if lvl > 0 and t > 0:
                    want[v] = want.get(v, 0) + t
    assert got == want
    # the spine's interior vertices carry dependency mass
    assert any(v in got for v in (1, 2))
