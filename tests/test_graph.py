"""Fixed-point PageRank: hand-model equality, mass conservation,
partitioning-independence (the bit-exactness claim), dangling mass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.operators.graph import (
    SCALE,
    pagerank,
    synthetic_link_graph,
)


def _model_pagerank(node_ids, edges, n_iter=5, damping_pct=85, scale=SCALE):
    """Driver-side integer model: the exact arithmetic the operator
    must reproduce distributed."""
    out_deg = {i: 0 for i in node_ids}
    for s, _ in edges:
        out_deg[s] += 1
    n = len(node_ids)
    r = {i: scale // n for i in node_ids}
    for _ in range(n_iter):
        contrib = {i: 0 for i in node_ids}
        for s, d in edges:
            contrib[d] += r[s] // out_deg[s]
        dang = sum(r[i] for i in node_ids if out_deg[i] == 0)
        r = {
            i: ((100 - damping_pct) * scale) // (100 * n)
            + (damping_pct * (contrib[i] + dang // n)) // 100
            for i in node_ids
        }
    return out_deg, r


def _run(spark, node_ids, edges, **kw):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id: long")
    e = spark.createDataFrame(edges, "src: long, dst: long")
    return {
        row.id: (row.out_deg, row.rank_scaled)
        for row in pagerank(nodes, e, **kw).collect()
    }


def test_matches_integer_model_with_dangling_node(spark):
    # 0→1→2→0 cycle, 3 links into the cycle but has NO out-edges
    # (dangling), 4 isolated entirely
    nodes = [0, 1, 2, 3, 4]
    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (3, 2)]
    got = _run(spark, nodes, edges)
    deg, r = _model_pagerank(nodes, edges)
    assert got == {i: (deg[i], r[i]) for i in nodes}
    # the dangling/isolated nodes hold strictly less mass than the
    # cycle members they feed
    assert got[4][1] < got[0][1]


def test_mass_conserved_within_floor_loss(spark):
    nodes = list(range(40))
    edges = [(i, (i * 7 + 3) % 40) for i in range(40) if i != (i * 7 + 3) % 40]
    got = _run(spark, nodes, edges)
    total = sum(v[1] for v in got.values())
    # every integer division loses < 1 unit per participating row per
    # iteration: bound by iterations * (|E| + 3 * |V| + 1)
    loss_bound = 5 * (len(edges) + 3 * len(nodes) + 1) + len(nodes)
    assert SCALE - loss_bound <= total <= SCALE


def test_bit_exact_across_partitioning(spark):
    """The fixed-point claim: identical output under a hostile
    repartition (different aggregation order)."""
    docs = spark.range(0, 97).select(F.col("id").alias("doc_id"))
    edges = synthetic_link_graph(docs, n_links=3)
    nodes = docs.select(F.col("doc_id").alias("id"))
    a = {r.id: r.rank_scaled for r in pagerank(nodes, edges).collect()}
    b = {
        r.id: r.rank_scaled
        for r in pagerank(
            nodes.repartition(13), edges.repartition(7, "dst")
        ).collect()
    }
    assert a == b


def test_synthetic_link_graph_shape(spark):
    docs = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    e = synthetic_link_graph(docs, n_links=3).collect()
    assert all(0 <= r.dst < 50 and r.src != r.dst for r in e)
    # ≤ 3 out-links per doc, collapsed multi-edges allowed to reduce
    per_src = {}
    for r in e:
        per_src[r.src] = per_src.get(r.src, 0) + 1
    assert max(per_src.values()) <= 3
    assert len({(r.src, r.dst) for r in e}) == len(e)


def test_frontier_schedule_cap_and_priority(spark):
    from data_pipeline_childcare_spark.operators.graph import frontier_schedule

    rows = [(i, f"h{i % 3}", 1000 - i) for i in range(20)]
    f = spark.createDataFrame(rows, "id: long, host: string, rank_scaled: long")
    out = frontier_schedule(f, per_host_cap=4).collect()
    by_host_wave = {}
    for r in out:
        by_host_wave.setdefault((r.host, r.wave), []).append(r)
    # politeness: never more than 4 per host per wave; slots 1..4
    for rows_ in by_host_wave.values():
        assert len(rows_) <= 4
        assert sorted(r.slot for r in rows_) == list(range(1, len(rows_) + 1))
    # priority: within a host, a later wave never holds a higher
    # priority than an earlier wave's minimum
    for h in {"h0", "h1", "h2"}:
        host_rows = sorted(
            (r for r in out if r.host == h), key=lambda r: (r.wave, r.slot)
        )
        ranks = [r.rank_scaled for r in host_rows]
        assert ranks == sorted(ranks, reverse=True)


def test_triangle_counts_hand_graph(spark):
    from data_pipeline_childcare_spark.operators.graph import triangle_counts

    # K3 (0,1,2) + pendant 3 on node 0 + isolated edge (4,5);
    # directed duplicates must not double-count
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (0, 3), (4, 5)]
    e = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r.id: (r.degree, r.n_triangles, r.clustering_micro)
           for r in triangle_counts(e).collect()}
    assert got[1] == (2, 1, 1_000_000)   # both neighbors adjacent
    assert got[2] == (2, 1, 1_000_000)
    assert got[0] == (3, 1, 333_333)     # 2*1*1e6 div 6
    assert got[3] == (1, 0, 0)           # degree < 2
    assert got[4] == (1, 0, 0) and got[5] == (1, 0, 0)


def test_triangle_counts_skewed_hub(spark):
    """Celebrity-vertex fixture (round-6 verdict #2): one hub wired to
    every other vertex (degree ~N) over a ring of triangles, checked
    against a brute-force model AND against the wedge-volume bound —
    under degree orientation the hub is every edge's HIGH endpoint,
    so it pivots no wedges at all; under the old id orientation a
    low-id hub pivoted C(d,2) ≈ d²/2."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from data_pipeline_childcare_spark.operators.graph import triangle_counts

    n = 60
    # hub 0 — low id, the worst case for id-orientation — plus a ring
    # among 1..n-1 so non-hub vertices carry degree 4 (2 ring + hub
    # spoke + a chord), and ring+spoke triangles exist
    edges = [(0, i) for i in range(1, n)]
    ring = [(i, i % (n - 1) + 1) for i in range(1, n)]
    edges += ring
    e = spark.createDataFrame(edges, "src: long, dst: long")

    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    model_tris = {v: 0 for v in adj}
    for v in adj:
        for x, y in combinations(sorted(adj[v]), 2):
            if y in adj[x]:
                model_tris[v] += 1
    got = {r.id: (r.degree, r.n_triangles) for r in triangle_counts(e).collect()}
    assert got == {
        v: (len(adj[v]), model_tris[v]) for v in adj
    }

    # the orientation bound, asserted on the plan's actual wedge set:
    # rebuild the oriented edges exactly as the operator does and
    # check the hub (the unique max-degree vertex) has out-degree 0 —
    # its d² wedge blowup is structurally impossible
    und = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = und.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("degree"))
    keyed = (
        und.join(deg.select(F.col("id").alias("a"), F.col("degree").alias("_da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("degree").alias("_db")), "b")
    )
    out_deg_hub = (
        keyed.filter(
            (F.struct(F.col("_da").alias("d"), F.col("a").alias("v"))
             < F.struct(F.col("_db").alias("d"), F.col("b").alias("v")))
            & (F.col("a") == 0)
        ).count()
    )
    assert out_deg_hub == 0


def test_hits_hand_graph_hub_vs_authority(spark):
    """Directed star: node 0 links to 1,2,3 (pure hub); 1,2,3 link
    nowhere — pure authorities. Hub mass concentrates on 0, authority
    mass splits over 1..3; fixed-point output is partition-invariant."""
    from data_pipeline_childcare_spark.operators.graph import hits

    nodes = spark.createDataFrame([(i,) for i in range(4)], "id: long")
    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src: long, dst: long")
    got = {r.id: (r.hub_scaled, r.auth_scaled) for r in hits(nodes, edges).collect()}
    assert got[0][0] == 1_000_000 and got[0][1] == 0  # all hub mass
    for i in (1, 2, 3):
        assert got[i][0] == 0
        assert abs(got[i][1] - 333_333) <= 1
    again = {
        r.id: (r.hub_scaled, r.auth_scaled)
        for r in hits(nodes.repartition(3), edges.repartition(2)).collect()
    }
    assert again == got


def test_reciprocity_hand_graph(spark):
    from data_pipeline_childcare_spark.operators.graph import reciprocity

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 4), (4, 3), (5, 1)],
        "src long, dst long",
    )
    r = reciprocity(edges).collect()[0]
    assert r["n_edges"] == 6
    assert r["n_reciprocal"] == 4  # 1<->2 and 3<->4
    assert r["reciprocity_u"] == 4 * 1_000_000 // 6


def test_kcore_hand_graph_and_convergence(spark):
    from data_pipeline_childcare_spark.operators.graph import kcore

    # K4 core {1,2,3,4} + a chain 4-5-6 that peels away at k=3;
    # node 5 starts with degree 2, 6 with 1 -> both peel (5 only
    # after 6... actually 5 has neighbors 4 and 6 -> deg 2 < 3 peels
    # round 1 with 6; 4 keeps 3 in-core neighbors)
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 6)], "src long, dst long"
    )
    rows = {r["id"]: r["core_degree"] for r in kcore(edges, k=3, rounds=4).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert all(d == 3 for d in rows.values())
    # convergence certification: one fewer round gives the same set
    rows3 = {r["id"] for r in kcore(edges, k=3, rounds=3).collect()}
    assert rows3 == set(rows)


def test_kcore_deep_peel_chain(spark):
    from data_pipeline_childcare_spark.operators.graph import kcore

    # path graph 1-2-3-...-8 at k=2: peels one end per round from
    # both sides; empty 2-core. rounds=6 suffices for n=8
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "src long, dst long"
    )
    assert kcore(edges, k=2, rounds=6).count() == 0


def test_kcore_link_graph_converged(spark):
    """Certifies the registered query's fixed-round contract: 6
    rounds == 5 rounds on the synthetic link graph at k=4."""
    from data_pipeline_childcare_spark.operators.graph import (
        kcore,
        synthetic_link_graph,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    g = synthetic_link_graph(docs, n_links=3)
    a = {r["id"] for r in kcore(g, k=4, rounds=5).collect()}
    b = {r["id"] for r in kcore(g, k=4, rounds=6).collect()}
    assert a == b and len(b) > 0


def _model_trustrank(node_ids, edges, seeds, n_iter=5, damping_pct=85, scale=10**12):
    out_deg = {i: 0 for i in node_ids}
    for s, _ in edges:
        out_deg[s] += 1
    ns = len(seeds)
    r = {i: (scale // ns if i in seeds else 0) for i in node_ids}
    for _ in range(n_iter):
        contrib = {i: 0 for i in node_ids}
        for s, d in edges:
            contrib[d] += r[s] // out_deg[s]
        dang = sum(r[i] for i in node_ids if out_deg[i] == 0)
        r = {
            i: (((100 - damping_pct) * scale) // (100 * ns) if i in seeds else 0)
            + (damping_pct * (contrib[i] + (dang // ns if i in seeds else 0))) // 100
            for i in node_ids
        }
    return r


def test_trustrank_matches_integer_model_and_kills_spam_island(spark):
    from data_pipeline_childcare_spark.operators.graph import trustrank

    # trusted cycle 0→1→2→0 (seed 0), plus a spam island 8↔9 that no
    # seed can reach, plus dangling 3 fed from the cycle
    nodes_l = [0, 1, 2, 3, 8, 9]
    edges_l = [(0, 1), (1, 2), (2, 0), (2, 3), (8, 9), (9, 8)]
    nodes = spark.createDataFrame([(i,) for i in nodes_l], "id: long")
    edges = spark.createDataFrame(edges_l, "src: long, dst: long")
    seeds = spark.createDataFrame([(0,)], "id: long")
    got = {
        r.id: (r.out_deg, r.is_seed, r.rank_scaled)
        for r in trustrank(nodes, edges, seeds).collect()
    }
    model = _model_trustrank(nodes_l, edges_l, {0})
    assert {i: v[2] for i, v in got.items()} == model
    assert got[0][1] is True and got[1][1] is False
    # unreachable island carries ZERO trust; reachable nodes carry some
    assert got[8][2] == 0 and got[9][2] == 0
    assert got[1][2] > 0 and got[3][2] > 0
    # mass stays ~scale: teleport+dangling recycle through the seeds,
    # the island's zero never leaks anything back
    total = sum(v[2] for v in got.values())
    assert abs(total - 10**12) < 10**9


def test_bfs_distances_hand_graph(spark):
    from data_pipeline_childcare_spark.operators.graph import bfs_distances

    # seed 0; chain 0→1→2→3; shortcut 0→3; island 8→9 unreachable;
    # back-edge 3→0 (cycle must not inflate distances)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3), (3, 0), (8, 9)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,)], "id: long")
    got = {r.id: r.dist for r in bfs_distances(edges, seeds, max_hops=8).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1}  # 3 via the shortcut; island absent
    # max_hops cap: with 1 hop only direct neighbors appear
    got1 = {r.id: r.dist for r in bfs_distances(edges, seeds, max_hops=1).collect()}
    assert got1 == {0: 0, 1: 1, 3: 1}
    # multi-seed: nearest seed wins
    seeds2 = spark.createDataFrame([(0,), (9,)], "id: long")
    got2 = {r.id: r.dist for r in bfs_distances(edges, seeds2, max_hops=8).collect()}
    assert got2[9] == 0 and got2[3] == 1
