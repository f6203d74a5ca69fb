"""Weighted PageRank + TextRank keyword extraction: hand-model
equality (the bit-exactness claim), co-occurrence pair construction,
quantization overflow safety, deterministic top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_childcare_spark.operators.graph import (
    FRAC_SCALE,
    SCALE,
    weighted_pagerank,
)
from data_pipeline_childcare_spark.operators.keywords import (
    cooccurrence_edges,
    textrank_keywords,
)


def _model_weighted_pagerank(edges, n_iter=5, damping_pct=85, scale=SCALE):
    """Driver-side integer model mirroring the operator's exact
    arithmetic: per-source fractions quantized to 1e-6 first, then
    (rank * frac) // 1e6 per edge."""
    wdeg: dict = {}
    for s, _, w in edges:
        wdeg[s] = wdeg.get(s, 0) + w
    quant = [(s, d, (w * FRAC_SCALE) // wdeg[s]) for s, d, w in edges]
    nodes = sorted(wdeg)
    n = len(nodes)
    r = {i: scale // n for i in nodes}
    for _ in range(n_iter):
        contrib = {i: 0 for i in nodes}
        for s, d, frac in quant:
            contrib[d] += (r[s] * frac) // FRAC_SCALE
        r = {
            i: ((100 - damping_pct) * scale) // (100 * n)
            + (damping_pct * contrib[i]) // 100
            for i in nodes
        }
    return wdeg, r


def _run_wpr(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src: long, dst: long, weight: long")
    return {
        row.id: (row.wdeg, row.rank_scaled)
        for row in weighted_pagerank(e, **kw).collect()
    }


def test_weighted_matches_integer_model(spark):
    # triangle with asymmetric weights + a pendant: every node has an
    # out-edge (symmetrized input), no dangling path needed
    und = [(0, 1, 10), (1, 2, 1), (0, 2, 3), (2, 3, 5)]
    edges = und + [(d, s, w) for s, d, w in und]
    got = _run_wpr(spark, edges)
    wdeg, r = _model_weighted_pagerank(edges)
    assert got == {i: (wdeg[i], r[i]) for i in wdeg}


def test_weighted_mass_follows_weight(spark):
    # hub 0 sends 99% of its mass to 1, 1% to 2; back-edges equal.
    edges = [(0, 1, 99), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    got = _run_wpr(spark, edges)
    assert got[1][1] > got[2][1]


def test_weighted_hot_node_no_overflow_no_zeroing(spark):
    # stop-token regime: edge weights far above any per-node rank.
    # raw (rank * weight) would overflow BIGINT at scale; rank // wdeg
    # would floor to zero. The quantized-fraction path must do
    # neither: ranks stay positive and total mass ≈ scale.
    big = 10**15
    edges = [(0, 1, big), (1, 0, big), (1, 2, big), (2, 1, big)]
    got = _run_wpr(spark, edges)
    total = sum(v for _, v in got.values())
    assert all(v > 0 for _, v in got.values())
    assert abs(total - SCALE) < SCALE // 10**3


def test_weighted_partitioning_invariant(spark):
    und = [(i, (i * 7 + 3) % 23, (i % 5) + 1) for i in range(40)]
    und = [(s, d, w) for s, d, w in und if s != d]
    edges = und + [(d, s, w) for s, d, w in und]
    e = spark.createDataFrame(edges, "src: long, dst: long, weight: long")
    a = {r.id: r.rank_scaled for r in weighted_pagerank(e).collect()}
    b = {
        r.id: r.rank_scaled
        for r in weighted_pagerank(e.repartition(13)).collect()
    }
    assert a == b


def test_cooccurrence_pairs_hand_counts(spark):
    # "a b c a b", window 2:
    #   j=1: (a,b) (b,c) (c,a) (a,b)   j=2: (a,c) (b,a) (c,b)
    # canonical: (a,b)=3, (a,c)=2, (b,c)=2
    docs = spark.createDataFrame([("a b c a b",)], "text string")
    got = {
        (r.token_a, r.token_b): r.weight
        for r in cooccurrence_edges(docs, window=2).collect()
    }
    assert got == {("a", "b"): 3, ("a", "c"): 2, ("b", "c"): 2}


def test_cooccurrence_drops_self_pairs_and_short_docs(spark):
    docs = spark.createDataFrame(
        [("x x y",), ("solo",), ("",), (None,)], "text string"
    )
    got = {
        (r.token_a, r.token_b): r.weight
        for r in cooccurrence_edges(docs, window=2).collect()
    }
    # (x,x) at j=1 dropped; (x,y) seen at j=1 and j=2
    assert got == {("x", "y"): 2}


def test_textrank_matches_model_and_ranks_hub_first(spark):
    # "hub" co-occurs with everything; satellites only with hub
    docs = spark.createDataFrame(
        [("hub alpha",), ("hub beta",), ("hub gamma",), ("hub alpha",)],
        "text string",
    )
    rows = textrank_keywords(docs, window=2, n_iter=5, top_k=10).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert rows[0].token == "hub"
    # exact vs the driver model over the same co-occurrence graph
    und = [
        (r.token_a, r.token_b, r.weight)
        for r in cooccurrence_edges(docs, window=2).collect()
    ]
    edges = und + [(d, s, w) for s, d, w in und]
    _, model = _model_weighted_pagerank(edges)
    assert {r.token: r.rank_scaled for r in rows} == model


def test_textrank_top_k_deterministic_tiebreak(spark):
    # symmetric square a-b-c-d-a: all ranks equal, order must be
    # alphabetical and stable under top_k truncation
    docs = spark.createDataFrame(
        [("a b",), ("b c",), ("c d",), ("d a",)], "text string"
    )
    rows = textrank_keywords(docs, window=2, top_k=2).collect()
    assert [r.token for r in rows] == ["a", "b"]


def test_weighted_dangling_sink_conserves_mass(spark):
    # ADVICE r10: directed input with a dst-only sink used to leak
    # mass (sink unranked, no dangling correction). Now the node set
    # is src ∪ dst and sink mass redistributes uniformly — the same
    # one-row dangling aggregate as pagerank.
    edges = [(0, 1, 2), (1, 2, 1), (0, 2, 3)]  # node 2 has no out-edge
    got = _run_wpr(spark, edges)
    assert set(got) == {0, 1, 2}
    assert got[2][0] == 0  # wdeg 0 for the sink
    total = sum(v for _, v in got.values())
    # mass sums to ~scale (integer floor loss only: ≤ a few units
    # per node per iteration at this size)
    assert abs(total - SCALE) < SCALE // 10**6
    # and the symmetrized regime is bit-identical to the pre-fix
    # operator: dangling sum is exactly 0 there (pinned by
    # test_weighted_matches_integer_model above)


def test_textrank_global_window_input_bounded(spark):
    """Plan contract for the intentional unpartitioned Window in
    textrank_keywords: its input subtree must contain the top_k
    GlobalLimit — the single-partition WindowExec runs on a ≤ top_k
    row frame by construction, never on the vocabulary."""
    docs = spark.createDataFrame(
        [("a b c",), ("b c d",), ("c d e",)], "text string"
    )
    out = textrank_keywords(docs, window=2, top_k=7)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    win_idx = [i for i, ln in enumerate(lines) if "Window [" in ln or ln.strip().startswith("Window")]
    lim_idx = [i for i, ln in enumerate(lines) if "GlobalLimit 7" in ln]
    assert win_idx and lim_idx, plan
    # the limit sits BELOW the window in the tree printout — i.e.
    # inside its input subtree
    assert min(lim_idx) > min(win_idx), plan
    assert len(out.collect()) <= 7
