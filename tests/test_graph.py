"""PageRank (operators/graph.py) against a hand-checked power iteration."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators import graph as G


def _numpy_pagerank(edges, n_iter, d):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for u, v in set(edges):
        out.setdefault(u, set()).add(v)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1.0 - d) / n)
        dangling = sum(r[idx[v]] for v in nodes if v not in out)
        nxt += d * dangling / n
        for u, vs in out.items():
            share = r[idx[u]] / len(vs)
            for v in vs:
                nxt[idx[v]] += d * share
        r = nxt
    return {v: r[idx[v]] for v in nodes}


@pytest.fixture(scope="module")
def diamond_edges(spark):
    # 1 -> {2,3} -> 4 ; 4 dangling ; 5 isolated-source -> 1
    rows = [(1, 2), (1, 3), (2, 4), (3, 4), (5, 1), (1, 2)]  # dup edge collapses
    return spark.createDataFrame(rows, ["src", "dst"])


def test_pagerank_matches_power_iteration(spark, diamond_edges):
    got = {
        r["node"]: r["rank"]
        for r in G.pagerank(diamond_edges, n_iter=4, damping=0.85).collect()
    }
    want = _numpy_pagerank(
        [(1, 2), (1, 3), (2, 4), (3, 4), (5, 1)], n_iter=4, d=0.85
    )
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v
    # sink with two in-links outranks everything; total mass conserved
    assert got[4] == max(got.values())
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_empty_edges(spark):
    """An empty edge list (epoch 0 found no cross-host links, or every
    fetch was robots-rejected) must yield an empty rank frame, not a
    ZeroDivisionError that kills the crawl epoch."""
    empty = spark.createDataFrame([], "src long, dst long")
    out = G.pagerank(empty, n_iter=2)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0
    # host_rank wraps pagerank after self-loop filtering — an all-self-loop
    # link table reduces to the same empty-graph path
    links = spark.createDataFrame([("a.com", "a.com")], ["src_host", "dst_host"])
    assert G.host_rank(links).count() == 0


def test_pagerank_deterministic(spark, diamond_edges):
    a = sorted(G.pagerank(diamond_edges, n_iter=3).collect())
    b = sorted(G.pagerank(diamond_edges, n_iter=3).collect())
    assert a == b


def test_host_rank_on_link_table(spark):
    links = spark.createDataFrame(
        [
            ("a.com", "b.com"),
            ("a.com", "a.com"),  # self-loop dropped
            ("c.com", "b.com"),
            ("b.com", "c.com"),
        ],
        ["src_host", "dst_host"],
    )
    out = {r["host"]: r["rank"] for r in G.host_rank(links, n_iter=5).collect()}
    assert set(out) == {"a.com", "b.com", "c.com"}
    # b has two in-links, a has none
    assert out["b.com"] > out["c.com"] > out["a.com"]


def test_recrawl_schedule_bands(spark):
    from webcrawler_spark.operators.scheduler import recrawl_schedule

    rows = [
        # url 1: 5 fetches, 4 changes -> rate 1.0 -> interval 1
        *[(1, t, f"h{t}") for t in range(5)],
        # url 2: 5 fetches, 1 change -> rate 0.25 -> interval 2
        (2, 0, "a"), (2, 1, "a"), (2, 2, "a"), (2, 3, "a"), (2, 4, "b"),
        # url 3: 5 fetches, 0 changes -> rate 0.0 -> interval 8
        *[(3, t, "same") for t in range(5)],
        # url 4: single fetch -> rate NULL -> optimistic interval 1
        (4, 0, "x"),
        # url 5: 11 fetches, 1 change -> rate 0.1 -> interval 4
        *[(5, t, "a") for t in range(10)], (5, 10, "b"),
    ]
    hist = spark.createDataFrame(rows, ["url_id", "fetch_no", "fp"])
    out = {
        r["url_id"]: r
        for r in recrawl_schedule(
            hist, id_col="url_id", order_col="fetch_no", fingerprint_col="fp"
        ).collect()
    }
    assert out[1]["interval_epochs"] == 1 and out[1]["change_rate"] == 1.0
    assert out[2]["interval_epochs"] == 2 and out[2]["change_rate"] == 0.25
    assert out[3]["interval_epochs"] == 8 and out[3]["change_rate"] == 0.0
    assert out[4]["interval_epochs"] == 1 and out[4]["change_rate"] is None
    assert out[5]["interval_epochs"] == 4
    assert out[5]["n_fetches"] == 11 and out[5]["n_changes"] == 1


def test_recrawl_state_fold_matches_batch_estimator(spark):
    # folding the fetch log epoch-by-epoch through the incremental state
    # merge (what the epoch loop does) must reproduce exactly the batch
    # window estimator's counts AND banded intervals over the full log.
    from pyspark.sql import functions as F

    from webcrawler_spark.operators import recrawl as RC
    from webcrawler_spark.operators.scheduler import recrawl_schedule

    log = [
        ("a", 0, "h0"), ("a", 1, "h1"), ("a", 2, "h2"),  # every-epoch change -> 1
        ("b", 0, "x"), ("b", 1, "x"), ("b", 2, "x"), ("b", 3, "x"),  # static -> 8
        ("c", 0, "p"), ("c", 1, "q"), ("c", 2, "q"), ("c", 3, "q"),  # 1/3 -> 2
        ("d", 5, "z"),  # single fetch -> optimistic 1
    ]
    hist = spark.createDataFrame(log, "url_norm string, epoch int, content_hash string")

    state = None
    for e in range(6):
        fetches = hist.filter(F.col("epoch") == e).select("url_norm", "content_hash")
        state = RC.update_recrawl_state(fetches, state).localCheckpoint()
    inc = {
        r["url_norm"]: (r["n_fetches"], r["n_changes"], r["interval_epochs"])
        for r in state.join(RC.intervals_from_state(state), "url_norm").collect()
    }

    batch = {
        r["url_norm"]: (r["n_fetches"], r["n_changes"], r["interval_epochs"])
        for r in recrawl_schedule(
            hist, id_col="url_norm", order_col="epoch", fingerprint_col="content_hash"
        ).collect()
    }
    assert inc == batch
    assert inc["a"][2] == 1 and inc["b"][2] == 8 and inc["c"][2] == 2 and inc["d"][2] == 1


def _numpy_hits(edges, n_iter):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for u, v in set(edges):
        adj[idx[u], idx[v]] = 1.0
    a = np.ones(n)
    h = np.zeros(n)
    for _ in range(n_iter):
        h = adj @ a
        h = h / (np.linalg.norm(h) or 1.0)
        a = adj.T @ h
        a = a / (np.linalg.norm(a) or 1.0)
    return {v: (h[idx[v]], a[idx[v]]) for v in nodes}


def test_hits_matches_numpy(spark):
    edges = [(1, 10), (1, 11), (2, 10), (2, 12), (3, 10), (10, 20), (12, 20)]
    df = spark.createDataFrame(edges + [edges[0]], "src long, dst long")  # dup edge collapses
    got = {r["node"]: (r["hub"], r["authority"])
           for r in G.hits(df, n_iter=3).collect()}
    ref = _numpy_hits(edges, 3)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v][0] == pytest.approx(ref[v][0], abs=1e-9), v
        assert got[v][1] == pytest.approx(ref[v][1], abs=1e-9), v
    # node 10 is the consensus target of the hubs -> top authority
    assert max(ref, key=lambda v: got[v][1]) == 10


def test_hits_deterministic(spark):
    edges = [(1, 10), (2, 10), (2, 11), (3, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r1 = sorted(map(tuple, G.hits(df, n_iter=2).collect()))
    r2 = sorted(map(tuple, G.hits(df, n_iter=2).collect()))
    assert r1 == r2


def test_resolve_redirects_chains_and_loops(spark):
    """Pointer doubling must classify exactly like a hop-by-hop walk with
    aiohttp semantics: terminal within max_redirects -> (final, hops, True);
    longer chains, self-loops, and cycles -> unresolved (TooManyRedirects)."""
    from webcrawler_spark.operators.links import resolve_redirects

    edges = [(f"c{i}", f"c{i+1}") for i in range(7)]      # c0..c6 -> chain len 7..1
    edges += [("self", "self"), ("x", "y"), ("y", "x")]   # self-loop + 2-cycle
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["url"]: r for r in resolve_redirects(df, max_redirects=5).collect()}
    assert set(out) == {f"c{i}" for i in range(7)} | {"self", "x", "y"}
    # c2 -> c3 -> ... -> c7 (terminal): 5 hops, right at the cap
    for i, hops in [(2, 5), (3, 4), (6, 1)]:
        r = out[f"c{i}"]
        assert r["resolved"] and r["final_url"] == "c7" and r["hops"] == hops
    for bad in ["c0", "c1", "self", "x", "y"]:  # 7 and 6 hops, loops
        r = out[bad]
        assert not r["resolved"] and r["final_url"] is None and r["hops"] is None


def _numpy_trustrank(edges, seeds, n_iter, d):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    seeds = [v for v in seeds if v in idx]
    out = {}
    for u, v in set(edges):
        out.setdefault(u, set()).add(v)
    t = np.zeros(len(nodes))
    for v in seeds:
        t[idx[v]] = 1.0 / len(seeds)
    r = t.copy()
    for _ in range(n_iter):
        dangling = sum(r[idx[v]] for v in nodes if v not in out)
        nxt = (1.0 - d) * t + d * dangling * t
        for u, vs in out.items():
            share = r[idx[u]] / len(vs)
            for v in vs:
                nxt[idx[v]] += d * share
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def test_trustrank_matches_power_iteration(spark, diamond_edges):
    seeds = spark.createDataFrame([(1,), (99,)], ["node"])  # 99 not in graph
    got = {
        r["node"]: r["rank"]
        for r in G.trustrank(diamond_edges, seeds, n_iter=4, damping=0.85).collect()
    }
    want = _numpy_trustrank(
        [(1, 2), (1, 3), (2, 4), (3, 4), (5, 1)], [1, 99], n_iter=4, d=0.85
    )
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12, abs=1e-15), v
    # the spam-demotion property: 5 reaches the graph only AS a source
    # (nothing links to it) and is not seeded -> zero trust; everything
    # downstream of seed 1 is trusted
    assert got[5] == 0.0
    assert got[2] > 0 and got[3] > 0 and got[4] > 0
    # mass conserved: dangling mass teleports back into the seed vector
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_trustrank_no_seeds_in_graph(spark, diamond_edges):
    seeds = spark.createDataFrame([(42,)], ["node"])
    got = G.trustrank(diamond_edges, seeds, n_iter=2)
    assert got.columns == ["node", "rank"]
    assert got.filter(F.col("rank") != 0.0).count() == 0


def _numpy_opic(edges, n_iter):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for u, v in set(edges):
        out.setdefault(u, set()).add(v)
    cash = np.full(n, 1.0 / n)
    hist = np.zeros(n)
    for _ in range(n_iter):
        nxt = np.zeros(n)
        dangling = sum(cash[idx[v]] for v in nodes if v not in out)
        nxt += dangling / n
        for u, vs in out.items():
            share = cash[idx[u]] / len(vs)
            for v in vs:
                nxt[idx[v]] += share
        hist = hist + cash
        cash = nxt
    est = (hist + cash) / (n_iter + 1)
    return {v: est[idx[v]] for v in nodes}


def test_opic_matches_reference_iteration(spark, diamond_edges):
    got = {
        r["node"]: r["opic"]
        for r in G.opic(diamond_edges, n_iter=4).collect()
    }
    want = _numpy_opic([(1, 2), (1, 3), (2, 4), (3, 4), (5, 1)], n_iter=4)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v
    # the two-in-link sink accumulates the most cash history; total
    # importance is a probability distribution (cash is conserved)
    assert got[4] == max(got.values())
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_opic_empty_edges(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    out = G.opic(empty, n_iter=2)
    assert out.columns == ["node", "opic"]
    assert out.count() == 0


def test_spam_mass_linearity_and_bounds(spark, diamond_edges):
    """p' must equal PageRank-with-core-teleport at strength 1/N: verify by
    the linearity identity spam_mass = pr - (s/n)*trustrank, and that a
    seed-heavy core drives rel_mass toward 0 on nodes fed by seeds."""
    seeds = spark.createDataFrame([(1,)], ["node"])
    out = {r["node"]: r for r in G.spam_mass(diamond_edges, seeds, n_iter=3).collect()}
    pr = {r["node"]: r["rank"] for r in G.pagerank(diamond_edges, n_iter=3).collect()}
    tr = {
        r["node"]: r["rank"]
        for r in G.trustrank(diamond_edges, seeds, n_iter=3).collect()
    }
    n = len(pr)
    s = 1
    for node, row in out.items():
        assert row["rank_pagerank"] == pytest.approx(pr[node], abs=1e-12)
        assert row["rank_core"] == pytest.approx(tr[node] * s / n, abs=1e-12)
        assert row["spam_mass"] == pytest.approx(
            pr[node] - tr[node] * s / n, abs=1e-12
        )
        assert row["rel_mass"] is None or row["rel_mass"] <= 1.0 + 1e-12
    # node 5 has no in-edges and is not a seed: ALL its rank is teleport-
    # derived, none core-derived -> rel_mass = 1 exactly
    assert out[5]["rel_mass"] == pytest.approx(1.0, abs=1e-12)
    # nodes 2/3 are fed directly by the seed: strictly more core share than
    # the unseeded, unreached node 5 (whose rel_mass is exactly 1)
    assert out[2]["rel_mass"] < out[5]["rel_mass"]


def test_salsa_mass_conservation_and_bipartite(spark, diamond_edges):
    """SALSA score vectors are probability distributions after every round
    (the walk is stochastic) — no normalization scalar needed."""
    out = G.salsa(diamond_edges, n_iter=2).collect()
    hub_sum = sum(r["hub"] for r in out)
    auth_sum = sum(r["authority"] for r in out)
    assert hub_sum == pytest.approx(1.0, abs=1e-9)
    assert auth_sum == pytest.approx(1.0, abs=1e-9)
    by_node = {r["node"]: r for r in out}
    # node 5 (pure source) is a pure hub; node 4 (dangling sink) pure authority
    assert by_node[5]["authority"] == 0.0 and by_node[5]["hub"] > 0
    assert by_node[4]["hub"] == 0.0 and by_node[4]["authority"] > 0


def test_salsa_empty_graph(spark):
    empty = spark.createDataFrame([], "src bigint, dst bigint")
    assert G.salsa(empty, n_iter=2).count() == 0


def test_degree_powerlaw_closed_form(spark):
    # in-degrees: node 10 <- 4 edges, node 11 <- 2, node 12 <- 1
    rows = [(1, 10), (2, 10), (3, 10), (4, 10), (1, 11), (2, 11), (1, 12)]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    row = G.degree_powerlaw(edges, d_min=2).first()
    assert row["n_nodes_in"] == 3 and row["n_tail"] == 2 and row["max_indeg"] == 4
    import math

    expect = 1.0 + 2.0 / (math.log(4 / 1.5) + math.log(2 / 1.5))
    assert row["alpha"] == pytest.approx(expect, abs=1e-6)


def test_degree_powerlaw_empty_tail(spark):
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    row = G.degree_powerlaw(edges, d_min=2).first()
    assert row["n_tail"] == 0 and row["alpha"] is None
