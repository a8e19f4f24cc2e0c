"""Host-level link analysis: the crawl-prioritization side of a web
pipeline. CommonCrawl publishes per-domain centrality ranks precisely so
downstream corpora can weight/prune by domain importance; this module
computes the same family of scores over an edge table with deterministic
integer arithmetic (gate-hashable — no float drift between engines).

Engine shape: the rank table is (host, rank) — ORDERS smaller than the
page/link tables. Each power iteration is one join (edges x ranks on src)
plus one aggregate (sum per dst): the canonical iterative Spark workload.
Nothing collects to the driver; the iteration count is fixed (k=10), so
the plan is a static 10-stage pipeline Catalyst sees whole.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..localdf import arrow_local_df

# PageRank in micro-units: damping 0.85 as the exact rational 85/100,
# teleport mass 0.15 * 1e6 = 150000. All divisions are integer `div` with
# identical truncation in Spark and DuckDB, so k iterations are bit-exact.
RANK_SCALE = 1_000_000
TELEPORT_MICRO = 150_000

# Size-adaptive driver arm (the ``connected_components`` discipline, which
# the r5 review verified path-equal): every iterative operator here runs
# its fixpoint over the HOST-PAIR dim — orders smaller than the page/link
# tables it is derived from. The corpus-scale work (aggregating page-level
# links into weighted host->host edges) stays distributed; when the
# aggregated edge dim is small enough to collect (~500k rows = tens of MB
# of Arrow columns, the CC bound), the k fixpoint rounds run driver-side
# in exact Python integers instead of paying k * (join + aggregate +
# localCheckpoint) job rounds — measured ~50-100 ms of per-round fixed
# cost on a 100-host graph, i.e. the whole wall for dim-sized graphs.
# Python ``//`` on the nonnegative values used here equals BIGINT ``div``
# truncation, and Python ints cannot wrap, so both arms are bit-exact
# (pinned by tests/test_linkgraph_driver_arm.py). Pass
# ``small_threshold=0`` to force the distributed loop.
SMALL_GRAPH_THRESHOLD = 500_000


def _weighted_edges(edges: DataFrame) -> DataFrame:
    """(src, dst, n) multi-edge multiplicities — the host-pair dim every
    iterative operator consumes (multiplicity-preserving, so both arms see
    identical semantics)."""
    return edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))


def _collect_small(w: DataFrame, small_threshold: int):
    """Materialize the weighted edge dim once; return the Arrow-collected
    (src, dst, n) triples if it is driver-small, else None (caller runs
    the distributed arm on the same materialized frame)."""
    if not small_threshold:
        return None, w
    w = w.localCheckpoint()
    if w.count() > small_threshold:
        return None, w
    pdf = w.toPandas()
    return list(zip(pdf["src"], pdf["dst"], (int(x) for x in pdf["n"]))), w


def _pagerank_rounds(
    triples, node_hosts, seed_set, iterations: int
) -> list[tuple]:
    """Driver-side PageRank/TrustRank fixpoint over collected host-pair
    triples — exact mirror of the distributed loop's integer semantics:
    out_deg counts EVERY out-edge of src (any dst); only src in the node
    dim contribute (their rank is defined); inbound mass to dst outside
    the node dim is discarded by the node-dim join. ``seed_set=None``
    means plain PageRank (every node teleports); else the TrustRank
    variant (teleport only at seeds, rank_0 = 1e6 at seeds, 0 elsewhere)."""
    out_deg: dict = {}
    for s, _d, n in triples:
        out_deg[s] = out_deg.get(s, 0) + n
    nodes_l = list(node_hosts)
    node_set = set(nodes_l)
    if seed_set is None:
        rank = {v: RANK_SCALE for v in nodes_l}
    else:
        rank = {v: (RANK_SCALE if v in seed_set else 0) for v in nodes_l}
    for _ in range(iterations):
        inbound: dict = {}
        for s, d, n in triples:
            r = rank.get(s)
            if r is None or d not in node_set:
                continue
            inbound[d] = inbound.get(d, 0) + n * (r // out_deg[s])
        if seed_set is None:
            rank = {
                v: TELEPORT_MICRO + 85 * inbound.get(v, 0) // 100
                for v in nodes_l
            }
        else:
            rank = {
                v: (TELEPORT_MICRO if v in seed_set else 0)
                + 85 * inbound.get(v, 0) // 100
                for v in nodes_l
            }
    return [(v, rank[v]) for v in nodes_l]


def pagerank_integer(
    edges: DataFrame, nodes: DataFrame, iterations: int = 10,
    small_threshold: int = SMALL_GRAPH_THRESHOLD,
) -> DataFrame:
    """Deterministic integer PageRank over (src, dst) edges.

    Semantics: rank_0 = 1e6 micro for every node; each iteration every
    node sends ``rank div out_degree`` along each out-edge and
    ``rank_{k+1} = 150000 + 85 * inbound_sum div 100``. Divisions truncate
    (BIGINT ``div``), so the fixpoint is exactly reproducible in any
    engine — the float-free analogue of the textbook update (monotone in
    the float ranks; CommonCrawl-style domain weighting only consumes the
    ORDER, which truncation at micro-resolution does not disturb).

    Dangling nodes (no out-edges) simply don't emit — their mass retires
    to the teleport term, one of the standard dangling conventions.

    Scale: ``edges`` is host-to-host (already aggregated below page
    level); each iteration shuffles once on src (join) and once on dst
    (aggregate). The edge+degree frame is localCheckpointed once (it is
    consumed k times); the ranks lineage is a static k-deep DAG that
    Catalyst plans whole at k=10 — for much larger k, checkpoint every
    few rounds, the discipline ``graph_iter`` already applies.
    """
    triples, w = _collect_small(_weighted_edges(edges), small_threshold)
    if triples is not None:
        rows = _pagerank_rounds(
            triples, (r["host"] for r in nodes.collect()), None, iterations)
        return arrow_local_df(nodes.sparkSession, 
            rows, "host string, rank_micro long")
    out_deg = w.groupBy("src").agg(F.sum("n").alias("out_deg"))
    ed = w.join(out_deg, "src").select("src", "dst", "n", "out_deg")
    ed = ed.localCheckpoint()  # reused k times; cut the rebuild lineage
    ranks = nodes.select(
        F.col("host").alias("node"), F.lit(RANK_SCALE).alias("rank_micro")
    )
    for _ in range(iterations):
        contribs = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("n * (rank_micro div out_deg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inbound"))
        )
        ranks = (
            nodes.select(F.col("host").alias("node"))
            .join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(TELEPORT_MICRO)
                    + F.expr("85 * coalesce(inbound, 0) div 100")
                ).alias("rank_micro"),
            )
        )
    return ranks.select(F.col("node").alias("host"), "rank_micro")


def _hits_rounds(triples, node_hosts, iterations: int) -> list[tuple]:
    """Driver-side HITS fixpoint — exact mirror of the distributed loop,
    including the subtlety that the L-infinity max is taken over the RAW
    contribution table BEFORE the node-dim join (an edge endpoint outside
    the node dim still participates in the max)."""
    nodes_l = list(node_hosts)
    hubs = {v: RANK_SCALE for v in nodes_l}
    auths: dict = {}
    for _ in range(iterations):
        araw: dict = {}
        for s, d, n in triples:
            h = hubs.get(s)
            if h is not None:
                araw[d] = araw.get(d, 0) + n * h
        amax = max(max(araw.values(), default=1), 1)
        auths = {v: araw.get(v, 0) * RANK_SCALE // amax for v in nodes_l}
        hraw: dict = {}
        for s, d, n in triples:
            a = auths.get(d)
            if a is not None:
                hraw[s] = hraw.get(s, 0) + n * a
        hmax = max(max(hraw.values(), default=1), 1)
        hubs = {v: hraw.get(v, 0) * RANK_SCALE // hmax for v in nodes_l}
    return [(v, hubs[v], auths[v]) for v in nodes_l]


def hits_integer(
    edges: DataFrame, nodes: DataFrame, iterations: int = 5,
    small_threshold: int = SMALL_GRAPH_THRESHOLD,
) -> DataFrame:
    """Deterministic integer HITS (Kleinberg 1999) over (src, dst) edges:
    hub/authority power iterations with L-infinity normalization in exact
    micro-units — the second classic link-centrality a crawl pipeline
    ranks hosts by (PageRank prunes globally; HITS separates *pointers-to-
    good-content* (hubs) from *good content* (authorities), the signal
    CommonCrawl-style seed selection uses).

    Semantics per iteration: ``auth_raw(v) = sum of hub over in-edges``,
    renormalized to ``auth = auth_raw * 1e6 div max(auth_raw)``; then
    ``hub_raw(v) = sum of the NEW auth over out-edges``, renormalized the
    same way. Max-normalization replaces the textbook L2 norm — a sqrt is
    not exactly representable in integers, while the max is, and the two
    norms agree on the ranking order (both are positive scalings of the
    same vector). All divisions are BIGINT ``div`` with identical
    truncation in DuckDB, so k iterations are bit-exact across engines.

    Scale shape: each iteration is two (join + aggregate) passes on the
    host-level edge table plus one SCALAR max aggregate that Spark plans
    as a 1-row broadcast into the renormalization — no window over the
    rank table, nothing on the driver. The edge frame is localCheckpointed
    once (consumed 2k times). Each raw-contribution frame is ALSO
    localCheckpointed: unlike PageRank's linear recurrence, HITS consumes
    every contribution frame TWICE (the max aggregate and the renorm
    join), so an unbroken lineage quadruples per iteration (~4^k plan
    nodes — measured: plan stringification alone OOMs the driver at k=5).
    The checkpoint materializes only node-dim rank tables, orders smaller
    than the edge table, and keeps every plan iteration-local."""
    if iterations < 1:
        raise ValueError("hits_integer: iterations must be >= 1")
    triples, w = _collect_small(_weighted_edges(edges), small_threshold)
    if triples is not None:
        rows = _hits_rounds(
            triples, (r["host"] for r in nodes.collect()), iterations)
        return arrow_local_df(nodes.sparkSession, 
            rows, "host string, hub_micro long, auth_micro long")
    ed = w.select("src", "dst", "n").localCheckpoint()
    hubs = nodes.select(
        F.col("host").alias("node"), F.lit(RANK_SCALE).alias("hub_micro")
    )
    auths = None
    for _ in range(iterations):
        araw = (
            ed.join(hubs, ed["src"] == hubs["node"])
            .groupBy(ed["dst"].alias("node"))
            .agg(F.sum(F.col("n") * F.col("hub_micro")).alias("raw"))
        ).localCheckpoint()
        amax = araw.agg(
            F.greatest(F.coalesce(F.max("raw"), F.lit(1)), F.lit(1)).alias("mx")
        )
        auths = (
            nodes.select(F.col("host").alias("node"))
            .join(araw, "node", "left")
            .crossJoin(F.broadcast(amax))
            .select(
                "node",
                F.expr(
                    f"coalesce(raw, 0) * {RANK_SCALE} div mx"
                ).alias("auth_micro"),
            )
        )
        hraw = (
            ed.join(auths, ed["dst"] == auths["node"])
            .groupBy(ed["src"].alias("node"))
            .agg(F.sum(F.col("n") * F.col("auth_micro")).alias("raw"))
        ).localCheckpoint()
        hmax = hraw.agg(
            F.greatest(F.coalesce(F.max("raw"), F.lit(1)), F.lit(1)).alias("mx")
        )
        hubs = (
            nodes.select(F.col("host").alias("node"))
            .join(hraw, "node", "left")
            .crossJoin(F.broadcast(hmax))
            .select(
                "node",
                F.expr(
                    f"coalesce(raw, 0) * {RANK_SCALE} div mx"
                ).alias("hub_micro"),
            )
        )
    return (
        hubs.join(auths, "node")
        .select(F.col("node").alias("host"), "hub_micro", "auth_micro")
    )


def host_graph(
    links: DataFrame,
    src_col: str = "src_host",
    dst_url_col: str = "dst_url",
    keep_self: bool = False,
) -> DataFrame:
    """Aggregate page-level outlinks into the weighted host->host graph —
    the CommonCrawl host/domain-graph product (what ``pagerank_integer``
    and ``hits_integer`` consume): (src_host, dst_host, n_links).

    Intra-host edges are dropped by default (site navigation dominates
    raw link counts and carries no cross-site endorsement — the standard
    domain-graph convention); ``keep_self`` retains them.

    Scale shape: one map-side host projection off the link table, one
    aggregate keyed by (src_host, dst_host) — the host-pair dim, orders
    smaller than the page-level link table (partial aggregation collapses
    per-partition duplicates before the shuffle). No window, no join."""
    e = links.select(
        F.col(src_col).alias("src_host"),
        F.regexp_extract(F.col(dst_url_col), "^https?://([^/]+)", 1).alias(
            "dst_host"
        ),
    )
    if not keep_self:
        e = e.filter(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )


def kcore(
    edges: DataFrame, k: int = 3, rounds: int = 4,
    small_threshold: int = SMALL_GRAPH_THRESHOLD,
) -> DataFrame:
    """Deterministic synchronous k-core peeling over the SIMPLE undirected
    view of (src, dst) edges (multi-edges deduped, self-loops dropped) —
    the link-farm / spam-cluster density signal a crawl pipeline computes
    next to PageRank and LPA: hosts surviving the k-core sit in densely
    interlinked neighborhoods (SEO farms link-exchange; legitimate hubs
    rarely sustain mutual density), Seidman 1983's cores applied the way
    Batagelj–Zaveršnik's peeling is used on host graphs.

    Each round drops every node whose degree in the currently-induced
    subgraph is < ``k``; all drops in a round are simultaneous (synchronous
    schedule), so the result is independent of any node ordering and
    bit-reproducible. ``rounds`` is FIXED so the DuckDB oracle unrolls the
    same layers; peeling converges in O(peel depth) rounds (measured: the
    fixture host graph is stable after 1), and the returned frame is the
    exact k-core whenever round ``rounds`` removed nothing — at corpus
    scale run the same loop to convergence with a per-round
    localCheckpoint (the lineage rationale of ``pagerank_integer``).

    Returns (host, degree): survivors with their degree in the final
    induced subgraph (degree may read < k only if the last round still
    peeled — same contract as the unrolled oracle by construction).

    Scale shape: the undirected simple edge frame is built once
    (one distinct = one shuffle) and localCheckpointed; each round is two
    broadcast-or-hash semi-joins against the (host-dim-sized) alive set +
    one partial-aggregated degree count — no window, no all-pairs. The
    alive set is localCheckpointed per round: it feeds BOTH endpoint
    semi-joins, so without the cut the logical plan doubles every round
    (measured: 125 exchanges at rounds=4 vs 8 with the cut — the same
    ~4^k lineage-growth rationale as ``pagerank_integer``).
    """
    und = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    if small_threshold and und.count() <= small_threshold:
        pdf = und.toPandas()
        pairs = list(zip(pdf["src"], pdf["dst"]))
        alive_s = {s for s, _ in pairs}
        deg: dict = {}
        for _ in range(rounds):
            deg = {}
            for s, d in pairs:
                if s in alive_s and d in alive_s:
                    deg[s] = deg.get(s, 0) + 1
            alive_s = {v for v, dg in deg.items() if dg >= k}
        deg = {}
        for s, d in pairs:
            if s in alive_s and d in alive_s:
                deg[s] = deg.get(s, 0) + 1
        return arrow_local_df(edges.sparkSession, 
            sorted(deg.items()), "host string, degree long")
    alive = und.select(F.col("src").alias("host")).distinct()

    def _induced_deg(alive_hosts: DataFrame) -> DataFrame:
        return (
            und.join(alive_hosts.withColumnRenamed("host", "src"), "src")
            .join(alive_hosts.withColumnRenamed("host", "dst"), "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("degree"))
        )

    for _ in range(rounds):
        alive = (
            _induced_deg(alive)
            .filter(F.col("degree") >= k)
            .select(F.col("src").alias("host"))
            .localCheckpoint()
        )
    return _induced_deg(alive).select(F.col("src").alias("host"), "degree")


def trustrank_integer(
    edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
    iterations: int = 10,
    small_threshold: int = SMALL_GRAPH_THRESHOLD,
) -> DataFrame:
    """Deterministic integer TrustRank (Gyöngyi, Garcia-Molina & Pedersen,
    VLDB 2004) over (src, dst) edges: PageRank with the teleport restricted
    to a TRUSTED seed set — the spam-demotion counterpart to
    ``pagerank_integer``. Hosts reachable from the seeds through short,
    well-endorsed paths accumulate trust; link farms that inflate plain
    PageRank by interlinking among themselves starve, because no trust
    flows in from outside. A crawl pipeline reads the pagerank-vs-trustrank
    GAP as its spam signal, next to the ``kcore`` density signal.

    Semantics: rank_0 = 1e6 micro for seeds, 0 elsewhere; each iteration
    ``rank_{k+1} = (seed ? 150000 : 0) + 85 * inbound_sum div 100`` with
    the same truncating integer arithmetic as ``pagerank_integer`` (the
    per-SEED teleport of 150000 micro follows that function's per-node
    convention; downstream consumers read the ORDER of the scores, which
    a shared scale factor does not disturb). Bit-exact across engines —
    the DuckDB oracle unrolls the same k layers.

    Scale shape: identical to ``pagerank_integer`` — the trust table is
    host-dim-sized, each iteration one shuffle join + one aggregate, the
    edge+degree frame localCheckpointed once and consumed k times.
    """
    triples, w = _collect_small(_weighted_edges(edges), small_threshold)
    if triples is not None:
        seed_set = {r["host"] for r in seeds.select("host").collect()}
        rows = _pagerank_rounds(
            triples, (r["host"] for r in nodes.collect()), seed_set,
            iterations)
        return arrow_local_df(nodes.sparkSession, 
            rows, "host string, rank_micro long")
    out_deg = w.groupBy("src").agg(F.sum("n").alias("out_deg"))
    ed = w.join(out_deg, "src").select("src", "dst", "n", "out_deg")
    ed = ed.localCheckpoint()  # reused k times; cut the rebuild lineage
    seed_flag = (
        nodes.select(F.col("host").alias("node"))
        .join(seeds.select(F.col("host").alias("node"), F.lit(1).alias("is_seed")),
              "node", "left")
        .select("node", F.coalesce(F.col("is_seed"), F.lit(0)).alias("is_seed"))
        .localCheckpoint()  # consumed every iteration
    )
    ranks = seed_flag.select(
        "node", (F.col("is_seed") * RANK_SCALE).cast("long").alias("rank_micro")
    )
    for _ in range(iterations):
        contribs = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("n * (rank_micro div out_deg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inbound"))
        )
        ranks = (
            seed_flag.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.col("is_seed") * TELEPORT_MICRO
                    + F.expr("85 * coalesce(inbound, 0) div 100")
                ).cast("long").alias("rank_micro"),
            )
        )
    return ranks.select(F.col("node").alias("host"), "rank_micro")


def _bfs_rounds(pairs, seed_hosts, rounds: int, costs=None) -> dict:
    """Driver-side synchronous min-relaxation over collected (src, dst)
    pairs: BFS hop depth when ``costs`` is None, else Bellman-Ford with
    ``costs[(src, dst)]`` edge weights — exact mirrors of the distributed
    loops (each round relaxes from the PREVIOUS round's snapshot)."""
    reached = {v: 0 for v in seed_hosts}
    for _ in range(rounds):
        snap = dict(reached)
        for s, d in pairs:
            c = snap.get(s)
            if c is None:
                continue
            step = c + (1 if costs is None else costs[(s, d)])
            if d not in reached or step < reached[d]:
                reached[d] = step
    return reached


def bfs_depth(
    edges: DataFrame, seeds: DataFrame, rounds: int = 4,
    small_threshold: int = SMALL_GRAPH_THRESHOLD,
) -> DataFrame:
    """Multi-source BFS hop distance from ``seeds`` over DIRECTED
    (src, dst) edges — crawl depth. A crawler's frontier expands hop by
    hop from its seed list, and "how many hops from a seed" is a standard
    quality/prioritization signal (OPIC-style crawlers budget by it;
    corpus audits report page-count-by-depth): shallow pages are
    hub/navigation-heavy, deep pages are where both long-tail content and
    crawler traps live.

    Semantics: depth(seed) = 0; each synchronous round relaxes
    ``depth(dst) = min(depth(dst), depth(src) + 1)`` across every edge.
    All-integer, no tie-breaking needed (min is order-free), so the result
    is bit-reproducible and the DuckDB oracle unrolls the identical
    ``rounds`` layers. ``rounds`` is FIXED for the oracle mirror; the
    returned depths are the exact BFS distances whenever round ``rounds``
    discovered nothing new (converged) — at corpus scale run the same
    loop to convergence, stopping when the reached-set count is stable.

    Returns (host, depth) for REACHED hosts only; unreached hosts are
    absent (their depth is not representable, and downstream joins want
    the miss, not a sentinel).

    Scale shape: the reached table is host-dimension-sized (orders below
    the page/link tables); each round is one shuffle join on src + one
    min-aggregate on dst. Multi-edges are deduped once up front (distinct
    = one shuffle) — multiplicity cannot change a min-depth. The reached
    set is localCheckpointed per round: it feeds both the propagate join
    and the min-merge union, so without the cut the plan doubles every
    round (the ~4^k lineage-growth rationale of ``kcore`` /
    ``pagerank_integer``). For graphs where only the newest frontier
    matters (very deep BFS), subtract the visited set and expand the
    frontier alone — same plan per round, smaller probe side; at host-dim
    sizes the min-merge form is simpler and the probe side is already
    small.
    """
    ed = edges.select("src", "dst").distinct().localCheckpoint()
    if small_threshold and ed.count() <= small_threshold:
        pdf = ed.toPandas()
        reached_d = _bfs_rounds(
            list(zip(pdf["src"], pdf["dst"])),
            (r["host"] for r in seeds.select("host").collect()), rounds)
        return arrow_local_df(edges.sparkSession, 
            sorted(reached_d.items()), "host string, depth long")
    reached = seeds.select(
        F.col("host"), F.lit(0).cast("long").alias("depth")
    )
    for _ in range(rounds):
        step = (
            ed.join(reached, ed["src"] == reached["host"])
            .select(F.col("dst").alias("host"), (F.col("depth") + 1).alias("depth"))
        )
        reached = (
            reached.unionAll(step)
            .groupBy("host")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint()
        )
    return reached


def bowtie(
    edges: DataFrame, nodes: DataFrame, pivot: str, rounds: int = 6,
    small_threshold: int = SMALL_GRAPH_THRESHOLD,
) -> DataFrame:
    """Bowtie decomposition of a directed host graph (Broder et al.,
    WWW 2000 — the canonical macro-structure measurement of the web):
    classify every host relative to a PIVOT known to sit in the giant
    strongly-connected CORE. Forward BFS reach = {pivot's SCC ∪ OUT};
    backward BFS reach = {pivot's SCC ∪ IN}; the intersection IS the
    pivot's SCC (v is in it iff pivot→v and v→pivot). Crawl pipelines
    read the class mix as a frontier-health signal: a crawl stuck in OUT
    territory (reachable, never endorsed back) is trap/farm territory,
    and IN-heavy frontiers are feeder pages the ranker underweights.

    cls: 'core' (fwd ∧ bwd), 'in' (bwd only), 'out' (fwd only),
    'other' (neither — tendrils + disconnected, which a pivot-pair BFS
    cannot split further; Broder et al. lump them the same way without
    extra BFS waves).

    Determinism: pure reachability (min-relax BFS, order-free), so the
    result is bit-reproducible and the oracle unrolls the same layers.
    ``rounds`` is fixed for the oracle mirror; the classes are exact
    whenever both BFS waves converge within ``rounds`` (verify round
    r == r+1 at the target scale, as the callers do on their fixtures).

    Scale shape: two ``bfs_depth`` runs (each: one shuffle join + one
    min-aggregate per round over a host-dim-sized reached table) plus
    two broadcast-able host-dim left joins for the classification —
    nothing here ever touches page-level row counts."""
    ed = edges.select("src", "dst").distinct().localCheckpoint()
    if small_threshold and ed.count() <= small_threshold:
        pdf = ed.toPandas()
        pairs = list(zip(pdf["src"], pdf["dst"]))
        node_l = [r["host"] for r in nodes.collect()]
        seed = [pivot] if pivot in set(node_l) else []
        fwd_d = _bfs_rounds(pairs, seed, rounds)
        bwd_d = _bfs_rounds([(d, s) for s, d in pairs], seed, rounds)
        rows = [
            (
                v,
                "core" if v in fwd_d and v in bwd_d
                else "in" if v in bwd_d
                else "out" if v in fwd_d
                else "other",
            )
            for v in node_l
        ]
        return arrow_local_df(nodes.sparkSession, rows, "host string, cls string")
    pv = nodes.filter(F.col("host") == pivot)
    fwd = bfs_depth(edges, pv, rounds, small_threshold=0).select(
        "host", F.lit(1).alias("_f")
    )
    bwd = bfs_depth(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        pv, rounds, small_threshold=0,
    ).select("host", F.lit(1).alias("_b"))
    return (
        nodes.join(fwd, "host", "left")
        .join(bwd, "host", "left")
        .select(
            "host",
            F.when(
                F.col("_f").isNotNull() & F.col("_b").isNotNull(),
                F.lit("core"),
            )
            .when(F.col("_b").isNotNull(), F.lit("in"))
            .when(F.col("_f").isNotNull(), F.lit("out"))
            .otherwise(F.lit("other"))
            .alias("cls"),
        )
    )


def cocitation(edges: DataFrame, min_common: int = 2) -> DataFrame:
    """Bibliographic-coupling host similarity (the Dean & Henzinger
    "related pages" move, WWW 1998, at host granularity): two hosts are
    related in proportion to their SHARED OUT-TARGETS — an endorsement
    signal link spam can't easily fake, and the standard "related
    domains" feature a crawl pipeline derives from the domain graph
    next to rank. Scored as integer cosine² in ppm:
    ``common² * 1e6 div (out_deg_a * out_deg_b)`` — exact integer
    arithmetic end to end, no float drift, hence gate-hashable.

    Shape: dedupe edges, self-join on the shared target (the inverted-
    index pair move of ``dedup.pair_candidates`` with dst as the posting
    key), count per unordered pair (src< ordering, no double-count),
    two broadcast joins against the host-dim out-degree table. Pair
    space is Σ in_deg(dst)² — on a host graph that's dim-bounded; at
    corpus scale hot universal targets are pruned by a max in-degree cut
    first (the ``prune_stop_shingles`` discipline: a target half the web
    links to carries no similarity information), keeping the join
    df-bounded rather than quadratic. ``min_common`` drops the common=1
    noise floor before the degree joins."""
    from pyspark.sql.functions import broadcast

    ed = edges.select("src", "dst").distinct()
    deg = ed.groupBy("src").agg(F.count("*").alias("deg"))
    pairs = (
        ed.alias("a")
        .join(
            ed.alias("b"),
            (F.col("a.dst") == F.col("b.dst"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(
            F.col("a.src").alias("host_a"), F.col("b.src").alias("host_b")
        )
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= min_common)
    )
    return (
        pairs.join(
            broadcast(deg.select(F.col("src").alias("host_a"),
                                 F.col("deg").alias("deg_a"))), "host_a"
        )
        .join(
            broadcast(deg.select(F.col("src").alias("host_b"),
                                 F.col("deg").alias("deg_b"))), "host_b"
        )
        .select(
            "host_a", "host_b", "common",
            F.expr(
                "common * common * 1000000 div (deg_a * deg_b)"
            ).alias("cocite_ppm"),
        )
    )


def label_propagation(
    edges: DataFrame, nodes: DataFrame, iterations: int = 3,
    small_threshold: int = SMALL_GRAPH_THRESHOLD,
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al. 2007)
    over an undirected view of (src, dst) edges — the community-detection
    pass a crawl pipeline runs on the host graph (mirror families, link
    farms) one level above ``connected_components``' reachability.

    Labels are 28-bit md5 prefixes of the host name (engine↔oracle
    portable, stable under any node ordering). Each iteration every node
    takes the MODAL label among its neighbors (multiplicity counted,
    multi-edges included), ties to the SMALLEST label; isolated nodes
    keep their label. The modal argmax is packed into one BIGINT —
    ``cnt * 2^29 + (2^28-1 - label)`` — so a plain ``max`` aggregate
    resolves (count desc, label asc) identically in Spark and DuckDB,
    and the whole run is bit-reproducible (no async/random order: the
    classic LPA nondeterminism is removed by the synchronous schedule +
    deterministic tie-break).

    Scale: per iteration one shuffle on src (label join) and one on dst
    (modal aggregate); the undirected edge frame is localCheckpointed
    once and reused every round. Labels converge to community ids in
    O(diameter) rounds; ``iterations`` is fixed so the oracle unrolls.
    Bound (like cluster.py's _PACK): the packed modal key
    ``cnt * 2^29 + (2^28-1 - lbl)`` requires per-(node, label) neighbor
    multiplicity cnt < 2^34 or the int64 pack overflows — Spark silently
    wraps where DuckDB errors, so engine and oracle would diverge. A node
    with 2^34 same-labeled neighbor edges (~1.7e10) is beyond any host
    graph (hosts are the nodes; the web's max host in-degree is ~1e8);
    pre-aggregate multiplicities with a cap before calling if an input
    could violate it.
    """
    triples, w = _collect_small(_weighted_edges(edges), small_threshold)
    if triples is not None:
        import hashlib

        node_l = [r["host"] for r in nodes.collect()]
        lbl_d = {
            v: int(hashlib.md5(v.encode()).hexdigest()[:7], 16)
            for v in node_l
        }
        # undirected multiplicity view of the collected triples
        und_t = triples + [(d, s, n) for s, d, n in triples]
        for _ in range(iterations):
            cnt: dict = {}
            for s, d, n in und_t:
                lb = lbl_d.get(s)
                if lb is None:
                    continue
                key = (d, lb)
                cnt[key] = cnt.get(key, 0) + n
            packed: dict = {}
            for (d, lb), c in cnt.items():
                v = c * 536870912 + (268435455 - lb)
                if d not in packed or v > packed[d]:
                    packed[d] = v
            new_lbl = {d: 268435455 - packed[d] % 536870912 for d in packed}
            lbl_d = {v: new_lbl.get(v, lbl_d[v]) for v in node_l}
        return arrow_local_df(nodes.sparkSession, 
            [(v, lbl_d[v]) for v in node_l], "host string, community long")
    und = w.select("src", "dst", "n").unionAll(
        w.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "n")
    ).localCheckpoint()
    lbl = nodes.select(
        "host",
        F.conv(F.substring(F.md5(F.col("host")), 1, 7), 16, 10)
        .cast("long").alias("lbl"),
    )
    for _ in range(iterations):
        cnt = (
            und.join(lbl.withColumnRenamed("host", "src"), "src")
            .groupBy("dst", "lbl").agg(F.sum("n").alias("cnt"))
        )
        modal = cnt.groupBy("dst").agg(
            (
                F.lit(268435455)
                - F.max(F.col("cnt") * 536870912 + (F.lit(268435455) - F.col("lbl")))
                % 536870912
            ).alias("new_lbl")
        ).withColumnRenamed("dst", "host")
        lbl = lbl.join(modal, "host", "left").select(
            "host", F.coalesce("new_lbl", "lbl").alias("lbl")
        )
    return lbl.select("host", F.col("lbl").alias("community"))


def cheapest_paths(
    edges: DataFrame, seeds: DataFrame, rounds: int = 4,
    small_threshold: int = SMALL_GRAPH_THRESHOLD,
) -> DataFrame:
    """Multi-source CHEAPEST path cost within ``rounds`` edges — the
    weighted complement of ``bfs_depth``: edge cost is derived from link
    multiplicity, cost(src, dst) = 1_000_000 div (1 + n_links), so
    heavily-linked routes are cheap to traverse (the crawl-effort model:
    a strongly-endorsed hop needs less budget per discovered page). Each
    synchronous Bellman-Ford round relaxes
    cost(dst) = min(cost(dst), cost(src) + edge_cost).

    The returned value is exactly "the cheapest path using at most
    ``rounds`` edges" — a well-defined quantity independent of
    convergence (unlike BFS, a cheaper longer route may still exist
    beyond the horizon; at corpus scale iterate to a fixpoint instead).
    All-integer min-relaxation: order-free, bit-reproducible, oracle
    unrolls identical rounds. Scale shape: identical to bfs_depth — the
    weighted edge view is host-dim-bounded and localCheckpointed once;
    each round is one join + one min-aggregate."""
    w = (
        edges.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_links"))
        .select(
            "src", "dst",
            F.expr("1000000 div (1 + n_links)").alias("edge_cost"),
        )
        .localCheckpoint()
    )
    if small_threshold and w.count() <= small_threshold:
        pdf = w.toPandas()
        pairs = list(zip(pdf["src"], pdf["dst"]))
        costs = {
            (s, d): int(c)
            for s, d, c in zip(pdf["src"], pdf["dst"], pdf["edge_cost"])
        }
        reached_d = _bfs_rounds(
            pairs, (r["host"] for r in seeds.select("host").collect()),
            rounds, costs=costs)
        return arrow_local_df(edges.sparkSession, 
            sorted(reached_d.items()), "host string, cost long")
    reached = seeds.select(F.col("host"), F.lit(0).cast("long").alias("cost"))
    for _ in range(rounds):
        step = (
            w.join(reached, w["src"] == reached["host"])
            .select(
                F.col("dst").alias("host"),
                (F.col("cost") + F.col("edge_cost")).alias("cost"),
            )
        )
        reached = (
            reached.unionAll(step)
            .groupBy("host")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint()
        )
    return reached
