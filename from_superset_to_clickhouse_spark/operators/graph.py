"""Distributed connected components — the clustering step of a dedup
pipeline.

Near-dup operators (``minhash_candidates``, ``simhash_pairs``,
``embedding_dedup_pairs``) emit PAIRS; turning pairs into "keep one doc
per duplicate cluster" requires the transitive closure: A~B and B~C put
all three in one cluster even though (A, C) was never a candidate pair.
That closure is connected components over the pair graph.

Implementation: iterative min-label propagation. Every node starts
labeled with itself; each round every node takes the min of its own and
its neighbors' labels; fixpoint = components labeled by their minimum
member. Each round is one join + one partial-aggregated groupBy (both
shuffle on the node key) plus a pointer-jumping hop (labels only ever
decrease, so following label(label(n)) compresses paths), and the label
frontier is ``localCheckpoint``ed so lineage doesn't grow with
iterations. With the jump, rounds needed = O(log diameter) — duplicate
clusters are shallow anyway (stars/short chains), so real corpora
converge in a handful of rounds; the large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce and Beyond") is the
same loop shape if even that is too many.

The reference has no graph surface (it is an Airflow ELT pipeline —
``v2/dag.py:156-169``); this is LLM-data-pipeline extension surface, and
the oracle twin is a recursive CTE computing min reachable label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    max_iter: int = 30,
) -> DataFrame:
    """→ (node, component) where component = min node id reachable.

    ``edges`` is undirected (each pair listed once is enough). ``nodes``
    optionally supplies the full node universe (isolated nodes then come
    back as their own singleton component); defaults to nodes appearing
    in ``edges``. Node ids must be non-null and orderable.

    Driver-side loop with a cheap convergence probe per round (EXISTS-
    style ``limit(1).count()`` on changed labels) — the data itself
    never reaches the driver.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)  # reused every round: scan, don't recompute
    )
    universe = sym.select(F.col("a").alias(node_col))
    if nodes is not None:
        universe = universe.union(nodes.select(F.col(node_col)))
    labels = universe.distinct().select(
        node_col, F.col(node_col).alias("component")
    )
    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels, sym["b"] == labels[node_col]
        ).select(sym["a"].alias(node_col), "component")
        new_labels = (
            labels.union(neighbor_labels)
            .groupBy(node_col)
            .agg(F.min("component").alias("component"))
        )
        # Pointer jumping: labels only ever decrease, so label(label(n))
        # ≤ label(n) — following one extra hop each round compresses
        # paths and turns chain convergence from O(diameter) rounds into
        # O(log diameter).
        hop = new_labels.select(
            F.col(node_col).alias("component"),
            F.col("component").alias("_parent"),
        )
        new_labels = (
            new_labels.join(hop, "component")
            .select(node_col, F.col("_parent").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), node_col)
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def connected_components_incremental(
    components: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    component_col: str = "component",
) -> DataFrame:
    """Fold a NEW batch of edges into an existing (node, component)
    assignment without recomputing the full graph — the cluster-side
    twin of incremental MinHash: daily dedup appends pairs, and the
    component table must absorb them at a cost that scales with the
    BATCH, never the corpus.

    Key insight: old edges can be forgotten because each existing
    component is already fully connected through its representative —
    collapsing every known node to its component id preserves exactly
    the reachability the new edges can extend. So: relabel new-edge
    endpoints by their current component (unknown nodes stand for
    themselves), run CC over that COLLAPSED graph (its size is
    O(|batch| + touched components), not O(corpus)), and join the
    resulting rep→rep mapping back onto the assignment table — one
    broadcast-friendly join over the corpus, no iteration over it.
    Invariant preserved: component = min reachable node id, exactly
    what a full recompute over all edges would produce."""
    comp = components.select(F.col(node_col), F.col(component_col))
    e = new_edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    ca = comp.select(
        F.col(node_col).alias("a"), F.col(component_col).alias("_ra")
    )
    cb = comp.select(
        F.col(node_col).alias("b"), F.col(component_col).alias("_rb")
    )
    collapsed = (
        e.join(ca, "a", "left")
        .join(cb, "b", "left")
        .select(
            F.coalesce("_ra", F.col("a")).alias("src"),
            F.coalesce("_rb", F.col("b")).alias("dst"),
        )
    )
    merged = connected_components(collapsed)  # tiny graph: reps + new nodes
    remap = merged.select(
        F.col("node").alias(component_col), F.col("component").alias("_new")
    )
    updated = comp.join(remap, component_col, "left").select(
        node_col,
        F.coalesce("_new", F.col(component_col)).alias(component_col),
    )
    brand_new = merged.join(
        comp.select(F.col(node_col).alias("node")), "node", "left_anti"
    ).select(F.col("node").alias(node_col), F.col("component").alias(component_col))
    return updated.unionByName(brand_new)


def dedup_survivors(
    components: DataFrame, node_col: str = "node"
) -> DataFrame:
    """Keep-one-per-cluster: the survivor of each duplicate cluster is
    its minimum-id member — exactly the rows whose label equals
    themselves. Pure filter, no shuffle."""
    return components.filter(F.col(node_col) == F.col("component"))


def quality_survivors(
    components: DataFrame,
    attrs: DataFrame,
    quality_col: str,
    node_col: str = "node",
    attr_id_col: str = "doc_id",
) -> DataFrame:
    """Keep-BEST-per-cluster: the survivor of each duplicate cluster is
    its highest-``quality_col`` member, ties broken by the lowest node
    id — what production corpus dedup actually wants (keep the longest/
    cleanest copy, not the lowest id). One ``max_by`` aggregate per
    component: partial aggregation ships one candidate per component
    per map task, where a row_number window would sort every cluster.
    → (component, node, quality)."""
    joined = components.join(
        attrs, components[node_col] == attrs[attr_id_col]
    ).select(
        "component",
        components[node_col].alias("_n"),
        F.col(quality_col).alias("_q"),
    )
    pick = F.max_by(
        F.struct(F.col("_n"), F.col("_q")),
        F.struct(F.col("_q"), (-F.col("_n")).alias("_neg")),
    ).alias("_w")
    return joined.groupBy("component").agg(pick).select(
        "component",
        F.col("_w._n").alias(node_col),
        F.col("_w._q").alias(quality_col),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list → (node, pr).

    Plain power iteration: every node starts at 1/N; each round
    ``pr'(v) = (1-d)/N + d * Σ_{u→v} pr(u)/outdeg(u)``. Dangling nodes
    (outdeg 0) contribute nothing — the simple formulation, declared so
    the SQL twin (the same ``iters`` rounds unrolled as CTEs) states
    identical semantics. ``pr`` is rounded at output only.

    Shape at scale: the edge list with its precomputed ``outdeg`` is the
    loop invariant — built once, ``localCheckpoint``ed, and reused every
    round so lineage stays flat. Each round is one join (ranks × edges,
    both shuffling on the SAME src key, so the exchange is reused) + one
    partial-aggregated groupBy on dst + a left join back to the node
    universe for no-inbound nodes. Ranks are O(|V|) and never collected;
    ``iters`` is fixed (rank deltas decay geometrically — a convergence
    probe would add a driver round-trip per iteration for nothing).

    r15 optimization round (guide §2.4/§5): ``nodes`` derives from the
    already-checkpointed ``ew`` instead of re-running the upstream edge
    join a second time (ew ≡ e with outdeg attached — the inner join
    key is ew's own src, so no edge is lost), and rank rounds are no
    longer eagerly materialized every iteration — the whole fixed-depth
    DAG runs as ONE job (measured 5.4 → 3.3 s on the sf0.1 trade graph,
    bit-identical ranks). Lineage is still cut every 4th round so a
    large ``iters`` cannot grow the plan without bound.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = e.join(outdeg, "src").localCheckpoint(eager=True)
    nodes = (
        ew.select(F.col("src").alias("node"))
        .union(ew.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    ranks = nodes.select("node", (F.lit(1.0) / n).alias("pr"))
    for i in range(iters):
        contrib = (
            ranks.join(ew, ranks["node"] == ew["src"])
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
            ).alias("pr"),
        )
        if i % 4 == 3:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.round("pr", 9).alias("pr"))


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Semi-supervised label propagation over an undirected edge list →
    (node, label) — the weak-supervision primitive: a few labeled seeds
    spread through the neighborhood structure (the third member of the
    graph trio next to connected_components and pagerank).

    SYNCHRONOUS hard-label updates with fully deterministic semantics a
    SQL twin can replay: each round, every non-seed node takes the
    label with the highest count among its labeled neighbors, ties
    broken toward the SMALLEST label; nodes with no labeled neighbor
    keep their current label (NULL until reached). Seeds are clamped —
    their labels never change. ``iters`` is fixed (like ``pagerank``:
    a convergence probe would cost a driver round-trip per round).

    Scale shape: the symmetrized edge list is the checkpointed loop
    invariant; each round is one labels×edges join + one
    (node, label) count aggregate + one deterministic argmax aggregate
    + a seed-clamp join — all keyed shuffles with map-side partials,
    labels O(|V|) and never collected. Unlike ``pagerank`` (state used
    once per round → linear plan growth, checkpoint relaxed in the r15
    optimization round), ``labels`` feeds BOTH the vote join and the
    keep-current fallback each round, so skipping the per-round
    checkpoint doubles the plan per iteration — it stays eager.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    )
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    sd = seeds.select(
        F.col(node_col).alias("node"), F.col(label_col).alias("_seed")
    ).localCheckpoint(eager=True)
    labels = nodes.join(sd, "node", "left").select(
        "node", F.col("_seed").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        votes = (
            labels.filter(F.col("label").isNotNull())
            .join(sym, labels["node"] == sym["a"])
            .groupBy(F.col("b").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        # argmax by (count DESC, label ASC): min over (-count, label).
        # Negating the COUNT (not the label) keeps the tie-break
        # type-agnostic — string labels would fail the numeric negate
        # under ANSI mode (or NULL out with ANSI off).
        best = votes.groupBy("node").agg(
            F.min_by(
                F.col("label"), F.struct(-F.col("_n"), F.col("label"))
            ).alias("_new")
        )
        labels = (
            labels.join(best, "node", "left")
            .join(sd, "node", "left")
            .select(
                "node",
                F.coalesce(
                    F.col("_seed"), F.col("_new"), F.col("label")
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    orient: str = "id",
) -> DataFrame:
    """Global triangle count → one row ``(n_triangles)``.

    Canonicalize to ordered unique edges (a < b, self-loops dropped,
    direction collapsed), then count paths a<b<c where (a,b), (b,c) and
    (a,c) are all edges: two hash self-joins on ordered endpoints. The
    a<b<c ordering counts each triangle exactly once and — the scale
    property — joins only "forward" adjacency, so a node's work is
    bounded by its forward degree. This is the standard MapReduce
    triangle algorithm (node-iterator++ ordering).

    ``orient="degree"`` re-orders edges by (degree, id) instead of raw
    id: every hub points only at HIGHER-degree nodes, so a celebrity
    node's forward adjacency — the quadratic term in the first
    self-join — is bounded by the count of even-bigger hubs, not its
    follower count. Same count (orientation never changes which
    triangles exist, only where they're discovered), different skew
    profile; this is the standard hub mitigation for power-law graphs.

    SQL-expressible (two self-joins + count), so fully oracle-checked.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    if orient == "degree":
        deg = (
            e.select(F.col("a").alias("n"))
            .unionAll(e.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("_d"))
        )
        da = deg.select(
            F.col("n").alias("a"), F.struct("_d", F.col("n")).alias("_ka")
        )
        db = deg.select(
            F.col("n").alias("b"), F.struct("_d", F.col("n")).alias("_kb")
        )
        e = (
            e.join(da, "a")
            .join(db, "b")
            .select(
                F.when(F.col("_ka") < F.col("_kb"), F.col("a"))
                .otherwise(F.col("b"))
                .alias("a"),
                F.when(F.col("_ka") < F.col("_kb"), F.col("b"))
                .otherwise(F.col("a"))
                .alias("b"),
            )
        )
    elif orient != "id":
        raise ValueError("orient must be 'id' or 'degree'")
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """k-core subgraph membership → (node, core_degree): the maximal
    subgraph where every node has degree ≥ k, by iterative peeling —
    drop all nodes with degree < k, recompute degrees on the induced
    subgraph, repeat to fixpoint. ``core_degree`` is the node's degree
    WITHIN the k-core.

    Distributed shape: each round is one degree aggregation (map-side
    combined) + one semi-join of edges against surviving nodes — no
    windows, no driver data. The edge set only shrinks, and each
    round's result is localCheckpoint-ed so lineage stays flat (same
    discipline as connected_components). Convergence probe is a
    ``limit(1).count()`` on sub-k nodes, not a full count. Peel depth
    is bounded by the graph's degeneracy ordering — typically a few
    rounds; ``max_iter`` guards pathological chains (a path graph
    peels O(n/2) rounds at k=2, raise max_iter for those).

    SQL-expressible by unrolling the peel rounds as CTEs (the oracle
    does exactly that), so fully oracle-checked; callers should assert
    convergence ≤ the oracle's unroll depth at fixture scale.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    for _ in range(max_iter):
        # r15 optimization round (guide §2.4): the degree table feeds
        # BOTH the convergence probe and the survivor semi-join; without
        # the checkpoint the full degree aggregation ran twice per round
        # (once under the probe, once under the rebuild). r16: the
        # weak-node probe rides the checkpoint job as an Observation —
        # one scheduler round-trip per peel round instead of two. The
        # per-round checkpoint blocks (ADVICE r15) are reclaimed
        # asynchronously: each round drops the only reference to the
        # previous round's frames, so the ContextCleaner unpersists
        # them; transient storage is bounded by GC latency, not
        # max_iter.
        obs = Observation()
        deg = (
            e.select(F.col("a").alias("n"))
            .unionAll(e.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
            .observe(
                obs,
                F.count(F.when(F.col("d") < k, F.lit(1))).alias("weak"),
            )
            .localCheckpoint(eager=True)
        )
        if int(obs.get["weak"]) == 0:
            break
        keep = deg.filter(F.col("d") >= k).select("n")
        e = (
            e.join(keep.withColumnRenamed("n", "a"), "a")
            .join(keep.withColumnRenamed("n", "b"), "b")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )


def clustering_coefficient(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Local clustering coefficient per node → (node, degree, n_tri,
    coeff): coeff = 2·T(v) / (d(v)·(d(v)−1)), the fraction of a
    node's neighbor pairs that are themselves connected; 0 for
    degree-< 2 nodes.

    Triangle side reuses the a<b<c node-iterator listing (two hash
    self-joins over canonicalized forward edges — each triangle listed
    once), then credits all three corners via one 3-element explode
    and a partial-aggregated count; degree side is one aggregation
    over the same canonical edges. Per-node work is bounded by forward
    degree exactly as in ``triangle_count``; nothing is quadratic in
    the corpus. Fully SQL-expressible → oracle-checked.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .select(
            F.explode(
                F.array(F.col("e1.a"), F.col("e1.b"), F.col("e2.b"))
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_tri"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0
                    * F.coalesce(F.col("n_tri"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - F.lit(1))),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("coeff"),
        )
    )


def cooccurrence(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 1,
    max_basket: int | None = None,
) -> DataFrame:
    """Item co-occurrence (market-basket pairs): for every unordered
    item pair (item_a < item_b), the number of groups containing BOTH →
    (item_a, item_b, n_groups).

    One distinct (group, item) projection, one self-join on the group
    key, one partial-aggregated count. At scale the join fans out as
    Σ|basket|² — bounded by basket size, not corpus size — so
    ``max_basket`` drops pathological groups (a crawler hitting every
    page, a bot user touching every item) BEFORE the self-join, the
    same way AllPairs prefix filtering caps candidate growth; dropped
    groups cost one extra partial-aggregated count over the projection.
    min_count prunes the long tail AFTER the aggregate (a support
    threshold, the Apriori base step)."""
    gi = df.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
    ).distinct()
    if max_basket is not None:
        sizes = gi.groupBy("_g").agg(F.count(F.lit(1)).alias("_sz"))
        gi = (
            gi.join(sizes.filter(F.col("_sz") <= max_basket), "_g")
            .select("_g", "_i")
        )
    a, b = gi.alias("a"), gi.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._g") == F.col("b._g")) & (F.col("a._i") < F.col("b._i")),
        )
        .groupBy(
            F.col("a._i").alias("item_a"), F.col("b._i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .filter(F.col("n_groups") >= min_count)
    )
    return pairs


def shortest_hops(
    edges: DataFrame,
    source_ids: "list",
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    max_hops: int = 5,
) -> DataFrame:
    """Multi-source BFS → (node, hops): minimum hop count from any
    source over the undirected edge set, truncated at ``max_hops``
    (unreached nodes are absent). ClickHouse has no graph traversal;
    the oracle twin is a recursive CTE with UNION-dedup state.

    Frontier algorithm: per round, the frontier joins the symmetrized
    edge list, an ANTI join against the visited set keeps only
    first-time nodes (which by BFS order carry their MINIMUM hop
    count), and both sets localCheckpoint so round N+1 scans
    materialized results instead of growing one giant lineage. At
    100 TB: per-round work is |frontier ⋈ edges| — the visited set
    never re-joins edges, and the driver sees only an empty-frontier
    probe (limit(1).count()), never data."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    from pyspark.sql import Observation

    frontier = spark.createDataFrame(
        [(v,) for v in source_ids], f"{node_col} long"
    ).distinct()
    visited = frontier.select(node_col, F.lit(0).alias("hops"))
    visited = visited.localCheckpoint(eager=True)
    for hop in range(1, max_hops + 1):
        # r16 optimization round (guide §5): the empty-frontier probe
        # rides the checkpoint job as an Observation — one scheduler
        # round-trip per hop instead of two.
        obs = Observation()
        nxt = (
            frontier.join(sym, frontier[node_col] == sym["a"])
            .select(sym["b"].alias(node_col))
            .distinct()
            .join(visited.select(node_col), node_col, "left_anti")
            .select(node_col, F.lit(hop).alias("hops"))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if int(obs.get["n"]) == 0:
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select(node_col)
    return visited


def adamic_adar(
    df: DataFrame,
    node_col: str,
    feat_col: str,
    min_common: int = 1,
    max_deg: "int | None" = None,
) -> DataFrame:
    """Adamic–Adar link prediction over a bipartite (node, feature)
    edge list → (node_a, node_b, common, aa): candidate node pairs
    sharing ≥ ``min_common`` features, scored Σ 1/ln(deg(f)) over the
    shared features — rare shared features count more than ubiquitous
    ones. The classic common-neighbor predictor (friend-of-friend,
    co-purchase, supplier overlap).

    Scale shape: the pair expansion is keyed BY FEATURE (never an
    all-pairs node join) and is Σ deg² — bounded by ``max_deg``,
    which drops hub features entirely (a feature shared by thousands
    of nodes carries ~no AA signal but quadratic cost; capping is the
    standard mitigation). deg = 1 features pair with nothing and are
    pre-filtered. ln of an integer degree is engine-exact input →
    1-ulp libm noise, far under the 6dp round."""
    e = df.select(
        F.col(node_col).alias("_n"), F.col(feat_col).alias("_f")
    ).distinct()
    deg = e.groupBy("_f").agg(F.count("*").alias("_deg")).filter(
        F.col("_deg") >= 2
    )
    if max_deg is not None:
        deg = deg.filter(F.col("_deg") <= max_deg)
    a = e.select(F.col("_n").alias("node_a"), "_f")
    b = e.select(F.col("_n").alias("node_b"), "_f")
    pairs = (
        a.join(b, "_f")
        .filter(F.col("node_a") < F.col("node_b"))
        .join(deg, "_f")
    )
    return (
        pairs.groupBy("node_a", "node_b")
        .agg(
            F.count("*").alias("common"),
            F.round(
                F.sum(1.0 / F.log(F.col("_deg").cast("double"))), 6
            ).alias("aa"),
        )
        .filter(F.col("common") >= min_common)
    )


def closeness_from_pivots(
    edges: DataFrame,
    pivot_ids: "list",
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 4,
) -> DataFrame:
    """Pivot-based closeness + harmonic centrality → (node,
    n_reached, sum_hops, closeness, harmonic): BFS distances from a
    FIXED pivot set (the standard large-graph approximation — exact
    all-pairs closeness is O(V·E) and nobody runs it at scale),
    aggregated per node: closeness = n_reached/Σd, harmonic =
    Σ 1/d over d ≥ 1. Pivots contribute d = 0 to their own sum and
    nothing to their harmonic term.

    One frontier loop keyed on (pivot, node) — all pivots advance in
    the same ≤ max_hops rounds, per-round work is |frontier ⋈ edges|
    with an anti-join dedup, same checkpointed-invariant shape as
    :func:`shortest_hops`."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    from pyspark.sql import Observation

    frontier = spark.createDataFrame(
        [(int(p), int(p)) for p in pivot_ids], "pivot long, node long"
    ).distinct()
    visited = frontier.select("pivot", "node", F.lit(0).alias("hops"))
    visited = visited.localCheckpoint(eager=True)
    for hop in range(1, max_hops + 1):
        # r16 optimization round (guide §5): the empty-frontier probe
        # rides the checkpoint job as an Observation — one scheduler
        # round-trip per hop instead of two.
        obs = Observation()
        nxt = (
            frontier.join(sym, frontier["node"] == sym["a"])
            .select("pivot", sym["b"].alias("node"))
            .distinct()
            .join(
                visited.select("pivot", "node"),
                ["pivot", "node"],
                "left_anti",
            )
            .select("pivot", "node", F.lit(hop).alias("hops"))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if int(obs.get["n"]) == 0:
            break
        # (r15 optimization round: a lazy union of the checkpointed
        # per-hop frames was tried here and measured SLOWER — the
        # growing union's partition count inflates every later
        # anti-join; the eager re-materialization stays.)
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("pivot", "node")
    agg = visited.groupBy("node").agg(
        F.count("*").alias("n_reached"),
        F.sum("hops").alias("sum_hops"),
        F.sum(
            F.when(
                F.col("hops") > 0, 1.0 / F.col("hops").cast("double")
            ).otherwise(F.lit(0.0))
        ).alias("_harm"),
    )
    return agg.select(
        "node",
        "n_reached",
        "sum_hops",
        F.round(
            F.when(
                F.col("sum_hops") > 0,
                F.col("n_reached").cast("double")
                / F.col("sum_hops").cast("double"),
            ),
            6,
        ).alias("closeness"),
        F.round("_harm", 6).alias("harmonic"),
    )


def strongly_connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    max_rounds: int = 10,
    max_prop: int = 30,
) -> DataFrame:
    """→ (node, scc) — strongly connected components of a DIRECTED
    graph by iterative forward coloring + backward containment (the
    Pregel-style FW-BW/coloring algorithm, Orzan 2004): each outer
    round (1) propagates the MAX node id forward to convergence, so
    color(v) = the largest id that reaches v and every SCC is
    monochrome; (2) walks BACKWARD from each color's root c along
    same-color nodes — the nodes that both reach c and are reached by
    it are exactly c's SCC; (3) settles those nodes and repeats on the
    rest. Every color class settles one SCC per round IN PARALLEL, so
    rounds ≈ longest chain of SCCs hanging off shared colors, not the
    SCC count.

    Both inner loops are the same shuffle shape as
    :func:`connected_components` (join labels to edges, groupBy max /
    any), with ``localCheckpoint`` per step and EXISTS-style
    convergence probes — nothing but probe scalars reaches the driver.
    The web-graph operator: dedup link farms, collapse redirect
    cycles, find mutually-citing clusters."""
    from pyspark.sql import Observation

    e0 = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    universe = e0.select(F.col("s").alias(node_col)).union(
        e0.select(F.col("d").alias(node_col))
    )
    if nodes is not None:
        universe = universe.union(nodes.select(F.col(node_col)))
    # r16 optimization round (guide §2.4/§5): every scalar the driver
    # needs this round — emptiness probes, edge counts, the monotone
    # color-sum convergence probe — rides the materializing checkpoint
    # job as an Observation instead of being a separate aggregate job;
    # each one removed is a full scheduler round-trip per round/step.
    node_dtype = dict(universe.dtypes)[node_col]
    sum_probe = node_dtype in (
        "tinyint", "smallint", "int", "bigint"
    ) or node_dtype.startswith("decimal")

    def _ckpt_nodes(df_nodes, col):
        """Checkpoint a node frame; its row count (and, for numeric
        ids, the decimal sum of ``col``) rides the checkpoint job."""
        obs = Observation()
        metrics = [F.count(F.lit(1)).alias("n")]
        if sum_probe:
            metrics.append(
                F.sum(F.col(col).cast("decimal(38,0)")).alias("s")
            )
        got = df_nodes.observe(obs, *metrics).localCheckpoint(eager=True)
        m = obs.get
        return got, m["n"], (m["s"] if sum_probe else None)

    active, n_active, active_sum = _ckpt_nodes(
        universe.distinct(), node_col
    )
    done = None
    for _ in range(max_rounds):
        if n_active == 0:
            break
        # live edge set: both endpoints still unsettled (the edge count
        # for the density bound rides the checkpoint job)
        e_obs = Observation()
        e = (
            e0.join(active.select(F.col(node_col).alias("s")), "s")
            .join(active.select(F.col(node_col).alias("d")), "d")
            .select("s", "d")
            .observe(e_obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        # hop doubling: propagating over e ∪ e∘e halves both inner
        # loops' round counts (reach grows 2 hops per step) at the
        # cost of one composition join up front. Only worth it — and
        # only SAFE at scale — on sparse graphs: |e∘e| with
        # multiplicity is EXACTLY Σ_v indeg(v)·outdeg(v), which two
        # degree aggregates bound BEFORE anything is composed, so a
        # dense graph never materializes its square.
        eprop = e
        n_e = int(e_obs.get["n"])
        comp_bound = (
            e.groupBy(F.col("d").alias("_v"))
            .agg(F.count(F.lit(1)).alias("_in"))
            .join(
                e.groupBy(F.col("s").alias("_v")).agg(
                    F.count(F.lit(1)).alias("_out")
                ),
                "_v",
            )
            .agg(F.sum(F.col("_in").cast("long") * F.col("_out")))
            .collect()[0][0]
            or 0
        )
        if comp_bound <= 4 * n_e:
            e2 = (
                e.alias("l")
                .join(e.alias("r"), F.col("l.d") == F.col("r.s"))
                .select(
                    F.col("l.s").alias("s"), F.col("r.d").alias("d")
                )
            )
            eprop = e.union(e2).distinct().localCheckpoint(eager=True)
        # (1) forward MAX-color propagation: color(v) = max id reaching v.
        # Convergence probe: colors only ever INCREASE under max-
        # propagation, so for INTEGRAL node ids the exact decimal sum of
        # colors is strictly monotone until fixpoint — a scalar that now
        # rides each step's checkpoint job as an Observation (the
        # initial sum rode `active`'s checkpoint). That sum is only
        # well-defined for numeric ids: string/other ids would ANSI-throw
        # (or NULL-out, falsely converging) under the decimal cast, so
        # non-numeric ids keep the type-agnostic changed-rows EXISTS
        # probe (one equi-join on the two checkpointed frames per step).
        color = active.select(node_col, F.col(node_col).alias("color"))
        prev_sum = active_sum
        converged = False
        for _ in range(max_prop):
            via = (
                eprop.join(color, eprop["s"] == color[node_col])
                .select(eprop["d"].alias(node_col), "color")
            )
            step = (
                color.union(via)
                .groupBy(node_col)
                .agg(F.max("color").alias("color"))
            )
            if sum_probe:
                c_obs = Observation()
                new = step.observe(
                    c_obs,
                    F.sum(F.col("color").cast("decimal(38,0)")).alias("s"),
                ).localCheckpoint(eager=True)
                cur_sum = c_obs.get["s"]
                stable = cur_sum == prev_sum
                prev_sum = cur_sum
            else:
                new = step.localCheckpoint(eager=True)
                stable = (
                    new.alias("n")
                    .join(color.alias("o"), node_col)
                    .filter(F.col("n.color") != F.col("o.color"))
                    .limit(1)
                    .count()
                    == 0
                )
            color = new
            if stable:
                converged = True
                break
        if not converged:
            # Exhausting the cap without convergence would settle WRONG
            # components (partially-propagated colors split real SCCs
            # into singletons) — fail loudly instead: propagation depth
            # is bounded by the graph's longest simple path, so callers
            # raise max_prop past their graph's diameter.
            raise ValueError(
                f"scc: forward coloring did not converge in {max_prop} "
                "rounds — raise max_prop above the graph diameter"
            )
        # (2) backward reach from each color root WITHIN its color class:
        # member(v) iff v's color is c and v reaches c via same-color path
        member = color.filter(F.col(node_col) == F.col("color")).select(
            node_col, "color"
        )
        ec_obs = Observation()
        ec = (
            e.join(color.select(F.col(node_col).alias("s"),
                                F.col("color").alias("_cs")), "s")
            .join(color.select(F.col(node_col).alias("d"),
                               F.col("color").alias("_cd")), "d")
            .filter(F.col("_cs") == F.col("_cd"))
            .select("s", "d")
            .observe(ec_obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        # same hop doubling as the forward loop (same pre-composition
        # density bound); compositions of same-color edges stay within
        # the color class, so the 2-hop union is still same-color
        ecprop = ec
        n_ec = int(ec_obs.get["n"])
        ec_bound = (
            ec.groupBy(F.col("d").alias("_v"))
            .agg(F.count(F.lit(1)).alias("_in"))
            .join(
                ec.groupBy(F.col("s").alias("_v")).agg(
                    F.count(F.lit(1)).alias("_out")
                ),
                "_v",
            )
            .agg(F.sum(F.col("_in").cast("long") * F.col("_out")))
            .collect()[0][0]
            or 0
        )
        if ec_bound <= 4 * n_ec:
            ec2 = (
                ec.alias("l")
                .join(ec.alias("r"), F.col("l.d") == F.col("r.s"))
                .select(
                    F.col("l.s").alias("s"), F.col("r.d").alias("d")
                )
            )
            ecprop = (
                ec.union(ec2).distinct().localCheckpoint(eager=True)
            )
        # membership only ever GROWS, so the previous step's count
        # (carried in a local) is the convergence probe; each step's
        # count rides its checkpoint job as an Observation
        converged = False
        prev_cnt = member.count()
        for _ in range(max_prop):
            via = (
                ecprop.join(member, ecprop["d"] == member[node_col])
                .select(ecprop["s"].alias(node_col), "color")
            )
            m_obs = Observation()
            new = (
                member.union(via)
                .distinct()
                .observe(m_obs, F.count(F.lit(1)).alias("n"))
                .localCheckpoint(eager=True)
            )
            cur_cnt = int(m_obs.get["n"])
            member = new
            if cur_cnt == prev_cnt:
                converged = True
                break
            prev_cnt = cur_cnt
        if not converged:
            raise ValueError(
                f"scc: backward containment did not converge in "
                f"{max_prop} rounds — raise max_prop above the graph "
                "diameter"
            )
        settled = member.select(node_col, F.col("color").alias("scc"))
        # r15 optimization round: `done` is a union of already-
        # checkpointed member frames and is only consumed once at the
        # end — the old per-round eager checkpoint re-wrote every
        # settled row each round.
        done = settled if done is None else done.union(settled)
        active, n_active, active_sum = _ckpt_nodes(
            active.join(settled.select(node_col), node_col, "left_anti"),
            node_col,
        )
    if done is None:
        return universe.distinct().select(
            node_col, F.col(node_col).alias("scc")
        )
    if n_active > 0:
        # Unsettled nodes after max_rounds would come back as WRONG
        # singletons — fail loudly; rounds are bounded by the depth of
        # the SCC condensation, so callers raise max_rounds for deep
        # DAG chains.
        raise ValueError(
            f"scc: {n_active} nodes unsettled after {max_rounds} "
            "rounds — raise max_rounds (condensation depth exceeded)"
        )
    return done


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 8,
    driver_max_nodes: int = 128,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) by ``iters`` power
    steps → (node, hub, authority): a'(v) = Σ_{u→v} h(u),
    h'(u) = Σ_{u→v} a'(v), each L2-normalized per round. PageRank
    ranks by endorsement mass; HITS separates the CURATORS (hubs,
    pointing at good things) from the AUTHORITIES (pointed at) — the
    directed-graph complement to :func:`pagerank` on the same edges.

    Determinism contract (the pca_power precedent): scores land on
    the 1e-9 GRID after every normalization, so cross-engine
    summation ulps (~1e-15) can never move the trajectory, and the
    oracle unrolls the identical matvec → normalize → grid walk.
    Shape at scale: the distinct edge list is the checkpointed loop
    invariant; each half-step is one join + one partial-aggregated
    groupBy; per-round ``localCheckpoint`` keeps lineage flat (state
    feeds both the norm aggregate and the next join — without the
    checkpoint the plan doubles per round).

    Tiny condensed graphs (≤ ``driver_max_nodes`` nodes AFTER the
    corpus-scale edge aggregation — e.g. nation-level rollups) take a
    driver fast path: the distinct edge list collects (node²-bounded
    by construction, the k-means k×dim precedent) and the power steps
    run as plain floats. The trajectory is bit-compatible with the
    distributed path's grid contract — every score re-lands on the
    1e-9 grid after each normalization, so summation-order ulps
    (~1e-16) can't move it; 16 scheduler round-trips for a 25-row
    matvec was pure overhead (measured 5.2 s → ~1.5 s at sf0.1)."""
    if iters < 1:
        raise ValueError(f"hits() needs iters >= 1, got {iters}")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    grid = 1e9
    n_nodes = nodes.count()
    if n_nodes <= driver_max_nodes:
        spark = edges.sparkSession
        el = [(r["src"], r["dst"]) for r in e.collect()]
        nl = sorted(r["node"] for r in nodes.collect())
        import math as _m

        h = {n: 1.0 for n in nl}
        a = {}
        for _ in range(iters):
            a = {n: 0.0 for n in nl}
            for s, d in sorted(el):
                a[d] += h[s]
            nrm = _m.sqrt(sum(a[n] * a[n] for n in nl))
            a = {
                n: _m.floor(a[n] / nrm * grid + 0.5) / grid for n in nl
            }
            h = {n: 0.0 for n in nl}
            for s, d in sorted(el):
                h[s] += a[d]
            nrm = _m.sqrt(sum(h[n] * h[n] for n in nl))
            h = {
                n: _m.floor(h[n] / nrm * grid + 0.5) / grid for n in nl
            }
        # HALF_UP to 6dp (scores are ≥ 0) — Python's round() is
        # half-even and would diverge from F.round/duckdb round on
        # exact .5 grid landings
        rows = [
            (
                n,
                _m.floor(h[n] * 1e6 + 0.5) / 1e6,
                _m.floor(a[n] * 1e6 + 0.5) / 1e6,
            )
            for n in nl
        ]
        base = nodes.schema["node"].dataType.simpleString()
        return spark.createDataFrame(
            rows, f"node {base}, hub double, authority double"
        )

    def _norm_grid(df: DataFrame, col: str) -> DataFrame:
        nrm = df.agg(
            F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_nrm")
        )
        return df.crossJoin(F.broadcast(nrm)).select(
            "node",
            (
                F.floor(F.col(col) / F.col("_nrm") * grid + 0.5) / grid
            ).alias(col),
        )

    hub = nodes.select("node", F.lit(1.0).alias("h"))
    auth = None
    for _ in range(iters):
        a_new = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        auth = _norm_grid(
            nodes.join(a_new, "node", "left").select(
                "node", F.coalesce("a", F.lit(0.0)).alias("a")
            ),
            "a",
        ).localCheckpoint(eager=True)
        h_new = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        hub = _norm_grid(
            nodes.join(h_new, "node", "left").select(
                "node", F.coalesce("h", F.lit(0.0)).alias("h")
            ),
            "h",
        ).localCheckpoint(eager=True)
    return (
        hub.join(auth, "node")
        .select(
            "node",
            F.round("h", 6).alias("hub"),
            F.round("a", 6).alias("authority"),
        )
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) → single row
    (n_nodes, m_edges, assortativity): the Pearson correlation of
    endpoint degrees over all edges — positive means hubs attach to
    hubs (social cores), negative means hubs fan out to leaves
    (hub-and-spoke crawl graphs, the shape that predicts hot-key
    skew in edge-partitioned joins).

    Undirected treatment: each distinct edge contributes both (d_u,
    d_v) and (d_v, d_u), which symmetrizes the correlation exactly.
    Degrees are exact BIGINT counts; all five Pearson sums are exact
    integer aggregates (no grid needed), so r is an exact expression
    of integers — engine-identical. Two keyed joins + one aggregate;
    no window, no iteration."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy("a").agg(F.count("*").alias("d")).select(
        F.col("a").alias("node"), F.col("d")
    )
    pairs = (
        und.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("d", "dx")
        .join(
            deg.select(F.col("node").alias("b"), F.col("d").alias("dy")),
            "b",
        )
    )
    agg = pairs.agg(
        F.count("*").alias("_m2"),
        F.sum("dx").alias("_sx"),
        F.sum("dy").alias("_sy"),
        F.sum(F.col("dx").cast("long") * F.col("dy")).alias("_sxy"),
        F.sum(F.col("dx").cast("long") * F.col("dx")).alias("_sxx"),
        F.sum(F.col("dy").cast("long") * F.col("dy")).alias("_syy"),
    )
    nodes = deg.agg(F.count("*").alias("_nn"))
    agg = agg.crossJoin(F.broadcast(nodes))
    m2 = F.col("_m2").cast("double")
    num = m2 * F.col("_sxy") - F.col("_sx").cast("double") * F.col("_sy")
    den = F.sqrt(
        (m2 * F.col("_sxx") - F.col("_sx").cast("double") * F.col("_sx"))
        * (m2 * F.col("_syy") - F.col("_sy").cast("double") * F.col("_sy"))
    )
    r = F.when(den > 0, num / den)
    return agg.select(
        F.col("_nn").cast("long").alias("n_nodes"),
        (F.col("_m2") / 2).cast("long").alias("m_edges"),
        F.round(r, 6).alias("assortativity"),
    )


def edge_jaccard(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
) -> DataFrame:
    """Per-edge neighborhood Jaccard → (u, v, common, deg_u, deg_v,
    jaccard): |N(u)∩N(v)| / |N(u)∪N(v)\\{u,v}| for every existing
    edge — the tie-strength / link-prediction score (strong ties
    share neighborhoods; a bridge between communities scores ~0).
    The per-edge refinement of adamic_adar: same candidate structure,
    set overlap instead of a rarity-weighted sum.

    Common neighbors come from the triangle-pattern equi-join
    (edge (u,v) ⋈ adjacency on u ⋈ adjacency on v, matching the far
    endpoint) — candidates are Σ deg², never all pairs, and only
    edges with ≥ ``min_common`` shared neighbors surface. All counts
    exact integers; jaccard is an exact ratio."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy("a").agg(F.count("*").alias("d"))
    adj_u = und.select(F.col("a").alias("u"), F.col("b").alias("w"))
    adj_v = und.select(F.col("a").alias("v2"), F.col("b").alias("w2"))
    common = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .join(adj_u, "u")
        .join(
            adj_v,
            (F.col("v") == F.col("v2")) & (F.col("w") == F.col("w2")),
        )
        .filter((F.col("w") != F.col("u")) & (F.col("w") != F.col("v")))
        .groupBy("u", "v")
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= min_common)
    )
    out = (
        common.join(
            deg.select(F.col("a").alias("u"), F.col("d").alias("deg_u")),
            "u",
        )
        .join(
            deg.select(F.col("a").alias("v"), F.col("d").alias("deg_v")),
            "v",
        )
    )
    # union excludes the endpoints themselves: u ∈ N(v) and v ∈ N(u)
    # always (it's an edge), so |N(u)∪N(v)\{u,v}| = du + dv − 2 − common
    union_sz = (
        F.col("deg_u") + F.col("deg_v") - 2 - F.col("common")
    ).cast("double")
    jac = F.when(
        union_sz > 0, F.col("common").cast("double") / union_sz
    ).otherwise(F.lit(1.0))
    return out.select(
        "u",
        "v",
        F.col("common").cast("long").alias("common"),
        F.col("deg_u").cast("long").alias("deg_u"),
        F.col("deg_v").cast("long").alias("deg_v"),
        F.round(jac, 6).alias("jaccard"),
    )


def reciprocity(
    df: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Directed-graph reciprocity → single row (n_edges, n_mutual,
    reciprocity): the fraction of directed edges whose reverse edge
    also exists — the "is this interaction graph conversational or
    broadcast" summary (follows-vs-friends, reply rates). Self-loops
    drop; edges dedup first.

    One distinct pass + one self-join on the swapped key (equi-join,
    shuffle on the edge key, no enumeration beyond existing edges)."""
    e = (
        df.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    rev = e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    mutual = e.join(rev, ["u", "v"], "left_semi")
    n = e.agg(F.count("*").alias("n_edges"))
    m = mutual.agg(F.count("*").alias("n_mutual"))
    j = n.crossJoin(m)
    return j.select(
        F.col("n_edges").cast("long").alias("n_edges"),
        F.col("n_mutual").cast("long").alias("n_mutual"),
        F.round(
            F.when(
                F.col("n_edges") > 0,
                F.col("n_mutual") / F.col("n_edges").cast("double"),
            ),
            6,
        ).alias("reciprocity"),
    )


def link_prediction_scores(
    df: DataFrame,
    node_col: str,
    key_col: str,
    min_common: int = 2,
) -> DataFrame:
    """Link-prediction score table over the bipartite (node, key)
    graph → (a, b, common, pref_attachment, cosine): candidate node
    pairs KEYED BY SHARED KEY (the adamic_adar discipline — never
    all-pairs), with the three classic scores: common-neighbor
    count, preferential attachment deg(a)·deg(b) (hubs connect), and
    cosine common/√(deg_a·deg_b) (degree-normalized). min_common
    prunes the candidate tail at the reducer.

    Per-key pair expansion is bounded by key degree (same hub-cap
    caveat as adamic_adar); degrees join back by node key."""
    e = df.select(
        F.col(node_col).alias("n"), F.col(key_col).alias("k")
    ).distinct()
    deg = e.groupBy("n").agg(F.count("*").alias("deg"))
    a = e.select(F.col("k"), F.col("n").alias("a"))
    b = e.select(F.col("k"), F.col("n").alias("b"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= min_common)
    )
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("_db"))
    out = pairs.join(da, "a").join(db, "b")
    return out.select(
        "a",
        "b",
        F.col("common").cast("long").alias("common"),
        (F.col("_da").cast("long") * F.col("_db")).alias("pref_attachment"),
        F.round(
            F.col("common")
            / F.sqrt(F.col("_da").cast("double") * F.col("_db")),
            6,
        ).alias("cosine"),
    )


def k_truss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """k-truss subgraph → (a, b, support): the maximal subgraph where
    every edge closes at least k−2 triangles, by iterative support
    peeling — count per-edge triangle support, drop edges below k−2,
    recount on the induced subgraph, repeat to fixpoint. Strictly
    stronger than ``kcore`` at the same k (every k-truss edge sits in
    a (k−1)-core) and the standard community-core extractor that
    survives the bridge edges k-core keeps.

    Distributed shape per round: the a<b<c node-iterator triangle
    listing (two self-joins on canonical edges — the same program as
    ``triangle_count``), a 3-way explode crediting each triangle's
    three edges, one count per edge, one semi-join filter. The edge
    set only shrinks; each round localCheckpoints so lineage stays
    flat. Convergence probes with limit(1).count(). SQL-expressible
    by unrolling rounds as CTEs — the oracle does exactly that;
    fixture graphs must converge within the unroll depth."""
    if k < 3:
        raise ValueError("k must be >= 3 (k-2 triangle support)")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    thresh = k - 2
    sup = None
    converged = False
    for _ in range(max_iter):
        e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
        e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
        tri = e1.join(e2, "y").join(e3, ["x", "z"])
        sides = tri.select(
            F.explode(
                F.array(
                    F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                    F.struct(F.col("y").alias("a"), F.col("z").alias("b")),
                    F.struct(F.col("x").alias("a"), F.col("z").alias("b")),
                )
            ).alias("_e")
        ).select("_e.a", "_e.b")
        sup = (
            e.join(
                sides.groupBy("a", "b").agg(
                    F.count(F.lit(1)).alias("support")
                ),
                ["a", "b"],
                "left",
            )
            .withColumn("support", F.coalesce("support", F.lit(0)))
            .localCheckpoint(eager=True)
        )
        weak = sup.filter(F.col("support") < thresh)
        if weak.limit(1).count() == 0:
            converged = True
            break
        e = sup.filter(F.col("support") >= thresh).select(
            "a", "b"
        ).localCheckpoint(eager=True)
    if not converged:
        # Exhausting the cap mid-peel would return a NON-truss: the last
        # computed sup still carries edges below threshold (with supports
        # relative to a stale edge set). Fail loudly, matching scc's
        # contract — peel depth is bounded by the edge count, so callers
        # raise max_iter for deep peel chains.
        raise ValueError(
            f"k_truss: peeling did not converge in {max_iter} rounds — "
            "raise max_iter"
        )
    return sup.select("a", "b", F.col("support").cast("long").alias("support"))


def rich_club(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Rich-club coefficient → one row (k, n_club, e_club, phi): the
    edge density among nodes of degree > k — do the hubs wire to each
    other (φ → 1, an elite core) or only down into the periphery
    (φ → 0)? The topology question ``degree_assortativity`` answers
    only on average. One degree aggregate + one double semi-join of
    the canonical edge list against the club; exact integers."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    club = deg.filter(F.col("d") > k).select("n")
    ec = (
        e.join(club.withColumnRenamed("n", "a"), "a")
        .join(club.withColumnRenamed("n", "b"), "b")
    )
    counts = club.agg(F.count("*").alias("_nc")).crossJoin(
        ec.agg(F.count("*").alias("_ec"))
    )
    nc = F.col("_nc").cast("double")
    phi = F.when(
        F.col("_nc") >= 2,
        2.0 * F.col("_ec").cast("double") / (nc * (nc - 1.0)),
    )
    return counts.select(
        F.lit(int(k)).cast("long").alias("k"),
        F.col("_nc").cast("long").alias("n_club"),
        F.col("_ec").cast("long").alias("e_club"),
        F.round(phi, 6).alias("phi"),
    )


def louvain_move(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One synchronous Louvain phase-1 move round from singleton
    communities → (node, community): every node simultaneously joins
    the neighbor whose (singleton) community maximizes the modularity
    gain, ΔQ(i→{j}) ∝ 2m·k_{i,j} − deg(i)·deg(j) (positive iff the
    edge beats its configuration-model expectation), ties to the
    smallest neighbor id, staying alone when no gain is positive —
    the deterministic, fully-distributed first move of
    Louvain/Leiden (sequential greedy sweeps don't parallelize; the
    synchronous round is the standard Pregel adaptation) and the
    modularity-aware sibling of ``label_propagation``.

    EXACT integer arithmetic throughout: the gain comparison is
    2m·1 − deg_i·deg_j per neighbor (the k_{i,j} = 1 singleton case),
    argmax via lexicographic max over (gain, −j) structs — one degree
    aggregate + one join + one groupBy, no floats until nothing is
    left to compare. Compose with :func:`modularity` to score the
    resulting partition."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    m2 = e.count() * 2  # 2m, exact
    # directed neighbor pairs (i, j) with both degrees
    nbr = e.select(
        F.col("a").alias("i"), F.col("b").alias("j")
    ).unionAll(e.select(F.col("b").alias("i"), F.col("a").alias("j")))
    nbr = (
        nbr.join(deg.withColumnRenamed("n", "i"), "i")
        .withColumnRenamed("d", "di")
        .join(
            deg.withColumnRenamed("n", "j").withColumnRenamed("d", "dj"),
            "j",
        )
    )
    gain = F.lit(int(m2)).cast("long") - F.col("di") * F.col("dj")
    best = (
        nbr.select(
            "i",
            F.struct(
                gain.alias("g"), (-F.col("j")).alias("nj")
            ).alias("_c"),
            F.col("j"),
        )
        .groupBy("i")
        .agg(F.max("_c").alias("_b"))
        .select(
            "i",
            F.when(
                F.col("_b.g") > 0, -F.col("_b.nj")
            ).otherwise(F.col("i")).alias("community"),
        )
    )
    # isolated nodes (none here — every node has an edge) stay alone;
    # nodes only in e but absent from nbr cannot exist by construction
    return best.select(F.col("i").alias("node"), "community")


def modularity(
    edges: DataFrame,
    assignment: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    comm_col: str = "community",
) -> DataFrame:
    """Newman modularity rollup of a partition → per-community
    (community, n_nodes, e_in, d_tot, q_term) with
    q_term = e_in/m − (d_tot/2m)²; Q = Σ q_term. Exact integer
    e_in/d_tot/m from two joins + aggregates; q_term is one IEEE
    expression of exact integers (engine-identical)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    m = e.count()
    asg = assignment.select(
        F.col(node_col).alias("_n"), F.col(comm_col).alias("_c")
    )
    deg = (
        e.select(F.col("a").alias("_n"))
        .unionAll(e.select(F.col("b").alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).cast("long").alias("_d"))
    )
    dsum = (
        deg.join(asg, "_n")
        .groupBy("_c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("_d").cast("long").alias("d_tot"),
        )
    )
    ein = (
        e.join(asg.withColumnRenamed("_n", "a"), "a")
        .withColumnRenamed("_c", "_ca")
        .join(
            asg.withColumnRenamed("_n", "b").withColumnRenamed("_c", "_cb"),
            "b",
        )
        .filter(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("_c"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_in"))
    )
    t = dsum.join(ein, "_c", "left").withColumn(
        "e_in", F.coalesce("e_in", F.lit(0)).cast("long")
    )
    md = float(m)
    q = (
        F.col("e_in").cast("double") / F.lit(md)
        - (F.col("d_tot").cast("double") / F.lit(2.0 * md))
        * (F.col("d_tot").cast("double") / F.lit(2.0 * md))
    )
    return t.select(
        F.col("_c").alias(comm_col),
        "n_nodes",
        "e_in",
        "d_tot",
        F.round(q, 6).alias("q_term"),
    )


def betweenness_from_pivots(
    edges: DataFrame,
    pivots: "list",
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 10,
) -> DataFrame:
    """Pivot-sampled betweenness centrality (Brandes 2001 restricted
    to source set S) → (node, betweenness): bc(v) = ½ Σ_{s∈S} δ_s(v)
    where δ_s accumulates the shortest-path dependencies
    δ(v) = Σ_{w: v precedes w} (σ_v/σ_w)(1 + δ(w)) — WHO SITS ON the
    geodesics, the brokerage readout ``closeness_from_pivots``
    (distance) and ``pagerank`` (mass) both miss. Exact-count BFS
    per pivot (σ = # shortest paths, integer) then a layer-by-layer
    backward sweep; with S = all nodes this is exact betweenness, a
    pivot sample is the standard Brandes–Pich estimator.

    All pivots advance SIMULTANEOUSLY in one (pivot, node)-keyed
    frame: each forward hop is one join + one partial-aggregated
    groupBy; the backward sweep processes one depth layer per round
    (depth is a driver int from the forward probes). Every dependency
    term lands on the 2^-20 grid BEFORE its sum, so the accumulated
    δ's — and the final per-node sum of grid multiples — are exact
    and engine-order-free. Raises if BFS hasn't exhausted every
    reachable node within ``max_hops`` (silent truncation would
    drop dependencies — the ``scc`` convention)."""
    if not pivots:
        raise ValueError("betweenness_from_pivots needs >= 1 pivot")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("w")))
        .filter(F.col("u").isNotNull() & F.col("w").isNotNull())
        .filter(F.col("u") != F.col("w"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    pv = spark.createDataFrame(
        [(p,) for p in pivots], [src]
    ).select(F.col(src).alias("p"))
    layers = pv.select(
        "p",
        F.col("p").alias("v"),
        F.lit(0).alias("d"),
        F.lit(1).cast("long").alias("sigma"),
    ).localCheckpoint(eager=True)
    frontier = layers
    maxd = 0
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["v"] == e["u"])
            .select("p", F.col("w").alias("v"), "sigma")
            .join(layers.select("p", "v"), ["p", "v"], "left_anti")
            .groupBy("p", "v")
            .agg(F.sum("sigma").alias("sigma"))
            .select("p", "v", F.lit(h).alias("d"), "sigma")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        layers = layers.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
        maxd = h
    else:
        if frontier.limit(1).count() > 0:
            check = (
                frontier.join(e, frontier["v"] == e["u"])
                .select("p", F.col("w").alias("v"))
                .join(layers.select("p", "v"), ["p", "v"], "left_anti")
                .limit(1)
                .count()
            )
            if check > 0:
                raise ValueError(
                    f"betweenness_from_pivots: BFS not exhausted in "
                    f"{max_hops} hops — raise max_hops past the diameter"
                )
    q = float(1 << 20)
    # r15 optimization round (guide §2.4/§5): per-layer delta frames
    # instead of one growing eagerly-rematerialized union. Each layer's
    # deltas carry sigma along, so the backward round reads its
    # successor layer DIRECTLY (the old shape re-joined the full deltas
    # union against the layer table every round just to re-attach
    # sigma). Only the freshly computed layer is checkpointed (it feeds
    # the next round and the final rollup); the rollup unions the
    # checkpointed frames lazily. Per-layer delta values are unchanged.
    delta_frames = {
        maxd: layers.filter(F.col("d") == maxd).select(
            "p", "v", "sigma", F.lit(0.0).alias("delta")
        )
    }
    for dd in range(maxd - 1, -1, -1):
        cur = layers.filter(F.col("d") == dd)
        succ = delta_frames[dd + 1].select(
            "p",
            F.col("v").alias("w"),
            F.col("sigma").alias("sw"),
            F.col("delta").alias("dw"),
        )
        contrib = (
            cur.join(e, cur["v"] == e["u"])
            .select("p", "v", "sigma", F.col("w"))
            .join(succ, ["p", "w"])
            .select(
                "p",
                "v",
                (
                    F.floor(
                        F.col("sigma").cast("double")
                        / F.col("sw").cast("double")
                        * (1.0 + F.col("dw"))
                        * q
                    )
                    / q
                ).alias("_t"),
            )
            .groupBy("p", "v")
            .agg((F.sum(F.col("_t") * q) / q).alias("_dv"))
        )
        delta_frames[dd] = cur.select("p", "v", "sigma").join(
            contrib, ["p", "v"], "left"
        ).select(
            "p", "v", "sigma",
            F.coalesce("_dv", F.lit(0.0)).alias("delta"),
        ).localCheckpoint(eager=True)
    deltas = None
    for frame in delta_frames.values():
        deltas = frame if deltas is None else deltas.unionByName(frame)
    bc = (
        deltas.filter(F.col("v") != F.col("p"))
        .groupBy("v")
        .agg((F.sum(F.col("delta") * q) / q / 2.0).alias("_bc"))
    )
    # nodes never reached from any pivot simply don't appear; nodes
    # reached but never intermediate get 0.0
    return bc.select(
        F.col("v").alias("node"), F.round("_bc", 6).alias("betweenness")
    )
