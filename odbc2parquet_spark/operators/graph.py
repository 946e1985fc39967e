"""Connected components — near-duplicate pairs to duplicate CLUSTERS.

Pair generation (MinHash/SimHash/cosine) yields edges; deduplication needs
components: every document labeled with its cluster so one canonical doc
per cluster survives. This is iterative min-label propagation:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each round is one shuffle (groupBy dst) over the
edge list; rounds needed ~ graph diameter (near-dup clusters are shallow —
a handful of rounds in practice, bounded by ``max_iterations``). The
driver-side loop is inherent to the algorithm (iterative fixpoint, not
expressible as one SQL query without recursion) — per-round work is fully
distributed; the driver only checks the convergence counter.

At 100 TB scale the edge list is the near-dup pair output (orders of
magnitude smaller than the corpus); persisting the current labels between
rounds avoids recomputing the lineage each iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from odbc2parquet_spark.operators.bucketing import release_local_checkpoint


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, component): every node labeled with the min node id reachable
    over the undirected edge set.

    ``nodes`` must contain every id (isolated nodes become their own
    component). Converges in rounds ~ component diameter.

    The propagation state carries ONLY edge-incident nodes: an isolated
    node can never receive a smaller label, so it joins the result once
    at the end as its own component (the same late-join the star variant
    uses). On a near-dup graph the label table is then DUP-sized, not
    corpus-sized — per-round joins, checkpoints, and change-detection all
    scale with the duplicate population instead of the full corpus.
    """
    # materialize the ONE-directional pair list before symmetrizing: the
    # union references the edge plan twice, and the upstream pair pipeline
    # (MinHash signatures + banded join + Jaccard verification) would be
    # evaluated once per branch inside the sym checkpoint job. Dangling
    # endpoints (ids absent from the node set) are dropped HERE, so they
    # can neither receive a label nor donate their id as a component
    # minimum — the inert-endpoint contract, enforced structurally.
    node_ids = nodes.select(F.col(node_col).alias("id")).distinct()
    directed = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .join(node_ids.select(F.col("id").alias("src")), "src", "left_semi")
        .join(node_ids.select(F.col("id").alias("dst")), "dst", "left_semi")
        # a USING-column join moves the key first ([dst, src] here) and
        # union aligns by POSITION — re-project the canonical order so the
        # symmetrization below cannot silently align src with dst
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    sym = directed.unionByName(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # localCheckpoint between rounds: the fixpoint feeds its own output back
    # in, and an un-truncated logical plan doubles per round — Catalyst
    # re-analysis dominates wall time long before data does. On a cluster,
    # checkpoint() to reliable storage instead. The EDGE list checkpoints
    # eagerly too (not a bare persist): its upstream plan — MinHash
    # signatures + banded candidate join + Jaccard verification in the
    # dedup pipelines — is the dominant logical subtree, and a persist
    # caches blocks but re-embeds that analyzed plan at every per-round
    # join (measured on dd_keep_best_minhash at sf0.1).
    sym = sym.localCheckpoint(eager=True)
    # seed with the first propagation half-round folded in:
    # label(v) = min(v, min over neighbors) — near-dup clusters are mostly
    # diameter <= 2, so the seed is often already the fixpoint and the
    # loop exits after ONE confirming round instead of two
    labels = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("nmin"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("nmin")).alias("component"),
        )
    )
    try:
        labels = labels.localCheckpoint(eager=True)
        for _ in range(max_iterations):
            neighbor_min = (
                sym.join(labels, sym.src == labels.id)
                .groupBy("dst")
                .agg(F.min("component").alias("nmin"))
            )
            new_labels = (
                labels.join(neighbor_min, labels.id == neighbor_min.dst, "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                    ).alias("component"),
                )
            ).localCheckpoint(eager=True)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            # the superseded round's checkpoint blocks are dead weight —
            # release them now instead of relying on a JVM GC cycle
            release_local_checkpoint(labels)
            labels = new_labels
            if changed == 0:
                break
        return (
            nodes.select(F.col(node_col).alias("id"))
            .join(labels.withColumnRenamed("id", "_eid_"),
                  F.col("id") == F.col("_eid_"), "left")
            .select(
                "id",
                F.coalesce(F.col("component"), F.col("id")).alias("component"),
            )
        )
    finally:
        release_local_checkpoint(sym)
        release_local_checkpoint(directed)


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 30,
) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): the scale path beside
    :func:`connected_components`.

    Min-label propagation needs rounds ~ component diameter — fine for the
    shallow clusters near-dup pairs produce, quadratic-ish wall time on
    chain-shaped graphs (a crawl-frontier dedup can chain thousands of
    docs A~B~C~...). The star alternation contracts every component to a
    star around its min id in O(log n) rounds regardless of diameter:

      large-star(u): link every neighbor v > u to min(N(u) + {u})
      small-star(u): link every neighbor v <= u (and u) to min(N(u) + {u})

    Each half-round is one groupBy shuffle over the current edge list; the
    edge list only shrinks (edges collapse onto component minima), so late
    rounds are cheap. Convergence = the oriented edge set stops changing;
    the converged graph is a star per component with the min id at the
    center.
    """
    # localCheckpoint (not bare persist) between rounds: the loop's output
    # feeds its own input, and without truncation the logical plan doubles
    # per round — Catalyst re-analysis, not the shuffles, becomes the
    # bottleneck. On a cluster use checkpoint() on reliable storage.
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        # Large-star over the symmetric neighborhood of u.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # After large-star every edge points big -> small, so the
        # small-star neighborhoods are exactly the groupBy(u) groups.
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # Converged when the oriented edge set is stable. Both sides
        # are distinct, so equal counts + empty difference <=> equal.
        stable = small.count() == e.count() and small.exceptAll(e).limit(1).count() == 0
        release_local_checkpoint(e)  # superseded round: free its blocks
        e = small
        if stable:
            break
    labels = e.groupBy("u").agg(F.min("v").alias("component"))
    return (
        nodes.select(F.col(node_col).alias("id"))
        .join(labels, F.col("id") == F.col("u"), "left")
        .select("id", F.coalesce(F.col("component"), F.col("id")).alias("component"))
    )


def duplicate_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    node_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    algorithm: str = "propagation",
) -> DataFrame:
    """(id, cluster_id, is_canonical): cluster near-dup pairs and mark the
    keeper (min id per cluster — the same keep-first policy as
    :func:`exact_duplicates`).

    ``algorithm='star'`` switches to the large-star/small-star contraction
    (O(log n) rounds on any topology — use for deep/chainy pair graphs)."""
    cc_fn = connected_components_star if algorithm == "star" else connected_components
    cc = cc_fn(nodes, pairs, node_col, src_col, dst_col)
    return cc.select(
        "id",
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


def canonical_representatives(
    clusters: DataFrame,
    quality: DataFrame,
    id_col: str = "id",
    quality_col: str = "quality",
) -> DataFrame:
    """Keep-best retention policy: per duplicate cluster, elect the member
    with the highest quality signal (tiebreak: lowest id) instead of the
    min-id keeper.

    This is the curation stage after clustering — "of these near-identical
    documents keep the longest / highest-scoring one". One equi-join of
    the cluster labels to the quality table followed by a single
    struct-max aggregation: the lexicographic max over
    ``(quality, -id)`` resolves the argmax and the tiebreak in one
    map-side-combinable pass — no per-cluster window sort, so skewed
    (giant) clusters cost a partial-aggregate merge, not a sort.

    Returns (cluster_id, keep_id, keep_quality, cluster_size, n_dropped).
    """
    j = clusters.join(quality, id_col)
    best = F.max(
        F.struct(
            F.col(quality_col).alias("q"),
            (-F.col(id_col)).alias("neg_id"),
        )
    ).alias("best")
    return (
        j.groupBy("cluster_id")
        .agg(best, F.count("*").alias("cluster_size"))
        .select(
            "cluster_id",
            (-F.col("best.neg_id")).alias("keep_id"),
            F.col("best.q").alias("keep_quality"),
            "cluster_size",
            (F.col("cluster_size") - 1).alias("n_dropped"),
        )
    )


def pagerank_int(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank in exact integer micro-units
    (rank x 10^12 as int64) — bit-identical on any engine.

    Floating-point PageRank is order-sensitive (per-node sums over
    neighbors accumulate in partition order); this variant does ALL
    arithmetic in int64: base rank 10^12 div N, per-edge contribution
    rank div out_degree, update (15*base + 85*sum) div 100. Dangling
    nodes keep their 0.15 floor (their mass leaks, as in the simple
    formulation — acceptable for a similarity-graph centrality signal).

    The edge list (possibly a whole LSH pipeline upstream) materializes
    ONCE with its out-degrees attached (per-src window on the persisted
    pass); each iteration is then one join + one groupBy(dst) shuffle
    over it. Rounds are fixed (not convergence-tested), so the plan is
    static and the driver never inspects data. Lineage control: ranks
    localCheckpoint every ``checkpoint_every`` rounds (lineage growth is
    linear in rounds — one join per round — so a short run compiles into
    ONE plan with zero intermediate jobs, where checkpointing every round
    paid 1 extra full job per round of pure scheduler overhead on small
    graphs); the final ranks are always checkpointed eagerly so the
    persisted edge list can be released before returning.
    """
    n_nodes = nodes.count()
    base = (10**12) // n_nodes
    # edge list + degrees evaluate ONCE: the upstream pair generation can
    # be a whole LSH pipeline, and every iteration references both.
    weighted = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .withColumn("out_deg", F.count("*").over(Window.partitionBy("src")))
        .persist()
    )
    ids = nodes.select(F.col(node_col).alias("id"))
    ranks = ids.select("id", F.lit(base).alias("rank"))
    floor_term = (15 * base) // 100
    checkpoint_every = 8
    checkpointed: list[DataFrame] = []
    try:
        for it in range(iterations):
            contrib = (
                weighted.join(ranks, weighted.src == ranks.id)
                .select(
                    F.col("dst").alias("id"),
                    F.expr("rank div out_deg").alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("s"))
            )
            ranks = ids.join(contrib, "id", "left_outer").select(
                "id",
                (
                    F.lit(floor_term)
                    + F.expr("(85 * coalesce(s, 0)) div 100")
                ).cast("long").alias("rank"),
            )
            last = it == iterations - 1
            if last or (it + 1) % checkpoint_every == 0:
                ranks = ranks.localCheckpoint(eager=True)
                for prev in checkpointed:
                    release_local_checkpoint(prev)  # superseded rounds
                checkpointed = [ranks]
    finally:
        weighted.unpersist()
    return ranks


def personalized_pagerank_int(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Personalized PageRank (random walk with restart to a SEED set) in
    exact integer micro-units — the "more like these" expansion primitive:
    given a small curated seed set, rank the rest of the corpus by
    similarity-graph proximity to it (seed-set expansion for data
    curation, the PPR half of local community detection).

    Same int64 spec as :func:`pagerank_int` so any engine agrees
    bit-for-bit, but the teleport mass lands ONLY on seeds: base =
    10^12 div n_seeds; rank_0 = base on seeds else 0; update(v) =
    (15*base div 100 if v is seed else 0) + (85 * sum over in-edges of
    rank div out_deg) div 100. Nodes the walk never reaches stay at
    exactly 0, so the result is naturally sparse — at 100 TB the rank
    frontier (not the corpus) is what each iteration shuffles, and the
    per-iteration cost tracks the seed neighborhood size. Edge list +
    out-degrees materialize once; ranks localCheckpoint every
    ``checkpoint_every`` rounds (same bounded-lineage rationale as
    :func:`pagerank_int` — linear growth, so a short fixed run is one
    plan with zero intermediate jobs) and always on the final round so
    the persisted edge list can be released before returning.
    """
    base = (10**12) // seeds.count()
    weighted = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .withColumn("out_deg", F.count("*").over(Window.partitionBy("src")))
        .persist()
    )
    seed_ids = seeds.select(F.col(node_col).alias("id")).distinct()
    ranks = seed_ids.select("id", F.lit(base).cast("long").alias("rank"))
    floor_term = (15 * base) // 100
    checkpoint_every = 8
    checkpointed: list[DataFrame] = []
    try:
        for it in range(iterations):
            contrib = (
                weighted.join(ranks, weighted.src == ranks.id)
                .select(
                    F.col("dst").alias("id"),
                    F.expr("rank div out_deg").alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("s"))
            )
            # full outer of (teleport floor on seeds) and (walk mass):
            # only rows touched by either term exist — the frontier stays
            # sparse instead of densifying to every node in the graph.
            ranks = (
                seed_ids.select("id", F.lit(floor_term).alias("f"))
                .join(contrib, "id", "full_outer")
                .select(
                    "id",
                    (
                        F.coalesce(F.col("f"), F.lit(0))
                        + F.expr("(85 * coalesce(s, 0)) div 100")
                    ).cast("long").alias("rank"),
                )
                .filter(F.col("rank") > 0)
            )
            last = it == iterations - 1
            if last or (it + 1) % checkpoint_every == 0:
                ranks = ranks.localCheckpoint(eager=True)
                for prev in checkpointed:
                    release_local_checkpoint(prev)  # superseded rounds
                checkpointed = [ranks]
    finally:
        weighted.unpersist()
    return ranks


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over an undirected edge list
    (id_a < id_b canonical orientation).

    Classic two-join shape: wedges from edges (a<b) joined to edges
    (b<c) on the middle node, closed against the edge set on (a, c) —
    every triangle a<b<c is found exactly once, then credited to each
    of its three corners via one explode + count. Cost is sum(deg^2)
    for the wedge build (the same budget any triangle algorithm pays);
    both joins are equi-joins so a 1000-executor cluster partitions by
    the join node. Returns (id, n_triangles) for nodes in >=1 triangle.
    """
    # the edge list is referenced three times (both wedge sides + the
    # closing join); without a persist each branch re-runs the caller's
    # edge-construction subplan (e.g. the whole LSH bucket expansion).
    # Narrow two-long rows -> cheap to cache; ContextCleaner reclaims it
    # once the returned plan is unreferenced.
    from pyspark import StorageLevel

    from odbc2parquet_spark import cachereg

    edges = cachereg.track(edges.persist(StorageLevel.MEMORY_AND_DISK))
    ab = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    bc = edges.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    wedges = ab.join(bc, "b")
    closing = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    tri = wedges.join(closing, ["a", "c"])
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def tree_ancestry(edges: DataFrame, rounds: int = 8) -> DataFrame:
    """Root and depth for every node of a forest — the recursive-CTE
    workload (org charts, category trees, BOM explosion) Spark SQL has
    no operator for, computed in O(log depth) self-joins by pointer
    doubling instead of the depth-many iterations a literal recursive
    walk would take.

    ``edges`` holds one row per node: (node, parent); a root points at
    itself. Every parent must itself appear as a node row — a dangling
    parent makes its whole subtree vanish at the first doubling (the
    composition join is inner); validate upstream if the hierarchy may
    be truncated. Invariant per round: state(x) = (cur, d) means cur is x's
    2^k-th ancestor (clamped at its root) and d the real hop count to
    it. Doubling composes the state with itself — after ``rounds``
    rounds every node whose depth is <= 2^rounds has cur = its root and
    d = its depth (256 deep by default: any realistic hierarchy; raise
    ``rounds`` logarithmically for pathological chains).

    Scale shape: each round is ONE equi-join of the state with itself on
    the node key — 8 narrow shuffles total regardless of depth;
    localCheckpoint truncates the self-feeding plan like the connected-
    components fixpoints above.
    """
    state = edges.select(
        F.col("node"),
        F.when(F.col("parent") == F.col("node"), F.col("node"))
        .otherwise(F.col("parent"))
        .alias("cur"),
        F.when(F.col("parent") == F.col("node"), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("depth"),
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        hop = state.select(
            F.col("node").alias("j_node"),
            F.col("cur").alias("j_cur"),
            F.col("depth").alias("j_depth"),
        )
        prev = state
        state = (
            state.join(hop, state["cur"] == hop["j_node"])
            .select(
                "node",
                F.col("j_cur").alias("cur"),
                (F.col("depth") + F.col("j_depth")).alias("depth"),
            )
            .localCheckpoint(eager=True)
        )
        release_local_checkpoint(prev)  # superseded round
    return state.select("node", F.col("cur").alias("root_key"), "depth")


def k_core(
    edges: DataFrame, k: int, max_rounds: int = 50
) -> DataFrame:
    """Nodes of the k-core: the maximal subgraph where every node keeps
    degree >= k — the dense-subgraph miner behind collusion/spam-farm
    detection (a review ring or engagement farm survives peeling; organic
    long-tail activity does not). Batagelj-Zaversnik peeling, distributed:
    each round drops nodes with degree < k and the edges touching them,
    until a fixpoint. Rounds are peel DEPTH (shallow for real graphs),
    bounded by ``max_rounds`` — converged-or-raise, never silent.

    ``edges`` is (id_a, id_b) undirected, self-loops ignored. Returns
    (node, degree) of the surviving core with IN-CORE degrees.

    Each round: one degree groupBy (map-side combined) + two semi-joins
    of the shrinking edge list — and the edge list ONLY shrinks, so late
    rounds cost less than early ones. localCheckpoint between rounds
    truncates the self-feeding plan (same discipline as
    connected_components); the driver sees one count per round.
    """
    cur = (
        edges.filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = cur.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        degs = (
            cur.select(F.col("id_a").alias("node"))
            .unionAll(cur.select(F.col("id_b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("degree"))
        )
        keep = degs.filter(F.col("degree") >= k).select("node")
        nxt = (
            cur.join(keep.withColumnRenamed("node", "id_a"), "id_a", "left_semi")
            .join(keep.withColumnRenamed("node", "id_b"), "id_b", "left_semi")
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        release_local_checkpoint(cur)
        cur, prev_edges, n_edges = nxt, n_edges, n_next
        if n_next == prev_edges:  # nothing peeled: fixpoint
            break
    else:
        raise RuntimeError(f"k_core did not converge in {max_rounds} rounds")
    return (
        cur.select(F.col("id_a").alias("node"))
        .unionAll(cur.select(F.col("id_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )


def hits_int(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 2,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(id, hub, auth): fixed-round HITS in exact unnormalized int64.

    Kleinberg's mutual-reinforcement pair — hub(i) = sum of auth over
    i's out-neighbors, auth(j) = sum of hub over j's in-neighbors —
    seeded at auth = 1 and run for a fixed number of full (hub, auth)
    rounds WITHOUT the usual L2 normalization. Dropping the
    normalization is what makes the scores exact integers (every update
    is a sum of int64s), so two engines agree bit-for-bit; the rank
    order each round is identical to the normalized iterate because
    normalization is a positive scalar. Growth is bounded by
    max_degree^(2*rounds) — with the LSH similarity graph's capped
    bucket degrees, 2 rounds stay far inside int64 even at corpus
    scale (deg 200 -> 1.6e9).

    Each half-round is one join + one groupBy shuffle over the edge
    list, which materializes once because all four half-rounds
    reference it; score frames are 2-long rows per node. Rounds are
    fixed, so the plan is static — no data-dependent driver logic
    (same contract as :func:`pagerank_int`). Lineage control: the edge
    list is EAGERLY checkpointed at entry — its upstream plan (LSH
    signatures + bucket pairs in the similarity-graph family) is the
    dominant logical subtree, and a lazy persist caches runtime blocks
    but NOT the analyzed plan, so every one of the 2*rounds references
    would re-embed it and Catalyst re-analysis would dominate wall time
    (measured: sim_hits 2.1s -> 5.6s when round 9 swapped the per-round
    eager checkpoints for lazy persist without truncating the edge-list
    plan). With the edge plan truncated to a LogicalRDD leaf, the
    half-round frames themselves are LAZILY persisted (a hub frame is
    read by the same round's auth update AND the next hub update, so an
    unpersisted chain would recompute subtrees exponentially) and the
    FINAL pair is checkpointed in one eager job — one scheduler
    round-trip for the edges plus one for the result, instead of
    2*rounds of them.
    """
    ids = nodes.select(F.col(node_col).alias("id"))
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    auth = ids.select("id", F.lit(1).cast("long").alias("score"))
    hub = None
    inters: list[DataFrame] = []
    try:
        for it in range(rounds):
            hub_sum = (
                sym.join(auth, sym.dst == auth.id)
                .groupBy("src")
                .agg(F.sum("score").alias("s"))
            )
            hub = (
                ids.join(hub_sum, ids.id == hub_sum.src, "left")
                .select("id", F.coalesce("s", F.lit(0)).cast("long").alias("score"))
                .persist()
            )
            inters.append(hub)
            auth_sum = (
                sym.join(hub, sym.src == hub.id)
                .groupBy("dst")
                .agg(F.sum("score").alias("s"))
            )
            auth = (
                ids.join(auth_sum, ids.id == auth_sum.dst, "left")
                .select("id", F.coalesce("s", F.lit(0)).cast("long").alias("score"))
                .persist()
            )
            inters.append(auth)
        out = (
            hub.withColumnRenamed("score", "hub")
            .join(auth.withColumnRenamed("score", "auth"), "id")
            .select("id", "hub", "auth")
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        for df in inters:
            df.unpersist()
        release_local_checkpoint(sym)


def label_propagation_int(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(id, label): synchronous label-propagation communities with a
    deterministic tie-break — the cheap community detector (Raghavan et
    al.) curation runs on a similarity graph to find topical groups
    coarser than connected components but finer than the whole graph.

    Every node starts labeled with its own id; each round it adopts the
    label occurring MOST among its in-neighbors (count desc, then
    smallest label — the tie-break that makes the classical randomized
    update deterministic and engine-independent). Isolated nodes keep
    their own label. Updates are synchronous (all nodes read the
    previous round's labels), so the result is a pure function of the
    edge set and the round count — exactly reproducible by an unrolled
    SQL oracle, unlike the asynchronous variant whose result depends on
    visit order.

    Per round: one join (edges x labels) + one (dst, label) count + one
    per-dst struct-max argmax — all keyed shuffles over the EDGE list;
    label frames are 2-long rows per node. Lineage control: the edge
    list is EAGERLY checkpointed at entry — its upstream plan (LSH
    signatures + bucket pairs) is the dominant logical subtree, and a
    lazy persist caches blocks but not the analyzed plan, so each
    round's two references would re-embed it and the doubled-per-round
    label lineage would multiply it further (measured:
    sim_lpa_communities 2.1s -> 6.1s when round 9 dropped the per-round
    eager checkpoints without truncating the edge-list plan). With the
    edge plan truncated, label frames are LAZILY persisted per round (a
    label frame is read twice — by the neighbor count and by the update
    join — so an unpersisted chain would recompute subtrees
    exponentially), the plan is re-truncated every ``checkpoint_every``
    rounds to bound the 2^rounds logical growth, and the final frame is
    checkpointed in one eager job. Fixed rounds keep the plan static.
    """
    ids = nodes.select(F.col(node_col).alias("id"))
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    labels = ids.select("id", F.col("id").alias("label"))
    persisted: list[DataFrame] = []
    checkpointed: list[DataFrame] = []
    checkpoint_every = 4  # double-referenced frames: logical plan doubles
    # per lazy round, so truncate every 4 rounds (2^4-bounded growth)
    try:
        for it in range(rounds):
            counts = (
                sym.join(labels, sym.src == labels.id)
                .groupBy("dst", "label")
                .agg(F.count("*").alias("cnt"))
            )
            # argmax by (cnt desc, label asc) as a struct-max aggregation:
            # max(struct(cnt, -label)) picks the largest count, then the
            # largest negated label = the SMALLEST label — the same
            # deterministic tie-break as a row_number window, but
            # map-side-combinable and sort-free (one hash agg keyed by dst
            # instead of a full partition sort)
            winner = (
                counts.groupBy("dst")
                .agg(
                    F.max(
                        F.struct(
                            F.col("cnt"), (-F.col("label")).alias("neg_label")
                        )
                    ).alias("m")
                )
                .select(
                    F.col("dst").alias("id"), (-F.col("m.neg_label")).alias("nlab")
                )
            )
            # labels is ids-complete by construction (seeded from ids and
            # rebuilt ids-sized every round), so the update left-joins the
            # winners straight onto the previous labels — no ids re-join
            labels = labels.join(winner, "id", "left").select(
                "id", F.coalesce("nlab", "label").alias("label")
            )
            if (it + 1) % checkpoint_every == 0 and it != rounds - 1:
                labels = labels.localCheckpoint(eager=True)
                for df in persisted:
                    df.unpersist()
                persisted = []
                for df in checkpointed:
                    release_local_checkpoint(df)
                checkpointed = [labels]
            else:
                labels = labels.persist()
                persisted.append(labels)
        out = labels.localCheckpoint(eager=True)
        return out
    finally:
        for df in persisted:
            df.unpersist()
        for df in checkpointed:
            release_local_checkpoint(df)
        release_local_checkpoint(sym)


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, degree, n_triangles, coeff6): local clustering coefficient
    over an undirected edge list (id_a < id_b canonical) — closed wedges
    / possible wedges per node, the density score that separates a
    genuine near-dup COMMUNITY (neighbors know each other, coeff -> 1)
    from a hub-and-spoke LSH false-positive bucket (star around one doc,
    coeff -> 0). Nodes of degree >= 2 are reported; triangle credits
    come from :func:`triangle_count` (two equi-joins, sum(deg^2) wedge
    budget), degrees from one symmetric count — the coefficient itself
    is a scalar per node, ROUND(2t / d(d-1), 6)."""
    deg = (
        edges.select(F.col("id_a").alias("id"))
        .unionAll(edges.select(F.col("id_b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") >= 2)
    )
    tri = triangle_count(edges)
    return (
        deg.join(tri, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.round(
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("coeff6"),
        )
    )
