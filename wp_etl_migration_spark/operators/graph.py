"""Connected components over near-duplicate pair graphs (LLM-pipeline
extension — the step after pair generation in every dedup pipeline:
pairs → clusters → one kept representative per cluster).

Not present in the reference (it has no dedup surface). Spark-first
design: min-label propagation WITH pointer jumping — each round every
node adopts the smallest label in its closed neighborhood (one
equi-join + one aggregation over the undirected edge list), then
shortcuts ``label(u) ← label(label(u))`` (one self-join), so chain
lengths halve per round and convergence is O(log diameter), not
O(diameter) — a 2²⁰-node path converges in ~20 rounds instead of a
million. Near-dup graphs are overwhelmingly tiny cliques/chains, so
2-4 rounds in practice; the log bound is what makes the dense
borderline-similarity graphs (low-threshold semantic dedup) safe.
Label frames are re-checkpointed per round; convergence is observed
with an Observation node during the checkpoint scan (one Spark action
per round — same trick as operators/hierarchy.py).

At 100 TB the state is one (node, label) row per node and each round
shuffles on node id — linear, uniform keys, no skew beyond what the
pair generator already bounded (hot-shingle caps / LSH bucket sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from wp_etl_migration_spark.operators.checkpoint import pin


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_rounds: int = 20) -> DataFrame:
    """Component label per node: (node, component) with component = the
    minimum node id reachable through the pair graph.

    ``pairs`` is an edge list (each row one undirected edge; direction
    and duplicates don't matter). Nodes only appear if they occur in at
    least one pair — callers wanting singletons join the result back to
    the corpus with a coalesce to the node's own id.
    """
    edges = pin(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct())

    labels = (edges.groupBy(F.col("u").alias("node"))
              .agg(F.least(F.min("v"), F.first("u")).alias("label")))

    moved = None
    for _ in range(max_rounds):
        # Every node adopts min(own label, neighbors' labels): join the
        # neighbor's current label across each edge, then min per node.
        # The node's OWN previous label rides through the aggregation
        # (labels is one row per node, so the conditional MIN is just
        # that value) — convergence detection then needs no join back
        # onto `labels` (r14: that extra (node)-keyed join of the full
        # label state ran every round for nothing but the `moved`
        # count).
        nbr = (edges.join(labels.withColumnRenamed("node", "v"), on="v")
               .select(F.col("u").alias("node"),
                       F.col("label").alias("nbr_label")))
        merged = (labels.select("node", "label",
                                F.lit(True).alias("__own"))
                  .unionByName(
                      nbr.select("node",
                                 F.col("nbr_label").alias("label"),
                                 F.lit(False).alias("__own")))
                  .groupBy("node").agg(
                      F.min("label").alias("label"),
                      F.min(F.when(F.col("__own"), F.col("label")))
                      .alias("__old")))
        # Pointer jump: label ← label's own label. Labels are node ids,
        # every label row exists in `merged`, and labels only decrease,
        # so the jump halves any propagation chain. The self-join below
        # reuses `merged`'s aggregation exchange (ReusedExchange) inside
        # the one per-round job — no extra materialization needed.
        as_node = merged.select(F.col("node").alias("label"),
                                F.col("label").alias("__l2"))
        jumped = (merged.join(as_node, on="label", how="left")
                  .select("node", "__old",
                          F.coalesce("__l2", "label").alias("new_label")))
        obs = Observation()
        nxt = pin(
            jumped
            .observe(obs, F.count(F.when(
                F.col("new_label") < F.col("__old"), 1)).alias("moved"))
            .select("node", F.col("new_label").alias("label")))
        moved = obs.get["moved"]
        labels = nxt
        if moved == 0:
            break
    if moved:
        # Returning partially-propagated labels would silently split
        # true clusters — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            f"rounds ({moved} labels still moving); the graph diameter "
            "exceeds max_rounds — raise it")
    return labels.select(F.col("node"), F.col("label").alias("component"))


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 5, damping_num: int = 85,
             damping_den: int = 100, scale: int = 10 ** 9,
             undirected: bool = False,
             dangling: str = "leak") -> DataFrame:
    """Fixed-point integer PageRank: (node, rank) after exactly
    ``iterations`` power steps, rank an exact BIGINT on a
    per-node-initial-mass of ``scale``.

    The web-corpus use is quality weighting — rank domains by their
    link graph and feed the rank into sampling weights / quality
    gates (the Common Crawl curation pattern). Runs on any edge list
    (URL/domain graphs via ``operators.urls.registered_domain``,
    citation graphs, user interaction graphs).

    ALL arithmetic is integer: each node starts at ``scale``; a step
    gives every node ``(scale·(den−num)) div den`` base mass plus
    ``num·(Σ in-neighbor rank div out-degree) div den``. Integer
    division makes the result bit-identical on every engine (floats
    would drift by summation order) and sums of longs commute
    exactly, so the output is deterministic under any partitioning —
    it parity-checks against an unrolled-CTE SQL oracle. Rounding
    loses ≤1 unit per division — pick ``scale`` for the precision you
    need (default 1e9 → per-step relative error ~1e-9·degree).

    Dangling nodes (no out-edges): ``dangling="leak"`` (default)
    drops their mass — the "weak PageRank" simplification; relative
    ordering (all quality weighting needs) is preserved within one
    graph, but totals are not comparable across subgraphs.
    ``dangling="redistribute"`` is classical PageRank: per iteration
    the dangling nodes' summed rank D is shared uniformly — every
    node additionally receives ``num·(D div N) div den`` (N = node
    count; still pure integer, still bit-exact, oracle-checkable with
    a per-step scalar subquery). Total mass is then conserved up to
    the ≤N units truncated by ``D div N``, making ranks comparable
    across runs and subgraphs. Costs one extra aggregate per
    iteration over the (pinned, one-row-per-node) rank state — a
    single long per round to the driver, independent of graph size.
    ``undirected=True`` mirrors every edge, which removes dangling
    nodes entirely (both modes then agree).

    Overflow bound: a hub's in-contribution is < N·scale, multiplied
    by ``damping_num`` — keep ``N·scale·damping_num < 2⁶³`` (default
    scale admits ~10⁸ nodes; both engines raise loudly on BIGINT
    overflow rather than wrapping).

    Scale shape: per iteration one (node)-keyed join of ranks onto
    edges + one (node)-keyed sum — linear in edges, uniform keys
    except true hub nodes, whose aggregation is map-side combinable.
    State between rounds is one (node, rank) row per node, pinned
    (``localCheckpoint``) so the lineage stays flat.
    """
    if dangling not in ("leak", "redistribute"):
        raise ValueError("dangling must be 'leak' or 'redistribute'")
    e = pairs_e = edges.select(F.col(src).alias("u"),
                               F.col(dst).alias("v"))
    if undirected:
        e = pairs_e.unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    e = pin(e.distinct())
    # Loop-invariant frames are pinned ONCE (r14): every iteration's
    # `ranks` is itself pinned, so anything unpinned in its lineage —
    # the node universe (a union+distinct over e, ~2|E| shuffled rows)
    # and the out-degree table (a groupBy over e) — re-executed per
    # power step. Pinning them (and pre-joining __d onto the edge list
    # so the loop does one join, not two) makes each step exactly one
    # (u)-keyed join + one (v)-keyed aggregation over |E| rows.
    outdeg = e.groupBy("u").agg(F.count("*").alias("__d"))
    e_deg = pin(e.join(outdeg, "u"))
    nodes = pin(e.select(F.col("u").alias("node"))
                .unionByName(e.select(F.col("v").alias("node")))
                .distinct())
    base = (scale * (damping_den - damping_num)) // damping_den
    ranks = nodes.select("node",
                         F.lit(scale).cast("long").alias("rank"))
    if dangling == "redistribute":
        # dangling set and node count are per-graph constants: one
        # left-anti + one count, outside the iteration loop
        no_out = pin(nodes.join(
            outdeg.select(F.col("u").alias("node")), "node",
            "left_anti"))
        n_nodes = nodes.count()
    for _ in range(iterations):
        contrib = (e_deg.join(ranks.withColumnRenamed("node", "u"), "u")
                   .select(F.col("v").alias("node"),
                           F.expr("rank div __d").alias("__c"))
                   .groupBy("node").agg(F.sum("__c").alias("__s")))
        extra = 0
        if dangling == "redistribute":
            # one long to the driver per round, off the PINNED state
            # (a cheap one-column scan, never a lineage recompute)
            d_mass = (ranks.join(no_out, "node", "left_semi")
                      .agg(F.sum("rank")).first()[0]) or 0
            extra = (damping_num * (int(d_mass) // n_nodes)) \
                // damping_den
        ranks = pin(
            nodes.join(contrib, "node", "left")
            .select("node",
                    (F.lit(base + extra) + F.expr(
                        f"({damping_num} * coalesce(__s, 0)) "
                        f"div {damping_den}")).cast("long")
                    .alias("rank")))
    return ranks


def dedup_keep_list(df: DataFrame, pairs: DataFrame, id_col: str,
                    src: str = "id_a", dst: str = "id_b",
                    order_col: str | None = None) -> DataFrame:
    """One kept row id per near-dup cluster plus every untouched doc:
    the canonical keep-list a dedup pipeline feeds downstream.

    Default keeps the minimum id of each component. With ``order_col``
    (a column of ``df``, e.g. a quality score) the HIGHEST-ranked
    member wins instead — "keep the best duplicate, not the first" —
    with id as the deterministic tiebreak. Same plan shape either way:
    one aggregation per component (argmax via struct max — no window).
    """
    comp = connected_components(pairs, src, dst)
    if order_col is None:
        keep_clustered = (comp.groupBy("component")
                          .agg(F.min("node").alias(id_col))
                          .select(id_col))
    else:
        ranked = comp.join(
            df.select(F.col(id_col).alias("node"), F.col(order_col)),
            on="node")
        keep_clustered = (ranked.groupBy("component")
                          .agg(F.max(F.struct(F.col(order_col),
                                              F.col("node")))
                               .alias("__best"))
                          .select(F.col("__best.node").alias(id_col)))
    untouched = (df.select(id_col)
                 .join(comp.select(F.col("node").alias(id_col)),
                       on=id_col, how="left_anti"))
    return keep_clustered.unionByName(untouched)
