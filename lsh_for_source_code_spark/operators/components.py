"""Clustering stage S7: connected components over the verified-pair graph.

The reference has no explicit clustering (SURVEY.md 2.5: same-bucket grouping
only, implicit); our clusters(file_id, cluster_id = min file_id in component)
are the draw-independent artifact the north_rule's recall target is measured
against.

Algorithm: iterative min-label propagation as a DataFrame loop --
each iteration is one shuffle (join edges with labels + groupBy min), with
localCheckpoint to cut the growing lineage. Converges in O(diameter)
iterations; dedup graphs are near-cliques / stars (diameter 2-3 after the
star-topology candidate emission), so this beats the constant-factor-heavier
large-star/small-star alternation in practice while using the identical
per-iteration plan shape. GraphFrames deliberately avoided (SURVEY.md 7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _driver_union_find(edge_rows) -> dict[int, int]:
    """Union-find with path compression over collected edges. Used when the
    edge set is small enough to fit on the driver -- the verified-pair graph
    is orders of magnitude smaller than the corpus, so this path covers all
    but the most extreme runs and avoids ~2 shuffle jobs per label-prop
    iteration (the dominant serial floor at bench scale)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # min-id root keeps cluster_id = min member id
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {x: find(x) for x in list(parent)}


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 25,
    driver_max_edges: int = 2_000_000,
) -> DataFrame:
    """edges: (id_a, id_b). nodes (optional): one column `file_id` -- nodes
    with no edges become singleton clusters. Returns (file_id, cluster_id).

    Scale-adaptive: below `driver_max_edges` the component computation runs
    as driver-side union-find (one bounded collect of two long columns --
    2M edges ~ a few hundred MB of Row objects, sized for a driver heap
    shared with local-mode executors); above it, distributed min-label
    propagation (one shuffle per iteration, O(diameter) iterations). Both
    produce cluster_id = min file_id in component, and the node table
    itself is never collected.
    """
    e = edges.select(
        F.col("id_a").cast("long").alias("src"), F.col("id_b").cast("long").alias("dst")
    )

    # ONE bounded job: collect up to the driver threshold + 1 rows. This both
    # answers "does the edge set fit on the driver" AND delivers the edges --
    # r1 ran a limit().count() probe followed by a sequential toLocalIterator
    # drain (one job per partition, a pure serial floor; VERDICT r1 next#1).
    # Arrow on both driver hops: toPandas instead of Row-object collect, and
    # a pandas frame instead of a pickled tuple list for the labels table --
    # each saves seconds of single-threaded (de)serialization at ~10^5 rows.
    head = e.limit(driver_max_edges + 1).toPandas()
    if len(head) <= driver_max_edges:
        import pandas as pd

        spark = edges.sparkSession
        mapping = _driver_union_find(
            zip(head["src"].to_numpy(), head["dst"].to_numpy())
        )
        if mapping:
            labels = spark.createDataFrame(
                pd.DataFrame(
                    {"node": list(mapping.keys()), "label": list(mapping.values())}
                ).astype("int64")
            )
        else:
            labels = spark.createDataFrame([], schema="node long, label long")
        if nodes is not None:
            all_nodes = nodes.select(
                F.col(nodes.columns[0]).cast("long").alias("node")
            ).distinct()
        else:
            # component roots are absent from the mapping (they are their
            # own parent) -- recover the full node set from the edges
            all_nodes = (
                e.select(F.col("src").alias("node"))
                .unionByName(e.select(F.col("dst").alias("node")))
                .distinct()
            )
        labels = (
            all_nodes.join(F.broadcast(labels), "node", "left")
            .withColumn("label", F.coalesce("label", "node"))
            .select("node", "label")
        )
        return labels.select(
            F.col("node").alias("file_id"), F.col("label").alias("cluster_id")
        )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    if nodes is not None:
        all_nodes = nodes.select(F.col(nodes.columns[0]).cast("long").alias("node")).distinct()
        labels = (
            all_nodes.join(labels, "node", "left")
            .withColumn("label", F.coalesce("label", "node"))
            .select("node", "label")
        )
    labels = labels.localCheckpoint(eager=True)

    # Convergence detector: min-propagation only ever lowers labels, so the
    # exact decimal sum of labels strictly decreases until the fixpoint --
    # one tiny aggregation per iteration instead of a join + count.
    def label_sum(df) -> int:
        row = df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()
        return int(row.s or 0)

    prev_sum = label_sum(labels)
    for _ in range(max_iter):
        # neighbor labels: for each dst, the labels of its neighbors' srcs
        msgs = sym.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        new_sum = label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(F.col("node").alias("file_id"), F.col("label").alias("cluster_id"))


def clusters_to_pairs(clusters: DataFrame) -> DataFrame:
    """All intra-cluster pairs (id_a < id_b) -- the pairwise view recall is
    evaluated on. Cost is quadratic in cluster size by definition of the
    metric; callers should bound cluster sizes before expanding at scale."""
    a = clusters.alias("a")
    b = clusters.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.cluster_id") == F.col("b.cluster_id"),
                F.col("a.file_id") < F.col("b.file_id"),
            ],
        )
        .select(
            F.col("a.file_id").alias("id_a"),
            F.col("b.file_id").alias("id_b"),
        )
    )
