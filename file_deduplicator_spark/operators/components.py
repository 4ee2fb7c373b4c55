"""Connected components over the verified-pair edge list — assigns cluster
ids by transitive closure.

Replaces the reference's greedy star clustering (main.go:868-902), whose
groups depend on (nondeterministic) input order. CC output is a superset of
any greedy-star grouping over the same edges (SURVEY §7.3), so dup-pair
recall vs the reference is 1.0 given the same edge set; precision may merge
chains — accepted per the BASELINE.json metric.

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14), expressed as DataFrame
self-joins + aggregations. Converges in O(log^2 n) rounds on pathological
graphs, 2-4 rounds on dedup graphs (small, dense clusters). Each round:

  large-star: for each node u, every neighbor v > u re-points to min(N(u)∪u)
  small-star: each node's smaller-or-equal neighbors re-point to the min

We implement the standard simplification (label propagation to the minimum
reachable id): iterate ``label[u] = min(label[u], min over neighbors of
label[v])`` with both edge directions, checkpointing every round to truncate
lineage (Catalyst has no fixpoint operator — SURVEY §4 item 2). Convergence
is detected by counting changed labels; iteration count and final delta are
surfaced in the metrics dict (north rule: metrics tables).

IDs are generic strings; at 10^12 rows the edge list is a small fraction of
the input (only rows that collided AND verified), so these rounds shuffle
far less than the signature stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iters: int = 20,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> tuple[DataFrame, dict]:
    """Return (labels, metrics): labels = (id, cluster_id) for every node that
    appears in an edge; cluster_id = min node id in the component.
    """
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    # materialize once — the edge list is re-joined every round; without this
    # the whole upstream pipeline (signatures + LSH) re-executes per iteration
    sym = sym.localCheckpoint(eager=True)
    # initial label: min(self, min neighbor)
    labels = sym.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("lbl")) \
        .withColumnRenamed("src", "id")
    labels = labels.localCheckpoint(eager=True)

    metrics = {"iterations": 0, "converged": False, "changed_last": None}
    for it in range(max_iters):
        # one round = neighbor propagation + pointer jump (path halving),
        # both against the CHECKPOINTED labels, fused into a single job:
        #   lbl'[u] = min(lbl[u], min_{v∈N(u)} lbl[v], lbl[lbl[u]])
        # Pure neighbor propagation needs O(diameter) rounds; jumping makes
        # it O(log diameter). The changed flag rides along so convergence
        # detection is a cheap scan of the checkpointed result, not a join.
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
            .withColumnRenamed("src", "id")
        )
        parents = labels.select(F.col("id").alias("p_id"), F.col("lbl").alias("p_lbl"))
        stepped = (
            labels.join(nbr_min, "id", "left")
            .join(parents, labels["lbl"] == parents["p_id"], "left")
            .select(
                "id",
                F.least(
                    F.col("lbl"),
                    F.coalesce(F.col("nbr_lbl"), F.col("lbl")),
                    F.coalesce(F.col("p_lbl"), F.col("lbl")),
                ).alias("mid_lbl"),
                F.col("lbl").alias("old_lbl"),
            )
        )
        # second pointer jump in the same round (labels are small relative to
        # the edge join — one extra cheap join halves the rounds on deep paths)
        new_labels = (
            stepped.join(parents, stepped["mid_lbl"] == parents["p_id"], "left")
            .select(
                "id",
                F.least(
                    F.col("mid_lbl"), F.coalesce(F.col("p_lbl"), F.col("mid_lbl"))
                ).alias("new_lbl"),
                "old_lbl",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("new_lbl") != F.col("old_lbl")).count()
        labels = new_labels.select("id", F.col("new_lbl").alias("lbl"))
        metrics["iterations"] = it + 1
        metrics["changed_last"] = changed
        if changed == 0:
            metrics["converged"] = True
            break
    return labels.withColumnRenamed("lbl", "cluster_id"), metrics


def attach_clusters(
    df: DataFrame,
    labels: DataFrame,
    id_col: str = "clip_id",
) -> DataFrame:
    """Left-join cluster labels back onto the full table; singletons get
    their own id as cluster_id (every row addressable by cluster)."""
    lab = labels.select(F.col("id").alias(id_col), F.col("cluster_id").alias("_cc"))
    return (
        df.join(lab, id_col, "left")
        .withColumn("cluster_id", F.coalesce(F.col("_cc"), F.col(id_col)))
        .drop("_cc")
    )
