"""Connected components — duplicate-cluster assignment at scale.

Pair lists (exact dups, LSH near-dups, embedding near-dups) answer
"are these two documents duplicates?"; deduplication needs the
transitive closure: WHICH GROUP does each document belong to, so one
canonical representative per group survives. That is connected
components over the pair graph.

Algorithm: iterative min-label propagation with pointer jumping (the
standard MapReduce/Pregel formulation plus shortcutting). Every
vertex starts labeled with its own id; each round every vertex takes
the min over {its label, its neighbors' labels, the label OF its
best label} — the last term (one extra labels-only join) shortcuts
an extra chain level per round, roughly halving the rounds pure
propagation needs. Each round is one edge⋈label join +
one min-aggregate + one label⋈label join — shuffles proportional to
|E| and |V|, labels only (8 B), never payloads. The loop is
driver-side but the data never is: the convergence check is a cheap
count of changed labels. Labels are localCheckpoint'ed per round —
the relation is referenced multiple times per round, so a
lineage-preserving cache would double the logical plan every round
(a 2 GB plan string by round ~30); checkpointing keeps plans
constant-size.

Determinism: min() over a fixed vertex-id order — same clusters in
any engine (the driver oracle computes the same closure with a
recursive CTE).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    src_col: str = "doc_id",
    dst_col: str = "doc_id2",
    id_col: str = "doc_id",
    max_rounds: int = 50,
) -> DataFrame:
    """``(id_col, cluster_id)`` for every vertex; ``cluster_id`` is
    the minimum vertex id of the component (singletons map to
    themselves). Raises if the propagation hasn't converged after
    ``max_rounds`` — with min-label propagation that means a
    component of diameter > max_rounds, which duplicate graphs don't
    produce (raise the cap for genuinely chain-shaped graphs).
    """
    # symmetrize in ONE pass over the (possibly expensive) edge plan:
    # explode [(v,u),(u,v)] per edge rather than unioning two
    # projections, which would evaluate the edge relation twice
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("_v"), F.col(dst_col).alias("_u")
                    ),
                    F.struct(
                        F.col(dst_col).alias("_v"), F.col(src_col).alias("_u")
                    ),
                )
            ).alias("_e")
        )
        .select("_e._v", "_e._u")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # localCheckpoint, not persist: each round references the previous
    # labels TWICE (the neighbor-min join and the left join), so a
    # lineage-preserving cache would DOUBLE the logical plan per round
    # — by round ~30 the plan string alone exceeds 2 GB and the driver
    # chokes on analysis, long before any data moves. Checkpointing
    # materializes the (tiny: 16 B/vertex) label relation AND truncates
    # lineage, keeping every round's plan constant-size. Local (executor
    # -stored) checkpoints are fine for a batch operator; a restartable
    # pipeline would pass a reliable checkpoint dir instead.
    labels = (
        vertices.select(F.col(id_col).alias("_v"))
        .distinct()
        .withColumn("_label", F.col("_v"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_rounds):
            # hook: best label among self + neighbors
            neigh_min = (
                sym.join(
                    labels.select(
                        F.col("_v").alias("_u"), F.col("_label").alias("_nl")
                    ),
                    "_u",
                )
                .groupBy("_v")
                .agg(F.min("_nl").alias("_nmin"))
            )
            cand = labels.join(neigh_min, "_v", "left").select(
                "_v",
                F.col("_label").alias("_old"),
                F.least(
                    F.col("_label"), F.coalesce(F.col("_nmin"), F.col("_label"))
                ).alias("_cand"),
            )
            # shortcut (single pointer jump): also take the label OF
            # the candidate label — one labels-only join per round,
            # shortening chains by an extra level each round (24
            # rounds → 15 on the fixture's chain component). One jump
            # only: chaining several jump joins against clones of the
            # same checkpointed relation inside one round triggered
            # pathological re-execution growth (measured: checkpoint
            # time ×6 per round from round ~8) — if deeper jumping is
            # ever needed, checkpoint between jumps instead.
            m = labels.select(
                F.col("_v").alias("_cl"), F.col("_label").alias("_clab")
            )
            new_labels = (
                cand.join(m, F.col("_cand") == F.col("_cl"), "left")
                .select(
                    "_v",
                    "_old",
                    F.least(
                        F.col("_cand"),
                        F.coalesce(F.col("_clab"), F.col("_cand")),
                    ).alias("_label"),
                )
                .select(
                    "_v", "_label", (F.col("_label") < F.col("_old")).alias("_chg")
                )
            ).localCheckpoint(eager=True)
            changed = new_labels.filter(F.col("_chg")).limit(1).count()
            labels = new_labels.drop("_chg")
            if changed == 0:
                return labels.select(
                    F.col("_v").alias(id_col), F.col("_label").alias("cluster_id")
                )
    finally:
        sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )
