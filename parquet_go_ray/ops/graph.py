"""Distributed connected components over an edge Dataset — the
dedup family's CC engine (`ops.dedup._distributed_cc_stars`) exposed
as a first-class operator.

Beyond dedup clusters, the same primitive answers the entity-
resolution questions a web-scale pipeline hits constantly: URL ↔
redirect graphs, near-dup clusters from ANY candidate generator,
author/account linking. Iterated hash-to-min label propagation: each
round is ONE coarse-bucket shuffle of the current edge set; min
labels double their reach per round (rounds ≈ log2(longest chain));
the driver sees only a per-bucket (xor-fingerprint, node-count) pair
per round for convergence detection — never an edge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

__all__ = ["connected_components"]


def connected_components(
    edges: ray.data.Dataset,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 24,
) -> ray.data.Dataset:
    """Label every node appearing in ``edges`` with its component's
    minimum node id. Returns a Dataset ``(node, component)`` with one
    row per distinct node. Node ids must be int64 (hash string keys
    to int64 upstream — `ops.bucketing.col_hash64` — and keep a
    mapping if the original keys are needed back). Nodes that appear
    in NO edge are by construction absent; union isolated nodes as
    ``component = node`` rows upstream if needed."""
    from .dedup import _distributed_cc_stars

    def as_stars(batch: pa.Table) -> pa.Table:
        a = (batch.column(a_col).to_numpy(zero_copy_only=False)
             .astype(np.int64))
        b = (batch.column(b_col).to_numpy(zero_copy_only=False)
             .astype(np.int64))
        keep = a != b  # self-loops carry no connectivity
        return pa.table({"a": a[keep], "b": b[keep]})

    stars = _distributed_cc_stars(
        edges.map_batches(as_stars, batch_format="pyarrow",
                          zero_copy_batch=True),
        max_rounds=max_rounds,
    )

    # stars: (a = component min, b = absorbed member). The converged
    # edge set is NOT pair-distinct across buckets (the relabel kernel
    # dedups within a bucket, but node b's bucket and root a's bucket
    # can both emit (a, b)), and roots appear only on the a side — so
    # one node-co-partitioned exchange dedups members and adds each
    # root's self-row exactly once.
    from .dedup import _id_rk

    n_rk = 64

    def label_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        roots = np.unique(a)  # batch-local root dedup (combiner)
        node = np.concatenate((b, roots))
        comp = np.concatenate((a, roots))
        return pa.table({
            "rk": _id_rk(node, n_rk),
            "node": pa.array(node, pa.int64()),
            "component": pa.array(comp, pa.int64()),
        })

    def node_distinct(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "node" not in group.column_names:
            return pa.table({
                "node": pa.array([], pa.int64()),
                "component": pa.array([], pa.int64()),
            })
        node = group.column("node").to_numpy(zero_copy_only=False)
        comp = group.column("component").to_numpy(zero_copy_only=False)
        order = np.lexsort((comp, node))
        node, comp = node[order], comp[order]
        first = np.ones(len(node), dtype=bool)
        first[1:] = node[1:] != node[:-1]  # one label per node
        return pa.table({
            "node": pa.array(node[first], pa.int64()),
            "component": pa.array(comp[first], pa.int64()),
        })

    return (
        stars.map_batches(label_rows, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("rk")
        .map_groups(node_distinct, batch_format="pyarrow")
    )
