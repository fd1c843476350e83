"""Connected components over candidate-pair edges.

Two paths:
* `connected_components`: classic union-find on the driver over a (small)
  edge Dataset/iterable — edges are one row per candidate pair, orders of
  magnitude smaller than the corpus, so this holds to large scale; the
  result maps each touched id to its cluster representative (min id).
* `label_propagation`: iterative min-label propagation expressed as Ray Data
  groupby rounds for when even the edge list exceeds the driver — each round
  is one shuffle keyed on node id; converges in O(diameter) rounds (dup
  clusters are near-cliques from LSH buckets, so diameter is tiny).
"""

from __future__ import annotations

from typing import Iterable


class UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != root:
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # Min element wins: cluster id is the smallest member id.
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.parent.setdefault(ra, ra)

    def components(self) -> dict:
        return {x: self.find(x) for x in self.parent}


def connected_components(edges: Iterable[tuple]) -> dict:
    """Edges -> {id: cluster_representative(min id)} for every id touched."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return uf.components()


class ArrayUnionFind:
    """Batch-vectorized union-find over integer node ids: no per-edge Python.

    Ids are compacted to dense indices incrementally (sorted-key merge per
    batch, O(nodes log nodes), no per-id dict ops); each edge batch is
    absorbed with Shiloach-Vishkin-style rounds — vectorized root lookup by
    pointer doubling, min-index hooking via np.minimum.at — converging in
    O(log n) array passes per batch. Representative-by-min-ID is decoupled
    from hooking order: components() takes a final per-component minimum
    over actual id VALUES, so hook order never affects the result."""

    def __init__(self):
        import numpy as np

        self._np = np
        self.key_sorted = np.empty(0, dtype=np.int64)  # sorted id values
        self.idx_of_sorted = np.empty(0, dtype=np.int64)  # -> parent index
        self.vals = np.empty(0, dtype=np.int64)  # parent index -> id value
        self.parent = np.empty(0, dtype=np.int64)

    def _intern(self, cat):
        """Map id values -> dense indices, registering unseen ids."""
        np = self._np
        u = np.unique(cat)
        pos = np.searchsorted(self.key_sorted, u)
        pos_c = np.minimum(pos, max(self.key_sorted.shape[0] - 1, 0))
        is_new = (
            np.ones(u.shape[0], dtype=bool)
            if self.key_sorted.shape[0] == 0
            else self.key_sorted[pos_c] != u
        )
        new = u[is_new]
        if new.shape[0]:
            n0 = self.vals.shape[0]
            new_idx = np.arange(n0, n0 + new.shape[0], dtype=np.int64)
            self.vals = np.concatenate([self.vals, new])
            self.parent = np.concatenate([self.parent, new_idx])
            merged_keys = np.concatenate([self.key_sorted, new])
            merged_idx = np.concatenate([self.idx_of_sorted, new_idx])
            order = np.argsort(merged_keys, kind="stable")
            self.key_sorted = merged_keys[order]
            self.idx_of_sorted = merged_idx[order]
        return self.idx_of_sorted[np.searchsorted(self.key_sorted, cat)]

    def _compress(self):
        np = self._np
        p = self.parent
        while True:
            gp = p[p]
            if np.array_equal(gp, p):
                self.parent = p
                return p
            p = gp

    def absorb(self, a, b):
        """Union every (a[i], b[i]) edge, vectorized."""
        np = self._np
        a = np.asarray(a)
        b = np.asarray(b)
        keep = a != b  # self-loops register no node, matching UnionFind.union
        a, b = a[keep], b[keep]
        if a.shape[0] == 0:
            return
        cat = np.concatenate([a, b]).astype(np.int64)
        idx = self._intern(cat)
        ia, ib = idx[: len(a)], idx[len(a) :]
        while True:
            p = self._compress()
            ra, rb = p[ia], p[ib]
            hi = np.maximum(ra, rb)
            lo = np.minimum(ra, rb)
            live = hi != lo
            if not live.any():
                return
            np.minimum.at(self.parent, hi[live], lo[live])

    def components(self) -> dict:
        np = self._np
        if self.vals.shape[0] == 0:
            return {}
        roots = self._compress()
        comp_min = np.full(self.vals.shape[0], np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(comp_min, roots, self.vals)
        return dict(zip(self.vals.tolist(), comp_min[roots].tolist()))


def connected_components_ds(edges_ds, a_col: str = "id_a", b_col: str = "id_b") -> dict:
    """Driver-side union-find streaming over an edge Dataset's batches (never
    materializes more than one block of edges at a time). Integer id columns
    take the vectorized ArrayUnionFind (no per-edge Python — the 2M-edge
    switchover to label_propagation costs seconds, not GIL-minutes); other
    id types fall back to the dict-based UnionFind."""
    import pyarrow.types as pt

    first = True
    uf = None
    for batch in edges_ds.iter_batches(batch_format="pyarrow"):
        if first:
            first = False
            int_ids = pt.is_integer(batch.schema.field(a_col).type) and pt.is_integer(
                batch.schema.field(b_col).type
            )
            uf = ArrayUnionFind() if int_ids else UnionFind()
        if isinstance(uf, ArrayUnionFind):
            uf.absorb(
                batch.column(a_col).to_numpy(zero_copy_only=False),
                batch.column(b_col).to_numpy(zero_copy_only=False),
            )
        else:
            for a, b in zip(batch.column(a_col).to_pylist(), batch.column(b_col).to_pylist()):
                uf.union(a, b)
    return uf.components() if uf is not None else {}


def label_propagation(
    edges_ds,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 20,
    num_partitions: int | None = None,
    metrics: list | None = None,
):
    """Distributed min-label propagation over an edge Dataset.

    Labels live in their own (node, label) Dataset and are CO-SHUFFLED with
    the edges: each round refreshes both endpoints' labels with two hash
    joins keyed on the node id, emits (node, neighbor_label) both ways plus
    self-offers (so labels are monotone non-increasing), and takes
    groupby(node).min. Nothing is collected to or broadcast from the driver
    — every round is joins + one groupby, all keyed exchanges; only block
    REFS pass through the driver between rounds.
    Converges in O(cluster diameter) rounds (LSH dup clusters are
    near-cliques, so diameter is tiny); stops early when the global
    label-sum fixes. Returns a Dataset (id, cluster_id = min member id).

    If `metrics` is a list, one row per completed round is appended:
    {"round", "label_sum", "n_nodes", "wall_s"} — callers persist these as
    convergence evidence (see pipelines/dedup.near_dup_clusters_resumable).
    """
    import time

    import pyarrow as pa
    import ray
    from ray.data.aggregate import Count, Sum

    if num_partitions is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(8, cpus // 4)

    import ray.data as rd

    edges = edges_ds.select_columns([a_col, b_col]).materialize()
    node_type = edges.schema().base_schema.field(a_col).type
    empty = pa.schema([("node", node_type), ("label", node_type)]).empty_table()

    def _rebuild(mds, fallback: pa.Table):
        """Rebuild a materialized dataset from its non-empty block refs.

        Two reasons: (1) hash-partitioned groupbys/joins emit COLUMNLESS
        empty blocks for empty partitions — map_batches skips empty blocks
        (a normalizing UDF never sees them) and pyarrow's join rejects a
        columnless side; (2) an edge Dataset arriving from the LSH stage
        carries a captured DataContext with HASH_SHUFFLE scoped to it, and
        hash-strategy groupbys mixed with join aggregator pools deadlock
        on small CPU counts — from_arrow_refs re-captures the default
        context. Driver-side metadata filter only: no block is fetched."""
        refs = [
            ref
            for bundle in mds.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks
            if meta.num_rows
        ]
        if not refs:
            return rd.from_arrow(fallback)
        return rd.from_arrow_refs(refs)

    edges = _rebuild(edges, edges.schema().base_schema.empty_table())
    joined_empty = pa.schema(
        [(a_col, node_type), (b_col, node_type), ("label_a", node_type)]
    ).empty_table()

    def explode(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col)
        b = batch.column(b_col)
        return pa.table(
            {
                "node": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "label": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
            }
        )

    def _min_with_self(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return empty
        return pa.table(
            {
                "node": t.column("node"),
                "label": pa.compute.min_element_wise(t.column("node"), t.column("min(label)")),
            }
        )

    # Round 0: direct neighbor mins (label(node) <= node from here on).
    labels = _rebuild(
        edges.map_batches(explode, batch_format="pyarrow")
        .groupby("node")
        .min("label")
        .map_batches(_min_with_self, batch_format="pyarrow")
        .materialize(),
        empty,
    )

    def relabel_exploded(batch: pa.Table) -> pa.Table:
        # Edge row carries both endpoints' current labels after the joins;
        # each endpoint offers its label to the other AND re-offers its own
        # (self-offers keep labels monotone without unioning the label
        # table back in — a union of join-derived blocks confuses Ray's
        # schema unification with empty-schema blocks).
        if batch.num_rows == 0 or a_col not in batch.column_names:
            return empty
        a = batch.column(a_col).combine_chunks()
        b = batch.column(b_col).combine_chunks()
        la = batch.column("label_a").combine_chunks()
        lb = batch.column("label_b").combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([a, b, a, b]),
                "label": pa.concat_arrays([lb, la, la, lb]),
            }
        )

    prev_sum = None
    for rnd in range(max_iter):
        t0 = time.time()
        agg = labels.aggregate(Sum("label"), Count())
        cur = agg["sum(label)"]
        if metrics is not None:
            metrics.append(
                {
                    "round": rnd,
                    "label_sum": int(cur or 0),
                    "n_nodes": int(agg["count()"]),
                    "wall_s": round(time.time() - t0, 3),
                }
            )
        if cur == prev_sum:
            break
        prev_sum = cur
        la = labels.rename_columns({"node": a_col, "label": "label_a"})
        lb = labels.rename_columns({"node": b_col, "label": "label_b"})
        # Rebuild between the chained joins: Ray's hash-shuffle join
        # broadcasts schema-bearing empty shards only from the FIRST
        # shuffle task per input, and _shuffle_block returns early for a
        # zero-row block while the operator still marks schemas as
        # broadcast — so if an empty block from join #1 arrives first,
        # left-empty partitions of join #2 build columnless tables and
        # pyarrow's join raises ArrowInvalid (block-order race). Dropping
        # empty blocks at the ref level guarantees the first shard seen
        # carries the schema.
        half = _rebuild(
            edges.join(la, "inner", num_partitions, on=(a_col,)).materialize(),
            joined_empty,
        )
        offered = half.join(lb, "inner", num_partitions, on=(b_col,)).map_batches(
            relabel_exploded, batch_format="pyarrow"
        )
        labels = _rebuild(
            offered.groupby("node")
            .min("label")
            .map_batches(_min_with_self, batch_format="pyarrow")
            .materialize(),
            empty,
        )
    return labels.map_batches(
        lambda t: pa.table({"id": t.column("node"), "cluster_id": t.column("label")}),
        batch_format="pyarrow",
    )
