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


def connected_components_ds(edges_ds, a_col: str = "id_a", b_col: str = "id_b") -> dict:
    """Driver-side union-find streaming over an edge Dataset's batches (never
    materializes more than one block of edges at a time)."""
    uf = UnionFind()
    for batch in edges_ds.iter_batches(batch_format="pyarrow"):
        aa = batch.column(a_col).to_pylist()
        bb = batch.column(b_col).to_pylist()
        for a, b in zip(aa, bb):
            uf.union(a, b)
    return uf.components()


def label_propagation(edges_ds, a_col: str = "id_a", b_col: str = "id_b", max_iter: int = 20):
    """Distributed min-label propagation over an edge Dataset.

    Node state is carried by the edges themselves: each round, every edge
    emits (node, neighbor_label) both ways and a groupby(node).min gives the
    new labels; edges re-read labels by joining through a second groupby on
    the edge key. Returns a Dataset (id, cluster_id). One groupby shuffle per
    round; stops early when the global min-label sum stops changing.
    """
    import pyarrow as pa
    from ray.data.aggregate import Min, Sum

    # labels(i) start as the node's own id: derive the node list from edges.
    def explode(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col)
        b = batch.column(b_col)
        return pa.table(
            {
                "node": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "label": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
            }
        )

    # Round 0: direct neighbor mins.
    labels = (
        edges_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("node")
        .min("label")
    )
    labels = labels.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "label": pa.compute.min_element_wise(t.column("node"), t.column("min(label)")),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    prev_sum = None
    for _ in range(max_iter):
        cur = labels.aggregate(Sum("label"))["sum(label)"]
        if cur == prev_sum:
            break
        prev_sum = cur
        # Propagate: node's label flows to every neighbor via the edge list.
        # Broadcast the label map once per round with ray.put (it only
        # contains nodes that appear on edges — far smaller than the corpus)
        # and refresh edge endpoints' labels inside map_batches.
        import ray

        label_map: dict = {}
        for t in labels.iter_batches(batch_format="pyarrow"):
            label_map.update(zip(t.column("node").to_pylist(), t.column("label").to_pylist()))
        label_map_ref = ray.put(label_map)

        def relabel(batch: pa.Table, ref=label_map_ref) -> pa.Table:
            m = ray.get(ref)
            a = batch.column(a_col).to_pylist()
            b = batch.column(b_col).to_pylist()
            la = [m.get(x, x) for x in a]
            lb = [m.get(x, x) for x in b]
            return pa.table(
                {
                    "node": pa.array(a + b),
                    "label": pa.array(lb + la),
                }
            )

        labels = (
            edges_ds.map_batches(relabel, batch_format="pyarrow")
            .groupby("node")
            .min("label")
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("node"),
                        "label": pa.compute.min_element_wise(
                            t.column("node"), t.column("min(label)")
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return labels.map_batches(
        lambda t: pa.table({"id": t.column("node"), "cluster_id": t.column("label")}),
        batch_format="pyarrow",
    )
