"""Pure-Python union-find (disjoint set) with path compression and the
min-root convention.

Used as (a) the in-memory clustering kernel inside block-local contraction
(see ``state/dist_union_find.py`` / ``stages/candidates.py``) and (b) the
test oracle replacing the reference's igraph validation
(``workload/minhash_dedupe.py:559-614``) — weak connected components with the
minimum node id as each component's representative, matching the reference's
assignment convention (``construct_assignments`` takes groupwise min,
``workload/minhash_dedupe.py:388-421``).

The min-root convention means ``find(x)`` returns the smallest node id in x's
component once ``finalize`` has run — which is exactly the output the
reference needs ``global_min_label_propagation``
(``workload/minhash_dedupe.py:429-505``) to repair after star contraction.
Union-find gives it directly.
"""

from __future__ import annotations


class UnionFind:
    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        parent = self.parent
        root = parent.get(x, x)
        while True:
            up = parent.get(root, root)
            if up == root:
                break
            root = up
        # path compression
        while x != root:
            nxt = parent.get(x, x)
            parent[x] = root
            x = nxt
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # min-root: smaller id becomes the parent
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.parent.setdefault(ra, ra)

    def add(self, x: int) -> None:
        self.parent.setdefault(x, x)

    def finalize(self) -> dict[int, int]:
        """Full path compression; returns {node: min_id_representative}."""
        return {x: self.find(x) for x in list(self.parent)}

    def components(self) -> dict[int, list[int]]:
        comps: dict[int, list[int]] = {}
        for node, rep in self.finalize().items():
            comps.setdefault(rep, []).append(node)
        return comps


def connected_components_oracle(edges) -> dict[int, int]:
    """{node: min-id representative} over an iterable of (u, v) edges.
    Nodes only ever seen as isolated (u == v self-edge) map to themselves."""
    uf = UnionFind()
    for u, v in edges:
        if u == v:
            uf.add(u)
        else:
            uf.union(int(u), int(v))
    return uf.finalize()
