"""Pure-Python oracles for the graph algorithms.

``pagerank_oracle`` implements the standard power-iteration PageRank
(same semantics as NetworkX's: out-weight-normalized contributions,
uniform dangling redistribution, err = Σ|x-xlast| < N·tol) in plain
dicts — NetworkX 3.x delegates to SciPy which isn't in this sandbox.
Components/triangles/BFS oracles use NetworkX's pure-Python paths.
"""

from __future__ import annotations


def pagerank_oracle(
    edges: list[tuple[int, int, float]],
    vertices: list[int],
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
    weighted: bool = True,
    undirected: bool = False,
    personalization: dict[int, float] | None = None,
) -> dict[int, float]:
    if undirected:
        edges = edges + [(d, s, w) for (s, d, w) in edges if s != d]
    n = len(vertices)
    if n == 0:
        return {}
    out_w: dict[int, float] = {}
    adj: dict[int, list[tuple[int, float]]] = {}
    for s, d, w in edges:
        ww = float(w) if weighted else 1.0
        out_w[s] = out_w.get(s, 0.0) + ww
        adj.setdefault(s, []).append((d, ww))
    if personalization is None:
        tp = {v: 1.0 / n for v in vertices}
    else:  # NetworkX semantics: normalize, unlisted vertices get 0
        psum = sum(personalization.values())
        tp = {v: personalization.get(v, 0.0) / psum for v in vertices}
    x = {v: 1.0 / n for v in vertices}
    dangling = [v for v in vertices if v not in out_w]
    for _ in range(max_iter):
        xlast = x
        x = {v: 0.0 for v in vertices}
        dm = sum(xlast[v] for v in dangling)
        for s, nbrs in adj.items():
            rs = xlast[s]
            ow = out_w[s]
            for d, ww in nbrs:
                x[d] += alpha * rs * ww / ow
        for v in vertices:
            x[v] += (1.0 - alpha) * tp[v] + alpha * dm * tp[v]
        err = sum(abs(x[v] - xlast[v]) for v in vertices)
        if err < n * tol:
            return x
    return x


def sssp_oracle(
    edges: list[tuple[int, int, float]],
    source: int,
    undirected: bool = False,
) -> dict[int, float]:
    """Dijkstra with a heap — the reference's shortest_path contract
    (graph.rs:1054-1134) as distance map."""
    import heapq

    adj: dict[int, list[tuple[int, float]]] = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, float(w)))
        if undirected:
            adj.setdefault(d, []).append((s, float(w)))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        dd, u = heapq.heappop(pq)
        if dd > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = dd + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist
