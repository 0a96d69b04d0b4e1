"""Motif finding: a GraphFrames-style structural pattern DSL compiled
to Catalyst joins — the declarative query surface for "find every
binding of this little subgraph shape" (feed-forward loops,
non-reciprocated links, co-citation wedges) without hand-writing the
join chain each time.

Pattern grammar (the GraphFrames `find()` subset that compiles to
pure joins):

    pattern  := term (';' term)*
    term     := edge | '!' edge | vertex
    edge     := vertex '-[' name? ']->' vertex
    vertex   := '(' name? ')'

Examples::

    (a)-[]->(b); (b)-[]->(c); (a)-[]->(c)     feed-forward triangle
    (a)-[e]->(b); !(b)-[]->(a)                unreciprocated links
    (a)-[]->(b); (c)-[]->(b); (a)             co-citation wedge

Semantics (GraphFrames-compatible):

  * named vertices bind once across the whole pattern: the same name
    in two terms is the SAME vertex (a join key). Distinct names MAY
    bind the same id (no automatic isomorphism check — add
    ``a != b`` filters on the result for that, as in GraphFrames).
  * anonymous vertices ``()`` join but bind no output column.
  * named edges emit ``<name>_src``/``<name>_dst``/``<name>_weight``
    columns (flat, hash-comparable — not a struct).
  * ``!`` negation is an anti-join; both endpoints must already be
    bound by positive terms (same restriction as GraphFrames), and
    negated edges cannot be named.
  * a bare vertex term ``(a)`` binds against the vertex table —
    cross-joined if ``a`` is not already bound (legal but warned in
    GraphFrames; here it is just allowed).

Output: DataFrame with one column per named vertex (its id) and the
three columns per named edge, one row per binding.

Plan shape: each positive term is ONE equi-join against the edge
table (Catalyst reorders and picks broadcast vs shuffle per side —
exactly why compiling to joins beats a custom matcher), each negated
term one anti-join. A k-term motif is a k-join plan, the same shape
the engine's hand-written triangle/butterfly counters use — this
operator is the general-purpose front end, not a replacement for the
degree-ordered specialized counters on hub-heavy inputs (their
orientation trick is the scale path for symmetric motifs).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph

_EDGE = re.compile(
    r"^\s*(!?)\s*\(\s*(\w*)\s*\)\s*-\s*\[\s*(\w*)\s*\]\s*->\s*\(\s*(\w*)\s*\)\s*$"
)
_VERT = re.compile(r"^\s*\(\s*(\w*)\s*\)\s*$")


class PatternError(ValueError):
    pass


def find_motifs(graph: LinkGraph, pattern: str) -> DataFrame:
    """Find every binding of ``pattern`` (see module docstring for
    the grammar and semantics). Returns a DataFrame with one id
    column per named vertex and ``_src``/``_dst``/``_weight`` columns
    per named edge."""
    terms = [t for t in (s.strip() for s in pattern.split(";")) if t]
    if not terms:
        raise PatternError("empty pattern")
    edges = graph.edges.select("src", "dst", "weight")
    verts = graph.vertices.select("id")
    cur: DataFrame | None = None
    bound: set[str] = set()
    seen_edge_names: set[str] = set()
    anon = 0

    for ti, term in enumerate(terms):
        em = _EDGE.match(term)
        vm = _VERT.match(term) if em is None else None
        if em is None and vm is None:
            raise PatternError(f"unparseable term {term!r}")
        if em is not None:
            neg, u, ename, v = em.groups()
            if neg and ename:
                raise PatternError(
                    f"negated edge cannot be named: {term!r}"
                )
            if ename:
                if ename in seen_edge_names:
                    raise PatternError(f"duplicate edge name {ename!r}")
                if ename.startswith("_"):
                    raise PatternError(
                        f"edge names starting with '_' are reserved: {ename!r}"
                    )
                seen_edge_names.add(ename)
            if neg:
                if not u or not v:
                    raise PatternError(
                        f"negated edge needs named endpoints: {term!r}"
                    )
                if cur is None or u not in bound or v not in bound:
                    raise PatternError(
                        f"negated term {term!r} endpoints must be bound by "
                        "positive terms first"
                    )
                e = edges.select(
                    F.col("src").alias("_nsrc"), F.col("dst").alias("_ndst")
                )
                cur = cur.join(
                    e,
                    (F.col(u) == F.col("_nsrc")) & (F.col(v) == F.col("_ndst")),
                    "left_anti",
                )
                continue
            # positive edge term: alias this term's edge instance
            if not u:
                anon += 1
                u, u_anon = f"_anon{anon}", True
            else:
                u_anon = False
            if not v:
                anon += 1
                v, v_anon = f"_anon{anon}", True
            else:
                v_anon = False
            pre = ename if ename else f"_t{ti}"
            e = edges.select(
                F.col("src").alias(f"{pre}_src"),
                F.col("dst").alias(f"{pre}_dst"),
                F.col("weight").alias(f"{pre}_weight"),
            )
            if u == v:
                # self-loop term: both endpoints are the same vertex
                e = e.filter(F.col(f"{pre}_src") == F.col(f"{pre}_dst"))
            if cur is None:
                cur = e
            else:
                cond = []
                if u in bound:
                    cond.append(F.col(u) == F.col(f"{pre}_src"))
                if v in bound:
                    cond.append(F.col(v) == F.col(f"{pre}_dst"))
                if cond:
                    c = cond[0]
                    for extra in cond[1:]:
                        c = c & extra
                    cur = cur.join(e, c)
                else:
                    cur = cur.crossJoin(e)
            # bind endpoint names as plain columns
            if u not in bound:
                cur = cur.withColumn(u, F.col(f"{pre}_src"))
                bound.add(u)
            if v not in bound:
                cur = cur.withColumn(v, F.col(f"{pre}_dst"))
                bound.add(v)
            if not ename:
                cur = cur.drop(f"{pre}_src", f"{pre}_dst", f"{pre}_weight")
            # anonymous endpoints bind for THIS term only
            for nm, is_anon in ((u, u_anon), (v, v_anon)):
                if is_anon:
                    cur = cur.drop(nm)
                    bound.discard(nm)
        else:
            (name,) = vm.groups()
            if not name:
                raise PatternError("anonymous bare vertex term is meaningless")
            if name in bound:
                continue  # already constrained by an edge term
            vv = verts.select(F.col("id").alias(name))
            cur = vv if cur is None else cur.crossJoin(vv)
            bound.add(name)
    named_cols = sorted(bound) + sorted(
        f"{e}_{f}" for e in seen_edge_names for f in ("src", "dst", "weight")
    )
    if not named_cols:
        raise PatternError("pattern binds nothing (all terms anonymous)")
    return cur.select(*named_cols)
