"""Property-graph motif matching compiled to DataFrame join plans.

The reference holds its graph in Memgraph and queries it with Cypher
``MATCH`` patterns (models.py:36-66 author lookups,
create_graph_from_doi.py:53-65 initial+surname match,
create_graph_from_doi.py:295-330 Output/Country containment) — every one
a small motif: a chain, a wedge, or a closing edge. This module is the
Spark-side equivalent: a registry of node/edge DataFrames plus a
``match(pattern)`` that parses a Cypher-ish pattern string and builds the
equi-join plan for it. No interpreter runs per row — ``match`` only
*composes* DataFrame operations, so Catalyst sees one declarative join
tree per motif and plans broadcasts/shuffles exactly as if the joins had
been written by hand (the rewired q_graph_two_hop/q_graph_triangles in
plans/ compile to their original physical plans; tests/test_graph.py
asserts it).

Pattern grammar (one or more comma-separated paths)::

    (var[:Label]) -[alias?:rel]-> (var[:Label])   forward edge
    (var[:Label]) <-[alias?:rel]- (var[:Label])   reversed edge

- Re-using a var name chains hops; a hop whose BOTH endpoints are
  already bound becomes a closing equi-join on the pair (triangles).
- Each hop joins on the shared var columns only — a hop sharing no var
  with the bound prefix is rejected (it would be a cartesian product).
- ``alias:`` on an edge carries the edge frame's non-endpoint columns
  into the result as ``alias_<col>`` (edge properties).
- ``:Label`` on a var constrains it to the registered node set: a
  LEFT SEMI join when the label carries no properties, an inner join
  projecting ``var_<prop>`` when it does.

Scale notes: every hop is a hash equi-join on narrow key columns; the
caller controls skew the same way the hand-written motifs do (hub-cap
the edge list before registering it — see plans/queries.py
q_graph_two_hop). Node frames registered with ``broadcast=True`` are
dimension-sized and hint ``F.broadcast`` so label constraints never
shuffle the matched edges.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NODE_RE = re.compile(r"\(\s*(\w+)\s*(?::\s*(\w+))?\s*\)")
_EDGE_RE = re.compile(
    r"(?:-\[\s*(?:(\w+)\s*)?:\s*(\w+)\s*\]->)"    # -[alias?:rel]->
    r"|(?:<-\[\s*(?:(\w+)\s*)?:\s*(\w+)\s*\]-)")  # <-[alias?:rel]-


@dataclass(frozen=True)
class _EdgeSpec:
    df: DataFrame
    src: str
    dst: str


@dataclass(frozen=True)
class _NodeSpec:
    df: DataFrame
    id_col: str
    props: tuple[str, ...]
    broadcast: bool


@dataclass
class PropertyGraph:
    """Node/edge DataFrame registry + the motif compiler."""

    _nodes: dict[str, _NodeSpec] = field(default_factory=dict)
    _edges: dict[str, _EdgeSpec] = field(default_factory=dict)

    def with_nodes(self, label: str, df: DataFrame, id_col: str = "id",
                   props: tuple[str, ...] = (),
                   broadcast: bool = False) -> "PropertyGraph":
        """Register the node set for ``label``. ``props`` columns are
        projected into match results as ``<var>_<prop>``; with no props
        the label is a pure membership constraint (left-semi)."""
        self._nodes[label] = _NodeSpec(df, id_col, tuple(props), broadcast)
        return self

    def with_edges(self, rel: str, df: DataFrame, src: str = "src",
                   dst: str = "dst") -> "PropertyGraph":
        """Register the edge list for relationship type ``rel``.
        Columns besides src/dst ride along as edge properties, exposed
        only when a pattern hop names an alias."""
        self._edges[rel] = _EdgeSpec(df, src, dst)
        return self

    # -- pattern parsing ----------------------------------------------------

    def _parse(self, pattern: str):
        """-> (hops, labels): hops = [(src_var, dst_var, rel, alias)],
        labels = {var: label}. Direction is resolved here — a reversed
        arrow swaps the endpoint order, so hops are always src->dst."""
        hops: list[tuple[str, str, str, str | None]] = []
        labels: dict[str, str | None] = {}

        def _node(m, _labels=labels):
            var, label = m.group(1), m.group(2)
            if label is not None:
                if _labels.get(var) not in (None, label):
                    raise ValueError(
                        f"var {var!r} bound to two labels "
                        f"({_labels[var]!r}, {label!r})")
                _labels[var] = label
            else:
                _labels.setdefault(var, None)
            return var

        for path in pattern.split(","):
            pos, path = 0, path.strip()
            m = _NODE_RE.match(path, pos)
            if not m:
                raise ValueError(f"expected (var[:Label]) at {path[pos:]!r}")
            prev, pos = _node(m), m.end()
            while pos < len(path):
                em = _EDGE_RE.match(path, pos)
                if not em:
                    raise ValueError(
                        f"expected -[:rel]-> or <-[:rel]- at {path[pos:]!r}")
                pos = em.end()
                nm = _NODE_RE.match(path, pos)
                if not nm:
                    raise ValueError(
                        f"expected (var[:Label]) at {path[pos:]!r}")
                nxt, pos = _node(nm), nm.end()
                if em.group(2) is not None:        # forward
                    hops.append((prev, nxt, em.group(2), em.group(1)))
                else:                              # reversed
                    hops.append((nxt, prev, em.group(4), em.group(3)))
                prev = nxt
        return hops, labels

    # -- compilation --------------------------------------------------------

    def match(self, pattern: str) -> DataFrame:
        """Compile the pattern into a DataFrame of variable bindings.

        Result columns: one id column per var, ``alias_<col>`` per
        aliased edge property, ``var_<prop>`` per labeled-node property.
        Like Cypher MATCH, symmetric patterns return both orientations;
        callers dedup with an order predicate (e.g. ``a < b``) exactly as
        the hand-written motifs do.
        """
        hops, labels = self._parse(pattern)
        if not hops:
            raise ValueError("pattern has no edges; use the node frame")
        seen_aliases: set[str] = set()
        for u, v, _rel, alias in hops:
            if u == v:
                raise ValueError(
                    f"self-loop hop on {u!r}: both endpoints would bind "
                    "the same column — filter src=dst on the edge frame "
                    "instead")
            if alias is not None:
                if alias in seen_aliases or alias in labels:
                    raise ValueError(
                        f"edge alias {alias!r} is not unique in the "
                        "pattern (would produce duplicate columns)")
                seen_aliases.add(alias)
        df: DataFrame | None = None
        bound: set[str] = set()
        for u, v, rel, alias in hops:
            if rel not in self._edges:
                raise KeyError(f"unregistered edge type {rel!r}")
            spec = self._edges[rel]
            cols = [F.col(spec.src).alias(u), F.col(spec.dst).alias(v)]
            if alias is not None:
                cols += [F.col(c).alias(f"{alias}_{c}")
                         for c in spec.df.columns
                         if c not in (spec.src, spec.dst)]
            e = spec.df.select(*cols)
            if df is None:
                df, bound = e, {u, v}
                continue
            on = [x for x in dict.fromkeys((u, v)) if x in bound]
            if not on:
                raise ValueError(
                    f"hop ({u})-[:{rel}]->({v}) shares no var with the "
                    f"bound prefix {sorted(bound)}; reorder the pattern "
                    "(a disconnected hop is a cartesian product)")
            df = df.join(e, on)
            bound |= {u, v}
        for var, label in labels.items():
            if label is None:
                continue
            if label not in self._nodes:
                raise KeyError(f"unregistered node label {label!r}")
            n = self._nodes[label]
            nd = n.df.select(F.col(n.id_col).alias(var),
                             *[F.col(p).alias(f"{var}_{p}")
                               for p in n.props])
            if n.broadcast:
                nd = F.broadcast(nd)
            df = df.join(nd, var, "left_semi" if not n.props else "inner")
        return df
