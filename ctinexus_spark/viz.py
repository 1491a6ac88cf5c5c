"""HTML knowledge-graph visualization sink (SURVEY §2 S5).

Reference: graph_constructor.py:483-677 renders the constructed KG
with pyvis (vis-network via CDN) — typed node colors, a legend, hover
titles — served in an iframe by http_server_utils.py. This rebuild
keeps that contract (typed, colored, legended, single-file HTML) but
generates a fully SELF-CONTAINED artifact: inline SVG with a seeded
Fruchterman-Reingold layout computed driver-side in numpy, zero
external JS/CSS, so the file opens anywhere including air-gapped
review environments.

Scale stance: at engine scale the graph IS the entities/edges tables;
this sink is a bounded DEMO artifact. The only driver-side collect is
explicitly capped at `max_nodes` top-degree vertices (plus their
induced edges) — degree ranking and edge induction run as Spark
aggregations/joins, so the cap is a limit pushed into the plan, not a
full-graph collect filtered in Python.
"""

from __future__ import annotations

import html as _html
import json
import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# flat UI palette, cycled per node type (reference uses pyvis defaults)
_PALETTE = [
    "#4e79a7", "#f28e2b", "#e15759", "#76b7b2", "#59a14f",
    "#edc948", "#b07aa1", "#ff9da7", "#9c755f", "#bab0ac",
]

_CANVAS = 900.0


def _force_layout(n: int, edges: list[tuple[int, int]], seed: int = 7,
                  iterations: int = 150) -> np.ndarray:
    """Seeded Fruchterman-Reingold on ≤max_nodes vertices — O(n²·iters)
    numpy, fine for a demo cap of a few hundred nodes."""
    rng = np.random.RandomState(seed)
    pos = rng.uniform(0.05, 0.95, size=(n, 2)) * _CANVAS
    if n <= 1:
        return pos
    k = _CANVAS / math.sqrt(n)
    ei = np.array(edges, dtype=np.int64) if edges else np.zeros((0, 2), np.int64)
    t = _CANVAS / 10.0
    cool = t / (iterations + 1)
    for _ in range(iterations):
        delta = pos[:, None, :] - pos[None, :, :]
        dist = np.linalg.norm(delta, axis=2)
        np.fill_diagonal(dist, 1.0)
        # repulsion k²/d, attraction d²/k along edges
        disp = (delta / dist[:, :, None]) * (k * k / dist)[:, :, None]
        disp = disp.sum(axis=1)
        if len(ei):
            ed = pos[ei[:, 0]] - pos[ei[:, 1]]
            edist = np.maximum(np.linalg.norm(ed, axis=1, keepdims=True), 1e-9)
            pull = ed / edist * (edist**2 / k)
            np.add.at(disp, ei[:, 0], -pull)
            np.add.at(disp, ei[:, 1], pull)
        norm = np.maximum(np.linalg.norm(disp, axis=1, keepdims=True), 1e-9)
        pos += disp / norm * np.minimum(norm, t)
        pos = np.clip(pos, 20.0, _CANVAS - 20.0)
        t = max(t - cool, 0.01)
    return pos


def graph_to_html(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    label: str = "pred",
    types: DataFrame | None = None,
    type_node: str = "name",
    type_col: str = "type",
    max_nodes: int = 300,
    seed: int = 7,
    title: str = "knowledge graph",
) -> str:
    """Render an edge table (+ optional (node, type) table) to a
    self-contained HTML string. Top-`max_nodes` vertices by degree and
    their induced edges only — the documented demo cap."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"),
                     F.col(label).cast("string").alias("l"))
    deg = (
        e.select(F.col("s").alias("v"))
        .unionByName(e.select(F.col("d").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
        .orderBy(F.desc("deg"), "v")
        .limit(max_nodes)
    )
    nodes = [(r["v"], int(r["deg"])) for r in deg.collect()]
    idx = {v: i for i, (v, _) in enumerate(nodes)}
    keep = deg.select("v")
    induced = (
        e.join(keep.withColumnRenamed("v", "s"), "s")
        .join(keep.withColumnRenamed("v", "d"), "d")
        .select("s", "d", "l")
        .distinct()
        .collect()
    )
    ntype = {}
    if types is not None:
        trows = (
            types.select(F.col(type_node).alias("v"), F.col(type_col).alias("t"))
            .join(keep, "v")
            .collect()
        )
        ntype = {r["v"]: (r["t"] or "unknown") for r in trows}
    kinds = sorted({ntype.get(v, "unknown") for v, _ in nodes})
    color = {kind: _PALETTE[i % len(_PALETTE)] for i, kind in enumerate(kinds)}

    pos = _force_layout(len(nodes), [(idx[r["s"]], idx[r["d"]]) for r in induced], seed)
    maxdeg = max((d for _, d in nodes), default=1)

    svg = []
    for r in induced:
        x1, y1 = pos[idx[r["s"]]]
        x2, y2 = pos[idx[r["d"]]]
        lab = _html.escape(str(r["l"] or ""))
        svg.append(
            f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" y2="{y2:.1f}" '
            f'stroke="#c8c8c8" stroke-width="1"><title>{lab}</title></line>'
        )
        svg.append(
            f'<text x="{(x1 + x2) / 2:.1f}" y="{(y1 + y2) / 2:.1f}" '
            f'font-size="7" fill="#999">{lab}</text>'
        )
    for v, d in nodes:
        x, y = pos[idx[v]]
        kind = ntype.get(v, "unknown")
        r_px = 5 + 7 * math.sqrt(d / maxdeg)
        name = _html.escape(str(v))
        svg.append(
            f'<circle cx="{x:.1f}" cy="{y:.1f}" r="{r_px:.1f}" fill="{color[kind]}" '
            f'stroke="#555"><title>{name} [{_html.escape(kind)}] deg={d}</title></circle>'
        )
        svg.append(
            f'<text x="{x + r_px + 2:.1f}" y="{y + 3:.1f}" font-size="9" '
            f'fill="#333">{name}</text>'
        )
    legend = "".join(
        f'<span style="margin-right:12px">'
        f'<span style="display:inline-block;width:10px;height:10px;'
        f'background:{color[kind]};border-radius:5px"></span> '
        f"{_html.escape(kind)}</span>"
        for kind in kinds
    )
    meta = json.dumps({"nodes": len(nodes), "edges": len(induced),
                       "max_nodes": max_nodes, "types": kinds})
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{_html.escape(title)}</title></head>
<body style="font-family:sans-serif">
<h3>{_html.escape(title)}</h3>
<div>{legend}</div>
<svg viewBox="0 0 {_CANVAS:.0f} {_CANVAS:.0f}" width="{_CANVAS:.0f}" height="{_CANVAS:.0f}"
 style="border:1px solid #ddd;background:#fff">{"".join(svg)}</svg>
<script type="application/json" id="graph-meta">{meta}</script>
</body></html>
"""


def write_graph_html(
    edges: DataFrame,
    path: str,
    **kwargs,
) -> str:
    """Write the visualization to `path`; returns the path (mirrors
    the reference sink returning the artifact location,
    graph_constructor.py:483)."""
    doc = graph_to_html(edges, **kwargs)
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)
    return path
