"""Visual explanation artifact: contribs → SVG bar chart.

The reference renders a Grad-CAM JPEG overlay next to the prediction
(/root/reference/opennsfw2/_inspection.py:72-122) so a human can see WHY
an input scored the way it did.  Our numeric analog is the ``contribs``
MAP<STRING,DOUBLE> column (sigmoid(sum(contribs)) == quality_score,
golden-pinned); this module gives it a human-viewable twin: a
dependency-free SVG bar chart per document, written next to the run
manifest for quarantine/drop debugging.

Driver-side by design: explanations are for the handful of documents a
human is actually debugging (bounded take()), not a per-row pipeline
stage — the per-row artifact IS the contribs map.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_W, _BAR_H, _GAP, _LABEL_W, _VAL_W = 640, 22, 6, 150, 70
_POS, _NEG, _FG, _MUTED = "#2e7d32", "#c62828", "#222222", "#777777"


def _esc(s: str) -> str:
    return (
        str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def render_contribs_svg(
    contribs: dict[str, float], title: str, reasons: list[str] | None = None
) -> str:
    """One SVG: horizontal signed bars per contribution term (frozen
    order: sorted by |value| desc, ties by name), zero axis centered,
    score = sigmoid(sum) in the header — everything derives from the
    already-verified contribs map, nothing is recomputed."""
    items = sorted(contribs.items(), key=lambda kv: (-abs(kv[1]), kv[0]))
    total = sum(contribs.values())
    score = 1.0 / (1.0 + math.exp(-total))
    span = max((abs(v) for _, v in items), default=1.0) or 1.0
    plot_w = _W - _LABEL_W - _VAL_W - 20
    zero_x = _LABEL_W + plot_w / 2
    header_h = 46 + (16 if reasons else 0)
    h = header_h + len(items) * (_BAR_H + _GAP) + 12

    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{h}" '
        f'font-family="monospace" font-size="13">',
        f'<text x="10" y="18" fill="{_FG}">{_esc(title)}</text>',
        f'<text x="10" y="36" fill="{_FG}">quality_score = sigmoid({total:+.6f}) '
        f"= {score:.6f}</text>",
    ]
    if reasons:
        out.append(
            f'<text x="10" y="52" fill="{_NEG}">reasons: {_esc(", ".join(reasons))}</text>'
        )
    y = header_h
    for name, v in items:
        w = abs(v) / span * (plot_w / 2)
        x = zero_x - w if v < 0 else zero_x
        color = _NEG if v < 0 else _POS
        out.append(
            f'<text x="{_LABEL_W - 6}" y="{y + 15}" text-anchor="end" '
            f'fill="{_FG}">{_esc(name)}</text>'
        )
        out.append(
            f'<rect x="{x:.1f}" y="{y}" width="{max(w, 0.5):.1f}" '
            f'height="{_BAR_H - 6}" fill="{color}"/>'
        )
        out.append(
            f'<text x="{_W - 8}" y="{y + 15}" text-anchor="end" '
            f'fill="{_MUTED}">{v:+.4f}</text>'
        )
        y += _BAR_H + _GAP
    out.append(
        f'<line x1="{zero_x}" y1="{header_h - 4}" x2="{zero_x}" y2="{y}" '
        f'stroke="{_MUTED}" stroke-width="1"/>'
    )
    out.append("</svg>")
    return "\n".join(out)


def write_drop_explanations(
    scored: DataFrame, out_dir: str, max_docs: int = 50
) -> list[str]:
    """Write one SVG per non-kept document (bounded take) into
    ``<out_dir>/explanations/`` — the debugging artifact sink next to the
    run manifest.  Returns the written paths."""
    rows = (
        scored.filter(F.col("status") != "keep")
        .filter(F.col("contribs").isNotNull())
        .select("url", "status", "reasons", "contribs")
        .take(max_docs)
    )
    dest = os.path.join(out_dir, "explanations")
    os.makedirs(dest, exist_ok=True)
    written = []
    for i, r in enumerate(rows):
        svg = render_contribs_svg(
            dict(r["contribs"]),
            f"[{r['status']}] {r['url']}",
            list(r["reasons"] or []),
        )
        path = os.path.join(dest, f"doc_{i:04d}.svg")
        with open(path, "w") as f:
            f.write(svg)
        written.append(path)
    return written
