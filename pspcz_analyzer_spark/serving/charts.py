"""Chart sink (SURVEY S14): collected query rows -> image bytes.

The reference renders seaborn/matplotlib charts of analysis results inside
the request path (/root/reference/pspcz_analyzer/routes/charts.py:30-193):
horizontal bar charts for loyalty and attendance and a PCA scatter for
similarity, all built from an already-computed (and cached) analysis
result. The data side is just a catalog query; rendering is a driver-side
concern over a small collected row list — it never touches the cluster.

Two renderers, one contract (rows in, image bytes out):

* matplotlib, when installed, renders PNG exactly like the reference.
* A dependency-free SVG renderer (this module, pure string assembly)
  covers the same three chart shapes — horizontal bars and scatter —
  so the chart surface works in every runtime. SVG is deterministic
  (no fonts rasterized, no rcParams), which also makes it testable:
  tests parse the XML and count marks.

``render_chart`` picks PNG when matplotlib exists, else SVG, and returns
``(bytes, mime)`` so HTTP routes can serve either transparently.
"""

from __future__ import annotations

from typing import Any

Rows = list[dict[str, Any]]

_FG = "#333333"
_GRID = "#D9D9D9"
_BG = "#FFFFFF"
_AXIS_BG = "#F7F7F7"


def _esc(s: Any) -> str:
    return (
        str(s)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _nice_ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """~n round-valued ticks covering [lo, hi] (matplotlib MaxNLocator-ish)."""
    if hi <= lo:
        hi = lo + 1.0
    raw = (hi - lo) / max(n, 1)
    import math

    mag = 10.0 ** math.floor(math.log10(raw))
    for mult in (1.0, 2.0, 2.5, 5.0, 10.0):
        step = mult * mag
        if step >= raw:
            break
    first = math.floor(lo / step) * step
    ticks = [round(first, 10)]
    while ticks[-1] < hi - step * 1e-9:
        ticks.append(round(ticks[-1] + step, 10))
    return ticks


def _coolwarm(frac: float) -> str:
    """Blue->grey->red interpolation, the reference's coolwarm palette feel."""
    frac = min(1.0, max(0.0, frac))
    cold, warm, mid = (59, 76, 192), (180, 4, 38), (221, 221, 221)
    if frac < 0.5:
        a, b, t = cold, mid, frac * 2
    else:
        a, b, t = mid, warm, (frac - 0.5) * 2
    rgb = tuple(int(a[i] + (b[i] - a[i]) * t) for i in range(3))
    return "#%02x%02x%02x" % rgb


# Categorical palette for scatter groups (seaborn "deep" hexes — public
# matplotlib/seaborn constants, not sampled at runtime).
_DEEP = [
    "#4C72B0", "#DD8452", "#55A868", "#C44E52", "#8172B3",
    "#937860", "#DA8BC3", "#8C8C8C", "#CCB974", "#64B5CD",
]


def render_barh_svg(
    rows: Rows,
    label: str,
    value: str,
    title: str = "",
    max_rows: int = 50,
    width: int = 900,
) -> bytes:
    """Horizontal bar chart (the loyalty/attendance shape,
    routes/charts.py:60-135): one bar per row, labels left, value-colored
    bars, a light value grid. Pure-string SVG, deterministic."""
    rows = list(rows)[:max_rows]
    bar_h, gap, top, left, right = 22, 6, 48, 300, 30
    height = top + len(rows) * (bar_h + gap) + 46
    # Bars render rightward from 0; negative metrics clamp to zero-width
    # (the loyalty/attendance metrics are percentages, but a generic caller
    # must not be able to emit a negative-width rect, which is invalid SVG).
    vals = [max(0.0, float(r[value] or 0)) for r in rows]
    vmax = max([v for v in vals] + [0.0])
    ticks = _nice_ticks(0.0, vmax if vmax > 0 else 1.0)
    span = ticks[-1] if ticks[-1] > 0 else 1.0
    plot_w = width - left - right

    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="sans-serif" font-size="12">',
        f'<rect width="{width}" height="{height}" fill="{_BG}"/>',
        f'<rect x="{left}" y="{top}" width="{plot_w}" '
        f'height="{height - top - 46}" fill="{_AXIS_BG}"/>',
        f'<text x="{width / 2:.1f}" y="24" text-anchor="middle" '
        f'font-size="16" fill="{_FG}">{_esc(title)}</text>',
    ]
    for t in ticks:
        x = left + plot_w * (t / span)
        out.append(
            f'<line x1="{x:.1f}" y1="{top}" x2="{x:.1f}" '
            f'y2="{height - 46}" stroke="{_GRID}" stroke-width="1"/>'
        )
        out.append(
            f'<text x="{x:.1f}" y="{height - 28}" text-anchor="middle" '
            f'fill="{_FG}">{t:g}</text>'
        )
    vmin = min(vals) if vals else 0.0
    vspan = (max(vals) - vmin) or 1.0 if vals else 1.0
    for i, r in enumerate(rows):
        y = top + i * (bar_h + gap)
        v = vals[i]
        w = plot_w * (v / span)
        color = _coolwarm((v - vmin) / vspan)
        out.append(
            f'<text x="{left - 8}" y="{y + bar_h * 0.72:.1f}" '
            f'text-anchor="end" fill="{_FG}">{_esc(r[label])}</text>'
        )
        out.append(
            f'<rect class="bar" x="{left}" y="{y}" width="{w:.1f}" '
            f'height="{bar_h}" fill="{color}"/>'
        )
        out.append(
            f'<text x="{left + w + 4:.1f}" y="{y + bar_h * 0.72:.1f}" '
            f'fill="{_FG}">{v:g}</text>'
        )
    out.append("</svg>")
    return "\n".join(out).encode("utf-8")


def render_scatter_svg(
    rows: Rows,
    x: str,
    y: str,
    group: str | None = None,
    point_label: str | None = None,
    title: str = "",
    width: int = 900,
    height: int = 640,
) -> bytes:
    """Scatter plot (the PCA-similarity shape, routes/charts.py:138-190):
    one circle per row, colored by ``group`` (party) with a legend,
    optional per-point labels."""
    rows = list(rows)
    top, left, right, bottom = 48, 60, 170 if group else 30, 46
    plot_w, plot_h = width - left - right, height - top - bottom
    xs = [float(r[x] or 0) for r in rows]
    ys = [float(r[y] or 0) for r in rows]
    xt = _nice_ticks(min(xs, default=0.0), max(xs, default=1.0))
    yt = _nice_ticks(min(ys, default=0.0), max(ys, default=1.0))
    x0, x1 = xt[0], xt[-1]
    y0, y1 = yt[0], yt[-1]

    def px(v: float) -> float:
        return left + plot_w * (v - x0) / ((x1 - x0) or 1.0)

    def py(v: float) -> float:
        return top + plot_h * (1 - (v - y0) / ((y1 - y0) or 1.0))

    groups: list[str] = []
    if group:
        for r in rows:
            g = str(r.get(group))
            if g not in groups:
                groups.append(g)
    color_of = {g: _DEEP[i % len(_DEEP)] for i, g in enumerate(groups)}

    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="sans-serif" font-size="12">',
        f'<rect width="{width}" height="{height}" fill="{_BG}"/>',
        f'<rect x="{left}" y="{top}" width="{plot_w}" height="{plot_h}" '
        f'fill="{_AXIS_BG}"/>',
        f'<text x="{width / 2:.1f}" y="24" text-anchor="middle" '
        f'font-size="16" fill="{_FG}">{_esc(title)}</text>',
    ]
    for t in xt:
        out.append(
            f'<line x1="{px(t):.1f}" y1="{top}" x2="{px(t):.1f}" '
            f'y2="{top + plot_h}" stroke="{_GRID}"/>'
        )
        out.append(
            f'<text x="{px(t):.1f}" y="{height - 26}" text-anchor="middle" '
            f'fill="{_FG}">{t:g}</text>'
        )
    for t in yt:
        out.append(
            f'<line x1="{left}" y1="{py(t):.1f}" x2="{left + plot_w}" '
            f'y2="{py(t):.1f}" stroke="{_GRID}"/>'
        )
        out.append(
            f'<text x="{left - 6}" y="{py(t) + 4:.1f}" text-anchor="end" '
            f'fill="{_FG}">{t:g}</text>'
        )
    for r, vx, vy in zip(rows, xs, ys):
        color = color_of.get(str(r.get(group)), _DEEP[0]) if group else _DEEP[0]
        out.append(
            f'<circle class="pt" cx="{px(vx):.1f}" cy="{py(vy):.1f}" r="5" '
            f'fill="{color}" fill-opacity="0.85"/>'
        )
        if point_label:
            out.append(
                f'<text x="{px(vx) + 7:.1f}" y="{py(vy) + 4:.1f}" '
                f'font-size="10" fill="{_FG}">{_esc(r[point_label])}</text>'
            )
    if group:
        lx = left + plot_w + 16
        for i, g in enumerate(groups):
            ly = top + 10 + i * 20
            out.append(
                f'<circle cx="{lx}" cy="{ly}" r="6" fill="{color_of[g]}"/>'
            )
            out.append(
                f'<text x="{lx + 12}" y="{ly + 4}" fill="{_FG}">{_esc(g)}</text>'
            )
    out.append("</svg>")
    return "\n".join(out).encode("utf-8")


def _have_matplotlib() -> bool:
    try:
        import matplotlib  # noqa: F401

        return True
    except ImportError:
        return False


def render_chart(
    rows: Rows,
    kind: str,
    title: str = "",
    max_rows: int = 50,
    **cols: str | None,
) -> tuple[bytes, str]:
    """Render ``rows`` as (image bytes, mime type).

    ``kind`` is ``"barh"`` (cols: label, value) or ``"scatter"`` (cols: x,
    y, optional group/point_label). PNG via matplotlib when installed
    (reference parity); otherwise the built-in SVG renderer.
    """
    if kind == "barh":
        if _have_matplotlib():  # pragma: no cover - runtime-dependent
            return (
                render_bar_chart(
                    rows, cols["label"], cols["value"], title, max_rows, horizontal=True
                ),
                "image/png",
            )
        return (
            render_barh_svg(
                rows, cols["label"], cols["value"], title=title, max_rows=max_rows
            ),
            "image/svg+xml",
        )
    if kind == "scatter":
        if _have_matplotlib():  # pragma: no cover - runtime-dependent
            return (
                render_scatter_png(
                    rows,
                    cols["x"],
                    cols["y"],
                    group=cols.get("group"),
                    title=title,
                ),
                "image/png",
            )
        return (
            render_scatter_svg(
                rows,
                cols["x"],
                cols["y"],
                group=cols.get("group"),
                point_label=cols.get("point_label"),
                title=title,
            ),
            "image/svg+xml",
        )
    raise ValueError(f"unknown chart kind: {kind}")


def render_bar_chart(
    rows: Rows,
    x: str,
    y: str,
    title: str = "",
    max_rows: int = 50,
    horizontal: bool = False,
) -> bytes:  # pragma: no cover - needs matplotlib
    """Render a bar chart PNG from collected rows (top ``max_rows``)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:
        raise ImportError(
            "matplotlib is not installed; use render_barh_svg / render_chart "
            "for the dependency-free SVG path"
        ) from e

    import io

    rows = rows[:max_rows]
    fig, ax = plt.subplots(figsize=(10, max(5, len(rows) * 0.3) if horizontal else 5))
    if horizontal:
        ax.barh([str(r[x]) for r in rows][::-1], [r[y] for r in rows][::-1])
    else:
        ax.bar([str(r[x]) for r in rows], [r[y] for r in rows])
        ax.tick_params(axis="x", rotation=75)
    ax.set_title(title or f"{y} by {x}")
    fig.tight_layout()
    buf = io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    return buf.getvalue()


def render_scatter_png(
    rows: Rows,
    x: str,
    y: str,
    group: str | None = None,
    title: str = "",
) -> bytes:  # pragma: no cover - needs matplotlib
    """Scatter PNG (PCA shape) via matplotlib, grouped coloring."""
    import io

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 7))
    if group:
        seen: dict[str, list[int]] = {}
        for i, r in enumerate(rows):
            seen.setdefault(str(r.get(group)), []).append(i)
        for gi, (g, idxs) in enumerate(seen.items()):
            ax.scatter(
                [rows[i][x] for i in idxs],
                [rows[i][y] for i in idxs],
                label=g,
                color=_DEEP[gi % len(_DEEP)],
            )
        ax.legend(loc="best", fontsize=8)
    else:
        ax.scatter([r[x] for r in rows], [r[y] for r in rows], color=_DEEP[0])
    ax.set_title(title)
    fig.tight_layout()
    buf = io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    return buf.getvalue()
