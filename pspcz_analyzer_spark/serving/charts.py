"""Chart sink (SURVEY S14): collected query rows -> PNG bytes.

The reference renders seaborn/matplotlib charts of analysis results inside
the request path (/root/reference/pspcz_analyzer/routes/charts.py:30-193).
The data side is just a catalog query; rendering is a driver-side concern
over an already-small collected result. matplotlib is optional in this
runtime — the data contract (rows in, PNG bytes out) is what the engine
owns, and it raises clearly when the renderer is absent.
"""

from __future__ import annotations

from typing import Any

Rows = list[dict[str, Any]]


def render_bar_chart(
    rows: Rows, x: str, y: str, title: str = "", max_rows: int = 50
) -> bytes:
    """Render a bar chart PNG from collected rows (top ``max_rows``)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - runtime-dependent
        raise ImportError(
            "matplotlib is not installed; serve the rows as JSON instead, "
            "or install matplotlib for PNG charts"
        ) from e

    import io  # pragma: no cover - needs matplotlib

    rows = rows[:max_rows]
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.bar([str(r[x]) for r in rows], [r[y] for r in rows])
    ax.set_title(title or f"{y} by {x}")
    ax.tick_params(axis="x", rotation=75)
    fig.tight_layout()
    buf = io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    return buf.getvalue()
