"""Chart sink (SURVEY S14): the dependency-free SVG renderer and the
service-level chart endpoints mirroring routes/charts.py:39-193.

The SVG output is deterministic string assembly, so tests parse the XML
and count marks (bars / points / legend swatches) instead of comparing
pixels."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

from pspcz_analyzer_spark.serving.charts import (
    _coolwarm,
    _nice_ticks,
    render_barh_svg,
    render_chart,
    render_scatter_svg,
)
from pspcz_analyzer_spark.serving.service import QueryService

SF_DIR = "/root/testdata/sf0.001"
SVG_NS = "{http://www.w3.org/2000/svg}"


def _marks(svg: bytes, tag: str, cls: str) -> list:
    root = ET.fromstring(svg)
    return [e for e in root.iter(f"{SVG_NS}{tag}") if e.get("class") == cls]


class TestSvgRenderers:
    ROWS = [
        {"mp": "Novák (ANO)", "pct": 12.5},
        {"mp": "Dvořák & syn <spol>", "pct": 7.0},
        {"mp": "Svobodová (ODS)", "pct": 0.0},
    ]

    def test_barh_one_bar_per_row_and_escaping(self):
        svg = render_barh_svg(self.ROWS, "mp", "pct", title="Rebellion < 100%")
        bars = _marks(svg, "rect", "bar")
        assert len(bars) == 3
        # Widths proportional to values: 12.5 > 7.0 > 0.0
        widths = [float(b.get("width")) for b in bars]
        assert widths[0] > widths[1] > widths[2] == 0.0
        # Raw & / < never leak into the XML (parse above would also fail).
        assert b"Dvo\xc5\x99\xc3\xa1k &amp; syn &lt;spol&gt;" in svg

    def test_barh_caps_rows(self):
        rows = [{"k": str(i), "v": i} for i in range(80)]
        svg = render_barh_svg(rows, "k", "v", max_rows=50)
        assert len(_marks(svg, "rect", "bar")) == 50

    def test_scatter_points_and_legend(self):
        rows = [
            {"x": -1.0, "y": 0.5, "party": "ANO", "mp": "A"},
            {"x": 2.0, "y": -0.5, "party": "ODS", "mp": "B"},
            {"x": 0.0, "y": 0.0, "party": "ANO", "mp": "C"},
        ]
        svg = render_scatter_svg(
            rows, "x", "y", group="party", point_label="mp", title="PCA"
        )
        pts = _marks(svg, "circle", "pt")
        assert len(pts) == 3
        # Same party -> same fill; different party -> different fill.
        fills = [p.get("fill") for p in pts]
        assert fills[0] == fills[2] != fills[1]
        # Legend carries one swatch per distinct group (class-less circles).
        root = ET.fromstring(svg)
        all_circles = list(root.iter(f"{SVG_NS}circle"))
        assert len(all_circles) == 3 + 2

    def test_scatter_coordinates_monotonic(self):
        rows = [{"x": 0.0, "y": 0.0}, {"x": 10.0, "y": 10.0}]
        svg = render_scatter_svg(rows, "x", "y")
        pts = _marks(svg, "circle", "pt")
        (cx0, cy0), (cx1, cy1) = [
            (float(p.get("cx")), float(p.get("cy"))) for p in pts
        ]
        assert cx1 > cx0  # larger x -> further right
        assert cy1 < cy0  # larger y -> further up (SVG y grows downward)

    def test_nice_ticks_cover_range(self):
        ticks = _nice_ticks(0.0, 87.3)
        assert ticks[0] <= 0.0 and ticks[-1] >= 87.3
        assert len(ticks) >= 3
        steps = {round(b - a, 9) for a, b in zip(ticks, ticks[1:])}
        assert len(steps) == 1  # uniform spacing

    def test_coolwarm_endpoints(self):
        assert _coolwarm(0.0) == "#3b4cc0"
        assert _coolwarm(1.0) == "#b40426"

    def test_render_chart_unknown_kind(self):
        with pytest.raises(ValueError, match="unknown chart kind"):
            render_chart([], "pie")


class TestServiceCharts:
    @pytest.fixture()
    def svc(self, spark):
        return QueryService(spark, SF_DIR, ttl_seconds=3600)

    def test_loyalty_chart_renders_cached_rows(self, svc):
        body, mime = svc.loyalty_chart(top=10)
        assert mime in ("image/svg+xml", "image/png")
        if mime == "image/svg+xml":
            assert len(_marks(body, "rect", "bar")) == 10
        # The chart consumed the same cached result the JSON endpoint serves.
        calls = svc.compute_calls
        svc.loyalty(top=10)
        assert svc.compute_calls == calls

    def test_attendance_chart_sort_param(self, svc):
        body, mime = svc.attendance_chart(top=5, sort="best")
        if mime == "image/svg+xml":
            assert len(_marks(body, "rect", "bar")) == 5

    def test_similarity_chart_one_point_per_mp(self, svc):
        body, mime = svc.similarity_chart()
        rows = svc.cache.get_or_compute(
            f"pca_chart:{SF_DIR}", lambda: pytest.fail("should be cached")
        )
        if mime == "image/svg+xml":
            assert len(_marks(body, "circle", "pt")) == len(rows) > 0
        # Re-render hits the cache: no extra compute.
        calls = svc.compute_calls
        svc.similarity_chart()
        assert svc.compute_calls == calls
