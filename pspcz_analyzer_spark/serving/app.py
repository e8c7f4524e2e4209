"""HTTP route factory mirroring the reference's API surface.

GET /api/votes?search=&outcome=&topic=&page=&per_page=
                                        (votes_service.py:160-230 list_votes
                                         via routes/pages.py:38-78)
GET /health                             (routes/health.py:16-21, widened
                                         with freshness/manifest inventory)
GET /api/attendance?sort=&top=&party=   (routes/voting.py:49-70)
GET /api/loyalty?top=&party=            (routes/voting.py:23-45)
GET /api/amendments?search=&page=       (routes/amendments.py:21-47)
GET /api/amendment-coalitions           (routes/amendments.py:50-69; also
                                         aliased as /api/coalitions)
GET /api/query/{name}                   (generic catalog endpoint)
GET /charts/{loyalty,attendance,similarity}  (routes/charts.py:39-193;
                                         PNG with matplotlib, SVG without)

FastAPI is optional (not present in every runtime); ``create_app`` raises a
clear error when it is missing, and everything above the HTTP edge —
params, cache, compute — lives in QueryService and is fully tested without
it (tests/test_serving.py).
"""

from __future__ import annotations

from pspcz_analyzer_spark.serving.service import QueryService, QueryTimeoutError

# Endpoint-class rate limits (requests/minute) — the reference's slowapi
# decorators (routes/voting.py:24 60/min analysis, routes/charts.py 30/min,
# browse endpoints 120/min; BASELINE.md envelope).
RATE_LIMITS = {"analysis": 60, "browse": 120, "charts": 30}
_BROWSE_PREFIXES = (
    "/api/laws",
    "/api/amendments",
    "/api/query",
    "/api/votes",
    "/votes",
    "/health",  # reference health.py: 120/minute — the browse class
)


def classify_endpoint(path: str) -> str:
    """Map a request path to its rate-limit class."""
    if path.startswith("/charts"):
        return "charts"
    if path.startswith(_BROWSE_PREFIXES):
        return "browse"
    return "analysis"


def create_app(service: QueryService):
    try:
        from fastapi import FastAPI, HTTPException, Request
        from fastapi.responses import JSONResponse
    except ImportError as e:  # pragma: no cover - depends on runtime extras
        raise ImportError(
            "fastapi is not installed; QueryService is usable directly, or "
            "install fastapi to serve HTTP"
        ) from e

    from pspcz_analyzer_spark.serving.rate_limit import RateLimiter

    app = FastAPI(title="pspcz_analyzer_spark")

    def clamp(name: str, value: int, lo: int, hi: int) -> int:
        # The reference bounds every listing/chart size server-side
        # (Query(ge=, le=) at routes/charts.py:44); an unbounded top or
        # per_page would collect an arbitrarily large result driver-side.
        if not (lo <= value <= hi):
            raise HTTPException(
                status_code=422, detail=f"{name} must be in [{lo}, {hi}]"
            )
        return value

    limiters = {
        cls: RateLimiter(limit, per_seconds=60.0)
        for cls, limit in RATE_LIMITS.items()
    }

    @app.middleware("http")
    async def rate_limit(request: Request, call_next):
        cls = classify_endpoint(request.url.path)
        client = request.client.host if request.client else "anon"
        if not limiters[cls].allow(f"{cls}:{client}"):
            return JSONResponse(
                status_code=429, content={"detail": f"rate limit: {cls}"}
            )
        return await call_next(request)

    @app.exception_handler(QueryTimeoutError)
    async def timeout_503(request: Request, exc: QueryTimeoutError):
        # The reference's analysis-timeout contract: budget blown -> 503
        # (routes/voting.py:39,64), session stays healthy for the next call.
        return JSONResponse(status_code=503, content={"detail": str(exc)})

    @app.get("/api/attendance")
    def attendance(sort: str = "worst", top: int = 30, party: str | None = None):
        return service.attendance(sort=sort, top=clamp("top", top, 1, 500), party=party)

    @app.get("/api/loyalty")
    def loyalty(top: int = 30, party: str | None = None):
        return service.loyalty(top=clamp("top", top, 1, 500), party=party)

    @app.get("/api/similarity")
    def similarity(top: int = 20, cross_party_only: bool = True):
        return service.similarity(
            top=clamp("top", top, 1, 500), cross_party_only=cross_party_only
        )

    @app.get("/api/votes")
    def votes(
        search: str = "",
        outcome: str = "",
        topic: str = "",
        page: int = 1,
        per_page: int = 30,
    ):
        # The reference's most-used page (votes_service.py:160-230 via
        # routes/pages.py): search + outcome + topic filters, paged.
        if len(search) > 200 or len(topic) > 100:
            raise HTTPException(status_code=422, detail="bad votes params")
        clamp("page", page, 1, 100000)
        clamp("per_page", per_page, 1, 200)
        return service.votes(
            search=search,
            outcome=outcome,
            topic=topic,
            page=page,
            per_page=per_page,
        )

    @app.get("/votes/{vote_id}")
    def vote_detail(vote_id: int):
        return service.vote_detail(vote_id)

    @app.get("/health")
    def health():
        # First thing an operator curls (reference routes/health.py).
        return service.health()

    @app.get("/api/lake/{name}")
    def lake_detail(name: str):
        # DESCRIBE DETAIL for a discovered manifest table — name-resolved
        # (never a caller path), metadata-only.
        try:
            return service.lake_detail(name)
        except KeyError:
            from fastapi import HTTPException

            raise HTTPException(404, f"no manifest table named {name!r}")

    @app.get("/api/lake/{name}/estimate")
    def lake_estimate(
        name: str,
        col: "str | None" = None,
        lo: "str | None" = None,
        hi: "str | None" = None,
        value: "str | None" = None,
    ):
        # Scan-size preview (manifest.scan_estimate): files/rows/bytes a
        # predicate would read + broadcast qualification — metadata-only,
        # answers even while the cluster is saturated.
        try:
            return service.lake_estimate(name, col=col, lo=lo, hi=hi, value=value)
        except KeyError:
            from fastapi import HTTPException

            raise HTTPException(404, f"no manifest table named {name!r}")
        except ValueError as e:
            from fastapi import HTTPException

            raise HTTPException(400, str(e))

    @app.get("/api/lake/{left}/join/{right}")
    def lake_join_plan(
        left: str,
        right: str,
        how: str = "inner",
        lcol: "str | None" = None,
        llo: "str | None" = None,
        lhi: "str | None" = None,
        lvalue: "str | None" = None,
        rcol: "str | None" = None,
        rlo: "str | None" = None,
        rhi: "str | None" = None,
        rvalue: "str | None" = None,
    ):
        # Broadcast-vs-shuffle preview (manifest.join_strategy over two
        # post-pruning scan_estimates) — metadata-only.
        try:
            return service.lake_join_plan(
                left, right, how=how,
                lcol=lcol, llo=llo, lhi=lhi, lvalue=lvalue,
                rcol=rcol, rlo=rlo, rhi=rhi, rvalue=rvalue,
            )
        except KeyError as e:
            from fastapi import HTTPException

            raise HTTPException(404, f"no manifest table named {e.args[0]!r}")
        except ValueError as e:
            from fastapi import HTTPException

            raise HTTPException(400, str(e))

    @app.get("/api/laws")
    def laws(
        status: str | None = None,
        priority: str | None = None,
        search: str | None = None,
        page: int = 1,
        per_page: int = 20,
    ):
        clamp("page", page, 1, 100000)
        clamp("per_page", per_page, 1, 200)
        return service.laws(
            status=status,
            priorities=[priority] if priority else None,
            search=search,
            page=page,
            per_page=per_page,
        )

    @app.get("/api/amendments")
    def amendments(search: str = "", page: int = 1, per_page: int = 20):
        if not (1 <= page <= 1000) or len(search) > 200:
            raise HTTPException(status_code=422, detail="bad amendments params")
        clamp("per_page", per_page, 1, 200)
        return service.amendments(search=search, page=page, per_page=per_page)

    @app.get("/api/amendment-coalitions")
    @app.get("/api/coalitions")
    def coalitions():
        return service.coalitions()

    @app.get("/charts/loyalty")
    def loyalty_chart(top: int = 20, party: str | None = None):
        from fastapi import Response

        body, mime = service.loyalty_chart(top=clamp("top", top, 1, 200), party=party)
        return Response(content=body, media_type=mime)

    @app.get("/charts/attendance")
    def attendance_chart(
        top: int = 20, sort: str = "worst", party: str | None = None
    ):
        from fastapi import Response

        body, mime = service.attendance_chart(
            top=clamp("top", top, 1, 200), sort=sort, party=party
        )
        return Response(content=body, media_type=mime)

    @app.get("/charts/similarity")
    def similarity_chart():
        from fastapi import Response

        body, mime = service.similarity_chart()
        return Response(content=body, media_type=mime)

    @app.get("/api/query/{name}")
    def query(name: str):
        try:
            return service.query(name)
        except KeyError:
            raise HTTPException(status_code=404, detail=f"unknown query: {name}")

    @app.post("/api/invalidate")
    def invalidate(prefix: str = ""):
        return {"dropped": service.invalidate(prefix)}

    return app
