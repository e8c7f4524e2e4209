"""HTTP route factory mirroring the reference's API surface.

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

from pspcz_analyzer_spark.serving.service import QueryService


def create_app(service: QueryService):
    try:
        from fastapi import FastAPI, HTTPException
    except ImportError as e:  # pragma: no cover - depends on runtime extras
        raise ImportError(
            "fastapi is not installed; QueryService is usable directly, or "
            "install fastapi to serve HTTP"
        ) from e

    app = FastAPI(title="pspcz_analyzer_spark")

    @app.get("/api/attendance")
    def attendance(sort: str = "worst", top: int = 30, party: str | None = None):
        return service.attendance(sort=sort, top=top, party=party)

    @app.get("/api/loyalty")
    def loyalty(top: int = 30, party: str | None = None):
        return service.loyalty(top=top, party=party)

    @app.get("/api/similarity")
    def similarity(top: int = 20, cross_party_only: bool = True):
        return service.similarity(top=top, cross_party_only=cross_party_only)

    @app.get("/votes/{vote_id}")
    def vote_detail(vote_id: int):
        return service.vote_detail(vote_id)

    @app.get("/api/laws")
    def laws(
        status: str | None = None,
        priority: str | None = None,
        search: str | None = None,
        page: int = 1,
        per_page: int = 20,
    ):
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
        return service.amendments(search=search, page=page, per_page=per_page)

    @app.get("/api/amendment-coalitions")
    @app.get("/api/coalitions")
    def coalitions():
        return service.coalitions()

    @app.get("/charts/loyalty")
    def loyalty_chart(top: int = 20, party: str | None = None):
        from fastapi import Response

        body, mime = service.loyalty_chart(top=top, party=party)
        return Response(content=body, media_type=mime)

    @app.get("/charts/attendance")
    def attendance_chart(
        top: int = 20, sort: str = "worst", party: str | None = None
    ):
        from fastapi import Response

        body, mime = service.attendance_chart(top=top, sort=sort, party=party)
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
