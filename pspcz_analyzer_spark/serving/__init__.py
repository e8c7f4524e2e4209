"""Serving layer: TTL result cache + query service (+ optional HTTP app).

    cache    param-keyed TTL cache with prefix invalidation
    service  long-lived-session query facade returning row dicts
    app      FastAPI route factory (import-gated; fastapi is optional)
"""
