"""Per-process scratch paths for sink round-trip queries.

The sink-exercising catalog queries (UNL round-trips, IVF index builds,
compaction/delete/upsert round-trips, resumable enrichment) delete and
rewrite their scratch directories on every run. With a FIXED path, two
concurrent sessions on one box — the verification driver's gate and a
bench run, or two pytest workers — race on the same directory and corrupt
each other's reads. The path is therefore salted with the process id (or
``PSPCZ_SCRATCH_SALT`` when a harness wants a stable location across its
own subprocesses), making concurrent gate runs collision-free while a
single process still reuses its own directories across queries.

Deterministic write-once derivations (``plans/documents._ensure_scratch``)
deliberately do NOT use this: they are immutable functions of the testdata
with a rename-race-safe build, and sharing them across processes is the
point (build once, read many).
"""

from __future__ import annotations

import os
import tempfile


def scratch_path(sf_dir: str, name: str) -> str:
    salt = os.environ.get("PSPCZ_SCRATCH_SALT") or str(os.getpid())
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(), f"pspcz_spark_{salt}_{tag}_{name}")
