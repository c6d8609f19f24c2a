"""Module-level ASGI entry point for containerized serving — the
mirror of the reference's ``api_app.py:1-2`` (``app =
create_app(delta_dir='/data')``), which is what its Dockerfile's
gunicorn CMD imports.

``gunicorn --worker-class uvicorn.workers.UvicornWorker
delta_lake_play_spark.serving.asgi:app`` builds the SparkSession and
the seeded names table at import time, exactly like the reference.
The table directory defaults to the reference's ``/data`` volume and
is overridable with ``DELTA_TABLE_DIR``.

Import requires fastapi (see ``app.py``'s gate) — in environments
without it, use ``serving.http_server`` (stdlib, same routes).
"""

from __future__ import annotations

import os

from delta_lake_play_spark.serving.app import _HAVE_FASTAPI, create_app

if not _HAVE_FASTAPI:  # gate BEFORE paying for a SparkSession
    raise ImportError(
        "fastapi is not installed; use "
        "delta_lake_play_spark.serving.http_server (stdlib, same "
        "routes + pydantic validation) or handlers.NamesTableService"
    )

from delta_lake_play_spark.session import get_spark  # noqa: E402

app = create_app(
    get_spark("delta_lake_play_spark-serving"),
    os.environ.get("DELTA_TABLE_DIR", "/data"),
)
