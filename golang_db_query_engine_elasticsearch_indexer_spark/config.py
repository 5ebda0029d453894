"""Runtime configuration: ``.env`` file + process environment.

Reference parity (api/controllers/base.go:25-35): the reference loads
endpoints and credentials from a ``.env`` file via godotenv, then reads
``os.Getenv`` at use sites (``ELASTICSEARCH_HOST``/``USERNAME``/
``PASSWORD``, elastic_controller.go:54-62). Same model here: a flat
KEY=VALUE file parsed at app construction, overlaid by the process
environment (process env wins, matching godotenv's no-override default).

Engine-specific keys (no reference equivalent — the Spark engine has
pluggable sinks and a source registry the Go service lacks):

- ``SPARK_GRAFT_SINK``: ``jsonl`` (default, offline), ``http`` (wire
  ``_bulk`` protocol via HttpBulkSink), or ``es`` (elasticsearch-spark
  connector).
- ``SPARK_GRAFT_INDEX_DIR``: JSONL sink root (default ``indexes``).
- ``SPARK_GRAFT_SOURCES``: extra registry sources as
  ``name=path`` pairs separated by ``;``, registered under the
  ``parquet`` driver alongside the fixture scale factors.
"""

from __future__ import annotations

import os


def load_dotenv(path: str = ".env") -> dict[str, str]:
    """Parse a ``.env`` file into a dict. Missing file -> empty dict.
    Lines are ``KEY=VALUE``; blank lines and ``#`` comments ignored;
    surrounding single/double quotes on values stripped."""
    out: dict[str, str] = {}
    if not os.path.isfile(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, value = line.partition("=")
            value = value.strip()
            if len(value) >= 2 and value[0] == value[-1] and value[0] in "'\"":
                value = value[1:-1]
            out[key.strip()] = value
    return out


def app_config(env: dict | None = None, dotenv_path: str = ".env") -> dict[str, str]:
    """Effective config: ``.env`` file overlaid by ``env`` (defaults to
    the process environment — process env wins, godotenv parity)."""
    cfg = load_dotenv(dotenv_path)
    cfg.update(env if env is not None else os.environ)
    return cfg
