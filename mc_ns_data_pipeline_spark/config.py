"""Env-driven configuration layer — reference operational parity.

The reference centralizes deployment config in
`data_load_system/config/settings.py:1-34`: python-dotenv loads a
`.env` file, then module constants read `os.environ`
(OUTPUT_DATA_DIR, CHECKPOINT_FILE_PATH, BATCH_SIZE, DB_CONFIG JSON).
This module gives the Spark CLI the same 12-factor surface without a
third-party dependency:

* `load_env_file(path)` — minimal dotenv: `KEY=VALUE` lines, `#`
  comments, optional surrounding quotes; NEVER overrides variables
  already present in the process environment (dotenv semantics — the
  orchestrator's real env wins over the checked-in file).
* `env_config(env)` — the typed view of the recognized variables.

Precedence (highest wins): explicit CLI flag > process env > .env file
> built-in default. The CLI declares env-backed flags with
`default=None` and resolves through `resolve()` after parsing, so
`--batch-size 8` beats `BATCH_SIZE=4` beats the default.

Recognized variables (names mirror settings.py where a counterpart
exists):

  OUTPUT_DATA_DIR       fetch --out-dir / load --input-dir default
  CHECKPOINT_FILE_PATH  state checkpoint path; its parent directory is
                        the --state-dir default (the reference points
                        at the file, our state layout owns the dir)
  STATE_DIR             explicit --state-dir (wins over the derived one)
  BATCH_SIZE            --batch-size (pages per executor task)
  N_PAGES               --n-pages
  CAPTURES_FETCHER, META_FETCHER, STRUCTURES_FETCHER
                        transport injection (module.path:function)
  SORT_COLUMN, SORT_DIRECTION
                        O3 server-side sort pushdown for the fetch
  TRANSPORT             'requests' (production HTTP client from
                        BASE_URL/API_TOKEN/API_COOKIE — reference
                        api_client.py) or 'injected' (default)
  WAREHOUSE_DIR         load --warehouse-dir
  REPORT_DIR            load --report-dir
  DB_CONFIG             JSON dict of JDBC properties (url/user/password
                        /driver), the reference's warehouse credentials
                        blob — surfaced via `jdbc_properties()`
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path


def load_env_file(path: str | os.PathLike,
                  env: dict[str, str] | None = None) -> dict[str, str]:
    """Load KEY=VALUE pairs from a dotenv file into `env` (defaults to
    os.environ). Existing keys are NOT overridden. Returns the keys
    actually set. Missing file is a no-op (deployments without a .env
    run purely on real env)."""
    target = os.environ if env is None else env
    p = Path(path)
    if not p.exists():
        return {}
    applied: dict[str, str] = {}
    for raw in p.read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, value = line.partition("=")
        key = key.strip()
        value = value.strip()
        if len(value) >= 2 and value[0] == value[-1] and value[0] in "\"'":
            value = value[1:-1]
        if key and key not in target:
            target[key] = value
            applied[key] = value
    return applied


@dataclass(frozen=True)
class EnvConfig:
    out_dir: str | None
    state_dir: str | None
    batch_size: int | None
    n_pages: int | None
    captures_fetcher: str | None
    meta_fetcher: str | None
    structures_fetcher: str | None
    warehouse_dir: str | None
    report_dir: str | None
    db_config: dict | None
    sort_column: str | None
    sort_direction: str | None
    transport: str | None


def env_config(env: dict[str, str] | None = None) -> EnvConfig:
    """Typed view of the recognized environment variables."""
    e = os.environ if env is None else env

    def _int(name: str) -> int | None:
        v = e.get(name)
        return int(v) if v is not None and v != "" else None

    state_dir = e.get("STATE_DIR")
    if state_dir is None and e.get("CHECKPOINT_FILE_PATH"):
        state_dir = str(Path(e["CHECKPOINT_FILE_PATH"]).parent)
    db_config = None
    if e.get("DB_CONFIG"):
        db_config = json.loads(e["DB_CONFIG"])
    return EnvConfig(
        out_dir=e.get("OUTPUT_DATA_DIR"),
        state_dir=state_dir,
        batch_size=_int("BATCH_SIZE"),
        n_pages=_int("N_PAGES"),
        captures_fetcher=e.get("CAPTURES_FETCHER"),
        meta_fetcher=e.get("META_FETCHER"),
        structures_fetcher=e.get("STRUCTURES_FETCHER"),
        warehouse_dir=e.get("WAREHOUSE_DIR"),
        report_dir=e.get("REPORT_DIR"),
        db_config=db_config,
        sort_column=e.get("SORT_COLUMN"),
        sort_direction=e.get("SORT_DIRECTION"),
        transport=e.get("TRANSPORT"),
    )


def resolve(flag_value, env_value, default=None, *, name: str = "",
            required: bool = False):
    """Flag > env > default; raise when required and nothing supplies
    a value (the error names both the flag and the env var)."""
    if flag_value is not None:
        return flag_value
    if env_value is not None:
        return env_value
    if required and default is None:
        raise SystemExit(
            f"missing required setting {name}: pass the flag or set the "
            "environment variable"
        )
    return default


def jdbc_properties(cfg: EnvConfig) -> dict[str, str] | None:
    """DB_CONFIG JSON -> JDBC option map for sources/sinks.jdbc
    (reference settings.py DB_CONFIG -> psycopg2 kwargs)."""
    if cfg.db_config is None:
        return None
    return {str(k): str(v) for k, v in cfg.db_config.items()}
