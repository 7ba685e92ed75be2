"""CLI: run/inspect/drop apps — the reference's `cocoindex` CLI analog
(python/cocoindex/cli.py; tests python/tests/cli/test_cli.py over
fixture app files).

An app module is any Python file exposing ``app_main(app)`` and
``APP_NAME`` (optionally ``STATE_DIR``). The CLI mounts it exactly like
the reference mounts an app file:

    python -m cocoindex_spark.cli update path/to/app.py
    python -m cocoindex_spark.cli show  path/to/app.py
    python -m cocoindex_spark.cli drop  path/to/app.py
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys


def _load_app_module(path: str):
    spec = importlib.util.spec_from_file_location("__coco_app__", path)
    if spec is None or spec.loader is None:
        raise SystemExit(f"cannot import app module: {path}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for attr in ("APP_NAME", "app_main"):
        if not hasattr(mod, attr):
            raise SystemExit(f"app module must define {attr}: {path}")
    return mod


def _mk_app(mod, state_dir: str | None):
    from cocoindex_spark.engine.app import App
    from cocoindex_spark.session import get_spark

    state = state_dir or getattr(mod, "STATE_DIR", None) or os.path.join(
        os.path.dirname(os.path.abspath(mod.__file__ or ".")), ".coco_state"
    )
    spark = get_spark(f"cocoindex-cli-{mod.APP_NAME}")
    return App(mod.APP_NAME, state_dir=state, spark=spark)


def cmd_update(args) -> int:
    mod = _load_app_module(args.app)
    app = _mk_app(mod, args.state_dir)
    result = mod.app_main(app)
    stats = result if isinstance(result, dict) else getattr(result, "__dict__", {})
    print(json.dumps({"app": mod.APP_NAME, "stats": _plain(stats)}))
    return 0


def cmd_show(args) -> int:
    mod = _load_app_module(args.app)
    app = _mk_app(mod, args.state_dir)
    from pyspark.sql import functions as F

    tracking = app.state.tracking.read(app.spark)
    memo = app.state.memo.read(app.spark)
    per_target = {
        r["p"]: r["n"]
        for r in tracking.groupBy(
            F.substring_index("component_path", "/", 2).alias("p")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    print(
        json.dumps(
            {
                "app": mod.APP_NAME,
                "tracked_states": tracking.count(),
                "memo_entries": memo.count(),
                "per_target": per_target,
            }
        )
    )
    return 0


def cmd_drop(args) -> int:
    mod = _load_app_module(args.app)
    app = _mk_app(mod, args.state_dir)
    app.drop()
    print(json.dumps({"app": mod.APP_NAME, "dropped": True}))
    return 0


def _plain(d: dict) -> dict:
    return {k: v for k, v in d.items() if isinstance(v, (int, float, str, bool))}


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="cocoindex_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("update", cmd_update), ("show", cmd_show), ("drop", cmd_drop)):
        sp = sub.add_parser(name)
        sp.add_argument("app", help="path to app module (defines APP_NAME, app_main)")
        sp.add_argument("--state-dir", default=None)
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
