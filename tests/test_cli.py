"""CLI over a fixture app module (reference: python/tests/cli/test_cli.py
— fixture apps driven through update/show/drop)."""

from __future__ import annotations

import json
import textwrap

from cocoindex_spark.cli import main


def _write_app(tmp_path, state_dir):
    app_py = tmp_path / "wordcount_app.py"
    app_py.write_text(
        textwrap.dedent(
            f"""
            APP_NAME = "wc"
            STATE_DIR = {str(state_dir)!r}

            from pyspark.sql import functions as F
            from cocoindex_spark.engine.function import fn

            @fn(memo=True)
            def count_words(df):
                return df.select(
                    "__args_fp", "__component_path", "path",
                    F.size(F.split(F.col("text"), " ")).alias("n_words"),
                )

            def app_main(app):
                src = app.spark.createDataFrame(
                    [("a.md", "x y z"), ("b.md", "p q")], "path STRING, text STRING"
                )
                target = app.target(
                    STATE_DIR + "/wc_out", ["path"], "path STRING, n_words INT"
                )
                return app.sync_table(src, ["path"], count_words, target)
            """
        )
    )
    return str(app_py)


def test_cli_update_show_drop(spark, tmp_path, capsys):
    state = tmp_path / "state"
    app_py = _write_app(tmp_path, state)

    assert main(["update", app_py]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["app"] == "wc" and out["stats"]["inserts"] == 2

    # warm re-run through the CLI: memoized, all-noop
    assert main(["update", app_py]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stats"]["memo_misses"] == 0 and out["stats"]["noops"] == 2

    assert main(["show", app_py]) == 0
    shown = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert shown["tracked_states"] == 2 and shown["memo_entries"] == 2
    assert shown["per_target"] == {"wc/wc_out": 2}

    assert main(["drop", app_py]) == 0
    capsys.readouterr()
    assert main(["show", app_py]) == 0
    shown = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert shown["tracked_states"] == 0 and shown["memo_entries"] == 0


def test_example_apps_incremental(tmp_state):
    """The shipped examples/ apps must run through the CLI and honor
    the incremental contract on a second update."""
    import json
    import os

    from cocoindex_spark import cli

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    app_path = os.path.join(repo, "examples", "dedup_curation_app.py")

    import contextlib
    import io

    def run(args):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main(args)
        assert rc == 0
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    cold = run(["update", app_path, "--state-dir", tmp_state])
    assert cold["stats"]["memo_misses"] > 0
    warm = run(["update", app_path, "--state-dir", tmp_state])
    assert warm["stats"]["memo_misses"] == 0
    assert warm["stats"]["noops"] == warm["stats"]["docs"]
    run(["drop", app_path, "--state-dir", tmp_state])


def test_text_embedding_example_incremental(tmp_state):
    """The quickstart example (the q137 pipeline — it imports
    queries.quickstart, so this also exercises the oracled flow) runs
    through the CLI, maintains the vector table, and is a no-op on the
    second update."""
    import contextlib
    import io
    import json
    import os

    from cocoindex_spark import cli

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    app_path = os.path.join(repo, "examples", "text_embedding_app.py")

    def run(args):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main(args)
        assert rc == 0
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    cold = run(["update", app_path, "--state-dir", tmp_state])
    assert cold["stats"]["memo_misses"] > 0
    assert cold["stats"]["chunks_tracked"] > 0
    assert cold["stats"]["top_hit_doc"] >= 0
    warm = run(["update", app_path, "--state-dir", tmp_state])
    assert warm["stats"]["memo_misses"] == 0
    assert warm["stats"]["chunks_tracked"] == cold["stats"]["chunks_tracked"]
    run(["drop", app_path, "--state-dir", tmp_state])


def test_code_embedding_example_incremental(tmp_state):
    """The code-embedding example (detect language → structure-exact
    chunks → embed → vector table) runs through the CLI and is a no-op
    on the second update."""
    import contextlib
    import io
    import json
    import os

    from cocoindex_spark import cli

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    app_path = os.path.join(repo, "examples", "code_embedding_app.py")

    def run(args):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main(args)
        assert rc == 0
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    cold = run(["update", app_path, "--state-dir", tmp_state])
    assert cold["stats"]["memo_misses"] > 0
    assert cold["stats"]["chunks_tracked"] > 0
    assert cold["stats"]["languages"] == "javascript,markdown,python,rust"
    warm = run(["update", app_path, "--state-dir", tmp_state])
    assert warm["stats"]["memo_misses"] == 0
    assert warm["stats"]["chunks_tracked"] == cold["stats"]["chunks_tracked"]
    run(["drop", app_path, "--state-dir", tmp_state])
