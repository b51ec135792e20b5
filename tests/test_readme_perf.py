"""README perf numbers must be byte-identical to the checked-in artifact.

VERDICT r3 next-step #2: every performance number in README.md lives in a
marker-delimited block rendered from BENCH_extra.json by
tools/render_readme_perf.py; this test re-renders and fails on any drift.
"""

import importlib.util
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_renderer():
    path = os.path.join(ROOT, "tools", "render_readme_perf.py")
    spec = importlib.util.spec_from_file_location("render_readme_perf", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(
    not os.path.isfile(
        os.path.join(ROOT, "tools", "readme_bench_snapshot.json")
    ),
    reason="no generation snapshot checked in",
)
def test_readme_perf_blocks_match_artifact():
    # checked against the generation-time snapshot, not BENCH_extra.json:
    # the latter is rewritten by every full bench run (timings drift), while
    # README + snapshot move together in one commit.
    mod = _load_renderer()
    with open(mod.SNAPSHOT) as f:
        import json

        bench = json.load(f)
    with open(mod.README) as f:
        text = f.read()
    assert mod.render(text, bench) == text, (
        "README.md perf blocks are stale — run "
        "`python tools/render_readme_perf.py`"
    )
