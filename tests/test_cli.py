"""End-to-end CLI smoke: datagen -> build -> query in fresh processes
(the CLI owns its own Ray sessions — must not touch the test session)."""

import json
import os
import subprocess
import sys


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = cwd
    r = subprocess.run([sys.executable, "-m",
                        "fashion_knowledge_graph_ray", *args],
                       capture_output=True, text=True, cwd=cwd,
                       timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_cli_datagen_build_query(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pages = str(tmp_path / "pages")
    kg = str(tmp_path / "kg")

    out = _run(["--num-cpus", "4", "datagen", "--pages", "500",
                "--out", pages], repo)
    assert out["pages"] == 500

    out = _run(["--num-cpus", "4", "build", "--pages", pages,
                "--out", kg], repo)
    assert os.path.isdir(os.path.join(kg, "edges"))
    assert os.path.isdir(os.path.join(kg, "nodes"))

    out = _run(["--num-cpus", "4", "query", "pagerank", "--kg", kg,
                "--top-k", "3"], repo)
    assert len(out) == 3
    assert all(r["entity_id"].startswith("prod-") for r in out)
    assert out[0]["rank"] >= out[1]["rank"] >= out[2]["rank"]

    # style-match-by-text over the persisted embeddings table
    out = _run(["--num-cpus", "4", "query", "outfit", "--kg", kg,
                "--text", "red silk dress", "--top-k", "3"], repo)
    assert 0 < len(out) <= 3
    assert all(r["entity_id"].startswith("prod-") for r in out)

    # the persisted ANN index artifact reconstructs the linker
    assert os.path.isdir(os.path.join(kg, "index"))
