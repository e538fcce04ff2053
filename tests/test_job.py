"""End-to-end job entry: config round-trip, dry-run, full run + resume."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_config_roundtrip(tmp_path):
    from gjspark.plans.job import load_config, save_config

    cfg = {"images": "/a/b.parquet", "features": "/c", "n-parts": 8}
    p = str(tmp_path / "cfg.json")
    save_config(cfg, p)
    assert load_config(p) == cfg


def test_text_source(spark, tmp_path):
    from gjspark.sources.text import read_text_source

    f = tmp_path / "doc.txt"
    f.write_text("hello wörld")
    rows = read_text_source(spark, f"file://{f}").collect()
    assert rows[0]["text"] == "hello wörld"
    with pytest.raises(NotImplementedError):
        read_text_source(spark, "https://example.com/x")


@pytest.mark.slow
def test_job_cli_end_to_end(fixtures_dir, tmp_path):
    out = str(tmp_path / "out")
    cfg = {
        "images": f"{fixtures_dir}/images_sf_unit.parquet",
        "features": f"{fixtures_dir}/features_nuts.geojson",
        "out": out,
        "master": "local[4]",
        "n-parts": 8,
    }
    cfg_path = str(tmp_path / "job.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "gjspark.plans.job", "--config", cfg_path],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads([ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert summary["knn_rows"] == 1000
    assert summary["pip_rows"] > 0
    assert os.path.exists(f"{out}/knn/_SUCCESS.json")
    manifest = pq.read_table(f"{out}/knn/_manifest.parquet").to_pandas()
    assert (manifest["status"] == "ok").all()

    # resume run: nothing to redo, same totals
    r2 = subprocess.run(
        [sys.executable, "-m", "gjspark.plans.job", "--config", cfg_path, "--resume"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads([ln for ln in r2.stdout.splitlines() if ln.startswith("{")][-1])
    assert s2["knn_rows"] == summary["knn_rows"]
    assert s2["pip_rows"] == summary["pip_rows"]
