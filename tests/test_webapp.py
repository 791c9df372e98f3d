"""cag-vis contract tests: the server serves the exporter's JSON tree at the
URLs the web app builds (mirroring cag_vis/app.js buildUrl)."""

import json
import os
import subprocess
import sys
import time
import urllib.parse
import urllib.request


def fetch(url, timeout=5):
    """Browser-style fetch: percent-encode the path (the experiment folder
    names contain '[90, 0]' with spaces, which fetch() escapes natively)."""
    parts = urllib.parse.urlsplit(url)
    safe = parts._replace(path=urllib.parse.quote(parts.path))
    return urllib.request.urlopen(urllib.parse.urlunsplit(safe), timeout=timeout)

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def js_build_url(state):
    """Python mirror of cag_vis/app.js buildUrl (kept in sync by this test
    and the shared naming in evaluation/heatmap.py experiment_naming)."""
    experiment = state["background"]
    if state["background"] != "limited-sparse" and state["samplingStrategy"]:
        experiment += state["samplingStrategy"]
    if state["architecture"] != "4x128":
        experiment = f"architecture-{state['architecture']}"
    experiment += "-lca" if state["sparsity"] == "lca" else "-ct"
    n_angles = round(np.sqrt(state["sparseAngle"])) - 1
    exp_name = f"{state['limitedAngle']}-{n_angles}-{state['centerPoint']}"
    f = f"{state['metric']}-{state['direction']}-{state['firstAxis']}-{state['secondAxis']}.json"
    return f"{experiment}/{exp_name}/{f}"


def make_json_tree(root):
    """Produce a jsonData tree via the real exporter."""
    from nerf_for_angiography_tpu.evaluation import (
        experiment_naming,
        get_2d_heatmap,
        normalize_cam_poses,
    )

    n = 5
    th = np.repeat(np.linspace(0, 180, n), n)
    ph = np.tile(np.linspace(-90, 90, n), n)
    rng = np.random.RandomState(0)
    df = pd.DataFrame(
        {
            "theta": th, "phi": ph,
            "cam_pose_x": np.sin(np.deg2rad(th)) * np.cos(np.deg2rad(ph)),
            "cam_pose_y": np.sin(np.deg2rad(th)) * np.sin(np.deg2rad(ph)),
            "cam_pose_z": np.cos(np.deg2rad(th)),
            "PSNR": rng.rand(n * n) * 30,
            "pred_img": [rng.rand(16).tolist() for _ in range(n * n)],
            "org_img": [rng.rand(16).tolist() for _ in range(n * n)],
        }
    )
    normalize_cam_poses(df)
    page_data = {
        "Category": ["Background"],
        "Sampling": ["Frangi sampling", "AccNeRF"],
        "Model architecture": "4x128",
        "Sparse projections": 25,
        "Limited projections": 180,
        "Data": "CT",
    }
    experiment, exp_name = experiment_naming(page_data, (90, 0))
    folder = os.path.join(root, experiment, exp_name)
    os.makedirs(folder, exist_ok=True)
    get_2d_heatmap(
        df, root, folder, name="top", x_axis="X", y_axis="Z", metric="PSNR",
        vminmax=(15, 50), center_point=(90, 0), save_png=False,
    )
    return experiment, exp_name


def test_exporter_naming_matches_webapp_url(tmp_path):
    root = str(tmp_path)
    experiment, exp_name = make_json_tree(root)
    state = {
        "metric": "PSNR", "direction": "top", "centerPoint": "[90, 0]",
        "limitedAngle": 180, "sparseAngle": 25, "firstAxis": "X",
        "secondAxis": "Z", "sparsity": "ct", "background": "background",
        "samplingStrategy": "", "architecture": "4x128",
    }
    rel = js_build_url(state)
    assert os.path.exists(os.path.join(root, rel)), (
        rel, experiment, exp_name
    )


def test_server_serves_json_and_app(tmp_path):
    root = str(tmp_path)
    make_json_tree(root)
    port = 18231
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "cli", "serve.py"), root,
         "--port", str(port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        for _ in range(50):
            try:
                urllib.request.urlopen(f"http://127.0.0.1:{port}/app", timeout=1)
                break
            except Exception:
                time.sleep(0.2)
        # app shell
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/app/index.html", timeout=5
        ).read().decode()
        assert "cag-vis" in html
        js = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/app/heatmap.js", timeout=5
        ).read().decode()
        assert "buildRings" in js
        # data JSON at the app's URL
        state = {
            "metric": "PSNR", "direction": "top", "centerPoint": "[90, 0]",
            "limitedAngle": 180, "sparseAngle": 25, "firstAxis": "X",
            "secondAxis": "Z", "sparsity": "ct", "background": "background",
            "samplingStrategy": "", "architecture": "4x128",
        }
        url = f"http://127.0.0.1:{port}/" + js_build_url(state)
        data = json.loads(fetch(url).read())
        assert set(data.keys()) == {"rad", "theta", "angles", "vals"}
        # per-angle image JSON
        a0 = data["angles"][0]
        base = url.rsplit("/", 1)[0]
        per = json.loads(fetch(f"{base}/{a0[0]}{a0[1]}.json").read())
        assert set(per.keys()) == {"pred", "org", "diff"}
    finally:
        proc.terminate()
        proc.wait(timeout=10)
