"""CLI-surface tests for ClipToolkit and evaluate (run in-process so the
CPU-forced jax config from conftest applies)."""

import json
import os
import sys

import numpy as np
import pytest

from metdetpy_tpu.synth import SynthMeteor, generate_meteor_video, write_video

W, H, FPS = 192, 108, 25.0
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth_mp4(tmp_path_factory):
    path = tmp_path_factory.mktemp("vid") / "synth.mp4"
    m = SynthMeteor(start_sec=1.0, end_sec=2.0,
                    pt1=(int(W * .7), int(H * .2)),
                    pt2=(int(W * .3), int(H * .7)))
    frames = generate_meteor_video(width=W, height=H, fps=FPS,
                                   duration_sec=3.0, meteors=[m],
                                   n_stars=25, color=True)
    write_video(frames, str(path), fps=FPS)
    return str(path)


def _run_cli(module_main, argv):
    old = sys.argv
    sys.argv = argv
    try:
        module_main()
    finally:
        sys.argv = old


def test_cliptoolkit_image_stack(synth_mp4, tmp_path):
    from ClipToolkit import main
    out = tmp_path / "stack.jpg"
    _run_cli(main, ["ClipToolkit.py", synth_mp4,
                    "--start-time", "00:00:01.00",
                    "--end-time", "00:00:02.00",
                    "--mode", "image", "--save-path", str(out)])
    assert out.exists() and out.stat().st_size > 1000
    import cv2
    img = cv2.imread(str(out))
    assert img.shape[:2] == (H, W)
    # the meteor trail must be visible in the max-stack: bright pixels along
    # the trajectory mid-point
    my, mx = int(H * .45), int(W * .5)
    assert img[my - 8:my + 8, mx - 12:mx + 12].max() > 120


def test_cliptoolkit_video_clip(synth_mp4, tmp_path):
    from ClipToolkit import main
    out = tmp_path / "clip.avi"
    _run_cli(main, ["ClipToolkit.py", synth_mp4,
                    "--start-time", "00:00:00.50",
                    "--end-time", "00:00:02.00",
                    "--mode", "video", "--save-path", str(out)])
    assert out.exists() and out.stat().st_size > 1000
    import cv2
    cap = cv2.VideoCapture(str(out))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert 30 <= n <= 45  # ~1.5s at 25fps


def test_cliptoolkit_json_requests_with_bbox(synth_mp4, tmp_path):
    from ClipToolkit import main
    req = [{"time": ["00:00:01.00", "00:00:02.00"],
            "filename": "annotated.jpg",
            "target": [{"pt1": [int(W * .3), int(H * .2)],
                        "pt2": [int(W * .7), int(H * .7)],
                        "preds": "METEOR", "prob": "0.95"}]}]
    req_path = tmp_path / "req.json"
    req_path.write_text(json.dumps(req))
    _run_cli(main, ["ClipToolkit.py", synth_mp4, str(req_path),
                    "--save-path", str(tmp_path), "--with-bbox",
                    "--with-annotation"])
    assert (tmp_path / "annotated.jpg").exists()
    anno = json.loads((tmp_path / "annotated.json").read_text())
    assert anno["shapes"][0]["label"] == "METEOR"


def test_cliptoolkit_denoise_stack(synth_mp4, tmp_path):
    from ClipToolkit import main
    out = tmp_path / "denoised.png"
    _run_cli(main, ["ClipToolkit.py", synth_mp4,
                    "--start-time", "00:00:01.00",
                    "--end-time", "00:00:02.00",
                    "--mode", "image", "--denoise", "mfnr-mix",
                    "--save-path", str(out)])
    assert out.exists() and out.stat().st_size > 1000


def test_evaluate_metric_self_comparison(synth_mp4, tmp_path, capsys):
    """Run detection via evaluate, then compare the result against itself:
    cross ratio must be 1.0 (every record matches)."""
    import evaluate as ev
    from metdetpy_tpu.api import detect_video
    from metdetpy_tpu.structs import MainDetectCfg
    from metdetpy_tpu.utils import relative2abs_path

    os.environ.setdefault("METDETPY_TPU_MAX_POINTS", "2048")
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.resize = None
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False
    mdrf = detect_video(synth_mp4, None, cfg, work_mode="backend")
    assert len(mdrf.results) >= 1
    result_path = tmp_path / "run.json"
    result_path.write_text(json.dumps(mdrf.to_dict()))

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        _run_cli(ev.main, ["evaluate.py", str(result_path),
                           "--load", str(result_path), "--metric"])
    finally:
        os.chdir(cwd)
    out = capsys.readouterr().out
    assert "'cross_ratio(A n B / A u B)': 1.0" in out
    assert (tmp_path / "mismatch.json").exists()


def test_cliptoolkit_mdrf_input(synth_mp4, tmp_path):
    """Feed a detection-result MDRF json as the only input (input style 3:
    reference ClipToolkit.py:181-219)."""
    from ClipToolkit import main
    from metdetpy_tpu.api import detect_video
    from metdetpy_tpu.structs import MainDetectCfg
    from metdetpy_tpu.utils import relative2abs_path
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.resize = None
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False
    mdrf = detect_video(synth_mp4, None, cfg, work_mode="backend")
    assert len(mdrf.results) >= 1
    result_path = tmp_path / "run.json"
    result_path.write_text(json.dumps(mdrf.to_dict()))
    outdir = tmp_path / "clips"
    _run_cli(main, ["ClipToolkit.py", str(result_path), "--mode", "image",
                    "--save-path", str(outdir)])
    produced = list(outdir.glob("*.jpg"))
    assert len(produced) >= 1


def test_evaluate_run_path_with_performance(synth_mp4, tmp_path):
    """evaluate.py without --load runs detection under the psutil sampler
    and saves an MDRF with the performance block."""
    import evaluate as ev
    from metdetpy_tpu.utils import frame2ts
    anno = {
        "version": "anno",
        "basic_info": {
            "loader": "none", "video": synth_mp4, "mask": None,
            "start_time": 0, "end_time": 3000, "resolution": [W, H],
            "runtime_resolution": [W, H], "exp_time": 1 / FPS,
            "total_frames": 75, "fps": FPS,
        },
        "config": None, "type": "annotation", "anno_size": [W, H],
        "results": [],
    }
    anno_path = tmp_path / "anno.json"
    anno_path.write_text(json.dumps(anno))
    cfg_path = tmp_path / "cfg.json"
    from metdetpy_tpu.structs import MainDetectCfg
    from metdetpy_tpu.utils import relative2abs_path
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.resize = None
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False
    cfg_path.write_text(json.dumps(cfg.to_dict()))
    out = tmp_path / "result.json"
    _run_cli(ev.main, ["evaluate.py", str(anno_path), "--cfg", str(cfg_path),
                       "-S", str(out)])
    data = json.loads(out.read_text())
    assert "performance" in data and data["performance"]["tot_time"] > 0
    assert "cpu_core" in data["performance"]


def test_zipapp_freeze_builds_and_runs(tmp_path):
    """make_package_zipapp (the pyinstaller-onefile analog, reference
    make_package_pyinstaller.py role) must produce a runnable single-file
    tool."""
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, "make_package_zipapp.py", "--out", str(tmp_path),
         "--tools", "evaluate.py"],
        capture_output=True, text=True, cwd=REPO_ROOT, timeout=300)
    assert out.returncode == 0, out.stderr[-500:]
    pyz = tmp_path / "evaluate.pyz"
    assert pyz.exists()
    res = subprocess.run([sys.executable, str(pyz), "--help"],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-500:]
    assert "MetDetPy-TPU" in res.stdout
