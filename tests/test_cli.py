"""CLI smoke tests: every subcommand drives end-to-end on a tiny corpus.

Mirrors how the reference exercises its clap CLIs; all five CLIs run
through main(argv) with real (small) images and real codecs.
"""

import csv
import json

import numpy as np
import pytest
from PIL import Image

from codec_eval_tpu.cli.codec_analyze import main as analyze_main
from codec_eval_tpu.cli.codec_compare import main as compare_main
from codec_eval_tpu.cli.codec_eval import main as eval_main
from codec_eval_tpu.cli.codec_iter import main as iter_main
from codec_eval_tpu.cli.rd_calibrate import main as rd_main


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(4)
    for i in range(2):
        y, x = np.mgrid[0:48, 0:48]
        base = 110 + 20 * i + 50 * np.sin(x / (5 + i)) + 40 * np.cos(y / 7)
        img = np.clip(
            np.stack([base, base * 0.9, base * 0.8], -1)
            + rng.normal(0, 6, (48, 48, 3)),
            0,
            255,
        ).astype(np.uint8)
        Image.fromarray(img).save(root / f"im{i}.png")
    return root


def test_codec_iter_eval(corpus, tmp_path):
    rc = iter_main(
        ["eval", "--corpus", str(corpus), "--limit", "2", "--preset", "quick",
         "--baseline-dir", str(tmp_path / "baselines")]
    )
    assert rc == 0
    assert (tmp_path / "baselines" / "jpeg-420-ycbcr-prog.json").exists()


def test_codec_iter_eval_device_sweep(corpus, tmp_path):
    from codec_eval_tpu.codecs.tpujpeg import is_available as _tpujpeg
    import json as _json
    import pytest as _pytest

    if not _tpujpeg():
        _pytest.skip("native JPEG entropy coder not built")
    rc = iter_main(
        ["eval", "--corpus", str(corpus), "--limit", "2", "--preset", "quick",
         "--format", "tpujpeg", "--device-sweep",
         "--baseline-dir", str(tmp_path / "baselines")]
    )
    assert rc == 0
    path = tmp_path / "baselines" / "tpujpeg-420-aq-device.json"
    assert path.exists()
    points = _json.loads(path.read_text())["points"]
    assert len(points) == 2 * 3  # 2 images x quick ladder
    assert all(p["size_bytes"] > 0 and 0 < p["ssim2"] <= 100 for p in points)
    # --device-sweep only makes sense for tpujpeg.
    assert iter_main(
        ["eval", "--corpus", str(corpus), "--format", "jpeg", "--device-sweep",
         "--baseline-dir", str(tmp_path / "b2")]
    ) == 2


def test_codec_eval_corpus_and_stats(corpus, tmp_path, capsys):
    assert eval_main(["corpus", "discover", str(corpus)]) == 0
    assert "2 images" in capsys.readouterr().out

    results = tmp_path / "r.csv"
    results.write_text(
        "image,codec,quality,bpp,ssimulacra2\n"
        "a,x,50,1.0,70\na,x,90,2.0,90\na,y,50,0.9,72\na,y,90,1.8,91\n"
    )
    assert eval_main(["pareto", str(results)]) == 0
    assert eval_main(["stats", str(results)]) == 0
    assert eval_main(["import", str(results), "--output",
                      str(tmp_path / "r.json")]) == 0
    assert json.loads((tmp_path / "r.json").read_text())[0]["codec"] == "x"


def test_codec_compare_run(corpus, tmp_path):
    out = tmp_path / "reports"
    rc = compare_main(
        ["run", str(corpus), "--formats", "jpeg", "--qualities", "60,90",
         "--fast-metrics", "--output", str(out), "--name", "smoke"]
    )
    assert rc == 0
    assert (out / "smoke.csv").exists()
    assert (out / "pareto.json").exists()
    with open(out / "smoke.csv") as f:
        rows = list(csv.reader(f))
    # 2 images x (4 jpeg + 5 tpujpeg variants) x 2 qualities + header.
    # (the jpeg format selection includes the zenjpeg slot, which tpujpeg
    # fills when the native entropy coder is present)
    from codec_eval_tpu.codecs.tpujpeg import TpuJpegCodec
    from codec_eval_tpu.codecs.tpujpeg import is_available as _tpujpeg

    n_codecs = 4 + (len(TpuJpegCodec.presets()) if _tpujpeg() else 0)
    assert len(rows) == 1 + 2 * n_codecs * 2


def test_codec_analyze_pipeline(corpus, tmp_path):
    fc = tmp_path / "fc.csv"
    rc = analyze_main(
        ["full-comparison", str(corpus), "--codec-a", "jpeg:420",
         "--codec-b", "jpeg:444", "--q-min", "50", "--q-max", "90",
         "--q-step", "20", "--output", str(fc)]
    )
    assert rc == 0
    heur = tmp_path / "h.csv"
    assert analyze_main(["heuristics", str(corpus), "--output", str(heur)]) == 0
    assert analyze_main(["find-outliers", str(fc)]) == 0
    assert analyze_main(["rd-compare", str(fc), "--targets", "1.0,2.0"]) == 0
    assert analyze_main(["build-predictor", str(fc), str(heur)]) == 0


def test_rd_calibrate(corpus, tmp_path):
    rc = rd_main(
        [str(corpus), "--range", "40:20:90", "--output", str(tmp_path / "cal")]
    )
    assert rc == 0
    assert (tmp_path / "cal" / "rd_curve.svg").exists()
    assert "RDCalibration" in (tmp_path / "cal" / "calibration.py").read_text()
