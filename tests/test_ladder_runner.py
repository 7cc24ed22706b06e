"""Sharded tpujpeg ladder runner (parallel/ladder_runner.py) and the
device-resident rd-calibrate path built on it.  Runs on the conftest's
virtual 8-device CPU mesh, like the other SPMD tests."""

import numpy as np
import pytest

from codec_eval_tpu.codecs.tpujpeg import is_available

pytestmark = pytest.mark.skipif(
    not is_available(), reason="native JPEG entropy coder not built"
)


def _photo(seed, h=64, w=64):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = 120 + 70 * np.sin(x / 17.0 + seed) + 40 * np.cos(y / 11.0)
    img = np.stack([base, base * 0.9 + 10, base * 0.8 + 20], -1)
    return np.clip(img + rng.normal(0, 6, (h, w, 3)), 0, 255).astype(np.uint8)


def test_sharded_ladders_match_single_image_path():
    from codec_eval_tpu.engine.tpu_sweep import evaluate_tpujpeg_sweep
    from codec_eval_tpu.parallel.ladder_runner import sweep_corpus_ladders
    from codec_eval_tpu.parallel.mesh import make_mesh

    images = [_photo(i) for i in range(5)]  # odd count exercises padding
    qualities = [50.0, 85.0]
    mesh = make_mesh(n_space=1)
    res = sweep_corpus_ladders(images, qualities, mesh=mesh)
    assert res.scores["ssimulacra2"].shape == (5, 2)
    assert (res.sizes > 0).all()
    # Higher quality -> better scores, bigger files, for every image.
    assert (res.scores["ssimulacra2"][:, 1] > res.scores["ssimulacra2"][:, 0]).all()
    assert (res.sizes[:, 1] > res.sizes[:, 0]).all()
    # Bit-identical sizes and matching scores vs the single-image engine path.
    pts = evaluate_tpujpeg_sweep(images[2], qualities)
    assert pts[0].file_size == res.sizes[2, 0]
    assert abs(pts[1].metrics["butteraugli"] - res.scores["butteraugli"][2, 1]) < 1e-3
    # Mean curve is monotone in bpp.
    curve = res.mean_curve("ssimulacra2")
    assert curve[0][0] < curve[1][0] and curve[0][1] < curve[1][1]


def test_sharded_ladders_scores_only():
    """with_sizes=False: no coefficient outputs cross the shard boundary
    and no entropy pass runs; size accessors guard cleanly."""
    from codec_eval_tpu.parallel.ladder_runner import sweep_corpus_ladders

    res = sweep_corpus_ladders(
        [_photo(i) for i in range(3)], [50.0, 90.0],
        with_sizes=False, metrics=("ssimulacra2",),
    )
    assert res.scores["ssimulacra2"].shape == (3, 2)
    assert res.sizes is None and res.bits_per_pixel is None
    with pytest.raises(ValueError):
        res.mean_curve("ssimulacra2")


def test_sharded_ladders_device_sizes():
    """with_sizes='device': no coefficient planes leave the device; sizes
    come from on-shard rate statistics and track the exact host entropy
    coder within the documented stuffing-estimate tolerance."""
    from codec_eval_tpu.parallel.ladder_runner import sweep_corpus_ladders

    images = [_photo(i) for i in range(3)]
    qualities = [50.0, 85.0]
    exact = sweep_corpus_ladders(
        images, qualities, with_sizes=True, metrics=("psnr",)
    )
    dev = sweep_corpus_ladders(
        images, qualities, with_sizes="device", metrics=("psnr",)
    )
    np.testing.assert_allclose(
        dev.scores["psnr"], exact.scores["psnr"], rtol=1e-6
    )
    assert (np.abs(dev.sizes - exact.sizes)
            <= np.maximum(6, 0.004 * exact.sizes)).all()
    assert (dev.sizes[:, 1] > dev.sizes[:, 0]).all()


def test_sharded_ladders_rejects_mixed_sizes():
    from codec_eval_tpu.parallel.ladder_runner import sweep_corpus_ladders

    with pytest.raises(ValueError):
        sweep_corpus_ladders([_photo(0), _photo(1, h=32)], [50.0])


def test_rd_calibrate_device_sweep_cli(tmp_path):
    from PIL import Image

    from codec_eval_tpu.cli.rd_calibrate import main as rd_main

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i in range(3):
        Image.fromarray(_photo(i, h=96, w=96)).save(corpus / f"im{i}.png")
    out = tmp_path / "cal"
    rc = rd_main(
        [str(corpus), "--format", "tpujpeg", "--device-sweep",
         "--range", "20:10:90", "--output", str(out)]
    )
    assert rc == 0
    code = (out / "calibration.py").read_text()
    assert "tpujpeg-420-aq-device" in code
    assert (out / "rd_curve.svg").exists()
    # --device-sweep without tpujpeg is an error.
    assert rd_main([str(corpus), "--device-sweep", "--range", "20:10:90"]) == 2
