"""Device-side rate accounting (kernels/jpeg_rate.py) vs the C++ entropy
coder's own statistics export (native ce_jpeg_scan_stats).

The contract under test: from device-computed symbol histograms alone, the
host reproduces the coder's optimized Huffman tables bit-for-bit and
therefore the exact entropy-coded bit count; the only estimated term is
0xFF byte stuffing.  reference context: the reference's eval loop gets
sizes for free from host codecs (crates/codec-iter/src/eval.rs:151-167);
this is what keeps the device-resident ladder honest without fetching
coefficient planes.
"""

from __future__ import annotations

import numpy as np
import pytest

from codec_eval_tpu.iter.source import synthetic_sources
from codec_eval_tpu.kernels import jpeg_enc as je
from codec_eval_tpu.kernels import jpeg_rate as jr
from codec_eval_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.is_native_available(), reason="native library not built"
)

IMG = synthetic_sources(1, 128)[0].rgb


def _quantized(sub: str, q: int):
    planes = je.jpeg_transform(IMG, sub)
    ql, qc = je.quality_to_qtables(q, je.ANNEX_K_LUMA, je.ANNEX_K_CHROMA)
    return (
        je.quantize_blocks(planes["dct_y"], ql, 0.5),
        je.quantize_blocks(planes["dct_cb"], qc, 0.5),
        je.quantize_blocks(planes["dct_cr"], qc, 0.5),
        ql,
        qc,
    )


@pytest.mark.parametrize("sub", ["420", "444", "422", "440"])
@pytest.mark.parametrize("q", [50, 90])
def test_device_histograms_match_cpp_oracle(sub, q):
    import jax
    import jax.numpy as jnp

    cy, ccb, ccr, _, _ = _quantized(sub, q)
    oracle = native.jpeg_scan_stats(sub, cy, ccb, ccr)
    stats = jax.jit(jr.build_rate_stats(sub))(
        jnp.asarray(cy), jnp.asarray(ccb), jnp.asarray(ccr)
    )
    st = {k: np.asarray(v).astype(np.int64) for k, v in stats.items()}
    np.testing.assert_array_equal(st["dc_y"], oracle["dc_freq"][0][:16])
    np.testing.assert_array_equal(st["dc_c"], oracle["dc_freq"][1][:16])
    np.testing.assert_array_equal(st["ac_y"], oracle["ac_freq"][0])
    np.testing.assert_array_equal(st["ac_c"], oracle["ac_freq"][1])


@pytest.mark.parametrize("sub", ["420", "444"])
@pytest.mark.parametrize("q", [50, 75, 95])
def test_entropy_bits_exact_and_file_size_identity(sub, q):
    """Everything except stuffing is bit-exact: the host-rebuilt tables give
    exactly the coder's scan bytes, and header accounting closes the full
    file length to the byte once the oracle's true stuffing count is used."""
    cy, ccb, ccr, ql, qc = _quantized(sub, q)
    oracle = native.jpeg_scan_stats(sub, cy, ccb, ccr)
    dc_y = oracle["dc_freq"][0][:16]
    dc_c = oracle["dc_freq"][1][:16]
    ac_y, ac_c = oracle["ac_freq"]
    bits, nsyms = jr.scan_bits_from_hists(dc_y, dc_c, ac_y, ac_c)
    assert (bits + 7) // 8 == oracle["scan_bytes"] - oracle["stuffed"]

    data = native.jpeg_encode_baseline(
        IMG.shape[1], IMG.shape[0], sub, cy, ccb, ccr,
        ql[je.ZIGZAG].astype(np.uint16), qc[je.ZIGZAG].astype(np.uint16),
    )
    est = jr.baseline_size_estimate(dc_y, dc_c, ac_y, ac_c)
    scan_bytes = (bits + 7) // 8
    exact = est - int(round(scan_bytes / 368.0)) + oracle["stuffed"]
    assert exact == len(data)
    # and the stuffing estimate keeps the standalone estimate tight
    assert abs(est - len(data)) <= max(4, 0.004 * len(data))


def test_sweep_device_sizes_match_exact_sizes():
    from codec_eval_tpu.engine.tpu_sweep import evaluate_tpujpeg_sweep

    exact = evaluate_tpujpeg_sweep(
        IMG, [60, 85], metrics=("psnr",), with_sizes=True
    )
    dev = evaluate_tpujpeg_sweep(
        IMG, [60, 85], metrics=("psnr",), with_sizes="device"
    )
    for e, d in zip(exact, dev):
        assert abs(d.file_size - e.file_size) <= max(6, 0.004 * e.file_size)
        assert d.bits_per_pixel == pytest.approx(
            e.bits_per_pixel, rel=0.005
        )
        assert d.metrics["psnr"] == pytest.approx(e.metrics["psnr"])


@pytest.mark.parametrize("sub", ["420", "444"])
def test_progressive_histograms_match_cpp_oracle(sub):
    """The SOF2 spectral-selection scans: per-band symbol histograms
    (including cross-block EOBRUN symbols) computed on device equal the
    coder's own statistics pass; per-scan bit accounting closes the full
    file length to the byte given the oracle's true stuffing count."""
    cy, ccb, ccr, ql, qc = _quantized(sub, 75)
    h, w = IMG.shape[:2]
    oracle = native.jpeg_scan_stats_progressive(w, h, sub, cy, ccb, ccr)
    stats_fn = jr.build_progressive_ladder_rate_stats(h, w, sub)
    packed = np.asarray(stats_fn(cy[None], ccb[None], ccr[None]))[0]
    st = {
        "dc_y": packed[:16], "dc_c": packed[16:32], "low": packed[32:288],
        "cb": packed[288:544], "cr": packed[544:800], "high": packed[800:1056],
    }
    np.testing.assert_array_equal(
        st["dc_y"].astype(np.int64), oracle["dc_freq"][0][:16]
    )
    np.testing.assert_array_equal(
        st["dc_c"].astype(np.int64), oracle["dc_freq"][1][:16]
    )
    np.testing.assert_array_equal(
        st["low"].astype(np.int64), oracle["ac_freq"][0]
    )
    np.testing.assert_array_equal(
        (st["cb"] + st["cr"]).astype(np.int64), oracle["ac_freq"][1]
    )
    np.testing.assert_array_equal(
        st["high"].astype(np.int64), oracle["ac_freq"][2]
    )

    data = native.jpeg_encode_baseline(
        w, h, sub, cy, ccb, ccr,
        ql[je.ZIGZAG].astype(np.uint16), qc[je.ZIGZAG].astype(np.uint16),
        progressive=True,
    )
    est = jr.progressive_size_estimate(
        st["dc_y"], st["dc_c"], st["low"], st["cb"], st["cr"], st["high"]
    )
    scan_wo_stuff = oracle["scan_bytes"] - oracle["stuffed"]
    assert est - int(round(scan_wo_stuff / 368.0)) + oracle["stuffed"] == len(data)
    assert abs(est - len(data)) <= max(4, 0.004 * len(data))


def test_progressive_eobrun_cap_and_long_runs():
    """A sparse high band produces long cross-block EOB runs; the device
    EOBRUN bucketing (log2 buckets, 0x7FFF cap) must agree with the coder
    symbol-for-symbol."""
    h = w = 256
    rng = np.random.default_rng(3)
    # DC-only image with a handful of isolated high-frequency spikes:
    # nearly every block's AC band is empty -> runs of hundreds of blocks.
    img = np.full((h, w, 3), 128, np.uint8)
    for _ in range(5):
        yy, xx = rng.integers(0, h - 8, 2)
        img[yy : yy + 8, xx : xx + 8] = rng.integers(0, 255, (8, 8, 3))
    planes = je.jpeg_transform(img, "444")
    ql, qc = je.quality_to_qtables(85, je.ANNEX_K_LUMA, je.ANNEX_K_CHROMA)
    cy = je.quantize_blocks(planes["dct_y"], ql, 0.5)
    ccb = je.quantize_blocks(planes["dct_cb"], qc, 0.5)
    ccr = je.quantize_blocks(planes["dct_cr"], qc, 0.5)
    oracle = native.jpeg_scan_stats_progressive(w, h, "444", cy, ccb, ccr)
    stats_fn = jr.build_progressive_ladder_rate_stats(h, w, "444")
    packed = np.asarray(stats_fn(cy[None], ccb[None], ccr[None]))[0]
    np.testing.assert_array_equal(
        packed[32:288].astype(np.int64), oracle["ac_freq"][0]
    )
    np.testing.assert_array_equal(
        packed[800:1056].astype(np.int64), oracle["ac_freq"][2]
    )


def test_sweep_device_sizes_progressive():
    from codec_eval_tpu.engine.tpu_sweep import evaluate_tpujpeg_sweep

    exact = evaluate_tpujpeg_sweep(
        IMG, [60, 85], metrics=("psnr",), with_sizes=True, progressive=True
    )
    dev = evaluate_tpujpeg_sweep(
        IMG, [60, 85], metrics=("psnr",), with_sizes="device", progressive=True
    )
    for e, d in zip(exact, dev):
        assert abs(d.file_size - e.file_size) <= max(6, 0.004 * e.file_size)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_random_planes_match_oracle(seed):
    """Adversarial coefficient planes (dense large magnitudes, all-zero
    blocks, isolated spikes, long zero runs) — device histograms must equal
    the coder's on both scan scripts, and the bit accounting must close
    the exact scan size."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    by, bx = 6, 8  # 420: chroma 3x4
    h, w = by * 8, bx * 8

    def plane(shape, density, mag):
        p = rng.integers(-mag, mag + 1, (*shape, 64)).astype(np.int16)
        mask = rng.random((*shape, 64)) < density
        p = np.where(mask, p, 0).astype(np.int16)
        p[..., 0] = rng.integers(-1023, 1024, shape)  # live DC everywhere
        return np.clip(p, -1023, 1023).astype(np.int16)

    density = [0.02, 0.5, 0.95][seed]
    mag = [1023, 37, 3][seed]
    cy = plane((by, bx), density, mag)
    ccb = plane((by // 2, bx // 2), density, mag)
    ccr = plane((by // 2, bx // 2), density, mag)
    cy[0] = 0  # an entirely empty block (EOB-only / EOBRUN member)
    cy[0, :, 0] = 7

    o = native.jpeg_scan_stats("420", cy, ccb, ccr)
    st = jax.jit(jr.build_rate_stats("420"))(
        jnp.asarray(cy), jnp.asarray(ccb), jnp.asarray(ccr)
    )
    np.testing.assert_array_equal(
        np.asarray(st["ac_y"]).astype(np.int64), o["ac_freq"][0]
    )
    np.testing.assert_array_equal(
        np.asarray(st["dc_y"]).astype(np.int64), o["dc_freq"][0][:16]
    )
    bits, _ = jr.scan_bits_from_hists(
        np.asarray(st["dc_y"]), np.asarray(st["dc_c"]),
        np.asarray(st["ac_y"]), np.asarray(st["ac_c"]),
    )
    assert (bits + 7) // 8 == o["scan_bytes"] - o["stuffed"]

    op = native.jpeg_scan_stats_progressive(w, h, "420", cy, ccb, ccr)
    stats_fn = jr.build_progressive_ladder_rate_stats(h, w, "420")
    packed = np.asarray(stats_fn(cy[None], ccb[None], ccr[None]))[0]
    np.testing.assert_array_equal(
        packed[32:288].astype(np.int64), op["ac_freq"][0]
    )
    np.testing.assert_array_equal(
        (packed[288:544] + packed[544:800]).astype(np.int64), op["ac_freq"][1]
    )
    np.testing.assert_array_equal(
        packed[800:1056].astype(np.int64), op["ac_freq"][2]
    )


def test_encode_to_target():
    """Target-driven encode: smallest grid quality meeting the constraint,
    real decodable bytes, one device ladder dispatch for the search."""
    import io

    from PIL import Image

    from codec_eval_tpu.engine.tpu_sweep import encode_to_target
    from codec_eval_tpu.errors import QualityBelowThreshold
    from codec_eval_tpu.kernels.ssimulacra2 import ssimulacra2

    res = encode_to_target(IMG, min_ssimulacra2=80.0, qualities=range(30, 99, 4))
    assert res.data is not None and res.file_size == len(res.data)
    assert res.metrics["ssimulacra2"] >= 80.0
    # verify via an independent decode of the emitted bytes
    dec = np.asarray(Image.open(io.BytesIO(res.data)).convert("RGB"))
    s2 = float(ssimulacra2(IMG, dec))
    assert s2 >= 78.0, s2  # inter-decoder tolerance
    # a tighter target picks a higher quality / bigger file
    res_hi = encode_to_target(IMG, min_ssimulacra2=92.0, qualities=range(30, 99, 4))
    assert res_hi.quality > res.quality and res_hi.file_size > res.file_size

    # bpp ceiling (device rate statistics drive the search)
    res_bpp = encode_to_target(
        IMG, max_bits_per_pixel=1.0, min_ssimulacra2=50.0,
        qualities=range(30, 99, 4),
    )
    assert res_bpp.bits_per_pixel <= 1.01

    with pytest.raises(QualityBelowThreshold):
        encode_to_target(IMG, min_ssimulacra2=99.9, qualities=[30, 50])
    with pytest.raises(ValueError, match="no target"):
        encode_to_target(IMG)


def test_t81_code_sizes_degenerate_histograms():
    # single-symbol histogram: the reserved symbol keeps it decodable
    freq = np.zeros(256, dtype=np.int64)
    freq[0] = 100
    sizes, n = jr.t81_code_sizes(freq)
    assert n == 1 and sizes[0] == 1
    # empty histogram: no symbols, zero bits
    sizes, n = jr.t81_code_sizes(np.zeros(256, dtype=np.int64))
    assert n == 0 and sizes.sum() == 0


def test_encode_to_target_names_binding_constraint():
    """When the perceptual floor is reachable but the bpp ceiling excludes
    every admissible point, the error must name bits_per_pixel — not claim
    a satisfied perceptual metric is 'below threshold'."""
    from codec_eval_tpu.engine.tpu_sweep import encode_to_target
    from codec_eval_tpu.errors import QualityBelowThreshold

    with pytest.raises(QualityBelowThreshold) as exc:
        encode_to_target(
            IMG, min_ssimulacra2=60.0, max_bits_per_pixel=0.02,
            qualities=[50, 70, 90],
        )
    assert exc.value.metric == "bits_per_pixel"


def test_rate_stats_exactness_envelope():
    """f32 histogram counts are integer-exact only below 2^24 per bin; the
    device half must refuse planes large enough to overflow that."""
    import jax.numpy as jnp

    with pytest.raises(ValueError, match="tile the image"):
        jr._run_size_hist(jnp.zeros((1 << 18, 64), jnp.int32), 0, 63)
