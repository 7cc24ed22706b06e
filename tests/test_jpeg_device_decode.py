"""Device-side JPEG decoding (codecs/jpeg_device.py + the native entropy
decoder): host Huffman parse, accelerator reconstruction.

Oracles: (1) the tpujpeg encoder's own quantized coefficients — parsing
its files back must reproduce them EXACTLY (baseline and progressive, all
subsamplings); (2) PIL/libjpeg — pixel output of the device decode must
agree within the inter-decoder tolerance (integer islow iDCT vs exact
float; both use the triangle "fancy" chroma upsample).  reference
context: the reference decodes entirely on host (src/decode.rs:41-98).
"""

from __future__ import annotations

import io

import numpy as np
import pytest
from PIL import Image

from codec_eval_tpu.codecs import jpeg_device
from codec_eval_tpu.iter.source import synthetic_sources
from codec_eval_tpu.kernels import jpeg_enc as je
from codec_eval_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not jpeg_device.is_available(), reason="native JPEG parser not built"
)

IMG = synthetic_sources(1, 250)[0].rgb  # 250px: padded MCU grid coverage


def _pil_bytes(img, **opts) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", **opts)
    return buf.getvalue()


@pytest.mark.parametrize("sub", ["420", "444", "422", "440"])
@pytest.mark.parametrize("progressive", [False, True])
def test_parse_roundtrips_own_encoder_exactly(sub, progressive):
    h, w = IMG.shape[:2]
    planes = je.jpeg_transform(IMG, sub)
    ql, qc = je.quality_to_qtables(75, je.ANNEX_K_LUMA, je.ANNEX_K_CHROMA)
    cy = je.quantize_blocks(planes["dct_y"], ql, 0.5)
    ccb = je.quantize_blocks(planes["dct_cb"], qc, 0.5)
    ccr = je.quantize_blocks(planes["dct_cr"], qc, 0.5)
    data = native.jpeg_encode_baseline(
        w, h, sub, cy, ccb, ccr,
        ql[je.ZIGZAG].astype(np.uint16), qc[je.ZIGZAG].astype(np.uint16),
        progressive=progressive,
    )
    p = jpeg_device.parse_jpeg(data)
    assert (p["width"], p["height"]) == (w, h)
    assert p["subsampling"] == sub
    assert p["progressive"] == progressive
    np.testing.assert_array_equal(p["qtab_luma_zz"], ql[je.ZIGZAG])
    np.testing.assert_array_equal(p["y"], cy)
    np.testing.assert_array_equal(p["cb"], ccb)
    np.testing.assert_array_equal(p["cr"], ccr)


@pytest.mark.parametrize(
    "opts",
    [
        {"quality": 75},
        {"quality": 75, "progressive": True},
        {"quality": 90, "subsampling": 0},
        {"quality": 85, "progressive": True, "subsampling": 0},
        {"quality": 35, "progressive": True},
        {"quality": 60, "restart_marker_blocks": 3},
        {"quality": 60, "progressive": True, "restart_marker_blocks": 2},
        {"quality": 75, "optimize": True},
    ],
)
def test_device_decode_matches_pil(opts):
    data = _pil_bytes(IMG, **opts)
    dec = jpeg_device.decode_jpeg_device(data)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert dec.shape == pil.shape
    rms = float(
        np.sqrt(np.mean((dec.astype(np.float64) - pil.astype(np.float64)) ** 2))
    )
    assert rms < 1.1, (opts, rms)


def test_device_decode_xyb_container():
    """The tpujpeg XYB (Adobe transform-0) container routes through the
    same parse + device reconstruction with the opsin inverse."""
    from codec_eval_tpu.codecs.tpujpeg import TpuJpegCodec
    from codec_eval_tpu.engine.image import ImageData
    from codec_eval_tpu.engine.session import EncodeRequest

    codec = TpuJpegCodec(colorspace="xyb")
    data = codec.encode(ImageData.rgb8(IMG), EncodeRequest(85.0))
    p = jpeg_device.parse_jpeg(data)
    assert p["adobe_transform"] == 0
    dec = jpeg_device.decode_jpeg_device(data)
    rms = float(np.sqrt(np.mean((dec.astype(np.float64) - IMG) ** 2)))
    assert rms < 12.0, rms


def test_score_jpeg_files_mixed_configs():
    """Candidates may mix subsampling/progressive; scores match scoring
    the PIL-decoded pixels through the same kernels within the
    inter-decoder tolerance, and quality ordering is preserved."""
    from codec_eval_tpu.kernels.ssimulacra2 import ssimulacra2

    datas = [
        _pil_bytes(IMG, quality=45),
        _pil_bytes(IMG, quality=75, progressive=True),
        _pil_bytes(IMG, quality=92, subsampling=0),
    ]
    scores = jpeg_device.score_jpeg_files(
        IMG, datas, metrics=("ssimulacra2", "psnr")
    )
    s2 = [s["ssimulacra2"] for s in scores]
    assert s2[0] < s2[1] < s2[2], s2
    for data, s in zip(datas, scores):
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        direct = float(ssimulacra2(IMG, pil))
        assert abs(s["ssimulacra2"] - direct) < 0.6, (s, direct)


@pytest.mark.parametrize("progressive", [False, True])
def test_grayscale_device_decode(progressive):
    """Grayscale (single-component, '400') streams decode on device with
    luma replicated to RGB — the reference's L8 policy (decode.rs:60-66)."""
    gray = np.asarray(Image.fromarray(IMG).convert("L"))
    buf = io.BytesIO()
    Image.fromarray(gray).save(buf, "JPEG", quality=80, progressive=progressive)
    data = buf.getvalue()
    p = jpeg_device.parse_jpeg(data)
    assert p["subsampling"] == "400"
    dec = jpeg_device.decode_jpeg_device(data)
    assert (dec[..., 0] == dec[..., 1]).all() and (dec[..., 1] == dec[..., 2]).all()
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    rms = float(
        np.sqrt(np.mean((dec.astype(np.float64) - pil.astype(np.float64)) ** 2))
    )
    assert rms < 1.1, rms


def test_session_jpeg_bytes_fast_path(tmp_path):
    """Adapter-registered JPEG codecs route through the device decode:
    identical byte sizes to the callback path, scores within the
    inter-decoder tolerance, counter incremented; callback-registered
    codecs never qualify."""
    from codec_eval_tpu.codecs.pil_codecs import JpegCodec
    from codec_eval_tpu.engine.image import ImageData
    from codec_eval_tpu.engine.session import EvalConfig, EvalSession
    from codec_eval_tpu.metrics import MetricConfig

    qualities = [55.0, 90.0]

    def make(report_sub):
        return EvalSession(
            EvalConfig.builder()
            .report_dir(str(tmp_path / report_sub))
            .metrics(MetricConfig.all())
            .quality_levels(qualities)
            .build()
        )

    codec = JpegCodec()
    fast = make("fast")
    fast.add_codec_impl(codec)
    slow = make("slow")
    slow.add_codec_with_decode(
        codec.id(), codec.version(), codec.encode_fn(), codec.decode_fn()
    )
    rf = fast.evaluate_image("img", ImageData.rgb8(IMG))
    rs = slow.evaluate_image("img", ImageData.rgb8(IMG))
    assert fast.jpeg_device_decodes_run == 1
    assert slow.jpeg_device_decodes_run == 0
    for a, b in zip(rf.results, rs.results):
        assert a.file_size == b.file_size
        assert a.metrics.ssimulacra2 == pytest.approx(
            b.metrics.ssimulacra2, abs=0.6
        )
        assert a.metrics.psnr == pytest.approx(b.metrics.psnr, abs=1.0)
        assert a.perception is not None


def test_parser_mutation_fuzz():
    """The entropy decoder ingests untrusted bytes: random mutations of
    valid streams (header bytes, Huffman tables, scan parameters, entropy
    data) must either parse or raise — never crash, hang, or write out of
    bounds.  Guard-band canaries around the output buffers catch OOB
    writes that don't fault."""
    rng = np.random.default_rng(7)
    seeds = [
        _pil_bytes(IMG, quality=70),
        _pil_bytes(IMG, quality=70, progressive=True),
    ]
    tried = ok = 0
    for data in seeds:
        raw = bytearray(data)
        for _ in range(150):
            mut = bytearray(raw)
            for _ in range(int(rng.integers(1, 4))):
                pos = int(rng.integers(2, len(mut)))
                mut[pos] = int(rng.integers(0, 256))
            if rng.random() < 0.2:
                mut = mut[: int(rng.integers(4, len(mut)))]
            tried += 1
            try:
                p = jpeg_device.parse_jpeg(bytes(mut))
                ok += 1
                assert p["y"].shape[2] == 64
            except Exception:
                pass  # any Python-level error is acceptable
    assert tried == 300 and ok >= 0  # reached the end without a crash

    # Historical findings, pinned: a segment length < 2 moved the parse
    # cursor BACKWARD (infinite loop on a 4-byte input); an unvalidated
    # SOF quant-table index read out of bounds.
    with pytest.raises(Exception):
        jpeg_device.parse_jpeg(bytes([0xFF, 0xD8, 0xFF, 0xDB]))
    bad_sof = bytearray(seeds[0])
    sof = bad_sof.find(b"\xff\xc0")
    bad_sof[sof + 12] = 0xFE  # component 0 Tq -> 254
    with pytest.raises(Exception):
        jpeg_device.parse_jpeg(bytes(bad_sof))


def test_unsupported_and_corrupt_streams():
    from codec_eval_tpu.errors import UnsupportedFormat

    cmyk = io.BytesIO()
    Image.fromarray(IMG).convert("CMYK").save(cmyk, "JPEG")
    with pytest.raises(UnsupportedFormat):
        jpeg_device.parse_jpeg(cmyk.getvalue())
    # corrupt header: either error taxonomy is acceptable (the parser
    # cannot always distinguish corrupt from unsupported)
    with pytest.raises((ValueError, UnsupportedFormat)):
        jpeg_device.parse_jpeg(b"\xff\xd8\xff\xdb junk")
    # Truncated entropy data decodes leniently (missing bits read as
    # zeros — libjpeg-style error recovery), it must not crash or hang.
    good = _pil_bytes(IMG, quality=75)
    p = jpeg_device.parse_jpeg(good[: len(good) - len(good) // 3])
    assert p["y"].shape[0] > 0

    from codec_eval_tpu.errors import DimensionMismatch

    with pytest.raises(DimensionMismatch):
        jpeg_device.score_jpeg_files(
            IMG, [_pil_bytes(IMG[:128, :128], quality=75)]
        )


def test_hostile_dht_dc_category_rejected():
    """A DHT mapping a code to magnitude category 255 must fail cleanly
    (T.81 caps 8-bit DC categories at 11); unchecked it drove shift
    amounts far past the 32-bit bit buffer."""
    data = bytearray(_pil_bytes(IMG, quality=75))
    dht = data.find(b"\xff\xc4")
    assert dht > 0
    # DHT body: len(2) tc/th(1) bits[16] huffvals...; patch the first
    # huffval of the first (DC) table to 0xFF.
    data[dht + 5 + 16] = 0xFF
    with pytest.raises(Exception):
        jpeg_device.parse_jpeg(bytes(data))


def test_app14_padded_segment_transform_offset():
    """The Adobe transform byte sits at body offset 11 (T-REC-T.872
    6.5.3); a padded APP14 (seglen > 14) must still read it there, not at
    the segment's last byte.  Misreading padding as transform 0 would run
    the passthrough (XYB-container) path on YCbCr planes."""
    base = _pil_bytes(IMG, quality=90)
    app14 = (
        b"\xff\xee" + (16).to_bytes(2, "big") + b"Adobe"
        + (100).to_bytes(2, "big") + b"\x00\x00" + b"\x00\x00"
        + b"\x01"          # transform 1: YCbCr
        + b"\x00\x00"      # padding the parser must not misread
    )
    padded = base[:2] + app14 + base[2:]
    parsed = jpeg_device.parse_jpeg(padded)
    assert parsed["adobe_transform"] == 1

    from PIL import Image as _Image

    pil = np.asarray(_Image.open(io.BytesIO(base)).convert("RGB"))
    dev = np.asarray(jpeg_device.decode_jpeg_to_device(padded))
    rgb = np.moveaxis(dev, 0, -1) if dev.shape[0] == 3 else dev
    rms = float(np.sqrt(np.mean((rgb.astype(np.float32) - pil) ** 2)))
    assert rms < 1.1, rms
