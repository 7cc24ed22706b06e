"""Corpus + CSV import tests (reference: src/corpus/*, src/import/mod.rs)."""

import io
import json

import numpy as np
import pytest
from PIL import Image

from codec_eval_tpu.corpus import (
    Corpus,
    ImageCategory,
    SparseFilter,
    checksum_hex,
    fnv1a_64,
    matches_pattern,
)
from codec_eval_tpu.corpus.discovery import (
    parse_jpeg_dimensions,
    parse_png_dimensions,
    parse_webp_dimensions,
)
from codec_eval_tpu.errors import CorpusError, CsvImportError
from codec_eval_tpu.importers import CsvImporter, CsvSchema


def _write_image(path, w=20, h=10, fmt="PNG"):
    img = np.random.default_rng(0).integers(0, 256, (h, w, 3)).astype(np.uint8)
    Image.fromarray(img).save(path, fmt)


# -- discovery ------------------------------------------------------------


def test_discover(tmp_path):
    _write_image(tmp_path / "a.png")
    (tmp_path / "photo").mkdir()
    _write_image(tmp_path / "photo" / "b.jpg", fmt="JPEG")
    (tmp_path / ".hidden").mkdir()
    _write_image(tmp_path / ".hidden" / "c.png")
    (tmp_path / "notes.txt").write_text("not an image")

    corpus = Corpus.discover(tmp_path)
    assert len(corpus) == 2
    paths = {i.relative_path for i in corpus.images}
    assert paths == {"a.png", "photo/b.jpg"}
    by_path = {i.relative_path: i for i in corpus.images}
    assert by_path["a.png"].width == 20 and by_path["a.png"].height == 10
    # Category inferred from directory name.
    assert by_path["photo/b.jpg"].category == ImageCategory.PHOTO


def test_discover_missing_path(tmp_path):
    with pytest.raises(CorpusError):
        Corpus.discover(tmp_path / "nope")


def test_header_parsers():
    # PNG via real encoder bytes.
    buf = io.BytesIO()
    Image.new("RGB", (33, 17)).save(buf, "PNG")
    assert parse_png_dimensions(buf.getvalue()) == (33, 17)
    # JPEG.
    buf = io.BytesIO()
    Image.new("RGB", (48, 32)).save(buf, "JPEG")
    assert parse_jpeg_dimensions(buf.getvalue()) == (48, 32)
    # Progressive JPEG (SOF2).
    buf = io.BytesIO()
    Image.new("RGB", (64, 24)).save(buf, "JPEG", progressive=True)
    assert parse_jpeg_dimensions(buf.getvalue()) == (64, 24)
    # WebP (lossy VP8 or VP8X container).
    buf = io.BytesIO()
    Image.new("RGB", (40, 30)).save(buf, "WEBP", quality=80)
    assert parse_webp_dimensions(buf.getvalue()) == (40, 30)
    # Lossless WebP (VP8L).
    buf = io.BytesIO()
    Image.new("RGB", (25, 15)).save(buf, "WEBP", lossless=True)
    assert parse_webp_dimensions(buf.getvalue()) == (25, 15)
    # Garbage.
    assert parse_png_dimensions(b"garbage") is None
    assert parse_jpeg_dimensions(b"\x00\x01") is None
    assert parse_webp_dimensions(b"RIFFxxxx") is None


# -- categories -----------------------------------------------------------


def test_category_aliases():
    assert ImageCategory.from_str_loose("Photograph") == ImageCategory.PHOTO
    assert ImageCategory.from_str_loose("TEXTURES") == ImageCategory.HIGH_FREQUENCY
    assert ImageCategory.from_str_loose("3d") == ImageCategory.CGI
    assert ImageCategory.from_str_loose("bogus") is None
    assert len(ImageCategory.all()) == 11
    assert str(ImageCategory.LOW_FREQUENCY) == "low_frequency"


# -- checksums ------------------------------------------------------------


def test_fnv1a():
    # Standard FNV-1a test vectors.
    assert fnv1a_64(b"") == 0xCBF29CE484222325
    assert fnv1a_64(b"a") == 0xAF63DC4C8601EC8C
    assert checksum_hex(fnv1a_64(b"a")) == "af63dc4c8601ec8c"


def test_native_matches_python():
    from codec_eval_tpu.utils import native

    data = bytes(range(256)) * 11
    from codec_eval_tpu.corpus.checksum import fnv1a_64 as py_fnv

    assert native.fnv1a64(data) == py_fnv(data)


def test_checksums_split_duplicates(tmp_path):
    _write_image(tmp_path / "a.png")
    _write_image(tmp_path / "b.png")  # same rng seed -> identical bytes? no: PNG same content
    corpus = Corpus.discover(tmp_path)
    assert corpus.compute_checksums() == 2
    # a and b have identical pixel content -> identical files -> duplicates.
    dups = corpus.find_duplicates()
    assert len(dups) == 1 and len(dups[0]) == 2
    train, val = corpus.split(1.0)
    assert len(train) == 2 and len(val) == 0
    # Deterministic.
    t2, v2 = corpus.split(0.5)
    t3, v3 = corpus.split(0.5)
    assert [i.relative_path for i in t2] == [i.relative_path for i in t3]


def test_manifest_roundtrip(tmp_path):
    _write_image(tmp_path / "a.png")
    corpus = Corpus.discover(tmp_path)
    corpus.save_manifest(tmp_path / "manifest.json")
    loaded = Corpus.load_manifest(tmp_path / "manifest.json")
    assert loaded.name == corpus.name
    assert len(loaded) == 1
    assert loaded.images[0].width == 20


def test_stats(tmp_path):
    _write_image(tmp_path / "a.png", w=20, h=10)
    _write_image(tmp_path / "b.png", w=40, h=30)
    s = Corpus.discover(tmp_path).stats()
    assert s.image_count == 2
    assert s.total_pixels == 20 * 10 + 40 * 30
    assert s.min_width == 20 and s.max_width == 40


def test_get_dataset_unknown():
    with pytest.raises(CorpusError, match="Unknown dataset"):
        Corpus.get_dataset("nonexistent-set")


# -- sparse ---------------------------------------------------------------


def test_sparse_filter_patterns():
    assert SparseFilter.directory("images/kodak").to_patterns() == [
        "images/kodak/",
        "images/kodak/**",
    ]
    assert SparseFilter.format(".png").to_patterns() == ["**/*.png"]
    assert SparseFilter.category("photo").to_patterns() == [
        "**/photo/",
        "**/photo/**",
        "photo/",
        "photo/**",
    ]
    assert SparseFilter.min_size(512, 512).to_patterns() == ["**/*"]
    assert SparseFilter.paths(["a.png", "b.png"]).to_patterns() == ["a.png", "b.png"]


def test_matches_pattern():
    assert matches_pattern("dir/sub/file.png", "**/*.png")
    assert matches_pattern("file.png", "*.png")
    assert not matches_pattern("dir/file.jpg", "**/*.png")
    assert matches_pattern("photo/x.png", "photo/")
    assert matches_pattern("a/photo/x.png", "**/photo/**")


# -- CSV import -----------------------------------------------------------


def test_csv_auto_detect(tmp_path):
    p = tmp_path / "results.csv"
    p.write_text(
        "Filename,Encoder,Q,Bytes,SSIM2,butter,encode_ms\n"
        "a.png,mozjpeg,75,1000,85.5,2.1,12.5\n"
        "b.png,webp,80,900,88.0,1.8,\n"
    )
    rows = CsvImporter.auto_detect().import_file(p)
    assert len(rows) == 2
    assert rows[0].image_name == "a.png"
    assert rows[0].codec == "mozjpeg"
    assert rows[0].quality_setting == 75.0
    assert rows[0].file_size == 1000
    assert rows[0].ssimulacra2 == 85.5
    assert rows[0].butteraugli == 2.1
    assert rows[0].encode_time_ms == 12.5
    assert rows[1].encode_time_ms is None


def test_csv_explicit_schema(tmp_path):
    p = tmp_path / "weird.csv"
    p.write_text("pic,method,level\nx.png,av1,30\n")
    schema = (
        CsvSchema.builder()
        .image_column("pic")
        .codec_column("method")
        .quality_column("level")
        .build()
    )
    rows = CsvImporter(schema).import_file(p)
    assert rows[0].image_name == "x.png"
    assert rows[0].quality_setting == 30.0


def test_csv_missing_required(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("foo,bar\n1,2\n")
    with pytest.raises(CsvImportError, match="image/filename"):
        CsvImporter.auto_detect().import_file(p)


def test_csv_skips_empty_rows(tmp_path):
    p = tmp_path / "r.csv"
    p.write_text("image,codec\n,missing\nok.png,jpeg\n")
    rows = CsvImporter.auto_detect().import_file(p)
    assert len(rows) == 1 and rows[0].image_name == "ok.png"


def test_dssim_alias_ssim(tmp_path):
    """dssim column auto-detects from ssim/ms-ssim aliases
    (reference: src/import/mod.rs:304-308)."""
    p = tmp_path / "s.csv"
    p.write_text("image,codec,ms-ssim\nx.png,jpeg,0.002\n")
    rows = CsvImporter.auto_detect().import_file(p)
    assert rows[0].dssim == 0.002


def test_sparse_checkout_local_repo(tmp_path):
    """Drive the git subprocess wrapper against a real local repository."""
    import subprocess

    from codec_eval_tpu.corpus import SparseCheckout

    repo = tmp_path / "repo"
    repo.mkdir()

    def git(*args):
        subprocess.run(
            ["git", *args], cwd=repo, check=True, capture_output=True,
            env={"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                 "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
                 "HOME": str(tmp_path), "PATH": "/usr/bin:/bin:/usr/local/bin"},
        )

    git("init", "-q")
    (repo / "photo").mkdir()
    (repo / "photo" / "a.png").write_bytes(b"x")
    (repo / "docs").mkdir()
    (repo / "docs" / "readme.md").write_text("hi")
    git("add", "-A")
    git("commit", "-q", "-m", "init")

    sc = SparseCheckout.init(repo)
    sc.set_paths(["photo"])
    patterns = sc.list_patterns()
    assert "photo" in patterns
    status = sc.status()
    assert status.enabled
    assert status.total_files == 2
    preview = sc.preview_patterns(["**/*.png"])
    assert preview == ["photo/a.png"]
    sc.disable()
    assert not sc.status().enabled


def test_sparse_open_not_a_repo(tmp_path):
    from codec_eval_tpu.corpus import SparseCheckout

    with pytest.raises(CorpusError, match="Not a git repository"):
        SparseCheckout.open(tmp_path)


def test_corpus_image_name_unique_across_subdirs():
    """Same filename in two category folders must yield distinct report
    names (per-image JSON reports would silently overwrite otherwise)."""
    from codec_eval_tpu.corpus import CorpusImage

    a = CorpusImage(relative_path="photo/0001.png")
    b = CorpusImage(relative_path="illustration/0001.png")
    assert a.name() != b.name()
    assert a.name() == "photo__0001"
    assert CorpusImage(relative_path="0001.png").name() == "0001"


def test_sparse_status_percentage():
    """reference: src/corpus/sparse.rs:317-325."""
    from codec_eval_tpu.corpus import SparseStatus

    assert SparseStatus(True, [], 5, 10).percentage() == 50.0
    assert SparseStatus(True, [], 0, 0).percentage() == 100.0
    assert SparseStatus(True, [], 5, None).percentage() is None


def test_corpus_legacy_discovery_api(tmp_path):
    """discover_or_download / get_or_download / download_dataset parity.
    reference: src/corpus/mod.rs:179-305."""
    from codec_eval_tpu.corpus import Corpus

    # Existing corpus directory: both legacy entry points discover it.
    root = tmp_path / "corp"
    (root / "photo").mkdir(parents=True)
    import numpy as np
    from PIL import Image

    Image.fromarray(
        np.full((8, 8, 3), 128, np.uint8)
    ).save(root / "photo" / "a.png")
    corpus = Corpus.discover_or_download(root)
    assert len(corpus) == 1
    corpus = Corpus.get_or_download(root)
    assert len(corpus) == 1

    # Missing path errors with a get_dataset pointer, like the reference.
    with pytest.raises(CorpusError, match="get_dataset"):
        Corpus.discover_or_download(tmp_path / "nope")
    with pytest.raises(CorpusError, match="get_dataset"):
        Corpus.get_or_download(tmp_path / "nope")

    # download_dataset is the get_dataset alias (unknown name error path).
    with pytest.raises(CorpusError, match="Unknown dataset"):
        Corpus.download_dataset("definitely-not-a-dataset")
