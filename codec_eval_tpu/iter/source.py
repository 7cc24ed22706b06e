"""Source image loading with representative tiers and a PPM fast cache.

Behavioral port of reference: crates/codec-iter/src/source.rs:19-201 —
cluster-representative CID22-512 filename tiers selected by ``--limit``,
PNG decode, and a ``.codec-iter-cache/`` PPM cache so repeat runs skip PNG
decoding (PPM IO goes through the native C++ library when built).
"""

from __future__ import annotations

from pathlib import Path
from typing import List

import numpy as np

from ..errors import ImageLoadError
from ..utils import native
from .eval import SourceImage

#: Representative tiers (glassa-clustered CID22-512 picks).
#: reference: crates/codec-iter/src/source.rs:19-45
TINY = ["pexels-photo-951408.png", "53435.png", "1963557.png"]

SMALL = TINY + ["160577.png", "2866385.png"]

MEDIUM = [
    "pexels-photo-951408.png",
    "pexels-photo-3193731.png",
    "pexels-photo-7438498.png",
    "53435.png",
    "pexels-photo-1130297.png",
    "1963557.png",
    "Temperament-pie-chart-according-to-Eysenck.png",
    "160577.png",
    "1277396.png",
    "2866385.png",
    "1583339.png",
    "144200.png",
    "pexels-photo-2908983.png",
    "1183021.png",
    "162511.png",
]

CACHE_DIR_NAME = ".codec-iter-cache"


def _cache_path(corpus: Path, name: str) -> Path:
    return corpus / CACHE_DIR_NAME / (Path(name).stem + ".ppm")


def load_image(corpus: Path, name: str) -> SourceImage:
    """Load via PPM cache, else decode and cache.
    reference: crates/codec-iter/src/source.rs:62-92."""
    cache = _cache_path(corpus, name)
    if cache.exists():
        try:
            return SourceImage(name=name, rgb=native.read_ppm(cache))
        except IOError:
            pass
    path = corpus / name
    if not path.exists():
        raise ImageLoadError(f"source image not found: {path}")
    from PIL import Image

    with Image.open(path) as im:
        rgb = np.asarray(im.convert("RGB"))
    cache.parent.mkdir(parents=True, exist_ok=True)
    try:
        native.write_ppm(cache, rgb)
    except IOError:
        pass
    return SourceImage(name=name, rgb=np.ascontiguousarray(rgb))


#: Version tag of the procedural corpus below.  Committed baselines under
#: ``baselines/`` record this tag in ``corpus_path``; bump it whenever the
#: generator changes so stale baselines fail loudly instead of drifting.
SYNTHETIC_CORPUS_VERSION = "synthetic-v1"


def synthetic_sources(n: int = 3, size: int = 256) -> List[SourceImage]:
    """Deterministic photo-like test images, generated in memory.

    The reference ships committed quality/size baselines computed on a real
    corpus (baselines/*.json, crates/codec-iter/src/baseline.rs:11-43); this
    environment cannot commit corpus images, so the committed baselines here
    are computed on this procedural corpus instead.  Determinism contract:
    ``default_rng`` streams are stable across numpy versions (NEP 19), so
    the same (n, size, version) always regenerates bit-identical pixels.
    """
    out: List[SourceImage] = []
    for i in range(n):
        rng = np.random.default_rng(9000 + i)
        y, x = np.mgrid[0:size, 0:size]
        base = (
            115.0
            + 70.0 * np.sin(x / (11.0 + 3.0 * i))
            + 55.0 * np.cos(y / (8.0 + 2.0 * i))
            + 25.0 * np.sin((x + y) / (29.0 + 5.0 * i))
        )
        img = np.stack(
            [base, base * 0.87 + 14.0, base * 0.72 + 28.0], axis=-1
        )
        img += rng.normal(0.0, 6.5, img.shape)
        rgb = np.clip(img, 0.0, 255.0).astype(np.uint8)
        out.append(
            SourceImage(name=f"{SYNTHETIC_CORPUS_VERSION}-{i:03d}", rgb=rgb)
        )
    return out


def load_sources(corpus: Path, limit: int) -> List[SourceImage]:
    """Tier selection by limit (<=3 TINY, <=5 SMALL, <=15 MEDIUM, else all).
    reference: crates/codec-iter/src/source.rs:47-60."""
    corpus = Path(corpus)
    if not corpus.is_dir():
        raise ImageLoadError(f"corpus directory not found: {corpus}")
    if limit <= 3:
        names = TINY[: max(limit, 0)]
    elif limit <= 5:
        names = SMALL[:limit]
    elif limit <= 15:
        names = MEDIUM[:limit]
    else:
        names = []

    if names:
        available = [n for n in names if (corpus / n).exists()]
        if available:
            return [load_image(corpus, n) for n in available]
        # Tier files absent from this corpus: fall back to directory order.

    out: List[SourceImage] = []
    for path in sorted(corpus.iterdir()):
        if path.suffix.lower() in (".png", ".jpg", ".jpeg", ".webp", ".ppm"):
            if path.parent.name == CACHE_DIR_NAME:
                continue
            out.append(load_image(corpus, path.name))
            if limit and len(out) >= limit:
                break
    if not out:
        raise ImageLoadError(f"no usable images in {corpus}")
    return out
