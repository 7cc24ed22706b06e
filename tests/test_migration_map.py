"""Machine-check the migration map (VERDICT r2 #8).

docs/MIGRATION.md claims "everything the reference exposes has a
counterpart".  This test enforces that claim: it parses the reference's
machine-generated public-API snapshot
(``/root/reference/docs/public-api/codec-eval.txt`` — 104 pub types / 62
free fns per its summary header), extracts every public type and free
function NAME, and asserts each one is either mentioned in MIGRATION.md or
listed in its "Documented exclusions" section.

Mirrors the reference's own API-surface snapshot harness
(apidoc/tests/public_api_doc.rs:3-6) — there the snapshot guards against
accidental API breakage; here it guards the migration contract.
"""

import re
from pathlib import Path

import pytest

REF_SNAPSHOT = Path("/root/reference/docs/public-api/codec-eval.txt")
MIGRATION = Path(__file__).parent.parent / "docs" / "MIGRATION.md"


def _extract_reference_names():
    """Public type names + free-function/const names from the snapshot.

    Name-level granularity: the first capitalized path segment of each item
    line is its owning type; ``pub fn`` lines with no capitalized owner are
    free functions.  Methods/fields/variants collapse into their type.
    """
    types, fns = set(), set()
    for line in REF_SNAPSHOT.read_text().splitlines():
        if not line.startswith("pub "):
            continue
        line = line.split(" [also:")[0]
        rest = line[4:]
        kw = rest.split()[0]
        keywords = ("fn", "struct", "enum", "trait", "type", "const", "static", "mod")
        subj = rest.split()[1] if kw in keywords else rest.split()[0]
        subj = re.split(r"[(<]", subj)[0].rstrip(":")
        segs = [s for s in subj.split("::") if s]
        caps = [s for s in segs if re.match(r"^[A-Z][A-Za-z0-9]*$", s)]
        if kw == "mod":
            continue
        if caps:
            types.add(caps[0])
        elif kw in ("fn", "const", "static"):
            fns.add(segs[-1])
    return types, fns


def _documented_exclusions(text: str) -> set:
    """Backtick-quoted names under the '## Documented exclusions' header."""
    m = re.search(r"## Documented exclusions(.*?)(?:\n## |\Z)", text, re.S)
    if not m:
        return set()
    return set(re.findall(r"`([A-Za-z0-9_]+)`", m.group(1)))


@pytest.mark.skipif(not REF_SNAPSHOT.exists(), reason="reference not present")
def test_every_public_reference_name_is_mapped_or_excluded():
    types, fns = _extract_reference_names()
    assert len(types) >= 45 and len(fns) >= 40, (
        "snapshot parse degraded — check the extraction heuristic"
    )
    mig = MIGRATION.read_text()
    excluded = _documented_exclusions(mig)
    missing = sorted(
        name
        for name in types | fns
        if name not in excluded and not re.search(r"\b" + re.escape(name) + r"\b", mig)
    )
    assert not missing, (
        f"{len(missing)} public reference names neither mapped in "
        f"docs/MIGRATION.md nor on the documented-exclusion list: {missing}"
    )


def test_appendix_counterparts_exist():
    """The appendix's claimed Python counterparts actually import/resolve."""
    import importlib

    checks = {
        "engine.session": ["EvalConfigBuilder"],
        "decode": ["jpeg_decode_callback"],
        "corpus": ["CorpusMetadata", "CorpusStats", "fnv1a_64_file", "checksum_hex"],
        "importers": ["CsvSchemaBuilder"],
        "metrics": [
            "calculate_ssimulacra2",
            "calculate_ssimulacra2_icc",
            "calculate_dssim",
            "calculate_dssim_icc",
            "calculate_butteraugli",
            "calculate_butteraugli_icc",
            "calculate_butteraugli_with_intensity",
            "calculate_psnr",
        ],
        "stats.summary": ["percentile_u32"],
        "stats.rd_knee": [
            "AngleBin",
            "DualAngleBin",
            "AxisRange",
            "QualityDirection",
            "NormalizationContext",
            "ConfiguredRDPoint",
            "EncodeResult",
            "defaults",
        ],
    }
    for mod, names in checks.items():
        m = importlib.import_module(f"codec_eval_tpu.{mod}")
        for n in names:
            assert hasattr(m, n), f"codec_eval_tpu.{mod}.{n} missing"

    from codec_eval_tpu.corpus.sparse import SparseCheckout
    from codec_eval_tpu.stats.rd_knee import defaults
    from codec_eval_tpu.viewing import presets

    assert hasattr(SparseCheckout, "preview_patterns")
    assert callable(defaults.mozjpeg_cid22) and callable(defaults.mozjpeg_clic2025)
    for p in (
        "native_desktop",
        "native_laptop",
        "native_phone",
        "srcset_2x_on_desktop",
        "srcset_1x_on_laptop",
        "srcset_2x_on_laptop_1_5x",
        "srcset_3x_on_phone",
        "srcset_2x_on_phone",
        "srcset_1x_on_phone",
        "all",
        "key",
        "baseline",
        "demanding",
    ):
        assert hasattr(presets, p), f"viewing.presets.{p} missing"
